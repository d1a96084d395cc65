"""parity_phases: the phase-detection fold (reference phase.go:64-206) as a
value-checkable relation.

Layer 1 pins the DuckDB recursive-CTE oracle tail against the Python Phase
kernel on adversarial state sequences (multi-phase regimes, scan jump-backs,
the create-new-phase off-by-one, float32 likeliness window edges) — the same
harness the oracle was validated on before registration.

Layer 2 pins the Spark `parity_phases` plan (applyInPandas fold +
ReferenceProfiler.phase_trace) against a direct kernel replay, including the
empty-trace edge (series shorter than one chunk).
"""

import duckdb
import numpy as np
import pytest

from tsprofiler_spark.kernel.counter import TSState
from tsprofiler_spark.kernel.phase import Phase
from tsprofiler_spark.kernel.stats import TSStats

STATES = 8
HIST = 4
THRESH = 0.5


def _py_trace(seq):
    ph = Phase(
        history=1, states=STATES, buffer_size=4,
        phase_likeliness=THRESH, phase_history=HIST,
        phase_history_fadeout=False,
    )
    out = []
    for s in seq:
        ts = TSState(
            metric="len_text", state=int(s),
            stats=TSStats(min=0.0, max=128.0, stddev=0.0,
                          avg=float(s), count=4, stddev_sum=0.0),
        )
        ph.count([ts])
        out.append((ph.phase_pointer, len(ph.phase_counters)))
    return out


def _sequences():
    rng = np.random.default_rng(7)
    seqs = {}
    for sid in range(30):
        n = int(rng.integers(1, 120))
        if sid % 3 == 0:
            seq = rng.integers(0, STATES, n)
        elif sid % 3 == 1:
            # two-regime series: forces new-phase creation and (often) a
            # scan jump back to a previously-built phase
            seq = np.concatenate(
                [rng.integers(0, 2, n // 2 + 1), rng.integers(6, 8, n // 2)]
            )[:n]
        else:
            # strictly periodic regimes: likeliness saturates, then drops
            # hard at the boundary
            seq = np.concatenate([
                np.tile([1, 2], n // 4 + 1)[: n // 2],
                np.tile([5, 6, 7], n // 2 + 1)[: n - n // 2],
            ])
        seqs[sid] = [int(s) for s in seq]
    # directed edges: constant series (likeliness 1 forever), single chunk,
    # immediate oscillation shorter than the window
    seqs[100] = [3] * 20
    seqs[101] = [5]
    seqs[102] = [0, 7, 0, 7, 0, 7, 0, 7]
    return seqs


def _phase_obj(seq):
    ph = Phase(
        history=1, states=STATES, buffer_size=4,
        phase_likeliness=THRESH, phase_history=HIST,
        phase_history_fadeout=False,
    )
    for s in seq:
        ph.count([TSState(
            metric="len_text", state=int(s),
            stats=TSStats(min=0.0, max=128.0, stddev=0.0,
                          avg=float(s), count=4, stddev_sum=0.0),
        )])
    return ph


def _matrix_cells(doc):
    """Flatten a get_phases_tx() document to comparable cell tuples,
    including each matrix's stats block (bit-exact float compare: both
    sides run the identical IEEE fold)."""
    rows = []
    for pid, txs in enumerate(doc["phases"]):
        for tx in txs:
            st = tx["stats"]
            for ident, step in tx["transitions"].items():
                for j, p in enumerate(step["nextProbs"]):
                    rows.append(("phase", pid, tx["metric"], ident, j,
                                 int(p), int(step["probability"]),
                                 st.min, st.max, st.avg, st.stddev,
                                 int(st.count), st.stddev_sum))
    tx = doc["tx"]
    if tx is not None:
        st = tx["stats"]
        for ident, step in tx["transitions"].items():
            for j, p in enumerate(step["nextProbs"]):
                rows.append(("phasetx", -1, tx["metric"], ident, j,
                             int(p), int(step["probability"]),
                             st.min, st.max, st.avg, st.stddev,
                             int(st.count), st.stddev_sum))
    return sorted(rows)


def _states_table(con, seqs):
    con.sql(
        "CREATE TABLE states(conv_id VARCHAR, tool VARCHAR, role VARCHAR,"
        " metric VARCHAR, bucket_idx BIGINT, state BIGINT)"
    )
    con.executemany(
        "INSERT INTO states VALUES (?,?,?,?,?,?)",
        [(str(sid), "t", "r", "len_text", k, s)
         for sid, seq in seqs.items() for k, s in enumerate(seq)],
    )
    # raw chunk values backing the stats fold: 4 copies of the state value
    # per chunk, so chunk_avg == the TSStats.avg fed to the kernel harness
    # and the cross-term sum is exactly 0 — matching stddev_sum=0 above.
    con.sql(
        "CREATE TABLE bucketed(conv_id VARCHAR, tool VARCHAR, role VARCHAR,"
        " metric VARCHAR, value DOUBLE, seq BIGINT)"
    )
    con.executemany(
        "INSERT INTO bucketed VALUES (?,?,?,?,?,?)",
        [(str(sid), "t", "r", "len_text", float(s), 4 * k + i)
         for sid, seq in seqs.items() for k, s in enumerate(seq)
         for i in range(4)],
    )


def test_oracle_tail_matches_kernel_on_adversarial_sequences():
    from tsprofiler_spark.plans.entry_queries_pipeline import _phase_fold_tail

    seqs = _sequences()
    con = duckdb.connect()
    _states_table(con, seqs)
    got = {}
    rows = con.sql(
        "WITH RECURSIVE " + _phase_fold_tail()
        + " ORDER BY conv_id, chunk_idx"
    ).fetchall()
    for conv_id, _, _, _, pid, n in rows:
        got.setdefault(int(conv_id), []).append((pid, n))
    multi = jump = 0
    for sid, seq in seqs.items():
        want = _py_trace(seq)
        assert got.get(sid, []) == want, f"sid {sid} diverged"
        if want[-1][1] > 1:
            multi += 1
        seen = set()
        for i, (p, _) in enumerate(want):
            if i and p != want[i - 1][0] and p in seen and p != max(seen):
                jump += 1
                break
            seen.add(p)
    # the corpus must actually exercise the hard paths, or the equality
    # above proves nothing
    assert multi >= 10, multi
    assert jump >= 5, jump


def test_phase_tx_oracle_tail_matches_kernel():
    """The final phase + phasetx matrices (parity_phase_tx oracle tail) vs
    the Python kernel — including the phasetx counter's growth rescale
    through the issue-#5 change_dimension quirk."""
    from tsprofiler_spark.plans.entry_queries_pipeline import _phase_tx_tail

    seqs = _sequences()
    con = duckdb.connect()
    _states_table(con, seqs)
    got = {}
    rows = con.sql("WITH RECURSIVE " + _phase_tx_tail()).fetchall()
    for (conv_id, _, _, kind, pid, metric, ident, nxt, pp, sp,
         smin, smax, savg, ssd, scnt, sss) in rows:
        got.setdefault(int(conv_id), []).append(
            (kind, int(pid), metric, ident, int(nxt), int(pp), int(sp),
             smin, smax, savg, ssd, int(scnt), sss)
        )
    rescales = 0
    for sid, seq in seqs.items():
        ph = _phase_obj(seq)
        want = _matrix_cells(ph.get_phases_tx())
        assert sorted(got.get(sid, [])) == want, f"sid {sid} diverged"
        # growth events after the first chunk trigger a phasetx rescale;
        # np>=3 growths exercise the non-trivial round-half-up remap
        if len(ph.phase_counters) >= 3:
            rescales += 1
    assert rescales >= 8, rescales  # the corpus must hit the remap path


def test_spark_parity_phases_matches_kernel(spark):
    import datetime

    from tsprofiler_spark.config import Settings
    from tsprofiler_spark.plans.parity import parity_phases

    settings = Settings(
        buffer_size=4, states=STATES, history=1, fix_bound=True,
        fixed_min=0.0, fixed_max=128.0, period_size=(4, 6),
        phase_change_likeliness=THRESH, phase_change_history=HIST,
    )
    t0 = datetime.datetime(2025, 1, 1)
    rng = np.random.default_rng(3)
    rows, want = [], {}
    for conv in range(6):
        n_turns = int(rng.integers(2, 200))  # conv 0..: some < buffer_size
        vals = rng.integers(0, 129, n_turns)
        key = (f"c{conv}", "tool", "user")
        for i, v in enumerate(vals):
            rows.append(
                (key[0], key[1], key[2], i,
                 t0 + datetime.timedelta(minutes=i), "len_text", float(v))
            )
        from tsprofiler_spark.kernel.profiler import ReferenceProfiler

        prof = ReferenceProfiler(settings)
        prof.put_series(np.asarray(vals, dtype=np.float64), metric="len_text")
        want[key] = [
            (k, p, n) for k, (p, n) in enumerate(prof.phase_trace)
        ]
    series = spark.createDataFrame(
        rows,
        "conv_id string, tool string, role string, turn_idx int,"
        " ts timestamp, metric string, value double",
    )
    got = {}
    for r in parity_phases(series, settings).collect():
        got.setdefault((r.conv_id, r.tool, r.role), []).append(
            (r.chunk_idx, r.phase_id, r.n_phases)
        )
    for key, trace in want.items():
        assert sorted(got.get(key, [])) == trace, key
    # short series produce no rows, and nothing else appears
    assert set(got) == {k for k, tr in want.items() if tr}


def test_spark_parity_phase_tx_matches_kernel(spark):
    import datetime

    from tsprofiler_spark.config import Settings
    from tsprofiler_spark.kernel.profiler import ReferenceProfiler
    from tsprofiler_spark.plans.parity import parity_phase_tx

    settings = Settings(
        buffer_size=4, states=STATES, history=1, fix_bound=True,
        fixed_min=0.0, fixed_max=128.0, period_size=(4, 6),
        phase_change_likeliness=THRESH, phase_change_history=HIST,
    )
    t0 = datetime.datetime(2025, 1, 1)
    rng = np.random.default_rng(11)
    rows, want = [], {}
    for conv in range(6):
        n_turns = int(rng.integers(2, 200))
        vals = rng.integers(0, 129, n_turns)
        key = (f"c{conv}", "tool", "user")
        for i, v in enumerate(vals):
            rows.append(
                (key[0], key[1], key[2], i,
                 t0 + datetime.timedelta(minutes=i), "len_text", float(v))
            )
        prof = ReferenceProfiler(settings)
        prof.put_series(np.asarray(vals, dtype=np.float64), metric="len_text")
        want[key] = _matrix_cells(prof.phase.get_phases_tx())
    series = spark.createDataFrame(
        rows,
        "conv_id string, tool string, role string, turn_idx int,"
        " ts timestamp, metric string, value double",
    )
    got = {}
    for r in parity_phase_tx(series, settings).collect():
        got.setdefault((r.conv_id, r.tool, r.role), []).append(
            (r.kind, r.phase_id, r.metric, r.ident, r.next_state,
             r.prob_pct, r.step_prob, r.stat_min, r.stat_max, r.stat_avg,
             r.stat_stddev, r.stat_count, r.stat_ssum)
        )
    for key, cells in want.items():
        assert sorted(got.get(key, [])) == cells, key
    assert set(got) == {k for k, c in want.items() if c}


def test_phase_tx_stats_bit_exact_on_random_double_values():
    """The per-phase stats fold on non-integral chunk values. The corpus's
    values are integer text-lengths (mostly-exact float sums); random
    doubles force every operation to round, pinning the CTE's scalar /
    list_transform arithmetic against the kernel's numpy op order ulp-for-
    ulp (the sibling roottx fold was moved OFF list_reduce for exactly this
    — chained list_reduce drifts 1 ulp on such inputs; see
    test_parity_stats)."""
    from tsprofiler_spark.kernel.stats import (
        compute_chunk_stats,
        merge_global_stats,
    )
    from tsprofiler_spark.plans.entry_queries_pipeline import _phase_tx_tail

    rng = np.random.default_rng(23)
    seqs, chunk_vals = {}, {}
    for sid in range(20):
        n = int(rng.integers(1, 90))
        if sid % 2:
            seq = np.concatenate(
                [rng.integers(0, 2, n // 2 + 1), rng.integers(6, 8, n // 2)]
            )[:n]
        else:
            seq = rng.integers(0, STATES, n)
        seqs[sid] = [int(s) for s in seq]
        chunk_vals[sid] = [
            [float(v) for v in rng.uniform(0.0, 128.0, 4)] for _ in seq
        ]

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE states(conv_id VARCHAR, tool VARCHAR, role VARCHAR,"
        " metric VARCHAR, bucket_idx BIGINT, state BIGINT)"
    )
    con.executemany(
        "INSERT INTO states VALUES (?,?,?,?,?,?)",
        [(str(sid), "t", "r", "len_text", k, s)
         for sid, seq in seqs.items() for k, s in enumerate(seq)],
    )
    con.sql(
        "CREATE TABLE bucketed(conv_id VARCHAR, tool VARCHAR, role VARCHAR,"
        " metric VARCHAR, value DOUBLE, seq BIGINT)"
    )
    con.executemany(
        "INSERT INTO bucketed VALUES (?,?,?,?,?,?)",
        [(str(sid), "t", "r", "len_text", v, 4 * k + i)
         for sid, cvs in chunk_vals.items()
         for k, c in enumerate(cvs) for i, v in enumerate(c)],
    )

    got = {}
    for (conv_id, _, _, kind, pid, metric, ident, nxt, pp, sp,
         smin, smax, savg, ssd, scnt, sss) in con.sql(
            "WITH RECURSIVE " + _phase_tx_tail()).fetchall():
        got.setdefault(int(conv_id), []).append(
            (kind, int(pid), metric, ident, int(nxt), int(pp), int(sp),
             smin, smax, savg, ssd, int(scnt), sss)
        )

    for sid, seq in seqs.items():
        # the profiler's chunk-close path: chunk stats against the OVERALL
        # running avg, merged into overall + the assigned phase counter
        ph = Phase(
            history=1, states=STATES, buffer_size=4,
            phase_likeliness=THRESH, phase_history=HIST,
            phase_history_fadeout=False,
        )
        g = TSStats(min=-1.0)
        for s, c in zip(seq, chunk_vals[sid]):
            raw = np.asarray(c, dtype=np.float64)
            cs = compute_chunk_stats(
                raw, float(raw.min()), float(raw.max()),
                g.avg if g.count else 0.0, True, 0.0, 128.0,
            )
            ph.count([TSState(metric="len_text", state=int(s), stats=cs)])
            gg = g.copy()
            if gg.min == -1:
                gg.min, gg.max = cs.min, cs.max
            g = merge_global_stats(gg, cs)
        want = _matrix_cells(ph.get_phases_tx())
        assert sorted(got.get(sid, [])) == want, f"sid {sid} diverged"


def test_go_round_pct_matches_kernel():
    """_go_round_pct is THE generator for every oracle integer percent:
    pin its SQL against the kernel's int(go_round(cnt/total*100.0)) over
    an exhaustive (cnt, rowsum) sweep. The sweep covers the pairs where a
    hand-written FLOOR(100.0*cnt/rowsum + 0.5) diverges — wrong op order
    ((100*cnt)/rowsum can land exactly on k.5 where (cnt/rowsum)*100
    lands one ulp below) and wrong half-boundary compare — e.g. 23/40:
    kernel 57, floor-form 58."""
    from tsprofiler_spark.kernel.rounding import go_round
    from tsprofiler_spark.plans.entry_queries_pipeline import _go_round_pct

    con = duckdb.connect()
    expr = _go_round_pct("p.cnt", "p.rowsum")
    rows = con.sql(
        f"""
        WITH p AS (
          SELECT r.r AS rowsum, c.c AS cnt
          FROM (SELECT unnest(generate_series(1, 400)) AS r) r,
               (SELECT unnest(generate_series(0, 400)) AS c) c
          WHERE c.c <= r.r
        )
        SELECT p.cnt, p.rowsum, {expr} AS pct,
               CAST(FLOOR(100.0 * p.cnt / p.rowsum + 0.5) AS INT) AS floor_pct
        FROM p
        """
    ).fetchall()
    assert len(rows) > 80_000
    floor_divergences = 0
    for cnt, rowsum, pct, floor_pct in rows:
        want = int(go_round(float(cnt) / float(rowsum) * 100.0))
        assert pct == want, (cnt, rowsum, pct, want)
        if floor_pct != want:
            floor_divergences += 1
    # the hazard is real on small, reachable pairs (23/40, 29/200, ...)
    assert floor_divergences > 0
