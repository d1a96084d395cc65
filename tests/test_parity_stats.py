"""The profile document's per-metric GLOBAL STATS block (counter.go:123-156)
as a value-checkable relation.

Pins the registered `parity_roottx` oracle's stats columns — the DuckDB
recursive-CTE replay of the sequential weighted 2-way mean fold — against a
direct replay with the Python kernel's own stats functions
(compute_chunk_stats + merge_global_stats) on the real sf0.001 chunks,
repr-exact (bit-for-bit doubles). The Spark side (profile_json -> stats
struct) is covered end-to-end by tools/check_oracle.py; this test keeps the
ORACLE itself honest without a Spark session.
"""

import math
import os

import duckdb
import numpy as np

from tsprofiler_spark.kernel.stats import (
    TSStats,
    compute_chunk_stats,
    merge_global_stats,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _kernel_fold(chunks):
    """counter.count's stats path, chunk arrival order (counter.go:113-156)."""
    g = TSStats(min=-1.0)
    for vals in chunks:
        raw = np.asarray(vals, dtype=np.float64)
        cs = compute_chunk_stats(
            raw, float(raw.min()), float(raw.max()),
            g.avg if g.count else 0.0, True, 0.0, 128.0,
        )
        gg = g.copy()
        if gg.min == -1:
            gg.min, gg.max = cs.min, cs.max
        if gg.min > cs.min:
            gg.min = cs.min
        if gg.max < cs.max:
            gg.max = cs.max
        g = merge_global_stats(gg, cs)
    return g


def test_roottx_stats_oracle_matches_kernel_fold():
    from tsprofiler_spark.plans.entry_queries_pipeline import (
        _PARITY_STATS_CTES,
        _parity_cte,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    prefix = f"WITH RECURSIVE {_parity_cte()},\n{_PARITY_STATS_CTES}\n"

    got = {
        (c, t, r, m): (smin, smax, savg, ssd, scnt, sss)
        for c, t, r, m, smin, smax, savg, ssd, scnt, sss in con.sql(
            prefix + "SELECT * FROM stats_cols"
        ).fetchall()
    }

    chunk_rows = con.sql(
        prefix
        + """
SELECT conv_id, tool, role, metric, list(vals ORDER BY bucket_idx) AS chunks
FROM stats_src WHERE n = 4 GROUP BY conv_id, tool, role, metric
"""
    ).fetchall()
    assert len(chunk_rows) == len(got) and len(got) > 100

    multi_chunk = 0
    for conv, tool, role, metric, chunks in chunk_rows:
        g = _kernel_fold(chunks)
        want = (g.min, g.max, g.avg, g.stddev, g.count, g.stddev_sum)
        have = got[(conv, tool, role, metric)]
        key = (conv, tool, role, metric)
        # repr-exact: both sides must be the same IEEE doubles, NaN included
        for w, h in zip(want, have):
            if isinstance(w, float) and math.isnan(w):
                assert isinstance(h, float) and math.isnan(h), key
            else:
                assert repr(w) == repr(float(h) if isinstance(h, float) else h) or w == h, (
                    key, want, have,
                )
        if len(chunks) >= 2:
            multi_chunk += 1
    # the corpus must exercise real multi-chunk folds (sf0.001 series are
    # short: ~1.1 chunks each), or equality is trivial
    assert multi_chunk > 10, multi_chunk


def test_stats_fold_oracle_bit_exact_on_random_doubles():
    """The corpus's values are integer text-lengths, which under-stresses
    the bit-exactness claims (integer sums are mostly exact). Random
    non-integral doubles force every operation to round, so any op-order
    divergence between the DuckDB lambda and numpy's sequential small-n
    path shows up here. (Chunk cross-term sums are algebraically
    >= 0 — sum((v-A)(v-ca)) == sum((v-ca)^2) — so the NaN guard only
    covers float-epsilon negatives; this test documents that, too.)"""
    from tsprofiler_spark.plans.entry_queries_pipeline import _PARITY_STATS_CTES

    rng = np.random.default_rng(13)
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE bucketed(conv_id VARCHAR, tool VARCHAR, role VARCHAR,"
        " metric VARCHAR, value DOUBLE, seq BIGINT)"
    )
    series = {}
    for sid in range(60):
        n = int(rng.integers(4, 160))
        if sid % 3 == 0:
            vals = rng.uniform(0.0, 128.0, n)          # dense non-integral
        elif sid % 3 == 1:
            vals = rng.uniform(0.0, 1e-3, n)           # tiny: variance ~ 0
        else:
            vals = np.full(n, float(rng.integers(0, 128)))  # exact-zero ssum
        series[str(sid)] = [float(v) for v in vals]
    con.executemany(
        "INSERT INTO bucketed VALUES (?,?,?,?,?,?)",
        [(sid, "t", "r", "len_text", v, i)
         for sid, vals in series.items() for i, v in enumerate(vals)],
    )
    got = {
        c: (smin, smax, savg, ssd, scnt, sss)
        for c, _, _, _, smin, smax, savg, ssd, scnt, sss in con.sql(
            "WITH RECURSIVE " + _PARITY_STATS_CTES + " SELECT * FROM stats_cols"
        ).fetchall()
    }
    for sid, vals in series.items():
        chunks = [vals[i : i + 4] for i in range(0, len(vals) - 3, 4)]
        g = _kernel_fold(chunks)
        have = got[sid]
        want = (g.min, g.max, g.avg, g.stddev, g.count, g.stddev_sum)
        for w, h in zip(want, have):
            if isinstance(w, float) and math.isnan(w):
                assert isinstance(h, float) and math.isnan(h), sid
            else:
                assert w == h, (sid, want, have)
