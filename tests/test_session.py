"""Sessionization semantics vs a brute-force python fold."""

import collections

from pyspark.sql import functions as F

from tsprofiler_spark.operators.ingest import gap_fill  # noqa: F401 (import parity)
from tsprofiler_spark.operators.session import session_stats, sessionize
from tsprofiler_spark.sources.transcripts import synthesize_transcripts

GAP_S = 90  # synth step is 60s; a skipped turn makes a 120s gap -> new session


def _expected(rows):
    """Brute-force: per conv, ordered by (ts, turn_idx), split on gap > GAP_S."""
    by_conv = collections.defaultdict(list)
    for r in rows:
        by_conv[r.conv_id].append(r)
    out = {}
    for conv, rs in by_conv.items():
        rs.sort(key=lambda r: (r.ts, r.turn_idx))
        idx = -1
        prev = None
        for r in rs:
            if prev is None or (r.ts - prev).total_seconds() > GAP_S:
                idx += 1
            out[(conv, r.turn_idx)] = idx
            prev = r.ts
    return out


def test_sessionize_matches_bruteforce(spark):
    t = synthesize_transcripts(spark, n_convs=6, max_turns=200, seed=5, gap_pct=25)
    got = {
        (r.conv_id, r.turn_idx): r.session_idx
        for r in sessionize(t, gap_seconds=GAP_S).collect()
    }
    expected = _expected(t.collect())
    assert got == expected
    assert max(got.values()) > 0  # gap_pct=25 actually split something


def test_session_stats_envelope(spark):
    t = synthesize_transcripts(spark, n_convs=4, max_turns=150, seed=9, gap_pct=20)
    s = sessionize(t, gap_seconds=GAP_S)
    stats = session_stats(s).collect()
    per_turn = s.collect()

    # conservation: session turn counts sum to the input row count
    assert sum(r.n_turns for r in stats) == len(per_turn)
    by_key = {(r.conv_id, r.session_idx): r for r in stats}
    for r in per_turn:
        g = by_key[(r.conv_id, r.session_idx)]
        assert g.first_turn <= r.turn_idx <= g.last_turn
        assert g.start_ts <= r.ts <= g.end_ts
    for g in stats:
        assert g.duration_us == int((g.end_ts - g.start_ts).total_seconds() * 1e6)
        # sessions never span a gap: max inner gap <= GAP_S checked via
        # boundary — consecutive sessions of one conv are > GAP_S apart
        nxt = by_key.get((g.conv_id, g.session_idx + 1))
        if nxt is not None:
            assert (nxt.start_ts - g.end_ts).total_seconds() > GAP_S


def test_metric_corr_matches_numpy(spark):
    """Pearson r per series vs numpy recomputation from the same integer
    moments; planted perfect trend pins r == 1."""
    import math

    from tsprofiler_spark.operators.correlate import metric_corr
    from tsprofiler_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=5, max_turns=80, seed=13)
    got = {(r.conv_id, r.tool, r.role): r for r in metric_corr(t).collect()}

    import collections
    groups = collections.defaultdict(list)
    for r in t.collect():
        groups[(r.conv_id, r.tool, r.role)].append((len(r.text), r.turn_idx))
    assert set(got) == set(groups)
    for key, pts in groups.items():
        g = got[key]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        assert (g.n, g.sx, g.sy, g.sxx, g.syy, g.sxy) == (n, sx, sy, sxx, syy, sxy)
        var_x = sxx - sx * sx / n
        var_y = syy - sy * sy / n
        if n > 1 and var_x > 0 and var_y > 0:
            r_exp = (sxy - sx * sy / n) / (math.sqrt(var_x) * math.sqrt(var_y))
            assert abs(g.r - r_exp) < 1e-12
        else:
            assert g.r is None

    # planted perfect linear trend -> r exactly 1.0
    lin = spark.createDataFrame(
        [("c", i, "user", "x" * (3 * i + 2), "t", None) for i in range(10)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    row = metric_corr(lin).collect()[0]
    assert abs(row.r - 1.0) < 1e-12
