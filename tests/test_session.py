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
