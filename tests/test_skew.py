"""Skew handling (north_rule: salted repartitioning on hot conv_id keys).

The segmented variants split a hot conversation's turn axis into bounded
salted sub-keys and recover exact sequential semantics via tiny boundary
tables — these tests pin output equality against the plain operators on a
Zipf-skewed input (conv 0 is the hot key) with injected gaps, including
the full profile pipeline."""

import pytest
from pyspark.sql import functions as F

from tsprofiler_spark.config import Settings
from tsprofiler_spark.operators.ingest import (
    derive_series,
    gap_fill,
    gap_fill_segmented,
)
from tsprofiler_spark.operators.profile import bucketize, bucketize_segmented
from tsprofiler_spark.plans.pipeline import run_profile
from tsprofiler_spark.sources.transcripts import synthesize_transcripts

SETTINGS = Settings(fix_bound=True, fixed_min=0.0, fixed_max=128.0, states=6)
# segment_turns far below the hot conv's length so segmentation really splits
SEG = 64


@pytest.fixture(scope="module")
def skewed(spark):
    return synthesize_transcripts(
        spark, n_convs=12, max_turns=900, seed=7, zipf=True, step_seconds=60
    ).cache()


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_gap_fill_segmented_equals_plain(spark, skewed):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "is_filled"]
    plain = _rows(gap_fill(skewed, step_seconds=60), cols)
    segmented = _rows(gap_fill_segmented(skewed, step_seconds=60, segment_turns=SEG), cols)
    assert segmented == plain
    assert len(plain) > 0


def test_gap_fill_locf_ignorenulls_and_dup_turns(spark):
    """NULL role/tool must LOCF past an intervening NULL observed row (the
    spine-join ignorenulls contract), NULL role on observed rows is
    backfilled, and a duplicate (conv_id, turn_idx) row re-emits only
    itself (no fabricated descending sequence)."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        ("c", 0, "user", "a", "bash", t0),
        ("c", 2, None, "b", None, t0 + dt.timedelta(minutes=2)),   # NULL role/tool
        ("c", 5, "asst", "c", "grep", t0 + dt.timedelta(minutes=5)),
        ("c", 5, "asst", "c2", "grep", t0 + dt.timedelta(minutes=5)),  # dup turn
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    for out in (
        gap_fill(df, step_seconds=60),
        gap_fill_segmented(df, step_seconds=60, segment_turns=2),
    ):
        got = {
            (r.turn_idx, bool(r.is_filled)): (r.role, r.tool, r.text)
            for r in out.collect()
        }
        # gap row at turn 1 takes the last non-null (turn 0)
        assert got[(1, True)][:2] == ("user", "bash")
        # gap rows at 3 and 4 look PAST the NULL observed turn 2 back to turn 0
        assert got[(3, True)][:2] == ("user", "bash")
        assert got[(4, True)][:2] == ("user", "bash")
        # observed NULL role/tool at turn 2 is backfilled, text untouched
        assert got[(2, False)] == ("user", "bash", "b")
        # duplicate turn 5: two observed rows, no extra fabricated turns
        assert out.where("turn_idx = 5").count() == 2
        assert out.where("turn_idx > 5").count() == 0
        assert out.count() == 7  # 0..5 spine (6 rows) + the duplicate, nothing else


def test_bucketize_segmented_equals_plain(spark, skewed):
    series = derive_series(skewed)
    cols = ["conv_id", "tool", "role", "metric", "turn_idx", "seq", "bucket_idx"]
    plain = _rows(bucketize(series, SETTINGS.buffer_size), cols)
    segmented = _rows(
        bucketize_segmented(series, SETTINGS.buffer_size, segment_turns=SEG), cols
    )
    assert segmented == plain


def test_pipeline_segmented_equals_plain(spark, skewed):
    cols = ["conv_id", "tool", "role", "metric", "profile_json"]
    plain = _rows(run_profile(skewed, SETTINGS, do_gap_fill=True), cols)
    segmented = _rows(
        run_profile(skewed, SETTINGS, do_gap_fill=True, segment_turns=SEG), cols
    )
    assert segmented == plain
    assert len(plain) > 0


def test_auto_segment_trigger(spark, skewed):
    """The measured skew gate (pipeline.auto_segment_turns): segmentation
    engages exactly when the hottest conv_id exceeds the row threshold,
    and the auto pipeline's output is value-identical to the plain path
    either way (r4 verdict ask #4)."""
    from tsprofiler_spark.plans.pipeline import (
        SEGMENT_TURNS_DEFAULT,
        auto_segment_turns,
        profile_pipeline,
    )

    hot = skewed.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0]
    assert hot > 500  # fixture's Zipf head is the hot key
    # below threshold -> plain path; above -> segmented at the default size
    assert auto_segment_turns(skewed, auto_segment_rows=hot + 1) is None
    assert (
        auto_segment_turns(skewed, auto_segment_rows=500)
        == SEGMENT_TURNS_DEFAULT
    )

    cols = ["conv_id", "tool", "role", "metric", "profile_json"]
    plain = _rows(
        run_profile(skewed, SETTINGS, do_gap_fill=True, segment_turns=None), cols
    )
    # force the auto gate to TRIGGER on this small fixture (threshold 500;
    # the segmented operators engage at the default segment size), then pin
    # value equality — the gate must change the plan, never the answer.
    # Real splitting at segment sizes below the hot conv's length is pinned
    # by the SEG=64 equality tests above.
    auto = profile_pipeline(
        skewed, SETTINGS, do_gap_fill=True, auto_segment_rows=500
    )
    assert _rows(auto["profile"], cols) == plain
    auto["chunks"].unpersist()
    # default threshold (1M rows) leaves this fixture on the plain path
    default_stages = profile_pipeline(skewed, SETTINGS, do_gap_fill=True)
    assert _rows(default_stages["profile"], cols) == plain
    default_stages["chunks"].unpersist()


def test_pipeline_segmented_equals_plain_irregular_cadence(spark):
    """Gap-filled + segmented with observed cadence != step_seconds: gap
    rows' interpolated ts (min_ts + turn*step) can EXCEED later observed
    ts, so (ts, turn_idx) ordering diverges from the turn ordering the
    non-segmented gap-fill path buckets by. The segmented path must order
    by turn_idx too (pipeline passes order_cols through) — with regular
    synthetic cadence the two orders coincide, which is exactly why the
    plain-equality test above cannot catch this."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for conv in ("a", "b"):
        # observed turns every 30s with every 3rd turn missing; gap fill at
        # 60s interpolates missing turn k at t0+60k, past later observed
        # turns (turn 2 observed at 60s == gap ts of turn 1, turn 4 at
        # 120s < gap ts of turn 3 at 180s, ...)
        for turn in range(0, 200):
            if turn % 3 == 1:
                continue
            rows.append(
                (conv, turn, "user" if turn % 2 == 0 else "asst",
                 "x" * (3 + (turn * 7) % 40), "bash",
                 t0 + dt.timedelta(seconds=30 * turn))
            )
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    cols = ["conv_id", "tool", "role", "metric", "profile_json"]
    plain = _rows(run_profile(t, SETTINGS, do_gap_fill=True), cols)
    segmented = _rows(
        run_profile(t, SETTINGS, do_gap_fill=True, segment_turns=SEG), cols
    )
    assert segmented == plain
    assert len(plain) > 0
