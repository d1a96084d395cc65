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
