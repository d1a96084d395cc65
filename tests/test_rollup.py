"""Retention-tier rollup + compression tests."""

import pytest
from pyspark.sql import functions as F

from tsprofiler_spark.config import DEFAULT_TIERS, Settings
from tsprofiler_spark.operators.compress import compress_points, decompress_points
from tsprofiler_spark.operators.ingest import derive_series
from tsprofiler_spark.operators.rollup import (
    apply_ttl,
    build_tiers,
    rollup_from_series,
    tier_transitions,
)
from tsprofiler_spark.sources.transcripts import synthesize_transcripts

SETTINGS = Settings(states=6, fix_bound=True, fixed_min=0.0, fixed_max=128.0)


@pytest.fixture(scope="module")
def series(spark):
    t = synthesize_transcripts(spark, n_convs=8, max_turns=300, seed=3, step_seconds=45)
    return derive_series(t).cache()


def test_cascade_equals_direct(series):
    """1h cascaded from 1m must equal 1h computed directly from raw
    (distributive partials are exact)."""
    tiers = build_tiers(series, SETTINGS)
    direct_1h = rollup_from_series(series, "1h", SETTINGS)
    cascaded_1h = tiers["1h"]
    cols = ["conv_id", "tool", "role", "metric", "bucket_start", "n", "s1", "vmin", "vmax", "state"]
    assert cascaded_1h.select(cols).exceptAll(direct_1h.select(cols)).count() == 0
    assert direct_1h.select(cols).exceptAll(cascaded_1h.select(cols)).count() == 0


def test_tier_counts_conserve(series):
    tiers = build_tiers(series, SETTINGS)
    total = series.count()
    for name, df in tiers.items():
        assert df.agg(F.sum("n")).collect()[0][0] == total, name


def test_tier_transitions_probs_sum(series):
    tiers = build_tiers(series, SETTINGS)
    tx = tier_transitions(tiers["1h"], SETTINGS)
    sums = (
        tx.groupBy("conv_id", "tool", "role", "metric", "ident")
        .agg(F.sum("prob_pct").alias("s"), F.count("*").alias("k"))
        .collect()
    )
    for r in sums:
        assert 100 - r.k <= r.s <= 100 + r.k  # int rounding slack


def test_compress_roundtrip(series):
    tiers = build_tiers(series, SETTINGS)
    tier_1m = tiers["1m"]
    compressed = compress_points(tier_1m)
    decoded = decompress_points(compressed)
    orig = tier_1m.select(
        "conv_id", "tool", "role", "metric", "tier", "bucket_start", "avg"
    )
    assert decoded.exceptAll(orig).count() == 0
    assert orig.exceptAll(decoded).count() == 0
    # compression actually compresses a regular series
    sizes = compressed.select(
        F.sum(F.length("ts_dod") + F.length("points_gorilla")).alias("blob"),
        (F.sum("n_points") * 16).alias("raw"),
    ).collect()[0]
    assert sizes.blob < sizes.raw


def test_ttl_expiry(series):
    tiers = build_tiers(series, SETTINGS)
    wm = series.agg(F.max("ts")).collect()[0][0]
    kept = apply_ttl(tiers["1m"], "1m", DEFAULT_TIERS, wm)
    assert kept.count() == tiers["1m"].count()  # synth span << 30d TTL
    tight = {"1m": {"ttl_days": 0}}
    kept0 = apply_ttl(tiers["1m"], "1m", tight, wm)
    assert kept0.count() < tiers["1m"].count()
