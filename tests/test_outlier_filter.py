"""Optional live outlier filter (operators/ingest.py filter_outliers) —
the reference's dead-code predicate (utils/outliers.go:5-11, SURVEY A5)
made real behind Settings.filter_stddevs. Parity mode never applies it."""

from pyspark.sql import functions as F

from tsprofiler_spark.operators.ingest import derive_series, filter_outliers
from tsprofiler_spark.sources.transcripts import synthesize_transcripts


def test_filter_drops_extremes_only(spark):
    t = synthesize_transcripts(spark, n_convs=3, max_turns=200, seed=4)
    series = derive_series(t)
    # inject an extreme observation per series by unioning a spike row
    spike = series.limit(1).select(
        "conv_id", "tool", "role", "turn_idx", "ts", "metric",
        F.lit(1e9).alias("value"),
    )
    with_spike = series.unionByName(spike)
    kept = filter_outliers(with_spike, k=3)
    assert kept.where(F.col("value") == 1e9).count() == 0
    # non-spike rows survive (sinusoidal text lengths stay within 3 sigma)
    assert kept.count() >= series.count() * 0.95


def test_k_nonpositive_is_noop(spark):
    t = synthesize_transcripts(spark, n_convs=2, max_turns=50, seed=4)
    series = derive_series(t)
    assert filter_outliers(series, k=-1).count() == series.count()
    assert filter_outliers(series, k=0).count() == series.count()


def test_constant_series_survive(spark):
    # stddev NULL/0 (single obs or constant values) must not divide-by-zero
    t = synthesize_transcripts(spark, n_convs=1, max_turns=3, seed=4)
    series = derive_series(t).withColumn("value", F.lit(42.0))
    assert filter_outliers(series, k=2).count() == series.count()
