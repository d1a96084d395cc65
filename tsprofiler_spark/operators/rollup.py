"""Cascading retention tiers: raw -> 1m -> 1h -> 1d downsamples.

The reference has no wall-clock tiers (periods are chunk-counted,
period.go:83-135); our engine defines tiers on ``ts`` per the north_rule.
Each tier bucket carries the distributive partials (n, s1, s2, min, max) so
coarser tiers re-aggregate from finer tiers without touching raw data
(continuous aggregates). Stats formulas are written explicitly (not via
stddev_samp) so the identical ANSI SQL runs in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsprofiler_spark.config import Settings
from tsprofiler_spark.functions import closest_state, go_round_nonneg
from tsprofiler_spark.operators.ingest import SERIES_COLS

TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
# cascade order: each tier is computed from the previous (finer) one
CASCADE = ["1m", "1h", "1d"]


def rollup_from_series(series: DataFrame, tier: str, settings: Settings) -> DataFrame:
    """raw observations -> finest time tier (one shuffle on the series key)."""
    trunc = TIER_TRUNC[tier]
    g = series.groupBy(
        *SERIES_COLS, "metric", F.date_trunc(trunc, "ts").alias("bucket_start")
    ).agg(
        F.count("value").alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    return _finish_tier(g, tier, settings)


def rollup_cascade(finer: DataFrame, tier: str, settings: Settings) -> DataFrame:
    """finer tier partials -> coarser tier (never rescans raw; exact for the
    distributive partials)."""
    trunc = TIER_TRUNC[tier]
    g = finer.groupBy(
        *SERIES_COLS,
        "metric",
        F.date_trunc(trunc, "bucket_start").alias("bucket_start"),
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
    return _finish_tier(g, tier, settings)


def _finish_tier(g: DataFrame, tier: str, settings: Settings) -> DataFrame:
    avg = F.col("s1") / F.col("n")
    # explicit sample-stddev formula so the DuckDB oracle matches bit-for-bit
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    stddev = F.when(F.col("n") > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
    return g.select(
        *SERIES_COLS,
        "metric",
        F.lit(tier).alias("tier"),
        "bucket_start",
        "n",
        "s1",
        "s2",
        "vmin",
        "vmax",
        avg.alias("avg"),
        stddev.alias("stddev"),
        closest_state(avg, settings.states, settings.fixed_min, settings.fixed_max).alias(
            "state"
        ),
    )


def build_tiers(series: DataFrame, settings: Settings) -> dict[str, DataFrame]:
    """The cascade raw->1m->1h->1d. Returned lazily; caller persists each
    tier before cascading in production (plans/retention.py does)."""
    tiers: dict[str, DataFrame] = {}
    finer = rollup_from_series(series, "1m", settings)
    tiers["1m"] = finer
    for tier in CASCADE[1:]:
        finer = rollup_cascade(finer, tier, settings)
        tiers[tier] = finer
    return tiers


def tier_transitions(tier_df: DataFrame, settings: Settings) -> DataFrame:
    """Markov transition counts between consecutive tier buckets per series
    (continuous-aggregate analogue of the reference's chunk transitions),
    zero-seeded like counter.go:159-162, history=1."""
    w = Window.partitionBy(*SERIES_COLS, "metric", "tier").orderBy("bucket_start")
    with_prev = tier_df.withColumn(
        "ident", F.coalesce(F.lag("state").over(w), F.lit(0)).cast("string")
    )
    counts = with_prev.groupBy(*SERIES_COLS, "metric", "tier", "ident", "state").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumnRenamed("state", "next_state")
    w_row = Window.partitionBy(*SERIES_COLS, "metric", "tier", "ident")
    w_all = Window.partitionBy(*SERIES_COLS, "metric", "tier")
    row_sum = F.sum("cnt").over(w_row)
    total = F.sum("cnt").over(w_all)
    return counts.select(
        *SERIES_COLS,
        "metric",
        "tier",
        "ident",
        "next_state",
        "cnt",
        go_round_nonneg(F.lit(100.0) * F.col("cnt") / row_sum)
        .cast("int")
        .alias("prob_pct"),
        go_round_nonneg(F.lit(100.0) * row_sum / total).cast("int").alias("step_prob"),
    )


def apply_ttl(tier_df: DataFrame, tier: str, settings_tiers: dict, watermark) -> DataFrame:
    """TTL-driven expiry: keep buckets younger than the tier's TTL relative
    to the high watermark (north_rule retention). Storage-level deletion is
    plans/storage.delete_expired; this is the predicate."""
    ttl_days = settings_tiers[tier]["ttl_days"]
    return tier_df.where(
        F.col("bucket_start") >= F.lit(watermark) - F.expr(f"INTERVAL {ttl_days} DAYS")
    )
