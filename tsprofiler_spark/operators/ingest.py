"""Ingest: transcripts -> per-series numeric observations.

Mirrors the reference's CSV-column -> metric projection
(cmd/csv2tsprofile/main.go:179-193) for the transcripts input shape: the
profiled metric is ``length(text)`` (input_hint), with the series keyed on
(conv_id, tool, role). Pure projection — Catalyst prunes ``text`` out of
downstream numeric-only stages automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsprofiler_spark.functions import series_key_cols

SERIES_COLS = series_key_cols()


def derive_series(transcripts: DataFrame, metric_name: str = "len_text") -> DataFrame:
    """Project (conv_id, tool, role, turn_idx, ts, metric, value)."""
    return transcripts.select(
        *SERIES_COLS,
        "turn_idx",
        "ts",
        F.lit(metric_name).alias("metric"),
        F.length("text").cast("double").alias("value"),
    )


def gap_fill(transcripts: DataFrame, step_seconds: int = 60) -> DataFrame:
    """Fill missing turn_idx values per conversation.

    Spine = sequence(0, max(turn_idx)) per conv_id, exploded and
    left-joined against observed turns. Observed rows pass through
    unchanged (per-turn text equality invariant); filled rows carry
    NULL text, LOCF role/tool, interpolated ts, and is_filled=true.

    The spine join is a join between a tiny aggregate (one row per conv)
    exploded back out and the observed turns, co-partitioned on conv_id —
    AQE plans it as a shuffle join on the same key the downstream
    windows/groupBys use, so the shuffle is reused.
    """
    spine = (
        transcripts.groupBy("conv_id")
        .agg(
            F.max("turn_idx").alias("max_turn"),
            F.min("ts").alias("min_ts"),
            F.min("turn_idx").alias("min_turn"),
        )
        .select(
            "conv_id",
            "min_ts",
            "min_turn",
            F.explode(F.sequence(F.lit(0), F.col("max_turn"))).alias("turn_idx"),
        )
    )
    joined = spine.join(transcripts, ["conv_id", "turn_idx"], "left")

    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    locf = lambda c: F.coalesce(F.col(c), F.last(c, ignorenulls=True).over(w))
    filled_ts = F.coalesce(
        F.col("ts"),
        F.col("min_ts")
        + F.make_interval(
            secs=(F.col("turn_idx") - F.col("min_turn")).cast("double")
            * F.lit(float(step_seconds))
        ),
    )
    return joined.select(
        "conv_id",
        "turn_idx",
        locf("role").alias("role"),
        F.col("text"),
        locf("tool").alias("tool"),
        filled_ts.alias("ts"),
        F.col("text").isNull().alias("is_filled"),
    )


def gap_fill_series(series: DataFrame) -> DataFrame:
    """LOCF the metric value over filled rows (value NULL where is_filled)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*SERIES_COLS, "metric")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return series.withColumn(
        "value", F.coalesce(F.col("value"), F.last("value", ignorenulls=True).over(w))
    ).where(F.col("value").isNotNull())  # leading gaps have nothing to carry forward
