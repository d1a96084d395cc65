"""Sessionization: split conversations into activity sessions by idle gap.

The reference has no wall-clock concept (periods are chunk-counted,
period.go:83-135); for transcript streams the standard first step before
per-session profiling is splitting each conversation wherever the gap
between consecutive turns exceeds an inactivity threshold (the classic
web-analytics sessionize). Spark shape: ONE window pass per conversation
(lag + conditional flag + running sum) — no join, no UDF; the exchange on
conv_id is shared with every downstream per-conversation stage.

At 100 TB: partitions by conv_id (the natural key, same as gap-fill), so
sessionize composes with the rest of the pipeline without an extra
shuffle; skewed mega-conversations are bounded by the same segmented
window strategy gap_fill_segmented uses (a session flag is prefix-sum
associative, so the segment trick applies unchanged if ever needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(col):
    # unix_micros requires TIMESTAMP; sources may carry TIMESTAMP_NTZ
    # (parquet without TZ). Session TZ is pinned to UTC engine-wide, so the
    # cast is a no-op reinterpretation, identical to DuckDB's epoch_us.
    return F.unix_micros(F.col(col).cast("timestamp"))


def sessionize(transcripts: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign a per-conversation ``session_idx`` (0-based) that increments
    whenever the gap to the previous turn exceeds ``gap_seconds``.

    Gap comparison is in exact integer microseconds (``unix_micros``), so
    the DuckDB oracle (``epoch_us``) matches bit-for-bit; the boundary is
    strict (gap == threshold stays in the same session).
    """
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    prev_us = F.lag(_micros("ts")).over(w)
    is_new = (
        prev_us.isNull()
        | (_micros("ts") - prev_us > F.lit(gap_seconds * 1_000_000))
    ).cast("int")
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        is_new.alias("_new"),
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        (F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
        .cast("int")
        .alias("session_idx"),
    )


def session_stats(sessions: DataFrame) -> DataFrame:
    """Per-session envelope: turn span, wall-clock span, text volume.

    One hash aggregation on (conv_id, session_idx) — the rows arrive
    already partitioned by conv_id from `sessionize`, so with the window
    exchange reused this is map-side-combinable and shuffle-free in the
    common plan.
    """
    return sessions.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.unix_micros(F.max("ts").cast("timestamp"))
         - F.unix_micros(F.min("ts").cast("timestamp"))).alias(
            "duration_us"
        ),
        F.sum(F.length("text")).alias("total_chars"),
    )
