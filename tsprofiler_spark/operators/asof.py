"""As-of join: attach to each left row the latest right row at or before
its timestamp, per key — the canonical time-series lookup (price as of
trade time; here: rollup state as of a turn's ts).

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
formulation — range join + row_number, or a per-key max-ts subquery — is
either a near-cartesian range join or two extra shuffles. This is the
union-window form:

  tag left/right, union on the shared key prefix, ONE window pass ordered
  by (ts, side) per key carrying last(right_payload, ignorenulls), then
  keep the left rows.

Cost: one hash exchange on the key (both sides), one sort — the same
shape as any window aggregation, linear in |L| + |R|, no range-join blowup,
skew-safe to the same degree as any per-key window. On a 100 TB cluster
both inputs co-partition on the key, so the exchange is the only data
movement.

Tie semantics: a right row with ts equal to the left ts matches
(backward-inclusive, DuckDB `ON l.ts >= r.ts` parity). Precondition for
determinism: at most one right row per (key, ts) — true for tier tables
keyed by bucket_start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "bucket_start",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join. Left rows keep all columns; matched
    right columns arrive as ``<col><suffix>`` (NULL when no right row is
    at or before the left ts)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),  # right sorts first on ts ties (inclusive)
        payload.alias("_rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != left_ts],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[c for c in left.columns if c not in on and c != left_ts],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_last_r", F.last("_rpay", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1).select(
        *on,
        F.col("_ats").alias(left_ts),
        *[c for c in left.columns if c not in on and c != left_ts],
        *[F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
