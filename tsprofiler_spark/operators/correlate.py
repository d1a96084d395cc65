"""Cross-variable correlation per series, exact-integer-moment formulation.

The reference profiles several metrics per time-step side by side
(example-159 runs 3 TSInputMetrics) but never relates them; the natural
next analytic over the same series is Pearson correlation per series
between two per-turn quantities — by default metric value vs turn
position, i.e. a TREND detector (do assistant turns get longer as the
conversation progresses?).

Spark shape: ONE hash aggregation on the series key — no join, no window,
no UDF; both variables are projected from the same row, so the
aggregation sees each turn once.

Determinism across engines is by construction (same discipline as
operators/rollup.anomaly_zscore): both variables are exact integers per
turn, all five moments are INTEGER sums (order-independent under partial
aggregation; magnitudes stay far below 2^53 for any realistic series
cardinality), and r is one fixed scalar IEEE expression over those exact
moments — bit-identical on Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsprofiler_spark.operators.ingest import SERIES_COLS


def metric_corr(
    transcripts: DataFrame,
    x: Column | None = None,
    y: Column | None = None,
) -> DataFrame:
    """Per-series Pearson r between two exact-integer per-turn variables.

    Defaults: ``x = length(text)`` (the profiled metric), ``y = turn_idx``
    (position) — r > 0 means the series trends longer over the
    conversation. Both expressions MUST be integer-valued for the
    determinism contract to hold (the moments are summed as BIGINT).

    Output: series key, n, the five integer moments, and ``r`` (NULL when
    either variance is zero or n < 2).
    """
    x = F.length("text").cast("long") if x is None else x.cast("long")
    y = F.col("turn_idx").cast("long") if y is None else y.cast("long")
    base = transcripts.select(*SERIES_COLS, x.alias("x"), y.alias("y"))
    g = base.groupBy(*SERIES_COLS).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / n
    var_x = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / n
    var_y = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / n
    r = cov_n / (F.sqrt(var_x) * F.sqrt(var_y))
    return g.select(
        *SERIES_COLS,
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        F.when((F.col("n") > 1) & (var_x > 0) & (var_y > 0), r).alias("r"),
    )
