"""Deterministic sampling / split-assignment operators.

Training-data pipelines need reproducible corpus partitioning that is
stable across runs, engines, and cluster sizes — `df.sample()` is
seed-dependent on partitioning and unusable for train/val/test fences.
Both operators here key every decision on the cross-engine content hash
`h32` (functions/hashing.py), so the assignment of a given doc is a pure
function of its id: re-runs, backfills, and the DuckDB oracle all agree
row-for-row.

Plan shape for 100 TB: both are single-pass narrow projections/filters —
no shuffle, no state, trivially partition-parallel; Catalyst pushes the
sample filter into the scan pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsprofiler_spark.functions.hashing import h32


def hash_split(
    documents: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign every doc to train/val/test by hash bucket (0-99).

    bucket = h32(id) mod 100; [0, train) -> train, [train, train+val) ->
    val, rest -> test. Deterministic, engine-portable, and stable under
    any repartitioning. Returns (doc_id, bucket, split).
    """
    bucket = F.pmod(h32(F.col(id_col).cast("string")), F.lit(100)).cast("int")
    return documents.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance languages).

    Keeps a doc iff h32(stratum || ':' || id) mod denom < fraction*denom
    for its stratum — an exact-rate, reproducible Bernoulli sample that
    needs no shuffle and no RNG state. Unlisted strata use
    ``default_fraction``. Returns (doc_id, <strat_col>).

    NULL strata hash and threshold as the empty-string sentinel (so a NULL
    stratum is sampled at ``default_fraction`` instead of silently dropped
    by NULL-propagating string concat), and thresholds use round() so
    fractions that are not exactly binary-representable (0.29) still give
    the documented keep-rate.
    """
    strat = F.coalesce(F.col(strat_col).cast("string"), F.lit(""))
    h = F.pmod(
        h32(F.concat_ws(":", strat, F.col(id_col).cast("string"))),
        F.lit(denom),
    )
    thresh = F.lit(round(default_fraction * denom))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(strat == value, F.lit(round(frac * denom))).otherwise(thresh)
    return documents.where(h < thresh).select(id_col, strat_col)
