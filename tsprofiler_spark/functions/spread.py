"""Shared fan-out repartition helper for small-but-heavy inputs."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition a (small, compressed) table across the cluster BEFORE a
    fan-out/hash-heavy projection. Spark sizes scan splits by input bytes,
    so a few-MB parquet of long texts or packed embeddings becomes ONE task
    — and a 100-5000x shingle/token/bit explode with per-row hashing then
    runs single-threaded. One cheap round-robin shuffle of the narrow input
    fixes the parallelism at any scale (at 100 TB the scan is already
    many-split and this is a near-no-op repartition to the same width)."""
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism)
