"""Parquet/Iceberg table loaders for the driver test data."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Iceberg identifiers (``catalog.db.table``) are
    read through the catalog on real clusters; paths read parquet."""
    if "." in name and not name.endswith(".parquet"):
        return spark.read.format("iceberg").load(name)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
