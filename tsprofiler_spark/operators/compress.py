"""Rolled-up point compression: Gorilla XOR values + delta-of-delta
timestamps packed into binary columns, one blob per (series, metric, tier,
day) segment.

Runs as `applyInPandas` (Arrow-batched, vectorized numpy bit packing — no
per-row Python against Spark rows). The inverse (`decompress_points`) uses
`mapInPandas` and is the basis of the codec round-trip correctness query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tsprofiler_spark.operators.ingest import SERIES_COLS

SEGMENT_KEY = SERIES_COLS + ["metric", "tier", "seg_day"]

COMPRESSED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tool", StringType()),
        StructField("role", StringType()),
        StructField("metric", StringType()),
        StructField("tier", StringType()),
        StructField("seg_day", TimestampType()),
        StructField("n_points", IntegerType()),
        StructField("ts_dod", BinaryType()),
        StructField("points_gorilla", BinaryType()),
    ]
)


def compress_points(tier_df: DataFrame) -> DataFrame:
    """(series, tier, bucket_start, avg) -> one binary segment per day."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from tsprofiler_spark.codec import dod_encode, gorilla_encode

        pdf = pdf.sort_values("bucket_start")
        ts = pdf["bucket_start"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = pdf["avg"].to_numpy(dtype=np.float64)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                {
                    "conv_id": first["conv_id"],
                    "tool": first["tool"],
                    "role": first["role"],
                    "metric": first["metric"],
                    "tier": first["tier"],
                    "seg_day": first["seg_day"],
                    "n_points": len(pdf),
                    "ts_dod": dod_encode(ts),
                    "points_gorilla": gorilla_encode(vals),
                }
            ]
        )

    with_day = tier_df.withColumn("seg_day", F.date_trunc("day", "bucket_start"))
    return with_day.groupBy(*SEGMENT_KEY).applyInPandas(encode, COMPRESSED_SCHEMA)


DECOMPRESSED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tool", StringType()),
        StructField("role", StringType()),
        StructField("metric", StringType()),
        StructField("tier", StringType()),
        StructField("bucket_start", TimestampType()),
        StructField("avg", DoubleType()),
    ]
)


def decompress_points(compressed: DataFrame) -> DataFrame:
    """Inverse of compress_points (round-trip identity is tested + driver-checked)."""

    def decode(batches):
        import numpy as np

        from tsprofiler_spark.codec import dod_decode, gorilla_decode

        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ts = dod_decode(bytes(row["ts_dod"]))
                vals = gorilla_decode(bytes(row["points_gorilla"]))
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row["conv_id"],
                            "tool": row["tool"],
                            "role": row["role"],
                            "metric": row["metric"],
                            "tier": row["tier"],
                            "bucket_start": pd.to_datetime(ts, unit="us"),
                            "avg": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return compressed.mapInPandas(decode, DECOMPRESSED_SCHEMA)
