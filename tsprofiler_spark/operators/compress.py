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
    """(series, tier, bucket_start, avg) -> one binary segment per day.

    The group-and-sort runs JVM-side (``groupBy`` + ``array_sort(collect_list
    (struct(ts, avg)))`` — whole-stage codegen, one shuffle); Python only sees
    one Arrow batch of many pre-sorted segments via ``mapInPandas`` and walks
    numpy arrays per segment. This beats a per-group ``applyInPandas`` by
    ~an order of magnitude at high segment counts: no pandas group-splitting,
    no per-group DataFrame construction.
    """

    def encode_batches(batches):
        import numpy as np

        from tsprofiler_spark.codec.vectorized import dod_encode_many, gorilla_encode_many

        for pdf in batches:
            ts_segs = [
                np.asarray(a, dtype="datetime64[us]").astype("int64")
                for a in pdf["ts_arr"]
            ]
            val_segs = [np.asarray(a, dtype=np.float64) for a in pdf["val_arr"]]
            lengths = np.fromiter((len(a) for a in val_segs), dtype=np.int64, count=len(val_segs))
            ts_cat = np.concatenate(ts_segs) if ts_segs else np.zeros(0, np.int64)
            val_cat = np.concatenate(val_segs) if val_segs else np.zeros(0, np.float64)
            # whole-batch vectorized encode: every segment in one numpy pass
            ts_dod = dod_encode_many(ts_cat, lengths)
            gor = gorilla_encode_many(val_cat, lengths)
            out = pdf[["conv_id", "tool", "role", "metric", "tier", "seg_day"]].copy()
            out["n_points"] = lengths
            out["ts_dod"] = ts_dod
            out["points_gorilla"] = gor
            yield out

    with_day = tier_df.withColumn("seg_day", F.date_trunc("day", "bucket_start"))
    grouped = with_day.groupBy(*SEGMENT_KEY).agg(
        F.array_sort(F.collect_list(F.struct("bucket_start", "avg"))).alias("pts")
    )
    flat = grouped.select(
        *SEGMENT_KEY,
        F.col("pts.bucket_start").alias("ts_arr"),
        F.col("pts.avg").alias("val_arr"),
    )
    return flat.mapInPandas(encode_batches, COMPRESSED_SCHEMA)


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
            if not len(pdf):
                continue
            # decode every segment, then build ONE frame for the whole batch
            # (per-row DataFrame construction + concat costs more than the
            # bit decode itself at high segment counts)
            ts_parts = [dod_decode(bytes(b)) for b in pdf["ts_dod"]]
            val_parts = [gorilla_decode(bytes(b)) for b in pdf["points_gorilla"]]
            lengths = np.fromiter(
                (len(v) for v in val_parts), dtype=np.int64, count=len(val_parts)
            )
            out = {
                col: np.repeat(pdf[col].to_numpy(), lengths)
                for col in ("conv_id", "tool", "role", "metric", "tier")
            }
            out["bucket_start"] = pd.to_datetime(
                np.concatenate(ts_parts) if ts_parts else np.zeros(0, np.int64),
                unit="us",
            )
            out["avg"] = (
                np.concatenate(val_parts) if val_parts else np.zeros(0, np.float64)
            )
            if lengths.sum():
                yield pd.DataFrame(out)

    return compressed.mapInPandas(decode, DECOMPRESSED_SCHEMA)
