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


def compress_points_colocated(points: DataFrame) -> DataFrame:
    """Zero-shuffle twin of `compress_points` for store-colocated tiers.

    `RollupStore.merge_tiers` writes every staged file segment-contiguous:
    one file per (write task, tier, day) so a (series, metric, tier, day)
    segment never crosses files, locally sorted by segment key +
    bucket_start. Reading such a tier back therefore gives scan partitions
    in which every segment's rows are CONTIGUOUS and time-ordered — the
    groupBy + collect_list exchange in `compress_points` (a full shuffle of
    every rolled point, the codec stage's only exchange) adds nothing. This
    variant streams the Arrow batches of each scan partition, slices
    segments at key-change boundaries (carrying a possibly-split tail
    segment across batches — O(largest segment) memory), and emits the
    byte-identical blobs: within a tier the segment key is unique per
    bucket_start, so sorted-by-ts input yields exactly the arrays
    `array_sort(collect_list(struct(ts, avg)))` produces.

    Preconditions (both guaranteed by the store layout, pinned in tests):
    * equal segment keys are contiguous within a scan partition — holds
      because files are internally sorted and no two files share a segment
      (disjoint series hash ranges per writer task × one day per dir);
    * no segment spans scan partitions — staged files are written well
      under the parquet block size (one row group), and Spark assigns a
      row group to exactly one split by its midpoint, so even a
      maxPartitionBytes smaller than the file cannot tear one apart.
    """

    def encode_stream(batches):
        import numpy as np

        from tsprofiler_spark.codec.vectorized import (
            dod_encode_many,
            gorilla_encode_many,
        )

        key_cols = list(SEGMENT_KEY)
        carry: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            ts = pdf["bucket_start"].to_numpy("datetime64[us]").astype("int64")
            vals = pdf["avg"].to_numpy(np.float64)
            key_codes = (
                (pdf[key_cols] != pdf[key_cols].shift()).any(axis=1).cumsum()
            )
            lengths = key_codes.groupby(key_codes, sort=False).size().to_numpy(
                np.int64
            )
            starts = np.zeros(len(lengths), np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            out = pdf.iloc[starts][key_cols].reset_index(drop=True)
            out["n_points"] = lengths
            out["ts_dod"] = dod_encode_many(ts, lengths)
            out["points_gorilla"] = gorilla_encode_many(vals, lengths)
            return out

        for pdf in batches:
            if not len(pdf):
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # hold back the final segment: it may continue in the next batch
            not_last = (pdf[key_cols] != pdf[key_cols].iloc[-1]).any(axis=1).to_numpy()
            tail_start = int(not_last.nonzero()[0][-1]) + 1 if not_last.any() else 0
            head, carry = pdf.iloc[:tail_start], pdf.iloc[tail_start:]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    with_day = points.withColumn("seg_day", F.date_trunc("day", "bucket_start"))
    cols = [*SEGMENT_KEY, "bucket_start", "avg"]
    return with_day.select(*cols).mapInPandas(encode_stream, COMPRESSED_SCHEMA)


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
