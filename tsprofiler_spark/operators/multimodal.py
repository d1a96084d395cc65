"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as `binary` columns with a metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched pandas
UDFs over `mapInPandas`. The actual media decoders (PIL/ffmpeg/librosa) are
NOT in this container, so the decode step is STUBBED: `decode_features`
tries the real library and falls back to a deterministic byte-level fake
(clearly marked), while the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_payload(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Simulate a multimodal lakehouse table: binary payload + metadata.

    At 100 TB the payload column dominates storage — everything downstream
    must prune it unless actually decoding (Catalyst column pruning does
    this for free as long as stages select explicitly).
    """
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).alias("n_bytes"),
            (F.abs(F.xxhash64("doc_id")) % 1920 + 16).cast("int").alias("width"),
            (F.abs(F.xxhash64("doc_id", "doc_id")) % 1080 + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("decoder", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_features(payloads: DataFrame, n_features: int = 16) -> DataFrame:
    """Decode + feature-extract. Real decoder gated behind import-try;
    deterministic byte-histogram fake otherwise (STUB, marked in the
    `decoder` column)."""

    def run(batches):
        import numpy as np

        try:  # real decoder unavailable in this container
            import PIL.Image  # noqa: F401

            decoder = "pil"
        except ImportError:
            decoder = "stub-bytehist"

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                data = np.frombuffer(bytes(row["payload"]), dtype=np.uint8)
                if decoder == "pil":
                    raise NotImplementedError(
                        "real image decode path requires PIL at runtime"
                    )
                # deterministic fake: normalized byte histogram buckets
                hist, _ = np.histogram(data, bins=n_features, range=(0, 256))
                feats = (hist / max(len(data), 1)).astype(np.float64)
                out.append(
                    {
                        "doc_id": row["doc_id"],
                        "modality": row["meta"]["modality"],
                        "n_bytes": int(row["meta"]["n_bytes"]),
                        "decoder": decoder,
                        "features": feats.tolist(),
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(payloads: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling stub: slice the payload into fixed-size 'frames' and
    keep every k-th (the real operator would seek keyframes via ffmpeg)."""

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                blob = bytes(row["payload"])
                for i in range(0, min(max_frames, max(1, len(blob) // every_n_bytes))):
                    out.append(
                        {
                            "doc_id": row["doc_id"],
                            "frame_idx": i,
                            "frame_bytes": blob[i * every_n_bytes : (i + 1) * every_n_bytes],
                        }
                    )
            if out:
                yield pd.DataFrame(out)

    return payloads.mapInPandas(run, FRAME_SCHEMA)
