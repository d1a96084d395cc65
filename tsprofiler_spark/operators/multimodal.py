"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as `binary` columns with a metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched pandas
UDFs over `mapInPandas`.

Decode coverage is split by what the container can honestly do:

* **Uncompressed formats decode for real, zero extra dependencies** —
  PPM/P6 images are parsed with pure numpy (`_parse_ppm`) and PCM16 WAV
  audio with stdlib ``wave`` (`_parse_wav`). `decode_features` sniffs the
  payload magic (``P6\\n`` / ``RIFF..WAVE``) and routes to these parsers;
  the `decoder` column records which path ran. Deterministic payloads for
  both come from `synthesize_ppm_payloads` / `synthesize_wav_payloads`
  (built from the documents corpus, no external data), so the full
  encode→binary-column→real-parse→feature path is value-checked against a
  DuckDB oracle that recomputes the features from the construction.
* **Compressed formats (JPEG/MP4/...) stay honestly stubbed** — PIL /
  ffmpeg are NOT in this container, so unknown payloads fall back to a
  deterministic byte-histogram fake (clearly marked ``stub-bytehist``).
  The Spark-side plumbing — schema, partitioning, UDF signature, Arrow
  batch shape — is identical to what the real decoders use.
"""

from __future__ import annotations

import io
import wave

import numpy as np
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


_ASCII_ONLY = "[^ -~]"  # strip non-printable/non-ASCII so byte == char (both engines)


def synthesize_ppm_payloads(
    documents: DataFrame, width: int = 16, height: int = 16
) -> DataFrame:
    """Deterministic REAL PPM/P6 images from the documents corpus.

    Pure JVM expressions: the pixel plane is the ASCII-sanitized text
    repeated/truncated to ``width*height*3`` bytes, prefixed with a
    standard ``P6`` header. The result is a valid image any PPM reader
    accepts — so `decode_features` exercises a genuine binary parser, and
    a DuckDB oracle can recompute the per-channel sums from the same
    modular indexing. Docs whose sanitized text is empty are dropped (no
    pixels to tile)."""
    n_px = width * height * 3
    header = f"P6\n{width} {height}\n255\n"
    t = F.regexp_replace(F.col("text"), _ASCII_ONLY, "")
    d = documents.select("doc_id", t.alias("t")).where(F.length("t") > 0)
    pixels = F.expr(f"substring(repeat(t, CAST(ceil({n_px} / length(t)) AS INT)), 1, {n_px})")
    payload = F.concat(F.encode(F.lit(header), "utf-8"), F.encode(pixels, "utf-8"))
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
        ).alias("meta"),
    )


def synthesize_wav_payloads(
    documents: DataFrame, n_samples: int = 512, framerate: int = 8000
) -> DataFrame:
    """Deterministic REAL mono PCM16 WAV clips from the documents corpus.

    The sample plane is the ASCII-sanitized text repeated/truncated to
    ``2*n_samples`` bytes interpreted as little-endian int16; stdlib
    ``wave`` writes the container, so `decode_features` exercises genuine
    RIFF/WAVE framing. Synthesis runs in an Arrow-batched pandas UDF (it
    is a fixture/demo path — the engine-side contract is the binary
    column, not this writer)."""
    import re

    pat = re.compile(r"[^ -~]")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("modality", StringType()),
                        StructField("n_bytes", LongType()),
                        StructField("width", IntegerType()),
                        StructField("height", IntegerType()),
                    ]
                ),
            ),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = pat.sub("", text or "").encode("ascii")
                if not t:
                    continue
                raw = (t * (2 * n_samples // len(t) + 1))[: 2 * n_samples]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(framerate)
                    w.writeframes(raw)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": buf.getvalue(),
                        "meta": {
                            "modality": "audio",
                            "n_bytes": len(buf.getvalue()),
                            "width": 0,
                            "height": 0,
                        },
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(run, out_schema)


def _parse_ppm(data: np.ndarray) -> list[float]:
    """Real PPM/P6 parser, pure numpy: header tokens (magic, width, height,
    maxval — any whitespace separators, '#' comments skipped) then one
    whitespace byte, then the raw RGB plane. Returns
    [width, height, sum_r, sum_g, sum_b] (sums exact in float64)."""
    if data[:2].tobytes() != b"P6":
        raise ValueError("not a P6 ppm")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and chr(data[i]).isspace():
            i += 1
        if i < len(data) and data[i] == ord("#"):
            while i < len(data) and data[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(data) and not chr(data[j]).isspace():
            j += 1
        tokens.append(int(data[i:j].tobytes()))
        i = j
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = data[i : i + w * h * 3].astype(np.int64).reshape(-1, 3)
    if px.shape[0] != w * h:
        raise ValueError("truncated pixel plane")
    sums = px.sum(axis=0)
    return [float(w), float(h), float(sums[0]), float(sums[1]), float(sums[2])]


def _parse_wav(raw: bytes) -> list[float]:
    """Real PCM16 WAV parser via stdlib wave. Returns
    [n_channels, framerate, n_frames, sum_samples, sum_abs_samples]."""
    with wave.open(io.BytesIO(raw), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        frames = w.readframes(w.getnframes())
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        return [
            float(w.getnchannels()),
            float(w.getframerate()),
            float(w.getnframes()),
            float(samples.sum()),
            float(np.abs(samples).sum()),
        ]


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("decoder", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_features(
    payloads: DataFrame, n_features: int = 16, compressed_decoder: str = "stub"
) -> DataFrame:
    """Decode + feature-extract, routed by payload magic:

    * ``P6\\n``           → real PPM parse, pure numpy (`_parse_ppm`)
    * ``RIFF....WAVE``    → real PCM16 WAV parse, stdlib wave (`_parse_wav`)
    * anything else       → the deterministic normalized byte-histogram
      fake, marked ``stub-bytehist`` in the `decoder` column.

    ``compressed_decoder="pil"`` is the explicit opt-in hook where a real
    deployment wires Pillow/ffmpeg for compressed formats; it is honestly
    NOT implemented here (no image libs in this container) and raises.
    The default never import-probes the environment, so the same job
    produces the same output on any cluster image.
    """
    if compressed_decoder not in ("stub", "pil"):
        raise ValueError(f"unknown compressed_decoder: {compressed_decoder!r}")
    if compressed_decoder == "pil":
        raise NotImplementedError(
            "compressed-format decode (PIL/ffmpeg) is not implemented in "
            "this container; use compressed_decoder='stub'"
        )

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                blob = bytes(payload)
                data = np.frombuffer(blob, dtype=np.uint8)
                if blob[:3] == b"P6\n":
                    decoder = "ppm-numpy"
                    feats = _parse_ppm(data)
                elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                    decoder = "wav-stdlib"
                    feats = _parse_wav(blob)
                else:
                    # deterministic fake: normalized byte histogram buckets
                    decoder = "stub-bytehist"
                    hist, _ = np.histogram(data, bins=n_features, range=(0, 256))
                    feats = (hist / max(len(data), 1)).astype(np.float64).tolist()
                out.append(
                    {
                        "doc_id": doc_id,
                        "modality": meta["modality"],
                        "n_bytes": int(meta["n_bytes"]),
                        "decoder": decoder,
                        "features": list(feats),
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
    keep the FIRST min(max_frames, payload//frame) contiguous ones — a
    head sample, not a stride across the payload (the real operator would
    seek keyframes via ffmpeg; the driver oracle pins this exact slicing)."""

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
