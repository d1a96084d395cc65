"""Real uncompressed-format decoders: PPM/P6 (pure numpy) and PCM16 WAV
(stdlib wave). Parser unit tests are Spark-free; the roundtrip tests pin
synthesize -> binary column -> decode_features == direct recomputation.
"""

import io
import wave

import numpy as np
import pytest

from tsprofiler_spark.operators.multimodal import (
    _parse_ppm,
    _parse_wav,
    decode_features,
    synthesize_ppm_payloads,
    synthesize_wav_payloads,
)

PX = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])


def test_parse_ppm_known_image():
    f = _parse_ppm(np.frombuffer(b"P6\n2 2\n255\n" + PX, dtype=np.uint8))
    assert f == [2.0, 2.0, 220.0, 260.0, 300.0]


def test_parse_ppm_comments_and_whitespace():
    hdr = b"P6 # comment\n# another line\n 2\t2\n255\n"
    assert _parse_ppm(np.frombuffer(hdr + PX, dtype=np.uint8)) == [
        2.0, 2.0, 220.0, 260.0, 300.0,
    ]


def test_parse_ppm_rejects_truncated_and_foreign():
    with pytest.raises(ValueError):
        _parse_ppm(np.frombuffer(b"P6\n2 2\n255\n" + PX[:5], dtype=np.uint8))
    with pytest.raises(ValueError):
        _parse_ppm(np.frombuffer(b"JFIF....", dtype=np.uint8))


def test_parse_wav_signed_samples():
    samples = np.array([0, 1, -1, 32767, -32768, 123], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    assert _parse_wav(buf.getvalue()) == [1.0, 8000.0, 6.0, 122.0, 65660.0]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "key agg row scan slow fast table value"),
        (1, "batch window spark order data column"),
        (2, "x"),  # shorter than one pixel row: tiling must still fill 768 bytes
        (3, ""),  # empty after sanitize: dropped by both synthesizers
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ppm_roundtrip_matches_direct_recomputation(spark, docs):
    out = {
        r["doc_id"]: r
        for r in decode_features(synthesize_ppm_payloads(docs)).collect()
    }
    assert set(out) == {0, 1, 2}  # empty doc dropped
    for doc_id, text in [(0, "key agg row scan slow fast table value"), (2, "x")]:
        t = text.encode()
        tiled = (t * (768 // len(t) + 1))[:768]
        arr = np.frombuffer(tiled, dtype=np.uint8).astype(int).reshape(-1, 3)
        got = out[doc_id]
        assert got["decoder"] == "ppm-numpy"
        assert got["features"] == [
            16.0, 16.0,
            float(arr[:, 0].sum()), float(arr[:, 1].sum()), float(arr[:, 2].sum()),
        ]


def test_wav_roundtrip_matches_direct_recomputation(spark, docs):
    out = {
        r["doc_id"]: r
        for r in decode_features(synthesize_wav_payloads(docs)).collect()
    }
    assert set(out) == {0, 1, 2}
    t = b"x"
    raw = (t * 1025)[:1024]
    samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    got = out[2]
    assert got["decoder"] == "wav-stdlib"
    assert got["features"] == [
        1.0, 8000.0, 512.0, float(samples.sum()), float(np.abs(samples).sum()),
    ]
