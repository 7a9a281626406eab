"""Multimodal decode tests: real PNG/WAV header parsing end-to-end through
the Catalyst encode -> mapInPandas decode path, plus poison-blob handling."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from sbb_ned_spark.operators import multimodal as mm


def _png(width: int, height: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", width, height)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )


def _wav(data_size: int, byte_rate: int = 8000) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 1)
        + struct.pack("<II", byte_rate, byte_rate)
        + struct.pack("<HH", 1, 8)
        + b"data"
        + struct.pack("<I", data_size)
    )


def test_png_header_roundtrip():
    assert mm.decode_png_header(_png(640, 480)) == (640, 480)
    assert mm.decode_blob(_png(1, 1), "image") == (1, 1, None)


def test_wav_header_roundtrip():
    assert mm.decode_wav_header(_wav(16000)) == 2000
    assert mm.decode_blob(_wav(8), "audio") == (None, None, 1)


def test_poison_blobs_decode_to_none():
    assert mm.decode_blob(b"", "image") == (None, None, None)
    assert mm.decode_blob(b"not a png at all", "image") == (None, None, None)
    assert mm.decode_blob(_png(2, 2)[:10], "image") == (None, None, None)
    assert mm.decode_blob(b"RIFFxxxx", "audio") == (None, None, None)


def test_wav_truncated_mid_fmt_raises_valueerror_not_struct_error():
    """Contract (ADVICE r2): decode_wav_header raises ValueError for ANY
    malformed blob — a blob truncated between the fmt guard (pos+16) and
    the byte-rate read (pos+20) must not escape as struct.error."""
    full = _wav(8000)
    for cut in (29, 30, 31):  # fmt chunk starts at 12; byte rate at 28..31
        with pytest.raises(ValueError):
            mm.decode_wav_header(full[:cut])


def test_video_kind_is_the_declared_stub():
    # full container decode is the documented NotImplementedError slot
    with pytest.raises(NotImplementedError):
        mm.decode_blob(b"\x00\x00\x00\x18ftypmp42", "video")


def test_spark_encode_decode_end_to_end(spark):
    df = spark.range(0, 64).select(F.col("id").alias("doc_id"))
    decoded = mm.decode_features(mm.synthesize_media(df, "doc_id"))
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 64
    for i in range(64):
        r = rows[str(i)]
        if i % 2 == 0:
            assert r["kind"] == "image"
            assert r["width"] == 1 + i % 512
            assert r["height"] == 1 + i % 384
            assert r["duration_ms"] is None
            assert r["n_bytes"] == 33
        else:
            assert r["kind"] == "audio"
            assert r["duration_ms"] == 1 + i % 5000
            assert r["width"] is None
            assert r["n_bytes"] == 44


def test_stub_features_still_deterministic(spark, tiny_files):
    media = mm.to_media_table(tiny_files.limit(5), "record_id", "content")
    out1 = sorted(mm.extract_features(media, stub=True).collect())
    out2 = sorted(mm.extract_features(media, stub=True).collect())
    assert out1 == out2
