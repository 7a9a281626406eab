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


def _mp4(duration: int, timescale: int = 1000, version: int = 0) -> bytes:
    if version == 1:
        mvhd_body = (
            struct.pack(">I", 1 << 24)           # version 1 + flags
            + struct.pack(">QQ", 0, 0)           # ctime/mtime (64-bit)
            + struct.pack(">I", timescale)
            + struct.pack(">Q", duration)
        )
    else:
        mvhd_body = (
            struct.pack(">I", 0)                 # version 0 + flags
            + struct.pack(">II", 0, 0)           # ctime/mtime
            + struct.pack(">II", timescale, duration)
        )
    mvhd_body += b"\x00" * 80                    # rate/volume/matrix/next-track
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    return ftyp + moov


def test_mp4_mvhd_roundtrip():
    assert mm.decode_mp4_duration(_mp4(2500)) == 2500
    assert mm.decode_mp4_duration(_mp4(90000, timescale=90000)) == 1000
    assert mm.decode_mp4_duration(_mp4(7, version=1)) == 7
    assert mm.decode_blob(_mp4(42), "video") == (None, None, 42)


def test_mp4_malformed_raises_valueerror_not_struct_error():
    full = _mp4(1234)
    with pytest.raises(ValueError):
        mm.decode_mp4_duration(b"\x00\x00\x00\x18ftypmp42")  # no moov
    for cut in (40, 45, 51):  # inside the mvhd fixed fields (end at 52)
        with pytest.raises(ValueError):
            mm.decode_mp4_duration(full[:cut])
    # at exactly the end of the fixed fields the parser trusts the declared
    # box size (header-only blob contract, same as the WAV data chunk)
    assert mm.decode_mp4_duration(full[:52]) == 1234
    with pytest.raises(ValueError):
        mm.decode_mp4_duration(_mp4(5, timescale=0))
    assert mm.decode_blob(full[:40], "video") == (None, None, None)


def test_spark_encode_decode_end_to_end(spark):
    df = spark.range(0, 66).select(F.col("id").alias("doc_id"))
    decoded = mm.decode_features(mm.synthesize_media(df, "doc_id"))
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 66
    for i in range(66):
        r = rows[str(i)]
        if i % 3 == 0:
            assert r["kind"] == "image"
            assert r["width"] == 1 + i % 512
            assert r["height"] == 1 + i % 384
            assert r["duration_ms"] is None
            assert r["n_bytes"] == 33
        elif i % 3 == 1:
            assert r["kind"] == "audio"
            assert r["duration_ms"] == 1 + i % 5000
            assert r["width"] is None
            assert r["n_bytes"] == 44
        else:
            assert r["kind"] == "video"
            assert r["duration_ms"] == 1 + i % 9000
            assert r["width"] is None
            assert r["height"] is None
            assert r["n_bytes"] == 132


def test_stub_features_still_deterministic(spark, tiny_files):
    media = mm.to_media_table(tiny_files.limit(5), "record_id", "content")
    out1 = sorted(mm.extract_features(media, stub=True).collect())
    out2 = sorted(mm.extract_features(media, stub=True).collect())
    assert out1 == out2
