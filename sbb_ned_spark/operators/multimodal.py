"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape through mapInPandas — while the actual media decode is STUBBED
(the sandbox has no image/audio libs): ``decode_stub`` produces
deterministic fake features derived only from the bytes, and
``decode_real`` raises NotImplementedError where a Pillow/ffmpeg call
would go.

At scale: media blobs ride in their own column so Parquet column pruning
keeps them out of metadata-only scans; feature extraction is a narrow
mapInPandas (no shuffle) and the batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` against large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("fake_duration_ms", IntegerType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Build a media table from any string column (test harness: encode the
    text as the 'blob'); real ingestion would read binaryFile sources."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.lit({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]).alias(
            "mime"
        ),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def decode_real(blob: bytes, kind: str):  # pragma: no cover - intentional stub
    """Where PIL.Image.open / soundfile.read / av.open would run."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; extract_features(stub=True) provides the deterministic fake"
    )


def extract_features(media: DataFrame, stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over media blobs.

    The stub derives width/height/duration deterministically from the blob
    bytes (sha-seeded) so tests can assert exact values; swap
    ``decode_real`` in when codecs are available.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            shas, widths, heights, durs = [], [], [], []
            for blob, kind in zip(pdf["blob"], pdf["kind"]):
                raw = bytes(blob) if blob is not None else b""
                if not stub:
                    decode_real(raw, kind)  # pragma: no cover
                digest = hashlib.sha256(raw).hexdigest()
                shas.append(digest)
                seed = int(digest[:8], 16)
                widths.append(64 + seed % 1024)
                heights.append(64 + (seed >> 10) % 1024)
                durs.append(1000 + (seed >> 20) % 60000)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "content_sha": shas,
                    "fake_width": pd.array(widths, dtype="int32"),
                    "fake_height": pd.array(heights, dtype="int32"),
                    "fake_duration_ms": pd.array(durs, dtype="int32"),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
