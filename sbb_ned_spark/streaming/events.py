"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.9) — its closest
analog is the bounded-buffer generator pipeline
(`/root/reference/qurator/sbb_ned/models/jobs.py:114-348`), which Spark's
micro-batch execution subsumes. This module provides the streaming
entry points a training-data pipeline at scale would bolt on:

- ``incremental_ingest``  : file-source stream over a landing directory ->
  the same record_features projection as batch Stage 1 (the resumable
  scan analog, `embeddings/base.py:286-289`, with checkpointed offsets).
- ``windowed_event_counts``: watermarked tumbling-window aggregation over
  an event stream (late data bounded by the watermark).

Both run under ``trigger(availableNow=True)`` in tests — identical code
paths to a continuous deployment, but terminating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbb_ned_spark.config import DEFAULT_CONFIG, PipelineConfig
from sbb_ned_spark.operators.blocking import record_features

FILES_DDL = "repo string, path string, commit string, lang string, content string"


def incremental_ingest(
    spark: SparkSession,
    landing_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """readStream over a parquet landing dir -> per-record features.

    At scale this is the continuous front half of Stage 1: new repo
    snapshots land as parquet, features are appended incrementally, and
    the blocking/scoring stages run batch over the accumulated feature
    table (the lambda-architecture shape the reference approximates with
    `start_iteration` resumable scans)."""
    stream = spark.readStream.schema(FILES_DDL).parquet(landing_dir)
    return record_features(stream, config)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    rows — the standard streaming agg shape (no reference analog; added
    for pipeline completeness)."""
    # watermarks require TIMESTAMP (with timezone); parquet NTZ is cast
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, out_dir: str, ckpt_dir: str, mode="append"):
    """Drain everything currently available, then stop (test/batch-replay
    harness; production drops the trigger for continuous micro-batches)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
