"""End-to-end 3-stage ER pipeline with stage checkpointing, resume,
per-partition lineage and a durable metrics table.

Replaces the reference's hand-wired queue pipeline
(`/root/reference/qurator/sbb_ned/models/ned_lookup.py:159-173` — 7
chained JobQueues) with four declarative DataFrame stages whose only
barriers are Spark shuffles. Resumability (the reference's
`start_iteration` analog, `embeddings/base.py:286-289`) is stage-level:
each stage writes a parquet checkpoint + manifest; a re-run skips
completed stages (north_rule: resumable from checkpoint).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbb_ned_spark.config import DEFAULT_CONFIG, PipelineConfig
from sbb_ned_spark.operators import blocking, clustering, scoring

STAGES = ("features", "blocking_keys", "candidate_pairs", "pair_scores", "clusters")


@dataclass
class PipelineResult:
    clusters: DataFrame
    scores: DataFrame
    metrics: list[dict] = field(default_factory=list)


def _ckpt_path(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def _is_complete(root: str | None, stage: str) -> bool:
    if not root:
        return False
    return os.path.exists(os.path.join(_ckpt_path(root, stage), "_MANIFEST.json"))


def _write_stage(df: DataFrame, root: str | None, stage: str, meta: dict) -> DataFrame:
    """Checkpoint a stage to parquet + manifest; return the re-read frame
    (truncates lineage, makes downstream stages resume-identical)."""
    if not root:
        # no durable checkpoint requested: cache so the stage-boundary
        # count() and downstream stages don't recompute the Arrow UDF lineage
        return df.persist()
    path = _ckpt_path(root, stage)
    df.write.mode("overwrite").parquet(path)
    manifest = {"stage": stage, **meta}
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return df.sparkSession.read.parquet(path)


def _read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(_ckpt_path(root, stage))


def _partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts — the durable analog of the reference's
    tqdm progress counters (`ground_truth/clef_hipe_2022.py:355-368`)."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count("*").alias("rows"))
        .withColumn("stage", F.lit(stage))
        .select("stage", "partition_id", "rows")
    )


def run_pipeline(
    files: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = False,
    scoring_method: str = "mapInPandas",
    collect_lineage: bool = False,
    light: bool = False,
) -> PipelineResult:
    """``light=True`` skips the per-stage count() barriers (rows_out=None):
    stages persist lazily and materialize on first downstream use, removing
    four serial passes — the benchmark mode. Durable checkpoints imply the
    counts anyway (the parquet write is a full pass)."""
    spark = files.sparkSession
    root = config.checkpoint_dir
    metrics: list[dict] = []
    lineage_frames: list[DataFrame] = []

    def timed(stage: str, fn, rows_in: int | None = None):
        t0 = time.monotonic()
        df = fn()
        df = _write_stage(df, root, stage, {"config_threshold": config.decision_threshold})
        n = None
        if not light or root:
            n = df.count()
        metrics.append(
            {
                "stage": stage,
                "rows_in": rows_in,
                "rows_out": n,
                "wall_ms": int((time.monotonic() - t0) * 1000),
            }
        )
        if collect_lineage:
            lineage_frames.append(_partition_lineage(df, stage))
        return df, n

    # ---- Stage 1a: features ------------------------------------------------
    if resume and _is_complete(root, "features"):
        feats = _read_stage(spark, root, "features")
        n_files = feats.count()
    else:
        feats, n_files = timed("features", lambda: blocking.record_features(files, config))

    # ---- Stage 1b: blocking keys (with hot-key cutoff) ----------------------
    if resume and _is_complete(root, "blocking_keys"):
        cold = _read_stage(spark, root, "blocking_keys")
    else:
        keys = blocking.blocking_keys(feats, config)
        cold_raw, hot = blocking.split_hot_keys(keys, config)
        hot_n = None if light else hot.count()
        cold, _ = timed("blocking_keys", lambda: cold_raw, rows_in=n_files)
        metrics[-1]["hot_keys_dropped"] = hot_n

    # ---- Stage 1c: candidate pairs -------------------------------------------
    if resume and _is_complete(root, "candidate_pairs"):
        pairs = _read_stage(spark, root, "candidate_pairs")
    else:
        pairs, _ = timed(
            "candidate_pairs", lambda: blocking.candidate_pairs(cold, config), rows_in=n_files
        )

    # ---- Stage 2: pairwise scoring -------------------------------------------
    if resume and _is_complete(root, "pair_scores"):
        scores = _read_stage(spark, root, "pair_scores")
    else:
        scores, _ = timed(
            "pair_scores",
            lambda: scoring.score_pairs(pairs, feats, config, method=scoring_method),
            rows_in=n_files,
        )

    # ---- Stage 3: decision + connected components -----------------------------
    if resume and _is_complete(root, "clusters"):
        clusters = _read_stage(spark, root, "clusters")
    else:
        def build_clusters():
            edges = clustering.accepted_edges(scores, config)
            return clustering.connected_components(edges, feats, config)

        clusters, _ = timed("clusters", build_clusters, rows_in=n_files)

    if root:
        with open(os.path.join(root, "metrics.json"), "w") as f:
            json.dump(metrics, f, sort_keys=True, indent=1)
        if lineage_frames:
            lineage = lineage_frames[0]
            for lf in lineage_frames[1:]:
                lineage = lineage.unionByName(lf)
            lineage.write.mode("overwrite").parquet(os.path.join(root, "lineage"))

    return PipelineResult(clusters=clusters, scores=scores, metrics=metrics)


# ---------------------------------------------------------------------------
# Quality harness: pairwise P/R/F1 vs labeled pairs (BASELINE.md gate)
# ---------------------------------------------------------------------------

def pairwise_f1(clusters: DataFrame, labeled_pairs: DataFrame) -> dict:
    """Predict 'same entity' iff both ids land in the same cluster; score
    against labeled pairs (the HIPE-scorer analog, SURVEY.md §5.1)."""
    ca = clusters.select(
        F.col("record_id").alias("id_a"), F.col("cluster_id").alias("cl_a")
    )
    cb = clusters.select(
        F.col("record_id").alias("id_b"), F.col("cluster_id").alias("cl_b")
    )
    joined = labeled_pairs.join(ca, "id_a").join(cb, "id_b")
    agg = joined.agg(
        F.sum(((F.col("cl_a") == F.col("cl_b")) & (F.col("label") == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("cl_a") == F.col("cl_b")) & (F.col("label") == 0)).cast("int")).alias("fp"),
        F.sum(((F.col("cl_a") != F.col("cl_b")) & (F.col("label") == 1)).cast("int")).alias("fn"),
        F.count("*").alias("n_pairs"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"]), int(agg["fp"]), int(agg["fn"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pairs": int(agg["n_pairs"]),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
