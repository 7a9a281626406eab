"""End-to-end pipeline: F1 gate, sha invariant, resume-from-checkpoint."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from sbb_ned_spark.config import PipelineConfig
from sbb_ned_spark.plans import pipeline as P


def test_f1_gate_tiny(spark, tiny_files, tiny_truth):
    members, lp = tiny_truth
    res = P.run_pipeline(tiny_files, PipelineConfig())
    metrics = P.pairwise_f1(res.clusters, spark.createDataFrame(lp))
    assert metrics["f1"] >= 0.99, metrics
    # clusters must reproduce the planted entity assignment exactly
    truth = spark.createDataFrame(members[["record_id", "entity_id"]])
    wrong = (
        res.clusters.join(truth, "record_id")
        .filter(F.col("cluster_id") != F.col("entity_id"))
        .count()
    )
    assert wrong == 0


def test_every_record_clustered_once(spark, tiny_files):
    res = P.run_pipeline(tiny_files, PipelineConfig())
    n_files = tiny_files.count()
    assert res.clusters.count() == n_files
    assert res.clusters.select("record_id").distinct().count() == n_files


def test_resume_from_checkpoint(spark, tiny_files, tiny_truth, tmp_path):
    """north_rule resumability: a resumed run must produce identical
    clusters without recomputing completed stages."""
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt"))
    res1 = P.run_pipeline(tiny_files, cfg)
    first = sorted((r["record_id"], r["cluster_id"]) for r in res1.clusters.collect())
    assert os.path.exists(str(tmp_path / "ckpt" / "metrics.json"))

    # poison the parquet-stage inputs: resume must NOT touch the raw files
    poisoned = tiny_files.limit(0)
    res2 = P.run_pipeline(poisoned, cfg, resume=True)
    second = sorted((r["record_id"], r["cluster_id"]) for r in res2.clusters.collect())
    assert first == second
    # all stage manifests present
    manifests = glob.glob(str(tmp_path / "ckpt" / "*" / "_MANIFEST.json"))
    assert len(manifests) == len(P.STAGES)


def test_sha_invariant_through_stages(spark, tiny_files):
    """input_hint: content sha256 equality per row through every stage."""
    from sbb_ned_spark.operators import blocking

    feats = blocking.record_features(tiny_files)
    joined = feats.select("record_id", F.col("sha256").alias("stage_sha")).join(
        tiny_files.select("record_id", "sha256"), "record_id"
    )
    assert joined.filter(F.col("stage_sha") != F.col("sha256")).count() == 0


def test_no_per_row_python_udfs():
    """input_hint: vectorized pandas/Arrow UDFs only — no row-at-a-time
    `F.udf(` and no rdd.map in the package source."""
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "sbb_ned_spark"
    for py in pkg.rglob("*.py"):
        src = py.read_text()
        assert "F.udf(" not in src, py
        assert ".rdd.map" not in src, py
        assert "@udf" not in src, py
