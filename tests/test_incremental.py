"""Batch-incremental ER (plans/incremental.py): exact equivalence with a
full rebuild on the fixtures, chained increments, exact-dup adoption,
state guards, and resume interop after an increment."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sbb_ned_spark.config import PipelineConfig
from sbb_ned_spark.plans import incremental as I
from sbb_ned_spark.plans import pipeline as P


def _split(files, mod: int, cut: int):
    """Deterministic disjoint split on the id-deriving columns — entities
    get sliced across the parts (the interesting incremental case)."""
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(mod))
    return files.filter(h < cut), files.filter(h >= cut)


def _assign(clusters) -> dict:
    return {r["record_id"]: r["cluster_id"] for r in clusters.collect()}


def test_incremental_equals_full_rebuild(spark, tiny_files, tiny_truth, tmp_path):
    a, b = _split(tiny_files, 10, 7)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    full = P.run_pipeline(tiny_files, PipelineConfig())
    want = _assign(full.clusters)
    full.unpersist_all()

    P.run_pipeline(a, cfg)
    res = I.incremental_update(b, cfg)
    got = _assign(res.clusters)
    assert got == want
    # and the planted ground truth still holds end to end
    members, lp = tiny_truth
    q = P.pairwise_f1(res.clusters, spark.createDataFrame(lp))
    assert q["f1"] == 1.0, q
    res.unpersist_all()


def test_incremental_chained_batches(spark, tiny_files, tmp_path):
    """A, then +B, then +C must equal the one-shot rebuild of A∪B∪C."""
    ab, c = _split(tiny_files, 10, 8)
    a, b = _split(ab, 7, 4)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    want = _assign(P.run_pipeline(tiny_files, PipelineConfig()).clusters)

    P.run_pipeline(a, cfg)
    I.incremental_update(b, cfg).unpersist_all()
    res = I.incremental_update(c, cfg)
    assert _assign(res.clusters) == want
    res.unpersist_all()


def test_incremental_exact_adoption_skips_features(spark, tiny_files, tmp_path):
    """A batch that is byte-identical to old content joins the old sha
    groups with ZERO delta feature rows / pairs / scores."""
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    base = P.run_pipeline(tiny_files, cfg)
    want = _assign(base.clusters)

    dup = (
        tiny_files.limit(5)
        .drop("record_id", "sha256")  # re-derive from the new path
        .withColumn("path", F.concat(F.col("path"), F.lit(".copy")))
    )
    res = I.incremental_update(dup, cfg)
    m = {x["stage"]: x["rows_out"] for x in res.metrics}
    assert m["delta_exact_groups"] == 5
    assert m["delta_features"] == 0 and m["delta_pair_scores"] == 0
    got = _assign(res.clusters)
    assert sum(1 for k in got if k not in want) == 5
    # each copy landed in the SAME cluster as its original (labels may
    # legitimately shift when a copy's id undercuts the old cluster min)
    import hashlib

    for r in tiny_files.limit(5).collect():
        copy_id = hashlib.sha256(
            "\x1f".join([r["repo"], r["path"] + ".copy", r["commit"]]).encode()
        ).hexdigest()
        assert got[copy_id] == got[r["record_id"]]
    # partition structure over the OLD records is untouched
    import collections

    def parts(m, keys):
        g = collections.defaultdict(set)
        for k in keys:
            g[m[k]].add(k)
        return {frozenset(s) for s in g.values()}

    assert parts(got, want.keys()) == parts(want, want.keys())
    res.unpersist_all()


def test_incremental_requires_prior_state(spark, tiny_files, tmp_path):
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="no valid prior state"):
        I.incremental_update(tiny_files, cfg)


def test_incremental_rejects_config_change(spark, tiny_files, tmp_path):
    root = str(tmp_path / "st")
    a, b = _split(tiny_files, 10, 7)
    P.run_pipeline(a, PipelineConfig(checkpoint_dir=root))
    with pytest.raises(ValueError, match="no valid prior state"):
        I.incremental_update(b, PipelineConfig(checkpoint_dir=root, decision_threshold=0.7))


def test_incremental_rejects_id_collision(spark, tiny_files, tmp_path):
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    P.run_pipeline(tiny_files, cfg)
    with pytest.raises(ValueError, match="already"):
        I.incremental_update(tiny_files.limit(1), cfg)


def test_full_resume_after_increment_reuses_features(spark, tiny_files, tmp_path):
    """After an increment the state chain is exact_groups→features→clusters;
    a full resume over A∪B reuses those and recomputes ONLY the
    invalidated pair-level stages — and lands on the same PARTITION.
    (Labels may differ: the resumed run labels by representative minimum,
    and under an incremental state a cluster's global-min record id can
    be an ADOPTED exact-duplicate rather than a representative — the
    incremental relabel pass restores the global-min convention, the
    plain resume does not. See plans/incremental.py §6.)"""
    import collections

    a, b = _split(tiny_files, 10, 7)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    P.run_pipeline(a, cfg)
    inc = I.incremental_update(b, cfg)
    want = _assign(inc.clusters)

    res = P.run_pipeline(tiny_files, cfg, resume=True)
    recomputed = {m["stage"] for m in res.metrics}
    assert "features" not in recomputed and "exact_groups" not in recomputed
    assert "candidate_pairs" in recomputed  # invalidated by the increment
    got = _assign(res.clusters)

    def parts(m):
        g = collections.defaultdict(set)
        for k, v in m.items():
            g[v].add(k)
        return {frozenset(s) for s in g.values()}

    assert parts(got) == parts(want)
    res.unpersist_all()


def test_incremental_rejects_in_batch_duplicate_ids(spark, tiny_files, tmp_path):
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    a, b = _split(tiny_files, 10, 7)
    P.run_pipeline(a, cfg)
    doubled = b.limit(1).unionByName(b.limit(1))
    with pytest.raises(ValueError, match="duplicate record_id in batch"):
        I.incremental_update(doubled, cfg)


def test_crash_between_swap_and_appends_fails_loudly(spark, tiny_files, tmp_path, monkeypatch):
    """ADVICE r5 high: a crash after the clusters swap but before the
    features append must leave a PRESENT-but-INVALID clusters manifest —
    the next ingest neither bootstraps (prior corpus preserved) nor
    validates (inconsistent state), it raises."""
    from sbb_ned_spark.sources.catalog import ParquetCatalog
    from sbb_ned_spark.streaming import er_ingest

    a, b = _split(tiny_files, 10, 7)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    P.run_pipeline(a, cfg)

    orig = ParquetCatalog.write_table

    def crash_on_append(self, df, name, mode="overwrite", partition_by=()):
        if name == "features" and mode == "append":
            raise RuntimeError("simulated crash before the features append")
        return orig(self, df, name, mode=mode, partition_by=partition_by)

    monkeypatch.setattr(ParquetCatalog, "write_table", crash_on_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        I.incremental_update(b, cfg)
    monkeypatch.undo()

    # manifest is present (no bootstrap) but invalid (no silent resume)
    from sbb_ned_spark.sources.catalog import get_catalog

    catalog = get_catalog(spark, cfg.checkpoint_dir)
    m = catalog.read_manifest("clusters")
    assert m is not None and m.get("invalidated_by") == "incremental_update_in_progress"
    with pytest.raises(ValueError):
        I._validate_state(catalog, cfg)
    with pytest.raises(ValueError):
        er_ingest.ingest_batch(b, cfg)


def test_ingest_refuses_bootstrap_over_swap_artifacts(spark, tiny_files, tmp_path):
    """ADVICE r5 medium: the between-renames window of _replace_table can
    leave no clusters dir but always leaves a manifest-bearing
    clusters__old — ingest_batch must refuse to bootstrap over it."""
    import shutil as sh

    from sbb_ned_spark.sources.catalog import get_catalog
    from sbb_ned_spark.streaming import er_ingest

    a, b = _split(tiny_files, 10, 7)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "st"))
    P.run_pipeline(a, cfg)
    catalog = get_catalog(spark, cfg.checkpoint_dir)
    # simulate the crash instant between the two renames
    sh.move(catalog._path("clusters"), catalog._path("clusters__old"))
    assert catalog.read_manifest("clusters") is None
    with pytest.raises(ValueError, match="swap artifact"):
        er_ingest.ingest_batch(b, cfg)
