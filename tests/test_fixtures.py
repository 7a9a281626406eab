"""Fixture generator invariants: determinism, shape, planted structure."""

from __future__ import annotations

from sbb_ned_spark import fixtures


def test_deterministic_generation():
    f1, m1 = fixtures.generate_files_pdf("tiny", seed=42)
    f2, m2 = fixtures.generate_files_pdf("tiny", seed=42)
    assert f1.equals(f2)
    assert m1.equals(m2)


def test_schema_and_pk():
    files, members = fixtures.generate_files_pdf("tiny")
    assert list(files.columns) == ["repo", "path", "commit", "lang", "content"]
    assert not files.duplicated(subset=["repo", "path", "commit"]).any()
    assert set(files["lang"]) <= set(fixtures.LANGS)
    assert len(members) == len(files)


def test_cluster_structure():
    _, members = fixtures.generate_files_pdf("tiny")
    sizes = members.groupby("entity_id").size()
    assert sizes.min() >= 1
    # entity_id is the min record id of its members (deterministic labels)
    for eid, grp in members.groupby("entity_id"):
        assert eid == grp["record_id"].min()
    # planted vendored cluster exists and is the hot one
    vend = members[members["family"] == -1]
    assert len(vend) >= 10


def test_labeled_pairs_balance_and_orientation():
    _, members = fixtures.generate_files_pdf("tiny")
    lp = fixtures.generate_labeled_pairs_pdf(members)
    assert (lp["id_a"] < lp["id_b"]).all()
    assert set(lp["label"]) == {0, 1}
    truth = members.set_index("record_id")["entity_id"]
    same = lp["id_a"].map(truth) == lp["id_b"].map(truth)
    assert (same == (lp["label"] == 1)).all()


def test_record_id_matches_spark_sha2(spark, tiny_files):
    # the per-row invariant: Python-side record_id == Spark sha2 derivation
    from pyspark.sql import functions as F

    row = tiny_files.select("repo", "path", "commit", "record_id").first()
    assert row["record_id"] == fixtures.record_id(row["repo"], row["path"], row["commit"])
    # sha256(content) present and 64 hex chars
    bad = tiny_files.filter(~F.col("sha256").rlike("^[0-9a-f]{64}$")).count()
    assert bad == 0
