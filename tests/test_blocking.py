"""Stage-1 blocking unit tests (SURVEY.md §2.3 J1/J2, §2.2 P5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sbb_ned_spark.config import PipelineConfig
from sbb_ned_spark.operators import blocking


@pytest.fixture(scope="module")
def feats(tiny_files):
    # unpersist at teardown — the cached subtree would substitute into
    # later record_features plans (see tests/test_dedup.py docs fixture)
    df = blocking.record_features(tiny_files).persist()
    yield df
    df.unpersist()


def test_features_carry_invariants_and_no_content(feats, tiny_files):
    assert "content" not in feats.columns  # hash early, never ship content
    assert feats.count() == tiny_files.count()
    # sha256 preserved exactly (per-row invariant, input_hint)
    mismatch = (
        feats.select("record_id", "sha256")
        .join(tiny_files.select("record_id", F.col("sha256").alias("sha_in")), "record_id")
        .filter(F.col("sha256") != F.col("sha_in"))
        .count()
    )
    assert mismatch == 0


def test_minhash_determinism(feats, tiny_files):
    again = blocking.record_features(tiny_files)
    a = {r["record_id"]: r["mh_content"] for r in feats.select("record_id", "mh_content").collect()}
    b = {r["record_id"]: r["mh_content"] for r in again.select("record_id", "mh_content").collect()}
    assert a == b


def test_exact_duplicates_share_sha_key(feats):
    keys = blocking.blocking_keys(feats)
    sha_keys = keys.filter(F.col("key_kind") == "sha")
    # the vendored file copies all share one sha key
    top = sha_keys.groupBy("key").count().agg(F.max("count")).first()[0]
    assert top >= 10


def test_hot_key_cutoff(feats):
    cfg = PipelineConfig(max_key_frequency=5)
    keys = blocking.blocking_keys(feats)
    cold, hot = blocking.split_hot_keys(keys, cfg)
    assert hot.count() > 0  # vendored/license keys are hot at cutoff 5
    max_freq = cold.groupBy("key").count().agg(F.max("count")).first()[0]
    assert max_freq <= 5


def test_candidate_pairs_oriented_and_capped(feats):
    cfg = PipelineConfig(max_candidates_per_record=7, max_fan_in=14)
    keys = blocking.blocking_keys(feats)
    cold, _ = blocking.split_hot_keys(keys, cfg)
    pairs = blocking.candidate_pairs(cold, cfg)
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    assert pairs.groupBy("id_a", "id_b").count().filter("count > 1").count() == 0
    # symmetric cap: per-record appearances over BOTH orientations are
    # bounded by own-nominations (k) + opposite-side fan-in ceiling (kf)
    both = pairs.select(F.col("id_a").alias("rid")).unionAll(
        pairs.select(F.col("id_b").alias("rid"))
    )
    max_cands = both.groupBy("rid").count().agg(F.max("count")).first()[0]
    assert max_cands <= 7 + 14


def test_candidate_pairs_fan_in_below_k_keeps_first_disjunct(spark):
    """Regression: max_fan_in < max_candidates_per_record is a legal
    config, and the hot-id_a pre-prune must use max(k, kf), not kf.

    Star block: pair (r0, ri) shares exactly i distinct keys, so r0's
    own-nomination ranking is r9, r8, ..., r1 while every ri has r0 as
    its ONLY partner (rank_b = 1). With k=5, kf=2 the survival rule
    (rank_a<=5 & rank_b<=2) admits (r0, r5..r9); a pre-prune at kf=2
    alone silently dropped rank_a in {3,4,5} before rank_b was computed.
    """
    rows = []
    for i in range(1, 10):
        for j in range(i):
            rows.append((f"h{i}_{j}", "r0"))
            rows.append((f"h{i}_{j}", f"r{i}"))
    posting = spark.createDataFrame(rows, ["key", "record_id"])
    cfg = PipelineConfig(min_shared_keys=1, max_candidates_per_record=5, max_fan_in=2)
    got = sorted(
        (r.id_a, r.id_b)
        for r in blocking.candidate_pairs(posting, cfg).collect()
    )
    assert got == [("r0", f"r{i}") for i in range(5, 10)]


def test_low_id_record_fan_in_bounded_in_huge_block(spark):
    """A popular min-id record inside one giant block (e.g. a vendored
    file cluster) must not accumulate O(cluster) pairs: every endpoint is
    nominated by at most max_fan_in partners, yet chained nominations keep
    the block connected for Stage-3 clustering."""
    from sbb_ned_spark.config import PipelineConfig
    from sbb_ned_spark.operators.clustering import connected_components

    n = 200
    posting = spark.createDataFrame(
        [("k", f"r{i:04d}") for i in range(n)], ["key", "record_id"]
    )
    cfg = PipelineConfig(min_shared_keys=1, max_candidates_per_record=5, max_fan_in=10)
    pairs = blocking.candidate_pairs(posting, cfg)
    per_record = (
        pairs.select(F.col("id_a").alias("rid"))
        .unionAll(pairs.select(F.col("id_b").alias("rid")))
        .groupBy("rid")
        .count()
    )
    assert per_record.agg(F.max("count")).first()[0] <= 5 + 10
    # min-id record specifically: bounded by the fan-in ceiling
    low = per_record.filter(F.col("rid") == "r0000").first()
    assert low is not None and low["count"] <= 10
    # the capped pair graph still connects the whole block
    records = posting.select(F.col("record_id"))
    clusters = connected_components(pairs.select("id_a", "id_b"), records, cfg)
    assert clusters.select("cluster_id").distinct().count() == 1


def test_blocking_recall_on_true_pairs(spark, feats, tiny_truth):
    """Blocking-level pair recall must be ~1: a tiny remainder of
    heavily-perturbed variant pairs (multiple stacked perturbations away
    from each other) may share no key directly — the pipeline contract is
    that transitive clustering bridges them (verified by the end-to-end
    F1 gate in test_pipeline.py)."""
    members, lp = tiny_truth
    keys = blocking.blocking_keys(feats)
    cold, _ = blocking.split_hot_keys(keys, PipelineConfig())
    # pair ids ride binary inside the pipeline; hex back for the
    # string-id ground-truth join
    pairs = blocking.candidate_pairs(cold, PipelineConfig()).select(
        F.lower(F.hex("id_a")).alias("id_a"), F.lower(F.hex("id_b")).alias("id_b")
    )
    pos = spark.createDataFrame(lp[lp.label == 1][["id_a", "id_b"]])
    n_pos = pos.count()
    missed = pos.join(pairs, ["id_a", "id_b"], "left_anti").count()
    # 1% direct-miss budget: 16 bands x 4 rows has ~0.9998 band recall at
    # j>=0.8, and heavily-perturbed variant pairs sit further below that;
    # the END-TO-END gate (exact cluster match, test_pipeline.py) stays
    # tight — transitive clustering must bridge every one of these
    assert missed <= max(1, int(0.01 * n_pos)), (missed, n_pos)


def test_blocking_keys_reject_non_hex_record_id_loudly(spark):
    """run_pipeline accepts a pre-existing record_id column as-is; a
    non-hex id must FAIL the job at the blocking_keys decode — never
    silently unhex to NULL and fall out of every candidate join as
    all-singleton clusters (ADVICE r4 #1)."""
    bad = spark.createDataFrame(
        [("file-123", "r", "p", "c", "py", "x" * 40)],
        ["record_id", "repo", "path", "commit", "lang", "content"],
    )
    feats = blocking.record_features(bad)
    with pytest.raises(Exception) as ei:
        blocking.blocking_keys(feats).collect()
    assert "not lowercase hex" in str(ei.value)


def test_fused_udf_matches_perrow_reference(spark):
    """The whole-batch fused feature kernel (batch_band_sigs over ragged
    gram arrays + one-bincount trigram profiles) must be bit-identical to
    the straightforward per-row formulation it replaced, including empty
    rows, sub-k rows, and duplicate tokens (dedup of grams cannot change
    a permutation minimum)."""
    import numpy as np
    import pandas as pd

    from sbb_ned_spark.functions import hashing as H

    n_perms, n_bands, k = 64, 16, 3
    a, b = H._perm_params(n_perms)
    rng = np.random.default_rng(7)

    def ref_band_sig(g):
        if len(g) == 0:
            return [0] * n_bands
        sig = ((g[:, None] * a[None, :] + b[None, :]) >> np.uint64(32)).min(axis=0)
        bands = sig.reshape(n_bands, n_perms // n_bands)
        h = np.zeros(n_bands, dtype=np.uint64)
        for r in range(n_perms // n_bands):
            h = (h * np.uint64(1000003) + bands[:, r]) & np.uint64((1 << 63) - 1)
        return h.astype(np.int64).tolist()

    def ref_grams(u, kk):
        n = len(u)
        if n < kk:
            return np.unique(u)
        g = u[: n - kk + 1] << np.uint64(kk - 1)
        for j in range(1, kk):
            g = g ^ (u[j : n - kk + 1 + j] << np.uint64(kk - 1 - j))
        return np.unique(g)

    def ref_trigram(s, dim=64):
        if not s or len(s) < 3:
            return np.zeros(dim, dtype=np.float32)
        arr = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8).astype(np.int64)
        h = arr[:-2] * 961 + arr[1:-1] * 31 + arr[2:]
        counts = np.bincount(h % dim, minlength=dim).astype(np.float64)
        norm = np.sqrt((counts * counts).sum())
        return (counts / norm if norm > 0 else counts).astype(np.float32)

    # rows: empty, None-ish short, duplicate-heavy, random long
    rows = [
        [],
        [5],
        [3, 3, 3, 3],
        rng.integers(-(2**63), 2**63 - 1, size=500).tolist(),
        rng.integers(0, 50, size=80).tolist(),  # many duplicate tokens
    ]
    texts = ["", "ab", "the quick brown fox", "aaaaaa", "mixed τεχτ bytes"]
    masks = [[True] * len(r) for r in rows]

    fused = H.make_fused_features_udf(n_perms=n_perms, n_bands=n_bands, k=k, k_skel=4)
    pdf = pd.DataFrame(
        {"th": rows, "mask": masks, "nc": texts}
    )
    sdf = spark.createDataFrame(
        pdf, "th array<bigint>, mask array<boolean>, nc string"
    ).select(fused("th", "mask", "nc").alias("f")).select("f.*")
    got = sdf.toPandas()

    for i, (r, t) in enumerate(zip(rows, texts)):
        u = np.asarray(r, dtype=np.int64).astype(np.uint64)
        exp_mhc = ref_band_sig(ref_grams(u, k)) if len(u) else [0] * n_bands
        assert list(got["mh_content"][i]) == exp_mhc, f"row {i} mh_content"
        skel = u  # mask all-True: skeleton == tokens
        exp_mhs = ref_band_sig(ref_grams(skel, 4)) if len(u) else [0] * n_bands
        assert list(got["mh_skeleton"][i]) == exp_mhs, f"row {i} mh_skeleton"
        assert np.array_equal(
            np.asarray(got["trigram_vec"][i], dtype=np.float32), ref_trigram(t)
        ), f"row {i} trigram"
        assert list(got["token_set"][i]) == np.unique(
            (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
        ).astype(np.int32).tolist(), f"row {i} token_set"
