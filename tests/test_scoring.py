"""Stage-2 scoring unit tests (SURVEY.md §2.10 X4, §2.4 A3/A4)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from sbb_ned_spark.config import PipelineConfig
from sbb_ned_spark.functions import similarity as sim
from sbb_ned_spark.operators import blocking, scoring


@pytest.fixture(scope="module")
def scored(tiny_files):
    cfg = PipelineConfig()
    feats = blocking.record_features(tiny_files, cfg).persist()
    keys = blocking.blocking_keys(feats, cfg)
    cold, _ = blocking.split_hot_keys(keys, cfg)
    pairs = blocking.candidate_pairs(cold, cfg)
    return feats, pairs, scoring.score_pairs(pairs, feats, cfg).persist()


def test_similarity_kernels():
    a = np.array([1, 2, 3, 4], dtype=np.int64)
    b = np.array([3, 4, 5, 6], dtype=np.int64)
    assert sim.jaccard_sorted(a, b) == pytest.approx(2 / 6)
    assert sim.containment_sorted(a, b) == pytest.approx(0.5)
    assert sim.jaccard_sorted(a, a) == 1.0
    assert sim.seq_ratio([1, 2, 3], [1, 2, 3]) == 1.0
    assert sim.seq_ratio([1, 2, 3], [4, 5, 6]) == 0.0
    assert sim.cosine(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == pytest.approx(1.0)
    assert sim.size_ratio(5, 10) == 0.5


def test_batch_set_intersections_matches_scalar():
    rng = np.random.default_rng(11)
    ts_a, ts_b, expect = [], [], []
    for _ in range(300):
        a = np.unique(rng.integers(0, 40, rng.integers(0, 25)))
        b = np.unique(rng.integers(0, 40, rng.integers(0, 25)))
        ts_a.append(a if len(a) else None)
        ts_b.append(b)
        expect.append(len(np.intersect1d(a, b)))
    inter, la, lb = sim.batch_set_intersections(ts_a, ts_b, 300)
    assert [int(x) for x in inter] == expect


def test_batch_seq_ratio_estimate_boundaries():
    est, _, _ = sim.batch_seq_ratio_estimate(
        [[1, 2, 3, 4], [1, 2, 3], [], [7], None],
        [[1, 2, 3, 4], [8, 9, 10], [], [7], [1]],
        5,
    )
    assert est[0] == 1.0  # identical
    assert est[1] == 0.0  # disjoint
    assert est[2] == 1.0  # both empty
    assert est[3] == 1.0  # equal singletons
    assert est[4] == 0.0  # one empty


def test_batch_jaro_winkler_exact_known_values():
    got = sim.batch_jaro_winkler(
        ["martha", "dixon", "", "", "same/path.py"],
        ["marhta", "dicksonx", "", "x", "same/path.py"],
    )
    assert got[0] == pytest.approx(0.9611, abs=1e-4)
    assert got[1] == pytest.approx(0.8133, abs=1e-4)
    assert got[2] == 1.0  # both empty
    assert got[3] == 0.0  # one empty
    assert got[4] == 1.0  # identical


def test_gated_difflib_is_decision_flip_free(scored):
    """The bigram estimate + ambiguity-band gating must reach the same
    accept/reject decisions as running difflib on EVERY pair."""
    feats, pairs, sc = scored
    from sbb_ned_spark.operators.scoring import _paired_features

    cfg = PipelineConfig()
    pdf = _paired_features(pairs, feats).toPandas()
    out = sc.toPandas().set_index(["id_a", "id_b"])
    sr_exact = np.array(
        [sim.seq_ratio(a, b) for a, b in zip(pdf["skeleton_seq_a"], pdf["skeleton_seq_b"])]
    )
    keyed = out.loc[list(zip(pdf["id_a"], pdf["id_b"]))]
    token_ev = np.maximum(
        keyed["token_jaccard"].to_numpy(),
        0.7 * keyed["token_containment"].to_numpy() + 0.3 * keyed["token_jaccard"].to_numpy(),
    )
    score_exact = (
        cfg.w_token_jaccard * token_ev
        + cfg.w_token_set_lev * keyed["token_set_lev"].to_numpy()
        + cfg.w_skeleton_ratio * sr_exact
        + cfg.w_trigram_cosine * keyed["trigram_cosine"].to_numpy()
        + cfg.w_size_ratio * keyed["size_ratio"].to_numpy()
        + cfg.w_path_jw * keyed["path_jw"].to_numpy()
    )
    ex = keyed["exact_match"].to_numpy() == 1
    score_exact = np.where(ex, 1.0, score_exact)
    dec_engine = (keyed["score"].to_numpy() >= cfg.decision_threshold) | ex
    dec_exact = (score_exact >= cfg.decision_threshold) | ex
    assert (dec_engine == dec_exact).all()


def test_scores_bounded_and_exact_flagged(scored):
    _, _, sc = scored
    assert sc.filter((F.col("score") < 0) | (F.col("score") > 1.0001)).count() == 0
    # exact matches forced to score 1.0
    assert sc.filter((F.col("exact_match") == 1) & (F.col("score") < 1.0)).count() == 0


def test_identical_pair_scores_one(scored):
    feats, pairs, sc = scored
    # any pair with equal sha256 must have all similarities == 1
    # scores carry binary pair ids; unhex the features side to match
    full = sc.join(
        feats.select(F.unhex("record_id").alias("id_a"), F.col("sha256").alias("sha_a")),
        "id_a",
    ).join(
        feats.select(F.unhex("record_id").alias("id_b"), F.col("sha256").alias("sha_b")),
        "id_b",
    )
    ident = full.filter(F.col("sha_a") == F.col("sha_b"))
    assert ident.count() > 0
    bad = ident.filter(
        (F.col("token_jaccard") < 0.999) | (F.col("skeleton_ratio") < 0.999)
    ).count()
    assert bad == 0


def test_mapinpandas_equals_applyinpandas(scored):
    feats, pairs, sc_map = scored
    cfg = PipelineConfig()
    sc_apply = scoring.score_pairs(pairs, feats, cfg, method="applyInPandas")
    a = {(r["id_a"], r["id_b"]): round(r["score"], 9) for r in sc_map.collect()}
    b = {(r["id_a"], r["id_b"]): round(r["score"], 9) for r in sc_apply.collect()}
    assert a == b


def test_candidate_stats_shape(scored):
    _, _, sc = scored
    stats = scoring.candidate_stats(sc)
    cols = set(stats.columns)
    for c in (
        "record_id case_min case_max case_mean case_std case_median case_n "
        "overall_min overall_max overall_mean overall_std "
        "diff_min diff_max diff_mean diff_std among_top10".split()
    ):
        assert c in cols, c
    # case stats bounded by overall extremes
    bad = stats.filter(
        (F.col("case_min") < F.col("overall_min") - 1e-9)
        | (F.col("case_max") > F.col("overall_max") + 1e-9)
    ).count()
    assert bad == 0
    # SYMMETRY (VERDICT r2 #7): every record appearing on EITHER side of a
    # pair gets a stats row — b-side-only records must not be dropped
    participants = {
        r["id"]
        for r in sc.select(F.col("id_a").alias("id"))
        .unionByName(sc.select(F.col("id_b").alias("id")))
        .distinct()
        .collect()
    }
    stat_ids = {r["record_id"] for r in stats.select("record_id").collect()}
    assert stat_ids == participants
    # a record's pair count sums both orientations
    import collections

    per = collections.Counter()
    for r in sc.select("id_a", "id_b").collect():
        per[r["id_a"]] += 1
        per[r["id_b"]] += 1
    got_n = {r["record_id"]: r["case_n"] for r in stats.select("record_id", "case_n").collect()}
    assert got_n == dict(per)
