"""Skew utilities: salted aggregation and hot/cold split join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sbb_ned_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one giant key ("hot") + many small keys; v is row-unique because the
    # salt is a content hash — identical rows deliberately share a salt
    # (they combine map-side anyway)
    hot = spark.range(0, 5000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(0, 500).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold).persist()


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skew.salted_aggregate(
            skewed,
            ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_non_reaggregatable(skewed):
    with pytest.raises(ValueError):
        skew.salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


def test_with_salt_deterministic_and_bounded(spark, skewed):
    s1 = skew.with_salt(skewed, 8).groupBy("_salt").count().collect()
    s2 = skew.with_salt(skewed, 8).groupBy("_salt").count().collect()
    assert sorted((r["_salt"], r["count"]) for r in s1) == sorted(
        (r["_salt"], r["count"]) for r in s2
    )
    assert all(0 <= r["_salt"] < 8 for r in s1)
    # the hot key actually spreads across salts
    spread = (
        skew.with_salt(skewed.filter(F.col("k") == "hot"), 8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_hot_cold_split_join_matches_plain_join(spark, skewed):
    right = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c2", "C2")], ["k", "label"]
    )
    plain = skewed.join(right, "k").groupBy("k", "label").count()
    split = skew.hot_cold_split_join(skewed, right, "k", hot_threshold=1000).groupBy(
        "k", "label"
    ).count()
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in split.collect())
    assert a == b
