"""Stage-3 connected-components unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbb_ned_spark.config import PipelineConfig
from sbb_ned_spark.operators.clustering import connected_components


def _run(spark, edges, nodes):
    e = spark.createDataFrame(edges, ["id_a", "id_b"])
    n = spark.createDataFrame([(x,) for x in nodes], ["record_id"])
    out = connected_components(e, n, PipelineConfig())
    return {r["record_id"]: r["cluster_id"] for r in out.collect()}


def test_simple_chain(spark):
    # a-b, b-c, d-e ; f isolated
    got = _run(spark, [("a", "b"), ("b", "c"), ("d", "e")], list("abcdef"))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f"}


def test_long_path_converges(spark):
    nodes = [f"n{i:02d}" for i in range(12)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(11)]
    got = _run(spark, edges, nodes)
    assert set(got.values()) == {"n00"}


def test_cluster_id_is_min_member(spark):
    got = _run(spark, [("x", "m"), ("m", "z"), ("q", "z")], ["x", "m", "z", "q"])
    assert set(got.values()) == {"m"}


def test_deterministic_across_runs(spark):
    edges = [("a", "c"), ("b", "c"), ("d", "f"), ("e", "f"), ("g", "h")]
    nodes = list("abcdefgh")
    assert _run(spark, edges, nodes) == _run(spark, edges, nodes)


def test_duplicate_and_reversed_edges(spark):
    got = _run(spark, [("a", "b"), ("a", "b"), ("b", "c"), ("a", "c")], list("abc"))
    assert set(got.values()) == {"a"}
