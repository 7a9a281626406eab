"""Similarity search over an embedding column (array<float>).

- brute_force_topk : exact cosine top-k, fully native (zip_with +
  aggregate for the dot product, window row_number for top-k). The
  correctness baseline; O(|Q| x |V|) — fine when |Q| is small or either
  side broadcasts.
- lsh_topk         : random-hyperplane LSH buckets (one Arrow-batched
  pandas UDF computes ALL tables' buckets in a single matmul)
  -> posexplode -> (table, bucket) equi-join -> exact cosine re-rank.
  The scale path: candidate generation is an equi-join instead of a
  cross join — at 100 TB the cross join is impossible, the bucket join
  shuffles on short keys.
- embedding_near_dup_pairs : pairs with cosine >= tau via the same
  bucket-then-verify shape (dedup by embedding).

Parameters are DERIVED from the similarity target, not hard-coded: for
hyperplane LSH the per-plane collision probability of a pair at angle
theta is p = 1 - theta/pi, so a b-plane table collides with prob p^b and
t independent tables reach recall 1-(1-p^b)^t. ``hyperplane_lsh_params``
inverts that for (tau, target_recall): the largest b (most selective
buckets -> cheapest join) whose required t fits the table budget.
Low tau inherently forces wide buckets — at tau 0.5 hyperplane LSH needs
b=4/t=25 for 99.5% recall; the candidate join degrades toward quadratic,
which is the correct honest trade (the scale regime for near-dup is
tau >= 0.9, where b=9/t~20 keeps buckets sharp).

Tables are seeded INDEPENDENTLY (seed+i per table) so raising the table
count only ever adds candidates — recall is monotone in t, and a pinned
fixture result stays valid under a later t increase.

Analog in the reference: the Annoy ANN index over embedding vectors
(`/root/reference/qurator/sbb_ned/index.py:436-440,667`) — a point-query
index becomes a set-oriented bucket join; (planes, tables) play the role
of Annoy's (n_trees, search_k) recall/cost knobs
(`webapp/de-config.json:24`, `Makefile:8`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self), deterministic
    tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_cosine_expr("qv", "nv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_lsh_params(
    min_cos: float, target_recall: float = 0.995, max_tables: int = 32
) -> tuple[int, int]:
    """(n_planes, n_tables) such that a pair at cosine ``min_cos`` is
    found with probability >= ``target_recall``: the most selective plane
    count whose required table count fits ``max_tables``."""
    p = 1.0 - math.acos(min(max(min_cos, -1.0), 1.0)) / math.pi
    if p <= 0.0:
        # min_cos = -1: opposite vectors never share a bucket under any
        # plane — the widest bucketing is the only honest answer
        return 1, max_tables
    for b in range(16, 0, -1):
        pb = p**b
        if pb >= 1.0:
            continue
        t = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pb))
        if t <= max_tables:
            return b, t
    return 1, max_tables


def make_hyperplane_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """pandas UDF: embedding -> array<int> of per-table bucket ids.

    ALL tables are computed in one (batch, dim) x (dim, tables*planes)
    matmul per Arrow batch. Table i's planes come from default_rng(seed+i)
    so each table is an independent hash family and larger n_tables is a
    strict superset of candidates."""
    planes = np.concatenate(
        [
            np.random.default_rng(seed + i).standard_normal((dim, n_planes))
            for i in range(n_tables)
        ],
        axis=1,
    )
    weights = (1 << np.arange(n_planes, dtype=np.int64))[None, None, :]

    @F.pandas_udf("array<int>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = mat @ planes  # (batch, tables*planes)
        bits = (proj > 0).astype(np.int64).reshape(len(vecs), n_tables, n_planes)
        out = (bits * weights).sum(axis=2).astype(np.int32)  # (batch, tables)
        return pd.Series(list(out))

    return buckets


def _with_table_buckets(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int,
    n_tables: int, seed: int, out_id: str,
) -> DataFrame:
    """(out_id, table, bucket) — one UDF pass, then posexplode.

    Deliberately does NOT carry the vector: the bucket join and the
    pair dedup shuffle bare ids (a few bytes/row); vectors are joined
    back once per side only for the exact verify — at scale the pair
    stream dominates row count, so it must stay narrow."""
    from sbb_ned_spark.functions.partitioning import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    udf = make_hyperplane_buckets_udf(dim, n_planes, n_tables, seed)
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(udf(F.col(vec_col))).alias("table", "bucket"),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    min_cos: float = 0.25,
    target_recall: float = 0.995,
    max_tables: int = 64,
    seed: int = 100,
) -> DataFrame:
    """Approximate top-k with recall derived from (min_cos, target_recall):
    any neighbor at cosine >= min_cos enters the candidate set with
    probability >= target_recall; candidates are exactly re-ranked.

    With the default parameters this reproduces ``brute_force_topk``
    exactly on the driver fixtures (pinned by pytest recall gates) —
    lower max_tables / higher min_cos trade recall for join cost."""
    n_planes, n_tables = hyperplane_lsh_params(min_cos, target_recall, max_tables)
    v = _with_table_buckets(
        vectors, id_col, vec_col, dim, n_planes, n_tables, seed, "neighbor_id"
    )
    q = _with_table_buckets(
        queries, id_col, vec_col, dim, n_planes, n_tables, seed, "query_id"
    )
    cand = (
        q.join(v, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    nv = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    # no explicit broadcast hint on the re-rank joins: the query-vector
    # table is only broadcast-safe when |Q| is small, and this is the
    # documented scale path — AQE picks broadcast at runtime when the
    # side's actual size fits autoBroadcastJoinThreshold
    scored = (
        cand.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cosine", F.round(_cosine_expr("qv", "nv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    target_recall: float = 0.995,
    max_tables: int = 32,
    seed: int = 500,
) -> DataFrame:
    """Pairs with cosine >= tau, bucket-blocked then exactly verified.

    (n_planes, n_tables) are derived from tau so a pair AT the threshold
    is recalled with probability >= ``target_recall`` (pairs above tau
    recall strictly better); the exact-cosine verify step makes precision
    1.0. On the driver fixtures the derived parameters recover EVERY true
    pair (pinned by a pytest gate vs the brute-force baseline)."""
    n_planes, n_tables = hyperplane_lsh_params(tau, target_recall, max_tables)
    keyed = _with_table_buckets(
        vectors, id_col, vec_col, dim, n_planes, n_tables, seed, "id"
    )
    l = keyed.select("table", "bucket", F.col("id").alias("id_a"))
    r = keyed.select("table", "bucket", F.col("id").alias("id_b"))
    cand = (
        l.join(r, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(_cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )
