"""Similarity search over an embedding column (array<float>).

- brute_force_topk : exact cosine top-k, fully native (zip_with +
  aggregate for the dot product, window row_number for top-k). The
  correctness baseline; O(|Q| x |V|) — fine when |Q| is small or either
  side broadcasts.
- lsh_topk         : random-hyperplane LSH buckets (pandas UDF signs)
  -> bucket equi-join -> exact cosine re-rank. The scale path: candidate
  generation is an equi-join instead of a cross join — at 100 TB the
  cross join is impossible, the bucket join shuffles on short keys.
- embedding_near_dup_pairs : all pairs with cosine >= tau via the same
  bucket-then-verify shape (dedup by embedding).

Analog in the reference: the Annoy ANN index over embedding vectors
(`/root/reference/qurator/sbb_ned/index.py:436-440,667`) — a point-query
index becomes a set-oriented bucket join.
"""

from __future__ import annotations

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


def make_hyperplane_sign_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """pandas UDF: embedding -> int bucket from random-hyperplane signs."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf("int")
    def signs(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int32)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = mat @ planes  # (batch, n_planes)
        bits = (proj > 0).astype(np.int64)
        weights = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        out = (bits * weights).sum(axis=1).astype(np.int32)
        return pd.Series(out)

    return signs


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` hyperplane hash tables,
    bucket equi-join, exact cosine re-rank within candidates."""
    tables = []
    for t in range(n_tables):
        sign = make_hyperplane_sign_udf(dim, n_planes, seed=100 + t)
        v = vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
            F.lit(t).alias("table"),
            sign(F.col(vec_col)).alias("bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.lit(t).alias("table"),
            sign(F.col(vec_col)).alias("bucket"),
        )
        tables.append((q, v))
    cand = None
    for q, v in tables:
        c = q.join(v, ["table", "bucket"]).select("query_id", "qv", "neighbor_id", "nv")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.filter(F.col("query_id") != F.col("neighbor_id")).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    scored = cand.withColumn("cosine", F.round(_cosine_expr("qv", "nv"), 6))
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
    n_planes: int = 6,
    n_tables: int = 6,
) -> DataFrame:
    """All pairs with cosine >= tau, bucket-blocked then exactly verified."""
    cand = None
    for t in range(n_tables):
        sign = make_hyperplane_sign_udf(dim, n_planes, seed=500 + t)
        keyed = vectors.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sign(F.col(vec_col)).alias("bucket")
        )
        l = keyed.select(F.col("bucket"), F.col("id").alias("id_a"), F.col("v").alias("va"))
        r = keyed.select(F.col("bucket"), F.col("id").alias("id_b"), F.col("v").alias("vb"))
        c = l.join(r, "bucket").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "va", "vb"
        )
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return (
        cand.withColumn("cosine", F.round(_cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )
