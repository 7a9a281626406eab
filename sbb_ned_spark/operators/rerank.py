"""Context re-ranking of candidates — geo / temporal decay blended into
the candidate score, then a per-query top-k.

The reference re-ranks entity candidates by distance to a request
context: haversine distance to a context coordinate and a not-after
temporal filter (`/root/reference/qurator/sbb_ned/index.py:75-197`, the
webapp's ``__CONTEXT__`` flow `webapp/app.py:361-368`). Re-expressed
set-oriented: candidates and context are DataFrames, the decay is a
native column expression (whole-stage codegen), and the re-rank is a
per-query window top-k — no point queries, no Python.

At scale: the join is a shuffle hash join on the query key (uniform);
the decay math is map-side; the top-k window partitions by query id, so
no global sort appears anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km, pure Catalyst (F9, `index.py:99-109`).

    The haversine term ``h`` is clamped to [0, 1]: for near-antipodal
    points floating error pushes it a ulp above 1.0, and ``sqrt(1 - h)``
    would go NaN — NaN sorts LARGEST in a descending rank window, so one
    bad pair would silently take rank 1 downstream."""
    dlat = F.radians(lat_b - lat_a)
    dlon = F.radians(lon_b - lon_a)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b)) * F.pow(F.sin(dlon / 2), 2)
    )
    h = F.least(F.greatest(h, F.lit(0.0)), F.lit(1.0))
    return 6371.0 * 2 * F.atan2(F.sqrt(h), F.sqrt(F.lit(1.0) - h))


def geo_decay(dist_km: Column, scale_km: float = 1000.0) -> Column:
    """1 / (1 + d/scale) — the reference's distance re-weighting shape."""
    return F.lit(1.0) / (F.lit(1.0) + dist_km / F.lit(scale_km))


def temporal_decay(age_days: Column, scale_days: float = 365.0) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.greatest(age_days, F.lit(0.0)) / F.lit(scale_days))


def context_rerank(
    candidates: DataFrame,
    query_col: str,
    cand_col: str,
    score_col: str,
    decay_col: str,
    k: int = 3,
    w_score: float = 0.6,
    w_context: float = 0.4,
) -> DataFrame:
    """Blend a base candidate score with a context decay column and keep
    the top-k per query (deterministic tie-break on the candidate id).

    ``candidates`` must already carry one row per (query, candidate) with
    ``score_col`` in [0,1] and ``decay_col`` in [0,1] (use
    :func:`geo_decay` / :func:`temporal_decay`)."""
    blended = candidates.withColumn(
        "rerank_score",
        F.lit(w_score) * F.col(score_col) + F.lit(w_context) * F.col(decay_col),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rerank_score").desc(), F.col(cand_col).asc()
    )
    return (
        blended.withColumn("ctx_rank", F.row_number().over(w))
        .filter(F.col("ctx_rank") <= k)
    )
