"""Explicit skew-handling utilities: salting + hot/cold split joins.

Three layers of skew defense, in the order the pipeline applies them
(SURVEY.md §7.4.2; north_star: "salted repartitioning for skewed keys"):

1. hot-key CUTOFF — blocking keys over `max_key_frequency` are dropped
   outright (the reference's own mitigation, `index.py:652-653,669-674`);
2. AQE skew-join — runtime partition splitting, enabled in session.py;
3. the utilities here — for operators that must KEEP skewed keys:
   - ``salted_aggregate``: two-phase aggregation (salt -> partial agg ->
     final agg) so one giant key spreads over ``n_salts`` reducers;
   - ``hot_cold_split_join``: replicate-broadcast join for hot keys
     unioned with a plain shuffle join for cold keys (SURVEY.md §7.3's
     fallback when salting alone can't fix a 1000x key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): spreads a hot key's rows
    over ``n_salts`` shuffle partitions. Derived from a full-row hash, not
    rand(), so re-runs are identical (determinism requirement); byte-equal
    duplicate rows share a salt on purpose — they combine map-side."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(h, F.lit(n_salts)).cast("int"))


_PARTIAL = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group-bys.

    ``aggs``: output name -> (fn, col) with fn in {count, sum, min, max}
    (the re-aggregatable shapes; express avg as sum+count and divide).
    Phase 1 groups by (key, salt) — a hot key's rows split across
    ``n_salts`` reducers; phase 2 merges the partials per key.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"non re-aggregatable agg for salted_aggregate: {name}={fn}")
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[_PARTIAL[fn](col).alias(f"__p_{name}") for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def hot_cold_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_threshold: int = 10_000,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join robust to extreme key skew.

    Keys whose LEFT-side frequency exceeds ``hot_threshold`` are joined
    via broadcast of the right side's matching rows (no shuffle of the
    hot key at all); the cold remainder takes the normal shuffle join.
    The union preserves exact inner-join semantics.
    """
    freq = left.groupBy(key).agg(F.count("*").alias("__freq"))
    hot_keys = freq.filter(F.col("__freq") > hot_threshold).select(key)

    left_hot = left.join(F.broadcast(hot_keys), key, "left_semi")
    left_cold = left.join(F.broadcast(hot_keys), key, "left_anti")
    right_hot = right.join(F.broadcast(hot_keys), key, "left_semi")

    hot_joined = left_hot.join(F.broadcast(right_hot), key)
    cold_joined = left_cold.join(right, key)
    return hot_joined.unionByName(cold_joined)
