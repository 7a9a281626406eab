"""ensure_min_parallelism: fan-out for tiny scans, NO-OP at scale."""

from __future__ import annotations

from sbb_ned_spark.functions.partitioning import ensure_min_parallelism


def test_single_partition_scan_fans_out(spark):
    df = spark.range(0, 1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = ensure_min_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_already_parallel_input_is_untouched(spark):
    """The 100 TB case: a scan with >= cluster parallelism must NOT get an
    extra shuffle — the exact same plan object comes back."""
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target + 3)
    out = ensure_min_parallelism(df)
    assert out is df


def test_key_partitioning_colocates(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 100).withColumn("k", F.pmod("id", F.lit(4))).coalesce(1)
    out = ensure_min_parallelism(df, key="k")
    # same key -> same partition (hash partitioning)
    parts = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("p").alias("np"))
        .collect()
    )
    assert all(r["np"] == 1 for r in parts)
