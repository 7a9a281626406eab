"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "<dir>"}

Headline set: one representative per engine area — scan+agg, broadcast
join chain, window top-k, sessionization, MinHash-LSH dedup, brute-force
ANN, and the full 3-stage ER pipeline on the deterministic `small`
fixture (the flagship workload; files/sec reported alongside).
"""

from __future__ import annotations

import json
import os
import time

import __spark_entry__ as E


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sbb_ned_spark.session import get_spark

    spark = get_spark("sbb_ned_spark-bench", master=f"local[{cpus}]")

    qs = E.queries()
    headline = [
        "a1_group_ranking_stats",
        "j3_broadcast_dim_join",
        "s2_per_key_limit",
        "w5_session_renumber",
        "dedup_minhash_lsh",
        "ann_bruteforce_topk",
    ]
    timings: dict[str, float] = {}
    # warm the JVM/session so the first measured query isn't paying startup
    spark.range(1000).count()

    for name in headline:
        t0 = time.monotonic()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)

    # flagship ER pipeline on the deterministic small fixture
    from sbb_ned_spark import fixtures
    from sbb_ned_spark.config import PipelineConfig
    from sbb_ned_spark.plans import pipeline as P

    fixtures.ensure_files_parquet("small")  # one-time generation outside the timing
    t0 = time.monotonic()
    files = fixtures.load_files_df(spark, "small")
    n_files = files.count()
    res = P.run_pipeline(files, PipelineConfig(), light=True)
    res.clusters.count()
    er_sec = round(time.monotonic() - t0, 3)
    res.unpersist_all()
    timings["er_pipeline_small"] = er_sec

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "er_files_per_sec": round(n_files / er_sec, 2),
                "cpus": int(cpus),
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
