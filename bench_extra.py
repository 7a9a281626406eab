"""Extra measurement harness (guide §1.4): per-query noop-sink isolation,
plan capture, and repeat timing. NOT the driver's bench — bench.py is the
frozen measured artifact; this file exists so optimization work can time
the computation alone and capture `.explain("formatted")` per query.

Usage:
    python bench_extra.py [query ...]          # default: headline set
    PLAN_TAG=before python bench_extra.py ...  # writes plans/r06/<q>_<tag>.txt
    REPS=3 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as E

HEADLINE = [
    "a1_group_ranking_stats",
    "j3_broadcast_dim_join",
    "s2_per_key_limit",
    "w5_session_renumber",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("REPS", "3"))
    tag = os.environ.get("PLAN_TAG", "")
    names = sys.argv[1:] or HEADLINE

    from sbb_ned_spark.session import get_spark

    spark = get_spark("sbb_ned_spark-bench-extra", master=f"local[{cpus}]")
    spark.range(1000).count()
    qs = E.queries()
    out: dict[str, list[float]] = {}

    for name in names:
        if name == "er_pipeline_small":
            times = []
            for _ in range(reps):
                from sbb_ned_spark import fixtures
                from sbb_ned_spark.config import PipelineConfig
                from sbb_ned_spark.plans import pipeline as P

                fixtures.ensure_files_parquet("small")
                t0 = time.monotonic()
                files = fixtures.load_files_df(spark, "small")
                files.count()
                res = P.run_pipeline(files, PipelineConfig(), light=True)
                res.clusters.count()
                times.append(round(time.monotonic() - t0, 3))
                res.unpersist_all()
            out[name] = times
            continue
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            noop(df)
            times.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if tag:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                plan = qs[name](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                    qs[name](spark, sf_dir)._jdf.queryExecution(), "formatted"
                )
                f.write(plan)
        out[name] = times

    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
