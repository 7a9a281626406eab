"""Scaling-efficiency harness (north_rule evidence).

The rule's two-cluster-size criterion (N vs 4N executors, throughput
scaling efficiency >= 0.8) cannot use a real cluster in this sandbox, so
per the driver instruction we run the SAME job on the SAME input at two
parallelism levels — local[8] and local[32] — in separate JVMs, and
report files-scored/sec at both plus efficiency = (thr32/thr8)/4.

Usage:
    python scaling_bench.py prepare [--scale bench]   # one-time fixture parquet
    python scaling_bench.py run --cpus 8              # one measurement (fresh JVM)
    python scaling_bench.py report                    # both runs + BENCH.md update

`run` measures the full 3-stage pipeline wall time from the parquet
`files` table (generation excluded — identical bytes feed both runs).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DATA_DIR = "/root/repo/.bench_data"
RESULTS = os.path.join(DATA_DIR, "scaling_results.json")


def prepare(scale: str) -> None:
    from sbb_ned_spark import fixtures
    from sbb_ned_spark.session import get_spark

    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, f"files_{scale}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        print(f"fixture exists: {path}")
        return
    t0 = time.monotonic()
    spark = get_spark("scaling-prepare", master="local[32]")
    df = fixtures.load_files_df(spark, scale)
    df.repartition(64).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"wrote {n} files to {path} in {time.monotonic() - t0:.1f}s")
    spark.stop()


def run(cpus: int, scale: str) -> None:
    from sbb_ned_spark.config import PipelineConfig
    from sbb_ned_spark.plans import pipeline as P
    from sbb_ned_spark.session import get_spark

    path = os.path.join(DATA_DIR, f"files_{scale}.parquet")
    config = PipelineConfig(shuffle_partitions=max(32, cpus * 2))
    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", config=config)
    files = spark.read.parquet(path)
    n_files = files.count()

    t0 = time.monotonic()
    res = P.run_pipeline(files, config, light=True)
    res.clusters.count()
    wall = time.monotonic() - t0

    out = {
        "cpus": cpus,
        "scale": scale,
        "n_files": n_files,
        "wall_sec": round(wall, 3),
        "files_per_sec": round(n_files / wall, 3),
        "stages": res.metrics,
    }
    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f)
    results[str(cpus)] = out
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))
    spark.stop()


def report() -> None:
    with open(RESULTS) as f:
        results = json.load(f)
    r8, r32 = results["8"], results["32"]
    eff = (r32["files_per_sec"] / r8["files_per_sec"]) / 4.0
    summary = {
        "n_files": r8["n_files"],
        "throughput_local8_files_per_sec": r8["files_per_sec"],
        "throughput_local32_files_per_sec": r32["files_per_sec"],
        "speedup_8_to_32": round(r32["files_per_sec"] / r8["files_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "gate": eff >= 0.8,
    }
    print(json.dumps(summary, sort_keys=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prepare", "run", "report", "all"])
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--scale", default="bench")
    args = ap.parse_args()
    if args.cmd == "prepare":
        prepare(args.scale)
    elif args.cmd == "run":
        run(args.cpus, args.scale)
    elif args.cmd == "report":
        report()
    elif args.cmd == "all":
        prepare(args.scale)
        for cpus in (8, 32):
            # fresh JVM per measurement: a shared JVM would leak warmth
            # from one parallelism level into the other
            subprocess.run(
                [sys.executable, __file__, "run", "--cpus", str(cpus), "--scale", args.scale],
                check=True,
            )
        report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
