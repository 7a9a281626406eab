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


def run(cpus: int, scale: str, mode: str = "local") -> None:
    from sbb_ned_spark.config import PipelineConfig
    from sbb_ned_spark.plans import pipeline as P
    from sbb_ned_spark.session import get_spark

    path = os.path.join(DATA_DIR, f"files_{scale}.parquet")
    if mode == "cluster":
        # N vs 4N EXECUTORS, the north_rule's own shape: local-cluster
        # launches one real executor JVM per worker (own heap, own GC, own
        # Python workers) — scaling executors instead of threads inside a
        # single shared allocator
        workers = max(1, cpus // 2)
        master = f"local-cluster[{workers},2,6144]"
        config = PipelineConfig(
            shuffle_partitions=max(32, cpus * 2),
            extra_spark_conf={
                "spark.executor.memory": "5g",
                "spark.executorEnv.PYTHONPATH": os.path.dirname(os.path.abspath(__file__)),
            },
        )
    else:
        master = f"local[{cpus}]"
        # memory scales WITH cores (4 GB/core): a real N->4N executor
        # scale-up brings 4x total memory; a fixed shared heap would starve
        # the high-core leg into sort spills and measure memory pressure,
        # not parallel scaling (observed: candidate_pairs 140 s -> 53 s at
        # 8 cores going from 8 GB to 32 GB)
        config = PipelineConfig(
            shuffle_partitions=max(32, cpus * 2),
            extra_spark_conf={"spark.driver.memory": f"{4 * cpus}g"},
        )
    spark = get_spark(f"scaling-{cpus}", master=master, config=config)
    files = spark.read.parquet(path)
    n_files = files.count()

    t0 = time.monotonic()
    res = P.run_pipeline(files, config, light=True)
    res.clusters.count()
    wall = time.monotonic() - t0

    out = {
        "cpus": cpus,
        "mode": mode,
        "affinity_cores": len(os.sched_getaffinity(0)),
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


def report(n: int = 1, n4: int = 4) -> None:
    """Compare the N-core and 4N-core entries currently in RESULTS.

    RESULTS keeps the latest run per core count — delete it when the
    pipeline code changes, or stale mixed-version entries will produce a
    meaningless ratio."""
    with open(RESULTS) as f:
        results = json.load(f)
    try:
        rn, r4 = results[str(n)], results[str(n4)]
    except KeyError as e:
        raise SystemExit(
            f"missing measurement for cpus={e}; run `run --cpus {n}` and "
            f"`run --cpus {n4}` first (have: {sorted(results)})"
        )
    eff = (r4["files_per_sec"] / rn["files_per_sec"]) / (n4 / n)
    summary = {
        "n_files": rn["n_files"],
        f"throughput_local{n}_files_per_sec": rn["files_per_sec"],
        f"throughput_local{n4}_files_per_sec": r4["files_per_sec"],
        f"speedup_{n}_to_{n4}": round(r4["files_per_sec"] / rn["files_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "gate": eff >= 0.8,
    }
    print(json.dumps(summary, sort_keys=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prepare", "run", "report", "all"])
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--n", type=int, default=1, help="N cores for report/all")
    ap.add_argument("--n4", type=int, default=4, help="4N cores for report/all")
    ap.add_argument("--scale", default="bench4")
    ap.add_argument(
        "--mode",
        default="local",
        choices=["local", "cluster"],
        help="local = threads in one JVM; cluster = local-cluster executor JVMs",
    )
    ap.add_argument(
        "--pin",
        action="store_true",
        help="pin the WHOLE process tree (JVM task threads + pandas-UDF "
        "Python workers + GC) to exactly --cpus physical cores via "
        "taskset. Unpinned local[N] understates cluster efficiency: "
        "Python UDF workers are separate PROCESSES, so local[1] really "
        "consumes ~2 cores of this 32-core box while a real 1-core "
        "executor shares one core with its worker. Pinning is the "
        "faithful N-core-executor rendition.",
    )
    args = ap.parse_args()
    if args.cmd == "run" and args.pin:
        have = sorted(os.sched_getaffinity(0))
        if len(have) > args.cpus:
            cores = ",".join(str(c) for c in have[: args.cpus])
            os.execvp(
                "taskset",
                ["taskset", "-c", cores, sys.executable, __file__, "run",
                 "--cpus", str(args.cpus), "--scale", args.scale,
                 "--mode", args.mode, "--pin"],
            )
    if args.cmd == "prepare":
        prepare(args.scale)
    elif args.cmd == "run":
        run(args.cpus, args.scale, args.mode)
    elif args.cmd == "report":
        report(args.n, args.n4)
    elif args.cmd == "all":
        prepare(args.scale)
        for cpus in (args.n4, args.n):
            # fresh JVM per measurement: a shared JVM would leak warmth
            # from one parallelism level into the other
            subprocess.run(
                [sys.executable, __file__, "run", "--cpus", str(cpus), "--scale", args.scale],
                check=True,
            )
        report(args.n, args.n4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
