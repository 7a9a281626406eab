"""spark-submit entry point for the 3-stage ER pipeline.

Usage (north_rule invocation shape):

    spark-submit --master local[32] --py-files sbb_ned_spark.zip \
        sbb_ned_spark/cli.py --scale small --checkpoint-dir /tmp/ckpt [--resume]

Prints one JSON line with per-stage metrics and pairwise P/R/F1 against
the planted ground truth (the CLI analog of the reference's `ned-*`
console scripts, `/root/reference/setup.py:27-40`).

``--incremental 0.3`` drives the batch-incremental path end to end:
resolve 70% of the fixture into the checkpoint state, attach the other
30% via ``plans.incremental.incremental_update``, and score the UPDATED
clusters against the full planted truth — the same F1 gate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="tiny", choices=["tiny", "small", "bench"])
    ap.add_argument("--master", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--scoring-method", default="mapInPandas",
                    choices=["mapInPandas", "applyInPandas"])
    ap.add_argument("--lineage", action="store_true",
                    help="write per-partition lineage table (needs --checkpoint-dir)")
    ap.add_argument("--incremental", type=float, default=None, metavar="FRAC",
                    help="drive the batch-incremental path: resolve (1-FRAC) of "
                         "the fixture, then attach the remaining FRAC as a new "
                         "batch via incremental_update (needs --checkpoint-dir)")
    args = ap.parse_args(argv)
    if args.incremental is not None and not args.checkpoint_dir:
        ap.error("--incremental requires --checkpoint-dir (the state root)")
    if args.incremental is not None and not 0.0 < args.incremental < 1.0:
        ap.error("--incremental FRAC must be in (0, 1)")

    from sbb_ned_spark import fixtures
    from sbb_ned_spark.config import PipelineConfig
    from sbb_ned_spark.plans import pipeline as P
    from sbb_ned_spark.session import get_spark

    overrides = {}
    if args.checkpoint_dir:
        overrides["checkpoint_dir"] = args.checkpoint_dir
    if args.threshold is not None:
        overrides["decision_threshold"] = args.threshold
    if args.incremental is not None and (args.resume or args.lineage):
        # the incremental branch calls run_pipeline/incremental_update
        # without these flags — silently ignoring them while the output
        # JSON reported `"resumed": true` was ADVICE r5 low #1
        ap.error("--incremental cannot be combined with --resume/--lineage")
    config = PipelineConfig(**overrides)

    spark = get_spark("sbb_ned_spark-er", master=args.master, config=config)
    t0 = time.monotonic()
    files = fixtures.load_files_df(spark, args.scale)
    n_files = files.count()
    if args.incremental is not None:
        from pyspark.sql import functions as F

        from sbb_ned_spark.plans import incremental as I

        cut = max(1, min(9, round((1.0 - args.incremental) * 10)))
        h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(10))
        base_files, batch = files.filter(h < cut), files.filter(h >= cut)
        base = P.run_pipeline(base_files, config, scoring_method=args.scoring_method)
        base_wall = time.monotonic() - t0
        t1 = time.monotonic()
        res = I.incremental_update(batch, config, scoring_method=args.scoring_method)
        res.metrics = base.metrics + res.metrics
        extra = {
            "incremental": args.incremental,
            "base_wall_sec": round(base_wall, 3),
            "incremental_wall_sec": round(time.monotonic() - t1, 3),
            "batch_files": batch.count(),
        }
        base.unpersist_all()
    else:
        extra = {}
        res = P.run_pipeline(
            files,
            config,
            resume=args.resume,
            scoring_method=args.scoring_method,
            collect_lineage=args.lineage,
        )
    _, members = fixtures.generate_files_pdf(args.scale)
    labeled = spark.createDataFrame(fixtures.generate_labeled_pairs_pdf(members))
    quality = P.pairwise_f1(res.clusters, labeled)
    wall = time.monotonic() - t0

    out = {
        "scale": args.scale,
        "n_files": n_files,
        "wall_sec": round(wall, 3),
        "files_per_sec": round(n_files / wall, 3),
        "stages": res.metrics,
        "quality": quality,
        "resumed": args.resume,
        **extra,
    }
    print(json.dumps(out, sort_keys=True))
    spark.stop()
    return 0 if quality["f1"] >= 0.99 else 1


if __name__ == "__main__":
    sys.exit(main())
