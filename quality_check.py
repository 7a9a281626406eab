"""Bench-scale quality gate: run the full pipeline on the bench fixture
and score pairwise P/R/F1 against the planted labeled pairs.

Complements cli.py (which gates at tiny/small): this is the large-input
confirmation that precision holds when the candidate space is ~10^5
records with adversarial hot keys.

    python quality_check.py [--scale bench] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    from sbb_ned_spark import fixtures
    from sbb_ned_spark.config import PipelineConfig
    from sbb_ned_spark.plans import pipeline as P
    from sbb_ned_spark.session import get_spark

    spark = get_spark("quality-check", master=f"local[{args.cpus}]")
    t0 = time.monotonic()
    files = fixtures.load_files_df(spark, args.scale)
    res = P.run_pipeline(files, PipelineConfig(), light=True)
    _, members = fixtures.generate_files_pdf(args.scale)
    labeled = spark.createDataFrame(fixtures.generate_labeled_pairs_pdf(members))
    quality = P.pairwise_f1(res.clusters, labeled)
    out = {
        "scale": args.scale,
        "n_files": int(len(members)),
        "wall_sec": round(time.monotonic() - t0, 1),
        **quality,
    }
    print(json.dumps(out, sort_keys=True))
    spark.stop()
    # recall floor 0.997: the stated recall budget (tests/test_pipeline.py
    # RECALL_FLOOR) — a speed-driven band/hash change may not spend margin
    # below it even while F1 still clears the 0.99 gate
    return 0 if quality["f1"] >= 0.99 and quality["recall"] >= 0.997 else 1


if __name__ == "__main__":
    sys.exit(main())
