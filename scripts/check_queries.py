"""Ad-hoc replica of the driver correctness gate for selected queries.

Usage: python scripts/check_queries.py [--strict] [sf_dir] q1 q2 ...
Runs each named queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet, comparing row count, columns, and the
order-insensitive multiset of (rounded) values — the same normalization
as tests/test_entry_oracle.py.  With --strict it instead replays the
DRIVER's canon (column-sorted, dtype-sensitive hash with the oracle
fetched via .df() — sbb_ned_spark.driver_canon), the layer that produced
the r3/r4 driver-only reds; the loose compare then runs only as a
diagnostic when the canon hashes differ.  The two gates are
incomparable by design (canon is stricter on dtype, looser on the
null/date families the driver itself collapses) — pytest runs both on
every query.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession

# Resolve the repo root from THIS file so an old-commit worktree tests its
# own checkout, not /root/repo (the stage_walls.py A/B-campaign trap).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _normalize_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    args = sys.argv[1:]
    strict = "--strict" in args
    if strict:
        args.remove("--strict")
    sf = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = entry_mod.oracle_sql()
    qs = entry_mod.queries()
    names = args or sorted(set(qs) & set(oracle))
    bad = 0
    for name in names:
        sdf = qs[name](spark, sf)
        if name not in oracle:
            print(f"{name}: NO ORACLE spark_rows={sdf.count()}")
            continue
        if strict:
            # --strict is the DRIVER-replica gate, not a superset of the
            # loose gate: canon deliberately collapses the distinctions the
            # driver's pandas canon also collapses (None vs NaN — nullable
            # columns arrive as NaN floats from .df(); DATE vs midnight
            # TIMESTAMP) while being stricter on dtype (int64 vs float64).
            # Canon-green therefore means "the driver will green this", and
            # the green path costs ONE execution per engine; the loose
            # diagnostics below re-execute only on canon mismatch, to tell
            # a value bug from dtype drift. (Both gates always run in
            # pytest — tests/test_entry_oracle.py has one test per gate.)
            from sbb_ned_spark import driver_canon as canon

            try:
                n = None
                spdf = canon.spark_to_pandas(sdf)
                n = len(spdf)
                sh = canon.canon_hash(spdf)
                dh = canon.canon_hash(con.execute(oracle[name]).df())
            except Exception as e:  # noqa: BLE001
                print(f"{name}: CANON ERR {e}")
                bad += 1
                continue
            if sh == dh:
                print(f"{name}: OK+CANON ({n} rows)")
                continue
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = list(sdf.columns)
        try:
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERR {e}")
            bad += 1
            continue
        sc, sr = _normalize_rows(spark_cols, spark_rows)
        dc, dr = _normalize_rows(duck_cols, duck_rows)
        if sc != dc:
            print(f"{name}: COLS {sc} vs {dc}")
            bad += 1
        elif len(sr) != len(dr):
            print(f"{name}: ROWS {len(sr)} vs {len(dr)}")
            bad += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"{name}: VALUES diff, first: {diffs}")
            bad += 1
        elif strict:
            print(f"{name}: CANON HASH diff ({len(sr)} rows value-equal)")
            bad += 1
        else:
            print(f"{name}: OK ({len(sr)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
