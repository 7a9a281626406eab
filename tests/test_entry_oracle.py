"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() on the same parquet and compare row count,
column names, and the order-insensitive multiset of values."""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# sf0.01 = the DRIVER's correctness scale: round 2's p10 NaN bug was
# invisible at sf0.001 purely because no near-antipodal pair occurs there
# (VERDICT r2 #9 — local gate and driver gate must agree on scale)
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


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

ORACLE = entry_mod.oracle_sql()
WITH_ORACLE = sorted(set(entry_mod.queries()) & set(ORACLE))
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    cur = ddb.execute(ORACLE[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    sc, sr = _normalize_rows(spark_cols, spark_rows)
    dc, dr = _normalize_rows(duck_cols, duck_rows)
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_driver_canon(spark, ddb, name):
    """STRICT replica of the driver's canon layer (VERDICT r4 ask #3).

    The loose test above is value-equality with type coercion; the driver
    is stricter: it pandas-sorts every output column (dies on list cells
    — the r4 a8 red) and hashes dtype-sensitively with the oracle fetched
    via ``.df()``, where DuckDB HUGEINT/DECIMAL arrive as float64 (the r4
    j10 red). This test fails on BOTH of those as shipped in round 4 and
    makes that class of red impossible to ship blind again.
    """
    from sbb_ned_spark import driver_canon as dc

    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spdf = dc.spark_to_pandas(sdf)  # asserts scalar-only schema first
    ddf = ddb.execute(ORACLE[name]).df()  # pandas dtypes, like the driver

    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch {sorted(spdf.columns)} vs {sorted(ddf.columns)}"
    )
    sh = dc.canon_hash(spdf)
    dh = dc.canon_hash(ddf)
    if sh != dh:
        _, srows = dc.canon_cells(spdf)
        _, drows = dc.canon_cells(ddf)
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
        raise AssertionError(
            f"{name}: driver-canon hash mismatch "
            f"({len(srows)} vs {len(drows)} rows), first diffs: {diffs}"
        )


@pytest.mark.parametrize("name", [n for n in ROWS_ONLY if n != "er_clusters"])
def test_rows_only_queries_run(spark, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(["record_id", "cluster_id", "cluster_size"]) <= set(df.columns)


def test_canon_negative_zero_and_dead_sort():
    """-0.0 and 0.0 are value-equal and must hash identically (a rounded
    tiny negative reprs as '-0.0'); int-vs-float stays distinct; and the
    digest is row-order-insensitive without any pandas pre-sort."""
    import pandas as pd

    from sbb_ned_spark import driver_canon as dc

    z = dc.canon_hash(pd.DataFrame({"x": [0.0]}))
    assert dc.canon_hash(pd.DataFrame({"x": [-0.0]})) == z
    assert dc.canon_hash(pd.DataFrame({"x": [-1e-9]})) == z  # rounds to -0.0
    assert dc.canon_hash(pd.DataFrame({"x": [0]})) != z  # int64 vs float64
    a = pd.DataFrame({"x": [2.0, 1.0], "y": ["b", "a"]})
    b = pd.DataFrame({"x": [1.0, 2.0], "y": ["a", "b"]})
    assert dc.canon_hash(a) == dc.canon_hash(b)
