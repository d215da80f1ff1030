"""Replicates the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.001/0.01, compare row
count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from texrex_spark.plans.queries import EXTRA_ORACLE_SQL, EXTRA_QUERIES


def _all_queries():
    return {**entrymod.queries(), **EXTRA_QUERIES}


def _all_oracles():
    return {**entrymod.oracle_sql(), **EXTRA_ORACLE_SQL}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(_all_queries().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = _all_queries()[name]
    sql = _all_oracles().get(name)
    sdf = q(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        # driver records a weaker rows-only check for these
        assert len(sdf.schema) > 0
        return
    con = _duck(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sset = _rows_set(scols, [[r[c] for c in scols] for r in srows])
    dset = _rows_set(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
    assert sset == dset, f"{name}: value mismatch at {mism}: " + str(
        [(sset[i], dset[i]) for i in mism]
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0
