"""Driver-contract parity: every queries() entry must match its oracle_sql()
on row count and order-insensitive values (the driver's CORRECTNESS gate,
re-implemented here at sf0.001 for fast feedback)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr key: None-safe total order (tuples with NULL cells aren't
    # comparable with <); both sides normalize to the same cell types first
    out = sorted((tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr)
    return [cols[i] for i in order], out


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = ddb.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column sets differ"
    assert len(srows) == len(orows), f"{name}: row counts {len(srows)} vs {len(orows)}"
    scols_sorted, snorm = _norm_rows(sdf.columns, srows)
    _, onorm = _norm_rows(ocols, orows)
    mismatches = [
        (a, b) for a, b in zip(snorm, onorm) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
