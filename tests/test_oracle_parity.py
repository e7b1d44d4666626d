"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry in Spark and its ``oracle_sql()`` in DuckDB over the
same parquet, compare row counts + order-insensitive values (columns
sorted by name, just like the driver's value-hash)."""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect()), cols


def _duck_rows(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(_norm(row[i]) for i in order) for row in rel.fetchall())
    return rows, sorted(cols)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_rows, s_cols = _spark_rows(sdf)
    d_rows, d_cols = _duck_rows(ORACLES[name])
    assert s_cols == d_cols, f"{name}: column names differ: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row counts differ: {len(s_rows)} vs {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Operators without a SQL oracle must still execute and return a
    stable schema (the driver's weaker rows-only check)."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
