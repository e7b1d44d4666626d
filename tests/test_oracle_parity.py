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
    # repr sort key: total order even when a column mixes NULL with values
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr
    ), cols


def _duck_rows(sql, sf_dir=SF_DIR):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue  # fixture dirs carry only the tables under test
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(_norm(row[i]) for i in order) for row in rel.fetchall()), key=repr
    )
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


# -- whitespace-contract fixture (ADVICE r2): Java \s includes \x0B,
# RE2/DuckDB \s does not. Both engines now tokenize on the explicit
# [ \t\n\x0b\f\r] class; documents containing vertical tabs (and every
# other ASCII whitespace) must therefore compare equal bit-for-bit.

WS_FIXTURE_TEXTS = [
    "alpha\x0bbeta gamma",
    "a\x0bb\x0bc a\x0bb\x0bc",
    "one two\tthree\nfour\ffive\rsix",
    "\x0bleading and trailing\x0b",
    "repeat repeat\x0brepeat repeat",
    "hello world hello world",
    "",
]


@pytest.mark.parametrize(
    "name",
    [
        "text_token_counts",
        "fingerprint",
        "repetition_stats",
        "bpe_token_counts",
        "normalize_text",
        "text_quality",
    ],
)
def test_vertical_tab_tokenization_parity(spark, name, tmp_path):
    rows = [(i, t, "en", "fx", len(t)) for i, t in enumerate(WS_FIXTURE_TEXTS)]
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    s_rows, s_cols = _spark_rows(QUERIES[name](spark, str(tmp_path)))
    d_rows, d_cols = _duck_rows(ORACLES[name], sf_dir=str(tmp_path))
    assert s_cols == d_cols
    assert s_rows == d_rows, f"{name}: first diffs {[p for p in zip(s_rows, d_rows) if p[0] != p[1]][:3]}"
