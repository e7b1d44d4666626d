"""Deterministic hash-based sampling / dataset splitting.

Train/val/test assignment must be (a) stable across runs and cluster
sizes, (b) independent of row order and partitioning, and (c) cheap. A
content-hash bucket satisfies all three where ``df.sample``/TABLESAMPLE
(seeded RNG over a partition iteration order) satisfies none at scale.

Mechanism: bucket = first 8 hex digits of md5(id || ':' || salt),
compared against cumulative-fraction thresholds as fixed-width hex
strings. String comparison of equal-length lowercase hex equals numeric
comparison, and md5 is identical everywhere (JVM, DuckDB, Python), so
the split is reproducible bit-for-bit by any engine — the SQL oracle
mirrors it with the same CASE over the same literals. Narrow map-only
plan: no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPACE = 16 ** 8  # bucket space: first 8 hex digits of the md5


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound)] in declaration order; the last
    split absorbs rounding remainder (its bound is not used)."""
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1.0")
    out, cum = [], 0.0
    for name, frac in fractions.items():
        cum += frac
        out.append((name, format(min(int(cum * _SPACE), _SPACE - 1), "08x")))
    return out


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    Returns (id_col, bucket, split). ``salt`` namespaces independent
    splits of the same ids (resampling = change the salt, never the data).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thresholds = split_thresholds(fractions)
    bucket = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
    )
    # nest so the smallest bound is the outermost test: earliest split wins
    expr = F.lit(thresholds[-1][0])
    for name, bound in reversed(thresholds[:-1]):
        expr = F.when(bucket <= F.lit(bound), F.lit(name)).otherwise(expr)
    return df.select(F.col(id_col), bucket.alias("bucket"), expr.alias("split"))


def hash_split_case_sql(
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """The ANSI-SQL expression equivalent to ``hash_split`` (for oracles
    and for pushing the split into external engines)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thresholds = split_thresholds(fractions)
    bucket = f"substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 8)"
    whens = " ".join(
        f"WHEN {bucket} <= '{bound}' THEN '{name}'" for name, bound in thresholds[:-1]
    )
    return f"CASE {whens} ELSE '{thresholds[-1][0]}' END"
