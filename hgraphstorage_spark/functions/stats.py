"""Grouped distribution statistics.

Exact percentiles (``F.percentile``, linear interpolation — the same
definition as ANSI ``percentile_cont`` / DuckDB ``quantile_cont``, so
oracles match bit-for-bit before rounding) and the approximate scale
path (``percentile_approx``, a bounded-memory KLL-style sketch that
merges associatively across partitions).

Scale note: exact grouped percentiles buffer each group's values in the
aggregation — fine for bounded groups (event types, labels), wrong for
100 TB high-cardinality values per group. At that scale call with
``exact=False``; the sketch is one map-side-combined shuffle with O(1/ε)
state per group regardless of input size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95),
    exact: bool = True,
) -> DataFrame:
    """Per group: row count, mean, and one column per requested percentile
    (``p50``-style names). Values rounded to DECIMAL(18,6) so results are
    engine-portable."""

    def _name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}"

    fn = F.percentile if exact else (lambda c, p: F.percentile_approx(c, p, 10_000))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(value_col), 6).cast("decimal(18,6)").alias("mean"),
        *[
            F.round(fn(F.col(value_col), F.lit(p)), 6)
            .cast("decimal(18,6)")
            .alias(_name(p))
            for p in percentiles
        ],
    ]
    return df.groupBy(group_col).agg(*aggs)


def grouped_distinct_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
    exact: bool = True,
) -> DataFrame:
    """Per group: distinct-value count, exact and/or HyperLogLog++
    approximate.

    The scale story mirrors ``grouped_percentiles``: exact
    ``count(DISTINCT)`` shuffles every distinct (group, value) pair —
    fine until value cardinality per group is huge; the HLL++ sketch
    (``approx_count_distinct``) is fixed-size per group, merges
    associatively map-side, and is what you run at 100 TB. Both columns
    are returned when ``exact=True`` so callers can calibrate; HLL++ is
    deterministic (fixed xxhash64 seed, no sampling), so results are
    stable run-to-run and testable.
    """
    aggs = [F.approx_count_distinct(value_col, rsd=rsd).alias("n_distinct_approx")]
    if exact:
        aggs.insert(0, F.countDistinct(value_col).alias("n_distinct"))
    return df.groupBy(group_col).agg(*aggs)


def percentile_band_filter(
    df: DataFrame,
    metric_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Winsorizing outlier gate: keep rows whose ``metric_col`` lies
    inside the corpus's [lo, hi] percentile band — the standard curation
    step for dropping pathological lengths/scores without hand-tuned
    absolute thresholds (thresholds that are wrong again after the next
    crawl shifts the distribution).

    Exact interpolated percentiles (ANSI ``percentile_cont`` semantics,
    identical interpolation formula in DuckDB's ``quantile_cont``) so
    the gate is oracle-checkable; at 100 TB swap in
    ``approx_percentile`` for a fixed-memory sketch — the operator shape
    (1-row aggregate re-entering as a broadcast) is unchanged. Returns
    the input rows with ``p_lo``/``p_hi`` bound columns attached.
    """
    bounds = df.agg(
        F.expr(f"percentile({metric_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({metric_col}, {hi})").alias("p_hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(F.col(metric_col).between(F.col("p_lo"), F.col("p_hi")))
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """The ANALYZE-style data profile, long format: per column its null
    count, exact distinct count, and min/max (string-rendered) — the
    first query run against any unfamiliar table, and the freshness/
    sanity check a pipeline owner schedules after every load.

    One pass per column batched into a single wide aggregate (Catalyst
    partial-aggregates every branch map-side; the exchange carries one
    row per partition), then unpivoted to long format driver-side-free.
    Exact countDistinct keeps it oracle-checkable — swap
    approx_count_distinct at 100 TB where the ±2% sketch is the right
    trade (same plan shape, fixed memory)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack}) AS (col, n_nulls, n_distinct, min_v, max_v)",
    ).select("col", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity check: child rows whose key has no parent —
    the other standing data-quality query. One left_anti join (broadcast
    when the parent is a dimension); NULL keys are excluded (SQL FK
    semantics: NULL references nothing and violates nothing). Returns
    the violating child rows unmodified."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
