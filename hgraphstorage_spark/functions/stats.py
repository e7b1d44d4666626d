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
