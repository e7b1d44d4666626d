"""Banded range join — point-in-interval equi-joinification.

The reference has no theta/range joins at all (SURVEY.md §2.3 "absent
join kinds"); Spark plans ``l JOIN r ON p >= lo AND p < hi`` as a
BroadcastNestedLoopJoin — O(|facts| * |intervals|) comparisons, which is
fatal when neither side is tiny. This operator decomposes every interval
into the fixed-width buckets it covers and equi-joins on the bucket id:

- facts map to exactly ONE bucket (``floor(point / width)``) — the fact
  side stays narrow, no blow-up, and the join is a plain hash join that
  AQE can re-plan / skew-split;
- intervals explode to ``ceil(len / width)`` buckets — choose ``width``
  near the typical interval length so the dimension side grows by a
  small constant;
- a residual ``lo <= p < hi`` filter after the bucket match restores
  exact semantics. Each (fact, interval) match is found in exactly one
  bucket (the fact's own), so no dedup pass is needed.

This is the same banding trick Databricks' range-join optimization and
PostGIS tile joins use. Interval semantics are half-open ``[lo, hi)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    facts: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every interval row with
    ``lo_col <= facts[point_col] < hi_col``.

    ``how`` is ``inner`` or ``left_outer`` (facts with no covering
    interval keep nulls on the interval columns). Columns of both inputs
    are preserved; name collisions must be resolved by the caller.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    w = F.lit(bucket_width)
    f = facts.withColumn(_BUCKET, F.floor(F.col(point_col) / w))
    # cover floor(lo/w) .. floor(hi/w) inclusive: the hi bucket may be
    # vacuous for [lo, hi) but the residual filter discards it — cheaper
    # than special-casing exact multiples of the width
    d = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))),
    )
    residual = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if how == "inner":
        return f.join(d, [_BUCKET]).filter(residual).drop(_BUCKET)
    # left_outer: the bucket equi-join alone is not a correct outer join
    # (a fact can match the bucket but fail the residual), so take the
    # inner result and union the anti side back with null interval cols
    inner = f.join(d, [_BUCKET]).filter(residual).drop(_BUCKET)
    matched_keys = inner.select(*facts.columns)
    unmatched = facts.join(matched_keys, facts.columns, "left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return inner.unionByName(unmatched)
