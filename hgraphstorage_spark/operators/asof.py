"""As-of (point-in-time) join — a temporal operator the reference lacks
and Spark has no built-in for (SURVEY.md §2.3 notes the reference's
"absent join kinds"; this is the extension surface).

For each left row, attach the most recent right row whose timestamp is
<= the left timestamp, per key — the standard way to align events with
the latest preceding state (price as of trade time, last view before a
click, feature value as of label time).

Scale design — the union+window plan, NOT an inequality join:
a naive ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + argmax explodes to
O(|matches|) intermediate rows (quadratic per key) and Spark plans
non-equi joins as broadcast-nested-loop. Instead both sides are
unioned, shuffled ONCE on the key, sorted per key by (ts, side), and a
running ``last(value, ignorenulls)`` window carries each right value
forward to the left rows that follow it. Cost: one shuffle + one
per-partition sort — linear, skew-bounded by the window sort, identical
shape to Structured Streaming's state-ordered merge.

Tie semantics: a right row at exactly the left timestamp matches
(inclusive), same as DuckDB/pandas ``ASOF JOIN`` / ``merge_asof``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Returns every left row (all its columns) plus, for
    each right column in ``value_cols`` (default: all non-key right
    columns), the value from the latest right row with ``right.on <=
    left.on`` within the same ``by`` group — NULL when no such row.

    Right-side columns are suffixed with ``suffix``; the matched right
    timestamp comes back as ``{on}{suffix}``.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    carried = [on, *value_cols]

    lhs = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carried],
    )
    rhs = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lhs.schema["_row"].dataType).alias("_row"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    # right rows sort before left rows at equal ts -> inclusive match;
    # among equal-ts right rows the last in (ts, side) order wins, matching
    # ASOF-join "latest" semantics
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).select(
        "_side",
        "_row",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in carried],
    )
    return merged.filter(F.col("_side") == 1).select(
        F.col("_row.*"),
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in carried],
    )
