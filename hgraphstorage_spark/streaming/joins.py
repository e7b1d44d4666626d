"""Stream-stream interval join (extension; the reference has no streaming
— SURVEY.md §2.10 — and no interval join kind, §2.3 "absent join kinds").

``interval_join`` attaches to each left event every right event of the
same key whose timestamp falls in ``[left.ts - lookback, left.ts]`` —
the bounded-history enrichment pattern (clicks ← views that preceded
them within 30 minutes).

Scale design: the join is EQUI on the key with the time range as a
secondary condition, so Spark plans a hash/sort-merge join shuffled on
the key — never a nested-loop over time. On streams, both sides carry
watermarks and the range condition bounds the buffered state: rows age
out once the watermark passes ``ts + lookback`` (Structured Streaming
derives the state retention from exactly this pair of constraints).
Batch DataFrames run the identical plan minus state, so stream == batch
on complete data — that is what the parity test and the SQL oracle pin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Interval join: left rows × right rows of the same ``by`` key with
    ``right.on`` in ``[left.on - lookback, left.on]`` (inclusive).
    Right columns come back suffixed. Works on two batch frames or two
    streaming frames (watermarked). ``how='left_outer'`` keeps unmatched
    left rows (on streams they emit once the watermark passes their
    match window — the standard outer stream-stream join semantics)."""
    by = list(by)
    if left.isStreaming:
        left = left.withWatermark(on, watermark)
    if right.isStreaming:
        right = right.withWatermark(on, watermark)
    r = right.select(
        *by, *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c not in by]
    )
    rts = F.col(f"{on}{suffix}")
    cond = F.lit(True)
    for c in by:
        cond = cond & (left[c] == r[c])
    cond = cond & rts.between(F.col(on) - F.expr(f"INTERVAL {lookback}"), F.col(on))
    joined = left.join(r, cond, how)
    return joined.drop(*[r[c] for c in by])


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to an event stream. The static side is re-planned per
    micro-batch (so a refreshed dimension snapshot is picked up) and — as
    a broadcast-eligible small side — joined without shuffling the
    stream: at 100 TB/day of events the stream stays narrow and only the
    dimension table moves. Works identically on batch DataFrames (same
    plan, minus the micro-batch loop).

    `dim_cols` selects which dimension attributes to carry (default: all
    but the key). Stateless — no watermark needed, unlike stream-stream
    joins (`interval_join`)."""
    cols = dim_cols if dim_cols is not None else [c for c in dim.columns if c != on]
    small = dim.select(on, *cols)
    return events.join(F.broadcast(small), on, how)
