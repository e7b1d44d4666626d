"""Rolling time-window features over an event stream — the
feature-engineering companion to the as-of join: at every event, the
aggregates of the same key's events in the trailing window (count, sum,
mean over the last hour), computed with a RANGE window frame.

Scale design: one shuffle on the key, one per-partition sort by time —
the same cost envelope as any keyed window. The frame is RANGE over
epoch-microseconds (integer), so boundary semantics are exact and
identical across engines (DuckDB: ``RANGE BETWEEN n PRECEDING`` over
``epoch_us``). Sums go through DECIMAL so results are independent of
within-frame order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_event_features(
    events: DataFrame,
    window_seconds: int = 3600,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per event: count / sum / mean of the same key's events within the
    trailing ``window_seconds`` (inclusive of the current event).
    Returns (id, by, ts, n_win, sum_win, mean_win)."""
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(by)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(F.col(value_col).cast("decimal(18,2)")).over(w)
    return events.select(
        id_col,
        by,
        ts_col,
        n.alias("n_win"),
        s.alias("sum_win"),
        F.round(s / n, 6).cast("decimal(18,6)").alias("mean_win"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int = 86400,
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel analysis: per key, the first time each step in ``steps`` was
    completed, where step i must happen strictly after step i-1's first
    completion and within ``within_seconds`` of it (rolling window).
    Returns (by, t1..tn TIMESTAMP) with NULLs from the first missed step
    on — keep partial funnels so conversion = count(t_i not null)/count.

    Scale shape: one filtered min-aggregate plus one key-equi join per
    step — k-1 shuffles on the (high-cardinality) key for a k-step
    funnel, no windows over full history, no row explosion. Deterministic
    (min over exact timestamps), so SQL-oracle-able step by step.

    The running ``out`` frame is referenced TWICE per iteration (as the
    previous-step gate inside ``nxt`` and as the left side of the
    accumulate join), so without a materialization barrier Catalyst
    replays the whole prefix down both branches — measured at k=3:
    seven scans of the events source and zero ReusedExchange, and the
    duplication compounds ~2^k with funnel depth. Each iteration
    therefore ``localCheckpoint``s the previous ``out`` (one row per
    step-1-completing key — the small frame, never the event log),
    the same lineage-truncation convention the iterative graph loops
    use; scans of the event source drop to exactly one per step.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    base = events.select(by, ts_col, type_col)
    out = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(by)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i-1}"
        out = out.localCheckpoint()
        nxt = (
            base.filter(F.col(type_col) == step)
            .join(out.select(by, prev), by)
            .filter(
                (F.col(ts_col) > F.col(prev))
                & (F.col(ts_col) <= F.col(prev) + F.expr(f"INTERVAL {within_seconds} SECONDS"))
            )
            .groupBy(by)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, by, "left")
    return out


def retention_cohorts(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their first
    event (``cohort_week``), counted distinct in each ``period_days``
    bucket since that first event. (cohort_week, period, n_users).

    Two shuffles on the key (first-event agg + the join back) and one on
    (cohort, period) with partial aggregation. Periods derive from
    epoch-microsecond arithmetic (exact in doubles up to 2^53), so any
    engine reproduces the bucketing bit-for-bit.
    """
    first = events.groupBy(by).agg(F.min(ts_col).alias("_first_ts"))
    period_us = period_days * 86_400 * 1_000_000
    period = F.floor(
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_first_ts"))) / F.lit(period_us)
    )
    return (
        events.join(first, by)
        .select(
            F.date_trunc("week", F.col("_first_ts")).alias("cohort_week"),
            period.alias("period"),
            F.col(by),
        )
        .groupBy("cohort_week", "period")
        .agg(F.count_distinct(F.col(by)).alias("n_users"))
    )


def ewma_features(
    events: DataFrame,
    alpha: float = 0.3,
    lags: int = 20,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per event: exponentially-weighted moving average of the same key's
    trailing ``lags`` values (the standard recursive EWMA
    ``y_i = alpha*v_i + (1-alpha)*y_{i-1}``, initialized at the window's
    first value). Returns (id, by, ts, ewma DECIMAL(18,6)).

    Truncating at ``lags`` events bounds state AND makes the operator
    engine-portable: weights below (1-alpha)^lags are dropped on both
    sides identically instead of depending on unbounded history. The
    frame values are collected in window order and folded left — one
    keyed shuffle + per-partition sort (the cost envelope of any keyed
    window), then pure narrow arithmetic. The fold is the identical IEEE
    sequence in DuckDB's ``list_reduce``, so results match exactly
    (round-6 canon guards the principle anyway). Ordering ties break on
    the event id for cross-engine determinism."""
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(lags - 1), 0)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    a, b = float(alpha), 1.0 - float(alpha)
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(F.lit(a) * x + F.lit(b) * acc),
    )
    return events.select(
        id_col,
        by,
        ts_col,
        F.round(ewma, 6).cast("decimal(18,6)").alias("ewma"),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    emit: str = "sessions",
) -> DataFrame:
    """Gap-based sessionization: a key's timeline splits into sessions
    wherever consecutive events are more than ``gap_seconds`` apart — the
    standard clickstream/session-boundary operator (reference parity: the
    engine's keyed-ordered-fold shape, SURVEY §2.4; not a reference op —
    north-star events extension like `funnel`/`retention_cohorts`).

    ``emit="events"`` labels every event: (by, id, ts, session_seq) where
    ``session_seq`` numbers a key's sessions from 1 in time order.
    ``emit="sessions"`` aggregates: (by, session_seq, session_start,
    session_end, n_events, total_value DECIMAL(18,2), duration_s).

    Streaming twin: `hgraphstorage_spark.streaming.sessionize` computes
    the same sessions incrementally via the native ``session_window``
    (state bounded by watermark). Boundary semantics differ only at an
    EXACTLY-gap-wide silence: this operator merges (split on strictly
    greater), ``session_window`` splits (merge on strictly smaller) —
    agreement on microsecond-timestamped data is tested; session_end
    there is last_event + gap, here the last event itself.

    Scale shape: ONE shuffle keyed by ``by`` + one per-partition sort —
    the lag boundary flag and its running sum share the identical window
    spec, so Catalyst collapses them into a single Window operator; the
    ``emit="sessions"`` group-by keys start with the partition key, so
    HashPartitioning(by) already satisfies the aggregate's clustered
    distribution and NO second exchange appears (plan-tested). Boundary
    arithmetic is integer epoch-microseconds; ties order by the event id
    — both exactly reproducible in ANSI SQL, hence oracle-checkable."""
    if emit not in ("events", "sessions"):
        raise ValueError(f"emit must be 'events' or 'sessions', got {emit!r}")
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(by).orderBy(F.col("_us"), F.col(id_col))
    base = events.select(by, id_col, ts_col, F.col(value_col), us.alias("_us"))
    prev = F.lag("_us").over(w)
    is_new = F.when(prev.isNull() | (F.col("_us") - prev > gap_seconds * 1_000_000), 1).otherwise(0)
    labeled = base.select(
        by,
        id_col,
        ts_col,
        value_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_seq"),
    )
    if emit == "events":
        return labeled.select(by, id_col, ts_col, "session_seq")
    dur = F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
    return labeled.groupBy(by, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total_value"),
        F.floor(dur / 1_000_000).alias("duration_s"),
    )


def event_transitions(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    consecutive event pair within a key's timeline, counts and row-
    normalized probabilities — the standard behavioral-sequence summary
    (what follows a 'view'? how often does 'error' self-loop?).

    One keyed window (lead over (ts, id) order — deterministic ties)
    produces the pairs narrowly; the (from, to) count aggregate
    partial-combines map-side, and the per-from totals come from a
    window over the tiny counts frame. Returns
    (from_type, to_type, n, prob DECIMAL(18,6))."""
    w = Window.partitionBy(by).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(by),
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tw = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(tw), 6).cast("decimal(18,6)").alias("prob"),
    )


def time_rollup(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Time-bucketed partial rollup — the TimescaleDB continuous-
    aggregate shape: per (bucket, key) the MERGEABLE summary (count,
    DECIMAL sum, min, max). Because every column is an algebraic
    aggregate, per-day / per-shard rollups combine losslessly with
    :func:`rollup_merge` — incremental materialized-view maintenance is
    'roll up the new slice, merge, done', never a re-scan of history.

    Returns (bucket_start, key, n_events, total_value, min_value,
    max_value). One map-side-combined shuffle keyed by the (bucket, key)
    pair; sums in DECIMAL so merge order can't change a cent."""
    return (
        events.groupBy(F.window(F.col(ts_col), bucket).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total_value"),
            F.min(F.col(value_col).cast("decimal(18,2)")).alias("min_value"),
            F.max(F.col(value_col).cast("decimal(18,2)")).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col(key_col),
            "n_events",
            "total_value",
            "min_value",
            "max_value",
        )
    )


def rollup_merge(a: DataFrame, b: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Merge two :func:`time_rollup` frames built with the SAME bucket
    width: counts/sums add, min/max fold — the associative merge that
    makes the rollup a continuous aggregate (law: merge(rollup(A),
    rollup(B)) == rollup(A ++ B), tested and driver-hashed)."""
    return (
        a.unionByName(b)
        .groupBy("bucket_start", key_col)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("decimal(18,2)").alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
