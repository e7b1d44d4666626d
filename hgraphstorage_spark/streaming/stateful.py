"""Custom stateful streaming operator (SURVEY.md §2.10 extension).

The reference maintains entity counters incrementally on every mutation:
STMGraph's ``Counts`` record is updated by the write path and persisted in
``counts.db`` (``STMGraph/src/Database/Graph/STMGraph/Raw.hs:424-479``,
``Types.hs:437-441``). Spark-first, that is a *stateful streaming
aggregation* over the mutation-event stream: per-key state (one running
count per (kind, label)) kept by the state store, updated per micro-batch,
emitted on change — ``applyInPandasWithState`` because the semantics
(arbitrary per-key state machine, not a windowed agg) are exactly what the
built-in operators don't express.

Scale notes: state is partitioned by the group key across executors; the
key space (entity kinds × labels) is schema-like and tiny, so state never
grows with data volume. Arrow batches carry the micro-batch rows — no
row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = "kind STRING, label STRING, n BIGINT"
STATE_SCHEMA = "n BIGINT"


def running_label_counts(mutations: DataFrame) -> DataFrame:
    """Running entity counts per (kind, label) over a mutation stream.

    Input schema needs ``op`` ('add_node'|'add_edge'|'del_node'|'del_edge')
    and ``label``. Emits one (kind, label, n) row per key per micro-batch
    in which the key changed — the streaming analogue of the reference's
    ``nbNodes``/``nbEdges`` maintained counters (adds increment, deletes
    decrement, ``Raw.hs:424-479``).

    Also accepts a batch DataFrame (returns the same final counts via a
    plain aggregation) so stream==batch parity is testable.
    """
    tagged = mutations.select(
        F.when(F.col("op").endswith("node"), F.lit("node")).otherwise(F.lit("edge")).alias("kind"),
        F.col("label"),
        F.when(F.col("op").startswith("add"), F.lit(1)).otherwise(F.lit(-1)).alias("delta"),
    )
    if not mutations.isStreaming:
        return tagged.groupBy("kind", "label").agg(F.sum("delta").cast("long").alias("n"))

    import pandas as pd  # noqa: F401 — required by the state function
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        import pandas as pd

        current = state.get[0] if state.exists else 0
        delta = 0
        for pdf in pdf_iter:
            delta += int(pdf["delta"].sum())
        if delta != 0 or not state.exists:
            current += delta
            state.update((current,))
            yield pd.DataFrame({"kind": [key[0]], "label": [key[1]], "n": [current]})

    return tagged.groupBy("kind", "label").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUTPUT_SCHEMA = "shard INT, item STRING, count_lb BIGINT"
HH_STATE_SCHEMA = "items ARRAY<STRING>, counts ARRAY<BIGINT>"


def stream_heavy_hitters(
    items: DataFrame,
    capacity: int = 64,
    item_col: str = "item",
    shards: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state: a Misra-Gries summary
    (Misra & Gries 1982; the Frequent algorithm) per hash shard,
    maintained across micro-batches by ``applyInPandasWithState`` — the
    fixed-memory answer to "which domains / event types / tokens
    dominate this stream?" when exact per-key streaming counts would
    grow state without bound.

    Guarantee (classic): within a shard that has seen N items, every
    reported ``count_lb`` satisfies true − N/(capacity+1) <= count_lb <=
    true, and any item with true frequency > N/(capacity+1) is present.
    With fewer distinct items than ``capacity`` the counts are EXACT —
    which is what the stream==batch parity test pins.

    Scale shape: items hash into ``shards`` state groups so summaries
    update in parallel (state per shard = ``capacity`` (item, count)
    pairs, constant); each micro-batch pre-aggregates Arrow-side
    (``value_counts``) before touching the summary. Batch frames return
    exact per-shard counts (the parity twin). Emits the full current
    summary per shard per micro-batch (update mode).

    ``hash_mode="md5"`` shards with the engine-portable ``md5_long``
    family instead of xxhash64, so a DuckDB oracle can replay the shard
    assignment (the standard dual-hash pattern; xxhash64 stays the
    production fast path)."""
    from hgraphstorage_spark.pipeline.dedup import md5_long

    shard_hash = (
        md5_long(F.col(item_col)) if hash_mode == "md5" else F.xxhash64(F.col(item_col))
    )
    # NULL items drop in BOTH paths (pandas value_counts would silently
    # drop them stream-side only — the parity twin must agree)
    tagged = items.filter(F.col(item_col).isNotNull()).select(
        F.pmod(shard_hash, F.lit(shards)).cast("int").alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    if not items.isStreaming:
        return tagged.groupBy("shard", "item").agg(
            F.count(F.lit(1)).cast("long").alias("count_lb")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            it, ct = state.get
            summary = dict(zip(it, ct))
        else:
            summary = {}
        for pdf in pdf_iter:
            for item, w in pdf["item"].value_counts().items():
                summary[item] = summary.get(item, 0) + int(w)
                if len(summary) > capacity:
                    m = min(summary.values())
                    summary = {k2: v - m for k2, v in summary.items() if v > m}
        state.update((list(summary.keys()), [int(v) for v in summary.values()]))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(summary),
                "item": list(summary.keys()),
                "count_lb": [int(v) for v in summary.values()],
            }
        )

    return tagged.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
