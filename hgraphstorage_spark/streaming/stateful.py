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
