"""GraphEngine — the session object: version ledger, transactions, indexes.

Maps the reference's transaction/session machinery onto immutable
snapshots:

- ``withTxManager`` / ``withTransaction`` (``LowLevelDB/src/Database/
  LowLevelDB.hs:33-89``) → ``GraphEngine`` holding a ledger of committed
  snapshot versions plus staged (uncommitted) state;
- MVCC visibility (``MVCC.hs:271-298``, the PostgreSQL rule) → a reader
  pins a committed snapshot version: everything in it is "committed before
  my start", everything staged by others simply isn't in it. Uncommitted
  writes are visible only through the transaction's own staged snapshot —
  the two halves of the reference's visibility predicate;
- commit (``MVCC.hs:220-225``) → promote staged snapshot to a new version
  in the ledger; rollback → discard staged state;
- index registry + retroactive build + uniqueness (``HGraphStorage/src/
  .../API.hs:494-516``) → index DataFrames rebuilt/maintained per commit,
  ``DuplicateIndexKey`` raised on violation (parity with the reference's
  exception, ``API.hs:217-229``).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hgraphstorage_spark import mutations, schemas
from hgraphstorage_spark.compiler import TraversalResult, compile_traversal
from hgraphstorage_spark.snapshot import GraphSnapshot
from hgraphstorage_spark.traversal import Traversal


class DuplicateIndexKey(Exception):
    """Unique-index violation (reference ``DuplicateIndexKey`` throw,
    ``HGraphStorage/src/.../API.hs:217-229``)."""


def build_index(snap: GraphSnapshot, labels: Sequence[str], prop_names: Sequence[str]) -> DataFrame:
    """Retroactive index build (reference ``addIndex`` full fold,
    ``API.hs:494-516``): scan props once, project canonical string keys.

    Scale: one filtered scan + narrow projection — no shuffle. The index
    DataFrame is small relative to the graph and broadcastable at probe
    time (see compiler._apply_has).
    """
    props = snap.props.filter(F.col("owner_kind") == schemas.NODE_KIND)
    props = props.filter(F.col("name").isin(list(prop_names)))
    owners = snap.nodes
    if labels:  # empty = all labels (reference API.hs:543-546)
        owners = owners.filter(F.col("label").isin(list(labels)))
    from hgraphstorage_spark.compiler import value_str

    return (
        props.join(owners.select(F.col("id").alias("owner_id"), "label"), "owner_id", "inner")
        .select("owner_id", "label", "name", value_str().alias("key"))
    )


def check_unique(index_df: DataFrame, index_name: str) -> None:
    """Uniqueness enforcement (reference ``checkDuplicates``): a unique
    index admits one owner per (name, key)."""
    dup = (
        index_df.groupBy("name", "key")
        .agg(F.countDistinct("owner_id").alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise DuplicateIndexKey(
            f"index {index_name!r}: duplicate key {dup[0]['key']!r} for property {dup[0]['name']!r}"
        )


class GraphEngine:
    """Engine session: a ledger of committed snapshots + staged mutations."""

    # row-level mutations buffer as plan branches; past this many staged
    # mutations the plan is compacted (materialized) — the Spark analogue
    # of the reference's write buffering (GraphSettings buffer modes,
    # HGraphStorage/src/.../Types.hs:430-439): per-record plan growth would
    # otherwise make the Nth single-row add pay an N-branch union
    COMPACT_EVERY = 64

    def __init__(self, spark: SparkSession, snapshot: GraphSnapshot | None = None):
        self.spark = spark
        base = snapshot if snapshot is not None else GraphSnapshot.empty(spark)
        self._ledger: list[GraphSnapshot] = [base.with_version(0)]
        self._staged: GraphSnapshot | None = None
        self._stage_count = 0

    # -- snapshot access (MVCC reads) -------------------------------------
    @property
    def current(self) -> GraphSnapshot:
        """Latest committed snapshot + own staged writes (the reference's
        "created by me" visibility half, ``MVCC.hs:287-298``)."""
        return self._staged if self._staged is not None else self._ledger[-1]

    @property
    def committed(self) -> GraphSnapshot:
        return self._ledger[-1]

    def snapshot_at(self, version: int) -> GraphSnapshot:
        """Time travel: pinned read of an old committed version (reference
        repeatable-read semantics, ``MVCCSpec.hs:120-133``)."""
        for s in self._ledger:
            if s.version == version:
                return s
        raise KeyError(f"no committed snapshot version {version}")

    @property
    def versions(self) -> list[int]:
        return [s.version for s in self._ledger]

    # -- transactions ------------------------------------------------------
    def commit(self) -> int:
        """Promote staged state to a new committed version (T5). Enforces
        unique indexes against the full post-commit state first — commit
        fails atomically on violation."""
        if self._staged is None:
            return self._ledger[-1].version  # no writes: nothing to do (GC'd tx)
        staged = self._rebuild_indexes(self._staged)
        for reg_name, labels, prop_names in staged.index_registry:
            check_unique(staged.indexes[reg_name], reg_name)
        new_version = self._ledger[-1].version + 1
        self._ledger.append(staged.with_version(new_version))
        self._staged = None
        return new_version

    def rollback(self) -> None:
        self._staged = None

    def checkpoint(self, path: str) -> None:
        """Reference S7 ``checkpoint``: force-materialize the committed
        snapshot to storage."""
        self.committed.write(path)

    # -- mutations (staged until commit) ----------------------------------
    def _stage(self, snap: GraphSnapshot) -> None:
        self._staged = snap
        self._stage_count += 1
        if self._stage_count % self.COMPACT_EVERY == 0:
            self.compact()

    def compact(self) -> None:
        """Materialize the staged snapshot's plans (localCheckpoint), so a
        long row-at-a-time mutation session stays O(1) per call instead of
        re-evaluating an ever-deeper union chain."""
        if self._staged is None:
            return
        self._staged = replace(
            self._staged,
            nodes=self._staged.nodes.localCheckpoint(),
            edges=self._staged.edges.localCheckpoint(),
            props=self._staged.props.localCheckpoint(),
        )

    def add_nodes(self, rows, ids=None) -> list[int]:
        snap, new_ids = mutations.add_nodes(self.current, rows, ids)
        self._stage(snap)
        return new_ids

    def add_node(self, label: str, props: Mapping[str, object] | None = None) -> int:
        return self.add_nodes([(label, props or {})])[0]

    def add_edges(self, rows, ids=None) -> list[int]:
        snap, new_ids = mutations.add_edges(self.current, rows, ids)
        self._stage(snap)
        return new_ids

    def add_edge(self, src: int, dst: int, label: str, props: Mapping[str, object] | None = None) -> int:
        return self.add_edges([(src, dst, label, props or {})])[0]

    def add_nodes_df(self, nodes: DataFrame, props: DataFrame | None = None) -> None:
        self._stage(mutations.add_nodes_df(self.current, nodes, props))

    def add_edges_df(self, edges: DataFrame, props: DataFrame | None = None) -> None:
        self._stage(mutations.add_edges_df(self.current, edges, props))

    def update_node(self, node_id: int, label: str, props: Mapping[str, object]) -> None:
        self._stage(mutations.update_node(self.current, node_id, label, props))

    def delete_nodes(self, node_ids: list[int]) -> None:
        self._stage(mutations.delete_nodes(self.current, node_ids))

    def delete_edges(self, edge_ids: list[int]) -> None:
        self._stage(mutations.delete_edges(self.current, edge_ids))

    def set_properties(self, owner_id: int, owner_kind: str, props: Mapping[str, object]) -> None:
        self._stage(mutations.set_properties(self.current, owner_id, owner_kind, props))

    # -- indexes -----------------------------------------------------------
    def add_index(self, name: str, labels: Sequence[str] = (), prop_names: Sequence[str] = ()) -> None:
        """Register + retroactively build an index (reference X1). Raises
        DuplicateIndexKey if existing data violates uniqueness
        (``APITest.hs:158-165`` retroactive-indexing scenario)."""
        snap = self.current
        registry = snap.index_registry + ((name, tuple(labels), tuple(prop_names)),)
        idx = build_index(snap, labels, prop_names)
        check_unique(idx, name)
        indexes = dict(snap.indexes)
        indexes[name] = idx
        staged = replace(snap, index_registry=registry, indexes=indexes)
        if self._staged is None:
            # registering an index on a clean engine commits immediately
            # (the reference persists the registry on addIndex, API.hs:509)
            new_version = self._ledger[-1].version + 1
            self._ledger.append(staged.with_version(new_version))
        else:
            self._staged = staged

    def _rebuild_indexes(self, snap: GraphSnapshot) -> GraphSnapshot:
        """Index maintenance on commit (reference M1/M2 delta maintenance,
        ``API.hs:184-238`` — we rebuild declaratively; the build is a
        filtered scan so Catalyst incrementalizes nothing but costs one
        pass over props)."""
        if not snap.index_registry:
            return snap
        indexes = {}
        for reg_name, labels, prop_names in snap.index_registry:
            indexes[reg_name] = build_index(snap, labels, prop_names)
        return replace(snap, indexes=indexes)

    def index_lookup(self, index_name: str, value) -> DataFrame:
        """Point lookup (reference trie ``lookup``, X3)."""
        idx = self.current.indexes[index_name]
        return idx.filter(F.col("key") == schemas.canonical_string(value)).select("owner_id", "label", "name", "key")

    def index_prefix(self, index_name: str, prefix: str) -> DataFrame:
        """Prefix scan (reference trie ``prefix``/``prefixF``, X4)."""
        idx = self.current.indexes[index_name]
        return idx.filter(F.col("key").startswith(prefix)).select("owner_id", "label", "name", "key")

    # -- queries -----------------------------------------------------------
    def traverse(self, t: Traversal, version: int | None = None) -> TraversalResult:
        snap = self.current if version is None else self.snapshot_at(version)
        return compile_traversal(snap, t)

    def register_views(self, prefix: str = "graph", version: int | None = None) -> None:
        """Expose the (pinned) snapshot as SQL temp views —
        ``{prefix}_nodes`` / ``{prefix}_edges`` / ``{prefix}_props`` — so
        the whole Spark SQL surface works over the graph directly
        (``spark.sql("SELECT label, count(*) FROM graph_nodes GROUP BY
        label")``). Views capture the snapshot's lazy plan, so Catalyst
        still prunes/pushes down through them; re-register after commits
        to move the views forward (MVCC: a registered view is a pinned
        read, like any snapshot reference)."""
        snap = self.current if version is None else self.snapshot_at(version)
        snap.nodes.createOrReplaceTempView(f"{prefix}_nodes")
        snap.edges.createOrReplaceTempView(f"{prefix}_edges")
        if snap.props is not None:
            snap.props.createOrReplaceTempView(f"{prefix}_props")

    def sql(self, query: str, prefix: str = "graph", version: int | None = None):
        """Run a SQL query against the snapshot's views (registering them
        first). The HGraphStorage surface is programmatic (Traversal /
        query_step); this is the Spark-native extension of it."""
        self.register_views(prefix=prefix, version=version)
        return self.spark.sql(query)
