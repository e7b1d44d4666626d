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


class WriteConflict(Exception):
    """First-committer-wins: a concurrent transaction committed a write to
    the same entity after this transaction started (the write-lock
    outcome of the reference's per-record version chains,
    ``LowLevelDB/src/.../MVCC.hs:200-225``)."""


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


class Transaction:
    """A concurrent transaction over a ``GraphEngine`` (reference
    ``newTx``/``commit``/``rollback``, ``LowLevelDB/src/.../MVCC.hs`` and
    the interleavings of ``MVCCSpec.hs:102-165``).

    Snapshot isolation, the reference's visibility rule mapped to
    immutable snapshots:

    - reads come from the committed version pinned at ``begin()`` plus the
      transaction's OWN staged writes — commits by other transactions
      after start are never visible (``"doesn't see data added committed
      after it started"``), and rows they delete remain visible
      (``"still sees data deleted and committed after it started"``);
    - writes stage privately as both a snapshot (for reads-own-writes) and
      a replayable mutation log;
    - ``commit()`` replays the log onto the CURRENT ledger head, so
      non-conflicting concurrent committers all land (the Wikipedia
      example's tx1/tx3). Conflicts resolve first-committer-wins:
      a write-set intersection with any commit that landed after this
      transaction started raises ``WriteConflict``, and unique indexes are
      re-checked against the merged state (``DuplicateIndexKey``).
    """

    def __init__(self, engine: "GraphEngine"):
        self._engine = engine
        self.start_version = engine.committed.version
        self._base = engine.committed
        self._staged: GraphSnapshot = self._base
        self._log: list = []  # replay fns (pure snapshot -> snapshot)
        self._ops: list = []  # serializable op descriptors (durable ledger)
        self.written_ids: set[int] = set()
        self._done: str | None = None
        # type-dictionary notes, applied to the engine model on commit
        # (rolled-back transactions never touch the shared dictionary)
        self._type_notes: list[tuple[str, str]] = []

    # -- reads -------------------------------------------------------------
    @property
    def snapshot(self) -> GraphSnapshot:
        """Pinned base + own staged writes (both halves of the reference
        visibility predicate, ``MVCC.hs:271-298``)."""
        self._check_open()
        return self._staged

    def traverse(self, t: Traversal) -> TraversalResult:
        return compile_traversal(self.snapshot, t)

    # -- writes ------------------------------------------------------------
    def _check_open(self) -> None:
        if self._done is not None:
            raise RuntimeError(f"transaction already {self._done}")

    def _apply(self, fn, written_ids, op=None) -> None:
        """Stage a mutation and record it for commit-time replay. ``fn``
        must be a pure snapshot -> snapshot function so replay onto a
        different ledger head produces the same delta (ids are pinned at
        first application, never re-generated at replay). ``op`` is the
        JSON-serializable descriptor a durable ledger persists (every
        row-level transaction op has one)."""
        self._check_open()
        self._staged = fn(self._staged)
        self._log.append(fn)
        if op is not None and self._ops is not None:
            self._ops.append(op)
        self.written_ids.update(written_ids)

    def add_nodes(self, rows, ids=None) -> list[int]:
        # ids come from the ENGINE-wide allocator (the reference's shared
        # TxManager counter): two live transactions can never mint the same
        # id, so their inserts are non-conflicting by construction. The
        # reservation is pinned here, making commit-time replay stable.
        rows = list(rows)
        self._note_types("node_type", ((label, props) for label, props in rows))
        new_ids = ids if ids is not None else self._engine._reserve_node_ids(len(rows), self._staged)
        self._apply(
            lambda s, r=rows, i=list(new_ids): mutations.add_nodes(s, r, i)[0],
            new_ids,
            op=["add_nodes", [[label, dict(props or {})] for label, props in rows], list(new_ids)],
        )
        return new_ids

    def _note_types(self, kind: str, labeled_props) -> None:
        from hgraphstorage_spark import schemas

        for label, props in labeled_props:
            self._type_notes.append((kind, label))
            for name, value in (props or {}).items():
                for v in value if isinstance(value, list) else [value]:
                    self._type_notes.append(("property_type", f"{name}:{schemas.infer_dtype(v)}"))

    def add_node(self, label: str, props: Mapping[str, object] | None = None) -> int:
        return self.add_nodes([(label, props or {})])[0]

    def add_edges(self, rows, ids=None) -> list[int]:
        rows = list(rows)
        self._note_types("edge_type", ((label, props) for _s, _d, label, props in rows))
        new_ids = ids if ids is not None else self._engine._reserve_edge_ids(len(rows), self._staged)
        self._apply(
            lambda s, r=rows, i=list(new_ids): mutations.add_edges(s, r, i)[0],
            new_ids,
            op=[
                "add_edges",
                [[src, dst, label, dict(props or {})] for src, dst, label, props in rows],
                list(new_ids),
            ],
        )
        return new_ids

    def add_edge(self, src: int, dst: int, label: str, props: Mapping[str, object] | None = None) -> int:
        return self.add_edges([(src, dst, label, props or {})])[0]

    def update_node(self, node_id: int, label: str, props: Mapping[str, object]) -> None:
        self._apply(
            lambda s: mutations.update_node(s, node_id, label, props),
            [node_id],
            op=["update_node", node_id, label, dict(props)],
        )

    def delete_nodes(self, node_ids: list[int]) -> None:
        self._apply(
            lambda s: mutations.delete_nodes(s, node_ids),
            node_ids,
            op=["delete_nodes", list(node_ids)],
        )

    def delete_edges(self, edge_ids: list[int]) -> None:
        self._apply(
            lambda s: mutations.delete_edges(s, edge_ids),
            edge_ids,
            op=["delete_edges", list(edge_ids)],
        )

    def set_properties(self, owner_id: int, owner_kind: str, props: Mapping[str, object]) -> None:
        self._apply(
            lambda s: mutations.set_properties(s, owner_id, owner_kind, props),
            [owner_id],
            op=["set_properties", owner_id, owner_kind, dict(props)],
        )

    # -- outcome -----------------------------------------------------------
    def commit(self) -> int:
        """First-committer-wins publish (reference ``commit``,
        ``MVCC.hs:220-225``). Raises ``WriteConflict`` if an intervening
        commit wrote any entity this transaction wrote; raises
        ``DuplicateIndexKey`` if the merged state violates a unique index
        (both leave the transaction open for rollback/inspection)."""
        self._check_open()
        eng = self._engine
        if not self._log:
            self._done = "committed"
            return eng.committed.version
        while True:
            # pull commits other engines/processes published (durable
            # ledger); in-memory engines are already current
            eng._refresh()
            head = eng.committed
            if head.version != self.start_version:
                for version, written in eng._entries_after(self.start_version):
                    if written is None:
                        # a bulk DataFrame ingest published after we
                        # started; its write-set is unenumerated
                        # (collecting it would defeat the bulk path), so
                        # conservatively conflict
                        raise WriteConflict(
                            f"version {version} was a bulk ingest with an unenumerated "
                            f"write-set, committed after this transaction started at "
                            f"version {self.start_version}"
                        )
                    if written & self.written_ids:
                        raise WriteConflict(
                            f"entities {sorted(written & self.written_ids)[:5]} were written by "
                            f"version {version} after this transaction started at "
                            f"version {self.start_version}"
                        )
                merged = head
                for fn in self._log:
                    merged = fn(merged)
            else:
                merged = self._staged
            merged = eng._rebuild_indexes(merged)
            for reg_name, _labels, _prop_names in merged.index_registry:
                check_unique(merged.indexes[reg_name], reg_name)
            new_version = head.version + 1
            if eng._try_publish(
                merged.with_version(new_version), set(self.written_ids), self._ops, "tx"
            ):
                break
            # CAS lost: someone claimed new_version between our conflict
            # check and publish — loop re-checks against the new entries
        for kind, name in self._type_notes:  # M8 upsert, first-use order
            eng.model.note(kind, name)
        self._done = "committed"
        return new_version

    def rollback(self) -> None:
        self._check_open()
        self._done = "rolled back"


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
        # a pre-loaded snapshot keeps its version id (a durable engine
        # reopens at the persisted head, not at 0)
        self._ledger: list[GraphSnapshot] = [base if snapshot is not None else base.with_version(0)]
        self._staged: GraphSnapshot | None = None
        self._staged_base_version: int | None = None
        self._stage_count = 0
        # (version, written entity ids) per commit — transaction AND
        # implicit path alike — the conflict-detection trail for
        # first-committer-wins. ``None`` = unenumerated write-set (bulk
        # DataFrame ingest): conflicts with every later transaction.
        self._commit_writes: list[tuple[int, set[int] | None]] = []
        # entity ids written on the implicit staging path since the last
        # implicit commit; None once a bulk-df write makes the set
        # unenumerable
        self._staged_writes: set[int] | None = set()
        # serializable op descriptors mirroring _staged_writes; None once
        # a bulk-df write makes the log unrepresentable as metadata
        self._staged_ops: list | None = []
        # engine-wide id high-water marks spanning live transactions
        self._id_high: dict[str, int] = {}
        # maintained type dictionary (reference M8 upsert — ids in
        # first-use order, not derived lexicographically after the fact)
        from hgraphstorage_spark.model import ModelDict

        self.model = ModelDict()
        if snapshot is not None:
            self.model.dirty = True  # fold pre-loaded types in on access

    def begin(self) -> Transaction:
        """Open a concurrent transaction pinned at the current committed
        version (reference ``newTx``). Any number may be live at once;
        each stages privately and commits first-committer-wins."""
        self._refresh()
        return Transaction(self)

    # -- publish hooks (overridden by the durable ledger, store.py) --------
    def _refresh(self) -> None:
        """Pull commits published by other engine instances. In-memory
        engines are single-process: nothing to pull."""

    def _entries_after(self, version: int) -> list[tuple[int, set[int] | None]]:
        """The first-committer-wins conflict trail: (version, write-set)
        for every commit after ``version``."""
        return [(v, w) for v, w in self._commit_writes if v > version]

    def _try_publish(self, snapshot: GraphSnapshot, writes, ops, kind: str) -> bool:
        """Claim ``snapshot.version`` as the next committed version.
        In-memory: single-process, the claim always succeeds. Durable
        engines CAS against the file ledger and may lose the race."""
        self._ledger.append(snapshot)
        self._commit_writes.append((snapshot.version, writes))
        return True

    # -- engine-wide id allocation (shared across live transactions) -------
    def _reserve_ids(self, kind: str, count: int, df: DataFrame, snap_max) -> list[int]:
        current_max = snap_max if snap_max is not None else (
            (df.agg(F.max("id").alias("m")).collect()[0]["m"]) or 0
        )
        base = max(self._id_high.get(kind, 0), current_max)
        self._id_high[kind] = base + count
        return list(range(base + 1, base + count + 1))

    def _reserve_node_ids(self, count: int, snap: GraphSnapshot) -> list[int]:
        return self._reserve_ids("node", count, snap.nodes, snap.max_node_id)

    def _reserve_edge_ids(self, count: int, snap: GraphSnapshot) -> list[int]:
        return self._reserve_ids("edge", count, snap.edges, snap.max_edge_id)

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
        fails atomically on violation.

        This is the implicit single-writer path; mixing it with live
        ``begin()`` transactions is guarded: if a transaction committed
        after this implicit staging began, promoting the (older-based)
        staged snapshot would silently erase that commit, so the engine
        raises ``WriteConflict`` instead (rollback and replay, or use
        transactions for all concurrent writers)."""
        if self._staged is None:
            return self._ledger[-1].version  # no writes: nothing to do (GC'd tx)
        self._refresh()
        if self._staged_base_version is not None and self._staged_base_version != self._ledger[-1].version:
            raise WriteConflict(
                f"a concurrent writer committed version {self._ledger[-1].version} after "
                f"this implicit staging began at version {self._staged_base_version}; "
                "promoting the staged snapshot would overwrite it — rollback and replay, "
                "or use engine.begin() transactions for every concurrent writer"
            )
        staged = self._rebuild_indexes(self._staged)
        for reg_name, labels, prop_names in staged.index_registry:
            check_unique(staged.indexes[reg_name], reg_name)
        new_version = self._ledger[-1].version + 1
        # publish with the write-set: a transaction that started before
        # this implicit commit must see it in the conflict trail, or its
        # replay would silently overwrite these entities
        # (first-committer-wins applies to BOTH write paths)
        ok = self._try_publish(
            staged.with_version(new_version),
            set(self._staged_writes) if self._staged_writes is not None else None,
            list(self._staged_ops) if self._staged_ops is not None else None,
            "implicit",
        )
        if not ok:
            # durable CAS lost between refresh and publish: the implicit
            # path has no replay log isolation, so surface the conflict
            raise WriteConflict(
                f"another process claimed version {new_version} concurrently; "
                "rollback and replay, or use engine.begin() transactions"
            )
        self._staged = None
        self._staged_base_version = None
        self._staged_writes = set()
        self._staged_ops = []
        return new_version

    def rollback(self) -> None:
        self._staged = None
        self._staged_base_version = None
        self._staged_writes = set()
        self._staged_ops = []

    def checkpoint(self, path: str) -> None:
        """Reference S7 ``checkpoint``: force-materialize the committed
        snapshot to storage."""
        self.committed.write(path)

    # -- mutations (staged until commit) ----------------------------------
    def _stage(self, snap: GraphSnapshot, written_ids=(), op=None) -> None:
        if self._staged is None:
            # pin the ledger head this implicit write run is based on
            self._staged_base_version = self._ledger[-1].version
        self._staged = snap
        if written_ids is None:
            self._staged_writes = None  # bulk df write: set unenumerable
            self._staged_ops = None  # and the op log is the data itself
        else:
            if self._staged_writes is not None:
                self._staged_writes.update(written_ids)
            if self._staged_ops is not None:
                # a write without an op descriptor can't be replayed from
                # metadata — degrade to materialization, never to loss
                self._staged_ops = self._staged_ops + [op] if op is not None else None
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

    def model_df(self) -> DataFrame:
        """The maintained type dictionary as a DataFrame (reference M8);
        folds in any bulk-ingested types first."""
        if self.model.dirty:
            self.model.fold_snapshot(self.current)
        return self.model.to_df(self.spark)

    def _note_node_types(self, rows) -> None:
        for label, props in rows:
            self.model.note("node_type", label)
            for name, value in (props or {}).items():
                for v in value if isinstance(value, list) else [value]:
                    self.model.note_property(name, v)

    def _note_edge_types(self, rows) -> None:
        for _src, _dst, label, props in rows:
            self.model.note("edge_type", label)
            for name, value in (props or {}).items():
                for v in value if isinstance(value, list) else [value]:
                    self.model.note_property(name, v)

    def add_nodes(self, rows, ids=None) -> list[int]:
        # ids come from the ENGINE-wide allocator, same as the transaction
        # path: a live begin() transaction may already have reserved ids
        # past this snapshot's max, and allocating from the snapshot alone
        # would mint duplicates once both commit
        rows = list(rows)
        self._note_node_types(rows)
        if ids is None:
            ids = self._reserve_node_ids(len(rows), self.current)
        snap, new_ids = mutations.add_nodes(self.current, rows, ids)
        self._stage(
            snap,
            new_ids,
            op=["add_nodes", [[label, dict(props or {})] for label, props in rows], list(new_ids)],
        )
        return new_ids

    def add_node(self, label: str, props: Mapping[str, object] | None = None) -> int:
        return self.add_nodes([(label, props or {})])[0]

    def add_edges(self, rows, ids=None) -> list[int]:
        rows = list(rows)
        self._note_edge_types(rows)
        if ids is None:
            ids = self._reserve_edge_ids(len(rows), self.current)
        snap, new_ids = mutations.add_edges(self.current, rows, ids)
        self._stage(
            snap,
            new_ids,
            op=[
                "add_edges",
                [[src, dst, label, dict(props or {})] for src, dst, label, props in rows],
                list(new_ids),
            ],
        )
        return new_ids

    def add_edge(self, src: int, dst: int, label: str, props: Mapping[str, object] | None = None) -> int:
        return self.add_edges([(src, dst, label, props or {})])[0]

    def add_nodes_df(self, nodes: DataFrame, props: DataFrame | None = None) -> None:
        self.model.dirty = True  # labels live in the DataFrame; fold lazily
        self._stage(mutations.add_nodes_df(self.current, nodes, props), written_ids=None)

    def add_edges_df(self, edges: DataFrame, props: DataFrame | None = None) -> None:
        self.model.dirty = True
        self._stage(mutations.add_edges_df(self.current, edges, props), written_ids=None)

    def update_node(self, node_id: int, label: str, props: Mapping[str, object]) -> None:
        self._stage(
            mutations.update_node(self.current, node_id, label, props),
            [node_id],
            op=["update_node", node_id, label, dict(props)],
        )

    def delete_nodes(self, node_ids: list[int]) -> None:
        self._stage(
            mutations.delete_nodes(self.current, node_ids),
            node_ids,
            op=["delete_nodes", list(node_ids)],
        )

    def delete_edges(self, edge_ids: list[int]) -> None:
        self._stage(
            mutations.delete_edges(self.current, edge_ids),
            edge_ids,
            op=["delete_edges", list(edge_ids)],
        )

    def set_properties(self, owner_id: int, owner_kind: str, props: Mapping[str, object]) -> None:
        self._stage(
            mutations.set_properties(self.current, owner_id, owner_kind, props),
            [owner_id],
            op=["set_properties", owner_id, owner_kind, dict(props)],
        )

    # -- indexes -----------------------------------------------------------
    def add_index(self, name: str, labels: Sequence[str] = (), prop_names: Sequence[str] = ()) -> None:
        """Register + retroactively build an index (reference X1). Raises
        DuplicateIndexKey if existing data violates uniqueness
        (``APITest.hs:158-165`` retroactive-indexing scenario)."""
        op = ["add_index", name, list(labels), list(prop_names)]
        if self._staged is not None:
            snap = self.current
            registry = snap.index_registry + ((name, tuple(labels), tuple(prop_names)),)
            idx = build_index(snap, labels, prop_names)
            check_unique(idx, name)
            indexes = dict(snap.indexes)
            indexes[name] = idx
            self._staged = replace(snap, index_registry=registry, indexes=indexes)
            if self._staged_ops is not None:
                self._staged_ops.append(op)
            return
        # registering an index on a clean engine commits immediately (the
        # reference persists the registry on addIndex, API.hs:509); retry
        # on a lost durable CAS — index registration replays cleanly
        while True:
            self._refresh()
            snap = self.current
            registry = snap.index_registry + ((name, tuple(labels), tuple(prop_names)),)
            idx = build_index(snap, labels, prop_names)
            check_unique(idx, name)
            indexes = dict(snap.indexes)
            indexes[name] = idx
            staged = replace(snap, index_registry=registry, indexes=indexes)
            new_version = self._ledger[-1].version + 1
            if self._try_publish(staged.with_version(new_version), set(), [op], "index"):
                return

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

    def index_prefix(self, index_name: str, prefix: str, ordered: bool = False) -> DataFrame:
        """Prefix scan (reference trie ``prefix``/``prefixF``, X4).

        ``ordered=True`` returns rows in depth-first trie order — i.e.
        lexicographic key order, the enumeration the reference's trie
        traversal produces (``LowLevelDB/test/.../TrieSpec.hs:89-95``);
        ties on equal keys break by owner_id for determinism. The default
        unordered bag is the declared divergence (SURVEY.md §7): on a
        cluster an orderBy is a real sort, so callers opt in."""
        idx = self.current.indexes[index_name]
        out = idx.filter(F.col("key").startswith(prefix)).select("owner_id", "label", "name", "key")
        return out.orderBy("key", "owner_id") if ordered else out

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


def snapshot_diff(a: GraphSnapshot, b: GraphSnapshot) -> dict[str, DataFrame]:
    """What changed between two committed versions — the MVCC surface a
    version-chain store owes its users (the reference keeps per-record
    version chains, ``LowLevelDB MVCC.hs``; on immutable snapshots the
    chain is recovered by set difference).

    Returns six DataFrames keyed: nodes_added / nodes_removed (id,
    label), edges_added / edges_removed (id, src, dst, label), and
    props_added / props_removed — each carrying the FULL props columns
    of rows present on one side only. An updated property value appears
    as one props_removed row + one props_added row (long-format props
    have no identity beyond their value).

    All six are exceptAll set differences keyed on stable ids — plain
    shuffles Catalyst plans as hash joins; nothing is collected."""
    node_cols = ["id", "label"]
    edge_cols = ["id", "src", "dst", "label"]
    prop_cols = [c for c in a.props.columns]
    return {
        "nodes_added": b.nodes.select(node_cols).exceptAll(a.nodes.select(node_cols)),
        "nodes_removed": a.nodes.select(node_cols).exceptAll(b.nodes.select(node_cols)),
        "edges_added": b.edges.select(edge_cols).exceptAll(a.edges.select(edge_cols)),
        "edges_removed": a.edges.select(edge_cols).exceptAll(b.edges.select(edge_cols)),
        "props_added": b.props.select(prop_cols).exceptAll(a.props.select(prop_cols)),
        "props_removed": a.props.select(prop_cols).exceptAll(b.props.select(prop_cols)),
    }


def entity_history(engine: "GraphEngine", owner_id: int) -> list[dict]:
    """The version-chain view for ONE entity: for every committed version,
    the entity's property state if it changed at that version — the
    reference's per-record chain walk (``readRecord`` following
    ``recordPrev``), reconstructed from the snapshot ledger.

    Intended for point debugging (one entity, V versions): each step is
    a broadcast-filtered props lookup on a pinned snapshot, collected as
    a tiny list of {version, props} dicts; versions where nothing about
    the entity changed are skipped."""
    out: list[dict] = []
    prev: dict | None = None
    for v in engine.versions:
        if v == 0:
            continue
        snap = engine.snapshot_at(v)
        from hgraphstorage_spark.compiler import value_str

        rows = (
            snap.props.filter(F.col("owner_id") == owner_id)
            .select("name", value_str().alias("v"))
            .collect()
        )
        state: dict = {}
        for r in rows:
            state.setdefault(r["name"], []).append(r["v"])
        state = {k: sorted(vs) for k, vs in state.items()}
        exists = bool(rows) or snap.nodes.filter(F.col("id") == owner_id).limit(1).count() > 0
        entry = {"version": v, "exists": exists, "props": state}
        key = (exists, tuple(sorted((k, tuple(v)) for k, v in state.items())))
        if prev != key:
            out.append(entry)
            prev = key
    return out
