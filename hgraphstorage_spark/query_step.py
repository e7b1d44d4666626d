"""HGraphStorage compatibility layer: queryStep + scan-filter APIs.

Reference surface (SURVEY.md §2.2-2.3):
- ``filterObjects`` / ``filterRelations`` (``HGraphStorage/src/.../
  API.hs:257-259, 339-351``) — full scan + predicate;
- ``getObject`` / ``listProperties`` (``API.hs:271-301``) — point lookup +
  property-chain walk;
- ``queryStep`` (``HGraphStorage/src/.../Query.hs:42-82``) — one-hop
  traversal from a node with direction, relation-type whitelist,
  target-type whitelist, target predicate and limit.

The reference walks adjacency linked lists per edge with an N+1
``getObject`` per target (``Query.hs:70-79``); each function here is one
Catalyst plan. Predicates are Column expressions (the fast, codegen'd
path); arbitrary Python predicates belong in a pandas_udf supplied by the
caller as a Column.
"""

from __future__ import annotations

from enum import Enum
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hgraphstorage_spark import schemas
from hgraphstorage_spark.compiler import value_str
from hgraphstorage_spark.snapshot import GraphSnapshot


class Direction(Enum):
    """Reference ``Dir = OUT | IN | BOTH`` (``Query.hs:15-16``)."""

    OUT = "OUT"
    IN = "IN"
    BOTH = "BOTH"


def filter_objects(snap: GraphSnapshot, predicate: Column | None = None) -> DataFrame:
    """P1: full node scan + predicate over (id, label)."""
    df = snap.nodes
    return df.filter(predicate) if predicate is not None else df


def filter_relations(snap: GraphSnapshot, predicate: Column | None = None) -> DataFrame:
    """P2: edge scan with populated endpoint labels — the reference
    hydrates from/to objects per edge (``API.hs:349-351``); here two joins
    in one plan (or two pure projections when the snapshot's id scheme
    encodes labels, ``label_from_id``).
    Columns: id, src, dst, label, src_label, dst_label."""
    if snap.label_from_id is not None:
        df = snap.edges.select(
            "id",
            "src",
            "dst",
            "label",
            snap.label_from_id(F.col("src")).alias("src_label"),
            snap.label_from_id(F.col("dst")).alias("dst_label"),
        )
    else:
        n = snap.nodes
        df = (
            snap.edges.join(
                n.select(F.col("id").alias("src"), F.col("label").alias("src_label")), "src", "inner"
            ).join(n.select(F.col("id").alias("dst"), F.col("label").alias("dst_label")), "dst", "inner")
        ).select("id", "src", "dst", "label", "src_label", "dst_label")
    return df.filter(predicate) if predicate is not None else df


def get_object(snap: GraphSnapshot, node_id: int) -> DataFrame:
    """P3: point lookup."""
    return snap.nodes.filter(F.col("id") == node_id)


def list_properties(snap: GraphSnapshot, owner_id: int, owner_kind: str = schemas.NODE_KIND) -> DataFrame:
    """P4: owner's properties grouped name → [values] (reference
    ``listProperties`` groups multi-values, ``API.hs:285-301``).
    Columns: name, dtype, values ARRAY<STRING> (seq order preserved)."""
    return (
        snap.props.filter((F.col("owner_id") == owner_id) & (F.col("owner_kind") == owner_kind))
        .groupBy("name", "dtype")
        .agg(F.sort_array(F.collect_list(F.struct("seq", value_str().alias("v")))).alias("sv"))
        .select("name", "dtype", F.col("sv.v").alias("values"))
    )


def query_step(
    snap: GraphSnapshot,
    node_id: int,
    direction: Direction = Direction.OUT,
    rel_types: Sequence[str] = (),
    tgt_types: Sequence[str] = (),
    tgt_filter: Column | None = None,
    limit: int | None = None,
) -> DataFrame:
    """J1: one-hop from ``node_id``. Empty whitelists = no restriction
    (``Query.hs:59-60``); limit counts *accepted* results (``Query.hs:63-64``).

    Returns StepResult-shaped rows: rel_id, dir, rel_label, target_id,
    target_label (``Query.hs:32-38``; property hydration via
    ``list_properties`` on demand).
    """
    edges = snap.edges
    if rel_types:
        edges = edges.filter(F.col("label").isin(list(rel_types)))

    parts = []
    if direction in (Direction.OUT, Direction.BOTH):
        parts.append(
            edges.filter(F.col("src") == node_id).select(
                F.col("id").alias("rel_id"),
                F.lit("OUT").alias("dir"),
                F.col("label").alias("rel_label"),
                F.col("dst").alias("target_id"),
            )
        )
    if direction in (Direction.IN, Direction.BOTH):
        parts.append(
            edges.filter(F.col("dst") == node_id).select(
                F.col("id").alias("rel_id"),
                F.lit("IN").alias("dir"),
                F.col("label").alias("rel_label"),
                F.col("src").alias("target_id"),
            )
        )
    df = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])

    targets = snap.nodes.select(F.col("id").alias("target_id"), F.col("label").alias("target_label"))
    if tgt_types:
        targets = targets.filter(F.col("target_label").isin(list(tgt_types)))
    df = df.join(targets, "target_id", "inner")
    if tgt_filter is not None:
        df = df.filter(tgt_filter)
    if limit is not None:
        df = df.limit(limit)
    return df.select("rel_id", "dir", "rel_label", "target_id", "target_label")
