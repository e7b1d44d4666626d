"""Bucketed snapshot storage: shuffle-free traversal joins at scale.

The reference threads adjacency through TWO linked lists per edge — the
source's out-chain (``oFirstFrom``/``rFromNext``) and the target's
in-chain (``oFirstTo``/``rToNext``), ``HGraphStorage/src/Database/Graph/
HGraphStorage/Types.hs:62-111`` — i.e. it pays 2x edge pointers so both
directions traverse without scanning. The Spark-first equivalent is
storing the edge table twice, hash-BUCKETED on ``src`` and on ``dst``,
with nodes bucketed on ``id`` by the same bucket count: a traversal join
(nodes.id == edges.src, or == edges.dst for In-hops) then co-locates by
bucket id and the physical plan contains NO Exchange on either side — at
100 TB that deletes the dominant shuffle of every multi-hop query.

Bucket counts must match across tables for co-located joins; pick
~(cluster cores × 2) at deploy time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hgraphstorage_spark.snapshot import GraphSnapshot


def write_bucketed(snap: GraphSnapshot, prefix: str, buckets: int = 32) -> None:
    """Persist a snapshot as bucketed+sorted catalog tables.

    ``{prefix}_nodes`` bucketed by id; ``{prefix}_edges_src`` /
    ``{prefix}_edges_dst`` are the two adjacency orientations (the
    reference's dual chains); ``{prefix}_props`` bucketed by owner_id so
    property hydration co-locates too.
    """
    (
        snap.nodes.write.mode("overwrite")
        .bucketBy(buckets, "id")
        .sortBy("id")
        .saveAsTable(f"{prefix}_nodes")
    )
    (
        snap.edges.write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(f"{prefix}_edges_src")
    )
    (
        snap.edges.write.mode("overwrite")
        .bucketBy(buckets, "dst")
        .sortBy("dst")
        .saveAsTable(f"{prefix}_edges_dst")
    )
    (
        snap.props.write.mode("overwrite")
        .bucketBy(buckets, "owner_id")
        .sortBy("owner_id")
        .saveAsTable(f"{prefix}_props")
    )


def read_bucketed(spark: SparkSession, prefix: str, version: int = 0) -> GraphSnapshot:
    """Snapshot over the bucketed tables (src-orientation edges as the
    canonical edge table; use `edges_by_dst` for In-heavy workloads)."""
    return GraphSnapshot(
        nodes=spark.table(f"{prefix}_nodes"),
        edges=spark.table(f"{prefix}_edges_src"),
        props=spark.table(f"{prefix}_props"),
        version=version,
    )


def edges_by_dst(spark: SparkSession, prefix: str):
    return spark.table(f"{prefix}_edges_dst")
