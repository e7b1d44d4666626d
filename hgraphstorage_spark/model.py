"""Type-dictionary ("Model") parity layer.

The reference maintains bidirectional name↔id Lookups for object,
relation and property types (``HGraphStorage/src/.../Types.hs:335-363``),
rebuilt at open by folding the dictionary files (``FileOps.hs:113-148``),
serialized as strings in STMGraph (``modelToString``/``stringToModel``,
``STMGraph/src/.../Types.hs:318-327``).

Spark-side, labels are carried inline as strings (dictionary encoding is
parquet's job — SURVEY.md §1.3); this module provides the *optional*
dictionary DataFrame for parity tests and for exports that want compact
int type ids. IDs are dense, 1-based, assigned in lexicographic name
order (deterministic — the reference assigns in first-use order, which is
storage-dependent; divergence documented).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from hgraphstorage_spark.snapshot import GraphSnapshot


def build_model(snap: GraphSnapshot) -> DataFrame:
    """(kind, name, type_id): kind ∈ 'node_type' | 'edge_type' |
    'property_type'. Property types are keyed on (name, dtype) — the same
    name with a different dtype is a different type (``Types.hs:338``)."""
    node_types = snap.nodes.select(F.lit("node_type").alias("kind"), F.col("label").alias("name")).distinct()
    edge_types = snap.edges.select(F.lit("edge_type").alias("kind"), F.col("label").alias("name")).distinct()
    prop_types = (
        snap.props.select(
            F.lit("property_type").alias("kind"),
            F.concat_ws(":", F.col("name"), F.col("dtype")).alias("name"),
        ).distinct()
    )
    all_types = node_types.unionByName(edge_types).unionByName(prop_types)
    w = Window.partitionBy("kind").orderBy("name")
    return all_types.select("kind", "name", F.row_number().over(w).alias("type_id"))


def model_to_string(model: DataFrame) -> str:
    """Serialize the dictionary (reference ``modelToString``)."""
    rows = sorted((r["kind"], r["name"], r["type_id"]) for r in model.collect())
    return json.dumps(rows)


def string_to_model(spark, s: str) -> DataFrame:
    """Inverse (reference ``stringToModel``)."""
    rows = [tuple(r) for r in json.loads(s)]
    return spark.createDataFrame(rows, "kind string, name string, type_id int")
