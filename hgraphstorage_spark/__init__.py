"""hgraphstorage_spark — a PySpark-native property-graph + analytics engine.

Re-expresses the capabilities of JPMoresmau/HGraphStorage (a family of
disk-based Haskell property-graph engines) as an idiomatic Spark engine:

- immutable ``GraphSnapshot`` (nodes / edges / props DataFrames) instead of
  mutable fixed-length record files,
- a Gremlin-style ``Traversal`` builder (reference: STMGraph's Traversal
  monoid, ``STMGraph/src/Database/Graph/STMGraph/APITypes.hs:105-131``)
  compiled to DataFrame joins/filters so Catalyst optimizes the plan,
- batch-functional mutations + a version ledger giving MVCC-style snapshot
  isolation (reference: ``LowLevelDB/src/Database/LowLevelDB/MVCC.hs``),
- index DataFrames with unique-key enforcement (reference:
  ``HGraphStorage/src/Database/Graph/HGraphStorage/Index.hs``),
- DataFrame-Pregel analytics and large-scale LLM-data-pipeline operators
  (dedup / similarity / text analysis / multimodal) as extensions.
"""

from hgraphstorage_spark.session import get_spark
from hgraphstorage_spark.snapshot import GraphSnapshot
from hgraphstorage_spark.engine import GraphEngine, DuplicateIndexKey, WriteConflict
from hgraphstorage_spark.store import DurableGraphEngine, open_graph
from hgraphstorage_spark.traversal import (
    T,
    Traversal,
    Ns,
    Es,
    NID,
    EID,
    Has,
    HasLabel,
    Values,
    AllValues,
    Out,
    In,
    Both,
    OutE,
    InE,
    BothE,
)

__all__ = [
    "get_spark",
    "GraphSnapshot",
    "GraphEngine",
    "DurableGraphEngine",
    "open_graph",
    "DuplicateIndexKey",
    "WriteConflict",
    "T",
    "Traversal",
    "Ns",
    "Es",
    "NID",
    "EID",
    "Has",
    "HasLabel",
    "Values",
    "AllValues",
    "Out",
    "In",
    "Both",
    "OutE",
    "InE",
    "BothE",
]

__version__ = "0.1.0"
