from hgraphstorage_spark.sources.files import (
    compact_parquet,
    input_bytes,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from hgraphstorage_spark.sources.tpch_graph import load_tpch_graph, load_tables

__all__ = [
    "compact_parquet",
    "input_bytes",
    "load_tables",
    "load_tpch_graph",
    "read_csv",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
]
