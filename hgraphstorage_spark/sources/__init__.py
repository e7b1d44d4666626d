from hgraphstorage_spark.sources.files import (
    compact_parquet,
    input_bytes,
    read_csv,
    read_jsonl,
    with_zorder_key,
    write_zorder,
    write_csv,
    write_jsonl,
)
from hgraphstorage_spark.sources.tpch_graph import load_tpch_graph, load_tables
from hgraphstorage_spark.sources.warc import read_warc, warc_to_documents, html_to_text

__all__ = [
    "compact_parquet",
    "input_bytes",
    "load_tables",
    "load_tpch_graph",
    "read_csv",
    "read_jsonl",
    "with_zorder_key",
    "write_zorder",
    "write_csv",
    "write_jsonl",
    "read_warc",
    "warc_to_documents",
    "html_to_text",
]
