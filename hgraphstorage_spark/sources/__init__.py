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
from hgraphstorage_spark.sources.cdx import cdx_fetch_plan, parse_cdxj, surt_key
from hgraphstorage_spark.sources.tpch_graph import load_tpch_graph, load_tables
from hgraphstorage_spark.sources.warc import (
    domain_link_graph,
    extract_links,
    html_to_text,
    http_envelope,
    parse_feeds,
    read_warc,
    revisit_plan,
    warc_to_documents,
)

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
    "parse_feeds",
    "read_warc",
    "warc_to_documents",
    "html_to_text",
    "extract_links",
    "domain_link_graph",
    "http_envelope",
    "revisit_plan",
    "surt_key",
    "parse_cdxj",
    "cdx_fetch_plan",
]
