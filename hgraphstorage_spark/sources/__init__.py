from hgraphstorage_spark.sources.tpch_graph import load_tpch_graph, load_tables

__all__ = ["load_tpch_graph", "load_tables"]
