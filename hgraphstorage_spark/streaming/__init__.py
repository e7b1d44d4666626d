from hgraphstorage_spark.streaming.ingest import (
    dsir_stream_score,
    frontier_agg_from_register,
    stream_crawl_frontier,
    stream_quantile_sketch,
    events_tumbling_agg,
    load_events,
    mutation_stream_to_snapshots,
    read_event_stream,
    sessionize,
    stream_dedup,
    stream_embed_dedup,
    stream_near_dedup,
    stream_topic_score,
    stream_url_dedup,
)
from hgraphstorage_spark.streaming.joins import enrich_with_dimension, interval_join
from hgraphstorage_spark.streaming.stateful import running_label_counts, stream_heavy_hitters

__all__ = [
    "dsir_stream_score",
    "frontier_agg_from_register",
    "stream_crawl_frontier",
    "stream_quantile_sketch",
    "enrich_with_dimension",
    "interval_join",
    "running_label_counts",
    "stream_heavy_hitters",
    "stream_dedup",
    "stream_embed_dedup",
    "stream_near_dedup",
    "stream_topic_score",
    "stream_url_dedup",
    "events_tumbling_agg",
    "load_events",
    "mutation_stream_to_snapshots",
    "read_event_stream",
    "sessionize",
]
