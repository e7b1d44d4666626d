from hgraphstorage_spark.streaming.ingest import (
    events_tumbling_agg,
    load_events,
    mutation_stream_to_snapshots,
    read_event_stream,
    sessionize,
)

__all__ = [
    "events_tumbling_agg",
    "load_events",
    "mutation_stream_to_snapshots",
    "read_event_stream",
    "sessionize",
]
