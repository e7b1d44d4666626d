from hgraphstorage_spark.plans.audit import (
    executed_plan,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    scanned_files,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "partition_filters",
    "pushed_filters",
    "scanned_files",
]
