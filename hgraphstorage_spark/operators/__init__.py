from hgraphstorage_spark.operators.asof import asof_join
from hgraphstorage_spark.operators.bucketing import (
    edges_by_dst,
    read_bucketed,
    write_bucketed,
)
from hgraphstorage_spark.operators.rangejoin import range_join
from hgraphstorage_spark.operators.skew import salted_count_by, salted_join, skew_report

__all__ = [
    "asof_join",
    "range_join",
    "edges_by_dst",
    "read_bucketed",
    "salted_count_by",
    "salted_join",
    "skew_report",
    "write_bucketed",
]
