from hgraphstorage_spark.operators.skew import salted_count_by, salted_join

__all__ = ["salted_count_by", "salted_join"]
