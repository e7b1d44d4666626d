"""Engine scalar/vector function surface.

The reference has no scalar-function library (SURVEY.md §2.6) — its only
scalar computations are serialization casts, covered by schemas/compiler.
This package re-exports the engine-level functions built on top of Spark's
built-ins so users have one import point."""

from hgraphstorage_spark.compiler import value_str
from hgraphstorage_spark.functions.stats import (
    calibration_report,
    cms_estimate,
    cms_merge,
    count_min_sketch,
    grouped_percentiles,
    psi_report,
)
from hgraphstorage_spark.functions.timeseries import funnel, rolling_event_features
from hgraphstorage_spark.pipeline.dedup import hamming64
from hgraphstorage_spark.pipeline.similarity import cosine
from hgraphstorage_spark.schemas import canonical_string, infer_dtype, value_columns

__all__ = [
    "value_str",
    "grouped_percentiles",
    "count_min_sketch",
    "cms_merge",
    "cms_estimate",
    "psi_report",
    "calibration_report",
    "funnel",
    "rolling_event_features",
    "hamming64",
    "cosine",
    "canonical_string",
    "infer_dtype",
    "value_columns",
]
