"""Physical-plan introspection helpers — the `.explain()` feedback loop as
code, so plan-shape requirements (pushdown, pruning, broadcast) are
assertable in tests and inspectable in notebooks."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scanned_files(df: DataFrame) -> Counter:
    """Which parquet files the plan scans, and how many times."""
    plan = executed_plan(df)
    scans = re.findall(r"FileScan parquet.*?([\w.]+\.parquet)", plan)
    return Counter(scans)


def pushed_filters(df: DataFrame) -> list[str]:
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates each FileScan applies (empty string for
    unpartitioned scans) — the evidence that a label / property-name filter
    skips whole directories of a persisted snapshot."""
    plan = executed_plan(df)
    # capture to end of line: filters may nest brackets
    # (dynamicpruningexpression(input[0, bigint, true]...))
    return re.findall(r"PartitionFilters: \[(.*)", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)
