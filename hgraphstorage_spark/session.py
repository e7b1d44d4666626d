"""SparkSession factory tuned for this engine.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we'd set cluster-side (AQE on, sensible shuffle partitioning, Arrow
for the Pandas-UDF slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hgraphstorage_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession.

    Scale notes: on a real cluster ``spark.sql.shuffle.partitions`` should be
    ~2-3x total cores (or left to AQE coalescing, which we enable); in
    local mode we match the core count so tiny test shuffles don't fan out
    into hundreds of empty tasks.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # the events testdata table stores TIMESTAMP(NANOS) which the Spark
        # reader rejects; read as long and convert (streaming.load_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamps without a timezone otherwise read as
        # TIMESTAMP_NTZ (Spark 4 infers NTZ), which unix_micros/window
        # reject or shift; with the session tz pinned to UTC above, plain
        # TIMESTAMP has identical wall-clock values to DuckDB's naive-as-UTC
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Pin the heap (-Xms == -Xmx): G1 UNCOMMITS heap pages back to
        # the OS after a full GC, so any explicit/periodic GC makes the
        # next allocation-heavy job re-fault and re-zero pages inside
        # its own runtime (measured r13, tools/gc_tax_probe.py: ~+0.4 s
        # on sub-second queries right after a System.gc() with an
        # unpinned heap; flat with the pin). Standard long-lived-server
        # JVM hygiene, same flag cluster-side. (AlwaysPreTouch was
        # measured too — it removes first-touch cost but costs ~40 s of
        # session startup, so it stays off; first-touch is paid once.)
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms" + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        .config("spark.ui.enabled", "false")
        # bucketed tables (operators.bucketing) go through the catalog;
        # keep the warehouse out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/hgs_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
