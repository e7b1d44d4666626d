"""File-format connectors beyond parquet (JSONL / CSV) and small-file
compaction.

The reference's only storage is its own fixed-record binary files
(SURVEY.md §2.1 S1); parquet snapshots are this engine's equivalent.
These connectors are the interchange surface a training-data pipeline
needs around that: corpora arrive as JSONL shards and leave as JSONL
shards, dimension drops arrive as CSV.

Scale rules encoded here rather than left to callers:

- **Always pass a schema on read.** Schema inference scans the whole
  input once before the real job — at 100 TB that doubles the read. The
  wrappers REQUIRE a schema/DDL string.
- **Prefer splittable layouts.** One giant ``.json.gz`` is one task
  (gzip is not splittable); many medium shards parallelize. ``compact``
  exists for the inverse problem — a directory of millions of tiny
  files, where per-file open/footer overhead dominates and the driver's
  file listing itself becomes the bottleneck.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema (DDL string or
    StructType). Malformed lines land in ``_corrupt_record``-free
    PERMISSIVE nulls by default; pass through ``.option`` on the returned
    reader chain if stricter modes are needed."""
    return spark.read.schema(schema).json(path)


def write_jsonl(
    df: DataFrame, path: str, partition_by: tuple = (), compression: str | None = None
) -> None:
    """Write newline-delimited JSON. ``partition_by`` produces the
    ``key=value`` directory layout downstream readers can prune;
    ``compression`` (e.g. 'gzip', 'zstd') trades scan parallelism for
    size — compressed JSONL shards are only splittable shard-by-shard,
    so keep shards modest."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, sep: str = ","
) -> DataFrame:
    """CSV with explicit schema (no inference scan)."""
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def input_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path``, via the Hadoop FileSystem API —
    works for any supported scheme (local, HDFS, object stores), not just
    local paths."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_file_mb: int = 128
) -> int:
    """Rewrite a parquet directory into ``ceil(bytes / target)`` files of
    roughly ``target_file_mb`` each; returns the file count written.

    The maintenance op every long-lived ingest needs: streaming /
    incremental commits accrete small files until task scheduling and
    footer reads dominate scan time. Uses ``repartition`` (round-robin,
    no key) so output files are uniformly sized regardless of input
    skew."""
    total = input_bytes(spark, src)
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def write_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
) -> None:
    """Write a pruning-friendly parquet layout: hive-partitioned by the
    filter columns a reader's WHERE clauses actually use, sorted within
    files so min/max row-group stats are tight (the poor man's Z-order
    for a single sort axis).

    Why it matters at 100 TB: partition pruning turns a full-corpus scan
    into a directory listing + a subset read at PLAN time (no data
    touched), and sorted row groups let the parquet reader skip pages by
    stats for range predicates on the sort key. ``repartition(cols)``
    before ``partitionBy`` keeps it to one file per partition dir
    instead of one per task per partition (the classic small-file
    explosion).

    Covered by a plan test: reading back with a partition filter shows
    only the matching directories in ``inputFiles()``."""
    out = df.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_name: str = "zkey",
) -> DataFrame:
    """Append a Z-order (Morton) key over ``cols``: each column is
    min-max quantized to ``bits`` bits, then the bit planes are
    interleaved — points close in ALL dimensions get close keys, so a
    file sorted by the key has tight min/max row-group stats on EVERY
    z-ordered column at once (``write_layout``'s single sort axis gives
    tight stats on one). This is the layout trick behind multi-dimension
    data skipping in Delta/Iceberg OPTIMIZE ZORDER, built from plain
    integer expressions.

    Mechanics: one 1-row global min/max aggregate is cross-joined back
    (broadcast — the numeric_histogram bounds pattern), each value maps
    to q = floor((x-min)/(max-min) * (2^bits - 1)) (NULL and
    degenerate max==min map to 0), and the key is
    Σ_b Σ_j ((q_j >> b) & 1) << (b·ncols + j) — a static expression of
    ``bits × ncols`` shift/mask terms, whole-stage-codegen'd, no UDF.
    All math is engine-portable (exact IEEE double quantization, integer
    bit ops), so a SQL oracle replays the key bit-for-bit.
    ``bits × ncols`` must fit a signed 64-bit key (≤ 62)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    from pyspark.sql import functions as F

    scale = float((1 << bits) - 1)
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    )
    with_b = df.crossJoin(F.broadcast(bounds))
    quant = []
    for c in cols:
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        x = F.col(c).cast("double")
        q = F.when(
            x.isNull() | mn.isNull() | (mx <= mn), F.lit(0)
        ).otherwise(F.floor((x - mn) / (mx - mn) * F.lit(scale))).cast("long")
        quant.append(q)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, q in enumerate(quant):
            key = key + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * len(cols) + j
            )
    return with_b.withColumn(key_name, key).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write parquet Z-ordered on ``cols``: compute the Morton key
    (:func:`with_zorder_key`), range-partition on it (balanced files,
    globally ordered), sort within each file, drop the key. Readers
    filtering on ANY z-ordered column skip row groups by min/max stats —
    the multi-dimension complement to ``write_layout``'s
    hive-partition + single-axis sort. Locality is pinned by a test
    measuring per-file value ranges on both dimensions vs a single-axis
    sort of the same data."""
    keyed = with_zorder_key(df, cols, bits=bits)
    out = (
        keyed.repartitionByRange(num_files, "zkey")
        if num_files
        else keyed.repartitionByRange("zkey")
    )
    out.sortWithinPartitions("zkey").drop("zkey").write.mode("overwrite").parquet(path)


def snapshot_to_jsonl(snap, path: str) -> None:
    """Interchange export of a graph snapshot: nodes / edges / props as
    JSONL directories under ``path`` — the engine-neutral backup/exchange
    format (any tool that reads JSON lines can consume a dump; parquet
    stays the performance format, this is the portability one). Binary
    property values go out base64 (JSON-safe), restored on import."""
    from pyspark.sql import functions as F

    write_jsonl(snap.nodes, f"{path}/nodes")
    write_jsonl(snap.edges, f"{path}/edges")
    props = snap.props.withColumn("bin_v", F.base64(F.col("bin_v")))
    write_jsonl(props, f"{path}/props")


def snapshot_from_jsonl(spark: SparkSession, path: str, version: int = 0):
    """Round-trip import of :func:`snapshot_to_jsonl` output. Schemas are
    declared (JSONL carries no types — the same contract as read_jsonl)."""
    from pyspark.sql import functions as F

    from hgraphstorage_spark import schemas
    from hgraphstorage_spark.snapshot import GraphSnapshot

    from pyspark.sql import types as T

    nodes = read_jsonl(spark, f"{path}/nodes", schemas.NODES_SCHEMA)
    edges = read_jsonl(spark, f"{path}/edges", schemas.EDGES_SCHEMA)
    props_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name == "bin_v" else f.dataType, True)
            for f in schemas.PROPS_SCHEMA.fields
        ]
    )
    props = read_jsonl(spark, f"{path}/props", props_schema).withColumn(
        "bin_v", F.unbase64(F.col("bin_v"))
    )
    return GraphSnapshot(nodes=nodes, edges=edges, props=props, version=version)


def parquet_rowgroup_stats(spark: SparkSession, path: str, column: str) -> DataFrame:
    """Per-row-group footer statistics for one column — the metadata
    layer data skipping runs on: (file_name, row_group_id, n_rows,
    min_value, max_value), min/max as their shortest-round-trip string
    renderings. Footers are read EXECUTOR-side via pyarrow from a
    distributed frame of file paths (only the file LIST touches the
    driver — it is metadata, bounded by file count, and exactly what any
    planner already holds); no data pages are read.

    This is what quantifies a layout: after ``write_layout`` /
    ``write_zorder``, tight per-row-group spans here == real pruning in
    every engine that honors parquet stats. DuckDB's
    ``parquet_metadata()`` reads the same footers, which makes the
    output independently oracle-checkable."""
    import pandas as pd

    paths = sorted(spark.read.parquet(path).inputFiles())

    def run(batches):
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        for pdf in batches:
            out = {k: [] for k in ("file_name", "row_group_id", "n_rows",
                                   "min_value", "max_value")}
            for uri in pdf["file_name"]:
                # inputFiles() returns percent-encoded file: URIs — a
                # hive partition value like `cat=a b` arrives as a%20b
                local = unquote(urlparse(uri).path) or uri
                md = pq.ParquetFile(local).metadata
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for i in range(rg.num_columns):
                        c = rg.column(i)
                        if c.path_in_schema != column:
                            continue
                        st = c.statistics
                        # has_min_max False (e.g. oversized binary stats
                        # dropped by the writer) must surface as NULL,
                        # never the string 'None' — DuckDB's footer read
                        # returns NULL there too
                        ok = st is not None and st.has_min_max
                        out["file_name"].append(local)
                        out["row_group_id"].append(g)
                        out["n_rows"].append(rg.num_rows)
                        out["min_value"].append(str(st.min) if ok else None)
                        out["max_value"].append(str(st.max) if ok else None)
            yield pd.DataFrame(out)

    frame = spark.createDataFrame([(p,) for p in paths], "file_name string")
    return frame.mapInPandas(
        run,
        schema="file_name string, row_group_id int, n_rows long, "
        "min_value string, max_value string",
    )


def prune_flag(lo: float, hi: float):
    """The ONE stats-prune rule (min > hi or max < lo over the string-
    rendered footer stats, NULL stats never prune) — shared by
    :func:`skipping_report` and any per-row-group report so the rule
    cannot drift between the flag and the aggregate."""
    from pyspark.sql import functions as F

    mn = F.col("min_value").cast("double")
    mx = F.col("max_value").cast("double")
    return F.coalesce((mn > F.lit(float(hi))) | (mx < F.lit(float(lo))), F.lit(False))


def skipping_report(stats: DataFrame, lo: float, hi: float) -> DataFrame:
    """Data-skipping effectiveness of a numeric predicate ``BETWEEN lo
    AND hi`` against row-group stats from
    :func:`parquet_rowgroup_stats`: a row group is PRUNED when
    min > hi or max < lo (stats-only, no false negatives). Returns one
    row (n_groups, n_pruned, n_rows_total, n_rows_pruned,
    pruned_fraction DECIMAL(18,6)) — the number a layout change
    (write_zorder vs random placement) should move."""
    from pyspark.sql import functions as F

    flagged = stats.withColumn("_p", prune_flag(lo, hi))
    return flagged.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.col("_p").cast("long")).alias("n_pruned"),
        F.sum("n_rows").alias("n_rows_total"),
        F.sum(F.when(F.col("_p"), F.col("n_rows")).otherwise(F.lit(0))).alias(
            "n_rows_pruned"
        ),
        F.round(
            F.sum(F.col("_p").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("pruned_fraction"),
    )
