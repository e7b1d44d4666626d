"""JSONL/CSV connector round-trips and parquet compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from hgraphstorage_spark.sources import (
    compact_parquet,
    input_bytes,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


class TestJsonl:
    def test_roundtrip_preserves_rows_and_schema(self, spark, tmp_path):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "docs_jsonl")
        write_jsonl(docs, path)
        back = read_jsonl(spark, path, "doc_id long, text string, lang string, source string, n_chars long")
        assert back.count() == docs.count()
        a = sorted(tuple(r) for r in docs.select(*sorted(docs.columns)).collect())
        b = sorted(tuple(r) for r in back.select(*sorted(docs.columns)).collect())
        assert a == b

    def test_partitioned_layout_prunes(self, spark, tmp_path):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "docs_by_lang")
        write_jsonl(docs, path, partition_by=("lang",))
        assert glob.glob(f"{path}/lang=*"), "expected key=value directories"
        back = read_jsonl(spark, path, "doc_id long, text string, source string, n_chars long, lang string")
        one = back.filter(F.col("lang") == "en")
        assert one.count() == docs.filter(F.col("lang") == "en").count()


class TestCsv:
    def test_roundtrip(self, spark, tmp_path):
        nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        path = str(tmp_path / "nation_csv")
        write_csv(nation, path)
        back = read_csv(spark, path, "n_nationkey long, n_name string, n_regionkey long, n_comment string")
        assert back.count() == 25
        assert sorted(r["n_name"] for r in back.collect()) == sorted(
            r["n_name"] for r in nation.collect()
        )


class TestCompaction:
    def test_many_small_files_become_few(self, spark, tmp_path):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        src = str(tmp_path / "fragmented")
        docs.repartition(40).write.parquet(src)
        assert len(glob.glob(f"{src}/part-*.parquet")) == 40
        dst = str(tmp_path / "compacted")
        total_mb = max(1, input_bytes(spark, src) // (1024 * 1024))
        n = compact_parquet(spark, src, dst, target_file_mb=max(1, int(total_mb)))
        files = glob.glob(f"{dst}/part-*.parquet")
        assert len(files) == n <= 2
        assert spark.read.parquet(dst).count() == docs.count()


class TestSnapshotInterchange:
    def test_jsonl_roundtrip_including_binary_props(self, spark, tmp_path):
        from hgraphstorage_spark import GraphEngine
        from hgraphstorage_spark.sources.files import snapshot_from_jsonl, snapshot_to_jsonl

        eng = GraphEngine(spark)
        eng.add_nodes([("N", {"name": "a", "blob": b"\x00\xff\x10"}), ("N", {"name": "b"})])
        eng.add_edges([(1, 2, "e", {"w": 7})])
        eng.commit()
        snap = eng.committed
        path = str(tmp_path / "dump")
        snapshot_to_jsonl(snap, path)
        back = snapshot_from_jsonl(spark, path, version=snap.version)
        assert sorted(map(tuple, back.nodes.collect())) == sorted(map(tuple, snap.nodes.collect()))
        assert sorted(map(tuple, back.edges.collect())) == sorted(map(tuple, snap.edges.collect()))
        # binary survives base64 round trip byte-exact
        blob = back.props.filter("name = 'blob'").collect()[0]["bin_v"]
        assert bytes(blob) == b"\x00\xff\x10"
        assert back.props.count() == snap.props.count()


class TestRowgroupStats:
    def test_stats_match_pyarrow_and_skipping_counts(self, spark, tmp_path):
        """Executor-read footer stats equal a direct pyarrow read, and a
        range-sorted layout prunes out-of-range row groups."""
        import pyarrow.parquet as pq

        from hgraphstorage_spark.sources.files import (
            parquet_rowgroup_stats,
            skipping_report,
        )

        # value-sorted layout across 4 files -> disjoint value spans
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = str(tmp_path / "laid")
        ev.repartitionByRange(4, "value").sortWithinPartitions("value").write.parquet(out)
        stats = parquet_rowgroup_stats(spark, out, "value").collect()
        assert stats and all(r["min_value"] is not None for r in stats)
        for r in stats:
            md = pq.ParquetFile(r["file_name"]).metadata
            c = next(
                md.row_group(r["row_group_id"]).column(i)
                for i in range(md.row_group(r["row_group_id"]).num_columns)
                if md.row_group(r["row_group_id"]).column(i).path_in_schema == "value"
            )
            assert r["min_value"] == str(c.statistics.min)
            assert r["max_value"] == str(c.statistics.max)
        sdf = parquet_rowgroup_stats(spark, out, "value")
        lo = float(min(float(r["min_value"]) for r in stats))
        rep = skipping_report(sdf, lo, lo + 0.5).collect()[0]
        # a narrow predicate at the bottom of the range keeps only the
        # lowest span: most groups prune
        assert rep["n_groups"] == len(stats)
        assert rep["n_pruned"] >= rep["n_groups"] - 1 - 1
        assert rep["n_rows_total"] == ev.count()


    def test_null_stats_never_prune(self, spark):
        from hgraphstorage_spark.sources.files import skipping_report

        stats = spark.createDataFrame(
            [("f", 0, 10, None, None), ("f", 1, 10, "5.0", "9.0")],
            "file_name string, row_group_id int, n_rows long, min_value string, max_value string",
        )
        rep = skipping_report(stats, 100.0, 200.0).collect()[0]
        # group 1 prunes (max 9 < lo 100); the NULL-stats group must not
        assert (rep["n_groups"], rep["n_pruned"], rep["n_rows_pruned"]) == (2, 1, 10)
