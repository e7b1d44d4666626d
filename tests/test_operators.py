"""Skew operators + IVF similarity + plan-audit helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from hgraphstorage_spark.operators import salted_count_by, salted_join
from hgraphstorage_spark.pipeline.similarity import cosine_topk, ivf_topk
from hgraphstorage_spark.plans import has_broadcast_join, scanned_files

from tests.conftest import bag


class TestSkew:
    def test_salted_count_equals_plain(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plain = bag(li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt")))
        salted = bag(salted_count_by(li, ["l_returnflag"], salt=8))
        assert salted == plain

    def test_salted_join_equals_plain(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
        )
        plain = bag(li.join(orders, "l_orderkey"))
        salted = bag(salted_join(li, orders, "l_orderkey", salt=4))
        assert salted == plain

    def test_salted_join_outer(self, spark):
        big = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
        small = spark.createDataFrame([(1, "x")], "k long, w string")
        out = bag(salted_join(big, small, "k", salt=4, how="left"))
        assert out == [(1, "a", "x"), (1, "b", "x"), (2, "c", None)]


class TestIvf:
    def test_ivf_scores_match_exact_where_overlapping(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = {r["vec_id"]: float(r["score"]) for r in cosine_topk(emb, 0, k=200).collect()}
        approx = ivf_topk(emb, 0, k=10, nlist=8, nprobe=3).collect()
        assert 0 < len(approx) <= 10
        for r in approx:
            assert abs(float(r["score"]) - exact[r["vec_id"]]) < 1e-9

    def test_ivf_full_probe_equals_exact(self, spark):
        """Probing every list = brute force (recall 1)."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = [(r["vec_id"], float(r["score"])) for r in cosine_topk(emb, 0, k=10).collect()]
        full = [
            (r["vec_id"], float(r["score"]))
            for r in ivf_topk(emb, 0, k=10, nlist=8, nprobe=8).collect()
        ]
        assert full == exact


class TestPlanHelpers:
    def test_scanned_files(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        assert scanned_files(df) == {"region.parquet": 1}

    def test_has_broadcast_join(self, spark):
        a = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        b = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        assert has_broadcast_join(a.join(F.broadcast(b), a.l_orderkey == b.r_regionkey))
