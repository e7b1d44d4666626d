"""Synthetic Hackage-style dependency graph — the reference's benchmark
ETL workload (``HGraphStorage/perf/Database/Graph/HGraphStorage/
HackageTest.hs:123-178``): Package/Version nodes, versions/depends edges,
bulk-loaded, then index-lookup + one-step queried. Its embedded
correctness floor: package 'yesod' returns ≥ 111 version nodes from one
``queryStep`` (``HackageTest.hs:167-178``).

The generator is pure arithmetic (FIXTURES.md §4 guidance: zipf-ish
fan-out, one package > 111 versions) so a SQL oracle can reproduce it:

- package i (0 ≤ i < n): node id PKG_BASE + i, prop name = 'pkg_<i>'
- versions(i) = 120 if i == 0 ('yesod' analog) else 1 + (i·i mod 113)
- version (i, j): node id VER_BASE + i·256 + j, prop name = '<i>.<j>'
- versions edge: package i → version (i, j)
- depends edge: version (i, j) → package (i·31 + j) mod n, skipped when
  it would self-depend

Everything is built with ``spark.range`` + narrow transforms — no driver
loops, no collects: the load scales to any n.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hgraphstorage_spark import schemas
from hgraphstorage_spark.snapshot import GraphSnapshot

PKG_BASE = 10**9
VER_BASE = 2 * 10**9
E_VERSIONS_BASE = 10**10
E_DEPENDS_BASE = 2 * 10**10


def _null_prop_cols(text):
    return [
        F.lit(0).alias("seq"),
        text.alias("text_v"),
        F.lit(None).cast("decimal(38,0)").alias("int_v"),
        F.lit(None).cast("binary").alias("bin_v"),
        F.lit(None).cast("string").alias("json_v"),
    ]


def load_hackage_graph(spark: SparkSession, n_packages: int = 1000) -> GraphSnapshot:
    pkgs = spark.range(n_packages).select(F.col("id").alias("i"))
    n_versions = F.when(F.col("i") == 0, F.lit(120)).otherwise(
        F.lit(1) + F.pmod(F.col("i") * F.col("i"), F.lit(113))
    )
    vers = pkgs.select("i", F.explode(F.sequence(F.lit(0), n_versions - 1)).alias("j"))

    pkg_nodes = pkgs.select((F.lit(PKG_BASE) + F.col("i")).alias("id"), F.lit("Package").alias("label"))
    ver_nodes = vers.select(
        (F.lit(VER_BASE) + F.col("i") * 256 + F.col("j")).alias("id"), F.lit("Version").alias("label")
    )
    nodes = pkg_nodes.unionByName(ver_nodes)

    versions_edges = vers.select(
        (F.lit(E_VERSIONS_BASE) + F.col("i") * 256 + F.col("j")).alias("id"),
        (F.lit(PKG_BASE) + F.col("i")).alias("src"),
        (F.lit(VER_BASE) + F.col("i") * 256 + F.col("j")).alias("dst"),
        F.lit("versions").alias("label"),
    )
    dep_tgt = F.pmod(F.col("i") * 31 + F.col("j"), F.lit(n_packages))
    depends_edges = (
        vers.filter(dep_tgt != F.col("i"))
        .select(
            (F.lit(E_DEPENDS_BASE) + F.col("i") * 256 + F.col("j")).alias("id"),
            (F.lit(VER_BASE) + F.col("i") * 256 + F.col("j")).alias("src"),
            (F.lit(PKG_BASE) + dep_tgt).alias("dst"),
            F.lit("depends").alias("label"),
        )
    )
    edges = versions_edges.unionByName(depends_edges)

    pkg_props = pkgs.select(
        (F.lit(PKG_BASE) + F.col("i")).alias("owner_id"),
        F.lit(schemas.NODE_KIND).alias("owner_kind"),
        F.lit("name").alias("name"),
        F.lit(schemas.DT_TEXT).alias("dtype"),
        *_null_prop_cols(F.concat(F.lit("pkg_"), F.col("i").cast("string"))),
    )
    ver_props = vers.select(
        (F.lit(VER_BASE) + F.col("i") * 256 + F.col("j")).alias("owner_id"),
        F.lit(schemas.NODE_KIND).alias("owner_kind"),
        F.lit("name").alias("name"),
        F.lit(schemas.DT_TEXT).alias("dtype"),
        *_null_prop_cols(F.concat(F.col("i").cast("string"), F.lit("."), F.col("j").cast("string"))),
    )
    props = pkg_props.unionByName(ver_props)

    return GraphSnapshot(nodes=nodes, edges=edges, props=props)
