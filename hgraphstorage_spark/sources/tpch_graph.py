"""Derive a property graph from the TPC-H-ish TESTDATA tables.

FK → edge derivation per FIXTURES.md §6. This is the engine's model bulk
loader — the analogue of the reference's Hackage-index ingest
(``HGraphStorage/perf/.../HackageTest.hs:123-147``), which builds
Package/Version nodes and versions/depends edges from a parsed archive.

Deterministic ID scheme (so DuckDB oracle SQL can reproduce ids exactly):

- node id  = NODE_CODE[label] * 10^12 + natural key
- edge id  = EDGE_CODE[label] * 10^14 + row key
  (lineitem-derived edges: row key = l_orderkey * 16 + l_linenumber)

Scale notes: every node/edge/prop DataFrame below is a narrow projection
of one parquet scan — no shuffles, no collects; unions are cheap plan
concatenation. Monetary doubles become integer cents (the reference's
DTInteger is exact; FIXTURES.md §6 pins the cents encoding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hgraphstorage_spark import schemas
from hgraphstorage_spark.snapshot import GraphSnapshot

NODE_CODE = {
    "Region": 1,
    "Nation": 2,
    "Customer": 3,
    "Supplier": 4,
    "Part": 5,
    "Order": 6,
}
EDGE_CODE = {
    "custLocatedIn": 1,
    "suppLocatedIn": 2,
    "nationLocatedIn": 3,
    "placed": 4,
    "contains": 5,
    "suppliedBy": 6,
}
NODE_BASE = 10**12
EDGE_BASE = 10**14

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}


def node_id(label: str, key_col) -> F.Column:
    return (F.lit(NODE_CODE[label] * NODE_BASE) + key_col.cast("long")).alias("id")


def edge_id(label: str, key_col) -> F.Column:
    return (F.lit(EDGE_CODE[label] * EDGE_BASE) + key_col.cast("long")).alias("id")


def _props_long(df: DataFrame, owner_id: F.Column, kind: str, specs) -> DataFrame:
    """One union branch PER PROPERTY NAME (literal `name` column, no
    explode): a traversal's ``Has``/``Values`` filter on name constant-folds
    to false in the untouched branches, so Catalyst's empty-relation
    propagation prunes their scans entirely — `Has(c_mktsegment=…)` reads
    exactly one column of one table, never the lineitem props. Each branch
    is a narrow projection of a (column-pruned) parquet scan; unions are
    plan concatenation, not work."""
    null_text = F.lit(None).cast("string")
    branches = []
    for name, dtype, col in specs:
        branches.append(
            df.select(
                owner_id.alias("owner_id"),
                F.lit(kind).alias("owner_kind"),
                F.lit(name).alias("name"),
                F.lit(dtype).alias("dtype"),
                F.lit(0).alias("seq"),
                (col.cast("string") if dtype == schemas.DT_TEXT else null_text).alias("text_v"),
                (
                    col.cast("decimal(38,0)")
                    if dtype == schemas.DT_INTEGER
                    else F.lit(None).cast("decimal(38,0)")
                ).alias("int_v"),
                F.lit(None).cast("binary").alias("bin_v"),
                (col.cast("string") if dtype == schemas.DT_JSON else null_text).alias("json_v"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def _cents(col) -> F.Column:
    return F.round(col * 100, 0)


def load_tpch_graph(spark: SparkSession, sf_dir: str) -> GraphSnapshot:
    t = load_tables(spark, sf_dir, names=("region", "nation", "customer", "supplier", "part", "orders", "lineitem"))
    region, nation, customer = t["region"], t["nation"], t["customer"]
    supplier, part, orders, lineitem = t["supplier"], t["part"], t["orders"], t["lineitem"]

    # lineitem has no unique natural key (duplicate rows exist in the
    # synthetic data) — assign a within-order sequence deterministically so
    # the DuckDB oracle reproduces edge ids bit-for-bit. The window shuffles
    # on l_orderkey only (dense, bounded partition: ≤ ~20 rows each).
    seq_window = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    lineitem = lineitem.withColumn("_seq", F.row_number().over(seq_window))

    nodes = (
        region.select(node_id("Region", F.col("r_regionkey")), F.lit("Region").alias("label"))
        .unionByName(nation.select(node_id("Nation", F.col("n_nationkey")), F.lit("Nation").alias("label")))
        .unionByName(customer.select(node_id("Customer", F.col("c_custkey")), F.lit("Customer").alias("label")))
        .unionByName(supplier.select(node_id("Supplier", F.col("s_suppkey")), F.lit("Supplier").alias("label")))
        .unionByName(part.select(node_id("Part", F.col("p_partkey")), F.lit("Part").alias("label")))
        .unionByName(orders.select(node_id("Order", F.col("o_orderkey")), F.lit("Order").alias("label")))
    )

    li_key = F.col("l_orderkey") * 32 + F.col("_seq")

    def edge(label: str, df: DataFrame, key, src_label: str, src_key, dst_label: str, dst_key) -> DataFrame:
        return df.select(
            edge_id(label, key),
            node_id(src_label, src_key).alias("src"),
            node_id(dst_label, dst_key).alias("dst"),
            F.lit(label).alias("label"),
        )

    edges = (
        edge("custLocatedIn", customer, F.col("c_custkey"), "Customer", F.col("c_custkey"), "Nation", F.col("c_nationkey"))
        .unionByName(
            edge("suppLocatedIn", supplier, F.col("s_suppkey"), "Supplier", F.col("s_suppkey"), "Nation", F.col("s_nationkey"))
        )
        .unionByName(
            edge("nationLocatedIn", nation, F.col("n_nationkey"), "Nation", F.col("n_nationkey"), "Region", F.col("n_regionkey"))
        )
        .unionByName(edge("placed", orders, F.col("o_orderkey"), "Customer", F.col("o_custkey"), "Order", F.col("o_orderkey")))
        .unionByName(edge("contains", lineitem, li_key, "Order", F.col("l_orderkey"), "Part", F.col("l_partkey")))
        .unionByName(edge("suppliedBy", lineitem, li_key, "Part", F.col("l_partkey"), "Supplier", F.col("l_suppkey")))
    )

    TXT, INT = schemas.DT_TEXT, schemas.DT_INTEGER
    props = (
        _props_long(region, node_id("Region", F.col("r_regionkey")), "node", [("r_name", TXT, F.col("r_name"))])
        .unionByName(
            _props_long(nation, node_id("Nation", F.col("n_nationkey")), "node", [("n_name", TXT, F.col("n_name"))])
        )
        .unionByName(
            _props_long(
                customer,
                node_id("Customer", F.col("c_custkey")),
                "node",
                [
                    ("c_name", TXT, F.col("c_name")),
                    ("c_acctbal", INT, _cents(F.col("c_acctbal"))),
                    ("c_mktsegment", TXT, F.col("c_mktsegment")),
                ],
            )
        )
        .unionByName(
            _props_long(
                supplier,
                node_id("Supplier", F.col("s_suppkey")),
                "node",
                [("s_name", TXT, F.col("s_name")), ("s_acctbal", INT, _cents(F.col("s_acctbal")))],
            )
        )
        .unionByName(
            _props_long(
                part,
                node_id("Part", F.col("p_partkey")),
                "node",
                [
                    ("p_name", TXT, F.col("p_name")),
                    ("p_brand", TXT, F.col("p_brand")),
                    ("p_type", TXT, F.col("p_type")),
                    ("p_size", INT, F.col("p_size")),
                    ("p_retailprice", INT, _cents(F.col("p_retailprice"))),
                ],
            )
        )
        .unionByName(
            _props_long(
                orders,
                node_id("Order", F.col("o_orderkey")),
                "node",
                [
                    ("o_orderstatus", TXT, F.col("o_orderstatus")),
                    ("o_orderpriority", TXT, F.col("o_orderpriority")),
                    ("o_totalprice", INT, _cents(F.col("o_totalprice"))),
                ],
            )
        )
        .unionByName(
            _props_long(
                lineitem,
                edge_id("contains", li_key),
                "edge",
                [
                    ("l_quantity", INT, F.col("l_quantity")),
                    ("l_discount", INT, _cents(F.col("l_discount"))),
                    ("l_returnflag", TXT, F.col("l_returnflag")),
                ],
            )
        )
    )

    return GraphSnapshot(
        nodes=nodes, edges=edges, props=props, label_from_id=label_from_id
    )


def label_from_id(id_col: F.Column) -> F.Column:
    """Node label from the id's range — the deterministic id scheme packs
    NODE_CODE into the top digits, so hydrating a hop target's label is a
    projection (and a `has_label` filter becomes an id-range predicate
    parquet row-group stats can prune), never a join against the node set."""
    code = (id_col / F.lit(NODE_BASE)).cast("int")
    mapping = F.create_map(
        *[F.lit(x) for label, c in NODE_CODE.items() for x in (c, label)]
    )
    return mapping[code]


# DuckDB-side mirrors of the id formulas, for oracle SQL construction
def sql_node_id(label: str, key_expr: str) -> str:
    return f"({NODE_CODE[label] * NODE_BASE} + {key_expr})"


def sql_edge_id(label: str, key_expr: str) -> str:
    return f"({EDGE_CODE[label] * EDGE_BASE} + {key_expr})"
