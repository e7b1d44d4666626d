"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(+ the north-star pipeline operators); ``oracle_sql()`` gives the DuckDB
equivalent over the raw TESTDATA tables. The graph queries run over the
FK→edge derivation of FIXTURES.md §6 with deterministic ids
(``hgraphstorage_spark/sources/tpch_graph.py``), which is what makes the
graph semantics SQL-checkable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers

_SNAP_CACHE: dict[str, object] = {}


def _graph(spark: SparkSession, sf_dir: str):
    from hgraphstorage_spark.sources import load_tpch_graph

    key = f"{id(spark)}:{sf_dir}"
    if key not in _SNAP_CACHE:
        _SNAP_CACHE[key] = load_tpch_graph(spark, sf_dir)
    return _SNAP_CACHE[key]


def _loc_subgraph(snap):
    """The location subgraph (Customer/Supplier -> Nation -> Region) the
    graph-analytics queries share — one definition so the node-id offset
    arithmetic can't drift between queries (its SQL twin is
    ``_LOC_GRAPH_SQL``)."""
    from dataclasses import replace

    loc_edges = snap.edges.filter(
        F.col("label").isin(["custLocatedIn", "suppLocatedIn", "nationLocatedIn"])
    )
    loc_nodes = snap.nodes.filter(
        F.col("label").isin(["Region", "Nation", "Customer", "Supplier"])
    )
    return replace(snap, nodes=loc_nodes, edges=loc_edges)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Session-proofing: the driver builds its own SparkSession, which may
    # infer parquet timestamps as TIMESTAMP_NTZ (or read nanos as long).
    # Normalize every timestamp-ish column to plain TIMESTAMP so epoch
    # functions work and semantics match DuckDB's naive-as-UTC reads.
    for cname, ctype in df.dtypes:
        if ctype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
        elif ctype == "bigint" and cname == "ts":
            df = df.withColumn(cname, F.timestamp_micros(F.expr(f"{cname} DIV 1000")))
    return df


def _canon(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-canonical projection: cast the named DECIMAL columns to their
    fixed-scale string rendering (identical in Spark and DuckDB), keeping
    every other column as-is. See driver-hash notes in queries()."""
    return df.select(
        *[F.col(c).cast("string").alias(c) if c in cols else F.col(c) for c in df.columns]
    )


def _canon_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Same, for TIMESTAMP columns: explicit second-precision formatting on
    the Spark side pairs with strftime in the oracle SQL."""
    return df.select(
        *[
            F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


NODE = {"Region": 10**12, "Nation": 2 * 10**12, "Customer": 3 * 10**12, "Supplier": 4 * 10**12, "Part": 5 * 10**12, "Order": 6 * 10**12}
EDGE = {"custLocatedIn": 10**14, "suppLocatedIn": 2 * 10**14, "nationLocatedIn": 3 * 10**14, "placed": 4 * 10**14, "contains": 5 * 10**14, "suppliedBy": 6 * 10**14}


# ---------------------------------------------------------------------------
# graph / reference-operator queries


def q_scan_nodes_by_label(spark, sf_dir):
    """S3 readAll/foldAll: full node scan, counted per label."""
    snap = _graph(spark, sf_dir)
    return snap.nodes.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))


def q_filter_objects_has(spark, sf_dir):
    """P1 filterObjects + P5 Has: BUILDING-segment customers' names."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(
        snap, T().ns().has_label("Customer").has("c_mktsegment", "BUILDING").values("c_name")
    )
    return res.df.select(F.col("value").alias("c_name"))


def q_get_object(spark, sf_dir):
    """P3 getObject: point lookup of customer key 42."""
    from hgraphstorage_spark.query_step import get_object

    snap = _graph(spark, sf_dir)
    return get_object(snap, NODE["Customer"] + 42)


def q_list_properties(spark, sf_dir):
    """P4 listProperties: property rows of order key 7 (name, dtype, value)."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(snap, T().nid(NODE["Order"] + 7).all_values())
    return res.df.select("name", "dtype", "value")


def q_traversal_out_values(spark, sf_dir):
    """J2 Out + P6 Values (flagship): order statuses of BUILDING customers."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(
        snap,
        T().ns().has_label("Customer").has("c_mktsegment", "BUILDING").out("placed").values("o_orderstatus"),
    )
    return (
        res.df.filter(F.col("name") == "o_orderstatus")
        .groupBy(F.col("value").alias("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_traversal_in(spark, sf_dir):
    """J2 In: customers located in NATION_7."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(snap, T().ns().has("n_name", "NATION_7").in_("custLocatedIn").values("c_name"))
    return res.df.select(F.col("value").alias("c_name"))


def q_traversal_both(spark, sf_dir):
    """J2 Both (duplicate-preserving union): all location neighbors of NATION_3."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(
        snap, T().ns().has("n_name", "NATION_3").both("custLocatedIn", "suppLocatedIn", "nationLocatedIn")
    )
    return res.df.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))


def q_traversal_oute_props(spark, sf_dir):
    """J3 OutE + edge Values: contains-edges of order 42 with quantities."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(snap, T().nid(NODE["Order"] + 42).out_e("contains").values("l_quantity"))
    return res.df.filter(F.col("name") == "l_quantity").select(
        F.col("id"), F.col("value").cast("bigint").alias("l_quantity")
    )


def q_edges_to_nodes(spark, sf_dir):
    """J4 edgesToNodes: placed-edges of customer 9 → order nodes."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(snap, T().nid(NODE["Customer"] + 9).out_e("placed").out())
    return res.df.select("id", "label")


def q_multi_hop(spark, sf_dir):
    """J5 Composed multi-hop: customer 3 → orders → parts (bag counts)."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal

    snap = _graph(spark, sf_dir)
    res = compile_traversal(snap, T().nid(NODE["Customer"] + 3).out("placed").out("contains"))
    return res.df.groupBy(F.col("id").alias("part_id")).agg(F.count(F.lit(1)).alias("cnt"))


def q_hackage_etl(spark, sf_dir):
    """Reference bench parity ('Write Hackage', HGraphStorage/perf/
    Main.hs:17-24): bulk-build the synthetic dependency graph at 50k
    packages (~2.9M version nodes, ~5.8M edges, ~2.9M props) and account
    every record per kind — the bulk-ingest throughput benchmark."""
    from hgraphstorage_spark.sources.hackage import load_hackage_graph

    snap = load_hackage_graph(spark, 50000)
    return (
        snap.nodes.groupBy(F.col("label").alias("kind")).agg(F.count(F.lit(1)).alias("cnt"))
        .unionByName(
            snap.edges.groupBy(F.col("label").alias("kind")).agg(F.count(F.lit(1)).alias("cnt"))
        )
        .unionByName(
            snap.props.select(F.lit("prop").alias("kind")).groupBy("kind").agg(
                F.count(F.lit(1)).alias("cnt")
            )
        )
    )


def q_motif_two_hop(spark, sf_dir):
    """Motif finding (GraphFrames-style find): 2-hop pattern match counts
    per edge-label pair."""
    from hgraphstorage_spark.motif import find_motif

    snap = _graph(spark, sf_dir)
    return (
        find_motif(snap, "(a)-[e1]->(b); (b)-[e2]->(c)")
        .groupBy(
            F.col("e1.label").alias("label1"), F.col("e2.label").alias("label2")
        )
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


def q_filter_relations(spark, sf_dir):
    """P2 filterRelations: full edge scan with endpoint hydration, counted
    per (label, src_label, dst_label)."""
    from hgraphstorage_spark.query_step import filter_relations

    snap = _graph(spark, sf_dir)
    return (
        filter_relations(snap)
        .groupBy("label", "src_label", "dst_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_query_step(spark, sf_dir):
    """J1 queryStep: one-hop OUT from customer 5 over placed edges."""
    from hgraphstorage_spark.query_step import Direction, query_step

    snap = _graph(spark, sf_dir)
    return query_step(snap, NODE["Customer"] + 5, Direction.OUT, rel_types=["placed"]).select(
        "rel_id", "target_id", "target_label"
    )


def q_nb_counts(spark, sf_dir):
    """A1 nbNodes/nbEdges maintained counters."""
    snap = _graph(spark, sf_dir)
    n = snap.nodes.agg(F.count(F.lit(1)).alias("value")).select(F.lit("nodes").alias("metric"), "value")
    e = snap.edges.agg(F.count(F.lit(1)).alias("value")).select(F.lit("edges").alias("metric"), "value")
    return n.unionByName(e)


def q_prop_names(spark, sf_dir):
    """A2 getPropNames: distinct property-name union over node set."""
    snap = _graph(spark, sf_dir)
    return snap.node_props().select("name").distinct()


def q_index_build(spark, sf_dir):
    """X1/X2 bulk index build — the analogue of the reference's only saved
    benchmark (trie bulk insert of 235,886 word keys,
    LowLevelDB/perf/TrieBench.hs:19-59 / BASELINE.md): retroactively index
    every Order node's o_totalprice (150k keys at sf0.1) into the
    (owner_id, label, name, key) index shape. One filtered props scan +
    one join + a narrow projection — no shuffle beyond the join."""
    from hgraphstorage_spark.engine import build_index

    snap = _graph(spark, sf_dir)
    return build_index(snap, ["Order"], ["o_totalprice"])


def q_index_lookup(spark, sf_dir):
    """X1+X3: build index on Customer.c_name, point lookup."""
    from hgraphstorage_spark.engine import build_index

    snap = _graph(spark, sf_dir)
    idx = build_index(snap, ["Customer"], ["c_name"])
    return idx.filter(F.col("key") == "Customer#000000042").select("owner_id", "key")


def q_index_prefix(spark, sf_dir):
    """X4 trie prefix scan: parts whose name starts with 'red'."""
    from hgraphstorage_spark.engine import build_index

    snap = _graph(spark, sf_dir)
    idx = build_index(snap, ["Part"], ["p_name"])
    return idx.filter(F.col("key").startswith("red")).select("owner_id", "key")


def q_mutation_cascade(spark, sf_dir):
    """M5 deleteObject cascade: delete customer 1, count surviving edges per label."""
    from hgraphstorage_spark.mutations import delete_nodes

    snap = _graph(spark, sf_dir)
    after = delete_nodes(snap, [NODE["Customer"] + 1])
    return after.edges.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))


def q_snapshot_time_travel(spark, sf_dir):
    """T1-T5 MVCC: version ledger — node counts before/after a committed delete."""
    from hgraphstorage_spark import GraphEngine

    snap = _graph(spark, sf_dir)
    eng = GraphEngine(spark, snap)
    eng.delete_nodes([NODE["Customer"] + 1])
    v1 = eng.commit()
    v0 = 0
    rows = [
        (v0, eng.snapshot_at(v0).nb_nodes()),
        (v1, eng.snapshot_at(v1).nb_nodes()),
    ]
    return spark.createDataFrame(rows, "version int, n_nodes long")


def q_degrees(spark, sf_dir):
    """Analytics: degree per Nation node."""
    from hgraphstorage_spark.analytics import degrees

    snap = _graph(spark, sf_dir)
    return degrees(snap).filter(F.col("label") == "Nation").select("id", "out_deg", "in_deg", "deg")


def q_connected_components(spark, sf_dir):
    """Analytics: CC over the location subgraph (one component per region)."""

    from hgraphstorage_spark.analytics import connected_components

    snap = _graph(spark, sf_dir)
    sub = _loc_subgraph(snap)
    comp = connected_components(sub, max_iter=10)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))


def q_connected_components_alt(spark, sf_dir):
    """Analytics: alternating large-star/small-star CC — same result as
    HashMin (shared oracle), O(log n) rounds at scale."""

    from hgraphstorage_spark.analytics import connected_components_alternating

    snap = _graph(spark, sf_dir)
    sub = _loc_subgraph(snap)
    comp = connected_components_alternating(sub)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))


def q_pagerank(spark, sf_dir):
    """Analytics: PageRank (3 fixed iterations, dangling redistribution)
    over the location subgraph — deterministic, oracle-checked against
    unrolled SQL."""

    from hgraphstorage_spark.analytics import pagerank

    snap = _graph(spark, sf_dir)
    sub = _loc_subgraph(snap)
    pr = pagerank(sub, alpha=0.85, iterations=3, dangling=True)
    # fixed-scale string: the hash-canonical form for non-integer outputs
    return pr.select("id", F.round("rank", 6).cast("decimal(18,6)").cast("string").alias("rank"))


def _pagerank_oracle_sql(iterations: int = 3) -> str:
    """Unrolled-iteration DuckDB PageRank over the location subgraph,
    mirroring analytics.pagerank: rank = (1-a)/n + a*dangling/n +
    a*sum(in rank/out_deg). Float sums agree with Spark's partial-agg
    order at round-6 (error ~1e-15 vs quantum 5e-7)."""
    head = "WITH " + _LOC_GRAPH_SQL + """,
        outd AS (SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        r0 AS (SELECT id, 1.0 / n AS rank FROM nodes, nn)"""
    parts = [head]
    for i in range(iterations):
        parts.append(f""",
        d{i} AS (SELECT coalesce(sum(rank), 0) AS m FROM r{i}
                 LEFT JOIN outd ON r{i}.id = outd.src WHERE outd.src IS NULL),
        c{i} AS (SELECT e.dst AS id, sum(r.rank / o.d) AS mass
                 FROM edges e JOIN r{i} r ON e.src = r.id JOIN outd o ON e.src = o.src
                 GROUP BY e.dst),
        r{i + 1} AS (
          SELECT nodes.id,
                 (0.15 / n + 0.85 * d{i}.m / n) + 0.85 * coalesce(c{i}.mass, 0) AS rank
          FROM nodes CROSS JOIN nn CROSS JOIN d{i}
          LEFT JOIN c{i} ON nodes.id = c{i}.id)""")
    parts.append(f"""
        SELECT id, CAST(round(rank, 6) AS DECIMAL(18,6))::VARCHAR AS rank FROM r{iterations}""")
    return "".join(parts)


def q_hits(spark, sf_dir):
    """Analytics: HITS hubs & authorities (3 alternating L1-normalized
    sweeps, analytics.py:hits) over the location subgraph — exact
    DECIMAL reinforcement sums, round-12 normalization divisions, so
    the unrolled oracle matches bit-for-bit."""

    from hgraphstorage_spark.analytics import hits

    snap = _graph(spark, sf_dir)
    sub = _loc_subgraph(snap)
    out = hits(sub, iterations=3)
    return out.select(
        "id",
        F.col("hub").cast("string").alias("hub"),
        F.col("authority").cast("string").alias("authority"),
    )


_LOC_GRAPH_SQL = """
        nodes AS (
          SELECT 1000000000000 + r_regionkey AS id FROM region
          UNION ALL SELECT 2000000000000 + n_nationkey FROM nation
          UNION ALL SELECT 3000000000000 + c_custkey FROM customer
          UNION ALL SELECT 4000000000000 + s_suppkey FROM supplier
        ),
        edges AS (
          SELECT 3000000000000 + c_custkey AS src, 2000000000000 + c_nationkey AS dst FROM customer
          UNION ALL SELECT 4000000000000 + s_suppkey, 2000000000000 + s_nationkey FROM supplier
          UNION ALL SELECT 2000000000000 + n_nationkey, 1000000000000 + n_regionkey FROM nation
        )"""


def _hits_oracle_sql(iterations: int = 3) -> str:
    """Unrolled DuckDB HITS over the location subgraph, mirroring
    analytics.hits: exact DECIMAL sums (order-independent), one
    round-12 double division per normalization, authorities updated
    first then hubs from the UPDATED authorities."""
    parts = [
        "WITH "
        + _LOC_GRAPH_SQL
        + """,
        h0 AS (SELECT id, CAST(1 AS DECIMAL(28,12)) AS hub FROM nodes)"""
    ]

    def norm_block(i: int, raw: str, frame: str, out: str, col: str) -> str:
        return f""",
        {frame}f AS MATERIALIZED (
          SELECT nodes.id, coalesce(x, CAST(0 AS DECIMAL(38,12))) AS x
          FROM nodes LEFT JOIN {raw} ON nodes.id = {raw}.id),
        {frame}s AS (SELECT sum(x) AS s FROM {frame}f),
        {out} AS MATERIALIZED (
          SELECT id,
                 (CASE WHEN s > 0 THEN round(x::DOUBLE / s::DOUBLE, 12)
                       ELSE (0.0)::DOUBLE END)::DECIMAL(28,12) AS {col}
          FROM {frame}f CROSS JOIN {frame}s)"""

    for i in range(1, iterations + 1):
        parts.append(f""",
        ar{i} AS (SELECT e.dst AS id, sum(h.hub) AS x
                  FROM edges e JOIN h{i - 1} h ON e.src = h.id GROUP BY e.dst)""")
        parts.append(norm_block(i, f"ar{i}", f"a{i}", f"a{i}", "authority"))
        parts.append(f""",
        hr{i} AS (SELECT e.src AS id, sum(a.authority) AS x
                  FROM edges e JOIN a{i} a ON e.dst = a.id GROUP BY e.src)""")
        parts.append(norm_block(i, f"hr{i}", f"h{i}x", f"h{i}", "hub"))
    parts.append(f"""
        SELECT h.id, h.hub::VARCHAR AS hub, a.authority::VARCHAR AS authority
        FROM h{iterations} h JOIN a{iterations} a ON h.id = a.id""")
    return "".join(parts)


def q_personalized_pagerank(spark, sf_dir):
    """Analytics: personalized PageRank from Customer 1 over the location
    subgraph (teleport + dangling mass return to the seed)."""

    from hgraphstorage_spark.analytics import pagerank

    snap = _graph(spark, sf_dir)
    sub = _loc_subgraph(snap)
    pr = pagerank(sub, alpha=0.85, iterations=3, dangling=True, reset_to=[NODE["Customer"] + 1])
    # report only nonzero-rank nodes: the seed's forward cone (plus seed)
    return pr.filter(F.col("rank") > 0).select(
        "id", F.round("rank", 6).cast("decimal(18,6)").cast("string").alias("rank")
    )


def _ppr_oracle_sql(iterations: int = 3, seed: int = 0) -> str:
    """Unrolled personalized PageRank mirroring analytics.pagerank with
    reset_to=[seed]: p(v) = 1 at the seed, 0 elsewhere."""
    head = "WITH " + _LOC_GRAPH_SQL + f""",
        outd AS (SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src),
        r0 AS (SELECT id, CASE WHEN id = {seed} THEN 1.0 ELSE 0.0 END AS rank FROM nodes)"""
    parts = [head]
    for i in range(iterations):
        parts.append(f""",
        d{i} AS (SELECT coalesce(sum(rank), 0) AS m FROM r{i}
                 LEFT JOIN outd ON r{i}.id = outd.src WHERE outd.src IS NULL),
        c{i} AS (SELECT e.dst AS id, sum(r.rank / o.d) AS mass
                 FROM edges e JOIN r{i} r ON e.src = r.id JOIN outd o ON e.src = o.src
                 GROUP BY e.dst),
        r{i + 1} AS (
          SELECT nodes.id,
                 (0.15 + 0.85 * d{i}.m) * (CASE WHEN nodes.id = {seed} THEN 1.0 ELSE 0.0 END)
                 + 0.85 * coalesce(c{i}.mass, 0) AS rank
          FROM nodes CROSS JOIN d{i}
          LEFT JOIN c{i} ON nodes.id = c{i}.id)""")
    parts.append(f"""
        SELECT id, CAST(round(rank, 6) AS DECIMAL(18,6))::VARCHAR AS rank FROM r{iterations}
        WHERE rank > 0""")
    return "".join(parts)


def q_k_core(spark, sf_dir):
    """Analytics: 3-core of the full graph (iterative peel to fixpoint;
    oracle unrolls more rounds than convergence needs — extra rounds are
    no-ops at the fixpoint)."""
    from hgraphstorage_spark.analytics import k_core

    return k_core(_graph(spark, sf_dir), k=3)


def _k_truss_oracle_sql(k: int = 4, rounds: int = 4) -> str:
    """Unrolled k-truss peeling over the synthetic Hackage package graph
    (same und CTE as the triangle oracle): per round, ordered triangle
    enumeration -> per-edge support -> drop below k-2. Valid whenever
    ``rounds`` >= the convergence round count (extra rounds no-op); a
    final support pass on the fixpoint yields the output supports."""
    need = k - 2
    sql = """
        WITH pkgs AS (SELECT unnest(generate_series(0, 999)) AS i),
        vv AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
        e0 AS MATERIALIZED (
          SELECT DISTINCT least(i, (i*31 + j) % 1000) AS u, greatest(i, (i*31 + j) % 1000) AS w
          FROM vv WHERE (i*31 + j) % 1000 <> i
        )"""
    for i in range(1, rounds + 2):  # one extra pass for the final supports
        p = i - 1
        sql += f""",
        t{i} AS MATERIALIZED (
          SELECT e1.u AS a, e1.w AS b, e2.w AS c
          FROM e{p} e1 JOIN e{p} e2 ON e2.u = e1.w
          JOIN e{p} e3 ON e3.u = e1.u AND e3.w = e2.w
        ),
        s{i} AS MATERIALIZED (
          SELECT u, w, count(*)::BIGINT AS sup FROM (
            SELECT a AS u, b AS w FROM t{i}
            UNION ALL SELECT a, c FROM t{i}
            UNION ALL SELECT b, c FROM t{i}
          ) GROUP BY u, w
        ),
        e{i} AS MATERIALIZED (
          SELECT e.u, e.w FROM e{p} e
          LEFT JOIN s{i} s ON e.u = s.u AND e.w = s.w
          WHERE COALESCE(s.sup, 0) >= {need}
        )"""
    last = rounds + 1
    return sql + f"""
        SELECT (1000000000 + e.u)::BIGINT AS a, (1000000000 + e.w)::BIGINT AS b,
               COALESCE(s.sup, 0)::BIGINT AS support
        FROM e{rounds} e LEFT JOIN s{last} s ON e.u = s.u AND e.w = s.w"""


def _k_core_oracle_sql(k: int = 3, rounds: int = 6) -> str:
    """Unrolled peeling rounds over the FK-derived undirected simple graph.
    Valid whenever ``rounds`` >= the convergence round count at the tested
    scale (sf0.01 converges in 4; extra rounds are fixpoint no-ops)."""
    C, O, P, S, N, R = (str(NODE[x]) for x in ("Customer", "Order", "Part", "Supplier", "Nation", "Region"))
    sql = f"""
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM (
            SELECT ({C} + c_custkey)::BIGINT AS s, ({N} + c_nationkey)::BIGINT AS d FROM customer
            UNION ALL SELECT ({S} + s_suppkey), ({N} + s_nationkey) FROM supplier
            UNION ALL SELECT ({N} + n_nationkey), ({R} + n_regionkey) FROM nation
            UNION ALL SELECT ({C} + o_custkey), ({O} + o_orderkey) FROM orders
            UNION ALL SELECT ({O} + l_orderkey), ({P} + l_partkey) FROM lineitem
            UNION ALL SELECT ({P} + l_partkey), ({S} + l_suppkey) FROM lineitem
          ) WHERE s <> d
        )"""
    for i in range(1, rounds + 1):
        sql += f""",
        d{i} AS MATERIALIZED (
          SELECT id, count(*)::BIGINT AS deg
          FROM (SELECT a AS id FROM e{i-1} UNION ALL SELECT b FROM e{i-1}) GROUP BY 1
        ),
        e{i} AS MATERIALIZED (
          SELECT c.a, c.b FROM e{i-1} c
          JOIN d{i} da ON c.a = da.id JOIN d{i} db ON c.b = db.id
          WHERE da.deg >= {k} AND db.deg >= {k}
        )"""
    sql += f"""
        SELECT id, deg FROM d{rounds} WHERE deg >= {k}"""
    return sql


def q_bfs(spark, sf_dir):
    """Analytics: BFS frontier sizes from customer 0 over placed/contains."""
    from hgraphstorage_spark.analytics import bfs

    snap = _graph(spark, sf_dir)
    reached = bfs(snap, NODE["Customer"] + 0, max_hops=2, labels=("placed", "contains"))
    return reached.groupBy("hops").agg(F.count(F.lit(1)).alias("n_nodes"))


def q_hackage_one_step(spark, sf_dir):
    """S8 + J1 parity: the reference's benchmark workload — bulk-load a
    Hackage-style graph, index-lookup 'pkg_0' (the ≥111-version 'yesod'
    analog), one-step query over versions edges."""
    from hgraphstorage_spark import T
    from hgraphstorage_spark.compiler import compile_traversal
    from hgraphstorage_spark.sources.hackage import load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    res = compile_traversal(snap, T().ns().has("name", "pkg_0").out("versions"))
    return res.df.agg(F.count(F.lit(1)).alias("n_versions"))


def q_hackage_depends_top(spark, sf_dir):
    """Most-depended-on packages over the synthetic Hackage graph."""
    from hgraphstorage_spark.sources.hackage import load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    return (
        snap.edges.filter(F.col("label") == "depends")
        .groupBy(F.col("dst").alias("pkg_id"))
        .agg(F.count(F.lit(1)).alias("n_dependents"))
        .orderBy(F.col("n_dependents").desc(), F.col("pkg_id").asc())
        .limit(10)
    )


def q_triangle_count(spark, sf_dir):
    """Analytics: per-package triangle counts over the package-level
    projection of the Hackage depends graph (degree-ordered wedge join —
    the only synthetic graph here with triangles)."""
    from dataclasses import replace

    from hgraphstorage_spark.analytics import triangle_count
    from hgraphstorage_spark.sources.hackage import PKG_BASE, VER_BASE, load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    # project version->package depends edges to package->package
    dep = snap.edges.filter(F.col("label") == "depends").select(
        F.col("id"),
        (F.floor((F.col("src") - VER_BASE) / 256) + PKG_BASE).cast("long").alias("src"),
        F.col("dst"),
        F.lit("pkg_depends").alias("label"),
    )
    sub = replace(snap, nodes=snap.nodes.filter(F.col("label") == "Package"), edges=dep)
    return triangle_count(sub)


def q_k_truss(spark, sf_dir):
    """4-truss of the package-level Hackage projection: edges in >= 2
    triangles after synchronized peeling; oracle unrolls the rounds."""
    from dataclasses import replace

    from hgraphstorage_spark.analytics import k_truss
    from hgraphstorage_spark.sources.hackage import PKG_BASE, VER_BASE, load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    dep = snap.edges.filter(F.col("label") == "depends").select(
        F.col("id"),
        (F.floor((F.col("src") - VER_BASE) / 256) + PKG_BASE).cast("long").alias("src"),
        F.col("dst"),
        F.lit("pkg_depends").alias("label"),
    )
    sub = replace(snap, nodes=snap.nodes.filter(F.col("label") == "Package"), edges=dep)
    return k_truss(sub, k=4)


def q_clustering(spark, sf_dir):
    """Per-node local clustering coefficient (triangles / C(deg,2)) over
    the same package-level Hackage projection as triangle_count."""
    from dataclasses import replace

    from hgraphstorage_spark.analytics import clustering_coefficient
    from hgraphstorage_spark.sources.hackage import PKG_BASE, VER_BASE, load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    dep = snap.edges.filter(F.col("label") == "depends").select(
        F.col("id"),
        (F.floor((F.col("src") - VER_BASE) / 256) + PKG_BASE).cast("long").alias("src"),
        F.col("dst"),
        F.lit("pkg_depends").alias("label"),
    )
    sub = replace(snap, nodes=snap.nodes.filter(F.col("label") == "Package"), edges=dep)
    return _canon(clustering_coefficient(sub), "coeff")


def q_link_prediction(spark, sf_dir):
    """Analytics: common-neighbor / Jaccard / Adamic-Adar link-prediction
    scores over the package-level Hackage depends projection, top-50
    candidate pairs (oracle: same wedge enumeration in SQL; AA terms are
    per-row-rounded DECIMAL(28,12) so the sum is order-independent)."""
    from dataclasses import replace

    from hgraphstorage_spark.analytics import link_prediction
    from hgraphstorage_spark.sources.hackage import PKG_BASE, VER_BASE, load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    dep = snap.edges.filter(F.col("label") == "depends").select(
        F.col("id"),
        (F.floor((F.col("src") - VER_BASE) / 256) + PKG_BASE).cast("long").alias("src"),
        F.col("dst"),
        F.lit("pkg_depends").alias("label"),
    )
    sub = replace(snap, nodes=snap.nodes.filter(F.col("label") == "Package"), edges=dep)
    return (
        link_prediction(sub)
        .orderBy(F.col("common_neighbors").desc(), F.col("adamic_adar").desc(), "u", "v")
        .limit(50)
        .select(
            "u",
            "v",
            "common_neighbors",
            F.col("jaccard").cast("string").alias("jaccard"),
            F.col("adamic_adar").cast("string").alias("adamic_adar"),
        )
    )


def q_shortest_paths(spark, sf_dir):
    """Analytics: multi-source BFS distances to every Region landmark over
    the undirected location subgraph, reported as (landmark, dist) sizes."""
    from hgraphstorage_spark.analytics import shortest_paths

    snap = _graph(spark, sf_dir)
    landmarks = [NODE["Region"] + r for r in range(5)]
    sp = shortest_paths(
        snap, landmarks, max_hops=3, labels=("custLocatedIn", "suppLocatedIn", "nationLocatedIn")
    )
    return sp.groupBy("landmark", "dist").agg(F.count(F.lit(1)).alias("n_nodes"))


def q_harmonic_centrality(spark, sf_dir):
    """Analytics: landmark-approximated harmonic centrality (sum of
    1/dist to the 5 Region landmarks) over the undirected location
    subgraph; decimal-exact terms so the oracle matches bit-for-bit."""
    from hgraphstorage_spark.analytics import harmonic_centrality

    snap = _graph(spark, sf_dir)
    landmarks = [NODE["Region"] + r for r in range(5)]
    return harmonic_centrality(
        snap, landmarks, max_hops=3, labels=("custLocatedIn", "suppLocatedIn", "nationLocatedIn")
    ).select("id", F.col("harmonic").cast("string").alias("harmonic"))


def q_label_propagation(spark, sf_dir):
    """Analytics: deterministic synchronous LPA communities over the
    location subgraph (oracle: unrolled 3-round SQL, tie-break-exact)."""
    from dataclasses import replace

    from hgraphstorage_spark.analytics import label_propagation

    snap = _graph(spark, sf_dir)
    loc_edges = snap.edges.filter(F.col("label").isin(["custLocatedIn", "suppLocatedIn", "nationLocatedIn"]))
    loc_nodes = snap.nodes.filter(F.col("label").isin(["Region", "Nation", "Customer", "Supplier"]))
    comm = label_propagation(replace(snap, nodes=loc_nodes, edges=loc_edges), max_iter=3)
    return comm.groupBy("community").agg(F.count(F.lit(1)).alias("n_nodes"))


def q_modularity(spark, sf_dir):
    """Newman modularity Q of the 3-round LPA communities over the
    location subgraph — the community-quality score; the oracle replays
    BOTH the LPA rounds and the closed-form Q (12-decimal per-community
    terms, exact DECIMAL sum)."""

    from hgraphstorage_spark.analytics import label_propagation, modularity

    snap = _graph(spark, sf_dir)
    sub = _loc_subgraph(snap)
    comm = label_propagation(sub, max_iter=3)
    return _canon(modularity(sub, comm), "modularity")


def q_graph_summary(spark, sf_dir):
    """Compressed driver-checkable evidence for the iterative graph
    analytics: one (metric, value) scalar per algorithm — connected
    components (both Pregel variants feed the same result), degrees, BFS,
    triangle counting, k-core, k-truss, label propagation, SCC,
    multi-source and weighted shortest paths, betweenness, and local
    clustering. The full per-node variants remain as their own
    queries past the driver's 50-query window and are value-compared in
    tests/test_oracle_parity.py; this row keeps each algorithm inside the
    driver's correctness window without spending a dozen slots."""

    def s(name, df):
        return df.select(F.lit(name).alias("metric"), F.col("value").cast("long").alias("value"))

    from hgraphstorage_spark.pipeline.state import track

    # cc and deg each feed TWO scalar branches; unpersisted, each branch
    # replays the component grouping / the edge-derivation degree pass
    # (r12 duplicate-compute sweep). Both frames are tiny rollups →
    # persist.
    cc = track(q_connected_components(spark, sf_dir))
    deg = track(q_degrees(spark, sf_dir))
    parts = [
        s("cc_components", cc.agg(F.count(F.lit(1)).alias("value"))),
        s("cc_nodes", cc.agg(F.sum("n_nodes").alias("value"))),
        s("degrees_max", deg.agg(F.max("deg").alias("value"))),
        s("degrees_total", deg.agg(F.sum("deg").alias("value"))),
        s("bfs_nodes", q_bfs(spark, sf_dir).agg(F.sum("n_nodes").alias("value"))),
        s("triangles_total", q_triangle_count(spark, sf_dir).agg(F.sum("triangles").alias("value"))),
        s("k_core3_size", q_k_core(spark, sf_dir).agg(F.count(F.lit(1)).alias("value"))),
        s("lpa_communities", q_label_propagation(spark, sf_dir).agg(F.count(F.lit(1)).alias("value"))),
        s("scc_components", q_scc(spark, sf_dir).agg(F.countDistinct("scc").alias("value"))),
        s("sp_reached", q_shortest_paths(spark, sf_dir).agg(F.sum("n_nodes").alias("value"))),
        s("k_truss4_edges", q_k_truss(spark, sf_dir).agg(F.count(F.lit(1)).alias("value"))),
        s(
            "betweenness_sum",
            q_betweenness(spark, sf_dir).agg(
                F.sum(F.col("betweenness").cast("double")).alias("value")
            ),
        ),
        s(
            "clustering_nonzero",
            q_clustering(spark, sf_dir)
            .filter(F.col("coeff").cast("double") > 0)
            .agg(F.count(F.lit(1)).alias("value")),
        ),
        s("wsp_cost_total", q_weighted_sp(spark, sf_dir).agg(F.sum("cost").alias("value"))),
        # r10: the HyperBall effective-diameter integer report (the
        # interpolated reading stays under q_effective_diameter's own
        # in-window hash)
        s(
            "effective_diameter",
            q_effective_diameter(spark, sf_dir).select(
                F.col("effective_diameter").alias("value")
            ),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# TPC-H-style analytical queries (scan/agg/join operator coverage at scale)


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # money doubles become exact DECIMALs *before* any arithmetic: the
    # product decimal(18,2) × decimal(8,6) is exact in both engines, so
    # sums are order-independent and oracle-reproducible bit-for-bit
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,6)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_sbp"),
            F.sum(disc_price).cast("decimal(30,8)").alias("_sdp"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # hash-canonical: exact decimals rendered as fixed-scale strings so
        # the driver's value hash can't diverge on decimal width metadata
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("string").alias("sum_qty"),
            F.col("_sbp").cast("string").alias("sum_base_price"),
            F.col("_sdp").cast("string").alias("sum_disc_price"),
            "count_order",
        )
    )


def q_tpch_q3_like(spark, sf_dir):
    li, orders, cust = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(8,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")), orders.o_custkey == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(revenue).cast("decimal(30,8)").alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.col("_rev").cast("string").alias("revenue"))
    )


def q_tpch_q5_like(spark, sf_dir):
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    cust, nation = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(8,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("decimal(30,8)").cast("string").alias("revenue"))
    )


def q_tpch_q2_like(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part) on the available
    tables: for each part of a brand, the supplier offering the minimum
    unit price (l_extendedprice / l_quantity) — the correlated-subquery
    pattern expressed as a rank-1 window, the idiomatic Spark rewrite
    (one shuffle keyed by part instead of a re-scanning subquery).
    Deterministic ties: (unit_price, s_suppkey) ascending."""
    from pyspark.sql import Window

    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    supp, nation = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    unit = F.round(
        F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double"), 6
    ).cast("decimal(18,6)")
    offers = (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name", unit.alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_price").asc(), F.col("s_suppkey").asc())
    return (
        offers.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            F.col("unit_price").cast("string").alias("unit_price"),
        )
    )


def q_ntile_deciles(spark, sf_dir):
    """Window functions: users bucketed into spend deciles (ANSI NTILE
    parity), reporting each decile's size and spend range.

    VERDICT r4 task 2: NTILE is not rank-limited, so Spark's
    WindowGroupLimit rewrite never applies — a bare
    ``ntile(10).over(Window.orderBy(...))`` funnels the WHOLE user
    dimension through one WindowExec partition. Instead the global rank
    comes from the distributed two-pass prefix-sum
    (:func:`hgraphstorage_spark.pipeline.sampling._global_rank`: range
    partition + local rank + broadcast offsets) and the decile is the
    exact ANSI NTILE bucket computed from (rank, n): with q = n div 10,
    r = n mod 10, the first r buckets take q+1 rows, the rest q — so the
    result is bit-identical to the DuckDB ``ntile(10)`` oracle while the
    plan's only single-partition exchange carries the ~one-row-per-
    partition offset frame."""
    from hgraphstorage_spark.pipeline.sampling import _global_rank
    from hgraphstorage_spark.pipeline.state import track

    ev = _t(spark, sf_dir, "events")
    # persisted: spend feeds both the rank pipeline and the 1-row count
    # — without the cut, the events scan+agg executes twice
    spend = track(
        ev.groupBy("user_id").agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value")
        )
    )
    ranked = _global_rank(
        spend, [F.col("total_value").desc(), F.col("user_id").asc()], "_rk"
    )
    n_df = spend.agg(F.count(F.lit(1)).alias("_n"))
    rk = F.col("_rk")
    q = (F.col("_n") / 10).cast("long")
    r = F.col("_n") % 10
    # greatest(q,1): the otherwise-branch is only REACHED when q >= 1
    # (rk > r*(q+1) is impossible at q=0 since r = n there), but guard
    # the division so no evaluation order can divide by zero
    qs = F.greatest(q, F.lit(1))
    decile = (
        F.when(rk <= r * (q + 1), F.lit(1) + ((rk - 1) / (q + 1)).cast("long"))
        .otherwise(r + 1 + ((rk - 1 - r * (q + 1)) / qs).cast("long"))
        .cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(n_df))
        .withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("total_value").cast("string").alias("min_spend"),
            F.max("total_value").cast("string").alias("max_spend"),
        )
    )


def q_window_top_order(spark, sf_dir):
    """Window functions: each customer's highest-value order (row_number
    over partitionBy/orderBy — deterministic tie-break on orderkey)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("top_price"),
        )
    )


def q_rollup_revenue(spark, sf_dir):
    """Grouping sets: rollup over (returnflag, linestatus) with grouping ids."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(8,6)"
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(revenue).cast("decimal(30,8)").alias("revenue"), F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("revenue").cast("string").alias("revenue"),
            "cnt",
        )
    )


def q_cube_revenue(spark, sf_dir):
    """Grouping sets: full cube over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(8,6)"
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum(revenue).cast("decimal(30,8)").alias("revenue"), F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("revenue").cast("string").alias("revenue"),
            "cnt",
        )
    )


def q_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention over events (distinct users per cohort ×
    periods-since-first-event)."""
    from hgraphstorage_spark.functions.timeseries import retention_cohorts
    from hgraphstorage_spark.streaming import load_events

    # cohort_week formatted as a date string: timestamps round-trip through
    # pandas differently per engine; strings compare byte-for-byte
    return retention_cohorts(load_events(spark, sf_dir)).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "period",
        "n_users",
    )


def q_distinct_agg(spark, sf_dir):
    """Distinct + approx-distinct aggregates per order priority."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_anti_join(spark, sf_dir):
    """Anti join: customers who never placed an order."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_semi_join(spark, sf_dir):
    """Semi join: parts that ship in quantity >= 45 somewhere."""
    part, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") >= 45).select(F.col("l_partkey").alias("p_partkey"))
    return part.join(big, "p_partkey", "left_semi").select("p_partkey", "p_name")


def q_set_ops(spark, sf_dir):
    """Set operations: nations having customers INTERSECT nations having
    suppliers, minus (EXCEPT) nations in region 0."""
    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    with_cust = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    with_supp = supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    in_region0 = nation.filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").alias("nationkey")
    )
    return with_cust.intersect(with_supp).exceptAll(in_region0)


def q_bpe_token_counts(spark, sf_dir):
    from hgraphstorage_spark.pipeline.text import bpe_ish_token_counts

    return bpe_ish_token_counts(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (north-star extensions)


def q_dedup_exact(spark, sf_dir):
    from hgraphstorage_spark.pipeline import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id")


def q_text_token_counts(spark, sf_dir):
    from hgraphstorage_spark.pipeline import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def q_text_quality(spark, sf_dir):
    from hgraphstorage_spark.pipeline import quality_stats

    return quality_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.col("chars_per_token").cast("string").alias("chars_per_token"),
        F.col("punct_ratio").cast("string").alias("punct_ratio"),
    )


def q_lang_id(spark, sf_dir):
    from hgraphstorage_spark.pipeline import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    from hgraphstorage_spark.pipeline import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark, sf_dir):
    from hgraphstorage_spark.pipeline import tfidf_top_terms

    return _canon(tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3), "tfidf")


def q_quality_filter(spark, sf_dir):
    from hgraphstorage_spark.pipeline import quality_filter

    return _canon(quality_filter(_t(spark, sf_dir, "documents")), "mean_tok_len", "top_term_ratio")


def q_unigram_logprob(spark, sf_dir):
    """Corpus-unigram LM quality score per document (CCNet-style signal)."""
    from hgraphstorage_spark.pipeline.text import unigram_logprob

    return _canon(unigram_logprob(_t(spark, sf_dir, "documents")), "mean_logprob")


def q_similarity_topk(spark, sf_dir):
    from hgraphstorage_spark.pipeline import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10).select(
        "vec_id", F.col("score").cast("string").alias("score")
    )


def q_mmr_rerank(spark, sf_dir):
    """MMR diversified top-k (pipeline/similarity.py:mmr_topk): exact
    cosine pool of 15 for query 0, then 5 greedy rounds of
    lam*rel - (1-lam)*max-sim-to-selected at lam=0.7. All comparisons on
    round-6 decimals; the oracle unrolls the identical 5 rounds."""
    from hgraphstorage_spark.pipeline.similarity import mmr_topk

    out = mmr_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=5, pool=15, lam=0.7
    )
    return out.select(
        "query_id",
        "mmr_rank",
        "vec_id",
        F.col("relevance").cast("string").alias("relevance"),
        F.col("mmr_score").cast("string").alias("mmr_score"),
    )


def q_similarity_lsh(spark, sf_dir):
    """ANN scale path: LSH-bucketed top-k. md5 plane mode makes the
    bucketing integer-exact on both engines, so the approximate result is
    still a DETERMINISTIC function of the hash family — fully
    oracle-checked (xxhash64 planes remain the fast-path default)."""
    from hgraphstorage_spark.pipeline import lsh_bucket_topk

    out = lsh_bucket_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, bits=4, plane_mode="md5"
    )
    return _canon(out, "score")


def q_similarity_ivf(spark, sf_dir):
    """IVF-bucketed ANN — deterministic centroids/probes, oracle-checked."""
    from hgraphstorage_spark.pipeline.similarity import ivf_topk

    return _canon(ivf_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, nlist=16, nprobe=4), "score")


def q_ann_recall(spark, sf_dir):
    """ANN tuning pre-flight: measured recall@10 of the IVF index vs the
    exact cosine ground truth for four probe queries — the vector
    counterpart of lsh_recall_report. Oracle replays BOTH rankings and
    the intersection."""
    from hgraphstorage_spark.pipeline.similarity import ann_recall_report

    return _canon(
        ann_recall_report(
            _t(spark, sf_dir, "embeddings"), query_ids=[0, 7, 23, 42], k=10
        ),
        "recall",
    )


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (long format) — the k-means/IVF
    training step; shuffle keyed by (label, dim)."""
    from hgraphstorage_spark.pipeline import label_centroids

    return _canon(label_centroids(_t(spark, sf_dir, "embeddings")), "m")


def q_embedding_stats(spark, sf_dir):
    """Per-dimension corpus stats of the embedding column (quantizer /
    scaler training step). mean/std round-canonicalized; min/max exact."""
    from hgraphstorage_spark.pipeline.similarity import embedding_stats

    return _canon(embedding_stats(_t(spark, sf_dir, "embeddings")), "mean", "std")


def q_sq_topk(spark, sf_dir):
    """Scalar-quantized (SQ8) approximate top-k cosine search: per-dim
    min/max ranges -> 8-bit codes -> search on reconstructed vectors.
    Reconstruction is pure per-element IEEE arithmetic, bit-identical in
    DuckDB, so the oracle replays the quantizer exactly."""
    from hgraphstorage_spark.pipeline.similarity import sq_topk

    return _canon(sq_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10), "score")


def q_kmeans(spark, sf_dir):
    """Two Lloyd k-means rounds (8 lists, cosine) — broadcast-centroid
    assignment + (list, dim)-keyed centroid update; oracle unrolls the
    same two rounds."""
    from hgraphstorage_spark.pipeline.similarity import kmeans_iterations

    return kmeans_iterations(_t(spark, sf_dir, "embeddings"), nlist=8, iterations=2)


def q_salted_agg(spark, sf_dir):
    """Skew-resistant two-phase aggregation — must equal the plain GROUP BY."""
    from hgraphstorage_spark.operators import salted_count_by

    li = _t(spark, sf_dir, "lineitem")
    return salted_count_by(li, ["l_returnflag"], salt=16).select("l_returnflag", "cnt")


def q_embed_near_dup(spark, sf_dir):
    """All-pairs embedding-cosine near-duplicates (exact — oracle-checked)."""
    from hgraphstorage_spark.pipeline.similarity import embedding_near_dup_exact

    return _canon(embedding_near_dup_exact(_t(spark, sf_dir, "embeddings"), threshold=0.35), "score")


def q_embed_near_dup_lsh(spark, sf_dir):
    """LSH-bucketed embedding near-dup, deterministic md5-plane mode —
    fully oracle-checked: the DuckDB oracle replays the integer-exact
    bucketing (same `md5_plane_int` helper emits both sides' plane
    literals) and the exact re-score. Sub-100% recall is irrelevant to
    checkability — the output is a deterministic function of the hash
    family. xxhash64 planes + adaptive bits stay the non-oracle default
    (`tests/test_lsh_modes.py` pins mode equivalence on small N)."""
    from hgraphstorage_spark.pipeline.similarity import embedding_near_dup_lsh

    return _canon(
        embedding_near_dup_lsh(
            _t(spark, sf_dir, "embeddings"), threshold=0.35, bits=5, tables=8, plane_mode="md5"
        ),
        "score",
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    """Near-dup pairs via MinHash-LSH, deterministic md5 hash mode —
    fully oracle-checked: the DuckDB oracle replays word/shingle hashing,
    the k permutations, banding, and the exact-Jaccard verify with the
    same md5-derived hash family (see `md5_long`)."""
    from hgraphstorage_spark.pipeline import minhash_lsh_pairs

    return _canon(
        minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.6, hash_mode="md5"),
        "jaccard",
    )


def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (blocked by lang) — oracle-checked
    (hashed-shingle Jaccard equals string-shingle Jaccard; see tests)."""
    from hgraphstorage_spark.pipeline import ngram_jaccard_pairs

    return _canon(
        ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.5, block_col="lang"),
        "jaccard",
    )


def q_jaccard_prefix(spark, sf_dir):
    """Exact 3-gram Jaccard pairs via PREFIX FILTERING (SSJoin/PPJoin) —
    the lossless scale path for the exact similarity join: candidates
    must share a token in each doc's rarest-first prefix, so one hot
    boilerplate shingle no longer spawns a k² candidate group. The
    prefix-filter lemma guarantees the OUTPUT is identical to the full
    exact join (order- and hash-independent — pruning only), so the
    oracle is the same string-shingle exact-Jaccard replay as
    ``ngram_jaccard`` with no cap."""
    from hgraphstorage_spark.pipeline import jaccard_prefix_pairs

    return _canon(
        jaccard_prefix_pairs(
            _t(spark, sf_dir, "documents"), n=3, threshold=0.5, block_col="lang"
        ),
        "jaccard",
    )


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware dedup keeper: same 3-round HashMin clusters as
    dedup_clusters, but each multi-doc cluster keeps its LONGEST
    document (n_chars as the quality proxy; ties to smallest id) — the
    keep-the-cleanest-copy policy. One cluster-keyed argmax, no window.
    Oracle unrolls the rounds and replays the argmax.

    The pair stage runs with ``max_doc_freq=100`` (VERDICT r5 task 2):
    shingles shared by >100 docs leave the candidate index, so the
    quadratic-within-shared-shingle-group blowup one boilerplate
    shingle causes at scale is bounded — this capped shape, not the
    uncapped diagnostic, is what the driver window certifies. The
    oracle replays the same cap (capped ⊆ uncapped is a hypothesis
    law in tests/test_pipeline.py)."""
    from hgraphstorage_spark.pipeline import ngram_jaccard_pairs
    from hgraphstorage_spark.pipeline.dedup import dedup_clusters, dedup_keep_best

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, block_col="lang", max_doc_freq=100)
    cl = dedup_clusters(docs, pairs, rounds=3)
    kb = dedup_keep_best(cl, docs, "n_chars")
    sizes = kb.groupBy("cluster").agg(F.count(F.lit(1)).alias("_n"))
    return (
        kb.join(sizes.filter(F.col("_n") > 1), "cluster")
        .select("doc_id", "cluster", F.col("quality").cast("long").alias("quality"), "keep")
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: exact Jaccard pairs → fixed-round HashMin
    components → canonical representative per cluster (the last stage of a
    near-dedup pipeline). Oracle unrolls the same 3 rounds in SQL.

    Pairs run with ``max_doc_freq=100`` (VERDICT r5 task 2) — the
    hot-shingle cap bounds the candidate stage; the oracle replays the
    cap, and the uncapped form stays available as the ``ngram_jaccard``
    diagnostic query."""
    from hgraphstorage_spark.pipeline import ngram_jaccard_pairs
    from hgraphstorage_spark.pipeline.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, block_col="lang", max_doc_freq=100)
    cl = dedup_clusters(docs, pairs, rounds=3)
    return (
        cl.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
        )
        .filter(F.col("n_docs") > 1)
    )


def q_vocab_topk(spark, sf_dir):
    """Tokenizer-training vocabulary: top-50 tokens by corpus count with
    document frequency (deterministic tie-break by token)."""
    from hgraphstorage_spark.pipeline.text import vocabulary

    return vocabulary(_t(spark, sf_dir, "documents"), top_k=50)


def q_chunk_dedup(spark, sf_dir):
    """C4/RefinedWeb-style line-level dedup adapted to the newline-free
    corpus: global first-occurrence dedup of 10-word chunks + document
    reassembly (fingerprinted for a compact exact compare)."""
    from hgraphstorage_spark.pipeline.text import chunk_dedup

    cd = chunk_dedup(_t(spark, sf_dir, "documents"), chunk_words=10)
    return cd.select("doc_id", "n_chunks", "n_kept", F.md5("text_dedup").alias("dedup_fp"))


def q_agg_messages(spark, sf_dir):
    """GraphX aggregateMessages primitive: per location-subgraph node,
    count of arriving messages and min neighbor id (messages flow both
    directions along the edge), restricted to Region/Nation receivers."""
    from dataclasses import replace

    from hgraphstorage_spark.analytics import aggregate_messages

    snap = _graph(spark, sf_dir)
    loc = replace(
        snap,
        edges=snap.edges.filter(
            F.col("label").isin(["custLocatedIn", "suppLocatedIn", "nationLocatedIn"])
        ),
    )
    res = aggregate_messages(
        loc,
        {"n_msgs": F.count, "min_nbr": F.min},
        msg_to_dst=F.col("src.id"),
        msg_to_src=F.col("dst.id"),
    )
    return res.filter(F.col("id") < 3 * 10**12)


def q_scc(spark, sf_dir):
    """Strongly connected components (forward-coloring / backward-marking)
    over the synthetic Hackage dependency graph at 20 packages — the
    package↔version dependency cycles form one giant SCC plus singleton
    versions. sf-independent (the generator is deterministic); the oracle
    computes TRUE SCCs via a DuckDB recursive-CTE transitive closure, so
    this checks the fixpoint algorithm against an independent definition
    of the answer, not an unrolled copy of itself."""
    from hgraphstorage_spark.analytics import strongly_connected_components
    from hgraphstorage_spark.sources.hackage import load_hackage_graph

    snap = load_hackage_graph(spark, n_packages=20)
    return strongly_connected_components(snap)


def q_random_walks(spark, sf_dir):
    """Deterministic random walks (DeepWalk corpus step) from every 50th
    customer: Customer →placed→ Order →contains→ Part →suppliedBy→
    Supplier, successor chosen by min md5(walk:step:nbr). Oracle unrolls
    the same 3 steps."""
    from hgraphstorage_spark.analytics import random_walks

    snap = _graph(spark, sf_dir)
    starts = snap.nodes.filter(
        (F.col("label") == "Customer") & (F.col("id") % 50 == 0)
    ).select("id")
    return random_walks(snap, starts, walk_len=3)


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (2048-token windows, 16
    hash-shards): where every document lands in the packed LM training
    stream. Deterministic — md5 sharding + doc_id order."""
    from hgraphstorage_spark.pipeline.sampling import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), max_tokens=2048)


def q_simhash_buckets(spark, sf_dir):
    """SimHash fingerprints in md5 hash mode — the 60-bit md5_long
    shingle family replays in SQL, so every fingerprint bit is
    oracle-checked (xxhash64 remains the fast-path default)."""
    from hgraphstorage_spark.pipeline import simhash

    sh = simhash(_t(spark, sf_dir, "documents"), hash_mode="md5")
    return sh.select("doc_id", "simhash")


def q_lang_confusion(spark, sf_dir):
    """Language-ID evaluation: declared-vs-predicted confusion counts —
    the trust check before routing on the lang-id signal. Oracle
    composes from the SAME lang_id replay text."""
    from hgraphstorage_spark.pipeline import lang_confusion

    return lang_confusion(_t(spark, sf_dir, "documents"))


def q_quality_reasons(spark, sf_dir):
    """Audit-grade quality gate: per-doc metrics + the sorted list of
    violated Gopher-style rules (empty = passes) — per-reason counts are
    the threshold-tuning view. Same narrow projection as
    quality_filter_narrow; the oracle derives reasons from the SAME rule
    expressions."""
    from hgraphstorage_spark.pipeline import quality_reject_reasons

    return _canon(
        quality_reject_reasons(_t(spark, sf_dir, "documents")),
        "mean_tok_len",
        "top_term_ratio",
    )


def q_content_type(spark, sf_dir):
    """Content-type routing signals (code/markdown/quote/bullet line
    fractions + URL count) — the structural complement to script_stats;
    zero-shuffle line classes, ASCII regexes replayed by RE2."""
    from hgraphstorage_spark.pipeline import content_type_stats

    return _canon(
        content_type_stats(_t(spark, sf_dir, "documents")),
        "code_frac",
        "header_frac",
        "quote_frac",
        "bullet_frac",
    )


def q_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity routing (Wenzek 2020): docs scored by mean
    negative log-likelihood under the src0-trained add-one unigram LM,
    each language split into head/middle/tail thirds by deterministic
    percent_rank. The oracle replays model, scores, and split."""
    from hgraphstorage_spark.pipeline import perplexity_buckets

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    return _canon(perplexity_buckets(docs, target), "avg_nll")


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-duplicate PAIRS (Manku/Jain/Sarma WWW'07): band the
    64-bit fingerprint 4×16 bits; band equality is a LOSSLESS candidate
    filter for Hamming <= 3 (pigeonhole), one xor-popcount verifies.
    md5 hash mode so DuckDB replays fingerprints, banding, and
    verification bit-for-bit."""
    from hgraphstorage_spark.pipeline.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), max_distance=3, hash_mode="md5"
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal decode: REAL pure-Python container probing (PNG/JPEG
    dimensions, WAV duration, MP4 mvhd/tkhd duration+dimensions,
    corrupt-payload detection) over Arrow batches of a deterministic
    binary media table. The oracle reconstructs the expected
    codec/dimension/ok rows from the generator arithmetic, so a wrong
    header writer OR parser breaks the match."""
    from hgraphstorage_spark.pipeline.multimodal import probe_metadata, synthetic_media

    # NULL-free sentinels: unparseable payloads report codec 'none' / -1
    # dims so the driver's row-sorted value compare never orders NULLs
    return probe_metadata(synthetic_media(spark, 64)).select(
        "media_id",
        "kind",
        F.coalesce("codec", F.lit("none")).alias("codec"),
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
        "decode_ok",
    )


def q_range_join(spark, sf_dir):
    """Banded range join: events bucketed into 50 value bands of width 10
    via interval containment — planned as a hash equi-join on the band
    bucket (asserted no-nested-loop in tests), not BroadcastNestedLoop.
    Oracle: the naive BETWEEN theta join in DuckDB."""
    from hgraphstorage_spark.operators import range_join

    ev = _t(spark, sf_dir, "events")
    bands = spark.range(50).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
    )
    joined = range_join(ev, "value", bands, "lo", "hi", bucket_width=10.0)
    return _canon(
        joined.groupBy("band_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        ),
        "total_value",
    )


def q_pattern_scan(spark, sf_dir):
    """PII-style pattern scan over the events props payload: digit-run
    match counts aggregated per event type (the scan half of a
    scan-then-redact sweep; redaction is pinned by unit tests)."""
    from hgraphstorage_spark.pipeline.text import pattern_scan

    ev = _t(spark, sf_dir, "events")
    scanned = pattern_scan(ev, "props", {"digit_run": r"[0-9]+"})
    return scanned.groupBy("event_type").agg(
        F.sum("n_digit_run").alias("total_digit_runs"),
        F.sum(F.when(F.col("n_digit_run") > 0, 1).otherwise(0)).alias("events_with_digits"),
    )


def q_sliding_chunks(spark, sf_dir):
    """Overlapping token-window chunking (window 32, stride 16) over
    documents — narrow map, no shuffle; md5 per window is the chunk
    dedup key."""
    from hgraphstorage_spark.pipeline.text import sliding_chunks

    return sliding_chunks(_t(spark, sf_dir, "documents"), window=32, stride=16)


def q_bigram_logprob(spark, sf_dir):
    """Corpus-bigram LM score per document (order-sensitive complement
    to unigram_logprob); MLE conditional probabilities, vocab-sized
    broadcasts, doc-keyed mean."""
    from hgraphstorage_spark.pipeline.text import bigram_logprob

    return _canon(bigram_logprob(_t(spark, sf_dir, "documents")), "mean_logprob")


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (top-2-gram fraction, duplicated
    3-gram fraction) per document — all-narrow plan: tokens -> n-gram
    array -> sort -> one-pass run-length aggregate, zero shuffle."""
    from hgraphstorage_spark.pipeline.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def q_jsonl_roundtrip(spark, sf_dir):
    """Connector surface: documents -> JSONL shards -> schema'd read-back
    (no inference scan), aggregated per (lang, source). Oracle reads the
    original parquet — equality proves the round trip lost nothing."""
    import shutil
    import tempfile

    from hgraphstorage_spark.sources import read_jsonl, write_jsonl

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="spark_graft_jsonl_")
    try:
        path = tmp + "/docs"
        write_jsonl(docs, path)
        back = read_jsonl(
            spark, path, "doc_id long, text string, lang string, source string, n_chars long"
        )
        agg = back.groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        # materialization boundary: the scratch shards are deleted on
        # exit, so the (small) aggregate is pinned before the rmtree
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_approx_distinct(spark, sf_dir):
    """Grouped distinct users per event type, exact + HLL++ sketch. The
    sketch is the 100 TB path (fixed-size state, associative merge); the
    oracle checks the exact column bit-for-bit and pins the sketch
    inside its error envelope (HLL++ is deterministic, so the boolean is
    stable)."""
    from hgraphstorage_spark.functions.stats import grouped_distinct_counts

    ev = _t(spark, sf_dir, "events")
    d = grouped_distinct_counts(ev, "event_type", "user_id", rsd=0.05)
    return d.select(
        "event_type",
        "n_distinct",
        (
            F.abs(F.col("n_distinct_approx") - F.col("n_distinct"))
            <= F.ceil(F.col("n_distinct") * 0.15)
        ).alias("approx_ok"),
    )


def q_normalize_text(spark, sf_dir):
    """Canonical text normalization over documents: lowercase, strip
    punctuation to spaces, collapse whitespace; md5 of the normalized
    form is the exact-dedup key. Narrow map, no shuffle."""
    from hgraphstorage_spark.pipeline.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    return normalize_text(docs).select("doc_id", "n_chars_norm", "norm_md5")


def q_negative_sampling(spark, sf_dir):
    """Deterministic negative edge sampling over the package-level
    Hackage depends projection: 3 non-edge destinations per source via
    an integer Weyl hash (oracle reproduces the draw exactly)."""
    from hgraphstorage_spark.pipeline.sampling import negative_edge_sampling
    from hgraphstorage_spark.sources.hackage import PKG_BASE, VER_BASE, load_hackage_graph

    snap = load_hackage_graph(spark, 1000)
    dep = snap.edges.filter(F.col("label") == "depends").select(
        (F.floor((F.col("src") - VER_BASE) / 256) + PKG_BASE).cast("long").alias("src"),
        F.col("dst"),
    )
    cands = spark.range(1000).select(
        F.col("id").alias("cand_idx"), (F.col("id") + PKG_BASE).alias("cand_id")
    )
    return negative_edge_sampling(dep, cands, k=3, oversample=2)


def q_events_hourly(spark, sf_dir):
    from hgraphstorage_spark.streaming import events_tumbling_agg, load_events

    ev = load_events(spark, sf_dir)
    out = events_tumbling_agg(ev, "1 hour").select(
        "window_start", "event_type", "n_events", "total_value"
    )
    return _canon_ts(_canon(out, "total_value"), "window_start")


def q_stream_enrich(spark, sf_dir):
    """Stream-static enrichment: events joined to the customer dimension
    (broadcast — the stream side never shuffles), revenue per market
    segment × event type. Same plan batch or streaming (stream==batch
    parity in tests/test_streaming.py)."""
    from hgraphstorage_spark.streaming import enrich_with_dimension, load_events

    ev = load_events(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enr = enrich_with_dimension(ev, cust, on="user_id")
    return _canon(
        enr.groupBy("c_mktsegment", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        ),
        "total_value",
    )


def q_events_json(spark, sf_dir):
    """JSON property querying (the DTJSON value type the reference stores
    opaquely — STMGraph Types.hs:214-215 — here actually queryable):
    schema'd from_json extraction stays in whole-stage codegen, no UDF."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), StructType([StructField("k", IntegerType())]))["k"]
    return _canon(
        ev.select((k % 10).alias("k_mod"), F.col("value"))
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        ),
        "total_value",
    )


def q_sessionize(spark, sf_dir):
    from hgraphstorage_spark.streaming import load_events, sessionize

    ev = load_events(spark, sf_dir)
    out = sessionize(ev, "30 minutes").select("session_start", "user_id", "n_events", "total_value")
    return _canon_ts(_canon(out, "total_value"), "session_start")


def q_fuzzy_pairs(spark, sf_dir):
    """Blocked-Levenshtein fuzzy duplicate pairs (entity-resolution
    blocking: shared 12-char normalized prefix + adjacent length-band
    probes). levenshtein is defined identically on both engines, so the
    oracle replays the operator verbatim — no hash mode needed."""
    from hgraphstorage_spark.pipeline.dedup import fuzzy_dup_pairs

    return fuzzy_dup_pairs(_t(spark, sf_dir, "documents"))


def q_exact_substring(spark, sf_dir):
    """ExactSubstr dedup (Lee et al. 2021): corpus-wide removal of every
    token span >= n that occurs more than once, in the engine-portable
    md5 hash mode so DuckDB replays the identical gram hashes. All
    outputs exact (longs + reassembled token stream)."""
    from hgraphstorage_spark.pipeline.dedup import exact_substring_dedup

    return exact_substring_dedup(_t(spark, sf_dir, "documents"), n=8, hash_mode="md5")


def q_stopword_stats(spark, sf_dir):
    """Gopher stopword signal: distinct list-word hits + token fraction,
    one zero-shuffle narrow fold."""
    from hgraphstorage_spark.pipeline.text import stopword_stats

    return _canon(stopword_stats(_t(spark, sf_dir, "documents")), "stopword_frac")


def q_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy (bits/char) — run-length fold over
    the sorted char array, zero shuffle; relational oracle. The DECIMAL
    entropy column is hash-canonicalized to its string rendering (r11
    all-rows sweep — the standard decimal canon, mirrored ::VARCHAR in
    the oracle)."""
    from hgraphstorage_spark.pipeline.text import char_entropy

    return _canon(char_entropy(_t(spark, sf_dir, "documents")), "entropy")


def q_repetition_exact(spark, sf_dir):
    """Gopher repetition with the paper's EXACT covered-token fractions
    (overlapping spans deduped by interval union) — paper thresholds like
    dup3 ≤ 0.18 apply as published. Fractions are integer-ratio doubles,
    so both engines compute identical IEEE values."""
    from hgraphstorage_spark.pipeline.text import repetition_stats_exact

    return repetition_stats_exact(_t(spark, sf_dir, "documents"))


def q_streaming_summary(spark, sf_dir):
    """Compressed driver-checkable evidence for the §2.10 streaming
    extension (the graph_summary trick): the three streaming operator
    families — gap-based session windows (``sessionize``), stream-static
    broadcast enrichment (``stream_enrich``), and the custom stateful
    per-key counter (``running_label_counts``, the reference's maintained
    nbNodes/nbEdges counters, ``STMGraph/src/.../Raw.hs:424-479``) —
    ACTUALLY RUN as structured streams here (file-source micro-batches →
    memory sink), then collapse to one (metric, value) scalar each.
    Stream==batch parity is the contract the oracle checks: it computes
    the same scalars in batch SQL, so a broken watermark, session merge,
    or state update surfaces as a driver hash mismatch."""
    import shutil
    import tempfile
    import uuid

    from hgraphstorage_spark.streaming import (
        enrich_with_dimension,
        load_events,
        running_label_counts,
        sessionize,
    )

    ev = load_events(spark, sf_dir)
    tag = uuid.uuid4().hex[:8]
    tmp = tempfile.mkdtemp(prefix="hgs_stream_summary_")
    sink_names: list[str] = []

    def run_stream(df, name, mode):
        sink_names.append(name)
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", f"{tmp}/ckpt_{name}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name)

    rows: list[tuple[str, str]] = []
    try:
        # several files so the stream really runs multiple micro-batches
        ev.repartition(2).write.mode("overwrite").parquet(f"{tmp}/events")

        def stream():
            return (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/events")
            )

        # 1) session windows (complete mode; watermark sized far past the
        #    table's 30-day out-of-orderness so no session drops as late)
        sess = run_stream(sessionize(stream(), watermark="90 days"), f"ss_sess_{tag}", "complete")
        srow = sess.agg(
            F.count(F.lit(1)).alias("a"),
            F.sum("n_events").alias("b"),
            F.sum("total_value").alias("c"),
        ).collect()[0]
        rows += [
            ("sessions", str(srow["a"])),
            ("session_events", str(srow["b"])),
            ("session_value", str(srow["c"])),
        ]

        # 2) stream-static enrichment (append; the dimension broadcasts —
        #    the stream side never shuffles, see test_dimension_broadcasts)
        dim = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        enr = run_stream(
            enrich_with_dimension(stream(), dim, on="user_id"), f"ss_enr_{tag}", "append"
        )
        erow = enr.agg(
            F.count(F.lit(1)).alias("a"),
            F.count("c_mktsegment").alias("b"),
            F.countDistinct("c_mktsegment").alias("c"),
            F.sum(
                F.when(F.col("c_mktsegment").isNotNull(), F.col("value").cast("decimal(18,2)"))
            ).alias("d"),
        ).collect()[0]
        rows += [
            ("enriched_rows", str(erow["a"])),
            ("enriched_matched", str(erow["b"])),
            ("enriched_segments", str(erow["c"])),
            ("enriched_value", str(erow["d"])),
        ]

        # 3) custom stateful counter (applyInPandasWithState, update mode)
        #    over a mutation stream derived from events; the last emission
        #    per key in the update-mode sink is its final running count
        muts = stream().select(
            F.when(F.col("event_type").isin("click", "signup"), F.lit("add_node"))
            .when(F.col("event_type") == "purchase", F.lit("del_node"))
            .when(F.col("event_type") == "view", F.lit("add_edge"))
            .otherwise(F.lit("del_edge"))
            .alias("op"),
            F.col("event_type").alias("label"),
        )
        emitted = run_stream(running_label_counts(muts), f"ss_cnt_{tag}", "update").toPandas()
        final = emitted.groupby(["kind", "label"]).last()["n"]
        rows += [
            ("counter_keys", str(int(final.size))),
            ("counter_net", str(int(final.sum()))),
            ("counter_max", str(int(final.max()))),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        for n in sink_names:
            spark.catalog.dropTempView(n)

    return spark.createDataFrame(
        [{"metric": m, "value": v} for m, v in rows], "metric string, value string"
    )


def q_interval_join(spark, sf_dir):
    """Interval join: each click × views of the same user within the prior
    30 minutes — equi join on user with time-range condition (batch form of
    the watermarked stream-stream join; stream==batch pinned in tests)."""
    from hgraphstorage_spark.streaming import load_events
    from hgraphstorage_spark.streaming.joins import interval_join

    ev = load_events(spark, sf_dir)
    clicks = ev.filter("event_type = 'click'").select("event_id", "ts", "user_id")
    views = ev.filter("event_type = 'view'").select("event_id", "ts", "user_id", "value")
    return interval_join(clicks, views, lookback="30 minutes").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("event_id_r").alias("view_event_id"),
        F.col("value_r").cast("decimal(18,2)").cast("string").alias("view_value"),
    )


def q_events_percentiles(spark, sf_dir):
    """Exact grouped percentiles (p50/p95) per event type — same linear
    interpolation as ANSI percentile_cont, so the oracle matches exactly."""
    from hgraphstorage_spark.functions.stats import grouped_percentiles

    return _canon(
        grouped_percentiles(_t(spark, sf_dir, "events"), "event_type", "value"),
        "mean", "p50", "p95",
    )


def q_bm25_search(spark, sf_dir):
    """BM25 top-10 for a 3-term query over documents; histogram shuffle +
    broadcast term stats + partial top-k."""
    from hgraphstorage_spark.pipeline.search import bm25_search

    return bm25_search(_t(spark, sf_dir, "documents"), "spark join window", k=10).select(
        "doc_id", F.col("score").cast("string").alias("score"), "rank"
    )


def q_search_eval(spark, sf_dir):
    """IR evaluation metrics (precision / recall / MRR / nDCG @ 1, 5, 10)
    of the BM25 top-20 for 'spark join window' against graded qrels
    (rel = how many of the three query terms the document contains as
    whitespace tokens) — the retrieval-quality pre-flight. DCG terms sum
    as DECIMAL(28,12) so both engines add in any order."""
    from hgraphstorage_spark.pipeline.search import bm25_search, search_eval
    from hgraphstorage_spark.pipeline.text import WS_RE

    docs = _t(spark, sf_dir, "documents")
    ranking = bm25_search(docs, "spark join window", k=20).select(
        F.lit(1).alias("query_id"), "doc_id", "rank"
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), WS_RE)
    rel = sum(
        F.array_contains(toks, t).cast("int") for t in ("join", "spark", "window")
    ).cast("double")
    qrels = docs.select(
        F.lit(1).alias("query_id"), "doc_id", rel.alias("rel")
    ).filter(F.col("rel") > 0)
    out = search_eval(ranking, qrels, ks=(1, 5, 10))
    return _canon(out, "precision", "recall", "mrr", "ndcg")


def q_topic_clusters(spark, sf_dir):
    """Document topic clustering: hashed TF-IDF vectors (64 md5 buckets,
    integer-quantized weights — centroid means are exact integer sums,
    order-independent under any partitioning) through two cosine Lloyd
    rounds; the oracle replays the vectorization and both rounds."""
    from hgraphstorage_spark.pipeline.similarity import topic_clusters

    return topic_clusters(_t(spark, sf_dir, "documents"), hash_mode="md5")


def q_topic_terms(spark, sf_dir):
    """Per-topic top-10 tokens with counts — the human-readable face of
    the clustering; topic-partitioned rank, ties alphabetical."""
    from hgraphstorage_spark.pipeline.similarity import topic_clusters, topic_top_terms

    docs = _t(spark, sf_dir, "documents")
    return topic_top_terms(docs, topic_clusters(docs, hash_mode="md5"), top_k=10)


def q_gap_sessions(spark, sf_dir):
    """Gap-based sessionization of the event stream (24 h gap): per-session
    start / end / count / total value. One user-keyed window; the session
    aggregate reuses the window's hash partitioning (no second exchange)."""
    from hgraphstorage_spark.functions.timeseries import sessionize
    from hgraphstorage_spark.streaming import load_events

    out = sessionize(load_events(spark, sf_dir), gap_seconds=86400)
    return _canon(
        _canon_ts(out, "session_start", "session_end"), "total_value"
    )


def q_fuzzy_decontaminate(spark, sf_dir):
    """MinHash near-duplicate decontamination: the corpus (doc_id % 50 != 0)
    probes the eval slice (doc_id % 50 == 0) through the asymmetric banded
    LSH join; md5 hash mode so the oracle replays every layer. Every corpus
    doc comes back with its flag (audit contract)."""
    from hgraphstorage_spark.pipeline.contamination import fuzzy_decontaminate

    docs = _t(spark, sf_dir, "documents")
    out = fuzzy_decontaminate(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        threshold=0.5,
        hash_mode="md5",
    )
    return _canon(out, "max_jaccard")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: 5-gram overlap of corpus docs against an
    eval slice (doc_id % 50 == 0); benchmark shingle set is broadcast."""
    from hgraphstorage_spark.pipeline.contamination import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(corpus, bench, n=5)


def q_cluster_split(spark, sf_dir):
    """Leakage-safe split: hash_split keyed on the near-dup CLUSTER id so
    connected near-duplicates never straddle train/test. Oracle composes
    the dedup_clusters rounds with the shared hash_split CASE helper.
    The pair stage runs capped (``max_doc_freq=100``) like the other two
    cluster queries — bounded candidate fan-out is the certified shape."""
    from hgraphstorage_spark.pipeline import ngram_jaccard_pairs
    from hgraphstorage_spark.pipeline.sampling import cluster_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, block_col="lang", max_doc_freq=100)
    return cluster_safe_split(docs, pairs, rounds=3)


def q_corpus_report(spark, sf_dir):
    """Per-source corpus accounting (docs, tokens, chars, mean tokens) —
    the input to any token-budget mixing decision."""
    docs = _t(spark, sf_dir, "documents")
    from hgraphstorage_spark.pipeline.text import _n_tokens

    per_doc = docs.select(
        "source",
        F.length("text").alias("_chars"),
        _n_tokens(F.col("text")).alias("_toks"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").cast("long").alias("total_tokens"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.round(F.avg("_toks"), 6).cast("decimal(18,6)").cast("string").alias("mean_tokens"),
    )



def q_datasheet(spark, sf_dir):
    """Per-source dataset datasheet — the one-table summary a dataset
    card ships (Gebru et al. 2021's quantitative core): corpus
    accounting (docs/tokens/chars), the Gopher-gate pass rate, language
    spread, per-source PII incidence, and the URL-dedup duplicate rate
    (VERDICT r7 task 2's two missing dataset-card columns), composed
    from the already-certified machinery (corpus_report token
    accounting, the shared quality-rule expressions, pii_scrub's full
    eight-kind pass with live checksum gates, url_normalized).

    ``pii_hits`` counts REDACTION EVENTS — placeholder occurrences in
    the scrubbed text — over the same arithmetic-injected demo column
    the pii_scrub row certifies (the raw synthetic corpus contains no
    PII — an all-zero column would certify nothing). Events, not
    summed per-kind audit counts: the kinds overlap on the original
    text (an E.164 number is nominated by both phone rules), so the
    per-pattern sums over-counted single items for the incidence
    metric (r8 advice fix; the per-kind counts remain the pii_scrub
    row's audit surface). Token/char/quality accounting stays on the
    RAW text. ``url_dup_rate`` is the fraction of rows whose
    normalized synthetic URL duplicates an earlier one within the
    source (1 - distinct/total — the keeper fraction's complement).

    Round 10 (v3 — VERDICT r8 task 6): three more card columns, each
    composed from already-certified machinery on its own demo/derived
    column: ``phrase_flag_rate`` — the fraction of docs the multi-word
    blocklist gate flags, over the SAME %5-cycled suffix column the
    phrase_filter row certifies (the raw corpus contains no blocklisted
    phrases; all-zero certifies nothing); ``mean_fk_grade`` — mean
    Flesch-Kincaid grade over the punctuated-corpus convention the
    readability row certifies (per-doc DECIMAL(18,4) grades summed
    EXACTLY, then one double divide — order-independent, so the hash
    holds); ``md_keep_rate`` — structured-extraction coverage, kept
    blocks / total blocks over the skeleton-wrapped corpus the
    structured_md row certifies.

    Scale shape: the PII scrub, URL normalization, phrase gate, and
    token/char metrics are all zero-shuffle projections; readability
    and structured extraction are zero-shuffle too; quality_filter's
    token histogram is the one extra aggregation, joined back on
    doc_id; the final agg is source-keyed with map-side partials."""
    from hgraphstorage_spark.pipeline import flagged_phrases, quality_filter
    from hgraphstorage_spark.pipeline.dedup import url_normalized
    from hgraphstorage_spark.pipeline.extraction import extract_structured
    from hgraphstorage_spark.pipeline.pii import PII_PLACEHOLDER_RE, pii_scrub
    from hgraphstorage_spark.pipeline.state import track
    from hgraphstorage_spark.pipeline.text import _n_tokens, readability_scores

    # five certified-machinery branches each consume the text column;
    # without a persist each one re-reads the parquet (6 source scans
    # measured) — track() materializes the base once, branches read
    # cache (released via the r3 registry / bench _release_state)
    docs = track(_t(spark, sf_dir, "documents"))
    # HISTOGRAM quality_filter kept on purpose (r12 interleaved A/B under
    # clean-GC conditions, min-of-4 each: histogram 7.24 s, narrow
    # persisted 7.74, narrow unpersisted 8.92 for the whole datasheet) —
    # inside this composition the docs base is already cached, so the
    # histogram's one (doc, token) shuffle is cheaper than re-running the
    # narrow variant's fused per-row metric expressions over cached text;
    # outputs are identical either way (the registry aliases the oracles)
    passes = quality_filter(docs).select("doc_id", "passes")
    i = F.col("doc_id")
    ph_suffix = (
        F.when(i % 5 == 0, F.lit(" free money now"))
        .when(i % 5 == 1, F.lit(" money free now"))
        .when(i % 5 == 2, F.lit(" 禁止词汇"))
        .when(i % 5 == 3, F.lit(" Free-Money!"))
        .otherwise(F.lit(""))
    )
    phrases = flagged_phrases(
        docs.select("doc_id", F.concat(F.col("text"), ph_suffix).alias("text")),
        ["free money", "禁止词汇"],
    ).select("doc_id", (~F.col("passes")).cast("int").alias("_phr"))
    read = readability_scores(
        docs.select(
            "doc_id", F.regexp_replace("text", " a ", ". ").alias("text")
        )
    ).select("doc_id", F.col("fk_grade").alias("_fk"))
    structured = extract_structured(
        docs.select(
            "doc_id",
            F.concat(
                F.lit(_SB_PRE), F.coalesce(F.col("text"), F.lit("")), F.lit(_SB_POST)
            ).alias("html"),
        ),
        stopwords=_MC_STOPS,
    ).select("doc_id", "n_blocks", "n_kept_blocks")
    enriched = _with_synthetic_urls(docs).withColumn(
        "_pii_text", F.concat(F.col("text"), _pii_injection())
    )
    scrub = pii_scrub(enriched, text_col="_pii_text")
    pii_hits = F.regexp_count(F.col("text_clean"), F.lit(PII_PLACEHOLDER_RE))
    per = (
        scrub.join(passes, "doc_id")
        .join(phrases, "doc_id")
        .join(read, "doc_id", "left")
        .join(structured, "doc_id")
        .select(
            "source",
            "lang",
            F.length("text").alias("_chars"),
            _n_tokens(F.col("text")).alias("_toks"),
            F.col("passes").cast("int").alias("_p"),
            pii_hits.alias("_pii"),
            url_normalized(F.col("url")).alias("_un"),
            "_phr",
            "_fk",
            "n_blocks",
            "n_kept_blocks",
        )
    )
    out = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_toks").cast("long").alias("total_tokens"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.round(F.avg("_p"), 6).cast("decimal(18,6)").alias("quality_pass_rate"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("_pii").cast("long").alias("pii_hits"),
        F.round(
            F.lit(1.0) - F.countDistinct("_un") / F.count(F.lit(1)), 6
        ).cast("decimal(18,6)").alias("url_dup_rate"),
        F.round(F.avg("_phr"), 6).cast("decimal(18,6)").alias("phrase_flag_rate"),
        # exact DECIMAL sum, ONE double divide: order-independent mean
        F.round(
            F.sum("_fk").cast("double") / F.count("_fk"), 6
        ).cast("decimal(18,6)").alias("mean_fk_grade"),
        F.round(
            F.sum("n_kept_blocks").cast("double") / F.sum("n_blocks"), 6
        ).cast("decimal(18,6)").alias("md_keep_rate"),
    )
    return _canon(
        out,
        "quality_pass_rate",
        "url_dup_rate",
        "phrase_flag_rate",
        "mean_fk_grade",
        "md_keep_rate",
    )


def q_betweenness(spark, sf_dir):
    """Brandes betweenness from the 5 region landmarks over the
    located-in forest. Trees make the dependency closed-form — every
    shortest path from a region to a customer/supplier passes through
    exactly its nation — so the oracle is the exact per-nation
    descendant count, while the Spark side runs the real layered
    forward-sigma/backward-delta frames."""
    from hgraphstorage_spark.analytics import betweenness

    snap = _graph(spark, sf_dir)
    landmarks = [NODE["Region"] + r for r in range(5)]
    return _canon(
        betweenness(
            snap,
            landmarks,
            labels=("custLocatedIn", "suppLocatedIn", "nationLocatedIn"),
        ),
        "betweenness",
    )


def q_incremental_near_dup(spark, sf_dir):
    """Refresh-crawl dedup: odd doc_ids (the new batch) probe even
    doc_ids (the seen corpus) through the asymmetric banded LSH join;
    md5 hash mode so the oracle replays every layer."""
    from hgraphstorage_spark.pipeline.dedup import incremental_near_dup

    docs = _t(spark, sf_dir, "documents")
    return _canon(
        incremental_near_dup(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
            threshold=0.6,
            hash_mode="md5",
        ),
        "jaccard",
    )


def q_weighted_sp(spark, sf_dir):
    """Weighted shortest paths from every region over the located-in
    tree (deterministic edge weights (id % 7) + 1), 3 Bellman-Ford
    rounds — cost layers are exact integer sums in the oracle."""
    from hgraphstorage_spark.analytics import weighted_shortest_paths

    snap = _graph(spark, sf_dir)
    landmarks = [NODE["Region"] + r for r in range(5)]
    return weighted_shortest_paths(
        snap,
        landmarks,
        weight_col=(F.col("id") % 7) + 1,
        rounds=3,
        labels=("custLocatedIn", "suppLocatedIn", "nationLocatedIn"),
    )


def q_embedding_outliers(spark, sf_dir):
    """Centroid-cosine outlier gate over embeddings (bottom 5% of the
    round-canonicalized mean-vector cosine; exact percentile)."""
    from hgraphstorage_spark.pipeline.similarity import embedding_outliers

    return _canon(embedding_outliers(_t(spark, sf_dir, "embeddings")), "score")


def q_percentile_band(spark, sf_dir):
    """Winsorizing length gate: keep docs inside the [5%, 95%] n_chars
    percentile band (exact percentile_cont semantics both engines)."""
    from hgraphstorage_spark.functions.stats import percentile_band_filter

    out = percentile_band_filter(_t(spark, sf_dir, "documents"), "n_chars", 0.05, 0.95)
    return out.select("doc_id", "n_chars", "p_lo", "p_hi")


def q_hybrid_search(spark, sf_dir):
    """Hybrid lexical+semantic retrieval: RRF fusion of the BM25 top-50
    and the cosine top-50 (rrf_k=60). Both pools are partial top-k
    reductions; the fusion joins two <= 50-row frames."""
    from hgraphstorage_spark.pipeline.search import hybrid_search

    out = hybrid_search(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        "spark join window",
        query_vec_id=0,
        k=10,
    )
    return _canon(out, "rrf")


def q_source_calibrated(spark, sf_dir):
    """Per-source quantile calibration of n_chars (percent_rank within
    source) — the cross-crawl score-fairness transform."""
    from hgraphstorage_spark.pipeline.sampling import per_source_percent_rank

    return _canon(per_source_percent_rank(_t(spark, sf_dir, "documents"), "n_chars"), "pct_rank")


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation over the lineitem numeric columns in
    one partial-agg pass; exact-decimal co-moment sums make the
    closed-form corr a pure function of the data."""
    from hgraphstorage_spark.functions.stats import correlation_matrix

    return _canon(
        correlation_matrix(
            _t(spark, sf_dir, "lineitem"),
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        ),
        "corr",
    )


def q_numeric_histogram(spark, sf_dir):
    """Equi-width 12-bin histogram of events.value — 1-row bounds
    aggregate broadcast back, bin-keyed count; pure-double bin edges
    replay identically in SQL."""
    from hgraphstorage_spark.functions.stats import numeric_histogram

    return numeric_histogram(_t(spark, sf_dir, "events"), "value", n_bins=12)


def q_table_profile(spark, sf_dir):
    """ANALYZE-style profile of orders (nulls, exact distinct, min/max
    per column, long format) — one wide partial-aggregated pass."""
    from hgraphstorage_spark.functions.stats import table_profile

    return table_profile(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


def q_fk_check(spark, sf_dir):
    """Referential integrity: lineitem orderkeys without an order plus a
    seeded violation so the check provably fires (one left_anti join)."""
    from hgraphstorage_spark.functions.stats import fk_violations

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    bad = li.unionAll(
        li.sparkSession.createDataFrame([(10**9,)], "l_orderkey long")
    )
    return fk_violations(bad, _t(spark, sf_dir, "orders"), "l_orderkey", "o_orderkey")


def q_skew_report(spark, sf_dir):
    """Key-distribution diagnostic: top-5 heaviest sources with global
    fraction — the pre-join skew audit as a first-class operator."""
    from hgraphstorage_spark.operators import skew_report

    out = skew_report(_t(spark, sf_dir, "documents"), ["source"], k=5)
    return _canon(out.withColumn("rank", F.col("rank").cast("long")), "frac")


def q_cross_source_overlap(spark, sf_dir):
    """Per-source-pair duplicated-content matrix (shared distinct 5-grams
    + Jaccard) — the governance read before setting mixing weights."""
    from hgraphstorage_spark.pipeline.dedup import cross_source_overlap

    return _canon(cross_source_overlap(_t(spark, sf_dir, "documents"), n=5), "jaccard")


def q_bloom_decontaminate(spark, sf_dir):
    """Fixed-memory Bloom-filter decontamination (same eval slice as
    q_decontaminate): md5-derived bit positions, so DuckDB replays the
    filter bit-for-bit — false positives and all."""
    from hgraphstorage_spark.pipeline.contamination import bloom_decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return bloom_decontaminate(corpus, bench, n=5, m_bits=1 << 20, k_hashes=4)


def q_hash_split(spark, sf_dir):
    """Deterministic md5-bucket train/val/test split (80/10/10) — stable
    across runs, partitionings, and engines."""
    from hgraphstorage_spark.pipeline.sampling import hash_split

    return hash_split(_t(spark, sf_dir, "documents"))


def q_stratified_sample(spark, sf_dir):
    """Per-language deterministic downsampling (keep 50% en, 100% zh,
    25% de, 75% everything else) — map-only, pushdown-friendly."""
    from hgraphstorage_spark.pipeline.sampling import stratified_hash_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_hash_sample(docs, "lang", {"en": 0.5, "zh": 1.0, "de": 0.25}, default=0.75)
    return out.select("doc_id", "lang")


def q_mix_corpus(spark, sf_dir):
    """Training-mix weighting: 2.5 epochs of src0, 0.5 of src1, drop src2,
    1 epoch of the rest — replication + fractional hash-sample."""
    from hgraphstorage_spark.pipeline.sampling import mix_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return mix_corpus(docs, {"src0": 2.5, "src1": 0.5, "src2": 0.0})


def q_per_group_cap(spark, sf_dir):
    """Per-domain cap: keep ≤10 docs per source, chosen by hash order —
    deterministic, engine-portable (unlike reservoir sampling)."""
    from hgraphstorage_spark.pipeline.sampling import per_group_cap

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return per_group_cap(docs, "source", 10)


def q_rolling_features(spark, sf_dir):
    """Trailing-1h per-user event features at every event (RANGE window
    over epoch-microseconds — exact boundary parity across engines)."""
    from hgraphstorage_spark.functions.timeseries import rolling_event_features
    from hgraphstorage_spark.streaming import load_events

    out = rolling_event_features(load_events(spark, sf_dir), window_seconds=3600)
    return _canon_ts(_canon(out, "sum_win", "mean_win"), "ts")


def q_boilerplate_dedup(spark, sf_dir):
    """Corpus-level boilerplate removal (RefinedWeb line rule, chunk mode
    for the newline-free corpus): every 10-word chunk occurring >= 3
    times corpus-wide vanishes from ALL documents. Oracle replays by
    chunk string (hash-keyed counting is output-equivalent)."""
    from hgraphstorage_spark.pipeline.text import boilerplate_dedup

    out = boilerplate_dedup(_t(spark, sf_dir, "documents"), unit="chunk", min_count=3)
    return out.select(
        "doc_id", "n_units", "n_kept", F.md5("text_dedup").alias("dedup_fp")
    )


def q_boilerplate_paragraph(spark, sf_dir):
    """Paragraph-mode corpus boilerplate removal (RefinedWeb rule at the
    blank-line-run granularity): every document wrapped with the SAME
    cookie-banner head paragraph and copyright tail paragraph (separated
    by a ragged blank run — '\\n \\n' — so the run-consuming splitter is
    exercised); both chrome paragraphs cross min_count and must vanish
    from ALL documents while each unique body survives. Oracle replays
    the split, the corpus count, and the reassembly by paragraph
    string."""
    from hgraphstorage_spark.pipeline.text import boilerplate_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("We use cookies to improve your experience\n\n"),
            F.col("text"),
            F.lit("\n \nCopyright 2024 Example Corp - all rights reserved"),
        ).alias("text"),
    )
    out = boilerplate_dedup(docs, unit="paragraph", min_count=3)
    return out.select(
        "doc_id", "n_units", "n_kept", F.md5("text_dedup").alias("dedup_fp")
    )


def q_topic_split(spark, sf_dir):
    """Topic-model train/apply split (similarity.py:topic_model +
    topic_assign): the persistable (idf table, centroids) model trained
    with two Lloyd rounds, then the corpus routed against the FIXED
    model. The re-assignment against the trained centroids is exactly
    one more Lloyd half-step, so split(iterations=2) ==
    fused topic_clusters(iterations=3) — the oracle is the stream_topics
    third-round CTE chain (same SQL), making the equivalence a
    driver-hash fact rather than a pytest-only one."""
    from hgraphstorage_spark.pipeline.similarity import topic_assign, topic_model

    docs = _t(spark, sf_dir, "documents")
    idf, cents = topic_model(docs, n_topics=8, iterations=2, hash_mode="md5")
    return topic_assign(docs, idf, cents, hash_mode="md5")


def q_extract_links(spark, sf_dir):
    """Anchor-capture link extraction (sources/warc.py:extract_links
    with_anchor=True) — the RAW per-link frame under the driver hash:
    href passthrough for absolute links, RFC 3986-lite root-relative
    resolution against the UNSTRIPPED origin, and the tag-stripped
    anchor text, over the same anchored synthetic HTML as anchor_text.
    Oracle derives every row from the generator arithmetic (independent
    derivation, not regex replay)."""
    from hgraphstorage_spark.sources.warc import extract_links

    pages = _anchored_pages(spark, sf_dir)
    return extract_links(pages, with_anchor=True).select(
        "doc_id", "url", "href", "link_url", "anchor"
    )


def q_containment_pairs(spark, sf_dir):
    """Asymmetric shingle containment pairs (Broder resemblance/
    containment): |A∩B|/|A| per direction + jaccard, blocked by lang."""
    from hgraphstorage_spark.pipeline.dedup import containment_pairs

    return _canon(
        containment_pairs(
            _t(spark, sf_dir, "documents"), n=3, threshold=0.5, block_col="lang"
        ),
        "containment_a",
        "containment_b",
        "jaccard",
    )


def q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis-Spirakis weighted sample: top-50 docs by
    u^(1/n_chars) over md5-uniform draws — plans as
    TakeOrderedAndProject (partial top-k, no global sort)."""
    from hgraphstorage_spark.pipeline.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", 50).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR (Xie et al. 2023) importance weights: every document scored
    by log p_target/p_raw over hashed word uni+bigram features, target =
    the src0 sub-corpus — the pretraining data-selection signal.
    Bucket hashes are the md5 family; per-bucket log-ratios round to 6
    decimals before an exact DECIMAL per-doc sum, so DuckDB replays the
    weights bit-for-bit."""
    from hgraphstorage_spark.pipeline.sampling import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    return _canon(dsir_weights(docs, target, n_buckets=512, hash_mode="md5"), "log_weight")


def q_dsir_sample(spark, sf_dir):
    """DSIR selection: Gumbel-top-50 resampling without replacement over
    the importance weights (sampling ∝ exp(log_weight) via the
    Gumbel-max trick, noise derived from md5(id) — fully deterministic,
    plans as TakeOrderedAndProject)."""
    from hgraphstorage_spark.pipeline.sampling import dsir_sample

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    return _canon(
        dsir_sample(docs, target, k=50, n_buckets=512, hash_mode="md5"),
        "log_weight",
        "gumbel_key",
    )


def q_dsir_stream(spark, sf_dir):
    """Streaming DSIR scoring ACTUALLY RUN as a structured stream: the
    (bucket, log_ratio) model trains offline (``dsir_ratio_table``,
    md5 mode), then the documents table streams through
    ``dsir_stream_score`` as multi-file micro-batches → parquet sink.
    Per-doc scores are a pure function of (text, model), so stream
    output equals batch scoring exactly — the oracle replays the batch
    math and any state/batching defect surfaces as a hash mismatch."""
    import shutil
    import tempfile

    from hgraphstorage_spark.pipeline.sampling import dsir_ratio_table
    from hgraphstorage_spark.streaming import dsir_stream_score

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    ratios = dsir_ratio_table(docs, target, n_buckets=512, hash_mode="md5").cache()
    ratios.count()
    tmp = tempfile.mkdtemp(prefix="hgs_dsir_stream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(f"{tmp}/docs")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/docs")
        )
        q = dsir_stream_score(
            stream, ratios, f"{tmp}/ckpt", f"{tmp}/scores", n_buckets=512, hash_mode="md5"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.read.parquet(f"{tmp}/scores").select("doc_id", "n_grams", "log_weight")
        result = _canon(out, "log_weight")
        # localized so the temp sink can be removed before returning; the
        # frame is per-doc scores at the driver-check SF (bounded) — a
        # production run consumes the parquet sink directly instead
        result = spark.createDataFrame(result.collect(), result.schema)
    finally:
        ratios.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def q_stream_topics(spark, sf_dir):
    """Streaming topic routing ACTUALLY RUN as a structured stream: the
    (idf, centroids) model trains offline (``topic_model``, md5 mode),
    then the documents table streams through ``stream_topic_score`` as
    multi-file micro-batches → parquet sink. A topic is a pure function
    of (text, model), so stream output equals batch assignment exactly —
    the oracle extends the topic chain by the final centroid update and
    a third assignment round."""
    import shutil
    import tempfile

    from hgraphstorage_spark.pipeline.similarity import topic_model
    from hgraphstorage_spark.streaming import stream_topic_score

    docs = _t(spark, sf_dir, "documents")
    idf, cents = topic_model(docs, n_topics=8, hash_mode="md5")
    idf, cents = idf.cache(), cents.cache()
    idf.count(), cents.count()
    tmp = tempfile.mkdtemp(prefix="hgs_topic_stream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(f"{tmp}/docs")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/docs")
        )
        q = stream_topic_score(
            stream, idf, cents, f"{tmp}/ckpt", f"{tmp}/topics", hash_mode="md5"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.read.parquet(f"{tmp}/topics").select("doc_id", "topic")
        # localized so the temp sink can be removed before returning (the
        # dsir_stream convention); bounded at the driver-check SF
        result = spark.createDataFrame(out.collect(), out.schema)
    finally:
        idf.unpersist()
        cents.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training step: the top-20 BPE merge candidates
    (Sennrich 2016) — corpus-frequency-weighted adjacent symbol-pair
    counts over the char+</w> vocabulary. The corpus is scanned once
    (word histogram); pair statistics run on the vocabulary only."""
    from hgraphstorage_spark.pipeline.text import bpe_merge_counts

    return bpe_merge_counts(_t(spark, sf_dir, "documents"), top_k=20)


# fixed merge table for the fertility report: spells two of the
# corpus's highest-frequency words ('table', 'scan') plus a common
# suffix fusion, so the report exercises multi-char merges, an
# end-of-word fusion, and untouched vocabulary in one pass. A literal
# list on BOTH engines — the oracle unrolls each rule as one
# delimited-string rewrite (greedy left-to-right non-overlapping, the
# same semantics as bpe_apply's array fold).
_FERT_MERGES = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"), ("table", "</w>"),
    ("s", "c"), ("sc", "a"), ("sca", "n"), ("scan", "</w>"),
    ("e", "</w>"),
]


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-evaluation report (pipeline/text.py:tokenizer_fertility):
    per language, BPE fertility (tokens per word) and chars per token
    under the fixed ``_FERT_MERGES`` rule list — the multilingual-
    tokenizer budget check. Oracle replays bpe_apply's greedy
    left-to-right merge fold per rule as a double-space-delimited string
    rewrite over the word vocabulary (equivalent by the non-overlapping
    single-pass argument; equality property-tested in pytest), then the
    same per-doc and per-lang sums."""
    from hgraphstorage_spark.pipeline.text import tokenizer_fertility

    out = tokenizer_fertility(_t(spark, sf_dir, "documents"), _FERT_MERGES)
    return _canon(out, "fertility", "chars_per_token")


def _fertility_oracle_sql() -> str:
    """DuckDB replay of ``q_tokenizer_fertility``. Each merge (a, b)
    rewrites the double-space-delimited symbol string: the pattern
    ' a  b ' consumes one space of each boundary pair and the
    replacement ' ab ' restores them, so the double-space invariant
    holds across rules and non-overlapping left-to-right replacement
    matches the Spark fold exactly."""
    s_expr = "'  ' || array_to_string(list_concat(list_transform(" \
             "generate_series(1, len(w)), i -> w[i:i]), ['</w>']), '  ') || '  '"
    for a, b in _FERT_MERGES:
        s_expr = f"replace({s_expr}, ' {a}  {b} ', ' {a}{b} ')"
    return rf"""
        WITH words AS (
          SELECT doc_id, w, count(*) AS n FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS w
            FROM documents
          ) WHERE len(w) > 0 GROUP BY doc_id, w
        ),
        vocab AS (
          SELECT w, len(string_split_regex(trim({s_expr}), '  ')) AS wt
          FROM (SELECT DISTINCT w FROM words)
        ),
        per_doc AS (
          SELECT doc_id, sum(n)::BIGINT AS n_words, sum(n * wt)::BIGINT AS n_tokens
          FROM words JOIN vocab USING (w) GROUP BY doc_id
        )
        SELECT d.lang,
               count(*)::BIGINT AS n_docs,
               sum(p.n_words)::BIGINT AS n_words,
               sum(p.n_tokens)::BIGINT AS n_tokens,
               round(sum(p.n_tokens)::DOUBLE / sum(p.n_words)::DOUBLE, 6)
                 ::DECIMAL(18,6)::VARCHAR AS fertility,
               round(sum(length(d.text))::DOUBLE / sum(p.n_tokens)::DOUBLE, 6)
                 ::DECIMAL(18,6)::VARCHAR AS chars_per_token
        FROM per_doc p JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """


def q_lsh_recall_report(spark, sf_dir):
    """LSH parameter validation: measured banded-LSH recall vs exact
    ground truth on a deterministic half-sample, beside the theoretical
    S-curve value — the pre-flight check a 100 TB dedup runs. md5 hash
    mode so the oracle replays BOTH pair pipelines."""
    from hgraphstorage_spark.pipeline.dedup import lsh_recall_report

    return _canon(
        lsh_recall_report(
            _t(spark, sf_dir, "documents"),
            threshold=0.6,
            sample_fraction=0.5,
            hash_mode="md5",
        ),
        "recall",
        "theoretical_recall",
    )


def q_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k (Jégou 2011): 8 subspaces x 16
    deterministic sampled codewords, exact-decimal ADC ranking — the 32x
    scan-byte cut beyond SQ8's 4x. Fully oracle-replayed (md5-sampled
    anchors, fixed-order IEEE folds, decimal sums)."""
    from hgraphstorage_spark.pipeline.similarity import pq_topk

    return _canon(pq_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10), "adc_dist")


def q_script_stats(spark, sf_dir):
    """Unicode-script histogram (the pre-lang-id routing signal): per-doc
    Latin/Cyrillic/Han/Arabic/digit/space fractions, zero-shuffle narrow
    projection; oracle replays via RE2 script classes."""
    from hgraphstorage_spark.pipeline.text import script_stats

    return _canon(
        script_stats(_t(spark, sf_dir, "documents")),
        "latin_frac",
        "cyrillic_frac",
        "han_frac",
        "arabic_frac",
        "digit_frac",
        "space_frac",
    )


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training shuffle order: rank under
    md5(id||':epoch:'||e) — reproducible permutation, fresh per epoch."""
    from hgraphstorage_spark.pipeline.sampling import epoch_shuffle

    return epoch_shuffle(_t(spark, sf_dir, "documents"), epoch=2).select(
        "doc_id", "shuffle_rank"
    )


def q_length_batches(spark, sf_dir):
    """Length-bucketed batch assignment (padding-minimizing batching):
    docs ordered by (n_chars desc, id), cut into 32-doc batches, with
    per-row padding cost vs the batch max."""
    from hgraphstorage_spark.pipeline.sampling import length_bucketed_batches

    return length_bucketed_batches(_t(spark, sf_dir, "documents"), batch_size=32)


def q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composite ANN (Jégou 2011, the FAISS billion-scale
    default): coarse list routing + residual PQ codes + per-probed-list
    ADC — rows cut nlist/nprobe-fold AND bytes cut 32-fold. Fully
    oracle-replayed (deterministic md5 anchors, fixed-order folds,
    decimal sums).

    r6 (VERDICT r5 task 8): the coarse quantizer is now TRAINED — one
    Lloyd round via ``ivf_train_centroids(mean_mode="decimal6")``, the
    order-independent exact-decimal recentering — so the accuracy knob
    a real deployment turns first is itself driver-certified. The
    oracle unrolls the same round (md5-anchor init → assign →
    decimal-mean recenter) before the IVF-PQ replay."""
    from hgraphstorage_spark.pipeline.similarity import ivf_train_centroids, ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_train_centroids(emb, nlist=8, iterations=1, mean_mode="decimal6")
    return _canon(
        ivfpq_topk(emb, query_id=0, k=10, centroids=cents), "adc_dist"
    )


def q_event_transitions(spark, sf_dir):
    """First-order Markov matrix of event types (counts + row-normalized
    probabilities) — the behavioral-sequence summary."""
    from hgraphstorage_spark.functions.timeseries import event_transitions
    from hgraphstorage_spark.streaming import load_events

    return _canon(event_transitions(load_events(spark, sf_dir)), "prob")


def q_ewma(spark, sf_dir):
    """Per-user EWMA of event values over the trailing 20 events
    (recursive alpha=0.3 fold; window-order collect + left fold is the
    identical IEEE sequence as DuckDB's list_reduce)."""
    from hgraphstorage_spark.functions.timeseries import ewma_features
    from hgraphstorage_spark.streaming import load_events

    out = ewma_features(load_events(spark, sf_dir), alpha=0.3, lags=20)
    return _canon_ts(_canon(out, "ewma"), "ts")


def q_funnel(spark, sf_dir):
    """view→click→purchase funnel per user: first completion time of each
    step, each within 24h of the previous step's first completion."""
    from hgraphstorage_spark.functions.timeseries import funnel
    from hgraphstorage_spark.streaming import load_events

    ev = load_events(spark, sf_dir)
    return _canon_ts(
        funnel(ev, ["view", "click", "purchase"], within_seconds=86400), "t1", "t2", "t3"
    )


def q_pivot_events(spark, sf_dir):
    """Per-user event-type count matrix via pivot (explicit value list →
    deterministic columns; missing combinations are 0)."""
    from hgraphstorage_spark.streaming import load_events

    types = ["click", "error", "purchase", "signup", "view"]
    ev = load_events(spark, sf_dir)
    wide = ev.groupBy("user_id").pivot("event_type", types).agg(F.count(F.lit(1)))
    return wide.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    )


def q_asof_join(spark, sf_dir):
    """Point-in-time join: each click gets the latest prior (or same-instant)
    view of the same user — union+window plan, one shuffle, no non-equi join."""
    from hgraphstorage_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts", "user_id", "value")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "ts", "user_id", "value")
    out = asof_join(clicks, views, on="ts", by=["user_id"], value_cols=["event_id", "value"])
    return out.select(
        "event_id",
        "user_id",
        F.col("value").cast("decimal(18,2)").cast("string").alias("click_value"),
        F.col("event_id_asof").alias("view_event_id"),
        F.col("value_asof").cast("decimal(18,2)").cast("string").alias("view_value"),
    )


def q_quality_filter_narrow(spark, sf_dir):
    """Zero-shuffle streaming-safe Gopher filter — must equal the
    histogram variant exactly (shares its oracle)."""
    from hgraphstorage_spark.pipeline.text import quality_filter_narrow

    return _canon(
        quality_filter_narrow(_t(spark, sf_dir, "documents")), "mean_tok_len", "top_term_ratio"
    )


def q_token_budget_mix(spark, sf_dir):
    """Token-budget mixture: per-source token budgets filled in
    deterministic hash order (the 'sample 50k web tokens, 20k src1
    tokens' pretraining-mixture spec); oracle = same cumsum in SQL."""
    from hgraphstorage_spark.pipeline.sampling import token_budget_mix

    docs = _t(spark, sf_dir, "documents")
    return token_budget_mix(docs, {"src0": 50_000, "src1": 20_000}, default_budget=5_000)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup: cosine k-means clusters, then
    within-cluster near-identical vectors (round-6 cosine >= 0.35) drop
    to one lowest-id representative. Oracle reproduces the same two
    k-means rounds + the within-cluster pair rule in SQL."""
    from hgraphstorage_spark.pipeline.similarity import semantic_dedup

    return semantic_dedup(_t(spark, sf_dir, "embeddings"), nlist=8, iterations=2, threshold=0.35)


def q_pipeline_report(spark, sf_dir):
    """End-to-end curation accounting: documents surviving each stage of
    a Gopher-quality -> exact-dedup -> decontamination pipeline, plus the
    final intersection — the composed form of the individual operators,
    checked as one unit so stage wiring (not just stages) is verified."""
    from hgraphstorage_spark.pipeline import exact_dedup
    from hgraphstorage_spark.pipeline.contamination import decontaminate
    from hgraphstorage_spark.pipeline.text import quality_filter_narrow

    from hgraphstorage_spark.functions.stats import percentile_band_filter
    from hgraphstorage_spark.pipeline.state import track

    # the heaviest duplicate-scan lead of the r12 sweep (17 document
    # scans): the base feeds four stage operators plus the total count,
    # and every stage frame is consumed TWICE (its own stage count and
    # the final intersection). The base persists once, and each
    # doc_id-sized stage output persists so the final join replays no
    # stage machinery.
    docs = track(_t(spark, sf_dir, "documents"))
    # narrow variant: identical metrics/pass flag (aliased oracles),
    # zero shuffle instead of the histogram shuffle + metrics join
    q = track(quality_filter_narrow(docs).select("doc_id", "passes"))
    kept = track(exact_dedup(docs).select("doc_id"))
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    clean = track(
        decontaminate(corpus, bench, n=5).filter(~F.col("contaminated")).select("doc_id")
    )
    banded = track(percentile_band_filter(docs, "n_chars", 0.05, 0.95).select("doc_id"))
    final = (
        q.filter("passes").select("doc_id")
        .join(kept, "doc_id")
        .join(clean, "doc_id")
        .join(banded, "doc_id")
    )

    def s(name, df):
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    parts = [
        s("total", docs),
        s("quality_pass", q.filter("passes")),
        s("exact_unique", kept),
        s("decontam_clean", clean),
        s("length_band", banded),
        s("final", final),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# round-6 crawl / media / streaming registry rows (VERDICT r5 tasks 3-6)


def _with_synthetic_urls(docs: DataFrame) -> DataFrame:
    """Deterministic crawl-shaped (url, fetch_date) columns derived from
    doc_id arithmetic (the ``synthetic_media`` pattern): doc pairs
    (2k, 2k+1) are re-fetches of one canonical page dressed in
    different scheme/www/tracker/trailing-slash noise, so the oracle
    can derive the EXPECTED normalized form independently — a wrong
    normalizer on either side breaks the match.

    Per doc: scheme cycles https://www. / http:// / https:// by
    doc_id%3; host+path come from the pair base k = doc_id//2; the
    query string exercises full-tracker-strip (%4==0), bare URL with
    optional trailing slash (%4==1), tracker-then-param promotion
    (%4==2), and clean param (%4==3); fetch dates never tie within a
    pair ((doc_id*13)%28 shifts by 13 between pair members)."""
    k = F.floor(F.col("doc_id") / 2).cast("long")
    ks = k.cast("string")
    scheme = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("https://www."))
        .when(F.col("doc_id") % 3 == 1, F.lit("http://"))
        .otherwise(F.lit("https://"))
    )
    base = F.concat(F.lit("site"), (k % 7).cast("string"), F.lit(".com/p"), ks)
    tail = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("?utm_source=x"))
        .when(
            F.col("doc_id") % 4 == 1,
            F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        )
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("?utm_a=1&q="), ks))
        .otherwise(F.concat(F.lit("?q="), ks))
    )
    fetch = F.concat(
        F.lit("2024-01-"),
        F.lpad(((F.col("doc_id") * 13) % 28 + 1).cast("string"), 2, "0"),
    )
    return docs.withColumn("url", F.concat(scheme, base, tail)).withColumn(
        "fetch_date", fetch
    )


_SYNTH_URL_SQL = """
        u AS (
          SELECT doc_id,
                 'site' || ((doc_id // 2) % 7) || '.com/p' || (doc_id // 2)
                 || CASE WHEN doc_id % 4 >= 2 THEN '?q=' || (doc_id // 2) ELSE '' END
                   AS url_norm,
                 '2024-01-' || lpad(((doc_id * 13) % 28 + 1)::VARCHAR, 2, '0') AS fetch_date
          FROM documents
        )"""


# The RAW synthetic URL CTE (scheme/www/tracker/trailing-slash noise
# intact) — the SQL twin of ``_with_synthetic_urls``, shared by the
# robots_filter and anchor_text oracles so the generator arithmetic
# lives in ONE place per engine (``_SYNTH_URL_SQL`` above is the
# NORMALIZED form the url_dedup/domain_stats oracles derive).
_RAW_SYNTH_URL_SQL = """ru AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 3 = 0 THEN 'https://www.'
                       WHEN doc_id % 3 = 1 THEN 'http://'
                       ELSE 'https://' END)
                 || 'site' || ((doc_id // 2) % 7) || '.com/p' || (doc_id // 2)
                 || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x'
                          WHEN doc_id % 4 = 1 THEN (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
                          WHEN doc_id % 4 = 2 THEN '?utm_a=1&q=' || (doc_id // 2)
                          ELSE '?q=' || (doc_id // 2) END) AS url
          FROM documents
        )"""


_ROBOTS_FIXTURE = [
    # exact trainbot group beats the blanket * disallow; wildcard + anchor;
    # per-group Crawl-delay (the exact group's 2 must beat *'s 10) and a
    # document-wide Sitemap line (robots_extras surface — parse_robots
    # ignores these keys, so the rule rows are unchanged)
    ("site0.com", "User-agent: trainbot\nDisallow: /p1*\nAllow: /p14$\nCrawl-delay: 2\n\nUser-agent: *\nDisallow: /\nCrawl-delay: 10\n\nSitemap: https://site0.com/sm.xml\n"),
    # malformed Crawl-delay (NULL) + two Sitemap lines in source order
    ("site1.com", "User-agent: *\nDisallow: /p1\nCrawl-delay: abc\nSitemap: https://site1.com/a.xml\nSitemap: https://site1.com/b.xml\n"),
    # empty Disallow = allow-all idiom (rule drops)
    ("site2.com", "User-agent: *\nDisallow:\n"),
    # site3.com has no robots.txt at all
    # two agents heading ONE group; fractional Crawl-delay
    ("site4.com", "User-agent: *\nUser-agent: trainbot\nDisallow: /p2\nCrawl-delay: 1.5\n"),
    # mid-path wildcard + end anchor
    ("site5.com", "User-agent: *\nDisallow: /p*3$\n"),
    # a group for a different agent only — nothing applies to trainbot
    ("site6.com", "User-agent: evilbot\nDisallow: /\n"),
]


def q_robots_extras(spark, sf_dir):
    """Non-rule robots.txt directives (sources/warc.py:robots_extras):
    per-group Crawl-delay under the SAME RFC 9309 group selection as
    parse_robots (exact trainbot group's 2 beats *'s 10; malformed
    values NULL; group-less domains NULL) and document-wide Sitemap
    lines in source order. Oracle = the hand-derived expected rows for
    the shared fixture (independent derivation). The EXTERNAL
    conformance robots.txt (r12: fixtures/external/robots.txt,
    hand-assembled from the published RFC 9309 / Google conventions —
    UTF-8 BOM, CRLF, mixed-case keys, inline comments, unknown Host:
    directive, Sitemap lines split across groups) is unioned in as the
    www.example.org row, so parsing the published oddities is LIVE in
    the driver hash; its oracle row is a literal certified by
    tests/test_external_conformance.py."""
    from hgraphstorage_spark.sources.warc import robots_extras

    ext_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "external", "robots.txt",
    )
    with open(ext_path, "rb") as f:
        ext_txt = f.read().decode("utf-8")
    robots = spark.createDataFrame(
        _ROBOTS_FIXTURE + [("www.example.org", ext_txt)],
        "domain string, robots_txt string",
    )
    out = robots_extras(robots, agent="trainbot")
    return out.select(
        "domain",
        "crawl_delay",
        F.array_join("sitemap_urls", "|").alias("sitemaps"),
    )


def q_robots_filter(spark, sf_dir):
    """RFC 9309 robots.txt gate over the synthetic crawl URLs
    (sources/warc.py:parse_robots/robots_filter): per-domain rule groups
    (exact-agent beats *, multi-agent headers, empty-Disallow idiom,
    * wildcards and $ anchors, LIKE-metachar escaping), longest-match
    precedence with allow winning ties. The oracle replays the parse
    (same window-function group construction) and the LIKE evaluation."""
    from hgraphstorage_spark.sources.warc import parse_robots, robots_filter

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "domain string, robots_txt string")
    return robots_filter(docs, parse_robots(robots, agent="trainbot"))


def q_url_dedup(spark, sf_dir):
    """Crawl URL dedup (pipeline/dedup.py:url_dedup): normalize the
    synthetic crawl URLs (scheme/www/fragment/tracker/trailing-slash
    noise) and keep the earliest fetch per canonical form. The Spark
    side runs the REAL regex normalizer; the oracle derives the
    expected canonical form from the generator arithmetic — an
    independent-derivation oracle, not a regex replay."""
    from hgraphstorage_spark.pipeline.dedup import url_dedup

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    return url_dedup(docs, ts_col="fetch_date").select("doc_id", "url_norm", "fetch_date")


def q_domain_stats(spark, sf_dir):
    """Per-domain crawl accounting (pipeline/dedup.py:domain_stats) over
    the same synthetic URL column: docs and distinct canonical URLs per
    registrable host — the input to per-domain caps. Oracle derives
    both counts arithmetically."""
    from hgraphstorage_spark.pipeline.dedup import domain_stats

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    return domain_stats(docs)


def q_media_pairs(spark, sf_dir):
    """The media near-dup PAIR CORE (pipeline/multimodal.py:
    media_near_dup_pairs → dedup.hamming_near_dup_pairs) under the
    driver hash at the signature level: deterministic 60-bit md5_long
    fingerprints with planted bit-flips — pair (2k, 2k+1) differs by
    exactly 1+(k%5) bits, so the Manku banded blocking must find
    exactly the f<=3 pairs — plus two planted controls: an identical
    fingerprint across DIFFERENT kinds (must NOT pair: kind blocking)
    and an identical fingerprint within one kind (must pair at hamming
    0). Pixel→dHash fingerprinting stays pytest-verified
    (tests/test_pipeline.py); this row certifies the banded pair
    machinery those fingerprints flow through."""
    from hgraphstorage_spark.pipeline.dedup import hamming_near_dup_pairs, md5_long

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = F.floor(F.col("doc_id") / 2).cast("long")
    flips = (F.lit(1) + (k % 5)).cast("int")
    one = F.lit(1).cast("long")
    base_fp = md5_long(k)
    mask = F.aggregate(
        F.sequence(F.lit(0), flips - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc.bitwiseXOR(
            F.call_function(
                "shiftleft", one, ((k * 7 + i.cast("long") * 13) % 60).cast("int")
            )
        ),
    )
    fp = F.when(F.col("doc_id") % 2 == 1, base_fp.bitwiseXOR(mask)).otherwise(base_fp)
    kind = F.when(k % 2 == 0, F.lit("image")).otherwise(F.lit("audio"))
    fps = docs.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"), fp.alias("fingerprint")
    )
    plants = spark.createDataFrame(
        [
            (1000001, "image", _PLANT_FP_A),
            (1000002, "audio", _PLANT_FP_A),  # cross-kind identical: blocked
            (1000003, "image", _PLANT_FP_B),
            (1000004, "image", _PLANT_FP_B),  # same-kind identical: hamming 0
        ],
        "media_id long, kind string, fingerprint long",
    )
    pairs = hamming_near_dup_pairs(
        fps.unionAll(plants),
        fp_col="fingerprint",
        id_col="media_id",
        max_distance=3,
        bands=4,
        block_col="kind",
    )
    return pairs.withColumnRenamed("doc_a", "media_a").withColumnRenamed(
        "doc_b", "media_b"
    )


def _plant_fp(tag: str) -> int:
    """60-bit md5-derived literal planted on BOTH sides (Spark frame and
    oracle SQL) by this same function — the md5_plane_int no-drift
    pattern."""
    import hashlib

    return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)


_PLANT_FP_A = _plant_fp("cross-kind-plant")
_PLANT_FP_B = _plant_fp("same-kind-plant")


def q_warc_ingest(spark, sf_dir):
    """End-to-end WARC ingest (sources/warc.py:read_warc →
    warc_to_documents) over the committed fixture shards
    ``fixtures/crawl.warc.gz`` + ``crawl2.warc.gz`` (written by
    ``warc_bytes`` / tools/make_fixture_crawl2.py, mtime-0 gzip
    members — byte-deterministic): response records only, HTTP
    envelope stripped, wire encodings undone (crawl2's
    chunked+gzipped record and latin-1 charset record keep the r10
    decode tiers live in the hash), HTML→text through the baseline
    extractor, plain-text bodies untouched. The oracle is the expected
    row set as literals — step zero of the 100 TB crawl pipeline,
    driver-checked.
    (doc_id is omitted: it hashes the absolute shard path, which is
    machine-specific by design.)"""
    from hgraphstorage_spark.sources.warc import read_warc, warc_to_documents

    fdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    docs = warc_to_documents(read_warc(spark, fdir))
    return docs.select(
        "url", "fetch_date", "n_chars", F.md5("text").alias("text_fp")
    )


def q_stream_heavy_hitters(spark, sf_dir):
    """Misra-Gries streaming heavy hitters ACTUALLY RUN as a structured
    stream (streaming/stateful.py:stream_heavy_hitters,
    applyInPandasWithState): source/lang traffic keys stream through 4
    micro-batches into 8 md5-sharded bounded summaries. Distinct keys
    sit far under capacity=64, so the final summary is EXACT and equals
    the batch-twin group-by — which the oracle replays (shard = md5_long
    % 8). Counts only grow in this regime, so the final state per
    (shard, item) is the max across update-mode emissions."""
    import shutil
    import tempfile
    import uuid

    from hgraphstorage_spark.streaming import stream_heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    items = docs.select(
        F.concat(F.col("source"), F.lit("/"), F.col("lang")).alias("item")
    )
    tmp = tempfile.mkdtemp(prefix="hgs_hh_stream_")
    qname = f"hh_drv_{uuid.uuid4().hex[:8]}"
    try:
        items.repartition(4).write.mode("overwrite").parquet(f"{tmp}/items")
        stream = (
            spark.readStream.schema(items.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/items")
        )
        q = (
            stream_heavy_hitters(stream, capacity=64, shards=8, hash_mode="md5")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.table(qname)
            .groupBy("shard", "item")
            .agg(F.max("count_lb").cast("long").alias("count_lb"))
        )
        result = spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def q_audio_match(spark, sf_dir):
    """Landmark-audio offset-vote matching (pipeline/multimodal.py:
    audio_match) over a deterministic synthetic fingerprint index — the
    media_pairs pattern: the numpy constellation extraction stays
    pytest-exact (tone-sequence WAVs, exact 10-frame offset), while the
    SQL-replayable core — hash join, (probe, track, offset) votes,
    per-probe argmax — runs under the driver hash. Corpus = 4 tracks x
    200 arithmetic landmarks into 5000 slots (birthday collisions
    exercise the vote noise); probe = a 100-landmark excerpt of track 1
    at offset 50."""
    from hgraphstorage_spark.pipeline.multimodal import audio_match

    corpus = spark.range(800).select(
        F.expr("id div 200").alias("media_id"),
        F.pmod(
            F.pmod(F.col("id"), 200) * 104729 + F.expr("id div 200") * 7919,
            F.lit(5000),
        ).alias("fp_hash"),
        F.pmod(F.col("id"), 200).cast("int").alias("t1"),
    )
    probe = spark.range(50, 150).select(
        F.lit(99).cast("long").alias("media_id"),
        F.pmod(F.col("id") * 104729 + 7919, F.lit(5000)).alias("fp_hash"),
        (F.col("id") - 50).cast("int").alias("t1"),
    )
    return audio_match(corpus, probe, min_votes=3)


def q_rowgroup_stats(spark, sf_dir):
    """Parquet row-group footer stats for events.value (sources/files.py:
    parquet_rowgroup_stats — executor-side pyarrow footer reads) plus
    the prunability flag for a BETWEEN 100 AND 200 predicate. The oracle
    is genuinely independent: DuckDB's parquet_metadata() reads the same
    footers with its own parquet implementation (path fixed to the
    sf0.01 table the correctness driver runs against)."""
    from hgraphstorage_spark.sources.files import parquet_rowgroup_stats, prune_flag

    stats = parquet_rowgroup_stats(spark, f"{sf_dir}/events.parquet", "value")
    return stats.withColumn("pruned", prune_flag(100.0, 200.0))


def q_skipping_report(spark, sf_dir):
    """Data-skipping effectiveness report (sources/files.py:
    skipping_report) for value BETWEEN 100 AND 200 against the events
    table's row-group footer stats — the 1-row number a layout rewrite
    should move. Oracle aggregates DuckDB's independent
    parquet_metadata() read."""
    from hgraphstorage_spark.sources.files import (
        parquet_rowgroup_stats,
        skipping_report,
    )

    stats = parquet_rowgroup_stats(spark, f"{sf_dir}/events.parquet", "value")
    out = skipping_report(stats, 100.0, 200.0)
    return out.select(
        "n_groups",
        "n_pruned",
        "n_rows_total",
        "n_rows_pruned",
        F.col("pruned_fraction").cast("string").alias("pruned_fraction"),
    )


def q_fim(spark, sf_dir):
    """Fill-in-the-middle transform (pipeline/text.py:fim_transform) at
    rate 0.5 over documents — selection and both cut offsets are pure
    md5 arithmetic of the id, so the oracle replays every split; output
    fingerprints the transformed text to keep rows compact."""
    from hgraphstorage_spark.pipeline.text import fim_transform

    out = fim_transform(_t(spark, sf_dir, "documents"), rate=0.5)
    return out.select(
        "doc_id", "fim_applied", F.md5("text_fim").alias("fim_fp")
    )


def q_rollup_merge(spark, sf_dir):
    """Continuous-aggregate maintenance (functions/timeseries.py:
    time_rollup + rollup_merge): the events table split by event_id
    parity, each half rolled up independently, then MERGED — the law
    merge(rollup(A), rollup(B)) == rollup(A ++ B) under the driver hash,
    since the oracle computes the direct one-pass rollup."""
    from hgraphstorage_spark.functions.timeseries import rollup_merge, time_rollup
    from hgraphstorage_spark.streaming import load_events

    ev = load_events(spark, sf_dir)
    a = time_rollup(ev.filter(F.pmod("event_id", 2) == 0))
    b = time_rollup(ev.filter(F.pmod("event_id", 2) == 1))
    out = rollup_merge(a, b)
    return _canon_ts(
        _canon(out, "total_value", "min_value", "max_value"), "bucket_start"
    )


def q_curriculum(spark, sf_dir):
    """Curriculum data ordering (pipeline/sampling.py:curriculum_order):
    4 length-difficulty stages over documents, easy-first, md5-permuted
    within stage for epoch 1 — both ranks on the distributed two-pass
    form. Oracle replays the rank, the equi-depth bucket rule, and the
    md5 permutation."""
    from hgraphstorage_spark.pipeline.sampling import curriculum_order

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("s")
    )
    out = curriculum_order(docs, "s", n_stages=4, epoch=1)
    return out.select("doc_id", "stage", "curriculum_rank")


def q_corpus_diff(spark, sf_dir):
    """Snapshot-to-snapshot corpus diff (pipeline/dedup.py:corpus_diff):
    a deterministic mutation of the documents table — every id%10==3
    removed, ==5 text-edited, ==7 re-added under a shifted id — fully
    classified as added/removed/changed/same by fingerprint. Oracle
    replays the mutation and the full-outer fingerprint join (md5 is
    engine-portable)."""
    from hgraphstorage_spark.pipeline.dedup import corpus_diff
    from hgraphstorage_spark.pipeline.state import track

    # `base` feeds three branches (old side, edited, re-added) — each
    # replayed the document scan (r12 sweep); persist once
    base = track(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    edited = base.filter(F.pmod("doc_id", 10) != 3).withColumn(
        "text",
        F.when(
            F.pmod("doc_id", 10) == 5, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    added = base.filter(F.pmod("doc_id", 10) == 7).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return corpus_diff(base, edited.unionByName(added))


# main-content extraction fixture: every document's text wrapped in a
# page skeleton with known chrome — nav menu (high link density), title
# (short), aside promo (high link density), copyright footer (low
# stopword density) — so the extractor must recover exactly the body.
# The stopword list is the synthetic corpus's own function words (the
# generator vocabulary is database-ish English; jusText stoplists are
# language-parameterized and this corpus IS its own language).
_MC_PRE = (
    '<html><head><title>Doc</title><style>.m{x:1}</style>'
    "<script>var z=9;</script></head><body>"
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav><div class="main"><p>'
)
_MC_POST = (
    '</p></div><aside><a href="/promo">Click here</a> deals</aside>'
    "<footer>Copyright 2024 Example Corp - All rights reserved.</footer>"
    "</body></html>"
)
_MC_STOPS = (
    "the", "a", "join", "hash", "row", "batch",
    "scan", "customer", "column", "filter",
)
# ctx fixture: the body appears twice with a short heading between —
# the heading sits between two good blocks, so the context pass must
# promote it while the leading title (edge/nav-adjacent) and the
# trailing footer stay out
_MC_MID = "</p><h2>Data Notes</h2><p>"


def q_main_content(spark, sf_dir):
    """Boilerplate-aware main-content extraction (pipeline/extraction.py:
    extract_main_content — the context-free jusText tier: block
    segmentation at block-tag boundaries, link-density + stopword-density
    classification, zero-shuffle HOF projection). Every document wrapped
    in a chrome-laden page skeleton; the extractor must return the body
    and drop nav/title/aside/footer. Oracle replays the ENTIRE chain —
    the same RE2-safe regexes, entity chain, token normalization and
    thresholds — block by block in DuckDB."""
    from hgraphstorage_spark.pipeline.extraction import extract_main_content

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_MC_PRE), F.coalesce(F.col("text"), F.lit("")), F.lit(_MC_POST)
        ).alias("html"),
    )
    out = extract_main_content(docs, stopwords=_MC_STOPS)
    return out.select(
        "doc_id",
        "content",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("n_content_blocks").cast("long").alias("n_content_blocks"),
    )


def q_main_content_ctx(spark, sf_dir):
    """Context-sensitive main-content extraction (the jusText second
    pass, pipeline/extraction.py:_context_keep_flags): the wrapped page
    carries the body TWICE with a short heading between — the heading's
    nearest decisive neighbors are both good, so it must be PROMOTED,
    while the title (nav-adjacent) and footer (edge) stay out. Spark
    runs two zero-shuffle array scans; the oracle replays them as
    IGNORE NULLS window walks over the exploded blocks — same values,
    different shape."""
    from hgraphstorage_spark.pipeline.extraction import extract_main_content

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_MC_PRE),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(_MC_MID),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(_MC_POST),
        ).alias("html"),
    )
    out = extract_main_content(docs, stopwords=_MC_STOPS, context=True)
    return out.select(
        "doc_id",
        "content",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("n_content_blocks").cast("long").alias("n_content_blocks"),
    )


# structured-extraction fixture: heading + list chrome around the body —
# the h1/h2 must surface as '#'/'##' lines, the prose li as a '- ' line,
# while nav/link-li/footer/title chrome drops. Same corpus-native
# stopword list as the main_content rows.
_SB_PRE = (
    '<html><head><title>Doc</title><script>var q=1;</script></head><body>'
    '<nav><a href="/">Home</a> <a href="/tags">Tags</a></nav>'
    "<h1>Guide to the hash join</h1><p>"
)
_SB_POST = (
    "</p><h2>Notes on the row scan</h2>"
    "<ul><li>the batch scan keeps a hash row filter and a column filter"
    " for the customer</li>"
    '<li><a href="/next">Next page</a></li></ul>'
    "<footer>Copyright 2024 Example Corp - All rights reserved.</footer>"
    "</body></html>"
)


def q_structured_md(spark, sf_dir):
    """Heading-aware structured extraction (pipeline/extraction.py:
    extract_structured — tier 3): every document wrapped in a skeleton
    with an h1 title, an h2 section heading, a prose list item, and
    nav/link-item/footer chrome; the extractor must emit the
    markdown-ish shape LLM corpora ingest — '#'-prefixed headings, '- '
    list items, bare prose — and drop the chrome. Oracle replays the
    ENTIRE chain: the marker rewrite of every block tag, the split, the
    per-block tag/metrics, the heading-vs-content keep rules, and the
    prefix rendering."""
    from hgraphstorage_spark.pipeline.extraction import extract_structured

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_SB_PRE), F.coalesce(F.col("text"), F.lit("")), F.lit(_SB_POST)
        ).alias("html"),
    )
    out = extract_structured(docs, stopwords=_MC_STOPS)
    return out.select(
        "doc_id",
        "content_md",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("n_kept_blocks").cast("long").alias("n_kept_blocks"),
        F.col("n_headings").cast("long").alias("n_headings"),
    )


def q_video_plan(spark, sf_dir):
    """Keyframe-aligned frame-sampling plan (pipeline/multimodal.py:
    video_frame_plan) over a deterministic arithmetic sample table — the
    media_pairs pattern: the ISO-BMFF stbl writer/parser round-trip
    stays pytest-exact, while the plan pick (targets from the per-media
    span, latest sync sample at-or-before each target) runs under the
    driver hash."""
    from hgraphstorage_spark.pipeline.multimodal import video_frame_plan

    table = spark.range(120).select(
        F.expr("id div 40").alias("media_id"),
        F.pmod(F.col("id"), 40).cast("int").alias("sample_idx"),
        (F.pmod(F.col("id"), 40) * 100).cast("long").alias("ts_ms"),
        (F.lit(1000) + F.col("id") * 37).cast("long").alias("byte_offset"),
        (F.lit(20) + F.pmod(F.col("id"), 7)).cast("int").alias("size"),
        (F.pmod(F.col("id"), 5) == 0).alias("is_sync"),
    )
    return video_frame_plan(table, every_ms=700)


def q_stream_hll(spark, sf_dir):
    """Streaming distinct-count sketch ACTUALLY RUN as a structured
    stream: because the HLL register table is an algebraic MAX
    aggregation (functions/stats.py:hll_sketch), the exact same operator
    runs natively on an unbounded stream — documents flow through 4
    file-triggered micro-batches, registers accumulate in complete mode,
    and the final table equals the batch sketch bit-for-bit (sketch
    mergeability = streaming for free, no custom state operator). The
    oracle replays the batch twin: hash -> rho -> register max ->
    canonical fold -> estimator."""
    import shutil
    import tempfile
    import uuid

    from hgraphstorage_spark.functions.stats import hll_estimate, hll_sketch

    docs = _t(spark, sf_dir, "documents").select("lang", "text")
    tmp = tempfile.mkdtemp(prefix="hgs_hll_stream_")
    qname = f"hll_drv_{uuid.uuid4().hex[:8]}"
    try:
        docs.repartition(4).write.mode("overwrite").parquet(f"{tmp}/docs")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/docs")
        )
        toks = stream.select(
            "lang",
            F.explode(
                F.split(F.lower(F.trim("text")), r"[ \t\n\x0B\f\r]+")
            ).alias("tok"),
        ).filter(F.length("tok") > 0)
        regs = hll_sketch(toks, "tok", group_cols=["lang"], p=8)
        q = (
            regs.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = spark.table(qname)
        est = hll_estimate(final, group_cols=["lang"], p=8)
        out = est.select(
            "lang",
            "n_zero_registers",
            F.col("n_distinct_est").cast("string").alias("n_distinct_est"),
        )
        result = spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def q_stream_embed_dedup(spark, sf_dir):
    """Streaming embedding near-dup suppression ACTUALLY RUN as a
    structured stream (streaming/ingest.py:stream_embed_dedup):
    embeddings with synthetic event times stream through 4 micro-batches
    of watermark-bounded dropDuplicatesWithinWatermark on the 16-bit
    md5-plane hyperplane signature. The stream keeps ONE survivor per
    signature (which row is arrival-order dependent), so the
    deterministic projection is the SIGNATURE SET: survivors'
    signatures are recomputed and returned, and the oracle replays the
    distinct signature set over all vectors with the integer-exact
    fixed-point planes."""
    import shutil
    import tempfile

    from hgraphstorage_spark.pipeline.similarity import (
        quantize_fixed_point,
        quantized_bucket,
    )
    from hgraphstorage_spark.streaming import stream_embed_dedup

    # event times span at most 30 min (vec_id mod 1800) so EVERY row sits
    # inside the 1-hour watermark at ANY scale factor — an unbounded
    # vec_id-seconds span would let early files advance the watermark
    # past later files' rows, dropDuplicatesWithinWatermark would drop
    # them as late, and their signatures would vanish from the survivor
    # set the oracle replays (r6 review catch)
    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.timestamp_seconds(F.lit(1704067200) + F.col("vec_id") % 1800).alias("ts"),
    )
    tmp = tempfile.mkdtemp(prefix="hgs_embdd_stream_")
    try:
        embs.repartition(4).write.mode("overwrite").parquet(f"{tmp}/embs")
        stream = (
            spark.readStream.schema(embs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/embs")
        )
        q = (
            stream_embed_dedup(
                stream, dims=64, bits=16, watermark="1 hour", plane_mode="md5"
            )
            .writeStream.format("parquet")
            .option("path", f"{tmp}/sink")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        survivors = (
            spark.read.parquet(f"{tmp}/sink")
            .withColumn("_qv", quantize_fixed_point(F.col("embedding")))
            .select(quantized_bucket("_qv", dims=64, bits=16).alias("sig"))
            .distinct()
        )
        result = spark.createDataFrame(survivors.collect(), survivors.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


# ---------------------------------------------------------------------------
# round-6 pipeline wave: NB quality classifier, novelty, drift, domain roll-up


def q_nb_quality(spark, sf_dir):
    """Naive-Bayes quality classifier (pipeline/text.py:
    nb_quality_model/nb_quality_score) — the count-based stand-in for
    the fastText quality filter (CCNet/GPT-3 style): train log-odds on
    src0 as the curated positive seed vs the rest, score every doc by
    the exact-decimal sum of per-occurrence LLRs. Oracle replays
    counts, smoothing, and the decimal sum."""
    from hgraphstorage_spark.pipeline.text import nb_quality_model, nb_quality_score

    docs = _t(spark, sf_dir, "documents")
    model = nb_quality_model(docs, docs.filter(F.col("source") == "src0"))
    return _canon(nb_quality_score(docs, model), "score")


def q_novelty(spark, sf_dir):
    """Per-doc n-gram novelty (pipeline/dedup.py:novelty_scores):
    fraction of a doc's distinct 3-gram shingles first seen in that doc
    (min doc_id as arrival proxy) — the SlimPajama-style redundancy
    signal. Oracle replays string shingles' first occurrence (hashed ==
    string shingle sets up to negligible collisions, the
    ngram_jaccard argument)."""
    from hgraphstorage_spark.pipeline.dedup import novelty_scores

    return _canon(novelty_scores(_t(spark, sf_dir, "documents"), n=3), "novelty")


def q_vocab_drift(spark, sf_dir):
    """Token-distribution drift (pipeline/text.py:vocab_drift): top-20
    per-token contributions to KL(src0 ‖ rest) with add-one smoothing —
    the new-dump monitoring signal. Oracle replays the smoothed
    contributions and the rounded-ordering top-k."""
    from hgraphstorage_spark.pipeline.text import vocab_drift

    docs = _t(spark, sf_dir, "documents")
    return _canon(
        vocab_drift(
            docs.filter(F.col("source") == "src0"),
            docs.filter(F.col("source") != "src0"),
            top_k=20,
        ),
        "contrib",
    )


def q_domain_quality(spark, sf_dir):
    """Per-domain quality roll-up → blocklist derivation
    (pipeline/dedup.py:domain_quality): quality_filter passes joined
    onto the synthetic crawl URLs, aggregated per registrable host;
    blocked = ≥2 docs passing under 50%. Oracle composes the
    quality_filter replay with the synthetic-domain arithmetic."""
    from hgraphstorage_spark.pipeline import quality_filter
    from hgraphstorage_spark.pipeline.dedup import domain_quality

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    # HISTOGRAM quality_filter kept on purpose (r12 matched A/B: 0.83 s
    # histogram vs 1.12 s with the zero-shuffle narrow variant) — the
    # narrow variant's fused per-row metric expressions cost more here
    # than the histogram's (doc, token) shuffle + metrics join; outputs
    # identical either way (the registry aliases the oracles)
    qf = quality_filter(docs).select("doc_id", "passes")
    return _canon(
        domain_quality(
            docs.join(qf, "doc_id"), passes_col="passes", min_docs=2, threshold=0.5
        ),
        "pass_rate",
    )


def q_stream_url_dedup(spark, sf_dir):
    """Streaming crawl URL dedup ACTUALLY RUN as a structured stream
    (streaming/ingest.py:stream_url_dedup): the synthetic crawl URLs
    stream through 4 micro-batches of watermark-bounded
    dropDuplicatesWithinWatermark on the canonical form. The stream
    keeps ONE survivor per canonical URL (arrival-order dependent), so
    the deterministic projection is the canonical-URL SET — which the
    oracle derives from the generator arithmetic. Fetch times span 30
    minutes (doc_id mod 1800 s), inside the 1-hour watermark at any
    scale factor (the stream_embed_dedup lesson)."""
    import shutil
    import tempfile

    from hgraphstorage_spark.streaming import stream_url_dedup

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        "url",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") % 1800).alias("ts"),
    )
    tmp = tempfile.mkdtemp(prefix="hgs_urldd_stream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(f"{tmp}/docs")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/docs")
        )
        q = (
            stream_url_dedup(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", f"{tmp}/sink")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        survivors = spark.read.parquet(f"{tmp}/sink").select("url_norm").distinct()
        result = spark.createDataFrame(survivors.collect(), survivors.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def q_calibration(spark, sf_dir):
    """Reliability diagram (functions/stats.py:calibration_report) of
    n_chars as a ranking score against the source=='src0' label —
    the driver row certifies the quantile-cut + per-bin-rate mechanics
    on a deterministic score (the psi_drift convention); the
    planted-signal pytest certifies that a real ranking shows a
    monotone diagram. Oracle replays the cuts and rates."""
    from hgraphstorage_spark.functions.stats import calibration_report

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_pos", F.col("source") == "src0"
    )
    return _canon(
        calibration_report(docs, "n_chars", "is_pos", n_bins=10),
        "pos_rate",
        "mean_score",
    )


def q_link_graph(spark, sf_dir):
    """Outbound-link extraction + RFC 3986-lite resolution
    (sources/warc.py:extract_links) over deterministic synthetic HTML on
    the synthetic crawl URLs: each page carries an absolute link, a
    root-relative link, a path-relative link, plus a mailto and a
    fragment (both must drop). The Spark side runs the REAL href regex
    and resolution expressions; the oracle derives every resolved URL
    from the generator arithmetic — an independent-derivation oracle
    (same pattern as url_dedup)."""
    from hgraphstorage_spark.sources.warc import extract_links

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    k = F.floor(F.col("doc_id") / 2).cast("long")
    abs_href = F.concat(
        F.lit("https://site"),
        ((k + 1) % 7).cast("string"),
        F.lit(".com/p"),
        (k + 1).cast("string"),
    )
    html = F.concat(
        F.lit('<html><body><a href="'),
        abs_href,
        F.lit("\">x</a> <a href='/r/"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("'>y</a> <a href=\"img"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit('.png">z</a> <a href="mailto:a@b.c">m</a> '),
        F.lit('<a href="#frag">f</a></body></html>'),
    )
    pages = docs.withColumn("html", html).select("doc_id", "url", "html")
    return extract_links(pages).select("doc_id", "href", "link_url")


def q_sentence_dedup(spark, sf_dir):
    """RefinedWeb-granularity sentence dedup: every exact sentence
    occurring >= 2 times corpus-wide (the planted duplicate docs make
    real repeats) vanishes from ALL documents; reassembled text is
    md5-fingerprinted. Oracle replays by sentence string."""
    from hgraphstorage_spark.pipeline.text import boilerplate_dedup

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", " a ", ". ")
    )
    out = boilerplate_dedup(docs, unit="sentence", min_count=2)
    return out.select(
        "doc_id", "n_units", "n_kept", F.md5("text_dedup").alias("dedup_fp")
    )


def q_sentences(spark, sf_dir):
    """Sentence segmentation (pipeline/text.py:sentence_split) over
    deterministically punctuated text (every standalone 'a' token
    becomes a period — the synthetic corpus carries no terminators of
    its own): RE2-safe terminator marking, split, whitespace collapse,
    token counts. Oracle replays the same replace + split chain."""
    from hgraphstorage_spark.pipeline.text import sentence_split

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", " a ", ". ")
    )
    return sentence_split(docs, min_tokens=1)


def q_readability(spark, sf_dir):
    """Flesch reading ease + FK grade (pipeline/text.py:
    readability_scores) over the punctuated corpus: sentence counts via
    the shared terminator machinery, ASCII letter-run words, vowel-group
    syllables with the silent-'e' rule. Oracle replays every count and
    the two score formulas with identical double arithmetic."""
    from hgraphstorage_spark.pipeline.text import readability_scores

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", " a ", ". ")
    )
    out = readability_scores(docs)
    # decimals go out as strings so pandas materialization matches the
    # DuckDB side byte-for-byte under the driver's raw-repr hash
    return out.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.col("flesch_reading_ease").cast("string").alias("flesch_reading_ease"),
        F.col("fk_grade").cast("string").alias("fk_grade"),
    )


def q_hll_distinct(spark, sf_dir):
    """Per-language distinct-token estimate via the md5-portable HLL
    register sketch (functions/stats.py:hll_sketch/hll_estimate, p=8)
    next to the exact count for calibration. Oracle replays hash →
    bucket/rho → register max → the canonical bucket-order IEEE fold →
    estimator branches bit-for-bit."""
    from hgraphstorage_spark.functions.stats import hll_estimate, hll_sketch
    from hgraphstorage_spark.pipeline.text import _parallel

    docs = _parallel(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"[ \t\n\x0B\f\r]+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    # HLL registers of a set equal those of the multiset (max over equal
    # hashes), and this query needs the exact distinct count anyway — so
    # distinct FIRST (map-side combined, tiny shuffle) and hash only the
    # survivors. A pure-sketch pipeline would feed hll_sketch the raw
    # stream instead (that is its whole point at 100 TB).
    toks_d = toks.distinct()
    est = hll_estimate(hll_sketch(toks_d, "tok", group_cols=["lang"], p=8),
                       group_cols=["lang"], p=8)
    exact = toks_d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_distinct_exact")
    )
    return est.join(exact, "lang").select(
        "lang",
        "n_zero_registers",
        F.col("n_distinct_est").cast("string").alias("n_distinct_est"),
        "n_distinct_exact",
    )


def q_phrases(spark, sf_dir):
    """word2phrase collocation detection (pipeline/text.py:phrase_detect)
    over the corpus: top-50 adjacent bigrams by the Mikolov score with
    min_count=5, delta=5. Oracle replays tokenize → zip-shifted bigrams →
    counts → the integer-exact score division."""
    from hgraphstorage_spark.pipeline.text import phrase_detect

    docs = _t(spark, sf_dir, "documents")
    out = phrase_detect(docs, min_count=5, delta=5.0, top_k=50)
    return out.select(
        "word_a", "word_b", "n_pair", F.col("score").cast("string").alias("score")
    )


def q_zipf(spark, sf_dir):
    """Zipf-law OLS fit over the top-1000 token frequencies
    (pipeline/text.py:zipf_fit): round-12 DECIMAL term sums (order-
    independent), closed-form slope/intercept/R² in identical IEEE
    doubles — the oracle replays the whole fit."""
    from hgraphstorage_spark.pipeline.text import zipf_fit

    out = zipf_fit(_t(spark, sf_dir, "documents"), top_k=1000)
    return out.select(
        "n_tokens",
        F.col("slope").cast("string").alias("slope"),
        F.col("intercept").cast("string").alias("intercept"),
        F.col("r2").cast("string").alias("r2"),
    )


def q_quantile_histogram(spark, sf_dir):
    """Equi-depth histogram of events.value (10 bins of equal count;
    edges = where the quantile cuts fall): distributed two-pass rank, no
    single-partition window over data. Oracle replays the rank + bin
    arithmetic."""
    from hgraphstorage_spark.functions.stats import quantile_histogram

    return quantile_histogram(_t(spark, sf_dir, "events"), "value", n_bins=10)


def q_anchor_text(spark, sf_dir):
    """Inbound anchor-text index (sources/warc.py:anchor_text_index) over
    anchored synthetic HTML: each page carries an absolute link with a
    3-token anchor and a root-relative link with a 2-token anchor. The
    Spark side runs the REAL two-group href/anchor regex, RFC 3986-lite
    resolution, tokenization, and the target-partitioned top-k; the
    oracle derives every (target, anchor tokens) row from the generator
    arithmetic and replays the aggregation — same independent-derivation
    pattern as link_graph/url_dedup."""
    from hgraphstorage_spark.sources.warc import anchor_text_index, extract_links

    links = extract_links(_anchored_pages(spark, sf_dir), with_anchor=True)
    return anchor_text_index(links, top_k=3)


def _anchored_pages(spark, sf_dir):
    """Synthetic anchored pages shared by anchor_text and extract_links:
    per doc an absolute link with a 3-token anchor and a root-relative
    link with a 2-token anchor, all offsets pure doc_id arithmetic."""
    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    k = F.floor(F.col("doc_id") / 2).cast("long")
    abs_href = F.concat(
        F.lit("https://site"),
        ((k + 1) % 7).cast("string"),
        F.lit(".com/p"),
        (k + 1).cast("string"),
    )
    html = F.concat(
        F.lit('<a href="'),
        abs_href,
        F.lit('">term'),
        (k % 5).cast("string"),
        F.lit(" common phrase</a> <a href='/r/"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("'>nav "),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("</a>"),
    )
    return docs.withColumn("html", html).select("doc_id", "url", "html")


def q_quantile_sketch(spark, sf_dir):
    """Mergeable bottom-k quantile registers (functions/stats.py:
    quantile_sketch family — the engine-portable alternative to
    percentile_approx's JVM-bound KLL): the events table split by
    event_id parity, each half sketched independently (k=256 per event
    type), MERGED, then estimated — the law merge(sk(A), sk(B)) ==
    sk(A ++ B) under the driver hash, since the oracle computes the
    direct one-pass bottom-k over ALL events (the rollup_merge
    pattern). Quantiles are percentile_cont interpolation on the
    registers."""
    from hgraphstorage_spark.functions.stats import (
        quantile_sketch,
        quantile_sketch_estimate,
        quantile_sketch_merge,
    )
    from hgraphstorage_spark.streaming import load_events

    ev = load_events(spark, sf_dir)
    a = quantile_sketch(
        ev.filter(F.pmod("event_id", 2) == 0), "value", "event_id",
        group_cols=["event_type"], k=256,
    )
    b = quantile_sketch(
        ev.filter(F.pmod("event_id", 2) == 1), "value", "event_id",
        group_cols=["event_type"], k=256,
    )
    merged = quantile_sketch_merge(a, b, group_cols=["event_type"], k=256)
    out = quantile_sketch_estimate(
        merged, percentiles=(0.25, 0.5, 0.9), group_cols=["event_type"]
    )
    return _canon(out, "p25", "p50", "p90")


def q_sitemap_ingest(spark, sf_dir):
    """Sitemap protocol parsing (sources/warc.py:parse_sitemaps) over
    arithmetic-generated XML: three of four docs carry a 2-entry
    <urlset> (entity-escaped query loc + lastmod + priority; bare loc +
    changefreq), every fourth a <sitemapindex> child pointer. The
    oracle derives every expected frontier row from the generator
    arithmetic — independent derivation, not regex replay. The second
    entry's loc arrives CDATA-wrapped with a RAW ampersand (the r8
    unwrap; entity escaping stays live on the first entry). The
    EXTERNAL conformance sitemaps (r12: fixtures/external/
    sitemap_index.xml + sitemap_urlset.xml — the sitemaps.org protocol
    page's own conventions: XML declaration, protocol namespace, an
    xhtml:link child inside a <url> block, indentation inside blocks,
    W3C datetimes with timezone offsets, a .xml.gz child pointer) are
    unioned in as www.example.org rows, so parsing the published
    layout is LIVE in the driver hash; their oracle rows are literals
    certified by tests/test_external_conformance.py."""
    from hgraphstorage_spark.sources.warc import parse_sitemaps

    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    dom = F.concat(F.lit("site"), s(i % 7), F.lit(".com"))
    urlset = F.concat(
        F.lit("<urlset><url><loc>https://site"), s(i % 7), F.lit(".com/a?x="),
        s(i), F.lit("&amp;y=2</loc><lastmod>2024-02-0"), s(i % 9 + 1),
        F.lit("</lastmod><priority>0."), s(i % 10),
        F.lit("</priority></url><url><loc><![CDATA[https://site"), s(i % 7),
        F.lit(".com/b"), s(i),
        F.lit("?q=1&r=2]]></loc><changefreq>weekly</changefreq></url></urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://site"), s(i % 7),
        F.lit(".com/sm"), s(i % 5),
        F.lit(".xml</loc></sitemap></sitemapindex>"),
    )
    sitemaps = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        dom.alias("domain"),
        F.when(i % 4 == 3, index).otherwise(urlset).alias("sitemap_xml"),
    )
    ext_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "external"
    )
    ext_rows = []
    for j, fname in enumerate(("sitemap_index.xml", "sitemap_urlset.xml")):
        with open(os.path.join(ext_dir, fname), encoding="utf-8") as f:
            ext_rows.append((-1 - j, "www.example.org", f.read()))
    ext = spark.createDataFrame(
        ext_rows, "doc_id long, domain string, sitemap_xml string"
    )
    out = parse_sitemaps(sitemaps.unionByName(ext))
    return _canon(out, "priority")


def q_hyperball(spark, sf_dir):
    """HyperBall neighborhood function (analytics.py:hyperball —
    Boldi & Vigna 2011) over the location subgraph: 3 rounds of
    per-node HLL-register ball merges at p=4. On the depth-2 forest
    NF(3) must equal NF(2) exactly (the balls converge), which the
    hash makes load-bearing. Oracle unrolls every round: md5 node
    hash → bucket/rho registers, per-round neighbor-max merges, the
    canonical bucket-order IEEE estimator fold per node, and the exact
    DECIMAL sum per round."""
    from hgraphstorage_spark.analytics import hyperball

    snap = _graph(spark, sf_dir)
    return _canon(hyperball(_loc_subgraph(snap), rounds=3, p=4), "nf_est")


def q_hyperball_centrality(spark, sf_dir):
    """HyperBall harmonic centrality (analytics.py:hyperball_centrality
    — the Boldi & Vigna application) over the location subgraph at
    p=8, rounds=3: per node, Σ_t (|B_t| − |B_{t−1}|)/t with clamped
    diffs in fixed round order. On the depth-2 forest the structure is
    sharp — regions MUST read 0.0000 exactly (their ball never grows)
    — and the customer/supplier readings approximate the true
    1/1 + 1/2. Oracle unrolls the register rounds and replays the
    per-node estimator diffs and the IEEE term chain."""
    from hgraphstorage_spark.analytics import hyperball_centrality

    snap = _graph(spark, sf_dir)
    return _canon(
        hyperball_centrality(_loc_subgraph(snap), rounds=3, p=8), "harmonic_est"
    )


def q_effective_diameter(spark, sf_dir):
    """Effective diameter report (analytics.py:effective_diameter — the
    Boldi & Vigna 2011 headline number HyperBall exists to compute) from
    the same 3-round p=4 HyperBall NF table as q_hyperball: smallest t
    with NF(t) >= 0.9·NF(t_max), plus the HyperANF linear interpolation
    as one deterministic IEEE chain. On the depth-2 location forest the
    balls converge by round 2, so the fold must land on a genuine
    interior round — threshold, lag, and interpolation all load-bearing.
    Oracle replays the register rounds (the q_hyperball CTE chain) and
    the identical smallest-t fold."""
    from hgraphstorage_spark.analytics import effective_diameter, hyperball

    snap = _graph(spark, sf_dir)
    nf = hyperball(_loc_subgraph(snap), rounds=3, p=4)
    return _canon(
        effective_diameter(nf, q=0.9), "nf_max", "effective_diameter_interp"
    )


def q_flagged_filter(spark, sf_dir):
    """Word-blocklist gate (pipeline/text.py:flagged_terms — the C4
    badwords tier) over the documents table flagging two corpus
    vocabulary words ('slow', 'spill') plus a single-character CJK
    term at max_ratio 0.02. Arithmetic suffixes keep three behaviors
    live in the hash: trailing punctuation ('slow.' — the
    edge-punctuation strip), the exact-token rule ('slower' never
    flags), and an UNSEGMENTED CJK run (every doc_id%4==2 appends
    '禁止词' with no spaces — the r9 character fallback splits it into
    three tokens and gates on '禁'; whitespace-only tokenization saw
    one giant token and passed it). Oracle replays cjk-isolate →
    tokenize → edge-strip → list_contains → ratio → gate."""
    from hgraphstorage_spark.pipeline.text import flagged_terms

    i = F.col("doc_id")
    suffix = (
        F.when(i % 4 == 0, F.lit(" ends slow."))
        .when(i % 4 == 1, F.lit(" ends slower now"))
        .when(i % 4 == 2, F.lit(" 禁止词"))
        .otherwise(F.lit(""))
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    out = flagged_terms(docs, ["slow", "spill", "禁"], max_ratio=0.02)
    return _canon(
        out.select("doc_id", "n_tokens", "n_flagged", "flagged_ratio", "passes"),
        "flagged_ratio",
    )


def q_phrase_filter(spark, sf_dir):
    """Multi-word blocklist gate (pipeline/text.py:flagged_phrases —
    the phrase companion to flagged_filter; real C4/Dolma lists are
    full of multi-word entries a token gate cannot see) over the
    documents table with arithmetic suffixes cycling doc_id%5: an
    in-order phrase hit, the same words out of order (no hit), an
    unsegmented CJK phrase (the shared character isolation), a
    punctuated/case variant ('Free-Money!' hits 'free money'), and no
    suffix. Oracle replays the identical normalization chain and the
    SAME compiled alternation (one home:
    text.compile_phrase_pattern)."""
    from hgraphstorage_spark.pipeline import flagged_phrases

    i = F.col("doc_id")
    suffix = (
        F.when(i % 5 == 0, F.lit(" free money now"))
        .when(i % 5 == 1, F.lit(" money free now"))
        .when(i % 5 == 2, F.lit(" 禁止词汇"))
        .when(i % 5 == 3, F.lit(" Free-Money!"))
        .otherwise(F.lit(""))
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    out = flagged_phrases(docs, ["free money", "禁止词汇"])
    return out.select("doc_id", "n_phrase_hits", "passes")


def q_frontier_schedule(spark, sf_dir):
    """Politeness fetch-slot plan (sources/warc.py:frontier_schedule)
    over the capstone frontier: allowed urls only, per-host queues
    capped at 20, fetch_at_sec = (Crawl-delay or the 1 s default) ·
    (host_rank − 1). Oracle wraps the full frontier replay and applies
    the same filter + arithmetic."""
    from hgraphstorage_spark.sources.warc import (
        crawl_frontier,
        extract_links,
        frontier_schedule,
        parse_robots,
        robots_extras,
    )

    links = extract_links(_anchored_pages(spark, sf_dir))
    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "domain string, robots_txt string")
    fr = crawl_frontier(
        links,
        parse_robots(robots, agent="trainbot"),
        extras=robots_extras(robots, agent="trainbot"),
        sitemap_entries=_frontier_sitemap(spark, sf_dir),
        as_of="2024-03-01",
    )
    return frontier_schedule(fr, max_per_host=20)


def q_feed_ingest(spark, sf_dir):
    """RSS/Atom feed ingestion (sources/warc.py:parse_feeds) over
    arithmetic-generated feed XML cycling by doc_id%3: an RSS item with
    a CDATA-wrapped title carrying a RAW '<' and '&' (the r9 per-field
    CDATA unwrap — the old whole-document unwrap turned the '<' into
    live markup and lost the title) and an RFC 822 pubDate whose day
    AND month vary; an Atom entry that lists a rel="self" feed link
    BEFORE the article link (the r9 rel-aware selection — first-href
    picked the feed itself) with alternating single/double quoted
    hrefs and an ISO updated timestamp; an RSS item with no date (NULL
    published). The oracle derives every field — including the RFC 822
    day-month-year → DATE fold — from the generator arithmetic."""
    from hgraphstorage_spark.sources.warc import parse_feeds

    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    months = F.array(*[F.lit(m) for m in (
        "Jan", "Feb", "Mar", "Apr", "May", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
    )])
    day = (i % 28 + 1).cast("int")
    mon = (i % 12 + 1).cast("int")
    rss = F.concat(
        F.lit("<rss><channel><title>Chan</title><item>"
              "<title><![CDATA[Story "), s(i), F.lit(" <raw & more]]></title>"
              "<link>https://site"), s(i % 7), F.lit(".com/story/"), s(i),
        F.lit("</link><pubDate>Mon, "), F.lpad(s(day), 2, "0"), F.lit(" "),
        F.element_at(months, mon), F.lit(" 2024 10:0"), s(i % 10),
        F.lit(":00 GMT</pubDate></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit("<feed><entry><title>Post "), s(i),
        F.lit('</title><link rel="self" href="https://site'), s(i % 7),
        F.lit('.com/feed.xml"/>'),
        F.when(
            i % 2 == 0,
            F.concat(F.lit('<link rel="alternate" href="https://site'), s(i % 7),
                     F.lit(".com/post/"), s(i), F.lit('"/>')),
        ).otherwise(
            F.concat(F.lit("<link href='https://site"), s(i % 7),
                     F.lit(".com/post/"), s(i), F.lit("'/>")),
        ),
        F.lit("<updated>2024-"), F.lpad(s(mon), 2, "0"), F.lit("-"),
        F.lpad(s(day), 2, "0"), F.lit("T08:00:00Z</updated></entry></feed>"),
    )
    undated = F.concat(
        F.lit("<rss><channel><item><title>Undated "), s(i),
        F.lit("</title><link>https://site"), s(i % 7), F.lit(".com/u/"), s(i),
        F.lit("</link></item></channel></rss>"),
    )
    feeds = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.concat(F.lit("site"), s(i % 7), F.lit(".com")).alias("domain"),
        F.when(i % 3 == 0, rss).when(i % 3 == 1, atom).otherwise(undated)
        .alias("feed_xml"),
    )
    return _canon(parse_feeds(feeds), "published_date")


def _synthetic_http_records(spark, sf_dir):
    """Arithmetic-generated WARC-record frame (target_uri, warc_date,
    binary payload) for the HTTP-envelope rows — ONE home so the
    q_http_envelope and q_revisit_plan generators and their SQL twins
    can't drift. Generation rules (all by doc_id):

    - %7==3: NON-HTTP payload (NULL envelope end-to-end);
    - version 1.1 on even ids, 1.0 odd; status 301 'Moved Permanently'
      + Location on %5==0, else 200 'OK';
    - ETag on even ids, weak (W/) on %4==0, value quoted verbatim;
    - Last-Modified on %3!=1 (day %28+1, month %12+1, 2024) — except
      %9==4 sends the IMPOSSIBLE 'Tue, 31 Feb 2024' (raw header
      non-NULL, parsed date NULL: the try_to_date ANSI-safety live in
      the hash); header name lowercase on %6==0 (case-insensitivity
      live);
    - Cache-Control on %4==1: 'public, s-maxage=99, max-age=N',
      N=(id%10+1)*21600 (the plain-max-age-not-s-maxage boundary
      live);
    - Expires on %6==2 (day %27+2, month (id+5)%12+1 — straddles the
      fetch date, so negative horizons exercise the clamp);
    - Content-Type html on even ids, plain odd;
    - warc_date '2024-06-<id%28+1>' ISO, except %11==5 sends
      'not-a-date' (NULL schedule in revisit_plan)."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    months = F.array(*[F.lit(m) for m in (
        "Jan", "Feb", "Mar", "Apr", "May", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
    )])
    crlf = F.lit("\r\n")
    lm_day = F.when(i % 9 == 4, F.lit("31")).otherwise(F.lpad(s(i % 28 + 1), 2, "0"))
    lm_mon = F.when(i % 9 == 4, F.lit("Feb")).otherwise(
        F.element_at(months, (i % 12 + 1).cast("int"))
    )
    lm_val = F.concat(
        F.lit("Tue, "), lm_day, F.lit(" "), lm_mon, F.lit(" 2024 10:00:00 GMT")
    )
    ex_val = F.concat(
        F.lit("Tue, "), F.lpad(s(i % 27 + 2), 2, "0"), F.lit(" "),
        F.element_at(months, ((i + 5) % 12 + 1).cast("int")),
        F.lit(" 2024 00:00:00 GMT"),
    )
    hdr = lambda cond, text: F.when(cond, F.concat(text, crlf)).otherwise(F.lit(""))  # noqa: E731
    status_line = F.concat(
        F.lit("HTTP/"),
        F.when(i % 2 == 0, F.lit("1.1")).otherwise(F.lit("1.0")),
        F.when(i % 5 == 0, F.lit(" 301 Moved Permanently")).otherwise(F.lit(" 200 OK")),
    )
    envelope = F.concat(
        status_line, crlf,
        hdr(
            i % 2 == 0,
            F.concat(
                F.lit("ETag: "),
                F.when(i % 4 == 0, F.lit('W/"v')).otherwise(F.lit('"v')),
                s(i), F.lit('"'),
            ),
        ),
        hdr(
            i % 3 != 1,
            F.concat(
                F.when(i % 6 == 0, F.lit("last-modified: ")).otherwise(
                    F.lit("Last-Modified: ")
                ),
                lm_val,
            ),
        ),
        hdr(
            i % 4 == 1,
            F.concat(
                F.lit("Cache-Control: public, s-maxage=99, max-age="),
                s((i % 10 + 1) * 21600),
            ),
        ),
        hdr(i % 6 == 2, F.concat(F.lit("Expires: "), ex_val)),
        hdr(
            i % 5 == 0,
            F.concat(F.lit("Location: https://site"), s(i % 7), F.lit(".com/new/"), s(i)),
        ),
        hdr(
            F.lit(True),
            F.when(i % 2 == 0, F.lit("Content-Type: text/html; charset=utf-8"))
            .otherwise(F.lit("Content-Type: text/plain")),
        ),
        crlf, F.lit("body "), s(i),
    )
    payload_str = F.when(
        i % 7 == 3, F.lit("rawbytes: no http envelope here")
    ).otherwise(envelope)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://site"), s(i % 7), F.lit(".com/page/"), s(i)).alias(
            "target_uri"
        ),
        F.when(i % 11 == 5, F.lit("not-a-date"))
        .otherwise(
            F.concat(F.lit("2024-06-"), F.lpad(s(i % 28 + 1), 2, "0"), F.lit("T00:00:00Z"))
        )
        .alias("warc_date"),
        F.encode(payload_str, "UTF-8").alias("payload"),
    )


def q_http_envelope(spark, sf_dir):
    """HTTP response-envelope extraction (sources/warc.py:
    http_envelope — VERDICT r8 gap 2's revisit-economy surface) over
    arithmetic-generated payloads: status line, verbatim ETag (weak
    and strong), Last-Modified with the RFC 822 date fold (one
    IMPOSSIBLE date proving try_to_date), plain-max-age-not-s-maxage,
    Expires, Location, mixed header-name casing, and non-HTTP payloads
    yielding NULL envelopes. The oracle derives every field from the
    generator arithmetic — independent derivation, not regex replay."""
    from hgraphstorage_spark.sources.warc import http_envelope

    out = http_envelope(_synthetic_http_records(spark, sf_dir))
    return _canon(out, "last_modified_date", "expires_date")


def q_revisit_plan(spark, sf_dir):
    """Server-validator revisit economy (sources/warc.py:revisit_plan)
    over the same synthetic envelopes at pinned as_of=2024-07-15,
    max_interval_days=15: validator preference (etag >
    last-modified > none), If-Modified-Since fetch-date fallback, and
    the full interval precedence — max-age, Expires horizon (negative
    horizons clamp to the floor), the 0.1×age heuristic (future
    Last-Modified falls through to the default), the 7-day default,
    both clamps, next_fetch_date and the due flag; rows with an
    unparseable fetch date carry NULL schedules. Oracle replays the
    precedence CASE and IEEE arithmetic from the generator rules."""
    from hgraphstorage_spark.sources.warc import http_envelope, revisit_plan

    out = revisit_plan(
        http_envelope(_synthetic_http_records(spark, sf_dir)),
        as_of="2024-07-15",
        max_interval_days=15.0,
    )
    # revisit_due canons to string: a NULLable BOOLEAN materializes as
    # None (Spark) vs NaN (DuckDB) through pandas — the same class of
    # representation drift the DECIMAL canon exists for
    return _canon(
        out, "interval_days", "fetch_date", "next_fetch_date", "revisit_due"
    )


def q_revisit_measured(spark, sf_dir):
    """The measured revisit economy (VERDICT r9 task 4): url_change_rate
    capture history composed INTO revisit_plan via the r10 ``measured``
    arg — where the empirical interval exists it overrides the whole
    declaration/heuristic chain (max-age included), still clamped. Half
    the envelope URLs (doc_id%2==0) get an arithmetic 3-capture history:
    gap 6h on %10==4 (measured 0.25 d — the FLOOR clamp fires), else
    gap 2·(1+doc_id%9) days (2..18 d — 16/18 hit the 15 d CEILING);
    %3==0 histories never change (one digest — interval NULL, so the
    row falls THROUGH to the declaration chain despite having history),
    and odd doc_ids have no history at all. The measured leg runs the
    REAL url_change_rate agg and the REAL surt_key join; the oracle
    derives each leg from the generator arithmetic and replays the same
    precedence CASE — both existing replays, chained."""
    from hgraphstorage_spark.sources.cdx import url_change_rate
    from hgraphstorage_spark.sources.warc import http_envelope, revisit_plan

    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    covered = _t(spark, sf_dir, "documents").select("doc_id").filter(i % 2 == 0)
    caps = covered.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("c")
    )
    gap_sec = F.when(i % 10 == 4, F.lit(21600)).otherwise(
        ((i % 9) + 1) * 2 * 86400
    )
    # 2024-01-01T00:00:00Z = epoch 1704067200 (session tz pinned UTC)
    caps = caps.select(
        F.concat(
            F.lit("com,site"), s(i % 7), F.lit(")/page/"), s(i)
        ).alias("urlkey"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("c") * gap_sec
        ).alias("fetch_ts"),
        F.when(i % 3 == 0, F.lit("same"))
        .otherwise(F.concat(F.lit("d"), s(F.col("c"))))
        .alias("digest"),
    )
    out = revisit_plan(
        http_envelope(_synthetic_http_records(spark, sf_dir)),
        as_of="2024-07-15",
        max_interval_days=15.0,
        measured=url_change_rate(caps),
    )
    return _canon(
        out, "interval_days", "fetch_date", "next_fetch_date", "revisit_due"
    )


def _synthetic_cdxj_lines(spark, sf_dir):
    """Arithmetic-generated CDXJ index lines — ONE home for the
    q_cdx_ingest / q_cdx_plan generators and their SQL twins. Per
    doc_id: the url carries www / :443 / unsorted-arg / uppercase-path
    variants (so the SURT canonicalization is live — the oracle derives
    the CANONICAL key arithmetically, never replaying the transform),
    the 14-digit timestamp is valid except %13==7 (month 13 — the
    try-parse NULL), and the JSON block carries status 404 on %9==0
    (else 200), offsets (id%20)·3000 inside filename shard<id%5>, and
    lengths (id%50+1)·100 — overlaps, adjacencies, and >2000-byte gaps
    all occur, so the fetch-plan coalescing has live islands."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    from hgraphstorage_spark.sources.cdx import surt_key

    url = F.concat(
        F.lit("https://"),
        F.when(i % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), s(i % 7), F.lit(".com"),
        # :443 is the default-port strip; :8080 (disjoint: %12==2 implies
        # %3==2) keeps the r10 SURT port placement live in the hash — the
        # key must read 'com,siteN:8080)/...', port AFTER the reversed
        # labels, or lookups against pywb/CC-built indexes miss
        F.when(i % 3 == 0, F.lit(":443"))
        .when(i % 12 == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(i % 4 == 2, F.lit("/P/")).otherwise(F.lit("/p/")),
        s(i),
        F.when(i % 2 == 0, F.concat(F.lit("?b=2&a="), s(i % 5)))
        .when(i % 5 == 1, F.lit("?z=1"))
        .otherwise(F.lit("")),
    )
    ts14 = F.when(i % 13 == 7, F.lit("20241399000000")).otherwise(
        F.concat(
            F.lit("2024"), F.lpad(s(i % 12 + 1), 2, "0"),
            F.lpad(s(i % 28 + 1), 2, "0"), F.lit("12"),
            F.lpad(s(i % 60), 2, "0"), F.lit("00"),
        )
    )
    json_block = F.concat(
        F.lit('{"url": "'), url,
        F.lit('", "status": "'),
        F.when(i % 9 == 0, F.lit("404")).otherwise(F.lit("200")),
        F.lit('", "mime": "'),
        F.when(i % 2 == 0, F.lit("text/html")).otherwise(F.lit("application/json")),
        F.lit('", "digest": "sha1:'), s(i),
        F.lit('", "length": "'), s((i % 50 + 1) * 100),
        F.lit('", "offset": "'), s((i % 20) * 3000),
        F.lit('", "filename": "shard'), s(i % 5), F.lit('.warc.gz"}'),
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(surt_key(url), F.lit(" "), ts14, F.lit(" "), json_block).alias("line"),
    )


def q_cdx_ingest(spark, sf_dir):
    """CDXJ index parsing (sources/cdx.py:parse_cdxj + surt_key) over
    arithmetic-generated lines: typed fields, the 14-digit timestamp
    fold (one impossible month proving the try-parse), and the SURT
    urlkey — the oracle derives the CANONICAL key from the generator
    arithmetic (www / default-port / arg-order / case variants all
    collapse), so the canonicalization is certified by independent
    derivation, not replay. The EXTERNAL-conformance shard (r11:
    fixtures/external/cc_index.cdxj — Common Crawl index-server-layout
    lines carrying the field inventory our writer never emits:
    mime-detected, languages, redirect, warc/revisit) is unioned in
    under negative doc_ids (by sorted line order), so parsing the
    published convention is LIVE in the driver hash; its oracle rows
    are literals certified by tests/test_external_conformance.py
    (incl. byte-equality of surt_key(url) with the external urlkey)."""
    from pyspark.sql import Window

    from hgraphstorage_spark.sources.cdx import parse_cdxj

    ext_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "external", "cc_index.cdxj",
    )
    ext = spark.read.text(ext_path).select(
        (-F.row_number().over(Window.orderBy("value"))).cast("long").alias(
            "doc_id"
        ),
        F.col("value").alias("line"),
    )
    out = parse_cdxj(_synthetic_cdxj_lines(spark, sf_dir).unionByName(ext))
    return _canon_ts(out, "fetch_ts")


def q_cdx_plan(spark, sf_dir):
    """Byte-range fetch planning (sources/cdx.py:cdx_fetch_plan) over
    the parsed CDX frame filtered to status 200 (plan exactly what you
    want — the filter-first contract), gap threshold 2000 bytes:
    overlapping and adjacent records coalesce, >gap offsets start new
    ranges, per-shard independence. Oracle replays the running-max
    island detection as SQL window functions over the arithmetic
    offsets."""
    from hgraphstorage_spark.sources.cdx import cdx_fetch_plan, parse_cdxj

    cdx = parse_cdxj(_synthetic_cdxj_lines(spark, sf_dir)).filter(
        F.col("status") == 200
    )
    return cdx_fetch_plan(cdx, max_gap_bytes=2000)


def q_cdx_export(spark, sf_dir):
    """CDXJ interchange OUT (sources/cdx.py:format_cdxj — the r9
    VERDICT's missing write half): parse the synthetic CDXJ lines, then
    render the typed frame back to canonical lines a pywb/CC consumer
    reads — urlkey + timestamp14 (the impossible-month string passes
    through VERBATIM, proving ts14 precedence over the NULL fetch_ts)
    + compact JSON with numeric status/length/offset. The oracle
    derives every byte of the line arithmetically (canonical urlkey
    incl. the :8080 port placement, the JSON field order/quoting of
    to_json's canonical output) — so format_cdxj is certified by
    independent derivation; parse∘format == identity is the pytest
    law."""
    from hgraphstorage_spark.sources.cdx import format_cdxj, parse_cdxj

    return format_cdxj(parse_cdxj(_synthetic_cdxj_lines(spark, sf_dir)))


def _colliding_envelopes(spark, sf_dir):
    """The synthetic envelope frame with target URIs remapped onto 40
    colliding keys (`/p/<doc_id%40>`) — validator state needs GROUPS
    to certify the argmax; the untouched synthetic URIs are unique per
    doc. One home for the batch and stream validator rows."""
    from hgraphstorage_spark.sources.warc import http_envelope

    i = F.col("doc_id")
    return http_envelope(_synthetic_http_records(spark, sf_dir)).withColumn(
        "target_uri",
        F.concat(F.lit("https://coll.example.com/p/"), (i % 40).cast("string")),
    )


def q_validator_state(spark, sf_dir):
    """Per-URL current validator state (sources/warc.py:
    validator_state) over the colliding synthetic envelopes: per URL
    the lexicographic-max (fetch, etag, last_modified, status)
    observation — the mergeable, idempotent register law the streaming
    twin relies on. Oracle replays the max(concat_ws)+split mechanism
    over the independently-derived envelope CTE."""
    from hgraphstorage_spark.sources.warc import validator_state

    return validator_state(_colliding_envelopes(spark, sf_dir))


def q_stream_validator(spark, sf_dir):
    """The validator register INCREMENTALLY MAINTAINED as a real
    structured stream (streaming/ingest.py:stream_validator_register):
    the same colliding envelope rows flow through 4 file-triggered
    micro-batches, each batch's per-URL max merging into the persisted
    register with the crash-safe swap. Because the merge is a pure
    lexicographic MAX (idempotent + associative — no batch-id
    bookkeeping at all), the register equals the batch
    validator_state row EXACTLY — the oracle IS the batch row's oracle
    (the stream == batch certificate)."""
    import shutil
    import tempfile

    from hgraphstorage_spark.streaming import stream_validator_register

    env = _colliding_envelopes(spark, sf_dir).select(
        "target_uri", "warc_date", "etag", "last_modified", "http_status"
    )
    tmp = tempfile.mkdtemp(prefix="hgs_validator_stream_")
    try:
        env.repartition(4).write.mode("overwrite").parquet(f"{tmp}/src")
        stream = (
            spark.readStream.schema(env.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src")
        )
        q = stream_validator_register(stream, f"{tmp}/ckpt", f"{tmp}/regs")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.read.parquet(f"{tmp}/regs")
        # materialization boundary: the temp register files are deleted
        # on exit, so the returned frame must not re-read them lazily
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_change_rate(spark, sf_dir):
    """Empirical per-URL change economics (sources/cdx.py:
    url_change_rate) over the synthetic CDX captures remapped onto 40
    colliding keys with digests cycling doc_id%120 (≈3 versions per
    key), NULL digests every %11==5 (ignored by the version count),
    NULL timestamps every %13==7 (ignored by the span), sparse
    single-capture 'solo' keys (%777==5) whose change_rate is NULL —
    no revisit evidence — and multi-capture 'nd' keys (%100==7) whose
    digests are ALL NULL, so n_versions=0 and the r10 guard must emit
    NULL, never the negative (0−1)/(n−1) rate (r9 ADVICE fix, live in
    the hash). Oracle replays the counts/span/ratio arithmetic from
    the generator rules."""
    from hgraphstorage_spark.sources.cdx import parse_cdxj, url_change_rate

    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    cdx = parse_cdxj(_synthetic_cdxj_lines(spark, sf_dir)).select(
        F.when(i % 777 == 5, F.concat(F.lit("solo"), s(i)))
        # 'nd' keys (%100==7, several captures per key at driver SF):
        # EVERY capture's digest is NULL below, so n_versions=0 — the
        # r10 guard must emit NULL change_rate, never the negative
        # (0-1)/(n-1) the unguarded formula produced (r9 ADVICE fix,
        # live in the hash)
        .when(i % 100 == 7, F.concat(F.lit("nd"), s(F.floor(i / 100) % 2)))
        .otherwise(F.concat(F.lit("k"), s(i % 40)))
        .alias("urlkey"),
        "fetch_ts",
        F.when((i % 11 == 5) | (i % 100 == 7), F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("sha1:"), s(i % 120)))
        .alias("digest"),
    )
    return _canon_ts(
        _canon(
            url_change_rate(cdx), "change_rate", "est_change_interval_days"
        ),
        "first_ts",
        "last_ts",
    )


def q_cdx_roundtrip(spark, sf_dir):
    """The WARC random-access loop under the driver hash
    (sources/cdx.py:warc_record_index → cdx_fetch_plan →
    read_warc_ranges) over the committed byte-deterministic fixture
    shards (crawl.warc.gz + the r10 wire-encoding sibling
    crawl2.warc.gz): index each shard (compressed gzip-member spans —
    what real CDX offsets mean), plan the response records at gap 0
    (adjacent members coalesce per shard; the one behind the request
    record stays alone), execute the plan as seek+read, and
    return each fetched record joined back to its index row. The
    oracle is the expected row set as literals (offsets/lengths are
    properties of the committed bytes; payload md5s of the fetched
    bodies prove the ranged read returned the exact record bytes —
    a wrong span or a misparsed member cannot hash equal). r11: the
    span/md5 literals are RE-DERIVED by the independent stdlib member
    walk in tests/test_wet_independent.py, so the literal form is
    certified the same way wet_export's is."""
    from hgraphstorage_spark.sources.cdx import (
        cdx_fetch_plan,
        read_warc_ranges,
        warc_record_index,
    )

    fdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    idx = warc_record_index(spark, fdir)
    wanted = idx.filter(F.col("warc_type") == "response")
    plan = cdx_fetch_plan(wanted, max_gap_bytes=0)
    fetched = read_warc_ranges(spark, plan).select(
        "target_uri", F.md5("payload").alias("payload_md5")
    )
    return wanted.select("urlkey", "offset", "length", "target_uri").join(
        fetched, "target_uri"
    ).select("urlkey", "offset", "length", "target_uri", "payload_md5")


def q_wet_export(spark, sf_dir):
    """WET interchange certified end-to-end over the committed fixture
    shard (sources/warc.py:wet_records + write_warc — the Common Crawl
    *.warc.wet convention, the text sibling of cdx_export's index
    interchange): derive conversion records from the fixture responses
    (both shards — crawl2's chunked+gzipped and latin-1 records keep
    the r10 decode tiers live in the WET payload md5s),
    WRITE them as a gzip-member WET shard, re-read the written bytes
    with the ordinary WARC reader, and return per page the target URI,
    the WARC-Refers-To source id, the payload byte count, and the md5
    of the re-read extracted text. The oracle is the expected rows as
    literals — extraction output and record ids are properties of the
    committed fixture bytes (independently derivable by any WARC+WET
    toolchain over fixtures/), so a wrong extraction, a lost header, or
    a write/read framing bug cannot hash equal."""
    import shutil
    import tempfile

    from hgraphstorage_spark.sources.warc import read_warc, wet_records, write_warc

    fdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    tmp = tempfile.mkdtemp(prefix="hgs_wet_export_")
    try:
        wet = wet_records(read_warc(spark, fdir))
        write_warc(wet.coalesce(1), tmp, compress=True).collect()
        back = read_warc(spark, tmp).select(
            "target_uri",
            F.col("headers")["warc-refers-to"].alias("refers_to"),
            F.col("content_length").alias("n_bytes"),
            F.md5("payload").alias("text_md5"),
        )
        # materialization boundary: the temp shard is deleted on exit
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_wet_ingest(spark, sf_dir):
    """WET interchange IN (r11 — the ingest sibling of wet_export's
    emit): read the EXTERNALLY-laid-out Common Crawl WET shard
    (fixtures/external/cc_sample.warc.wet.gz — warcinfo preamble +
    conversion records with WARC-Block-Digest /
    WARC-Identified-Content-Language headers, member-per-record gzip,
    bytes assembled from the published format by
    tools/make_fixture_external.py, NOT by this repo's writer) with the
    ordinary read_warc, and report per record the type, target URI,
    payload byte count, sha1 of the payload bytes, the identified
    language, and the Block-Digest header VERBATIM. The oracle rows are
    literals — properties of the committed external bytes;
    tests/test_external_conformance.py independently re-verifies the
    base32 digests against the payloads, so a payload mutation, a lost
    header, or a framing bug cannot hash equal."""
    from hgraphstorage_spark.sources.warc import read_warc

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "external", "cc_sample.warc.wet.gz",
    )
    recs = read_warc(spark, path)
    return recs.select(
        "rec_idx",
        "warc_type",
        "target_uri",
        "content_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha1("payload").alias("sha1_hex"),
        F.col("headers")["warc-identified-content-language"].alias("lang"),
        F.col("headers")["warc-block-digest"].alias("block_digest"),
    )


def q_crawl_frontier(spark, sf_dir):
    """The crawl-tier CAPSTONE composition (sources/warc.py:
    crawl_frontier): outbound links from the anchored synthetic pages →
    per-URL inlink demand → the RFC 9309 robots gate (fixture rules,
    longest-match precedence) → per-host politeness delays
    (robots_extras) → sitemap hints with the r8 FRESHNESS term
    (lastmod/changefreq → recrawl_due, as_of pinned so the oracle
    replays) → deterministic per-host fetch ranking. The synthetic
    sitemap covers each /p{k+1} link target with an arithmetic lastmod
    (2024-01-01..28) and a changefreq cycling hourly/daily/weekly/
    never/monthly by k%5 — so clamped, fractional, zero, and no-entry
    freshness values are all live in the hash. The oracle composes the
    SAME pieces: the extract_links arithmetic derivation, one count
    agg, the shared robots rules chain, the hand-derived crawl-delay
    rows, the freshness fold, and the identical masked
    host-partitioned rank — certifying the tier's WIRING, not just its
    stages."""
    from hgraphstorage_spark.sources.warc import (
        crawl_frontier,
        extract_links,
        parse_robots,
        robots_extras,
    )

    links = extract_links(_anchored_pages(spark, sf_dir))
    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "domain string, robots_txt string")
    sm = _frontier_sitemap(spark, sf_dir)
    out = crawl_frontier(
        links,
        parse_robots(robots, agent="trainbot"),
        extras=robots_extras(robots, agent="trainbot"),
        sitemap_entries=sm,
        as_of="2024-03-01",
    )
    return _canon(out, "sitemap_priority")


def _frontier_sitemap(spark, sf_dir) -> DataFrame:
    """The arithmetic synthetic sitemap shared by the batch and stream
    crawl-frontier rows (one home — the stream == batch certificate
    depends on both composing identical hints): one entry per /p{k+1}
    link target with lastmod 2024-01-01..28, changefreq cycling
    hourly/daily/weekly/never/monthly by k%5, priority 0.(k%10)."""
    docs = _t(spark, sf_dir, "documents")
    kk = F.col("k")
    return (
        docs.select(F.floor(F.col("doc_id") / 2).cast("long").alias("k"))
        .distinct()
        .select(
            F.lit("url").alias("kind"),
            F.concat(
                F.lit("https://site"), ((kk + 1) % 7).cast("string"),
                F.lit(".com/p"), (kk + 1).cast("string"),
            ).alias("loc"),
            F.concat(
                F.lit("2024-01-"),
                F.lpad(((kk * 7) % 28 + 1).cast("string"), 2, "0"),
            ).alias("lastmod"),
            F.when(kk % 5 == 0, F.lit("hourly"))
            .when(kk % 5 == 1, F.lit("daily"))
            .when(kk % 5 == 2, F.lit("weekly"))
            .when(kk % 5 == 3, F.lit("never"))
            .otherwise(F.lit("monthly"))
            .alias("changefreq"),
            F.concat(F.lit("0."), (kk % 10).cast("string"))
            .cast("decimal(3,1)")
            .alias("priority"),
        )
    )


def q_stream_crawl_frontier(spark, sf_dir):
    """The crawl frontier INCREMENTALLY MAINTAINED as a real structured
    stream (streaming/ingest.py:stream_crawl_frontier): the same
    synthetic link rows as the batch capstone flow through 4
    file-triggered micro-batches, each batch's per-(url, src) counts
    merging into the persisted register table with the crash-safe
    atomic swap; the frontier then re-ranks from the register
    (frontier_agg_from_register → warc.frontier_compose with the same
    robots gate / delays / sitemap freshness). Because n_inlinks is an
    additive sum and n_sources an exact distinct over the register,
    the result equals the batch crawl_frontier row EXACTLY — the
    oracle IS the batch row's oracle (the stream == batch
    certificate)."""
    import shutil
    import tempfile

    from hgraphstorage_spark.sources.warc import (
        extract_links,
        frontier_compose,
        parse_robots,
        robots_extras,
    )
    from hgraphstorage_spark.streaming import (
        frontier_agg_from_register,
        stream_crawl_frontier,
    )

    links = extract_links(_anchored_pages(spark, sf_dir)).select("url", "link_url")
    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "domain string, robots_txt string")
    sm = _frontier_sitemap(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="hgs_frontier_stream_")
    try:
        links.repartition(4).write.mode("overwrite").parquet(f"{tmp}/src")
        stream = (
            spark.readStream.schema(links.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src")
        )
        q = stream_crawl_frontier(stream, f"{tmp}/ckpt", f"{tmp}/regs")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = frontier_compose(
            frontier_agg_from_register(spark, f"{tmp}/regs"),
            parse_robots(robots, agent="trainbot"),
            extras=robots_extras(robots, agent="trainbot"),
            sitemap_entries=sm,
            as_of="2024-03-01",
        )
        # materialization boundary: the temp register files are deleted
        # on exit, so the returned frame must not re-read them lazily
        out = spark.createDataFrame(out.collect(), out.schema)
        return _canon(out, "sitemap_priority")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_stream_freshness(spark, sf_dir):
    """The freshness-hint register INCREMENTALLY MAINTAINED as a real
    structured stream (streaming/ingest.py:stream_sitemap_hints —
    VERDICT r8 task 5 closes: demand AND freshness are now both
    register-maintained): the batch capstone's sitemap entries PLUS one
    stale decoy per URL (lastmod 2023-12-xx, changefreq 'yearly',
    priority NULL — each must LOSE its column's fold) flow through 4
    file-triggered micro-batches, every batch collapsing into the
    persisted per-URL register under frontier_compose's own
    latest-lastmod / first-changefreq / max-priority law (pure
    per-column MAX/MIN — idempotent + associative, zero batch
    bookkeeping, crash-safe swap). The frontier then composes from the
    REGISTER with the same demand/gate/delays, and must equal the
    batch crawl_frontier row with the CLEAN hints bit-for-bit — the
    oracle IS the batch row's oracle, so the hash also certifies the
    decoys lost."""
    import shutil
    import tempfile

    from hgraphstorage_spark.sources.warc import (
        crawl_frontier,
        extract_links,
        parse_robots,
        robots_extras,
    )
    from hgraphstorage_spark.streaming import stream_sitemap_hints

    links = extract_links(_anchored_pages(spark, sf_dir))
    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "domain string, robots_txt string")
    sm = _frontier_sitemap(spark, sf_dir)
    decoys = sm.select(
        "kind",
        "loc",
        F.concat(
            F.lit("2023-12-"),
            F.lpad((F.length("loc") % 28 + 1).cast("string"), 2, "0"),
        ).alias("lastmod"),
        F.lit("yearly").alias("changefreq"),
        F.lit(None).cast("decimal(3,1)").alias("priority"),
    )
    entries = sm.unionByName(decoys)
    tmp = tempfile.mkdtemp(prefix="hgs_freshness_stream_")
    try:
        entries.repartition(4).write.mode("overwrite").parquet(f"{tmp}/src")
        stream = (
            spark.readStream.schema(entries.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src")
        )
        q = stream_sitemap_hints(stream, f"{tmp}/ckpt", f"{tmp}/regs")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = crawl_frontier(
            links,
            parse_robots(robots, agent="trainbot"),
            extras=robots_extras(robots, agent="trainbot"),
            sitemap_entries=spark.read.parquet(f"{tmp}/regs"),
            as_of="2024-03-01",
        )
        # materialization boundary: the temp register files are deleted
        # on exit, so the returned frame must not re-read them lazily
        out = spark.createDataFrame(out.collect(), out.schema)
        return _canon(out, "sitemap_priority")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _pii_injection() -> F.Column:
    """The arithmetic PII injection shared by the pii_scrub and
    datasheet rows — one home so the Spark generator and the SQL twin
    (``_PII_INJ_SQL``) cannot drift. Cycles doc_id%9 across all eight
    kinds; the card (%9==4) and IBAN (%9==7) items vary a check digit
    so the Luhn / mod-97 gates decide live."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return (
        F.when(i % 9 == 0, F.concat(F.lit(" mail user"), s(i), F.lit("@example.com now")))
        .when(i % 9 == 1, F.concat(F.lit(" dial (55"), s(i % 10), F.lit(") 123-4567 ok")))
        .when(i % 9 == 2, F.concat(F.lit(" host 10.0."), s(i % 250), F.lit(".7 up")))
        .when(i % 9 == 3, F.concat(F.lit(" ssn 123-45-678"), s(i % 10), F.lit(" case")))
        .when(i % 9 == 4, F.concat(F.lit(" card 41111111111111"), s(i % 10), F.lit("9 paid")))
        .when(i % 9 == 5, F.concat(F.lit(" node fe80::"), s(i % 10), F.lit(" up")))
        .when(
            i % 9 == 6,
            F.concat(
                F.lit(" call +49 170 "),
                F.lpad(s(i % 10000000), 7, "0"),
                F.lit(" ok"),
            ),
        )
        .when(i % 9 == 7, F.concat(F.lit(" acct DE8937040044053201300"), s(i % 10), F.lit(" end")))
        .otherwise(F.lit(" ref 4111111111111112 inv"))
    )


_PII_INJ_SQL = (
    "CASE"
    " WHEN doc_id % 9 = 0 THEN ' mail user' || doc_id || '@example.com now'"
    " WHEN doc_id % 9 = 1 THEN ' dial (55' || (doc_id % 10) || ') 123-4567 ok'"
    " WHEN doc_id % 9 = 2 THEN ' host 10.0.' || (doc_id % 250) || '.7 up'"
    " WHEN doc_id % 9 = 3 THEN ' ssn 123-45-678' || (doc_id % 10) || ' case'"
    " WHEN doc_id % 9 = 4 THEN ' card 41111111111111' || (doc_id % 10) || '9 paid'"
    " WHEN doc_id % 9 = 5 THEN ' node fe80::' || (doc_id % 10) || ' up'"
    " WHEN doc_id % 9 = 6 THEN ' call +49 170 '"
    " || lpad((doc_id % 10000000)::VARCHAR, 7, '0') || ' ok'"
    " WHEN doc_id % 9 = 7 THEN ' acct DE8937040044053201300' || (doc_id % 10) || ' end'"
    " ELSE ' ref 4111111111111112 inv' END"
)


def q_pii_scrub(spark, sf_dir):
    """PII redaction pass (pipeline/pii.py:pii_scrub): every document
    gets one arithmetic-injected PII item cycling by doc_id%9 across
    all eight kinds — email / US phone / IPv4 / SSN shape / card with a
    VARYING check digit (the Luhn gate decides live which rows redact)
    / compressed IPv6 / E.164 international phone / IBAN with a varying
    last digit (the mod-97 gate decides live) — plus an explicit
    Luhn-INVALID 16-digit invoice that must NOT redact. The scrub must
    produce the per-kind counts and the redacted text (fingerprinted).
    Oracle replays every pattern with regexp_extract_all counts, the
    same sequential global replacements, and the exact checksum folds
    (pii.duckdb_gated_*_sql) for the gated kinds."""
    from hgraphstorage_spark.pipeline.pii import pii_scrub

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), _pii_injection()).alias("text")
    )
    out = pii_scrub(docs)
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_fp"),
        "n_email", "n_ssn", "n_ipv6", "n_ip",
        "n_phone_intl", "n_phone", "n_iban", "n_cc",
    )


def q_page_meta(spark, sf_dir):
    """Page-metadata extraction (sources/warc.py:extract_page_meta) over
    synthetic head sections varied by doc_id arithmetic: mixed-case
    title tags with entities, meta description in BOTH attribute
    orders, canonical links root-relative (resolved against the raw
    synthetic URL's unstripped origin) and absolute, robots meta
    noindex/NOFOLLOW, and absent-field NULLs. Oracle derives every
    expected value from the generator arithmetic — independent
    derivation, not regex replay."""
    from hgraphstorage_spark.sources.warc import extract_page_meta

    docs = _with_synthetic_urls(_t(spark, sf_dir, "documents"))
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    title = F.concat(F.lit("<tItLe>Doc "), s(i), F.lit(" &amp; Co</tItLe>"))
    # the name-first form carries an APOSTROPHE inside its double-quoted
    # value and the content-first form uses SINGLE-quoted attributes —
    # both driver-hash the ADVICE-r7 per-quote-alternate fix (a combined
    # [^"'] class truncated "Bob's summary 3" to "Bob")
    desc = (
        F.when(
            i % 3 != 0,
            F.when(
                i % 2 == 0,
                F.concat(
                    F.lit('<meta name="description" content="Bob\'s summary '),
                    s(i % 7),
                    F.lit('">'),
                ),
            ).otherwise(
                F.concat(
                    F.lit("<meta content='summary "),
                    s(i % 7),
                    F.lit("' name='description'>"),
                )
            ),
        ).otherwise(F.lit(""))
    )
    canon = (
        F.when(
            i % 4 != 1,
            F.when(
                i % 2 == 0,
                F.concat(F.lit('<link rel="canonical" href="/c/'), s(i % 5), F.lit('">')),
            ).otherwise(
                F.concat(
                    F.lit("<link href='https://canon.example.com/"),
                    s(i % 5),
                    F.lit("' rel='canonical'>"),
                )
            ),
        ).otherwise(F.lit(""))
    )
    # i%20==0 exercises the de-facto 'none' token (== noindex,nofollow)
    robots = (
        F.when(
            i % 5 == 0,
            F.when(i % 20 == 0, F.lit('<meta name="robots" content="none">'))
            .when(
                i % 10 == 0, F.lit('<meta name="robots" content="noindex, follow">')
            ).otherwise(F.lit('<meta name="robots" content="NOFOLLOW">')),
        ).otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head>"), title, desc, canon, robots,
        F.lit("</head><body><p>x</p></body></html>"),
    )
    pages = docs.select("doc_id", "url", html.alias("html"))
    return extract_page_meta(pages)



def q_stream_quantile(spark, sf_dir):
    """Streaming quantile registers ACTUALLY RUN as a structured stream
    (streaming/ingest.py:stream_quantile_sketch): events flow through 4
    file-triggered micro-batches, each batch's bottom-k sketch MERGES
    into the persisted register table, and the exact merge law makes
    the final registers equal the batch sketch of every streamed row
    bit-for-bit — so the oracle is the SAME direct one-pass bottom-k +
    percentile_cont replay as the batch quantile_sketch row."""
    import shutil
    import tempfile

    from hgraphstorage_spark.functions.stats import quantile_sketch_estimate
    from hgraphstorage_spark.streaming import load_events, stream_quantile_sketch

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="hgs_qsk_stream_")
    try:
        ev.repartition(4).write.mode("overwrite").parquet(f"{tmp}/src")
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src")
        )
        q = stream_quantile_sketch(
            stream, "value", "event_id", f"{tmp}/ckpt", f"{tmp}/regs",
            group_cols=["event_type"], k=256,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        regs = spark.read.parquet(f"{tmp}/regs")
        out = quantile_sketch_estimate(
            regs, percentiles=(0.25, 0.5, 0.9), group_cols=["event_type"]
        )
        # materialization boundary: the temp register files are deleted
        # on exit, so the returned frame must not re-read them lazily
        out = spark.createDataFrame(out.collect(), out.schema)
        return _canon(out, "p25", "p50", "p90")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_psi_drift(spark, sf_dir):
    """PSI drift report on the n_chars distribution between the even and
    odd doc_id halves of the corpus (a deterministic A/A-style slice —
    the driver row certifies the mechanics: ref-decile bins, Laplace
    smoothing, (p−q)·ln(p/q) contributions; a planted-drift pytest
    certifies the signal). Oracle replays the decile cuts
    (quantile_cont == F.percentile) and the IEEE ln fold."""
    from hgraphstorage_spark.functions.stats import psi_report

    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1)
    return _canon(psi_report(ref, cur, "n_chars", n_bins=10), "contrib")


def q_cms_tokens(spark, sf_dir):
    """Count-Min sketch frequency estimates for the corpus's top-20
    tokens, beside exact counts — the fixed-memory (depth×width cells)
    frequency sketch, deliberately run at width=64 so hash collisions
    are LIVE in the result (est ≥ exact, one-sided). md5-position
    family: the oracle replays every cell and every min-over-rows
    estimate bit-for-bit."""
    from hgraphstorage_spark.functions.stats import cms_estimate, count_min_sketch
    from hgraphstorage_spark.pipeline.text import WS_RE, vocabulary

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), WS_RE)).alias("token")
    ).filter(F.length("token") > 0)
    sketch = count_min_sketch(toks, "token", width=64, depth=4)
    # NOT persisted: the r12 sweep flagged `top`'s two consumers as a
    # duplicate-compute lead, but the r13 watch A/B (VERDICT r12 task 8;
    # two interleaved matched passes, tpch_q1 control flat) measured the
    # 20-row persist 10-20% SLOWER (1.41/1.53 s vs 1.30/1.23 s) — the
    # replayed branch is cheaper than the materialization barrier, the
    # bm25 counter-example again.
    top = vocabulary(docs, top_k=20).select("token", "n_total")
    est = cms_estimate(sketch, top, "token", width=64, depth=4)
    return top.join(est, "token").select("token", "n_total", "est")


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) layout key over events (user_id, value) — the
    multi-dimension data-skipping writer's key (sources.files.write_zorder):
    min-max quantize each column to 16 bits, interleave the bit planes.
    Pure integer/IEEE expressions, so the oracle replays the key
    bit-for-bit (any mismatch = a wrong bit plane)."""
    from hgraphstorage_spark.sources.files import with_zorder_key

    return with_zorder_key(
        _t(spark, sf_dir, "events"), ["user_id", "value"], bits=16
    ).select("event_id", "zkey")


def q_shard_plan(spark, sf_dir):
    """Training-export shard assignment (pipeline/sampling.py:
    shard_plan): pack documents into ~2000-token shards in
    deterministic md5 order via the two-pass distributed prefix sum (no
    corpus-sized sort through one task). Oracle replays the hash-order
    cumsum and the floor-division shard id."""
    from hgraphstorage_spark.pipeline.sampling import shard_plan

    return shard_plan(_t(spark, sf_dir, "documents"), tokens_per_shard=2000)


def q_unimax(spark, sf_dir):
    """UniMax per-language token-budget allocation (pipeline/sampling.py:
    unimax_allocation, Chung et al. 2023): waterfill a 20k-token budget
    across languages with a 2-epoch cap — integer closed form, one
    final division. Oracle replays the prefix-saturation arithmetic.
    The windowed stage runs on the per-language counts table (|langs|
    rows, driver-size by construction — the corpus-sized agg happens
    upstream with map-side partials)."""
    from hgraphstorage_spark.pipeline.sampling import unimax_allocation
    from hgraphstorage_spark.pipeline.text import _n_tokens

    counts = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum(_n_tokens(F.col("text"))).cast("long").alias("available"))
    )
    return _canon(unimax_allocation(counts, budget=20000, max_epochs=2), "alloc")


# ---------------------------------------------------------------------------
# driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_traversal_out_values(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Insertion order is deliberate: the correctness driver evaluates the
    FIRST 50 entries, so the window carries (1) the canonicalized
    analytical/graph queries, (2) the SURVEY §2 reference-surface core,
    (3) hackage ingest + a compressed graph-analytics summary, and (4) the
    LLM-data-pipeline operators (dedup / similarity / text analysis /
    sampling-mixing). Entries past #50 are the expanded per-node variants
    and secondary SQL surface — all still value-compared against the same
    oracles by tests/test_oracle_parity.py."""
    return {
        # -- canonicalized analytical + iterative-graph queries (1-12) --
        # r11 twenty-third rotation (VERDICT r10 task 3: start draining
        # the never-hashed backlog): the tpch trio rotates past the
        # window after TEN straight green contacts — all three stay in
        # bench.py's headline every round, and the relational family
        # keeps a driver row via the incoming tpch_q2_like
        # correlated-min join; the slots carry the events SQL surface
        # the driver has never touched — the hourly time-bucket rollup
        # and the DTJSON events_json row (the one §2 surface VERDICT
        # r10 flagged as never-hashed, F1)
        "tpch_q2_like": q_tpch_q2_like,
        "events_hourly": q_events_hourly,
        "events_json": q_events_json,
        # r6 rotation (VERDICT r5 task 1): window_top_order /
        # rollup_revenue / retention_cohorts — r1-stable, hashed green
        # every round, family-covered in-window (ntile_deciles keeps
        # window functions, the tpch rows keep aggregation, and
        # streaming_summary keeps the events surface) — rotate past the
        # window; their slots carry the r5 profiling family the driver
        # has never hashed: the one-pass correlation matrix, the
        # broadcast-bounds numeric histogram, and Newman modularity over
        # the LPA partition
        # r7 twelfth rotation: corr_matrix (hashed green r6; the
        # exact-decimal co-moment fold stays pytest-oracled and the
        # profiling family keeps numeric_histogram + psi_drift +
        # quantile_sketch in-window) gives its slot to the PII
        # redaction pass, in-window the round it was built
        # r11 twenty-third rotation: pii_scrub out after four straight
        # green contacts (r7-r10; the FULL pattern replay — counts on
        # the original text plus the sequential global replacements —
        # stays under its pytest oracle every run, and datasheet's
        # in-window oracle keeps per-source PII incidence live); its
        # slot carries gap-based sessionization, in the never-hashed
        # backlog since its r6 registration
        "sessionize": q_sessionize,
        # r6 sixth rotation: ntile_deciles (red r1, rewritten on the
        # distributed two-pass rank r5, hashed green r4+r5; the rank
        # machinery stays plan-pinned and oracle-covered in pytest) and
        # streaming_summary (hashed green r1-r5; the streaming family
        # keeps FOUR real-stream in-window rows: dsir_stream,
        # stream_heavy_hitters, stream_url_dedup, stream_embed_dedup)
        # rotate past the window; their slots carry gap-based
        # sessionization 'gap_sessions' (itself a keyed-window operator —
        # the family's evidence continues; the session_window streaming
        # flavor keeps its original 'sessionize' row past the window) and
        # the IR-eval metric report, in-window the round they were built
        # r7 twelfth rotation: gap_sessions (hashed green r6; the keyed
        # lag+running-sum shape stays via the past-window sessionize
        # pytest oracle and in-window rollup_merge; streaming keeps four
        # real-stream rows) gives its slot to page-metadata extraction
        # r11 twenty-third rotation: page_meta out after four straight
        # green contacts (r7-r10; extraction keeps structured_md +
        # extract_links in-window and the tag-first meta machinery
        # stays under its pytest oracle); its slot carries the as-of
        # join — the temporal-join family's first driver contact
        "asof_join": q_asof_join,
        # r12 twenty-fourth rotation: numeric_histogram out after six
        # straight green contacts (r6-r11; the broadcast-bounds
        # histogram machinery stays under its pytest oracle and the
        # profiling family keeps datasheet in-window); its slot carries
        # the per-doc character-entropy report — a benched-every-round
        # headline whose latent DECIMAL canon bug the r11 all-rows
        # sweep caught; this driver contact is the confirmation
        # (VERDICT r11 task 2)
        "char_entropy": q_char_entropy,
        # cube_revenue moved past the window (still oracle-checked in
        # pytest): it is a near-duplicate of rollup_revenue, and its slot
        # carries the §2.10 streaming evidence instead
        # r11 twenty-third rotation: search_eval out after five straight
        # green contacts (r6-r10; the full BM25 scoring replay stays in
        # its pytest oracle and bench times hybrid_search every round);
        # its slot carries the banded range join — never driver-hashed
        "range_join": q_range_join,
        # r8 fifteenth rotation (VERDICT r7 task 2): modularity (hashed
        # green r6+r7; the analytics family keeps hits + link_graph
        # in-window and graph_summary compresses every algorithm to
        # pytest-oracled scalars) rotates past the window; its slot
        # carries the per-source dataset datasheet — the one registered
        # row the driver had never hashed — extended this round with
        # per-source PII incidence (live checksum gates) and the
        # URL-dedup duplicate rate
        "datasheet": q_datasheet,
        # r7 rotation (VERDICT r6 task 1): pagerank (hashed green r1-r6
        # — six straight contacts; the analytics family keeps modularity
        # + hits + link_graph in-window, and graph_summary compresses
        # every algorithm to pytest-oracled scalars) rotates past the
        # window; its slot carries the corpus snapshot diff — the
        # fingerprint-projection full-outer join between two crawl dumps
        # r12 twenty-fourth rotation: corpus_diff out after five
        # straight green contacts (r7-r11; the full-outer fingerprint
        # diff stays under its pytest oracle); its slot keeps the
        # cross-corpus surface via cross_source_overlap — the pairwise
        # source-containment report, benched every round yet never
        # driver-hashed (VERDICT r11 task 2)
        "cross_source_overlap": q_cross_source_overlap,
        # r5 second rotation: personalized_pagerank / link_prediction /
        # harmonic_centrality move past the window — their families stay
        # driver-hashed via pagerank + graph_summary (which compresses
        # every analytics algorithm to a checked scalar) — and their
        # slots carry three second-half r5 operators
        # r6 eighth rotation: simhash_pairs (hashed green r5; the
        # generic 64-bit banded-Hamming core stays in-window via
        # media_pairs), perplexity_buckets and quality_reasons (hashed
        # green r5; the quality family keeps nb_quality, domain_quality
        # and calibration in-window, and the quality_filter rule exprs
        # run inside the domain_quality oracle) rotate past the window;
        # their slots carry sentence segmentation, sentence-level corpus
        # dedup, and the Flesch/FK readability report — in-window the
        # round they were built
        # r7 rotation: sentences (hashed green r6; the SAME terminator
        # machinery runs inside the in-window sentence_dedup oracle every
        # driver round) rotates past the window; its slot carries the
        # FIM infilling transform so the driver hashes the
        # training-transform family's newest member
        # r10 twenty-second rotation: fim (hashed green r7-r9, three
        # straight contacts; the infilling replay stays under its full
        # pytest oracle and the training-transform family keeps
        # unimax_mix + topic_split in-window) gives its slot to CDXJ
        # interchange OUT — format_cdxj, the write half of the index
        # tier, in-window the round it was built
        "cdx_export": q_cdx_export,
        # r7 eleventh rotation: sentence_dedup (hashed green r6; the
        # sentence-terminator machinery stays in-window inside the
        # readability oracle, and the hash-keyed unit-dedup counting
        # shape arrives stronger below) rotates past the window; its
        # slot carries paragraph-mode corpus boilerplate removal —
        # the remove-ALL-occurrences rule at the blank-run granularity,
        # in-window the round it was built
        # r12 twenty-fourth rotation: boilerplate_paragraph out after
        # five straight green contacts (r7-r11; the blank-run paragraph
        # split + remove-all rule stays under its pytest oracle and the
        # text family keeps structured_md + phrase_filter + flagged_
        # filter in-window); its slot keeps the repetition surface via
        # repetition_exact — the exact-window repeated-substring gate,
        # benched every round yet never driver-hashed (VERDICT r11
        # task 2)
        "repetition_exact": q_repetition_exact,
        # r10 twenty-second rotation: readability (hashed green r6-r9,
        # FOUR straight contacts; its ENTIRE per-doc replay now also
        # runs inside the in-window datasheet v3 oracle as the
        # mean_fk_grade column, so the machinery stays driver-checked
        # every round) gives its slot to the multi-word phrase
        # blocklist gate — a declared r10 candidate, driver-hashed now
        "phrase_filter": q_phrase_filter,
        # -- SURVEY §2 reference-surface core + r4/r5 rotation (13-31) --
        # r5 window refresh (VERDICT r4 task 1): scan_nodes_by_label /
        # filter_relations / list_properties / traversal_in /
        # traversal_oute_props / edges_to_nodes / index_prefix — all
        # trivially stable since r1 — rotate past the window (still
        # oracle-compared every pytest run); their slots carry the seven
        # r4 operators the driver has never hashed: Broder containment,
        # Efraimidis-Spirakis weighted sampling, the LSH recall
        # pre-flight, unicode-script routing stats, epoch shuffle,
        # length-bucketed batching, and IVF-PQ ANN
        # r5 late rotation: filter_objects_has / traversal_out_values /
        # multi_hop / query_step (r1-stable, pytest-pinned at
        # tests/test_traversal.py + test_oracle_parity.py) move past the
        # window; their slots carry the four round-5 operators so the
        # driver hashes DSIR importance weights, Gumbel-top-k DSIR
        # sampling, BPE merge training, and the quality-aware dedup
        # keeper on first contact
        # r6 eighth rotation (cont.): dsir_weights (hashed green r5; the
        # bucket-model scoring chain runs as the batch twin inside the
        # in-window dsir_stream oracle) rotates past the window; its
        # slot carries the equi-depth quantile histogram built on the
        # distributed two-pass rank
        # r7 eleventh rotation: quantile_histogram (hashed green r6; the
        # distributed two-pass rank stays in-window inside the
        # curriculum oracle) gives its slot to the mergeable bottom-k
        # quantile register family, whose driver row certifies the
        # merge law itself; vocab_drift (hashed green r6; the drift
        # family keeps psi_drift in-window) gives its slot to the BPE
        # fertility report, whose oracle unrolls the full merge fold
        # r7 fourteenth swap: the batch quantile_sketch row gives its
        # slot to its STREAM twin — the strictly stronger certificate
        # (same oracle, but the registers are produced by a REAL
        # 4-micro-batch foreachBatch merge, so the driver hash also
        # proves stream == batch via the exact merge law); the batch
        # build/merge/estimate machinery is exactly what the stream row
        # executes per batch
        # r11 twenty-third rotation: stream_quantile out after four
        # straight green contacts (r7-r10; the mergeable bottom-k
        # register law stays pytest-certified, the sketch family keeps
        # stream_hll in-window, and the quantile cuts run inside the
        # in-window numeric_histogram oracle); its slot carries the
        # interval join — overlap semantics, never driver-hashed
        "interval_join": q_interval_join,
        # r6 third rotation: incremental_near_dup / weighted_sample
        # (hashed green r4+r5+r6-replica; the dedup family keeps six
        # in-window rows and sampling keeps the DSIR pair + the
        # incoming shard_plan/unimax) rotate past the window; their
        # slots carry the corpus-drift monitor and the training-export
        # shard planner
        # r11 twenty-third rotation: tokenizer_fertility out after four
        # straight green contacts (r7-r10; the BPE train/apply chain
        # stays under tests/test_dsir_bpe.py's oracle and the text
        # family keeps phrase_filter + flagged_filter + datasheet
        # in-window); its slot carries kmeans-bucketed SEMANTIC dedup —
        # the highest-traffic never-hashed row (benched every round
        # since r5, driver contact now)
        "semantic_dedup": q_semantic_dedup,
        # r6 rotation: sq_topk (hashed green r4+r5; the similarity
        # family keeps similarity_topk/pq_topk/ivfpq_topk in-window),
        # lsh_recall_report (hashed r5; replaced by its vector twin
        # ann_recall), and script_stats (hashed r5; the text-routing
        # family keeps lang_id/content_type/quality_reasons plus the
        # incoming lang_confusion) rotate past the window; their slots
        # carry the streaming DSIR scorer run as a REAL multi-batch
        # stream, the lang-id confusion matrix, and the IVF recall
        # pre-flight — all r5 operators the driver has never hashed
        # r7 rotation: dsir_stream (hashed green r6; its batch-twin DSIR
        # scoring chain stays pytest-oracled and the streaming family
        # keeps FOUR in-window real-stream rows: stream_topics,
        # stream_url_dedup, stream_embed_dedup, and the incoming
        # stream_hll) rotates past the window; its slot carries the
        # streaming HLL distinct-count — a REAL multi-batch stream whose
        # register law the batch hll_distinct oracle replays
        # r12 twenty-fourth rotation: stream_hll out after five straight
        # green contacts (r7-r11; the HLL register/merge law stays
        # pytest-certified under tests/test_stats.py and the streaming
        # family keeps stream_freshness + stream_validator +
        # stream_crawl_frontier in-window); its slot carries
        # stream_enrich — the stream-static broadcast-join enrichment
        # pattern, benched every round yet never driver-hashed
        # (VERDICT r11 task 2)
        "stream_enrich": q_stream_enrich,
        # r6 second rotation: containment_pairs / epoch_shuffle /
        # length_batches / boilerplate_dedup (all hashed green in r5,
        # their families staying in-window via minhash/simhash pairs,
        # weighted_sample, and the quality rows) rotate past the
        # window; their slots carry the crawl-ingest story the driver
        # had zero contact with — the WARC fixture read, URL dedup,
        # the media banded-Hamming pair core, and the Misra-Gries
        # heavy-hitter stream run as a REAL multi-batch stream
        # r11 twenty-third rotation: url_dedup out after five straight
        # green contacts (r6-r10; the canonical-trust keeper argmax
        # stays under its pytest oracle, the dedup family keeps
        # fuzzy_decontaminate + stream_embed_dedup + the incoming
        # semantic_dedup in-window, and the URL normalization runs
        # inside the crawl_frontier oracle); its slot carries
        # pack_sequences — the training-batch packing transform, in the
        # never-hashed backlog since r4
        "pack_sequences": q_pack_sequences,
        # r7 twelfth rotation: shard_plan (hashed green r6; the two-pass
        # distributed prefix sum runs in-window inside curriculum's rank
        # chain) gives its slot to sitemap-protocol ingestion
        "sitemap_ingest": q_sitemap_ingest,
        # r7 rotation: zorder_key and cms_tokens (both hashed green r6 on
        # first contact; the Morton-key exprs stay pytest-oracled and the
        # sketch family keeps hll_distinct + psi_drift + the incoming
        # stream_hll in-window) rotate past the window; their slots carry
        # the two parquet-layout flagships the driver has never hashed —
        # executor-side footer row-group stats and the stats-vs-predicate
        # skipping report (oracle = DuckDB's own parquet_metadata(), an
        # independent implementation of the same footer read)
        # r12 twenty-fourth rotation: rowgroup_stats + skipping_report
        # out after five straight green contacts each (r7-r11; the
        # parquet-footer walk and the stats-vs-predicate skip report
        # keep their independent DuckDB parquet_metadata() oracles in
        # pytest); their slots carry the first two of the never-hashed
        # events SQL family (VERDICT r11 task 7) — the per-type event
        # latency percentile report and the ordered 3-step funnel
        "events_percentiles": q_events_percentiles,
        "funnel": q_funnel,
        # r9 nineteenth rotation: psi_drift (hashed green r6-r8, three
        # straight contacts; the drift/sketch family keeps stream_hll +
        # stream_quantile in-window and numeric_histogram keeps the
        # profiling surface) gives its slot to HTTP response-envelope
        # extraction — the revisit-economy surface (VERDICT r8 gap 2),
        # in-window the round it was built
        # r12 twenty-fifth rotation: http_envelope out after three
        # straight green contacts (r9-r11; the envelope extraction
        # stays under its pytest oracle and the revisit economy keeps
        # revisit_measured + change_rate in-window); its slot carries
        # the JSONL interchange roundtrip — export → re-ingest equality
        # certified under the driver hash (a declared r13 candidate
        # landed a round early)
        "jsonl_roundtrip": q_jsonl_roundtrip,
        # r9: link_graph (hashed green r6-r8; the link surface keeps
        # extract_links + crawl_frontier + domain_stats in-window, and
        # the graph-analytics family gains the two incoming HyperBall
        # rows) gives its slot to the server-validator revisit plan —
        # the conditional-fetch schedule composed on the envelope,
        # in-window the round it was built
        # r12 twenty-fifth rotation: revisit_plan out after three
        # straight green contacts (r9-r11; revisit_measured composes
        # the SAME conditional-fetch plan over measured validators —
        # the strictly stronger certificate — and stays in-window);
        # its slot carries the join-key skew diagnosis report
        "skew_report": q_skew_report,
        # r7 thirteenth swap: calibration (hashed green r6; its
        # quantile-cut machinery stays in-window via quantile_sketch +
        # psi_drift and the quality family keeps nb_quality +
        # domain_quality + novelty) gives its slot to the crawl-tier
        # CAPSTONE composition — links -> demand -> robots gate ->
        # politeness -> per-host rank, wiring-certified in-window the
        # round it was built
        # r12 twenty-fourth rotation: crawl_frontier out after five
        # straight green contacts (r7-r11; the capstone composition
        # stays driver-checked EVERY round — frontier_schedule composes
        # over it and stream_crawl_frontier shares its oracle
        # bit-for-bit, both in-window); its slot carries pivot_events,
        # the third never-hashed events SQL row (VERDICT r11 task 7)
        "pivot_events": q_pivot_events,
        # r10 twenty-second rotation: lang_confusion (hashed green
        # r6-r9, four straight contacts; the lang-id scoring chain
        # stays under its full pytest oracle and the routing family
        # keeps flagged_filter's tokenization + domain_quality
        # in-window) gives its slot to the empirical per-URL change
        # economics — a declared r10 candidate, driver-hashed now with
        # the NULL-digest guard live
        "change_rate": q_change_rate,
        # r7 twelfth rotation: ann_recall (hashed green r6; the banded
        # vector-signature core runs in-window inside stream_embed_dedup's
        # md5-plane oracle, and similarity keeps ivfpq_topk + mmr_rerank +
        # media_pairs) gives its slot to the robots crawl-delay/Sitemap
        # directive surface
        "robots_extras": q_robots_extras,
        # r9 twentieth rotation: warc_ingest (hashed green r6-r8, three
        # straight contacts; the read_warc machinery stays under
        # tests/test_warc.py incl. the r9 envelope e2e, and the crawl
        # family keeps sitemap/robots/feeds/frontier/stream-frontier +
        # the incoming envelope pair in-window) gives its slot to CDXJ
        # index parsing + SURT keys — the web-archive random-access
        # tier, in-window the round it was built
        "cdx_ingest": q_cdx_ingest,
        # r11 twenty-third rotation: media_pairs out after five straight
        # green contacts (r6-r10; the multimodal family keeps
        # audio_match + video_plan in-window and the banded-Hamming
        # dhash core stays under its pytest oracle); its slot carries
        # the WET text-interchange roundtrip — the declared r11
        # candidate, driver-hashed now, its literal oracle certified by
        # the independent stdlib toolchain in
        # tests/test_wet_independent.py
        "wet_export": q_wet_export,
        # r8 sixteenth rotation: ivfpq_topk (hashed green r4-r7, four
        # straight contacts; the similarity family keeps mmr_rerank +
        # media_pairs in-window, the PQ/IVF machinery stays under its
        # full pytest oracle, and bench times both ivfpq variants every
        # round) rotates past the window; its slot carries the
        # heading-aware structured extraction tier, in-window the round
        # it was built
        # r12 twenty-fifth rotation: structured_md out after four
        # straight green contacts (r8-r11; the heading-aware extraction
        # replay stays driver-checked INSIDE the in-window datasheet v3
        # oracle every round, plus its own full pytest oracle); its
        # slot carries the corpus composition report — the per-source
        # token/quality/dedup rollup a dataset release ships with
        "corpus_report": q_corpus_report,
        # r6 eighth rotation (cont.): dsir_sample (hashed green r5;
        # Gumbel-top-k selection stays pytest-oracled and the top-k
        # selection family keeps shard_plan/unimax_mix in-window) gives
        # its slot to MMR diversified re-ranking; bpe_merges (hashed
        # green r5; the merge-count replay runs inside the past-window
        # tokenizer_fertility oracle every pytest) gives its slot to the
        # per-topic TF-IDF term report; dedup_keep_best (hashed green
        # r5; the keeper-argmax shape stays in-window via url_dedup's
        # earliest-fetch keeper and the capped pair chain via
        # fuzzy_decontaminate) gives its slot to per-domain crawl stats
        # r9 twentieth rotation: mmr_rerank (hashed green r6-r8; the
        # similarity family keeps media_pairs + search_eval +
        # stream_embed_dedup in-window and the MMR greedy fold stays
        # under its full pytest oracle + numpy replica) gives its slot
        # to the CDX byte-range fetch plan — the island coalescing a
        # 100 TB range reader pays for, in-window the round it was
        # built
        # r12 twenty-fifth rotation: cdx_plan out after three straight
        # green contacts (r9-r11; the island-coalescing plan replays
        # inside the cdx_roundtrip pytest oracle and the CDX family
        # keeps cdx_ingest + cdx_export in-window); its slot carries
        # the token-budget mixture allocator — the row whose latent
        # HUGEINT canon bug the r11 all-rows sweep caught; driver
        # contact is the confirmation
        "token_budget_mix": q_token_budget_mix,
        # r9 nineteenth rotation: topic_terms (hashed green r6-r8; the
        # topics family keeps topic_split + stream_topics in-window)
        # gives its slot to the HyperBall neighborhood function —
        # registered and parity-green since r8, driver-hashed now (the
        # declared one-round grace closes)
        # r12 twenty-fifth rotation: hyperball out after three straight
        # green contacts (r9-r11; the Boldi-Vigna register-merge law
        # stays in-window via hyperball_centrality +
        # effective_diameter — the SAME registers); its slot carries
        # Dijkstra-free weighted shortest paths — with clustering
        # below, the graph-analytics family's driver contacts are
        # complete (declared r13 candidates landed a round early)
        "weighted_sp": q_weighted_sp,
        # r7 rotation: stream_heavy_hitters (hashed green r6 as a REAL
        # 4-micro-batch stream; the Misra-Gries state machinery stays
        # pytest-oracled and streaming keeps four in-window rows) rotates
        # past the window; its slot carries curriculum ordering so the
        # driver hashes the training-order family's flagship
        # r10 twenty-second rotation: curriculum (hashed green r7-r9,
        # three straight contacts; the two-pass distributed rank stays
        # under its full pytest oracle and inside past-window replays)
        # gives its slot to the per-URL validator register law — a
        # declared r10 candidate, driver-hashed now
        "validator_state": q_validator_state,
        # r9 twenty-first swap: domain_stats (hashed green r6-r8, three
        # straight contacts; the registrable-host accounting stays
        # under its pytest oracle and the crawl family keeps 10+
        # in-window rows) gives its slot to the WARC random-access
        # roundtrip — index → plan → ranged read certified end-to-end
        # against the committed fixture bytes, in-window the round it
        # was built
        # r12 twenty-fifth rotation: cdx_roundtrip out after three
        # straight green contacts (r9-r11; every span/md5 literal in
        # its oracle stays independently re-derived from the committed
        # shard bytes by tests/test_wet_independent.py, and the
        # random-access family keeps wet_export + wet_ingest
        # in-window); its slot carries the local clustering
        # coefficient — wedge counting over the co-purchase graph
        "clustering": q_clustering,
        # r7 rotation: index_build (hashed green r1-r6 — six straight
        # contacts — and STILL timed every round by bench.py as the
        # BASELINE.md trie-insert comparable; X-family machinery stays
        # under tests/test_indexes.py + its pytest oracle) rotates past
        # the window; its slot carries the continuous-aggregate rollup
        # merge so the driver hashes the mergeable-summary law directly
        # r10 twenty-second rotation: rollup_merge (hashed green r7-r9,
        # three straight contacts; the mergeable-summary law stays
        # in-window via the stream_quantile + stream_hll register
        # merges — the same algebra) gives its slot to the streaming
        # freshness-hint register, built this round: a REAL
        # 4-micro-batch stream whose register-composed frontier must
        # equal the batch capstone with stale decoys streamed in
        "stream_freshness": q_stream_freshness,
        # r6 ninth rotation: pq_topk (hashed green r4+r5; the full PQ
        # encode+ADC chain replays inside the in-window ivfpq_topk
        # oracle), mutation_cascade and snapshot_time_travel (hashed
        # green r1-r5 — five straight contacts; the M-family and MVCC
        # machinery stay under the engine pytest suites incl. the
        # 3-backend CAS stress), and graph_summary (hashed green r1-r5;
        # the analytics family keeps pagerank + modularity + the
        # incoming hits in-window) rotate past the window; their slots
        # carry the late-wave sketch/collocation/centrality/corpus-fit
        # operators so the driver hashes them the round they were built
        # r7 eleventh rotation: hll_distinct (hashed green r6; the HLL
        # register law runs IN-WINDOW as the stream_hll batch twin every
        # driver round) gives its slot to the jusText-tier main-content
        # extractor — the crawl tier's round-7 flagship, in-window the
        # round it was built
        # r10 twenty-second rotation: main_content (hashed green r7-r9,
        # three straight contacts; the jusText-tier replay stays under
        # its full pytest oracle and the extraction family keeps
        # structured_md + page_meta in-window, plus the datasheet v3
        # md_keep_rate column embedding the structured replay) gives
        # its slot to the measured revisit economy — url_change_rate
        # composed INTO revisit_plan via the r10 measured override,
        # built this round
        "revisit_measured": q_revisit_measured,
        # r9 nineteenth rotation: phrases (hashed green r6-r8; the
        # text-stats family keeps readability + tokenizer_fertility
        # in-window, plus the incoming flagged_filter token machinery)
        # gives its slot to HyperBall harmonic centrality — the
        # Boldi-Vigna application, parity-green since r8, driver-hashed
        # now
        "hyperball_centrality": q_hyperball_centrality,
        # r10 twenty-second rotation: hits (hashed green r6-r9, four
        # straight contacts; the mutual-recursion power iteration stays
        # under its full pytest oracle and the graph-analytics family
        # keeps hyperball + hyperball_centrality + the incoming
        # effective_diameter in-window) gives its slot to the HyperBall
        # effective-diameter report — built this round on the r8 NF
        # table (VERDICT r8 task 4 closes)
        "effective_diameter": q_effective_diameter,
        # r7 twelfth rotation: zipf (hashed green r6; the 1-row log-log
        # fit stays pytest-oracled; text-stats keeps readability +
        # phrases + tokenizer_fertility in-window) gives its slot to the
        # context-sensitive main-content extractor
        # r10 twenty-second rotation: main_content_ctx (hashed green
        # r7-r9, three straight contacts; same family evidence as
        # main_content above) gives its slot to the validator register
        # STREAM twin — a declared r10 candidate, driver-hashed now
        # (merge idempotence IS the stream == batch certificate)
        "stream_validator": q_stream_validator,
        # -- bulk ingest (32-33) --
        # r7 rotation: hackage_etl (hashed green r1-r6 — six straight
        # contacts — and STILL timed every round by bench.py as the
        # reference's 'Write Hackage' workload comparable; the S8 ingest
        # stays under tests/test_hackage.py + its pytest oracle) rotates
        # past the window; its slot carries the Shazam-style audio
        # landmark fingerprint + offset-vote match so the driver hashes
        # the audio tier's flagship on first round-7 contact
        # r12 twenty-fourth rotation: audio_match out after five
        # straight green contacts (r7-r11; the landmark-pair
        # fingerprint + offset-vote machinery stays under
        # tests/test_multimodal*.py and the multimodal family keeps
        # video_plan in-window); its slot carries agg_messages — the
        # fourth graph-analytics first contact (VERDICT r11 task 3):
        # the aggregateMessages Pregel primitive the GraphX surface
        # builds on (reference analogue STMGraph API.hs:252-346)
        "agg_messages": q_agg_messages,
        # -- LLM-data-pipeline operators (34-50) --
        # r6 seventh rotation (cont.): minhash_lsh_pairs (hashed green
        # r1-r6-replica; the identical md5 minhash chain runs inside the
        # in-window fuzzy_decontaminate and incremental oracles, and the
        # banded-LSH family keeps simhash_pairs + jaccard_prefix +
        # embed_near_dup_lsh) rotates past the window; its slot carries
        # the RFC 9309 robots gate
        # r12 twenty-fourth rotation: robots_filter out after six
        # straight green contacts (r6-r11; the RFC 9309 group-selection
        # + wildcard-rule machinery stays in-window inside the
        # robots_extras row and the frontier oracles' robots gate, plus
        # its full pytest suite); its slot carries wet_ingest — the
        # declared r12 candidate whose grace expires (VERDICT r11 task
        # 1): the ordinary reader over the EXTERNALLY-laid-out CC WET
        # shard (fixtures/external/, assembled from the published
        # conventions by tools/make_fixture_external.py — NOT by this
        # repo's writers), digests and language headers surfaced
        # verbatim; the interchange open-path story, reference
        # FileOps.hs:32-77,113-148
        "wet_ingest": q_wet_ingest,
        # r6 second rotation: chunk_dedup and text_token_counts
        # (r1-stable, hashed green every round; the dedup family keeps
        # five in-window rows and token signals stay via content_type /
        # quality_reasons) rotate past the window; their slots carry the
        # NB quality classifier and the n-gram novelty signal
        # r8 eighteenth rotation: nb_quality (hashed green r6+r7; the
        # quality family keeps domain_quality in-window and the NB
        # log-likelihood replay stays under its full pytest oracle)
        # gives its slot to RSS/Atom feed ingestion — the
        # push-freshness leg of the crawl tier, in-window the round it
        # was built
        # r12 twenty-fifth rotation: feed_ingest out after four
        # straight green contacts (r8-r11; the RSS/Atom parse stays
        # under its pytest oracle and the push-discovery tier keeps
        # sitemap_ingest + robots_extras in-window WITH the external
        # fixture bytes live in both hashes); its slot carries
        # degree-matched negative edge sampling — the contrastive-
        # training counterpart of the link graph
        "negative_sampling": q_negative_sampling,
        # dedup_clusters (hashed green r1-r6-replica; its HashMin cluster
        # CTE chain is embedded verbatim inside the in-window
        # dedup_keep_best oracle) rotates past the window; its slot
        # carries the streaming topic router, a REAL multi-batch stream
        # r12 twenty-fourth rotation: stream_topics out after six
        # straight green contacts (r6-r11; the hashed-bucket TF-IDF
        # router stays driver-checked inside the in-window topic_split
        # oracle — the same CTE chain — and the streaming family keeps
        # three real-stream rows + the incoming stream_enrich); its
        # slot carries hybrid_search — BM25+vector reciprocal-rank
        # fusion, benched every round yet never driver-hashed (VERDICT
        # r11 task 2)
        "hybrid_search": q_hybrid_search,
        # r6 third rotation: kmeans / text_quality / lang_id (r1-stable,
        # hashed green every round; clustering stays via semantic_dedup
        # + ivf in pytest, quality via quality_reasons + nb_quality,
        # language via lang_confusion) rotate past the window; their
        # slots carry the streaming crawl dedup, the watermarked
        # embedding-signature stream, and the per-domain blocklist
        # embed_near_dup_lsh (hashed green r1-r6-replica; the vector
        # family keeps pq/ivfpq/ann_recall and the banded-Hamming
        # media_pairs in-window, and the md5-plane signature core runs
        # inside the in-window stream_embed_dedup oracle) rotates past
        # the window; its slot carries the inbound anchor-text index
        # r7 eleventh rotation: anchor_text (hashed green r6; the
        # inbound-index top-k shape stays in-window via topic_terms'
        # identical partitioned rank, and the link derivation arrives
        # RAW below) gives its slot to anchor-capture extract_links —
        # the per-link frame under the driver hash
        # r12 twenty-fourth rotation: extract_links out after five
        # straight green contacts (r7-r11; the per-link derivation
        # stays driver-checked inside the in-window frontier_schedule /
        # stream_crawl_frontier oracles — the capstone chain starts
        # from it — and under its pytest suite); its slot carries
        # fuzzy_pairs — the edit-distance candidate-pair verifier,
        # benched every round yet never driver-hashed (VERDICT r11
        # task 2)
        "fuzzy_pairs": q_fuzzy_pairs,
        # r8 seventeenth rotation: stream_url_dedup (hashed green r6+r7;
        # its batch keeper machinery IS the in-window url_dedup row, and
        # the streaming family keeps four real-stream in-window rows:
        # stream_hll, stream_quantile, stream_topics, stream_embed_dedup)
        # gives its slot to the incrementally-maintained crawl frontier —
        # a REAL 4-micro-batch register stream whose result must equal
        # the batch capstone bit-for-bit (shared oracle)
        # r12 twenty-fifth rotation: stream_crawl_frontier out after
        # four straight green contacts (r8-r11; its register stream
        # must equal the batch capstone BIT-FOR-BIT — that shared
        # oracle stays pytest-certified every run — and streaming keeps
        # stream_freshness + stream_validator + stream_enrich
        # in-window); its slot carries the per-dimension
        # embedding-matrix profile (mean/std/extrema by coordinate)
        "embedding_stats": q_embedding_stats,
        # r12 twenty-fourth rotation: stream_embed_dedup out after six
        # straight green contacts (r6-r11; the md5-plane signature
        # register + compaction law stays under its pytest oracle and
        # the dedup family keeps semantic_dedup + the incoming
        # repetition_exact/fuzzy_pairs in-window); its slot gives the
        # graph-analytics family its FIRST driver contact (VERDICT r11
        # task 3): Tarjan-free distributed SCC via forward/backward
        # HashMin label propagation over the orders-suppliers digraph
        "scc": q_scc,
        # r12 twenty-fourth rotation: domain_quality out after six
        # straight green contacts (r6-r11; the per-domain quality rule
        # replay stays under its pytest oracle and the quality family
        # keeps flagged_filter + datasheet in-window); its slot keeps
        # the quality surface via quality_filter_narrow — the
        # narrow-projection Gopher-rule gate, benched every round yet
        # never driver-hashed (VERDICT r11 task 2)
        "quality_filter_narrow": q_quality_filter_narrow,
        # r9 nineteenth rotation: novelty (hashed green r6-r8; the
        # quality family keeps domain_quality in-window and the n-gram
        # machinery runs inside the in-window fuzzy_decontaminate
        # oracle) gives its slot to the politeness fetch-slot plan over
        # the capstone frontier — registered and parity-green since r8,
        # driver-hashed now
        # r12 twenty-fifth rotation: frontier_schedule out after three
        # straight green contacts (r9-r11; the politeness plan composes
        # over the capstone frontier whose shared oracle stays
        # pytest-certified, and the frontier economy keeps
        # stream_freshness + change_rate in-window); its slot carries
        # centroid-distance embedding outliers — the embedding-space
        # anomaly gate
        "embedding_outliers": q_embedding_outliers,
        # r6 fourth rotation: content_type / dedup_exact /
        # similarity_topk / repetition_stats / exact_substring rotate
        # past the window (all multi-round green; their families keep
        # 4-6 in-window rows each via dedup_clusters/keep_best/minhash/
        # simhash/url_dedup/novelty, embed_near_dup_lsh/pq/ivfpq/
        # ann_recall, and quality_reasons/vocab_drift/nb_quality);
        # their slots carry the lossless prefix-filter exact join, the
        # Z-order layout key, the Count-Min sketch, the PSI drift
        # monitor, and the crawl link graph — in-window the round they
        # were built
        # r9 nineteenth rotation: jaccard_prefix (hashed green r6-r8;
        # the dedup family keeps url_dedup + fuzzy_decontaminate +
        # media_pairs in-window and the lossless prefix-filter claim
        # stays falsifiable under its full pytest oracle) gives its
        # slot to the C4-style word-blocklist gate, now with the CJK
        # character-fallback tokenization live in the hash
        "flagged_filter": q_flagged_filter,
        # r6 seventh rotation: bm25_search (hashed green r1-r6-replica;
        # its ENTIRE scoring replay is embedded inside the in-window
        # search_eval oracle, so the machinery stays driver-checked)
        # rotates past the window; its slot carries TF-IDF topic
        # clustering, in-window the round it was built
        # r7 eleventh rotation: topic_clusters (hashed green r6; its
        # ENTIRE CTE chain replays inside the in-window topic_split and
        # stream_topics oracles) gives its slot to the topic-model
        # train/apply split, certifying split == fused(iterations=3)
        # under the driver hash
        # r12 twenty-fifth rotation: topic_split out after five
        # straight green contacts (r7-r11; the full topic CTE chain
        # stays under its pytest oracle — the same chain stream_topics
        # replays — and the text family keeps char_entropy +
        # repetition_exact + flagged_filter in-window); its slot
        # carries Bloom-filter decontamination, the third member of the
        # decontaminate family to earn a driver row (exact r1-r5,
        # fuzzy r6-r11, bloom now)
        "bloom_decontaminate": q_bloom_decontaminate,
        # r6 sixth rotation (cont.): decontaminate (hashed green r1-r5)
        # rotates past the window; its slot carries the MinHash
        # near-duplicate decontamination twin, which exercises the same
        # benchmark-split workload through the asymmetric LSH probe —
        # paraphrase-robust, the stronger certificate for the family
        # r12 twenty-fourth rotation: fuzzy_decontaminate out after six
        # straight green contacts (r6-r11; the asymmetric-LSH
        # benchmark-split probe stays under its full pytest oracle and
        # decontamination keeps the bloom/exact twins parity-checked
        # every run); its slot carries k_truss — the second
        # graph-analytics first contact (VERDICT r11 task 3):
        # iterative triangle-support peeling on the co-purchase graph
        "k_truss": q_k_truss,
        # r6 fifth rotation: hash_split (r1-stable deterministic md5
        # bucket split, hashed green every round; the sampling/splitting
        # family keeps dsir_sample, shard_plan, and unimax_mix in-window,
        # and the same md5 split CASE stays driver-adjacent inside the
        # cluster_split oracle) rotates past the window; its slot carries
        # the classifier calibration report above so the driver hashes it
        # the round it was built
        # mix_corpus (r1-stable epoch-weight mixing, hashed green every
        # round) rotates out in the r6 third rotation; the mixing
        # family's window slot carries UniMax budget allocation instead
        # r12 twenty-fourth rotation: unimax_mix out after six straight
        # green contacts (r6-r11; the UniMax water-filling budget fold
        # stays under its full pytest oracle and the sampling/mixing
        # family keeps pack_sequences in-window); its slot carries
        # random_walks — the third graph-analytics first contact
        # (VERDICT r11 task 3): deterministic-hash-seeded fixed-length
        # walks, the node2vec-corpus precursor
        "random_walks": q_random_walks,
        # r7 rotation: multimodal_features (hashed green r2-r6 — five
        # straight contacts; the decode/feature machinery stays under
        # tests/test_jpeg.py, test_gif.py, test_pipeline.py and its
        # pytest oracle) rotates past the window; its slot carries the
        # ISO-BMFF stbl sample-table walk + keyframe frame plan — the
        # video tier's flagship, hashed on first round-7 contact
        "video_plan": q_video_plan,
        # ------------------------------------------------------------------
        # entries below sit past the driver's 50-query window: expanded
        # per-node analytics, streaming, and secondary SQL surface, all
        # oracle-compared locally in tests/test_oracle_parity.py
        # r7 rotation, rotated-out rows (multi-round hashed green; see
        # the in-window slot comments for where each one's machinery
        # stays driver-checked; index_build + hackage_etl remain benched
        # every round against BASELINE.md)
        "pagerank": q_pagerank,
        "sentences": q_sentences,
        "dsir_stream": q_dsir_stream,
        "zorder_key": q_zorder_key,
        "cms_tokens": q_cms_tokens,
        "stream_heavy_hitters": q_stream_heavy_hitters,
        "index_build": q_index_build,
        "hackage_etl": q_hackage_etl,
        "multimodal_features": q_multimodal_features,
        "hash_split": q_hash_split,
        "ntile_deciles": q_ntile_deciles,
        "streaming_summary": q_streaming_summary,
        "decontaminate": q_decontaminate,
        # r7 fourteenth swap, rotated-out row (its machinery IS the
        # in-window stream_quantile row's per-batch engine)
        "quantile_sketch": q_quantile_sketch,
        # r8 fifteenth + sixteenth rotations, rotated-out rows (hashed
        # green r6+r7 / r4-r7; machinery kept per the in-window slot
        # comments)
        "modularity": q_modularity,
        "ivfpq_topk": q_ivfpq_topk,
        # r8 seventeenth + eighteenth rotations, rotated-out rows
        # (hashed green r6+r7; machinery kept per the in-window slot
        # comments)
        "stream_url_dedup": q_stream_url_dedup,
        "nb_quality": q_nb_quality,
        # r9 nineteenth + twentieth rotations, rotated-out rows (all
        # hashed green r6-r8 — three straight contacts; see the
        # in-window slot comments for where each one's machinery stays
        # driver-checked)
        "psi_drift": q_psi_drift,
        "link_graph": q_link_graph,
        "topic_terms": q_topic_terms,
        "phrases": q_phrases,
        "novelty": q_novelty,
        "jaccard_prefix": q_jaccard_prefix,
        "warc_ingest": q_warc_ingest,
        "mmr_rerank": q_mmr_rerank,
        "domain_stats": q_domain_stats,
        # r10 twenty-second rotation, rotated-out rows (fim r7-r9,
        # readability r6-r9, lang_confusion r6-r9, curriculum r7-r9,
        # rollup_merge r7-r9, main_content r7-r9, hits r6-r9,
        # main_content_ctx r7-r9 — three-to-four straight contacts
        # each; see the in-window slot comments for where each one's
        # machinery stays driver-checked — notably readability's full
        # replay and the structured-extraction replay now run INSIDE
        # the in-window datasheet v3 oracle every driver round)
        # r11 twenty-third rotation: the ten multi-contact rows that
        # gave their window slots to wet_export + nine never-hashed
        # backlog rows live on here (still oracle-compared every pytest
        # run by tests/test_oracle_parity.py)
        "tpch_q1": q_tpch_q1,
        "tpch_q3_like": q_tpch_q3_like,
        "tpch_q5_like": q_tpch_q5_like,
        "pii_scrub": q_pii_scrub,
        "page_meta": q_page_meta,
        "search_eval": q_search_eval,
        "stream_quantile": q_stream_quantile,
        "tokenizer_fertility": q_tokenizer_fertility,
        "url_dedup": q_url_dedup,
        "media_pairs": q_media_pairs,
        # r12 twenty-fourth rotation, rotated-out rows (multi-round
        # hashed green, 5-6 contacts each; see the in-window slot
        # comments for where each one's machinery stays driver-checked
        # — capstone compositions keep crawl_frontier + robots_filter +
        # extract_links live inside the in-window frontier oracles
        # every round)
        "numeric_histogram": q_numeric_histogram,
        "corpus_diff": q_corpus_diff,
        "boilerplate_paragraph": q_boilerplate_paragraph,
        "stream_hll": q_stream_hll,
        "rowgroup_stats": q_rowgroup_stats,
        "skipping_report": q_skipping_report,
        "crawl_frontier": q_crawl_frontier,
        "robots_filter": q_robots_filter,
        "stream_topics": q_stream_topics,
        "extract_links": q_extract_links,
        "stream_embed_dedup": q_stream_embed_dedup,
        "domain_quality": q_domain_quality,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "unimax_mix": q_unimax,
        "audio_match": q_audio_match,
        "fim": q_fim,
        "readability": q_readability,
        "lang_confusion": q_lang_confusion,
        "curriculum": q_curriculum,
        "rollup_merge": q_rollup_merge,
        "main_content": q_main_content,
        "hits": q_hits,
        "main_content_ctx": q_main_content_ctx,
        # r7 thirteenth swap, rotated-out row (hashed green r6;
        # machinery kept per the in-window slot comment)
        "calibration": q_calibration,
        # r7 eleventh + twelfth rotations, rotated-out rows (hashed
        # green r6; see the in-window slot comments for where each one's
        # machinery stays driver-checked)
        "corr_matrix": q_corr_matrix,
        "gap_sessions": q_gap_sessions,
        "zipf": q_zipf,
        "shard_plan": q_shard_plan,
        "ann_recall": q_ann_recall,
        "sentence_dedup": q_sentence_dedup,
        "quantile_histogram": q_quantile_histogram,
        "vocab_drift": q_vocab_drift,
        "hll_distinct": q_hll_distinct,
        "anchor_text": q_anchor_text,
        "topic_clusters": q_topic_clusters,
        # r6 ninth rotation, rotated-out rows (multi-round hashed green;
        # machinery stays driver-checked per the in-window slot comments)
        "pq_topk": q_pq_topk,
        "mutation_cascade": q_mutation_cascade,
        "snapshot_time_travel": q_snapshot_time_travel,
        "graph_summary": q_graph_summary,
        # r6 eighth rotation, rotated-out rows (all hashed green in r5;
        # their machinery stays driver-checked inside in-window oracles
        # — see the in-window slot comments)
        "simhash_pairs": q_simhash_pairs,
        "perplexity_buckets": q_perplexity_buckets,
        "quality_reasons": q_quality_reasons,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "bpe_merges": q_bpe_merges,
        "dedup_keep_best": q_dedup_keep_best,
        # r6 seventh rotation, rotated-out rows (all r1-green; their
        # machinery stays driver-checked inside in-window oracles)
        "bm25_search": q_bm25_search,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "embed_near_dup_lsh": q_embed_near_dup_lsh,
        "content_type": q_content_type,
        "dedup_exact": q_dedup_exact,
        "similarity_topk": q_similarity_topk,
        "repetition_stats": q_repetition_stats,
        "exact_substring": q_exact_substring,
        "cube_revenue": q_cube_revenue,
        "fingerprint": q_fingerprint,
        "degrees": q_degrees,
        "connected_components": q_connected_components,
        "connected_components_alt": q_connected_components_alt,
        "bfs": q_bfs,
        "triangle_count": q_triangle_count,
        "k_core": q_k_core,
        "shortest_paths": q_shortest_paths,
        "label_propagation": q_label_propagation,
        "motif_two_hop": q_motif_two_hop,
        "hackage_one_step": q_hackage_one_step,
        "hackage_depends_top": q_hackage_depends_top,
        "distinct_agg": q_distinct_agg,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "set_ops": q_set_ops,
        "bpe_token_counts": q_bpe_token_counts,
        "tfidf_top_terms": q_tfidf_top_terms,
        "quality_filter": q_quality_filter,
        "unigram_logprob": q_unigram_logprob,
        "similarity_lsh": q_similarity_lsh,
        "label_centroids": q_label_centroids,
        "similarity_ivf": q_similarity_ivf,
        "embed_near_dup": q_embed_near_dup,
        "salted_agg": q_salted_agg,
        "ngram_jaccard": q_ngram_jaccard,
        "vocab_topk": q_vocab_topk,
        "simhash_buckets": q_simhash_buckets,
        "stratified_sample": q_stratified_sample,
        "normalize_text": q_normalize_text,
        "approx_distinct": q_approx_distinct,
        "bigram_logprob": q_bigram_logprob,
        "sliding_chunks": q_sliding_chunks,
        "pattern_scan": q_pattern_scan,
        "rolling_features": q_rolling_features,
        "per_group_cap": q_per_group_cap,
        "pipeline_report": q_pipeline_report,
        "ewma": q_ewma,
        "percentile_band": q_percentile_band,
        "cluster_split": q_cluster_split,
        # r12 twenty-fifth rotation, rotated-out rows (topic_split
        # r7-r11, structured_md r8-r11, feed_ingest r8-r11,
        # stream_crawl_frontier r8-r11, http_envelope / revisit_plan /
        # hyperball / cdx_roundtrip / cdx_plan / frontier_schedule all
        # r9-r11 — three-to-five straight green contacts each; see the
        # in-window slot comments for where each one's machinery stays
        # driver-checked, and tests/test_oracle_parity.py for the
        # every-run value compare they all still get)
        "topic_split": q_topic_split,
        "structured_md": q_structured_md,
        "feed_ingest": q_feed_ingest,
        "stream_crawl_frontier": q_stream_crawl_frontier,
        "http_envelope": q_http_envelope,
        "revisit_plan": q_revisit_plan,
        "hyperball": q_hyperball,
        "cdx_roundtrip": q_cdx_roundtrip,
        "cdx_plan": q_cdx_plan,
        "frontier_schedule": q_frontier_schedule,
        "stopword_stats": q_stopword_stats,
        "table_profile": q_table_profile,
        "fk_check": q_fk_check,
        "source_calibrated": q_source_calibrated,
        "event_transitions": q_event_transitions,
        # r6 rotation: the six rows below rotated past the window (all
        # r1/r4/r5-stable, hashed green on every driver contact, still
        # oracle-compared every pytest run); their slots carry the six
        # r5 operators above (corr_matrix, numeric_histogram,
        # modularity, dsir_stream, lang_confusion, ann_recall)
        "window_top_order": q_window_top_order,
        "rollup_revenue": q_rollup_revenue,
        "retention_cohorts": q_retention_cohorts,
        "sq_topk": q_sq_topk,
        "lsh_recall_report": q_lsh_recall_report,
        "script_stats": q_script_stats,
        # (domain_stats moved IN-window in the eighth rotation)
        # r6 second + third rotations: hashed-green rows whose slots now
        # carry the crawl/classifier/novelty wave and then the
        # drift/export/streaming wave (all still oracle-compared every
        # pytest run)
        "containment_pairs": q_containment_pairs,
        "epoch_shuffle": q_epoch_shuffle,
        "length_batches": q_length_batches,
        "boilerplate_dedup": q_boilerplate_dedup,
        "chunk_dedup": q_chunk_dedup,
        "text_token_counts": q_text_token_counts,
        "weighted_sample": q_weighted_sample,
        "incremental_near_dup": q_incremental_near_dup,
        "kmeans": q_kmeans,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "mix_corpus": q_mix_corpus,
        # r5 second rotation: driver-hashed-green graph rows whose window
        # slots now carry the second-half r5 operators (all still
        # oracle-compared every pytest run; graph_summary keeps their
        # algorithms under the driver hash)
        "personalized_pagerank": q_personalized_pagerank,
        "link_prediction": q_link_prediction,
        "harmonic_centrality": q_harmonic_centrality,
        "betweenness": q_betweenness,
        # r5 late rotation: the r1-stable query-step/traversal rows whose
        # window slots now carry the round-5 operators (all still
        # oracle-compared every pytest run)
        "filter_objects_has": q_filter_objects_has,
        "traversal_out_values": q_traversal_out_values,
        "multi_hop": q_multi_hop,
        "query_step": q_query_step,
        # r4/r5: rotated out of the window (stable since r1; still
        # value-compared against their oracles every pytest run)
        "traversal_both": q_traversal_both,
        "index_lookup": q_index_lookup,
        "get_object": q_get_object,
        "nb_counts": q_nb_counts,
        "prop_names": q_prop_names,
        "scan_nodes_by_label": q_scan_nodes_by_label,
        "filter_relations": q_filter_relations,
        "list_properties": q_list_properties,
        "traversal_in": q_traversal_in,
        "traversal_oute_props": q_traversal_oute_props,
        "edges_to_nodes": q_edges_to_nodes,
        "index_prefix": q_index_prefix,
    }


# Shared replay of quality_filter's metric chain (toks → hist → m → r)
# and its pass rule — composed by the quality_filter, quality_reasons and
# domain_quality oracles so the three cannot drift (the _dedup_cluster_ctes
# pattern; extracted after the r6 review found a third verbatim copy).
_QF_CTES = r"""toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok FROM documents
        ),
        hist AS (SELECT doc_id, tok, count(*) AS n FROM toks WHERE len(tok) > 0 GROUP BY 1, 2),
        m AS (
          SELECT doc_id, sum(n) AS n_tokens, max(n) AS top_n,
                 CAST(round(sum(n * len(tok))::DOUBLE / sum(n), 6) AS DECIMAL(18,6)) AS mean_tok_len
          FROM hist GROUP BY doc_id
        ),
        r AS (
          SELECT d.doc_id, COALESCE(n_tokens, 0)::BIGINT AS n_tokens, mean_tok_len,
                 CAST(round(top_n::DOUBLE / n_tokens, 6) AS DECIMAL(18,6)) AS top_term_ratio
          FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        )"""

_QF_PASSES = """COALESCE(n_tokens >= 10 AND n_tokens <= 100000
                        AND mean_tok_len >= 2.0 AND mean_tok_len <= 12.0
                        AND top_term_ratio <= 0.25, FALSE)"""


def _oracle_sql_base() -> dict[str, str]:
    C, O, P, S, N, R = (str(NODE[k]) for k in ("Customer", "Order", "Part", "Supplier", "Nation", "Region"))
    E_PLACED, E_CONTAINS = str(EDGE["placed"]), str(EDGE["contains"])

    lang_markers_sql = """
WITH scored AS (
  SELECT doc_id, text,
    (len(t) - len(replace(t, ' the ', ''))) / 5.0
      + (len(t) - len(replace(t, ' and ', ''))) / 5.0
      + (len(t) - len(replace(t, ' of ', ''))) / 4.0 AS en,
    (len(t) - len(replace(t, ' der ', ''))) / 5.0
      + (len(t) - len(replace(t, ' und ', ''))) / 5.0
      + (len(t) - len(replace(t, ' die ', ''))) / 5.0 AS de,
    (len(t) - len(replace(t, ' le ', ''))) / 4.0
      + (len(t) - len(replace(t, ' la ', ''))) / 4.0
      + (len(t) - len(replace(t, ' et ', ''))) / 4.0 AS fr,
    (len(t) - len(replace(t, ' el ', ''))) / 4.0
      + (len(t) - len(replace(t, ' que ', ''))) / 5.0
      + (len(t) - len(replace(t, ' los ', ''))) / 5.0 AS es
  FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS t FROM documents)
)
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[⺀-鿿]') THEN 'zh'
       WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
       WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
       WHEN fr > 0 AND fr >= es THEN 'fr'
       WHEN es > 0 THEN 'es'
       ELSE 'und' END AS lang_guess
FROM scored
"""

    return {
        "scan_nodes_by_label": f"""
            SELECT 'Region' AS label, count(*)::BIGINT AS cnt FROM region
            UNION ALL SELECT 'Nation', count(*) FROM nation
            UNION ALL SELECT 'Customer', count(*) FROM customer
            UNION ALL SELECT 'Supplier', count(*) FROM supplier
            UNION ALL SELECT 'Part', count(*) FROM part
            UNION ALL SELECT 'Order', count(*) FROM orders
        """,
        "filter_objects_has": "SELECT c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
        "get_object": f"SELECT ({C} + c_custkey)::BIGINT AS id, 'Customer' AS label FROM customer WHERE c_custkey = 42",
        "list_properties": """
            SELECT 'o_orderstatus' AS name, 'text' AS dtype, o_orderstatus AS value FROM orders WHERE o_orderkey = 7
            UNION ALL SELECT 'o_orderpriority', 'text', o_orderpriority FROM orders WHERE o_orderkey = 7
            UNION ALL SELECT 'o_totalprice', 'integer', CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(38,0)) AS VARCHAR) FROM orders WHERE o_orderkey = 7
        """,
        "traversal_out_values": """
            SELECT o_orderstatus, count(*)::BIGINT AS cnt
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderstatus
        """,
        "traversal_in": """
            SELECT c_name FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
        """,
        "traversal_both": """
            SELECT 'Customer' AS label, count(*)::BIGINT AS cnt FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_3'
            UNION ALL
            SELECT 'Supplier', count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'
            UNION ALL
            SELECT 'Region', count(*) FROM nation WHERE n_name = 'NATION_3'
        """,
        "traversal_oute_props": f"""
            WITH li AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_shipdate) AS seq
                FROM lineitem)
            SELECT ({E_CONTAINS} + l_orderkey * 32 + seq)::BIGINT AS id,
                   CAST(l_quantity AS BIGINT) AS l_quantity
            FROM li WHERE l_orderkey = 42
        """,
        "edges_to_nodes": f"""
            SELECT ({O} + o_orderkey)::BIGINT AS id, 'Order' AS label FROM orders WHERE o_custkey = 9
        """,
        "multi_hop": f"""
            SELECT ({P} + l_partkey)::BIGINT AS part_id, count(*)::BIGINT AS cnt
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = 3 GROUP BY l_partkey
        """,
        "hackage_etl": """
            WITH pkgs AS (SELECT unnest(generate_series(0, 49999)) AS i),
            v AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs)
            SELECT 'Package' AS kind, 50000::BIGINT AS cnt
            UNION ALL SELECT 'Version', count(*)::BIGINT FROM v
            UNION ALL SELECT 'versions', count(*)::BIGINT FROM v
            UNION ALL SELECT 'depends', count(*)::BIGINT FROM v WHERE (i*31 + j) % 50000 <> i
            UNION ALL SELECT 'prop', (50000 + (SELECT count(*) FROM v))::BIGINT
        """,
        "motif_two_hop": f"""
            WITH e AS (
              SELECT ({C} + c_custkey)::BIGINT AS src, ({N} + c_nationkey)::BIGINT AS dst, 'custLocatedIn' AS label FROM customer
              UNION ALL SELECT ({S} + s_suppkey), ({N} + s_nationkey), 'suppLocatedIn' FROM supplier
              UNION ALL SELECT ({N} + n_nationkey), ({R} + n_regionkey), 'nationLocatedIn' FROM nation
              UNION ALL SELECT ({C} + o_custkey), ({O} + o_orderkey), 'placed' FROM orders
              UNION ALL SELECT ({O} + l_orderkey), ({P} + l_partkey), 'contains' FROM lineitem
              UNION ALL SELECT ({P} + l_partkey), ({S} + l_suppkey), 'suppliedBy' FROM lineitem
            )
            SELECT a.label AS label1, b.label AS label2, count(*)::BIGINT AS n_matches
            FROM e a JOIN e b ON a.dst = b.src GROUP BY 1, 2
        """,
        "query_step": f"""
            SELECT ({E_PLACED} + o_orderkey)::BIGINT AS rel_id,
                   ({O} + o_orderkey)::BIGINT AS target_id,
                   'Order' AS target_label
            FROM orders WHERE o_custkey = 5
        """,
        "nb_counts": """
            SELECT 'nodes' AS metric,
                   ((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
                    + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
                    + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders))::BIGINT AS value
            UNION ALL
            SELECT 'edges',
                   ((SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
                    + (SELECT count(*) FROM nation) + (SELECT count(*) FROM orders)
                    + 2 * (SELECT count(*) FROM lineitem))::BIGINT
        """,
        "prop_names": """
            SELECT * FROM (VALUES ('r_name'), ('n_name'), ('c_name'), ('c_acctbal'), ('c_mktsegment'),
                ('s_name'), ('s_acctbal'), ('p_name'), ('p_brand'), ('p_type'), ('p_size'),
                ('p_retailprice'), ('o_orderstatus'), ('o_orderpriority'), ('o_totalprice')) AS t(name)
        """,
        "filter_relations": """
            SELECT 'custLocatedIn' AS label, 'Customer' AS src_label, 'Nation' AS dst_label, count(*)::BIGINT AS cnt FROM customer
            UNION ALL SELECT 'suppLocatedIn', 'Supplier', 'Nation', count(*) FROM supplier
            UNION ALL SELECT 'nationLocatedIn', 'Nation', 'Region', count(*) FROM nation
            UNION ALL SELECT 'placed', 'Customer', 'Order', count(*) FROM orders
            UNION ALL SELECT 'contains', 'Order', 'Part', count(*) FROM lineitem
            UNION ALL SELECT 'suppliedBy', 'Part', 'Supplier', count(*) FROM lineitem
        """,
        "index_build": f"""
            SELECT ({O} + o_orderkey)::BIGINT AS owner_id, 'Order' AS label,
                   'o_totalprice' AS name,
                   CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(38,0)) AS VARCHAR) AS key
            FROM orders
        """,
        "index_lookup": f"""
            SELECT ({C} + c_custkey)::BIGINT AS owner_id, c_name AS key
            FROM customer WHERE c_name = 'Customer#000000042'
        """,
        "index_prefix": f"""
            SELECT ({P} + p_partkey)::BIGINT AS owner_id, p_name AS key
            FROM part WHERE p_name LIKE 'red%'
        """,
        "mutation_cascade": """
            SELECT 'custLocatedIn' AS label, (count(*) - 1)::BIGINT AS cnt FROM customer
            UNION ALL SELECT 'suppLocatedIn', count(*) FROM supplier
            UNION ALL SELECT 'nationLocatedIn', count(*) FROM nation
            UNION ALL SELECT 'placed', count(*) FROM orders WHERE o_custkey <> 1
            UNION ALL SELECT 'contains', count(*) FROM lineitem
            UNION ALL SELECT 'suppliedBy', count(*) FROM lineitem
        """,
        "snapshot_time_travel": """
            WITH n AS (SELECT ((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
                    + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
                    + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders))::BIGINT AS total)
            SELECT 0 AS version, total AS n_nodes FROM n
            UNION ALL SELECT 1, total - 1 FROM n
        """,
        "degrees": f"""
            SELECT ({N} + n_nationkey)::BIGINT AS id,
                   1::BIGINT AS out_deg,
                   (COALESCE(c.cnt, 0) + COALESCE(s.cnt, 0))::BIGINT AS in_deg,
                   (1 + COALESCE(c.cnt, 0) + COALESCE(s.cnt, 0))::BIGINT AS deg
            FROM nation
            LEFT JOIN (SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY 1) c ON c_nationkey = n_nationkey
            LEFT JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier GROUP BY 1) s ON s_nationkey = n_nationkey
        """,
        "connected_components": f"""
            WITH reg AS (
              SELECT ({R} + r_regionkey)::BIGINT AS component, r_regionkey FROM region
            ),
            nat AS (SELECT n_nationkey, n_regionkey FROM nation)
            SELECT component,
                   (1 + (SELECT count(*) FROM nat WHERE n_regionkey = r_regionkey)
                      + (SELECT count(*) FROM customer JOIN nat ON c_nationkey = n_nationkey WHERE n_regionkey = r_regionkey)
                      + (SELECT count(*) FROM supplier JOIN nat ON s_nationkey = n_nationkey WHERE n_regionkey = r_regionkey)
                   )::BIGINT AS n_nodes
            FROM reg
        """,
        "bfs": """
            SELECT 0 AS hops, 1::BIGINT AS n_nodes
            UNION ALL
            SELECT 1, count(*)::BIGINT FROM orders WHERE o_custkey = 0
            UNION ALL
            SELECT 2, count(DISTINCT l_partkey)::BIGINT
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_custkey = 0
        """,
        "triangle_count": """
            WITH pkgs AS (SELECT unnest(generate_series(0, 999)) AS i),
            vv AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
            und AS (SELECT DISTINCT least(i, (i*31 + j) % 1000) AS u, greatest(i, (i*31 + j) % 1000) AS w
                    FROM vv WHERE (i*31 + j) % 1000 <> i),
            tri AS (SELECT e1.u AS a, e1.w AS b, e2.w AS c
                    FROM und e1 JOIN und e2 ON e2.u = e1.w
                    JOIN und e3 ON e3.u = e1.u AND e3.w = e2.w),
            roles AS (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
            cnt AS (SELECT n, count(*) AS t FROM roles GROUP BY n)
            SELECT (1000000000 + i)::BIGINT AS id, COALESCE(t, 0)::BIGINT AS triangles
            FROM pkgs LEFT JOIN cnt ON n = i
        """,
        "link_prediction": """
            WITH pkgs AS (SELECT unnest(generate_series(0, 999)) AS i),
            vv AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
            und AS (SELECT DISTINCT least(i, (i*31 + j) % 1000) AS u, greatest(i, (i*31 + j) % 1000) AS v
                    FROM vv WHERE (i*31 + j) % 1000 <> i),
            adj AS (SELECT u AS w, v AS n FROM und UNION ALL SELECT v AS w, u AS n FROM und),
            deg AS (SELECT w, count(*) AS deg FROM adj GROUP BY w),
            adjt AS (SELECT a.w, a.n, CAST(round(1.0/ln(d.deg), 12) AS DECIMAL(28,12)) AS aa
                     FROM adj a JOIN deg d ON a.w = d.w),
            wedges AS (SELECT a1.n AS u, a2.n AS v, a1.aa
                       FROM adjt a1 JOIN adjt a2 ON a1.w = a2.w AND a1.n < a2.n),
            scores AS (SELECT u, v, count(*) AS common_neighbors,
                              CAST(sum(aa) AS DECIMAL(28,12)) AS adamic_adar
                       FROM wedges GROUP BY u, v),
            cand AS (SELECT s.* FROM scores s
                     WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.u = s.u AND e.v = s.v))
            SELECT (1000000000 + c.u)::BIGINT AS u, (1000000000 + c.v)::BIGINT AS v,
                   c.common_neighbors::BIGINT AS common_neighbors,
                   CAST(round(c.common_neighbors * 1.0 / (du.deg + dv.deg - c.common_neighbors), 6)
                        AS DECIMAL(18,6))::VARCHAR AS jaccard,
                   c.adamic_adar::VARCHAR AS adamic_adar
            FROM cand c JOIN deg du ON du.w = c.u JOIN deg dv ON dv.w = c.v
            ORDER BY c.common_neighbors DESC, c.adamic_adar DESC, u, v LIMIT 50
        """,
        "shortest_paths": f"""
            SELECT ({R} + r_regionkey)::BIGINT AS landmark, 0 AS dist, 1::BIGINT AS n_nodes FROM region
            UNION ALL
            SELECT ({R} + n_regionkey)::BIGINT, 1, count(*)::BIGINT FROM nation GROUP BY n_regionkey
            UNION ALL
            SELECT landmark, 2, sum(cnt)::BIGINT FROM (
              SELECT ({R} + n_regionkey)::BIGINT AS landmark, count(*) AS cnt
              FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_regionkey
              UNION ALL
              SELECT ({R} + n_regionkey)::BIGINT, count(*)
              FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_regionkey
            ) GROUP BY landmark
        """,
        "harmonic_centrality": f"""
            SELECT ({R} + r_regionkey)::BIGINT AS id, CAST(0 AS DECIMAL(28,12))::VARCHAR AS harmonic FROM region
            UNION ALL
            SELECT ({N} + n_nationkey)::BIGINT, CAST(1 AS DECIMAL(28,12))::VARCHAR FROM nation
            UNION ALL
            SELECT ({C} + c_custkey)::BIGINT, CAST(0.5 AS DECIMAL(28,12))::VARCHAR FROM customer
            UNION ALL
            SELECT ({S} + s_suppkey)::BIGINT, CAST(0.5 AS DECIMAL(28,12))::VARCHAR FROM supplier
        """,
        "scc": """
            WITH RECURSIVE
            pkgs AS (SELECT unnest(generate_series(0, 19)) AS i),
            v AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
            e AS (
              SELECT (1000000000 + i)::BIGINT AS src, (2000000000 + i*256 + j)::BIGINT AS dst FROM v
              UNION ALL
              SELECT (2000000000 + i*256 + j)::BIGINT, (1000000000 + (i*31 + j) % 20)::BIGINT
              FROM v WHERE (i*31 + j) % 20 <> i
            ),
            n AS (
              SELECT (1000000000 + i)::BIGINT AS id FROM pkgs
              UNION ALL
              SELECT (2000000000 + i*256 + j)::BIGINT FROM v
            ),
            reach AS (
              SELECT src AS a, dst AS b FROM e
              UNION
              SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
            ),
            mutual AS (
              SELECT r1.a AS id, r1.b AS m
              FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            )
            SELECT id, min(m)::BIGINT AS scc FROM (
              SELECT id, id AS m FROM n
              UNION ALL
              SELECT id, m FROM mutual
            ) GROUP BY id
        """,
        "hackage_one_step": "SELECT 120::BIGINT AS n_versions",
        "hackage_depends_top": """
            WITH pkgs AS (SELECT unnest(generate_series(0, 999)) AS i),
            v AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
            d AS (SELECT (i*31 + j) % 1000 AS tgt FROM v WHERE (i*31 + j) % 1000 <> i)
            SELECT (1000000000 + tgt)::BIGINT AS pkg_id, count(*)::BIGINT AS n_dependents
            FROM d GROUP BY tgt ORDER BY n_dependents DESC, pkg_id LIMIT 10
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2))::VARCHAR AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))::VARCHAR AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(30,8))::VARCHAR AS sum_disc_price,
                   count(*)::BIGINT AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3_like": """
            SELECT o_orderkey, rev::VARCHAR AS revenue FROM (
              SELECT o_orderkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(30,8)) AS rev
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
              GROUP BY o_orderkey ORDER BY rev DESC, o_orderkey LIMIT 10)
        """,
        "tpch_q5_like": """
            SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(30,8))::VARCHAR AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_top_order": """
            SELECT o_custkey, o_orderkey, top_price::VARCHAR AS top_price FROM (
              SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS top_price,
                     row_number() OVER (PARTITION BY o_custkey
                         ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey) AS rn
              FROM orders) WHERE rn = 1
        """,
        "ntile_deciles": """
            WITH spend AS (
              SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS total_value
              FROM events GROUP BY user_id
            ),
            d AS (
              SELECT user_id, total_value,
                     ntile(10) OVER (ORDER BY total_value DESC, user_id)::INT AS decile
              FROM spend
            )
            SELECT decile, count(*)::BIGINT AS n_users,
                   min(total_value)::VARCHAR AS min_spend,
                   max(total_value)::VARCHAR AS max_spend
            FROM d GROUP BY decile
        """,
        "rollup_revenue": """
            SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                   COALESCE(l_linestatus, 'ALL') AS linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(30,8))::VARCHAR AS revenue,
                   count(*)::BIGINT AS cnt
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "distinct_agg": """
            SELECT o_orderpriority, count(DISTINCT o_custkey)::BIGINT AS n_customers,
                   count(*)::BIGINT AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "semi_join": """
            SELECT p_partkey, p_name FROM part
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 45)
        """,
        "set_ops": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier
            EXCEPT ALL
            SELECT n_nationkey FROM nation WHERE n_regionkey = 0
        """,
        "bpe_token_counts": r"""
            SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]'))::INT AS n_bpe_tokens
            FROM documents
        """,
        "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "text_token_counts": r"""
            SELECT doc_id, len(text)::INT AS n_chars,
                   CASE WHEN len(trim(text)) = 0 THEN 0
                        ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END::INT AS n_tokens
            FROM documents
        """,
        "text_quality": r"""
            WITH base AS (
              SELECT doc_id, len(text) AS n_chars,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_tokens,
                     len(regexp_replace(text, '[a-zA-Z0-9 \t\n\x0b\f\r]', '', 'g')) AS n_punct
              FROM documents)
            SELECT doc_id, n_chars::INT AS n_chars, n_tokens::INT AS n_tokens,
                   (CASE WHEN n_tokens > 0 THEN CAST(round(n_chars::DOUBLE / n_tokens, 6) AS DECIMAL(18,6)) END)::VARCHAR AS chars_per_token,
                   (CASE WHEN n_chars > 0 THEN CAST(round(n_punct::DOUBLE / n_chars, 6) AS DECIMAL(18,6)) END)::VARCHAR AS punct_ratio
            FROM base
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok FROM documents
            ),
            hist AS (SELECT doc_id, tok, count(*) AS n FROM toks WHERE len(tok) > 0 GROUP BY 1, 2),
            ndocs AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
            dfreq AS (SELECT tok, count(*) AS df FROM hist GROUP BY tok),
            scored AS (
              SELECT doc_id, tok AS term, n * ln(nd::DOUBLE / df) AS tfidf_raw
              FROM hist JOIN dfreq USING (tok), ndocs
            ),
            ranked AS (
              SELECT doc_id, term, tfidf_raw,
                     row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, term) AS rnk
              FROM scored
            )
            SELECT doc_id, term, CAST(round(tfidf_raw, 6) AS DECIMAL(18,6))::VARCHAR AS tfidf, rnk::INT AS rank
            FROM ranked WHERE rnk <= 3
        """,
        "quality_filter": f"""
            WITH {_QF_CTES}
            SELECT doc_id, n_tokens,
                   mean_tok_len::VARCHAR AS mean_tok_len,
                   top_term_ratio::VARCHAR AS top_term_ratio,
                   {_QF_PASSES} AS passes
            FROM r
        """,
        "lang_id": lang_markers_sql,
        "fingerprint": r"""
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS fp FROM documents
        """,
        "similarity_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
                 q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT vec_id, score::VARCHAR AS score FROM (
              SELECT vec_id,
                     CAST(round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS DECIMAL(18,6)) AS score
              FROM e, q WHERE vec_id <> 0
              ORDER BY score DESC, vec_id LIMIT 10)
        """,
        "embed_near_dup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT vec_a, vec_b, score::VARCHAR AS score FROM (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     CAST(round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
                       AS DECIMAL(18,6)) AS score
              FROM e a, e b WHERE a.vec_id < b.vec_id)
            WHERE score >= 0.35
        """,
        "kmeans": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
            a0 AS (
              SELECT vec_id, v,
                     (SELECT cid FROM (
                        SELECT cid, list_dot_product(e.v, cv)
                               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                        FROM c0 ORDER BY cs DESC, cid ASC LIMIT 1) s) AS list_id
              FROM e
            ),
            m1 AS MATERIALIZED (
              SELECT list_id, i, avg(v[i]) AS m
              FROM a0, unnest(generate_series(1, len(v))) AS t(i)
              GROUP BY 1, 2
            ),
            c1 AS MATERIALIZED (SELECT list_id AS cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY 1)
            SELECT vec_id,
                   (SELECT cid FROM (
                      SELECT cid, list_dot_product(a0.v, cv)
                             / (sqrt(list_dot_product(a0.v, a0.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                      FROM c1 ORDER BY cs DESC, cid ASC LIMIT 1) s) AS list_id
            FROM a0
        """,
        "label_centroids": """
            SELECT label, i - 1 AS pos,
                   CAST(round(avg(embedding[i]::DOUBLE), 6) AS DECIMAL(18,6))::VARCHAR AS m
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
            GROUP BY label, i
        """,
        "salted_agg": "SELECT l_returnflag, count(*)::BIGINT AS cnt FROM lineitem GROUP BY l_returnflag",
        "pattern_scan": """
            SELECT event_type,
                   sum(len(regexp_extract_all(props, '[0-9]+')))::BIGINT AS total_digit_runs,
                   sum(CASE WHEN len(regexp_extract_all(props, '[0-9]+')) > 0 THEN 1 ELSE 0 END)::BIGINT
                     AS events_with_digits
            FROM events GROUP BY event_type
        """,
        "sliding_chunks": r"""
            WITH dw AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'),
                                 t -> len(t) > 0) AS w
              FROM documents
            ),
            idx AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // 16)) AS ci
                    FROM dw WHERE len(w) >= 1),
            ch AS (SELECT doc_id, ci AS chunk_idx,
                          w[ci*16 + 1 : least(ci*16 + 32, len(w))] AS c
                   FROM idx)
            SELECT doc_id, chunk_idx::BIGINT AS chunk_idx, len(c)::BIGINT AS n_tokens,
                   md5(array_to_string(c, ' ')) AS chunk_md5
            FROM ch
        """,
        "bigram_logprob": r"""
            WITH docs_w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'),
                                 t -> len(t) > 0) AS w
              FROM documents
            ),
            idx AS (SELECT doc_id, w, unnest(generate_series(2, len(w))) AS i
                    FROM docs_w WHERE len(w) >= 2),
            pairs AS (SELECT doc_id, w[i-1] AS w1, w[i] AS w2 FROM idx),
            big AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
            ctx AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1)
            SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   CAST(round(avg(ln(c2::DOUBLE / c1)), 6) AS DECIMAL(18,6))::VARCHAR AS mean_logprob
            FROM pairs JOIN big USING (w1, w2) JOIN ctx USING (w1)
            GROUP BY doc_id
        """,
        "repetition_stats": r"""
            WITH dw AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'),
                                 t -> len(t) > 0) AS w
              FROM documents
            ),
            base AS (SELECT doc_id, w, len(w) AS n_tokens FROM dw),
            g2 AS (SELECT doc_id, array_to_string(w[i : i + 1], ' ') AS g
                   FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
                         FROM base WHERE len(w) >= 2)),
            c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
            top2 AS (SELECT doc_id, max(c) AS maxrun FROM c2 GROUP BY doc_id),
            g3 AS (SELECT doc_id, array_to_string(w[i : i + 2], ' ') AS g
                   FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
                         FROM base WHERE len(w) >= 3)),
            c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
            dup3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
                     FROM c3 GROUP BY doc_id)
            SELECT b.doc_id, b.n_tokens::BIGINT AS n_tokens,
                   CASE WHEN b.n_tokens > 0
                        THEN (2 * coalesce(t.maxrun, 0))::DOUBLE / b.n_tokens
                        ELSE 0.0 END AS top2_frac,
                   CASE WHEN b.n_tokens > 0
                        THEN (3 * coalesce(d.dup, 0))::DOUBLE / b.n_tokens
                        ELSE 0.0 END AS dup3_frac
            FROM base b
            LEFT JOIN top2 t ON b.doc_id = t.doc_id
            LEFT JOIN dup3 d ON b.doc_id = d.doc_id
        """,
        "jsonl_roundtrip": """
            SELECT lang, source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars, min(doc_id)::BIGINT AS min_doc_id
            FROM documents GROUP BY lang, source
        """,
        "approx_distinct": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct,
                   TRUE AS approx_ok
            FROM events GROUP BY event_type
        """,
        "multimodal_features": """
            WITH s AS (SELECT unnest(generate_series(0, 63)) AS i)
            SELECT i::BIGINT AS media_id,
                   CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   COALESCE(CASE WHEN i % 3 = 0 AND i % 15 <> 0 THEN
                                     (CASE WHEN i % 6 = 0 THEN 'png'
                                           WHEN i % 12 = 9 THEN 'bmp'
                                           ELSE 'jpeg' END)
                                 WHEN i % 3 = 1 THEN 'wav'
                                 WHEN i % 3 = 2 AND i % 15 <> 2 THEN 'mp4' END, 'none') AS codec,
                   COALESCE(CASE WHEN (i % 3 = 0 AND i % 15 <> 0)
                                   OR (i % 3 = 2 AND i % 15 <> 2) THEN 64 + i END, -1)::INT AS width,
                   COALESCE(CASE WHEN (i % 3 = 0 AND i % 15 <> 0)
                                   OR (i % 3 = 2 AND i % 15 <> 2) THEN 48 + i END, -1)::INT AS height,
                   COALESCE(CASE WHEN i % 3 = 1 THEN 5000 + i * 100
                                 WHEN i % 3 = 2 AND i % 15 <> 2 THEN 5000 + i * 100 END, -1)::BIGINT AS duration_ms,
                   ((i % 3 = 0 AND i % 15 <> 0) OR i % 3 = 1
                    OR (i % 3 = 2 AND i % 15 <> 2)) AS decode_ok
            FROM s
        """,
        "normalize_text": """
            SELECT doc_id, length(t)::BIGINT AS n_chars_norm, md5(t) AS norm_md5
            FROM (SELECT doc_id,
                         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \\t\\n\\x0b\\f\\r]', ' ', 'g'),
                                             '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS t
                  FROM documents)
        """,
        "negative_sampling": """
            WITH pkgs AS (SELECT unnest(generate_series(0, 999)) AS i),
            vv AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
            e AS (SELECT DISTINCT (1000000000 + i)::BIGINT AS src,
                         (1000000000 + (i*31 + j) % 1000)::BIGINT AS dst
                  FROM vv WHERE (i*31 + j) % 1000 <> i),
            srcs AS (SELECT DISTINCT src FROM e),
            tries AS (SELECT src, unnest(generate_series(0, 5)) AS i FROM srcs),
            prop AS (SELECT src, i,
                            1000000000 + ((src * 2654435761 + (i + 1) * 40503) % 1000) AS cand
                     FROM tries),
            ok AS (SELECT p.* FROM prop p WHERE p.cand <> p.src
                   AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = p.src AND e.dst = p.cand)),
            dedup AS (SELECT src, cand, min(i) AS i FROM ok GROUP BY src, cand),
            ranked AS (SELECT src, cand, row_number() OVER (PARTITION BY src ORDER BY i) AS rank FROM dedup)
            SELECT src, cand::BIGINT AS neg_dst, rank::BIGINT AS rank FROM ranked WHERE rank <= 3
        """,
        "range_join": """
            WITH bands AS (SELECT unnest(generate_series(0, 49)) AS band_id),
            b AS (SELECT band_id, band_id * 10.0 AS lo, (band_id + 1) * 10.0 AS hi FROM bands)
            SELECT b.band_id::BIGINT AS band_id, count(*)::BIGINT AS n_events,
                   sum(CAST(e.value AS DECIMAL(18,2)))::VARCHAR AS total_value
            FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi
            GROUP BY b.band_id
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(value AS DECIMAL(18,2)))::VARCHAR AS total_value
            FROM events GROUP BY 1, 2
        """,
        "events_json": """
            SELECT (json_extract(props, '$.k')::INT) % 10 AS k_mod,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(value AS DECIMAL(18,2)))::VARCHAR AS total_value
            FROM events GROUP BY 1
        """,
        "stream_enrich": """
            SELECT c_mktsegment, event_type,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(value AS DECIMAL(18,2)))::VARCHAR AS total_value
            FROM events LEFT JOIN customer ON user_id = c_custkey
            GROUP BY 1, 2
        """,
        "sessionize": """
            WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value FROM events),
            marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessions AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, brk DESC ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start, user_id,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(value AS DECIMAL(18,2)))::VARCHAR AS total_value
            FROM sessions GROUP BY user_id, sid
        """,
        # streaming_summary: the batch-SQL rendering of the three streaming
        # scalars — session CTEs identical to the sessionize oracle, a
        # LEFT-JOIN enrichment, and signed per-type counter totals
        "streaming_summary": """
            WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value FROM events),
            marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), numbered AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, brk DESC ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            ), sess AS (
              SELECT user_id, sid, count(*) AS n_events,
                     sum(CAST(value AS DECIMAL(18,2))) AS total_value
              FROM numbered GROUP BY user_id, sid
            ), enr AS (
              SELECT e.value, c.c_mktsegment
              FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
            ), counters AS (
              SELECT event_type,
                     CASE WHEN event_type IN ('purchase', 'error') THEN -count(*)
                          ELSE count(*) END AS n
              FROM events GROUP BY event_type
            )
            SELECT 'sessions' AS metric, count(*)::VARCHAR AS value FROM sess
            UNION ALL SELECT 'session_events', sum(n_events)::VARCHAR FROM sess
            UNION ALL SELECT 'session_value', sum(total_value)::VARCHAR FROM sess
            UNION ALL SELECT 'enriched_rows', count(*)::VARCHAR FROM enr
            UNION ALL SELECT 'enriched_matched', count(c_mktsegment)::VARCHAR FROM enr
            UNION ALL SELECT 'enriched_segments', count(DISTINCT c_mktsegment)::VARCHAR FROM enr
            UNION ALL SELECT 'enriched_value',
                sum(CASE WHEN c_mktsegment IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) END)::VARCHAR FROM enr
            UNION ALL SELECT 'counter_keys', count(*)::VARCHAR FROM counters
            UNION ALL SELECT 'counter_net', sum(n)::VARCHAR FROM counters
            UNION ALL SELECT 'counter_max', max(n)::VARCHAR FROM counters
        """,
        # repetition_exact: the naive relational rendering of the exact
        # covered-token fractions — explode position-indexed grams, pick
        # the top gram (ties: lexicographically smallest), union covered
        # positions via DISTINCT unnest of each occurrence's span
        "repetition_exact": r"""
            WITH base AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'),
                                 x -> len(x) > 0) AS words
              FROM documents
            ), sized AS (SELECT doc_id, words, len(words) AS n_tokens FROM base),
            g2 AS (
              SELECT doc_id, i, array_to_string(list_slice(words, i, i + 1), ' ') AS g
              FROM sized, unnest(generate_series(1, n_tokens - 1)) t(i) WHERE n_tokens >= 2
            ),
            g3 AS (
              SELECT doc_id, i, array_to_string(list_slice(words, i, i + 2), ' ') AS g
              FROM sized, unnest(generate_series(1, n_tokens - 2)) t(i) WHERE n_tokens >= 3
            ),
            top2 AS (
              SELECT doc_id, g FROM (
                SELECT doc_id, g,
                       row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
                FROM g2 GROUP BY doc_id, g) WHERE rn = 1
            ),
            cov2 AS (
              SELECT a.doc_id, count(DISTINCT s.j) AS covered
              FROM g2 a JOIN top2 ON a.doc_id = top2.doc_id AND a.g = top2.g,
                   unnest(generate_series(a.i, a.i + 1)) s(j)
              GROUP BY a.doc_id
            ),
            dup3 AS (SELECT doc_id, g FROM g3 GROUP BY doc_id, g HAVING count(*) >= 2),
            cov3 AS (
              SELECT a.doc_id, count(DISTINCT s.j) AS covered
              FROM g3 a JOIN dup3 ON a.doc_id = dup3.doc_id AND a.g = dup3.g,
                   unnest(generate_series(a.i, a.i + 2)) s(j)
              GROUP BY a.doc_id
            )
            SELECT s.doc_id, s.n_tokens::BIGINT AS n_tokens,
                   CASE WHEN s.n_tokens > 0
                        THEN COALESCE(cov2.covered, 0)::DOUBLE / s.n_tokens ELSE 0.0 END AS top2_covered_frac,
                   CASE WHEN s.n_tokens > 0
                        THEN COALESCE(cov3.covered, 0)::DOUBLE / s.n_tokens ELSE 0.0 END AS dup3_covered_frac
            FROM sized s
            LEFT JOIN cov2 ON s.doc_id = cov2.doc_id
            LEFT JOIN cov3 ON s.doc_id = cov3.doc_id
        """,
        "ngram_jaccard": r"""
            WITH w AS (
              SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, lang,
                     array_to_string(list_slice(words, i, i + 2), ' ') AS shingle
              FROM w, unnest(generate_series(1, greatest(len(words) - 2, 1))) AS t(i)
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   CAST(round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS DECIMAL(18,6))::VARCHAR AS jaccard
            FROM inter
            JOIN sizes sa ON inter.doc_a = sa.doc_id
            JOIN sizes sb ON inter.doc_b = sb.doc_id
            WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 6) >= 0.5
        """,
        "unigram_logprob": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
              FROM documents
            ),
            t AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
            vocab AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
            tot AS (SELECT sum(c) AS n FROM vocab)
            SELECT doc_id,
                   CAST(round(avg(ln(c::DOUBLE / n)), 6) AS DECIMAL(18,6))::VARCHAR AS mean_logprob
            FROM t JOIN vocab USING (tok), tot
            GROUP BY doc_id
        """,
        "vocab_topk": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS token
              FROM documents
            ),
            hist AS (
              SELECT token, count(*)::BIGINT AS n_total, count(DISTINCT doc_id)::BIGINT AS doc_freq
              FROM toks WHERE len(token) > 0 GROUP BY token
            )
            SELECT token, n_total, doc_freq,
                   row_number() OVER (ORDER BY n_total DESC, token)::INT AS rank
            FROM hist ORDER BY n_total DESC, token LIMIT 50
        """,
        "chunk_dedup": r"""
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
              FROM documents
            ),
            ch AS (
              SELECT doc_id, i AS pos,
                     array_to_string(list_slice(words, i*10 + 1, i*10 + 10), ' ') AS chunk
              FROM w, unnest(generate_series(0, (len(words) + 9) // 10 - 1)) AS t(i)
            ),
            marked AS (
              SELECT doc_id, pos, chunk,
                     row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
              FROM ch
            )
            SELECT doc_id, count(*)::BIGINT AS n_chunks,
                   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                   md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '')) AS dedup_fp
            FROM marked GROUP BY doc_id
        """,
        "pack_sequences": r"""
            WITH d AS (
              SELECT doc_id,
                     substr(md5(doc_id::VARCHAR || ':pack'), 1, 1) AS shard,
                     (CASE WHEN len(trim(text)) = 0 THEN 0
                           ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END)::BIGINT AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT doc_id, shard, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
              FROM d
            )
            SELECT doc_id, shard, n_tokens,
                   (strt // 2048)::BIGINT AS seq_id,
                   (strt % 2048)::BIGINT AS tok_offset
            FROM c
        """,
        "agg_messages": """
            SELECT (2000000000000 + n_nationkey)::BIGINT AS id,
                   (1 + (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
                      + (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey))::BIGINT AS n_msgs,
                   (1000000000000 + n_regionkey)::BIGINT AS min_nbr
            FROM nation
            UNION ALL
            SELECT (1000000000000 + r_regionkey)::BIGINT,
                   (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)::BIGINT,
                   (SELECT 2000000000000 + min(n_nationkey) FROM nation WHERE n_regionkey = r_regionkey)::BIGINT
            FROM region
            WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey)
        """,
        "similarity_ivf": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16),
            assigned AS (
              SELECT vec_id, v,
                     (SELECT cid FROM (
                        SELECT cid, list_dot_product(e.v, cv)
                               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                        FROM cents ORDER BY cs DESC, cid ASC LIMIT 1) s) AS list_id
              FROM e
            ),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            probe AS (
              SELECT cid AS list_id FROM cents, q
              ORDER BY list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC,
                       cid ASC
              LIMIT 4
            )
            SELECT vec_id, score::VARCHAR AS score, list_id FROM (
              SELECT vec_id,
                     CAST(round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
                       AS DECIMAL(18,6)) AS score,
                     list_id
              FROM assigned JOIN probe USING (list_id), q
              WHERE vec_id <> 0
              ORDER BY score DESC, vec_id ASC LIMIT 10)
        """,
        "decontaminate": r"""
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(words, i, i + 4), ' ') AS shingle
              FROM w, unnest(generate_series(1, greatest(len(words) - 4, 1))) AS t(i)
            ),
            bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
            corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
            sizes AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM corpus GROUP BY 1),
            hits AS (
              SELECT c.doc_id, count(*)::BIGINT AS n_overlap
              FROM corpus c JOIN bench USING (shingle) GROUP BY 1
            )
            SELECT s.doc_id, s.n_shingles,
                   coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
                   coalesce(h.n_overlap, 0) >= 1 AS contaminated
            FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
        """,
        "funnel": """
            WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
            s1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(ts) AS t2 FROM ev e JOIN s1 USING (user_id)
                   WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 86400 SECOND
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(ts) AS t3 FROM ev e JOIN s2 USING (user_id)
                   WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL 86400 SECOND
                   GROUP BY 1)
            SELECT s1.user_id,
                   strftime(t1, '%Y-%m-%d %H:%M:%S') AS t1,
                   strftime(t2, '%Y-%m-%d %H:%M:%S') AS t2,
                   strftime(t3, '%Y-%m-%d %H:%M:%S') AS t3
            FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        """,
        "cube_revenue": """
            SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                   COALESCE(l_linestatus, 'ALL') AS linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(30,8))::VARCHAR AS revenue,
                   count(*)::BIGINT AS cnt
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "retention_cohorts": """
            WITH f AS (SELECT user_id, min(ts::TIMESTAMP) AS first_ts FROM events GROUP BY 1),
            a AS (
              SELECT e.user_id, strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
                     floor((epoch_us(e.ts::TIMESTAMP) - epoch_us(f.first_ts))
                           / (7 * 86400 * 1000000.0))::BIGINT AS period
              FROM events e JOIN f USING (user_id)
            )
            SELECT cohort_week, period, count(DISTINCT user_id)::BIGINT AS n_users
            FROM a GROUP BY 1, 2
        """,
        "pivot_events": """
            SELECT user_id,
                   (count(*) FILTER (event_type = 'click'))::BIGINT AS click,
                   (count(*) FILTER (event_type = 'error'))::BIGINT AS error,
                   (count(*) FILTER (event_type = 'purchase'))::BIGINT AS purchase,
                   (count(*) FILTER (event_type = 'signup'))::BIGINT AS signup,
                   (count(*) FILTER (event_type = 'view'))::BIGINT AS view
            FROM events GROUP BY user_id
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 8) <=
                  CASE lang WHEN 'en' THEN '80000000' WHEN 'zh' THEN 'ffffffff'
                            WHEN 'de' THEN '40000000' ELSE 'c0000000' END
        """,
        "per_group_cap": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':cap'), 1, 8), doc_id
                     ) AS rn
              FROM documents
            ) WHERE rn <= 10
        """,
        "mix_corpus": """
            WITH w AS (
              SELECT doc_id, source,
                     CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                                 WHEN 'src2' THEN 0 ELSE 1 END AS n_full,
                     CASE source WHEN 'src0' THEN '80000000' WHEN 'src1' THEN '80000000'
                                 WHEN 'src2' THEN '00000000' ELSE '00000000' END AS fb
              FROM documents
            )
            SELECT doc_id, source, epoch::INT AS epoch FROM (
              SELECT doc_id, source, unnest(generate_series(1, n_full)) AS epoch FROM w
              UNION ALL
              SELECT doc_id, source, n_full + 1 FROM w
              WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) < fb
            )
        """,
        "token_budget_mix": r"""
            WITH d AS (
              SELECT doc_id, source,
                     (CASE WHEN len(trim(text)) = 0 THEN 0
                           ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END)::BIGINT AS n_tokens,
                     substr(md5(doc_id::VARCHAR || ':budget'), 1, 8) AS h,
                     CASE source WHEN 'src0' THEN 50000 WHEN 'src1' THEN 20000 ELSE 5000 END AS b
              FROM documents
            ),
            c AS (
              SELECT doc_id, source, n_tokens, b,
                     sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum_tokens
              FROM d
            )
            -- cum_tokens::BIGINT (r11 all-rows hash sweep): DuckDB's
            -- windowed sum of BIGINT widens to HUGEINT, which pandas
            -- renders as float64 ('1004.0' vs Spark's '1004')
            SELECT doc_id, source, n_tokens, cum_tokens::BIGINT AS cum_tokens
            FROM c WHERE cum_tokens - n_tokens < b
        """,
        "rolling_features": """
            SELECT event_id, user_id,
                   strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts,
                   (count(*) OVER w)::BIGINT AS n_win,
                   (sum(CAST(value AS DECIMAL(18,2))) OVER w)::VARCHAR AS sum_win,
                   CAST(round((sum(CAST(value AS DECIMAL(18,2))) OVER w)
                              / (count(*) OVER w), 6) AS DECIMAL(18,6))::VARCHAR AS mean_win
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        "interval_join": """
            SELECT c.event_id AS click_event_id, c.user_id,
                   v.event_id AS view_event_id,
                   CAST(v.value AS DECIMAL(18,2))::VARCHAR AS view_value
            FROM (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
                  WHERE event_type = 'click') c
            JOIN (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value FROM events
                  WHERE event_type = 'view') v
              ON c.user_id = v.user_id
             AND v.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
        """,
        "events_percentiles": """
            SELECT event_type, count(*)::BIGINT AS n,
                   CAST(round(avg(value), 6) AS DECIMAL(18,6))::VARCHAR AS mean,
                   CAST(round(quantile_cont(value, 0.5), 6) AS DECIMAL(18,6))::VARCHAR AS p50,
                   CAST(round(quantile_cont(value, 0.95), 6) AS DECIMAL(18,6))::VARCHAR AS p95
            FROM events GROUP BY event_type
        """,
        "bm25_search": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
              FROM documents
            ),
            hist AS (
              SELECT doc_id, tok, count(*)::DOUBLE AS tf
              FROM toks WHERE len(tok) > 0 GROUP BY 1, 2
            ),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM hist GROUP BY 1),
            scalars AS (SELECT avg(dl) AS avgdl, count(*)::BIGINT AS n_docs FROM dl),
            matched AS (SELECT * FROM hist WHERE tok IN ('join', 'spark', 'window')),
            dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM matched GROUP BY 1),
            scored AS (
              SELECT m.doc_id,
                     CAST(round(sum(
                       ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                       * m.tf * 2.2
                       / (m.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
                     ), 6) AS DECIMAL(18,6)) AS score
              FROM matched m
              JOIN dfreq f USING (tok) JOIN dl d USING (doc_id), scalars s
              GROUP BY m.doc_id
            )
            SELECT doc_id, score::VARCHAR AS score,
                   row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank
            FROM scored ORDER BY score DESC, doc_id LIMIT 10
        """,
        "asof_join": """
            WITH clicks AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value
                            FROM events WHERE event_type = 'click'),
                 views  AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value
                            FROM events WHERE event_type = 'view')
            SELECT c.event_id, c.user_id,
                   CAST(c.value AS DECIMAL(18,2))::VARCHAR AS click_value,
                   v.event_id AS view_event_id,
                   CAST(v.value AS DECIMAL(18,2))::VARCHAR AS view_value
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        # simhash_buckets / similarity_lsh: rows-only checks (xxhash64
        # bucketing has no SQL equivalent). minhash_lsh_pairs and
        # embed_near_dup_lsh DO have oracles — their window queries run in
        # deterministic md5 hash mode (generators below); sub-100% recall
        # never blocked checkability, only the non-portable hash did.
    }


def _dedup_cluster_ctes(rounds: int, max_doc_freq: int | None = None) -> list[str]:
    """The shared CTE chain: ngram_jaccard pairs (same as that query's
    oracle) feeding ``rounds`` HashMin rounds; ``l{rounds}`` holds the
    final (doc_id, cluster) labels. Reused by the dedup_clusters /
    dedup_keep_best / cluster_safe_split oracles so they cannot drift.

    ``max_doc_freq`` replays :func:`hgraphstorage_spark.pipeline.dedup.
    _cap_doc_freq`: shingles in more than that many docs leave the
    candidate index (per (lang, shingle) block key); per-doc set sizes
    stay UNCAPPED, so capped scores <= uncapped scores and capped pairs
    are a subset — the bounded-candidate shape the driver window
    certifies (VERDICT r5 task 2)."""
    idx = "sh"
    cap_ctes: list[str] = []
    if max_doc_freq is not None:
        cap_ctes = [
            f"""hot AS (
              SELECT lang, shingle FROM sh GROUP BY lang, shingle
              HAVING count(*) <= {max_doc_freq}
            )""",
            "idx AS (SELECT sh.* FROM sh SEMI JOIN hot USING (lang, shingle))",
        ]
        idx = "idx"
    ctes = [
        r"""wds AS (
          SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        )""",
        """sh AS (
          SELECT DISTINCT doc_id, lang,
                 array_to_string(list_slice(words, i, i + 2), ' ') AS shingle
          FROM wds, unnest(generate_series(1, greatest(len(words) - 2, 1))) AS t(i)
        )""",
        "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)",
        *cap_ctes,
        f"""inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM {idx} a JOIN {idx} b ON a.shingle = b.shingle AND a.lang = b.lang
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        )""",
        """pairs AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON inter.doc_a = sa.doc_id
          JOIN sizes sb ON inter.doc_b = sb.doc_id
          WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 6) >= 0.5
        )""",
        "und AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "l0 AS (SELECT doc_id, doc_id AS cluster FROM documents)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""nm{r} AS (
              SELECT u.a AS doc_id, min(l{p}.cluster) AS nmin
              FROM und u JOIN l{p} ON u.b = l{p}.doc_id GROUP BY u.a
            )"""
        )
        ctes.append(
            f"""l{r} AS (
              SELECT l{p}.doc_id, least(l{p}.cluster, COALESCE(nm{r}.nmin, l{p}.cluster)) AS cluster
              FROM l{p} LEFT JOIN nm{r} USING (doc_id)
            )"""
        )
    return ctes


def _dedup_clusters_oracle_sql(rounds: int, max_doc_freq: int | None = None) -> str:
    """Unrolled-SQL oracle for near-dup clustering."""
    return (
        "WITH "
        + ",\n".join(_dedup_cluster_ctes(rounds, max_doc_freq))
        + f"""
        SELECT cluster, count(*)::BIGINT AS n_docs,
               sum(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END)::BIGINT AS n_kept
        FROM l{rounds} GROUP BY cluster HAVING count(*) > 1"""
    )


def _cluster_safe_split_oracle_sql(rounds: int, max_doc_freq: int | None = None) -> str:
    """Same cluster labels, then the hash_split CASE keyed on the CLUSTER
    id — generated from the same threshold helper the Spark side uses."""
    from hgraphstorage_spark.pipeline.sampling import hash_split_case_sql

    case = hash_split_case_sql(id_col="cluster")
    return (
        "WITH "
        + ",\n".join(_dedup_cluster_ctes(rounds, max_doc_freq))
        + f"""
        SELECT doc_id, cluster, {case} AS split FROM l{rounds}"""
    )


def _minhash_lsh_oracle_sql(
    n: int = 5, k: int = 64, bands: int = 16, threshold: float = 0.6
) -> str:
    """DuckDB replay of `minhash_lsh_pairs(hash_mode="md5")`: the md5_long
    hash family (word → shingle → permutation → band) is engine-portable,
    so the whole LSH pipeline — not just the verify — is oracle-checked.
    Nested-lambda list ops mirror the Spark HOFs one-for-one."""
    P = 2_147_483_647
    rpb = k // bands
    wh_idx = ", ".join(f"whs[i+{j}]" for j in range(n))  # [i+0..i+n-1], NULL-padded OOB
    return rf"""
        WITH wds AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        wh AS (SELECT doc_id, list_transform(words, w -> md5(w)) AS whs FROM wds),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(whs) - {n - 1}, 1)),
            i -> ('0x' || substr(md5(concat_ws(':', {wh_idx})), 1, 15))::BIGINT
          )) AS shs FROM wh
        ),
        ab AS (
          SELECT doc_id, list_transform(shs, h -> {{'a': h % {P},
            'b': (h >> 29) % {P}}}) AS abs
          FROM sh
        ),
        sigs AS (
          SELECT doc_id, list_transform(generate_series(0, {k - 1}),
            i -> list_min(list_transform(abs, s -> (s.a + i * s.b) % {P}))) AS sig
          FROM ab
        ),
        banded AS (
          SELECT doc_id, b AS band_id,
                 md5(array_to_string(list_slice(sig, {rpb}*b + 1, {rpb}*b + {rpb}), ':')) AS band_hash
          FROM sigs, unnest(generate_series(0, {bands - 1})) AS t(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ),
        j AS (
          SELECT doc_a, doc_b,
                 CAST(round(len(list_intersect(sa.shs, sb.shs))::DOUBLE
                      / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6)
                   AS DECIMAL(18,6)) AS jaccard
          FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id JOIN sh sb ON cand.doc_b = sb.doc_id
        )
        SELECT doc_a, doc_b, jaccard::VARCHAR AS jaccard FROM j WHERE jaccard >= {threshold}
    """


def _incremental_lsh_oracle_sql(
    n: int = 5, k: int = 64, bands: int = 16, threshold: float = 0.6
) -> str:
    """DuckDB replay of ``incremental_near_dup(hash_mode="md5")`` with
    new = odd doc_ids probing seen = even doc_ids: identical CTE chain to
    the symmetric oracle, asymmetric candidate join."""
    P = 2_147_483_647
    rpb = k // bands
    wh_idx = ", ".join(f"whs[i+{j}]" for j in range(n))
    return rf"""
        WITH wds AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        wh AS (SELECT doc_id, list_transform(words, w -> md5(w)) AS whs FROM wds),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(whs) - {n - 1}, 1)),
            i -> ('0x' || substr(md5(concat_ws(':', {wh_idx})), 1, 15))::BIGINT
          )) AS shs FROM wh
        ),
        ab AS (
          SELECT doc_id, list_transform(shs, h -> {{'a': h % {P},
            'b': (h >> 29) % {P}}}) AS abs
          FROM sh
        ),
        sigs AS (
          SELECT doc_id, list_transform(generate_series(0, {k - 1}),
            i -> list_min(list_transform(abs, s -> (s.a + i * s.b) % {P}))) AS sig
          FROM ab
        ),
        banded AS (
          SELECT doc_id, b AS band_id,
                 md5(array_to_string(list_slice(sig, {rpb}*b + 1, {rpb}*b + {rpb}), ':')) AS band_hash
          FROM sigs, unnest(generate_series(0, {bands - 1})) AS t(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS seen_id
          FROM banded a JOIN banded b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        ),
        j AS (
          SELECT cand.doc_id, cand.seen_id,
                 CAST(round(len(list_intersect(sa.shs, sb.shs))::DOUBLE
                      / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6)
                   AS DECIMAL(18,6)) AS jaccard
          FROM cand JOIN sh sa ON cand.doc_id = sa.doc_id JOIN sh sb ON cand.seen_id = sb.doc_id
        )
        SELECT doc_id, seen_id, jaccard::VARCHAR AS jaccard FROM j WHERE jaccard >= {threshold}
    """


def _fuzzy_decon_oracle_sql(
    n: int = 5, k: int = 64, bands: int = 16, threshold: float = 0.5
) -> str:
    """DuckDB replay of ``fuzzy_decontaminate(hash_mode="md5")`` with
    corpus = doc_id % 50 != 0 probing benchmark = doc_id % 50 == 0:
    identical md5 minhash CTE chain to the incremental oracle, asymmetric
    candidate join on the split predicates, then the per-corpus-doc
    audit aggregation (every corpus doc returns with its flag)."""
    P = 2_147_483_647
    rpb = k // bands
    wh_idx = ", ".join(f"whs[i+{j}]" for j in range(n))
    return rf"""
        WITH wds AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        wh AS (SELECT doc_id, list_transform(words, w -> md5(w)) AS whs FROM wds),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(whs) - {n - 1}, 1)),
            i -> ('0x' || substr(md5(concat_ws(':', {wh_idx})), 1, 15))::BIGINT
          )) AS shs FROM wh
        ),
        ab AS (
          SELECT doc_id, list_transform(shs, h -> {{'a': h % {P},
            'b': (h >> 29) % {P}}}) AS abs
          FROM sh
        ),
        sigs AS (
          SELECT doc_id, list_transform(generate_series(0, {k - 1}),
            i -> list_min(list_transform(abs, s -> (s.a + i * s.b) % {P}))) AS sig
          FROM ab
        ),
        banded AS (
          SELECT doc_id, b AS band_id,
                 md5(array_to_string(list_slice(sig, {rpb}*b + 1, {rpb}*b + {rpb}), ':')) AS band_hash
          FROM sigs, unnest(generate_series(0, {bands - 1})) AS t(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS seen_id
          FROM banded a JOIN banded b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.doc_id % 50 != 0 AND b.doc_id % 50 = 0
        ),
        j AS (
          SELECT cand.doc_id, cand.seen_id,
                 CAST(round(len(list_intersect(sa.shs, sb.shs))::DOUBLE
                      / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6)
                   AS DECIMAL(18,6)) AS jaccard
          FROM cand JOIN sh sa ON cand.doc_id = sa.doc_id JOIN sh sb ON cand.seen_id = sb.doc_id
        ),
        per AS (
          SELECT doc_id, count(*)::BIGINT AS n_matches, max(jaccard) AS max_jaccard
          FROM j WHERE jaccard >= {threshold} GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_matches, 0)::BIGINT AS n_matches,
               p.max_jaccard::VARCHAR AS max_jaccard,
               (coalesce(p.n_matches, 0) > 0) AS contaminated
        FROM documents d LEFT JOIN per p USING (doc_id)
        WHERE d.doc_id % 50 != 0
    """


def _topic_oracle_sql(
    final: str, d: int = 64, scale: int = 1000, n_topics: int = 8
) -> str:
    """DuckDB replay of ``topic_clusters(hash_mode="md5")``: md5-bucketed
    hashed TF-IDF vectors with integer-quantized weights (floor(tf * ln(1
    + N/df) * scale) — sums exact in any order, so the Lloyd centroid
    means match Spark bit-for-bit), then the same two cosine k-means
    rounds as the kmeans oracle (deterministic smallest-id init, ties to
    the smaller centroid id). ``final`` selects either the assignment
    rows (topic_clusters) or the per-topic token top-k (topic_terms) over
    the shared CTE chain."""
    chain = rf"""
        WITH dw AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'),
                             t -> len(t) > 0) AS toks
          FROM documents
        ),
        bk AS (
          SELECT doc_id, toks,
                 list_transform(toks, t -> (('0x' || substr(md5(t), 1, 15))::BIGINT % {d})::INT) AS bs
          FROM dw WHERE len(toks) > 0
        ),
        tf AS (
          SELECT doc_id,
                 list_transform(generate_series(0, {d - 1}),
                                b -> len(list_filter(bs, x -> x = b))::DOUBLE) AS tfv
          FROM bk
        ),
        dfb AS (
          SELECT b, count(*) AS df
          FROM (SELECT DISTINCT doc_id, unnest(bs) AS b FROM bk) GROUP BY b
        ),
        nn AS (SELECT count(*) AS n FROM bk),
        grid AS (SELECT unnest(generate_series(0, {d - 1})) AS b),
        idfv AS (
          SELECT list(coalesce(ln(1.0 + nn.n / dfb.df), 0.0) ORDER BY g.b) AS iv
          FROM grid g LEFT JOIN dfb ON g.b = dfb.b CROSS JOIN nn
          GROUP BY nn.n
        ),
        vv AS (
          SELECT tf.doc_id,
                 list_transform(generate_series(1, {d}),
                                i -> floor(tfv[i] * iv[i] * {scale})) AS v
          FROM tf, idfv
        ),
        c0 AS (SELECT doc_id AS cid, v AS cv FROM vv ORDER BY doc_id LIMIT {n_topics}),
        a0 AS (
          SELECT doc_id, v,
                 (SELECT cid FROM (
                    SELECT cid, list_dot_product(vv.v, cv)
                           / (sqrt(list_dot_product(vv.v, vv.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                    FROM c0 ORDER BY cs DESC, cid ASC LIMIT 1) s) AS topic
          FROM vv
        ),
        m1 AS MATERIALIZED (
          SELECT topic, i, avg(v[i]) AS m
          FROM a0, unnest(generate_series(1, len(v))) AS t(i)
          GROUP BY 1, 2
        ),
        c1 AS MATERIALIZED (SELECT topic AS cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY 1),
        a1 AS (
          SELECT doc_id,
                 (SELECT cid FROM (
                    SELECT cid, list_dot_product(a0.v, cv)
                           / (sqrt(list_dot_product(a0.v, a0.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                    FROM c1 ORDER BY cs DESC, cid ASC LIMIT 1) s) AS topic
          FROM a0
        )"""
    return chain + final


def _mmr_oracle_sql(qid: int = 0, pool: int = 15, k: int = 5, lam: float = 0.7) -> str:
    """DuckDB replay of ``q_mmr_rerank``: the exact-cosine pool cut
    (round-6 DECIMAL relevance, vec_id tie-break), then the k greedy MMR
    rounds unrolled as CTE pairs — s{r} picks the (mmr DESC, vec_id)
    argmax, r{r+1} re-scores the survivors' redundancy via the same
    left-fold cosine. ``(1.0 - lam)`` is computed in DOUBLE so the IEEE
    value matches Python's ``1.0 - lam`` bit-for-bit."""

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    # red is NULL until the first similarity lands (greatest skips NULL
    # on both engines); round 1's empty-set penalty is coalesce -> 0
    mmr_expr = (
        f"CAST(round(({lam!r})::DOUBLE * rel::DOUBLE"
        f" - ((1.0)::DOUBLE - ({lam!r})::DOUBLE)"
        " * coalesce(red::DOUBLE, (0.0)::DOUBLE), 6)"
        " AS DECIMAL(18,6))"
    )
    parts = [
        f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {qid}),
        pool AS MATERIALIZED (
          SELECT vec_id, v,
                 CAST(round({cos('v', 'qv')}, 6) AS DECIMAL(18,6)) AS rel
          FROM e, q WHERE vec_id <> {qid}
          ORDER BY rel DESC, vec_id LIMIT {pool}),
        r1 AS MATERIALIZED (
          SELECT vec_id, v, rel, CAST(NULL AS DECIMAL(18,6)) AS red FROM pool)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f"""s{r} AS MATERIALIZED (
          SELECT vec_id, v, rel, {mmr_expr} AS mmr
          FROM r{r} ORDER BY mmr DESC, vec_id LIMIT 1)"""
        )
        if r < k:
            parts.append(
                f"""r{r + 1} AS MATERIALIZED (
          SELECT p.vec_id, p.v, p.rel,
                 greatest(p.red, CAST(round({cos('p.v', 's.v')}, 6) AS DECIMAL(18,6))) AS red
          FROM r{r} p, s{r} s WHERE p.vec_id <> s.vec_id)"""
            )
    selects = [
        f"SELECT {qid}::BIGINT AS query_id, {r}::INT AS mmr_rank, vec_id,"
        f" rel::VARCHAR AS relevance, mmr::VARCHAR AS mmr_score FROM s{r}"
        for r in range(1, k + 1)
    ]
    return (
        "WITH "
        + ",\n        ".join(parts)
        + "\n        "
        + "\n        UNION ALL ".join(selects)
    )


def _robots_pat_ctes(agent: str = "trainbot") -> str:
    """The reusable rules-side CTE chain (fixture VALUES → field lines →
    RFC 9309 group selection → LIKE patterns with metachar escaping and
    www-normalized domains): `rb` through `pat`. Shared by the
    robots_filter oracle and the crawl_frontier composition oracle so
    the rules replay lives in ONE place."""
    values = ",\n          ".join(
        "('" + d + "', '" + txt.replace("'", "''") + "')" for d, txt in _ROBOTS_FIXTURE
    )
    return rf"""rb(domain, txt) AS (VALUES
          {values}
        ),
        ln AS (
          SELECT domain, i - 1 AS ord, ls[i] AS raw
          FROM (SELECT domain, string_split(txt, chr(10)) AS ls FROM rb),
               unnest(generate_series(1, len(ls))) AS t(i)
        ),
        fk AS (
          -- adjacency over EVERY directive line (review catch: grouping
          -- a filtered subset leaks directives across groups) — the
          -- same rule the Spark side applies in _robots_chosen_group_rows
          SELECT domain, ord,
                 lower(trim(regexp_extract(raw, '^([^:#]+):', 1))) AS k,
                 trim(regexp_extract(raw, '^[^:#]+:[ \t]*([^#]*)', 1)) AS v
          FROM ln
          WHERE lower(trim(regexp_extract(raw, '^([^:#]+):', 1))) != ''
        ),
        g0 AS (
          SELECT domain, ord, k, v,
                 coalesce(lag(k) OVER (PARTITION BY domain ORDER BY ord), '') AS pk
          FROM fk
        ),
        g AS (
          SELECT domain, ord, k, v,
                 (sum(CASE WHEN k = 'user-agent' AND pk != 'user-agent' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY domain ORDER BY ord ROWS UNBOUNDED PRECEDING))::BIGINT AS gid
          FROM g0
        ),
        sc AS (
          SELECT domain, gid,
                 max(CASE WHEN lower(v) = '{agent}' THEN 2 WHEN v = '*' THEN 1 ELSE 0 END) AS score
          FROM g WHERE k = 'user-agent' GROUP BY 1, 2
        ),
        scp AS (SELECT * FROM sc WHERE score > 0),
        bestg AS (SELECT domain, max(score) AS best FROM scp GROUP BY 1),
        ch AS (SELECT s.domain, s.gid FROM scp s JOIN bestg b
               ON s.domain = b.domain AND s.score = b.best),
        rules AS (
          SELECT g.domain, g.k AS directive, g.v AS path
          FROM g JOIN ch ON g.domain = ch.domain AND g.gid = ch.gid
          WHERE g.k IN ('allow', 'disallow') AND g.v != ''
        ),
        pat AS (
          SELECT regexp_replace(lower(domain), '^www\.', '') AS domain,
                 directive, path AS path_rule,
                 CASE WHEN right(path, 1) = '$'
                      THEN substr(body, 1, length(body) - 1)
                      ELSE body || '%' END AS pattern
          FROM (SELECT *, replace(replace(replace(replace(path,
                       '\', '\\'), '%', '\%'), '_', '\_'), '*', '%') AS body
                FROM rules)
        )"""


def _robots_oracle_sql(agent: str = "trainbot") -> str:
    """DuckDB replay of ``q_robots_filter``: the raw synthetic URL
    arithmetic, the shared rules chain (:func:`_robots_pat_ctes`), and
    the longest-match/allow-wins/rule-text argmax as a ranked window."""
    return rf"""
        WITH {_RAW_SYNTH_URL_SQL},
        {_robots_pat_ctes(agent)},
        up AS (
          SELECT doc_id,
                 lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://(?:[wW][wW][wW]\.)?([^/?#]+)', 1)) AS host,
                 CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)', 1) = ''
                      THEN '/' ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)', 1) END AS path
          FROM ru
        ),
        rk AS (
          SELECT doc_id, directive, path_rule,
                 row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY length(path_rule) DESC,
                            CASE WHEN directive = 'allow' THEN 1 ELSE 0 END DESC,
                            path_rule DESC) AS rn
          FROM up JOIN pat ON up.host = pat.domain
          WHERE up.path LIKE pat.pattern ESCAPE '\'
        )
        SELECT up.doc_id, up.host, up.path,
               coalesce(r.directive = 'allow', TRUE) AS allowed,
               r.path_rule AS matched_rule
        FROM up LEFT JOIN (SELECT * FROM rk WHERE rn = 1) r USING (doc_id)
    """


def _main_content_oracle_sql(context: bool = False) -> str:
    """DuckDB replay of ``q_main_content`` / ``q_main_content_ctx``: the
    same page-skeleton concat, then the extraction chain block by block —
    DROP subtrees, BLOCK_RE segmentation, inline-tag strip + entity chain
    + whitespace collapse, anchor-text link chars, stopword tokenization
    with edge punctuation stripped — and the same three-threshold CASE.
    Every regex literal is imported from pipeline/extraction.py so the
    two engines compile IDENTICAL patterns (all RE2-safe by
    construction); DuckDB needs explicit 'g' flags where Spark's
    regexp_replace is implicitly global. ``context=True`` replays the
    jusText second pass: Spark's two nearest-decisive array scans become
    the equivalent IGNORE NULLS window walk over the exploded blocks
    (same values, different shape — the oracle's whole point)."""
    from hgraphstorage_spark.pipeline.extraction import (
        ANCHOR_RE,
        BLOCK_RE,
        DROP_RE,
        ENTITIES,
        LINK_DENSITY_MAX,
        MIN_CHARS,
        STOPWORD_MIN,
        TAG_RE,
        TOKEN_NORM_RE,
        WS_RE,
    )

    def clean(expr: str) -> str:
        s = f"regexp_replace({expr}, '{TAG_RE}', ' ', 'g')"
        for k, v in ENTITIES:
            s = f"replace({s}, '{k}', '{v.replace(chr(39), chr(39) * 2)}')"
        return f"trim(regexp_replace({s}, '{WS_RE}', ' ', 'g'))"

    stops = ", ".join(f"'{s}'" for s in _MC_STOPS)
    pre = _MC_PRE.replace("'", "''")
    post = _MC_POST.replace("'", "''")
    mid = _MC_MID.replace("'", "''")
    body = (
        f"'{pre}' || coalesce(text, '') || '{mid}' || coalesce(text, '') || '{post}'"
        if context
        else f"'{pre}' || coalesce(text, '') || '{post}'"
    )
    half = STOPWORD_MIN / 2.0
    if context:
        final = f""",
        cls AS (
          SELECT *, CASE WHEN n_chars = 0 THEN 'empty'
                         WHEN label = 'content' THEN 'good'
                         WHEN label = 'high_link_density' THEN 'bad'
                         WHEN label = 'short' THEN 'maybe'
                         WHEN sd < {half} THEN 'bad'
                         ELSE 'maybe' END AS cl
          FROM lab
        ),
        scn AS (
          SELECT *,
            last_value(CASE WHEN cl IN ('good', 'bad') THEN cl END IGNORE NULLS)
              OVER (PARTITION BY doc_id ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevd,
            first_value(CASE WHEN cl IN ('good', 'bad') THEN cl END IGNORE NULLS)
              OVER (PARTITION BY doc_id ORDER BY ord
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nextd
          FROM cls
        ),
        fin AS (
          SELECT *, cl = 'good'
                    OR (cl = 'maybe' AND coalesce(prevd = 'good', FALSE)
                                     AND coalesce(nextd = 'good', FALSE)) AS keepb
          FROM scn
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN keepb THEN txt END,
                                   chr(10) ORDER BY ord), '') AS content,
               count(*) FILTER (WHERE n_chars > 0) AS n_blocks,
               count(*) FILTER (WHERE keepb) AS n_content_blocks
        FROM fin GROUP BY doc_id"""
    else:
        final = """
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN label = 'content' THEN txt END,
                                   chr(10) ORDER BY ord), '') AS content,
               count(*) FILTER (WHERE n_chars > 0) AS n_blocks,
               count(*) FILTER (WHERE label = 'content') AS n_content_blocks
        FROM lab GROUP BY doc_id"""
    return f"""
        WITH docs AS (
          SELECT doc_id, {body} AS html
          FROM documents
        ),
        bl AS (
          SELECT doc_id, i AS ord, bs[i] AS raw
          FROM (SELECT doc_id,
                       string_split_regex(
                         regexp_replace(html, '{DROP_RE}', ' ', 'g'),
                         '{BLOCK_RE}') AS bs
                FROM docs),
               unnest(generate_series(1, len(bs))) AS t(i)
        ),
        feat AS (
          SELECT doc_id, ord, {clean('raw')} AS txt,
                 coalesce(list_sum(list_transform(
                   regexp_extract_all(raw, '{ANCHOR_RE}', 1),
                   x -> length({clean('x')}))), 0) AS link_chars
          FROM bl
        ),
        feat2 AS (
          SELECT doc_id, ord, txt, link_chars, length(txt) AS n_chars,
                 list_filter(string_split(lower(txt), ' '), x -> x != '') AS toks
          FROM feat
        ),
        feat3 AS (
          SELECT doc_id, ord, txt, n_chars,
                 link_chars::DOUBLE / greatest(n_chars, 1)::DOUBLE AS ld,
                 len(list_filter(toks, x -> list_contains([{stops}],
                       regexp_replace(x, '{TOKEN_NORM_RE}', '', 'g'))))::DOUBLE
                   / greatest(len(toks), 1)::DOUBLE AS sd
          FROM feat2
        ),
        lab AS (
          SELECT doc_id, ord, txt, n_chars, sd,
                 CASE
                   WHEN ld > {LINK_DENSITY_MAX} THEN 'high_link_density'
                   WHEN n_chars < {MIN_CHARS} THEN 'short'
                   WHEN sd < {STOPWORD_MIN} THEN 'low_stopword'
                   ELSE 'content'
                 END AS label
          FROM feat3
        ){final}
    """



def _structured_md_oracle_sql() -> str:
    """DuckDB replay of ``q_structured_md``: the skeleton concat, the
    marker rewrite of every block tag (``BLOCK_TAG_CAPTURE_RE`` →
    \\x01<slash><name>\\x02), the split on the start marker, the
    per-piece tag extraction, the SAME metric chain as the
    main_content oracle over the header-stripped body, the
    heading-link-density vs tier-1-content keep rules, and the
    '#'/'- ' prefix rendering. All pattern literals imported from
    pipeline/extraction.py."""
    from hgraphstorage_spark.pipeline.extraction import (
        ANCHOR_RE,
        BLOCK_TAG_CAPTURE_RE,
        DROP_RE,
        ENTITIES,
        LINK_DENSITY_MAX,
        MIN_CHARS,
        STOPWORD_MIN,
        TAG_RE,
        TOKEN_NORM_RE,
        WS_RE,
        _PIECE_HDR_RE,
    )

    def clean(expr: str) -> str:
        s = f"regexp_replace({expr}, '{TAG_RE}', ' ', 'g')"
        for k, v in ENTITIES:
            s = f"replace({s}, '{k}', '{v.replace(chr(39), chr(39) * 2)}')"
        return f"trim(regexp_replace({s}, '{WS_RE}', ' ', 'g'))"

    stops = ", ".join(f"'{s}'" for s in _MC_STOPS)
    pre = _SB_PRE.replace("'", "''")
    post = _SB_POST.replace("'", "''")
    heads = ", ".join(f"'h{i}'" for i in range(1, 7))
    prefix = (
        "CASE tag WHEN 'h1' THEN '# ' WHEN 'h2' THEN '## ' WHEN 'h3' THEN '### '"
        " WHEN 'h4' THEN '#### ' WHEN 'h5' THEN '##### ' WHEN 'h6' THEN '###### '"
        " WHEN 'li' THEN '- ' ELSE '' END"
    )
    return f"""
        WITH docs AS (
          SELECT doc_id, '{pre}' || coalesce(text, '') || '{post}' AS html
          FROM documents
        ),
        mk AS (
          SELECT doc_id, regexp_replace(
                   regexp_replace(
                     regexp_replace(html, '{DROP_RE}', ' ', 'g'),
                     '[\x01\x02]', ' ', 'g'),
                   '{BLOCK_TAG_CAPTURE_RE}', '\x01\\1\\2\x02', 'g') AS marked
          FROM docs
        ),
        bl AS (
          SELECT doc_id, i AS ord, ps[i] AS raw
          FROM (SELECT doc_id, string_split(marked, chr(1)) AS ps FROM mk),
               unnest(generate_series(1, len(ps))) AS t(i)
        ),
        hdr AS (
          SELECT doc_id, ord,
                 CASE WHEN regexp_extract(raw, '{_PIECE_HDR_RE}', 1) = ''
                       AND regexp_extract(raw, '{_PIECE_HDR_RE}', 2) != ''
                      THEN lower(regexp_extract(raw, '{_PIECE_HDR_RE}', 2)) END AS tag,
                 regexp_replace(raw, '{_PIECE_HDR_RE}', '') AS body
          FROM bl
        ),
        feat AS (
          SELECT doc_id, ord, tag, {clean('body')} AS txt,
                 coalesce(list_sum(list_transform(
                   regexp_extract_all(body, '{ANCHOR_RE}', 1),
                   x -> length({clean('x')}))), 0) AS link_chars
          FROM hdr
        ),
        feat2 AS (
          SELECT doc_id, ord, tag, txt, link_chars, length(txt) AS n_chars,
                 list_filter(string_split(lower(txt), ' '), x -> x != '') AS toks
          FROM feat
        ),
        feat3 AS (
          SELECT doc_id, ord, tag, txt, n_chars,
                 link_chars::DOUBLE / greatest(n_chars, 1)::DOUBLE AS ld,
                 len(list_filter(toks, x -> list_contains([{stops}],
                       regexp_replace(x, '{TOKEN_NORM_RE}', '', 'g'))))::DOUBLE
                   / greatest(len(toks), 1)::DOUBLE AS sd
          FROM feat2
        ),
        lab AS (
          SELECT doc_id, ord, tag, txt, n_chars,
                 (n_chars > 0) AND
                 (CASE WHEN tag IN ({heads}) THEN ld <= {LINK_DENSITY_MAX}
                       ELSE CASE
                              WHEN ld > {LINK_DENSITY_MAX} THEN FALSE
                              WHEN n_chars < {MIN_CHARS} THEN FALSE
                              WHEN sd < {STOPWORD_MIN} THEN FALSE
                              ELSE TRUE
                            END END) AS keepb
          FROM feat3
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN keepb THEN {prefix} || txt END,
                                   chr(10) ORDER BY ord), '') AS content_md,
               count(*) FILTER (WHERE n_chars > 0)::BIGINT AS n_blocks,
               count(*) FILTER (WHERE keepb)::BIGINT AS n_kept_blocks,
               count(*) FILTER (WHERE keepb AND tag IN ({heads}))::BIGINT
                 AS n_headings
        FROM lab GROUP BY doc_id
    """


def _hyperball_oracle_sql(rounds: int = 3, p: int = 4) -> str:
    """DuckDB replay of ``q_hyperball``: md5 node hash → bucket/rho
    registers (the hll_sketch arithmetic at p), ``rounds`` unrolled
    neighbor-max merges over the location-subgraph edges, then per
    round the per-node canonical bucket-order IEEE estimator fold
    (identical to the hll_distinct oracle's) summed as exact
    DECIMALs."""
    return _hyperball_nf_cte_sql(rounds, p, _hyperball_open_parts(rounds, p))


def _hyperball_open_parts(rounds: int, p: int) -> list:
    """The opening CTE chain shared by the hyperball-family oracles:
    location subgraph → md5 register init (g0) → ``rounds`` unrolled
    neighbor-max merges (g1..gN)."""
    m = 1 << p
    w1 = 60 - p + 1
    parts = [f"""
        WITH {_LOC_GRAPH_SQL},
        hh AS (SELECT id, ('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT AS h
               FROM nodes),
        g0 AS (
          SELECT id, bucket, max(rho) AS reg FROM (
            SELECT id, h % {m} AS bucket,
                   CASE WHEN h // {m} = 0 THEN {w1}
                        ELSE {w1} - length(bin(h // {m})) END AS rho
            FROM hh) GROUP BY 1, 2
        )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
        g{t} AS (
          SELECT id, bucket, max(reg) AS reg FROM (
            SELECT * FROM g{t - 1}
            UNION ALL
            SELECT e.src AS id, g.bucket, g.reg
            FROM edges e JOIN g{t - 1} g ON g.id = e.dst
          ) GROUP BY 1, 2
        )""")
    return parts


def _hyperball_nf_cte_sql(rounds: int, p: int, parts: list, tail: str | None = None) -> str:
    """Shared tail-builder for the hyperball-family oracles: appends the
    per-round estimator CTEs (s{t}/e{t}/n{t}) to an already-started CTE
    chain and closes with either the round-per-row union (default —
    ``q_hyperball``'s oracle) or a caller-supplied ``tail`` reading the
    n{t} CTEs (``q_effective_diameter``'s fold)."""
    m = 1 << p
    tails = []
    for t in range(0, rounds + 1):
        parts.append(f""",
        s{t} AS (
          SELECT id, count(*) AS n_nonzero,
                 list_reduce(list_prepend((0.0)::DOUBLE,
                              list(pow((2.0)::DOUBLE, -reg) ORDER BY bucket)),
                             (acc, x) -> acc + x) AS s_nonzero
          FROM g{t} GROUP BY 1
        ),
        e{t} AS (
          SELECT id, ({m} - n_nonzero)::BIGINT AS n_zero,
                 ({m} - n_nonzero)::DOUBLE + s_nonzero AS big_s
          FROM s{t}
        ),
        n{t} AS (
          SELECT {t} AS round,
                 sum(round(CASE WHEN raw <= (2.5)::DOUBLE * ({m}.0)::DOUBLE
                                     AND n_zero > 0
                                THEN ({m}.0)::DOUBLE
                                     * ln(({m}.0)::DOUBLE / n_zero::DOUBLE)
                                ELSE raw END, 4)::DECIMAL(18,4))::DECIMAL(28,4)
                   AS nf
          FROM (SELECT id, n_zero,
                       (0.7213)::DOUBLE
                       / ((1.0)::DOUBLE + (1.079)::DOUBLE / ({m}.0)::DOUBLE)
                       * ({m}.0)::DOUBLE * ({m}.0)::DOUBLE / big_s AS raw
                FROM e{t})
        )""")
        tails.append(f"SELECT round, nf::VARCHAR AS nf_est FROM n{t}")
    if tail is not None:
        return "".join(parts) + " " + tail
    return "".join(parts) + " " + " UNION ALL ".join(tails)


# One home for the readability replay (sentence terminators, ASCII
# letter-run words, vowel-group syllables with the silent-'e' rule, both
# score formulas as identical double arithmetic): sql["readability"] uses
# it standalone; the r10 datasheet embeds it as a subquery for the
# per-source mean FK grade.
_READABILITY_ORACLE_SQL = r"""
        WITH d2 AS (
          SELECT doc_id, regexp_replace(text, ' a ', '. ', 'g') AS t FROM documents
        ),
        f AS (
          SELECT doc_id,
                 len(list_filter(
                   list_transform(
                     string_split(regexp_replace(trim(t), '([.!?]+)([ \t\n\x0B\f\r]+|$)',
                                                 '\1' || chr(1), 'g'), chr(1)),
                     x -> trim(regexp_replace(x, '[ \t\n\x0B\f\r]+', ' ', 'g'))),
                   x -> regexp_matches(x, '[^.!? \t\n\x0B\f\r]')))::BIGINT AS n_sentences,
                 regexp_extract_all(lower(t), '[a-z]+') AS words
          FROM d2
        ),
        c AS (
          SELECT doc_id, n_sentences,
                 len(words)::BIGINT AS n_words,
                 COALESCE(list_sum(list_transform(words, w ->
                   greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))
                     - CASE WHEN regexp_matches(w, 'e$')
                                 AND NOT regexp_matches(w, 'le$')
                                 AND len(regexp_extract_all(w, '[aeiouy]+')) >= 2
                            THEN 1 ELSE 0 END))), 0)::BIGINT AS n_syllables
          FROM f
        )
        SELECT doc_id, n_sentences, n_words, n_syllables,
               (CASE WHEN n_words > 0 THEN
                 round((206.835)::DOUBLE
                       - (1.015)::DOUBLE * (n_words::DOUBLE / greatest(n_sentences, 1)::DOUBLE)
                       - (84.6)::DOUBLE * (n_syllables::DOUBLE / n_words::DOUBLE), 4)::DECIMAL(18,4)
               END)::VARCHAR AS flesch_reading_ease,
               (CASE WHEN n_words > 0 THEN
                 round((0.39)::DOUBLE * (n_words::DOUBLE / greatest(n_sentences, 1)::DOUBLE)
                       + (11.8)::DOUBLE * (n_syllables::DOUBLE / n_words::DOUBLE)
                       - (15.59)::DOUBLE, 4)::DECIMAL(18,4)
               END)::VARCHAR AS fk_grade
        FROM c
    """


def _effective_diameter_oracle_sql(rounds: int = 3, p: int = 4, q: float = 0.9) -> str:
    """DuckDB replay of ``q_effective_diameter``: the same register
    rounds as :func:`_hyperball_oracle_sql`, then the smallest-t fold —
    self-lag over the rounds+1 NF readings, the q·NF(t_max) threshold
    on DOUBLE casts, and the HyperANF linear interpolation as the
    identical IEEE chain ((t−1) + (q·nf_max − prev) / (cur − prev))."""
    nf_union = " UNION ALL ".join(
        f"SELECT round, nf FROM n{t}" for t in range(0, rounds + 1)
    )
    tail = f"""
        , nfr AS ({nf_union}),
        mx AS (SELECT max(round) AS t_max, max_by(nf, round) AS nf_max FROM nfr),
        lagd AS (
          SELECT a.round, a.nf, b.nf AS prev
          FROM nfr a LEFT JOIN nfr b ON b.round = a.round - 1
        ),
        c AS (
          SELECT l.round, l.nf, l.prev, m.t_max, m.nf_max
          FROM lagd l CROSS JOIN mx m
          WHERE l.nf::DOUBLE >= {q!r}::DOUBLE * m.nf_max::DOUBLE
        ),
        best AS (SELECT * FROM c ORDER BY round LIMIT 1)
        SELECT {q!r}::DOUBLE AS q,
               t_max::INT AS t_max,
               nf_max::VARCHAR AS nf_max,
               round::INT AS effective_diameter,
               CAST(round(CASE WHEN round = 0 THEN (0.0)::DOUBLE
                    ELSE (round - 1)::DOUBLE
                         + ({q!r}::DOUBLE * nf_max::DOUBLE - prev::DOUBLE)
                           / (nf::DOUBLE - prev::DOUBLE) END, 6)
                    AS DECIMAL(18,6))::VARCHAR AS effective_diameter_interp
        FROM best"""
    return _hyperball_nf_cte_sql(
        rounds, p, _hyperball_open_parts(rounds, p), tail=tail
    )


def _hyperball_centrality_oracle_sql(rounds: int = 3, p: int = 8) -> str:
    """DuckDB replay of ``q_hyperball_centrality``: the same register
    rounds as :func:`_hyperball_oracle_sql`, then PER-NODE rounded
    estimates per round and the clamped diff/t chain in fixed round
    order (left-associated double adds — the identical IEEE
    sequence)."""
    m = 1 << p
    w1 = 60 - p + 1
    parts = [f"""
        WITH {_LOC_GRAPH_SQL},
        hh AS (SELECT id, ('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT AS h
               FROM nodes),
        g0 AS (
          SELECT id, bucket, max(rho) AS reg FROM (
            SELECT id, h % {m} AS bucket,
                   CASE WHEN h // {m} = 0 THEN {w1}
                        ELSE {w1} - length(bin(h // {m})) END AS rho
            FROM hh) GROUP BY 1, 2
        )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
        g{t} AS (
          SELECT id, bucket, max(reg) AS reg FROM (
            SELECT * FROM g{t - 1}
            UNION ALL
            SELECT e.src AS id, g.bucket, g.reg
            FROM edges e JOIN g{t - 1} g ON g.id = e.dst
          ) GROUP BY 1, 2
        )""")
    for t in range(0, rounds + 1):
        parts.append(f""",
        b{t} AS (
          SELECT id,
                 round(CASE WHEN raw <= (2.5)::DOUBLE * ({m}.0)::DOUBLE
                                 AND n_zero > 0
                            THEN ({m}.0)::DOUBLE
                                 * ln(({m}.0)::DOUBLE / n_zero::DOUBLE)
                            ELSE raw END, 4)::DECIMAL(18,4) AS b
          FROM (
            SELECT id, ({m} - n_nonzero)::BIGINT AS n_zero,
                   (0.7213)::DOUBLE
                   / ((1.0)::DOUBLE + (1.079)::DOUBLE / ({m}.0)::DOUBLE)
                   * ({m}.0)::DOUBLE * ({m}.0)::DOUBLE
                   / (({m} - n_nonzero)::DOUBLE + s_nonzero) AS raw
            FROM (
              SELECT id, count(*) AS n_nonzero,
                     list_reduce(list_prepend((0.0)::DOUBLE,
                                  list(pow((2.0)::DOUBLE, -reg) ORDER BY bucket)),
                                 (acc, x) -> acc + x) AS s_nonzero
              FROM g{t} GROUP BY 1))
        )""")
    chain = " + ".join(
        f"greatest((0.0)::DOUBLE, b{t}.b::DOUBLE - b{t - 1}.b::DOUBLE) / ({t}.0)::DOUBLE"
        for t in range(1, rounds + 1)
    )
    joins = " ".join(f"JOIN b{t} ON b0.id = b{t}.id" for t in range(1, rounds + 1))
    return "".join(parts) + f"""
        SELECT b0.id, round({chain}, 4)::DECIMAL(18,4)::VARCHAR AS harmonic_est
        FROM b0 {joins}
    """


def _crawl_frontier_oracle_sql(agent: str = "trainbot") -> str:
    """DuckDB replay of ``q_crawl_frontier``: link rows from the
    extract_links generator arithmetic, the inlink count agg, the
    SHARED robots rules chain (:func:`_robots_pat_ctes`), the
    longest-match verdict keyed by URL, the hand-derived crawl-delay
    rows (the robots_extras oracle's values), the r8 sitemap-freshness
    fold (lastmod/changefreq → recrawl_due at as_of 2024-03-01, the
    same clamp and interval table as warc.crawl_frontier), and the
    identical allowed-first masked per-host rank."""
    _due = (
        "coalesce(least(10.0, greatest(0.0, "
        "date_diff('day', try_cast(regexp_extract(s.lastmod, "
        r"'^(\d{4}-\d{2}-\d{2})', 1) AS DATE), DATE '2024-03-01')::DOUBLE "
        "/ (CASE WHEN lower(s.changefreq) IN ('always', 'hourly') THEN 1.0/24 "
        "WHEN lower(s.changefreq) = 'daily' THEN 1.0 "
        "WHEN lower(s.changefreq) = 'weekly' THEN 7.0 "
        "WHEN lower(s.changefreq) = 'monthly' THEN 30.0 "
        "WHEN lower(s.changefreq) = 'yearly' THEN 365.0 END))), 0.0)"
    )
    return rf"""
        WITH d AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
        {_RAW_SYNTH_URL_SQL},
        lk AS (
          SELECT ru.url AS src,
                 'https://site' || ((d.k + 1) % 7) || '.com/p' || (d.k + 1) AS link_url
          FROM d JOIN ru USING (doc_id)
          UNION ALL
          SELECT ru.url,
                 (CASE WHEN d.doc_id % 3 = 1 THEN 'http' ELSE 'https' END) || '://'
                 || (CASE WHEN d.doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                 || 'site' || (d.k % 7) || '.com/r/' || (d.doc_id % 10)
          FROM d JOIN ru USING (doc_id)
        ),
        agg AS (
          SELECT link_url AS url, count(*)::BIGINT AS n_inlinks,
                 count(DISTINCT src)::BIGINT AS n_sources
          FROM lk GROUP BY 1
        ),
        {_robots_pat_ctes(agent)},
        up AS (
          SELECT url,
                 lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://(?:[wW][wW][wW]\.)?([^/?#]+)', 1)) AS host,
                 CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)', 1) = ''
                      THEN '/' ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)', 1) END AS path
          FROM agg
        ),
        rk AS (
          SELECT url, directive, path_rule,
                 row_number() OVER (
                   PARTITION BY url
                   ORDER BY length(path_rule) DESC,
                            CASE WHEN directive = 'allow' THEN 1 ELSE 0 END DESC,
                            path_rule DESC) AS rn
          FROM up JOIN pat ON up.host = pat.domain
          WHERE up.path LIKE pat.pattern ESCAPE '\'
        ),
        gate AS (
          SELECT up.url, up.host, up.path,
                 coalesce(r.directive = 'allow', TRUE) AS allowed
          FROM up LEFT JOIN (SELECT * FROM rk WHERE rn = 1) r USING (url)
        ),
        dl(host, crawl_delay) AS (VALUES
          ('site0.com', 2.0::DOUBLE), ('site1.com', NULL::DOUBLE),
          ('site2.com', NULL::DOUBLE), ('site4.com', 1.5::DOUBLE),
          ('site5.com', NULL::DOUBLE), ('site6.com', NULL::DOUBLE)
        ),
        smk AS (SELECT DISTINCT doc_id // 2 AS k FROM documents),
        sme AS (
          SELECT 'https://site' || ((k + 1) % 7) || '.com/p' || (k + 1) AS url,
                 ('0.' || (k % 10))::DECIMAL(3,1) AS priority,
                 '2024-01-' || lpad(((k * 7) % 28 + 1)::VARCHAR, 2, '0') AS lastmod,
                 CASE WHEN k % 5 = 0 THEN 'hourly' WHEN k % 5 = 1 THEN 'daily'
                      WHEN k % 5 = 2 THEN 'weekly' WHEN k % 5 = 3 THEN 'never'
                      ELSE 'monthly' END AS changefreq
          FROM smk
        ),
        s AS (
          SELECT url, max(priority) AS sitemap_priority,
                 max(lastmod) AS lastmod, min(changefreq) AS changefreq
          FROM sme GROUP BY url
        ),
        j AS (
          SELECT g.url, g.host, g.path, a.n_inlinks, a.n_sources,
                 s.sitemap_priority::VARCHAR AS sitemap_priority,
                 dl.crawl_delay, {_due} AS recrawl_due,
                 g.allowed,
                 a.n_sources::DOUBLE
                 + 2.0 * coalesce(s.sitemap_priority::DOUBLE, 0.0)
                 + 0.5 * {_due} AS score
          FROM gate g JOIN agg a USING (url)
          LEFT JOIN dl ON g.host = dl.host
          LEFT JOIN s ON g.url = s.url
        )
        SELECT url, host, path, n_inlinks, n_sources, sitemap_priority,
               crawl_delay, recrawl_due, allowed, score,
               CASE WHEN allowed THEN (row_number() OVER (
                 PARTITION BY host
                 ORDER BY allowed DESC, score DESC, url ASC))::INT END AS host_rank
        FROM j
    """


def _stream_embed_sig_oracle_sql(dims: int = 64, bits: int = 16) -> str:
    """DuckDB replay of `stream_embed_dedup(plane_mode="md5")`'s
    deterministic projection: the DISTINCT quantized-fixed-point
    hyperplane signature set over all vectors (seed 0 — the same
    `md5_plane_int` literals the Spark plan embeds). The stream keeps
    exactly one survivor per signature inside the watermark, so
    survivors' recomputed signatures == this distinct set."""
    from hgraphstorage_spark.pipeline.similarity import PLANE_SCALE, md5_plane_int

    bit_cases = " + ".join(
        "CASE WHEN list_dot_product(qv, ["
        + ", ".join(str(md5_plane_int(p, d)) for d in range(dims))
        + f"]::DOUBLE[]) > 0 THEN {1 << p} ELSE 0 END"
        for p in range(bits)
    )
    return f"""
        WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT list_transform(v, x -> floor(x * {PLANE_SCALE})::DOUBLE) AS qv FROM e)
        SELECT DISTINCT ({bit_cases})::BIGINT AS sig FROM q"""


def _embed_lsh_oracle_sql(
    threshold: float = 0.35, dims: int = 64, bits: int = 5, tables: int = 8
) -> str:
    """DuckDB replay of `embedding_near_dup_lsh(plane_mode="md5")`. The
    plane literals are emitted by the SAME `md5_plane_int` helper the
    Spark operator embeds in its plan (the hash_split no-drift pattern);
    the fixed-point bucket dot products are integer-exact (< 2^53) in any
    engine's arithmetic, so bucketing replays bit-for-bit."""
    from hgraphstorage_spark.pipeline.similarity import PLANE_SCALE, md5_plane_int

    table_selects = []
    for t in range(tables):
        bit_cases = " + ".join(
            "CASE WHEN list_dot_product(qv, ["
            + ", ".join(str(md5_plane_int(t * 1000 + p, d)) for d in range(dims))
            + f"]::DOUBLE[]) > 0 THEN {1 << p} ELSE 0 END"
            for p in range(bits)
        )
        table_selects.append(
            f"SELECT vec_id, {t} AS table_id, ({bit_cases})::BIGINT AS bucket FROM q"
        )
    bk = "\nUNION ALL\n".join(table_selects)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (
          SELECT vec_id, v,
                 list_transform(v, x -> floor(x * {PLANE_SCALE})::DOUBLE) AS qv
          FROM e
        ),
        bk AS ({bk}),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bk a JOIN bk b
            ON a.table_id = b.table_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        ),
        s AS (
          SELECT vec_a, vec_b,
                 CAST(round(list_dot_product(ea.v, eb.v)
                      / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)
                   AS DECIMAL(18,6)) AS score
          FROM cand JOIN e ea ON cand.vec_a = ea.vec_id JOIN e eb ON cand.vec_b = eb.vec_id
        )
        SELECT vec_a, vec_b, score::VARCHAR AS score FROM s WHERE score >= {threshold}
    """


def _exact_substring_oracle_sql(n: int = 8) -> str:
    """DuckDB replay of ``exact_substring_dedup(hash_mode="md5")``: same
    tokenization, same md5_long gram hash, duplicated-hash set by
    HAVING count >= 2, covered length via the gaps-and-islands running
    max (relational rendering of the Spark-side interval-union fold),
    kept text as the NOT EXISTS anti-join of token positions against
    duplicated spans."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
                             t -> length(t) > 0) AS tk
          FROM documents
        ), sized AS (SELECT doc_id, tk, len(tk) AS nt FROM toks),
        grams AS (
          SELECT doc_id, i::INT AS pos,
                 ('0x' || substr(md5(array_to_string(tk[i : i+{n}-1], ' ')), 1, 15))::BIGINT AS h
          FROM sized, UNNEST(range(1, nt - {n} + 2)) AS t(i)
        ), dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
        starts AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
        spans AS (
          SELECT doc_id, pos AS s, pos + {n} - 1 AS e,
                 max(pos + {n} - 1) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
          FROM starts
        ), cov AS (
          SELECT doc_id, sum(greatest(0, e - greatest(coalesce(pe, 0), s - 1))) AS dup_tokens
          FROM spans GROUP BY doc_id
        ), tokens AS (
          SELECT doc_id, i::INT AS i, tk[i] AS tok
          FROM sized, UNNEST(range(1, nt + 1)) AS t(i)
        ), kept AS (
          SELECT t.doc_id, t.i, t.tok FROM tokens t
          WHERE NOT EXISTS (SELECT 1 FROM starts s
                            WHERE s.doc_id = t.doc_id AND s.pos BETWEEN t.i - {n} + 1 AND t.i)
        )
        SELECT d.doc_id, d.nt::BIGINT AS n_tokens,
               coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
               coalesce(k.kept_text, '') AS kept_text
        FROM sized d LEFT JOIN cov c USING (doc_id)
        LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS kept_text
                   FROM kept GROUP BY doc_id) k USING (doc_id)
    """


def _simhash_oracle_sql(n: int = 4) -> str:
    """DuckDB replay of `simhash(hash_mode="md5")`: identical shingle CTEs
    to the minhash oracle (same md5_long family), then per-bit majority —
    bit i set iff strictly more than half the shingle hashes carry it.
    Disjoint bit values sum to the same word Spark assembles by OR."""
    wh_idx = ", ".join(f"whs[i+{j}]" for j in range(n))
    return rf"""
        WITH wds AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        wh AS (SELECT doc_id, list_transform(words, w -> md5(w)) AS whs FROM wds),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(whs) - {n - 1}, 1)),
            i -> ('0x' || substr(md5(concat_ws(':', {wh_idx})), 1, 15))::BIGINT
          )) AS shs FROM wh
        ),
        bits AS (
          SELECT doc_id, i,
                 CASE WHEN 2 * len(list_filter(shs, h -> (h >> i) & 1 = 1)) > len(shs)
                      THEN (1::BIGINT << i) ELSE 0::BIGINT END AS bit
          FROM sh, unnest(generate_series(0, 63)) t(i)
        )
        SELECT doc_id, sum(bit)::BIGINT AS simhash FROM bits GROUP BY doc_id
    """


def _similarity_lsh_oracle_sql(query_id: int = 0, k: int = 10, bits: int = 4, dims: int = 64) -> str:
    """DuckDB replay of `lsh_bucket_topk(plane_mode="md5")`: the plane
    literals come from the SAME `md5_plane_int` helper the Spark plan
    embeds (hash_split no-drift pattern); fixed-point bucket dot products
    are integer-exact, and the cosine re-score matches the
    similarity_topk oracle's ascending-dim double arithmetic."""
    from hgraphstorage_spark.pipeline.similarity import PLANE_SCALE, md5_plane_int

    bit_cases = " + ".join(
        "CASE WHEN list_dot_product(qv, ["
        + ", ".join(str(md5_plane_int(p, d)) for d in range(dims))
        + f"]::DOUBLE[]) > 0 THEN {1 << p} ELSE 0 END"
        for p in range(bits)
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id, v,
                     list_transform(v, x -> floor(x * {PLANE_SCALE})::DOUBLE) AS qv
              FROM e),
        bk AS (SELECT vec_id, ({bit_cases})::BIGINT AS bucket FROM q),
        qb AS (SELECT bucket AS qbucket FROM bk WHERE vec_id = {query_id}),
        qq AS (SELECT v AS query_v FROM e WHERE vec_id = {query_id})
        SELECT vec_id, score::VARCHAR AS score, bucket FROM (
          SELECT e.vec_id,
                 CAST(round(list_dot_product(e.v, query_v)
                      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(query_v, query_v))), 6)
                   AS DECIMAL(18,6)) AS score,
                 bk.bucket
          FROM bk JOIN e ON bk.vec_id = e.vec_id, qb, qq
          WHERE bk.bucket = qb.qbucket AND e.vec_id <> {query_id}
          ORDER BY score DESC, e.vec_id LIMIT {k})
    """


def _random_walks_oracle_sql(steps: int) -> str:
    """Unrolled-SQL oracle for deterministic random walks: per step, the
    min-(md5, dst) successor via row_number. Tie-break parity: Spark's
    ``min(struct(md5, dst))`` == ``ORDER BY md5, dst`` rn=1."""
    ctes = [
        """e AS (
          SELECT (3000000000000 + c_custkey)::BIGINT AS src, (2000000000000 + c_nationkey)::BIGINT AS dst FROM customer
          UNION ALL SELECT (4000000000000 + s_suppkey)::BIGINT, (2000000000000 + s_nationkey)::BIGINT FROM supplier
          UNION ALL SELECT (2000000000000 + n_nationkey)::BIGINT, (1000000000000 + n_regionkey)::BIGINT FROM nation
          UNION ALL SELECT (3000000000000 + o_custkey)::BIGINT, (6000000000000 + o_orderkey)::BIGINT FROM orders
          UNION ALL SELECT (6000000000000 + l_orderkey)::BIGINT, (5000000000000 + l_partkey)::BIGINT FROM lineitem
          UNION ALL SELECT (5000000000000 + l_partkey)::BIGINT, (4000000000000 + l_suppkey)::BIGINT FROM lineitem
        )""",
        """s0 AS (
          SELECT (3000000000000 + c_custkey)::BIGINT AS walk_id,
                 (3000000000000 + c_custkey)::BIGINT AS node
          FROM customer WHERE c_custkey % 50 = 0
        )""",
    ]
    for r in range(1, steps + 1):
        p = r - 1
        ctes.append(
            f"""s{r} AS (
              SELECT walk_id, dst AS node FROM (
                SELECT s{p}.walk_id, e.dst,
                       row_number() OVER (
                         PARTITION BY s{p}.walk_id
                         ORDER BY md5(s{p}.walk_id::VARCHAR || ':walk:{r}:' || e.dst::VARCHAR), e.dst
                       ) AS rn
                FROM s{p} JOIN e ON e.src = s{p}.node
              ) WHERE rn = 1
            )"""
        )
    finals = ["SELECT walk_id, 0::INT AS step, node FROM s0"] + [
        f"SELECT walk_id, {r}::INT AS step, node FROM s{r}" for r in range(1, steps + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


def _lpa_oracle_sql(rounds: int) -> str:
    """Unrolled-SQL oracle for deterministic synchronous LPA over the
    location subgraph (same technique as the kmeans/k-core oracles): one
    votes/winner/state CTE triple per round. Tie-break parity: Spark's
    ``max_by(community, struct(n, -community))`` == ``row_number() OVER
    (ORDER BY n DESC, community)`` = 1."""
    ctes = [
        """e AS (
          SELECT (3000000000000 + c_custkey)::BIGINT AS src, (2000000000000 + c_nationkey)::BIGINT AS dst FROM customer
          UNION ALL
          SELECT (4000000000000 + s_suppkey)::BIGINT, (2000000000000 + s_nationkey)::BIGINT FROM supplier
          UNION ALL
          SELECT (2000000000000 + n_nationkey)::BIGINT, (1000000000000 + n_regionkey)::BIGINT FROM nation
        )""",
        "und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e)",
        """l0 AS (
          SELECT id, id AS community FROM (
            SELECT (1000000000000 + r_regionkey)::BIGINT AS id FROM region
            UNION ALL SELECT (2000000000000 + n_nationkey)::BIGINT FROM nation
            UNION ALL SELECT (3000000000000 + c_custkey)::BIGINT FROM customer
            UNION ALL SELECT (4000000000000 + s_suppkey)::BIGINT FROM supplier
          )
        )""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""v{r} AS (
              SELECT u.a AS id, l.community, count(*) AS n
              FROM und u JOIN l{p} l ON u.b = l.id GROUP BY 1, 2
            )"""
        )
        ctes.append(
            f"""w{r} AS (
              SELECT id, community FROM (
                SELECT id, community,
                       row_number() OVER (PARTITION BY id ORDER BY n DESC, community) AS rn
                FROM v{r}) WHERE rn = 1
            )"""
        )
        ctes.append(
            f"""l{r} AS (
              SELECT l{p}.id, COALESCE(w{r}.community, l{p}.community) AS community
              FROM l{p} LEFT JOIN w{r} USING (id)
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT community, count(*)::BIGINT AS n_nodes FROM l{rounds} GROUP BY community"
    )


def _modularity_oracle_sql(rounds: int) -> str:
    """Newman Q over the LPA(rounds) communities: reuse the LPA CTE chain
    (via the e/und/l{r} names inside `_lpa_oracle_sql`'s text), then the
    closed-form with 12-decimal per-community terms summed as exact
    DECIMAL — identical IEEE inner ops to analytics.modularity."""
    lpa = _lpa_oracle_sql(rounds)
    ctes = lpa[len("WITH ") : lpa.rindex("\nSELECT")]
    return (
        "WITH "
        + ctes
        + f""",
        m AS (SELECT count(*)::BIGINT AS m FROM e),
        lc AS (
          SELECT ca.community, count(*)::BIGINT AS l
          FROM e JOIN l{rounds} ca ON e.src = ca.id
                 JOIN l{rounds} cb ON e.dst = cb.id
          WHERE ca.community = cb.community GROUP BY ca.community
        ),
        deg AS (SELECT a AS id, count(*)::BIGINT AS d FROM und GROUP BY a),
        dc AS (
          SELECT l{rounds}.community, sum(coalesce(deg.d, 0))::BIGINT AS dsum
          FROM l{rounds} LEFT JOIN deg ON l{rounds}.id = deg.id
          GROUP BY l{rounds}.community
        ),
        terms AS (
          SELECT CAST(round(
                   coalesce(lc.l, 0)::DOUBLE / m.m::DOUBLE
                 - (dc.dsum::DOUBLE / (2.0 * m.m::DOUBLE))
                 * (dc.dsum::DOUBLE / (2.0 * m.m::DOUBLE)), 12)
                 AS DECIMAL(28,12)) AS t
          FROM dc LEFT JOIN lc USING (community), m
        )
        SELECT count(*)::BIGINT AS n_communities,
               CAST(round(sum(t), 6) AS DECIMAL(18,6))::VARCHAR AS modularity
        FROM terms"""
    )


def oracle_sql() -> dict[str, str]:
    sql = _oracle_sql_base()
    # alternative implementations of the same semantics share the primary
    # implementation's oracle
    sql["connected_components_alt"] = sql["connected_components"]
    sql["pagerank"] = _pagerank_oracle_sql(3)
    sql["hits"] = _hits_oracle_sql(3)
    sql["personalized_pagerank"] = _ppr_oracle_sql(3, NODE["Customer"] + 1)
    sql["k_core"] = _k_core_oracle_sql(3, 6)
    sql["k_truss"] = _k_truss_oracle_sql(k=4, rounds=4)
    sql["label_propagation"] = _lpa_oracle_sql(3)
    sql["modularity"] = _modularity_oracle_sql(3)
    # ANN recall pre-flight: per probe query, replay the exact cosine
    # top-k AND the IVF probe top-k (same CTE text as similarity_ivf),
    # then count the intersection
    def _ann_recall_block(qid: int, k: int = 10, nlist: int = 16, nprobe: int = 4) -> str:
        return f"""
        SELECT {qid}::BIGINT AS query_id, {k}::INT AS k, n_hits,
               CAST(round(n_hits::DOUBLE / {k}, 6) AS DECIMAL(18,6))::VARCHAR AS recall
        FROM (
          WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          cents AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {nlist}),
          assigned AS (
            SELECT vec_id, v,
                   (SELECT cid FROM (
                      SELECT cid, list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                      FROM cents ORDER BY cs DESC, cid ASC LIMIT 1) s) AS list_id
            FROM e
          ),
          q AS (SELECT v AS qv FROM e WHERE vec_id = {qid}),
          probe AS (
            SELECT cid AS list_id FROM cents, q
            ORDER BY list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC,
                     cid ASC
            LIMIT {nprobe}
          ),
          exact AS (
            SELECT vec_id FROM (
              SELECT vec_id,
                     CAST(round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
                       AS DECIMAL(18,6)) AS score
              FROM e, q WHERE vec_id <> {qid}
              ORDER BY score DESC, vec_id ASC LIMIT {k})
          ),
          approx AS (
            SELECT vec_id FROM (
              SELECT vec_id,
                     CAST(round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
                       AS DECIMAL(18,6)) AS score
              FROM assigned JOIN probe USING (list_id), q
              WHERE vec_id <> {qid}
              ORDER BY score DESC, vec_id ASC LIMIT {k})
          )
          SELECT count(*)::BIGINT AS n_hits
          FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)
        ) t"""

    sql["ann_recall"] = " UNION ALL ".join(
        _ann_recall_block(qid) for qid in (0, 7, 23, 42)
    )
    # declared-vs-predicted confusion composed from the SAME lang_id text
    sql["lang_confusion"] = (
        f"WITH p AS ({sql['lang_id']}) "
        "SELECT d.lang AS declared, p.lang_guess AS predicted, "
        "count(*)::BIGINT AS n "
        "FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2"
    )
    sql["dedup_clusters"] = _dedup_clusters_oracle_sql(3, max_doc_freq=100)
    sql["dedup_keep_best"] = (
        "WITH "
        + ",\n".join(_dedup_cluster_ctes(3, max_doc_freq=100))
        + """,
        q AS (
          SELECT l3.doc_id, l3.cluster, d.n_chars AS quality
          FROM l3 JOIN documents d ON l3.doc_id = d.doc_id
        ),
        sz AS (SELECT cluster, count(*) AS n FROM q GROUP BY cluster)
        SELECT q.doc_id, q.cluster, q.quality,
               (row_number() OVER (PARTITION BY q.cluster
                                   ORDER BY q.quality DESC NULLS LAST, q.doc_id) = 1) AS keep
        FROM q JOIN sz ON q.cluster = sz.cluster WHERE sz.n > 1"""
    )
    sql["cluster_split"] = _cluster_safe_split_oracle_sql(3, max_doc_freq=100)
    # the PII pattern/gate fragments — shared by the datasheet and
    # pii_scrub oracles below
    from hgraphstorage_spark.pipeline.pii import (
        PII_GATED as _PII_GATED,
        PII_KINDS as _PII_KINDS,
        PII_PATTERNS as _PII,
        PII_PLACEHOLDER_RE as _PII_PH_RE,
        duckdb_gated_clean_sql as _gated_clean,
        duckdb_gated_count_sql as _gated_count,
    )
    _plain = {n: (pat, drepl) for n, pat, _sr, drepl in _PII}
    _gated_names = {n for n, *_ in _PII_GATED}
    # datasheet pii_hits = REDACTION EVENTS: replay the full clean
    # chain (same fragments, incl. the checksum-gate folds, as the
    # pii_scrub oracle) over the injected demo column, then count
    # placeholder tokens — overlapping kinds (E.164 hit by both phone
    # rules) count once (r8 advice fix)
    _ds_clean = "t"
    for _k in _PII_KINDS:
        if _k in _plain:
            _pq = _plain[_k][0].replace("'", "''")
            _ds_clean = f"regexp_replace({_ds_clean}, '{_pq}', '{_plain[_k][1]}', 'g')"
        else:
            _ds_clean = _gated_clean(_k, _ds_clean, "t")
    # shared phrase-gate fragments (ONE home with sql["phrase_filter"]
    # below, so the datasheet's incidence column and the phrase row's
    # replay cannot drift): the %5-cycled demo suffix, the normalization
    # chain, and the IDENTICAL compiled alternation
    from hgraphstorage_spark.pipeline.text import CJK_ISOLATE_RE as _CJK_RE
    from hgraphstorage_spark.pipeline.text import (
        compile_phrase_pattern as _cpp,
    )
    _pf_pat = _cpp(["free money", "禁止词汇"]).replace("'", "''")
    _PF_SUFFIX_SQL = """(CASE WHEN doc_id % 5 = 0 THEN ' free money now'
                               WHEN doc_id % 5 = 1 THEN ' money free now'
                               WHEN doc_id % 5 = 2 THEN ' 禁止词汇'
                               WHEN doc_id % 5 = 3 THEN ' Free-Money!'
                               ELSE '' END)"""

    def _pf_padded_sql(txt: str) -> str:
        return (
            "' ' || replace(trim(regexp_replace("
            f"regexp_replace(lower({txt}), '{_CJK_RE}', ' \\1 ', 'g'), "
            r"'[^\p{L}0-9]+', ' ', 'g')), ' ', '  ') || ' '"
        )

    # datasheet v3 (VERDICT r8 task 6 / r9 task 7): + flagged-phrase
    # incidence (over the same %5-suffix demo column the phrase_filter
    # row certifies — the raw corpus has no blocklisted phrases, and an
    # all-zero column certifies nothing), + mean FK grade (the
    # readability replay embedded per doc; exact DECIMAL(18,4) sums so
    # the mean is order-independent), + structured-extraction coverage
    # (kept blocks / total blocks over the skeleton-wrapped corpus —
    # the structured_md replay embedded)
    sql["datasheet"] = rf"""
        WITH {_QF_CTES},
        pass AS (SELECT doc_id, {_QF_PASSES} AS passes FROM r),
        {_SYNTH_URL_SQL},
        pw AS (SELECT doc_id, text || ({_PII_INJ_SQL}) AS t FROM documents),
        pii AS (SELECT doc_id,
                       len(regexp_extract_all({_ds_clean}, '{_PII_PH_RE}'))::BIGINT
                         AS pii_hits
                FROM pw),
        phw AS (SELECT doc_id, text || {_PF_SUFFIX_SQL} AS t FROM documents),
        ph AS (SELECT doc_id,
                      (len(regexp_extract_all({_pf_padded_sql("t")}, '{_pf_pat}')) > 0)::INT
                        AS phr
               FROM phw),
        rd AS (SELECT doc_id, fk_grade::DECIMAL(18,4) AS fk
               FROM ({_READABILITY_ORACLE_SQL})),
        sm AS (SELECT doc_id, n_blocks, n_kept_blocks
               FROM ({_structured_md_oracle_sql()})),
        p AS (
          SELECT d.source, d.lang, length(d.text) AS chars,
                 CASE WHEN length(trim(d.text)) = 0 THEN 0
                      ELSE array_length(regexp_split_to_array(trim(d.text), '[ \t\n\x0b\f\r]+')) END AS toks,
                 CASE WHEN pass.passes THEN 1 ELSE 0 END AS p,
                 pii.pii_hits, u.url_norm, ph.phr, rd.fk,
                 sm.n_blocks, sm.n_kept_blocks
          FROM documents d
          JOIN pass ON d.doc_id = pass.doc_id
          JOIN pii ON d.doc_id = pii.doc_id
          JOIN u ON d.doc_id = u.doc_id
          JOIN ph ON d.doc_id = ph.doc_id
          LEFT JOIN rd ON d.doc_id = rd.doc_id
          JOIN sm ON d.doc_id = sm.doc_id
        )
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(toks)::BIGINT AS total_tokens,
               sum(chars)::BIGINT AS total_chars,
               CAST(round(avg(p), 6) AS DECIMAL(18,6))::VARCHAR AS quality_pass_rate,
               count(DISTINCT lang)::BIGINT AS n_langs,
               sum(pii_hits)::BIGINT AS pii_hits,
               CAST(round(1 - count(DISTINCT url_norm)::DOUBLE / count(*), 6)
                    AS DECIMAL(18,6))::VARCHAR AS url_dup_rate,
               CAST(round(avg(phr), 6) AS DECIMAL(18,6))::VARCHAR AS phrase_flag_rate,
               CAST(round(sum(fk)::DOUBLE / count(fk), 6)
                    AS DECIMAL(18,6))::VARCHAR AS mean_fk_grade,
               CAST(round(sum(n_kept_blocks)::DOUBLE / sum(n_blocks), 6)
                    AS DECIMAL(18,6))::VARCHAR AS md_keep_rate
        FROM p GROUP BY source
    """
    sql["corpus_report"] = r"""
        WITH p AS (
          SELECT source, length(text) AS chars,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS toks
          FROM documents
        )
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(toks)::BIGINT AS total_tokens,
               sum(chars)::BIGINT AS total_chars,
               CAST(round(avg(toks), 6) AS DECIMAL(18,6))::VARCHAR AS mean_tokens
        FROM p GROUP BY source
    """
    sql["random_walks"] = _random_walks_oracle_sql(3)
    # LSH md5-mode replays — parameters must match the q_ entries
    # prefix filtering is PRUNING only (prefix-filter lemma): the output is
    # identical to the full exact join, so the oracle is ngram_jaccard's
    # string-shingle replay verbatim — any divergence means the prefix cut
    # dropped a true pair (lossless claim falsified)
    sql["jaccard_prefix"] = sql["ngram_jaccard"]
    sql["minhash_lsh_pairs"] = _minhash_lsh_oracle_sql(n=5, k=64, bands=16, threshold=0.6)
    sql["incremental_near_dup"] = _incremental_lsh_oracle_sql(n=5, k=64, bands=16, threshold=0.6)
    sql["fuzzy_decontaminate"] = _fuzzy_decon_oracle_sql(n=5, k=64, bands=16, threshold=0.5)
    sql["robots_filter"] = _robots_oracle_sql(agent="trainbot")
    sql["crawl_frontier"] = _crawl_frontier_oracle_sql(agent="trainbot")
    # the stream == batch certificate: the incrementally-maintained
    # frontier must equal the batch capstone, so it shares its oracle
    sql["stream_crawl_frontier"] = _crawl_frontier_oracle_sql(agent="trainbot")
    # same certificate for the freshness leg (r10): the register-composed
    # frontier must equal the batch capstone with the CLEAN hints — the
    # shared oracle is also the proof that the streamed stale decoys lost
    sql["stream_freshness"] = _crawl_frontier_oracle_sql(agent="trainbot")
    # flagged_filter: cjk-isolate -> tokenize -> edge-strip ->
    # blocklist contains -> ratio -> gate, with the arithmetic
    # suffixes replayed (incl. the unsegmented-CJK character fallback)
    from hgraphstorage_spark.pipeline.extraction import TOKEN_NORM_RE as _TNR
    _ff_ratio = (
        "CAST(round(n_flagged::DOUBLE / greatest(n_tokens, 1), 6) AS DECIMAL(18,6))"
    )
    sql["flagged_filter"] = rf"""
        WITH w AS (
          SELECT doc_id,
                 text || (CASE WHEN doc_id % 4 = 0 THEN ' ends slow.'
                               WHEN doc_id % 4 = 1 THEN ' ends slower now'
                               WHEN doc_id % 4 = 2 THEN ' 禁止词'
                               ELSE '' END) AS t
          FROM documents
        ),
        tk AS (
          SELECT doc_id,
                 list_filter(string_split_regex(
                     regexp_replace(lower(t), '{_CJK_RE}', ' \1 ', 'g'),
                     '[ \t\n\x0b\f\r]+'), x -> x != '') AS toks
          FROM w
        ),
        c AS (
          SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                 len(list_filter(toks, x -> list_contains(['slow', 'spill', '禁'],
                     regexp_replace(x, '{_TNR}', '', 'g'))))::BIGINT AS n_flagged
          FROM tk
        )
        SELECT doc_id, n_tokens, n_flagged,
               {_ff_ratio}::VARCHAR AS flagged_ratio,
               (n_flagged::DOUBLE / greatest(n_tokens, 1)) <= 0.02 AS passes
        FROM c
    """
    # phrase_filter: replay the normalization chain (lower → cjk
    # isolate → non-alnum collapse → trim → boundary doubling → pad)
    # and count with the IDENTICAL compiled alternation — the suffix /
    # padding / pattern fragments are shared with the datasheet's
    # phrase_flag_rate column (defined once above it)
    sql["phrase_filter"] = f"""
        WITH w AS (
          SELECT doc_id, text || {_PF_SUFFIX_SQL} AS t
          FROM documents
        ),
        n AS (
          SELECT doc_id, {_pf_padded_sql("t")} AS padded
          FROM w
        )
        SELECT doc_id,
               len(regexp_extract_all(padded, '{_pf_pat}'))::BIGINT
                 AS n_phrase_hits,
               len(regexp_extract_all(padded, '{_pf_pat}')) <= 0 AS passes
        FROM n
    """
    # frontier_schedule: the full frontier replay wrapped in the same
    # allowed/cap filter + delay arithmetic
    sql["frontier_schedule"] = f"""
        SELECT url, host, host_rank,
               coalesce(crawl_delay, 1.0) * (host_rank - 1)::DOUBLE AS fetch_at_sec
        FROM ({_crawl_frontier_oracle_sql(agent="trainbot")}) fr
        WHERE allowed AND host_rank IS NOT NULL AND host_rank <= 20
    """
    # feed_ingest: independent arithmetic derivation of every field,
    # including the RFC 822 day-month-year -> DATE fold
    _fd_mon = "(['Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec'][mon])"
    _fd_date = (
        "('2024-' || lpad(mon::VARCHAR, 2, '0') || '-' "
        "|| lpad(day::VARCHAR, 2, '0'))::DATE::VARCHAR"
    )
    sql["feed_ingest"] = f"""
        WITH d AS (SELECT doc_id, doc_id % 28 + 1 AS day, doc_id % 12 + 1 AS mon
                   FROM documents)
        SELECT 'site' || (doc_id % 7) || '.com' AS domain, 'rss' AS kind,
               'Story ' || doc_id || ' <raw & more' AS title,
               'https://site' || (doc_id % 7) || '.com/story/' || doc_id AS link,
               'Mon, ' || lpad(day::VARCHAR, 2, '0') || ' ' || {_fd_mon}
                 || ' 2024 10:0' || (doc_id % 10) || ':00 GMT' AS published,
               {_fd_date} AS published_date
        FROM d WHERE doc_id % 3 = 0
        UNION ALL
        SELECT 'site' || (doc_id % 7) || '.com', 'atom',
               'Post ' || doc_id,
               'https://site' || (doc_id % 7) || '.com/post/' || doc_id,
               '2024-' || lpad(mon::VARCHAR, 2, '0') || '-'
                 || lpad(day::VARCHAR, 2, '0') || 'T08:00:00Z',
               {_fd_date}
        FROM d WHERE doc_id % 3 = 1
        UNION ALL
        SELECT 'site' || (doc_id % 7) || '.com', 'rss',
               'Undated ' || doc_id,
               'https://site' || (doc_id % 7) || '.com/u/' || doc_id,
               NULL, NULL
        FROM d WHERE doc_id % 3 = 2
    """
    # http_envelope / revisit_plan: independent arithmetic derivation
    # of every field from _synthetic_http_records' generator rules
    # (shared CTE so the two oracles can't drift from each other)
    _mon_list = "['Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec']"
    _HTTP_ENV_CTE = f"""
        base AS (
          SELECT doc_id,
                 (doc_id % 7 = 3) AS nonhttp,
                 (doc_id % 9 = 4) AS bad_lm,
                 (doc_id % 11 = 5) AS bad_fetch
          FROM documents
        ),
        env AS (
          SELECT doc_id,
            'https://site' || (doc_id % 7) || '.com/page/' || doc_id AS target_uri,
            CASE WHEN bad_fetch THEN 'not-a-date'
                 ELSE '2024-06-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')
                      || 'T00:00:00Z' END AS warc_date,
            CASE WHEN nonhttp THEN NULL
                 WHEN doc_id % 2 = 0 THEN '1.1' ELSE '1.0' END AS http_version,
            (CASE WHEN nonhttp THEN NULL
                  WHEN doc_id % 5 = 0 THEN 301 ELSE 200 END)::INT AS http_status,
            CASE WHEN nonhttp THEN NULL
                 WHEN doc_id % 5 = 0 THEN 'Moved Permanently' ELSE 'OK' END AS http_reason,
            CASE WHEN nonhttp OR doc_id % 2 != 0 THEN NULL
                 WHEN doc_id % 4 = 0 THEN 'W/"v' || doc_id || '"'
                 ELSE '"v' || doc_id || '"' END AS etag,
            CASE WHEN nonhttp OR doc_id % 3 = 1 THEN NULL
                 ELSE 'Tue, '
                   || (CASE WHEN bad_lm THEN '31'
                            ELSE lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') END)
                   || ' '
                   || (CASE WHEN bad_lm THEN 'Feb'
                            ELSE ({_mon_list})[(doc_id % 12 + 1)] END)
                   || ' 2024 10:00:00 GMT' END AS last_modified,
            CASE WHEN nonhttp OR doc_id % 3 = 1 OR bad_lm THEN NULL
                 ELSE ('2024-' || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0') || '-'
                       || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0'))::DATE END
              AS last_modified_date,
            CASE WHEN nonhttp THEN NULL
                 WHEN doc_id % 2 = 0 THEN 'text/html; charset=utf-8'
                 ELSE 'text/plain' END AS http_content_type,
            CASE WHEN nonhttp OR doc_id % 4 != 1 THEN NULL
                 ELSE 'public, s-maxage=99, max-age='
                      || ((doc_id % 10 + 1) * 21600) END AS cache_control,
            (CASE WHEN nonhttp OR doc_id % 4 != 1 THEN NULL
                  ELSE (doc_id % 10 + 1) * 21600 END)::BIGINT AS max_age_sec,
            CASE WHEN nonhttp OR doc_id % 6 != 2 THEN NULL
                 ELSE 'Tue, ' || lpad((doc_id % 27 + 2)::VARCHAR, 2, '0') || ' '
                      || ({_mon_list})[((doc_id + 5) % 12 + 1)]
                      || ' 2024 00:00:00 GMT' END AS expires,
            CASE WHEN nonhttp OR doc_id % 6 != 2 THEN NULL
                 ELSE ('2024-' || lpad(((doc_id + 5) % 12 + 1)::VARCHAR, 2, '0') || '-'
                       || lpad((doc_id % 27 + 2)::VARCHAR, 2, '0'))::DATE END
              AS expires_date,
            CASE WHEN nonhttp OR doc_id % 5 != 0 THEN NULL
                 ELSE 'https://site' || (doc_id % 7) || '.com/new/' || doc_id END
              AS location,
            CASE WHEN bad_fetch THEN NULL
                 ELSE ('2024-06-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0'))::DATE
                 END AS fetch_date
          FROM base
        )"""
    sql["http_envelope"] = f"""
        WITH {_HTTP_ENV_CTE}
        SELECT doc_id, target_uri, warc_date, http_version, http_status,
               http_reason, etag, last_modified,
               last_modified_date::VARCHAR AS last_modified_date,
               http_content_type, cache_control, max_age_sec, expires,
               expires_date::VARCHAR AS expires_date, location
        FROM env
    """
    # ONE home for the revisit-plan oracle tail: the measured row
    # (q_revisit_measured) injects its empirical-interval leg at the TOP
    # of the precedence CASE (it overrides even max-age), everything
    # else identical — so the two oracles cannot drift
    def _revisit_oracle_sql(measured_leg: str = "") -> str:
        return f"""
        WITH {_HTTP_ENV_CTE},
        sched AS (
          SELECT *,
            least(greatest(
              CASE {measured_leg}
                   WHEN max_age_sec IS NOT NULL THEN max_age_sec / 86400.0
                   WHEN expires_date IS NOT NULL AND fetch_date IS NOT NULL
                     THEN datediff('day', fetch_date, expires_date)::DOUBLE
                   WHEN last_modified_date IS NOT NULL
                        AND datediff('day', last_modified_date, DATE '2024-07-15') >= 0
                     THEN 0.1 * datediff('day', last_modified_date, DATE '2024-07-15')
                   ELSE 7.0 END, 0.5), 15.0) AS ival
          FROM env
        )
        SELECT target_uri AS url,
               fetch_date::VARCHAR AS fetch_date,
               http_status,
               CASE WHEN etag IS NOT NULL THEN 'etag'
                    WHEN last_modified IS NOT NULL THEN 'last-modified' END AS validator,
               etag AS if_none_match,
               -- the fetch-date fallback is an IMF-fixdate (r9 VERDICT
               -- fix): DuckDB's strftime %a/%b are fixed English names,
               -- mirroring the Spark side's literal day/month arrays
               coalesce(last_modified,
                        strftime(fetch_date, '%a, %d %b %Y 00:00:00 GMT'))
                 AS if_modified_since,
               CASE WHEN fetch_date IS NULL THEN NULL
                    ELSE CAST(round(ival, 6) AS DECIMAL(18,6))::VARCHAR END
                 AS interval_days,
               CASE WHEN fetch_date IS NULL THEN NULL
                    ELSE (fetch_date + ceil(ival)::INT)::VARCHAR END AS next_fetch_date,
               (CASE WHEN fetch_date IS NULL THEN NULL
                     ELSE DATE '2024-07-15' >= fetch_date + ceil(ival)::INT
                END)::VARCHAR AS revisit_due
        FROM sched
    """

    sql["revisit_plan"] = _revisit_oracle_sql()
    # measured leg: the q_revisit_measured generator gives even doc_ids a
    # 3-capture history; %3==0 histories never change (interval NULL →
    # fall through), %10==4 flaps 6-hourly (0.25 d, floor-clamps), else
    # the empirical interval is the 2·(1+doc_id%9)-day capture gap
    # (16/18 ceiling-clamp) — derived from the generator arithmetic, the
    # same independent-derivation style as the change_rate oracle
    sql["revisit_measured"] = _revisit_oracle_sql(
        """WHEN doc_id % 2 = 0 AND doc_id % 3 <> 0 THEN
                 CASE WHEN doc_id % 10 = 4 THEN (0.25)::DOUBLE
                      ELSE ((doc_id % 9) + 1) * (2.0)::DOUBLE END"""
    )
    # cdx_ingest / cdx_plan: independent arithmetic derivation from
    # _synthetic_cdxj_lines' generator rules. The urlkey is derived in
    # its CANONICAL form (www/port/arg-order/case variants collapse),
    # so the SURT transform is certified without being replayed.
    _CDX_URL_SQL = """
        'https://' || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
          || 'site' || (doc_id % 7) || '.com'
          || (CASE WHEN doc_id % 3 = 0 THEN ':443'
                   WHEN doc_id % 12 = 2 THEN ':8080' ELSE '' END)
          || (CASE WHEN doc_id % 4 = 2 THEN '/P/' ELSE '/p/' END) || doc_id
          || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=' || (doc_id % 5)
                   WHEN doc_id % 5 = 1 THEN '?z=1' ELSE '' END)"""
    sql["cdx_ingest"] = f"""
        SELECT doc_id,
          'com,site' || (doc_id % 7)
            || (CASE WHEN doc_id % 12 = 2 THEN ':8080' ELSE '' END)
            || ')/p/' || doc_id ||
            (CASE WHEN doc_id % 2 = 0 THEN '?a=' || (doc_id % 5) || '&b=2'
                  WHEN doc_id % 5 = 1 THEN '?z=1' ELSE '' END) AS urlkey,
          CASE WHEN doc_id % 13 = 7 THEN '20241399000000'
               ELSE '2024' || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0')
                    || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || '12'
                    || lpad((doc_id % 60)::VARCHAR, 2, '0') || '00' END AS timestamp14,
          CASE WHEN doc_id % 13 = 7 THEN NULL
               ELSE '2024-' || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0') || '-'
                    || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || ' 12:'
                    || lpad((doc_id % 60)::VARCHAR, 2, '0') || ':00' END AS fetch_ts,
          {_CDX_URL_SQL} AS url,
          (CASE WHEN doc_id % 9 = 0 THEN 404 ELSE 200 END)::INT AS status,
          CASE WHEN doc_id % 2 = 0 THEN 'text/html'
               ELSE 'application/json' END AS mime,
          'sha1:' || doc_id AS digest,
          ((doc_id % 50 + 1) * 100)::BIGINT AS "length",
          ((doc_id % 20) * 3000)::BIGINT AS "offset",
          'shard' || (doc_id % 5) || '.warc.gz' AS filename
        FROM documents
        UNION ALL
        -- the external-conformance shard (fixtures/external/
        -- cc_index.cdxj): negative doc_ids by sorted line order;
        -- literals certified against the committed bytes AND an
        -- independent urlkey derivation by
        -- tests/test_external_conformance.py
        SELECT * FROM (VALUES
          (-1::BIGINT, 'com,example)/old', '20240722081500',
           '2024-07-22 08:15:00', 'http://example.com/old', 301::INT,
           'text/html', '3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ',
           541::BIGINT, 31002::BIGINT,
           'crawl-data/CC-MAIN-2024-30/segments/1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00001.warc.gz'),
          (-2::BIGINT, 'com,example)/path?a=1&b=2', '20240722080000',
           '2024-07-22 08:00:00', 'http://www.example.com/path?b=2&a=1',
           200::INT, 'text/html', '5X2YBVRXJXSGVRCURKIQBYAES3MLZVFP',
           2035::BIGINT, 14870::BIGINT,
           'crawl-data/CC-MAIN-2024-30/segments/1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00001.warc.gz'),
          (-3::BIGINT, 'com,example)/path?a=1&b=2', '20240725093011',
           '2024-07-25 09:30:11', 'http://www.example.com/path?b=2&a=1',
           200::INT, 'warc/revisit', '5X2YBVRXJXSGVRCURKIQBYAES3MLZVFP',
           312::BIGINT, 52114::BIGINT,
           'crawl-data/CC-MAIN-2024-30/segments/1720763514450.42/warc/CC-MAIN-20240725093011-20240725123011-00007.warc.gz'),
          (-4::BIGINT, 'com,example:8080)/api', '20240722090210',
           '2024-07-22 09:02:10', 'http://example.com:8080/api',
           404::INT, 'application/json', 'X2NBUQPZ4GF6YOHLJ4MZ26FMJ4KCBRB7',
           388::BIGINT, 60990::BIGINT,
           'crawl-data/CC-MAIN-2024-30/segments/1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00002.warc.gz'),
          (-5::BIGINT, 'org,example)/', '20240722071249',
           '2024-07-22 07:12:49', 'https://example.org/', 200::INT,
           'text/html', 'MUIDVJIXS6XPVHUWNXTIXTH3ABWDL7A3',
           1219::BIGINT, 904::BIGINT,
           'crawl-data/CC-MAIN-2024-30/segments/1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00000.warc.gz')
        ) t(doc_id, urlkey, timestamp14, fetch_ts, url, status, mime,
            digest, "length", "offset", filename)
    """
    # cdx_export: every BYTE of the canonical output line derived from
    # the generator arithmetic — the canonical urlkey (www/port/case/
    # arg-order collapse, :8080 after the reversed labels), the ts14
    # passthrough (impossible month stays verbatim), and to_json's
    # compact field order/quoting with numeric status/length/offset
    sql["cdx_export"] = f"""
        SELECT doc_id,
          'com,site' || (doc_id % 7)
            || (CASE WHEN doc_id % 12 = 2 THEN ':8080' ELSE '' END)
            || ')/p/' || doc_id
            || (CASE WHEN doc_id % 2 = 0 THEN '?a=' || (doc_id % 5) || '&b=2'
                     WHEN doc_id % 5 = 1 THEN '?z=1' ELSE '' END)
          || ' ' ||
          (CASE WHEN doc_id % 13 = 7 THEN '20241399000000'
               ELSE '2024' || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0')
                    || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || '12'
                    || lpad((doc_id % 60)::VARCHAR, 2, '0') || '00' END)
          || ' ' ||
          '{{"url":"' || {_CDX_URL_SQL} || '",'
          || '"status":' || (CASE WHEN doc_id % 9 = 0 THEN 404 ELSE 200 END) || ','
          || '"mime":"' || (CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                                 ELSE 'application/json' END) || '",'
          || '"digest":"sha1:' || doc_id || '",'
          || '"length":' || ((doc_id % 50 + 1) * 100) || ','
          || '"offset":' || ((doc_id % 20) * 3000) || ','
          || '"filename":"shard' || (doc_id % 5) || '.warc.gz"}}'
          AS line
        FROM documents
    """
    sql["cdx_plan"] = """
        WITH c AS (
          SELECT doc_id,
                 'shard' || (doc_id % 5) || '.warc.gz' AS filename,
                 ((doc_id % 20) * 3000)::BIGINT AS off,
                 ((doc_id % 50 + 1) * 100)::BIGINT AS len
          FROM documents WHERE doc_id % 9 != 0
        ),
        -- doc_id breaks (off, len) ties into a TOTAL order: the flag
        -- and the cumulative-sum windows are separate passes here, and
        -- a tie order that differs between passes would split tie
        -- groups across islands (identical rows make the rule itself
        -- tie-insensitive, but the island NUMBERING is not)
        m AS (
          SELECT *, max(off + len) OVER (PARTITION BY filename
                     ORDER BY off, len, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM c
        ),
        isl AS (
          SELECT *, sum(CASE WHEN prev_end IS NULL OR off - prev_end > 2000
                             THEN 1 ELSE 0 END)
                      OVER (PARTITION BY filename ORDER BY off, len, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS island
          FROM m
        )
        SELECT filename,
               min(off)::BIGINT AS range_start,
               max(off + len)::BIGINT AS range_end,
               count(*)::BIGINT AS n_records,
               sum(len)::BIGINT AS record_bytes,
               (max(off + len) - min(off))::BIGINT AS range_bytes
        FROM isl GROUP BY filename, island
    """
    # validator_state / stream_validator: mechanism replay (the
    # max(concat_ws) + split law) over the independently-derived
    # envelope CTE, urls remapped onto the 40 colliding keys; the
    # stream row SHARES the batch oracle — merge idempotence makes
    # stream == batch the certificate itself
    _VAL_KEY_SQL = (
        "concat_ws(chr(1), coalesce(warc_date, ''), coalesce(etag, ''), "
        "coalesce(last_modified, ''), coalesce(http_status::VARCHAR, ''))"
    )
    sql["validator_state"] = f"""
        WITH {_HTTP_ENV_CTE},
        v AS (SELECT 'https://coll.example.com/p/' || (doc_id % 40) AS url,
                     {_VAL_KEY_SQL} AS k
              FROM env),
        m AS (SELECT url, max(k) AS k FROM v GROUP BY url)
        SELECT url,
               nullif(split_part(k, chr(1), 1), '') AS fetch,
               nullif(split_part(k, chr(1), 2), '') AS etag,
               nullif(split_part(k, chr(1), 3), '') AS last_modified,
               nullif(split_part(k, chr(1), 4), '')::INT AS http_status
        FROM m
    """
    sql["stream_validator"] = sql["validator_state"]
    # change_rate: counts/span/ratio arithmetic over the generator
    # rules (ts NULL on %13==7, digest NULL on %11==5, solo keys on
    # %777==5)
    sql["change_rate"] = """
        WITH c AS (
          SELECT doc_id,
            CASE WHEN doc_id % 777 = 5 THEN 'solo' || doc_id
                 WHEN doc_id % 100 = 7 THEN 'nd' || (floor(doc_id / 100)::BIGINT % 2)
                 ELSE 'k' || (doc_id % 40) END AS urlkey,
            CASE WHEN doc_id % 13 = 7 THEN NULL
                 ELSE strptime('2024' || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0')
                      || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || '12'
                      || lpad((doc_id % 60)::VARCHAR, 2, '0') || '00',
                      '%Y%m%d%H%M%S') END AS ts,
            CASE WHEN doc_id % 11 = 5 OR doc_id % 100 = 7 THEN NULL
                 ELSE 'sha1:' || (doc_id % 120) END AS digest
          FROM documents
        ),
        a AS (
          SELECT urlkey, count(*)::BIGINT AS n_captures,
                 count(DISTINCT digest)::BIGINT AS n_versions,
                 min(ts) AS first_ts, max(ts) AS last_ts,
                 (epoch(max(ts)) - epoch(min(ts))) / 86400.0 AS span_days
          FROM c GROUP BY urlkey
        )
        SELECT urlkey, n_captures, n_versions,
               strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
               CASE WHEN n_captures > 1 AND n_versions >= 1 THEN
                 CAST(round((n_versions - 1) / (n_captures - 1.0), 6)
                      AS DECIMAL(18,6))::VARCHAR END AS change_rate,
               CASE WHEN n_versions > 1 AND span_days > 0 THEN
                 CAST(round(span_days / (n_versions - 1), 6)
                      AS DECIMAL(18,6))::VARCHAR END
                 AS est_change_interval_days
        FROM a
    """
    # cdx_roundtrip: expected rows as literals — offsets/lengths are
    # properties of the committed fixture bytes (mtime-0 gzip members),
    # md5s of the HTTP payloads inside; independently derivable by any
    # WARC reader over fixtures/crawl.warc.gz
    sql["cdx_roundtrip"] = """
        SELECT * FROM (VALUES
          -- crawl2.warc.gz records (r10): offsets are within THAT shard
          -- (per-shard member spans), payload md5s of the RAW record
          -- bytes incl. the chunked/gzipped envelope
          ('com,example,fixture)/chunked', 0::BIGINT, 388::BIGINT,
           'http://fixture.example.com/chunked',
           '1f3b14b1e7f5c4dc71a6cf26ef770c82'),
          ('com,example,fixture)/latin1', 388::BIGINT, 243::BIGINT,
           'http://fixture.example.com/latin1',
           '147df41ef3874e79d9c82a388b667ef3'),
          ('com,example,fixture)/page1', 172::BIGINT, 373::BIGINT,
           'http://fixture.example.com/page1',
           '5b31903cbe0048ea12736ce1787a15e5'),
          ('com,example,fixture)/plain.txt', 760::BIGINT, 257::BIGINT,
           'http://fixture.example.com/plain.txt',
           'd9724722b99ca562e8dae5beeb467085'),
          ('com,example,fixture)/raw', 1017::BIGINT, 267::BIGINT,
           'http://fixture.example.com/raw',
           'd323f7ca54213e3d047fc8c3ba41c8fd'),
          ('com,example,fixture)/page1?utm_source=feed', 1284::BIGINT,
           345::BIGINT,
           'https://www.fixture.example.com/page1?utm_source=feed',
           '57b87c9d79a9395cd77bf815f34c757c')
        ) t(urlkey, "offset", "length", target_uri, payload_md5)
    """
    # wet_export: expected rows as literals — extraction output, record
    # ids, and byte counts are properties of the committed fixture bytes.
    # r11: no longer just a promise — tests/test_wet_independent.py
    # RE-DERIVES every row from fixtures/*.warc.gz with a second,
    # stdlib-only toolchain (html.parser event extraction + its own
    # WARC/chunked/gzip/charset decode, mechanism-disjoint from
    # sources/warc.py) and asserts byte-equality with these VALUES
    sql["wet_export"] = """
        SELECT * FROM (VALUES
          -- crawl2.warc.gz records (r10): the chunked+gzipped page and
          -- the latin-1 page — their WET text md5s equal warc_ingest's
          -- (same extraction), byte counts are the UTF-8 re-encoding
          ('http://fixture.example.com/chunked', '<urn:uuid:resp-c1>',
           52::BIGINT, '41d6ba5aa312844785239948660feada'),
          ('http://fixture.example.com/latin1', '<urn:uuid:resp-c2>',
           43::BIGINT, '6cac17838bc27aa8b2eda66484f18e8e'),
          ('http://fixture.example.com/page1', '<urn:uuid:resp-1>',
           207::BIGINT, 'd994dc55ce0215d9282480ef34299962'),
          ('http://fixture.example.com/plain.txt', '<urn:uuid:resp-2>',
           64::BIGINT, 'b4890e05db03778e0ea8220ab901695a'),
          ('http://fixture.example.com/raw', '<urn:uuid:resp-3>',
           109::BIGINT, 'b5eaa504b311f1e33d35a4d14dad019b'),
          ('https://www.fixture.example.com/page1?utm_source=feed',
           '<urn:uuid:resp-4>',
           194::BIGINT, '0c5a0c49e4b9ee368c3b1018c5cf455e')
        ) t(target_uri, refers_to, n_bytes, text_md5)
    """
    # wet_ingest: expected rows as literals — properties of the
    # committed EXTERNAL shard bytes (fixtures/external/, assembled from
    # the published CC WET layout by tools/make_fixture_external.py);
    # tests/test_external_conformance.py independently re-verifies the
    # base32 block digests against the payloads
    sql["wet_ingest"] = """
        SELECT * FROM (VALUES
          (0::BIGINT, 'warcinfo', NULL::VARCHAR, 'application/warc-fields',
           280::BIGINT, 'f82e3f64022f93df58a75a3c227c65c63544f2b7',
           NULL::VARCHAR, NULL::VARCHAR),
          (1::BIGINT, 'conversion', 'https://example.org/', 'text/plain',
           97::BIGINT, '4e0b20885b8e975402b0641a1a285a0b102fe5d2', 'eng',
           'sha1:JYFSBCC3R2LVIAVQMQNBUKC2BMIC7ZOS'),
          (2::BIGINT, 'conversion', 'http://www.example.com/path?b=2&a=1',
           'text/plain', 86::BIGINT,
           '8763fa0ac3af7303cabb55fd29bb539c7661f86f', 'fra',
           'sha1:Q5R7UCWDV5ZQHSV3KX6STO2TTR3GD6DP')
        ) t(rec_idx, warc_type, target_uri, content_type, n_bytes,
            sha1_hex, lang, block_digest)
    """
    sql["robots_extras"] = """
        SELECT * FROM (VALUES
          ('site0.com', 2.0::DOUBLE, 'https://site0.com/sm.xml'),
          ('site1.com', NULL::DOUBLE, 'https://site1.com/a.xml|https://site1.com/b.xml'),
          ('site2.com', NULL::DOUBLE, ''),
          ('site4.com', 1.5::DOUBLE, ''),
          ('site5.com', NULL::DOUBLE, ''),
          ('site6.com', NULL::DOUBLE, ''),
          -- the EXTERNAL conformance robots.txt (fixtures/external/
          -- robots.txt): trainbot's exact group carries the decimal
          -- crawl-DELAY despite BOM/CRLF/case/Host: oddities; the two
          -- document-wide Sitemap lines collect across groups in
          -- source order (literals certified by
          -- tests/test_external_conformance.py)
          ('www.example.org', 4.5::DOUBLE,
           'https://www.example.org/sitemap_index.xml|https://cdn.example.org/sitemap-images.xml')
        ) t(domain, crawl_delay, sitemaps)
    """

    sql["main_content"] = _main_content_oracle_sql()
    sql["main_content_ctx"] = _main_content_oracle_sql(context=True)
    sql["structured_md"] = _structured_md_oracle_sql()
    # sitemap_ingest: independent arithmetic derivation of every
    # frontier row (two per urlset doc, one per index doc)
    sql["sitemap_ingest"] = """
        WITH d AS (SELECT doc_id FROM documents)
        SELECT 'site' || (doc_id % 7) || '.com' AS domain, 'url' AS kind,
               'https://site' || (doc_id % 7) || '.com/a?x=' || doc_id || '&y=2' AS loc,
               '2024-02-0' || (doc_id % 9 + 1) AS lastmod,
               NULL AS changefreq,
               ('0.' || (doc_id % 10))::DECIMAL(3,1)::VARCHAR AS priority
        FROM d WHERE doc_id % 4 != 3
        UNION ALL
        SELECT 'site' || (doc_id % 7) || '.com', 'url',
               'https://site' || (doc_id % 7) || '.com/b' || doc_id || '?q=1&r=2',
               NULL, 'weekly', NULL
        FROM d WHERE doc_id % 4 != 3
        UNION ALL
        SELECT 'site' || (doc_id % 7) || '.com', 'sitemap',
               'https://site' || (doc_id % 7) || '.com/sm' || (doc_id % 5) || '.xml',
               NULL, NULL, NULL
        FROM d WHERE doc_id % 4 = 3
        UNION ALL
        -- the EXTERNAL conformance sitemaps (fixtures/external/):
        -- sitemaps.org-layout index + urlset, literals certified by
        -- tests/test_external_conformance.py
        SELECT * FROM (VALUES
          ('www.example.org', 'sitemap',
           'https://www.example.org/sitemap-posts-2024-07.xml.gz',
           '2024-07-22T18:23:17+00:00', NULL, NULL),
          ('www.example.org', 'sitemap',
           'https://www.example.org/sitemap-pages.xml',
           '2024-07-01', NULL, NULL),
          ('www.example.org', 'url',
           'https://www.example.org/catalog?item=12&desc=vacation_hawaii',
           '2024-05-07T16:20:11+03:00', 'monthly', '0.8'),
          ('www.example.org', 'url',
           'https://www.example.org/', NULL, NULL, '1.0')
        ) x(domain, kind, loc, lastmod, changefreq, priority)
    """

    # pii_scrub: replay every pattern — counts on the original text,
    # then the same sequential global replacements (\\1-style backrefs
    # are DuckDB's replacement syntax for Spark's $1)
    inj = _PII_INJ_SQL
    clean_expr = "t"
    count_cols = []
    # counts on the ORIGINAL text; clean chain in contract order; gated
    # kinds (iban, cc) replay the checksum folds via the exported
    # fragments — one home for the SQL, shared with the datasheet oracle
    for name in _PII_KINDS:
        if name in _plain:
            pat, drepl = _plain[name]
            pq = pat.replace("'", "''")
            count_cols.append(
                f"len(regexp_extract_all(t, '{pq}'))::BIGINT AS n_{name}"
            )
            clean_expr = f"regexp_replace({clean_expr}, '{pq}', '{drepl}', 'g')"
        else:
            assert name in _gated_names
            count_cols.append(f"{_gated_count(name, 't')} AS n_{name}")
            clean_expr = _gated_clean(name, clean_expr, "t")
    sql["pii_scrub"] = f"""
        WITH w AS (SELECT doc_id, text || ({inj}) AS t FROM documents)
        SELECT doc_id, md5({clean_expr}) AS clean_fp, {', '.join(count_cols)}
        FROM w
    """

    # page_meta: independent arithmetic derivation of every field
    sql["page_meta"] = f"""
        WITH {_RAW_SYNTH_URL_SQL}
        SELECT ru.doc_id, ru.url,
               'Doc ' || ru.doc_id || ' & Co' AS title,
               CASE WHEN ru.doc_id % 3 != 0
                    THEN CASE WHEN ru.doc_id % 2 = 0
                              THEN 'Bob''s summary ' || (ru.doc_id % 7)
                              ELSE 'summary ' || (ru.doc_id % 7) END
               END AS meta_description,
               CASE WHEN ru.doc_id % 4 != 1 THEN
                 CASE WHEN ru.doc_id % 2 = 0 THEN
                   (CASE WHEN ru.doc_id % 3 = 1 THEN 'http' ELSE 'https' END) || '://'
                   || (CASE WHEN ru.doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                   || 'site' || ((ru.doc_id // 2) % 7) || '.com/c/' || (ru.doc_id % 5)
                 ELSE 'https://canon.example.com/' || (ru.doc_id % 5) END
               END AS canonical_url,
               (ru.doc_id % 5 = 0 AND ru.doc_id % 10 = 0) AS robots_noindex,
               (ru.doc_id % 5 = 0 AND (ru.doc_id % 10 != 0 OR ru.doc_id % 20 = 0))
                 AS robots_nofollow
        FROM ru
    """
    sql["tokenizer_fertility"] = _fertility_oracle_sql()
    sql["mmr_rerank"] = _mmr_oracle_sql(qid=0, pool=15, k=5, lam=0.7)
    # sentence_split replay: same punctuate -> mark -> split -> collapse
    # chain; sent_idx is the 0-based PRE-FILTER split position
    sql["sentence_dedup"] = r"""
        WITH d2 AS (
          SELECT doc_id, regexp_replace(text, ' a ', '. ', 'g') AS t FROM documents
        ),
        sl0 AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(
                     string_split(regexp_replace(trim(t), '([.!?]+)([ \t\n\x0B\f\r]+|$)',
                                                 '\1' || chr(1), 'g'), chr(1)),
                     x -> trim(regexp_replace(x, '[ \t\n\x0B\f\r]+', ' ', 'g'))),
                   x -> regexp_matches(x, '[^.!? \t\n\x0B\f\r]')) AS us
          FROM d2
        ),
        -- sentence-less docs get one empty ineligible unit so every
        -- doc_id appears in the output (mirrors the Spark-side guard)
        sl AS (
          SELECT doc_id, CASE WHEN len(us) = 0 THEN [''] ELSE us END AS us FROM sl0
        ),
        ch AS (
          SELECT doc_id, i - 1 AS pos, us[i] AS u
          FROM sl, unnest(generate_series(1, len(us))) AS t(i)
        ),
        el AS (SELECT *, len(trim(u)) >= 1 AS eligible FROM ch),
        boiler AS (SELECT u FROM el WHERE eligible GROUP BY u HAVING count(*) >= 2),
        marked AS (
          SELECT el.doc_id, el.pos, el.u,
                 NOT (el.eligible AND boiler.u IS NOT NULL) AS keep
          FROM el LEFT JOIN boiler ON el.u = boiler.u
        )
        SELECT doc_id, count(*)::BIGINT AS n_units,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               md5(COALESCE(string_agg(CASE WHEN keep THEN u END, ' ' ORDER BY pos), '')) AS dedup_fp
        FROM marked GROUP BY doc_id
    """
    sql["sentences"] = r"""
        WITH d2 AS (
          SELECT doc_id, regexp_replace(text, ' a ', '. ', 'g') AS t FROM documents
        ),
        m AS (
          SELECT doc_id,
                 regexp_replace(trim(t), '([.!?]+)([ \t\n\x0B\f\r]+|$)',
                                '\1' || chr(1), 'g') AS mt
          FROM d2
        ),
        parts AS (
          SELECT doc_id, i - 1 AS sent_idx,
                 trim(regexp_replace(string_split(mt, chr(1))[i],
                                     '[ \t\n\x0B\f\r]+', ' ', 'g')) AS sentence
          FROM m, unnest(generate_series(1, len(string_split(mt, chr(1))))) AS u(i)
        )
        SELECT doc_id, sent_idx::INT AS sent_idx, sentence,
               len(regexp_split_to_array(sentence, '[ \t\n\x0B\f\r]+'))::BIGINT AS n_tokens
        FROM parts WHERE regexp_matches(sentence, '[^.!? \t\n\x0B\f\r]')
    """
    # zipf replay: the vocabulary histogram + rank window, round-12
    # DECIMAL term sums, and the closed-form OLS with the SAME
    # left-associated double ops (intercept uses the UNROUNDED slope)
    sql["zipf"] = r"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS token
          FROM documents
        ),
        hist AS (
          SELECT token, count(*)::BIGINT AS n_total FROM toks
          WHERE length(token) > 0 GROUP BY 1
        ),
        ranked AS (
          SELECT n_total, row_number() OVER (ORDER BY n_total DESC, token) AS r
          FROM hist QUALIFY r <= 1000
        ),
        terms AS (
          SELECT round(ln(r::DOUBLE), 12)::DECIMAL(28,12) AS tx,
                 round(ln(n_total::DOUBLE), 12)::DECIMAL(28,12) AS ty,
                 round(ln(r::DOUBLE) * ln(n_total::DOUBLE), 12)::DECIMAL(28,12) AS txy,
                 round(ln(r::DOUBLE) * ln(r::DOUBLE), 12)::DECIMAL(28,12) AS tx2,
                 round(ln(n_total::DOUBLE) * ln(n_total::DOUBLE), 12)::DECIMAL(28,12) AS ty2
          FROM ranked
        ),
        s AS (
          SELECT count(*)::BIGINT AS k,
                 sum(tx)::DOUBLE AS sx, sum(ty)::DOUBLE AS sy,
                 sum(txy)::DOUBLE AS sxy, sum(tx2)::DOUBLE AS sx2,
                 sum(ty2)::DOUBLE AS sy2
          FROM terms
        )
        SELECT k AS n_tokens,
               (CASE WHEN k >= 2 THEN
                 round((k::DOUBLE * sxy - sx * sy) / (k::DOUBLE * sx2 - sx * sx), 6)::DECIMAL(18,6)
               END)::VARCHAR AS slope,
               (CASE WHEN k >= 2 THEN
                 round((sy - (k::DOUBLE * sxy - sx * sy) / (k::DOUBLE * sx2 - sx * sx) * sx)
                       / k::DOUBLE, 6)::DECIMAL(18,6)
               END)::VARCHAR AS intercept,
               (CASE WHEN k >= 2 AND (k::DOUBLE * sy2 - sy * sy) > 0 THEN
                 round((k::DOUBLE * sxy - sx * sy) * (k::DOUBLE * sxy - sx * sy)
                       / ((k::DOUBLE * sx2 - sx * sx) * (k::DOUBLE * sy2 - sy * sy)), 6)::DECIMAL(18,6)
               END)::VARCHAR AS r2
        FROM s
    """
    # word2phrase replay: tokenize, adjacency pairs by index, counts,
    # the integer-exact score arithmetic; order on the DECIMAL inside
    # the subquery (the VARCHAR projection would sort lexicographically)
    sql["phrases"] = r"""
        WITH base AS (
          SELECT regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS t
          FROM documents
        ),
        uni AS (
          SELECT w, count(*)::BIGINT AS n_w FROM (
            SELECT unnest(t) AS w FROM base WHERE len(t) > 0)
          WHERE length(w) > 0 GROUP BY 1
        ),
        tot AS (SELECT sum(n_w)::BIGINT AS n_total FROM uni),
        pairs AS (
          SELECT t[i] AS word_a, t[i + 1] AS word_b, count(*)::BIGINT AS n_pair
          FROM base, unnest(generate_series(1, len(t) - 1)) AS u(i)
          WHERE length(t[i]) > 0 AND length(t[i + 1]) > 0
          GROUP BY 1, 2
          HAVING count(*) >= 5
        )
        SELECT word_a, word_b, n_pair, score::VARCHAR AS score FROM (
          SELECT word_a, word_b, n_pair,
                 round((n_pair::DOUBLE - (5.0)::DOUBLE) * n_total::DOUBLE
                       / (ua.n_w::DOUBLE * ub.n_w::DOUBLE), 6)::DECIMAL(18,6) AS score
          FROM pairs
          JOIN uni ua ON pairs.word_a = ua.w
          JOIN uni ub ON pairs.word_b = ub.w
          CROSS JOIN tot
          ORDER BY score DESC, word_a ASC, word_b ASC LIMIT 50)
    """
    # HLL replay: md5_long hash, low-8-bit bucket, rho from minimal-
    # binary length, register max, then the canonical fold (0.0 start,
    # bucket order, zero-bucket mass added once) and estimator branches
    sql["hyperball"] = _hyperball_oracle_sql(rounds=3, p=4)
    sql["effective_diameter"] = _effective_diameter_oracle_sql(rounds=3, p=4, q=0.9)
    sql["hyperball_centrality"] = _hyperball_centrality_oracle_sql(rounds=3, p=8)
    sql["hll_distinct"] = r"""
        WITH toks AS (
          SELECT lang, tok FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
            FROM documents)
          WHERE length(tok) > 0
        ),
        h AS (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        cells AS (
          SELECT lang, h % 256 AS bucket,
                 CASE WHEN h // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h // 256)) END AS rho
          FROM h
        ),
        regs AS (SELECT lang, bucket, max(rho) AS reg FROM cells GROUP BY 1, 2),
        s AS (
          SELECT lang, count(*) AS n_nonzero,
                 list_reduce(list_prepend((0.0)::DOUBLE,
                                          list(pow((2.0)::DOUBLE, -reg) ORDER BY bucket)),
                             (acc, x) -> acc + x) AS s_nonzero
          FROM regs GROUP BY 1
        ),
        e AS (
          SELECT lang, (256 - n_nonzero)::BIGINT AS n_zero,
                 (256 - n_nonzero)::DOUBLE + s_nonzero AS big_s
          FROM s
        ),
        est AS (
          SELECT lang, n_zero,
                 (0.7213)::DOUBLE / ((1.0)::DOUBLE + (1.079)::DOUBLE / (256.0)::DOUBLE)
                   * (256.0)::DOUBLE * (256.0)::DOUBLE / big_s AS raw
          FROM e
        ),
        ex AS (SELECT lang, count(DISTINCT tok)::BIGINT AS n_distinct_exact
               FROM toks GROUP BY 1)
        SELECT est.lang, n_zero AS n_zero_registers,
               round(CASE WHEN raw <= (2.5)::DOUBLE * (256.0)::DOUBLE AND n_zero > 0
                          THEN (256.0)::DOUBLE * ln((256.0)::DOUBLE / n_zero::DOUBLE)
                          ELSE raw END, 4)::DECIMAL(18,4)::VARCHAR AS n_distinct_est,
               n_distinct_exact
        FROM est JOIN ex ON est.lang = ex.lang
    """
    # rowgroup-stats replay via DuckDB's OWN parquet footer reader —
    # an independent implementation, not a SQL re-derivation of ours.
    # The footer path follows the parity SF dir (default sf0.01, the
    # scale the correctness driver runs at) so Spark and oracle always
    # describe the SAME file.
    _parity_sf = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
    sql["rowgroup_stats"] = f"""
        SELECT file_name, row_group_id::INT AS row_group_id,
               row_group_num_rows::BIGINT AS n_rows,
               stats_min_value AS min_value, stats_max_value AS max_value,
               COALESCE(stats_min_value::DOUBLE > 200.0
                        OR stats_max_value::DOUBLE < 100.0, FALSE) AS pruned
        FROM parquet_metadata('{_parity_sf}/events.parquet')
        WHERE path_in_schema = 'value'
    """
    # skipping-report replay: aggregate the independent footer read with
    # the same prune rule and the same double division
    sql["skipping_report"] = f"""
        WITH s AS (
          SELECT row_group_num_rows::BIGINT AS n_rows,
                 COALESCE(stats_min_value::DOUBLE > 200.0
                          OR stats_max_value::DOUBLE < 100.0, FALSE) AS p
          FROM parquet_metadata('{_parity_sf}/events.parquet')
          WHERE path_in_schema = 'value'
        )
        SELECT count(*)::BIGINT AS n_groups,
               sum(CASE WHEN p THEN 1 ELSE 0 END)::BIGINT AS n_pruned,
               sum(n_rows)::BIGINT AS n_rows_total,
               sum(CASE WHEN p THEN n_rows ELSE 0 END)::BIGINT AS n_rows_pruned,
               round(sum(CASE WHEN p THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
                 ::DECIMAL(18,6)::VARCHAR AS pruned_fraction
        FROM s
    """
    # FIM replay: the same md5 selection bound and cut-offset arithmetic,
    # PSM re-serialization, md5 fingerprint of the result
    sql["fim"] = f"""
        WITH d AS (
          SELECT doc_id, text, length(text) AS n,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':fim'), 1, 15))::BIGINT AS hs,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':fim:1'), 1, 15))::BIGINT AS h1,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':fim:2'), 1, 15))::BIGINT AS h2
          FROM documents
        ),
        c AS (
          SELECT doc_id, text, n,
                 (hs < {int(0.5 * (1 << 60))} AND n >= 3) AS sel,
                 (h1 % greatest(n - 1, 1)) + 1 AS o1,
                 (h2 % greatest(n - 1, 1)) + 1 AS o2
          FROM d
        )
        SELECT doc_id, sel AS fim_applied,
               md5(CASE WHEN sel THEN
                     '<|fim_prefix|>' || substr(text, 1, least(o1, o2))
                     || '<|fim_suffix|>'
                     || substr(text, greatest(o1, o2) + 1, n - greatest(o1, o2))
                     || '<|fim_middle|>'
                     || substr(text, least(o1, o2) + 1, greatest(o1, o2) - least(o1, o2))
                   ELSE text END) AS fim_fp
        FROM c
    """
    # rollup-merge replay = the direct one-pass rollup (the merge law is
    # the thing under test: split halves must merge to this)
    sql["rollup_merge"] = """
        SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS bucket_start,
               event_type,
               count(*)::BIGINT AS n_events,
               (sum(value::DECIMAL(18,2)))::DECIMAL(18,2)::VARCHAR AS total_value,
               min(value::DECIMAL(18,2))::VARCHAR AS min_value,
               max(value::DECIMAL(18,2))::VARCHAR AS max_value
        FROM events GROUP BY 1, 2
    """
    # curriculum replay: length score, rank, the equi-depth bucket rule
    # (floor — Spark's double->long cast truncates, DuckDB's ::BIGINT
    # rounds, so floor() is spelled out), then the md5 permutation
    sql["curriculum"] = """
        WITH scored AS (SELECT doc_id, length(text) AS s FROM documents),
        r AS (
          SELECT doc_id, s,
                 row_number() OVER (ORDER BY s, doc_id) AS rn,
                 count(*) OVER () AS n
          FROM scored
        ),
        st AS (
          SELECT doc_id,
                 (floor((rn - 1) * 4 / n) + 1)::INT AS stage
          FROM r
        )
        SELECT doc_id, stage,
               row_number() OVER (
                 ORDER BY stage,
                          md5(doc_id::VARCHAR || ':epoch:1'),
                          doc_id)::BIGINT AS curriculum_rank
        FROM st
    """
    # corpus-diff replay: the same deterministic mutation, md5
    # fingerprints (engine-portable), full-outer classification
    sql["corpus_diff"] = """
        WITH base AS (SELECT doc_id, text FROM documents),
        newt AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text
          FROM base WHERE doc_id % 10 <> 3
          UNION ALL
          SELECT doc_id + 1000000, text FROM base WHERE doc_id % 10 = 7
        ),
        o AS (SELECT doc_id, md5(coalesce(text, '')) AS old_fp FROM base),
        n AS (SELECT doc_id, md5(coalesce(text, '')) AS new_fp FROM newt)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN old_fp IS NULL THEN 'added'
                    WHEN new_fp IS NULL THEN 'removed'
                    WHEN old_fp = new_fp THEN 'same'
                    ELSE 'changed' END AS status,
               old_fp, new_fp
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """
    # video-plan replay: the same arithmetic sample table, sync pool,
    # per-media target series, and the latest-at-or-before argmax as a
    # ranked window
    sql["video_plan"] = """
        WITH t AS (
          SELECT (i // 40)::BIGINT AS media_id, (i % 40)::INT AS sample_idx,
                 ((i % 40) * 100)::BIGINT AS ts_ms,
                 (1000 + i * 37)::BIGINT AS byte_offset,
                 (20 + i % 7)::INT AS size, (i % 5 = 0) AS is_sync
          FROM range(120) r(i)
        ),
        pool AS (SELECT * FROM t WHERE is_sync),
        spans AS (SELECT media_id, max(ts_ms) AS mx FROM pool GROUP BY 1),
        targets AS (
          SELECT media_id, unnest(generate_series(0, mx, 700))::BIGINT AS target_ms
          FROM spans
        ),
        j AS (
          SELECT targets.media_id, target_ms, sample_idx, ts_ms, byte_offset, size,
                 row_number() OVER (PARTITION BY targets.media_id, target_ms
                                    ORDER BY ts_ms DESC, sample_idx DESC) AS rn
          FROM targets JOIN pool ON targets.media_id = pool.media_id
                               AND pool.ts_ms <= target_ms
        )
        SELECT media_id, target_ms, sample_idx, ts_ms, byte_offset, size
        FROM j WHERE rn = 1
    """
    # audio-match replay: the same arithmetic landmark tables, the hash
    # join, integer offset votes, and the (votes DESC, track, offset)
    # argmax as a ranked window
    sql["audio_match"] = """
        WITH corpus AS (
          SELECT (i // 200)::BIGINT AS track_id,
                 ((i % 200) * 104729 + (i // 200) * 7919) % 5000 AS fp_hash,
                 (i % 200)::INT AS tc
          FROM range(800) t(i)
        ),
        probe AS (
          SELECT 99::BIGINT AS probe_id,
                 (i * 104729 + 7919) % 5000 AS fp_hash,
                 (i - 50)::INT AS tp
          FROM range(50, 150) t(i)
        ),
        votes AS (
          SELECT probe_id, track_id, (tc - tp)::INT AS "offset",
                 count(*)::BIGINT AS votes
          FROM probe JOIN corpus USING (fp_hash)
          GROUP BY 1, 2, 3
        ),
        best AS (
          SELECT probe_id, track_id, "offset", votes,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY votes DESC, track_id, "offset") AS rn
          FROM votes
        )
        SELECT probe_id, track_id, "offset", votes
        FROM best WHERE rn = 1 AND votes >= 3
    """
    # streaming HLL replay = the batch twin (the register table is a
    # MAX agg, so the 4-micro-batch stream equals the batch sketch);
    # identical chain minus the exact-count column
    sql["stream_hll"] = r"""
        WITH toks AS (
          SELECT lang, tok FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
            FROM documents)
          WHERE length(tok) > 0
        ),
        h AS (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        cells AS (
          SELECT lang, h % 256 AS bucket,
                 CASE WHEN h // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h // 256)) END AS rho
          FROM h
        ),
        regs AS (SELECT lang, bucket, max(rho) AS reg FROM cells GROUP BY 1, 2),
        s AS (
          SELECT lang, count(*) AS n_nonzero,
                 list_reduce(list_prepend((0.0)::DOUBLE,
                                          list(pow((2.0)::DOUBLE, -reg) ORDER BY bucket)),
                             (acc, x) -> acc + x) AS s_nonzero
          FROM regs GROUP BY 1
        ),
        e AS (
          SELECT lang, (256 - n_nonzero)::BIGINT AS n_zero,
                 (256 - n_nonzero)::DOUBLE + s_nonzero AS big_s
          FROM s
        ),
        est AS (
          SELECT lang, n_zero,
                 (0.7213)::DOUBLE / ((1.0)::DOUBLE + (1.079)::DOUBLE / (256.0)::DOUBLE)
                   * (256.0)::DOUBLE * (256.0)::DOUBLE / big_s AS raw
          FROM e
        )
        SELECT lang, n_zero AS n_zero_registers,
               round(CASE WHEN raw <= (2.5)::DOUBLE * (256.0)::DOUBLE AND n_zero > 0
                          THEN (256.0)::DOUBLE * ln((256.0)::DOUBLE / n_zero::DOUBLE)
                          ELSE raw END, 4)::DECIMAL(18,4)::VARCHAR AS n_distinct_est
        FROM est
    """
    # readability replay: same punctuate, the sentence-array filter from
    # sentence_dedup, letter-run words, vowel-group syllables with the
    # silent-'e' rule, then the two Flesch formulas in DOUBLE with the
    # identical left-associated operation order
    sql["readability"] = _READABILITY_ORACLE_SQL
    # equi-depth twin of numeric_histogram: rank over the (value, id)
    # total order, bin = 1 + floor((rn-1)*k/N); lo/hi are element
    # selections so no rounding is needed
    # quantile_sketch: the merge law is the certificate — the oracle is
    # the DIRECT one-pass bottom-k over all events (merge(sk(even),
    # sk(odd)) must equal it exactly since event_ids are distinct),
    # then percentile_cont == F.percentile interpolation
    sql["quantile_sketch"] = r"""
        WITH e AS (
          SELECT event_type,
                 ('0x' || substr(md5(event_id::VARCHAR || ':qsk'), 1, 15))::BIGINT AS hkey,
                 value::DOUBLE AS value
          FROM events WHERE value IS NOT NULL
        ),
        r AS (
          SELECT event_type, hkey, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY hkey, value) AS rn
          FROM e
        ),
        s AS (SELECT event_type, value FROM r WHERE rn <= 256)
        SELECT event_type, count(*)::BIGINT AS n_register,
               round(quantile_cont(value, 0.25), 6)::DECIMAL(18,6)::VARCHAR AS p25,
               round(quantile_cont(value, 0.5), 6)::DECIMAL(18,6)::VARCHAR AS p50,
               round(quantile_cont(value, 0.9), 6)::DECIMAL(18,6)::VARCHAR AS p90
        FROM s GROUP BY event_type
    """
    # the stream's final registers equal the batch sketch EXACTLY (merge
    # law, ids globally distinct) — same oracle as the batch row
    sql["stream_quantile"] = sql["quantile_sketch"]
    sql["quantile_histogram"] = """
        WITH e AS (SELECT event_id, value::DOUBLE AS x FROM events WHERE value IS NOT NULL),
        r AS (SELECT x, row_number() OVER (ORDER BY x, event_id) AS rn,
                     count(*) OVER () AS n FROM e),
        b AS (SELECT x, (1 + floor((rn - 1) * 10 / n))::INT AS bin FROM r)
        SELECT bin, min(x) AS lo, max(x) AS hi, count(*)::BIGINT AS n
        FROM b GROUP BY bin
    """
    # anchor_text: independent arithmetic derivation of both link rows
    # per page (the raw synthetic URL is the src; the root-relative link
    # resolves against the UNSTRIPPED origin, www. included), then the
    # same count/top-k aggregation
    sql["anchor_text"] = f"""
        WITH d AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
        {_RAW_SYNTH_URL_SQL},
        base AS (
          SELECT ru.url AS src,
                 'https://site' || ((d.k + 1) % 7) || '.com/p' || (d.k + 1) AS link_url,
                 ['term' || (d.k % 5), 'common', 'phrase'] AS toks
          FROM d JOIN ru USING (doc_id)
          UNION ALL
          SELECT ru.url,
                 (CASE WHEN d.doc_id % 3 = 1 THEN 'http' ELSE 'https' END) || '://'
                 || (CASE WHEN d.doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                 || 'site' || (d.k % 7) || '.com/r/' || (d.doc_id % 10),
                 ['nav', (d.doc_id % 3)::VARCHAR]
          FROM d JOIN ru USING (doc_id)
        ),
        stats AS (
          SELECT link_url, count(*)::BIGINT AS n_inlinks,
                 count(DISTINCT src)::BIGINT AS n_sources
          FROM base GROUP BY 1
        ),
        tok AS (SELECT link_url, unnest(toks) AS token FROM base),
        cnt AS (SELECT link_url, token, count(*)::BIGINT AS n FROM tok GROUP BY 1, 2),
        top AS (
          SELECT link_url, token, n,
                 row_number() OVER (PARTITION BY link_url ORDER BY n DESC, token)::INT AS rank
          FROM cnt QUALIFY rank <= 3
        )
        SELECT s.link_url, s.n_inlinks, s.n_sources, t.token, t.n, t.rank
        FROM stats s LEFT JOIN top t USING (link_url)
    """
    sql["topic_clusters"] = _topic_oracle_sql(
        "\n        SELECT doc_id, topic FROM a1"
    )
    # extract_links (anchor-capture mode): independent arithmetic
    # derivation of both raw link rows per page — the anchor_text
    # oracle's base CTE with href + anchor exposed
    sql["extract_links"] = f"""
        WITH d AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
        {_RAW_SYNTH_URL_SQL}
        SELECT d.doc_id, ru.url,
               'https://site' || ((d.k + 1) % 7) || '.com/p' || (d.k + 1) AS href,
               'https://site' || ((d.k + 1) % 7) || '.com/p' || (d.k + 1) AS link_url,
               'term' || (d.k % 5) || ' common phrase' AS anchor
        FROM d JOIN ru USING (doc_id)
        UNION ALL
        SELECT d.doc_id, ru.url,
               '/r/' || (d.doc_id % 10) AS href,
               (CASE WHEN d.doc_id % 3 = 1 THEN 'http' ELSE 'https' END) || '://'
               || (CASE WHEN d.doc_id % 3 = 0 THEN 'www.' ELSE '' END)
               || 'site' || (d.k % 7) || '.com/r/' || (d.doc_id % 10) AS link_url,
               'nav ' || (d.doc_id % 3) AS anchor
        FROM d JOIN ru USING (doc_id)
    """
    # stream_topics: the model is the final centroid update (m2/c2) of
    # the trained chain; the streamed assignment is a third round
    _topic_third_round = _topic_oracle_sql(
        """,
        m2 AS MATERIALIZED (
          SELECT a1.topic, i, avg(a0.v[i]) AS m
          FROM a1 JOIN a0 USING (doc_id), unnest(generate_series(1, len(a0.v))) AS t(i)
          GROUP BY 1, 2
        ),
        c2 AS MATERIALIZED (SELECT topic AS cid, list(m ORDER BY i) AS cv FROM m2 GROUP BY 1)
        SELECT doc_id,
               (SELECT cid FROM (
                  SELECT cid, list_dot_product(a0.v, cv)
                         / (sqrt(list_dot_product(a0.v, a0.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                  FROM c2 ORDER BY cs DESC, cid ASC LIMIT 1) s) AS topic
        FROM a0"""
    )
    sql["stream_topics"] = _topic_third_round
    # topic_split: topic_assign against the trained 2-round model is
    # exactly the third-round chain — the SAME SQL certifies
    # split == fused(iterations=3) under the driver hash
    sql["topic_split"] = _topic_third_round
    sql["topic_terms"] = _topic_oracle_sql(
        """,
        tok AS (
          SELECT a1.topic, unnest(bk.toks) AS token
          FROM a1 JOIN bk USING (doc_id)
        ),
        cnt AS (SELECT topic, token, count(*)::BIGINT AS n FROM tok GROUP BY 1, 2)
        SELECT topic, token, n, rank FROM (
          SELECT topic, token, n,
                 row_number() OVER (PARTITION BY topic ORDER BY n DESC, token)::INT AS rank
          FROM cnt
        ) WHERE rank <= 10"""
    )
    # gap-based sessionization: same lag/running-sum formulation over
    # integer epoch-microseconds; DuckDB's integer window sum is HUGEINT,
    # cast back to BIGINT to match Spark's long
    sql["gap_sessions"] = r"""
        WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events),
        b AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 86400000000
                      THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        lab AS (
          SELECT user_id, ts, value,
                 (sum(is_new) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
          FROM b
        )
        SELECT user_id, session_seq,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*)::BIGINT AS n_events,
               sum(CAST(value AS DECIMAL(18,2)))::VARCHAR AS total_value,
               floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0)::BIGINT AS duration_s
        FROM lab GROUP BY 1, 2
    """
    # IR eval of the bm25 top-20 against token-containment graded qrels:
    # the ranked CTE replays bm25_search's oracle at k=20; DCG terms are
    # rounded DECIMAL(28,12) BEFORE summation (order-independent on both
    # engines); "precision" is a DuckDB keyword, hence quoted
    sql["search_eval"] = r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
          FROM documents
        ),
        hist AS (
          SELECT doc_id, tok, count(*)::DOUBLE AS tf
          FROM toks WHERE len(tok) > 0 GROUP BY 1, 2
        ),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM hist GROUP BY 1),
        scalars AS (SELECT avg(dl) AS avgdl, count(*)::BIGINT AS n_docs FROM dl),
        matched AS (SELECT * FROM hist WHERE tok IN ('join', 'spark', 'window')),
        dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM matched GROUP BY 1),
        scored AS (
          SELECT m.doc_id,
                 CAST(round(sum(
                   ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * m.tf * 2.2
                   / (m.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
                 ), 6) AS DECIMAL(18,6)) AS score
          FROM matched m
          JOIN dfreq f USING (tok) JOIN dl d USING (doc_id), scalars s
          GROUP BY m.doc_id
        ),
        ranked AS (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank
          FROM scored ORDER BY score DESC, doc_id LIMIT 20
        ),
        wds AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        qrp AS (
          SELECT doc_id,
                 (list_contains(words, 'join')::INT + list_contains(words, 'spark')::INT
                  + list_contains(words, 'window')::INT)::DOUBLE AS rel
          FROM wds
          WHERE list_contains(words, 'join') OR list_contains(words, 'spark')
             OR list_contains(words, 'window')
        ),
        ks(k) AS (VALUES (1), (5), (10)),
        j AS (
          SELECT r.rank, coalesce(q.rel, 0.0) AS rel
          FROM ranked r LEFT JOIN qrp q USING (doc_id)
        ),
        m AS (
          SELECT ks.k,
                 sum(CASE WHEN j.rank <= ks.k AND j.rel > 0 THEN 1 ELSE 0 END)::BIGINT AS hits,
                 sum(CAST(round(CASE WHEN j.rank <= ks.k
                       THEN j.rel * 0.6931471805599453 / ln(j.rank + 1.0) ELSE 0.0 END, 12)
                     AS DECIMAL(28,12))) AS dcg,
                 max(CASE WHEN j.rank <= ks.k AND j.rel > 0 THEN 1.0 / j.rank END) AS rr
          FROM j CROSS JOIN ks GROUP BY 1
        ),
        ip AS (SELECT doc_id, rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos FROM qrp),
        idl AS (
          SELECT ks.k,
                 sum(CAST(round(CASE WHEN ip.pos <= ks.k
                       THEN ip.rel * 0.6931471805599453 / ln(ip.pos + 1.0) ELSE 0.0 END, 12)
                     AS DECIMAL(28,12))) AS idcg
          FROM ip CROSS JOIN ks GROUP BY 1
        ),
        nr AS (SELECT count(*)::BIGINT AS n_rel FROM qrp)
        SELECT 1::INT AS query_id, m.k::INT AS k, nr.n_rel, m.hits,
               CAST(round(m.hits / (m.k * 1.0), 6) AS DECIMAL(18,6))::VARCHAR AS "precision",
               CAST(round(m.hits / nr.n_rel, 6) AS DECIMAL(18,6))::VARCHAR AS recall,
               CAST(round(coalesce(m.rr, 0.0), 6) AS DECIMAL(18,6))::VARCHAR AS mrr,
               CAST(CASE WHEN idl.idcg > 0
                    THEN round(m.dcg::DOUBLE / idl.idcg::DOUBLE, 6) END
                    AS DECIMAL(18,6))::VARCHAR AS ndcg
        FROM m JOIN idl USING (k), nr
    """
    sql["embed_near_dup_lsh"] = _embed_lsh_oracle_sql(threshold=0.35, dims=64, bits=5, tables=8)
    sql["simhash_buckets"] = _simhash_oracle_sql(n=4)
    # reasons derive from the SAME r CTE + rule expressions as
    # quality_filter's oracle (NULL metrics drop out of the list)
    sql["quality_reasons"] = f"""
        WITH {_QF_CTES}
        SELECT doc_id, n_tokens,
               mean_tok_len::VARCHAR AS mean_tok_len,
               top_term_ratio::VARCHAR AS top_term_ratio,
               {_QF_PASSES} AS passes,
               COALESCE(array_to_string(list_sort(list_filter([
                 CASE WHEN mean_tok_len > 12.0 THEN 'mean_tok_len_high' END,
                 CASE WHEN mean_tok_len < 2.0 THEN 'mean_tok_len_low' END,
                 CASE WHEN n_tokens < 10 THEN 'too_few_tokens' END,
                 CASE WHEN n_tokens > 100000 THEN 'too_many_tokens' END,
                 CASE WHEN top_term_ratio > 0.25 THEN 'top_term_ratio_high' END
               ], x -> x IS NOT NULL)), ','), '') AS reasons
        FROM r"""
    sql["content_type"] = r"""
        WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS ls, text FROM documents)
        SELECT doc_id, len(ls)::BIGINT AS n_lines,
               CAST(round(len(list_filter(ls, x -> regexp_matches(x, '^(    |\t)|[;{}]$')))::DOUBLE
                          / greatest(len(ls), 1), 6) AS DECIMAL(18,6))::VARCHAR AS code_frac,
               CAST(round(len(list_filter(ls, x -> regexp_matches(x, '^#')))::DOUBLE
                          / greatest(len(ls), 1), 6) AS DECIMAL(18,6))::VARCHAR AS header_frac,
               CAST(round(len(list_filter(ls, x -> regexp_matches(x, '^>')))::DOUBLE
                          / greatest(len(ls), 1), 6) AS DECIMAL(18,6))::VARCHAR AS quote_frac,
               CAST(round(len(list_filter(ls, x -> regexp_matches(x, '^(- |\* )')))::DOUBLE
                          / greatest(len(ls), 1), 6) AS DECIMAL(18,6))::VARCHAR AS bullet_frac,
               (len(regexp_split_to_array(text, 'https?://')) - 1)::BIGINT AS n_urls
        FROM l"""
    # CCNet perplexity bucketing: add-one unigram LM on src0, per-lang
    # percent_rank thirds (ties broken by doc_id — deterministic)
    sql["perplexity_buckets"] = r"""
        WITH tk AS (
          SELECT doc_id, lang, tok FROM (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
            FROM documents
          ) WHERE len(tok) > 0
        ),
        tv AS (
          SELECT tok, count(*) AS c FROM (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
            FROM documents WHERE source = 'src0'
          ) WHERE len(tok) > 0 GROUP BY tok
        ),
        tot AS (SELECT sum(c) AS t, count(*) AS v FROM tv),
        pd AS (
          SELECT tk.doc_id, tk.lang, count(*)::BIGINT AS n_tokens,
                 CAST(round(avg(-ln((coalesce(tv.c, 0) + 1)::DOUBLE / (tot.t + tot.v))), 6)
                      AS DECIMAL(18,6)) AS nll
          FROM tk LEFT JOIN tv USING (tok), tot
          GROUP BY tk.doc_id, tk.lang
        ),
        pr AS (
          SELECT doc_id, lang, n_tokens, nll,
                 percent_rank() OVER (PARTITION BY lang ORDER BY nll, doc_id) AS p
          FROM pd
        )
        SELECT doc_id, lang, n_tokens, nll::VARCHAR AS avg_nll,
               CASE WHEN p < CAST(1 AS DOUBLE) / 3 THEN 'head'
                    WHEN p < CAST(2 AS DOUBLE) / 3 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM pr"""
    # Manku-banded near-dup pairs over the same fingerprint CTEs: band
    # extraction (shift+mask keeps only the banded 16 bits regardless of
    # sign fill), lossless pigeonhole blocking, xor-popcount verify
    sql["simhash_pairs"] = (
        "WITH fp AS ("
        + _simhash_oracle_sql(n=4)
        + r"""),
        banded AS (
          SELECT doc_id, b, (simhash >> (16 * b)) & 65535 AS bval
          FROM fp, unnest(generate_series(0, 3)) t(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
          FROM banded a JOIN banded c ON a.b = c.b AND a.bval = c.bval
                                     AND a.doc_id < c.doc_id
        )
        SELECT cand.doc_a, cand.doc_b,
               bit_count(xor(fa.simhash, fb.simhash))::BIGINT AS hamming
        FROM cand JOIN fp fa ON cand.doc_a = fa.doc_id
                  JOIN fp fb ON cand.doc_b = fb.doc_id
        WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3"""
    )
    sql["exact_substring"] = _exact_substring_oracle_sql(n=8)
    # bloom_decontaminate: bit-for-bit replay of the md5-position Bloom
    # filter (m=2^20, k=4) over the same eval slice as `decontaminate`
    sql["bloom_decontaminate"] = r"""
        WITH w AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(words, i, i + 4), ' ') AS shingle
          FROM w, unnest(generate_series(1, greatest(len(words) - 4, 1))) AS t(i)
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
        corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        bits AS (
          SELECT DISTINCT ('0x' || substr(md5(shingle || ':' || i), 1, 15))::BIGINT % 1048576 AS bit
          FROM bench, unnest(generate_series(0, 3)) AS t(i)
        ),
        probes AS (
          SELECT doc_id, shingle,
                 ('0x' || substr(md5(shingle || ':' || i), 1, 15))::BIGINT % 1048576 AS bit
          FROM corpus, unnest(generate_series(0, 3)) AS t(i)
        ),
        full_hits AS (
          SELECT p.doc_id, p.shingle
          FROM probes p JOIN bits USING (bit)
          GROUP BY 1, 2 HAVING count(*) = 4
        ),
        hits AS (SELECT doc_id, count(*)::BIGINT AS n_hits FROM full_hits GROUP BY 1),
        sizes AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM corpus GROUP BY 1)
        SELECT s.doc_id, s.n_shingles,
               coalesce(h.n_hits, 0)::BIGINT AS n_hits,
               coalesce(h.n_hits, 0) >= 1 AS contaminated
        FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
    """
    # betweenness: on the located-in forest, every region-to-leaf
    # shortest path passes through exactly one nation, so the Brandes
    # dependency from region landmarks is the nation's leaf count;
    # leaves and regions (endpoints) score 0 and are absent
    # clustering: triangle CTEs + degree + the C(deg,2) ratio
    sql["clustering"] = """
        WITH pkgs AS (SELECT unnest(generate_series(0, 999)) AS i),
        vv AS (SELECT i, unnest(generate_series(0, CASE WHEN i = 0 THEN 119 ELSE (i*i) % 113 END)) AS j FROM pkgs),
        und AS (SELECT DISTINCT least(i, (i*31 + j) % 1000) AS u, greatest(i, (i*31 + j) % 1000) AS w
                FROM vv WHERE (i*31 + j) % 1000 <> i),
        tri AS (SELECT e1.u AS a, e1.w AS b, e2.w AS c
                FROM und e1 JOIN und e2 ON e2.u = e1.w
                JOIN und e3 ON e3.u = e1.u AND e3.w = e2.w),
        roles AS (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
        cnt AS (SELECT n, count(*) AS t FROM roles GROUP BY n),
        adj AS (SELECT u AS w, w AS n FROM und UNION ALL SELECT w, u FROM und),
        deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w)
        SELECT (1000000000 + i)::BIGINT AS id,
               COALESCE(t, 0)::BIGINT AS triangles,
               COALESCE(d, 0)::BIGINT AS deg,
               CASE WHEN COALESCE(d, 0) >= 2
                    THEN CAST(round(COALESCE(t, 0)::DOUBLE / (d * (d - 1) / 2.0), 6) AS DECIMAL(18,6))::VARCHAR
                    ELSE '0.000000' END AS coeff
        FROM pkgs LEFT JOIN cnt ON n = i LEFT JOIN deg ON w = i
    """
    sql["betweenness"] = """
        SELECT (2000000000000 + n_nationkey)::BIGINT AS id,
               CAST(round(COALESCE(c.cnt, 0) + COALESCE(s.cnt, 0), 6)
                 AS DECIMAL(18,6))::VARCHAR AS betweenness
        FROM nation
        LEFT JOIN (SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY 1) c
               ON c_nationkey = n_nationkey
        LEFT JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier GROUP BY 1) s
               ON s_nationkey = n_nationkey
        UNION ALL
        SELECT (3000000000000 + c_custkey)::BIGINT, '0.000000' FROM customer
        UNION ALL
        SELECT (4000000000000 + s_suppkey)::BIGINT, '0.000000' FROM supplier
    """
    # weighted_sp: on the located-in tree every (node, landmark) pair has
    # one path, so the 3-round Bellman-Ford cost is the exact layer sum
    sql["weighted_sp"] = """
        WITH r AS (SELECT (1000000000000 + r_regionkey)::BIGINT AS id,
                          (1000000000000 + r_regionkey)::BIGINT AS landmark,
                          0::BIGINT AS cost FROM region),
        n AS (SELECT (2000000000000 + n_nationkey)::BIGINT AS id,
                     (1000000000000 + n_regionkey)::BIGINT AS landmark,
                     (((300000000000000 + n_nationkey) % 7) + 1)::BIGINT AS cost,
                     n_nationkey FROM nation),
        c AS (SELECT (3000000000000 + c_custkey)::BIGINT AS id, n.landmark,
                     (n.cost + ((100000000000000 + c_custkey) % 7) + 1)::BIGINT AS cost
              FROM customer JOIN n ON c_nationkey = n.n_nationkey),
        s AS (SELECT (4000000000000 + s_suppkey)::BIGINT AS id, n.landmark,
                     (n.cost + ((200000000000000 + s_suppkey) % 7) + 1)::BIGINT AS cost
              FROM supplier JOIN n ON s_nationkey = n.n_nationkey)
        SELECT id, landmark, cost FROM r
        UNION ALL SELECT id, landmark, cost FROM n
        UNION ALL SELECT id, landmark, cost FROM c
        UNION ALL SELECT id, landmark, cost FROM s
    """
    sql["embedding_outliers"] = """
        WITH m AS (
          SELECT list(mm ORDER BY pos) AS mv FROM (
            SELECT t.i AS pos, round(avg(embedding[t.i]::DOUBLE), 6) AS mm
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
            GROUP BY t.i)
        ),
        s AS (
          SELECT vec_id,
                 CAST(round(list_dot_product(embedding::DOUBLE[], mv)
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(mv, mv))), 6) AS DECIMAL(18,6)) AS score
          FROM embeddings, m
        ),
        t AS (SELECT CAST(quantile_cont(score, 0.05) AS DECIMAL(18,6)) AS thr FROM s)
        SELECT vec_id, score::VARCHAR AS score, score <= thr AS outlier FROM s, t
    """
    sql["percentile_band"] = """
        WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS p_lo,
                          quantile_cont(n_chars, 0.95) AS p_hi FROM documents)
        SELECT d.doc_id, d.n_chars, b.p_lo, b.p_hi FROM documents d, b
        WHERE d.n_chars BETWEEN b.p_lo AND b.p_hi
    """
    # hybrid_search: RRF fusion of the bm25 pool and the cosine pool,
    # both replayed with the same tie rules
    sql["hybrid_search"] = r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
          FROM documents
        ),
        hist AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks WHERE len(tok) > 0 GROUP BY 1, 2),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM hist GROUP BY 1),
        scalars AS (SELECT avg(dl) AS avgdl, count(*)::BIGINT AS n_docs FROM dl),
        matched AS (SELECT * FROM hist WHERE tok IN ('join', 'spark', 'window')),
        dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM matched GROUP BY 1),
        scored AS (
          SELECT m.doc_id,
                 CAST(round(sum(
                   ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * m.tf * 2.2 / (m.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
                 ), 6) AS DECIMAL(18,6)) AS score
          FROM matched m JOIN dfreq f USING (tok) JOIN dl d USING (doc_id), scalars s
          GROUP BY m.doc_id
        ),
        lex AS (
          SELECT doc_id AS _id, row_number() OVER (ORDER BY score DESC, doc_id)::INT AS lex_rank
          FROM scored ORDER BY score DESC, doc_id LIMIT 50
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        semtop AS (
          SELECT vec_id,
                 CAST(round(list_dot_product(v, qv)
                     / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
                   AS DECIMAL(18,6)) AS score
          FROM e, q WHERE vec_id <> 0 ORDER BY score DESC, vec_id LIMIT 50
        ),
        sem AS (SELECT vec_id AS _id,
                       row_number() OVER (ORDER BY score DESC, vec_id)::INT AS sem_rank
                FROM semtop),
        fused AS (
          SELECT coalesce(lex._id, sem._id) AS doc_id,
                 CAST(round(coalesce(1.0 / (60.0 + lex_rank), 0)
                          + coalesce(1.0 / (60.0 + sem_rank), 0), 6) AS DECIMAL(18,6)) AS rrf,
                 lex_rank, sem_rank
          FROM lex FULL OUTER JOIN sem ON lex._id = sem._id
        ),
        topk AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10)
        SELECT doc_id, rrf::VARCHAR AS rrf, lex_rank, sem_rank,
               row_number() OVER (ORDER BY rrf DESC, doc_id)::INT AS rank
        FROM topk
    """
    sql["skew_report"] = """
        WITH c AS (SELECT source, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
        t AS (SELECT sum(cnt)::DOUBLE AS total FROM c),
        top AS (SELECT source, cnt FROM c ORDER BY cnt DESC, source LIMIT 5)
        SELECT (row_number() OVER (ORDER BY cnt DESC, source))::BIGINT AS rank,
               source, cnt,
               CAST(round(cnt / total, 6) AS DECIMAL(18,6))::VARCHAR AS frac
        FROM top, t
    """
    # tpch_q2_like: the correlated min-per-group as ANSI row_number
    sql["tpch_q2_like"] = """
        WITH offers AS (
          SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
                 CAST(round(l.l_extendedprice::DOUBLE / l.l_quantity, 6) AS DECIMAL(18,6)) AS unit_price
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
        )
        SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_price::VARCHAR AS unit_price
        FROM (SELECT *, row_number() OVER (PARTITION BY p_partkey
                    ORDER BY unit_price ASC, s_suppkey ASC) AS rk FROM offers)
        WHERE rk = 1
    """
    # cross_source_overlap: same shingle sets, pair join in SQL
    sql["cross_source_overlap"] = r"""
        WITH w AS (
          SELECT source, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT source, array_to_string(list_slice(words, i, i + 4), ' ') AS g
          FROM w, unnest(generate_series(1, greatest(len(words) - 4, 1))) AS t(i)
        ),
        sizes AS (SELECT source, count(*) AS ng FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS shared_ngrams
          FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT p.source_a, p.source_b, p.shared_ngrams,
               CAST(round(p.shared_ngrams::DOUBLE / (sa.ng + sb.ng - p.shared_ngrams), 6)
                 AS DECIMAL(18,6))::VARCHAR AS jaccard
        FROM pairs p JOIN sizes sa ON p.source_a = sa.source
                     JOIN sizes sb ON p.source_b = sb.source
    """
    sql["source_calibrated"] = """
        SELECT doc_id, source, n_chars,
               CAST(round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id), 6)
                 AS DECIMAL(18,6))::VARCHAR AS pct_rank
        FROM documents
    """
    sql["table_profile"] = """
        WITH w AS (
          SELECT count(*)::BIGINT AS n,
                 (count(*) FILTER (o_orderkey IS NULL))::BIGINT AS k_nulls,
                 count(DISTINCT o_orderkey)::BIGINT AS k_d,
                 min(o_orderkey)::VARCHAR AS k_mn, max(o_orderkey)::VARCHAR AS k_mx,
                 (count(*) FILTER (o_custkey IS NULL))::BIGINT AS c_nulls,
                 count(DISTINCT o_custkey)::BIGINT AS c_d,
                 min(o_custkey)::VARCHAR AS c_mn, max(o_custkey)::VARCHAR AS c_mx,
                 (count(*) FILTER (o_orderstatus IS NULL))::BIGINT AS s_nulls,
                 count(DISTINCT o_orderstatus)::BIGINT AS s_d,
                 min(o_orderstatus) AS s_mn, max(o_orderstatus) AS s_mx,
                 (count(*) FILTER (o_totalprice IS NULL))::BIGINT AS t_nulls,
                 count(DISTINCT o_totalprice)::BIGINT AS t_d,
                 min(o_totalprice)::VARCHAR AS t_mn, max(o_totalprice)::VARCHAR AS t_mx
          FROM orders)
        SELECT 'o_orderkey' AS col, n AS n_rows, k_nulls AS n_nulls, k_d AS n_distinct,
               k_mn AS min_v, k_mx AS max_v FROM w
        UNION ALL SELECT 'o_custkey', n, c_nulls, c_d, c_mn, c_mx FROM w
        UNION ALL SELECT 'o_orderstatus', n, s_nulls, s_d, s_mn, s_mx FROM w
        UNION ALL SELECT 'o_totalprice', n, t_nulls, t_d, t_mn, t_mx FROM w
    """
    sql["fk_check"] = """
        WITH bad AS (
          SELECT DISTINCT l_orderkey FROM lineitem
          UNION ALL SELECT 1000000000
        )
        SELECT l_orderkey FROM bad
        WHERE l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = bad.l_orderkey)
    """
    # correlation matrix: identical exact-decimal co-moment sums feed the
    # identical closed-form in doubles; listwise NULL deletion both sides
    _corr_pairs = [
        ("l_discount", "l_extendedprice"),
        ("l_discount", "l_quantity"),
        ("l_discount", "l_tax"),
        ("l_extendedprice", "l_quantity"),
        ("l_extendedprice", "l_tax"),
        ("l_quantity", "l_tax"),
    ]
    _d6 = lambda c: f"CAST(round({c}::DOUBLE, 6) AS DECIMAL(18,6))"  # noqa: E731
    _corr_one = (
        lambda a, b: f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"CAST(round((n::DOUBLE * p_{a}_{b}::DOUBLE - s_{a}::DOUBLE * s_{b}::DOUBLE) / "
        f"nullif(sqrt(n::DOUBLE * p_{a}_{a}::DOUBLE - s_{a}::DOUBLE * s_{a}::DOUBLE) * "
        f"sqrt(n::DOUBLE * p_{b}_{b}::DOUBLE - s_{b}::DOUBLE * s_{b}::DOUBLE), 0.0), 6) "
        f"AS DECIMAL(18,6))::VARCHAR AS corr FROM w"
    )
    _corr_cols = sorted({c for p in _corr_pairs for c in p})
    sql["corr_matrix"] = (
        "WITH clean AS (SELECT * FROM lineitem WHERE "
        + " AND ".join(f"{c} IS NOT NULL" for c in _corr_cols)
        + "), w AS (SELECT count(*) AS n, "
        + ", ".join(f"sum({_d6(c)}) AS s_{c}" for c in _corr_cols)
        + ", "
        + ", ".join(
            # operands widen to (19,6) so DuckDB's product type is
            # (38,12) — int128 arithmetic — instead of overflowing the
            # (36,12) int64 path; the VALUES are identical to Spark's
            # (18,6)x(18,6) decimal products
            f"sum(CAST({_d6(a)} AS DECIMAL(19,6)) * CAST({_d6(b)} AS DECIMAL(19,6))) AS p_{a}_{b}"
            for i, a in enumerate(_corr_cols)
            for b in _corr_cols[i:]
        )
        + " FROM clean) "
        + " UNION ALL ".join(_corr_one(a, b) for a, b in _corr_pairs)
    )
    sql["numeric_histogram"] = r"""
        WITH b AS (
          SELECT min(value::DOUBLE) AS lo, max(value::DOUBLE) AS hi
          FROM events WHERE value IS NOT NULL
        ),
        binned AS (
          SELECT CASE WHEN b.hi = b.lo THEN 1
                      ELSE least(12, (floor((value::DOUBLE - b.lo) * 12 / (b.hi - b.lo)) + 1)::INT)
                 END AS bin, b.lo, b.hi
          FROM events, b WHERE value IS NOT NULL
        )
        SELECT bin,
               round(lo + (bin - 1) * ((hi - lo) / 12), 6) AS lo_edge,
               round(lo + bin * ((hi - lo) / 12), 6) AS hi_edge,
               count(*)::BIGINT AS n
        FROM binned GROUP BY bin, lo, hi
    """
    sql["stopword_stats"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'),
                             x -> length(x) > 0) AS tk
          FROM documents
        ), h AS (
          SELECT doc_id, tk,
                 list_filter(tk, x -> list_contains(['the','be','to','of','and','that','have','with'], x)) AS hits
          FROM t
        )
        SELECT doc_id, len(tk)::BIGINT AS n_tokens,
               len(list_distinct(hits))::BIGINT AS n_distinct_stopwords,
               CAST(round(CASE WHEN len(tk) > 0 THEN len(hits)::DOUBLE / len(tk) ELSE 0 END, 6)
                 AS DECIMAL(18,6))::VARCHAR AS stopword_frac
        FROM h
    """
    # char_entropy: relational rendering of the run-length entropy fold
    sql["char_entropy"] = """
        WITH ch AS (
          SELECT doc_id, substr(text, t.i, 1) AS c
          FROM documents, unnest(generate_series(1, length(text))) AS t(i)
        ), cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS k FROM ch GROUP BY 1, 2),
        agg AS (SELECT doc_id, sum(k * log2(k)) AS s, sum(k) AS n FROM cnt GROUP BY 1)
        SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
               -- ::VARCHAR (r11 all-rows hash sweep): the standard
               -- DECIMAL canon — Spark pandas-renders DECIMAL as
               -- Decimal('3.926651'), DuckDB as float64 3.926651
               CAST(round(CASE WHEN a.n > 0 THEN log2(a.n) - a.s / a.n ELSE 0 END, 6)
                 AS DECIMAL(18,6))::VARCHAR AS entropy
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    sql["event_transitions"] = """
        WITH p AS (
          SELECT user_id, event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          FROM events
        ), c AS (
          SELECT from_type, to_type, count(*)::BIGINT AS n
          FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6)
                 AS DECIMAL(18,6))::VARCHAR AS prob
        FROM c
    """
    # ewma: identical recursive fold via list_reduce over the same frame
    sql["ewma"] = """
        WITH v AS (
          SELECT event_id, user_id, ts,
                 list(value::DOUBLE) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
          FROM events
        )
        SELECT event_id, user_id, strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts,
               CAST(round(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
                 AS DECIMAL(18,6))::VARCHAR AS ewma
        FROM v
    """
    # embedding_stats / sq_topk: per-dimension moments and the SQ8
    # quantizer replayed with identical per-element IEEE arithmetic
    sql["embedding_stats"] = """
        WITH p AS (
          SELECT (t.i - 1)::INT AS pos, embedding[t.i]::DOUBLE AS v
          FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        )
        SELECT pos, count(*)::BIGINT AS n,
               CAST(round(avg(v), 6) AS DECIMAL(18,6))::VARCHAR AS mean,
               CAST(round(stddev_pop(v), 6) AS DECIMAL(18,6))::VARCHAR AS std,
               min(v) AS vmin, max(v) AS vmax
        FROM p GROUP BY pos
    """
    sql["sq_topk"] = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        r AS (
          SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM (
            SELECT t.i AS pos, min(embedding[t.i]::DOUBLE) AS mn, max(embedding[t.i]::DOUBLE) AS mx
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
            GROUP BY t.i)
        ),
        rec AS (
          SELECT vec_id,
                 list_transform(range(1, len(v) + 1),
                   i -> CASE WHEN mxs[i] > mns[i]
                             THEN mns[i] + round((v[i] - mns[i]) / (mxs[i] - mns[i]) * 255.0)
                                  * (mxs[i] - mns[i]) / 255.0
                             ELSE mns[i] END) AS rv
          FROM e, r
        ),
        q AS (SELECT rv AS qv FROM rec WHERE vec_id = 0)
        SELECT vec_id, score::VARCHAR AS score FROM (
          SELECT vec_id,
                 CAST(round(list_dot_product(rv, qv)
                     / (sqrt(list_dot_product(rv, rv)) * sqrt(list_dot_product(qv, qv))), 6)
                   AS DECIMAL(18,6)) AS score
          FROM rec, q WHERE vec_id <> 0
          ORDER BY score DESC, vec_id LIMIT 10)
    """
    # fuzzy_pairs: verbatim replay — same blocking, same levenshtein
    sql["fuzzy_pairs"] = """
        WITH n AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
        b AS (SELECT doc_id, t, substr(t, 1, 12) AS pfx, (length(t) // 16) AS lb FROM n),
        pr AS (SELECT doc_id, t, pfx, lb AS pb FROM b
               UNION ALL SELECT doc_id, t, pfx, lb + 1 FROM b),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.t AS ta, c.t AS tb
                 FROM pr a JOIN pr c
                 ON a.pfx = c.pfx AND a.pb = c.pb AND a.doc_id < c.doc_id)
        SELECT doc_a, doc_b, levenshtein(ta, tb)::BIGINT AS dist FROM cand
        WHERE levenshtein(ta, tb) <= 12
    """
    sql["similarity_lsh"] = _similarity_lsh_oracle_sql(query_id=0, k=10, bits=4, dims=64)
    # generated from the same threshold helper the Spark operator uses, so
    # the two sides cannot drift
    from hgraphstorage_spark.pipeline.sampling import hash_split_case_sql

    sql["hash_split"] = (
        "SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) AS bucket, "
        + hash_split_case_sql()
        + " AS split FROM documents"
    )
    # the narrow (zero-shuffle, streaming-safe) quality filter must equal
    # the histogram variant exactly — one oracle serves both
    sql["quality_filter_narrow"] = sql["quality_filter"]
    # semantic_dedup: the kmeans oracle's assignment CTEs + the
    # within-cluster pair rule (shares text with sql["kmeans"] by
    # construction so the two cannot drift)
    kmeans_body = sql["kmeans"].rstrip()
    assert kmeans_body.lstrip().startswith("WITH"), "kmeans oracle shape changed"
    final_select = kmeans_body.rindex("SELECT vec_id,")
    sql["semantic_dedup"] = (
        kmeans_body[:final_select].rstrip().rstrip(",")
        + """,
            a1 AS MATERIALIZED (
              SELECT vec_id, v,
                     (SELECT cid FROM (
                        SELECT cid, list_dot_product(a0.v, cv)
                               / (sqrt(list_dot_product(a0.v, a0.v)) * sqrt(list_dot_product(cv, cv))) AS cs
                        FROM c1 ORDER BY cs DESC, cid ASC LIMIT 1) s) AS list_id
              FROM a0
            ),
            dup AS (
              SELECT DISTINCT b.vec_id
              FROM a1 a JOIN a1 b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
              WHERE CAST(round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
                      AS DECIMAL(18,6)) >= 0.35
            )
            SELECT vec_id, list_id, vec_id NOT IN (SELECT vec_id FROM dup) AS keep FROM a1"""
    )
    # pipeline_report: per-stage survivor counts composed from the SAME
    # oracle bodies as the individual stage queries
    sql["pipeline_report"] = f"""
        SELECT 'total' AS stage, count(*)::BIGINT AS n_docs FROM documents
        UNION ALL
        SELECT 'quality_pass', count(*)::BIGINT FROM ({sql["quality_filter"]}) WHERE passes
        UNION ALL
        SELECT 'exact_unique', count(*)::BIGINT FROM ({sql["dedup_exact"]})
        UNION ALL
        SELECT 'decontam_clean', count(*)::BIGINT FROM ({sql["decontaminate"]}) WHERE NOT contaminated
        UNION ALL
        SELECT 'length_band', count(*)::BIGINT FROM ({sql["percentile_band"]})
        UNION ALL
        SELECT 'final', count(*)::BIGINT
        FROM ({sql["quality_filter"]}) q
        JOIN ({sql["dedup_exact"]}) k USING (doc_id)
        JOIN ({sql["decontaminate"]}) c USING (doc_id)
        JOIN ({sql["percentile_band"]}) b USING (doc_id)
        WHERE q.passes AND NOT c.contaminated
    """
    # graph_summary: scalar per iterative algorithm, composed from the same
    # oracle bodies the per-node queries use (subquery-wrapped), so the
    # compressed check cannot drift from the full ones
    sql["graph_summary"] = "\nUNION ALL\n".join(
        [
            f"SELECT 'cc_components' AS metric, count(*)::BIGINT AS value FROM ({sql['connected_components']})",
            f"SELECT 'cc_nodes', sum(n_nodes)::BIGINT FROM ({sql['connected_components']})",
            f"SELECT 'degrees_max', max(deg)::BIGINT FROM ({sql['degrees']})",
            f"SELECT 'degrees_total', sum(deg)::BIGINT FROM ({sql['degrees']})",
            f"SELECT 'bfs_nodes', sum(n_nodes)::BIGINT FROM ({sql['bfs']})",
            f"SELECT 'triangles_total', sum(triangles)::BIGINT FROM ({sql['triangle_count']})",
            f"SELECT 'k_core3_size', count(*)::BIGINT FROM ({sql['k_core']})",
            f"SELECT 'lpa_communities', count(*)::BIGINT FROM ({sql['label_propagation']})",
            f"SELECT 'scc_components', count(DISTINCT scc)::BIGINT FROM ({sql['scc']})",
            f"SELECT 'sp_reached', sum(n_nodes)::BIGINT FROM ({sql['shortest_paths']})",
            f"SELECT 'k_truss4_edges', count(*)::BIGINT FROM ({sql['k_truss']})",
            f"SELECT 'betweenness_sum', sum(betweenness::DOUBLE)::BIGINT FROM ({sql['betweenness']})",
            f"SELECT 'clustering_nonzero', count(*)::BIGINT FROM ({sql['clustering']}) WHERE coeff::DOUBLE > 0",
            f"SELECT 'wsp_cost_total', sum(cost)::BIGINT FROM ({sql['weighted_sp']})",
            # r10: the HyperBall effective-diameter integer report joins
            # the compressed evidence row (VERDICT r8 task 4 / r9 task 3)
            f"SELECT 'effective_diameter', effective_diameter::BIGINT FROM ({sql['effective_diameter']})",
        ]
    )
    # boilerplate_dedup: replay keyed on the chunk STRING (the engine's
    # xxhash64 keying is output-equivalent up to 64-bit collisions)
    sql["boilerplate_dedup"] = r"""
        WITH w AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        ch AS (
          SELECT doc_id, i AS pos,
                 array_to_string(list_slice(words, i*10 + 1, i*10 + 10), ' ') AS u
          FROM w, unnest(generate_series(0, (len(words) + 9) // 10 - 1)) AS t(i)
        ),
        el AS (SELECT *, len(trim(u)) >= 1 AS eligible FROM ch),
        boiler AS (
          SELECT u FROM el WHERE eligible GROUP BY u HAVING count(*) >= 3
        ),
        marked AS (
          SELECT el.doc_id, el.pos, el.u,
                 NOT (el.eligible AND boiler.u IS NOT NULL) AS keep
          FROM el LEFT JOIN boiler ON el.u = boiler.u
        )
        SELECT doc_id, count(*)::BIGINT AS n_units,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               md5(COALESCE(string_agg(CASE WHEN keep THEN u END, ' ' ORDER BY pos), '')) AS dedup_fp
        FROM marked GROUP BY doc_id
    """
    # paragraph-mode boilerplate: the same remove-ALL-occurrences rule at
    # the blank-line-run granularity, over the wrapped corpus (shared
    # banner head + copyright tail, ragged '\n \n' second separator)
    sql["boilerplate_paragraph"] = r"""
        WITH wrapped AS (
          SELECT doc_id,
                 'We use cookies to improve your experience' || chr(10) || chr(10)
                 || text || chr(10) || ' ' || chr(10)
                 || 'Copyright 2024 Example Corp - all rights reserved' AS text
          FROM documents
        ),
        ch AS (
          SELECT doc_id, i AS pos, us[i] AS u
          FROM (SELECT doc_id,
                       string_split_regex(text, '\n[ \t\n]*\n') AS us
                FROM wrapped),
               unnest(generate_series(1, len(us))) AS t(i)
        ),
        el AS (SELECT *, len(trim(u)) >= 1 AS eligible FROM ch),
        boiler AS (
          SELECT u FROM el WHERE eligible GROUP BY u HAVING count(*) >= 3
        ),
        marked AS (
          SELECT el.doc_id, el.pos, el.u,
                 NOT (el.eligible AND boiler.u IS NOT NULL) AS keep
          FROM el LEFT JOIN boiler ON el.u = boiler.u
        )
        SELECT doc_id, count(*)::BIGINT AS n_units,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               md5(COALESCE(string_agg(CASE WHEN keep THEN u END,
                                       chr(10) || chr(10) ORDER BY pos), ''))
                 AS dedup_fp
        FROM marked GROUP BY doc_id
    """
    # containment_pairs: the ngram_jaccard replay + per-side containment
    sql["containment_pairs"] = r"""
        WITH w AS (
          SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id, lang,
                 array_to_string(list_slice(words, i, i + 2), ' ') AS shingle
          FROM w, unnest(generate_series(1, greatest(len(words) - 2, 1))) AS t(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(round(i::DOUBLE / sa.sz, 6) AS DECIMAL(18,6))::VARCHAR AS containment_a,
               CAST(round(i::DOUBLE / sb.sz, 6) AS DECIMAL(18,6))::VARCHAR AS containment_b,
               CAST(round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS DECIMAL(18,6))::VARCHAR AS jaccard
        FROM inter
        JOIN sizes sa ON inter.doc_a = sa.doc_id
        JOIN sizes sb ON inter.doc_b = sb.doc_id
        WHERE greatest(round(i::DOUBLE / sa.sz, 6), round(i::DOUBLE / sb.sz, 6)) >= 0.5
    """
    # lsh_recall_report: compose the full md5-mode minhash replay and the
    # exact n-gram truth over the SAME deterministic half-sample
    _mh_smp = _minhash_lsh_oracle_sql(n=5, k=64, bands=16, threshold=0.6).replace(
        "FROM documents", "FROM smp"
    )
    _theo = 1.0 - (1.0 - 0.6 ** 4) ** 16
    sql["lsh_recall_report"] = rf"""
        WITH smp AS (
          SELECT * FROM documents
          WHERE substr(md5(doc_id::VARCHAR || ':lshcal'), 1, 8) <= '80000000'
        ),
        truth AS (
          WITH w AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
            FROM smp
          ),
          tsh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(words, i, i + 4), ' ') AS shingle
            FROM w, unnest(generate_series(1, greatest(len(words) - 4, 1))) AS t(i)
          ),
          sizes AS (SELECT doc_id, count(*) AS sz FROM tsh GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tsh a JOIN tsh b ON a.shingle = b.shingle
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2
          )
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON inter.doc_a = sa.doc_id
          JOIN sizes sb ON inter.doc_b = sb.doc_id
          WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 6) >= 0.6
        ),
        found AS ( {_mh_smp} ),
        matched AS (
          SELECT t.* FROM truth t JOIN found f
            ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
        )
        SELECT
          (SELECT count(*) FROM smp)::BIGINT AS n_sample_docs,
          (SELECT count(*) FROM truth)::BIGINT AS true_pairs,
          (SELECT count(*) FROM matched)::BIGINT AS found_pairs,
          CAST(round(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN NULL
                          ELSE (SELECT count(*) FROM matched)::DOUBLE
                               / (SELECT count(*) FROM truth) END, 6)
               AS DECIMAL(18,6))::VARCHAR AS recall,
          CAST(round({_theo!r}::DOUBLE, 6) AS DECIMAL(18,6))::VARCHAR AS theoretical_recall,
          ((SELECT count(*) FROM truth) > 0) AS sample_ok
    """
    # pq_topk: full PQ replay — md5-sampled anchors, explicit left-assoc
    # L2 folds (matches Spark's aggregate() order), decimal ADC sums
    _l2 = " + ".join(f"(sub[{i}]-cw[{i}])*(sub[{i}]-cw[{i}])" for i in range(1, 9))
    sql["pq_topk"] = rf"""
        WITH rec AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
        ),
        hh AS (
          SELECT vec_id, v,
                 ('0x' || substr(md5(vec_id::VARCHAR || ':pqseed'), 1, 15))::BIGINT AS h
          FROM rec
        ),
        anchors AS (
          SELECT vec_id, v, row_number() OVER (ORDER BY h, vec_id) - 1 AS c
          FROM hh ORDER BY h, vec_id LIMIT 16
        ),
        cb AS (
          SELECT c, j, list_slice(v, j*8 + 1, j*8 + 8) AS cw
          FROM anchors, unnest(generate_series(0, 7)) AS t(j)
        ),
        subs AS (
          SELECT vec_id, j, list_slice(v, j*8 + 1, j*8 + 8) AS sub
          FROM rec, unnest(generate_series(0, 7)) AS t(j)
        ),
        dists AS (
          SELECT vec_id, subs.j AS j, cb.c AS c, {_l2} AS d
          FROM subs JOIN cb ON subs.j = cb.j
        ),
        codes AS (
          SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        lut AS (
          SELECT j, c, CAST(round(d, 6) AS DECIMAL(18,6)) AS cell
          FROM dists WHERE vec_id = 0
        ),
        adc AS (
          SELECT codes.vec_id, sum(cell) AS adc_dist
          FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.c
          WHERE codes.vec_id <> 0
          GROUP BY codes.vec_id
        )
        SELECT vec_id, CAST(adc_dist AS DECIMAL(18,6))::VARCHAR AS adc_dist
        FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    """
    # ivfpq_topk: full IVF-PQ replay — md5 coarse anchors TRAINED by one
    # unrolled Lloyd round (assign to anchors, recenter with the
    # order-independent round-to-6-then-DECIMAL-sum mean — r6 task 8),
    # residual PQ codebooks, per-probed-list ADC; all L2 sums written
    # left-assoc to match Spark's aggregate() fold order
    _l2v = " + ".join(f"(v[{i}]-cv[{i}])*(v[{i}]-cv[{i}])" for i in range(1, 65))
    _l2v0 = " + ".join(f"(v[{i}]-cv0[{i}])*(v[{i}]-cv0[{i}])" for i in range(1, 65))
    _l2q = " + ".join(f"(q[{i}]-cv[{i}])*(q[{i}]-cv[{i}])" for i in range(1, 65))
    _l2s = " + ".join(f"(sub[{i}]-cw[{i}])*(sub[{i}]-cw[{i}])" for i in range(1, 9))
    sql["ivfpq_topk"] = rf"""
        WITH rec AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
        ),
        chh AS (
          SELECT vec_id, v,
                 ('0x' || substr(md5(vec_id::VARCHAR || ':ivfseed'), 1, 15))::BIGINT AS h
          FROM rec
        ),
        cents0 AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cidx, v AS cv0
          FROM (SELECT * FROM chh ORDER BY h, vec_id LIMIT 8)
        ),
        cd0 AS (SELECT vec_id, cidx, {_l2v0} AS d FROM rec, cents0),
        asg0 AS (
          SELECT vec_id, cidx FROM (
            SELECT vec_id, cidx,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cidx) AS rn
            FROM cd0
          ) WHERE rn = 1
        ),
        cm AS (
          SELECT asg0.cidx, t.i,
                 sum(CAST(round(rec.v[t.i], 6) AS DECIMAL(27,6)))::DOUBLE
                   / count(*) AS mx
          FROM asg0 JOIN rec USING (vec_id), unnest(generate_series(1, 64)) t(i)
          GROUP BY asg0.cidx, t.i
        ),
        cents AS (SELECT cidx, list(mx ORDER BY i) AS cv FROM cm GROUP BY cidx),
        cd AS (SELECT vec_id, cidx, {_l2v} AS d FROM rec, cents),
        asg AS (
          SELECT vec_id, cidx AS list_id FROM (
            SELECT vec_id, cidx,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cidx) AS rn
            FROM cd
          ) WHERE rn = 1
        ),
        res AS (
          SELECT rec.vec_id, asg.list_id,
                 list_transform(generate_series(1, 64), i -> rec.v[i] - cents.cv[i]) AS r
          FROM rec JOIN asg USING (vec_id) JOIN cents ON asg.list_id = cents.cidx
        ),
        phh AS (
          SELECT vec_id, r,
                 ('0x' || substr(md5(vec_id::VARCHAR || ':pqseed'), 1, 15))::BIGINT AS h
          FROM res
        ),
        anchors AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS c, r
          FROM (SELECT * FROM phh ORDER BY h, vec_id LIMIT 16)
        ),
        cb AS (
          SELECT c, j, list_slice(r, j*8 + 1, j*8 + 8) AS cw
          FROM anchors, unnest(generate_series(0, 7)) AS t(j)
        ),
        subs AS (
          SELECT vec_id, list_id, j, list_slice(r, j*8 + 1, j*8 + 8) AS sub
          FROM res, unnest(generate_series(0, 7)) AS t(j)
        ),
        dists AS (
          SELECT vec_id, list_id, subs.j AS j, cb.c AS c, {_l2s} AS d
          FROM subs JOIN cb ON subs.j = cb.j
        ),
        codes AS (
          SELECT vec_id, list_id, j, c AS code FROM (
            SELECT vec_id, list_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        qv AS (SELECT v AS q FROM rec WHERE vec_id = 0),
        pd AS (SELECT cidx, cv, {_l2q} AS d FROM cents, qv),
        probes AS (SELECT cidx, cv FROM pd ORDER BY d, cidx LIMIT 2),
        qres AS (
          SELECT cidx AS list_id,
                 list_transform(generate_series(1, 64), i -> q[i] - cv[i]) AS rq
          FROM probes, qv
        ),
        qsubs AS (
          SELECT list_id, j, list_slice(rq, j*8 + 1, j*8 + 8) AS sub
          FROM qres, unnest(generate_series(0, 7)) AS t(j)
        ),
        lut AS (
          SELECT list_id, qsubs.j AS j, cb.c AS c,
                 CAST(round({_l2s.replace('sub[', 'qsubs.sub[')}, 6) AS DECIMAL(18,6)) AS cell
          FROM qsubs JOIN cb ON qsubs.j = cb.j
        ),
        adc AS (
          SELECT codes.vec_id, codes.list_id, sum(cell) AS adc_dist
          FROM codes JOIN lut
            ON codes.list_id = lut.list_id AND codes.j = lut.j AND codes.code = lut.c
          WHERE codes.vec_id <> 0
          GROUP BY codes.vec_id, codes.list_id
        )
        SELECT vec_id, list_id, CAST(adc_dist AS DECIMAL(18,6))::VARCHAR AS adc_dist
        FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    """
    sql["epoch_shuffle"] = """
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY md5(doc_id::VARCHAR || ':epoch:2'), doc_id
               )::BIGINT AS shuffle_rank
        FROM documents
    """
    sql["length_batches"] = """
        WITH ranked AS (
          SELECT doc_id, n_chars::BIGINT AS length,
                 ((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) // 32)::BIGINT AS batch_id
          FROM documents
        )
        SELECT doc_id, length, batch_id,
               max(length) OVER (PARTITION BY batch_id) AS batch_max,
               (max(length) OVER (PARTITION BY batch_id) - length)::BIGINT AS padding
        FROM ranked
    """
    # script_stats: RE2 \p{Script} classes match Java's \p{IsScript}
    def _sfrac(cls: str) -> str:
        return (
            rf"CAST(round((length(text) - length(regexp_replace(text, '[\p{{{cls}}}]', '', 'g')))::DOUBLE"
            rf" / greatest(length(text), 1), 6) AS DECIMAL(18,6))::VARCHAR"
        )

    sql["script_stats"] = rf"""
        SELECT doc_id, length(text)::BIGINT AS n_chars,
               {_sfrac('Latin')} AS latin_frac,
               {_sfrac('Cyrillic')} AS cyrillic_frac,
               {_sfrac('Han')} AS han_frac,
               {_sfrac('Arabic')} AS arabic_frac,
               CAST(round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                    / greatest(length(text), 1), 6) AS DECIMAL(18,6))::VARCHAR AS digit_frac,
               CAST(round((length(text) - length(regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g')))::DOUBLE
                    / greatest(length(text), 1), 6) AS DECIMAL(18,6))::VARCHAR AS space_frac
        FROM documents
    """
    # weighted_sample: exact replay of the Efraimidis-Spirakis keys over
    # the shared md5-uniform family
    sql["weighted_sample"] = r"""
        SELECT doc_id, lang, source, n_chars FROM (
          SELECT doc_id, lang, source, n_chars,
                 pow((('0x' || substr(md5(doc_id::VARCHAR || ':wsample'), 1, 15))::BIGINT + 1)
                       / 1152921504606846976.0,
                     1.0 / n_chars::DOUBLE) AS k
          FROM documents WHERE n_chars > 0
        ) ORDER BY k DESC, doc_id LIMIT 50
    """
    # DSIR: hashed uni+bigram bucket models, 6-decimal log-ratios summed
    # as exact DECIMAL per doc — the full replay of dsir_weights
    _dsir_grams = r"""
          SELECT doc_id, g FROM (
            SELECT doc_id, unnest(list_concat(words,
              CASE WHEN len(words) >= 2
                   THEN list_transform(generate_series(1, len(words) - 1),
                                       i -> words[i] || ' ' || words[i + 1])
                   ELSE [] END)) AS g
            FROM (SELECT doc_id,
                         regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
                  FROM documents {pred})
          ) WHERE len(g) > 0
    """
    _dsir_core = rf"""
        WITH rawb AS (
          SELECT doc_id, ('0x' || substr(md5(g || ':dsir'), 1, 15))::BIGINT % 512 AS b
          FROM ({_dsir_grams.format(pred="")})
        ),
        tgtb AS (
          SELECT doc_id, ('0x' || substr(md5(g || ':dsir'), 1, 15))::BIGINT % 512 AS b
          FROM ({_dsir_grams.format(pred="WHERE source = 'src0'")})
        ),
        cr AS (SELECT b, count(*) AS n FROM rawb GROUP BY b),
        ct AS (SELECT b, count(*) AS n FROM tgtb GROUP BY b),
        tot AS (SELECT (SELECT count(*) FROM rawb) AS tr, (SELECT count(*) FROM tgtb) AS tt),
        ratio AS (
          SELECT coalesce(cr.b, ct.b) AS b,
                 CAST(round(ln((coalesce(ct.n, 0) + 1)::DOUBLE / (tot.tt + 512))
                          - ln((coalesce(cr.n, 0) + 1)::DOUBLE / (tot.tr + 512)), 6)
                      AS DECIMAL(18,6)) AS lr
          FROM cr FULL OUTER JOIN ct ON cr.b = ct.b, tot
        ),
        wts AS (
          SELECT rawb.doc_id, count(*)::BIGINT AS n_grams,
                 CAST(sum(lr) AS DECIMAL(18,6)) AS lw
          FROM rawb JOIN ratio ON rawb.b = ratio.b GROUP BY rawb.doc_id
        )
    """
    # gramless docs (NULL/empty text) pass through with n_grams=0 and the
    # empty-sum log_weight 0 — 'score EVERY raw document'
    _dsir_full = r""",
        filled AS (
          SELECT d.doc_id, coalesce(w.n_grams, 0)::BIGINT AS n_grams,
                 coalesce(w.lw, CAST(0 AS DECIMAL(18,6))) AS lw
          FROM documents d LEFT JOIN wts w ON d.doc_id = w.doc_id
        )
    """
    sql["dsir_weights"] = (
        _dsir_core
        + _dsir_full
        + "SELECT doc_id, n_grams, lw::VARCHAR AS log_weight FROM filled"
    )
    # streaming scorer: per-doc scores are a pure function of
    # (text, model), so the stream replays the identical batch math
    sql["dsir_stream"] = sql["dsir_weights"]
    # r6 crawl tier: the oracle derives the EXPECTED canonical URL from
    # the synthetic generator arithmetic (independent derivation — the
    # Spark side runs the real regex normalizer)
    sql["url_dedup"] = (
        "WITH "
        + _SYNTH_URL_SQL
        + """,
        r AS (
          SELECT doc_id, url_norm, fetch_date,
                 row_number() OVER (PARTITION BY url_norm ORDER BY fetch_date) AS rn
          FROM u
        )
        SELECT doc_id, url_norm, fetch_date FROM r WHERE rn = 1"""
    )
    sql["domain_stats"] = (
        "WITH "
        + _SYNTH_URL_SQL
        + """
        SELECT 'site' || ((doc_id // 2) % 7) || '.com' AS domain,
               count(*)::BIGINT AS n_docs,
               count(DISTINCT url_norm)::BIGINT AS n_urls
        FROM u GROUP BY 1"""
    )
    # r6 media pair core: replay the md5_long fingerprints + planted bit
    # flips (distinct positions, so XOR == SUM of single bits), then the
    # kind-blocked Manku banding — simhash_pairs' SQL shape minus the
    # text fold, plus the two planted controls
    sql["media_pairs"] = f"""
        WITH base AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
        f0 AS (
          SELECT doc_id, k,
                 ('0x' || substr(md5(k::VARCHAR), 1, 15))::BIGINT AS bfp,
                 1 + (k % 5) AS flips
          FROM base
        ),
        mk AS (
          SELECT f0.doc_id,
                 sum(1::BIGINT << ((f0.k * 7 + t.i * 13) % 60))::BIGINT AS mask
          FROM f0, unnest(generate_series(0, f0.flips - 1)) t(i)
          GROUP BY f0.doc_id
        ),
        fpt AS (
          SELECT f0.doc_id AS media_id,
                 CASE WHEN f0.k % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                 CASE WHEN f0.doc_id % 2 = 1 THEN xor(f0.bfp, mk.mask) ELSE f0.bfp END AS fp
          FROM f0 JOIN mk USING (doc_id)
          UNION ALL
          SELECT * FROM (VALUES
            (1000001::BIGINT, 'image', {_PLANT_FP_A}::BIGINT),
            (1000002::BIGINT, 'audio', {_PLANT_FP_A}::BIGINT),
            (1000003::BIGINT, 'image', {_PLANT_FP_B}::BIGINT),
            (1000004::BIGINT, 'image', {_PLANT_FP_B}::BIGINT)) v(media_id, kind, fp)
        ),
        banded AS (
          SELECT media_id, kind, b, (fp >> (16 * b)) & 65535 AS bval
          FROM fpt, unnest(generate_series(0, 3)) t(b)
        ),
        cand AS (
          SELECT DISTINCT a.media_id AS media_a, c.media_id AS media_b
          FROM banded a JOIN banded c
            ON a.kind = c.kind AND a.b = c.b AND a.bval = c.bval
           AND a.media_id < c.media_id
        )
        SELECT cand.media_a, cand.media_b,
               bit_count(xor(fa.fp, fb.fp))::BIGINT AS hamming
        FROM cand JOIN fpt fa ON cand.media_a = fa.media_id
                  JOIN fpt fb ON cand.media_b = fb.media_id
        WHERE bit_count(xor(fa.fp, fb.fp)) <= 3"""
    # r6 WARC ingest: expected rows of the committed byte-deterministic
    # fixture shard as literals (the multimodal oracle pattern: a wrong
    # writer OR parser breaks the match)
    sql["warc_ingest"] = """
        SELECT * FROM (VALUES
          -- crawl2.warc.gz (r10, tools/make_fixture_crawl2.py): the
          -- wire-encoding records — chunked+gzipped HTML and a
          -- latin-1 charset-declared body — so the decode tiers are
          -- live in the hash (a leaked chunk-size line or a U+FFFD'd
          -- accent cannot hash equal)
          ('http://fixture.example.com/chunked', '2024-02-01T00:00:00Z',
           52::BIGINT, '41d6ba5aa312844785239948660feada'),
          ('http://fixture.example.com/latin1', '2024-02-01T00:00:01Z',
           37::BIGINT, '6cac17838bc27aa8b2eda66484f18e8e'),
          ('http://fixture.example.com/page1', '2024-03-01T08:00:00Z',
           207::BIGINT, 'd994dc55ce0215d9282480ef34299962'),
          ('http://fixture.example.com/plain.txt', '2024-03-01T09:00:00Z',
           64::BIGINT, 'b4890e05db03778e0ea8220ab901695a'),
          ('http://fixture.example.com/raw', '2024-03-01T10:00:00Z',
           109::BIGINT, 'b5eaa504b311f1e33d35a4d14dad019b'),
          ('https://www.fixture.example.com/page1?utm_source=feed', '2024-03-02T08:00:00Z',
           194::BIGINT, '0c5a0c49e4b9ee368c3b1018c5cf455e')
        ) t(url, fetch_date, n_chars, text_fp)"""
    # r6 streaming rows: batch-twin oracles. Heavy hitters run far
    # under capacity, so the Misra-Gries final state is EXACT counts
    # (the over-capacity undercount bound stays pytest-pinned in
    # tests/test_streaming.py); embed dedup's deterministic projection
    # is the distinct md5-plane signature set
    sql["stream_heavy_hitters"] = """
        SELECT (('0x' || substr(md5(source || '/' || lang), 1, 15))::BIGINT % 8)::INTEGER AS shard,
               source || '/' || lang AS item,
               count(*)::BIGINT AS count_lb
        FROM documents GROUP BY 1, 2"""
    sql["stream_embed_dedup"] = _stream_embed_sig_oracle_sql(dims=64, bits=16)
    # r6 pipeline wave
    sql["nb_quality"] = r"""
        WITH tk AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
            FROM documents
          ) WHERE len(tok) > 0
        ),
        lab AS (SELECT doc_id, source = 'src0' AS pos FROM documents),
        cnt AS (
          SELECT tok, count(*) AS c_all,
                 sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos
          FROM tk JOIN lab USING (doc_id) GROUP BY tok
        ),
        tot AS (
          SELECT sum(c_pos) AS n_pos, sum(c_all - c_pos) AS n_neg, count(*) AS v
          FROM cnt
        ),
        model AS (
          SELECT tok,
                 ln((c_pos + 1.0) / (n_pos + v))
                 - ln((c_all - c_pos + 1.0) / (n_neg + v)) AS llr
          FROM cnt, tot
        ),
        sc AS (
          SELECT tk.doc_id, count(*) AS n_toks,
                 sum(CAST(round(llr, 6) AS DECIMAL(18,6))) AS score
          FROM tk JOIN model USING (tok) GROUP BY tk.doc_id
        )
        SELECT d.doc_id, COALESCE(n_toks, 0)::BIGINT AS n_toks,
               COALESCE(score, 0)::DECIMAL(18,6)::VARCHAR AS score,
               COALESCE(score, 0) > 0 AS positive
        FROM documents d LEFT JOIN sc USING (doc_id)"""
    sql["novelty"] = r"""
        WITH wds AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+') AS words
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(words, i, i + 2), ' ') AS shingle
          FROM wds, unnest(generate_series(1, greatest(len(words) - 2, 1))) AS t(i)
        ),
        fo AS (SELECT shingle, min(doc_id) AS f FROM sh GROUP BY shingle),
        pd AS (
          SELECT sh.doc_id, count(*) AS n_grams,
                 sum(CASE WHEN sh.doc_id = f THEN 1 ELSE 0 END) AS n_novel
          FROM sh JOIN fo USING (shingle) GROUP BY sh.doc_id
        )
        SELECT d.doc_id,
               COALESCE(n_grams, 0)::BIGINT AS n_grams,
               COALESCE(n_novel, 0)::BIGINT AS n_novel,
               COALESCE(CAST(round(n_novel::DOUBLE / n_grams, 6) AS DECIMAL(18,6)),
                        0)::DECIMAL(18,6)::VARCHAR AS novelty
        FROM documents d LEFT JOIN pd USING (doc_id)"""
    sql["vocab_drift"] = r"""
        WITH tk AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS tok
            FROM documents
          ) WHERE len(tok) > 0
        ),
        lab AS (SELECT doc_id, source = 'src0' AS pos FROM documents),
        ca AS (SELECT tok, count(*) AS c_a FROM tk JOIN lab USING (doc_id) WHERE pos GROUP BY tok),
        cb AS (SELECT tok, count(*) AS c_b FROM tk JOIN lab USING (doc_id) WHERE NOT pos GROUP BY tok),
        u AS (
          SELECT COALESCE(ca.tok, cb.tok) AS token,
                 COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
          FROM ca FULL JOIN cb ON ca.tok = cb.tok
        ),
        tot AS (SELECT sum(c_a) AS n_a, sum(c_b) AS n_b, count(*) AS v FROM u),
        sc AS (
          SELECT token, c_a, c_b,
                 CAST(round(((c_a + 1.0) / (n_a + v))
                      * ln(((c_a + 1.0) / (n_a + v)) / ((c_b + 1.0) / (n_b + v))), 6)
                   AS DECIMAL(18,6)) AS contrib
          FROM u, tot
        )
        SELECT token, c_a::BIGINT AS c_a, c_b::BIGINT AS c_b,
               contrib::VARCHAR AS contrib, rank::INTEGER AS rank
        FROM (SELECT *, row_number() OVER (ORDER BY contrib DESC, token) AS rank FROM sc)
        WHERE rank <= 20"""
    # streaming URL dedup: the deterministic projection is the canonical
    # URL set, derived arithmetically (same independent-derivation oracle
    # as url_dedup)
    sql["stream_url_dedup"] = (
        "WITH " + _SYNTH_URL_SQL + "\n        SELECT DISTINCT url_norm FROM u"
    )
    sql["shard_plan"] = r"""
        WITH d AS (
          SELECT doc_id,
                 (CASE WHEN len(trim(text)) = 0 THEN 0
                       ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END)::BIGINT AS n_tokens,
                 substr(md5(doc_id::VARCHAR || ':shard'), 1, 8) AS h
          FROM documents
        ),
        c AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM d
        )
        SELECT doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens,
               (dense_rank() OVER (ORDER BY (cum_tokens - n_tokens) // 2000)
                - 1)::INTEGER AS shard_id
        FROM c"""
    # calibration: quantile cuts + per-bin observed rates, DOUBLE math
    sql["calibration"] = r"""
        WITH s AS (
          SELECT n_chars::DOUBLE AS v, (source = 'src0')::INT AS y
          FROM documents WHERE n_chars IS NOT NULL
        ),
        e AS (
          SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges
          FROM s
        ),
        b AS (SELECT len(list_filter(edges, x -> v > x)) AS bin, v, y FROM s, e)
        SELECT bin::INTEGER AS bin, count(*) AS n, sum(y)::BIGINT AS n_pos,
               CAST(round(sum(y)::DOUBLE / count(*), 6) AS DECIMAL(18,6))::VARCHAR AS pos_rate,
               CAST(round(avg(v), 6) AS DECIMAL(18,6))::VARCHAR AS mean_score
        FROM b GROUP BY bin"""
    # link_graph: independent-derivation oracle — resolved URLs computed
    # from the synthetic-generator arithmetic, never from the regex
    sql["link_graph"] = r"""
        WITH d AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
        o AS (
          SELECT doc_id, k,
            CASE doc_id % 3
              WHEN 0 THEN 'https://www.site' || (k % 7) || '.com'
              WHEN 1 THEN 'http://site' || (k % 7) || '.com'
              ELSE 'https://site' || (k % 7) || '.com' END AS origin_full,
            CASE WHEN doc_id % 4 = 1 AND doc_id % 5 = 0
                 THEN '/p' || k || '/' ELSE '/' END AS dir
          FROM d
        )
        SELECT doc_id,
               'https://site' || ((k + 1) % 7) || '.com/p' || (k + 1) AS href,
               'https://site' || ((k + 1) % 7) || '.com/p' || (k + 1) AS link_url
        FROM o
        UNION ALL
        SELECT doc_id, '/r/' || (doc_id % 10),
               origin_full || '/r/' || (doc_id % 10)
        FROM o
        UNION ALL
        SELECT doc_id, 'img' || (doc_id % 3) || '.png',
               origin_full || dir || 'img' || (doc_id % 3) || '.png'
        FROM o"""
    # psi_drift: decile cuts via quantile_cont (== F.percentile linear
    # interpolation), bin = count of edges below, Laplace-smoothed
    # (p-q)*ln(p/q) on IEEE doubles of exact integer ratios
    sql["psi_drift"] = r"""
        WITH refv AS (
          SELECT n_chars::DOUBLE AS v FROM documents
          WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
        ),
        curv AS (
          SELECT n_chars::DOUBLE AS v FROM documents
          WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
        ),
        e AS (
          SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges
          FROM refv
        ),
        rb AS (SELECT len(list_filter(edges, x -> v > x)) AS bin FROM refv, e),
        cb AS (SELECT len(list_filter(edges, x -> v > x)) AS bin FROM curv, e),
        bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
        rc AS (SELECT bin, count(*) AS c FROM rb GROUP BY bin),
        cc AS (SELECT bin, count(*) AS c FROM cb GROUP BY bin),
        j AS (
          SELECT bins.bin, coalesce(rc.c, 0)::BIGINT AS n_ref,
                 coalesce(cc.c, 0)::BIGINT AS n_cur
          FROM bins LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)
        ),
        t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j),
        s AS (
          SELECT bin, n_ref, n_cur,
                 (n_ref + 1)::DOUBLE / (tr + 10)::DOUBLE AS p,
                 (n_cur + 1)::DOUBLE / (tc + 10)::DOUBLE AS q
          FROM j, t
        )
        SELECT bin::INTEGER AS bin, n_ref, n_cur,
               CAST(round((p - q) * ln(p / q), 6) AS DECIMAL(18,6))::VARCHAR AS contrib
        FROM s"""
    # cms_tokens: full bit-for-bit replay of the Count-Min sketch — every
    # cell (md5-position family) and every min-over-rows estimate
    sql["cms_tokens"] = r"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS token
          FROM documents
        ),
        t AS (SELECT token FROM toks WHERE len(token) > 0),
        hist AS (SELECT token, count(*) AS n_total FROM t GROUP BY token),
        top AS (
          SELECT token, n_total FROM (
            SELECT token, n_total,
                   row_number() OVER (ORDER BY n_total DESC, token) AS rn
            FROM hist
          ) WHERE rn <= 20
        ),
        ds AS (SELECT unnest(generate_series(0, 3)) AS d),
        -- Kirsch-Mitzenmacher double hash: pos_d = (h1 + d*h2) mod width,
        -- base hashes pre-reduced mod width and the stride forced ODD
        -- (h - h%2 + 1), same as the Spark side
        th AS (
          SELECT token,
                 ('0x' || substr(md5(token || ':cms:a'), 1, 15))::BIGINT % 64 AS h1m,
                 (('0x' || substr(md5(token || ':cms:b'), 1, 15))::BIGINT % 64)
                   - (('0x' || substr(md5(token || ':cms:b'), 1, 15))::BIGINT % 64) % 2
                   + 1 AS h2m
          FROM t
        ),
        cells AS (
          SELECT d, (h1m + d * h2m) % 64 AS pos, count(*) AS c
          FROM th CROSS JOIN ds GROUP BY 1, 2
        ),
        ph AS (
          SELECT token,
                 ('0x' || substr(md5(token || ':cms:a'), 1, 15))::BIGINT % 64 AS h1m,
                 (('0x' || substr(md5(token || ':cms:b'), 1, 15))::BIGINT % 64)
                   - (('0x' || substr(md5(token || ':cms:b'), 1, 15))::BIGINT % 64) % 2
                   + 1 AS h2m
          FROM top
        ),
        probes AS (
          SELECT token, d, (h1m + d * h2m) % 64 AS pos
          FROM ph CROSS JOIN ds
        ),
        est AS (
          SELECT token, min(coalesce(c, 0)) AS est
          FROM probes LEFT JOIN cells USING (d, pos) GROUP BY token
        )
        SELECT top.token, n_total, est FROM top JOIN est USING (token)"""
    # zorder_key: bit-for-bit Morton key replay — same IEEE quantization
    # ((x-mn)/(mx-mn)*65535.0, left-assoc), same shift/mask interleave
    _z_terms = " + ".join(
        f"(((q{j} >> {b}) & 1) << {2 * b + j})" for b in range(16) for j in (0, 1)
    )
    sql["zorder_key"] = f"""
        WITH b AS (
          SELECT min(user_id::DOUBLE) AS mn0, max(user_id::DOUBLE) AS mx0,
                 min("value"::DOUBLE) AS mn1, max("value"::DOUBLE) AS mx1
          FROM events
        ),
        q AS (
          SELECT event_id,
            (CASE WHEN user_id IS NULL OR mn0 IS NULL OR mx0 <= mn0 THEN 0
                  ELSE floor((user_id::DOUBLE - mn0) / (mx0 - mn0) * 65535.0) END)::BIGINT AS q0,
            (CASE WHEN "value" IS NULL OR mn1 IS NULL OR mx1 <= mn1 THEN 0
                  ELSE floor(("value"::DOUBLE - mn1) / (mx1 - mn1) * 65535.0) END)::BIGINT AS q1
          FROM events, b
        )
        SELECT event_id, ({_z_terms})::BIGINT AS zkey FROM q"""
    sql["unimax_mix"] = r"""
        WITH c AS (
          SELECT lang,
                 sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE array_length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+'))
                     END)::BIGINT AS available
          FROM documents GROUP BY lang
        ),
        r AS (
          SELECT lang, available, 2 * available AS cap,
                 row_number() OVER (ORDER BY available, lang) AS rk,
                 sum(2 * available) OVER (ORDER BY available, lang
                                          ROWS UNBOUNDED PRECEDING) AS cume,
                 count(*) OVER () AS n
          FROM c
        ),
        s AS (
          SELECT *, (cap * (n - rk + 1) <= 20000 - (cume - cap)) AS saturated FROM r
        ),
        t AS (
          SELECT sum(CASE WHEN saturated THEN 1 ELSE 0 END) AS t,
                 sum(CASE WHEN saturated THEN cap ELSE 0 END) AS cumet
          FROM s
        )
        SELECT lang, available, cap::BIGINT AS cap,
               CAST(round(CASE WHEN saturated THEN cap::DOUBLE
                               ELSE (20000 - cumet)::DOUBLE / (n - t) END, 6)
                 AS DECIMAL(38,6))::VARCHAR AS alloc,
               saturated
        FROM s, t"""
    sql["domain_quality"] = f"""
        WITH {_QF_CTES},
        qf AS (SELECT doc_id, {_QF_PASSES} AS passes FROM r),
        agg AS (
          SELECT 'site' || ((d.doc_id // 2) % 7) || '.com' AS domain,
                 count(*) AS n_docs,
                 sum(CASE WHEN passes THEN 1 ELSE 0 END) AS n_pass
          FROM documents d JOIN qf USING (doc_id) GROUP BY 1
        )
        SELECT domain, n_docs::BIGINT AS n_docs, n_pass::BIGINT AS n_pass,
               CAST(round(n_pass::DOUBLE / n_docs, 6) AS DECIMAL(18,6))::VARCHAR AS pass_rate,
               (n_docs >= 2 AND CAST(round(n_pass::DOUBLE / n_docs, 6) AS DECIMAL(18,6)) < 0.5)
                 AS blocked
        FROM agg"""
    sql["dsir_sample"] = (
        _dsir_core
        + _dsir_full
        + r"""
        SELECT doc_id, lw::VARCHAR AS log_weight,
               CAST(round(lw::DOUBLE - ln(-ln(
                 (('0x' || substr(md5(doc_id::VARCHAR || ':dsir:gumbel'), 1, 15))::BIGINT + 0.5)
                   / 1152921504606846976.0)), 6) AS DECIMAL(18,6))::VARCHAR AS gumbel_key
        FROM filled
        ORDER BY CAST(round(lw::DOUBLE - ln(-ln(
                 (('0x' || substr(md5(doc_id::VARCHAR || ':dsir:gumbel'), 1, 15))::BIGINT + 0.5)
                   / 1152921504606846976.0)), 6) AS DECIMAL(18,6)) DESC, doc_id
        LIMIT 50
    """
    )
    # BPE merge candidates: pair counts over the word histogram
    sql["bpe_merges"] = r"""
        WITH words AS (
          SELECT w, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+')) AS w
            FROM documents
          ) WHERE len(w) > 0 GROUP BY w
        ),
        syms AS (
          SELECT n,
                 list_concat(list_transform(generate_series(1, len(w)), i -> w[i:i]),
                             ['</w>']) AS s
          FROM words
        ),
        pairs AS (
          SELECT s[i] AS sym_a, s[i + 1] AS sym_b, n
          FROM syms, unnest(generate_series(1, len(s) - 1)) AS t(i)
        ),
        counts AS (SELECT sym_a, sym_b, sum(n)::BIGINT AS n_pairs FROM pairs GROUP BY 1, 2)
        SELECT sym_a, sym_b, n_pairs,
               (row_number() OVER (ORDER BY n_pairs DESC, sym_a, sym_b))::INT AS rank
        FROM counts QUALIFY rank <= 20
    """
    return sql
