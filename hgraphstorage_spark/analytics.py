"""Graph analytics over a snapshot: degrees, connected components, PageRank,
multi-hop BFS — the GraphX/Pregel-style layer (SURVEY.md §7 M5).

The reference has no analytics surface (it is an OLTP traversal engine);
these are the north-star extension. Implemented as DataFrame-Pregel loops
rather than the graphframes package (not available in this container) —
the same iterated-join shape GraphX lowers to, with lineage control:

- every iteration ends in ``localCheckpoint`` to truncate lineage
  (SURVEY.md §7 "Pregel lineage blowup");
- frontier joins broadcast when the frontier is small (BFS);
- convergence checks are one tiny aggregate per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgraphstorage_spark.snapshot import GraphSnapshot


def degrees(snap: GraphSnapshot) -> DataFrame:
    """(id, label, out_deg, in_deg, deg) per node. Two partial-aggregated
    shuffles on edge endpoints + one join; isolated nodes report 0."""
    out_deg = snap.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_deg"))
    in_deg = snap.edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        snap.nodes.join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .select(
            "id",
            "label",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias("deg"),
        )
    )


def connected_components(snap: GraphSnapshot, max_iter: int = 50) -> DataFrame:
    """Undirected connected components by iterative min-id propagation
    (the classic Pregel formulation; HashMin). Returns (id, component)
    where component = min node id in the component.

    Each round: component ← min(component, min over neighbors' components).
    Converges in O(diameter) rounds; each round is two shuffles (join +
    agg). ``localCheckpoint`` truncates the growing plan per round.
    """
    # undirected neighbor list via both edge directions
    nbrs = snap.edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        snap.edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    comp = snap.nodes.select("id", F.col("id").alias("component")).localCheckpoint()
    for _ in range(max_iter):
        # neighbor minimum per node
        nbr_min = (
            nbrs.join(comp.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            comp.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_component", F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("new_component") < F.col("component")).limit(1).count()
        comp = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return comp


def connected_components_alternating(snap: GraphSnapshot, max_iter: int = 30) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the 100 TB path: converges in O(log n) rounds regardless of
    graph diameter, vs HashMin's O(diameter), and the edge set *shrinks*
    toward stars as it runs (later rounds shuffle less data).

    large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u});
    small-star: with edges oriented large→small, every neighbor (and u)
    links to the minimum. Fixpoint = star forests; component id = root.
    Returns (id, component), identical to `connected_components` output.
    """
    edges = (
        snap.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = snap.nodes.select("id").localCheckpoint()

    def dedup(e: DataFrame) -> DataFrame:
        return e.filter(F.col("u") != F.col("v")).distinct()

    def large_star(e: DataFrame) -> DataFrame:
        und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = und.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return dedup(
            und.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient each edge from the larger endpoint to the smaller
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        linked = d.join(m, "u")
        return dedup(
            linked.select(F.col("v").alias("u"), F.col("m").alias("v")).unionAll(
                m.select(F.col("u"), F.col("m").alias("v"))
            )
        )

    def fingerprint(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # overflow-free under ANSI
        ).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        cur = fingerprint(edges)
        if cur == prev:
            break
        prev = cur

    # at fixpoint each non-root points at its component root; roots and
    # isolated nodes map to themselves
    assign = edges.groupBy("u").agg(F.min("v").alias("component"))
    return nodes.join(assign.withColumnRenamed("u", "id"), "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def pagerank(
    snap: GraphSnapshot, alpha: float = 0.85, iterations: int = 10, dangling: bool = True
) -> DataFrame:
    """PageRank with fixed iteration count (deterministic). Returns
    (id, rank DOUBLE), ranks summing to ~1.

    Per iteration: contributions shuffle on dst + one aggregate for the
    dangling mass. Out-degrees are computed once and cached; lineage is
    truncated per iteration.
    """
    nodes = snap.nodes.select("id").localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    edges = snap.edges.select("src", "dst")
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_deg"))
    # (src, dst, out_deg) resolved once
    links = edges.join(out_deg.withColumnRenamed("id", "src"), "src").localCheckpoint()

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            links.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        if dangling:
            dangling_mass = (
                ranks.join(out_deg, "id", "left_anti").agg(F.sum("rank").alias("m")).collect()[0]["m"]
                or 0.0
            )
        else:
            dangling_mass = 0.0
        base = (1.0 - alpha) / n + alpha * dangling_mass / n
        ranks = (
            nodes.join(contribs, "id", "left")
            .select("id", (F.lit(base) + F.lit(alpha) * F.coalesce("in_mass", F.lit(0.0))).alias("rank"))
            .localCheckpoint()
        )
    return ranks


def pregel(
    snap: GraphSnapshot,
    initial,
    message,
    aggregate,
    update,
    max_iter: int = 20,
    directed: bool = True,
    check_convergence: bool = True,
) -> DataFrame:
    """Generic DataFrame-Pregel (the GraphX ``Pregel`` operator shape,
    re-expressed over (nodes, edges) DataFrames).

    - ``initial(nodes) -> Column``: initial vertex state
    - ``message(state_col) -> Column``: message sent along each edge from
      the source's state (directed) — evaluated against the joined
      (edge ⋈ src-state) row
    - ``aggregate(msg_col) -> Column``: aggregate expression combining
      inbound messages per vertex (e.g. ``F.min``, ``F.sum``)
    - ``update(old_col, agg_col) -> Column``: new state from old state +
      aggregated message (agg is NULL when no messages arrived)

    Each superstep = one join + one aggregate + one state join, with
    ``localCheckpoint`` truncating lineage. Convergence = no state changed
    (one tiny count per superstep; disable for fixed-iteration algorithms).
    Returns (id, state).
    """
    edges = snap.edges.select("src", "dst")
    if not directed:
        edges = edges.unionAll(snap.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    state = snap.nodes.select("id", initial(snap.nodes).alias("state")).localCheckpoint()
    for _ in range(max_iter):
        msgs = (
            edges.join(state.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), message(F.col("state")).alias("msg"))
            .groupBy("id")
            .agg(aggregate(F.col("msg")).alias("agg_msg"))
        )
        new_state = (
            state.join(msgs, "id", "left")
            .select("id", F.col("state").alias("old"), update(F.col("state"), F.col("agg_msg")).alias("state"))
            .localCheckpoint()
        )
        if check_convergence:
            changed = new_state.filter(~F.col("state").eqNullSafe(F.col("old"))).limit(1).count()
            state = new_state.select("id", "state")
            if changed == 0:
                break
        else:
            state = new_state.select("id", "state")
    return state


def bfs(snap: GraphSnapshot, source_id: int, max_hops: int = 10, labels: tuple = ()) -> DataFrame:
    """Multi-hop BFS: (id, hops) for nodes reachable from source within
    max_hops along (optionally label-filtered) out-edges. Iterated frontier
    joins with broadcast frontier (SURVEY.md §4 heuristic)."""
    edges = snap.edges
    if labels:
        edges = edges.filter(F.col("label").isin(list(labels)))
    edges = edges.select("src", "dst")
    spark = snap.nodes.sparkSession
    visited = spark.createDataFrame([(source_id, 0)], "id long, hops int").localCheckpoint()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            F.broadcast(frontier.select(F.col("id").alias("src")))
            .join(edges, "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .select("id", F.lit(hop).alias("hops"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited
