"""Grouped distribution statistics.

Exact percentiles (``F.percentile``, linear interpolation — the same
definition as ANSI ``percentile_cont`` / DuckDB ``quantile_cont``, so
oracles match bit-for-bit before rounding) and the approximate scale
path (``percentile_approx``, a bounded-memory KLL-style sketch that
merges associatively across partitions).

Scale note: exact grouped percentiles buffer each group's values in the
aggregation — fine for bounded groups (event types, labels), wrong for
100 TB high-cardinality values per group. At that scale call with
``exact=False``; the sketch is one map-side-combined shuffle with O(1/ε)
state per group regardless of input size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95),
    exact: bool = True,
) -> DataFrame:
    """Per group: row count, mean, and one column per requested percentile
    (``p50``-style names). Values rounded to DECIMAL(18,6) so results are
    engine-portable."""

    def _name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}"

    fn = F.percentile if exact else (lambda c, p: F.percentile_approx(c, p, 10_000))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(value_col), 6).cast("decimal(18,6)").alias("mean"),
        *[
            F.round(fn(F.col(value_col), F.lit(p)), 6)
            .cast("decimal(18,6)")
            .alias(_name(p))
            for p in percentiles
        ],
    ]
    return df.groupBy(group_col).agg(*aggs)


def grouped_distinct_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
    exact: bool = True,
) -> DataFrame:
    """Per group: distinct-value count, exact and/or HyperLogLog++
    approximate.

    The scale story mirrors ``grouped_percentiles``: exact
    ``count(DISTINCT)`` shuffles every distinct (group, value) pair —
    fine until value cardinality per group is huge; the HLL++ sketch
    (``approx_count_distinct``) is fixed-size per group, merges
    associatively map-side, and is what you run at 100 TB. Both columns
    are returned when ``exact=True`` so callers can calibrate; HLL++ is
    deterministic (fixed xxhash64 seed, no sampling), so results are
    stable run-to-run and testable.
    """
    aggs = [F.approx_count_distinct(value_col, rsd=rsd).alias("n_distinct_approx")]
    if exact:
        aggs.insert(0, F.countDistinct(value_col).alias("n_distinct"))
    return df.groupBy(group_col).agg(*aggs)


def percentile_band_filter(
    df: DataFrame,
    metric_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Winsorizing outlier gate: keep rows whose ``metric_col`` lies
    inside the corpus's [lo, hi] percentile band — the standard curation
    step for dropping pathological lengths/scores without hand-tuned
    absolute thresholds (thresholds that are wrong again after the next
    crawl shifts the distribution).

    Exact interpolated percentiles (ANSI ``percentile_cont`` semantics,
    identical interpolation formula in DuckDB's ``quantile_cont``) so
    the gate is oracle-checkable; at 100 TB swap in
    ``approx_percentile`` for a fixed-memory sketch — the operator shape
    (1-row aggregate re-entering as a broadcast) is unchanged. Returns
    the input rows with ``p_lo``/``p_hi`` bound columns attached.
    """
    bounds = df.agg(
        F.expr(f"percentile({metric_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({metric_col}, {hi})").alias("p_hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(F.col(metric_col).between(F.col("p_lo"), F.col("p_hi")))
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """The ANALYZE-style data profile, long format: per column its null
    count, exact distinct count, and min/max (string-rendered) — the
    first query run against any unfamiliar table, and the freshness/
    sanity check a pipeline owner schedules after every load.

    One pass per column batched into a single wide aggregate (Catalyst
    partial-aggregates every branch map-side; the exchange carries one
    row per partition), then unpivoted to long format driver-side-free.
    Exact countDistinct keeps it oracle-checkable — swap
    approx_count_distinct at 100 TB where the ±2% sketch is the right
    trade (same plan shape, fixed memory)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack}) AS (col, n_nulls, n_distinct, min_v, max_v)",
    ).select("col", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity check: child rows whose key has no parent —
    the other standing data-quality query. One left_anti join (broadcast
    when the parent is a dimension); NULL keys are excluded (SQL FK
    semantics: NULL references nothing and violates nothing). Returns
    the violating child rows unmodified."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def correlation_matrix(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation over numeric columns — the
    feature-redundancy screen run before any modeling / mixing-weight
    work — in ONE partial-aggregated pass. The only data-sized exchange
    is the small-file-input spread (projected to the selected columns);
    the aggregate itself ships one row per partition.

    Determinism contract: every input rounds to 6 decimals and casts to
    DECIMAL(18,6); all co-moment sums (Σx, Σx², Σxy) run as EXACT
    decimal addition — order-independent, so the closed-form
    corr = (nΣxy − ΣxΣy) / √(nΣx² − (Σx)²) / √(nΣy² − (Σy)²)
    computed from those sums is a pure function of the data and
    replays bit-for-bit in SQL. Rows with a NULL in ANY of ``columns``
    are excluded (listwise deletion) so one co-moment pass serves every
    pair; corr is NULL for a zero-variance column (SQL NULL division).

    Returns (col_a, col_b, corr DECIMAL(18,6)), col_a < col_b
    lexicographically."""
    from hgraphstorage_spark.pipeline.text import _parallel

    cols = list(columns)
    # single-file scans arrive as ONE partition and would run every
    # decimal co-moment on one core (measured 7 s -> sub-second at
    # sf0.1); spread before the CPU-heavy aggregate
    clean = _parallel(df.select(*cols)).dropna(subset=cols)
    dec = lambda c: F.round(F.col(c).cast("double"), 6).cast("decimal(18,6)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(dec(c)).alias(f"_s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.sum((dec(a) * dec(b)).cast("decimal(38,12)")).alias(f"_p_{a}_{b}"))
    wide = clean.agg(*aggs)

    def corr_expr(a: str, b: str) -> F.Column:
        n = F.col("_n").cast("double")
        sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
        saa = F.col(f"_p_{a}_{a}").cast("double")
        sbb = F.col(f"_p_{b}_{b}").cast("double")
        sab = F.col(f"_p_{a}_{b}").cast("double")
        num = n * sab - sa * sb
        den = F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        return F.round(num / F.nullif(den, F.lit(0.0)), 6).cast("decimal(18,6)")

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    rows = F.array(
        *[
            F.struct(
                F.lit(min(a, b)).alias("col_a"),
                F.lit(max(a, b)).alias("col_b"),
                corr_expr(a, b).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select("_r.col_a", "_r.col_b", "_r.corr")


def numeric_histogram(df: DataFrame, column: str, n_bins: int = 10) -> DataFrame:
    """Equi-width histogram of a numeric column: a 1-row min/max
    aggregate broadcast back onto the scan, then one bin-keyed count —
    two narrow passes, n_bins output rows, the distribution sketch every
    profiling dashboard draws.

    bin = 1 + floor((x − lo) · n_bins / (hi − lo)) clamped into
    [1, n_bins] (the max value lands in the last bin, the ANSI
    width_bucket interior convention); a constant column puts every row
    in bin 1. NULLs are excluded. Bin edges are pure double arithmetic
    from (lo, hi) — identical IEEE ops in any engine, so the layout is
    SQL-replayable. Returns (bin, lo_edge, hi_edge, n) for non-empty
    bins."""
    x = F.col(column).cast("double")
    bounds = df.filter(x.isNotNull()).agg(
        F.min(x).alias("_lo"), F.max(x).alias("_hi")
    )
    binned = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("_hi") == F.col("_lo"), F.lit(1))
            .otherwise(
                F.least(
                    F.lit(n_bins),
                    (F.floor((x - F.col("_lo")) * n_bins / (F.col("_hi") - F.col("_lo"))) + 1).cast("int"),
                )
            )
            .alias("bin"),
            "_lo",
            "_hi",
        )
    )
    w = (F.col("_hi") - F.col("_lo")) / n_bins
    return (
        binned.groupBy("bin", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.col("_lo") + (F.col("bin") - 1) * w, 6).alias("lo_edge"),
            F.round(F.col("_lo") + F.col("bin") * w, 6).alias("hi_edge"),
            "n",
        )
    )


def count_min_sketch(
    df: DataFrame, item_col: str, width: int = 8192, depth: int = 4
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of an item stream
    as a DataFrame of non-zero cells (d, pos, c) — the fixed-memory
    frequency sketch completing the mergeable family next to HLL
    (``grouped_distinct_counts``), Bloom (``bloom_decontaminate``) and
    Misra-Gries (``stream_heavy_hitters``). Each item increments one
    cell per row d at ``md5_long(item, d) % width`` — the engine-portable
    md5 position family, so a SQL oracle replays every cell bit-for-bit.

    Row hashes use Kirsch-Mitzenmacher double hashing (pos_d = (h1 +
    d·h2) mod width from TWO md5s per item, h2 forced ODD so the stride
    is coprime with the power-of-two width — without it, h2 ≡ 0 would
    collapse all depth rows onto one cell and same-(h1,h2) pairs would
    collide in every row) — the K-M 2006 scheme that asymptotically
    preserves the sketch guarantees while hashing each item twice
    instead of ``depth`` times, and — just as important at scale — the
    explode carries two small integers instead of the item string.

    Shape at scale: explode is depth small integers per item; the cell
    aggregation is map-side combined, so the shuffle carries at most
    ``depth × width`` rows per partition no matter the corpus — the
    sketch's whole point. Merge two sketches by unioning cells and
    summing counts (:func:`cms_merge`); estimates are one-sided
    (est ≥ true count; overshoot ≤ e·N/width with prob 1 − e^(−depth)).

    ``width`` must be a power of two: the Kirsch-Mitzenmacher stride is
    forced odd, which guarantees coprimality (distinct depth cells per
    item) only for power-of-two widths — for an odd width the edge value
    h2 = width−1 is even, maps to width ≡ 0 (mod width), and collapses
    every depth row of that item onto one cell.
    """
    _require_pow2_width(width)
    return (
        df.select(F.col(item_col).alias("_it"))
        .filter(F.col("_it").isNotNull())
        .select(*_cms_base_hashes(F.col("_it"), width))
        .select(
            "h1m",
            "h2m",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        )
        .select("d", _cms_pos(width).alias("pos"))
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _require_pow2_width(width: int) -> None:
    """The K-M odd-stride trick is only a coprimality proof for
    power-of-two widths (ADVICE r6); reject anything else up front
    rather than silently degrading accuracy."""
    if width < 2 or width & (width - 1):
        raise ValueError(f"width must be a power of two >= 2, got {width}")


def _cms_base_hashes(item: "F.Column", width: int):
    """The two Kirsch-Mitzenmacher base hashes, pre-reduced mod width so
    the downstream arithmetic can never overflow a BIGINT; the stride
    hash is forced odd (h - h%2 + 1) so it is coprime with any
    power-of-two width."""
    from hgraphstorage_spark.pipeline.dedup import md5_long

    h2 = F.pmod(md5_long(item, F.lit("cms:b")), F.lit(width))
    return (
        F.pmod(md5_long(item, F.lit("cms:a")), F.lit(width)).alias("h1m"),
        (h2 - F.pmod(h2, F.lit(2)) + F.lit(1)).alias("h2m"),
    )


def _cms_pos(width: int) -> "F.Column":
    return F.pmod(F.col("h1m") + F.col("d") * F.col("h2m"), F.lit(width))


def hll_sketch(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = (), p: int = 8
) -> DataFrame:
    """HyperLogLog register sketch (Flajolet et al. 2007) of a value
    stream as a DataFrame of non-zero registers (group..., bucket, reg)
    — the mergeable distinct-count sketch next to Count-Min
    (:func:`count_min_sketch`). Unlike ``approx_count_distinct`` (whose
    HLL++ binary sketch never leaves the JVM), these registers are an
    ordinary DataFrame: persistable, mergeable across shards/days with
    :func:`hll_merge`, and — because the hash is the engine-portable
    ``md5_long`` — a SQL oracle replays every register bit-for-bit.

    bucket = h mod 2^p (low p bits of the 60-bit hash); rho = leading-
    zero count of the remaining 60-p bits + 1, computed as
    ``(60-p) + 1 - length(bin(rest))`` (``bin`` renders minimal binary
    identically on both engines); reg = max(rho) per bucket.

    Shape at scale: one narrow hash projection, then a groupBy whose
    map-side partial agg bounds the shuffle at 2^p rows per partition
    per group no matter the corpus — the sketch's whole point. Standard
    error ≈ 1.04/sqrt(2^p) (p=8 → ~6.5%).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    from hgraphstorage_spark.pipeline.dedup import md5_long

    gs = list(group_cols)
    width = 60 - p
    h = md5_long(F.col(value_col))
    rest = F.shiftrightunsigned(h, p)
    rho = (
        F.when(rest == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*gs, F.pmod(h, F.lit(1 << p)).alias("bucket"), rho.alias("rho"))
        .groupBy(*gs, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Register-wise max of two HLL sketches built with the SAME p —
    the associative merge: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    EXACTLY (tested as a law), so per-shard sketches roll up into a
    corpus count without touching raw data."""
    gs = list(group_cols)
    return a.unionByName(b).groupBy(*gs, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    sketch: DataFrame, group_cols: Sequence[str] = (), p: int = 8
) -> DataFrame:
    """Distinct-count estimate from HLL registers: the classic Flajolet
    estimator alpha_m·m²/Σ2^(−reg) with the linear-counting small-range
    correction (raw ≤ 2.5m and empty buckets exist → m·ln(m/V)).

    Engine-exact: Σ folds the EXACT powers of two in bucket order from
    0.0, then adds the zero-bucket mass (V·1.0) once — a canonical IEEE
    sequence a DuckDB ``list_reduce`` replays bit-for-bit; the estimate
    is rounded DECIMAL(18,4). Returns (group..., n_zero_registers,
    n_distinct_est).

    INVARIANT: ``p`` must equal the ``p`` the sketch was built with
    (like :func:`cms_merge`'s SAME-(width,depth) contract) — the
    register frame carries no p metadata, and a mismatch corrupts m in
    alpha, the m² numerator, and the zero-register count. The plan
    raises when the sketch's bucket range proves a LARGER build-p
    (max bucket ≥ 2^p); a smaller build-p is undetectable from bucket
    values alone — the caller owns that direction."""
    m = 1 << p
    gs = list(group_cols)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # oracle replays the same DOUBLE ops
    agg = sketch.groupBy(*gs).agg(
        F.max("bucket").alias("_maxb"),
        F.count(F.lit(1)).alias("n_nonzero"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "reg"))),
                lambda s: F.pow(F.lit(2.0), -s["reg"].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s_nonzero"),
    )
    v = F.lit(m) - F.col("n_nonzero")
    s = v.cast("double") + F.col("s_nonzero")
    raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    # the guard must gate EVERY output column — attached to only one,
    # Catalyst column pruning deletes the raise_error when a caller
    # selects just the other (r7 review catch, execution-confirmed: a
    # p-mismatched select('n_distinct_est') returned a negative count
    # silently)
    def _checked(col, dtype):
        return (
            F.when(
                F.col("_maxb") >= F.lit(m),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"hll_estimate: sketch has bucket >= 2^p={m} (max bucket "
                        ),
                        F.col("_maxb").cast("string"),
                        F.lit(
                            f") — the sketch was built with a larger p than the p={p} passed"
                        ),
                    )
                ).cast(dtype),
            )
            .otherwise(col)
        )

    return agg.select(
        *gs,
        _checked(v.cast("long"), "long").alias("n_zero_registers"),
        _checked(F.round(est, 4).cast("decimal(18,4)"), "decimal(18,4)").alias(
            "n_distinct_est"
        ),
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two Count-Min sketches built with the SAME
    (width, depth) — the associative merge that lets per-shard / per-day
    sketches combine into a corpus sketch without touching raw data."""
    return a.unionByName(b).groupBy("d", "pos").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, width: int, depth: int
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each probe
    item, min over the depth rows of its cell counts (absent cell = 0).
    Positions come from the same Kirsch-Mitzenmacher double hash as
    :func:`count_min_sketch`. The sketch side is bounded by depth ×
    width cells, so it broadcasts; the probe join never shuffles the
    item stream. ``width``/``depth`` must match the sketch's build
    parameters; width is validated power-of-two like the build side."""
    _require_pow2_width(width)
    probes = (
        items.select(F.col(item_col))
        .distinct()
        .select(item_col, *_cms_base_hashes(F.col(item_col), width))
        .select(
            item_col,
            "h1m",
            "h2m",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        )
        .select(item_col, "d", _cms_pos(width).alias("pos"))
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "pos"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
    k: int = 1024,
    salt: str = "qsk",
) -> DataFrame:
    """Deterministic bottom-k quantile register sketch — the mergeable
    quantile summary completing the plain-DataFrame sketch family next
    to HLL (:func:`hll_sketch`) and Count-Min (:func:`count_min_sketch`),
    and the engine-portable alternative to ``percentile_approx``'s
    JVM-bound KLL binary (VERDICT r6 task 8).

    Registers are the ``k`` rows per group with the smallest
    ``md5_long(id, salt)`` — a coordinated uniform hash-sample of ROWS
    (sampling by row identity, not value, so duplicate values keep their
    multiplicity and quantiles are unbiased). Returns (group..., hkey,
    value DOUBLE); the hkey column stays in the register so merges
    re-rank exactly.

    Why bottom-k instead of a real KLL compactor hierarchy: KLL's
    random compaction makes merge(sketch(A), sketch(B)) ≠ sketch(A++B)
    (the result depends on arrival grouping) and is not replayable in
    SQL. Deterministic bottom-k trades KLL's O((1/ε)·log log n) space
    for three properties this engine's sketch family is built on:
    EXACT mergeability — merge(sketch(A), sketch(B)) == sketch(A ++ B)
    bit-for-bit whenever ids are globally distinct (tested as a law,
    like hll_merge/cms_merge) — determinism (a pure function of the
    data), and a DuckDB oracle that replays every register. Rank error
    is the uniform-sample bound O(1/sqrt(k)) (k=1024 → ~1.5 points of
    rank at 95% confidence).

    Shape at scale: the rank filter plans as WindowGroupLimit — every
    task prunes to its own bottom-k BEFORE the per-group shuffle, so
    the exchange carries at most k rows per task per group no matter
    the corpus (the sketch's whole point); nothing corpus-sized sorts
    on one partition."""
    from pyspark.sql import Window

    from hgraphstorage_spark.pipeline.dedup import md5_long

    gs = list(group_cols)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *gs,
        md5_long(F.col(id_col), F.lit(salt)).alias("hkey"),
        F.col(value_col).cast("double").alias("value"),
    )
    w = Window.partitionBy(*gs).orderBy("hkey", "value")
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantile_sketch_merge(
    a: DataFrame,
    b: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = 1024,
    dedup: bool = False,
) -> DataFrame:
    """Bottom-k of the union of two registers built with the SAME
    (id space, salt, k) — the associative merge: whenever ids are
    globally distinct across inputs, merge(sketch(A), sketch(B)) ==
    sketch(A ++ B) EXACTLY (tested as a law), so per-shard / per-day
    registers roll up without touching raw data.

    ``dedup=True`` collapses identical register rows before the re-rank
    — the at-least-once absorber the STREAMING consumer needs (a
    replayed batch re-contributes byte-identical rows, which must not
    displace genuine ones). Kept here so the tie-break ordering lives
    in ONE place (r7 review: an inline copy in the stream would
    silently diverge if this ordering ever changed)."""
    from pyspark.sql import Window

    gs = list(group_cols)
    u = a.unionByName(b)
    if dedup:
        u = u.distinct()
    w = Window.partitionBy(*gs).orderBy("hkey", "value")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantile_sketch_estimate(
    sketch: DataFrame,
    percentiles: Sequence[float] = (0.5, 0.95),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates from bottom-k registers: exact linear-
    interpolation percentiles (``F.percentile`` == ANSI
    ``percentile_cont`` == DuckDB ``quantile_cont``, bit-identical
    before rounding) of the register sample. Returns (group...,
    n_register, p50-style columns DECIMAL(18,6))."""

    def _name(p: float) -> str:
        return "p" + f"{p * 100:g}".replace(".", "_")

    gs = list(group_cols)
    return sketch.groupBy(*gs).agg(
        F.count(F.lit(1)).alias("n_register"),
        *[
            F.round(F.percentile(F.col("value"), F.lit(p)), 6)
            .cast("decimal(18,6)")
            .alias(_name(p))
            for p in percentiles
        ],
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    exact: bool = True,
) -> DataFrame:
    """Population Stability Index between a reference and a current slice
    of a numeric feature — the standard drift monitor a pipeline runs on
    quality scores / length distributions before mixing a new crawl dump
    in (vocab_drift's numeric sibling: that one is token-KL, this one is
    binned-distribution PSI). Bins are the reference's ``n_bins``
    quantile cuts (the industry convention — equal-population bins on
    ref, so drift shows as cur piling into few bins); counts are
    Laplace-smoothed (+1 per bin) so empty bins never yield ln(0), and
    contrib_i = (p_i − q_i)·ln(p_i/q_i) with Σ contrib = PSI
    (rule of thumb: < 0.1 stable, > 0.25 drifted).

    Returns one row per bin: (bin, n_ref, n_cur, contrib DECIMAL(18,6)).

    Shape at scale: one percentile aggregate on ref for the bin edges
    (``exact=False`` swaps in the mergeable KLL sketch for 100 TB — same
    switch as ``grouped_percentiles``), a 1-row edges broadcast, one
    narrow bin-assignment fold (``F.aggregate`` over the ≤ n_bins−1
    edges), two n_bins-row count aggs (map-side combined), a 1-row
    totals broadcast. ln on IEEE doubles of exact integer ratios — the
    engine-identical float recipe unigram_logprob already pins."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    pct = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else ", 10000"
    edges = ref.filter(F.col(value_col).isNotNull()).agg(
        F.expr(
            f"{fn}(cast({value_col} as double), array({pct}){extra})"
        ).alias("_edges")
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        return (
            df.filter(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(edges))
            .select(
                F.aggregate(
                    "_edges", F.lit(0), lambda acc, e: acc + (v > e).cast("int")
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    # edges (1 row) feeds both binned() passes and j (n_bins rows) feeds
    # the totals AND the final projection — unpersisted, the ref-side
    # percentile and both count pipelines replayed per reference (eight
    # source scans measured in the r12 sweep); two tiny persists leave
    # one scan per input slice
    from hgraphstorage_spark.pipeline.state import track

    edges = track(edges)
    bins = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    j = track(
        bins.join(binned(ref, "_nr"), "bin", "left")
        .join(binned(cur, "_nc"), "bin", "left")
        .select(
            "bin",
            F.coalesce("_nr", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("_nc", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    totals = j.agg(F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc"))
    p = (F.col("n_ref") + 1.0) / (F.col("_tr") + F.lit(float(n_bins)))
    q = (F.col("n_cur") + 1.0) / (F.col("_tc") + F.lit(float(n_bins)))
    return j.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)").alias("contrib"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a ranking/quality score against a binary
    label — the eval-harness step a quality classifier
    (``text.nb_quality_score``-style) runs before its threshold is
    trusted: quantile-bin the scores (equal-population bins, same cut
    machinery as :func:`psi_report`), report each bin's size, positive
    count, observed positive rate, and mean score. A well-ranked score
    shows pos_rate monotone in bin; a flat diagram means the score
    carries no signal at that granularity.

    Returns (bin, n, n_pos, pos_rate DECIMAL(18,6),
    mean_score DECIMAL(18,6)); bins with no rows are omitted (quantile
    cuts make them rare — only massive ties collapse bins).

    Shape at scale: one percentile aggregate for the cuts, a 1-row
    edges broadcast, one narrow bin-assignment fold, one n_bins-row
    agg (map-side combined). Labels cast via boolean→int so any
    boolean/0-1 column works."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    pct = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    edges = df.filter(F.col(score_col).isNotNull()).agg(
        F.expr(f"percentile(cast({score_col} as double), array({pct}))").alias("_e")
    )
    v = F.col(score_col).cast("double")
    return (
        df.filter(F.col(score_col).isNotNull())
        .crossJoin(F.broadcast(edges))
        .select(
            F.aggregate("_e", F.lit(0), lambda acc, e: acc + (v > e).cast("int")).alias(
                "bin"
            ),
            v.alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.round(F.sum("_y") / F.count(F.lit(1)), 6)
            .cast("decimal(18,6)")
            .alias("pos_rate"),
            F.round(F.avg("_s"), 6).cast("decimal(18,6)").alias("mean_score"),
        )
    )


def quantile_histogram(
    df: DataFrame, column: str, n_bins: int = 10, id_col: str = "event_id"
) -> DataFrame:
    """Equi-DEPTH histogram: bins hold (near-)equal row counts and the
    edges report where the quantile cuts fall — the complement of
    :func:`numeric_histogram`'s equi-width layout (equi-width shows
    shape, equi-depth shows quantiles and survives heavy tails). The
    optimizer-statistics form of a histogram (Postgres/ORCA equi-depth).

    bin = 1 + floor((rank−1)·n_bins / N) over the total order
    (value, id) — the id tie-break makes the layout deterministic, so
    equal values may straddle a bin edge (rank-based, by design). NULLs
    are excluded. Returns (bin, lo, hi, n) — lo/hi are element
    SELECTIONS (min/max of the bin), not computed values, so no
    rounding is needed for cross-engine parity.

    Scale shape: the rank is the distributed two-pass
    ``_global_rank`` (range partition + local rank + broadcast offsets
    — never a single-partition window over data); N is a 1-row
    broadcast; the bin aggregate is map-side partial."""
    from hgraphstorage_spark.pipeline.sampling import _global_rank

    x = F.col(column).cast("double")
    base = df.filter(x.isNotNull()).select(F.col(id_col).alias("_id"), x.alias("_x"))
    ranked = _global_rank(base, [F.col("_x"), F.col("_id")], "_rn")
    total = base.agg(F.count(F.lit(1)).alias("_N"))
    binned = ranked.crossJoin(F.broadcast(total)).select(
        "_x",
        (F.floor((F.col("_rn") - 1) * n_bins / F.col("_N")) + 1).cast("int").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.min("_x").alias("lo"), F.max("_x").alias("hi"), F.count(F.lit(1)).alias("n")
    )
