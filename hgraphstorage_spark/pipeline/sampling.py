"""Deterministic hash-based sampling / dataset splitting.

Train/val/test assignment must be (a) stable across runs and cluster
sizes, (b) independent of row order and partitioning, and (c) cheap. A
content-hash bucket satisfies all three where ``df.sample``/TABLESAMPLE
(seeded RNG over a partition iteration order) satisfies none at scale.

Mechanism: bucket = first 8 hex digits of md5(id || ':' || salt),
compared against cumulative-fraction thresholds as fixed-width hex
strings. String comparison of equal-length lowercase hex equals numeric
comparison, and md5 is identical everywhere (JVM, DuckDB, Python), so
the split is reproducible bit-for-bit by any engine — the SQL oracle
mirrors it with the same CASE over the same literals. Narrow map-only
plan: no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgraphstorage_spark.pipeline.text import WS_RE, _n_tokens

_SPACE = 16 ** 8  # bucket space: first 8 hex digits of the md5


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound)] in declaration order; the last
    split absorbs rounding remainder (its bound is not used)."""
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1.0")
    out, cum = [], 0.0
    for name, frac in fractions.items():
        cum += frac
        out.append((name, format(min(int(cum * _SPACE), _SPACE - 1), "08x")))
    return out


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    Returns (id_col, bucket, split). ``salt`` namespaces independent
    splits of the same ids (resampling = change the salt, never the data).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thresholds = split_thresholds(fractions)
    bucket = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
    )
    # nest so the smallest bound is the outermost test: earliest split wins
    expr = F.lit(thresholds[-1][0])
    for name, bound in reversed(thresholds[:-1]):
        expr = F.when(bucket <= F.lit(bound), F.lit(name)).otherwise(expr)
    return df.select(F.col(id_col), bucket.alias("bucket"), expr.alias("split"))


def _bucket(id_col: str, salt: str) -> F.Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
    )


def _bound_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(int(fraction * _SPACE), _SPACE - 1), "08x")


def _frac_bound_hex(fraction: float) -> str:
    """Exclusive upper bound for a [0,1) fraction (use with ``<``)."""
    return format(min(int(fraction * _SPACE), _SPACE - 1), "08x")


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by hash bucket — the
    reproducible replacement for ``df.sample`` (which depends on partition
    iteration order). Map-only: the predicate pushes into the scan."""
    if fraction >= 1.0:
        return df
    return df.filter(_bucket(id_col, salt) <= F.lit(_bound_hex(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: each value of ``strata_col``
    keeps its own fraction (the training-mix downsampling step — e.g.
    keep 10% of crawl, 100% of curated). Unlisted strata keep
    ``default``. Same bucket mechanics as ``hash_sample``; still
    map-only, no shuffle, no per-stratum passes."""
    bound = F.lit(_bound_hex(default))
    for value, frac in fractions.items():
        bound = F.when(F.col(strata_col) == value, F.lit(_bound_hex(frac))).otherwise(bound)
    return df.filter(_bucket(id_col, salt) <= bound)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis 2006): each row draws key = u^(1/w) with u a deterministic
    hash-uniform in (0,1]; the k largest keys are an exact weighted
    sample without replacement — the standard one-pass distributed
    algorithm (quality-weighted corpus subsetting, importance-sampled
    eval sets). Deterministic: u derives from md5(id||salt) (the same
    engine-portable 60-bit family as ``hash_split``), so the selection
    is a pure function of the data, and a SQL oracle replays it.

    Rows with weight <= 0 are excluded (zero-weight rows cannot be
    sampled; negative weights are undefined). Global mode plans as
    ``TakeOrderedAndProject`` — per-partition partial top-k, one k-row
    final merge, no global sort. With ``strata_col``, a per-stratum
    window takes k rows per stratum (keys hash-uniform -> skew-free).

    Returns the sampled rows (all input columns).
    """
    from hgraphstorage_spark.pipeline.dedup import md5_long

    # u in (0, 1]: (h + 1) / 2^60 over the 60-bit md5 family
    u = (md5_long(F.col(id_col), F.lit(salt)) + 1) / F.lit(float(1 << 60))
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    ranked = df.filter(F.col(weight_col) > 0).withColumn("_sk", key)
    if strata_col is None:
        return ranked.orderBy(F.col("_sk").desc(), F.col(id_col)).limit(k).drop("_sk")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.col("_sk").desc(), F.col(id_col))
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_sk", "_rn")
    )


def _global_rank(df: DataFrame, order_cols: list, rank_name: str) -> DataFrame:
    """Distributed global row_number over a TOTAL order (``order_cols``
    must be tie-free): range-repartition on the keys, rank within each
    partition, then add broadcast exclusive per-partition offsets — the
    two-pass prefix-sum pattern (see ``token_budget_mix``). An
    un-partitioned ``Window.orderBy`` would instead collapse ALL rows
    into one WindowExec partition — correct at test scale, dead at
    100 TB."""
    from pyspark.sql import Window

    from .state import track

    rp = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # the locally-ranked frame feeds BOTH the per-partition offset
    # aggregate and the final join — unpersisted, the input's whole
    # lineage (including the range shuffle, and for nested callers like
    # curriculum_order the PREVIOUS rank pass) executed twice per call.
    # Persisting here fixes every caller: curriculum, shard_plan,
    # quantile_histogram, dedup_keep_best's ranked variants.
    local = track(
        rp.withColumn(
            "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
        )
    )
    # one row per partition: the offset frame is tiny by construction, so
    # the single-partition cumsum window is over ~hundreds of rows
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_name, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 4,
    epoch: int = 0,
    id_col: str = "doc_id",
    ascending: bool = True,
) -> DataFrame:
    """Curriculum data ordering (Bengio et al. 2009 applied to corpus
    scheduling): bucket documents into ``n_stages`` difficulty stages by
    a score (readability, perplexity, length — `ascending=True` trains
    easy-first) with the rank-bucket rule ``1 + floor((rn-1)*k/N)`` (the
    equi-depth formula ``quantile_histogram`` uses; bucket sizes differ
    by at most one) over the distributed two-pass rank, then shuffle
    WITHIN each stage with the deterministic
    per-epoch md5 permutation — so training walks stage 1 shuffled, then
    stage 2 shuffled, ... reproducibly on any cluster.

    Returns the input plus (stage 1..n_stages, curriculum_rank — the
    global position under (stage, md5 key)). Plan shape: two
    `_global_rank` passes (range partition + local rank + broadcast
    offsets), no data-sized single-partition window anywhere."""
    # NULLS LAST on both directions: Spark's bare asc() sorts NULLs
    # FIRST while DuckDB/ANSI default to LAST — a NULL score would
    # silently shift every stage between engines (latent-oracle catch)
    order = [
        F.col(score_col).asc_nulls_last()
        if ascending
        else F.col(score_col).desc_nulls_last(),
        F.col(id_col).asc(),
    ]
    ranked = _global_rank(df, order, "_srn")
    # N comes from the RAW input (one narrow scan) — an agg over
    # `ranked` would re-execute the whole two-pass rank lineage just to
    # count rows
    n_frame = df.agg(F.count(F.lit(1)).alias("_n"))
    ranked = ranked.crossJoin(F.broadcast(n_frame))
    # equi-depth bucket from rank: rn 1..N -> 1..k, sizes differ by <= 1
    stage = (
        ((F.col("_srn") - 1) * n_stages / F.col("_n")).cast("long") + 1
    ).cast("int")
    staged = ranked.withColumn("stage", stage).drop("_srn", "_n")
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":epoch:{epoch}"))
    )
    with_key = staged.withColumn("_ck", key)
    return _global_rank(
        with_key,
        [F.col("stage").asc(), F.col("_ck").asc(), F.col(id_col).asc()],
        "curriculum_rank",
    ).drop("_ck")


def epoch_shuffle(df: DataFrame, epoch: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-epoch global shuffle order: append
    ``shuffle_rank`` = the row's position under ORDER BY
    md5(id || ':epoch:' || epoch) — a fresh, reproducible permutation
    per epoch, the data-ordering step LLM training shards need (same
    epoch -> same order on any cluster; no RNG state to ship).

    Plan shape: the rank is the distributed two-pass form
    (:func:`_global_rank` — range partition + local rank + broadcast
    offsets), never a single-partition window; the permutation is
    independent of partition boundaries because (hash, id) is a total
    order. Writers that want physical order should
    ``repartitionByRange`` on the same key.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":epoch:{epoch}")))
    with_key = df.withColumn("_ek", key)
    return _global_rank(
        with_key, [F.col("_ek").asc(), F.col(id_col).asc()], "shuffle_rank"
    ).drop("_ek")


def length_bucketed_batches(
    df: DataFrame,
    batch_size: int,
    length_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assignment: order documents by (length desc,
    id) and cut consecutive runs of ``batch_size`` into batches — the
    standard padding-minimizing batching for variable-length training
    (similar lengths batch together, so per-batch padding waste =
    batch_max - each length stays small).

    Returns the input ids with (batch_id, batch_max, padding) where
    padding = batch_max - length, the per-row padding cost a packing
    report aggregates. Deterministic; the global rank runs over the SLIM
    (length, id) projection in the distributed two-pass form
    (:func:`_global_rank`), and the per-batch max is a partitioned
    window on the batch id (uniform ~batch_size rows per key).
    """
    from pyspark.sql import Window

    slim = df.select(
        F.col(id_col).alias("doc_id"), F.col(length_col).cast("long").alias("length")
    )
    ranked = _global_rank(
        slim, [F.col("length").desc(), F.col("doc_id").asc()], "_grn"
    ).withColumn("batch_id", ((F.col("_grn") - 1) / batch_size).cast("long")).drop("_grn")
    wb = Window.partitionBy("batch_id")
    return ranked.select(
        "doc_id",
        "length",
        "batch_id",
        F.max("length").over(wb).alias("batch_max"),
        (F.max("length").over(wb) - F.col("length")).alias("padding"),
    )


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    default_weight: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixing: stratum weight w repeats every row
    floor(w) times (``epoch`` = 1..floor(w)) and keeps a deterministic
    frac(w) hash-sample once more (``epoch`` = floor(w)+1) — the standard
    way to express "2.5 epochs of wiki, 0.5 epochs of crawl" as a
    dataset. Output = input columns + ``epoch INT``; fully deterministic,
    so downstream shuffles/splits see a stable dataset.

    Scale shape: two narrow branches (an explode bounded by max(w) and a
    filtered projection) unioned — no shuffle, no joins."""
    n_full = F.lit(int(default_weight))
    # strict < against floor(frac·space): fraction 0 keeps nothing exactly
    frac_bound = F.lit(_frac_bound_hex(default_weight - int(default_weight)))
    for value, w in weights.items():
        if w < 0:
            raise ValueError("weights must be >= 0")
        n_full = F.when(F.col(strata_col) == value, F.lit(int(w))).otherwise(n_full)
        frac_bound = F.when(
            F.col(strata_col) == value, F.lit(_frac_bound_hex(w - int(w)))
        ).otherwise(frac_bound)
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]); empty when w < 1
    epochs = F.when(n_full >= 1, F.sequence(F.lit(1), n_full)).otherwise(
        F.array().cast("array<int>")
    )
    full = df.select("*", F.explode(epochs).alias("epoch"))
    fractional = df.filter(_bucket(id_col, salt) < frac_bound).select(
        "*", (n_full + 1).cast("int").alias("epoch")
    )
    return full.unionByName(fractional)


def per_group_cap(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically (the
    ``k`` smallest hash buckets, ties broken by id) — the per-domain cap
    step of a crawl pipeline ("≤ N pages per site"), reproducible across
    runs and engines, unlike per-partition reservoir sampling.

    One shuffle on the group key; the within-group sort is bounded by the
    group size. For pathological groups (one domain = billions of rows) a
    pre-filter ``hash_sample`` pass cuts the sort input first.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(_bucket(id_col, salt), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def hash_split_case_sql(
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """The ANSI-SQL expression equivalent to ``hash_split`` (for oracles
    and for pushing the split into external engines)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thresholds = split_thresholds(fractions)
    bucket = f"substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 8)"
    whens = " ".join(
        f"WHEN {bucket} <= '{bound}' THEN '{name}'" for name, bound in thresholds[:-1]
    )
    return f"CASE {whens} ELSE '{thresholds[-1][0]}' END"


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_chars: int = 1,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing for LM training: lay documents
    end-to-end in a deterministic order and cut fixed-size token windows,
    recording where each document lands. Returns
    (id, shard, n_tokens, seq_id, tok_offset): document ``id`` starts at
    token ``tok_offset`` of packed sequence ``seq_id`` within ``shard``
    (documents straddle sequence boundaries, as in standard
    concatenation packing).

    A single global order would serialize the cumulative sum, so packing
    is shard-parallel: shard = first ``shard_chars`` hex digits of
    md5(id:salt) — 16^shard_chars independent packers, deterministic and
    engine-reproducible (same trick as `hash_split`; at 100 TB raise
    shard_chars so each shard's window fits an executor). One shuffle on
    shard, one running-sum window within it; token counting is narrow."""
    from hgraphstorage_spark.pipeline.text import _n_tokens
    from pyspark.sql import Window

    shard = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, shard_chars
    )
    d = df.select(
        F.col(id_col),
        shard.alias("shard"),
        _n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return d.select(id_col, "shard", "n_tokens", start).select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(F.col("_start") / F.lit(max_tokens)).alias("seq_id"),
        (F.col("_start") % F.lit(max_tokens)).alias("tok_offset"),
    )


def negative_edge_sampling(
    edges: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    oversample: int = 2,
    salt: int = 1,
) -> DataFrame:
    """Deterministic negative sampling for link-prediction training: for
    every distinct ``src`` in ``edges (src, dst)``, propose ``k``
    candidate destinations that are NOT observed edges and not the
    source itself. ``candidates`` is the destination pool as
    ``(cand_idx, cand_id)`` with ``cand_idx`` dense in [0, N).

    Candidate choice is a Weyl-style integer hash
    ``(src * 2654435761 + (i + salt) * 40503) mod N`` — pure int64
    arithmetic, so any SQL engine reproduces the sample exactly and
    resampling = changing ``salt``, never touching data. Each source
    draws ``k * oversample`` tries, drops positives/self/duplicates,
    and keeps the first ``k`` by try order (row_number).

    Scale shape: distinct-src reduce, a narrow explode of k*oversample
    tries per source, one broadcastable join against the candidate pool
    (dimension-sized), one anti-join against the observed edges on
    (src, dst) — the only corpus-keyed shuffle — and a per-src window
    over ≤ k*oversample rows. No candidate-pool-sized blow-up.
    """
    from pyspark.sql import Window

    n = candidates.count()
    if n == 0:
        raise ValueError("candidate pool is empty")
    srcs = edges.select("src").distinct()
    tries = srcs.select(
        "src", F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1))).alias("i")
    )
    h = F.pmod(F.col("src") * F.lit(2654435761) + (F.col("i") + F.lit(salt)) * F.lit(40503), F.lit(n))
    proposed = tries.select("src", "i", h.alias("cand_idx")).join(
        F.broadcast(candidates), "cand_idx"
    )
    ok = proposed.filter(F.col("cand_id") != F.col("src")).join(
        edges.select("src", F.col("dst").alias("cand_id")).distinct(),
        ["src", "cand_id"],
        "left_anti",
    )
    dedup = ok.groupBy("src", "cand_id").agg(F.min("i").alias("i"))
    w = Window.partitionBy("src").orderBy("i")
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", F.col("cand_id").alias("neg_dst"), F.col("rank").cast("long").alias("rank"))
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "budget",
    range_chars: int = 1,
) -> DataFrame:
    """Token-budget corpus mixing: instead of epoch weights (`mix_corpus`),
    each stratum gets a TOKEN budget ("80M web tokens, 15M book tokens…" —
    how pretraining mixtures are actually specified). Documents are taken
    in deterministic md5-hash order within their stratum — an unbiased,
    reproducible shuffle — and kept while the stratum's inclusive running
    token total stays within budget; the first document that crosses the
    line is kept too (budgets are met, never undershot by a whole doc).

    Returns the kept rows as (id, stratum, n_tokens, cum_tokens).

    Scale shape — two-pass distributed prefix sum, NO serial stage. A
    single window partitioned by stratum would push every row of a
    stratum through ONE task's sort (> 10^10 rows per task at 100 TB with
    a handful of sources). Instead the stratum's hash order is cut into
    16^``range_chars`` contiguous ranges (range = leading hex digits of
    the SAME md5 bucket the ordering uses, so ranges partition the order):
    (1) per-(stratum, range) token sums — a tiny partial-aggregated
    shuffle; (2) exclusive range offsets via a window over that
    strata×16^k-row frame (driver-size); (3) broadcast the offsets back
    and run the cumsum within each (stratum, range) partition. Integer
    sums are associative, so offset + in-range running sum equals the
    global running sum EXACTLY — same output, same oracle, but the
    largest sort is 1/16^k of a stratum and parallelism scales with
    ``range_chars`` (raise it at larger corpora). The wide shuffles carry
    only (id, stratum, n_tokens) — never text.
    """
    budget = F.lit(int(default_budget))
    for value, b in budgets.items():
        if b < 0:
            raise ValueError("budgets must be >= 0")
        budget = F.when(F.col(strata_col) == value, F.lit(int(b))).otherwise(budget)
    cum = _hash_order_cumsum(
        df,
        id_col=id_col,
        text_col=text_col,
        salt=salt,
        range_chars=range_chars,
        strata_col=strata_col,
        extra_cols=[budget.alias("_budget")],
    )
    return (
        cum.filter((F.col("cum_tokens") - F.col("n_tokens")) < F.col("_budget"))
        .select(id_col, strata_col, "n_tokens", "cum_tokens")
    )


def _hash_order_cumsum(
    df: DataFrame,
    id_col: str,
    text_col: str,
    salt: str,
    range_chars: int,
    strata_col: str | None = None,
    extra_cols: list | None = None,
) -> DataFrame:
    """Exact token prefix sum in deterministic md5-hash order — the shared
    two-pass distributed machinery behind :func:`token_budget_mix` and
    :func:`shard_plan` (one strategy, one place to fix). A single global
    (or per-stratum) window would push every row through ONE task's sort;
    instead the hash order is cut into 16^``range_chars`` contiguous
    ranges (range = leading hex digits of the SAME md5 bucket the
    ordering uses, so ranges partition the order):

    (1) per-(stratum, range) token sums — a tiny partial-aggregated
    shuffle; (2) exclusive range offsets via a window over that
    16^k-row frame (driver-size); (3) broadcast the offsets back and run
    the cumsum within each (stratum, range) partition. Integer sums are
    associative, so offset + in-range running sum equals the global
    running sum EXACTLY — same output as the serial form, but the
    largest sort is 1/16^k of the data and parallelism scales with
    ``range_chars``. The wide shuffles carry only (id, n_tokens[, extra])
    — never text.

    Returns (id[, stratum], n_tokens, cum_tokens[, extra_cols...]).
    """
    from pyspark.sql import Window

    bucket = _bucket(id_col, salt)
    keys = [strata_col] if strata_col else []
    cols = [F.col(c) for c in [id_col, *keys]]
    cols += [
        _n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
        bucket.alias("_bkt"),
        F.substring(bucket, 1, range_chars).alias("_rng"),
    ]
    base = df.select(*cols, *(extra_cols or []))
    range_sums = base.groupBy(*keys, "_rng").agg(F.sum("n_tokens").alias("_rsum"))
    # exclusive offsets: lowercase-hex string order == numeric order, so
    # ordering ranges by _rng matches the row order the ranges were cut from
    wo = (Window.partitionBy(*keys) if keys else Window).orderBy("_rng").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = range_sums.select(
        *keys, "_rng", F.coalesce(F.sum("_rsum").over(wo), F.lit(0)).alias("_off")
    )
    wi = Window.partitionBy(*keys, "_rng").orderBy("_bkt", id_col)
    cum = F.sum("n_tokens").over(wi) + F.col("_off")
    extra_names = [base.columns[i] for i in range(3 + len(keys), len(base.columns))]
    return base.join(F.broadcast(offsets), [*keys, "_rng"]).select(
        id_col, *keys, "n_tokens", cum.alias("cum_tokens"), *extra_names
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    rounds: int = 3,
) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents ALWAYS
    land in the same split.

    A plain per-document ``hash_split`` leaks — two near-identical
    documents straddling train and test inflate eval scores exactly like
    benchmark contamination. Here documents are first clustered over the
    near-dup ``pairs`` graph (``dedup_clusters`` HashMin rounds) and the
    deterministic md5 split is keyed on the CLUSTER id, so every member
    of a connected near-dup chain moves as one unit. Same cost envelope
    as the clustering itself; the split assignment is a narrow map.

    Returns (doc_id, cluster, split)."""
    from hgraphstorage_spark.pipeline.dedup import dedup_clusters

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thresholds = split_thresholds(fractions)
    cl = dedup_clusters(docs, pairs, id_col=id_col, rounds=rounds)
    bucket = _bucket("cluster", salt)
    expr = F.lit(thresholds[-1][0])
    for name, bound in reversed(thresholds[:-1]):
        expr = F.when(bucket <= F.lit(bound), F.lit(name)).otherwise(expr)
    return cl.select(id_col, "cluster", expr.alias("split"))


def per_source_percent_rank(
    df: DataFrame,
    metric_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source quantile calibration of a quality metric: each row's
    ``percent_rank`` within its own source — the fix for the classic
    curation bias where one crawl's scorer runs hot and a global
    threshold silently drops an entire source. Filtering on the
    calibrated rank ("keep every source's top 60%") compares documents
    only against their own source's distribution.

    One keyed window (shuffle on source + per-partition sort) — the
    standard cost envelope; ANSI percent_rank semantics make it
    engine-identical, with (metric, id) ordering so ties are
    deterministic. Returns (id, source, metric, pct_rank DECIMAL(18,6)).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.col(metric_col).asc(), F.col(id_col).asc()
    )
    return df.select(
        F.col(id_col),
        F.col(source_col),
        F.col(metric_col),
        F.round(F.percent_rank().over(w), 6).cast("decimal(18,6)").alias("pct_rank"),
    )


def _dsir_ngrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exploded hashed-n-gram features for DSIR: lowercased whitespace
    word unigrams + bigrams, one output row per gram occurrence —
    (doc_id, gram STRING). Bigrams join their words with a space (the
    engine-portable rendering a SQL oracle reproduces). ``_parallel``
    spreads single-file inputs across cores BEFORE the CPU-heavy
    tokenize+hash stage (same reason as ``shingle_hashes``)."""
    from hgraphstorage_spark.pipeline.text import _parallel

    docs = _parallel(docs)
    words = F.split(F.lower(F.trim(F.col(text_col))), WS_RE)
    # guard: sequence(1, 0) would DESCEND ([1, 0]) — single-word docs get
    # an explicitly empty bigram array instead
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(words, bigrams)).alias("gram"),
    ).filter(F.length("gram") > 0)


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-n-gram distribution is —
    log w(x) = sum over gram occurrences of
    log p_target(bucket) - log p_raw(bucket), with hashed word
    uni+bigram features in ``n_buckets`` buckets and add-one smoothing.
    The standard pretraining-data selection signal: resample raw docs
    with probability ∝ exp(log_weight) to approximate the target
    distribution (see :func:`dsir_sample`).

    Returns (doc_id, n_grams, log_weight DECIMAL(18,6)). Determinism /
    oracle contract: both hash modes are pure functions of the data;
    ``hash_mode="md5"`` buckets with the engine-portable 60-bit md5
    family (``md5_long(gram, salt) % n_buckets``) so DuckDB replays the
    weights bit-for-bit, while the default ``xxhash64`` is the fast path
    (JVM-native long hashing, no per-gram md5 string round-trip — the
    same dual-mode contract as ``minhash_lsh_pairs``). Each bucket's
    log-ratio rounds to 6 decimals BEFORE the per-doc sum, which runs as
    exact DECIMAL addition — order-independent.

    Scale shape: two bucket-count aggregations (map-side partials; the
    exchange is <= n_buckets rows per partition), the <= n_buckets-row
    log-ratio table broadcast-joins the exploded gram stream, and one
    per-doc sum — no shuffle ever carries more than (doc_id, 8-byte
    bucket, decimal). The raw-model pass and the scoring pass share the
    same exploded frame.
    """
    from hgraphstorage_spark.pipeline.state import track

    # persisted: raw feeds its bucket counts, its gram total AND the final
    # scoring join; tgt feeds counts + total — one tokenize pass each
    raw = track(_dsir_bucketed(docs, text_col, id_col, salt, hash_mode, n_buckets))
    tgt = track(_dsir_bucketed(target_docs, text_col, id_col, salt, hash_mode, n_buckets))
    ratios = _dsir_ratios(raw, tgt, n_buckets)
    return _with_gramless_docs(
        _dsir_score_bucketed(raw, ratios), docs, id_col
    )


def _with_gramless_docs(scores: DataFrame, docs: DataFrame, id_col: str) -> DataFrame:
    """'Score EVERY raw document': docs with zero grams (NULL/empty/
    whitespace-only text) produce no bucket rows and would vanish from
    the inner scoring join — they pass through with n_grams=0 and
    log_weight=0 (the empty sum), so resampling can still select them
    and k-row selections stay k-row. One id-keyed left join."""
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(scores, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("log_weight", F.lit(0).cast("decimal(18,6)")).alias("log_weight"),
    )


def _dsir_bucketed(
    frame: DataFrame, text_col: str, id_col: str, salt: str, hash_mode: str, n_buckets: int
) -> DataFrame:
    """(doc_id, bucket) — one row per gram occurrence, gram hashed into
    ``n_buckets``. The gram STRING is projected away immediately:
    everything downstream (counts, totals, scoring join) needs only the
    8-byte bucket."""
    from hgraphstorage_spark.pipeline.dedup import md5_long

    grams = _dsir_ngrams(frame, text_col, id_col)
    h = (
        md5_long(F.col("gram"), F.lit(salt))
        if hash_mode == "md5"
        else F.xxhash64(F.col("gram"), F.lit(salt))
    )
    return grams.select("doc_id", F.pmod(h, F.lit(n_buckets)).alias("bucket"))


def _dsir_ratios(raw: DataFrame, tgt: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, log_ratio DECIMAL(18,6)) from two bucketed gram frames:
    add-one-smoothed log p_target(bucket) - log p_raw(bucket), rounded
    to 6 decimals so downstream per-doc sums are exact DECIMAL."""
    raw_counts = raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt_counts = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    raw_total = raw.agg(F.count(F.lit(1)).alias("tr"))
    tgt_total = tgt.agg(F.count(F.lit(1)).alias("tt"))
    return (
        raw_counts.join(tgt_counts, "bucket", "full_outer")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
        .select(
            "bucket",
            F.round(
                F.log((F.coalesce("ct", F.lit(0)) + 1).cast("double") / (F.col("tt") + n_buckets))
                - F.log((F.coalesce("cr", F.lit(0)) + 1).cast("double") / (F.col("tr") + n_buckets)),
                6,
            )
            .cast("decimal(18,6)")
            .alias("log_ratio"),
        )
    )


def _dsir_score_bucketed(bucketed: DataFrame, ratios: DataFrame) -> DataFrame:
    """(doc_id, n_grams, log_weight) — broadcast the <= n_buckets-row
    ratio table onto the exploded gram stream, one per-doc DECIMAL sum."""
    return (
        bucketed.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_ratio").cast("decimal(18,6)").alias("log_weight"),
        )
    )


def dsir_ratio_table(
    docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The OFFLINE-TRAINING half of DSIR: the (bucket, log_ratio) model
    table alone, computed from a raw reference corpus + a target corpus
    exactly as :func:`dsir_weights` does internally. Persist this tiny
    frame (<= n_buckets rows) once, then score any number of NEW
    documents — batch via :func:`dsir_score`, streams via
    :func:`hgraphstorage_spark.streaming.dsir_stream_score` — without
    re-reading the training corpora. The train/apply split a production
    selection pipeline runs (score incoming crawl against a fixed
    model), same contract as the PQ/IVF-PQ build/query split."""
    from hgraphstorage_spark.pipeline.state import track

    # persisted like dsir_weights: each corpus feeds its bucket counts
    # AND its gram total — one tokenize pass each, not two
    raw = track(_dsir_bucketed(docs, text_col, id_col, salt, hash_mode, n_buckets))
    tgt = track(_dsir_bucketed(target_docs, text_col, id_col, salt, hash_mode, n_buckets))
    return _dsir_ratios(raw, tgt, n_buckets)


def dsir_score(
    docs: DataFrame,
    ratios: DataFrame,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The APPLY half of DSIR: score documents against a FIXED
    (bucket, log_ratio) model from :func:`dsir_ratio_table` —
    per-doc score = exact DECIMAL sum of the log-ratios of the doc's
    hashed gram buckets. ``salt``/``hash_mode``/``n_buckets`` must match
    the table's training call. Pure per-doc function of (text, model):
    the same doc gets the same score in any batch or stream slice.
    Scale shape: tokenize + one broadcast join + per-doc partial sum —
    no shuffle wider than (doc_id, bucket)."""
    return _with_gramless_docs(
        _dsir_score_bucketed(
            _dsir_bucketed(docs, text_col, id_col, salt, hash_mode, n_buckets), ratios
        ),
        docs,
        id_col,
    )


def dsir_sample(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """DSIR selection step: Gumbel-top-k resampling WITHOUT replacement
    over the importance weights — key = log_weight + Gumbel(0,1) with
    the Gumbel noise derived deterministically from md5(id||salt)
    (g = -ln(-ln(u)), u in (0,1)), take the k largest keys. Equivalent
    to sampling k docs without replacement with probability
    ∝ exp(log_weight) (the Gumbel-max trick), and a pure function of
    the data, so a SQL oracle replays the exact selection.

    Returns (doc_id, log_weight, gumbel_key DECIMAL(18,6)), the k
    selected docs. Plans as TakeOrderedAndProject over the weight
    frame — per-partition partial top-k, one k-row merge, no global
    sort."""
    from hgraphstorage_spark.pipeline.dedup import md5_long

    weights = dsir_weights(docs, target_docs, n_buckets, text_col, id_col, salt, hash_mode)
    # the Gumbel draw stays md5-derived in BOTH modes: it keys on doc_id
    # (cheap, one per doc) and keeps the selection SQL-replayable
    # u in (0,1): (h + 0.5) / 2^60 keeps both log args strictly positive
    u = (md5_long(F.col("doc_id"), F.lit(salt + ":gumbel")) + 0.5) / F.lit(float(1 << 60))
    key = F.round(F.col("log_weight").cast("double") - F.log(-F.log(u)), 6).cast(
        "decimal(18,6)"
    )
    return (
        weights.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "log_weight", "gumbel_key")
    )


def unimax_allocation(
    counts: DataFrame,
    budget: int,
    max_epochs: int = 2,
    group_col: str = "lang",
    tokens_col: str = "available",
) -> DataFrame:
    """UniMax language-balanced token-budget allocation (Chung et al.
    2023, arXiv:2304.09151): spread ``budget`` tokens as uniformly as
    possible across groups while capping every group at ``max_epochs``
    passes over its available tokens — the sampling schedule that
    avoids both high-resource domination and low-resource over-epoching.

    Closed-form waterfilling instead of the paper's sequential loop:
    sorted ascending by availability, a group saturates (gets its full
    cap) iff its cap fits under the equal share of what remains after
    all smaller groups saturate — and saturation is prefix-monotone
    (if cap_r exceeds its share, every larger cap does too), so the
    saturated set is ``t`` = the length of the satisfying prefix, and
    every unsaturated group gets the identical leftover share. All
    arithmetic is integer until the single final division, so the
    allocation replays bit-exactly in any engine.

    ``counts`` is the per-group availability table (one row per group —
    aggregate upstream; |groups| rows, driver-size). Returns
    (group, available, cap, alloc DECIMAL(38,6), saturated) — 38,6
    because a multi-trillion-token cap overflows DECIMAL(18,6)'s 12
    integer digits into a silent NULL (r6 review catch). If ``budget``
    ≥ Σcap every group saturates and the surplus is left unallocated
    (the paper's behavior: epochs are the hard ceiling)."""
    from pyspark.sql import Window

    if budget < 0 or max_epochs <= 0:
        raise ValueError("budget must be >= 0 and max_epochs > 0")
    base = counts.select(
        F.col(group_col).alias("group"),
        F.col(tokens_col).cast("long").alias("available"),
        (F.lit(int(max_epochs)) * F.col(tokens_col).cast("long")).alias("cap"),
    )
    w = Window.orderBy("available", "group")
    ranked = base.select(
        "*",
        F.row_number().over(w).alias("_rk"),
        F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cume"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    ).withColumn(
        "saturated",
        F.col("cap") * (F.col("_n") - F.col("_rk") + 1)
        <= F.lit(int(budget)) - (F.col("_cume") - F.col("cap")),
    )
    t = ranked.agg(
        F.sum(F.col("saturated").cast("long")).alias("_t"),
        F.sum(F.when(F.col("saturated"), F.col("cap")).otherwise(0)).alias("_cumet"),
    )
    share = (F.lit(int(budget)) - F.col("_cumet")).cast("double") / (
        F.col("_n") - F.col("_t")
    )
    return ranked.crossJoin(F.broadcast(t)).select(
        F.col("group").alias(group_col),
        "available",
        F.col("cap").cast("long").alias("cap"),
        F.round(
            F.when(F.col("saturated"), F.col("cap").cast("double")).otherwise(share), 6
        )
        .cast("decimal(38,6)")
        .alias("alloc"),
        "saturated",
    )


def shard_plan(
    df: DataFrame,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "shard",
    range_chars: int = 1,
) -> DataFrame:
    """Training-export shard assignment — the step that turns a curated
    corpus into the fixed-size shards a dataloader streams: documents
    are packed in deterministic md5-hash order (an unbiased,
    reproducible shuffle — same ordering contract as
    :func:`token_budget_mix`) and each document goes to the shard whose
    ``tokens_per_shard``-wide token range contains its FIRST token, so a
    document is never split and shard token totals track
    ``tokens_per_shard`` (a shard underfills only when a neighbour's
    document spills across its boundary). Shard ids are compacted to a
    gap-free 0..n-1 — a document longer than ``tokens_per_shard`` spans
    several raw ranges, and a dataloader enumerating shards must not hit
    empty ones. Returns (id, n_tokens, cum_tokens, shard_id).

    Scale shape: the shared two-pass distributed prefix sum
    (:func:`_hash_order_cumsum` — per-range token sums, driver-size
    offset window, broadcast back, in-range cumsum; raise
    ``range_chars`` at larger corpora). The raw range index uses exact
    integer ``div`` (never double division — floor(long/long) drifts
    off the oracle's integer ``//`` once cum_tokens nears 2^52), and
    the gap-free compaction is a distributed rank over the
    n_shards-row distinct-range frame (:func:`_global_rank`), joined
    back AQE-decided — corpus rows are never re-sorted."""
    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be > 0")
    cum = _hash_order_cumsum(
        df, id_col=id_col, text_col=text_col, salt=salt, range_chars=range_chars
    )
    raw = cum.withColumn(
        "_raw",
        F.expr(f"(cum_tokens - n_tokens) div {int(tokens_per_shard)}"),
    )
    shard_ids = _global_rank(
        raw.select("_raw").distinct(), [F.col("_raw").asc()], "_srk"
    ).select("_raw", (F.col("_srk") - 1).cast("int").alias("shard_id"))
    return raw.join(shard_ids, "_raw").select(
        id_col, "n_tokens", "cum_tokens", "shard_id"
    )
