"""Full-text relevance search: BM25 scoring over a documents table.

Okapi BM25 with the Lucene-style non-negative idf,
``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``:

    score(d, q) = Σ_{t ∈ q}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale design: the only corpus-wide pass is the token histogram (one
shuffle keyed by (doc, token), map-side combined). Everything derived
from the query is tiny — per-term document frequencies and the two
corpus scalars (N, avgdl) are single-row/`|q|`-row frames joined back by
broadcast — so the plan is histogram-shuffle + broadcast joins + one
final top-k (``orderBy.limit`` = partial top-k per partition, no full
sort at scale). Deterministic throughout: ties rank by doc_id, floats
rounded DECIMAL(18,6), so a SQL oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hgraphstorage_spark.pipeline.text import _token_histogram


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a whitespace-tokenized ``query``.
    Returns (doc_id, score DECIMAL(18,6), rank)."""
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("query has no terms")

    from .state import track

    # fan-out economics, measured both ways at sf0.1: the histogram
    # itself must NOT persist — the matched branch reads only the
    # isin(terms)-PRUNED histogram (the filter pushes below the agg), so
    # materializing the full token-level table to serve it doubled the
    # op (0.99 -> 2.0 s). What fans out twice at full width is dl (the
    # corpus scalars and the scored join): persisting the doc_id-sized
    # dl cuts the full tokenize+agg passes from two to one while the
    # pruned branch stays a pruned recompute.
    hist = _token_histogram(docs, text_col, id_col)  # (doc_id, tok, n)
    dl = track(hist.groupBy(id_col).agg(F.sum("n").alias("dl")))
    scalars = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )

    matched = hist.filter(F.col("tok").isin(terms))
    df_ = matched.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    tf = F.col("n").cast("double")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    contrib = idf * tf * F.lit(k1 + 1.0) / denom

    scored = (
        matched.join(F.broadcast(df_), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).cast("decimal(18,6)").alias("score"))
    )
    # top-k first (partial per-partition top-k, no global sort of the full
    # corpus), then rank the k survivors — the k-row window is trivial
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return topk.select(id_col, "score", F.row_number().over(w).alias("rank"))


def search_eval(
    ranking: DataFrame,
    qrels: DataFrame,
    ks: tuple[int, ...] = (1, 5, 10),
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """IR evaluation metrics for a ranking against relevance judgments:
    per (query, k) — precision@k, recall@k, MRR@k, nDCG@k (graded DCG
    with the ln-based log2 discount; ideal DCG from the qrels sorted by
    relevance). The retrieval-quality pre-flight a RAG/search pipeline
    runs before shipping an index, the rank-aware companion of
    `lsh_recall_report`/`ann_recall_report`.

    ``ranking``: (query_col, id_col, rank_col) with rank 1-based.
    ``qrels``: (query_col, id_col, rel_col) — graded relevance; rel > 0
    counts as relevant for P/R/MRR.

    Conventions: recall and nDCG are NULL for queries with no relevant /
    no positively-graded judgments (undefined, not zero); MRR@k is 0 when
    no relevant doc appears in the top k; a query with judgments but NO
    ranking rows (total retrieval failure) reports hits 0 / precision 0 /
    recall 0 / mrr 0 — the trec_eval convention — rather than vanishing.

    Scale shape: one (query, doc)-keyed equi-join of the ranking against
    the qrels (AQE broadcasts the small side), then per-query partial
    aggregates with one conditional sum per k — the per-(query, k) metric
    frame is |queries| x |ks| rows, exchange-trivial. The ideal-DCG pass
    is a window over qrels partitioned by the same query key. All
    discounts are ``ln``-based on both engines, and each DCG term is
    rounded to DECIMAL(28,12) BEFORE summation so the sums are exact and
    order-independent under any partitioning (the DSIR/corr-matrix
    pattern); final metrics round DECIMAL(18,6).

    Returns (query_id, k, n_rel, hits, precision, recall, mrr, ndcg)."""
    ks = tuple(sorted(set(int(k) for k in ks)))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive ints")
    LN2 = 0.6931471805599453
    dterm = lambda c: F.round(c, 12).cast("decimal(28,12)")  # noqa: E731
    j = ranking.select(query_col, id_col, rank_col).join(
        qrels.select(query_col, id_col, F.col(rel_col).cast("double").alias("_rel")),
        [query_col, id_col],
        "left",
    )
    rel0 = F.coalesce(F.col("_rel"), F.lit(0.0))
    rank = F.col(rank_col)
    per_query = j.groupBy(query_col).agg(
        *[
            F.sum(F.when((rank <= k) & (rel0 > 0), 1).otherwise(0)).alias(f"_hits_{k}")
            for k in ks
        ],
        *[
            F.sum(
                dterm(F.when(rank <= k, rel0 * F.lit(LN2) / F.log(rank + 1.0)).otherwise(0.0))
            ).alias(f"_dcg_{k}")
            for k in ks
        ],
        *[
            F.max(F.when((rank <= k) & (rel0 > 0), 1.0 / rank)).alias(f"_rr_{k}")
            for k in ks
        ],
    )
    # ideal DCG: per query, judgments sorted by grade desc (id asc ties),
    # discounted at their sorted position — same window key as the join.
    qw = Window.partitionBy(query_col).orderBy(F.col("_rel").desc(), F.col(id_col).asc())
    graded = qrels.select(
        query_col, id_col, F.col(rel_col).cast("double").alias("_rel")
    ).withColumn("_pos", F.row_number().over(qw))
    ideal = graded.groupBy(query_col).agg(
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).alias("_n_rel"),
        *[
            F.sum(
                dterm(
                    F.when(
                        (F.col("_pos") <= k) & (F.col("_rel") > 0),
                        F.col("_rel") * F.lit(LN2) / F.log(F.col("_pos") + 1.0),
                    ).otherwise(0.0)
                )
            ).alias(f"_idcg_{k}")
            for k in ks
        ],
    )
    dec6 = lambda c: F.round(c, 6).cast("decimal(18,6)")  # noqa: E731
    long_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"),
                    F.col(f"_hits_{k}").cast("long").alias("hits"),
                    dec6(F.col(f"_hits_{k}") / F.lit(float(k))).alias("precision"),
                    dec6(
                        F.when(F.col("_n_rel") > 0, F.col(f"_hits_{k}") / F.col("_n_rel"))
                    ).alias("recall"),
                    dec6(F.coalesce(F.col(f"_rr_{k}"), F.lit(0.0))).alias("mrr"),
                    dec6(
                        F.when(
                            F.col(f"_idcg_{k}") > 0,
                            F.col(f"_dcg_{k}").cast("double") / F.col(f"_idcg_{k}").cast("double"),
                        )
                    ).alias("ndcg"),
                )
                for k in ks
            ]
        )
    )
    # FULL outer: a query with judgments but zero retrieved rows must
    # report hits 0 / precision 0 / recall 0 (trec_eval convention), not
    # silently vanish and inflate downstream averages (review catch)
    joined = per_query.join(ideal, query_col, "full").withColumn(
        "_n_rel", F.coalesce("_n_rel", F.lit(0))
    )
    for k in ks:
        joined = joined.withColumn(
            f"_hits_{k}", F.coalesce(F.col(f"_hits_{k}"), F.lit(0))
        ).withColumn(
            f"_dcg_{k}",
            F.coalesce(F.col(f"_dcg_{k}"), F.lit(0).cast("decimal(38,12)")),
        )
    return (
        joined
        .select(query_col, F.col("_n_rel").cast("long").alias("n_rel"), long_rows.alias("m"))
        .select(
            query_col,
            F.col("m.k").alias("k"),
            "n_rel",
            F.col("m.hits").alias("hits"),
            F.col("m.precision").alias("precision"),
            F.col("m.recall").alias("recall"),
            F.col("m.mrr").alias("mrr"),
            F.col("m.ndcg").alias("ndcg"),
        )
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec_id: int,
    k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion:
    fuse the BM25 top-``pool`` for ``query`` with the cosine top-``pool``
    neighbors of ``query_vec_id``, scoring each document
    ``sum(1 / (rrf_k + rank_i))`` over the lists it appears in (RRF,
    Cormack et al. 2009 — the standard scale-free fusion; no score
    normalization to get wrong across engines).

    Shape at scale: both retrievers are already top-``pool`` partial
    reductions (never a global sort of the corpus), so the fusion joins
    two <= pool-row frames — driver-light, broadcast-trivial. Fully
    deterministic (both pools tie-break on id; RRF terms are exact IEEE
    on both engines), hence oracle-checkable end to end.

    Returns (doc_id, rrf DECIMAL(18,6), lex_rank, sem_rank, rank) —
    NULL lex/sem rank when a document appears in only one list."""
    from hgraphstorage_spark.pipeline.similarity import cosine_topk

    lex = bm25_search(docs, query, k=pool, id_col=id_col).select(
        F.col(id_col).alias("_id"), F.col("rank").alias("lex_rank")
    )
    sem_top = cosine_topk(embeddings, query_vec_id, k=pool, id_col=vec_id_col)
    w = Window.orderBy(F.col("score").desc(), F.col(vec_id_col).asc())
    sem = sem_top.select(
        F.col(vec_id_col).alias("_id"), F.row_number().over(w).alias("sem_rank")
    )
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(rrf_k)) + r), F.lit(0.0)
    )
    fused = (
        lex.join(sem, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            F.round(term(F.col("lex_rank")) + term(F.col("sem_rank")), 6)
            .cast("decimal(18,6)")
            .alias("rrf"),
            "lex_rank",
            "sem_rank",
        )
    )
    topk = fused.orderBy(F.col("rrf").desc(), F.col(id_col)).limit(k)
    wr = Window.orderBy(F.col("rrf").desc(), F.col(id_col))
    return topk.select(
        id_col, "rrf", "lex_rank", "sem_rank", F.row_number().over(wr).alias("rank")
    )
