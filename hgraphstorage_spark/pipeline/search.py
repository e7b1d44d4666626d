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

    hist = _token_histogram(docs, text_col, id_col)  # (doc_id, tok, n)
    dl = hist.groupBy(id_col).agg(F.sum("n").alias("dl"))
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
