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
