"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out benchmark/eval set.

The standard pre-training hygiene step (cf. GPT-3 appendix C / PaLM §7:
13-gram overlap): any training document containing an n-gram that also
appears in an evaluation set is flagged (and usually dropped) so eval
scores are not inflated by memorized test data.

Scale design: the benchmark side is tiny relative to the corpus (MBs of
eval sets vs ~100 TB of training text), so its distinct shingle set is
BROADCAST — the corpus side is one narrow shingle pass plus a broadcast
hash join and a partial-aggregated count keyed by doc_id. No shuffle of
corpus text, no skew (shingle keys only fan in per-document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgraphstorage_spark.pipeline.text import WS_RE

from hgraphstorage_spark.pipeline.dedup import _parallel, md5_long


def _shingle_long(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document, long format.

    The word array is materialized in its OWN projection before the
    shingle lambda references it: Catalyst does no common-subexpression
    elimination inside higher-order-function lambdas, so an inlined
    split() would re-tokenize the document once per shingle — O(words²)
    per doc (the same pitfall shingle_hashes documents). `_parallel`
    spreads a single-file scan across cores before the CPU-heavy stage.
    """
    words = _parallel(docs).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), WS_RE).alias("_w"),
    )
    w = F.col("_w")
    n_sh = F.greatest(F.size(w) - (n - 1), F.lit(1))
    sh = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_sh), lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    )
    return words.select("doc_id", F.explode(sh).alias("shingle"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``n``-grams occur
    anywhere in ``benchmark``, and whether that reaches ``min_hits``.

    Returns (doc_id, n_shingles, n_overlap, contaminated) for every corpus
    document — unfiltered so callers can audit; the pipeline step is
    ``.filter(~col('contaminated'))``.

    Both sides shingle with the same normalization as the dedup operators
    (lowercase, whitespace split — dedup.py ``_shingles``), so a document
    equal to a benchmark document always flags.
    """
    corpus_sh = _shingle_long(corpus, n, text_col, id_col)
    bench_sh = (
        _shingle_long(benchmark, n, text_col, id_col).select("shingle").distinct()
    )
    # ONE corpus shingle pass and ONE doc-keyed aggregate: a LEFT
    # broadcast join tags benchmark shingles, then n_shingles and
    # n_overlap come out of the same groupBy (count(*) vs count(tag)).
    # The previous shape computed them as two separate aggregates over
    # two references of `corpus_sh` — the corpus was shingled twice and
    # a doc_id-keyed join stitched the halves (r12 duplicate-compute
    # sweep). Row-for-row identical output: an inner-join row count and
    # a left-join non-NULL tag count are the same number, and a doc
    # absent from `corpus_sh` produced no row under either shape.
    tagged = corpus_sh.join(
        F.broadcast(bench_sh.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("_hit").alias("n_overlap"),
        (F.count("_hit") >= min_hits).alias("contaminated"),
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate benchmark decontamination: flag corpus documents
    whose MinHash-verified Jaccard against ANY benchmark document reaches
    ``threshold`` — the fuzzy companion of :func:`decontaminate` (which
    needs an exact shared n-gram; a lightly-paraphrased eval item slips
    through that, not this).

    Built on the asymmetric banded-LSH probe of
    :func:`hgraphstorage_spark.pipeline.dedup.incremental_near_dup`
    (corpus = the "new" side, benchmark = the "seen" side): candidates
    scale with |corpus| x collision rate, never |corpus| x |benchmark|,
    and the benchmark signature table is tiny and broadcast by AQE. Same
    audit-friendly contract as `decontaminate`: EVERY corpus document
    comes back with its flag, so the pipeline step is
    ``.filter(~col('contaminated'))`` and the drop rate is reviewable.

    ``hash_mode="md5"`` makes every layer DuckDB-replayable (the driver
    oracle's mode); xxhash64 is the fast path.

    Returns (doc_id, n_matches, max_jaccard DECIMAL(18,6) — NULL when
    clean, contaminated)."""
    from hgraphstorage_spark.pipeline.dedup import incremental_near_dup

    flagged = incremental_near_dup(
        corpus,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        n=n,
        k=k,
        bands=bands,
        threshold=threshold,
        hash_mode=hash_mode,
    )
    # incremental_near_dup standardizes its output ids to "doc_id"/"seen_id"
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            "max_jaccard",
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter decontamination: the fixed-memory scale path for the
    same hygiene step as ``decontaminate``.

    ``decontaminate`` broadcasts the benchmark's distinct shingle STRINGS
    — fine for MB-scale eval sets, but the broadcast grows with eval
    text. Here the benchmark is folded into an ``m_bits`` Bloom filter
    (the classic fixed-size membership sketch): each eval shingle sets
    ``k_hashes`` bit positions ``md5_long(shingle, i) % m_bits``, and a
    corpus shingle counts as a hit iff ALL k of its positions are set.
    The broadcast side is now the distinct set-bit table — at most
    ``k * |eval shingles|`` integers regardless of shingle length, and
    never more than ``m_bits`` — so the filter's memory is CAPPED by
    construction, the property that matters when the eval suite grows
    from MBs to GBs against a 100 TB corpus.

    One-sided error, stated: every true overlap is flagged (no false
    negatives — a real shingle match sets identical positions); a
    non-overlapping shingle false-positives with rate ~(1-e^{-kN/m})^k.
    The md5-derived positions make the whole operator deterministic and
    DuckDB-replayable (same oracle-portable hash as the LSH md5 modes).

    Returns (doc_id, n_shingles, n_hits, contaminated): n_hits counts
    the document's distinct shingles whose k positions are all set.
    """
    probe_idx = F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("i")
    bits = (
        _shingle_long(benchmark, n, text_col, id_col)
        .select("shingle")
        .distinct()
        .select("shingle", probe_idx)
        .select(F.pmod(md5_long(F.col("shingle"), F.col("i")), F.lit(m_bits)).alias("bit"))
        .distinct()
    )
    corpus_sh = _shingle_long(corpus, n, text_col, id_col)
    probes = corpus_sh.select("doc_id", "shingle", probe_idx).select(
        "doc_id",
        "shingle",
        F.pmod(md5_long(F.col("shingle"), F.col("i")), F.lit(m_bits)).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("_set"))
        .filter(F.col("_set") == k_hashes)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    sizes = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) >= 1).alias("contaminated"),
    )
