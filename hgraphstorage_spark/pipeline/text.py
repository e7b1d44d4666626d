"""Text-analysis operators over a documents table.

All operators are built-in-function compositions (JVM-side, whole-stage
codegen) — no Python UDFs in the hot path. Deterministic by construction
so a SQL oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Marker substrings per language for the n-gram/stopword heuristic.
# Counting occurrences of " <marker> " in lowercased text; ASCII-safe and
# expressible identically in ANSI SQL (the oracle mirrors this table).
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
}


def _n_tokens(col) -> F.Column:
    """Whitespace token count; empty/blank text = 0 tokens."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/char counts. Narrow map — scales linearly."""
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        _n_tokens(F.col(text_col)).alias("n_tokens"),
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-style pre-tokenization count: letter runs, single digits, and
    single punctuation marks each count as one token (the GPT-2-style
    pre-tokenizer shape, ASCII-simplified so Java regex and RE2 agree).
    Whitespace never tokenizes."""
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


def quality_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: length, token count, mean token length,
    non-alphanumeric ratio. All exact-arithmetic so oracles match:
    ratios are rounded DECIMAL(18,6)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = _n_tokens(text)
    # non [a-zA-Z0-9 whitespace] characters (ASCII heuristic — deterministic
    # in both Spark and the SQL oracle)
    n_punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, F.round(n_chars.cast("double") / n_tokens, 6).cast("decimal(18,6)"))
        .otherwise(F.lit(None).cast("decimal(18,6)"))
        .alias("chars_per_token"),
        F.when(n_chars > 0, F.round(n_punct.cast("double") / n_chars, 6).cast("decimal(18,6)"))
        .otherwise(F.lit(None).cast("decimal(18,6)"))
        .alias("punct_ratio"),
    )


def _marker_count(text_col, marker: str) -> F.Column:
    """Occurrences of `marker` in the text = (len - len(replace))/len(marker)."""
    lowered = F.lower(text_col)
    return (F.length(lowered) - F.length(F.replace(lowered, F.lit(marker), F.lit("")))) / len(marker)


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count per-language marker words; highest
    count wins (ties broken by fixed language order, 'und' = no markers).
    CJK shortcut: any char > U+2E7F → 'zh'."""
    text = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum([_marker_count(text, m) for m in markers[1:]], _marker_count(text, markers[0]))
        for lang, markers in LANG_MARKERS.items()
    }
    has_cjk = F.col(text_col).rlike(r"[⺀-鿿]")
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang in ("en", "de", "fr", "es"):  # fixed priority order for ties
        s = scores[lang]
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return docs.select(
        F.col(id_col),
        F.when(has_cjk, F.lit("zh")).otherwise(best).alias("lang_guess"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of lowercased, whitespace-normalized text.
    (The rolling-hash variant for shingling lives in dedup.py.)"""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(normalized).alias("fp"))
