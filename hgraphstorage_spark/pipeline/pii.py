"""PII detection and redaction — the scrubbing pass a training-data
pipeline runs before text ships (the CCNet/Dolma-style regex tier:
emails, US-style phone numbers, IPv4 addresses, SSN-shaped ids, payment
card numbers). Deliberately the conservative deterministic baseline —
pattern-based PII scrubbing is heuristic by nature (a 10-digit invoice
number looks like a phone); the point is a reproducible, auditable,
engine-portable pass, not NER.

All patterns are RE2-safe (no lookbehind — RE2 has none — so digit-run
boundaries are spelled as captured context classes and restored in the
replacement), every replacement is a plain global regexp_replace, and
counts come from ``regexp_count`` on the ORIGINAL text per pattern — so
a DuckDB oracle replays both the counts and the redacted text
bit-for-bit.

Scale shape: one zero-shuffle projection over the document scan — no
explode, no UDF, no aggregation; at 100 TB this is scan-speed work.

Known, documented limitations of the baseline tier: adjacent PII items
separated by a single character can escape the second match (the
boundary character is consumed by the first — the same non-overlapping
global-replace semantics on both engines); phone matching is the
10-digit US shape (3-3-4 with optional separators/parens); IPv4 octets
are not range-checked (999.1.1.1 redacts — over-redaction is the safe
direction for training data).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, spark_replacement, duckdb_replacement)
# Application order matters and is part of the contract: EMAIL first
# (may contain digit runs), then the dashed SSN shape (so the CC
# digit-run rule can't see it), IP (dotted runs before the phone/CC
# plain runs), PHONE (bounded 3-3-4 — its trailing boundary refuses
# longer runs, leaving 13-16 digit card runs for CC), CC last.
PII_PATTERNS: tuple[tuple[str, str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"(^|[^0-9\-])([0-9]{3}-[0-9]{2}-[0-9]{4})([^0-9\-]|$)",
        "$1<SSN>$3",
        r"\1<SSN>\3",
    ),
    (
        "ip",
        r"(^|[^0-9.])([0-9]{1,3}(\.[0-9]{1,3}){3})([^0-9.]|$)",
        "$1<IP>$4",
        r"\1<IP>\4",
    ),
    (
        "phone",
        r"(^|[^0-9])(\(?[0-9]{3}\)?[ .\-]?[0-9]{3}[ .\-]?[0-9]{4})([^0-9]|$)",
        "$1<PHONE>$3",
        r"\1<PHONE>\3",
    ),
    (
        "cc",
        r"(^|[^0-9])([0-9]{13,16})([^0-9]|$)",
        "$1<CC>$3",
        r"\1<CC>\3",
    ),
)


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: Sequence[str] | None = None,
) -> DataFrame:
    """Redact and count PII: returns all input columns plus
    ``text_clean`` (placeholders ``<EMAIL>`` ``<SSN>`` ``<IP>``
    ``<PHONE>`` ``<CC>``) and one ``n_<kind>`` LONG per kind — the
    audit counts a curation report aggregates. ``kinds`` restricts to a
    subset (application order is preserved from :data:`PII_PATTERNS`).

    Counts are per-pattern on the ORIGINAL text (order-independent,
    replayable); redaction applies the patterns sequentially in
    contract order. NULL text passes through (NULL clean text, NULL
    counts)."""
    wanted = set(kinds) if kinds is not None else {n for n, *_ in PII_PATTERNS}
    unknown = wanted - {n for n, *_ in PII_PATTERNS}
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    text = F.col(text_col)
    clean = text
    counts = []
    for name, pat, spark_repl, _ in PII_PATTERNS:
        if name not in wanted:
            continue
        counts.append(F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, spark_repl)
    return docs.select("*", clean.alias("text_clean"), *counts)
