"""Large-scale training-data pipeline operators (north-star extensions).

Not reference capabilities (SURVEY.md §7 M7): deduplication, similarity
search, text analysis, multimodal columns — DataFrame→DataFrame operators
designed partition-parallel for 100 TB inputs.
"""

from hgraphstorage_spark.pipeline.contamination import bloom_decontaminate, decontaminate
from hgraphstorage_spark.pipeline.dedup import (
    containment_pairs,
    cross_source_overlap,
    exact_dedup,
    exact_dup_groups,
    exact_substring_dedup,
    fuzzy_dup_pairs,
    incremental_near_dup,
    minhash_signatures,
    lsh_recall_report,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from hgraphstorage_spark.pipeline.similarity import (
    cosine_topk,
    embedding_near_dup_exact,
    embedding_near_dup_lsh,
    embedding_outliers,
    embedding_stats,
    label_centroids,
    lsh_bucket_topk,
    ivfpq_topk,
    pca_fit,
    pca_project,
    pq_topk,
    sq_topk,
)
from hgraphstorage_spark.pipeline.sampling import (
    epoch_shuffle,
    hash_split,
    length_bucketed_batches,
    weighted_sample,
)
from hgraphstorage_spark.pipeline.state import release_tracked, released
from hgraphstorage_spark.pipeline.text import (
    boilerplate_dedup,
    fingerprint,
    script_stats,
    language_id,
    quality_filter,
    quality_stats,
    tfidf_top_terms,
    token_counts,
)

__all__ = [
    "bloom_decontaminate",
    "decontaminate",
    "hash_split",
    "weighted_sample",
    "epoch_shuffle",
    "length_bucketed_batches",
    "boilerplate_dedup",
    "script_stats",
    "containment_pairs",
    "lsh_recall_report",
    "pq_topk",
    "ivfpq_topk",
    "release_tracked",
    "released",
    "exact_dedup",
    "exact_dup_groups",
    "cross_source_overlap",
    "exact_substring_dedup",
    "fuzzy_dup_pairs",
    "incremental_near_dup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "embedding_near_dup_exact",
    "embedding_near_dup_lsh",
    "embedding_outliers",
    "embedding_stats",
    "lsh_bucket_topk",
    "pca_fit",
    "pca_project",
    "sq_topk",
    "fingerprint",
    "language_id",
    "quality_filter",
    "quality_stats",
    "tfidf_top_terms",
    "token_counts",
]
