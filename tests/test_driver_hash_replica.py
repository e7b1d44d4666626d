"""Strict replica of the driver's value-hash gate for the 50-query
correctness window.

The round-1 lesson: the driver compares PANDAS-materialized results, where
engine-specific type mapping (Spark DECIMAL → decimal.Decimal objects,
DuckDB DECIMAL → float64) makes exactly-equal values stringify differently
("2525.00" vs "2525.0") and fail the hash despite passing an
order-insensitive typed-value compare. This test materializes BOTH sides
through pandas and hashes raw ``str()`` renderings with NO numeric
normalization — if it passes, no representation drift can hide between our
local compare and the driver's.

Only the first 50 ``queries()`` entries run here (those are the ones the
driver hashes); the full typed-value compare over all queries lives in
``test_oracle_parity.py``.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
WINDOW = list(QUERIES)[:50]


def _cell(v) -> str:
    # floats: both sides arrive as numpy/python float64; repr is identical
    # for identical bits. Everything else: raw str(), NO normalization.
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return repr(v)


def _hash_frame(pdf) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(tuple(_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.mark.parametrize("name", [n for n in WINDOW if n in ORACLES])
def test_window_query_pandas_hash_matches(spark, name):
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    ddf = con.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(spdf.columns)} vs {sorted(ddf.columns)}"
    )
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} vs {len(ddf)} rows"
    hs, hd = _hash_frame(spdf), _hash_frame(ddf)
    if hs != hd:
        cols = sorted(spdf.columns)
        s_rows = sorted(tuple(_cell(v) for v in r) for r in spdf[cols].itertuples(index=False, name=None))
        d_rows = sorted(tuple(_cell(v) for v in r) for r in ddf[cols].itertuples(index=False, name=None))
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        pytest.fail(f"{name}: pandas-level hash mismatch; first diffs {diffs}")


def test_window_covers_required_operators():
    """The driver checks only the first 50 entries — pin the composition so
    a refactor can't silently push the north-star operators out."""
    must_be_in_window = {
        # r7 rotation (VERDICT r6 task 1): the nine registered-but-
        # never-hashed late-r6 operators, in-window so the driver hashes
        # the media / layout / streaming-sketch / training-transform
        # flagships on first round-7 contact. OUT: pagerank / index_build
        # / hackage_etl (r1-r6 green, six contacts; the last two stay
        # benched every round vs BASELINE.md), multimodal_features
        # (r2-r6 green), and the five single-contact r6 rows whose
        # machinery stays inside in-window oracles (sentences →
        # sentence_dedup's terminator replay, dsir_stream → its batch
        # twin, zorder_key/cms_tokens → pytest oracles + the layout and
        # sketch slots below, stream_heavy_hitters → the four remaining
        # real-stream rows)
        # (curriculum / rollup_merge / fim out in the r10 twenty-second
        # rotation after r7-r9 green — the two-pass rank and infilling
        # replays stay pytest-oracled, the mergeable-summary law stays
        # in-window via the stream register rows)
        # (stream_hll / audio_match / corpus_diff / rowgroup_stats /
        # skipping_report out in the r12 twenty-fourth rotation after
        # five straight green contacts each — the HLL register law and
        # parquet-footer oracles stay pytest-certified, multimodal
        # keeps video_plan, and the cross-corpus surface arrives
        # stronger via cross_source_overlap)
        "video_plan",
        # r7 eleventh rotation: the six operators BUILT this round,
        # in-window the round they were built (the r6 bar). OUT:
        # sentence_dedup / quantile_histogram / vocab_drift /
        # hll_distinct / anchor_text / topic_clusters — all hashed
        # green r6, each one's machinery staying driver-checked inside
        # an in-window oracle (readability's terminator replay,
        # curriculum's two-pass rank, psi_drift, stream_hll's batch
        # twin, topic_terms' partitioned rank, topic_split's full CTE
        # chain)
        # (main_content(+_ctx) out in the r10 twenty-second rotation
        # after r7-r9 green — extraction keeps structured_md + page_meta
        # in-window and the structured replay runs inside datasheet v3)
        # (tokenizer_fertility + stream_quantile out in the r11
        # twenty-third rotation after four straight green contacts —
        # the BPE chain stays under tests/test_dsir_bpe.py, the
        # mergeable-quantile law stays pytest-certified with
        # stream_hll keeping the sketch family in-window)
        # (boilerplate_paragraph + extract_links out in the r12
        # twenty-fourth rotation after five green contacts each; the
        # blank-run replay stays pytest-oracled, the link derivation
        # runs inside the in-window frontier oracles, and the
        # repetition surface arrives via repetition_exact)
        # (topic_split out in the r12 twenty-fifth rotation after five
        # green contacts r7-r11; the full topic CTE chain stays under
        # its pytest oracle and the text family keeps char_entropy +
        # repetition_exact + flagged_filter in-window)
        # r7 twelfth rotation: the crawl/PII wave built late in round 7,
        # in-window the round it was built. OUT: corr_matrix /
        # gap_sessions / zipf / shard_plan / ann_recall — all hashed
        # green r6, machinery kept per the in-window slot comments
        # (numeric_histogram+psi_drift+quantile_sketch profiling,
        # sessionize pytest oracle + rollup_merge, readability+phrases
        # text stats, curriculum's prefix-sum rank chain,
        # stream_embed_dedup's md5-plane signature core)
        # (pii_scrub + page_meta out in the r11 twenty-third rotation
        # after four green contacts; datasheet keeps PII incidence
        # in-window, structured_md + extract_links keep extraction)
        "sitemap_ingest", "robots_extras",
        # r7 thirteenth swap: the crawl-tier capstone composition in for
        # calibration (hashed green r6; quantile-cut machinery stays via
        # quantile_sketch + psi_drift)
        # (crawl_frontier out in the r12 twenty-fourth rotation after
        # five green contacts — the capstone stays driver-checked every
        # round because frontier_schedule composes over it and
        # stream_crawl_frontier shares its oracle bit-for-bit)
        # round-1 red rows, fixed + canonicalized (window_top_order /
        # rollup_revenue / retention_cohorts rotated out r6 — r1-stable,
        # hashed green five rounds, family-covered by the remaining rows;
        # ntile_deciles and streaming_summary out in the r6 sixth
        # rotation: the two-pass rank stays plan-pinned + pytest-oracled,
        # and the streaming family keeps four real-stream in-window rows)
        # (the tpch trio out in the r11 twenty-third rotation after
        # TEN green contacts — benched every round; the relational
        # family keeps tpch_q2_like in-window, pinned below)
        # LLM-pipeline categories the driver must see green
        # (chunk_dedup / text_token_counts out in the r6 second
        # rotation; kmeans / text_quality / lang_id / mix_corpus out in
        # the third — all r1-stable and hashed green every round, their
        # families covered by quality_reasons/nb_quality/lang_confusion/
        # unimax_mix and the remaining dedup+similarity rows.
        # r6 seventh rotation: minhash_lsh_pairs / dedup_clusters /
        # embed_near_dup_lsh / bm25_search out after six green rounds —
        # each one's machinery stays driver-checked INSIDE an in-window
        # oracle (fuzzy_decontaminate embeds the md5 minhash chain,
        # dedup_keep_best embeds the HashMin cluster CTEs,
        # stream_embed_dedup embeds the md5-plane signature core,
        # search_eval embeds the full bm25 scoring replay); their slots
        # carry the four flagship late-r6 operators)
        # (robots_filter + stream_topics out in the r12 twenty-fourth
        # rotation after six green contacts each; the RFC 9309 gate
        # stays in-window via robots_extras + the frontier oracles,
        # the topic router via topic_split's shared CTE chain)
        # (hash_split out in the r6 fifth rotation after five green
        # rounds — the md5 split CASE stays driver-adjacent inside the
        # cluster_split oracle and the splitting family keeps
        # dsir_sample/shard_plan/unimax_mix in-window; its slot carries
        # the calibration report. decontaminate out in the sixth after
        # five green rounds — its slot carries the paraphrase-robust
        # MinHash decontamination twin over the same benchmark split)
        # (graph_summary out in the r6 ninth rotation after five green
        # rounds; the analytics family keeps pagerank + modularity +
        # hits in-window. pq_topk / mutation_cascade /
        # snapshot_time_travel also out — PQ replays inside the
        # ivfpq_topk oracle, the M-family and MVCC machinery stay under
        # the engine pytest suites; their slots carry the late-wave
        # hll_distinct / phrases / hits / zipf so the driver hashes
        # them the round they were built)
        # (phrases out in the r9 nineteenth rotation after r6-r8 green;
        # hits out in the r10 twenty-second after r6-r9 green — the
        # graph-analytics family keeps hyperball + hyperball_centrality
        # + effective_diameter in-window)
        # r6 sixth rotation: gap-based sessionization (the
        # session_window streaming flavor keeps its 'sessionize' row
        # past the window), the IR-eval metric report, and MinHash fuzzy
        # decontamination — in-window the round they were built
        # (search_eval out in the r11 twenty-third rotation after
        # five green contacts; the BM25 replay stays pytest-oracled
        # and bench times hybrid_search every round)
        # (fuzzy_decontaminate out in the r12 twenty-fourth rotation
        # after six green contacts; the asymmetric-LSH probe stays
        # under its full pytest oracle)
        # r4 rotation: operators the driver had never hashed before
        # (sq_topk rotated out r6: hashed green r4+r5, similarity family
        # keeps three in-window rows; boilerplate_dedup out in the r6
        # second rotation after two green contacts; incremental_near_dup
        # and weighted_sample out in the third after r4+r5 green;
        # exact_substring out in the fourth after r3-r5 green;
        # ivfpq_topk out in the r8 sixteenth rotation after r4-r7 green
        # — similarity keeps mmr_rerank + media_pairs in-window and its
        # slot carries the heading-aware structured extraction tier)
        # (structured_md out in the r12 twenty-fifth rotation after
        # four green contacts r8-r11; the heading-aware replay stays
        # driver-checked inside the in-window datasheet v3 oracle)
        # r6 eighth rotation: the r5 block (dsir_weights / dsir_sample /
        # bpe_merges / dedup_keep_best / simhash_pairs /
        # perplexity_buckets / quality_reasons — all hashed green in r5)
        # rotates past the window; each one's machinery stays
        # driver-checked inside an in-window oracle (dsir_stream's batch
        # twin, url_dedup's keeper argmax, media_pairs' banded-Hamming
        # core, domain_quality's quality rules) and their slots carry
        # the sentence/readability/MMR/quantile/topic-terms/domain-stats
        # wave — in-window the round they were built
        # (topic_terms out in the r9 nineteenth rotation after r6-r8
        # green; topics keep topic_split + stream_topics in-window and
        # its slot carries the HyperBall neighborhood function.
        # mmr_rerank out in the twentieth after r6-r8 green; similarity
        # keeps media_pairs + search_eval + stream_embed_dedup and its
        # slot carries the CDX fetch plan. domain_stats out in the
        # twenty-first after r6-r8 green; its slot carries the WARC
        # random-access roundtrip. readability out in the r10
        # twenty-second after r6-r9 green — its FULL per-doc replay now
        # runs inside the in-window datasheet v3 oracle every round)
        # r6 rotation (VERDICT r5 task 1): the six registered-but-never-
        # hashed r5 operators, in-window so the driver hashes the
        # profiling / streaming-DSIR / lang-eval / ANN-preflight wave
        # (modularity out in the r8 fifteenth rotation after r6+r7
        # green; the analytics family keeps hits + link_graph in-window
        # and its slot carries the extended per-source datasheet)
        # (lang_confusion out in the r10 twenty-second rotation after
        # r6-r9 green; the lang-id chain stays pytest-oracled and the
        # routing family keeps flagged_filter + domain_quality)
        # (numeric_histogram out in the r12 twenty-fourth rotation
        # after six green contacts; profiling keeps datasheet in-window
        # and the histogram machinery stays pytest-oracled)
        "datasheet",
        # r6 second rotation: the crawl-ingest story (WARC fixture read,
        # URL dedup, media pair core, Misra-Gries stream) plus the NB
        # quality classifier and n-gram novelty — in-window the round
        # they were built
        # (nb_quality out in the r8 eighteenth rotation after r6+r7
        # green — quality keeps domain_quality in-window; its slot
        # carries RSS/Atom feed ingestion)
        # (novelty out in the r9 nineteenth rotation after r6-r8 green;
        # quality keeps domain_quality in-window and the n-gram
        # machinery runs inside the fuzzy_decontaminate oracle; its
        # slot carries the politeness frontier_schedule. warc_ingest
        # out in the twentieth after r6-r8 green; read_warc stays under
        # test_warc.py incl. the r9 envelope e2e and its slot carries
        # CDXJ ingestion)
        # (url_dedup + media_pairs out in the r11 twenty-third
        # rotation after five green contacts; dedup keeps
        # fuzzy_decontaminate + stream_embed_dedup + semantic_dedup,
        # multimodal keeps audio_match + video_plan)
        # (feed_ingest out in the r12 twenty-fifth rotation after four
        # green contacts r8-r11; push-discovery keeps sitemap_ingest +
        # robots_extras in-window with the external bytes live)
        # r6 third rotation: the drift / export / streaming wave —
        # also in-window the round it was built (stream_url_dedup out
        # in the r8 seventeenth rotation after r6+r7 green — its batch
        # keeper IS the in-window url_dedup row; its slot carries the
        # incrementally-maintained streaming crawl frontier)
        # (stream_crawl_frontier out in the r12 twenty-fifth rotation
        # after four green contacts r8-r11; the shared bit-for-bit
        # oracle stays pytest-certified and streaming keeps
        # stream_freshness + stream_validator + stream_enrich
        # in-window)
        # (stream_embed_dedup / domain_quality / unimax_mix out in the
        # r12 twenty-fourth rotation after six green contacts each;
        # the signature-register compaction law, quality rules, and
        # UniMax fold stay under their full pytest oracles — quality
        # keeps flagged_filter + datasheet + the incoming
        # quality_filter_narrow in-window, sampling keeps
        # pack_sequences)
        # (r6 fourth rotation's jaccard_prefix / psi_drift / link_graph
        # out in the r9 nineteenth rotation after r6-r8 green — dedup
        # keeps url_dedup + fuzzy_decontaminate + media_pairs, sketches
        # keep stream_hll + stream_quantile, links keep extract_links +
        # crawl_frontier + domain_stats; their slots carry the
        # revisit-economy pair below)
        # r9 nineteenth rotation: the four r8 closers the driver had
        # never hashed (the accepted one-round grace ends) plus the two
        # revisit-economy operators built THIS round, in-window the
        # round they were built
        # (frontier_schedule / hyperball / http_envelope / revisit_plan
        # out in the r12 twenty-fifth rotation after three green
        # contacts each r9-r11; the register law stays in-window via
        # hyperball_centrality + effective_diameter, the revisit
        # economy via revisit_measured + change_rate)
        "flagged_filter", "hyperball_centrality",
        # r9 twentieth + twenty-first rotations: the CDX web-archive
        # index tier, also built this round
        # (cdx_plan + cdx_roundtrip out in the r12 twenty-fifth
        # rotation after three green contacts each r9-r11; the
        # span/md5 literals stay independently re-derived by
        # tests/test_wet_independent.py and the family keeps
        # cdx_ingest + cdx_export in-window)
        "cdx_ingest",
        # r10 twenty-second rotation: the four declared r10 candidates
        # (registered + oracled since r9, driver-hashed now — zero
        # registered-never-hashed rows remain) plus the four operators
        # BUILT this round, in-window the round they were built
        "validator_state", "stream_validator", "phrase_filter",
        "change_rate", "effective_diameter", "revisit_measured",
        "cdx_export", "stream_freshness",
        # r11 twenty-third rotation: the declared r11 candidate
        # (wet_export — its literal oracle now certified by the
        # independent stdlib toolchain in tests/test_wet_independent
        # .py) plus nine rows from the never-hashed backlog (VERDICT
        # r10 task 3): the events SQL surface incl. the DTJSON F1
        # row, the temporal-join family, sessionization, semantic
        # dedup, and training-batch packing
        "wet_export", "tpch_q2_like", "events_hourly", "events_json",
        "sessionize", "asof_join", "range_join", "interval_join",
        "semantic_dedup", "pack_sequences",
        # r12 twenty-fourth rotation: the declared r12 candidate
        # (wet_ingest — the external CC WET shard reader, grace
        # expires per VERDICT r11 task 1) plus fourteen rows from the
        # never-hashed backlog: the seven benched-but-never-hashed
        # headline queries (VERDICT r11 task 2), the graph-analytics
        # family's first driver contacts (task 3), and the events SQL
        # trio (task 7)
        "wet_ingest",
        "char_entropy", "repetition_exact", "quality_filter_narrow",
        "hybrid_search", "fuzzy_pairs", "cross_source_overlap",
        "stream_enrich",
        "scc", "k_truss", "random_walks", "agg_messages",
        "events_percentiles", "funnel", "pivot_events",
        # r12 twenty-fifth rotation: the ten declared r13 candidates
        # landed a round early — the remaining graph-analytics pair
        # (weighted_sp + clustering complete the family's driver
        # contacts), the interchange roundtrip, the embedding-profile
        # pair, bloom decontamination, token-budget mixing,
        # degree-matched negative sampling, and the skew + corpus
        # reports; never-hashed backlog 39 -> 29
        "weighted_sp", "clustering", "jsonl_roundtrip",
        "embedding_stats", "embedding_outliers", "bloom_decontaminate",
        "token_budget_mix", "negative_sampling", "skew_report",
        "corpus_report",
    }
    missing = must_be_in_window - set(WINDOW)
    assert not missing, f"pushed out of the driver window: {sorted(missing)}"
