"""Model-dictionary parity + physical-plan audits.

The plan audits pin the scale-critical plan shapes (SURVEY.md §4): filter
pushdown into parquet scans, static pruning of untouched props branches,
broadcast joins for small frontiers — so a regression that silently
reintroduces full scans or shuffle joins fails CI, not the 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hgraphstorage_spark import GraphEngine, T
from hgraphstorage_spark.model import build_model, model_to_string, string_to_model


class TestModel:
    def test_dictionary_contents(self, movie_engine):
        model = {(r["kind"], r["name"]): r["type_id"] for r in build_model(movie_engine.current).collect()}
        assert ("node_type", "Actor") in model
        assert ("node_type", "Movie") in model
        assert ("edge_type", "Played") in model
        assert ("property_type", "age:integer") in model
        assert ("property_type", "name:text") in model
        # ids dense + 1-based per kind
        node_ids = sorted(v for (k, _), v in model.items() if k == "node_type")
        assert node_ids == [1, 2]

    def test_string_roundtrip(self, spark, movie_engine):
        model = build_model(movie_engine.current)
        s = model_to_string(model)
        back = string_to_model(spark, s)
        assert sorted(map(tuple, model.collect())) == sorted(map(tuple, back.collect()))


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShape:
    def test_parquet_filter_pushdown(self, spark):
        """A traversal's Has-filter must reach the parquet scan as
        PushedFilters, not run post-scan."""
        df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        plan = _executed_plan(df)
        assert "PushedFilters: [" in plan and "c_mktsegment" in plan.split("PushedFilters", 1)[1][:200]

    def test_props_branch_pruning(self, spark):
        """Has/Values on one property name must statically prune every other
        props union branch — the traversal below may touch customer and
        orders, never lineitem/part/supplier scans."""
        import __spark_entry__ as e

        df = e.q_traversal_out_values(spark, "/root/testdata/sf0.001")
        plan = _executed_plan(df)
        # lineitem (the dominant table: 3 props x 60k rows at sf0.01) must
        # be statically pruned; the remaining tables appear only as
        # 1-column label scans for node hydration
        assert "lineitem.parquet" not in plan

    def test_small_frontier_broadcasts(self, spark, movie_engine):
        """NID frontier → hop must probe edges with a broadcast join, not
        shuffle both sides."""
        res = movie_engine.traverse(T().nid(1).out("Played"))
        plan = _executed_plan(res.df)
        assert "BroadcastHashJoin" in plan

    def test_column_pruning_reaches_scan(self, spark):
        """A 2-column projection must not read the full lineitem schema."""
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        plan = _executed_plan(df)
        read_schema = plan.split("ReadSchema:", 1)[1][:200]
        assert "l_extendedprice" not in read_schema

    def test_whole_stage_codegen_and_partial_agg(self, spark):
        import __spark_entry__ as e

        df = e.q_tpch_q1(spark, "/root/testdata/sf0.001")
        # map-side combine must be present pre-execution
        assert "partial_sum" in _executed_plan(df)
        df.collect()  # AQE finalizes the plan on execution
        # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
        assert "*(" in _executed_plan(df)

    def test_label_from_id_matches_stored_labels(self, spark):
        """The derived-label rule must agree with the stored label column
        for every node — guards the id scheme and the projection rewrite
        against drifting apart."""
        from hgraphstorage_spark.sources import load_tpch_graph

        snap = load_tpch_graph(spark, "/root/testdata/sf0.001")
        mismatch = snap.nodes.filter(
            snap.label_from_id(F.col("id")) != F.col("label")
        ).limit(1).count()
        assert mismatch == 0

    def test_persisted_snapshot_partition_pruning(self, spark, tmp_path):
        """The persisted layout (nodes/edges by label, props by
        (owner_kind, name) — snapshot.write) must turn label filters and
        Has/Values name filters into PartitionFilters: a 100 TB snapshot
        answers a one-label / one-property query by reading only those
        directories."""
        from hgraphstorage_spark.compiler import compile_traversal
        from hgraphstorage_spark.plans.audit import partition_filters
        from hgraphstorage_spark.snapshot import GraphSnapshot
        from hgraphstorage_spark.sources import load_tpch_graph

        spark.catalog.clearCache()  # cached scans would hide PartitionFilters
        # default 100-char metadata truncation can cut predicates mid-token
        spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
        src = load_tpch_graph(spark, "/root/testdata/sf0.001")
        path = str(tmp_path / "snap")
        src.write(path)
        snap = GraphSnapshot.read(spark, path)

        nodes = snap.nodes.filter(F.col("label") == "Customer")
        assert any("Customer" in f for f in partition_filters(nodes))

        res = compile_traversal(
            snap, T().ns().has_label("Customer").has("c_mktsegment", "BUILDING").values("c_name")
        )
        pf = [f for f in partition_filters(res.df) if f]
        # every props scan restricts the name partition; no unpruned scan
        # of the full props tree remains
        assert pf and all(("c_mktsegment" in f) or ("c_name" in f) or ("label" in f) for f in pf)


class TestNewOperatorPlans:
    """Plan-shape audits for the pipeline/temporal operators: the scale
    guarantees their docstrings claim must be visible in the executed plan."""

    def test_decontaminate_broadcasts_benchmark(self, spark):
        from hgraphstorage_spark.pipeline.contamination import decontaminate
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = decontaminate(
            docs.filter(F.col("doc_id") % 50 != 0), docs.filter(F.col("doc_id") % 50 == 0), n=5
        )
        assert "BroadcastHashJoin" in executed_plan(out)

    def test_asof_join_single_shuffle(self, spark):
        from hgraphstorage_spark.operators.asof import asof_join
        from hgraphstorage_spark.plans.audit import executed_plan

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        cl = ev.filter("event_type='click'").select("event_id", "ts", "user_id", "value")
        vw = ev.filter("event_type='view'").select("event_id", "ts", "user_id", "value")
        plan = executed_plan(asof_join(cl, vw, on="ts", by=["user_id"], value_cols=["value"]))
        # union+window: exactly one exchange (on user_id), and no join
        # operator at all — the non-equi-join blowup is designed out
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan

    def test_bm25_broadcasts_term_stats(self, spark):
        from hgraphstorage_spark.pipeline.search import bm25_search
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(bm25_search(docs, "spark join window"))
        assert "BroadcastHashJoin" in plan  # per-term df joins broadcast
        # the only nested-loop is the 1-row (N, avgdl) scalar cross join
        assert plan.count("BroadcastNestedLoopJoin") <= 1

    def test_interval_join_is_equi_not_nested_loop(self, spark):
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.streaming import interval_join, load_events

        ev = load_events(spark, "/root/testdata/sf0.001")
        cl = ev.filter("event_type='click'").select("event_id", "ts", "user_id")
        vw = ev.filter("event_type='view'").select("event_id", "ts", "user_id", "value")
        plan = executed_plan(interval_join(cl, vw))
        assert "BroadcastNestedLoopJoin" not in plan  # equi on key, range as residual

    def test_funnel_checkpoints_stop_prefix_replay(self, spark):
        """The running funnel frame is referenced twice per step, so
        without the per-iteration localCheckpoint Catalyst replays the
        whole prefix down both branches (measured pre-fix at k=3: seven
        scans of the event source, zero ReusedExchange, compounding
        ~2^k with depth). Pin the fix: the final executed plan reads the
        checkpointed RDD and scans the event source exactly once — the
        per-step scans live in the checkpoint jobs, one each."""
        from hgraphstorage_spark.functions.timeseries import funnel
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.streaming import load_events

        ev = load_events(spark, "/root/testdata/sf0.001")
        plan = executed_plan(funnel(ev, ["view", "click", "purchase"]))
        assert plan.count("events.parquet") <= 1
        assert "Scan ExistingRDD" in plan  # the checkpointed prefix

    def test_agg_messages_single_triplet_pass(self, spark):
        """A both-directions send must hydrate the triplet view ONCE and
        explode a 2-element (receiver, msg) array — the unionAll form
        replayed the full two-join hydration per direction (measured:
        every node table scanned twice as often as needed)."""
        from hgraphstorage_spark.analytics import aggregate_messages
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources import load_tpch_graph

        snap = load_tpch_graph(spark, "/root/testdata/sf0.001")
        plan = executed_plan(
            aggregate_messages(
                snap,
                {"n_msgs": F.count},
                msg_to_dst=F.col("src.id"),
                msg_to_src=F.col("dst.id"),
            )
        )
        # the load_tpch_graph derivation legitimately unions per-label
        # frames, so pin the replay via scan counts: the union-per-
        # direction form scanned customer/supplier 6x each; one triplet
        # pass + explode leaves the derivation's own 3. The r13
        # node-frame persist serves BOTH triplet joins from one cached
        # materialization — the plan string still prints the cached
        # child's FileScan under each InMemoryTableScan, so the honest
        # pin is: string-count unchanged at <=3, plus two cache-served
        # node-join branches (the physical fill runs once).
        assert plan.count("customer.parquet") <= 3
        assert plan.count("supplier.parquet") <= 3
        assert plan.count("InMemoryTableScan") >= 2
        assert "explode" in plan.lower()

    def test_semantic_dedup_persists_fanout_frames(self, spark):
        """assign and prepped fan out to multiple branches; without the
        persist every branch replays the corpus scan (measured: five
        embeddings scans). Pin the cache reads in the final plan."""
        from hgraphstorage_spark.pipeline.similarity import semantic_dedup
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        plan = executed_plan(semantic_dedup(emb, nlist=4, iterations=2))
        assert "InMemoryTableScan" in plan

    def test_cluster_pair_shuffles_carry_float32_proxy_not_payload(self, spark):
        """r13 narrow-shuffle fix (guide §2.3): the applyInPandas GEMM
        prefilter stages of semantic_dedup and embedding_near_dup_lsh
        must ship the normalized float32 proxy (`vn`), never the raw
        float64 payload `v` (+ nrm) — the exact verify reads full
        precision from the persisted prep outside the shuffle."""
        import re

        from hgraphstorage_spark.pipeline.similarity import (
            embedding_near_dup_lsh,
            semantic_dedup,
        )
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        for df in (
            semantic_dedup(emb, nlist=4, iterations=2),
            embedding_near_dup_lsh(emb, threshold=0.35, bits=4, tables=2),
        ):
            plan = executed_plan(df)
            lines = [ln for ln in plan.splitlines() if "FlatMapGroupsInPandas" in ln]
            assert lines, plan[:500]
            for ln in lines:
                assert "vn#" in ln, ln
                assert "nrm#" not in ln, ln
                assert not re.search(r"\bv#\d", ln), ln

    def test_embedding_outliers_scores_computed_once(self, spark):
        """The (vec_id, score) frame feeds the percentile aggregate AND
        the final flag projection — pin that it is persisted, not
        recomputed from the corpus per branch."""
        from hgraphstorage_spark.pipeline.similarity import embedding_outliers
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        plan = executed_plan(embedding_outliers(emb))
        assert "InMemoryTableScan" in plan

    def test_kmeans_assignment_broadcasts_centroids(self, spark):
        """The Lloyd assignment pass must broadcast the centroid set and
        never shuffle the vector table for the argmax."""
        from hgraphstorage_spark.pipeline.similarity import kmeans_iterations
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        plan = executed_plan(kmeans_iterations(emb, nlist=4, iterations=2))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_vocabulary_partial_aggregates_before_shuffle(self, spark):
        """The token histogram must partial-aggregate map-side; the only
        single-partition exchange allowed is the vocabulary-sized top-k
        window."""
        from hgraphstorage_spark.pipeline.text import vocabulary
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(vocabulary(docs, top_k=50))
        assert "partial_count" in plan or "partial count" in plan.lower()
        # corpus-sized data shuffles on (token[, doc]) hash keys only
        assert plan.count("Exchange hashpartitioning") >= 1

    def test_chunk_dedup_two_shuffles(self, spark):
        """First-occurrence window (keyed by chunk) + per-doc regroup =
        exactly two hash exchanges; chunking itself must stay narrow."""
        from hgraphstorage_spark.pipeline.text import chunk_dedup
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(chunk_dedup(docs, chunk_words=10))
        assert plan.count("Exchange hashpartitioning") == 2
        assert "Exchange SinglePartition" not in plan

    def test_aggregate_messages_no_cartesian(self, spark):
        """Triplet hydration is two equi-joins; the inbox agg partial-
        aggregates. No nested-loop join may appear."""
        from hgraphstorage_spark.analytics import aggregate_messages
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources import load_tpch_graph

        snap = load_tpch_graph(spark, "/root/testdata/sf0.001")
        res = aggregate_messages(
            snap,
            {"n_msgs": F.count, "min_nbr": F.min},
            msg_to_dst=F.col("src.id"),
            msg_to_src=F.col("dst.id"),
        )
        plan = executed_plan(res)
        assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
        assert "partial_count" in plan or "partial_min" in plan

    def test_pack_sequences_single_shard_shuffle(self, spark):
        """Packing shuffles once on the shard key; everything before the
        window (token count, shard assignment) is narrow."""
        from hgraphstorage_spark.pipeline.sampling import pack_sequences
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(pack_sequences(docs))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange SinglePartition" not in plan
        assert "Join" not in plan


class TestRound3OperatorPlans:
    """Plan-shape audits for the round-3 operators."""

    def test_exact_substring_one_gram_shuffle(self, spark):
        """Gram hashes are longs BEFORE the shuffle (no string shuffle);
        the dup-set join back is the only other exchange family."""
        from hgraphstorage_spark.pipeline.dedup import exact_substring_dedup
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(exact_substring_dedup(docs, n=8))
        assert "partial_count" in plan  # dup-hash counting combines map-side
        assert "CartesianProduct" not in plan

    def test_cross_source_overlap_no_inferred_filter_rescan(self, spark):
        """Regression: InferFiltersFromGenerate must NOT push the shingle
        expression below the repartition as a size()>0 filter — that
        re-shingled the corpus single-threaded in the scan stage."""
        from hgraphstorage_spark.pipeline.dedup import cross_source_overlap
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(cross_source_overlap(docs))
        import re

        assert not re.search(r"Filter \(size\(array_distinct", plan)

    def test_fuzzy_pairs_blocked_equi_join(self, spark):
        """Blocking is a plain equi-join on (prefix, bucket): hash join,
        no nested loop, candidates distinct'd before levenshtein."""
        from hgraphstorage_spark.pipeline.dedup import fuzzy_dup_pairs
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(fuzzy_dup_pairs(docs))
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    def test_bloom_decontaminate_broadcasts_bits(self, spark):
        from hgraphstorage_spark.pipeline.contamination import bloom_decontaminate
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = bloom_decontaminate(
            docs.filter(F.col("doc_id") % 50 != 0),
            docs.filter(F.col("doc_id") % 50 == 0),
            n=5,
        )
        assert "BroadcastHashJoin" in executed_plan(out)

    def test_sq_topk_broadcasts_ranges_and_query(self, spark):
        """The quantizer ranges and the query vector re-enter as 1-row
        broadcasts — the corpus is scanned, never shuffled."""
        from hgraphstorage_spark.pipeline.similarity import sq_topk
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        plan = executed_plan(sq_topk(emb, query_id=0, k=5))
        assert "BroadcastNestedLoopJoin" in plan  # the two 1-row cross joins
        assert "SortMergeJoin" not in plan
        assert "TakeOrderedAndProject" in plan  # top-k, not a global sort

    def test_ewma_single_keyed_exchange(self, spark):
        from hgraphstorage_spark.functions.timeseries import ewma_features
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.streaming import load_events

        plan = executed_plan(ewma_features(load_events(spark, "/root/testdata/sf0.001")))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange SinglePartition" not in plan

    def test_sessionize_single_keyed_exchange(self, spark):
        """The lag flag, its running sum, AND the per-session aggregate all
        ride ONE user-keyed exchange: the group-by keys start with the
        window's partition key, so HashPartitioning(user_id) satisfies the
        aggregate's distribution and no second shuffle appears."""
        from hgraphstorage_spark.functions.timeseries import sessionize
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.streaming import load_events

        ev = load_events(spark, "/root/testdata/sf0.001")
        plan = executed_plan(sessionize(ev, gap_seconds=86400))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange SinglePartition" not in plan
        assert plan.count("partial_") >= 1  # map-side combine on the agg

    def test_tfidf_vectors_tokens_never_shuffle(self, spark):
        """The token stream folds into d-length vectors narrowly; the only
        keyed exchange carries <= d partial-agg rows per partition (the
        idf table), and all three consumers of the tf vectors read the
        persisted frame instead of re-running the tokenize+fold."""
        from hgraphstorage_spark.pipeline.text import tfidf_vectors
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(tfidf_vectors(docs))
        assert plan.count("Exchange hashpartitioning") == 1  # d-row idf agg
        assert plan.count("InMemoryTableScan") >= 3  # lineage cut consumed

    def test_char_entropy_zero_shuffle(self, spark):
        from hgraphstorage_spark.pipeline.text import char_entropy
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(char_entropy(docs))
        # one round-robin spread of the single-file scan; no hash exchange
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange SinglePartition" not in plan

    def test_hybrid_search_fuses_small_frames(self, spark):
        """Both retriever pools are top-k reductions; the fusion join and
        rank windows run on <= pool rows (SinglePartition allowed there,
        never on the corpus side)."""
        from hgraphstorage_spark.pipeline.search import hybrid_search
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        plan = executed_plan(hybrid_search(docs, emb, "spark join window", 0, k=5, pool=20))
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan


class TestLatestOperatorPlans:
    # (weighted_shortest_paths / betweenness return localCheckpointed
    # frames — lineage is truncated by design, so their plans cannot be
    # audited post-hoc; their guarantees are pinned behaviorally in
    # test_analytics/test_properties instead)

    def test_table_profile_single_wide_pass(self, spark):
        from hgraphstorage_spark.functions.stats import table_profile
        from hgraphstorage_spark.plans.audit import executed_plan

        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        plan = executed_plan(table_profile(orders, ["o_orderkey", "o_custkey"]))
        # one scan feeds the whole profile
        assert plan.count("FileScan parquet") == 1

    def test_incremental_near_dup_no_seen_self_join(self, spark):
        """The asymmetric band join must never pair the seen side with
        itself: two distinct banded subtrees, one equi-join, no cartesian."""
        from hgraphstorage_spark.pipeline.dedup import incremental_near_dup
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = incremental_near_dup(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
            threshold=0.5,
        )
        plan = executed_plan(out)
        assert "CartesianProduct" not in plan

    def test_lsh_candidate_join_is_aqe_decided_not_forced(self, spark):
        """VERDICT r3 #1: the exact-Jaccard verify join on the candidate
        set must carry NO mandatory broadcast hint — candidates scale with
        duplicate density and a forced broadcast dies on copy-dense 100 TB
        corpora. With autoBroadcastJoinThreshold=-1 a hint-free plan falls
        back to SortMergeJoin; a hinted plan would still BroadcastHashJoin."""
        from hgraphstorage_spark.pipeline.dedup import (
            incremental_near_dup,
            minhash_lsh_pairs,
        )
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            for out in (
                minhash_lsh_pairs(docs, threshold=0.5),
                incremental_near_dup(
                    docs.filter(F.col("doc_id") % 2 == 1),
                    docs.filter(F.col("doc_id") % 2 == 0),
                    threshold=0.5,
                ),
            ):
                plan = executed_plan(out)
                assert "BroadcastHashJoin" not in plan, plan
                assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_weighted_sample_partial_topk_no_global_sort(self, spark):
        """Global weighted_sample plans as TakeOrderedAndProject (per-
        partition heads, one k-row merge) — never a full Exchange+Sort."""
        from hgraphstorage_spark.pipeline.sampling import weighted_sample
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(weighted_sample(docs, "n_chars", 50))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan

    def test_boilerplate_dedup_hash_keyed_count_shuffle(self, spark):
        """The corpus count shuffles 8-byte xxhash64 keys (map-side
        partial); no unit-string exchange for counting, no cartesian."""
        from hgraphstorage_spark.pipeline.text import boilerplate_dedup
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(boilerplate_dedup(docs, unit="chunk", min_count=3))
        assert "partial_count" in plan
        assert "CartesianProduct" not in plan

    def test_containment_pairs_no_cartesian(self, spark):
        from hgraphstorage_spark.pipeline.dedup import containment_pairs
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(containment_pairs(docs, threshold=0.5, block_col="lang"))
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        assert "partial_count" in plan

    def test_epoch_shuffle_no_data_singlepartition_window(self, spark):
        """The global rank is the two-pass distributed form: the DATA
        path range-partitions and ranks per partition; the only
        single-partition exchange feeds the tiny one-row-per-partition
        offset frame, which enters broadcast."""
        from hgraphstorage_spark.pipeline.sampling import epoch_shuffle
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(epoch_shuffle(docs, epoch=1))
        assert "Exchange rangepartitioning" in plan
        assert "BroadcastHashJoin" in plan  # offsets join back broadcast
        # the single-partition exchange exists only under the broadcast
        # (offset) branch, never on the ranked data path: the final
        # window/sort above the range exchange must not be SinglePartition
        data_branch = plan.split("BroadcastExchange")[0]
        assert "Exchange SinglePartition" not in data_branch

    def test_ntile_deciles_no_data_singlepartition_window(self, spark):
        """VERDICT r4 task 2: the decile bucketing must use the two-pass
        distributed rank — no bare ntile() funneling the user dimension
        through one WindowExec partition. The only single-partition
        exchange allowed is the tiny offset/count frame feeding a
        broadcast."""
        import __spark_entry__ as entry_mod
        from hgraphstorage_spark.plans.audit import executed_plan

        plan = executed_plan(entry_mod.q_ntile_deciles(spark, "/root/testdata/sf0.001"))
        assert "ntile" not in plan.lower()
        assert "Exchange rangepartitioning" in plan
        data_branch = plan.split("BroadcastExchange")[0]
        assert "Exchange SinglePartition" not in data_branch

    def test_embed_exact_candidate_join_is_aqe_decided_not_forced(self, spark):
        """VERDICT r4 task 3: same contract as the LSH ops — the exact
        all-pairs verify join must carry no mandatory broadcast hint.
        Under autoBroadcastJoinThreshold=-1 a hint-free plan falls back to
        SortMergeJoin; a hinted one would still BroadcastHashJoin."""
        from hgraphstorage_spark.pipeline.similarity import embedding_near_dup_exact
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = executed_plan(embedding_near_dup_exact(emb, threshold=0.3))
            # the candidate-set verify joins (on vec_a / vec_b) must not be
            # forced broadcasts; the bounded blocks^2 grid frames inside
            # _blocked_pair_candidates may broadcast — they are tiny by
            # construction, not data-sized
            assert "BroadcastHashJoin [vec_" not in plan, plan
            assert "SortMergeJoin [vec_a" in plan and "SortMergeJoin [vec_b" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_dsir_weights_plan_shape(self, spark):
        """DSIR at scale: the ratio table joins back BROADCAST (it is
        <= n_buckets rows), gram counting partial-aggregates map-side,
        no cartesian anywhere, and the tokenize stage is spread across
        cores (round-robin repartition of the single-file scan — asserted
        on the pre-persist ngram stage; the persisted op plan hides it
        behind InMemoryTableScan)."""
        from hgraphstorage_spark.pipeline.sampling import _dsir_ngrams, dsir_weights
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = dsir_weights(docs, docs.filter(F.col("source") == "src0"), n_buckets=128)
        plan = executed_plan(out)
        assert "BroadcastHashJoin" in plan
        assert "partial_count" in plan
        assert "CartesianProduct" not in plan
        ngram_plan = executed_plan(_dsir_ngrams(docs, "text", "doc_id"))
        assert "RoundRobinPartitioning" in ngram_plan  # _parallel spread

    def test_bpe_merge_counts_runs_on_vocabulary_not_corpus(self, spark):
        """The corpus is scanned once into a word histogram (map-side
        partial count); the pair explosion reads the HISTOGRAM — one
        documents scan in the whole plan, and the global top-k window
        collapses into TakeOrderedAndProject (limit pushed below the
        window; r5 fixed the rank cast that used to block it)."""
        from hgraphstorage_spark.pipeline.text import bpe_merge_counts
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(bpe_merge_counts(docs, top_k=10))
        scans = [l for l in plan.splitlines() if "FileScan" in l and "documents" in l]
        assert len(set(scans)) == 1, plan
        assert "partial_count" in plan
        assert "TakeOrderedAndProject" in plan
        assert "Exchange SinglePartition" not in plan

    def test_simhash_pairs_reads_persisted_fingerprints(self, spark):
        """The banded pair op must read the CACHED fingerprint frame in
        every join branch — without the lineage cut, the joins' inferred
        isnotnull(simhash) constraint re-runs the interpreted 64-bit fold
        below the repartition on the single-partition scan (measured
        188 s -> 8 s at sf0.001)."""
        from hgraphstorage_spark.pipeline.dedup import simhash_near_dup_pairs
        from hgraphstorage_spark.pipeline.state import release_tracked
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        try:
            plan = executed_plan(simhash_near_dup_pairs(docs, max_distance=3))
            assert "InMemoryTableScan" in plan
            assert "CartesianProduct" not in plan
        finally:
            release_tracked()

    def test_perplexity_buckets_window_is_lang_partitioned(self, spark):
        """The only window runs PARTITIONED by lang (the calibration
        envelope) — never an unpartitioned data-sized WindowExec."""
        from hgraphstorage_spark.pipeline import perplexity_buckets
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(perplexity_buckets(docs, docs.filter(F.col("source") == "src0")))
        assert "Window" in plan and "hashpartitioning(lang" in plan
        # every Window node carries the lang partition spec on its own
        # line; the single-partition exchanges in this plan feed only the
        # 1-row totals aggregate, never a window
        for line in plan.splitlines():
            if "Window [" in line:
                assert "windowspecdefinition(lang" in line, line

    def test_correlation_matrix_single_agg_pass_no_window(self, spark):
        """All co-moments ride ONE partial-aggregated pass: no window, no
        join, a single shuffle (the 1-row final aggregate)."""
        from hgraphstorage_spark.functions.stats import correlation_matrix
        from hgraphstorage_spark.plans.audit import executed_plan

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plan = executed_plan(
            correlation_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])
        )
        assert "Window" not in plan and "Join" not in plan
        assert "partial_count" in plan or "partial_sum" in plan


class TestRound6OperatorPlans:
    def test_novelty_plan_no_window_spread_scan(self, spark):
        """Novelty is agg+join only (no windows, no cartesian), and the
        single-file scan is spread before the shingle fold."""
        from hgraphstorage_spark.pipeline.dedup import novelty_scores
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(novelty_scores(docs, n=3))
        assert "Window" not in plan and "CartesianProduct" not in plan
        assert "RoundRobinPartitioning" in plan  # shingle_hashes' _parallel spread
        assert "partial_count" in plan or "partial_min" in plan
        # explode_OUTER keeps InferFiltersFromGenerate from pushing an
        # inlined size(<full shingle fold>)>0 filter below the
        # repartition onto the single-partition scan (13 s -> 2 s at
        # sf0.1): no Filter line may carry the xxhash64 fold. In
        # executedPlan().toString() the condition is INLINE on the
        # 'Filter (...)' line (the first draft of this pin looked for a
        # separate 'Condition' line that never exists — r6 review catch).
        offending = [
            line for line in plan.splitlines() if "Filter" in line and "xxhash64" in line
        ]
        assert not offending, offending

    def test_nb_score_model_join_aqe_decided_not_forced(self, spark):
        """The vocabulary-sized model join carries no mandatory broadcast
        hint (the embedding_near_dup_exact contract): under
        autoBroadcastJoinThreshold=-1 it falls back to a shuffle join
        instead of OOMing on a 100 TB-corpus vocabulary."""
        from hgraphstorage_spark.pipeline.text import nb_quality_model, nb_quality_score
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        model = nb_quality_model(docs, docs.filter("source = 'src0'"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = executed_plan(nb_quality_score(docs, model))
            assert "SortMergeJoin [tok" in plan or "ShuffledHashJoin [tok" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_unimax_windows_only_on_group_counts(self, spark):
        """The waterfilling windows run on the per-group counts frame
        (|groups| rows by contract) — the corpus-sized explode/agg stays
        upstream with map-side partials and never enters a window."""
        from hgraphstorage_spark.pipeline.sampling import unimax_allocation
        from hgraphstorage_spark.plans.audit import executed_plan
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("available"))
        plan = executed_plan(unimax_allocation(counts, budget=1000))
        assert "partial_count" in plan  # corpus agg is partial map-side
        # the window input is the post-agg frame: every Window sits above
        # the aggregate, which already reduced to |groups| rows
        assert "Window" in plan


class TestLateR6PlanAudits:
    def test_readability_zero_shuffle(self, spark):
        """readability_scores is one narrow HOF projection — no Exchange
        of any kind in the plan."""
        from hgraphstorage_spark.pipeline.text import readability_scores
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(readability_scores(docs))
        assert "Exchange" not in plan

    def test_phrase_detect_partial_topk_and_no_positional_selfjoin(self, spark):
        """The final top-k is TakeOrderedAndProject (never a global
        sort), counts are map-side combined, and the bigram build is the
        zip-shifted array — no SortMergeJoin on (doc, pos)."""
        from hgraphstorage_spark.pipeline.text import phrase_detect
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(phrase_detect(docs, min_count=2, top_k=10))
        assert "TakeOrderedAndProject" in plan
        assert "partial_count" in plan
        assert "Exchange rangepartitioning" not in plan

    def test_hll_sketch_bounded_shuffle_no_window(self, spark):
        """The register agg is map-side combined (partial_max) so the
        shuffle is bounded at 2^p rows per partition per group; no
        window, no cartesian."""
        from hgraphstorage_spark.functions.stats import hll_sketch
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        import pyspark.sql.functions as F

        toks = docs.select(
            "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        )
        plan = executed_plan(hll_sketch(toks, "tok", group_cols=["lang"], p=8))
        assert "partial_max" in plan
        assert "Window" not in plan and "CartesianProduct" not in plan

    def test_zipf_histogram_is_partial_topk(self, spark):
        """zipf's vocabulary cut plans as TakeOrderedAndProject; the OLS
        runs over the k-row frame (single final agg, no data window)."""
        from hgraphstorage_spark.pipeline.text import zipf_fit
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(zipf_fit(docs, top_k=100))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan

    def test_mmr_pool_is_partial_topk(self, spark):
        """mmr_topk's candidate pool is a TakeOrderedAndProject over the
        scored scan — the corpus is never globally sorted, and the MMR
        rounds run on checkpointed pool-sized frames."""
        import pyspark.sql.functions as F
        from hgraphstorage_spark.pipeline.similarity import cosine, mmr_topk
        from hgraphstorage_spark.plans.audit import executed_plan

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        # audit the pool stage itself (mmr_topk checkpoints it eagerly)
        e2 = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        q = e2.filter(F.col("vec_id") == 0).select(F.col("v").alias("_qv"))
        pool = (
            e2.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select("vec_id", F.round(cosine(F.col("v"), F.col("_qv")), 6).alias("rel"))
            .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
            .limit(20)
        )
        plan = executed_plan(pool)
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan
        # end-to-end still returns k rows
        assert mmr_topk(emb, 0, k=3, pool=10).count() == 3


class TestFinalWavePlanAudits:
    def test_fim_zero_shuffle(self, spark):
        from hgraphstorage_spark.pipeline.text import fim_transform
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(fim_transform(docs, rate=0.5))
        assert "Exchange" not in plan

    def test_corpus_diff_shuffles_fingerprints_not_text(self, spark):
        """The full-outer join runs on (id, md5) projections: the join
        keys' exchanges must not carry the text column."""
        import re

        from hgraphstorage_spark.pipeline.dedup import corpus_diff
        from hgraphstorage_spark.plans.audit import executed_plan

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = executed_plan(corpus_diff(docs, docs.limit(400)))
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "text" not in m.group(1)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_rollup_partial_agg_and_mergeable_merge(self, spark):
        from hgraphstorage_spark.functions.timeseries import rollup_merge, time_rollup
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.streaming import load_events

        ev = load_events(spark, "/root/testdata/sf0.001")
        plan = executed_plan(time_rollup(ev))
        assert "partial_count" in plan  # map-side combine
        merged = rollup_merge(time_rollup(ev), time_rollup(ev))
        plan2 = executed_plan(merged)
        assert "Window" not in plan2 and "CartesianProduct" not in plan2

    def test_audio_match_hash_join_partial_votes(self, spark):
        import pyspark.sql.functions as F
        from hgraphstorage_spark.pipeline.multimodal import audio_match
        from hgraphstorage_spark.plans.audit import executed_plan

        corpus = spark.range(400).select(
            F.expr("id div 100").alias("media_id"),
            F.pmod(F.col("id") * 7919, F.lit(997)).alias("fp_hash"),
            F.pmod(F.col("id"), 100).cast("int").alias("t1"),
        )
        probe = spark.range(50).select(
            F.lit(9).cast("long").alias("media_id"),
            F.pmod((F.col("id") + 100) * 7919, F.lit(997)).alias("fp_hash"),
            F.col("id").cast("int").alias("t1"),
        )
        plan = executed_plan(audio_match(corpus, probe))
        assert "partial_count" in plan  # vote agg map-side combined
        assert "CartesianProduct" not in plan and "Window" not in plan


class TestRound7PlanAudits:
    def test_crawl_frontier_host_partitioned_rank_and_broadcast_rules(self, spark):
        """The frontier rank must be a HOST-partitioned window (never a
        single-partition global sort), the robots rules table must
        broadcast, and no cartesian product may appear anywhere in the
        composition."""
        import re

        from hgraphstorage_spark.pipeline.state import release_all_tracked
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            parse_robots,
        )

        pages = spark.createDataFrame(
            [(1, "https://a.com/x", '<a href="https://t.com/p">z</a>')],
            "doc_id long, url string, html string",
        )
        robots = spark.createDataFrame(
            [("t.com", "User-agent: *\nDisallow: /q\n")],
            "domain string, robots_txt string",
        )
        try:
            plan = executed_plan(crawl_frontier(extract_links(pages), parse_robots(robots)))
            assert "CartesianProduct" not in plan
            assert "BroadcastHashJoin" in plan  # the rules gate
            # every window is KEYED (frontier rank by host, robots parse
            # chains by domain) — no global single-partition window
            specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
            assert specs
            for spec in specs:
                assert spec.startswith("host#") or spec.startswith("domain#"), spec
        finally:
            release_all_tracked()

    def test_parse_sitemaps_single_generate_no_shuffle(self, spark):
        """Sitemap parsing is one block-extract + one explode to the
        per-entry result shape: no Exchange, no Python UDF."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import parse_sitemaps

        df = spark.createDataFrame(
            [("a.com", "<urlset><url><loc>https://a.com/x</loc></url></urlset>")],
            "domain string, sitemap_xml string",
        )
        plan = executed_plan(parse_sitemaps(df))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_quantile_sketch_estimate_partial_agg(self, spark):
        """The estimate over registers is a grouped percentile agg with
        map-side partials — nothing corpus-sized moves."""
        from hgraphstorage_spark.functions.stats import (
            quantile_sketch,
            quantile_sketch_estimate,
        )
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.streaming import load_events

        ev = load_events(spark, "/root/testdata/sf0.001")
        sk = quantile_sketch(ev, "value", "event_id", group_cols=["event_type"], k=64)
        plan = executed_plan(quantile_sketch_estimate(sk, (0.5,), ["event_type"]))
        assert "WindowGroupLimit" in plan  # the sketch's bottom-k prune
        assert "CartesianProduct" not in plan

    def test_structured_extract_zero_shuffle_single_block_chain(self, spark):
        """Tier-3 structured extraction stays one narrow projection (no
        Exchange, no Generate, no Python eval), and the block-marking
        regex chain is evaluated ONCE — the projection-boundary aliases
        must keep the three consumers (content/counts) referencing the
        materialized array, not re-inlining the whole chain (the HOF
        no-CSE trap, measured 7-9x on tier 1)."""
        from hgraphstorage_spark.pipeline.extraction import extract_structured
        from hgraphstorage_spark.plans.audit import executed_plan

        df = spark.createDataFrame(
            [(1, "<h1>Title of it</h1><p>the quick brown fox is on the mat"
                 " with all of the other animals of the house</p>")],
            "doc_id long, html string",
        )
        plan = executed_plan(extract_structured(df))
        assert "Exchange" not in plan and "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the DROP_RE subtree-removal literal appears once per inline of
        # the block chain: exactly one evaluation
        assert plan.count("</script") == 1, plan.count("</script")

    def test_validator_state_single_agg_with_partials(self, spark):
        """The validator register law is ONE url-keyed agg with
        map-side partials (partial_max visible as two HashAggregates
        around one exchange) — nothing corpus-sized moves twice and no
        Python eval appears."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import validator_state

        df = spark.createDataFrame(
            [("u", "2024-01-01T00:00:00Z", '"e"', None, 200)],
            "target_uri string, warc_date string, etag string, "
            "last_modified string, http_status int",
        )
        plan = executed_plan(validator_state(df))
        assert plan.count("Exchange") == 1
        assert "Exchange SinglePartition" not in plan
        # string agg buffers pick SortAggregate; the partial/final pair
        # (partial_max before the exchange) is what matters
        assert plan.count("SortAggregate") + plan.count("HashAggregate") == 2
        assert "partial_max" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_cdx_fetch_plan_partitioned_window(self, spark):
        """The island window and the range agg both partition on
        filename (high-cardinality across a crawl: ~10^5 shards at
        100 TB) — never a single-partition window; no Python eval."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.cdx import cdx_fetch_plan

        df = spark.createDataFrame(
            [("f", 0, 10), ("f", 50, 10), ("g", 5, 5)],
            "filename string, offset long, length long",
        )
        plan = executed_plan(cdx_fetch_plan(df, max_gap_bytes=16))
        assert "Exchange SinglePartition" not in plan
        assert "Exchange hashpartitioning(filename" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the (filename, island) agg reuses the window's filename
        # partitioning (clustering-subset rule) — ONE exchange total
        assert plan.count("Exchange") == 1, plan.count("Exchange")

    def test_sitemap_hint_state_single_agg_with_partials(self, spark):
        """The freshness-hint register law (r10) is the same shape as
        the validator register: ONE loc-keyed agg with map-side
        partials — a hint stream at 100 TB shuffles register rows, not
        entries twice; no Python eval."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import sitemap_hint_state

        df = spark.createDataFrame(
            [("url", "https://t.com/a", "2024-01-01", "daily", None)],
            "kind string, loc string, lastmod string, changefreq string, "
            "priority decimal(3,1)",
        )
        plan = executed_plan(sitemap_hint_state(df))
        assert plan.count("Exchange") == 1
        assert "Exchange SinglePartition" not in plan
        assert "partial_max" in plan or "partial_min" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_revisit_measured_is_one_key_join_no_cartesian(self, spark):
        """revisit_plan's r10 measured override is ONE urlkey equi-join
        on the surt expression (broadcast or hash, never cartesian, no
        Python eval) on top of the otherwise zero-shuffle projection —
        the history register is O(distinct URLs), the frontier's own
        scale."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import revisit_plan

        env = spark.createDataFrame(
            [("https://m.com/a", "2024-03-01T00:00:00Z", 200, '"e"',
              None, None, 172800, None)],
            "target_uri string, warc_date string, http_status int, etag string, "
            "last_modified string, last_modified_date date, max_age_sec long, "
            "expires_date date",
        )
        hist = spark.createDataFrame(
            [("com,m)/a", 12.5)], "urlkey string, est_change_interval_days double"
        )
        plan = executed_plan(revisit_plan(env, as_of="2024-03-10", measured=hist))
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
            "ShuffledHashJoin" in plan
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_effective_diameter_fold_is_rounds_sized(self, spark):
        """The effective-diameter fold (r10) runs over the rounds+1-row
        NF frame: the unpartitioned window is over THAT tiny frame (the
        graph-sized work already happened inside hyperball's register
        loop), the 1-row max side is broadcast, and no Python eval
        appears."""
        from decimal import Decimal

        from hgraphstorage_spark.analytics import effective_diameter
        from hgraphstorage_spark.plans.audit import executed_plan

        nf = spark.createDataFrame(
            [(0, Decimal("10.0")), (1, Decimal("90.0")), (2, Decimal("100.0")),
             (3, Decimal("100.0"))],
            "round int, nf_est decimal(28,4)",
        )
        out = effective_diameter(nf, q=0.9)
        plan = executed_plan(out)
        assert "BroadcastExchange" in plan  # the 1-row (t_max, nf_max) side
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        row = out.collect()[0]
        # NF(1)=90 == 0.9*100 qualifies exactly; interp = (90-90)/(90-10)+0
        assert row["effective_diameter"] == 1
        assert row["effective_diameter_interp"] == Decimal("1.000000")
        assert row["t_max"] == 3

    def test_wet_records_no_shuffle_beyond_extraction(self, spark):
        """WET derivation (r10) adds NO shuffle and NO extra Python
        stage beyond warc_to_documents' own extraction pass: the
        header/payload rebuild is a JVM-side projection (encode /
        map_from_arrays), so the payload bytes materialize exactly
        once per record."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import WARC_SCHEMA, wet_records

        df = spark.createDataFrame([], WARC_SCHEMA)
        plan = executed_plan(wet_records(df))
        assert "Exchange" not in plan
        # exactly the ONE Arrow stage warc_to_documents itself runs
        assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1
        assert "BatchEvalPython" not in plan

    def test_parse_feeds_staged_not_reinlined(self, spark):
        """The feed parser's staged projections must keep each extracted
        field a cheap column attribute — the single-expression form
        re-inlined the published coalesce chain ~15x, blew janino's
        method-size limit, and silently dropped the whole stage to
        interpreted mode. Guard: the pubDate pattern literal appears in
        the executed plan only where the `published` column is DEFINED
        (once), not once per consumer."""
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import parse_feeds

        df = spark.createDataFrame(
            [("a.com", "<rss><channel><item><title>T</title>"
                       "<link>https://a.com/x</link>"
                       "<pubDate>Tue, 05 Mar 2024 10:00:00 GMT</pubDate>"
                       "</item></channel></rss>")],
            "domain string, feed_xml string",
        )
        plan = executed_plan(parse_feeds(df))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the pattern literal contains 'pubdate' twice (open + close
        # tag) and nullif references its operand twice -> 4 in the
        # staged plan; the pre-fix re-inlined form carried ~7 copies of
        # the whole published chain (~28+)
        assert plan.count("pubdate") <= 4, plan.count("pubdate")

    def test_datasheet_single_source_agg_with_partials(self, spark):
        """The datasheet's final agg is source-keyed with map-side
        partials; the PII counts / URL normalization / token metrics are
        projections (no extra shuffle beyond quality_filter's histogram
        join and the final agg); no cartesian anywhere."""
        import __spark_entry__ as entry_mod
        from hgraphstorage_spark.plans.audit import executed_plan

        plan = executed_plan(
            entry_mod.q_datasheet(spark, "/root/testdata/sf0.001")
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # partial_count/partial_sum markers: the agg combines map-side
        assert "partial_" in plan or "HashAggregate" in plan
