"""Unpersist hygiene (VERDICT r3 task 7): pipeline operators that persist
intermediates register them with ``pipeline.state``; a long-lived service
loop wrapping each materialization in ``released`` leaves ZERO persisted
blocks behind."""

from __future__ import annotations

from hgraphstorage_spark.pipeline.state import release_tracked, released, tracked_count

SF_DIR = "/root/testdata/sf0.001"


def _persistent_rdd_count(spark) -> int:
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    n, it = 0, jmap.values().iterator()
    while it.hasNext():
        it.next()
        n += 1
    return n


def _sweep_to_zero(spark) -> None:
    """Blocking-unpersist EVERY persistent RDD so the baseline is a
    deterministic 0. A snapshot baseline races Spark's ContextCleaner:
    earlier tests' abandoned persisted frames get unpersisted
    ASYNCHRONOUSLY when their references are GC'd, so a nonzero
    baseline can drop mid-test and fail an equality that has nothing
    to do with the operator under test (seen once in the r6 full-suite
    run; after this sweep the cleaner has nothing stale to remove)."""
    release_tracked()
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    while it.hasNext():
        it.next().unpersist(True)


def test_loop_of_lsh_ops_leaves_no_blocks(spark):
    from hgraphstorage_spark.pipeline import minhash_lsh_pairs
    from hgraphstorage_spark.pipeline.similarity import embedding_near_dup_lsh

    _sweep_to_zero(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for _ in range(3):
        with released(minhash_lsh_pairs(docs, threshold=0.6)) as pairs:
            assert pairs.count() >= 0
        assert tracked_count() == 0
        with released(embedding_near_dup_lsh(emb, threshold=0.35, bits=5, tables=4)) as nd:
            assert nd.count() >= 0
        assert tracked_count() == 0
        # blocks actually gone on the executors, not just forgotten here
        assert _persistent_rdd_count(spark) == 0


def test_incremental_near_dup_two_tracked_then_released(spark):
    from pyspark.sql import functions as F

    from hgraphstorage_spark.pipeline.dedup import incremental_near_dup

    _sweep_to_zero(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = incremental_near_dup(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.5,
    )
    assert tracked_count() == 2  # new + seen signature tables
    with released(out) as df:
        df.count()
    assert tracked_count() == 0
    assert _persistent_rdd_count(spark) == 0


def test_release_is_idempotent(spark):
    assert release_tracked() == 0
    assert release_tracked() == 0


def test_registry_is_thread_scoped(spark):
    """ADVICE r4: one thread's release must not unpersist intermediates a
    sibling thread tracked — the registry is threading.local."""
    import threading

    from hgraphstorage_spark.pipeline.state import track

    main_df = track(spark.range(10))
    try:
        assert tracked_count() == 1
        worker_counts = {}

        def worker():
            track(spark.range(20))
            worker_counts["before"] = tracked_count()
            worker_counts["released"] = release_tracked()
            worker_counts["after"] = tracked_count()

        t = threading.Thread(target=worker)
        t.start()
        t.join()
        # the worker saw ONLY its own df, and its release left ours alone
        assert worker_counts == {"before": 1, "released": 1, "after": 0}
        assert tracked_count() == 1
        assert main_df.storageLevel.useMemory  # still persisted
    finally:
        assert release_tracked() == 1


def test_release_all_tracked_sweeps_worker_thread_frames(spark):
    """Frames tracked on worker threads that have exited are released by
    the main thread's release_all_tracked() — the quiesce-time sweep the
    thread-local scoping otherwise has no path for."""
    import threading

    from hgraphstorage_spark.pipeline.state import (
        release_all_tracked,
        release_tracked,
        track,
    )

    release_all_tracked()  # clean slate
    def worker():
        track(spark.range(10)).count()

    t = threading.Thread(target=worker)
    t.start(); t.join()
    assert release_tracked() == 0      # main thread's registry is empty
    assert release_all_tracked() >= 1  # the worker's frame is swept
    assert release_all_tracked() == 0  # idempotent
