"""A/B isolation of the bench.py release-policy effect (VERDICT r12 task 1).

Times the 26 headline ops with bench-identical methodology (sf0.001 warmup,
min-of-3, release between attempts, all-core sentinel bracketing) under a
release policy chosen by $AB_GC_POLICY:

  gc        - System.gc() per release (bench.py HEAD behavior, r12)
  none      - no GC (r11 behavior)
  gc_sleep  - System.gc() + 0.4 s sleep (quiesce: let the async
              ContextCleaner churn land OUTSIDE the next timed region)
  gc_drain  - System.gc() + poll the ContextCleaner referenceBuffer via
              reflection until its size stabilizes (true drain wait)

Each invocation is one fresh JVM; interleave policies across invocations to
control ambient drift. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import HEADLINE, _fast_variants, _sentinel_sec
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
POLICY = os.environ.get("AB_GC_POLICY", "gc")


def _drain_wait(spark, timeout: float = 3.0) -> float:
    """Wait until the ContextCleaner's referenceBuffer stops shrinking.

    After a System.gc(), collected CleanupTaskWeakReferences move to the
    reference queue; the cleaning thread polls the queue, processes each
    task (shuffle-file deletion, broadcast/RDD removal -- blocking mode is
    the default so each task completes before the next), and removes the
    ref from referenceBuffer. A stable buffer size ~= drained queue.
    Returns seconds waited."""
    t0 = time.perf_counter()
    try:
        sc = spark.sparkContext._jsc.sc()
        opt = sc.cleaner()
        if not opt.isDefined():
            return 0.0
        cleaner = opt.get()
        fld = cleaner.getClass().getDeclaredField("referenceBuffer")
        fld.setAccessible(True)
        buf = fld.get(cleaner)
        last = buf.size()
        stable_since = time.perf_counter()
        while time.perf_counter() - t0 < timeout:
            time.sleep(0.02)
            cur = buf.size()
            if cur != last:
                last = cur
                stable_since = time.perf_counter()
            elif time.perf_counter() - stable_since > 0.1:
                break
    except Exception:
        time.sleep(0.3)
    return time.perf_counter() - t0


def _release_state(spark) -> None:
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    if POLICY == "none":
        return
    spark.sparkContext._jvm.System.gc()
    if POLICY == "gc_sleep":
        time.sleep(0.4)
    elif POLICY == "gc_drain":
        _drain_wait(spark)


def _execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("hgs-ab-gc")
    queries = dict(entry_mod.queries())
    queries.update(_fast_variants())

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    entry_mod._graph(spark, SF_DIR)
    spark.range(64).repartition(32).groupBy("id").applyInPandas(
        lambda p: p, "id long"
    ).write.format("noop").mode("overwrite").save()
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            _execute(queries[name](spark, warm_dir))
        except Exception:
            pass
    _release_state(spark)
    _sentinel_sec(spark)  # untimed first call

    sent = [_sentinel_sec(spark)]
    timings: dict[str, float] = {}
    release_secs = 0.0
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _execute(queries[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            r0 = time.perf_counter()
            _release_state(spark)
            release_secs += time.perf_counter() - r0
        timings[name] = round(best, 3)
    sent.append(_sentinel_sec(spark))

    print(
        json.dumps(
            {
                "policy": POLICY,
                "total": round(sum(timings.values()), 3),
                "queries": timings,
                "sentinel": sent,
                "drift": round(max(sent) / max(min(sent), 1e-9), 3),
                "release_overhead_sec": round(release_secs, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
