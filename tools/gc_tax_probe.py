"""Within-process isolation of the per-release System.gc() tax (r13).

One JVM, one warmed light query (tpch_q1) and one heavy query
(semantic_dedup), timed 8x under four release policies IN THE SAME
PROCESS so ambient drift between runs cannot confound the comparison:

  A none      - release caches, no GC (r11 bench behavior)
  B gc        - release + System.gc() (r12 bench behavior)
  C gc_absorb - release + System.gc() + one small UNTIMED absorber job
                (pays any post-GC first-job cost outside the timer)
  D gc_drain  - release + System.gc() + cleaner drain wait

Prints one JSON line per (policy, op) with the 8 raw readings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import _fast_variants
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _execute(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("hgs-gc-tax-probe")
    queries = dict(entry_mod.queries())
    queries.update(_fast_variants())
    entry_mod._graph(spark, SF_DIR)
    spark.range(64).repartition(32).groupBy("id").applyInPandas(
        lambda p: p, "id long"
    ).write.format("noop").mode("overwrite").save()

    def release(policy: str) -> None:
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = jmap.values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        if policy == "none":
            return
        spark.sparkContext._jvm.System.gc()
        if policy == "gc_absorb":
            # small all-core job: absorbs post-GC costs outside timers
            spark.range(0, 64_000_000, 1, 32).selectExpr("sum(id)").collect()
        elif policy == "gc_drain":
            time.sleep(0.4)

    for op in ("tpch_q1", "semantic_dedup"):
        # warm
        for _ in range(2):
            _execute(queries[op](spark, SF_DIR))
        release("gc")
        for policy in ("none", "gc", "gc_absorb", "gc_drain", "none", "gc_absorb"):
            vals = []
            for _ in range(8):
                t0 = time.perf_counter()
                _execute(queries[op](spark, SF_DIR))
                vals.append(round(time.perf_counter() - t0, 3))
                release(policy)
            print(
                json.dumps(
                    {"op": op, "policy": policy, "runs": vals, "min": min(vals)}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
