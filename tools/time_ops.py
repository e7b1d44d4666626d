"""Matched min-of-N wall timing for individual registry / bench ops —
the A/B harness behind every persist-or-not decision this round (the
bm25 counter-example rule: A/B the wall in matched conditions before
keeping a persist).

Usage (repo root):
    python tools/time_ops.py <runs> <query> [<query> ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_ops.py 5 vocab_drift

Prints one line per op: name, min, and all samples. Methodology matches
bench.py: noop-sink execution, _release_state between runs, one untimed
warm-up execution at sf0.001 first (codegen/JIT), then N timed runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark("time-ops")
    queries = dict(entry_mod.queries())
    queries.update(bench._fast_variants())
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    entry_mod._graph(spark, SF_DIR)
    # same Python-worker warm as bench.py
    spark.range(64).repartition(32).groupBy("id").applyInPandas(
        lambda p: p, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in names:
        try:
            bench._execute(queries[name](spark, WARM_DIR))
        except Exception:
            pass
        bench._release_state(spark)
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            bench._execute(queries[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
            bench._release_state(spark)
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)


if __name__ == "__main__":
    main()
