"""Duplicate-compute sweep over every BENCHED op (all bench.py sections:
headline, md5 twins, r4-r11 ops, diagnostics, scale ops) — the graded
perf surface — using the same executed-plan heuristic as
tools/sweep_duplicate_scans.py."""
import os, sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
import bench
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
TABLES = "documents events embeddings lineitem orders customer supplier part nation region".split()
THRESHOLD = 3

spark = get_spark("dup-scan-bench")
queries = dict(entry_mod.queries())
queries.update(bench._fast_variants())
names = []
for sec in [bench.HEADLINE, bench.R4_OPS, bench.R5_OPS, bench.R6_OPS,
            bench.R7_OPS, bench.R8_OPS, bench.R9_OPS, bench.R10_OPS,
            bench.R11_OPS, bench.DIAGNOSTICS, bench.SCALE_OPS]:
    for n in sec:
        if n not in names:
            names.append(n)

hits = []
for name in names:
    if name not in queries:
        print(f"SKIP {name}", flush=True)
        continue
    try:
        df = queries[name](spark, SF_DIR)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # r12 ADVICE: don't silently exclude ops that cache ONE
        # intermediate but still duplicate raw scans elsewhere — count
        # parquet scans regardless of cache presence, and report the
        # cache-read count alongside so a reviewer can judge whether the
        # remaining raw scans are genuine duplicates.
        n_cached = plan.count("InMemoryTableScan")
        scans = {t: plan.count(f"{t}.parquet") for t in TABLES}
        scans = {t: c for t, c in scans.items() if c >= THRESHOLD}
        if scans and plan.count("ReusedExchange") == 0:
            hits.append((name, scans, n_cached))
            print(f"LEAD {name}: {scans} (cache_reads={n_cached})", flush=True)
    except Exception as ex:
        print(f"ERR {name}: {type(ex).__name__}: {str(ex)[:120]}", flush=True)

print("\n=== RESULT ===")
print(f"{len(hits)} leads (threshold {THRESHOLD}, no exchange reuse; cache reads reported)")
for name, scans, n_cached in hits:
    print(f"  {name}: {scans} (cache_reads={n_cached})")
