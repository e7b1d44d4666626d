"""Duplicate-compute sweep: flag window rows and benched headline ops
whose FINAL executed plan scans the same source table three or more
times with no exchange reuse and no cache read — the signature of a
DataFrame referenced by multiple plan branches without a persist /
localCheckpoint barrier, which Catalyst replays from the raw scan per
branch.

Round-12 findings (all fixed, plan-pinned in
tests/test_model_and_plans.py): funnel replayed its whole prefix down
both references of the running frame (seven event-source scans at
k=3, compounding ~2^k with funnel depth); semantic_dedup (5 embeddings
scans), embedding_outliers (4), datasheet (6 document scans),
exact_substring_dedup (tokenize x3 / gram-hash x2), bm25's token
histogram (4), aggregate_messages and degrees (full derivation
replayed once per message/degree direction — fixed by exploding both
endpoints from one pass).

Interpretation guide, learned the measured way:
- A hit is a LEAD, not automatically a bug: branches that prune BELOW
  the duplicated subtree (bm25's matched branch reads an isin-pruned
  histogram) can be cheaper re-computed than served from a persisted
  full-width frame — persisting bm25's histogram DOUBLED the op.
  Persist what fans out at full width; A/B the wall either way in
  matched min-of-N conditions before keeping a persist.
- Post-fix, plan-string scan counts become misleading:
  InMemoryTableScan nodes print their cached child plan, so raw
  substring counts RISE. Count InMemoryTableScan > 0 as "served from
  cache" and stop there.
- 2 scans is usually legitimate (self-joins, split corpora); the
  threshold here is >= 3.

Run from the repo root on an otherwise quiet box (executes every
query once at sf0.001): python tools/sweep_duplicate_scans.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "documents events embeddings lineitem orders customer supplier part nation region".split()
)
THRESHOLD = 3

spark = get_spark("dup-scan-sweep")
queries = dict(entry_mod.queries())
queries.update(bench._fast_variants())
names = list(entry_mod.queries())[:50] + [
    n for n in bench.HEADLINE + bench.R11_OPS if n not in list(entry_mod.queries())[:50]
]

hits = []
seen = set()
for name in names:
    if name in seen or name not in queries:
        continue
    seen.add(name)
    try:
        df = queries[name](spark, SF_DIR)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        if plan.count("InMemoryTableScan"):
            continue  # fan-out already served from cache
        scans = {t: plan.count(f"{t}.parquet") for t in TABLES}
        scans = {t: c for t, c in scans.items() if c >= THRESHOLD}
        if scans and plan.count("ReusedExchange") == 0:
            hits.append((name, scans))
            print(f"LEAD {name}: {scans}", flush=True)
    except Exception as ex:  # a broken row is the replica suite's job, not ours
        print(f"ERR {name}: {type(ex).__name__}: {str(ex)[:120]}", flush=True)

print("\n=== RESULT ===")
print(f"{len(hits)} leads (threshold {THRESHOLD} scans, no reuse, no cache)")
for name, scans in hits:
    print(f"  {name}: {scans}")
