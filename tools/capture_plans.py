"""Capture `.explain("formatted")` output for named queries into
plans/r12/<name>_<suffix>.txt — the round-12 optimization evidence the
judge reads instead of running Spark.

Usage (repo root):
    python tools/capture_plans.py <suffix> <query> [<query> ...]
    python tools/capture_plans.py before funnel semantic_dedup

The suffix is normally "before" (pre-change plan, run from a worktree
checked out at the pre-optimization commit) or "after" (HEAD). Queries
resolve from the registry first, then bench._fast_variants(). The plan
captured is the FINAL dataframe's formatted plan plus, because several
iterative ops return a frame whose plan reads a converged
localCheckpoint (the iteration shuffles live in the checkpointed
rounds), the EXECUTED plan string after one count() so InMemoryTableScan
/ ReusedExchange nodes and AQE's final shape are visible too.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLAN_OUT", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture")
    queries = dict(entry_mod.queries())
    queries.update(bench._fast_variants())
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not in registry or fast variants")
            continue
        try:
            df = queries[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            formatted = buf.getvalue()
            df.count()
            executed = df._jdf.queryExecution().executedPlan().toString()
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(f"# {name} — {suffix} (sf_dir={SF_DIR})\n")
                f.write("## explain('formatted') of the returned frame\n\n")
                f.write(formatted)
                f.write("\n## executed plan after count() (AQE-final, cache-visible)\n\n")
                f.write(executed)
            print(f"WROTE {path}")
        except Exception as ex:
            print(f"ERR {name}: {type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    main()
