"""Strict driver-hash replica over ALL registry rows, not just the
50-row window the driver hashes — run before a rotation to find latent
representation mismatches (r11: found two in 186 past-window rows,
token_budget_mix HUGEINT-as-float64 and char_entropy DECIMAL rendering;
both fixed and the full registry is hash-green since).

Run from the repo root: python tools/sweep_driver_hash.py
"""
import sys, os, math, hashlib, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import __spark_entry__ as entry_mod
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def _cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return repr(v)

def _hash_frame(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode()); h.update(b"\x1e")
    return h.hexdigest()

spark = get_spark("hash-sweep")
Q = entry_mod.queries(); O = entry_mod.oracle_sql()
names = list(Q)
window = set(names[:50])
todo = [n for n in names if n not in window and n in O]
print(f"sweeping {len(todo)} past-window rows", flush=True)
bad = []
for i, name in enumerate(todo):
    try:
        spdf = Q[name](spark, SF_DIR).toPandas()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        ddf = con.sql(O[name]).df()
        if sorted(spdf.columns) != sorted(ddf.columns):
            bad.append((name, f"cols {sorted(spdf.columns)} vs {sorted(ddf.columns)}"))
        elif len(spdf) != len(ddf):
            bad.append((name, f"rows {len(spdf)} vs {len(ddf)}"))
        elif _hash_frame(spdf) != _hash_frame(ddf):
            cols = sorted(spdf.columns)
            s_rows = sorted(tuple(_cell(v) for v in r) for r in spdf[cols].itertuples(index=False, name=None))
            d_rows = sorted(tuple(_cell(v) for v in r) for r in ddf[cols].itertuples(index=False, name=None))
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:2]
            bad.append((name, f"HASH mismatch, first diffs {str(diffs)[:400]}"))
    except Exception as ex:
        bad.append((name, f"ERR {type(ex).__name__}: {str(ex)[:200]}"))
    if (i+1) % 20 == 0:
        print(f"  {i+1}/{len(todo)} done, {len(bad)} bad", flush=True)
print("\n=== RESULT ===")
print(f"{len(todo)-len(bad)}/{len(todo)} strict-hash green")
for n, msg in bad:
    print("FAIL", n, "::", msg)
