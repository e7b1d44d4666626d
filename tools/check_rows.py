"""Strict driver-hash oracle check of NAMED registry rows (argv), same
hash convention as tools/sweep_driver_hash.py. Usage:

    python tools/check_rows.py agg_messages modularity embed_near_dup_lsh
"""
import hashlib
import math
import os
import sys

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
    rows = sorted(
        tuple(_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    spark = get_spark("row-check")
    Q = entry_mod.queries()
    O = entry_mod.oracle_sql()
    names = sys.argv[1:]
    bad = []
    for name in names:
        if name not in Q or name not in O:
            print(f"{name}: NOT IN REGISTRY/ORACLE", flush=True)
            bad.append(name)
            continue
        spdf = Q[name](spark, SF_DIR).toPandas()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        ddf = con.sql(O[name]).df()
        ok = (
            sorted(spdf.columns) == sorted(ddf.columns)
            and len(spdf) == len(ddf)
            and _hash_frame(spdf) == _hash_frame(ddf)
        )
        print(f"{name}: {'GREEN' if ok else 'MISMATCH'} ({len(spdf)} rows)", flush=True)
        if not ok:
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} strict-hash green")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
