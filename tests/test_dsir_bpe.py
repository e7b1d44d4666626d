"""DSIR importance resampling (pipeline.sampling) and BPE merge training
(pipeline.text): exact replay against independent pure-Python references
(hash-bucketed n-gram models with Decimal canonicalization; greedy
left-to-right merge application), plus behavioral sanity checks."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _words(t: str) -> list[str]:
    return [w for w in _WS.split(t.strip().lower()) if w]


def _round6(v: float) -> Decimal:
    return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


# -- DSIR reference ----------------------------------------------------------


def _grams(t: str) -> list[str]:
    ws = _words(t)
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _bucket(g: str, salt: str, n_buckets: int) -> int:
    return int(hashlib.md5(f"{g}:{salt}".encode()).hexdigest()[:15], 16) % n_buckets


def _ref_dsir(raw: dict, tgt: dict, n_buckets: int, salt: str = "dsir"):
    raw_b = {i: [_bucket(g, salt, n_buckets) for g in _grams(t)] for i, t in raw.items()}
    tgt_b = [_bucket(g, salt, n_buckets) for t in tgt.values() for g in _grams(t)]
    cr = Counter(b for bs in raw_b.values() for b in bs)
    ct = Counter(tgt_b)
    tr, tt = sum(cr.values()), len(tgt_b)

    def ratio(b):
        return _round6(
            math.log((ct.get(b, 0) + 1) / (tt + n_buckets))
            - math.log((cr.get(b, 0) + 1) / (tr + n_buckets))
        )

    return {i: (len(bs), sum(ratio(b) for b in bs)) for i, bs in raw_b.items()}


RAW = {
    0: "football match score goal team stadium crowd",
    1: "recipe flour butter sugar oven bake cake",
    2: "goal keeper save penalty football final whistle",
    3: "stir the sauce add butter and sugar then bake",
    4: "market stock price trade index fund",
}
TGT = {
    100: "bake the cake with flour butter and sugar",
    101: "oven temperature for the cake recipe",
    102: "butter and sugar cream together then bake",
}


def _mkdocs(spark, d):
    return spark.createDataFrame(list(d.items()), "doc_id long, text string")


def test_dsir_weights_match_reference(spark):
    from hgraphstorage_spark.pipeline.sampling import dsir_weights

    got = {
        r["doc_id"]: (r["n_grams"], str(r["log_weight"]))
        for r in dsir_weights(_mkdocs(spark, RAW), _mkdocs(spark, TGT), n_buckets=64, hash_mode="md5").collect()
    }
    want = {i: (n, str(s)) for i, (n, s) in _ref_dsir(RAW, TGT, 64).items()}
    assert got == want


def test_dsir_ranks_target_like_docs_higher(spark):
    """Cooking-like raw docs must outscore sports/finance docs against a
    cooking target — the signal the operator exists for."""
    from hgraphstorage_spark.pipeline.sampling import dsir_weights

    w = {
        r["doc_id"]: float(r["log_weight"])
        for r in dsir_weights(_mkdocs(spark, RAW), _mkdocs(spark, TGT), n_buckets=64, hash_mode="md5").collect()
    }
    cooking = {1, 3}
    other = {0, 2, 4}
    assert min(w[i] for i in cooking) > max(w[i] for i in other), w


def test_dsir_sample_matches_gumbel_reference(spark):
    from hgraphstorage_spark.pipeline.sampling import dsir_sample

    ref = _ref_dsir(RAW, TGT, 64)
    keys = {}
    for i, (_, lw) in ref.items():
        h = int(hashlib.md5(f"{i}:dsir:gumbel".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        keys[i] = _round6(float(lw) - math.log(-math.log(u)))
    want = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [
        (r["doc_id"], Decimal(str(r["gumbel_key"])))
        for r in dsir_sample(_mkdocs(spark, RAW), _mkdocs(spark, TGT), k=3, n_buckets=64, hash_mode="md5").collect()
    ]
    assert got == want


# -- BPE reference -----------------------------------------------------------


def _ref_bpe(texts: list[str], n_merges: int):
    words = Counter(w for t in texts for w in _words(t))
    vocab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, n in words.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (a, b), n_pairs = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, n_pairs))
        for w in vocab:
            syms, out = vocab[w], []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


BPE_TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide slow slower",
]


def test_bpe_merge_counts_match_reference(spark):
    from hgraphstorage_spark.pipeline.text import bpe_merge_counts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BPE_TEXTS)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["sym_a"], r["sym_b"], r["n_pairs"])
        for r in bpe_merge_counts(docs, top_k=10).orderBy("rank").collect()
    ]
    words = Counter(w for t in BPE_TEXTS for w in _words(t))
    pc = Counter()
    for w, n in words.items():
        syms = list(w) + ["</w>"]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:10]
    want = [(i + 1, a, b, n) for i, ((a, b), n) in enumerate(want)]
    assert got == want


def test_bpe_train_matches_reference(spark):
    from hgraphstorage_spark.pipeline.text import bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BPE_TEXTS)], "doc_id long, text string"
    )
    merges, vocab = bpe_train(docs, n_merges=6)
    got_merges = [(m["step"], m["sym_a"], m["sym_b"], m["n_pairs"]) for m in merges]
    want_merges, want_vocab = _ref_bpe(BPE_TEXTS, 6)
    assert got_merges == want_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_vocab == want_vocab


def test_bpe_train_learns_frequent_subword(spark):
    """'low' appears often — after a few merges its whole form plus the
    end marker should fuse into single symbols (the point of BPE)."""
    from hgraphstorage_spark.pipeline.text import bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BPE_TEXTS)], "doc_id long, text string"
    )
    _, vocab = bpe_train(docs, n_merges=12)
    syms = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert len(syms["low"]) <= 2, syms["low"]
    assert len(syms["wide"]) <= 2, syms["wide"]


def test_dsir_fast_mode_deterministic_and_same_shape(spark):
    """The xxhash64 fast path (default): same schema and row coverage as
    md5 mode, deterministic across runs, and the same target-vs-other
    separation (bucket family changes, the signal does not)."""
    from hgraphstorage_spark.pipeline.sampling import dsir_weights

    a = {
        r["doc_id"]: (r["n_grams"], str(r["log_weight"]))
        for r in dsir_weights(_mkdocs(spark, RAW), _mkdocs(spark, TGT), n_buckets=64).collect()
    }
    b = {
        r["doc_id"]: (r["n_grams"], str(r["log_weight"]))
        for r in dsir_weights(_mkdocs(spark, RAW), _mkdocs(spark, TGT), n_buckets=64).collect()
    }
    assert a == b and set(a) == set(RAW)
    w = {i: float(lw) for i, (_, lw) in a.items()}
    assert min(w[i] for i in (1, 3)) > max(w[i] for i in (0, 2, 4)), w


def test_bpe_apply_matches_reference_tokenization(spark):
    """Train on the corpus, then encode it: per-doc token counts must
    equal the pure-Python greedy merge application."""
    from hgraphstorage_spark.pipeline.text import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BPE_TEXTS)], "doc_id long, text string"
    )
    merges, _ = bpe_train(docs, n_merges=6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_apply(docs, merges).collect()
    }
    _, vocab = _ref_bpe(BPE_TEXTS, 6)
    want = {}
    for i, t in enumerate(BPE_TEXTS):
        ws = _words(t)
        want[i] = (len(ws), sum(len(vocab[w]) for w in ws))
    assert got == want
    # training must compress: fewer tokens than raw chars+markers
    raw = {i: sum(len(w) + 1 for w in _words(t)) for i, t in enumerate(BPE_TEXTS)}
    assert all(got[i][1] < raw[i] for i in got)
