"""Property-based tests (hypothesis) — the reference's QuickCheck layer
(``STMGraph/test/.../TypesSpec.hs:37-78``): value serialization round-trips
and traversal-algebra laws."""


from __future__ import annotations

import pytest

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hgraphstorage_spark import schemas

# -- value round-trips (no Spark needed) ------------------------------------

values = st.one_of(
    st.text(max_size=50),
    st.integers(min_value=-(10**30), max_value=10**30),
    st.binary(max_size=50),
    st.dictionaries(st.text(max_size=8), st.integers(-100, 100), max_size=4),
)


@given(values)
def test_value_columns_roundtrip(v):
    """toBin/toValue round-trip (``FileOps.hs:281-308``): splitting a value
    into typed columns and reading back the canonical string is loss-free
    per dtype."""
    row = schemas.value_columns(v)
    dt = row["dtype"]
    assert dt == schemas.infer_dtype(v)
    populated = [k for k in ("text_v", "int_v", "bin_v", "json_v") if row[k] is not None]
    assert len(populated) == 1
    if dt == schemas.DT_TEXT:
        assert row["text_v"] == v
    elif dt == schemas.DT_INTEGER:
        assert int(row["int_v"]) == v
    elif dt == schemas.DT_BINARY:
        assert row["bin_v"] == bytes(v)
    else:
        assert json.loads(row["json_v"]) == v


@given(values)
def test_canonical_string_distinguishes_dtype_not_needed(v):
    s = schemas.canonical_string(v)
    assert isinstance(s, str)


@given(st.integers(-(10**30), 10**30))
def test_integer_text_same_name_different_property(i):
    """(name, dtype) is the property key (``Types.hs:338``): the integer i
    and the text str(i) must land in different columns."""
    as_int = schemas.value_columns(i)
    as_text = schemas.value_columns(str(i))
    assert as_int["dtype"] != as_text["dtype"]


# -- traversal algebra laws (small random graphs on Spark) -------------------

edge_lists = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6), st.sampled_from(["a", "b"])),
    min_size=0,
    max_size=12,
)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_both_is_in_plus_out(spark, edges):
    """Both ≡ In <> Out as bags (``API.hs:308-313``)."""
    from hgraphstorage_spark import GraphEngine, T

    eng = GraphEngine(spark)
    eng.add_nodes([("N", {}) for _ in range(6)])
    eng.add_edges([(s, d, lbl, {}) for s, d, lbl in edges])
    eng.commit()
    both = sorted(eng.traverse(T().nid(1).both("a")).ids())
    inn = eng.traverse(T().nid(1).in_("a")).ids()
    out = eng.traverse(T().nid(1).out("a")).ids()
    assert both == sorted(inn + out)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_has_then_out_subset_of_out(spark, edges):
    """Filter-then-traverse ⊆ traverse (monotonicity of Has)."""
    from collections import Counter

    from hgraphstorage_spark import GraphEngine, T

    eng = GraphEngine(spark)
    eng.add_nodes([("N", {"k": i}) for i in range(1, 7)])
    eng.add_edges([(s, d, lbl, {}) for s, d, lbl in edges])
    eng.commit()
    filtered = Counter(eng.traverse(T().ns().has("k", 1).out("a")).ids())
    full = Counter(eng.traverse(T().ns().out("a")).ids())
    assert all(filtered[k] <= full[k] for k in filtered)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_oute_then_out_equals_out(spark, edges):
    """edgesToNodes ∘ OutE ≡ Out (``API.hs:367-374``)."""
    from hgraphstorage_spark import GraphEngine, T

    eng = GraphEngine(spark)
    eng.add_nodes([("N", {}) for _ in range(6)])
    eng.add_edges([(s, d, lbl, {}) for s, d, lbl in edges])
    eng.commit()
    via_edges = sorted(eng.traverse(T().nid(2).out_e("a").out()).ids())
    direct = sorted(eng.traverse(T().nid(2).out("a")).ids())
    assert via_edges == direct


# -- dedup hashing laws ------------------------------------------------------

doc_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=60), min_size=2, max_size=6
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_texts)
def test_hashed_shingle_jaccard_equals_string_jaccard(spark, texts):
    """Jaccard over hashed word-shingles ≡ Jaccard over string shingles
    (the hash is injective modulo 64-bit collisions): validates replacing
    the string pipeline with the integer pipeline in dedup."""
    import re

    from hgraphstorage_spark.pipeline.dedup import shingle_hashes

    n = 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = {r["doc_id"]: set(r["sh"]) for r in shingle_hashes(docs, n=n).collect()}

    def string_shingles(t: str) -> set:
        words = re.split(r"\s+", t.strip().lower())
        if len(words) <= n:
            return {tuple(words + [None] * (n - len(words)))[:n]} if words else set()
        return {tuple(words[i : i + n]) for i in range(len(words) - n + 1)}

    for i, ti in enumerate(texts):
        for j, tj in enumerate(texts):
            if i >= j:
                continue
            a, b = sh[i], sh[j]
            jac_hash = len(a & b) / len(a | b) if a | b else 1.0
            sa, sb = string_shingles(ti), string_shingles(tj)
            jac_str = len(sa & sb) / len(sa | sb) if sa | sb else 1.0
            assert abs(jac_hash - jac_str) < 1e-9, (ti, tj)


# --- as-of join law: union+window plan == naive argmax join -----------------

asof_events = st.lists(
    st.tuples(
        st.integers(0, 3),      # key
        st.integers(0, 50),     # ts
        st.booleans(),          # side: True = left
    ),
    min_size=1,
    max_size=30,
)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=asof_events)
def test_asof_equals_naive_argmax(spark, rows):
    """The linear union+window as-of join must equal the quadratic
    definition: for each left row, the right row with the greatest
    ts <= left.ts of the same key (None if no such row)."""
    from hgraphstorage_spark.operators.asof import asof_join

    lefts = [(i, k, t) for i, (k, t, is_l) in enumerate(rows) if is_l]
    rights = [(i, k, t) for i, (k, t, is_l) in enumerate(rows) if not is_l]
    if not lefts or not rights:
        return
    # unique right value per (key, ts) so argmax is well-defined
    best = {}
    for i, k, t in rights:
        best[(k, t)] = max(best.get((k, t), -1), i)
    rights = [(i, k, t) for (k, t), i in best.items()]

    ldf = spark.createDataFrame(lefts, "rid long, k long, ts long")
    rdf = spark.createDataFrame(rights, "val long, k long, ts long")
    got = {
        r["rid"]: r["val_asof"]
        for r in asof_join(ldf, rdf, on="ts", by=["k"], value_cols=["val"]).collect()
    }
    for rid, k, t in lefts:
        cands = [(rt, v) for v, rk, rt in rights if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[rid] == want, (rid, k, t, got[rid], want)


# -- round-2 pure helpers ----------------------------------------------------


@given(st.integers(1, 512), st.integers(1, 512))
@settings(deadline=None)
def test_png_header_roundtrip(w, h):
    """Any dimensions written into a generated PNG parse back exactly."""
    from hgraphstorage_spark.pipeline.multimodal import parse_media_header, png_bytes

    assert parse_media_header(png_bytes(w, h)) == ("png", w, h, None)


@given(st.integers(1, 65000), st.integers(1, 65000))
@settings(deadline=None)
def test_jpeg_header_roundtrip(w, h):
    from hgraphstorage_spark.pipeline.multimodal import jpeg_header_bytes, parse_media_header

    assert parse_media_header(jpeg_header_bytes(w, h)) == ("jpeg", w, h, None)


@given(st.integers(0, 20_000))
@settings(deadline=None)
def test_wav_duration_roundtrip(ms):
    from hgraphstorage_spark.pipeline.multimodal import parse_media_header, wav_bytes

    assert parse_media_header(wav_bytes(ms)) == ("wav", None, None, ms)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
@settings(deadline=None)
def test_bmp_pixel_roundtrip(w, h, seed):
    """Any pixel content written into a generated 24-bit BMP decodes back
    bit-exactly (including rows needing stride padding) — the property
    that makes extract_features' BMP stats content-derived, not fake."""
    import numpy as np

    from hgraphstorage_spark.pipeline.multimodal import (
        bmp_array_bytes,
        decode_bmp_pixels,
        parse_media_header,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = bmp_array_bytes(px)
    assert parse_media_header(payload) == ("bmp", w, h, None)
    back = decode_bmp_pixels(payload)
    assert back is not None and back.shape == (h, w, 3)
    assert np.array_equal(back, px)


@given(st.integers(1, 2_000))
@settings(deadline=None)
def test_wav_sample_roundtrip(ms):
    """The deterministic sawtooth written by wav_bytes(pattern=True) reads
    back sample-exact through decode_wav_samples (8-bit unsigned PCM)."""
    import numpy as np

    from hgraphstorage_spark.pipeline.multimodal import decode_wav_samples, wav_bytes

    x = decode_wav_samples(wav_bytes(ms, pattern=True))
    n = ms * 8000 // 1000
    assert x is not None and x.size == n
    want = (np.array([(j * 17) % 256 for j in range(n)], dtype=np.float64) - 128.0) / 128.0
    assert np.array_equal(x, want)


@given(st.binary(max_size=64))
@settings(deadline=None)
def test_decoders_never_raise(payload):
    """Arbitrary bytes through the pixel/sample decoders: None or a valid
    array, never an exception."""
    from hgraphstorage_spark.pipeline.multimodal import decode_bmp_pixels, decode_wav_samples

    for out in (decode_bmp_pixels(payload), decode_wav_samples(payload)):
        assert out is None or out.size >= 0


@given(st.binary(max_size=64))
@settings(deadline=None)
def test_parse_media_header_never_raises(payload):
    """Arbitrary bytes: the probe returns None or a parse, never throws —
    the property that makes decode_ok=false honest on corrupt payloads."""
    from hgraphstorage_spark.pipeline.multimodal import parse_media_header

    result = parse_media_header(payload)
    assert result is None or (isinstance(result, tuple) and len(result) == 4)


@given(st.lists(st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4), max_size=30))
def test_modeldict_first_use_order_and_idempotence(names):
    """M8 upsert law: ids are dense in first-use order and re-noting an
    existing name never changes or grows the dictionary."""
    from hgraphstorage_spark.model import ModelDict

    m = ModelDict()
    first_ids = {}
    for n in names:
        got = m.note("node_type", n)
        if n not in first_ids:
            first_ids[n] = got
        assert m.note("node_type", n) == first_ids[n]  # idempotent
    distinct = list(dict.fromkeys(names))
    assert [first_ids[n] for n in distinct] == list(range(1, len(distinct) + 1))


# --- ExactSubstr law: Spark plan == brute-force Python reference ------------

substr_corpora = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=5,
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=substr_corpora)
def test_exact_substring_matches_bruteforce(spark, texts):
    """exact_substring_dedup == a brute-force reference that counts every
    n-gram occurrence corpus-wide, unions covered spans per doc, and
    rebuilds the kept token stream — exercising overlapping spans,
    within-doc + cross-doc duplication, and sub-n documents together."""
    from hgraphstorage_spark.pipeline.dedup import exact_substring_dedup

    n = 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["kept_text"])
        for r in exact_substring_dedup(docs, n=n).collect()
    }

    toks = {i: [w for w in t.strip().lower().split() if w] for i, t in enumerate(texts)}
    from collections import Counter

    counts = Counter()
    for tk in toks.values():
        for s in range(len(tk) - n + 1):
            counts[tuple(tk[s : s + n])] += 1
    for i, tk in toks.items():
        covered = set()
        for s in range(len(tk) - n + 1):
            if counts[tuple(tk[s : s + n])] >= 2:
                covered.update(range(s, s + n))
        kept = " ".join(w for j, w in enumerate(tk) if j not in covered)
        assert got[i] == (len(tk), len(covered), kept), (i, texts)


# --- Brandes law: layered Spark betweenness == reference Brandes ------------


@pytest.mark.slow
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_betweenness_matches_reference_brandes(spark, edges):
    """The layered forward-sigma / backward-delta frames equal textbook
    Brandes (queue + predecessor lists) with every node as a landmark —
    on arbitrary small multigraph shapes including cycles, self-loops,
    parallel edges, and disconnected nodes."""
    import collections

    from hgraphstorage_spark import GraphEngine
    from hgraphstorage_spark.analytics import betweenness

    eng = GraphEngine(spark)
    eng.add_nodes([("N", {}) for _ in range(6)])
    eng.add_edges([(s, d, lbl, {}) for s, d, lbl in edges])
    eng.commit()
    nodes = list(range(1, 7))
    got = {r["id"]: float(r["betweenness"]) for r in betweenness(eng.current, nodes).collect()}

    # reference: unweighted Brandes over the undirected simple graph
    adj = {v: set() for v in nodes}
    for s, d, _ in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    C = {v: 0.0 for v in nodes}
    for s in nodes:
        S = []
        P = collections.defaultdict(list)
        sigma = {v: 0 for v in nodes}
        sigma[s] = 1
        dist = {v: -1 for v in nodes}
        dist[s] = 0
        Q = collections.deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                C[w] += delta[w]
    for v in nodes:
        assert abs(got.get(v, 0.0) - round(C[v], 6)) < 1e-6, (v, edges)


# --- fuzzy-pair law: blocked plan == brute-force blocking contract ----------

fuzzy_corpora = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=20), min_size=2, max_size=6
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=fuzzy_corpora)
def test_fuzzy_pairs_match_bruteforce_contract(spark, texts):
    """fuzzy_dup_pairs == the documented contract evaluated naively:
    pairs sharing the normalized prefix whose length buckets are within
    one probe step, kept at Levenshtein <= max_dist — including the
    bounded-kernel and single-meeting dedup paths."""
    from hgraphstorage_spark.pipeline.dedup import fuzzy_dup_pairs

    P, BAND, D = 3, 4, 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_dup_pairs(docs, max_dist=D, prefix_len=P, len_band=BAND).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    norm = [t.strip().lower() for t in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = norm[i], norm[j]
            if a[:P] != b[:P]:
                continue
            if abs(len(a) // BAND - len(b) // BAND) > 1:
                continue
            d = lev(a, b)
            if d <= D:
                want[(i, j)] = d
    assert got == want, (texts, got, want)


# --- boilerplate-dedup law: hash-keyed plan == string-keyed brute force -----

bp_corpora = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", ""]), min_size=0, max_size=4).map(
        "\n".join
    ),
    min_size=1,
    max_size=6,
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=bp_corpora)
def test_boilerplate_dedup_matches_bruteforce(spark, texts):
    """boilerplate_dedup(line mode) == the rule evaluated naively: every
    eligible line whose corpus count >= min_count vanishes everywhere;
    short lines are exempt; order is preserved."""
    from hgraphstorage_spark.pipeline.text import boilerplate_dedup

    MIN_COUNT, MIN_CHARS = 2, 1
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_units"], r["n_kept"], r["text_dedup"])
        for r in boilerplate_dedup(
            docs, min_count=MIN_COUNT, min_chars=MIN_CHARS
        ).collect()
    }
    from collections import Counter

    counts = Counter(
        u
        for t in texts
        for u in t.split("\n")
        if len(u.strip()) >= MIN_CHARS
    )
    boiler = {u for u, c in counts.items() if c >= MIN_COUNT}
    for i, t in enumerate(texts):
        units = t.split("\n")
        kept = [
            u
            for u in units
            if not (len(u.strip()) >= MIN_CHARS and u in boiler)
        ]
        assert got[i] == (len(units), len(kept), "\n".join(kept)), (i, texts)


# --- containment law: hashed-shingle plan == string-set brute force ---------

cont_corpora = st.lists(
    st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=1, max_size=8).map(
        " ".join
    ),
    min_size=2,
    max_size=5,
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=cont_corpora)
def test_containment_pairs_match_bruteforce(spark, texts):
    from hgraphstorage_spark.pipeline.dedup import containment_pairs

    N, T = 2, 0.5
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            float(r["containment_a"]),
            float(r["containment_b"]),
        )
        for r in containment_pairs(docs, n=N, threshold=T).collect()
    }

    def shingles(t):
        ws = t.strip().lower().split()
        n_sh = max(len(ws) - (N - 1), 1)
        return {" ".join(ws[i : i + N]) for i in range(n_sh)}

    sets = [shingles(t) for t in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            ca, cb = round(inter / len(sets[i]), 6), round(inter / len(sets[j]), 6)
            if max(ca, cb) >= T:
                want[(i, j)] = (ca, cb)
    assert got == want, (texts, got, want)


# --- hot-shingle cap law: capped output ⊆ uncapped output -------------------


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=cont_corpora, cap=st.integers(1, 4))
def test_max_doc_freq_capped_subset_of_uncapped(spark, texts, cap):
    """VERDICT r4 task 4: dropping hot shingles from the candidate index
    (sizes stay uncapped) can only SHRINK intersection counts, so for any
    cap and threshold the capped pair set is a subset of the uncapped one
    and every surviving score is <= its uncapped score."""
    from hgraphstorage_spark.pipeline.dedup import containment_pairs, ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for fn, score_col, kw in (
        (ngram_jaccard_pairs, "jaccard", dict(n=2, threshold=0.25)),
        (containment_pairs, "containment_a", dict(n=2, threshold=0.4)),
    ):
        capped = {
            (r["doc_a"], r["doc_b"]): float(r[score_col])
            for r in fn(docs, max_doc_freq=cap, **kw).collect()
        }
        uncapped = {
            (r["doc_a"], r["doc_b"]): float(r[score_col])
            for r in fn(docs, **kw).collect()
        }
        assert set(capped) <= set(uncapped), (fn.__name__, capped, uncapped)
        for pair, s in capped.items():
            assert s <= uncapped[pair] + 1e-9, (fn.__name__, pair)


# --- sketch laws: CMS one-sidedness, HLL register determinism ---------------

cms_items = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1, max_size=40
)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=cms_items)
def test_cms_never_undercounts_any_width(spark, items):
    """CMS law (holds at ANY width, including collision-heavy ones):
    est(x) >= true count(x) for every item — the one-sided guarantee the
    Kirsch-Mitzenmacher double hash must preserve."""
    from collections import Counter

    from hgraphstorage_spark.functions.stats import cms_estimate, count_min_sketch

    df = spark.createDataFrame([(x,) for x in items], "item string")
    for width in (2, 8):
        sk = count_min_sketch(df, "item", width=width, depth=3)
        est = {
            r["item"]: r["est"]
            for r in cms_estimate(sk, df, "item", width, 3).collect()
        }
        true = Counter(items)
        for x, n in true.items():
            assert est[x] >= n


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=cms_items)
def test_hll_register_law_max_of_parts(spark, items):
    """Register law: for ANY split of the input, merge(sketch(A),
    sketch(B)) == sketch(A++B) — the property that makes HLL a CRDT."""
    from tests.conftest import bag
    from hgraphstorage_spark.functions.stats import hll_merge, hll_sketch

    half = len(items) // 2
    a = spark.createDataFrame([(x,) for x in items[:half]] or [("__e",)], "v string")
    b = spark.createDataFrame([(x,) for x in items[half:]] or [("__e",)], "v string")
    u = a.unionByName(b)
    assert bag(hll_merge(hll_sketch(a, "v"), hll_sketch(b, "v"))) == bag(hll_sketch(u, "v"))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    split=st.integers(0, 59),
    k=st.integers(1, 16),
)
@pytest.mark.slow
def test_quantile_sketch_merge_law_any_split(spark, vals, split, k):
    """Bottom-k register law: for ANY split of the rows (ids globally
    distinct) and ANY k, merge(sketch(A), sketch(B)) == sketch(A++B)
    exactly — the deterministic-mergeability property the family trades
    KLL's space bound for."""
    from tests.conftest import bag

    from hgraphstorage_spark.functions.stats import quantile_sketch, quantile_sketch_merge

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    cut = min(split, len(rows))
    # an empty side gets one (-1, 0.0) pad row; the union frame carries
    # the identical row multiset so the law is compared apples-to-apples
    left = rows[:cut] or [(-1, 0.0)]
    right = rows[cut:] or [(-1, 0.0)]
    mk = lambda rs: spark.createDataFrame(rs, "id long, v double")  # noqa: E731
    a, b, u = mk(left), mk(right), mk(left + right)
    sk = lambda df: quantile_sketch(df, "v", "id", k=k)  # noqa: E731
    assert bag(quantile_sketch_merge(sk(a), sk(b), k=k)) == bag(sk(u))


_html_frag = st.lists(
    st.sampled_from(
        [
            "<p>", "</p>", "<div>", "</div>", "<h2>", "</h2>", "<nav>", "</nav>",
            '<a href="/x">', "</a>", "the and of a to in it is was for on",
            "zz qq xx jj", "Words here", "", "&amp;", "<script>x</script>",
        ]
    ),
    min_size=0,
    max_size=12,
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(frags=_html_frag)
def test_context_pass_is_superset_on_random_pages(spark, frags):
    """jusText tier-2 law: promotion only ever ADDS blocks — on ANY page
    the context-free kept lines are a subset of the context pass's."""
    from hgraphstorage_spark.pipeline.extraction import extract_main_content

    html = "".join(frags)
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    base = extract_main_content(df).collect()[0]["content"]
    ctx = extract_main_content(df, context=True).collect()[0]["content"]
    assert set(base.split("\n")) - {""} <= set(ctx.split("\n")) - {""}


# --- r8: checksum-gate laws (Spark fold == the published algorithm) ---

def _py_luhn(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s), start=1):
        d = ord(ch) - 48
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _py_iban97(s: str) -> bool:
    r = s[4:] + s[:4]
    acc = 0
    for ch in r:
        if ch.isdigit():
            acc = (acc * 10 + ord(ch) - 48) % 97
        else:
            acc = (acc * 100 + ord(ch) - 55) % 97
    return acc == 1


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=13, max_size=16),
        min_size=1, max_size=24,
    )
)
def test_luhn_gate_matches_reference(spark, cands):
    """The Luhn Column fold (pipeline/pii.py:_luhn_pass) must agree with
    a direct implementation of ISO/IEC 7812 on arbitrary digit runs —
    AND with IBAN mod-97 on IBAN-shaped strings derived from them (the
    per-character remainder fold equals big-integer mod 97, which a
    32-bit accumulator can't do directly)."""
    from pyspark.sql import functions as F

    from hgraphstorage_spark.pipeline.pii import _iban97_pass, _luhn_pass

    ibans = ["DE" + c[:2] + c for c in cands]  # IBAN-shaped: 2 letters + digits
    df = spark.createDataFrame(list(zip(cands, ibans)), "c string, i string")
    rows = df.select(
        "c", "i",
        _luhn_pass(F.col("c")).alias("luhn"),
        _iban97_pass(F.col("i")).alias("iban"),
    ).collect()
    for r in rows:
        assert r["luhn"] == _py_luhn(r["c"]), r["c"]
        assert r["iban"] == _py_iban97(r["i"]), r["i"]
