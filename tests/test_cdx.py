"""CDX(J) web-archive index tier: SURT canonicalization, CDXJ parsing,
and byte-range fetch planning (sources/cdx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestSurtKey:
    def test_canonicalization_rules(self, spark):
        from hgraphstorage_spark.sources.cdx import surt_key

        cases = [
            ("https://www.Example.com:443/A/b?b=2&a=1#f", "com,example)/a/b?a=1&b=2"),
            ("http://example.com:80/", "com,example)/"),
            ("https://user:pw@sub.site.org/p", "org,site,sub)/p"),
            ("example.com", "com,example)/"),  # schemeless
            ("https://www2.host.net?q=1", "net,host)/?q=1"),  # query, no path
            ("https://host.net/path/", "net,host)/path/"),
            ("HTTPS://HOST.NET/UPPER", "net,host)/upper"),
            # r10 (r9 ADVICE): a NON-default port survives and attaches
            # AFTER the reversed labels — the SURT/pywb convention — so
            # externally built CDX indexes agree on the key; default
            # ports still strip even when combined with www/userinfo
            ("http://example.com:8080/a", "com,example:8080)/a"),
            ("https://www.Sub.Example.org:8443/x?b=1&a=2", "org,example,sub:8443)/x?a=2&b=1"),
            ("http://user@www.ex.com:80/p", "com,ex)/p"),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
        assert got == [want for _, want in cases]

    def test_key_is_variant_stable(self, spark):
        """The property that makes it a lookup key: scheme, www, default
        port, arg order, case, and fragment variants all key equal."""
        from hgraphstorage_spark.sources.cdx import surt_key

        variants = [
            "https://www.ex.com/p?a=1&b=2",
            "http://ex.com/p?b=2&a=1",
            "https://EX.com:443/p?a=1&b=2#frag",
            "ex.com/p?b=2&a=1",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "url string")
        keys = {r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()}
        assert keys == {"com,ex)/p?a=1&b=2"}


class TestParseCdxj:
    def test_typed_fields_and_malformed_lines(self, spark):
        import datetime

        from hgraphstorage_spark.sources.cdx import parse_cdxj

        good = (
            'com,example)/a 20240301123456 {"url": "https://example.com/a", '
            '"status": "200", "mime": "text/html", "digest": "sha1:AB", '
            '"length": "512", "offset": "1024", "filename": "shard0.warc.gz"}'
        )
        bad_ts = (
            'com,example)/b 2024XX01123456 {"url": "https://example.com/b", '
            '"length": "1", "offset": "2", "filename": "f"}'
        )
        no_json = "com,example)/c 20240301000000"
        df = spark.createDataFrame(
            [(1, good), (2, bad_ts), (3, no_json)], "id long, line string"
        )
        got = {r["id"]: r for r in parse_cdxj(df).collect()}
        g = got[1]
        assert g["urlkey"] == "com,example)/a"
        assert g["fetch_ts"] == datetime.datetime(2024, 3, 1, 12, 34, 56)
        assert (g["status"], g["length"], g["offset"]) == (200, 512, 1024)
        assert g["filename"] == "shard0.warc.gz" and g["mime"] == "text/html"
        assert got[2]["fetch_ts"] is None  # malformed ts -> NULL, no crash
        assert got[2]["offset"] == 2
        assert got[3]["url"] is None and got[3]["offset"] is None

    def test_zero_shuffle_plan(self, spark):
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.cdx import parse_cdxj

        df = spark.createDataFrame([("k 20240101000000 {}",)], "line string")
        plan = executed_plan(parse_cdxj(df))
        assert "Exchange" not in plan and "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCdxFetchPlan:
    def test_island_coalescing(self, spark):
        """Adjacent/overlapping/small-gap records merge into one range;
        a gap beyond the threshold starts a new range; per-file
        independence; NULL offsets dropped."""
        from hgraphstorage_spark.sources.cdx import cdx_fetch_plan

        rows = [
            # f1: [0,100) + [100,200) adjacent; [250,300) within gap=100;
            # [1000,1100) far -> second range
            ("f1", 0, 100), ("f1", 100, 100), ("f1", 250, 50), ("f1", 1000, 100),
            # f2: one record; plus a NULL-offset row that must drop
            ("f2", 10, 5), ("f2", None, 7),
        ]
        df = spark.createDataFrame(rows, "filename string, offset long, length long")
        got = sorted(
            (r["filename"], r["range_start"], r["range_end"], r["n_records"],
             r["record_bytes"], r["range_bytes"])
            for r in cdx_fetch_plan(df, max_gap_bytes=100).collect()
        )
        assert got == [
            ("f1", 0, 300, 3, 250, 300),
            ("f1", 1000, 1100, 1, 100, 100),
            ("f2", 10, 15, 1, 5, 5),
        ]

    def test_contained_record_does_not_split(self, spark):
        """A record fully inside the running covered span (out-of-order
        end offsets) must not open a new island — the island rule uses
        the running MAX end, not the previous row's end."""
        from hgraphstorage_spark.sources.cdx import cdx_fetch_plan

        rows = [("f", 0, 1000), ("f", 100, 10), ("f", 1050, 10)]
        df = spark.createDataFrame(rows, "filename string, offset long, length long")
        got = cdx_fetch_plan(df, max_gap_bytes=100).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["range_start"], r["range_end"], r["n_records"]) == (0, 1060, 3)

    def test_gap_zero_splits_everything_nonadjacent(self, spark):
        from hgraphstorage_spark.sources.cdx import cdx_fetch_plan

        rows = [("f", 0, 10), ("f", 10, 10), ("f", 21, 10)]
        df = spark.createDataFrame(rows, "filename string, offset long, length long")
        got = sorted(
            (r["range_start"], r["range_end"]) for r in
            cdx_fetch_plan(df, max_gap_bytes=0).collect()
        )
        assert got == [(0, 20), (21, 31)]


class TestCdxEndToEnd:
    def test_surt_roundtrip_through_cdxj(self, spark):
        """Generate CDXJ lines from URLs with surt_key, parse them back,
        and verify the parsed urlkey equals a fresh surt_key of the
        parsed url — the generator/lookup agreement that makes range
        resolution work."""
        from hgraphstorage_spark.sources.cdx import parse_cdxj, surt_key

        urls = ["https://www.a.com/x?b=2&a=1", "http://b.org/", "c.net/p/q"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        lines = df.select(
            F.concat(
                surt_key(F.col("url")),
                F.lit(' 20240301000000 {"url": "'),
                F.col("url"),
                F.lit('", "offset": "0", "length": "1", "filename": "f"}'),
            ).alias("line")
        )
        parsed = parse_cdxj(lines)
        mism = parsed.filter(
            surt_key(F.col("url")) != F.col("urlkey")
        ).count()
        assert mism == 0 and parsed.count() == 3


class TestCdxPlanProperties:
    def test_plan_invariants_random_offsets(self, spark):
        """Property sweep (hypothesis) over random record sets: every
        record byte-range is covered by exactly one planned range;
        ranges of one file are disjoint AND separated by more than the
        gap; record_bytes sums per file are conserved; range_bytes ==
        span. One Spark round-trip per example set is too slow, so the
        strategy generates several files per example and we run a
        handful of examples."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from hgraphstorage_spark.sources.cdx import cdx_fetch_plan

        recs = st.lists(
            st.tuples(
                st.sampled_from(["fa", "fb", "fc"]),
                st.integers(0, 5000),   # offset
                st.integers(1, 800),    # length
            ),
            min_size=1,
            max_size=40,
        )

        @settings(
            max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
        )
        @given(rows=recs)
        def run(rows):
            gap = 300
            df = spark.createDataFrame(
                rows, "filename string, offset long, length long"
            )
            plan = [
                (r["filename"], r["range_start"], r["range_end"],
                 r["record_bytes"], r["range_bytes"])
                for r in cdx_fetch_plan(df, max_gap_bytes=gap).collect()
            ]
            byf = {}
            for f, off, ln in rows:
                byf.setdefault(f, []).append((off, ln))
            for f, rs in byf.items():
                ranges = sorted(
                    (s, e, rb, sp) for (pf, s, e, rb, sp) in plan if pf == f
                )
                # coverage: every record inside exactly one range
                for off, ln in rs:
                    hits = [
                        (s, e) for s, e, _, _ in ranges if s <= off and off + ln <= e
                    ]
                    assert len(hits) == 1, (f, off, ln, ranges)
                # separation: consecutive ranges > gap apart
                for (s1, e1, _, _), (s2, e2, _, _) in zip(ranges, ranges[1:]):
                    assert s2 - e1 > gap, (f, ranges)
                # conservation + span
                assert sum(rb for _, _, rb, _ in ranges) == sum(l for _, l in rs)
                for s, e, _, sp in ranges:
                    assert sp == e - s

        run()


class TestWarcRandomAccess:
    def test_index_plan_ranged_read_round_trip(self, spark):
        """The full random-access loop on both layouts: shard →
        warc_record_index (byte spans: compressed member spans for .gz,
        frame spans for plain) → filter to wanted urls →
        cdx_fetch_plan → read_warc_ranges. The targeted read must
        return exactly the wanted records with payloads identical to
        the full read_warc scan."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.cdx import (
            cdx_fetch_plan,
            read_warc_ranges,
            warc_record_index,
        )
        from hgraphstorage_spark.sources.warc import read_warc, warc_bytes

        def resp(i):
            return {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i}>",
                    "WARC-Target-URI": f"https://t.com/p/{i}",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                "payload": f"HTTP/1.1 200 OK\r\n\r\nbody {i} ".encode() + b"x" * i,
            }

        recs = [resp(i) for i in range(8)]
        d = tempfile.mkdtemp(prefix="hgs_ra_")
        try:
            with open(f"{d}/plain.warc", "wb") as f:
                f.write(warc_bytes(recs))
            with open(f"{d}/members.warc.gz", "wb") as f:
                f.write(warc_bytes(recs, compress=True))
            idx = warc_record_index(spark, d)
            # index covers every record on both layouts, keyed by SURT
            assert idx.count() == 16
            assert idx.filter("urlkey = 'com,t)/p/3'").count() == 2
            # want three urls; gap=0 so only truly adjacent spans merge
            wanted = idx.filter(F.col("target_uri").isin(
                "https://t.com/p/1", "https://t.com/p/2", "https://t.com/p/6"
            ))
            plan = cdx_fetch_plan(wanted, max_gap_bytes=0)
            got = read_warc_ranges(spark, plan).collect()
            # exactly the wanted records, from both shards
            assert len(got) == 6
            by_shard = {}
            for r in got:
                key = r["shard"].rsplit("/", 1)[-1]
                by_shard.setdefault(key, set()).add(r["target_uri"])
            want_uris = {f"https://t.com/p/{i}" for i in (1, 2, 6)}
            assert by_shard["plain.warc"] == want_uris
            assert by_shard["members.warc.gz"] == want_uris
            # payload parity with the full scan
            full = {
                (r["shard"], r["target_uri"]): bytes(r["payload"])
                for r in read_warc(spark, d).collect()
            }
            for r in got:
                assert bytes(r["payload"]) == full[(r["shard"], r["target_uri"])]
            # adjacency actually coalesced: records 1+2 are contiguous in
            # the plain shard, so its plan has 2 ranges, not 3
            n_plain = plan.filter(F.col("filename").endswith("plain.warc")).count()
            assert n_plain == 2
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestFormatCdxj:
    def test_parse_format_parse_identity(self, spark):
        """parse ∘ format == identity on the typed fields (the
        round-trip law): formatting a parsed frame and re-parsing gives
        byte-identical typed columns, including NULL-field omission and
        the malformed-timestamp passthrough."""
        from hgraphstorage_spark.sources.cdx import format_cdxj, parse_cdxj

        lines = [
            'com,example)/a 20240301123456 {"url": "https://example.com/a", '
            '"status": "200", "mime": "text/html", "digest": "sha1:AB", '
            '"length": "512", "offset": "1024", "filename": "shard0.warc.gz"}',
            # sparse json (no mime/digest) + impossible month ts
            'com,example)/b 20241399000000 {"url": "https://example.com/b", '
            '"length": "1", "offset": "2", "filename": "f"}',
        ]
        p1 = parse_cdxj(spark.createDataFrame([(l,) for l in lines], "line string"))
        p2 = parse_cdxj(format_cdxj(p1))
        cols = sorted(p1.columns)
        assert sorted(p2.columns) == cols
        r1 = sorted(map(tuple, p1.select(*cols).collect()), key=str)
        r2 = sorted(map(tuple, p2.select(*cols).collect()), key=str)
        assert r1 == r2
        # NULL fields are OMITTED from the json (CDXJ convention)
        line_b = [
            r["line"] for r in format_cdxj(p1).collect() if ")/b" in r["line"]
        ][0]
        assert '"mime"' not in line_b and '"digest"' not in line_b

    def test_record_index_formats_directly(self, spark):
        """A warc_record_index-shaped frame (no status/mime/digest, ts
        from warc_date absent → fetch_ts fallback absent too) formats
        without errors and re-parses to its spans."""
        from hgraphstorage_spark.sources.cdx import format_cdxj, parse_cdxj

        idx = spark.createDataFrame(
            [("com,t)/p", "f.warc.gz", 0, 100)],
            "urlkey string, filename string, offset long, length long",
        )
        out = parse_cdxj(format_cdxj(idx)).collect()[0]
        assert (out["urlkey"], out["offset"], out["length"], out["filename"]) == (
            "com,t)/p", 0, 100, "f.warc.gz"
        )
        assert out["timestamp14"] == "-" or out["timestamp14"] is None

    def test_zero_shuffle_plan(self, spark):
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.cdx import format_cdxj

        df = spark.createDataFrame(
            [], "urlkey string, timestamp14 string, url string, status int, "
            "mime string, digest string, length long, offset long, filename string"
        )
        plan = executed_plan(format_cdxj(df))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCdxLookup:
    def test_variant_probes_resolve_latest(self, spark):
        """Probe URLs in ANY surt-equal variant resolve; latest_only
        keeps the most recent capture per probe; misses return no row;
        the probe side is broadcast (the index never shuffles)."""
        from hgraphstorage_spark.sources.cdx import cdx_lookup, parse_cdxj

        lines = [
            'com,ex)/p?a=1&b=2 20240101000000 {"url": "https://ex.com/p?a=1&b=2", '
            '"offset": "0", "length": "10", "filename": "f1"}',
            'com,ex)/p?a=1&b=2 20240301000000 {"url": "https://ex.com/p?b=2&a=1", '
            '"offset": "50", "length": "10", "filename": "f2"}',
            'com,other)/q 20240201000000 {"url": "https://other.com/q", '
            '"offset": "7", "length": "3", "filename": "f3"}',
        ]
        idx = parse_cdxj(
            spark.createDataFrame([(l,) for l in lines], "line string")
        )
        probes = spark.createDataFrame(
            [("http://WWW.ex.com/p?b=2&a=1",), ("https://missing.net/x",)],
            "url string",
        )
        got = cdx_lookup(idx, probes).collect()
        assert len(got) == 1
        r = got[0]
        assert r["url"] == "http://WWW.ex.com/p?b=2&a=1"  # probe form kept
        assert r["timestamp14"] == "20240301000000"  # latest capture
        assert (r["offset"], r["filename"]) == (50, "f2")
        assert r["index_url"] == "https://ex.com/p?b=2&a=1"
        # full history mode returns both captures
        hist = cdx_lookup(idx, probes, latest_only=False)
        assert hist.count() == 2
        plan = hist._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_equal_timestamp_tie_breaks_numerically_on_offset(self, spark):
        """Equal-timestamp captures tie-break on the NUMERIC offset:
        offset 100 beats offset 9 (the unpadded string key ordered them
        lexicographically — r9 ADVICE fix pins the lpad)."""
        from hgraphstorage_spark.sources.cdx import cdx_lookup, parse_cdxj

        lines = [
            'com,tie)/p 20240101000000 {"url": "https://tie.com/p", '
            '"offset": "9", "length": "10", "filename": "f1"}',
            'com,tie)/p 20240101000000 {"url": "https://tie.com/p", '
            '"offset": "100", "length": "10", "filename": "f0"}',
        ]
        idx = parse_cdxj(spark.createDataFrame([(l,) for l in lines], "line string"))
        probes = spark.createDataFrame([("https://tie.com/p",)], "url string")
        got = cdx_lookup(idx, probes).collect()
        assert len(got) == 1
        assert got[0]["offset"] == 100  # numeric, not lexicographic

    def test_null_offset_sorts_below_offset_zero(self, spark):
        """r11 ADVICE pin: a NULL-offset capture at an equal timestamp
        sorts BELOW a real offset-0 capture (the r9 lpad fix padded
        NULL to nineteen zeros — byte-identical to a real offset 0, so
        the two tied and the winner was the arbitrary filename leg)."""
        from pyspark.sql import functions as F

        from hgraphstorage_spark.sources.cdx import cdx_lookup, parse_cdxj

        lines = [
            # NULL offset, filename sorts HIGH — under the old all-zeros
            # padding this row ties on offset and wins on filename
            'com,nul)/p 20240101000000 {"url": "https://nul.com/p", '
            '"length": "10", "filename": "zzz"}',
            'com,nul)/p 20240101000000 {"url": "https://nul.com/p", '
            '"offset": "0", "length": "10", "filename": "aaa"}',
        ]
        idx = parse_cdxj(spark.createDataFrame([(l,) for l in lines], "line string"))
        assert idx.where(F.col("offset").isNull()).count() == 1  # fixture honest
        probes = spark.createDataFrame([("https://nul.com/p",)], "url string")
        got = cdx_lookup(idx, probes).collect()
        assert len(got) == 1
        assert got[0]["offset"] == 0 and got[0]["filename"] == "aaa"

    def test_lookup_against_record_index(self, spark):
        """The same lookup works against a warc_record_index frame
        (warc_date recency key) — probe → spans, ready for
        cdx_fetch_plan."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.cdx import (
            cdx_fetch_plan,
            cdx_lookup,
            read_warc_ranges,
            warc_record_index,
        )
        from hgraphstorage_spark.sources.warc import warc_bytes

        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i}>",
                    "WARC-Target-URI": f"https://t.com/p/{i}",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                "payload": f"HTTP/1.1 200 OK\r\n\r\nbody {i}".encode(),
            }
            for i in range(4)
        ]
        d = tempfile.mkdtemp(prefix="hgs_lkp_")
        try:
            with open(f"{d}/s.warc.gz", "wb") as f:
                f.write(warc_bytes(recs, compress=True))
            idx = warc_record_index(spark, d)
            probes = spark.createDataFrame(
                [("https://WWW.t.com/p/2",)], "url string"
            )
            spans = cdx_lookup(idx, probes)
            fetched = read_warc_ranges(
                spark, cdx_fetch_plan(spans, max_gap_bytes=0)
            ).collect()
            assert len(fetched) == 1
            assert fetched[0]["target_uri"] == "https://t.com/p/2"
            assert bytes(fetched[0]["payload"]).endswith(b"body 2")
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestUrlChangeRate:
    def test_counts_span_and_caveats(self, spark):
        """Distinct digests lower-bound true changes (A->B->A counts 2
        versions); NULL digests never count a version; NULL timestamps
        never count toward the span; single-capture keys have NULL
        change_rate (no revisit evidence); a stable key reads 0."""
        import datetime as dt
        from decimal import Decimal

        from hgraphstorage_spark.sources.cdx import url_change_rate

        T = lambda d: dt.datetime(2024, 1, d, 12, 0, 0)  # noqa: E731
        rows = [
            # flapping A->B->A over 10 days: 3 captures, 2 versions
            ("k1", T(1), "A"), ("k1", T(6), "B"), ("k1", T(11), "A"),
            # stable: 3 captures, 1 version -> rate 0, interval NULL
            ("k2", T(1), "X"), ("k2", T(5), "X"), ("k2", T(9), "X"),
            # null digest ignored for versions, null ts ignored for span
            ("k3", T(1), "P"), ("k3", None, "Q"), ("k3", T(3), None),
            # solo capture
            ("k4", T(2), "Z"),
            # multi-capture key whose digests are ALL NULL: zero version
            # evidence — change_rate must be NULL, never the negative
            # (0-1)/(n-1) the unguarded formula produced (r9 ADVICE fix)
            ("k5", T(1), None), ("k5", T(4), None), ("k5", T(9), None),
        ]
        df = spark.createDataFrame(rows, "urlkey string, fetch_ts timestamp, digest string")
        got = {r["urlkey"]: r for r in url_change_rate(df).collect()}
        k1 = got["k1"]
        assert (k1["n_captures"], k1["n_versions"]) == (3, 2)
        assert k1["change_rate"] == Decimal("0.500000")
        assert k1["est_change_interval_days"] == Decimal("10.000000")
        k2 = got["k2"]
        assert k2["change_rate"] == Decimal("0.000000")
        assert k2["est_change_interval_days"] is None  # nothing ever changed
        k3 = got["k3"]
        assert (k3["n_captures"], k3["n_versions"]) == (3, 2)  # NULL digest out
        assert k3["first_ts"] == T(1) and k3["last_ts"] == T(3)  # NULL ts out
        k4 = got["k4"]
        assert k4["change_rate"] is None and k4["est_change_interval_days"] is None
        k5 = got["k5"]
        assert (k5["n_captures"], k5["n_versions"]) == (3, 0)
        assert k5["change_rate"] is None  # no evidence, not negative
        assert k5["est_change_interval_days"] is None
