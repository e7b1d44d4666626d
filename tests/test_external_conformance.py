"""External-conformance tests for the interchange formats (r10 VERDICT
task 4): parse fixtures/external/* — bytes hand-assembled from the
PUBLISHED Common Crawl / pywb conventions, NOT produced by this repo's
writers (see tools/make_fixture_external.py) — through parse_cdxj,
surt_key, cdx_lookup, and read_warc. The r9 SURT-port bug survived a
round because index and probe were both ours and agreed while both were
wrong; these fixtures carry the external field inventory
(mime-detected, languages, redirect, warc/revisit mimes, warcinfo
preambles, WARC-Block-Digest headers) so a divergence from the public
convention fails here instead of in production against a real CC index.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os

from pyspark.sql import functions as F

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "external",
)


class TestExternalCdxj:
    def _index(self, spark):
        from hgraphstorage_spark.sources.cdx import parse_cdxj

        with open(os.path.join(FIX, "cc_index.cdxj")) as f:
            lines = [(l,) for l in f.read().splitlines() if l]
        return parse_cdxj(spark.createDataFrame(lines, "line string"))

    def test_full_cc_field_inventory_parses_typed(self, spark):
        """Every line parses: string-typed numerics become LONG/INT,
        unknown JSON fields (mime-detected, languages, encoding,
        redirect) are ignored not fatal, revisit mime and 3xx/4xx
        statuses survive."""
        rows = {
            (r["urlkey"], r["timestamp14"]): r for r in self._index(spark).collect()
        }
        assert len(rows) == 5
        r = rows[("org,example)/", "20240722071249")]
        assert (r["status"], r["mime"], r["offset"], r["length"]) == (
            200, "text/html", 904, 1219,
        )
        assert r["digest"] == "MUIDVJIXS6XPVHUWNXTIXTH3ABWDL7A3"
        assert r["filename"].startswith("crawl-data/CC-MAIN-2024-30/")
        assert r["fetch_ts"] is not None
        rv = rows[("com,example)/path?a=1&b=2", "20240725093011")]
        assert rv["mime"] == "warc/revisit"
        # revisit shares the original capture's digest (the dedup economy)
        assert rv["digest"] == rows[("com,example)/path?a=1&b=2", "20240722080000")]["digest"]
        assert rows[("com,example)/old", "20240722081500")]["status"] == 301
        assert rows[("com,example:8080)/api", "20240722090210")]["status"] == 404

    def test_surt_key_agrees_with_external_urlkeys(self, spark):
        """THE conformance check: our surt_key over each line's url
        column reproduces the external index's urlkey byte-for-byte —
        root slash, www-strip + query sort, plain path, revisit, and
        the non-default-port placement (the r9 bug's exact case)."""
        from hgraphstorage_spark.sources.cdx import surt_key

        idx = self._index(spark)
        mismatched = idx.select(
            "urlkey", surt_key(F.col("url")).alias("ours")
        ).filter(F.col("ours") != F.col("urlkey"))
        assert mismatched.count() == 0

    def test_lookup_resolves_against_external_index(self, spark):
        """cdx_lookup over the external index: a probe URL in a variant
        form (https, no www, unsorted args) resolves to the LATEST
        capture of com,example)/path — which is the revisit record."""
        from hgraphstorage_spark.sources.cdx import cdx_lookup

        probes = spark.createDataFrame(
            [("https://example.com/path?b=2&a=1",)], "url string"
        )
        got = cdx_lookup(self._index(spark), probes).collect()
        assert len(got) == 1
        assert got[0]["timestamp14"] == "20240725093011"
        assert got[0]["mime"] == "warc/revisit"


class TestExternalCdxjWriteBack:
    def test_format_cdxj_field_subset_roundtrip(self, spark):
        """The WRITE half against external input: format_cdxj over the
        parsed external index emits lines whose urlkey + timestamp14
        match the external ones byte-for-byte and whose canonical JSON
        fields (url, status, mime, digest, length, offset, filename)
        re-parse to the same typed values. Fields outside the canonical
        set (mime-detected, languages, redirect, encoding) are DROPPED
        — the documented subset contract, pinned here so it stays a
        choice and not an accident."""
        from hgraphstorage_spark.sources.cdx import format_cdxj, parse_cdxj

        with open(os.path.join(FIX, "cc_index.cdxj")) as f:
            lines = [(l,) for l in f.read().splitlines() if l]
        parsed = parse_cdxj(spark.createDataFrame(lines, "line string"))
        out = format_cdxj(parsed)
        # keys survive byte-for-byte
        keys = {
            tuple(r["line"].split(" ", 2)[:2]) for r in out.collect()
        }
        want = {tuple(l[0].split(" ", 2)[:2]) for l in lines}
        assert keys == want
        # parse(format(parse(x))) == parse(x) on the canonical fields
        again = parse_cdxj(out)
        cols = [
            "urlkey", "timestamp14", "url", "status", "mime",
            "digest", "length", "offset", "filename",
        ]
        a = sorted(map(tuple, parsed.select(*cols).collect()))
        b = sorted(map(tuple, again.select(*cols).collect()))
        assert a == b


class TestExternalWet:
    def test_cc_wet_shard_reads_completely(self, spark):
        """read_warc over the CC-layout WET shard: the warcinfo
        preamble and both conversion records parse, the external-only
        headers (WARC-Block-Digest, WARC-Identified-Content-Language,
        WARC-Filename) survive into the headers map, payload bytes are
        exact (the committed digests verify against the payloads)."""
        from hgraphstorage_spark.sources.warc import read_warc

        rows = sorted(
            read_warc(spark, os.path.join(FIX, "cc_sample.warc.wet.gz")).collect(), key=lambda r: r["rec_idx"]
        )
        assert [r["warc_type"] for r in rows] == [
            "warcinfo", "conversion", "conversion",
        ]
        info = rows[0]
        assert info["content_type"] == "application/warc-fields"
        assert info["headers"]["warc-filename"].endswith(".warc.wet.gz")
        assert b"isPartOf: CC-MAIN-2024-30" in bytes(info["payload"])
        langs = []
        for r in rows[1:]:
            block = bytes(r["payload"])
            digest = "sha1:" + base64.b32encode(
                hashlib.sha1(block).digest()
            ).decode("ascii")
            assert r["headers"]["warc-block-digest"] == digest
            assert r["headers"]["warc-refers-to"].startswith("<urn:uuid:")
            assert r["content_type"] == "text/plain"
            langs.append(r["headers"]["warc-identified-content-language"])
        assert sorted(langs) == ["eng", "fra"]
        # the French text survives UTF-8 exact
        assert "séparés par des sauts de ligne" in bytes(
            rows[2]["payload"]
        ).decode("utf-8")

    def test_wet_indexable_and_text_only_consumable(self, spark):
        """The external shard is consumable by the same downstream the
        repo's own WET output feeds: warc_record_index sees one entry
        per record with compressed-member offsets, and conversion
        payloads are the text a WET consumer reads without touching
        HTML."""
        from hgraphstorage_spark.sources.cdx import warc_record_index

        idx = warc_record_index(spark, os.path.join(FIX, "cc_sample.warc.wet.gz")).collect()
        wet = [r for r in idx if r["warc_type"] == "conversion"]
        assert len(wet) == 2
        raw = open(os.path.join(FIX, "cc_sample.warc.wet.gz"), "rb").read()
        for r in wet:
            member = raw[r["offset"] : r["offset"] + r["length"]]
            assert gzip.decompress(member).startswith(b"WARC/1.0\r\n")

    def test_fixture_builder_is_reproducible(self):
        """Committed bytes == tools/make_fixture_external.py output, so
        every literal derived from them is re-derivable."""
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        )
        from tools.make_fixture_external import (
            CDXJ_LINES,
            ROBOTS_TXT,
            SITEMAP_INDEX_XML,
            SITEMAP_URLSET_XML,
            build_wet,
        )

        assert open(os.path.join(FIX, "cc_index.cdxj")).read() == (
            "\n".join(CDXJ_LINES) + "\n"
        )
        assert open(os.path.join(FIX, "cc_sample.warc.wet.gz"), "rb").read() == build_wet()
        assert open(os.path.join(FIX, "robots.txt"), "rb").read() == ROBOTS_TXT
        assert (
            open(os.path.join(FIX, "sitemap_index.xml"), encoding="utf-8").read()
            == SITEMAP_INDEX_XML
        )
        assert (
            open(os.path.join(FIX, "sitemap_urlset.xml"), encoding="utf-8").read()
            == SITEMAP_URLSET_XML
        )


class TestExternalRobotsSitemaps:
    """r12 VERDICT task 6: the robots/sitemaps tier gets the same
    external-conformance treatment as CDXJ/WET — fixtures hand-assembled
    from the PUBLISHED conventions (RFC 9309 + Google's parser docs +
    sitemaps.org's own examples), carrying the oddities our writers
    never emit: a UTF-8 BOM, CRLF, mixed-case directives, inline
    comments, an unknown Host: directive, wildcard/anchor rule paths,
    XML declarations + protocol namespaces + foreign-namespace children
    inside entry blocks. The expected literals these tests pin are the
    SAME literals the in-window robots_extras / sitemap_ingest oracles
    carry, re-derived here with an independent second toolchain
    (stdlib urllib.robotparser for the sitemap lines, xml.etree for
    the sitemap fields) plus hand derivation from the raw bytes."""

    def test_robots_bytes_carry_the_published_oddities(self):
        """The fixture really is the hostile shape: BOM first, CRLF
        endings, mixed-case keys, an inline comment, an unknown
        directive — if a regeneration ever sanitizes it, the
        conformance claim dies with it, so pin the bytes."""
        raw = open(os.path.join(FIX, "robots.txt"), "rb").read()
        assert raw[:3] == b"\xef\xbb\xbf"
        assert b"\r\n" in raw and b"crawl-DELAY:" in raw
        assert b"SITEMAP:" in raw and b"Host:" in raw
        assert b"# staging area" in raw

    def test_robots_group_selection_over_external_bytes(self, spark):
        """parse_robots + robots_extras over the raw external bytes:
        the BOM must not kill the first group (it heads GoodBot, so a
        BOM-glued first User-agent would leak GoodBot's rules to *),
        trainbot's exact group beats * and GoodBot, the decimal
        crawl-DELAY parses despite its case, the unknown Host: line is
        skipped, and BOTH Sitemap lines collect document-wide in
        source order even though they sit in different group gaps."""
        from hgraphstorage_spark.sources.warc import parse_robots, robots_extras

        txt = open(os.path.join(FIX, "robots.txt"), "rb").read().decode("utf-8")
        robots = spark.createDataFrame(
            [("www.example.org", txt)], "domain string, robots_txt string"
        )
        rules = sorted(
            (r["directive"], r["path"])
            for r in parse_robots(robots, agent="trainbot").collect()
        )
        assert rules == [
            ("allow", "/private/public-ok"),
            ("disallow", "/*.gif$"),
            ("disallow", "/private/*"),
        ]
        ext = robots_extras(robots, agent="trainbot").collect()[0]
        assert ext["crawl_delay"] == 4.5
        assert ext["sitemap_urls"] == [
            "https://www.example.org/sitemap_index.xml",
            "https://cdn.example.org/sitemap-images.xml",
        ]
        # an agent with no exact group falls to *: the first group
        # (GoodBot's, BOM-headed) must NOT be what it gets
        star = sorted(
            (r["directive"], r["path"])
            for r in parse_robots(robots, agent="otherbot").collect()
        )
        assert star == [("disallow", "/cgi-bin/")]
        assert robots_extras(robots, agent="otherbot").collect()[0][
            "crawl_delay"
        ] == 30.0

    def test_robots_literals_rederived_by_stdlib(self):
        """Second toolchain for the driver-hash literals:
        urllib.robotparser (an independent RFC 9309 implementation)
        re-derives the document-wide Sitemap list, and a from-scratch
        line fold over the raw bytes re-derives trainbot's crawl
        delay — neither touches hgraphstorage_spark code. (stdlib gets
        the BOM-stripped text: CPython's parser predates the
        BOM-tolerance convention; BOM handling itself is pinned on raw
        bytes in the Spark test above.)"""
        import urllib.robotparser

        txt = open(os.path.join(FIX, "robots.txt"), "rb").read().decode("utf-8-sig")
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        assert rp.site_maps() == [
            "https://www.example.org/sitemap_index.xml",
            "https://cdn.example.org/sitemap-images.xml",
        ]
        # hand fold: group lines by user-agent runs, pick trainbot's
        groups, agents, cur = {}, [], []
        for line in txt.replace("\r\n", "\n").split("\n"):
            body = line.split("#", 1)[0]
            if ":" not in body:
                continue
            k, v = body.split(":", 1)
            k, v = k.strip().lower(), v.strip()
            if k == "user-agent":
                if cur:
                    for a in agents:
                        groups.setdefault(a, []).extend(cur)
                    agents, cur = [], []
                agents.append(v.lower())
            elif agents and k in ("allow", "disallow", "crawl-delay"):
                cur.append((k, v))
        for a in agents:
            groups.setdefault(a, []).extend(cur)
        delays = [v for k, v in groups["trainbot"] if k == "crawl-delay"]
        assert [float(d) for d in delays] == [4.5]

    def test_sitemaps_published_layout_parses(self, spark):
        """parse_sitemaps over the sitemaps.org-layout files: the XML
        declaration and protocol namespace don't confuse the block
        scan, the xhtml:link child inside a <url> block doesn't break
        field extraction, the entity-escaped & decodes, W3C datetimes
        with timezone offsets pass through verbatim, and priorities
        land as DECIMAL(3,1). The pinned rows ARE the sitemap_ingest
        oracle's external literals."""
        from hgraphstorage_spark.sources.warc import parse_sitemaps

        rows = []
        for fname in ("sitemap_index.xml", "sitemap_urlset.xml"):
            with open(os.path.join(FIX, fname), encoding="utf-8") as f:
                rows.append(("www.example.org", f.read()))
        out = parse_sitemaps(
            spark.createDataFrame(rows, "domain string, sitemap_xml string")
        )
        got = sorted(
            (r["kind"], r["loc"], r["lastmod"], r["changefreq"],
             None if r["priority"] is None else str(r["priority"]))
            for r in out.collect()
        )
        assert got == [
            ("sitemap", "https://www.example.org/sitemap-pages.xml",
             "2024-07-01", None, None),
            ("sitemap", "https://www.example.org/sitemap-posts-2024-07.xml.gz",
             "2024-07-22T18:23:17+00:00", None, None),
            ("url", "https://www.example.org/", None, None, "1.0"),
            ("url",
             "https://www.example.org/catalog?item=12&desc=vacation_hawaii",
             "2024-05-07T16:20:11+03:00", "monthly", "0.8"),
        ]

    def test_sitemap_literals_rederived_by_stdlib_xml(self):
        """Second toolchain: xml.etree.ElementTree (a REAL XML parser,
        namespaces and all) re-derives every field literal from the
        committed bytes — if our regex tier and a conforming XML
        parser ever disagree on these files, this fails before the
        driver hash can go stale."""
        import xml.etree.ElementTree as ET

        ns = {"sm": "http://www.sitemaps.org/schemas/sitemap/0.9"}
        idx = ET.parse(os.path.join(FIX, "sitemap_index.xml")).getroot()
        sm = [
            (e.findtext("sm:loc", namespaces=ns),
             e.findtext("sm:lastmod", namespaces=ns))
            for e in idx.findall("sm:sitemap", ns)
        ]
        assert sm == [
            ("https://www.example.org/sitemap-posts-2024-07.xml.gz",
             "2024-07-22T18:23:17+00:00"),
            ("https://www.example.org/sitemap-pages.xml", "2024-07-01"),
        ]
        us = ET.parse(os.path.join(FIX, "sitemap_urlset.xml")).getroot()
        urls = [
            (e.findtext("sm:loc", namespaces=ns),
             e.findtext("sm:lastmod", namespaces=ns),
             e.findtext("sm:changefreq", namespaces=ns),
             e.findtext("sm:priority", namespaces=ns))
            for e in us.findall("sm:url", ns)
        ]
        assert urls == [
            ("https://www.example.org/catalog?item=12&desc=vacation_hawaii",
             "2024-05-07T16:20:11+03:00", "monthly", "0.8"),
            ("https://www.example.org/", None, None, "1.0"),
        ]
