"""WARC connector tests: writer/parser round trip (plain + per-record
gzip members), Spark read path, documents projection, HTML extraction,
and loud failure on corrupt shards."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hgraphstorage_spark.sources.warc import (
    _gunzip_members,
    html_to_text,
    parse_warc_records,
    read_warc,
    warc_bytes,
    warc_to_documents,
)


def _sample_records():
    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><head><script>var x=1;</script><style>p{}</style></head>"
        b"<body><h1>Title &amp; More</h1><p>Hello  world</p></body></html>"
    )
    plain = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\njust plain text body"
    return [
        {
            "headers": {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": "<urn:uuid:0>",
                "Content-Type": "application/warc-fields",
            },
            "payload": b"software: test\r\n",
        },
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:1>",
                "WARC-Target-URI": "http://example.com/a",
                "WARC-Date": "2024-01-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            "payload": html,
        },
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:2>",
                "WARC-Target-URI": "http://example.com/b",
                "WARC-Date": "2024-01-02T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            "payload": plain,
        },
        {
            "headers": {
                "WARC-Type": "request",
                "WARC-Record-ID": "<urn:uuid:3>",
                "WARC-Target-URI": "http://example.com/a",
            },
            "payload": b"GET /a HTTP/1.1\r\n\r\n",
        },
    ]


class TestWarcParsing:
    def test_round_trip_plain_and_gzip_members(self):
        recs = _sample_records()
        for compress in (False, True):
            blob = warc_bytes(recs, compress=compress)
            if compress:
                blob = _gunzip_members(blob)
            parsed = parse_warc_records(blob)
            assert len(parsed) == 4
            assert [r["headers"]["warc-type"] for r in parsed] == [
                "warcinfo", "response", "response", "request",
            ]
            assert parsed[1]["payload"] == recs[1]["payload"]
            assert int(parsed[2]["headers"]["content-length"]) == len(recs[2]["payload"])

    def test_malformed_shards_fail_loudly(self):
        with pytest.raises(ValueError):
            parse_warc_records(b"NOT-A-WARC\r\n\r\n")
        good = warc_bytes(_sample_records())
        with pytest.raises((ValueError, IndexError)):
            parse_warc_records(good[: len(good) - 30])  # truncated payload/frame
        with pytest.raises(ValueError):
            _gunzip_members(b"\x1f\x8bgarbage")

    def test_html_to_text_baseline(self):
        t = html_to_text(
            "<html><script>drop()</script><body><p>A &amp; B</p><br>C</body></html>"
        )
        assert t == "A & B C"


class TestWarcSpark:
    @pytest.fixture()
    def warc_dir(self):
        d = tempfile.mkdtemp(prefix="hgs_warc_")
        yield d
        shutil.rmtree(d, ignore_errors=True)

    def test_read_warc_and_documents(self, spark, warc_dir):
        recs = _sample_records()
        with open(f"{warc_dir}/shard0.warc", "wb") as f:
            f.write(warc_bytes(recs))
        with open(f"{warc_dir}/shard1.warc.gz", "wb") as f:
            f.write(warc_bytes(recs, compress=True))

        rows = read_warc(spark, warc_dir).collect()
        assert len(rows) == 8  # 4 records x 2 shards (gzip == plain)
        by_type = {}
        for r in rows:
            by_type.setdefault(r["warc_type"], 0)
            by_type[r["warc_type"]] += 1
        assert by_type == {"warcinfo": 2, "response": 4, "request": 2}

        docs = warc_to_documents(read_warc(spark, warc_dir)).collect()
        assert len(docs) == 4  # responses only
        by_url = {}
        for r in docs:
            by_url.setdefault(r["url"], r)
        assert by_url["http://example.com/a"]["text"] == "Title & More Hello world"
        assert by_url["http://example.com/b"]["text"] == "just plain text body"
        assert all(r["doc_id"] is not None and r["n_chars"] > 0 for r in docs)
        # every record gets a distinct deterministic doc_id (ADVICE r5:
        # the shard path is in the hash, so the same record re-read from
        # a different shard is a distinct row — url_dedup collapses true
        # re-fetches downstream, identity never silently merges them)
        assert len({r["doc_id"] for r in docs}) == 4
        # ...and re-reading the same shards reproduces the same ids
        again = {r["doc_id"] for r in warc_to_documents(read_warc(spark, warc_dir)).collect()}
        assert again == {r["doc_id"] for r in docs}

    def test_wet_derivation_and_round_trip(self, spark, warc_dir):
        """WET interchange (r10): responses → conversion records whose
        payload is the extracted text and WARC-Refers-To the source
        record; written shards re-read as valid WARC (the parse∘write
        identity), texts matching warc_to_documents, and the shards are
        CDX-indexable (gzip-member layout)."""
        from hgraphstorage_spark.sources.cdx import warc_record_index
        from hgraphstorage_spark.sources.warc import wet_records, write_warc

        import os as _os

        recs = _sample_records()
        _os.makedirs(f"{warc_dir}/in", exist_ok=True)
        with open(f"{warc_dir}/in/shard0.warc", "wb") as f:
            f.write(warc_bytes(recs))
        src = read_warc(spark, f"{warc_dir}/in")
        wet = wet_records(src)
        rows = wet.collect()
        assert len(rows) == 2  # responses only
        assert all(r["warc_type"] == "conversion" for r in rows)
        assert all(r["content_type"] == "text/plain" for r in rows)
        refers = {r["headers"]["warc-refers-to"] for r in rows}
        src_ids = {
            r["record_id"] for r in src.collect() if r["warc_type"] == "response"
        }
        assert refers == src_ids  # every conversion points at its source
        # write one shard, re-read, texts survive byte-for-byte
        stats = write_warc(
            wet.coalesce(1), f"{warc_dir}/wet", compress=True
        ).collect()
        assert len(stats) == 1 and stats[0]["n_records"] == 2
        back = read_warc(spark, f"{warc_dir}/wet").collect()
        assert len(back) == 2
        want = {
            r["url"]: r["text"]
            for r in warc_to_documents(src).collect()
        }
        for r in back:
            assert r["warc_type"] == "conversion"
            assert bytes(r["payload"]).decode("utf-8") == want[r["target_uri"]]
            assert r["headers"]["warc-refers-to"] in src_ids
        # the written shard is CDX-indexable: one gzip member per record
        idx = warc_record_index(spark, f"{warc_dir}/wet").collect()
        assert len(idx) == 2 and all(r["warc_type"] == "conversion" for r in idx)
        # atomic publication (r11 ADVICE): shards are written to a
        # per-attempt temp name and renamed into place, so the out dir
        # holds only complete final shards — no .tmp residue
        assert not [p for p in _os.listdir(f"{warc_dir}/wet") if p.endswith(".tmp")]
        # ...and a STALE temp from a crashed attempt (dot-prefixed by
        # design) is invisible to directory reads — a partial shard
        # can never poison a later read_warc over the out dir
        with open(f"{warc_dir}/wet/.wet-99999.warc.wet.gz.7.tmp", "wb") as f:
            f.write(b"partial garbage, not gzip")
        assert len(read_warc(spark, f"{warc_dir}/wet").collect()) == 2


class TestHttpBodyDecoding:
    def test_dechunk_and_content_encodings(self):
        """RFC 9112 chunked framing is removed (extensions and trailers
        ignored), gzip/x-gzip and both deflate flavors decompress, and
        malformed input is SALVAGED (original bytes back), never
        dropped."""
        import gzip as _gz
        import zlib as _zl

        from hgraphstorage_spark.sources.warc import (
            dechunk_http_body,
            decode_http_body,
        )

        body = b"4\r\nWiki\r\n6;ext=1\r\npedia \r\nB\r\nin chunks.\n\r\n0\r\nX-T: v\r\n\r\n"
        assert dechunk_http_body(body) == b"Wikipedia in chunks.\n"
        # truncated chunk: salvage raw
        assert dechunk_http_body(b"A\r\nshort\r\n") == b"A\r\nshort\r\n"
        h = b"HTTP/1.1 200 OK\r\ncontent-encoding: gzip"
        assert decode_http_body(h, _gz.compress(b"zipped body")) == b"zipped body"
        h2 = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
        assert decode_http_body(h2, _zl.compress(b"zlib body")) == b"zlib body"
        raw = _zl.compressobj(wbits=-15)
        blob = raw.compress(b"raw deflate") + raw.flush()
        assert decode_http_body(h2, blob) == b"raw deflate"
        # chunked THEN gzip (receiver removes TE first, then CE)
        gz = _gz.compress(b"<html><body>Hi</body></html>")
        chunked = (
            hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
        )
        h3 = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: gzip"
        )
        assert decode_http_body(h3, chunked) == b"<html><body>Hi</body></html>"
        # corrupt gzip: salvage what the TE removal produced
        assert decode_http_body(h3, b"3\r\nabc\r\n0\r\n\r\n") == b"abc"
        # a body MENTIONING the headers never triggers (per-line match)
        h4 = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain"
        assert decode_http_body(h4, b"says content-encoding: gzip") == (
            b"says content-encoding: gzip"
        )

    def test_warc_to_documents_decodes_wire_encodings(self, spark):
        """End-to-end: a chunked+gzipped HTML response and a plain one
        extract the SAME text; chunk-size lines never leak into the
        extracted documents."""
        import gzip as _gz
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            read_warc,
            warc_bytes,
            warc_to_documents,
        )

        html = b"<html><title>T</title><body>Hello decoded world</body></html>"
        gz = _gz.compress(html)
        chunked = hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
        mk = lambda uri, hdrs, body: {  # noqa: E731
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:{uri[-1]}>",
                "WARC-Target-URI": uri,
                "WARC-Date": "2024-01-01T00:00:00Z",
            },
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + hdrs + b"\r\n\r\n" + body,
        }
        recs = [
            mk("https://t.com/a",
               b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip", chunked),
            mk("https://t.com/b", b"X-Plain: 1", html),
        ]
        d = tempfile.mkdtemp(prefix="hgs_dec_")
        try:
            with open(f"{d}/s.warc", "wb") as f:
                f.write(warc_bytes(recs))
            docs = {
                r["url"]: r["text"]
                for r in warc_to_documents(read_warc(spark, d)).collect()
            }
            assert docs["https://t.com/a"] == docs["https://t.com/b"]
            assert "Hello decoded world" in docs["https://t.com/a"]
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_declared_charset_decodes(self, spark):
        """A latin-1 body with charset=iso-8859-1 keeps its accented
        letters; an unknown charset falls back to utf-8-replace instead
        of crashing."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            read_warc,
            warc_bytes,
            warc_to_documents,
        )

        latin = "café rosé".encode("iso-8859-1")
        mk = lambda uri, ct, body: {  # noqa: E731
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:{uri[-1]}>",
                "WARC-Target-URI": uri,
                "WARC-Date": "2024-01-01T00:00:00Z",
            },
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: " + ct + b"\r\n\r\n" + body,
        }
        recs = [
            mk("https://t.com/l", b"text/plain; charset=ISO-8859-1", latin),
            mk("https://t.com/x", b"text/plain; charset=no-such-codec", b"plain ok"),
        ]
        d = tempfile.mkdtemp(prefix="hgs_cs_")
        try:
            with open(f"{d}/s.warc", "wb") as f:
                f.write(warc_bytes(recs))
            docs = {
                r["url"]: r["text"]
                for r in warc_to_documents(read_warc(spark, d)).collect()
            }
            assert docs["https://t.com/l"] == "café rosé"
            assert docs["https://t.com/x"] == "plain ok"
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_gzip_bomb_truncates_at_output_cap(self):
        """r11 ADVICE pin: body decompression is INCREMENTAL with an
        output ceiling — a gzip bomb (KBs compressed, GBs claimed)
        truncates at max_decoded_bytes instead of exhausting executor
        memory; honest bodies under the cap decode unchanged."""
        import gzip as _gz
        import zlib as _zl

        from hgraphstorage_spark.sources.warc import decode_http_body

        h = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
        bomb = _gz.compress(b"\x00" * (8 << 20))  # 8 MiB claims, ~8 KiB wire
        out = decode_http_body(h, bomb, max_decoded_bytes=1 << 16)
        assert len(out) == 1 << 16 and set(out) == {0}
        assert decode_http_body(h, _gz.compress(b"fine"), max_decoded_bytes=64) == b"fine"
        h2 = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
        out2 = decode_http_body(h2, _zl.compress(b"\x00" * (8 << 20)), max_decoded_bytes=1000)
        assert len(out2) == 1000

    def test_empty_and_lookalike_bodies_decode_correctly(self):
        """r11 self-review pins: (1) a VALID gzip of the empty payload
        decodes to b'' — it must not be mistaken for a failure and fall
        back to the raw compressed bytes; (2) a RAW-deflate body whose
        first bytes happen to form a valid zlib header still decodes
        via the raw retry instead of salvaging partial garbage from the
        wrapped attempt."""
        import gzip as _gz
        import zlib as _zl

        from hgraphstorage_spark.sources.warc import decode_http_body

        h = b"HTTP/1.1 204 No Content\r\nContent-Encoding: gzip"
        assert decode_http_body(h, _gz.compress(b"")) == b""
        h2 = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
        assert decode_http_body(h2, _zl.compress(b"")) == b""
        # hand-craft a RAW deflate stream whose first two bytes form a
        # VALID zlib header: stored (BTYPE=00) blocks let us pick the
        # bytes — 0x78 reads as CMF (CM=8, CINFO=7) and as a non-final
        # stored-block header; 0x01 reads as FLG (0x7801 % 31 == 0, no
        # FDICT) and as LEN_lo=1. A zlib-wrapped attempt accepts the
        # header, then dies mid-stream on the 'compressed data' — the
        # strict first attempt must fall through to the raw retry.
        raw = (
            bytes([0x78, 0x01, 0x00, 0xFE, 0xFF]) + b"A"
            + bytes([0x01, 0x01, 0x00, 0xFE, 0xFF]) + b"B"
        )
        assert _zl.decompress(raw, -15) == b"AB"  # honest raw deflate
        assert (raw[0] * 256 + raw[1]) % 31 == 0  # zlib-header lookalike
        assert decode_http_body(h2, raw) == b"AB"

    def test_inflate_capped_properties(self):
        """Property pin (r11): for arbitrary payloads, member splits,
        and caps — the capped inflater returns the exact payload when
        it fits, the exact prefix at the cap when it doesn't, and never
        a byte more. Hypothesis drives payload content/length, the
        split point between two gzip members, and the cap."""
        import gzip as _gz
        import zlib as _zl

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from hgraphstorage_spark.sources.warc import _inflate_capped

        @settings(max_examples=60, deadline=None)
        @given(
            payload=st.binary(min_size=0, max_size=4096),
            split=st.integers(min_value=0, max_value=4096),
            cap=st.integers(min_value=1, max_value=8192),
        )
        def check(payload: bytes, split: int, cap: int) -> None:
            split = min(split, len(payload))
            blob = _gz.compress(payload[:split]) + _gz.compress(payload[split:])
            got = _inflate_capped(blob, _zl.MAX_WBITS | 16, cap, members=True)
            assert got == payload[:cap]
            # deflate single-stream flavor obeys the same contract
            raw = _zl.compress(payload)
            assert _inflate_capped(raw, _zl.MAX_WBITS, cap) == payload[:cap]

        check()

    def test_shard_member_inflation_is_capped(self):
        """r11 pin (the shard sibling of the body cap): a gzip-bomb
        MEMBER in an untrusted shard raises loudly at the shard level —
        the fail-loudly contract — instead of OOMing the read task;
        honest members inflate unchanged and concatenations still walk
        member-by-member."""
        import gzip as _gz

        import pytest as _pytest

        from hgraphstorage_spark.sources.warc import (
            _gunzip_members,
            _inflate_member,
        )

        bomb = _gz.compress(b"\x00" * (8 << 20))
        with _pytest.raises(ValueError, match="inflates past"):
            _inflate_member(bomb, 0, cap=1 << 16)
        blob = _gz.compress(b"rec one") + _gz.compress(b"rec two")
        assert _gunzip_members(blob) == b"rec onerec two"
        body, consumed = _inflate_member(blob, 0)
        assert body == b"rec one" and 0 < consumed < len(blob)

    def test_multi_member_gzip_body_fully_decoded(self):
        """r11 ADVICE pin: a Content-Encoding: gzip body stored as
        CONCATENATED gzip members decodes completely (the old
        single-decompressobj path silently kept only the first member,
        unlike the member-aware shard reader); a good member followed
        by trailing garbage salvages the good member."""
        import gzip as _gz

        from hgraphstorage_spark.sources.warc import decode_http_body

        h = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
        blob = _gz.compress(b"first half, ") + _gz.compress(b"second half")
        assert decode_http_body(h, blob) == b"first half, second half"
        assert decode_http_body(h, _gz.compress(b"good") + b"\x1f\x8bgarbage") == b"good"

    def test_charset_only_from_content_type_line(self, spark):
        """r11 ADVICE pin: a charset= parameter in OTHER headers
        (Set-Cookie, Link) never selects the codec — only the
        Content-Type line does; and 'text/html' appearing in a
        non-Content-Type header value never flags the body as markup."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            read_warc,
            warc_bytes,
            warc_to_documents,
        )

        latin = "café rosé".encode("iso-8859-1")
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:1>",
                    "WARC-Target-URI": "https://t.com/cookie",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                # decoy charset in Set-Cookie BEFORE the real one: a
                # whole-block regex picks shift_jis and mangles latin-1
                "payload": b"HTTP/1.1 200 OK\r\n"
                b"Set-Cookie: lang=fr; charset=shift_jis\r\n"
                b"Content-Type: text/plain; charset=ISO-8859-1\r\n\r\n" + latin,
            },
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:2>",
                    "WARC-Target-URI": "https://t.com/ref",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                # 'text/html' in a Link header value, plain body: must
                # NOT be tag-stripped ('i < n and j > 0' survives)
                "payload": b"HTTP/1.1 200 OK\r\n"
                b"Link: <https://t.com/alt.html>; type=\"text/html\"\r\n"
                b"Content-Type: text/plain\r\n\r\n"
                b"math: i < n and j > 0 holds",
            },
        ]
        d = tempfile.mkdtemp(prefix="hgs_ctline_")
        try:
            with open(f"{d}/s.warc", "wb") as f:
                f.write(warc_bytes(recs))
            docs = {
                r["url"]: r["text"]
                for r in warc_to_documents(read_warc(spark, d)).collect()
            }
            assert docs["https://t.com/cookie"] == "café rosé"
            assert "i < n and j > 0" in docs["https://t.com/ref"]
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_shard_cumulative_inflation_budget(self, monkeypatch):
        """r12 ADVICE pin (medium): the per-member cap alone lets a
        shard of MANY bomb members, each under the ceiling, inflate
        ~1000x wire size without tripping anything — the member loop
        now tracks a whole-shard cumulative output budget and fails
        loudly. Also pins the per-member ceiling at 1 GiB (a member a
        task must hold has to FIT in task memory; the old 4 GiB cap
        was itself an OOM if reached)."""
        import gzip as _gz

        import pytest as _pytest

        from hgraphstorage_spark.sources import warc as _warc

        assert _warc.MAX_MEMBER_BYTES == 1 << 30
        assert _warc.MAX_SHARD_INFLATED_BYTES == 4 << 30
        # 8 members x 1 MiB output each, budget lowered to 4 MiB: every
        # member is individually under the per-member cap, the SHARD is
        # over budget -> loud rejection from both walkers
        member = _gz.compress(b"\x00" * (1 << 20))
        shard = member * 8
        monkeypatch.setattr(_warc, "MAX_SHARD_INFLATED_BYTES", 4 << 20)
        with _pytest.raises(ValueError, match="across its gzip members"):
            _warc._gunzip_members(shard)
        with _pytest.raises(ValueError, match="across its gzip members"):
            _warc.gzip_member_spans(shard)
        # an honest shard under the budget still walks member-by-member
        ok = _gz.compress(b"rec one") + _gz.compress(b"rec two")
        assert _warc._gunzip_members(ok) == b"rec onerec two"

    def test_obs_folded_headers_unfold(self, spark):
        """r12 ADVICE pin (low): an obs-folded Content-Type header —
        the charset parameter on a continuation line starting with
        SP/HT — and whitespace before the colon are both salvaged by
        unfolding the header block before the line-scoped scan (the
        r11 line scan missed them entirely and fell back to utf-8 /
        lost is_html)."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            decode_http_body,
            read_warc,
            warc_bytes,
            warc_to_documents,
        )

        latin = "café rosé".encode("iso-8859-1")
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:1>",
                    "WARC-Target-URI": "https://t.com/folded",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                # charset parameter obs-folded onto a continuation line
                "payload": b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain;\r\n charset=ISO-8859-1\r\n\r\n"
                + latin,
            },
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:2>",
                    "WARC-Target-URI": "https://t.com/ws-colon",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                # whitespace before the colon: is_html detection must
                # still fire (the body tag-strips)
                "payload": b"HTTP/1.1 200 OK\r\n"
                b"Content-Type : text/html\r\n\r\n"
                b"<html><body>stripped ok</body></html>",
            },
        ]
        d = tempfile.mkdtemp(prefix="hgs_fold_")
        try:
            with open(f"{d}/s.warc", "wb") as f:
                f.write(warc_bytes(recs))
            rows = {
                r["url"]: r
                for r in warc_to_documents(read_warc(spark, d)).collect()
            }
            assert rows["https://t.com/folded"]["text"] == "café rosé"
            # tag-stripped output proves is_html fired despite the
            # whitespace-before-colon Content-Type line
            assert rows["https://t.com/ws-colon"]["text"].strip() == "stripped ok"
        finally:
            shutil.rmtree(d, ignore_errors=True)
        # the wire-encoding scan unfolds too: a folded Transfer-Encoding
        # continuation carrying 'chunked' still dechunks
        h = b"HTTP/1.1 200 OK\r\nTransfer-Encoding:\r\n chunked"
        assert decode_http_body(h, b"3\r\nabc\r\n0\r\n\r\n") == b"abc"

    def test_decode_cap_truncation_is_flagged(self, spark):
        """r12 ADVICE pin (low): a body the output ceiling cut short is
        no longer indistinguishable from a complete decode —
        decode_http_body_full returns (bytes, truncated) and
        warc_to_documents surfaces it as the decode_truncated column.
        Input truncation / honest bodies do NOT set the flag."""
        import gzip as _gz
        import shutil
        import tempfile
        import zlib as _zl

        from hgraphstorage_spark.sources.warc import (
            decode_http_body_full,
            read_warc,
            warc_bytes,
            warc_to_documents,
        )

        h = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
        bomb = _gz.compress(b"\x00" * (8 << 20))
        out, trunc = decode_http_body_full(h, bomb, max_decoded_bytes=1 << 16)
        assert trunc and len(out) <= 1 << 16
        # honest body under the cap: complete, unflagged
        out, trunc = decode_http_body_full(h, _gz.compress(b"fine"))
        assert (out, trunc) == (b"fine", False)
        # INPUT-truncated stream: salvage prefix, flag stays False (the
        # record carried nothing more — that is not cap truncation).
        # Incompressible payload so the cut lands mid-deflate-stream.
        import hashlib as _hl

        raw = b"".join(
            _hl.sha256(i.to_bytes(4, "big")).digest() for i in range(4096)
        )
        cut = _gz.compress(raw)[:-30000]
        out, trunc = decode_http_body_full(h, cut)
        assert not trunc and out and out.startswith(raw[:64])
        # multi-member body where the cap lands BETWEEN members: later
        # members never inflate -> flagged
        blob = _gz.compress(b"a" * 100) + _gz.compress(b"b" * 100)
        out, trunc = decode_http_body_full(h, blob, max_decoded_bytes=100)
        assert trunc and out == b"a" * 100
        # deflate path flags too
        h2 = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
        out, trunc = decode_http_body_full(
            h2, _zl.compress(b"\x00" * (1 << 20)), max_decoded_bytes=1 << 10
        )
        assert trunc and len(out) == 1 << 10
        # end-to-end: the column rides through warc_to_documents
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i}>",
                    "WARC-Target-URI": f"https://t.com/{name}",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                "payload": b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain\r\n"
                b"Content-Encoding: gzip\r\n\r\n" + body,
            }
            for i, (name, body) in enumerate(
                [
                    ("honest", _gz.compress(b"short and sweet")),
                    ("bomb", _gz.compress(b"\x00" * (80 << 20))),
                ]
            )
        ]
        d = tempfile.mkdtemp(prefix="hgs_trunc_")
        try:
            with open(f"{d}/s.warc", "wb") as f:
                f.write(warc_bytes(recs))
            rows = {
                r["url"]: r["decode_truncated"]
                for r in warc_to_documents(read_warc(spark, d)).collect()
            }
            assert rows == {
                "https://t.com/honest": False,
                "https://t.com/bomb": True,
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestUrlDedup:
    def test_normalization_rules(self, spark):
        from hgraphstorage_spark.pipeline.dedup import url_normalized

        cases = [
            ("https://www.Example.com/Page/?utm_source=x&a=1#frag", "example.com/page/?a=1"),
            ("http://example.com/page?a=1&utm_campaign=y", "example.com/page?a=1"),
            ("https://example.com/page?utm_medium=z", "example.com/page"),
            ("example.com/dir/", "example.com/dir"),
            ("https://example.com/?fbclid=abc", "example.com"),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [r["n"] for r in df.select(url_normalized(F.col("url")).alias("n")).collect()]
        assert got == [want for _, want in cases]

    def test_canonical_col_groups_variants(self, spark):
        """canonical_col: AMP/mobile variants declaring the same
        canonical link collapse to one row even though their own URLs
        normalize differently; rows without a canonical fall back to
        their own normalized URL."""
        from hgraphstorage_spark.pipeline.dedup import url_dedup

        docs = spark.createDataFrame(
            [
                (1, "https://ex.com/amp/story", "https://ex.com/story", "2024-01-02"),
                (2, "https://m.ex.com/story", "https://ex.com/story", "2024-01-01"),
                (3, "https://ex.com/story", "https://ex.com/story", "2024-01-03"),
                (4, "https://ex.com/other", None, "2024-01-01"),
            ],
            "doc_id long, url string, canonical_url string, fetch_date string",
        )
        kept = {
            r["doc_id"]: r
            for r in url_dedup(
                docs, ts_col="fetch_date", canonical_col="canonical_url"
            ).collect()
        }
        # the three canonical-equal variants keep only the earliest fetch
        assert set(kept) == {2, 4}
        assert kept[2]["url_norm"] == "ex.com/story"
        # without canonical_col they'd all be distinct
        assert url_dedup(docs, ts_col="fetch_date").count() == 4

    def test_cross_site_canonical_not_trusted(self, spark):
        """ADVICE r7: a canonical pointing at an UNRELATED host (the
        syndication/canonical-farm misuse) must NOT become the grouping
        key under the default guard — the row falls back to its own
        URL. Same-SITE canonicals (subdomain either direction) still
        group; same_site_only=False restores unconditional trust."""
        from hgraphstorage_spark.pipeline.dedup import url_dedup

        docs = spark.createDataFrame(
            [
                # two distinct pages both canonicalizing to an unrelated host
                (1, "https://mirror-a.com/x", "https://original.com/story", "2024-01-01"),
                (2, "https://mirror-b.com/y", "https://original.com/story", "2024-01-02"),
                # subdomain canonical, both directions, still groups
                (3, "https://m.ex.com/story", "https://ex.com/story", "2024-01-01"),
                (4, "https://ex.com/story", "https://amp.ex.com/story2", "2024-01-02"),
                # suffix WITHOUT a dot boundary is a different site
                (5, "https://notex.com/story", "https://ex.com/story", "2024-01-01"),
            ],
            "doc_id long, url string, canonical_url string, fetch_date string",
        )
        kept = {
            r["doc_id"]: r
            for r in url_dedup(
                docs, ts_col="fetch_date", canonical_col="canonical_url"
            ).collect()
        }
        # mirrors keep their own keys (no collapse); doc 5 likewise
        assert kept[1]["url_norm"] == "mirror-a.com/x"
        assert kept[2]["url_norm"] == "mirror-b.com/y"
        assert kept[5]["url_norm"] == "notex.com/story"
        # doc 3 groups under ex.com/story; doc 4 under amp.ex.com/story2
        assert kept[3]["url_norm"] == "ex.com/story"
        assert kept[4]["url_norm"] == "amp.ex.com/story2"
        assert set(kept) == {1, 2, 3, 4, 5}
        # unconditional trust collapses the two mirrors into one keeper
        # (and docs 3+5 share the ex.com/story canonical): 3 rows
        trusting = url_dedup(
            docs, ts_col="fetch_date", canonical_col="canonical_url",
            same_site_only=False,
        )
        assert trusting.count() == 3

    def test_url_dedup_keeps_earliest_fetch(self, spark):
        from hgraphstorage_spark.pipeline.dedup import url_dedup

        rows = [
            (1, "https://www.site.com/a?utm_source=x", "2024-01-02"),
            (2, "http://site.com/a", "2024-01-01"),
            (3, "https://site.com/b", "2024-01-01"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string, fetch_date string")
        kept = {r["doc_id"]: r for r in url_dedup(docs, ts_col="fetch_date").collect()}
        assert set(kept) == {2, 3}  # 1 and 2 collapse; earliest fetch wins
        assert kept[2]["url_norm"] == "site.com/a"

    def test_end_to_end_r8_frontier_wiring(self, spark):
        """The round-8 crawl wiring executed as one composition: pages →
        extract_links, feeds → parse_feeds → feed_hints, robots →
        rules + extras, crawl_frontier with the freshness fold at a
        pinned as_of, frontier_schedule fetch slots, and the
        heading-aware extraction of the fetched page — every stage's
        output feeding the next, values pinned end to end."""
        from hgraphstorage_spark.pipeline.extraction import extract_structured
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            feed_hints,
            frontier_schedule,
            parse_feeds,
            parse_robots,
            robots_extras,
        )

        pages = spark.createDataFrame(
            [(1, "https://hub.com/home",
              '<a href="https://t.com/fresh">a</a>'
              '<a href="https://t.com/stale">b</a>'
              '<a href="https://t.com/blocked">c</a>')],
            "doc_id long, url string, html string",
        )
        robots_bodies = spark.createDataFrame(
            [("t.com", "User-agent: *\nDisallow: /blocked\nCrawl-delay: 2\n")],
            "domain string, robots_txt string",
        )
        feeds = spark.createDataFrame(
            [("t.com",
              "<rss><channel>"
              "<item><title>F</title><link>https://t.com/fresh</link>"
              "<pubDate>Thu, 29 Feb 2024 09:00:00 GMT</pubDate></item>"
              "<item><title>S</title><link>https://t.com/stale</link>"
              "<pubDate>Mon, 01 Jan 2024 09:00:00 GMT</pubDate></item>"
              "</channel></rss>")],
            "domain string, feed_xml string",
        )
        fr = crawl_frontier(
            extract_links(pages),
            parse_robots(robots_bodies),
            extras=robots_extras(robots_bodies),
            sitemap_entries=feed_hints(parse_feeds(feeds)),
            as_of="2024-03-01",
        )
        plan = {
            r["url"]: r
            for r in frontier_schedule(fr, max_per_host=10).collect()
        }
        # the stale feed item outranks the fresh one (equal demand,
        # daily cadence: 60 days vs 1 day overdue, clamped at 10)
        assert plan["https://t.com/stale"]["host_rank"] == 1
        assert plan["https://t.com/stale"]["fetch_at_sec"] == 0.0
        assert plan["https://t.com/fresh"]["host_rank"] == 2
        assert plan["https://t.com/fresh"]["fetch_at_sec"] == 2.0  # Crawl-delay
        assert "https://t.com/blocked" not in plan
        # ...and the fetched page flows into the markdown extraction
        fetched = spark.createDataFrame(
            [(1, "https://t.com/stale",
              "<h1>Stale story of the day</h1>"
              "<p>the quick brown fox is on the mat with all of the other"
              " animals of the house and the yard</p>")],
            "doc_id long, url string, html string",
        )
        md = extract_structured(fetched).collect()[0]
        assert md["content_md"].startswith("# Stale story of the day\n")
        assert md["n_headings"] == 1

    def test_end_to_end_r9_revisit_wiring(self, spark):
        """The round-9 revisit economy executed as one composition: a
        WARC shard of PREVIOUSLY FETCHED pages → http_envelope (server
        validators) → revisit_plan at a pinned as_of → the due subset
        is what a recrawler actually re-fetches, carrying the
        conditional headers. A page the server declared fresh (long
        max-age) is NOT due; a stale-by-age page is; the due row
        carries the exact If-None-Match bytes the server sent."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            http_envelope,
            read_warc,
            revisit_plan,
            warc_bytes,
        )

        def resp(uri, date, payload):
            return {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{abs(hash(uri)) % 1000}>",
                    "WARC-Target-URI": uri,
                    "WARC-Date": date,
                },
                "payload": payload,
            }

        recs = [
            resp(  # fresh: server grants 30 days; fetched 10 days ago
                "https://t.com/fresh", "2024-06-25T00:00:00Z",
                b"HTTP/1.1 200 OK\r\nETag: \"f-1\"\r\n"
                b"Cache-Control: max-age=2592000\r\n\r\nfresh body",
            ),
            resp(  # stale: unchanged since 2023 -> age heuristic, due
                "https://t.com/stale", "2024-01-01T00:00:00Z",
                b"HTTP/1.1 200 OK\r\nETag: \"s-9\"\r\n"
                b"Last-Modified: Mon, 02 Jan 2023 00:00:00 GMT\r\n\r\nold body",
            ),
        ]
        d = tempfile.mkdtemp(prefix="hgs_revisit_")
        try:
            with open(f"{d}/shard0.warc", "wb") as f:
                f.write(warc_bytes(recs))
            plan = {
                r["url"]: r
                for r in revisit_plan(
                    http_envelope(read_warc(spark, d)), as_of="2024-07-05"
                ).collect()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
        fresh = plan["https://t.com/fresh"]
        assert fresh["revisit_due"] is False  # due 2024-07-25
        assert fresh["validator"] == "etag"
        stale = plan["https://t.com/stale"]
        assert stale["revisit_due"] is True
        assert stale["if_none_match"] == '"s-9"'  # byte-for-byte echo
        assert stale["if_modified_since"] == "Mon, 02 Jan 2023 00:00:00 GMT"
        # the recrawl queue is exactly the due subset
        due = [u for u, r in plan.items() if r["revisit_due"]]
        assert due == ["https://t.com/stale"]

    def test_end_to_end_crawl_pipeline(self, spark, warc_dir=None):
        """WARC shard -> documents -> url dedup -> quality reasons: the
        full crawl ingest story on real bytes."""
        import shutil
        import tempfile

        from hgraphstorage_spark.pipeline import quality_reject_reasons
        from hgraphstorage_spark.pipeline.dedup import url_dedup
        from hgraphstorage_spark.sources.warc import read_warc, warc_bytes, warc_to_documents

        d = tempfile.mkdtemp(prefix="hgs_crawl_")
        try:
            body = ("HTTP/1.1 200 OK\r\n\r\n<html><body><p>"
                    + " ".join(f"word{i}" for i in range(40))
                    + "</p></body></html>").encode()
            recs = []
            for i, (uri, date) in enumerate([
                ("http://site.com/a", "2024-01-01T00:00:00Z"),
                ("https://www.site.com/a?utm_source=x", "2024-01-02T00:00:00Z"),
                ("http://site.com/b", "2024-01-01T00:00:00Z"),
            ]):
                recs.append({"headers": {"WARC-Type": "response",
                                         "WARC-Record-ID": f"<urn:uuid:{i}>",
                                         "WARC-Target-URI": uri, "WARC-Date": date,
                                         "Content-Type": "application/http; msgtype=response"},
                             "payload": body})
            with open(f"{d}/crawl.warc.gz", "wb") as f:
                f.write(warc_bytes(recs, compress=True))
            docs = warc_to_documents(read_warc(spark, d))
            deduped = url_dedup(docs, ts_col="fetch_date")
            assert deduped.count() == 2  # the utm re-crawl collapsed
            q = quality_reject_reasons(deduped)
            assert all(r["passes"] for r in q.collect())  # 40-word prose passes
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_domain_stats_counts_registrable_hosts(spark):
    from hgraphstorage_spark.pipeline.dedup import domain_stats

    rows = [
        (1, "https://www.site.com/a"),
        (2, "http://site.com/b?utm_source=x"),
        (3, "https://other.org/"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["domain"]: (r["n_docs"], r["n_urls"]) for r in domain_stats(docs).collect()}
    assert got == {"site.com": (2, 2), "other.org": (1, 1)}


def test_review_fixes_round5(spark):
    """Regression pins for the round-5 review findings: tracker regex
    boundary anchoring, adjacent trackers, n_urls counts URLs, truncated
    gzip members raise, entity decode order, plain-text bodies with
    angle brackets survive."""
    from hgraphstorage_spark.pipeline.dedup import domain_stats, url_normalized
    from hgraphstorage_spark.sources.warc import _gunzip_members, html_to_text, warc_bytes

    # (2) boundary anchoring + adjacent trackers
    cases = [
        ("example.com/page?xfbclid=1", "example.com/page?xfbclid=1"),   # not a tracker
        ("example.com/page?redirect=utm_source=x", "example.com/page?redirect=utm_source=x"),
        ("example.com/p?utm_a=1&utm_b=2", "example.com/p"),             # adjacent trackers
        ("example.com/p?utm_a=1&utm_b=2&c=3", "example.com/p?c=3"),
        ("example.com/p?utm_x=2&a=1", "example.com/p?a=1"),             # & promoted to ?
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["n"] for r in df.select(url_normalized(F.col("url")).alias("n")).collect()]
    assert got == [w for _, w in cases], got

    # (1) n_urls counts distinct normalized URLs, not doc ids
    docs = spark.createDataFrame(
        [(1, "http://site.com/a"), (2, "https://www.site.com/a?utm_source=x")],
        "doc_id long, url string",
    )
    r = domain_stats(docs).collect()[0]
    assert r["n_docs"] == 2 and r["n_urls"] == 1

    # (3) truncated final gzip member raises
    blob = warc_bytes(_sample_records(), compress=True)
    with pytest.raises(ValueError):
        _gunzip_members(blob[:-20])

    # (4) &amp; decodes LAST — escaped entities stay escaped one level
    assert html_to_text("x &amp;lt; y") == "x &lt; y"

    # (5) plain-text bodies with comparison operators are not tag-stripped
    from hgraphstorage_spark.sources.warc import parse_warc_records, warc_to_documents, read_warc
    import shutil, tempfile
    d = tempfile.mkdtemp(prefix="hgs_ct_")
    try:
        recs = [{
            "headers": {"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:9>",
                        "WARC-Target-URI": "http://s.com/code", "WARC-Date": "2024-01-01T00:00:00Z",
                        "Content-Type": "application/http; msgtype=response"},
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nfor i < n and j > 0: loop",
        }]
        with open(f"{d}/s.warc", "wb") as f:
            f.write(warc_bytes(recs))
        out = warc_to_documents(read_warc(spark, d)).collect()[0]
        assert out["text"] == "for i < n and j > 0: loop"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_headerless_records_get_distinct_doc_ids(spark):
    """r6 review catch: response records carrying NO record-id/uri/date
    headers in the SAME shard must still get distinct doc_ids (the
    in-shard ordinal is the identity of last resort)."""
    import shutil
    import tempfile

    from hgraphstorage_spark.sources.warc import read_warc, warc_bytes, warc_to_documents

    d = tempfile.mkdtemp(prefix="hgs_warc_degenerate_")
    try:
        recs = [
            {"headers": {"WARC-Type": "response"}, "payload": b"body one"},
            {"headers": {"WARC-Type": "response"}, "payload": b"body two"},
            {"headers": {"WARC-Type": "response"}, "payload": b"body one"},
        ]
        with open(f"{d}/bad.warc", "wb") as f:
            f.write(warc_bytes(recs))
        docs = warc_to_documents(read_warc(spark, d)).collect()
        assert len(docs) == 3
        assert len({r["doc_id"] for r in docs}) == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


class TestExtractLinks:
    def test_resolution_tiers_and_drops(self, spark):
        """Every RFC 3986-lite tier hand-checked: absolute pass-through,
        protocol-relative, root-relative, path-relative (with and without
        a directory), plus javascript/mailto/fragment drops and
        case-insensitive single-quoted hrefs."""
        from hgraphstorage_spark.sources.warc import extract_links

        pages = spark.createDataFrame(
            [
                (
                    "https://www.site3.com/p5?q=1",
                    '<a href="https://other.com/x">a</a> <A HREF=\'/r/7\'>b</A> '
                    '<a href="img2.png">c</a> <a href="//cdn.net/l.js">d</a> '
                    '<a href="mailto:a@b">e</a> <a href="#top">f</a> '
                    '<a href="javascript:void(0)">g</a>',
                ),
                ("http://site1.com/p9/", '<a href="sub/page.html">g</a>'),
                ("https://site0.com", '<a href="/root">h</a> <a href="rel.html">i</a>'),
                ("https://nolinks.com/x", "<p>nothing here</p>"),
            ],
            "url string, html string",
        )
        got = {(r["url"], r["href"], r["link_url"]) for r in extract_links(pages).collect()}
        assert got == {
            ("https://www.site3.com/p5?q=1", "https://other.com/x", "https://other.com/x"),
            ("https://www.site3.com/p5?q=1", "/r/7", "https://www.site3.com/r/7"),
            ("https://www.site3.com/p5?q=1", "img2.png", "https://www.site3.com/img2.png"),
            ("https://www.site3.com/p5?q=1", "//cdn.net/l.js", "https://cdn.net/l.js"),
            ("http://site1.com/p9/", "sub/page.html", "http://site1.com/p9/sub/page.html"),
            ("https://site0.com", "/root", "https://site0.com/root"),
            ("https://site0.com", "rel.html", "https://site0.com/rel.html"),
        }

    def test_anchor_mode_aligned_and_cleaned(self, spark):
        """with_anchor: (href, anchor) pairs come from ONE two-group
        pattern so they can never misalign; anchor text is tag-stripped
        and whitespace-collapsed; unclosed anchors are skipped (they
        have no anchor text — documented mode difference)."""
        from hgraphstorage_spark.sources.warc import extract_links

        pages = spark.createDataFrame(
            [
                (
                    "https://a.com/p",
                    '<a href="/x"><b>Bold</b> Link\n text</a> '
                    '<a href="https://b.com/y">plain</a> '
                    '<a href="mailto:z@z">m</a> <a href="/unclosed">',
                )
            ],
            "url string, html string",
        )
        got = {
            (r["link_url"], r["anchor"])
            for r in extract_links(pages, with_anchor=True).collect()
        }
        assert got == {
            ("https://a.com/x", "Bold Link text"),
            ("https://b.com/y", "plain"),
        }

    def test_domain_link_graph_aggregates(self, spark):
        from hgraphstorage_spark.sources.warc import domain_link_graph, extract_links

        pages = spark.createDataFrame(
            [
                (
                    "https://www.a.com/1",
                    '<a href="https://b.com/x">.</a><a href="https://b.com/y">.</a>'
                    '<a href="/self">.</a>',
                ),
                ("http://a.com/2", '<a href="https://www.b.com/z">.</a>'),
            ],
            "url string, html string",
        )
        got = {
            (r["src_domain"], r["dst_domain"]): r["n_links"]
            for r in domain_link_graph(extract_links(pages)).collect()
        }
        # www./scheme noise normalizes away: both pages are a.com, all
        # three b-links collapse onto b.com; the self-link is kept
        assert got == {("a.com", "b.com"): 3, ("a.com", "a.com"): 1}


class TestSitemaps:
    def test_cdata_sections_unwrap(self, spark):
        """r8 (VERDICT r7 stretch): CDATA-wrapped element content
        parses as its literal text — raw ampersands survive, and a
        CDATA lastmod feeds the freshness parse like a plain one."""
        from hgraphstorage_spark.sources.warc import parse_sitemaps

        xml = (
            "<urlset>"
            "<url><loc><![CDATA[https://ex.com/p?a=1&b=2]]></loc>"
            "<lastmod><![CDATA[2024-02-03]]></lastmod></url>"
            "<url><loc>https://ex.com/plain&amp;x</loc></url>"
            "</urlset>"
        )
        rows = parse_sitemaps(
            spark.createDataFrame([("ex.com", xml)], "domain string, sitemap_xml string")
        ).orderBy("loc").collect()
        assert rows[0]["loc"] == "https://ex.com/p?a=1&b=2"
        assert rows[0]["lastmod"] == "2024-02-03"
        assert rows[1]["loc"] == "https://ex.com/plain&x"

    def test_parse_feeds_rss_atom(self, spark):
        """RSS + Atom in one pass: CDATA titles, entity decode, link
        from element text (RSS) or either-quote href (Atom), RFC 822
        and ISO date parsing, impossible dates NULL (never an ANSI
        crash), link-less entries dropped."""
        import datetime

        from hgraphstorage_spark.sources.warc import parse_feeds

        rss = (
            "<rss><channel><title>Chan</title>"
            "<item><title><![CDATA[A &amp; B]]></title>"
            "<link>https://ex.com/a?x=1&amp;y=2</link>"
            "<pubDate>Tue, 05 Mar 2024 10:00:00 GMT</pubDate></item>"
            "<item><title>No link here</title></item>"
            "<item><title>Bad date</title><link>https://ex.com/bad</link>"
            "<pubDate>Tue, 99 Mar 2024 10:00:00 GMT</pubDate></item>"
            "</channel></rss>"
        )
        atom = (
            "<feed><entry><title>P1</title>"
            '<link rel="alternate" href="https://ex.com/p1"/>'
            "<updated>2024-02-03T08:00:00Z</updated></entry>"
            "<entry><title>P2</title>"
            "<link href='https://ex.com/p2'/>"
            "<updated>2024-99-99T08:00:00Z</updated></entry></feed>"
        )
        df = spark.createDataFrame(
            [("ex.com", rss), ("ex.com", atom)], "domain string, feed_xml string"
        )
        got = {r["link"]: r for r in parse_feeds(df).collect()}
        a = got["https://ex.com/a?x=1&y=2"]
        assert a["kind"] == "rss" and a["title"] == "A & B"
        assert a["published_date"] == datetime.date(2024, 3, 5)
        assert got["https://ex.com/bad"]["published_date"] is None
        p1 = got["https://ex.com/p1"]
        assert p1["kind"] == "atom"
        assert p1["published_date"] == datetime.date(2024, 2, 3)
        assert got["https://ex.com/p2"]["published_date"] is None
        # the link-less item dropped: 3 rss items -> 2 rows
        assert len(got) == 4

    def test_parse_feeds_rel_aware_link_selection(self, spark):
        """r8 advice pin: an Atom entry listing rel='self'/'edit' links
        BEFORE the article link must still resolve to the
        rel='alternate' (or rel-less) href — first-href selection
        pointed the frontier at the feed itself. When NO
        alternate/rel-less link exists, fall back to the first href."""
        from hgraphstorage_spark.sources.warc import parse_feeds

        atom = (
            "<feed>"
            "<entry><title>A</title>"
            '<link rel="self" href="https://ex.com/feed.xml"/>'
            '<link rel="edit" href="https://ex.com/edit/1"/>'
            '<link rel="alternate" href="https://ex.com/a1"/>'
            "</entry>"
            "<entry><title>B</title>"
            "<link rel='self' href='https://ex.com/feed.xml'/>"
            '<link href="https://ex.com/b1"/>'  # rel-less wins too
            "</entry>"
            "<entry><title>C</title>"
            '<link rel="self" href="https://ex.com/feed.xml"/>'
            "</entry>"  # no alternate at all -> first href fallback
            "</feed>"
        )
        df = spark.createDataFrame([("ex.com", atom)], "domain string, feed_xml string")
        got = {r["title"]: r["link"] for r in parse_feeds(df).collect()}
        assert got["A"] == "https://ex.com/a1"
        assert got["B"] == "https://ex.com/b1"
        assert got["C"] == "https://ex.com/feed.xml"

    def test_parse_feeds_cdata_per_field(self, spark):
        """r8 advice pin: CDATA unwraps per field AFTER block
        extraction, so a CDATA payload is markup-inert — a description
        CDATA containing '<title>'/'<link>' elements no longer hijacks
        the entry's real fields (when they precede it), and a CDATA
        title carrying a raw '<' parses whole (the whole-document
        unwrap turned it into live markup and lost the title)."""
        from hgraphstorage_spark.sources.warc import parse_feeds

        rss = (
            "<rss><channel>"
            "<item><title><![CDATA[Big < news & raw]]></title>"
            "<link>https://ex.com/n1</link>"
            "<description><![CDATA[see <b>bold</b> and a fake "
            "<link>https://evil.example/x</link> inside]]></description>"
            "</item>"
            "</channel></rss>"
        )
        rows = parse_feeds(
            spark.createDataFrame([("ex.com", rss)], "domain string, feed_xml string")
        ).collect()
        assert len(rows) == 1
        assert rows[0]["title"] == "Big < news & raw"
        assert rows[0]["link"] == "https://ex.com/n1"

    def test_urlset_index_entities_and_missing_fields(self, spark):
        from hgraphstorage_spark.sources.warc import parse_sitemaps

        xml1 = (
            '<?xml version="1.0"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://a.com/page?x=1&amp;y=2</loc>"
            "<lastmod>2024-03-01</lastmod><changefreq>daily</changefreq>"
            "<priority>0.8</priority></url>"
            "<url><loc> https://a.com/two </loc></url>"
            "<url><priority>0.5</priority></url></urlset>"  # no loc -> dropped
        )
        xml2 = (
            "<sitemapindex><sitemap><loc>https://b.com/s1.xml</loc>"
            "<lastmod>2024-01-01</lastmod></sitemap>"
            "<sitemap><loc>https://b.com/s2.xml</loc></sitemap></sitemapindex>"
        )
        df = spark.createDataFrame(
            [("a.com", xml1), ("b.com", xml2)], "domain string, sitemap_xml string"
        )
        rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
        assert len(rows) == 4
        p = rows["https://a.com/page?x=1&y=2"]  # entity-decoded loc
        assert (p["kind"], p["lastmod"], p["changefreq"], str(p["priority"])) == (
            "url", "2024-03-01", "daily", "0.8",
        )
        two = rows["https://a.com/two"]  # whitespace trimmed, optionals NULL
        assert two["lastmod"] is None and two["priority"] is None
        s1 = rows["https://b.com/s1.xml"]
        assert s1["kind"] == "sitemap" and s1["lastmod"] == "2024-01-01"
        assert rows["https://b.com/s2.xml"]["kind"] == "sitemap"


class TestRobots:
    def _rules(self, spark, agent="trainbot"):
        from hgraphstorage_spark.sources.warc import parse_robots

        robots = spark.createDataFrame(
            [
                (
                    "a.com",
                    "# hi\nUser-agent: trainbot\nDisallow: /private/\n"
                    "Allow: /private/ok$\nDisallow: /p1*\n\n"
                    "User-agent: *\nDisallow: /\n",
                ),
                # two agents heading ONE group; empty Disallow drops
                ("b.com", "User-agent: *\nUser-agent: otherbot\nDisallow: /blocked\nDisallow:\n"),
                # group for a different agent only — no rules apply
                ("c.com", "User-agent: evilbot\nDisallow: /\n"),
            ],
            "domain string, robots_txt string",
        )
        return parse_robots(robots, agent=agent)

    def test_group_selection_exact_beats_star(self, spark):
        got = {(r["domain"], r["directive"], r["path"]) for r in self._rules(spark).collect()}
        assert got == {
            ("a.com", "disallow", "/private/"),
            ("a.com", "allow", "/private/ok$"),
            ("a.com", "disallow", "/p1*"),
            ("b.com", "disallow", "/blocked"),
        }

    def test_star_group_when_no_exact(self, spark):
        got = {(r["domain"], r["path"]) for r in self._rules(spark, agent="nobody").collect()}
        # a.com falls back to its * group (Disallow: /); c.com has none
        assert got == {("a.com", "/"), ("b.com", "/blocked")}

    def test_filter_precedence_and_wildcards(self, spark):
        from hgraphstorage_spark.sources.warc import robots_filter

        urls = spark.createDataFrame(
            [
                (1, "https://www.a.com/private/ok"),   # $-anchored allow wins
                (2, "https://a.com/private/okay"),     # anchor must NOT match
                (3, "http://a.com/p15?q=1"),           # wildcard disallow
                (4, "https://a.com/open"),             # no rule -> allowed
                (5, "https://b.com/blocked/page"),     # prefix disallow
                (6, "https://nowhere.com/x"),          # unknown host -> allowed
            ],
            "doc_id long, url string",
        )
        got = {r["doc_id"]: r for r in robots_filter(urls, self._rules(spark)).collect()}
        assert got[1]["allowed"] and got[1]["matched_rule"] == "/private/ok$"
        assert not got[2]["allowed"] and got[2]["matched_rule"] == "/private/"
        assert not got[3]["allowed"] and got[3]["matched_rule"] == "/p1*"
        assert got[4]["allowed"] and got[4]["matched_rule"] is None
        assert not got[5]["allowed"]
        assert got[6]["allowed"]

    def test_www_keyed_rules_match_apex_urls(self, spark):
        """ADVICE r6: rules keyed 'www.example.com' (or mixed case) must
        gate both www and apex URLs — previously the rules side joined
        verbatim and such rules silently never matched (fail-open)."""
        from hgraphstorage_spark.sources.warc import parse_robots, robots_filter

        robots = spark.createDataFrame(
            [("www.Example.com", "User-agent: *\nDisallow: /secret\n")],
            "domain string, robots_txt string",
        )
        rules = parse_robots(robots)
        urls = spark.createDataFrame(
            [
                (1, "https://example.com/secret/x"),
                (2, "https://www.example.com/secret/x"),
                (3, "https://example.com/open"),
            ],
            "doc_id long, url string",
        )
        got = {r["doc_id"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
        assert got == {1: False, 2: False, 3: True}

    def test_like_metacharacters_escaped(self, spark):
        """A rule path containing % or _ must match literally, not as a
        LIKE wildcard."""
        from hgraphstorage_spark.sources.warc import parse_robots, robots_filter

        robots = spark.createDataFrame(
            [("x.com", "User-agent: *\nDisallow: /a%b\nDisallow: /c_d\n")],
            "domain string, robots_txt string",
        )
        rules = parse_robots(robots)
        urls = spark.createDataFrame(
            [
                (1, "https://x.com/a%b/z"),  # literal % -> blocked
                (2, "https://x.com/aXb/z"),  # % must not wildcard
                (3, "https://x.com/c_d"),    # literal _ -> blocked
                (4, "https://x.com/cXd"),    # _ must not wildcard
            ],
            "doc_id long, url string",
        )
        got = {r["doc_id"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
        assert got == {1: False, 2: True, 3: False, 4: True}


    def test_group_adjacency_over_all_directive_lines(self, spark):
        """r7 review catch (execution-confirmed): adjacency computed over
        a FILTERED line set leaked directives across groups. A Disallow
        line closes an agent's user-agent run even for the crawl-delay
        caller; an ignored directive between user-agent lines splits
        groups for the rules caller too."""
        from hgraphstorage_spark.sources.warc import parse_robots, robots_extras

        robots = spark.createDataFrame(
            [
                # googlebot's run closed by Disallow; trainbot's delay is
                # a SEPARATE group — googlebot must get NULL delay
                ("a.com", "User-agent: googlebot\nDisallow: /a\n"
                          "User-agent: trainbot\nCrawl-delay: 5\n"),
                # agent a's run closed by Crawl-delay; b's Disallow /x
                # must NOT apply to a
                ("b.com", "User-agent: aa\nCrawl-delay: 5\n"
                          "User-agent: bb\nDisallow: /x\n"),
                # blank/comment lines never split a user-agent run
                ("c.com", "User-agent: aa\n\n# note\nUser-agent: bb\nDisallow: /y\n"),
            ],
            "domain string, robots_txt string",
        )
        goog = {r["domain"]: r for r in robots_extras(robots, agent="googlebot").collect()}
        assert goog["a.com"]["crawl_delay"] is None
        rules_a = {(r["domain"], r["path"]) for r in parse_robots(robots, agent="aa").collect()}
        assert ("b.com", "/x") not in rules_a  # bb's rule, separate group
        assert ("c.com", "/y") in rules_a  # blank+comment keep aa/bb adjacent

    def test_robots_extras_group_scoped_delay_and_sitemaps(self, spark):
        """crawl_delay follows the SAME group selection as the rules
        (exact agent beats *); malformed values are NULL not errors;
        Sitemap lines collect document-wide in source order."""
        from hgraphstorage_spark.sources.warc import robots_extras

        robots = spark.createDataFrame(
            [
                ("a.com",
                 "User-agent: trainbot\nCrawl-delay: 2.5\nDisallow: /x\n\n"
                 "User-agent: *\nCrawl-delay: 9\n\n"
                 "Sitemap: https://a.com/sm.xml\nSitemap: https://a.com/sm2.xml\n"),
                ("b.com", "User-agent: *\nDisallow: /\n"),
                ("c.com", "User-agent: *\nCrawl-delay: oops\n"),
            ],
            "domain string, robots_txt string",
        )
        got = {r["domain"]: r for r in robots_extras(robots, agent="trainbot").collect()}
        assert got["a.com"]["crawl_delay"] == 2.5
        assert got["a.com"]["sitemap_urls"] == ["https://a.com/sm.xml", "https://a.com/sm2.xml"]
        assert got["b.com"]["crawl_delay"] is None and got["b.com"]["sitemap_urls"] == []
        assert got["c.com"]["crawl_delay"] is None


class TestCrawlFrontier:
    def test_composition_demand_gate_politeness_rank(self, spark):
        """links → demand counts → robots gate → crawl-delay join →
        per-host rank; blocked urls visible but unranked; sitemap
        priority lifts the score by priority_weight·priority."""
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            parse_robots,
            parse_sitemaps,
            robots_extras,
        )

        pages = spark.createDataFrame(
            [
                (1, "https://x.com/a",
                 '<a href="https://t.com/hot">one</a> <a href="https://t.com/blocked">two</a>'),
                (2, "https://y.com/b",
                 '<a href="https://t.com/hot">three</a> <a href="https://u.com/solo">x</a>'),
                (3, "https://z.com/c", '<a href="https://t.com/hot">four</a>'),
            ],
            "doc_id long, url string, html string",
        )
        robots = spark.createDataFrame(
            [("t.com", "User-agent: *\nDisallow: /blocked\nCrawl-delay: 3\n")],
            "domain string, robots_txt string",
        )
        sm = parse_sitemaps(spark.createDataFrame(
            [("t.com", "<urlset><url><loc>https://t.com/hot</loc>"
              "<priority>0.9</priority></url></urlset>")],
            "domain string, sitemap_xml string",
        ))
        out = {
            r["url"]: r
            for r in crawl_frontier(
                extract_links(pages),
                parse_robots(robots),
                extras=robots_extras(robots),
                sitemap_entries=sm,
            ).collect()
        }
        hot = out["https://t.com/hot"]
        assert (hot["n_inlinks"], hot["n_sources"]) == (3, 3)
        assert float(hot["score"]) == 3.0 + 2.0 * 0.9  # priority lift
        assert hot["allowed"] and hot["host_rank"] == 1
        assert hot["crawl_delay"] == 3.0
        blocked = out["https://t.com/blocked"]
        assert not blocked["allowed"] and blocked["host_rank"] is None
        solo = out["https://u.com/solo"]  # unknown host: allowed, no delay
        assert solo["allowed"] and solo["host_rank"] == 1
        assert solo["crawl_delay"] is None
        # no as_of → the freshness term is inert and the score is
        # unchanged (back-compat)
        assert float(hot["recrawl_due"]) == 0.0

    def test_freshness_recrawl_term(self, spark):
        """VERDICT r7 task 3: lastmod/changefreq schedule RE-crawl.
        With equal inlink demand, a STALE daily-changing URL outranks a
        fresh one; the staleness ratio clamps at the cap; 'never' and a
        missing lastmod contribute 0; a future lastmod floors at 0."""
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            parse_robots,
            parse_sitemaps,
        )

        pages = spark.createDataFrame(
            [
                (1, "https://x.com/a",
                 '<a href="https://t.com/stale">s</a>'
                 '<a href="https://t.com/fresh">f</a>'
                 '<a href="https://t.com/ancient">a</a>'
                 '<a href="https://t.com/never">n</a>'
                 '<a href="https://t.com/future">u</a>'),
            ],
            "doc_id long, url string, html string",
        )
        sm = parse_sitemaps(spark.createDataFrame(
            [("t.com",
              "<urlset>"
              "<url><loc>https://t.com/stale</loc><lastmod>2024-02-20</lastmod>"
              "<changefreq>daily</changefreq></url>"
              "<url><loc>https://t.com/fresh</loc><lastmod>2024-02-29</lastmod>"
              "<changefreq>daily</changefreq></url>"
              "<url><loc>https://t.com/ancient</loc><lastmod>2023-01-01</lastmod>"
              "<changefreq>hourly</changefreq></url>"
              "<url><loc>https://t.com/never</loc><lastmod>2023-01-01</lastmod>"
              "<changefreq>never</changefreq></url>"
              "<url><loc>https://t.com/future</loc><lastmod>2024-12-31</lastmod>"
              "<changefreq>daily</changefreq></url>"
              "</urlset>")],
            "domain string, sitemap_xml string",
        ))
        rules = parse_robots(spark.createDataFrame(
            [("t.com", "")], "domain string, robots_txt string"
        ))
        out = {
            r["url"]: r
            for r in crawl_frontier(
                extract_links(pages), rules, sitemap_entries=sm,
                as_of="2024-03-01",
            ).collect()
        }
        # 10 days overdue at daily cadence vs 1 day
        assert float(out["https://t.com/stale"]["recrawl_due"]) == 10.0
        # (impossible-date tolerance is pinned separately below)
        assert float(out["https://t.com/fresh"]["recrawl_due"]) == 1.0
        # hourly + 425 days stale would be huge — clamps at the cap
        assert float(out["https://t.com/ancient"]["recrawl_due"]) == 10.0
        assert float(out["https://t.com/never"]["recrawl_due"]) == 0.0
        assert float(out["https://t.com/future"]["recrawl_due"]) == 0.0
        # equal demand: staleness decides the host ranking
        assert out["https://t.com/stale"]["host_rank"] < out["https://t.com/fresh"]["host_rank"]
        assert float(out["https://t.com/stale"]["score"]) == 1.0 + 0.5 * 10.0

    def test_feed_hints_drive_freshness(self, spark):
        """parse_feeds -> feed_hints -> crawl_frontier: a feed entry's
        published date becomes the lastmod freshness signal (daily
        cadence default), so a stale feed item accrues recrawl_due."""
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            feed_hints,
            parse_feeds,
            parse_robots,
        )

        pages = spark.createDataFrame(
            [(1, "https://x.com/a", '<a href="https://t.com/story">s</a>')],
            "doc_id long, url string, html string",
        )
        feeds = spark.createDataFrame(
            [("t.com",
              "<rss><channel><item><title>S</title>"
              "<link>https://t.com/story</link>"
              "<pubDate>Tue, 20 Feb 2024 10:00:00 GMT</pubDate>"
              "</item></channel></rss>")],
            "domain string, feed_xml string",
        )
        rules = parse_robots(spark.createDataFrame(
            [("t.com", "")], "domain string, robots_txt string"
        ))
        out = crawl_frontier(
            extract_links(pages), rules,
            sitemap_entries=feed_hints(parse_feeds(feeds)),
            as_of="2024-03-01",
        ).collect()
        # 10 days stale at the daily default
        assert float(out[0]["recrawl_due"]) == 10.0

    def test_frontier_schedule_politeness_slots(self, spark):
        """Fetch slots: rank 1 at t=0, then one crawl-delay apart; the
        1 s default applies to opinion-less hosts; disallowed rows and
        ranks beyond the cap drop."""
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            frontier_schedule,
            parse_robots,
            robots_extras,
        )

        pages = spark.createDataFrame(
            [(1, "https://x.com/a",
              '<a href="https://t.com/1">a</a><a href="https://t.com/2">b</a>'
              '<a href="https://t.com/3">c</a><a href="https://t.com/blocked">d</a>'
              '<a href="https://u.com/1">e</a><a href="https://u.com/2">f</a>')],
            "doc_id long, url string, html string",
        )
        robots = spark.createDataFrame(
            [("t.com", "User-agent: *\nDisallow: /blocked\nCrawl-delay: 3\n")],
            "domain string, robots_txt string",
        )
        fr = crawl_frontier(
            extract_links(pages), parse_robots(robots),
            extras=robots_extras(robots),
        )
        got = {
            (r["host"], r["host_rank"]): r["fetch_at_sec"]
            for r in frontier_schedule(fr, max_per_host=2).collect()
        }
        # t.com honors its 3 s delay; u.com gets the 1 s default
        assert got[("t.com", 1)] == 0.0 and got[("t.com", 2)] == 3.0
        assert got[("u.com", 1)] == 0.0 and got[("u.com", 2)] == 1.0
        # cap: t.com/3 (rank 3) and the blocked row are gone
        assert len(got) == 4

    def test_impossible_lastmod_is_null_not_crash(self, spark):
        """ANSI mode (Spark 4 default): a lastmod that matches the
        date SHAPE but is an impossible date (2024-99-99) must yield a
        zero freshness term, not a mid-scan SparkDateTimeException —
        the oracle's try_cast semantics."""
        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            parse_robots,
            parse_sitemaps,
        )

        pages = spark.createDataFrame(
            [(1, "https://x.com/a", '<a href="https://t.com/bad">b</a>')],
            "doc_id long, url string, html string",
        )
        sm = parse_sitemaps(spark.createDataFrame(
            [("t.com",
              "<urlset><url><loc>https://t.com/bad</loc>"
              "<lastmod>2024-99-99</lastmod>"
              "<changefreq>daily</changefreq></url></urlset>")],
            "domain string, sitemap_xml string",
        ))
        rules = parse_robots(spark.createDataFrame(
            [("t.com", "")], "domain string, robots_txt string"
        ))
        out = crawl_frontier(
            extract_links(pages), rules, sitemap_entries=sm, as_of="2024-03-01"
        ).collect()
        assert float(out[0]["recrawl_due"]) == 0.0


class TestAnchorTextIndex:
    def test_counts_topk_and_empty_anchor_row(self, spark):
        from hgraphstorage_spark.sources.warc import anchor_text_index, extract_links

        pages = spark.createDataFrame(
            [
                (1, "https://a.com/x", '<a href="https://t.com/p">deep learning</a>'),
                (2, "https://b.com/y", '<a href="https://t.com/p">deep nets</a>'),
                # same SOURCE links twice: n_inlinks 2, n_sources 1
                (
                    3,
                    "https://c.com/z",
                    '<a href="https://e.com/q"> </a><a href="https://e.com/q"> </a>',
                ),
            ],
            "doc_id long, url string, html string",
        )
        idx = anchor_text_index(extract_links(pages, with_anchor=True), top_k=2)
        rows = {(r["link_url"], r["token"]): r for r in idx.collect()}
        t = rows[("https://t.com/p", "deep")]
        assert (t["n_inlinks"], t["n_sources"], t["n"], t["rank"]) == (2, 2, 2, 1)
        # count tie at 1: 'learning' beats 'nets' alphabetically at rank 2
        assert ("https://t.com/p", "learning") in rows
        assert ("https://t.com/p", "nets") not in rows
        # whitespace-only anchors: inlink accounting survives, token NULL
        e = rows[("https://e.com/q", None)]
        assert (e["n_inlinks"], e["n_sources"]) == (2, 1)
        assert e["token"] is None and e["rank"] is None

    def test_crlf_robots_and_uppercase_scheme(self, spark):
        """CRLF-served robots.txt (the dominant real-world format) must
        parse identically to LF, and an uppercase URL scheme must not
        bypass the gate (RFC 3986 schemes are case-insensitive) —
        review-confirmed fail-open bugs."""
        from hgraphstorage_spark.sources.warc import parse_robots, robots_filter

        robots = spark.createDataFrame(
            [("x.com", "User-agent: trainbot\r\nDisallow: /private\r\n")],
            "domain string, robots_txt string",
        )
        rules = parse_robots(robots, agent="trainbot")
        got = {(r["domain"], r["directive"], r["path"]) for r in rules.collect()}
        assert got == {("x.com", "disallow", "/private")}
        urls = spark.createDataFrame(
            [(1, "HTTPS://x.com/private/doc"), (2, "https://X.COM/private/doc")],
            "doc_id long, url string",
        )
        out = {r["doc_id"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
        assert out == {1: False, 2: False}


class TestHttpEnvelope:
    def test_envelope_fields_from_warc_records(self, spark):
        """read_warc -> http_envelope: status line + revisit headers
        parse out of the payload (case-insensitive names, trimmed
        values, ETag kept verbatim incl. W/ prefix and quotes);
        non-HTTP payloads (warcinfo/request) yield NULL envelopes."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            http_envelope,
            read_warc,
            warc_bytes,
        )

        rich = (
            b"HTTP/1.1 301 Moved Permanently\r\n"
            b"ETAG: W/\"abc-123\"\r\n"
            b"last-modified: Tue, 05 Mar 2024 10:00:00 GMT\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Cache-Control: public, max-age=3600, s-maxage=7200\r\n"
            b"Expires: Wed, 06 Mar 2024 10:00:00 GMT\r\n"
            b"Location: https://example.com/new\r\n"
            b"\r\n<html>moved</html>"
        )
        bare = b"HTTP/1.0 200 OK\r\n\r\nbody with no revisit headers"
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:10>",
                    "WARC-Target-URI": "http://example.com/rich",
                    "WARC-Date": "2024-03-05T12:00:00Z",
                },
                "payload": rich,
            },
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:11>",
                    "WARC-Target-URI": "http://example.com/bare",
                    "WARC-Date": "2024-03-05T12:00:00Z",
                },
                "payload": bare,
            },
            {
                "headers": {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:12>"},
                "payload": b"software: test\r\n",
            },
        ]
        d = tempfile.mkdtemp(prefix="hgs_env_")
        try:
            with open(f"{d}/shard0.warc", "wb") as f:
                f.write(warc_bytes(recs))
            got = {
                r["target_uri"]: r
                for r in http_envelope(read_warc(spark, d)).collect()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
        r = got["http://example.com/rich"]
        assert (r["http_version"], r["http_status"], r["http_reason"]) == (
            "1.1", 301, "Moved Permanently"
        )
        assert r["etag"] == 'W/"abc-123"'  # verbatim: If-None-Match echoes it
        assert r["last_modified"] == "Tue, 05 Mar 2024 10:00:00 GMT"
        assert str(r["last_modified_date"]) == "2024-03-05"
        assert r["http_content_type"] == "text/html; charset=utf-8"
        assert r["max_age_sec"] == 3600  # plain max-age, not s-maxage
        assert str(r["expires_date"]) == "2024-03-06"
        assert r["location"] == "https://example.com/new"
        b = got["http://example.com/bare"]
        assert (b["http_version"], b["http_status"]) == ("1.0", 200)
        assert b["etag"] is None and b["max_age_sec"] is None
        assert b["last_modified_date"] is None and b["expires_date"] is None
        w = got[None]  # warcinfo has no target URI
        assert w["http_status"] is None and w["http_version"] is None

    def test_headers_map_and_revisit_records(self, spark):
        """r9: read_warc preserves EVERY WARC header in a lowercased
        map, and revisit_records projects the WARC/1.1 §6.7 revisit
        surface — the archival form of an unchanged re-fetch — out of
        it. Non-revisit records are excluded; absent refers-to fields
        are NULL."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            read_warc,
            revisit_records,
            warc_bytes,
        )

        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:1>",
                    "WARC-Target-URI": "https://t.com/a",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
                "payload": b"HTTP/1.1 200 OK\r\n\r\nbody",
            },
            {
                "headers": {
                    "WARC-Type": "revisit",
                    "WARC-Record-ID": "<urn:uuid:2>",
                    "WARC-Target-URI": "https://t.com/a",
                    "WARC-Date": "2024-02-01T00:00:00Z",
                    "WARC-Profile": "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                    "WARC-Refers-To": "<urn:uuid:1>",
                    "WARC-Refers-To-Target-URI": "https://t.com/a",
                    "WARC-Refers-To-Date": "2024-01-01T00:00:00Z",
                    "WARC-Payload-Digest": "sha1:ABC",
                },
                "payload": b"",
            },
            {
                "headers": {
                    "WARC-Type": "revisit",
                    "WARC-Record-ID": "<urn:uuid:3>",
                    "WARC-Target-URI": "https://t.com/b",
                    "WARC-Date": "2024-02-02T00:00:00Z",
                    "WARC-Payload-Digest": "sha1:DEF",
                },
                "payload": b"",
            },
        ]
        d = tempfile.mkdtemp(prefix="hgs_revrec_")
        try:
            with open(f"{d}/shard0.warc", "wb") as f:
                f.write(warc_bytes(recs))
            frame = read_warc(spark, d)
            hmap = frame.filter("warc_type = 'response'").collect()[0]["headers"]
            assert hmap["warc-target-uri"] == "https://t.com/a"
            got = {r["record_id"]: r for r in revisit_records(frame).collect()}
        finally:
            shutil.rmtree(d, ignore_errors=True)
        assert set(got) == {"<urn:uuid:2>", "<urn:uuid:3>"}
        r2 = got["<urn:uuid:2>"]
        assert r2["refers_to"] == "<urn:uuid:1>"
        assert r2["refers_to_date"] == "2024-01-01T00:00:00Z"
        assert r2["profile"].endswith("identical-payload-digest")
        assert r2["payload_digest"] == "sha1:ABC"
        r3 = got["<urn:uuid:3>"]
        assert r3["refers_to"] is None and r3["refers_to_target_uri"] is None

    def test_lf_only_headers_parse(self, spark):
        """RFC 9112 §2.2: accept bare-LF line endings — some origin
        servers emit LF-only envelopes and a recrawler still needs
        their validators; the header block ends at the first blank
        line of either form, so body lines never read as headers."""
        from hgraphstorage_spark.sources.warc import http_envelope

        lf = (
            b"HTTP/1.1 200 OK\n"
            b"ETag: \"lf-1\"\n"
            b"Cache-Control: max-age=60\n"
            b"\n"
            b"body\nFake-Header: in-body\n"
        )
        df = spark.createDataFrame(
            [("u", bytearray(lf))], "target_uri string, payload binary"
        )
        r = http_envelope(df).collect()[0]
        assert (r["http_status"], r["etag"], r["max_age_sec"]) == (200, '"lf-1"', 60)
        assert r["http_reason"] == "OK"
        # the blank line ended the block: body lines are not headers
        assert r["location"] is None

    def test_envelope_zero_shuffle_plan(self, spark):
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import http_envelope

        df = spark.createDataFrame(
            [("u", bytearray(b"HTTP/1.1 200 OK\r\n\r\nx"))],
            "target_uri string, payload binary",
        )
        plan = executed_plan(http_envelope(df))
        assert "Exchange" not in plan and "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestRevisitPlan:
    def _env(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "target_uri string, warc_date string, http_status int, etag string, "
            "last_modified string, last_modified_date date, max_age_sec long, "
            "expires_date date",
        )

    def test_interval_precedence_and_validators(self, spark):
        """max-age wins over Expires wins over the age heuristic wins
        over the default; etag is the preferred validator;
        If-Modified-Since falls back to the fetch date; intervals
        clamp; a row with no fetch date gets NULL schedule columns."""
        import datetime as dt

        from hgraphstorage_spark.sources.warc import revisit_plan

        D = dt.date
        rows = [
            # max-age 2 days beats expires AND last-modified age
            ("u1", "2024-03-01T00:00:00Z", 200, '"e1"',
             "Thu, 01 Feb 2024 00:00:00 GMT", D(2024, 2, 1), 172800, D(2024, 3, 31)),
            # no max-age: expires horizon = 30 days
            ("u2", "2024-03-01T00:00:00Z", 200, None,
             "Thu, 01 Feb 2024 00:00:00 GMT", D(2024, 2, 1), None, D(2024, 3, 31)),
            # no max-age/expires: age heuristic 0.1 * (as_of - lastmod)
            ("u3", "2024-03-01T00:00:00Z", 200, None,
             "Fri, 01 Mar 2019 00:00:00 GMT", D(2019, 3, 1), None, None),
            # nothing: default 7 days
            ("u4", "2024-03-01T00:00:00Z", 200, None, None, None, None, None),
            # tiny max-age clamps up to the floor
            ("u5", "2024-03-01T00:00:00Z", 200, '"e5"', None, None, 60, None),
            # unparseable fetch date: NULL schedule
            ("u6", None, 200, '"e6"', None, None, 3600, None),
        ]
        got = {
            r["url"]: r
            for r in revisit_plan(self._env(spark, rows), as_of="2024-03-10").collect()
        }
        from decimal import Decimal

        u1 = got["u1"]
        assert u1["validator"] == "etag" and u1["if_none_match"] == '"e1"'
        assert u1["interval_days"] == Decimal("2.000000")
        assert str(u1["next_fetch_date"]) == "2024-03-03"
        assert u1["revisit_due"] is True  # as_of 03-10 past 03-03
        u2 = got["u2"]
        assert u2["validator"] == "last-modified"
        assert u2["if_modified_since"] == "Thu, 01 Feb 2024 00:00:00 GMT"
        assert u2["interval_days"] == Decimal("30.000000")
        assert u2["revisit_due"] is False  # due 03-31
        u3 = got["u3"]
        # age = 2024-03-10 - 2019-03-01 = 1836 days -> 183.6, clamps to 365? no:
        # 183.6 < 365 so stays; next fetch = fetch + ceil(183.6)
        assert u3["interval_days"] == Decimal("183.600000")
        u4 = got["u4"]
        assert u4["validator"] is None and u4["if_none_match"] is None
        # fetch-date fallback is an RFC 9110 IMF-fixdate, never an ISO
        # string (a compliant server MUST ignore an invalid HTTP-date,
        # silently degrading the conditional fetch — r9 VERDICT fix)
        assert u4["if_modified_since"] == "Fri, 01 Mar 2024 00:00:00 GMT"
        assert u4["interval_days"] == Decimal("7.000000")
        # every non-NULL If-Modified-Since in the plan is a VALID
        # HTTP-date (IMF-fixdate shape)
        import re

        imf = re.compile(
            r"^(Mon|Tue|Wed|Thu|Fri|Sat|Sun), \d{2} "
            r"(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
            r"\d{4} \d{2}:\d{2}:\d{2} GMT$"
        )
        for r in got.values():
            if r["if_modified_since"] is not None:
                assert imf.match(r["if_modified_since"]), r["if_modified_since"]
        u5 = got["u5"]
        assert u5["interval_days"] == Decimal("0.500000")  # floor clamp
        assert u5["revisit_due"] is True
        u6 = got["u6"]
        assert u6["interval_days"] is None and u6["next_fetch_date"] is None
        assert u6["revisit_due"] is None

    def test_measured_interval_overrides_declaration_chain(self, spark):
        """An url_change_rate frame passed as ``measured`` overrides the
        whole declaration/heuristic chain where its interval is non-NULL
        (empirical history beats declared cache lifetimes), still
        clamped; URLs without measured evidence fall through unchanged.
        The join keys on surt_key(url), so any surt-equal variant of the
        envelope URL matches the CDX-derived urlkey."""
        import datetime as dt
        from decimal import Decimal

        from hgraphstorage_spark.sources.warc import revisit_plan

        D = dt.date
        rows = [
            # server declares max-age 2 days, but history says 12.5
            ("https://www.m.com:443/a", "2024-03-01T00:00:00Z", 200, '"e"',
             None, None, 172800, None),
            # no measured row: default chain (7 days) survives
            ("https://m.com/b", "2024-03-01T00:00:00Z", 200, None,
             None, None, None, None),
            # measured 0.01 days clamps up to the 0.5 floor
            ("https://m.com/c", "2024-03-01T00:00:00Z", 200, None,
             None, None, None, None),
        ]
        hist = spark.createDataFrame(
            [("com,m)/a", 12.5), ("com,m)/c", 0.01), ("com,m)/zz", 99.0)],
            "urlkey string, est_change_interval_days double",
        )
        got = {
            r["url"]: r
            for r in revisit_plan(
                self._env(spark, rows), as_of="2024-03-10", measured=hist
            ).collect()
        }
        assert got["https://www.m.com:443/a"]["interval_days"] == Decimal("12.500000")
        assert got["https://m.com/b"]["interval_days"] == Decimal("7.000000")
        assert got["https://m.com/c"]["interval_days"] == Decimal("0.500000")

    def test_zero_shuffle_plan(self, spark):
        from hgraphstorage_spark.plans.audit import executed_plan
        from hgraphstorage_spark.sources.warc import revisit_plan

        plan = executed_plan(
            revisit_plan(self._env(spark, []), as_of="2024-03-10")
        )
        assert "Exchange" not in plan and "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCrawlLifecycle:
    def test_wave_to_wave_composition(self, spark, tmp_path=None):
        """The whole r7-r9 crawl lifecycle as one composition. Wave 1 is
        a WARC shard of fetched pages; from it flow BOTH halves of wave
        2's work list: (a) the REVISIT half — http_envelope → streaming
        validator register → revisit_plan at a pinned as_of → the due
        subset with its conditional headers; (b) the DISCOVERY half —
        warc_to_documents → extract_links → crawl_frontier under the
        robots gate → frontier_schedule fetch slots. A fresh page
        (max-age far out) is NOT re-fetched; a stale page is; a
        disallowed discovered link never reaches the schedule."""
        import shutil
        import tempfile

        from hgraphstorage_spark.sources.warc import (
            crawl_frontier,
            extract_links,
            frontier_schedule,
            http_envelope,
            parse_robots,
            read_warc,
            revisit_plan,
            warc_bytes,
            warc_to_documents,
        )
        from hgraphstorage_spark.streaming import stream_validator_register

        body_fresh = (
            b"HTTP/1.1 200 OK\r\nETag: \"f1\"\r\n"
            b"Cache-Control: max-age=31536000\r\n"
            b"Content-Type: text/html\r\n\r\n"
            b'<html><a href="https://new.com/a">a</a>'
            b'<a href="https://new.com/blocked/b">b</a></html>'
        )
        body_stale = (
            b"HTTP/1.1 200 OK\r\nETag: \"s1\"\r\n"
            b"Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n"
            b"Content-Type: text/html\r\n\r\n"
            b'<html><a href="https://new.com/c">c</a></html>'
        )
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:f>",
                    "WARC-Target-URI": "https://old.com/fresh",
                    "WARC-Date": "2024-06-20T00:00:00Z",
                },
                "payload": body_fresh,
            },
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:s>",
                    "WARC-Target-URI": "https://old.com/stale",
                    "WARC-Date": "2024-01-05T00:00:00Z",
                },
                "payload": body_stale,
            },
        ]
        d = tempfile.mkdtemp(prefix="hgs_lifecycle_")
        try:
            with open(f"{d}/wave1.warc", "wb") as f:
                f.write(warc_bytes(recs))
            frame = read_warc(spark, d)
            # (a) revisit half — envelopes stream into the register
            env = http_envelope(frame).select(
                "target_uri", "warc_date", "etag", "last_modified", "http_status"
            )
            env.repartition(2).write.mode("overwrite").parquet(f"{d}/env_src")
            stream = (
                spark.readStream.schema(env.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/env_src")
            )
            q = stream_validator_register(stream, f"{d}/ckpt", f"{d}/regs")
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            register = spark.read.parquet(f"{d}/regs").withColumnRenamed(
                "fetch", "warc_date"
            ).withColumnRenamed("url", "target_uri")
            # the register needs the freshness headers for interval
            # derivation — join back the envelope columns it summarizes
            plan_in = register.join(
                http_envelope(frame).select(
                    "target_uri", "max_age_sec", "last_modified_date",
                    "expires_date",
                ),
                "target_uri",
            )
            dues = {
                r["url"]: r
                for r in revisit_plan(plan_in, as_of="2024-07-01").collect()
            }
            assert dues["https://old.com/fresh"]["revisit_due"] is False
            stale = dues["https://old.com/stale"]
            assert stale["revisit_due"] is True
            assert stale["if_none_match"] == '"s1"'
            # (b) discovery half — fetched pages feed the new frontier
            # (links come from the RAW html; warc_to_documents strips
            # markup, so extract from the record payloads directly)
            assert warc_to_documents(frame).count() == 2  # corpus side intact
            raw_pages = frame.filter(F.col("warc_type") == "response").select(
                F.col("target_uri").alias("url"),
                F.col("payload").cast("string").alias("html"),
            )
            rules = parse_robots(
                spark.createDataFrame(
                    [("new.com", "User-agent: *\nDisallow: /blocked\n")],
                    "domain string, robots_txt string",
                )
            )
            fr = crawl_frontier(extract_links(raw_pages), rules)
            schedule = {
                r["url"]: r for r in frontier_schedule(fr).collect()
            }
            assert "https://new.com/a" in schedule
            assert "https://new.com/c" in schedule
            assert "https://new.com/blocked/b" not in schedule
            # wave 2's work list: due revisits + allowed discoveries
            wave2 = sorted(
                [u for u, r in dues.items() if r["revisit_due"]]
                + list(schedule)
            )
            assert wave2 == [
                "https://new.com/a", "https://new.com/c",
                "https://old.com/stale",
            ]
        finally:
            shutil.rmtree(d, ignore_errors=True)
