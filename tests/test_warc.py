"""WARC connector tests: writer/parser round trip (plain + per-record
gzip members), Spark read path, documents projection, HTML extraction,
and loud failure on corrupt shards."""

from __future__ import annotations

import shutil
import tempfile

import pytest

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
        # doc_id deterministic across the two shards: same (url, date) -> same id
        ids = [r["doc_id"] for r in docs if r["url"] == "http://example.com/a"]
        assert len(ids) == 2 and len(set(ids)) == 1
