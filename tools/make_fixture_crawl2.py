"""Build fixtures/crawl2.warc.gz — the wire-encoding fixture shard (r10).

crawl.warc.gz (r6) covers the plain ingest path; this sibling commits
byte-deterministic records exercising the decode tiers a real crawl
hits: a chunked + gzipped HTML response, a latin-1 (charset-declared)
plain-text response, and a request record (must be filtered out
everywhere). mtime-0 gzip members via warc_bytes, so the shard — and
therefore every offset/length/md5 literal in the wet_export /
cdx_roundtrip / warc_ingest oracles — is reproducible byte-for-byte by
re-running this script.

Run from the repo root: python tools/make_fixture_crawl2.py
"""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hgraphstorage_spark.sources.warc import warc_bytes


def build() -> bytes:
    html = (
        b"<html><head><title>Chunked &amp; Zipped</title></head>"
        b"<body><p>Wire encodings survive the archive.</p></body></html>"
    )
    gz = gzip.compress(html, mtime=0)
    chunked = (
        hex(len(gz))[2:].encode() + b";ext=1\r\n" + gz + b"\r\n0\r\nX-Trailer: t\r\n\r\n"
    )
    latin = "Ingénieur: café, déjà vu - naïve rosé".encode("iso-8859-1")
    records = [
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:resp-c1>",
                "WARC-Target-URI": "http://fixture.example.com/chunked",
                "WARC-Date": "2024-02-01T00:00:00Z",
            },
            "payload": (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Transfer-Encoding: chunked\r\n"
                b"Content-Encoding: gzip\r\n\r\n" + chunked
            ),
        },
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:resp-c2>",
                "WARC-Target-URI": "http://fixture.example.com/latin1",
                "WARC-Date": "2024-02-01T00:00:01Z",
            },
            "payload": (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain; charset=ISO-8859-1\r\n\r\n" + latin
            ),
        },
        {
            "headers": {
                "WARC-Type": "request",
                "WARC-Record-ID": "<urn:uuid:req-c1>",
                "WARC-Target-URI": "http://fixture.example.com/chunked",
                "WARC-Date": "2024-02-01T00:00:00Z",
            },
            "payload": b"GET /chunked HTTP/1.1\r\nHost: fixture.example.com\r\n\r\n",
        },
    ]
    return warc_bytes(records, compress=True)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "fixtures", "crawl2.warc.gz")
    blob = build()
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out} ({len(blob)} bytes)")
