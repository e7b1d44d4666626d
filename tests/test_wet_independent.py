"""Independent-toolchain certification of the ``wet_export`` oracle.

The driver oracle for ``wet_export`` is literal VALUES rows — the
weakest oracle form, acceptable only because the expected rows are
properties of the committed fixture bytes. This module is the promised
independent derivation (r10 VERDICT task 1): a SECOND toolchain,
stdlib-only and mechanism-disjoint from ``sources/warc.py`` —
``html.parser.HTMLParser`` + ``html.unescape`` instead of regex
tag-stripping, its own WARC framing walk, its own chunked/gzip/charset
decode — recomputes every (target_uri, refers_to, n_bytes, text_md5)
row from ``fixtures/*.warc.gz`` and must agree with the DuckDB
evaluation of ``oracle_sql()['wet_export']``. A wrong literal, a
drifted fixture, or an extraction bug in EITHER toolchain breaks the
agreement (the r9 SURT-port lesson: index and probe agreeing while
both are wrong is exactly what a self-referential oracle can't catch).

Spec sources: ISO 28500 (WARC framing), RFC 9112 §7.1 (chunked
transfer coding), RFC 9110 §8.4 (content codings), and the documented
extraction baseline (script/style drop, tag strip, entity decode,
whitespace collapse; non-HTML bodies pass through untouched).
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import os
import re
import zlib
from html.parser import HTMLParser

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- WARC walk
def _parse_warc(data: bytes) -> list[tuple[dict, bytes]]:
    """ISO 28500 framing: version line, name:value headers to the blank
    line, Content-Length counted payload, CRLF CRLF separators."""
    out = []
    pos = 0
    while pos < len(data):
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        eol = data.index(b"\r\n", pos)
        assert data[pos:eol].startswith(b"WARC/"), "not a WARC record boundary"
        pos = eol + 2
        hdrs: dict[bytes, bytes] = {}
        while True:
            eol = data.index(b"\r\n", pos)
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            hdrs[k.strip().lower()] = v.strip()
        n = int(hdrs[b"content-length"])
        out.append((hdrs, data[pos : pos + n]))
        pos += n
    return out


# ------------------------------------------------------------- HTTP decode
def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1: size-line (hex, optional ;extensions), chunk,
    CRLF, ...; a 0-size chunk ends the body (trailers dropped)."""
    out = []
    pos = 0
    while True:
        eol = body.index(b"\r\n", pos)
        size = int(body[pos:eol].split(b";")[0], 16)
        pos = eol + 2
        if size == 0:
            return b"".join(out)
        out.append(body[pos : pos + size])
        pos += size + 2


def _decode_response(payload: bytes) -> tuple[bytes, bool | None, str | None]:
    """Strip the HTTP/1.1 envelope; undo Transfer-Encoding then
    Content-Encoding; report (body, is_html, charset) from the
    Content-Type header line."""
    if payload[:5] != b"HTTP/":
        return payload, None, None
    sep = payload.index(b"\r\n\r\n")
    body = payload[sep + 4 :]
    is_html: bool | None = None
    charset: str | None = None
    chunked = False
    coding = b""
    for line in payload[:sep].lower().split(b"\r\n"):
        name, _, value = line.partition(b":")
        name, value = name.strip(), value.strip()
        if name == b"content-type":
            is_html = b"text/html" in value or b"application/xhtml" in value
            m = re.search(rb'charset="?([\w.:-]+)', value)
            if m:
                charset = m.group(1).decode("ascii")
        elif name == b"transfer-encoding":
            chunked = b"chunked" in value
        elif name == b"content-encoding":
            coding = value
    if chunked:
        body = _dechunk(body)
    if coding in (b"gzip", b"x-gzip"):
        body = gzip.decompress(body)
    elif coding == b"deflate":
        body = zlib.decompress(body)
    return body, is_html, charset


# ---------------------------------------------------------- text extraction
class _TextExtractor(HTMLParser):
    """Event-driven extraction (a genuinely different mechanism from
    the package's regex substitution): data outside script/style
    subtrees, entities decoded by the parser, tags acting as
    whitespace separators."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.depth = 0
        self.chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self.depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self.depth:
            self.depth -= 1

    def handle_data(self, data: str) -> None:
        if not self.depth:
            self.chunks.append(data)


def _extract(body: bytes, is_html: bool | None, charset: str | None) -> str:
    text = body.decode(charset or "utf-8", "replace")
    if is_html is None:
        is_html = text.lstrip().startswith("<")
    if not (is_html and "<" in text):
        return text  # non-HTML bodies pass through untouched
    p = _TextExtractor()
    p.feed(text)
    p.close()
    return " ".join(" ".join(p.chunks).split())


# -------------------------------------------------------------- derivation
def derive_wet_rows() -> set[tuple[str, str, int, str]]:
    rows = set()
    for path in sorted(glob.glob(os.path.join(REPO, "fixtures", "*.warc.gz"))):
        data = gzip.decompress(open(path, "rb").read())  # multi-member ok
        for hdrs, payload in _parse_warc(data):
            if hdrs.get(b"warc-type") != b"response":
                continue
            body, is_html, charset = _decode_response(payload)
            wet = _extract(body, is_html, charset).encode("utf-8")
            rows.add(
                (
                    hdrs[b"warc-target-uri"].decode(),
                    hdrs[b"warc-record-id"].decode(),
                    len(wet),
                    hashlib.md5(wet).hexdigest(),
                )
            )
    return rows


def test_wet_export_oracle_rows_independently_derived():
    """The literal VALUES in oracle_sql()['wet_export'] equal this
    module's stdlib-only derivation from the committed fixture bytes —
    and there are exactly six response records across the two shards,
    so the oracle misses none."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    oracle = entry.oracle_sql()["wet_export"]
    got = {
        (r[0], r[1], int(r[2]), r[3])
        for r in duckdb.sql(oracle).fetchall()
    }
    derived = derive_wet_rows()
    assert len(derived) == 6
    assert got == derived


def _member_spans(path: str) -> list[tuple[int, int, bytes]]:
    """Own gzip-member walk (offset, consumed_length, uncompressed) over
    a member-per-record shard — compressed-file offsets, the thing a
    real CDX index records."""
    data = open(path, "rb").read()
    spans = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        body = d.decompress(data[pos:]) + d.flush()
        assert d.eof, "truncated member"
        consumed = len(data) - pos - len(d.unused_data)
        spans.append((pos, consumed, body))
        pos += consumed
    return spans


def test_cdx_roundtrip_offsets_independently_derived():
    """The cdx_roundtrip oracle's (offset, length, target_uri,
    payload_md5) literals — compressed member spans + raw-record
    payload md5s — equal this module's own member walk over the
    committed shards (urlkey excluded here; the SURT convention is
    certified separately against the external CC fixtures). A drifted
    fixture, a wrong span, or a misparsed member breaks the
    agreement."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    oracle = entry.oracle_sql()["cdx_roundtrip"]
    got = {
        (int(r[0]), int(r[1]), r[2], r[3])
        for r in duckdb.sql(
            f'SELECT "offset", "length", target_uri, payload_md5 FROM ({oracle})'
        ).fetchall()
    }
    derived = set()
    for path in sorted(glob.glob(os.path.join(REPO, "fixtures", "*.warc.gz"))):
        for off, ln, member in _member_spans(path):
            recs = _parse_warc(member)
            assert len(recs) == 1  # member-per-record layout
            hdrs, payload = recs[0]
            if hdrs.get(b"warc-type") != b"response":
                continue
            derived.add(
                (
                    off,
                    ln,
                    hdrs[b"warc-target-uri"].decode(),
                    hashlib.md5(payload).hexdigest(),
                )
            )
    assert len(derived) == 6
    assert got == derived


def test_warc_ingest_oracle_rows_independently_derived():
    """The warc_ingest oracle's (url, fetch_date, n_chars, text_fp)
    literals equal this module's derivation: n_chars is the CHARACTER
    count of the extracted text (latin-1 'café' is 4 chars, 5 UTF-8
    bytes), text_fp the md5 of its UTF-8 encoding."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    oracle = entry.oracle_sql()["warc_ingest"]
    got = {
        (r[0], r[1], int(r[2]), r[3]) for r in duckdb.sql(oracle).fetchall()
    }
    derived = set()
    for path in sorted(glob.glob(os.path.join(REPO, "fixtures", "*.warc.gz"))):
        data = gzip.decompress(open(path, "rb").read())
        for hdrs, payload in _parse_warc(data):
            if hdrs.get(b"warc-type") != b"response":
                continue
            body, is_html, charset = _decode_response(payload)
            text = _extract(body, is_html, charset)
            derived.add(
                (
                    hdrs[b"warc-target-uri"].decode(),
                    hdrs[b"warc-date"].decode(),
                    len(text),
                    hashlib.md5(text.encode("utf-8")).hexdigest(),
                )
            )
    assert len(derived) == 6
    assert got == derived


def test_independent_extractor_disagrees_with_nothing_by_luck():
    """Sanity for the second toolchain itself: the known-tricky pieces
    decode to the exact expected strings (chunked framing with
    extensions+trailers, script subtree dropped, entities decoded,
    latin-1 charset honored, plain text NOT collapsed)."""
    assert _dechunk(b"4;x=1\r\nWiki\r\n3\r\nped\r\n0\r\nT: v\r\n\r\n") == b"Wikiped"
    body = b"<html><head><script>var x=1;</script><title>T</title></head>" \
           b"<body><p>A &amp; B</p><p>C</p></body></html>"
    assert _extract(body, True, None) == "T A & B C"
    latin = "caf\xe9".encode("iso-8859-1")
    assert _extract(latin, False, "iso-8859-1") == "café"
    assert _extract(b"two  spaces\n stay", False, None) == "two  spaces\n stay"
