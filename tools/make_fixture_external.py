"""Build fixtures/external/ — EXTERNAL-conformance interchange fixtures.

The r9 SURT-port bug (index and probe agreed while both were wrong)
showed the limit of self-referential fixtures: everything else in
fixtures/ is produced by this repo's own writers, so a matched
reader/writer bug is invisible. These two files are hand-assembled
byte-for-byte from the PUBLISHED formats — the Common Crawl index
server's CDXJ output (documented at commoncrawl.org/get-started and the
pywb CDXJ spec) and the Common Crawl WET layout (ISO 28500 conversion
records with the ia-web-commons header set) — NOT via warc_bytes /
format_cdxj. They carry the field inventory our writers never emit
(mime-detected, languages, encoding, redirect, charset in warcinfo,
WARC-Block-Digest / WARC-Identified-Content-Language headers, a
warcinfo preamble record, string-typed numerics in the JSON block), so
parsing them exercises conformance with the external convention, not a
round-trip with ourselves. Block digests are honest: sha1-base32 of the
actual payload block, the Common Crawl convention.

(The sandbox has no network, so these are transcriptions of the
documented public format, with synthetic page text — the envelope
layout, header set, field names, and value conventions are the
published ones.)

Run from the repo root: python tools/make_fixture_external.py
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os

# ------------------------------------------------------------------- CDXJ
# Lines as the CC index server emits them: <surt urlkey> <timestamp14>
# <json>, numerics as JSON strings, digest base32-sha1 without a prefix,
# filename the crawl-data-relative shard path. Chosen to pin the
# canonicalization cases surt_key must agree with the external index on:
# trailing-slash root, www-strip + query sort, a redirect capture, a
# revisit (mime warc/revisit, duplicate digest), and a non-default port.
CDXJ_LINES = [
    'org,example)/ 20240722071249 {"url": "https://example.org/", '
    '"mime": "text/html", "mime-detected": "text/html", "status": "200", '
    '"digest": "MUIDVJIXS6XPVHUWNXTIXTH3ABWDL7A3", "length": "1219", '
    '"offset": "904", "filename": "crawl-data/CC-MAIN-2024-30/segments/'
    '1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00000.warc.gz", '
    '"languages": "eng", "encoding": "UTF-8"}',
    'com,example)/path?a=1&b=2 20240722080000 {"url": '
    '"http://www.example.com/path?b=2&a=1", "mime": "text/html", '
    '"mime-detected": "text/html", "status": "200", '
    '"digest": "5X2YBVRXJXSGVRCURKIQBYAES3MLZVFP", "length": "2035", '
    '"offset": "14870", "filename": "crawl-data/CC-MAIN-2024-30/segments/'
    '1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00001.warc.gz", '
    '"languages": "eng,fra", "encoding": "UTF-8"}',
    'com,example)/old 20240722081500 {"url": "http://example.com/old", '
    '"mime": "text/html", "mime-detected": "text/html", "status": "301", '
    '"digest": "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ", "length": "541", '
    '"offset": "31002", "redirect": "https://example.com/new", '
    '"filename": "crawl-data/CC-MAIN-2024-30/segments/'
    '1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00001.warc.gz"}',
    'com,example)/path?a=1&b=2 20240725093011 {"url": '
    '"http://www.example.com/path?b=2&a=1", "mime": "warc/revisit", '
    '"status": "200", "digest": "5X2YBVRXJXSGVRCURKIQBYAES3MLZVFP", '
    '"length": "312", "offset": "52114", "filename": "crawl-data/'
    'CC-MAIN-2024-30/segments/1720763514450.42/warc/'
    'CC-MAIN-20240725093011-20240725123011-00007.warc.gz"}',
    'com,example:8080)/api 20240722090210 {"url": '
    '"http://example.com:8080/api", "mime": "application/json", '
    '"mime-detected": "application/json", "status": "404", '
    '"digest": "X2NBUQPZ4GF6YOHLJ4MZ26FMJ4KCBRB7", "length": "388", '
    '"offset": "60990", "filename": "crawl-data/CC-MAIN-2024-30/segments/'
    '1720763514450.42/warc/CC-MAIN-20240722071249-20240722101249-00002.warc.gz"}',
]


# ------------------------------------------------------------- robots.txt
# Hand-assembled per the PUBLISHED conventions (RFC 9309 + Google's
# robots.txt parser documentation + the Yandex extension docs), r12
# VERDICT task 6 — the oddities real servers emit that a round-trip
# with our own writer would never produce: a leading UTF-8 BOM
# (Google: ignore it; glued onto the first User-agent key it kills the
# whole first group), CRLF line endings, mixed/UPPER-case directive
# names, an inline # comment after a value, a non-standard Host:
# directive (parsers must skip unknown keys, RFC 9309 §2.2.4), decimal
# Crawl-delay, * wildcards and $ anchors in paths, and document-wide
# Sitemap lines split across groups (the spec makes them
# group-independent).
ROBOTS_TXT = b"\xef\xbb\xbf" + (
    "# robots.txt for https://www.example.org/\r\n"
    "# assembled from the published RFC 9309 / Google conventions\r\n"
    "\r\n"
    "User-Agent: GoodBot\r\n"
    "Disallow: /tmp/ # staging area\r\n"
    "Crawl-Delay: 10\r\n"
    "\r\n"
    "user-agent: trainbot\r\n"
    "disallow: /private/*\r\n"
    "Disallow: /*.gif$\r\n"
    "Allow: /private/public-ok\r\n"
    "crawl-DELAY: 4.5\r\n"
    "Host: www.example.org\r\n"
    "\r\n"
    "SITEMAP: https://www.example.org/sitemap_index.xml\r\n"
    "\r\n"
    "User-agent: *\r\n"
    "Disallow: /cgi-bin/\r\n"
    "Crawl-delay: 30\r\n"
    "\r\n"
    "Sitemap: https://cdn.example.org/sitemap-images.xml\r\n"
).encode("utf-8")


# ---------------------------------------------------------------- sitemaps
# The sitemaps.org protocol page's own canonical examples, kept
# byte-faithful to the published convention: XML declaration, the
# protocol namespace (plus a secondary xhtml namespace and an
# xhtml:link child INSIDE a <url> block — extra elements must not
# break field extraction), indentation/newlines inside blocks,
# entity-escaped & in a loc, W3C full datetimes with timezone
# offsets, and a .xml.gz child pointer in the index.
SITEMAP_INDEX_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "   <sitemap>\n"
    "      <loc>https://www.example.org/sitemap-posts-2024-07.xml.gz</loc>\n"
    "      <lastmod>2024-07-22T18:23:17+00:00</lastmod>\n"
    "   </sitemap>\n"
    "   <sitemap>\n"
    "      <loc>https://www.example.org/sitemap-pages.xml</loc>\n"
    "      <lastmod>2024-07-01</lastmod>\n"
    "   </sitemap>\n"
    "</sitemapindex>\n"
)

SITEMAP_URLSET_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"\n'
    '        xmlns:xhtml="http://www.w3.org/1999/xhtml">\n'
    "   <url>\n"
    "      <loc>https://www.example.org/catalog?item=12&amp;desc=vacation_hawaii</loc>\n"
    "      <lastmod>2024-05-07T16:20:11+03:00</lastmod>\n"
    "      <changefreq>monthly</changefreq>\n"
    "      <priority>0.8</priority>\n"
    "   </url>\n"
    "   <url>\n"
    "      <loc>https://www.example.org/</loc>\n"
    '      <xhtml:link rel="alternate" hreflang="de" '
    'href="https://www.example.org/de/"/>\n'
    "      <priority>1.0</priority>\n"
    "   </url>\n"
    "</urlset>\n"
)


# -------------------------------------------------------------------- WET
def _sha1_b32(block: bytes) -> str:
    return base64.b32encode(hashlib.sha1(block).digest()).decode("ascii")


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
    )
    return (
        head
        + f"Content-Length: {len(block)}\r\n\r\n".encode("ascii")
        + block
        + b"\r\n\r\n"
    )


def build_wet() -> bytes:
    """A CC-layout *.warc.wet.gz shard: warcinfo preamble + conversion
    records, one gzip member per record (mtime 0 — reproducible)."""
    info_block = (
        b"Software-Info: ia-web-commons.1.1.9\r\n"
        b"Extracted-Date: Mon, 22 Jul 2024 12:00:00 GMT\r\n"
        b"robots: checked via crawler-commons 1.5\r\n"
        b"isPartOf: CC-MAIN-2024-30\r\n"
        b"operator: Common Crawl Admin (info@commoncrawl.org)\r\n"
        b"description: Wide crawl of the web for July 2024\r\n"
        b"publisher: Common Crawl\r\n"
    )
    text1 = (
        "Example Domain\nThis domain is for use in illustrative examples "
        "in documents.\nMore information...\n"
    ).encode("utf-8")
    text2 = (
        "Chemin d'exemple\nDeux paragraphes de texte extrait, "
        "séparés par des sauts de ligne.\n"
    ).encode("utf-8")
    members = [
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2024-07-22T12:00:00Z"),
                (
                    "WARC-Filename",
                    "CC-MAIN-20240722071249-20240722101249-00000.warc.wet.gz",
                ),
                ("WARC-Record-ID", "<urn:uuid:aa000000-0000-4000-8000-000000000001>"),
                ("Content-Type", "application/warc-fields"),
            ],
            info_block,
        ),
        _record(
            [
                ("WARC-Type", "conversion"),
                ("WARC-Target-URI", "https://example.org/"),
                ("WARC-Date", "2024-07-22T07:12:49Z"),
                ("WARC-Record-ID", "<urn:uuid:aa000000-0000-4000-8000-000000000002>"),
                ("WARC-Refers-To", "<urn:uuid:bb000000-0000-4000-8000-000000000002>"),
                ("WARC-Block-Digest", f"sha1:{_sha1_b32(text1)}"),
                ("WARC-Identified-Content-Language", "eng"),
                ("Content-Type", "text/plain"),
            ],
            text1,
        ),
        _record(
            [
                ("WARC-Type", "conversion"),
                ("WARC-Target-URI", "http://www.example.com/path?b=2&a=1"),
                ("WARC-Date", "2024-07-22T08:00:00Z"),
                ("WARC-Record-ID", "<urn:uuid:aa000000-0000-4000-8000-000000000003>"),
                ("WARC-Refers-To", "<urn:uuid:bb000000-0000-4000-8000-000000000003>"),
                ("WARC-Block-Digest", f"sha1:{_sha1_b32(text2)}"),
                ("WARC-Identified-Content-Language", "fra"),
                ("Content-Type", "text/plain"),
            ],
            text2,
        ),
    ]
    return b"".join(gzip.compress(m, mtime=0) for m in members)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "fixtures", "external")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cc_index.cdxj"), "w", encoding="ascii") as f:
        f.write("\n".join(CDXJ_LINES) + "\n")
    wet = build_wet()
    with open(os.path.join(out_dir, "cc_sample.warc.wet.gz"), "wb") as f:
        f.write(wet)
    with open(os.path.join(out_dir, "robots.txt"), "wb") as f:
        f.write(ROBOTS_TXT)
    with open(os.path.join(out_dir, "sitemap_index.xml"), "w", encoding="utf-8") as f:
        f.write(SITEMAP_INDEX_XML)
    with open(os.path.join(out_dir, "sitemap_urlset.xml"), "w", encoding="utf-8") as f:
        f.write(SITEMAP_URLSET_XML)
    print(
        f"wrote {out_dir}: {len(CDXJ_LINES)} cdxj lines, {len(wet)} wet bytes, "
        f"{len(ROBOTS_TXT)} robots bytes, 2 sitemap files"
    )
