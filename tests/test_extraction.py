"""Main-content HTML extraction (pipeline/extraction.py): block
classification, zero-shuffle plan shape, the WARC connector's
``extract="main"`` tier, and the end-to-end crawl → extract → quality
chain (VERDICT r6 task 3)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hgraphstorage_spark.pipeline.extraction import (
    LABEL_CONTENT,
    LABEL_HIGH_LINK,
    LABEL_LOW_STOPWORD,
    LABEL_SHORT,
    extract_main_content,
    html_block_frame,
)

PAGE = (
    '<html><head><title>T</title><style>.x{c:1}</style><script>var q=2;</script>'
    "<!-- hidden comment text --></head>"
    '<body><nav><a href="/">Home</a> <a href="/a">About Us</a> '
    '<a href="/c">Contact</a></nav>'
    "<h1>The Article</h1>"
    "<p>This is the main body of the article and it talks at length about the "
    "things that we care about, with plenty of common function words in it so "
    "the density is high.</p>"
    "<p>A second paragraph follows here with more of the usual words that a "
    "real document would have in it.</p>"
    '<aside><a href="/buy">Buy now</a> cheap deals</aside>'
    "<footer>Copyright 2024 Example Corp - All rights reserved.</footer>"
    "</body></html>"
)


class TestBlockClassification:
    def test_labels_and_content(self, spark):
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        out = extract_main_content(df).collect()[0]
        assert out["n_content_blocks"] == 2
        assert out["content"].startswith("This is the main body")
        assert "second paragraph" in out["content"]
        # the chrome must be GONE from the content
        for junk in ("Home", "Contact", "Buy now", "Copyright", "var q", "hidden"):
            assert junk not in out["content"]
        labels = {
            r["text"][:9]: r["label"]
            for r in html_block_frame(df).collect()
        }
        assert labels["Home Abou"] == LABEL_HIGH_LINK  # nav menu
        assert labels["The Artic"] == LABEL_SHORT  # isolated heading
        assert labels["This is t"] == LABEL_CONTENT
        assert labels["Buy now c"] == LABEL_HIGH_LINK  # promo aside
        assert labels["Copyright"] == LABEL_LOW_STOPWORD  # footer

    def test_script_style_comment_subtrees_vanish(self, spark):
        html = (
            "<body><script>the the the the the the the the the</script>"
            "<p>Real prose with the usual function words goes on and on in "
            "this paragraph so that it is kept by the classifier.</p></body>"
        )
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        out = extract_main_content(df).collect()[0]
        assert "Real prose" in out["content"] and "the the" not in out["content"]

    def test_entity_decode_order(self, spark):
        # '&amp;lt;' is an ESCAPED '<' — must decode to '&lt;' exactly once
        html = (
            "<p>The author wrote &amp;lt; and &quot;quoted&quot; words here "
            "so that the sentence is long enough to be kept as content.</p>"
        )
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        out = extract_main_content(df).collect()[0]
        assert "&lt;" in out["content"] and '"quoted"' in out["content"]

    def test_empty_and_null_html(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, html string"
        )
        rows = {r["doc_id"]: r for r in extract_main_content(df).collect()}
        assert rows[1]["content"] == "" and rows[1]["n_content_blocks"] == 0
        assert rows[2]["content"] is None

    def test_context_pass_promotes_between_good_only(self, spark):
        """jusText second pass: a short heading between two good
        paragraphs is promoted; a heading whose nearest decisive
        neighbor is chrome (nav before / footer-edge after) stays out;
        chrome itself is never promoted."""
        page = (
            '<body><nav><a href="/">Home</a> <a href="/a">About Us</a> '
            '<a href="/c">Contact</a></nav>'
            "<h2>Section Heading</h2>"
            "<p>This is the first paragraph of the article and it is made of "
            "the sort of ordinary words that any real piece of writing would "
            "contain in abundance.</p>"
            "<h2>Another Heading</h2>"
            "<p>The second paragraph is also long and full of the most common "
            "words of the language so that the classifier will keep it without "
            "any doubt.</p>"
            "<h2>Trailing Heading</h2>"
            "<footer>Copyright 2024 Example Corp - All rights reserved.</footer>"
            "</body>"
        )
        df = spark.createDataFrame([(1, page)], "doc_id long, html string")
        base = extract_main_content(df).collect()[0]
        ctx = extract_main_content(df, context=True).collect()[0]
        assert "Another Heading" in ctx["content"]
        assert "Another Heading" not in base["content"]
        assert "Section Heading" not in ctx["content"]  # nav is the decisive prev
        assert "Trailing Heading" not in ctx["content"]  # footer/edge after
        assert "Home" not in ctx["content"] and "Copyright" not in ctx["content"]

    @pytest.mark.slow
    def test_context_is_superset_of_context_free(self, spark):
        """Promotion only ever ADDS blocks: context-free kept lines are a
        subset of the context pass's, on every fixture page."""
        for html in (PAGE, "", "<p>short</p>", "<body><p>The words here are of "
                     "the most ordinary kind and there are enough of them for "
                     "the block to be kept by the classifier.</p></body>"):
            df = spark.createDataFrame([(1, html)], "doc_id long, html string")
            base = extract_main_content(df).collect()[0]["content"]
            ctx = extract_main_content(df, context=True).collect()[0]["content"]
            base_lines = set(base.split("\n")) - {""}
            ctx_lines = set(ctx.split("\n")) - {""}
            assert base_lines <= ctx_lines

    def test_context_zero_shuffle_plan(self, spark):
        """The context pass adds two array folds, not a shuffle: still no
        Exchange / Generate / Python UDF."""
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        plan = (
            extract_main_content(df, context=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_zero_shuffle_plan(self, spark):
        """The whole extraction is one narrow projection: no Exchange, no
        Generate (explode), no Python UDF in the plan."""
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        plan = extract_main_content(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPiiScrub:
    def test_kinds_counts_and_redaction(self, spark):
        from hgraphstorage_spark.pipeline.pii import pii_scrub

        rows = [
            (1, "Contact alice.smith+x@example.co.uk or call (555) 123-4567 today"),
            (2, "server at 192.168.0.1 and card 4111111111111111 plus ssn 123-45-6789"),
            # a dotted version string over-redacts as IP (documented safe
            # direction); a datetime must NOT phone-match
            (3, "released on 2024-01-15 12:30:45, version 1.2.3.4 is out"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert got[1]["text_clean"] == "Contact <EMAIL> or call <PHONE> today"
        assert (got[1]["n_email"], got[1]["n_phone"]) == (1, 1)
        assert got[2]["text_clean"] == "server at <IP> and card <CC> plus ssn <SSN>"
        assert (got[2]["n_ip"], got[2]["n_cc"], got[2]["n_ssn"]) == (1, 1, 1)
        assert got[3]["n_phone"] == 0 and got[3]["n_ip"] == 1
        assert got[4]["text_clean"] is None and got[4]["n_email"] is None

    def test_tier2_checksum_gates_ipv6_e164(self, spark):
        """VERDICT r7 task 4: (a) the card rule is Luhn-gated — a
        16-digit invoice number that fails the checksum must NOT
        redact; (b) IBANs gate on ISO 13616 mod-97; (c) IPv6 matches
        compressed and full forms but never clock times (MACs match —
        deliberate: a MAC is PII); (d) E.164 '+'-forms redact before
        the US rule can eat their tails, and counts stay the documented
        counts-on-ORIGINAL-text semantics."""
        from hgraphstorage_spark.pipeline.pii import pii_scrub

        rows = [
            (1, "valid card 4111111111111111 invoice 4111111111111112 done"),
            (2, "iban DE89370400440532013000 bogus DE89370400440532013001 ok"),
            (3, "node fe80::1 full 2001:0db8:85a3:0000:0000:8a2e:0370:7334 "
                "time 12:30:45 mac 00:1A:2B:3C:4D:5E"),
            (4, "call +49 170 1234567 or +14155552671 but price +49 only"),
            (5, "ipv6 1:2:3:4::5 and ::1 and x:: no"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert got[1]["text_clean"] == "valid card <CC> invoice 4111111111111112 done"
        assert got[1]["n_cc"] == 1
        assert got[2]["text_clean"] == "iban <IBAN> bogus DE89370400440532013001 ok"
        assert got[2]["n_iban"] == 1
        assert got[3]["text_clean"] == (
            "node <IPV6> full <IPV6> time 12:30:45 mac <IPV6>"
        )
        assert got[3]["n_ipv6"] == 3
        assert got[4]["text_clean"] == "call <PHONE> or <PHONE> but price +49 only"
        # counts are on the ORIGINAL text per kind: the US rule also
        # sees the space-separated 3-3-4 window inside '+49 170 1234567'
        # (the unseparated '+14155552671' run gives it no anchor)
        assert got[4]["n_phone_intl"] == 2 and got[4]["n_phone"] == 1
        assert got[5]["text_clean"] == "ipv6 <IPV6> and <IPV6> and x:: no"
        assert got[5]["n_ipv6"] == 2

    def test_gated_kinds_duckdb_oracle_parity(self, spark):
        """The exported DuckDB gate/count/clean fragments must replay the
        Spark gated pass bit-for-bit on live candidates (valid + invalid
        mixes, adjacency, NULL)."""
        import duckdb

        from hgraphstorage_spark.pipeline.pii import (
            duckdb_gated_clean_sql,
            duckdb_gated_count_sql,
            pii_scrub,
        )

        rows = [
            (1, "cards 4111111111111111 5500005555555559 4111111111111112 x"),
            (2, "GB82WEST12345698765432 then DE89370400440532013001."),
            (3, "nothing here"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = (
            pii_scrub(df, kinds=["iban", "cc"])
            .orderBy("doc_id")
            .collect()
        )
        con = duckdb.connect()
        clean = duckdb_gated_clean_sql(
            "cc", duckdb_gated_clean_sql("iban", "t", "t"), "t"
        )
        q = (
            f"SELECT {clean} AS text_clean, "
            f"{duckdb_gated_count_sql('iban', 't')} AS n_iban, "
            f"{duckdb_gated_count_sql('cc', 't')} AS n_cc "
            f"FROM (VALUES (1, 'cards 4111111111111111 5500005555555559 4111111111111112 x'), "
            f"(2, 'GB82WEST12345698765432 then DE89370400440532013001.'), "
            f"(3, 'nothing here'), (4, NULL)) s(doc_id, t) ORDER BY doc_id"
        )
        want = con.execute(q).fetchall()
        for srow, (w_clean, w_iban, w_cc) in zip(got, want):
            assert srow["text_clean"] == w_clean
            assert srow["n_iban"] == w_iban and srow["n_cc"] == w_cc

    def test_kind_subset_and_unknown_kind(self, spark):
        import pytest

        from hgraphstorage_spark.pipeline.pii import pii_scrub

        df = spark.createDataFrame(
            [(1, "mail a@b.com ip 1.2.3.4")], "doc_id long, text string"
        )
        out = pii_scrub(df, kinds=["email"]).collect()[0]
        assert out["text_clean"] == "mail <EMAIL> ip 1.2.3.4"
        assert "n_ip" not in out.asDict()
        with pytest.raises(ValueError, match="unknown PII kinds"):
            pii_scrub(df, kinds=["email", "passport"])

    def test_zero_shuffle_plan(self, spark):
        from hgraphstorage_spark.pipeline.pii import pii_scrub

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestStreamingComposability:
    def test_pii_and_extraction_are_stream_native(self, spark):
        """Both new projections are pure narrow expressions, so they run
        UNCHANGED on a structured stream and match batch exactly — the
        quality_filter_narrow contract extended to the r7 ops."""
        import shutil
        import tempfile
        import uuid

        from hgraphstorage_spark.pipeline.extraction import main_content_expr
        from hgraphstorage_spark.pipeline.pii import pii_scrub

        rows = [
            (1, "<body><p>Write to alice@example.com with all of the usual "
                "words that make this block read like content.</p>"
                "<footer>Copyright 2024</footer></body>"),
            (2, "<body><p>Another page where the text is made of the most "
                "common words and an ip 10.1.2.3 appears.</p></body>"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, html string")
        tmp = tempfile.mkdtemp(prefix="hgs_streamcomp_")
        qname = f"sc_{uuid.uuid4().hex[:8]}"
        try:
            docs.repartition(2).write.mode("overwrite").parquet(f"{tmp}/src")
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/src")
            )
            proj = pii_scrub(
                stream.select(
                    "doc_id", main_content_expr(F.col("html")).alias("text")
                )
            )
            q = (
                proj.writeStream.format("memory").queryName(qname)
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            got = {
                r["doc_id"]: r for r in spark.sql(f"SELECT * FROM {qname}").collect()
            }
            batch = {
                r["doc_id"]: r
                for r in pii_scrub(
                    docs.select(
                        "doc_id", main_content_expr(F.col("html")).alias("text")
                    )
                ).collect()
            }
            assert len(got) == 2
            for i in (1, 2):
                assert got[i]["text_clean"] == batch[i]["text_clean"]
            assert "<EMAIL>" in got[1]["text_clean"]
            assert "Copyright" not in got[1]["text_clean"]
            assert "<IP>" in got[2]["text_clean"]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestLanguageRouting:
    def test_lang_routed_stopwords_keep_non_english_prose(self, spark):
        """German/French prose scores near-zero on the English list (all
        four docs dropped) but is kept when the stopword array routes by
        the language hint — accented stopwords included ('été'-class
        tokens survive the \\p{L} edge-strip)."""
        from hgraphstorage_spark.pipeline.extraction import (
            extract_main_content,
            stopwords_for_lang,
        )

        de = (
            "<body><nav><a href='/'>Start</a> <a href='/k'>Kontakt</a> "
            "<a href='/i'>Impressum</a></nav>"
            "<p>Dieser Absatz ist ein ganz gewöhnlicher deutscher Text und er "
            "enthält sehr viele von den kleinen Wörtern die in der Sprache "
            "immer wieder vorkommen und die man nicht vermeiden kann.</p>"
            "<footer>Copyright 2024 Beispiel GmbH</footer></body>"
        )
        fr = (
            "<body><p>Ce paragraphe est un texte français tout à fait "
            "ordinaire et il contient beaucoup de ces petits mots que la "
            "langue utilise sans cesse et que déjà été l'on ne peut pas "
            "éviter.</p></body>"
        )
        df = spark.createDataFrame(
            [(1, "de", de), (2, "fr", fr)], "doc_id long, lang string, html string"
        )
        routed = {
            r["doc_id"]: r
            for r in extract_main_content(
                df, stopwords=stopwords_for_lang(F.col("lang"))
            ).collect()
        }
        english = {
            r["doc_id"]: r for r in extract_main_content(df).collect()
        }
        assert routed[1]["n_content_blocks"] == 1
        assert "deutscher Text" in routed[1]["content"]
        assert "Kontakt" not in routed[1]["content"]
        assert routed[2]["n_content_blocks"] == 1
        assert english[1]["n_content_blocks"] == 0
        assert english[2]["n_content_blocks"] == 0


class TestStructuredExtract:
    HTML = (
        '<html><head><title>T</title><script>var z=1;</script></head><body>'
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<h1>Guide to the hash join</h1>"
        "<p>the hash join is a batch operation that the scan feeds with a"
        " row at a time from the column filter</p>"
        "<h2>Notes on the row scan</h2>"
        "<ul><li>the batch scan uses a hash row filter and a column filter"
        " on it</li>"
        '<li><a href="/x">nav item</a></li></ul>'
        "<footer>Copyright 2024</footer></body></html>"
    )

    def test_markdown_rendering_and_keep_rules(self, spark):
        """VERDICT r7 task 5: h1/h2 surface as '#'/'##' lines (kept on
        the link-density rule alone — headings are short by nature), a
        prose li renders as '- ', body prose stays bare, and the
        nav/link-item/footer/title chrome drops."""
        from hgraphstorage_spark.pipeline.extraction import extract_structured

        df = spark.createDataFrame([(1, self.HTML)], "doc_id long, html string")
        r = extract_structured(df).collect()[0]
        lines = r["content_md"].split("\n")
        assert lines[0] == "# Guide to the hash join"
        assert lines[1].startswith("the hash join is a batch operation")
        assert lines[2] == "## Notes on the row scan"
        assert lines[3] == "- the batch scan uses a hash row filter and a column filter on it"
        assert len(lines) == 4
        assert r["n_headings"] == 2 and r["n_kept_blocks"] == 4
        assert "Home" not in r["content_md"] and "Copyright" not in r["content_md"]
        assert "nav item" not in r["content_md"]

    def test_link_dense_heading_drops_and_deep_levels(self, spark):
        from hgraphstorage_spark.pipeline.extraction import extract_structured

        df = spark.createDataFrame(
            [
                (1, '<h3><a href="/s">Sponsored section</a></h3>'
                    "<h6>The deepest heading level of all of these</h6>"),
            ],
            "doc_id long, html string",
        )
        r = extract_structured(df).collect()[0]
        assert r["content_md"] == "###### The deepest heading level of all of these"
        assert r["n_headings"] == 1

    def test_marker_chars_in_input_are_inert_and_zero_shuffle(self, spark):
        from hgraphstorage_spark.pipeline.extraction import extract_structured

        df = spark.createDataFrame(
            [(1, "<p>evil \x01h1\x02 forged header stays in the text of"
                 " the block and this block has all of the usual words</p>")],
            "doc_id long, html string",
        )
        out = extract_structured(df)
        r = out.collect()[0]
        assert r["n_headings"] == 0 and r["n_kept_blocks"] == 1
        assert "forged header" in r["content_md"]
        assert not r["content_md"].startswith("#")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan
        assert "EvalPython" not in plan

    def test_segmentation_matches_tier1(self, spark):
        """The marker split must segment exactly like BLOCK_RE: block
        texts and labels agree with block_structs on the same page."""
        from hgraphstorage_spark.pipeline.extraction import (
            block_structs,
            structured_blocks,
        )

        df = spark.createDataFrame([(1, self.HTML)], "doc_id long, html string")
        t1 = df.select(block_structs(F.col("html")).alias("b")).collect()[0]["b"]
        t3 = df.select(structured_blocks(F.col("html")).alias("b")).collect()[0]["b"]
        assert [(x["text"], x["label"]) for x in t1] == [
            (x["text"], x["label"]) for x in t3
        ]


class TestPageMeta:
    def test_fields_orders_entities_resolution(self, spark):
        from hgraphstorage_spark.sources.warc import extract_page_meta

        rows = [
            (1, "https://ex.com/a/b/page.html",
             "<html><head><TITLE> Hello &amp; Welcome </TITLE>"
             '<meta name="description" content="A fine &quot;page&quot;">'
             '<link rel="canonical" href="/a/b/page.html"></head><body></body></html>'),
            # reversed attribute orders, mixed case, dir-relative canonical
            (2, "https://ex.com/x",
             '<head><meta content="desc first" name="Description">'
             '<link href="other.html" rel="canonical">'
             '<meta name="robots" content="NOINDEX, nofollow"><title>T2</title></head>'),
            (3, "https://ex.com/y", "<p>no meta at all</p>"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string, html string")
        got = {r["doc_id"]: r for r in extract_page_meta(df).collect()}
        assert got[1]["title"] == "Hello & Welcome"
        assert got[1]["meta_description"] == 'A fine "page"'
        assert got[1]["canonical_url"] == "https://ex.com/a/b/page.html"
        assert not got[1]["robots_noindex"] and not got[1]["robots_nofollow"]
        assert got[2]["meta_description"] == "desc first"
        assert got[2]["canonical_url"] == "https://ex.com/other.html"
        assert got[2]["robots_noindex"] and got[2]["robots_nofollow"]
        # absent fields are NULL; absent robots meta means indexable
        assert got[3]["title"] is None and got[3]["meta_description"] is None
        assert got[3]["canonical_url"] is None
        assert not got[3]["robots_noindex"] and not got[3]["robots_nofollow"]

    def test_content_first_robots_meta_and_cross_order_first_wins(self, spark):
        """r7 review catches (execution-confirmed): a content-first
        robots meta must gate (it silently read as indexable), and when
        duplicate description/canonical tags use DIFFERENT attribute
        orders, the first tag in DOCUMENT order wins — not whichever
        order's pattern happened to be coalesced first."""
        from hgraphstorage_spark.sources.warc import extract_page_meta

        df = spark.createDataFrame(
            [
                (1, "https://ex.com/",
                 '<meta content="noindex, nofollow" name="robots">'),
                (2, "https://ex.com/",
                 '<meta content="first desc" name="description">'
                 '<meta name="description" content="second desc">'),
                (3, "https://ex.com/",
                 '<link href="https://one.com/" rel="canonical">'
                 '<link rel="canonical" href="https://two.com/">'),
            ],
            "doc_id long, url string, html string",
        )
        got = {r["doc_id"]: r for r in extract_page_meta(df).collect()}
        assert got[1]["robots_noindex"] and got[1]["robots_nofollow"]
        assert got[2]["meta_description"] == "first desc"
        assert got[3]["canonical_url"] == "https://one.com/"

    def test_quote_styles_apostrophes_and_robots_none(self, spark):
        """ADVICE r7: (a) a double-quoted value containing an apostrophe
        must NOT truncate at it (the combined [^"'] class yielded 'Bob'
        for content="Bob's blog"); (b) single-quoted attributes parse,
        including values containing double quotes; (c) the de-facto
        robots token 'none' means noindex AND nofollow, matched as a
        standalone token so 'nonexistent' cannot fire."""
        from hgraphstorage_spark.sources.warc import extract_page_meta

        df = spark.createDataFrame(
            [
                (1, "https://ex.com/",
                 '<meta name="description" content="Bob\'s blog">'),
                (2, "https://ex.com/",
                 "<meta name='description' content='she said \"hi\"'>"
                 "<link rel='canonical' href='https://sq.example.com/'>"),
                (3, "https://ex.com/", '<meta name="robots" content="none">'),
                (4, "https://ex.com/", '<meta name="robots" content="NONE">'),
                (5, "https://ex.com/",
                 '<meta name="robots" content="nonexistent-token">'),
                (6, "https://ex.com/",
                 "<meta content='O'Reilly wins' name='description'>"),
            ],
            "doc_id long, url string, html string",
        )
        got = {r["doc_id"]: r for r in extract_page_meta(df).collect()}
        assert got[1]["meta_description"] == "Bob's blog"
        assert got[2]["meta_description"] == 'she said "hi"'
        assert got[2]["canonical_url"] == "https://sq.example.com/"
        assert got[3]["robots_noindex"] and got[3]["robots_nofollow"]
        assert got[4]["robots_noindex"] and got[4]["robots_nofollow"]
        assert not got[5]["robots_noindex"] and not got[5]["robots_nofollow"]
        # an apostrophe inside a single-quoted value is malformed HTML —
        # the single-quote body stops at it (browser behavior)
        assert got[6]["meta_description"] == "O"

    def test_first_occurrence_wins_and_zero_shuffle(self, spark):
        from hgraphstorage_spark.sources.warc import extract_page_meta

        df = spark.createDataFrame(
            [(1, "https://ex.com/",
              "<title>First</title><title>Second</title>"
              '<link rel="canonical" href="https://one.com/"><link rel="canonical" href="https://two.com/">')],
            "doc_id long, url string, html string",
        )
        out = extract_page_meta(df)
        r = out.collect()[0]
        assert r["title"] == "First" and r["canonical_url"] == "https://one.com/"
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan


class TestWarcMainExtract:
    def _crawl_docs(self, spark, extract):
        from hgraphstorage_spark.sources.warc import read_warc, warc_bytes, warc_to_documents

        body = (
            "<html><head><title>Page</title></head><body>"
            '<nav><a href="/">Home</a> <a href="/x">Archive</a> <a href="/y">Tags</a></nav>'
            "<p>The quick brown fox jumps over the lazy dog while the reader "
            "is given a long and ordinary sentence full of the most common "
            "words in the language.</p>"
            "<footer>Copyright 2024 FixtureCorp - All rights reserved.</footer>"
            "</body></html>"
        ).encode()
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:e2e-1>",
                    "WARC-Target-URI": "http://e2e.example.com/art",
                    "WARC-Date": "2024-04-01T00:00:00Z",
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": payload,
            },
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:e2e-2>",
                    "WARC-Target-URI": "http://e2e.example.com/plain.txt",
                    "WARC-Date": "2024-04-01T01:00:00Z",
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                b"for i < n the plain body must survive untouched",
            },
        ]
        d = tempfile.mkdtemp()
        try:
            with open(f"{d}/shard.warc.gz", "wb") as f:
                f.write(warc_bytes(recs, compress=True))
            return {
                r["url"]: r
                for r in warc_to_documents(read_warc(spark, d), extract=extract).collect()
            }
        finally:
            shutil.rmtree(d)

    def test_main_tier_drops_chrome_baseline_keeps_it(self, spark):
        main = self._crawl_docs(spark, "main")
        base = self._crawl_docs(spark, "baseline")
        art_m = main["http://e2e.example.com/art"]["text"]
        art_b = base["http://e2e.example.com/art"]["text"]
        assert "quick brown fox" in art_m and "quick brown fox" in art_b
        # the whole point of the tier: chrome survives baseline, not main
        assert "Copyright" in art_b and "Home" in art_b
        assert "Copyright" not in art_m and "Home" not in art_m
        # non-HTML bodies pass through BOTH tiers untouched
        plain = "for i < n the plain body must survive untouched"
        assert main["http://e2e.example.com/plain.txt"]["text"] == plain
        assert base["http://e2e.example.com/plain.txt"]["text"] == plain

    def test_extract_then_quality_end_to_end(self, spark):
        """WARC → main-content extract → quality signals: the extracted
        article must score BETTER (higher stopword ratio — the Gopher
        gate's prose signal) than the baseline extraction of the same
        page, because the chrome is exactly the low-stopword part."""
        from hgraphstorage_spark.pipeline.text import stopword_stats

        main = self._crawl_docs(spark, "main")
        base = self._crawl_docs(spark, "baseline")
        rows = [
            (1, main["http://e2e.example.com/art"]["text"]),
            (2, base["http://e2e.example.com/art"]["text"]),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        q = {r["doc_id"]: r for r in stopword_stats(df).collect()}
        assert float(q[1]["stopword_frac"]) > float(q[2]["stopword_frac"])

    def test_bad_extract_mode_raises(self, spark):
        from hgraphstorage_spark.sources.warc import warc_to_documents

        with pytest.raises(ValueError, match="extract"):
            warc_to_documents(spark.range(1), extract="nope")
