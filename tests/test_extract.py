"""HTML -> text extraction (ops/extract.py): pinned-semantics unit
tests + the Spark mapInPandas path.

The north rule's per-row invariant is byte-identical extracted text
per url; these tests pin the extraction function so that invariant is
reproducible (same markup -> same bytes, forever)."""

import pandas as pd
import pytest

from tokenkit_spark.ops.extract import (
    extract_text_bytes,
    extract_text_str,
    extraction_stats,
    sniff_charset,
    with_extracted_text,
)


class TestExtractStr:
    def test_basic_paragraphs(self):
        assert (
            extract_text_str("<html><body><p>one</p><p>two</p></body></html>")
            == "one\ntwo"
        )

    def test_inline_tags_join_without_space(self):
        assert extract_text_str("<p>ab<b>c</b>d</p>") == "abcd"

    def test_block_tags_break_lines(self):
        assert extract_text_str("a<div>b</div>c") == "a\nb\nc"
        assert extract_text_str("line1<br>line2") == "line1\nline2"
        assert extract_text_str("line1<br/>line2") == "line1\nline2"

    def test_script_style_dropped(self):
        html = (
            "<p>keep</p><script>var x = '<p>no</p>';</script>"
            "<style>p { color: red }</style><p>also</p>"
        )
        assert extract_text_str(html) == "keep\nalso"

    def test_comment_dropped(self):
        assert extract_text_str("<p>a<!-- hidden <b>x</b> -->b</p>") == "a b"

    def test_title_prepended_head_dropped(self):
        html = (
            "<html><head><title>My Title</title>"
            "<meta name='x' content='y'></head>"
            "<body><p>body</p></body></html>"
        )
        assert extract_text_str(html) == "My Title\nbody"
        assert extract_text_str(html, keep_title=False) == "body"

    def test_entities_decoded(self):
        assert (
            extract_text_str("<p>a &amp; b &lt;tag&gt; &#233; &#x1F600;</p>")
            == "a & b <tag> é \U0001f600"
        )

    def test_whitespace_collapsed(self):
        assert (
            extract_text_str("<p>  a \t b\r\n   c  </p>\n\n<p> d </p>")
            == "a b c\nd"
        )

    def test_list_and_table(self):
        html = (
            "<ul><li>one</li><li>two</li></ul>"
            "<table><tr><td>A</td><td>B</td></tr></table>"
        )
        assert extract_text_str(html) == "one\ntwo\nA\nB"

    def test_doctype_and_unclosed(self):
        assert extract_text_str("<!DOCTYPE html><p>x") == "x"

    def test_empty_and_markup_only(self):
        assert extract_text_str("") == ""
        assert extract_text_str("<div><span></span></div>") == ""


class TestCharset:
    def test_bom(self):
        assert sniff_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"

    def test_meta_charset(self):
        assert (
            sniff_charset(b"<html><head><meta charset='iso-8859-1'></head>")
            == "iso-8859-1"
        )

    def test_meta_http_equiv(self):
        raw = (
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1252">'
        )
        assert sniff_charset(raw) == "windows-1252"

    def test_unknown_label_falls_back(self):
        assert sniff_charset(b"<meta charset='no-such-enc'>") == "utf-8"
        assert sniff_charset(b"plain") == "utf-8"

    def test_bytes_roundtrip_latin1(self):
        raw = "<meta charset='iso-8859-1'><p>café</p>".encode("iso-8859-1")
        assert extract_text_bytes(raw) == "café"

    def test_bytes_bad_utf8_replaced(self):
        assert extract_text_bytes(b"<p>a\xffb</p>") == "a�b"

    def test_none(self):
        assert extract_text_bytes(None) is None


@pytest.mark.usefixtures("spark")
class TestSparkPath:
    def test_with_extracted_text_binary(self, spark):
        rows = [
            ("u1", "<html><head><title>T1</title></head><body>"
                   "<p>alpha &amp; beta</p></body></html>".encode()),
            ("u2", "<p>one</p><script>drop()</script><p>two</p>".encode()),
            ("u3", None),
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = with_extracted_text(df).orderBy("url").collect()
        assert [r.text for r in out] == [
            "T1\nalpha & beta",
            "one\ntwo",
            None,
        ]
        # schema: input columns preserved + text appended
        assert [f.name for f in with_extracted_text(df).schema.fields] == [
            "url", "html", "text"
        ]

    def test_with_extracted_text_string_and_replace(self, spark):
        df = spark.createDataFrame(
            [("u1", "<p>hi</p>", "stale")], "url string, html string, text string"
        )
        out = with_extracted_text(df).collect()
        assert out[0].text == "hi"

    def test_matches_scalar_path(self, spark):
        """Spark output is byte-identical to the pinned scalar function
        (the north-rule per-row invariant, machine-checked)."""
        docs = [
            f"<html><head><title>Doc {i}</title></head><body>"
            f"<p>para {i} &amp; more</p><div>tail{i}</div></body></html>"
            for i in range(50)
        ]
        df = spark.createDataFrame(
            [(str(i), d.encode()) for i, d in enumerate(docs)],
            "url string, html binary",
        )
        got = {r.url: r.text for r in with_extracted_text(df).collect()}
        for i, d in enumerate(docs):
            assert got[str(i)] == extract_text_bytes(d.encode())

    def test_input_hint_invariant_on_pages_corpus(self, spark):
        """The input_hint per-row invariant — extracted text
        byte-identical to the stored ``text`` per url — holds for the
        GENERIC extractor over the synthetic pages corpus (not just
        the wrapper-strip fast path in sources/pages.py):
        extract(html, keep_title=False) == text for every row."""
        from tokenkit_spark.ops.extract import extract_text_bytes
        from tokenkit_spark.sources.pages import synth_pages

        rows = synth_pages(spark, n_docs=200).select("html", "text").collect()
        assert rows
        for r in rows:
            assert extract_text_bytes(bytes(r.html), keep_title=False) == r.text

    def test_extraction_stats(self, spark):
        df = spark.createDataFrame(
            [("a", "<p>xy</p>", "xy"), ("b", "<div></div>", "")],
            "url string, html string, text string",
        )
        r = extraction_stats(df).collect()[0]
        assert r.n_pages == 2
        assert r.text_chars == 2
        assert r.n_empty_text == 1
