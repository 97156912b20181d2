"""End-to-end pipeline: raw WARC bytes -> record split -> page filter
-> HTML->text extraction (ops/extract.py) -> doc table -> inverted
index build -> BM25 top-k. The full north-rule path from crawl archive
to served query, in one test."""

from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.query import bm25_segments
from tokenkit_spark.ops.extract import with_extracted_text
from tokenkit_spark.sources import warc

WS = AnalyzerConfig(strategy="whitespace", lowercase=True)


def _page(uri: str, title: str, body_words: str) -> dict:
    html = (
        f"<html><head><title>{title}</title>"
        "<script>tracking();</script></head>"
        f"<body><p>{body_words}</p></body></html>"
    ).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html
    )
    return {
        "WARC-Type": "response",
        "WARC-Record-ID": f"<urn:uuid:{uri}>",
        "WARC-Target-URI": uri,
        "WARC-Date": "2024-01-01T00:00:00Z",
        "Content-Type": "application/http; msgtype=response",
        "payload": http,
    }


def test_warc_to_bm25(spark, tmp_path):
    records = [
        _page("https://ex.com/spark", "Spark Engine",
              "distributed query engine shuffles partitions broadcast"),
        _page("https://ex.com/tokens", "Tokenizer",
              "unicode tokenizer segmentation grapheme boundary rules"),
        _page("https://ex.com/mixed", "Mixed",
              "query engine tokenizer rules"),
    ]
    (tmp_path / "crawl.warc").write_bytes(warc.write_warc(records))

    pages = warc.warc_pages(warc.read_warc(spark, str(tmp_path)))
    docs = (
        with_extracted_text(pages, html_col="body", out_col="text")
        .select(F.xxhash64("url").alias("doc_id"), "url", "text")
    )

    # extraction semantics survived the pipeline: title line + body,
    # script dropped
    got = {r.url: r.text for r in docs.collect()}
    assert got["https://ex.com/spark"] == (
        "Spark Engine\n"
        "distributed query engine shuffles partitions broadcast"
    )
    assert "tracking" not in got["https://ex.com/tokens"]

    idx_path = str(tmp_path / "idx")
    build_index(spark, docs.select("doc_id", "text"), idx_path, WS,
                n_shards=2, n_buckets=4, resume=False)
    index = load_index(spark, idx_path)

    qdf = spark.createDataFrame(
        [(0, "shuffles broadcast"), (1, "grapheme boundary")],
        "query_id long, text string",
    )
    rows = bm25_segments(spark, index, qdf, WS, k=1).collect()
    top = {r.query_id: r.doc_id for r in rows if r.rank == 1}
    ids = {r.url: r.doc_id for r in
           docs.select("url", "doc_id").collect()}
    assert top[0] == ids["https://ex.com/spark"]
    assert top[1] == ids["https://ex.com/tokens"]
