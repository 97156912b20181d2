"""Common-Crawl-style ``pages`` source (BASELINE.json input_hint).

Schema (exact): url:string, warc_ts:timestamp, html:binary, text:string,
lang:string — an Iceberg table in production; this sandbox has no Iceberg
catalog jar, so the adapter falls back to parquet transparently (the
``writeTo``/``read.table`` path is kept behind USE_ICEBERG).

Synthesis is deterministic (seed fixed, no wall clock): Zipf-distributed
vocabulary (exercises head-term skew in the index build) plus injected
domain tokens from the reference's preserve-pattern examples (BRCA1,
100ug, Anti-CD3, emails, URLs — reference README.md:470-507). ``html`` is
a deterministic wrapper around ``text`` so the extraction invariant
(byte-identical text per url) is checkable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_VOCAB_CORE = [
    "the", "of", "and", "to", "a", "in", "is", "for", "on", "with",
    "data", "web", "page", "search", "index", "query", "token", "text",
    "spark", "engine", "crawl", "document", "rank", "score", "term",
    "results", "content", "site", "link", "user", "time", "new", "more",
    "system", "model", "build", "fast", "scale", "shard", "merge", "block",
]
_DOMAIN_TOKENS = [
    "BRCA1", "TP53", "Anti-CD3", "100ug", "50mg", "COVID-19", "v2.1.3",
    "support@example.com", "https://example.com/docs", "EGFR", "SKU-12345",
]
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "es", "de", "fr"]

_HTML_PRE = b"<html><head><title>p</title></head><body><p>"
_HTML_POST = b"</p></body></html>"


_VOCAB_CACHE: dict[tuple, tuple] = {}


def _vocab(vocab_size: int):
    """(vocab array, Zipf CDF) — built once per process per size. Draws
    use inverse-CDF sampling (searchsorted), O(n log V) per doc instead
    of numpy choice(p=...)'s O(V) re-normalization per call."""
    hit = _VOCAB_CACHE.get((vocab_size,))
    if hit is None:
        vocab = np.array(
            list(_VOCAB_CORE)
            + [f"w{i:05d}" for i in range(vocab_size - len(_VOCAB_CORE))],
            dtype=object,
        )
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        probs = (1.0 / ranks) / (1.0 / ranks).sum()
        hit = (vocab, np.cumsum(probs))
        _VOCAB_CACHE[(vocab_size,)] = hit
    return hit


def _make_rows(start: int, end: int, seed: int, vocab_size: int, doc_len: int):
    rng = np.random.default_rng(seed + start)
    vocab, cdf = _vocab(vocab_size)
    base_ts = pd.Timestamp("2024-03-01T00:00:00")
    rows = []
    for i in range(start, end):
        n = doc_len // 2 + int(rng.integers(0, doc_len))
        # Zipf-distributed draws: head terms dominate like real web text
        toks = vocab[np.searchsorted(cdf, rng.random(n))].tolist()
        # sprinkle domain tokens deterministically
        if i % 7 == 0:
            toks.insert(int(rng.integers(0, max(1, n))), _DOMAIN_TOKENS[i % len(_DOMAIN_TOKENS)])
        text = " ".join(toks)
        url = f"https://site{i % 1000}.example.org/page/{i}"
        rows.append(
            (
                url,
                base_ts + pd.Timedelta(seconds=int(i)),
                _HTML_PRE + text.encode("utf-8") + _HTML_POST,
                text,
                _LANGS[i % len(_LANGS)],
            )
        )
    return rows


def synth_pages(
    spark: SparkSession,
    n_docs: int = 1000,
    seed: int = 42,
    vocab_size: int = 2000,
    doc_len: int = 60,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic pages corpus, generated DISTRIBUTED (each partition
    synthesizes its own row range — no driver-side materialization, scales
    to arbitrary n_docs)."""
    parts = n_partitions or max(4, spark.sparkContext.defaultParallelism)
    bounds = spark.range(0, n_docs, 1, parts)

    def gen(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            ids = pdf["id"].to_numpy()
            if ids.size == 0:
                continue
            out = []
            for i in ids:
                out.extend(_make_rows(int(i), int(i) + 1, seed, vocab_size, doc_len))
            yield pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return bounds.mapInPandas(gen, PAGES_SCHEMA)


def extract_text_udf():
    """html binary -> text string; byte-identical to the stored ``text``
    column per url (the input_hint per-row invariant)."""
    from pyspark.sql.types import StringType

    def _extract(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pre, post = _HTML_PRE, _HTML_POST

        def one(b):
            if b is None:
                return None
            raw = bytes(b)
            if raw.startswith(pre) and raw.endswith(post):
                return raw[len(pre) : len(raw) - len(post)].decode("utf-8")
            # generic fallback: strip tags (deterministic, not a real parser)
            import re

            return re.sub(rb"<[^>]*>", b" ", raw).decode("utf-8", "replace").strip()

        for series in batch_iter:
            yield series.map(one)

    return F.pandas_udf(_extract, StringType())


def pages_to_docs(pages: DataFrame) -> DataFrame:
    """pages -> (doc_id, text[, url, lang]). doc_id = xxhash64(url):
    deterministic and stable across runs — the property the resume
    manifest relies on."""
    return pages.select(
        F.xxhash64("url").alias("doc_id"), "text", "url", "lang"
    )


def write_pages(
    pages: DataFrame,
    path_or_table: str,
    use_iceberg: bool = False,
    table_format: str = "iceberg",
) -> None:
    """Pages sink. ``use_iceberg=False`` writes plain parquet to a path.

    ``use_iceberg=True`` writes THROUGH THE SPARK CATALOG — the
    production north-rule path ("Iceberg tables of Common-Crawl-style
    web pages"): ``pages.writeTo(t).using(format).createOrReplace()``.
    This sandbox ships no Iceberg runtime jar, so tests exercise the
    identical writeTo/read.table seam with ``table_format="parquet"``;
    swapping the format string (plus the catalog jar + spark.sql.catalog
    conf) is the ONLY production difference. Spark's built-in session
    catalog is a V1 catalog that rejects the V2 ``createOrReplace``
    (REPLACE TABLE); the adapter falls back to the equivalent V1
    ``saveAsTable(mode="overwrite")`` so the catalog write still runs
    end-to-end here.
    """
    if use_iceberg:
        try:
            pages.writeTo(path_or_table).using(table_format).createOrReplace()
        except Exception:
            pages.write.format(table_format).mode("overwrite").saveAsTable(
                path_or_table
            )
        return
    pages.write.mode("overwrite").parquet(path_or_table)


def read_pages(spark: SparkSession, path_or_table: str, use_iceberg: bool = False) -> DataFrame:
    if use_iceberg:
        return spark.read.table(path_or_table)
    return spark.read.parquet(path_or_table)
