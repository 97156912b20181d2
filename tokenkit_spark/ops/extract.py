"""HTML -> clean text extraction: the first operator every
Common-Crawl-style pipeline runs, turning raw fetched markup (the
``html: binary`` column of the pages table) into the ``text: string``
column the tokenizer / index build consumes.

Reference parity note: the reference library (lib/tokenkit/*.rb) is a
tokenizer and starts from already-extracted text; the north rule's
input table carries both ``html`` and ``text`` with a byte-identical
``text``-per-url invariant.  This module is the operator that
PRODUCES that ``text`` deterministically, so the invariant is testable
end-to-end rather than assumed.

Extraction semantics (deterministic, stdlib-only, pinned here so the
output is byte-reproducible across versions):

1. **Charset sniff + decode** — honor a UTF-8 BOM, else a
   ``<meta charset=...>`` / ``Content-Type; charset=...`` declaration
   within the first 1024 bytes (the WHATWG prescan window), else
   UTF-8 with ``errors='replace'``.
2. **Drop non-content machinery** — ``<script> <style> <noscript>
   <template> <svg> <head>`` element bodies and ``<!-- comments -->``
   contribute nothing to text. (``<title>`` is extracted from head
   separately when ``keep_title=True``.)
3. **Block structure -> newlines** — opening/closing block-level tags
   (``p div br li tr h1..h6 ...``) become ``\\n``; inline tags
   (``a b i span em ...``) become nothing, so "ab<b>c</b>" is "abc".
4. **Entity decode** — full WHATWG table via ``html.unescape``.
5. **Whitespace canonicalization** — per line: collapse internal
   whitespace runs to one space, strip; drop empty lines; join with
   single ``\\n``.

Scale shape: one Arrow-batched ``mapInPandas`` pass, embarrassingly
parallel, no shuffle; the regexes below are precompiled once per
executor.  At 100 TB this is scan-bound, exactly like the reference
pipeline's extraction stage.  Stay-in-Python here is deliberate: tag
stripping with nesting-aware script/style removal is not expressible
in Catalyst ``regexp_replace`` without catastrophic backtracking on
adversarial markup, and the per-batch Arrow transfer amortizes the
boundary cost.
"""

from __future__ import annotations

import html
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Elements whose entire content is dropped. <head> is in the list:
# title/meta are structured fields, not body text (title is pulled out
# before the drop when keep_title=True).
_DROP_ELEMENTS = ("script", "style", "noscript", "template", "svg", "head")
_DROP_RX = re.compile(
    r"<(" + "|".join(_DROP_ELEMENTS) + r")\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RX = re.compile(r"<!--.*?-->", re.DOTALL)

# HTML5 block-level / flow-breaking elements: a tag boundary here is a
# line boundary in the extracted text.
_BLOCK = (
    "address|article|aside|blockquote|br|caption|dd|details|dialog|div|dl|"
    "dt|fieldset|figcaption|figure|footer|form|h1|h2|h3|h4|h5|h6|header|"
    "hgroup|hr|li|main|nav|ol|p|pre|section|summary|table|tbody|td|tfoot|"
    "th|thead|tr|ul"
)
_BLOCK_TAG_RX = re.compile(r"</?(?:" + _BLOCK + r")\b[^>]*/?>", re.IGNORECASE)
_ANY_TAG_RX = re.compile(r"</?[a-zA-Z][^>]*>|<!(?:DOCTYPE|doctype)[^>]*>")
_TITLE_RX = re.compile(
    r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL
)
# literal newlines in markup are whitespace, NOT line breaks -- only
# block-tag boundaries (replaced by \x00 sentinels) break lines
_WS_RX = re.compile(r"\s+")

# WHATWG prescan: charset declared in the first 1024 bytes.
_META_CHARSET_RX = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)


def sniff_charset(raw: bytes) -> str:
    """BOM > meta-prescan > utf-8 fallback; unknown labels fall back
    too (never raise — crawled charset labels lie)."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    m = _META_CHARSET_RX.search(raw[:1024])
    if m:
        label = m.group(1).decode("ascii", "ignore").lower()
        import codecs

        try:
            codecs.lookup(label)
            return label
        except (LookupError, ValueError):
            return "utf-8"
    return "utf-8"


def extract_text_str(markup: str, keep_title: bool = True) -> str:
    """The pinned markup->text function (decoded-string input). Pure,
    deterministic; the DuckDB oracle mirrors it by construction on
    parametric fixtures."""
    title = ""
    if keep_title:
        tm = _TITLE_RX.search(markup)
        if tm:
            title = tm.group(1)
    s = _COMMENT_RX.sub(" ", markup)
    s = _DROP_RX.sub(" ", s)
    if title:
        s = title + "\x00" + s
    s = _BLOCK_TAG_RX.sub("\x00", s)
    s = _ANY_TAG_RX.sub("", s)
    s = html.unescape(s)
    lines = []
    for ln in s.split("\x00"):
        ln = _WS_RX.sub(" ", ln).strip()
        if ln:
            lines.append(ln)
    return "\n".join(lines)


def extract_text_bytes(raw: bytes, keep_title: bool = True) -> str:
    """html bytes -> clean text: charset sniff + decode + extract."""
    if raw is None:
        return None
    return extract_text_str(
        raw.decode(sniff_charset(raw), errors="replace"), keep_title
    )


def with_extracted_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    keep_title: bool = True,
) -> DataFrame:
    """Append ``out_col`` = extracted clean text of ``html_col``
    (binary or string).  One mapInPandas pass over Arrow batches — no
    shuffle, no driver traffic; schema = input + out_col."""
    in_schema = pages.schema
    out_schema = T.StructType(
        [f for f in in_schema.fields if f.name != out_col]
        + [T.StructField(out_col, T.StringType(), True)]
    )
    is_binary = isinstance(in_schema[html_col].dataType, T.BinaryType)
    kept = [f.name for f in in_schema.fields if f.name != out_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = extract_text_bytes if is_binary else extract_text_str
        for pdf in batches:
            out = pdf[kept].copy()
            out[out_col] = pdf[html_col].map(
                lambda v: fn(v, keep_title) if v is not None else None
            )
            yield out

    return pages.mapInPandas(kernel, out_schema)


def extraction_stats(pages: DataFrame, html_col: str = "html",
                     text_col: str = "text") -> DataFrame:
    """Per-corpus extraction QA: how much markup became how much text.
    Pure Catalyst aggregation over the already-extracted table."""
    return pages.agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length(html_col).cast("bigint")).alias("html_bytes"),
        F.sum(F.length(text_col).cast("bigint")).alias("text_chars"),
        F.sum(
            F.when(F.length(F.coalesce(text_col, F.lit(""))) == 0, 1)
            .otherwise(0).cast("bigint")
        ).alias("n_empty_text"),
    )
