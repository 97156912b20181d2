"""Web-text encoding hygiene: entity decode, mojibake repair,
encoding-quality signals, readability scoring.

Crawled HTML arrives with three classic defects a 100-TB text pipeline
must score and repair before tokenization:

* **HTML entities** left in extracted text (``&amp;``, ``&#8217;``,
  ``&#x1F600;``) — decoded by a single-pass Arrow-batched UDF
  (``html.unescape`` is the full WHATWG table; a Catalyst chained-
  replace fast path covers the frequent named subset).
* **Mojibake** — UTF-8 bytes decoded as cp1252/latin-1 upstream
  ("cafÃ©"). Repair = re-encode through the sloppy codec and re-decode
  as UTF-8, accepted only when the round-trip is clean (the ftfy core
  heuristic).
* **Encoding damage signals** — replacement chars, stray C0/C1
  controls, mojibake signatures — as per-doc Catalyst counts feeding
  quality filters.

Readability (Flesch) rides along: pure Catalyst word/sentence/syllable
arithmetic — a quality-scoring staple that needs no Python.
"""

from __future__ import annotations

import html

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# frequent named entities, decoded in one Catalyst pass; &amp; LAST so
# double-encoded sequences ("&amp;lt;") decode exactly one level per
# pass (WHATWG semantics)
_NAMED = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&hellip;", "…"), ("&mdash;", "—"),
    ("&ndash;", "–"), ("&rsquo;", "’"), ("&lsquo;", "‘"),
    ("&rdquo;", "”"), ("&ldquo;", "“"), ("&copy;", "©"),
    ("&amp;", "&"),
]


def decode_entities_basic(col) -> Column:
    """Catalyst fast path: the frequent named entities as a chained
    literal replace — no regex, no Python, stays in whole-stage
    codegen. Numeric references need :func:`decode_entities`."""
    out = col if isinstance(col, Column) else F.col(col)
    for ent, ch in _NAMED:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _decode_series(s: pd.Series) -> pd.Series:
    return s.map(lambda t: html.unescape(t) if t is not None else None)


def decode_entities(col) -> Column:
    """Full WHATWG entity decode (named + decimal + hex numeric),
    Arrow-batched. html.unescape is a compiled regex + dict lookup —
    the correct tool; per-element overhead is one function call.
    (The udf is built at call time — a module-level @pandas_udf breaks
    executor-side module re-import, which needs no active session.)"""
    return pandas_udf(_decode_series, "string")(col)


def _repair_one(t):
    if t is None:
        return None
    for codec in ("cp1252", "latin-1"):
        try:
            b = t.encode(codec)
        except (UnicodeEncodeError, ValueError):
            continue
        try:
            fixed = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        return fixed
    return t


def _repair_series(s: pd.Series) -> pd.Series:
    return s.map(_repair_one)


def fix_mojibake(col) -> Column:
    """Repair UTF-8-read-as-cp1252 mojibake: re-encode through cp1252
    (latin-1 fallback for the C1 gap bytes cp1252 doesn't map) and
    re-decode as UTF-8; keep the original unless the round-trip is
    byte-clean. Pure-ASCII strings short-circuit (encode+decode are
    C-speed identity). Production note: `ftfy.fix_encoding` adds
    iterated and mixed-codec cases behind this same column boundary."""
    return pandas_udf(_repair_series, "string")(col)


def _mojibake_series(s: pd.Series) -> pd.Series:
    return s.map(
        lambda t: t.encode("utf-8").decode("latin-1") if t is not None else None
    )


def mojibake(col) -> Column:
    """Forward corruption (UTF-8 bytes decoded as latin-1) — the test /
    oracle-construction twin of :func:`fix_mojibake`."""
    return pandas_udf(_mojibake_series, "string")(col)


_CTRL_RX = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_MOJIBAKE_RX = r"Ã.|â€.|Â."


def encoding_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc encoding-damage signals: replacement-char count, stray
    control-char count (tab/newline/CR excluded), mojibake-signature
    count, and a 0/1 ``suspect`` flag. Pure Catalyst regexp counts —
    one projection riding the scan."""
    t = F.col(text_col)
    repl = F.regexp_count(t, F.lit("�")).alias("n_replacement")
    ctrl = F.regexp_count(t, F.lit(_CTRL_RX)).alias("n_control")
    moji = F.regexp_count(t, F.lit(_MOJIBAKE_RX)).alias("n_mojibake_sig")
    return docs.select(
        id_col, repl, ctrl, moji,
        (
            (F.regexp_count(t, F.lit("�")) > 0)
            | (F.regexp_count(t, F.lit(_CTRL_RX)) > 0)
            | (F.regexp_count(t, F.lit(_MOJIBAKE_RX)) > 0)
        ).cast("int").alias("suspect"),
    )


def readability(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", round_digits: int = 4) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per doc, pure
    Catalyst: words by non-letter split, sentences by [.!?] runs
    (min 1), syllables by vowel-group runs per word (min 1/word) — the
    standard automated heuristic. Returns (id, n_words, n_sentences,
    n_syllables, flesch, fk_grade)."""
    t = F.col(text_col)
    words = F.filter(F.split(F.lower(t), r"[^a-z']+"), lambda w: w != "")
    n_words = F.greatest(F.size(words), F.lit(1))
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    n_syll = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)),
    )
    wps = n_words.cast("double") / n_sent
    spw = n_syll.cast("double") / n_words
    return docs.select(
        id_col,
        F.size(words).alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(F.lit(206.835) - 1.015 * wps - 84.6 * spw, round_digits).alias("flesch"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, round_digits).alias("fk_grade"),
    )


SCRIPTS = ("Latin", "Cyrillic", "Han", "Arabic", "Greek", "Hangul")


def script_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Unicode-script profile per document: the fraction of LETTER
    characters in each major script (Latin, Cyrillic, Han, Arabic,
    Greek, Hangul) plus the dominant script — the standard pre-langid
    routing signal for a multilingual crawl (script is cheap and
    near-infallible; language id within a script is the hard part).

    Pure whole-stage-codegen ``regexp_count`` over Java's script
    property classes (``\\p{IsLatin}`` etc.) — one projection, no UDF,
    no shuffle. Docs without letters report 'none'."""
    n_letters = F.regexp_count(F.col(text_col), F.lit(r"\p{L}"))
    fracs = [
        F.round(
            F.when(
                n_letters > 0,
                F.regexp_count(F.col(text_col), F.lit(rf"\p{{Is{s}}}"))
                / n_letters,
            ).otherwise(F.lit(0.0)),
            round_digits,
        ).alias(f"frac_{s.lower()}")
        for s in SCRIPTS
    ]
    out = docs.select(id_col, n_letters.alias("n_letters"), *fracs)
    pairs = [
        x
        for s in SCRIPTS
        for x in (F.col(f"frac_{s.lower()}"), F.lit(s.lower()))
    ]
    dominant = F.when(F.col("n_letters") == 0, F.lit("none")).otherwise(
        # greatest-of via sorted array of (frac, name) structs: ties
        # break toward the alphabetically-last script name, pinned
        F.sort_array(
            F.array(
                *[
                    F.struct(
                        F.col(f"frac_{s.lower()}").alias("f"),
                        F.lit(s.lower()).alias("s"),
                    )
                    for s in SCRIPTS
                ]
            ),
            asc=False,
        )[0]["s"]
    )
    return out.withColumn("dominant_script", dominant)


def nfc_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC normalization hygiene (UAX #15): per-doc, is the
    text already NFC-normal, and how much does normalization change it?
    Returns (doc_id, is_nfc, raw_len, nfc_len, delta_len).

    Web text routinely mixes precomposed and decomposed accents (the
    same word in NFC and NFD forms hashes/dedups/tokenizes differently)
    — corpus pipelines normalize to NFC first (HTML5/W3C guidance).
    The normalization itself is a vectorized Arrow batch over Python's
    unicodedata (the reference Unicode implementation); the stats are
    Catalyst. Zero shuffle — pure map."""
    import unicodedata

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # is_nfc compares STRINGS, not lengths: normalization can reorder
    # combining marks (canonical ordering) without changing the length
    return docs.select(
        id_col,
        F.col(text_col).alias("__raw"),
        _nfc(F.col(text_col)).alias("__nfc"),
    ).select(
        id_col,
        (F.col("__raw") == F.col("__nfc")).alias("is_nfc"),
        F.length("__raw").alias("raw_len"),
        F.length("__nfc").alias("nfc_len"),
        (F.length("__raw") - F.length("__nfc")).alias("delta_len"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """The full Gopher quality-rule battery (Rae et al. 2021, app. A1.1
    "MassiveWeb" filters) as one Catalyst projection — the canonical
    LLM-corpus document gate the later pipelines (FineWeb, Dolma)
    started from. Per doc, every rule's measured value plus its verdict:

      * word count in [min_words, max_words]
      * mean word length in [3, 10]
      * (# + ellipsis) symbols per word <= 0.1
      * lines starting with a bullet <= 90%
      * lines ending in an ellipsis <= 30%
      * words containing an alphabetic char >= 80%
      * >= 2 distinct hits from the 8-stopword probe list
      * duplicate-line fraction <= 0.3 (the simplest of the Gopher
        repetition rules; the n-gram ones live in
        ops/textstats.py:repetition_signals)

    Returns one row per doc with the metrics and ``gopher_pass``. All
    rules are array/string expressions — no UDF, map-only, no shuffle:
    the shape that filters 10^12 docs at scan speed."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    wc = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mwl = total_chars / F.greatest(wc, F.lit(1)).cast("double")
    hash_count = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    dots = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    uni_ell = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("…"), F.lit(""))
    )
    symbol_ratio = (hash_count + dots + uni_ell) / F.greatest(
        wc, F.lit(1)
    ).cast("double")
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda l: l.rlike(r"^[-*•]"),
        )
    ) / F.greatest(n_lines, F.lit(1)).cast("double")
    ellipsis_frac = F.size(
        F.filter(
            lines,
            lambda l: l.rlike(r"(\.\.\.|…)$"),
        )
    ) / F.greatest(n_lines, F.lit(1)).cast("double")
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ) / F.greatest(wc, F.lit(1)).cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    dup_line_frac = (n_lines - F.size(F.array_distinct(lines))) / F.greatest(
        n_lines, F.lit(1)
    ).cast("double")
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        wc.cast("long").alias("word_count"),
        F.round(mwl, round_digits).alias("mean_word_len"),
        F.round(symbol_ratio, round_digits).alias("symbol_ratio"),
        F.round(bullet_frac, round_digits).alias("bullet_frac"),
        F.round(ellipsis_frac, round_digits).alias("ellipsis_frac"),
        F.round(alpha_frac, round_digits).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        F.round(dup_line_frac, round_digits).alias("dup_line_frac"),
    )
    gate = (
        (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
    )
    return out.withColumn("gopher_pass", gate)


# UTS #39 confusable pairs relevant to Latin-lookalike domain spoofs:
# Cyrillic and Greek letters whose glyphs are (near-)identical to ASCII.
# (A pinned subset of the Unicode confusables.txt skeleton table — the
# full table is data, not logic; swap in the published file at
# production scale.)
_CONFUSABLES = {
    "а": "a", "е": "e", "о": "o", "р": "p",
    "с": "c", "х": "x", "у": "y", "і": "i",
    "ѕ": "s", "ј": "j", "һ": "h", "ԁ": "d",
    "ԛ": "q", "ԝ": "w", "ο": "o", "Α": "A",
    "Β": "B", "Ε": "E", "Ο": "O", "С": "C",
    "О": "O", "А": "A", "Е": "E", "Р": "P",
}


def skeleton(col) -> Column:
    """UTS #39-style confusable skeleton (Unicode TS #39 §4, the
    IDN-homograph defense): fold confusable non-ASCII letters to their
    ASCII look-alikes with ONE ``translate`` — whole-stage codegen,
    shared verbatim with the SQL oracle."""
    src = "".join(_CONFUSABLES)
    dst = "".join(_CONFUSABLES.values())
    return F.translate(col, src, dst)


def homoglyph_domains(
    hosts: DataFrame, host_col: str = "host", round_digits: int = 6
) -> DataFrame:
    """IDN-homograph spoof detection over a crawl's host set
    (Gabrilovich & Gontmakher, "The Homograph Attack", CACM 45(2)
    2002; UTS #39 skeleton matching): hosts whose confusable skeletons
    COLLIDE while their raw forms differ are spoof pairs — the
    registered lookalike of a target domain.

    Returns one row per colliding skeleton: (skeleton, n_hosts,
    n_spoofed, hosts) with hosts sorted; ``n_spoofed`` counts the
    non-ASCII variants.  One hash aggregate on the skeleton key —
    10^8 hosts shard on it; no UDF (translate + regexp are codegen).
    """
    sk = hosts.select(
        F.col(host_col).alias("h"),
        skeleton(F.col(host_col)).alias("skeleton"),
        (~F.col(host_col).rlike(r"^[\x00-\x7f]*$")).cast("int").alias(
            "non_ascii"
        ),
    ).distinct()
    return (
        sk.groupBy("skeleton")
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.sum("non_ascii").cast("long").alias("n_spoofed"),
            F.array_join(F.array_sort(F.collect_list("h")), ",").alias(
                "hosts"
            ),
        )
        .filter((F.col("n_hosts") > 1) & (F.col("n_spoofed") > 0))
    )


def thin_content(
    docs: DataFrame,
    thin_chars: int = 200,
    group_col: str = "source",
    len_col: str = "n_chars",
    round_digits: int = 6,
) -> DataFrame:
    """Thin-content host audit — the low-information-page signal of
    the web-spam taxonomy (Gyöngyi & Garcia-Molina, "Web Spam
    Taxonomy", AIRWeb 2005: pages with little or duplicated content
    exist to carry ads/links, and hosts dominated by them are
    downweighted wholesale by quality systems).  Per group (host /
    source): page count, thin-page share (< ``thin_chars``), median
    and mean length — the inputs to a host-level keep/demote decision.

    One hash aggregate; ``percentile`` is Spark's exact interpolated
    percentile (matches DuckDB ``quantile_cont``)."""
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum((F.col(len_col) < thin_chars).cast("int"))
        .cast("long")
        .alias("n_thin"),
        F.round(
            F.avg((F.col(len_col) < thin_chars).cast("int")), round_digits
        ).alias("frac_thin"),
        F.round(
            F.expr(f"percentile({len_col}, 0.5)"), round_digits
        ).alias("median_chars"),
        F.round(F.avg(len_col), round_digits).alias("mean_chars"),
    )


URL_DATE_RX = r"/([12][09][0-9][0-9])/([01]?[0-9])/"


def url_date_stats(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    round_digits: int = 4,
) -> DataFrame:
    """Dated-URL profiling — the news/blog freshness prior used by
    crawl schedulers (the URL-pattern feature family of the recrawl
    literature, cf. ops/recrawl.py, and the Kraaij-style URL priors in
    index/urlprior.py): paths carrying a /YYYY/MM/ segment identify
    date-organized archives whose old sections never change and whose
    current month churns daily.

    Per host: page count, dated-URL count/fraction, and the dated
    span (min/max year-month as YYYYMM ints).  Pure regexp + one hash
    aggregate; the pattern is RE2-safe and shared with the oracle."""
    y = F.regexp_extract(F.col(url_col), URL_DATE_RX, 1)
    m = F.regexp_extract(F.col(url_col), URL_DATE_RX, 2)
    ym = F.when(
        y != "", y.cast("int") * 100 + m.cast("int")
    )
    return (
        urls.withColumn("__ym", ym)
        .groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.col("__ym").isNotNull().cast("int"))
            .cast("long")
            .alias("n_dated"),
            F.round(
                F.sum(F.col("__ym").isNotNull().cast("int"))
                / F.count(F.lit(1)),
                round_digits,
            ).alias("dated_frac"),
            F.min("__ym").alias("min_ym"),
            F.max("__ym").alias("max_ym"),
        )
    )


# Trojan-Source / invisible-character audit (CVE-2021-42574):
# bidirectional overrides and zero-width characters
_BIDI_RX = "[‪-‮⁦-⁩]"
_BIDI_OPEN_RX = "[‪‫‭‮]"  # LRE RLE LRO RLO
_BIDI_CLOSE_RX = "‬"  # PDF
_ISO_OPEN_RX = "[⁦⁧⁨]"  # LRI RLI FSI
_ISO_CLOSE_RX = "⁩"  # PDI
_INVIS_RX = "[​-‍⁠﻿]"


def bidi_audit(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Bidirectional-control and invisible-character audit — the
    Trojan Source screen for a text corpus.

    Boucher & Anderson, "Trojan Source: invisible vulnerabilities"
    (USENIX Security 2022; CVE-2021-42574): Unicode bidi override and
    embedding controls (U+202A..U+202E) and the isolate controls
    (U+2066..U+2069) reorder DISPLAYED text without changing the byte
    sequence — in code or prompts they make what reviewers read differ
    from what parsers execute.  Zero-width characters (U+200B..U+200D,
    U+2060, U+FEFF) are the companion smuggling channel (and a
    tokenizer-poisoning vector for LLM corpora, the same family as the
    special-token scan in ``ops/contamination.py``).

    Per group: documents and characters carrying each class, plus the
    count of docs whose bidi embeddings/overrides are UNBALANCED
    (opens != PDF closes, or isolate opens != PDI closes) — the
    signature Boucher & Anderson exploit, since a dangling override
    reorders everything to end-of-line.  Pure ``regexp_count``
    projections — whole-stage codegen, no UDFs.
    """
    t = F.col(text_col)

    def cnt(rx):
        return F.regexp_count(t, F.lit(rx))

    per = docs.select(
        F.col(group_col).alias("grp"),
        cnt(_BIDI_RX).alias("n_bidi"),
        cnt(_INVIS_RX).alias("n_invis"),
        (
            (cnt(_BIDI_OPEN_RX) != cnt(_BIDI_CLOSE_RX))
            | (cnt(_ISO_OPEN_RX) != cnt(_ISO_CLOSE_RX))
        ).alias("unbalanced"),
    )
    return per.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_bidi") > 0).cast("long")).alias("docs_bidi"),
        F.sum("n_bidi").alias("chars_bidi"),
        F.sum((F.col("n_invis") > 0).cast("long")).alias("docs_invis"),
        F.sum("n_invis").alias("chars_invis"),
        F.sum(F.col("unbalanced").cast("long")).alias("docs_unbalanced"),
        F.round(
            F.sum(
                ((F.col("n_bidi") > 0) | (F.col("n_invis") > 0)).cast(
                    "long"
                )
            )
            / F.count(F.lit(1)),
            round_digits,
        ).alias("frac_affected"),
    )


CCTLD_LANG = {
    "de": "de", "fr": "fr", "es": "es", "it": "it", "nl": "nl",
    "pl": "pl", "pt": "pt", "jp": "ja", "cn": "zh", "ru": "ru",
}


def lang_tld_mismatch(
    pages: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    round_digits: int = 6,
) -> DataFrame:
    """Language vs ccTLD consistency audit — the geo-targeting smell
    test.

    The hreflang-adjacent hygiene check (Google's international-SEO
    guidance formalizes the expectation): a page on a country-code
    TLD whose content language contradicts the TLD's primary language
    is either mis-targeted, machine-translated spam, or a parked
    domain — and for a crawler it de-prioritizes the page for that
    locale's index.  gTLDs (.com/.org/...) assert nothing and are
    reported as 'neutral'.

    Per TLD: (tld, expected_lang, n_pages, n_match, n_mismatch,
    mismatch_rate) — expected_lang NULL for gTLDs (whole row then
    counts as neutral, rate NULL).
    """
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)
    tld = F.regexp_extract(host, r"\.([a-z]+)$", 1)
    mapping = F.create_map(
        *[F.lit(x) for kv in CCTLD_LANG.items() for x in kv]
    )
    exp = mapping[tld]
    per = pages.select(
        tld.alias("tld"),
        exp.alias("expected_lang"),
        F.col(lang_col).alias("lang"),
    )
    return per.groupBy("tld", "expected_lang").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(
            F.when(
                F.col("expected_lang") == F.col("lang"), 1
            ).otherwise(0).cast("long")
        ).alias("n_match"),
        F.sum(
            (
                F.col("expected_lang").isNotNull()
                & (F.col("expected_lang") != F.col("lang"))
            ).cast("long")
        ).alias("n_mismatch"),
        F.round(
            F.sum(
                (
                    F.col("expected_lang").isNotNull()
                    & (F.col("expected_lang") != F.col("lang"))
                ).cast("long")
            )
            / F.count(F.lit(1)),
            round_digits,
        ).alias("mismatch_rate"),
    )


def mixed_content_audit(
    pages: DataFrame,
    host_col: str = "host",
    scheme_col: str = "scheme",
    html_col: str = "html",
) -> DataFrame:
    """Mixed-content audit — https pages embedding http:// sub-resources.

    The browser-security check (MDN "Mixed content"; W3C
    mixed-content spec): an https page that loads scripts, images, or
    stylesheets over plain http either breaks (active content is
    blocked) or silently downgrades the page's integrity guarantee.
    At corpus scale the per-host rate is a site-quality and
    trust signal.  Counts ``src=`` / ``href=`` attributes with an
    explicit ``http://`` origin on https-served pages only.

    Per host: (host, n_pages, n_https_pages, pages_mixed,
    n_mixed_refs) — integer counts only (the mixed share is
    pages_mixed / n_https_pages), so the audit hashes identically on
    every engine.
    """
    is_https = (F.col(scheme_col) == "https").cast("long")
    refs = F.regexp_count(
        F.lower(F.col(html_col)),
        F.lit('(src|href)="http://'),
    )
    mixed_refs = F.when(F.col(scheme_col) == "https", refs).otherwise(
        F.lit(0)
    )
    return (
        pages.select(
            F.col(host_col).alias("host"),
            is_https.alias("https"),
            mixed_refs.alias("m"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("https").alias("n_https_pages"),
            F.sum((F.col("m") > 0).cast("long")).alias("pages_mixed"),
            F.sum("m").alias("n_mixed_refs"),
        )
    )
