"""Catalyst-native tokenization fast paths.

For strategies whose semantics pure Spark SQL expressions can reproduce
exactly, we emit built-in column expressions so the whole plan stays inside
WholeStageCodegen — no Python worker, no Arrow hop. Semantics mirror the
reference strategies (cited per builder); the pandas-UDF path in udfs.py is
the reference implementation and tests assert both paths agree.

Not expressible natively (routed to the UDF): unicode/sentence/grapheme
(UAX-29), pattern (Python-flavored regex), url_email (linkify spans),
path_hierarchy (bespoke prefix logic), and ANY config with
preserve_patterns (span merge + gap re-tokenization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import AnalyzerConfig

# Java regex classes
_WS = r"\s   -     　"
_WS_SPLIT = f"[{_WS}]+"
# Rust char::is_ascii_punctuation == the 4 ASCII punct ranges
_ASCII_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
_NON_ALPHA_SPLIT = r"[^\p{IsAlphabetic}]+"


def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda x: x != F.lit(""))


def _post(arr: Column, cfg: AnalyzerConfig) -> Column:
    """post_process (mod.rs:210-222): lowercase, then strip ASCII
    punctuation inside tokens and drop emptied tokens."""
    if cfg.lowercase:
        arr = F.transform(arr, F.lower)
    if cfg.remove_punctuation:
        arr = _nonempty(F.transform(arr, lambda t: F.regexp_replace(t, _ASCII_PUNCT_CLASS, "")))
    return arr


def _java_escape_char_class(chars: str) -> str:
    return "[" + "".join("\\u%04X" % ord(c) for c in chars) + "]+"


def _words(col: Column, cfg: AnalyzerConfig) -> Column:
    """Whitespace words with the reference's per-word punct-strip for the
    ngram family (edge_ngram.rs:48-54)."""
    words = _nonempty(F.split(col, _WS_SPLIT))
    if cfg.remove_punctuation:
        words = _nonempty(
            F.transform(words, lambda w: F.regexp_replace(w, _ASCII_PUNCT_CLASS, ""))
        )
    return words


_NATIVE_STRATEGIES = frozenset(
    {"whitespace", "letter", "lowercase", "keyword", "char_group", "edge_ngram", "ngram"}
)


def supports_native(cfg: AnalyzerConfig) -> bool:
    """True if this config has an exact Catalyst-native expression."""
    return not cfg.preserve_patterns and cfg.strategy in _NATIVE_STRATEGIES


def try_tokenize_native(col: Column, cfg: AnalyzerConfig):
    """Return a native Column expression for this config, or None if the
    config needs the pandas-UDF path."""
    if cfg.preserve_patterns:
        return None

    s = cfg.strategy
    if s == "whitespace":
        # whitespace.rs:17-29
        return _post(_nonempty(F.split(col, _WS_SPLIT)), cfg)

    if s == "letter":
        # letter.rs:17-39 — runs of Unicode-Alphabetic chars
        return _post(_nonempty(F.split(col, _NON_ALPHA_SPLIT)), cfg)

    if s == "lowercase":
        # lowercase.rs:17-49 — split on non-alphabetic of the ORIGINAL text,
        # then lowercase each run (always, regardless of cfg.lowercase)
        runs = _nonempty(F.split(col, _NON_ALPHA_SPLIT))
        return F.transform(runs, F.lower)

    if s == "keyword":
        # keyword.rs:15-23
        t = F.trim(col)
        arr = F.when(t != F.lit(""), F.array(t)).otherwise(
            F.array().cast("array<string>")
        )
        return _post(arr, cfg)

    if s == "char_group":
        # char_group.rs — empty split set ⇒ whole text as single token
        if not cfg.split_on_chars:
            arr = F.when(col != F.lit(""), F.array(col)).otherwise(
                F.array().cast("array<string>")
            )
            return _post(arr, cfg)
        return _post(_nonempty(F.split(col, _java_escape_char_class(cfg.split_on_chars))), cfg)

    if s == "edge_ngram":
        # edge_ngram.rs:19-71 — prefixes per word, code-point lengths,
        # lowercase AFTER generation
        mn, mx = max(1, cfg.min_gram), max(max(1, cfg.min_gram), cfg.max_gram)
        grams = F.flatten(
            F.transform(
                _words(col, cfg),
                lambda w: F.transform(
                    F.sequence(F.lit(mn), F.greatest(F.least(F.lit(mx), F.length(w)), F.lit(mn))),
                    lambda n: F.substring(w, F.lit(1), n),
                ),
            )
        )
        # sequence(mn, max(min(mx,len),mn)) over-generates one dup prefix when
        # len < mn; drop grams shorter than mn (word shorter than min_gram
        # yields nothing — matches chars.take(n) semantics only when n<=len)
        grams = F.filter(grams, lambda g: F.length(g) >= F.lit(mn))
        if cfg.lowercase:
            grams = F.transform(grams, F.lower)
        return grams

    if s == "ngram":
        # ngram.rs:23-78 — all windows, SIZE-MAJOR emission order
        mn, mx = max(1, cfg.min_gram), max(max(1, cfg.min_gram), cfg.max_gram)
        grams = F.flatten(
            F.transform(
                _words(col, cfg),
                lambda w: F.flatten(
                    F.transform(
                        F.sequence(
                            F.lit(mn),
                            F.greatest(F.least(F.lit(mx), F.length(w)), F.lit(mn)),
                        ),
                        lambda size: F.filter(
                            F.transform(
                                F.sequence(F.lit(1), F.greatest(F.length(w) - size + 1, F.lit(1))),
                                lambda i: F.substring(w, i, size),
                            ),
                            lambda g: F.length(g) == size,
                        ),
                    )
                ),
            )
        )
        grams = F.filter(grams, lambda g: F.length(g) >= F.lit(mn))
        if cfg.lowercase:
            grams = F.transform(grams, F.lower)
        return grams

    return None
