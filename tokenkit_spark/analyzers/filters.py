"""Token filter chains: stopword removal + Porter stemming, with
preserve-pattern exemption.

north_star: "lowercase/stopword/stemming filter chains preserving gene
names, measurements and technical terms". The tokenizers (core.py)
already own lowercase/remove_punctuation/preserve_patterns exactly as
the reference does; this layer adds the two filters the reference
positions downstream (README.md:509-553 index-time analysis) as a
composable chain over token arrays.

Exemption contract: a token that fully matches any preserve pattern is
passed through verbatim — not dropped as a stopword, not stemmed — so
``BRCA1``, ``100ug``, ``Anti-CD3`` survive a chain that stems the rest.

Spark execution: ``filter_chain_col`` uses a native Catalyst expression
for the stopword-only chain (stays in WholeStageCodegen) and an Arrow
pandas UDF when stemming or preserve patterns are involved.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field
from typing import Iterator, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..config import compile_pattern, to_inline_pattern
from .stem import porter_stem

# Lucene/Snowball's classic 33-word English stop set (public domain)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)


@dataclass(frozen=True)
class FilterChain:
    """Declarative filter chain applied AFTER tokenization."""

    stopwords: frozenset[str] = frozenset()
    stem: bool = False
    preserve_patterns: tuple[str, ...] = ()

    def __post_init__(self):
        object.__setattr__(
            self,
            "preserve_patterns",
            tuple(to_inline_pattern(p) for p in self.preserve_patterns),
        )

    def key(self) -> tuple:
        return (tuple(sorted(self.stopwords)), self.stem, self.preserve_patterns)

    def compile(self):
        """-> callable(list[str]) -> list[str]."""
        pats = [compile_pattern(p) for p in self.preserve_patterns]
        stop = self.stopwords
        stem = self.stem

        def _preserved(tok: str) -> bool:
            return any(p.fullmatch(tok) for p in pats)

        def apply(tokens):
            if tokens is None:
                return None
            out = []
            for t in tokens:
                if pats and _preserved(t):
                    out.append(t)
                    continue
                if stop and t in stop:
                    continue
                out.append(porter_stem(t) if stem else t)
            return out

        return apply


def filter_chain_col(tokens_col, chain: FilterChain) -> Column:
    """Apply a FilterChain to an ``array<string>`` column."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if not chain.stem and not chain.preserve_patterns:
        if not chain.stopwords:
            return c
        # native path: array_contains against a literal array is
        # codegen'd JVM-side; order + duplicates preserved (unlike
        # array_except, which dedups)
        stop_arr = F.array(*[F.lit(s) for s in sorted(chain.stopwords)])
        return F.filter(c, lambda t: ~F.array_contains(stop_arr, t))

    key = chain.key()

    def _udf(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = FilterChain(frozenset(key[0]), key[1], key[2]).compile()
        for series in batch_iter:
            yield series.map(fn)

    return F.pandas_udf(_udf, ArrayType(StringType()))(c)


# ---------------------------------------------------------------------------
# ASCII folding (Lucene ASCIIFoldingFilter semantics for Latin scripts)
# ---------------------------------------------------------------------------

# Multi-char/ligature foldings NFD can't produce (no combining-mark
# decomposition exists for these codepoints).
_FOLD_EXPANSIONS: tuple[tuple[str, str], ...] = (
    ("æ", "ae"), ("Æ", "AE"), ("œ", "oe"), ("Œ", "OE"), ("ß", "ss"),
    ("þ", "th"), ("Þ", "TH"), ("ð", "d"), ("Ð", "D"), ("đ", "d"),
    ("Đ", "D"), ("ø", "o"), ("Ø", "O"), ("ł", "l"), ("Ł", "L"),
    ("ı", "i"), ("ŉ", "'n"), ("ĸ", "k"),
)


# 1:1 stroke/special letters with no NFD decomposition (Lucene folds
# them; NFD-stripping alone would leave them non-ASCII)
_FOLD_STROKES = ("ħĦŧŦŋŊſ", "hHtTnNs")


def _build_fold_tables() -> tuple[str, str]:
    """1:1 foldings over Latin-1 Supplement + Latin Extended-A: NFD
    diacritic stripping plus the stroke letters NFD can't decompose."""
    src, dst = list(_FOLD_STROKES[0]), list(_FOLD_STROKES[1])
    expanded = {s for s, _ in _FOLD_EXPANSIONS} | set(_FOLD_STROKES[0])
    for cp in range(0xC0, 0x180):
        ch = chr(cp)
        if ch in expanded:
            continue
        base = "".join(
            c for c in unicodedata.normalize("NFD", ch) if not unicodedata.combining(c)
        )
        if len(base) == 1 and base != ch and ord(base) < 0x80:
            src.append(ch)
            dst.append(base)
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _build_fold_tables()


def ascii_fold(text: str | None) -> str | None:
    """Python twin of :func:`ascii_fold_col` (parity-tested)."""
    if text is None:
        return None
    for s, r in _FOLD_EXPANSIONS:
        if s in text:
            text = text.replace(s, r)
    return text.translate(str.maketrans(_FOLD_SRC, _FOLD_DST))


def ascii_fold_col(col: str | Column) -> Column:
    """Fold accented Latin text to ASCII entirely JVM-side: a short chain
    of literal ``replace`` calls for the ligature expansions, then ONE
    ``translate`` for every 1:1 diacritic folding — stays inside
    WholeStageCodegen, no Python worker at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    for s, r in _FOLD_EXPANSIONS:
        c = F.replace(c, F.lit(s), F.lit(r))
    return F.translate(c, _FOLD_SRC, _FOLD_DST)


# ---------------------------------------------------------------------------
# Synonym filter (Elasticsearch synonym / synonym_graph simple semantics)
# ---------------------------------------------------------------------------

def synonyms_col(
    tokens_col: str | Column,
    mapping: Mapping[str, str | Sequence[str]],
    expand: bool = False,
) -> Column:
    """Apply a synonym map to an ``array<string>`` token column, fully
    native (map literal + ``transform``; plan-embedded, codegen'd).

    - ``expand=False`` (contract mode): each token maps to its canonical
      form, unknown tokens pass through.
    - ``expand=True``: each token expands in place to the full synonym
      set (``array`` values), preserving token order.

    The mapping is embedded in the plan — right for the usual 10^2-10^4
    entry dictionaries. For synonym tables too big to inline, use
    :func:`apply_synonyms_join`, which keeps the table distributed.
    """
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if not mapping:
        return c
    if expand:
        pairs = []
        for k, v in sorted(mapping.items()):
            vals = [v] if isinstance(v, str) else list(v)
            pairs += [F.lit(k), F.array(*[F.lit(x) for x in vals])]
        m = F.create_map(*pairs)
        return F.flatten(
            F.transform(c, lambda t: F.coalesce(F.element_at(m, t), F.array(t)))
        )
    pairs = []
    for k, v in sorted(mapping.items()):
        if not isinstance(v, str):
            raise ValueError("contract mode (expand=False) needs str values")
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return F.transform(c, lambda t: F.coalesce(F.element_at(m, t), t))


def apply_synonyms_join(
    df: DataFrame,
    id_cols: Sequence[str],
    tokens_col: str,
    syn_df: DataFrame,
    out_col: str | None = None,
) -> DataFrame:
    """Scale path for synonym application: ``syn_df(term, canonical)``
    stays a distributed table. posexplode -> left join on term ->
    re-assemble per document ordered by position. Two shuffles (join +
    re-agg); AQE broadcasts ``syn_df`` automatically when it is small,
    and falls back to a shuffle join when it is not — no driver-side
    collect either way. Rows with empty/NULL token arrays are preserved.
    """
    out_col = out_col or tokens_col
    ids = list(id_cols)
    exploded = df.select(
        *ids, F.posexplode_outer(F.col(tokens_col)).alias("__pos", "__term")
    )
    joined = exploded.join(
        syn_df.select(
            F.col("term").alias("__term"), F.col("canonical").alias("__canon")
        ),
        "__term",
        "left",
    ).select(*ids, "__pos", F.coalesce("__canon", "__term").alias("__mapped"))
    reagg = joined.groupBy(*ids).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__pos").isNotNull(),
                        F.struct(F.col("__pos"), F.col("__mapped")),
                    )
                )
            ),
            lambda s: s["__mapped"],
        ).alias(out_col)
    )
    keep = [c for c in df.columns if c not in ids and c != tokens_col]
    if keep:
        reagg = df.drop(tokens_col).join(reagg, ids, "left")
    return reagg


# ---------------------------------------------------------------------------
# Word shingles (Lucene ShingleFilter: word n-grams as single tokens)
# ---------------------------------------------------------------------------

def shingles_col(tokens_col: str | Column, n: int = 2, sep: str = " ") -> Column:
    """Word n-gram shingles over an ``array<string>`` column, native:
    windows via ``sequence``+``transform``, joined with ``sep``. A doc
    with fewer than ``n`` tokens yields an empty array (``sequence(1,0)``
    counts DOWN in Spark — guarded)."""
    if n < 1:
        raise ValueError(f"shingle size must be >= 1, got {n}")
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    size = F.size(c)
    windows = F.transform(
        F.sequence(F.lit(1), size - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(c, i, n), sep),
    )
    return F.when(size >= F.lit(n), windows).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# word_delimiter_graph (Lucene/ES defaults) — pure Catalyst
# ---------------------------------------------------------------------------

def word_delimiter_col(token_col: str | Column) -> Column:
    """Lucene ``word_delimiter_graph`` with default flags, as a pure
    Catalyst expression over ONE token: returns the array of word/number
    parts. Default behavior implemented (reference: Lucene
    WordDelimiterGraphFilter docs): split on non-alphanumerics, on
    lower→upper case transitions ("PowerShot" → Power, Shot), on
    letter↔digit transitions ("SD500" → SD, 500); English possessive
    's stripped first ("O'Neil's" → O, Neil); generate_word_parts +
    generate_number_parts on, catenate_* and preserve_original off.

    Regex subset is RE2-safe (no lookarounds) so the DuckDB oracle can
    state the identical transform."""
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    c = F.regexp_replace(c, r"'[sS]\b", "")
    c = F.regexp_replace(c, r"([a-z])([A-Z])", r"$1 $2")
    c = F.regexp_replace(c, r"([A-Za-z])([0-9])", r"$1 $2")
    c = F.regexp_replace(c, r"([0-9])([A-Za-z])", r"$1 $2")
    return F.filter(F.split(c, r"[^A-Za-z0-9]+"), lambda t: t != "")


# ---------------------------------------------------------------------------
# dictionary decompounder (Lucene DictionaryCompoundWordTokenFilter)
# ---------------------------------------------------------------------------

def decompound_occurrences(
    token_col: str | Column,
    part_col: str | Column,
    min_word_size: int = 5,
) -> Column:
    """Occurrence count of dictionary ``part`` inside ``token`` at EVERY
    start position (the Lucene DictionaryCompoundWordTokenFilter scan
    with onlyLongestMatch=false: each start offset is probed, so
    overlapping matches all emit). 0 when the token is shorter than
    ``min_word_size`` (Lucene's min_word_size gate) or the part doesn't
    fit. Pure Catalyst (sequence + filter lambda, no UDF)."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    part = F.col(part_col) if isinstance(part_col, str) else part_col
    fits = (F.length(tok) >= min_word_size) & (
        F.length(part) <= F.length(tok)
    )
    starts = F.sequence(F.lit(1), F.length(tok) - F.length(part) + 1)
    hits = F.size(
        F.filter(
            starts,
            lambda i: tok.substr(i, F.length(part)) == part,
        )
    )
    return F.when(fits, hits).otherwise(F.lit(0))


_SOUNDEX_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_CODES = "01230127022455012623017202"  # H/W -> 7 (coding-transparent)


def soundex_col(col) -> Column:
    """American Soundex (Russell & Odell, US patents 1918/1922; the
    phonetic key National Archives codified and Knuth TAOCP vol. 3
    §6 documents) as a pure Catalyst expression — the fuzzy-name
    sibling of the SymSpell edit-distance family in ``index/query.py``.

    Exact rule set: (1) letters only, uppercased; (2) consonants map
    to digit classes (BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6), vowels
    AEIOUY→0, H/W are CODING-TRANSPARENT (equal codes separated only
    by H/W collapse — implemented by deleting the 7 sentinel BEFORE
    the adjacent-run collapse, while vowels' 0s survive to that point
    and keep codes apart); (3) drop the leading code when it repeats
    the first letter's class; (4) drop vowel markers, pad/truncate to
    LETTER + 3 digits.  No backreferences (RE2-safe: per-digit
    ``d{2,}`` collapses), so the same expressions run in DuckDB.
    Empty/non-alphabetic input yields NULL."""
    c = F.col(col) if isinstance(col, str) else col
    up = F.upper(F.regexp_replace(c, "[^A-Za-z]", ""))
    m = F.translate(up, _SOUNDEX_ALPHA, _SOUNDEX_CODES)
    collapsed = F.regexp_replace(m, "7", "")
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, d + "{2,}", d)
    first = F.substring(up, 1, 1)
    fcode = F.translate(first, _SOUNDEX_ALPHA, _SOUNDEX_CODES)
    tail = F.when(
        F.substring(collapsed, 1, 1) == fcode,
        F.substring(collapsed, 2, F.length(collapsed)),
    ).otherwise(collapsed)
    digits = F.regexp_replace(tail, "0", "")
    return F.when(
        up == "", F.lit(None).cast("string")
    ).otherwise(F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0")))
