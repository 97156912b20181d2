"""Preserve-patterns engine — the reference's flagship feature.

Algorithm (reference: ext/tokenkit/src/tokenizer/mod.rs:129-203):

1. find all pattern match spans in the ORIGINAL text;
2. if no span matched, return the strategy's raw tokens with NO
   post-processing at all (Quirk 1 — mod.rs:166-168: not even lowercase);
3. merge overlapping spans — sort by (start asc, end desc); the optimized
   variant used by every strategy except url_email extends the current
   span's end only (mod.rs:115-121); the string variant used by url_email
   REPLACES the current span when the new one overlaps and ends later
   (mod.rs:86-95 — Quirk 2);
4. rebuild: gap text before/between/after spans is re-tokenized with a
   plain whitespace splitter (mod.rs:198-203) — NOT the configured
   strategy (char_group passes its own splitter, char_group.rs:49-56) —
   then post-processed (lowercase / remove_punctuation); matched spans are
   emitted verbatim (original case and punctuation).
"""

from __future__ import annotations

import string
from typing import Callable

_ASCII_PUNCT = set(string.punctuation)  # == Rust char::is_ascii_punctuation
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def lower_token(t: str) -> str:
    """Rust ``str::to_lowercase`` analog: per-char, context-insensitive.

    Python's ``str.lower()`` maps final sigma context-sensitively; Rust maps
    Σ→σ unconditionally (char-at-a-time), so guard that one char.
    """
    if "Σ" in t:
        return "".join(c.lower() for c in t)
    return t.lower()


def strip_ascii_punct(t: str) -> str:
    return t.translate(_PUNCT_TABLE)


def post_process(tokens: list[str], lowercase: bool, remove_punctuation: bool) -> list[str]:
    """mod.rs:210-222 — lowercase then ASCII-punctuation strip, dropping
    tokens that become empty."""
    if lowercase:
        tokens = [lower_token(t) for t in tokens]
    if remove_punctuation:
        tokens = [s for s in (strip_ascii_punct(t) for t in tokens) if s]
    return tokens


def merge_spans_extend(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Optimized merge (mod.rs:104-127): overlapping span extends end only."""
    if not spans:
        return spans
    spans = sorted(spans, key=lambda s: (s[0], -s[1]))
    merged = [spans[0]]
    for s in spans[1:]:
        cur = merged[-1]
        if s[0] < cur[1]:
            if s[1] > cur[1]:
                merged[-1] = (cur[0], s[1])
        else:
            merged.append(s)
    return merged


def merge_spans_replace(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """String-variant merge used by url_email (mod.rs:73-99): an overlapping
    span that ends later REPLACES the current one (start moves right)."""
    if not spans:
        return spans
    spans = sorted(spans, key=lambda s: (s[0], -s[1]))
    merged = [spans[0]]
    for s in spans[1:]:
        cur = merged[-1]
        if s[0] < cur[1]:
            if s[1] > cur[1]:
                merged[-1] = s
        else:
            merged.append(s)
    return merged


def tokenize_simple(text: str) -> list[str]:
    """Whitespace gap splitter (mod.rs:198-203)."""
    return text.split()


def apply_preserve_patterns(
    tokens: list[str],
    patterns: list,
    text: str,
    lowercase: bool,
    remove_punctuation: bool,
    gap_tokenizer: Callable[[str], list[str]] = tokenize_simple,
) -> list[str]:
    """mod.rs:144-196. ``patterns`` are compiled regex-module patterns."""
    if not patterns:
        return tokens

    spans: list[tuple[int, int]] = []
    for pat in patterns:
        for m in pat.finditer(text):
            spans.append(m.span())

    if not spans:
        # Quirk 1: configured-but-unmatched patterns skip post-processing
        return tokens

    spans = merge_spans_extend(spans)

    result: list[str] = []
    pos = 0
    for start, end in spans:
        if start > pos:
            gap = gap_tokenizer(text[pos:start])
            result.extend(post_process(gap, lowercase, remove_punctuation))
        result.append(text[start:end])
        pos = end
    if pos < len(text):
        gap = gap_tokenizer(text[pos:])
        result.extend(post_process(gap, lowercase, remove_punctuation))
    return result
