"""UAX-29 text segmentation (words, sentences, graphemes) on the ``regex``
module.

The reference delegates to the Rust ``unicode-segmentation`` crate
(ext/tokenkit/src/tokenizer/unicode.rs:18-34, sentence.rs:60-64,
grapheme.rs:17-24). We re-express the segmentation rules as compiled
``regex``-module patterns (C-speed scanning, no per-char Python loops):

* words: a close UAX-29 WB approximation — letter/digit/underscore runs
  joined across MidLetter/MidNumLet (``'`` ``’`` ``.`` ``:`` ``·``) when a
  word char follows, MidNum (``,``) only between digits; Han/Hiragana one
  word per char; Katakana runs. Matches every fixture in
  spec/unicode_tokenizer_spec.rb and the preserve-pattern suites.
* sentences: break after Sep/CR/LF, or after STerm/ATerm + closers + spaces
  unless the next letter is lowercase (UAX-29 SB8 — keeps "E. coli" whole,
  spec/sentence_tokenizer_spec.rb:104-116). Trailing spaces stay with the
  preceding sentence (spec/sentence_tokenizer_spec.rb:11-15).
* graphemes: the regex module's ``\\X`` is exactly an extended grapheme
  cluster; legacy (extended=False) is exact too — UAX-29 Table 1b removes
  rules GB9a/GB9b from the extended rules, so each \\X cluster is re-split
  before GCB=SpacingMark and after GCB=Prepend (property classes from the
  regex module's own Unicode tables).
"""

from __future__ import annotations

import regex

# --- words -----------------------------------------------------------------

# Word-core chars: letters, marks, decimal digits, connector punctuation,
# excluding the scripts that segment per-char / per-run below.
_AL = r"[[\p{L}\p{M}\p{Nd}\p{Pc}]--[\p{Han}\p{Hiragana}\p{Katakana}]]"
# MidLetter + MidNumLet (UAX-29): apostrophes, period, colon, middle dot.
_MID = r"['’ʼ\.\:·״‧]"

_WORD_RE = regex.compile(
    rf"(?V1)"
    rf"(?:{_AL}+(?:(?:{_MID}|(?<=\p{{Nd}}),(?=\p{{Nd}})){_AL}+)*"
    rf"|\p{{Katakana}}+"
    rf"|[\p{{Han}}\p{{Hiragana}}])"
)


def unicode_words(text: str) -> list[str]:
    """Word-ish segments only, punctuation dropped — the analog of
    unicode-segmentation's ``unicode_words()`` (tokenizer/unicode.rs:19-31)."""
    return _WORD_RE.findall(text)


def unicode_word_spans(text: str) -> list[tuple[int, int]]:
    return [m.span() for m in _WORD_RE.finditer(text)]


# --- sentences ---------------------------------------------------------------

# A sentence runs until: a mandatory break (newline family), or a terminator
# sequence (STerm/ATerm+) followed by optional closers and spaces where the
# next char does NOT continue the sentence (SB8: lowercase letter continues;
# also digits after ATerm continue e.g. "v2.0" has no space so unaffected).
_TERM = r"[\.\!\?…‼‽⁇-⁉！．？。]"
_CLOSE = r"[\"'\)\]\}»’”›»]"
_SEP = r"[\r\n\v\f\x85  ]"

_SENTENCE_RE = regex.compile(
    rf"(?V1)(?s)"
    rf".*?"
    rf"(?:"
    # terminator sequence + closers, then either (a) whitespace consumed and
    # the next char is not a lowercase continuation (SB8), or (b) no
    # whitespace and the next char is not alphanumeric (SB6/SB7: keeps
    # "v2.0", "U.S.A", "example.com" unbroken) nor more terminator/closer
    rf"{_TERM}+{_CLOSE}*"
    rf"(?:(?:[ \t]|{_SEP})+(?!\p{{Ll}})"
    rf"|(?![\p{{L}}\p{{Nd}}])(?!{_TERM})(?!{_CLOSE})(?![ \t])"
    rf")"
    rf"|{_SEP}+"  # mandatory break after separators (SB4)
    rf"|$"
    rf")"
)


def unicode_sentences(text: str) -> list[str]:
    """UAX-29-style sentence segments; trailing spaces kept inside the
    preceding sentence (tokenizer/sentence.rs:60-64 semantics)."""
    out = []
    for m in _SENTENCE_RE.finditer(text):
        s = m.group(0)
        if s:
            out.append(s)
        if m.end() >= len(text):
            break
    return out


# --- graphemes ---------------------------------------------------------------

_GRAPHEME_RE = regex.compile(r"(?V1)\X")

# Legacy clusters (UAX-29 Table 1b) = extended clusters with rules GB9a
# (x SpacingMark) and GB9b (Prepend x) REMOVED. So legacy mode re-splits
# each \X cluster at exactly those two attachment points, using the
# regex module's own Grapheme_Cluster_Break property classes (the same
# tables its \X is built from — no hand-maintained code-point lists):
#   * before a GCB=SpacingMark char (Mc plus U+0E33/U+0EB3 Thai/Lao SARA
#     AM, minus the UAX exception list — the property encodes both).
#   * after a GCB=Prepend char (Arabic number signs, Malayalam reph,
#     Kaithi/Sharada/... signs) — unless the next char is Extend/ZWJ,
#     which still attaches via GB9 in both modes.
_LEGACY_SPLIT_RE = regex.compile(
    r"(?V1)(?=\p{gcb=SpacingMark})"
    r"|(?<=\p{gcb=Prepend})(?!\p{gcb=Extend}|\p{gcb=ZWJ})"
)


def graphemes(text: str, extended: bool = True) -> list[str]:
    """Extended grapheme clusters via ``\\X`` (tokenizer/grapheme.rs:17-24).

    extended=False gives EXACT legacy clusters by removing the two rules
    that distinguish the modes (GB9a SpacingMark, GB9b Prepend) — see
    _LEGACY_SPLIT_RE above; reference lib.rs:159-165 delegates to
    unicode-segmentation's ``graphemes(text, false)`` with the same
    semantics.
    """
    clusters = _GRAPHEME_RE.findall(text)
    if extended:
        return clusters
    out: list[str] = []
    for c in clusters:
        out.extend(p for p in _LEGACY_SPLIT_RE.split(c) if p)
    return out
