"""The 13 tokenization strategies, pure Python, vectorizable.

Semantics re-expressed from the reference's Rust strategies
(ext/tokenkit/src/tokenizer/*.rs — cited per function); NOT a port of its
execution model: strategies here are closures over compiled ``regex``
patterns so a pandas UDF can run them per Arrow batch with zero per-call
setup (the Spark analog of the reference's tokenizer cache,
ext/tokenkit/src/lib.rs:12-44).
"""

from __future__ import annotations

import string
from functools import lru_cache
from typing import Callable

import regex

from ..config import AnalyzerConfig, compile_pattern
from . import segmentation as seg
from .preserve import (
    apply_preserve_patterns,
    lower_token,
    merge_spans_replace,
    post_process,
    strip_ascii_punct,
)

_ALPHA_RUN_RE = regex.compile(r"(?V1)[\p{Alphabetic}]+")

# --- linkify-equivalent URL/email span detection (url_email.rs:26-41) -------
_EMAIL_RE = regex.compile(r"[A-Za-z0-9._%+\-]+@(?:[A-Za-z0-9\-]+\.)+[A-Za-z]{2,}")
_SCHEME_URL_RE = regex.compile(r"[A-Za-z][A-Za-z0-9+.\-]*://[^\s<>]+")
_BARE_DOMAIN_RE = regex.compile(
    r"(?<![\w@.\-])(?:[A-Za-z0-9][A-Za-z0-9\-]*\.)+[A-Za-z]{2,}"
    r"(?::\d+)?(?:/[^\s<>]*)?(?:\?[^\s<>]*)?"
)
_TRIM_TRAILING = set(".,;:!?'\"")
_CLOSERS = {")": "(", "]": "[", "}": "{"}


def _trim_url_end(text: str, start: int, end: int) -> int:
    """Linkify-style trailing trimming: strip sentence punctuation and
    unbalanced closing brackets from the end of a detected span."""
    while end > start:
        ch = text[end - 1]
        if ch in _TRIM_TRAILING:
            end -= 1
        elif ch in _CLOSERS:
            if text.count(_CLOSERS[ch], start, end) < text.count(ch, start, end):
                end -= 1
            else:
                break
        else:
            break
    return end


def find_url_email_spans(text: str) -> list[tuple[int, int]]:
    """URL + email spans, linkify-equivalent (scheme URLs, scheme-less
    domains, emails; fixtures spec/url_email_tokenizer_spec.rb:120-142)."""
    spans: list[tuple[int, int]] = []
    for m in _EMAIL_RE.finditer(text):
        spans.append(m.span())
    for m in _SCHEME_URL_RE.finditer(text):
        s, e = m.span()
        spans.append((s, _trim_url_end(text, s, e)))
    for m in _BARE_DOMAIN_RE.finditer(text):
        s, e = m.span()
        e = _trim_url_end(text, s, e)
        if not any(s0 <= s < e0 or s0 < e <= e0 for s0, e0 in spans):
            spans.append((s, e))
    return spans


class Analyzer:
    """One compiled analyzer per distinct AnalyzerConfig.

    ``tokenize(text)`` matches the reference's ``Tokenizer::tokenize``
    contract (tokenizer/mod.rs:36-38): one UTF-8 string in, ordered token
    list out.
    """

    def __init__(self, config: AnalyzerConfig):
        self.config = config
        self.patterns = [compile_pattern(p) for p in config.preserve_patterns]
        self._fn = self._build()

    # -- public ---------------------------------------------------------
    def tokenize(self, text) -> list[str]:
        if text is None:
            return []
        return self._fn(text)

    # -- shared helpers ---------------------------------------------------
    def _post(self, tokens: list[str]) -> list[str]:
        return post_process(tokens, self.config.lowercase, self.config.remove_punctuation)

    def _preserve_or_post(self, tokens: list[str], text: str, gap_tok=None) -> list[str]:
        if self.patterns:
            return apply_preserve_patterns(
                tokens,
                self.patterns,
                text,
                self.config.lowercase,
                self.config.remove_punctuation,
                gap_tok or (lambda t: t.split()),
            )
        return self._post(tokens)

    # -- strategy builders -------------------------------------------------
    def _build(self) -> Callable[[str], list[str]]:
        return getattr(self, f"_build_{self.config.strategy}")()

    def _build_unicode(self):
        # tokenizer/unicode.rs:18-34
        def fn(text: str) -> list[str]:
            return self._preserve_or_post(seg.unicode_words(text), text)

        return fn

    def _build_whitespace(self):
        # tokenizer/whitespace.rs:17-29
        def fn(text: str) -> list[str]:
            return self._preserve_or_post(text.split(), text)

        return fn

    def _build_pattern(self):
        # tokenizer/pattern.rs:24-36 — tokens are the regex MATCHES
        pat = compile_pattern(self.config.regex)

        def fn(text: str) -> list[str]:
            return self._preserve_or_post(pat.findall(text), text)

        return fn

    def _build_letter(self):
        # tokenizer/letter.rs:17-39 — runs of Unicode-alphabetic chars
        def fn(text: str) -> list[str]:
            return self._preserve_or_post(_ALPHA_RUN_RE.findall(text), text)

        return fn

    def _build_lowercase(self):
        # tokenizer/lowercase.rs:17-49 — letter runs lowercased per-char;
        # ALWAYS lowercases regardless of config.lowercase; with patterns,
        # forces lowercase=True for the gap tokens.
        def fn(text: str) -> list[str]:
            tokens = [lower_token(t) for t in _ALPHA_RUN_RE.findall(text)]
            if self.patterns:
                return apply_preserve_patterns(
                    tokens, self.patterns, text, True, self.config.remove_punctuation
                )
            return tokens

        return fn

    def _build_keyword(self):
        # tokenizer/keyword.rs:15-23 — trimmed whole input; no preserve path
        def fn(text: str) -> list[str]:
            t = text.strip()
            if not t:
                return []
            return self._post([t])

        return fn

    def _build_grapheme(self):
        # tokenizer/grapheme.rs:17-24; no preserve path
        extended = self.config.extended

        def fn(text: str) -> list[str]:
            return self._post(seg.graphemes(text, extended))

        return fn

    def _build_sentence(self):
        # tokenizer/sentence.rs:17-88 — preserve affects CASE only, and only
        # when lowercase=true (Quirk 3)
        def rewrite_case(sentence: str) -> str:
            spans: list[tuple[int, int]] = []
            for p in self.patterns:
                spans.extend(m.span() for m in p.finditer(sentence))
            if not spans:
                return sentence
            # sentence.rs:40-76: sorted but NOT merged; pos = max(end, pos)
            spans.sort(key=lambda s: (s[0], -s[1]))
            out = []
            pos = 0
            for start, end in spans:
                if start > pos:
                    out.append(lower_token(sentence[pos:start]))
                out.append(sentence[start:end])
                pos = max(end, pos)
            if pos < len(sentence):
                out.append(lower_token(sentence[pos:]))
            return "".join(out)

        def fn(text: str) -> list[str]:
            sentences = seg.unicode_sentences(text)
            if self.patterns and self.config.lowercase:
                sentences = [rewrite_case(s) for s in sentences]
                if self.config.remove_punctuation:
                    sentences = [s for s in (strip_ascii_punct(x) for x in sentences) if s]
                return sentences
            return self._post(sentences)

        return fn

    def _build_edge_ngram(self):
        # tokenizer/edge_ngram.rs:19-71 — per whitespace word: punct-strip
        # first, prefixes in CODE POINTS, lowercase after generation
        min_g = max(1, self.config.min_gram)
        max_g = max(min_g, self.config.max_gram)

        def fn(text: str) -> list[str]:
            out: list[str] = []
            for word in text.split():
                if self.config.remove_punctuation:
                    word = strip_ascii_punct(word)
                if not word:
                    continue
                top = min(max_g, len(word))
                out.extend(word[:n] for n in range(min_g, top + 1))
            if self.config.lowercase:
                out = [lower_token(t) for t in out]
            return out

        return fn

    def _build_ngram(self):
        # tokenizer/ngram.rs:23-78 — all sliding windows, SIZE-MAJOR order
        min_g = max(1, self.config.min_gram)
        max_g = max(min_g, self.config.max_gram)

        def fn(text: str) -> list[str]:
            out: list[str] = []
            for word in text.split():
                if self.config.remove_punctuation:
                    word = strip_ascii_punct(word)
                if not word:
                    continue
                L = len(word)
                for size in range(min_g, min(max_g, L) + 1):
                    out.extend(word[i : i + size] for i in range(L - size + 1))
            if self.config.lowercase:
                out = [lower_token(t) for t in out]
            return out

        return fn

    def _build_char_group(self):
        # tokenizer/char_group.rs — split on a char set; empty set ⇒ whole
        # text as one token; gap re-tokenization uses THIS splitter
        chars = set(self.config.split_on_chars)
        if chars:
            split_re = regex.compile("[" + "".join(regex.escape(c) for c in chars) + "]")

            def split_fn(t: str) -> list[str]:
                return [p for p in split_re.split(t) if p]

        else:

            def split_fn(t: str) -> list[str]:
                return [t] if t else []

        def fn(text: str) -> list[str]:
            return self._preserve_or_post(split_fn(text), text, gap_tok=split_fn)

        return fn

    def _build_path_hierarchy(self):
        # tokenizer/path_hierarchy.rs — cumulative prefixes; bespoke
        # preserve/lowercase/punct logic
        delim = self.config.delimiter

        def hierarchy(path: str) -> list[str]:
            # path_hierarchy.rs:17-40
            parts = path.split(delim)
            leading = path.startswith(delim)
            out: list[str] = []
            cur = ""
            for part in parts:
                if not part:
                    continue
                if cur:
                    cur += delim
                elif leading:
                    cur += delim
                cur += part
                out.append(cur)
            return out

        def with_patterns(text: str) -> list[str]:
            # path_hierarchy.rs:42-144
            all_tokens = hierarchy(text)
            preserved = [
                t
                for t in all_tokens
                if any((m := p.search(t)) and m.group(0) == t for p in self.patterns)
            ]
            result: list[str] = []
            for token in all_tokens:
                apply_lower = self.config.lowercase
                if token in preserved:
                    include = True
                    apply_lower = False
                elif any(token.startswith(pv) and len(token) > len(pv) for pv in preserved):
                    include = True
                else:
                    include = not any(pv.startswith(token) and pv != token for pv in preserved)
                if not include:
                    continue
                if apply_lower and token not in preserved:
                    leading = token.startswith(delim)
                    pieces = token.split(delim)
                    buf = ""
                    for i, part in enumerate(pieces):
                        if not part:
                            if i == 0 and leading:
                                buf += delim
                            continue
                        if (i > 0 or (i == 0 and leading)) and buf and not buf.endswith(delim):
                            buf += delim
                        if any(p.search(part) for p in self.patterns):
                            buf += part
                        else:
                            buf += lower_token(part)
                    result.append(buf)
                else:
                    result.append(token)
            if self.config.remove_punctuation:
                # path_hierarchy.rs:158-180 — keep delimiter chars
                cleaned = []
                for token in result:
                    parts2 = []
                    for part in token.split(delim):
                        if not part:
                            parts2.append("")
                        elif any(p.search(part) for p in self.patterns):
                            parts2.append(part)
                        else:
                            parts2.append(
                                "".join(
                                    c
                                    for c in part
                                    if c not in string.punctuation or c in delim
                                )
                            )
                    joined = delim.join(parts2)
                    if joined and joined != delim:
                        cleaned.append(joined)
                result = cleaned
            return result

        def fn(text: str) -> list[str]:
            t = text.strip()
            if not t:
                return []
            if self.patterns:
                return with_patterns(t)
            tokens = hierarchy(t)
            # post_process_with_preserved keeps delimiter chars (mod.rs:225-253)
            if self.config.lowercase:
                tokens = [lower_token(x) for x in tokens]
            if self.config.remove_punctuation:
                tokens = [
                    s
                    for s in (
                        "".join(c for c in x if c not in string.punctuation or c in delim)
                        for x in tokens
                    )
                    if s
                ]
            return tokens

        return fn

    def _build_url_email(self):
        # tokenizer/url_email.rs — URL/email spans + preserve spans, merged
        # with the REPLACE variant (Quirk 2); gaps via unicode_words
        def fn(text: str) -> list[str]:
            spans = find_url_email_spans(text)
            for p in self.patterns:
                spans.extend(m.span() for m in p.finditer(text))
            spans = merge_spans_replace(spans)
            if not spans:
                return self._post(seg.unicode_words(text))
            result: list[str] = []
            pos = 0
            for start, end in spans:
                if start > pos:
                    result.extend(self._post(seg.unicode_words(text[pos:start])))
                span_text = text[start:end]
                if self.config.lowercase and not any(p.search(span_text) for p in self.patterns):
                    span_text = lower_token(span_text)
                result.append(span_text)
                pos = end
            if pos < len(text):
                result.extend(self._post(seg.unicode_words(text[pos:])))
            return result

        return fn


@lru_cache(maxsize=64)
def _analyzer_for_key(key: tuple) -> Analyzer:
    return Analyzer(AnalyzerConfig(*key))


def get_analyzer(config: AnalyzerConfig) -> Analyzer:
    """Per-process memoized analyzer — the Spark-executor analog of the
    reference's mutex-guarded tokenizer cache (ext/tokenkit/src/lib.rs:12-44)."""
    return _analyzer_for_key(config.key())


_global_config = AnalyzerConfig()


def configure(**kwargs) -> AnalyzerConfig:
    """Merge settings into the GLOBAL default config and validate —
    mirrors ``TokenKit.configure`` (lib/tokenkit.rb:213-241), whose
    builder starts from the *current* global config
    (lib/tokenkit/config_compat.rb:17-19). Raises ConfigError without
    mutating the global on invalid input."""
    global _global_config
    _global_config = _global_config.replace(**kwargs)  # replace() validates
    return _global_config


def reset() -> AnalyzerConfig:
    """Restore factory defaults — ``TokenKit.reset!`` (lib/tokenkit.rb:255-281)."""
    global _global_config
    _global_config = AnalyzerConfig()
    return _global_config


def current_config() -> AnalyzerConfig:
    """The global default config — ``TokenKit.config`` introspection."""
    return _global_config


def tokenize(text: str, config: AnalyzerConfig | None = None, **overrides) -> list[str]:
    """Module-level convenience mirroring ``TokenKit.tokenize``
    (lib/tokenkit.rb:138-147): overrides merge into the global config
    WITHOUT mutating it (per-call isolation,
    spec/per_call_options_spec.rb:262-386)."""
    if text is None:
        # the reference raises TypeError for nil text
        # (spec/error_handling_spec.rb:64-66); the Spark UDF path calls
        # Analyzer.tokenize directly, which stays null-safe for null cells
        raise TypeError("text must be a string, not None")
    cfg = config or _global_config
    if overrides:
        cfg = cfg.replace(**overrides)
    return get_analyzer(cfg).tokenize(text)
