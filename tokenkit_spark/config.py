"""Analyzer configuration: a frozen dataclass mirroring the reference's
``TokenizerConfig`` (reference: ext/tokenkit/src/config.rs:4-37) plus the
builder defaults and validation of the Ruby layer
(lib/tokenkit/config_builder.rb:13-23, 64-88; ext/tokenkit/src/lib.rs:269-313).

The config is hashable/frozen so executors can memoize one compiled
analyzer per distinct config (the Spark analog of the reference's global
tokenizer cache, ext/tokenkit/src/lib.rs:12-44).
"""

from __future__ import annotations

import dataclasses
import re as _stdlib_re
from dataclasses import dataclass, field

import regex

STRATEGIES = frozenset(
    {
        "unicode",
        "whitespace",
        "pattern",
        "sentence",
        "grapheme",
        "keyword",
        "edge_ngram",
        "ngram",
        "path_hierarchy",
        "url_email",
        "char_group",
        "letter",
        "lowercase",
    }
)

# Builder defaults — lib/tokenkit/config_builder.rb:13-23
DEFAULT_MIN_GRAM = 2
DEFAULT_MAX_GRAM = 10
DEFAULT_DELIMITER = "/"
DEFAULT_SPLIT_ON_CHARS = " \t\n\r"


class ConfigError(ValueError):
    """Invalid analyzer configuration (reference: error.rs:4-33)."""


def to_inline_pattern(pattern) -> str:
    """Serialize a regex to the wire format the reference uses: an inline
    ``(?imx)``-prefixed pattern string (lib/tokenkit/regex_converter.rb:11-31).

    Accepts str (passed through), or a compiled ``re`` / ``regex`` pattern,
    whose IGNORECASE / MULTILINE / VERBOSE flags become inline flags.
    """
    if isinstance(pattern, str):
        return pattern
    pat = getattr(pattern, "pattern", None)
    flags_val = getattr(pattern, "flags", 0)
    if pat is None:
        raise ConfigError(f"Not a regex pattern: {pattern!r}")
    flags = ""
    if flags_val & _stdlib_re.IGNORECASE:
        flags += "i"
    if flags_val & _stdlib_re.MULTILINE:
        flags += "m"
    if flags_val & _stdlib_re.VERBOSE:
        flags += "x"
    if flags:
        return f"(?{flags}){pat}"
    return pat


def compile_pattern(pattern: str) -> "regex.Pattern":
    """Compile a wire-format pattern string with the ``regex`` module.

    Raises ConfigError on an invalid pattern (mirrors validate_config,
    ext/tokenkit/src/lib.rs:294-311).
    """
    try:
        return regex.compile(pattern, regex.V0)
    except regex.error as e:  # pragma: no cover - message text varies
        raise ConfigError(f"Invalid regex pattern '{pattern}': {e}") from e


@dataclass(frozen=True)
class AnalyzerConfig:
    """Frozen analyzer config. Strategy-specific fields carry builder
    defaults exactly as lib/tokenkit/config_builder.rb:13-23."""

    strategy: str = "unicode"
    lowercase: bool = True
    remove_punctuation: bool = False
    preserve_patterns: tuple[str, ...] = field(default_factory=tuple)
    # pattern strategy
    regex: str | None = None
    # grapheme strategy
    extended: bool = True
    # edge_ngram / ngram strategies
    min_gram: int = DEFAULT_MIN_GRAM
    max_gram: int = DEFAULT_MAX_GRAM
    # path_hierarchy strategy
    delimiter: str = DEFAULT_DELIMITER
    # char_group strategy
    split_on_chars: str = DEFAULT_SPLIT_ON_CHARS

    def __post_init__(self):
        # normalize preserve_patterns: accept list / compiled patterns
        pats = tuple(to_inline_pattern(p) for p in self.preserve_patterns)
        object.__setattr__(self, "preserve_patterns", pats)
        if self.regex is not None and not isinstance(self.regex, str):
            object.__setattr__(self, "regex", to_inline_pattern(self.regex))
        self.validate()

    def validate(self) -> None:
        """Mirror validate! (config_builder.rb:64-88) and validate_config
        (lib.rs:269-313)."""
        if self.strategy not in STRATEGIES:
            raise ConfigError(
                f"Invalid strategy: {self.strategy}. Valid strategies are: "
                + ", ".join(sorted(STRATEGIES))
            )
        if self.strategy == "pattern":
            if not self.regex:
                raise ConfigError("Pattern strategy requires a regex")
            compile_pattern(self.regex)
        if self.strategy in ("edge_ngram", "ngram"):
            if self.min_gram < 1:
                raise ConfigError(f"min_gram must be positive, got {self.min_gram}")
            if self.max_gram < self.min_gram:
                raise ConfigError(
                    f"max_gram ({self.max_gram}) must be >= min_gram ({self.min_gram})"
                )
        if self.strategy == "path_hierarchy":
            if not self.delimiter:
                raise ConfigError("Path hierarchy requires a delimiter")
        if self.strategy == "lowercase" and not self.lowercase:
            # the reference warns and ignores the flag
            # (lib/tokenkit.rb lowercase-strategy guard;
            # spec/lowercase_tokenizer_spec.rb:17-27)
            import warnings

            warnings.warn(
                "Warning: The lowercase strategy always lowercases text; "
                "lowercase=False is ignored",
                stacklevel=3,
            )
        for p in self.preserve_patterns:
            compile_pattern(p)

    def replace(self, **kwargs) -> "AnalyzerConfig":
        """Per-call override merge (lib/tokenkit.rb:285-317). Accepts the
        reference's both spellings of the grapheme flag: ``extended``
        (per-call, lib/tokenkit.rb:296) and ``grapheme_extended``
        (config builder, config_builder.rb:21)."""
        if "preserve" in kwargs:
            kwargs["preserve_patterns"] = kwargs.pop("preserve")
        if "grapheme_extended" in kwargs:
            kwargs["extended"] = kwargs.pop("grapheme_extended")
        return dataclasses.replace(self, **kwargs)

    def key(self) -> tuple:
        """Hashable cache key for per-executor analyzer memoization."""
        return dataclasses.astuple(self)

    def to_hash(self) -> dict:
        """Wire-format config hash mirroring the reference's introspection
        surface (lib/tokenkit/configuration.rb:44-135,
        config_builder.rb:90-114): strategy-specific keys appear only for
        their strategy; regexes are already inline-flag strings."""
        h = {
            "strategy": self.strategy,
            "lowercase": self.lowercase,
            "remove_punctuation": self.remove_punctuation,
            "preserve_patterns": list(self.preserve_patterns),
        }
        if self.strategy == "pattern":
            h["regex"] = self.regex
        if self.strategy == "grapheme":
            h["extended"] = self.extended
        if self.strategy in ("edge_ngram", "ngram"):
            h["min_gram"] = self.min_gram
            h["max_gram"] = self.max_gram
        if self.strategy == "path_hierarchy":
            h["delimiter"] = self.delimiter
        if self.strategy == "char_group":
            h["split_on_chars"] = self.split_on_chars
        return h


# Strategy predicates — the Ruby layer's `unicode?` .. `lowercase?`
# introspection methods (lib/tokenkit/config_builder.rb:118-208) become
# `config.is_unicode` .. `config.is_lowercase` properties.
for _s in STRATEGIES:
    setattr(
        AnalyzerConfig,
        f"is_{_s}",
        property(lambda self, _s=_s: self.strategy == _s),
    )


DEFAULTS = AnalyzerConfig()
