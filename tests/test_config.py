"""Config introspection surface: wire-format hash, strategy predicates,
per-call override merge (reference: lib/tokenkit/configuration.rb:44-135,
config_builder.rb:90-208, lib/tokenkit.rb:285-317)."""

import re

import pytest

from tokenkit_spark import AnalyzerConfig, ConfigError


def test_to_hash_default():
    h = AnalyzerConfig().to_hash()
    assert h == {
        "strategy": "unicode",
        "lowercase": True,
        "remove_punctuation": False,
        "preserve_patterns": [],
    }


def test_to_hash_strategy_specific_keys():
    assert AnalyzerConfig(strategy="pattern", regex="[a-z]+").to_hash()["regex"] == "[a-z]+"
    h = AnalyzerConfig(strategy="ngram", min_gram=2, max_gram=4).to_hash()
    assert (h["min_gram"], h["max_gram"]) == (2, 4)
    assert AnalyzerConfig(strategy="path_hierarchy", delimiter=".").to_hash()["delimiter"] == "."
    assert AnalyzerConfig(strategy="char_group", split_on_chars="-_").to_hash()[
        "split_on_chars"
    ] == "-_"
    assert AnalyzerConfig(strategy="grapheme", extended=False).to_hash()["extended"] is False
    # no cross-strategy key leakage
    assert "min_gram" not in AnalyzerConfig(strategy="whitespace").to_hash()


def test_predicates():
    cfg = AnalyzerConfig(strategy="edge_ngram")
    assert cfg.is_edge_ngram
    assert not cfg.is_unicode
    assert AnalyzerConfig().is_unicode


def test_compiled_regex_flags_become_inline():
    cfg = AnalyzerConfig(
        strategy="pattern", regex=re.compile(r"[a-z]+\d+", re.IGNORECASE | re.MULTILINE)
    )
    assert cfg.regex == r"(?im)[a-z]+\d+"
    cfg2 = AnalyzerConfig(preserve_patterns=[re.compile("brca1", re.I)])
    assert cfg2.preserve_patterns == ("(?i)brca1",)


def test_replace_accepts_preserve_alias():
    cfg = AnalyzerConfig().replace(preserve=["[A-Z]+"], strategy="whitespace")
    assert cfg.preserve_patterns == ("[A-Z]+",)
    assert cfg.is_whitespace


def test_validation_errors():
    with pytest.raises(ConfigError, match="Invalid strategy"):
        AnalyzerConfig(strategy="nope")
    with pytest.raises(ConfigError, match="requires a regex"):
        AnalyzerConfig(strategy="pattern")
    with pytest.raises(ConfigError, match="min_gram"):
        AnalyzerConfig(strategy="ngram", min_gram=0)
    with pytest.raises(ConfigError, match="max_gram"):
        AnalyzerConfig(strategy="edge_ngram", min_gram=5, max_gram=2)
    with pytest.raises(ConfigError, match="delimiter"):
        AnalyzerConfig(strategy="path_hierarchy", delimiter="")
    with pytest.raises(ConfigError, match="Invalid regex"):
        AnalyzerConfig(strategy="pattern", regex="[unclosed")
