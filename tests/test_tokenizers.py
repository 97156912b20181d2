"""Tokenizer conformance fixtures ported from the reference RSpec suite
(/root/reference/spec/*.rb — cited per case). Pure-Python layer; the same
cases run through the Spark pandas UDF in test_tokenizers_spark.py."""

import pytest

import tokenkit_spark as tk
from tokenkit_spark import AnalyzerConfig, ConfigError, tokenize

U = {"strategy": "unicode"}


def tok(text, **cfg):
    return tokenize(text, **cfg)


# ---- unicode (spec/unicode_tokenizer_spec.rb) -------------------------------

class TestUnicode:
    def test_basic(self):
        assert tok("Hello world") == ["hello", "world"]

    def test_accented(self):
        assert tok("café résumé naïve") == ["café", "résumé", "naïve"]

    def test_asian_scripts(self):
        assert "world" in tok("こんにちは world")

    def test_apostrophes(self):
        assert tok("can't won't") == ["can't", "won't"]

    def test_hyphens_split(self):
        assert tok("anti-CD3") == ["anti", "cd3"]

    def test_alnum_joined(self):
        assert tok("test123done") == ["test123done"]

    def test_preserve_match(self):
        t = tok("Anti-CD3 antibody 100ug dose", preserve=[r"(?i)\d+ug", r"(?i)anti-cd\d+"])
        assert "100ug" in t and "antibody" in t and "Anti-CD3" in t

    def test_no_lowercase(self):
        assert tok("Hello World", lowercase=False) == ["Hello", "World"]


# ---- whitespace (spec/whitespace_tokenizer_spec.rb) -------------------------

class TestWhitespace:
    def test_basic(self):
        assert tok("Hello world test", strategy="whitespace") == ["hello", "world", "test"]

    def test_punct_kept(self):
        assert tok("Hello, world!", strategy="whitespace") == ["hello,", "world!"]

    def test_remove_punct(self):
        assert tok("Hello, world!", strategy="whitespace", remove_punctuation=True) == [
            "hello",
            "world",
        ]

    def test_preserve(self):
        t = tok(
            "Patient has BRCA1 and TP53 mutations",
            strategy="whitespace",
            preserve=[r"BRCA\d+", "TP53"],
        )
        assert t == ["patient", "has", "BRCA1", "and", "TP53", "mutations"]


# ---- pattern (spec/pattern_tokenizer_spec.rb) -------------------------------

class TestPattern:
    def test_word_matches(self):
        assert tok("Hello, world! Test.", strategy="pattern", regex=r"\w+") == [
            "hello",
            "world",
            "test",
        ]

    def test_requires_regex(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="pattern")

    def test_invalid_regex(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="pattern", regex="[invalid(")


# ---- sentence (spec/sentence_tokenizer_spec.rb) -----------------------------

class TestSentence:
    def test_basic(self):
        t = tok("Hello world! How are you? I am fine.", strategy="sentence", lowercase=False)
        assert t == ["Hello world! ", "How are you? ", "I am fine."]

    def test_multi_punct(self):
        t = tok("Really?! Yes... Maybe.", strategy="sentence", lowercase=False)
        assert t == ["Really?! ", "Yes... ", "Maybe."]

    def test_periods(self):
        t = tok(
            "First sentence. Second sentence. Third sentence.",
            strategy="sentence",
            lowercase=False,
        )
        assert len(t) == 3

    def test_newlines(self):
        t = tok("First sentence.\nSecond sentence.", strategy="sentence", lowercase=False)
        assert len(t) == 2

    def test_empty(self):
        assert tok("", strategy="sentence", lowercase=False) == []

    def test_no_punct(self):
        assert tok("Hello world", strategy="sentence", lowercase=False) == ["Hello world"]

    def test_lowercase(self):
        t = tok("Hello World! How Are You?", strategy="sentence", lowercase=True)
        assert t == ["hello world! ", "how are you?"]

    def test_preserve_scientific(self):
        t = tok(
            "The study found E. coli in the sample. H. pylori was also detected.",
            strategy="sentence",
            lowercase=True,
            preserve=[r"E\. coli", r"H\. pylori"],
        )
        assert t == [
            "the study found E. coli in the sample. ",
            "H. pylori was also detected.",
        ]

    def test_preserve_genes(self):
        t = tok(
            "BRCA1 mutations are significant. TP53 also plays a role.",
            strategy="sentence",
            lowercase=True,
            preserve=[r"BRCA\d+", r"TP\d+"],
        )
        assert t == ["BRCA1 mutations are significant. ", "TP53 also plays a role."]

    def test_preserve_product_codes(self):
        t = tok(
            "Order SKU-12345 today. Reference REF-ABC123 for details.",
            strategy="sentence",
            lowercase=True,
            preserve=[r"SKU-\d+", r"REF-[A-Z0-9]+"],
        )
        assert t == ["order SKU-12345 today. ", "reference REF-ABC123 for details."]

    def test_preserve_multi(self):
        t = tok(
            "USA released v2.0 guidelines. COVID-19 protocols updated.",
            strategy="sentence",
            lowercase=True,
            preserve=["USA", r"v\d+\.\d+", "COVID-19"],
        )
        assert t == ["USA released v2.0 guidelines. ", "COVID-19 protocols updated."]

    def test_preserve_noop_without_lowercase(self):
        t = tok(
            "This is a TEST sentence. Another TEST here.",
            strategy="sentence",
            lowercase=False,
            preserve=["TEST"],
        )
        assert t == ["This is a TEST sentence. ", "Another TEST here."]

    def test_remove_punctuation(self):  # sentence_tokenizer_spec:70
        import re

        t = tok(
            "Hello, world! How are you?",
            strategy="sentence",
            lowercase=False,
            remove_punctuation=True,
        )
        assert all(not re.search(r"[!-/:-@\[-`{-~]", s) for s in t)

    def test_preserve_acronyms(self):  # sentence_tokenizer_spec:78
        t = tok(
            "The FDA approved the drug. MIT has great programs.",
            strategy="sentence",
            lowercase=True,
            preserve=[r"[A-Z]{2,}"],
        )
        assert "FDA" in t[0] and "MIT" in t[1]

    def test_preserve_measurements(self):  # sentence_tokenizer_spec:117
        t = tok(
            "Administer 100mg twice daily. Maximum dose is 5ml per hour.",
            strategy="sentence",
            lowercase=True,
            preserve=[r"\d+(mg|kg|ml|µg)"],
        )
        assert "100mg" in t[0] and "5ml" in t[1]


# ---- grapheme (spec/grapheme_tokenizer_spec.rb) -----------------------------

class TestGrapheme:
    def test_simple(self):
        assert tok("abc", strategy="grapheme", lowercase=False) == ["a", "b", "c"]

    def test_emoji(self):
        assert tok("👋🌍", strategy="grapheme", lowercase=False) == ["👋", "🌍"]

    def test_zwj_family(self):
        t = tok("👨‍👩‍👧‍👦", strategy="grapheme", lowercase=False)
        assert t == ["👨‍👩‍👧‍👦"]

    def test_combining(self):
        # é as e + U+0301 stays one cluster
        assert tok("éx", strategy="grapheme", lowercase=False) == ["é", "x"]


    def test_legacy_mode_exact(self):
        """Legacy clusters (UAX-29 Table 1b) = extended minus GB9a
        (SpacingMark attaches) and GB9b (Prepend attaches) — matching
        unicode-segmentation's graphemes(text, false), which the
        reference's extended=False mode delegates to (lib.rs:159-165)."""
        from tokenkit_spark.analyzers.segmentation import graphemes

        # GB9a removed: Devanagari KA + vowel sign II (Mc) splits
        assert graphemes("की", extended=False) == ["क", "ी"]
        assert graphemes("की", extended=True) == ["की"]
        # Thai SARA AM (U+0E33, gc=Lo but GCB=SpacingMark) splits
        assert graphemes("กำ", extended=False) == ["ก", "ำ"]
        # GB9b removed: Malayalam dot reph (U+0D4E, Prepend) splits from
        # the following consonant — the code point the old hand-rolled
        # Prepend list missed
        assert graphemes("ൎക", extended=False) == ["ൎ", "ക"]
        assert graphemes("ൎക", extended=True) == ["ൎക"]
        # Arabic number sign (Prepend) splits from following digits
        assert graphemes("؀1", extended=False) == ["؀", "1"]
        # non-spacing marks (GB9) still attach in BOTH modes
        assert graphemes("éx", extended=False) == ["é", "x"]
        # ZWJ emoji families survive legacy mode
        fam = "\U0001F468‍\U0001F469‍\U0001F467"
        assert graphemes(fam, extended=False) == [fam]
        # Mc exception list (GCB=Other): already separate in both modes
        assert graphemes("ကါ", extended=True) == ["က", "ါ"]
        assert graphemes("ကါ", extended=False) == ["က", "ါ"]


# ---- keyword (spec/keyword_tokenizer_spec.rb) -------------------------------

class TestKeyword:
    def test_whole(self):
        assert tok("product-sku-123", strategy="keyword", lowercase=False) == [
            "product-sku-123"
        ]

    def test_trimmed(self):
        assert tok("  product-sku-123  ", strategy="keyword", lowercase=False) == [
            "product-sku-123"
        ]

    def test_empty(self):
        assert tok("   ", strategy="keyword") == []

    def test_lowercase(self):
        assert tok("Product-SKU", strategy="keyword", lowercase=True) == ["product-sku"]


# ---- edge_ngram (spec/edge_ngram_tokenizer_spec.rb) -------------------------

class TestEdgeNgram:
    def test_coffee(self):
        assert tok("coffee", strategy="edge_ngram", min_gram=2, max_gram=10) == [
            "co",
            "cof",
            "coff",
            "coffe",
            "coffee",
        ]

    def test_code_points(self):
        assert tok("café", strategy="edge_ngram", min_gram=2, max_gram=4) == [
            "ca",
            "caf",
            "café",
        ]

    def test_multi_word(self):
        assert tok("hi yo", strategy="edge_ngram", min_gram=1, max_gram=2) == [
            "h",
            "hi",
            "y",
            "yo",
        ]

    def test_invalid(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="edge_ngram", min_gram=0, max_gram=5)
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="edge_ngram", min_gram=5, max_gram=2)


# ---- ngram (spec/ngram_tokenizer_spec.rb) -----------------------------------

class TestNgram:
    def test_size_major(self):
        assert tok("test", strategy="ngram", min_gram=2, max_gram=3) == [
            "te",
            "es",
            "st",
            "tes",
            "est",
        ]

    def test_invalid(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="ngram", min_gram=0, max_gram=3)


# ---- path_hierarchy (spec/path_hierarchy_tokenizer_spec.rb) -----------------

class TestPathHierarchy:
    def test_unix_path(self):
        assert tok(
            "/usr/local/bin/ruby", strategy="path_hierarchy", lowercase=False
        ) == ["/usr", "/usr/local", "/usr/local/bin", "/usr/local/bin/ruby"]

    def test_relative(self):
        assert tok("a/b/c", strategy="path_hierarchy", lowercase=False) == [
            "a",
            "a/b",
            "a/b/c",
        ]

    def test_remove_punct_keeps_delim(self):
        assert tok(
            "path/to/file.txt",
            strategy="path_hierarchy",
            lowercase=False,
            remove_punctuation=True,
        ) == ["path", "path/to", "path/to/filetxt"]

    def test_custom_delimiter(self):
        assert tok(
            "com.example.app", strategy="path_hierarchy", delimiter=".", lowercase=False
        ) == ["com", "com.example", "com.example.app"]

    def test_empty_delimiter_invalid(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="path_hierarchy", delimiter="")


# ---- url_email (spec/url_email_tokenizer_spec.rb) ---------------------------

class TestUrlEmail:
    def test_email(self):
        t = tok("Contact support@example.com for help", strategy="url_email")
        assert "support@example.com" in t
        assert "contact" in t and "for" in t and "help" in t

    def test_email_start(self):
        assert tok("admin@test.com sent you a message", strategy="url_email") == [
            "admin@test.com",
            "sent",
            "you",
            "a",
            "message",
        ]

    def test_url_end(self):
        assert tok("Visit us at https://example.com", strategy="url_email") == [
            "visit",
            "us",
            "at",
            "https://example.com",
        ]

    def test_plain_text(self):
        assert tok("Hello world this is plain text", strategy="url_email") == [
            "hello",
            "world",
            "this",
            "is",
            "plain",
            "text",
        ]

    def test_lowercase_urls(self):
        assert "https://example.com" in tok("Visit HTTPS://EXAMPLE.COM", strategy="url_email")

    def test_lowercase_email(self):
        t = tok("Contact SUPPORT@EXAMPLE.COM please", strategy="url_email")
        assert "support@example.com" in t

    def test_no_lowercase(self):
        t = tok("Contact SUPPORT@EXAMPLE.COM Please", strategy="url_email", lowercase=False)
        assert "SUPPORT@EXAMPLE.COM" in t and "Contact" in t and "Please" in t

    def test_url_with_path(self):
        t = tok("Check https://example.com/products/laptops for details", strategy="url_email")
        assert "https://example.com/products/laptops" in t

    def test_url_query(self):
        t = tok("Search https://example.com/search?q=test", strategy="url_email")
        assert "https://example.com/search?q=test" in t

    def test_url_port(self):
        t = tok("Connect to http://localhost:3000", strategy="url_email")
        assert "http://localhost:3000" in t

    def test_schemeless(self):
        t = tok("Visit example.com for details", strategy="url_email")
        assert "example.com" in t and "visit" in t

    def test_parens(self):
        t = tok("See docs (https://example.com) here", strategy="url_email")
        assert "https://example.com" in t and "see" in t and "here" in t

    def test_punct_not_removed_from_urls(self):
        t = tok(
            "Visit https://example.com or email test@example.com today!",
            strategy="url_email",
            remove_punctuation=True,
        )
        assert "https://example.com" in t and "test@example.com" in t and "today" in t

    def test_preserve_alongside(self):
        t = tok(
            "TICKET-123 email support@example.com about SKU-456",
            strategy="url_email",
            preserve=[r"TICKET-\d+", r"SKU-\d+"],
        )
        assert t == ["TICKET-123", "email", "support@example.com", "about", "SKU-456"]

    def test_preserve_overlap_dedup(self):
        t = tok(
            "Contact support@example.com today",
            strategy="url_email",
            preserve=[r"support@example\.com"],
        )
        assert t == ["contact", "support@example.com", "today"]

    def test_preserve_measurements(self):
        t = tok(
            "Upload 100MB to https://upload.example.com or email admin@example.com",
            strategy="url_email",
            preserve=[r"(?i)\d+(GB|MB|KB)"],
        )
        assert t == [
            "upload",
            "100MB",
            "to",
            "https://upload.example.com",
            "or",
            "email",
            "admin@example.com",
        ]

    def test_hashtags_mentions(self):
        t = tok(
            "#News @User check https://example.com",
            strategy="url_email",
            preserve=[r"#\w+", r"@\w+"],
        )
        assert t == ["#News", "@User", "check", "https://example.com"]


# ---- char_group (spec/char_group_tokenizer_spec.rb) -------------------------

class TestCharGroup:
    def test_csv(self):
        assert tok(
            "John Doe,30,Software Engineer",
            strategy="char_group",
            split_on_chars=",",
            lowercase=False,
        ) == ["John Doe", "30", "Software Engineer"]

    def test_colon(self):
        assert tok("a:b:c", strategy="char_group", split_on_chars=":", lowercase=False) == [
            "a",
            "b",
            "c",
        ]

    def test_empty_split_chars(self):
        assert tok(
            "hello world", strategy="char_group", split_on_chars="", lowercase=False
        ) == ["hello world"]

    def test_duplicates_collapse(self):
        assert tok("a,b,c", strategy="char_group", split_on_chars=",,", lowercase=False) == [
            "a",
            "b",
            "c",
        ]

    def test_unicode_split(self):
        assert tok(
            "北京、上海、深圳", strategy="char_group", split_on_chars="、", lowercase=False
        ) == ["北京", "上海", "深圳"]

    def test_mixed_separators(self):
        assert tok(
            "item1,item2、item3;item4",
            strategy="char_group",
            split_on_chars=",、;",
            lowercase=False,
        ) == ["item1", "item2", "item3", "item4"]


# ---- letter (spec/letter_tokenizer_spec.rb) ---------------------------------

class TestLetter:
    def test_splits_on_non_letters(self):
        assert tok("test123done", strategy="letter") == ["test", "done"]

    def test_apostrophe_splits(self):
        assert tok("can't", strategy="letter") == ["can", "t"]

    def test_accents_kept(self):
        assert tok("café", strategy="letter") == ["café"]


# ---- lowercase (spec/lowercase_tokenizer_spec.rb) ---------------------------

class TestLowercase:
    def test_always_lowercases(self):
        assert tok("HELLO World", strategy="lowercase", lowercase=False) == [
            "hello",
            "world",
        ]

    def test_turkish_i(self):
        # İ (U+0130) lowercases to i + combining dot (2 code points)
        assert tok("İSTANBUL", strategy="lowercase") == ["i̇stanbul"]

    def test_preserve(self):
        t = tok(
            "The FDA and NIH study", strategy="lowercase", preserve=[r"[A-Z]{2,}"]
        )
        assert t == ["the", "FDA", "and", "NIH", "study"]


# ---- preserve patterns cross-cutting (spec/preserve_patterns*.rb) -----------

class TestPreservePatterns:
    def test_boundaries(self):
        assert tok("100mg daily dose", preserve=[r"(?i)\d+mg"]) == ["100mg", "daily", "dose"]
        assert tok("take 100mg", preserve=[r"(?i)\d+mg"]) == ["take", "100mg"]
        assert tok("100mg", preserve=[r"(?i)\d+mg"]) == ["100mg"]

    def test_start_end(self):
        assert tok("BRCA1 mutation TP53", preserve=[r"[A-Z][A-Z0-9]+"]) == [
            "BRCA1",
            "mutation",
            "TP53",
        ]

    def test_case_variations(self):
        assert tok("anti-cd3 Anti-CD3 ANTI-CD3", preserve=[r"(?i)anti-cd\d+"]) == [
            "anti-cd3",
            "Anti-CD3",
            "ANTI-CD3",
        ]

    def test_overlapping_patterns(self):
        t = tok("Take 100mg daily", preserve=[r"\d+", r"(?i)\d+mg"])
        assert "100mg" in t and "take" in t and "daily" in t

    def test_whitespace_around(self):
        assert tok("take   100mg   daily", preserve=[r"(?i)\d+mg"]) == [
            "take",
            "100mg",
            "daily",
        ]
        assert tok("take\t100mg\ndaily", preserve=[r"(?i)\d+mg"]) == [
            "take",
            "100mg",
            "daily",
        ]

    def test_dollar_amounts(self):
        t = tok("cost is $99.99 per item", preserve=[r"\$\d+(\.\d{2})?"])
        assert "$99.99" in t
        t = tok("$100 and $50", preserve=[r"\$\d+(\.\d{2})?"])
        assert "$100" in t and "$50" in t and "and" in t

    def test_unicode_patterns(self):
        t = tok("the café serves naïve customers", preserve=[r"(?i)café|naïve"])
        assert "café" in t and "naïve" in t and "the" in t

    def test_no_match_skips_postprocessing(self):
        # Quirk 1 (mod.rs:154-168): patterns configured but none match →
        # tokens returned WITHOUT lowercasing
        assert tok("Hello World", preserve=[r"ZZZ\d+"]) == ["Hello", "World"]

    def test_multiword_hyphenated(self):
        t = tok(
            "top-of-the-line product",
            preserve=[r"(?i)anti-cd\d+", r"(?i)\w+(?:-\w+)+"],
        )
        assert "top-of-the-line" in t and "product" in t

    def test_invalid_pattern_raises(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(preserve_patterns=("[invalid(regex",))


# ---- misc / API -------------------------------------------------------------

class TestApi:
    def test_empty_string(self):
        assert tok("") == []

    def test_none(self):
        # reference raises TypeError for nil text (error_handling_spec.rb:64);
        # the Spark UDF layer stays null-safe via Analyzer.tokenize
        with pytest.raises(TypeError):
            tok(None)
        from tokenkit_spark import AnalyzerConfig, get_analyzer

        assert get_analyzer(AnalyzerConfig()).tokenize(None) == []

    def test_invalid_strategy(self):
        with pytest.raises(ConfigError):
            AnalyzerConfig(strategy="bogus")

    def test_config_replace_isolated(self):
        base = AnalyzerConfig()
        derived = base.replace(strategy="whitespace", lowercase=False)
        assert base.strategy == "unicode" and base.lowercase
        assert derived.strategy == "whitespace" and not derived.lowercase

    def test_large_text(self):
        text = "word " * 100_000
        assert len(tok(text)) == 100_000


# ---------------------------------------------------------------------------
# Global configure / reset / per-call isolation (lib/tokenkit.rb:213-281,
# spec/per_call_options_spec.rb:262-386, spec/configuration_spec.rb)
# ---------------------------------------------------------------------------

class TestGlobalConfig:
    def teardown_method(self):
        tk.reset()

    def test_configure_merges_into_current(self):
        tk.configure(strategy="whitespace")
        tk.configure(lowercase=False)  # second call keeps strategy
        cfg = tk.current_config()
        assert cfg.strategy == "whitespace" and cfg.lowercase is False
        assert tk.tokenize("Hello World") == ["Hello", "World"]

    def test_reset_restores_defaults(self):
        tk.configure(strategy="keyword", lowercase=False)
        tk.reset()
        cfg = tk.current_config()
        assert cfg.strategy == "unicode" and cfg.lowercase is True

    def test_per_call_override_does_not_mutate_global(self):
        tk.configure(strategy="whitespace")
        assert tk.tokenize("a-b c", strategy="keyword") == ["a-b c"]
        assert tk.current_config().strategy == "whitespace"
        assert tk.tokenize("a-b c") == ["a-b", "c"]

    def test_invalid_configure_leaves_global_untouched(self):
        import pytest as _pytest
        with _pytest.raises(tk.ConfigError):
            tk.configure(strategy="edge_ngram", min_gram=0)
        assert tk.current_config().strategy == "unicode"
