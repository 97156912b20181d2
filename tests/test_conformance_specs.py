"""Full conformance port of the reference RSpec suite (round-2, VERDICT
item 1): every concrete expectation from /root/reference/spec/*.rb not
already covered by test_tokenizers.py, cited per class. Pure-Python layer
(no Spark session) — these are the "rank-identical fixtures" the north
star requires `python -m pytest -x -q` to replay."""

import re
import threading

import pytest

import tokenkit_spark as tk
from tokenkit_spark import AnalyzerConfig, Analyzer, ConfigError, tokenize


@pytest.fixture(autouse=True)
def _reset():
    # mirrors RSpec `after { TokenKit.reset }`
    yield
    tk.reset()


def tok(text, **cfg):
    return tokenize(text, **cfg)


# ---- spec/preserve_patterns_edge_cases_spec.rb ------------------------------

class TestPreserveEdgeCases:
    def test_adjacent_gene_names(self):  # :12
        t = tok("BRCA1 TP53 EGFR mutations", preserve=[r"[A-Z][A-Z0-9]+"])
        for w in ("BRCA1", "TP53", "EGFR", "mutations"):
            assert w in t

    def test_start_and_end_of_text(self):  # :17
        assert tok("BRCA1 mutation TP53", preserve=[r"[A-Z][A-Z0-9]+"]) == [
            "BRCA1", "mutation", "TP53"]

    def test_boundary_start(self):  # :31
        assert tok("100mg daily dose", preserve=[r"(?i)\d+mg"]) == ["100mg", "daily", "dose"]

    def test_boundary_end(self):  # :36
        assert tok("take 100mg", preserve=[r"(?i)\d+mg"]) == ["take", "100mg"]

    def test_only_token(self):  # :41
        assert tok("100mg", preserve=[r"(?i)\d+mg"]) == ["100mg"]

    def test_unicode_patterns(self):  # :55
        t = tok("the café serves naïve customers", preserve=[r"(?i)café|naïve"])
        for w in ("café", "naïve", "the", "serves", "customers"):
            assert w in t

    def test_multiple_spaces(self):  # :69
        assert tok("take   100mg   daily", preserve=[r"(?i)\d+mg"]) == [
            "take", "100mg", "daily"]

    def test_tabs_newlines(self):  # :74
        assert tok("take\t100mg\ndaily", preserve=[r"(?i)\d+mg"]) == [
            "take", "100mg", "daily"]

    def test_case_variations_all_preserved(self):  # :88
        assert tok("anti-cd3 Anti-CD3 ANTI-CD3", preserve=[r"(?i)anti-cd\d+"]) == [
            "anti-cd3", "Anti-CD3", "ANTI-CD3"]

    def test_monetary_amounts(self):  # :103
        t = tok("cost is $99.99 per item", preserve=[r"\$\d+(\.\d{2})?"])
        for w in ("$99.99", "cost", "is", "per", "item"):
            assert w in t

    def test_dollar_signs(self):  # :108
        t = tok("$100 and $50", preserve=[r"\$\d+(\.\d{2})?"])
        for w in ("$100", "$50", "and"):
            assert w in t

    def test_empty_string(self):  # :122
        assert tok("", preserve=[r"(?i)\d+mg"]) == []

    def test_whitespace_only(self):  # :127
        assert tok("   \t\n   ", preserve=[r"(?i)\d+mg"]) == []

    def test_long_match(self):  # :141
        long_id = "ABC123XYZ789DEFGHIJ"
        t = tok(f"id {long_id} found", preserve=[r"[A-Z0-9]{10,}"])
        for w in (long_id, "id", "found"):
            assert w in t

    def test_preserve_with_remove_punctuation(self):  # :157
        t = tok(
            "Anti-CD3 is a co-stimulatory antibody",
            preserve=[r"(?i)anti-cd\d+"],
            remove_punctuation=True,
        )
        assert "Anti-CD3" in t
        assert "costimulatory" in t


# ---- spec/per_call_options_spec.rb ------------------------------------------

class TestPerCallOptions:
    def test_grapheme_extended_false_oneoff(self):  # :7
        assert len(tok("நி", strategy="grapheme", extended=False)) > 1

    def test_grapheme_extended_default(self):  # :16
        assert tok("நி", strategy="grapheme") == ["நி"]

    def test_grapheme_override_global(self):  # :24
        tk.configure(strategy="grapheme", grapheme_extended=False)
        assert tok("👨‍👩‍👧‍👦", extended=True) == ["👨‍👩‍👧‍👦"]

    def test_edge_min_gram_oneoff(self):  # :36
        assert tok("hello", strategy="edge_ngram", min_gram=3, max_gram=10) == [
            "hel", "hell", "hello"]

    def test_edge_max_gram_oneoff(self):  # :46
        assert tok("testing", strategy="edge_ngram", min_gram=2, max_gram=4) == [
            "te", "tes", "test"]

    def test_edge_override_global_grams(self):  # :56
        tk.configure(strategy="edge_ngram", min_gram=2, max_gram=5)
        assert tok("search", min_gram=3, max_gram=4) == ["sea", "sear"]

    def test_edge_lowercase_false(self):  # :67
        assert tok("HELLO", strategy="edge_ngram", min_gram=2, max_gram=3,
                   lowercase=False) == ["HE", "HEL"]

    def test_edge_remove_punctuation(self):  # :78
        assert tok("test!", strategy="edge_ngram", min_gram=2, max_gram=4,
                   remove_punctuation=True) == ["te", "tes", "test"]

    def test_path_windows_delimiter(self):  # :91
        assert tok("C:\\Program Files\\Ruby", strategy="path_hierarchy",
                   delimiter="\\", lowercase=False) == [
            "C:", "C:\\Program Files", "C:\\Program Files\\Ruby"]

    def test_path_override_global_delimiter(self):  # :105
        tk.configure(strategy="path_hierarchy", delimiter="/")
        assert tok("a|b|c", delimiter="|") == ["a", "a|b", "a|b|c"]

    def test_path_lowercase(self):  # :115
        assert tok("/Usr/Local/Bin", strategy="path_hierarchy", delimiter="/",
                   lowercase=True) == ["/usr", "/usr/local", "/usr/local/bin"]

    def test_path_remove_punctuation(self):  # :129
        assert tok("path/to/file.txt", strategy="path_hierarchy", delimiter="/",
                   remove_punctuation=True) == ["path", "path/to", "path/to/filetxt"]

    def test_path_multichar_delimiter(self):  # :143
        assert tok("a::b::c", strategy="path_hierarchy", delimiter="::") == [
            "a", "a::b", "a::b::c"]

    def test_pattern_percall_regex(self):  # :154
        t = tok("test@example.com and user@domain.org", strategy="pattern",
                regex=r"[\w.-]+@[\w.-]+\.\w+")
        assert sorted(t) == sorted(["test@example.com", "user@domain.org"])

    def test_pattern_override_global_regex(self):  # :163
        tk.configure(strategy="pattern", regex=r"\w+")
        assert tok("test-123", regex=r"\w+-\d+") == ["test-123"]

    def test_pattern_lowercase_false(self):  # :173
        assert tok("ABC-123 DEF-456", strategy="pattern", regex=r"[A-Z]+-\d+",
                   lowercase=False) == ["ABC-123", "DEF-456"]

    def test_combined_edge_options(self):  # :185
        assert tok("TEST", strategy="edge_ngram", min_gram=2, max_gram=3,
                   lowercase=True) == ["te", "tes"]

    def test_combined_path_options(self):  # :196
        assert tok("a.b/c.d/e.f", strategy="path_hierarchy", delimiter="/",
                   remove_punctuation=True) == ["ab", "ab/cd", "ab/cd/ef"]

    def test_combined_grapheme_options(self):  # :206
        assert tok("HELLO", strategy="grapheme", extended=True, lowercase=True) == [
            "h", "e", "l", "l", "o"]

    def test_percall_preserve(self):  # :218
        t = tok("testing CODE-123 here", preserve=[r"CODE-\d+"])
        for w in ("CODE-123", "testing", "here"):
            assert w in t

    def test_percall_preserve_multiple(self):  # :227
        t = tok("email user@example.com and CODE-123",
                preserve=[r"[\w.-]+@[\w.-]+\.\w+", r"CODE-\d+"])
        for w in ("user@example.com", "CODE-123", "email", "and"):
            assert w in t

    def test_percall_preserve_lowercase(self):  # :236
        t = tok("TEST CODE-123 HERE", preserve=[r"CODE-\d+"], lowercase=True)
        for w in ("CODE-123", "test", "here"):
            assert w in t

    def test_strategy_switch_oneoff(self):  # :247
        tk.configure(strategy="unicode", lowercase=True)
        assert tok("hello world", strategy="edge_ngram", min_gram=2, max_gram=3) == [
            "he", "hel", "wo", "wor"]

    def test_global_config_survives_oneoff(self):  # :262
        tk.configure(strategy="unicode", lowercase=False)
        tok("test", strategy="whitespace", lowercase=True)
        cfg = tk.current_config()
        assert cfg.strategy == "unicode" and cfg.lowercase is False

    def test_edge_only_min_gram(self):  # :277
        t = tok("test", strategy="edge_ngram", min_gram=3)
        assert "tes" in t and "test" in t

    def test_edge_only_max_gram(self):  # :286
        t = tok("hello", strategy="edge_ngram", max_gram=3)
        assert "he" in t and "hel" in t

    def test_path_default_delimiter(self):  # :295
        assert tok("/usr/local", strategy="path_hierarchy") == ["/usr", "/usr/local"]

    def test_option_precedence(self):  # :305
        tk.configure(strategy="edge_ngram", min_gram=2, max_gram=10,
                     lowercase=True, remove_punctuation=False)
        assert tok("TEST!", min_gram=3, max_gram=4, lowercase=False,
                   remove_punctuation=True) == ["TES", "TEST"]

    def test_unspecified_options_from_global(self):  # :324
        tk.configure(strategy="edge_ngram", min_gram=2, max_gram=5, lowercase=True)
        assert tok("TEST", max_gram=3) == ["te", "tes"]

    def test_fresh_instance_distinct_options(self):  # :338 (thread body)
        results = {
            (lc, rp): tok("Hello-World!", lowercase=lc, remove_punctuation=rp)
            for lc in (True, False)
            for rp in (True, False)
        }
        assert len(set(map(tuple, results.values()))) > 1

    def test_percall_does_not_mutate_global(self):  # :367
        tk.configure(strategy="unicode", lowercase=True)
        r1 = tok("Hello World", lowercase=False)
        assert tk.current_config().lowercase is True
        r2 = tok("Hello World")
        assert r1 == ["Hello", "World"]
        assert r2 == ["hello", "world"]


# ---- spec/error_handling_spec.rb --------------------------------------------

class TestErrorHandling:
    def test_invalid_pattern_regex(self):  # :7
        with pytest.raises(ConfigError, match="Invalid regex pattern"):
            tk.configure(strategy="pattern", regex="[invalid(")
            tok("test")

    def test_invalid_preserve_pattern(self):  # :17
        with pytest.raises(ConfigError, match="Invalid regex pattern"):
            tk.configure(preserve_patterns=["valid", "[invalid("])

    def test_negative_min_gram(self):  # :28
        with pytest.raises(ConfigError, match="min_gram must be positive"):
            tk.configure(strategy="edge_ngram", min_gram=-1, max_gram=5)

    def test_min_gt_max(self):  # :38
        with pytest.raises(ConfigError, match="max_gram .* must be >= min_gram"):
            tk.configure(strategy="edge_ngram", min_gram=10, max_gram=5)

    def test_empty_delimiter(self):  # :48
        with pytest.raises(ConfigError, match="Path hierarchy requires a delimiter"):
            tk.configure(strategy="path_hierarchy", delimiter="")

    def test_empty_text(self):  # :59
        assert tok("") == []

    def test_nil_text(self):  # :64
        with pytest.raises(TypeError):
            tok(None)

    def test_very_long_text(self):  # :68
        assert len(tok("word " * 100_000)) > 0

    def test_whitespace_only_text(self):  # :74
        assert tok("   \n\t  ") == []

    def test_special_unicode_chars(self):  # :79
        assert isinstance(tok("test\u0000null\ufffdreplacement"), list)

    def test_tokenize_before_configure(self):  # :86
        tk.reset()
        assert tok("test text") == ["test", "text"]

    def test_double_configure(self):  # :93
        tk.configure(strategy="whitespace")
        tk.configure(strategy="unicode")
        assert tk.current_config().strategy == "unicode"

    def test_config_preserved_after_error(self):  # :106
        tk.configure(strategy="whitespace", lowercase=False)
        with pytest.raises(ConfigError):
            tk.configure(strategy="pattern", regex="[invalid(")
        cfg = tk.current_config()
        assert cfg.strategy == "whitespace" and cfg.lowercase is False


# ---- spec/regex_flags_spec.rb -----------------------------------------------

class TestRegexFlags:
    def test_case_insensitive_preserve(self):  # :7
        tk.configure(preserve_patterns=[re.compile(r"GENE-\d+", re.I)], lowercase=True)
        t = tok("The gene-123 and GENE-456 were identified")
        assert "gene-123" in t and "GENE-456" in t

    def test_case_insensitive_pattern_strategy(self):  # :17
        tk.configure(strategy="pattern", regex=re.compile(r"[A-Z]+", re.I), lowercase=False)
        assert sorted(tok("ABC def GHI")) == sorted(["ABC", "def", "GHI"])

    def test_multiline_pattern_strategy(self):  # :30
        tk.configure(strategy="pattern", regex=re.compile(r"test.", re.M))
        assert sorted(tok("test1 test2 test3")) == sorted(["test1", "test2", "test3"])

    def test_multiline_preserve(self):  # :40
        tk.configure(preserve_patterns=[re.compile(r"CODE-\d+", re.M)])
        assert "CODE-123" in tok("Found CODE-123 in file")

    def test_extended_preserve(self):  # :51
        pattern = re.compile(
            r"""
            GENE-     # Gene prefix
            \d{3,5}   # 3-5 digits
            """,
            re.X,
        )
        tk.configure(preserve_patterns=[pattern])
        assert "GENE-12345" in tok("Found GENE-12345 in sequence")

    def test_extended_pattern_strategy(self):  # :65
        pattern = re.compile(
            r"""
            \w+       # word characters
            @         # at sign
            \w+       # domain name
            \.        # dot
            \w+       # tld
            """,
            re.X,
        )
        tk.configure(strategy="pattern", regex=pattern)
        assert "user@example.com" in tok("Contact user@example.com for info")

    def test_im_flags_together(self):  # :85
        tk.configure(preserve_patterns=[re.compile(r"CODE-\d+", re.I | re.M)], lowercase=True)
        assert "code-123" in tok("Found code-123 here")

    def test_imx_flags_together(self):  # :95
        pattern = re.compile(
            r"""
            GENE-     # prefix
            \d+       # digits
            """,
            re.I | re.M | re.X,
        )
        tk.configure(preserve_patterns=[pattern], lowercase=True)
        assert "gene-123" in tok("Found gene-123 in sample")

    def test_ignorecase_conversion(self):  # :112
        tk.configure(preserve_patterns=[re.compile("test", re.I)])
        t = tok("Test TEST test")
        for w in ("Test", "TEST", "test"):
            assert w in t

    def test_multiline_conversion(self):  # :121
        tk.configure(preserve_patterns=[re.compile("a.b", re.M)])
        assert "aXb" in tok("aXb test")

    def test_extended_conversion(self):  # :130
        tk.configure(preserve_patterns=[re.compile("a b c", re.X)])
        assert "abc" in tok("abc test")

    def test_combined_conversion(self):  # :139
        tk.configure(preserve_patterns=[re.compile("test", re.I | re.M | re.X)])
        assert "TEST" in tok("TEST")

    def test_oneoff_pattern_flag(self):  # :150
        t = tok("ABC def GHI", strategy="pattern",
                regex=re.compile("[a-z]+", re.I), lowercase=False)
        assert sorted(t) == sorted(["ABC", "def", "GHI"])

    def test_oneoff_preserve_flag(self):  # :160
        assert "CODE-456" in tok("Found CODE-456 here",
                                 preserve=[re.compile(r"CODE-\d+", re.M)])

    def test_no_flags(self):  # :170
        tk.configure(preserve_patterns=[r"GENE-\d+"])
        assert "GENE-123" in tok("Found GENE-123 here")

    def test_empty_preserve_list(self):  # :179
        tk.configure(preserve_patterns=[])
        assert tok("test text") == ["test", "text"]

    def test_mixed_flag_patterns(self):  # :188
        tk.configure(preserve_patterns=[
            re.compile(r"GENE-\d+", re.I), r"PROTEIN-\d+", re.compile(r"RNA-\d+", re.M)])
        t = tok("gene-1 PROTEIN-2 rna-3")
        assert "gene-1" in t and "PROTEIN-2" in t


# ---- spec/url_email_tokenizer_spec.rb ---------------------------------------

class TestUrlEmailSpec:
    def test_email_single_token(self):  # :11
        t = tok("Contact support@example.com for help", strategy="url_email")
        for w in ("support@example.com", "contact", "for", "help"):
            assert w in t

    def test_multiple_emails(self):  # :17
        t = tok("Email alice@example.com or bob@test.org", strategy="url_email")
        for w in ("alice@example.com", "bob@test.org", "email", "or"):
            assert w in t

    def test_http_url(self):  # :23
        t = tok("Visit http://example.com for more info", strategy="url_email")
        for w in ("http://example.com", "visit", "for", "more", "info"):
            assert w in t

    def test_https_url(self):  # :29
        assert "https://example.com" in tok("Visit https://example.com for more info",
                                            strategy="url_email")

    def test_url_with_path(self):  # :35
        t = tok("Check https://example.com/products/laptops for details",
                strategy="url_email")
        assert "https://example.com/products/laptops" in t

    def test_both_email_and_url(self):  # :41
        t = tok("Contact support@example.com or visit https://example.com",
                strategy="url_email")
        for w in ("support@example.com", "https://example.com", "contact", "or", "visit"):
            assert w in t

    def test_plain_text(self):  # :48
        assert tok("Hello world this is plain text", strategy="url_email") == [
            "hello", "world", "this", "is", "plain", "text"]

    def test_empty(self):  # :53
        assert tok("", strategy="url_email") == []

    def test_email_at_start(self):  # :58
        assert tok("admin@test.com sent you a message", strategy="url_email") == [
            "admin@test.com", "sent", "you", "a", "message"]

    def test_url_at_end(self):  # :63
        assert tok("Visit us at https://example.com", strategy="url_email") == [
            "visit", "us", "at", "https://example.com"]

    def test_lowercases_emails(self):  # :76
        t = tok("Contact SUPPORT@EXAMPLE.COM please", strategy="url_email")
        assert "support@example.com" in t and "contact" in t and "please" in t

    def test_lowercases_urls(self):  # :82
        assert "https://example.com" in tok("Visit HTTPS://EXAMPLE.COM",
                                            strategy="url_email")

    def test_lowercase_disabled(self):  # :96
        t = tok("Contact SUPPORT@EXAMPLE.COM Please", strategy="url_email",
                lowercase=False)
        for w in ("SUPPORT@EXAMPLE.COM", "Contact", "Please"):
            assert w in t

    def test_remove_punct_spares_urls(self):  # :112
        t = tok("Visit https://example.com or email test@example.com today!",
                strategy="url_email", remove_punctuation=True)
        for w in ("https://example.com", "test@example.com", "visit", "or",
                  "email", "today"):
            assert w in t

    def test_query_params(self):  # :121
        assert "https://example.com/search?q=test" in tok(
            "Search https://example.com/search?q=test", strategy="url_email")

    def test_ports(self):  # :126
        assert "http://localhost:3000" in tok("Connect to http://localhost:3000",
                                              strategy="url_email")

    def test_schemeless(self):  # :131
        t = tok("Visit example.com for details", strategy="url_email")
        for w in ("example.com", "visit", "for", "details"):
            assert w in t

    def test_parens(self):  # :137
        t = tok("See docs (https://example.com) here", strategy="url_email")
        for w in ("https://example.com", "see", "docs", "here"):
            assert w in t

    def test_email_dots(self):  # :145
        assert "first.last@example.com" in tok("Email first.last@example.com",
                                               strategy="url_email")

    def test_email_plus(self):  # :150
        assert "user+tag@example.com" in tok("Send to user+tag@example.com",
                                             strategy="url_email")

    def test_email_numbers(self):  # :155
        assert "user123@test456.com" in tok("Contact user123@test456.com",
                                            strategy="url_email")

    def test_support_message(self):  # :162
        t = tok("Please contact support@company.com or visit https://help.company.com",
                strategy="url_email")
        assert "support@company.com" in t and "https://help.company.com" in t

    def test_product_links(self):  # :168
        t = tok("Buy now at https://store.example.com or email sales@example.com",
                strategy="url_email")
        assert "https://store.example.com" in t and "sales@example.com" in t

    def test_preserve_alongside(self):  # :176
        assert tok("TICKET-123 email support@example.com about SKU-456",
                   strategy="url_email",
                   preserve=[r"TICKET-\d+", r"SKU-\d+"]) == [
            "TICKET-123", "email", "support@example.com", "about", "SKU-456"]

    def test_preserve_genes_with_urls(self):  # :187
        assert tok("BRCA1 info at https://www.ncbi.nlm.nih.gov/gene/672 and TP53",
                   strategy="url_email", preserve=[r"BRCA\d+", r"TP\d+"]) == [
            "BRCA1", "info", "at", "https://www.ncbi.nlm.nih.gov/gene/672",
            "and", "TP53"]

    def test_preserve_measurements(self):  # :198
        assert tok("Upload 100MB to https://upload.example.com or email admin@example.com",
                   strategy="url_email", preserve=[r"(?i)\d+(GB|MB|KB)"]) == [
            "upload", "100MB", "to", "https://upload.example.com", "or",
            "email", "admin@example.com"]

    def test_preserve_overlapping_email(self):  # :209
        assert tok("Contact support@example.com today", strategy="url_email",
                   preserve=[r"support@example\.com"]) == [
            "contact", "support@example.com", "today"]

    def test_preserve_versions(self):  # :221
        assert tok("Download v2.1.3 from https://downloads.example.com",
                   strategy="url_email", preserve=[r"v\d+\.\d+\.\d+"]) == [
            "download", "v2.1.3", "from", "https://downloads.example.com"]

    def test_preserve_remove_punct(self):  # :232
        assert tok("API-123! Visit https://api.example.com now!",
                   strategy="url_email", remove_punctuation=True,
                   preserve=[r"API-\d+"]) == [
            "API-123", "visit", "https://api.example.com", "now"]

    def test_hashtags_mentions(self):  # :244
        assert tok("#News @User check https://example.com", strategy="url_email",
                   preserve=[r"#\w+", r"@\w+"]) == [
            "#News", "@User", "check", "https://example.com"]


# ---- spec/char_group_tokenizer_spec.rb --------------------------------------

class TestCharGroupSpec:
    def test_spaces(self):  # :15
        assert tok("hello world", strategy="char_group", split_on_chars=" \t\n") == [
            "hello", "world"]

    def test_tabs(self):  # :20
        assert tok("hello\tworld", strategy="char_group", split_on_chars=" \t\n") == [
            "hello", "world"]

    def test_newlines(self):  # :25
        assert tok("hello\nworld", strategy="char_group", split_on_chars=" \t\n") == [
            "hello", "world"]

    def test_consecutive_split_chars(self):  # :30
        assert tok("hello  \t\n  world", strategy="char_group",
                   split_on_chars=" \t\n") == ["hello", "world"]

    def test_commas(self):  # :45
        assert tok("apple,banana,cherry", strategy="char_group", split_on_chars=",;",
                   lowercase=False) == ["apple", "banana", "cherry"]

    def test_semicolons(self):  # :50
        assert tok("one;two;three", strategy="char_group", split_on_chars=",;",
                   lowercase=False) == ["one", "two", "three"]

    def test_both_commas_semicolons(self):  # :55
        assert tok("a,b;c,d", strategy="char_group", split_on_chars=",;",
                   lowercase=False) == ["a", "b", "c", "d"]

    def test_spaces_within_tokens(self):  # :60
        assert tok("first item,second item", strategy="char_group",
                   split_on_chars=",;", lowercase=False) == [
            "first item", "second item"]

    def test_pipes(self):  # :75
        assert tok("field1|field2|field3", strategy="char_group", split_on_chars="|",
                   lowercase=False) == ["field1", "field2", "field3"]

    def test_custom_set(self):  # :90
        assert tok("date:2024-01-15/path", strategy="char_group",
                   split_on_chars=":-/", lowercase=False) == [
            "date", "2024", "01", "15", "path"]

    def test_empty_string(self):  # :96
        assert tok("", strategy="char_group", split_on_chars=",") == []

    def test_no_split_chars_present(self):  # :106
        assert tok("nosplitcharacters", strategy="char_group", split_on_chars=",",
                   lowercase=False) == ["nosplitcharacters"]

    def test_lowercase(self):  # :126
        assert tok("APPLE,BANANA", strategy="char_group", split_on_chars=",",
                   lowercase=True) == ["apple", "banana"]

    def test_remove_punctuation(self):  # :142
        assert tok("apple!,banana?,cherry.", strategy="char_group",
                   split_on_chars=",", lowercase=False,
                   remove_punctuation=True) == ["apple", "banana", "cherry"]

    def test_csv(self):  # :157
        assert tok("John Doe,30,Software Engineer", strategy="char_group",
                   split_on_chars=",", lowercase=False) == [
            "John Doe", "30", "Software Engineer"]

    def test_log_parsing(self):  # :172
        assert tok("[INFO] User logged in successfully", strategy="char_group",
                   split_on_chars=" []", lowercase=False) == [
            "INFO", "User", "logged", "in", "successfully"]

    def test_percall_split_chars(self):  # :179
        assert tok("a:b:c", strategy="char_group", split_on_chars=":") == [
            "a", "b", "c"]

    def test_empty_split_chars(self):  # :190
        assert tok("hello world", strategy="char_group", split_on_chars="") == [
            "hello world"]

    def test_single_split_char(self):  # :199
        assert tok("a-b-c", strategy="char_group", split_on_chars="-") == [
            "a", "b", "c"]

    def test_repeated_split_chars(self):  # :208
        assert tok("a,b,c", strategy="char_group", split_on_chars=",,") == [
            "a", "b", "c"]

    def test_unicode_split_chars(self):  # :217
        assert tok("北京、上海、深圳", strategy="char_group", split_on_chars="、") == [
            "北京", "上海", "深圳"]

    def test_mixed_ascii_unicode_separators(self):  # :226
        assert tok("item1,item2、item3;item4", strategy="char_group",
                   split_on_chars=",、;") == ["item1", "item2", "item3", "item4"]

    def test_preserve_csv(self):  # :241
        assert tok("product,USD50,price,EUR45", strategy="char_group",
                   split_on_chars=",", lowercase=True,
                   preserve=[r"USD\d+", r"EUR\d+"]) == [
            "product", "USD50", "price", "EUR45"]

    def test_preserve_emails_semicolons(self):  # :253
        assert tok("name;John.Doe@example.com;active", strategy="char_group",
                   split_on_chars=";", lowercase=True,
                   preserve=[r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"]) == [
            "name", "John.Doe@example.com", "active"]

    def test_preserve_genes_pipes(self):  # :265
        assert tok("patient|BRCA1|mutation|TP53", strategy="char_group",
                   split_on_chars="|", lowercase=True,
                   preserve=[r"BRCA\d+", r"TP\d+"]) == [
            "patient", "BRCA1", "mutation", "TP53"]

    def test_preserve_measurements_spaces(self):  # :277
        assert tok("dose 100mg sample 50ug volume 10ml", strategy="char_group",
                   split_on_chars=" ", lowercase=True,
                   preserve=[r"(?i)\d+(mg|ug|ml)"]) == [
            "dose", "100mg", "sample", "50ug", "volume", "10ml"]

    def test_preserve_spanning_delimiters(self):  # :289
        assert tok("anti-CD3 treatment anti-CD28 therapy", strategy="char_group",
                   split_on_chars=" ", lowercase=True,
                   preserve=[r"(?i)anti-CD\d+"]) == [
            "anti-CD3", "treatment", "anti-CD28", "therapy"]

    def test_preserve_remove_punct(self):  # :302
        assert tok("version v1.2.3 ready", strategy="char_group",
                   split_on_chars=" ", lowercase=True, remove_punctuation=True,
                   preserve=[r"v\d+\.\d+\.\d+"]) == [
            "version", "v1.2.3", "ready"]


# ---- spec/letter_tokenizer_spec.rb ------------------------------------------

class TestLetterSpec:
    def test_non_letter_split(self):  # :13
        assert tok("hello-world", strategy="letter") == ["hello", "world"]

    def test_numbers_split(self):  # :18
        assert tok("test123done", strategy="letter") == ["test", "done"]

    def test_punct_split(self):  # :23
        assert tok("hello, world!", strategy="letter") == ["hello", "world"]

    def test_spaces_split(self):  # :28
        assert tok("hello world", strategy="letter") == ["hello", "world"]

    def test_special_chars_split(self):  # :33
        assert tok("user@example.com", strategy="letter") == ["user", "example", "com"]

    def test_consecutive_non_letters(self):  # :38
        assert tok("hello---world", strategy="letter") == ["hello", "world"]

    def test_empty(self):  # :43
        assert tok("", strategy="letter") == []

    def test_no_letters(self):  # :48
        assert tok("123!@#", strategy="letter") == []

    def test_unicode_letters(self):  # :53
        assert tok("café-naïve", strategy="letter") == ["café", "naïve"]

    def test_cjk(self):  # :58
        assert tok("日本語123test", strategy="letter", lowercase=False) == [
            "日本語", "test"]

    def test_lowercase(self):  # :69
        assert tok("HELLO-WORLD", strategy="letter") == ["hello", "world"]

    def test_lowercase_disabled(self):  # :83
        assert tok("HELLO-WORLD", strategy="letter", lowercase=False) == [
            "HELLO", "WORLD"]

    def test_remove_punct_noop(self):  # :98
        assert tok("hello!world?", strategy="letter", lowercase=False,
                   remove_punctuation=True) == ["hello", "world"]

    def test_contractions_split(self):  # :106
        assert tok("can't", strategy="letter") == ["can", "t"]

    def test_hyphenated_split(self):  # :111
        assert tok("mother-in-law", strategy="letter") == ["mother", "in", "law"]

    def test_mixed_scripts_joined(self):  # :125
        assert tok("Hello世界test", strategy="letter", lowercase=False) == [
            "Hello世界test"]

    def test_mixed_scripts_split(self):  # :131
        assert tok("Hello-世界-test", strategy="letter", lowercase=False) == [
            "Hello", "世界", "test"]

    def test_noisy_text(self):  # :138
        assert tok("!!!SALE!!!50%OFF!!!", strategy="letter") == ["sale", "off"]

    def test_social_media(self):  # :143
        assert tok("#hashtag @mention http://url.com", strategy="letter") == [
            "hashtag", "mention", "http", "url", "com"]

    def test_percall(self):  # :150
        assert tok("test123done", strategy="letter", lowercase=False) == [
            "test", "done"]

    def test_emoji_splits(self):  # :161
        assert tok("hello🔥world", strategy="letter") == ["hello", "world"]

    def test_multiple_emoji(self):  # :167
        assert tok("test😀😂done", strategy="letter") == ["test", "done"]

    def test_emoji_with_text(self):  # :172
        assert tok("I❤️Ruby", strategy="letter", lowercase=False) == ["I", "Ruby"]

    def test_only_emoji(self):  # :177
        assert tok("🔥🎉🚀", strategy="letter") == []

    def test_preserve_genes(self):  # :184
        assert tok("Patient BRCA1 test TP53 done", strategy="letter",
                   preserve=[r"BRCA\d", r"TP\d+"]) == [
            "patient", "BRCA1", "test", "TP53", "done"]

    def test_preserve_acronyms(self):  # :195
        assert tok("The FDA and NIH study", strategy="letter",
                   preserve=[r"[A-Z]{2,}"]) == [
            "the", "FDA", "and", "NIH", "study"]

    def test_preserve_immunoglobulins(self):  # :206
        assert tok("IgG IgM antibodies", strategy="letter",
                   preserve=[r"IgG", r"IgM"]) == ["IgG", "IgM", "antibodies"]

    def test_preserve_spanning_non_letters(self):  # :217
        assert tok("anti-CD3 treatment", strategy="letter",
                   preserve=[r"(?i)anti-CD\d+"]) == ["anti-CD3", "treatment"]

    def test_preserve_measurements(self):  # :229
        assert tok("dose 100mg sample 50ug", strategy="letter",
                   preserve=[r"\d+mg", r"\d+ug"]) == [
            "dose", "100mg", "sample", "50ug"]

    def test_preserve_remove_punct(self):  # :240
        assert tok("USA! product!", strategy="letter", remove_punctuation=True,
                   preserve=[r"USA"]) == ["USA", "product"]


# ---- spec/lowercase_tokenizer_spec.rb ---------------------------------------

class TestLowercaseSpec:
    def test_split_and_lowercase(self):  # :12
        assert tok("HELLO-WORLD", strategy="lowercase") == ["hello", "world"]

    @pytest.mark.filterwarnings("ignore::UserWarning")
    def test_always_lowercases_with_warning(self):  # :17
        with pytest.warns(UserWarning, match="always lowercases"):
            tk.configure(strategy="lowercase", lowercase=False)
        assert tok("TEST") == ["test"]

    def test_numbers_split(self):  # :29
        assert tok("TEST123DONE", strategy="lowercase") == ["test", "done"]

    def test_punct_split(self):  # :34
        assert tok("HELLO, WORLD!", strategy="lowercase") == ["hello", "world"]

    def test_spaces_split(self):  # :39
        assert tok("HELLO WORLD", strategy="lowercase") == ["hello", "world"]

    def test_special_chars(self):  # :44
        assert tok("USER@EXAMPLE.COM", strategy="lowercase") == [
            "user", "example", "com"]

    def test_consecutive_non_letters(self):  # :49
        assert tok("HELLO---WORLD", strategy="lowercase") == ["hello", "world"]

    def test_empty(self):  # :54
        assert tok("", strategy="lowercase") == []

    def test_no_letters(self):  # :59
        assert tok("123!@#", strategy="lowercase") == []

    def test_unicode_lowercase(self):  # :64
        assert tok("CAFÉ-NAÏVE", strategy="lowercase") == ["café", "naïve"]

    def test_turkish_dotted_I(self):  # :70
        t = tok("İSTANBUL", strategy="lowercase")
        assert t == ["i̇stanbul"]
        assert len(t[0]) == 9

    def test_turkish_mid_word(self):  # :77
        t = tok("TESTİNG", strategy="lowercase")
        assert t == ["testi̇ng"] and len(t[0]) == 8

    def test_turkish_multiple_words(self):  # :84
        t = tok("İSTANBUL İZMİR", strategy="lowercase")
        assert t == ["i̇stanbul", "i̇zmi̇r"]
        assert len(t[0]) == 9 and len(t[1]) == 7

    def test_turkish_double(self):  # :91
        t = tok("İİ", strategy="lowercase")
        assert t == ["i̇i̇"] and len(t[0]) == 4

    def test_turkish_positions(self):  # :97
        t = tok("İTALİA", strategy="lowercase")
        assert t == ["i̇tali̇a"] and len(t[0]) == 8

    def test_mixed_case(self):  # :105
        assert tok("MiXeD-CaSe", strategy="lowercase") == ["mixed", "case"]

    def test_cjk(self):  # :110
        assert tok("日本語123TEST", strategy="lowercase") == ["日本語", "test"]

    def test_remove_punct_noop(self):  # :123
        assert tok("HELLO!WORLD?", strategy="lowercase",
                   remove_punctuation=True) == ["hello", "world"]

    def test_single_pass(self):  # :135
        assert tok("HELLO123WORLD", strategy="lowercase") == ["hello", "world"]

    def test_search_normalization(self):  # :141
        assert tok("User-Agent: Mozilla/5.0", strategy="lowercase") == [
            "user", "agent", "mozilla"]
        assert tok("user agent mozilla", strategy="lowercase") == [
            "user", "agent", "mozilla"]

    def test_skus(self):  # :155
        assert tok("SKU-ABC-123", strategy="lowercase") == ["sku", "abc"]

    def test_social_media(self):  # :162
        assert tok("#TRENDING @USER HTTP://URL.COM", strategy="lowercase") == [
            "trending", "user", "http", "url", "com"]

    def test_percall(self):  # :169
        assert tok("TEST123DONE", strategy="lowercase") == ["test", "done"]

    def test_percall_lowercase_false_ignored(self):  # :177
        with pytest.warns(UserWarning, match="always lowercases"):
            assert tok("TEST", strategy="lowercase", lowercase=False) == ["test"]

    def test_equals_letter_lowercased(self):  # :190
        a = tok("HELLO-WORLD", strategy="letter", lowercase=True)
        b = tok("HELLO-WORLD", strategy="lowercase")
        assert a == b

    def test_emoji(self):  # :199
        assert tok("HELLO🔥WORLD", strategy="lowercase") == ["hello", "world"]

    def test_emoji_mixed_case(self):  # :205
        assert tok("TEST😀😂Done", strategy="lowercase") == ["test", "done"]

    def test_emoji_with_text(self):  # :210
        assert tok("I❤️RUBY", strategy="lowercase") == ["i", "ruby"]

    def test_only_emoji(self):  # :215
        assert tok("🔥🎉🚀", strategy="lowercase") == []

    def test_preserve_genes(self):  # :222
        assert tok("Patient BRCA1 test TP53 done", strategy="lowercase",
                   preserve=[r"BRCA\d+", r"TP\d+"]) == [
            "patient", "BRCA1", "test", "TP53", "done"]

    def test_preserve_acronyms(self):  # :232
        assert tok("The FDA and NIH study", strategy="lowercase",
                   preserve=[r"[A-Z]{2,}"]) == ["the", "FDA", "and", "NIH", "study"]

    def test_preserve_spanning(self):  # :242
        assert tok("Anti-CD3 treatment Anti-CD28", strategy="lowercase",
                   preserve=[r"Anti-CD\d+"]) == [
            "Anti-CD3", "treatment", "Anti-CD28"]

    def test_preserve_measurements(self):  # :252
        assert tok("DOSE 100mg SAMPLE 50ug", strategy="lowercase",
                   preserve=[r"(?i)\d+(mg|ug|ml)"]) == [
            "dose", "100mg", "sample", "50ug"]

    def test_preserve_emails(self):  # :262
        assert tok("CONTACT John.Doe@example.com NOW", strategy="lowercase",
                   preserve=[r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"]) == [
            "contact", "John.Doe@example.com", "now"]

    def test_preserve_mixed(self):  # :272
        assert tok("USA VERSION v2.0.1 READY", strategy="lowercase",
                   preserve=[r"USA", r"v\d+\.\d+\.\d+"]) == [
            "USA", "version", "v2.0.1", "ready"]


# ---- spec/path_hierarchy_tokenizer_spec.rb ----------------------------------

class TestPathHierarchySpec:
    def test_absolute(self):  # :12
        assert tok("/usr/local/bin/ruby", strategy="path_hierarchy",
                   lowercase=False) == [
            "/usr", "/usr/local", "/usr/local/bin", "/usr/local/bin/ruby"]

    def test_relative(self):  # :22
        assert tok("usr/local/bin", strategy="path_hierarchy", lowercase=False) == [
            "usr", "usr/local", "usr/local/bin"]

    def test_single_level(self):  # :31
        assert tok("/home", strategy="path_hierarchy", lowercase=False) == ["/home"]

    def test_no_leading_slash(self):  # :36
        assert tok("projects/ruby", strategy="path_hierarchy", lowercase=False) == [
            "projects", "projects/ruby"]

    def test_empty(self):  # :44
        assert tok("", strategy="path_hierarchy", lowercase=False) == []

    def test_whitespace_only(self):  # :49
        assert tok("   ", strategy="path_hierarchy", lowercase=False) == []

    def test_windows(self):  # :63
        assert tok("C:\\Program Files\\Ruby", strategy="path_hierarchy",
                   delimiter="\\", lowercase=False) == [
            "C:", "C:\\Program Files", "C:\\Program Files\\Ruby"]

    def test_url_paths(self):  # :74
        assert tok("docs/api/reference/tokenizers", strategy="path_hierarchy",
                   lowercase=False) == [
            "docs", "docs/api", "docs/api/reference", "docs/api/reference/tokenizers"]

    def test_lowercase(self):  # :94
        assert tok("/Users/Admin/Documents", strategy="path_hierarchy",
                   lowercase=True) == [
            "/users", "/users/admin", "/users/admin/documents"]

    def test_remove_punctuation(self):  # :114
        assert tok("path/to/file.txt", strategy="path_hierarchy", lowercase=False,
                   remove_punctuation=True) == ["path", "path/to", "path/to/filetxt"]

    def test_filesystem(self):  # :125
        assert tok("/var/log/nginx/access.log", strategy="path_hierarchy",
                   lowercase=False) == [
            "/var", "/var/log", "/var/log/nginx", "/var/log/nginx/access.log"]

    def test_categories(self):  # :135
        assert tok("electronics/computers/laptops/gaming",
                   strategy="path_hierarchy", lowercase=False) == [
            "electronics", "electronics/computers",
            "electronics/computers/laptops",
            "electronics/computers/laptops/gaming"]

    def test_preserve_versions(self):  # :151
        assert tok("/app/v2.1/V3/config", strategy="path_hierarchy",
                   lowercase=True, preserve=[r"v\d+\.\d+", r"V\d+"]) == [
            "/app", "/app/v2.1", "/app/v2.1/V3", "/app/v2.1/V3/config"]

    def test_preserve_uuid(self):  # :168
        uuid = "550e8400-e29b-41d4-a716-446655440000"
        t = tok(f"/data/{uuid}/files", strategy="path_hierarchy", lowercase=True,
                preserve=[r"[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-"
                          r"[a-fA-F0-9]{4}-[a-fA-F0-9]{12}"])
        assert uuid in " ".join(t)

    def test_preserve_env_vars(self):  # :181
        assert tok("/env/PROD/app/DEV/test", strategy="path_hierarchy",
                   lowercase=True, preserve=[r"PROD", r"DEV", r"TEST"]) == [
            "/env", "/env/PROD", "/env/PROD/app", "/env/PROD/app/DEV",
            "/env/PROD/app/DEV/test"]

    def test_preserve_windows(self):  # :199
        assert tok("C:\\Program Files\\System32\\app", strategy="path_hierarchy",
                   delimiter="\\", lowercase=True,
                   preserve=[r"Program Files", r"System32"]) == [
            "c:", "c:\\Program Files", "c:\\Program Files\\System32",
            "c:\\Program Files\\System32\\app"]

    def test_preserve_remove_punct(self):  # :216
        assert tok("/path/to/file.txt", strategy="path_hierarchy", lowercase=True,
                   remove_punctuation=True, preserve=[r"file\.txt"]) == [
            "/path", "/path/to", "/path/to/file.txt"]

    def test_preserve_api_version(self):  # :233
        assert tok("api/v2/users/profile", strategy="path_hierarchy",
                   lowercase=True, preserve=[r"api\/v\d+"]) == [
            "api/v2", "api/v2/users", "api/v2/users/profile"]

    def test_preserve_timestamps(self):  # :249
        assert tok("/logs/2024-03-15/app.log", strategy="path_hierarchy",
                   lowercase=True, preserve=[r"\d{4}-\d{2}-\d{2}"]) == [
            "/logs", "/logs/2024-03-15", "/logs/2024-03-15/app.log"]


# ---- spec/edge_ngram_tokenizer_spec.rb --------------------------------------

class TestEdgeNgramSpec:
    def test_single_word(self):  # :13
        assert tok("coffee", strategy="edge_ngram") == [
            "co", "cof", "coff", "coffe", "coffee"]

    def test_multiple_words(self):  # :18
        assert tok("hello world", strategy="edge_ngram") == [
            "he", "hel", "hell", "hello", "wo", "wor", "worl", "world"]

    def test_min_gram(self):  # :23
        assert tok("test", strategy="edge_ngram", min_gram=3, max_gram=5) == [
            "tes", "test"]

    def test_max_gram(self):  # :34
        assert tok("testing", strategy="edge_ngram", min_gram=2, max_gram=4) == [
            "te", "tes", "test"]

    def test_single_char_word(self):  # :45
        assert tok("a", strategy="edge_ngram", min_gram=1, max_gram=3) == ["a"]

    def test_empty(self):  # :56
        assert tok("", strategy="edge_ngram") == []

    def test_unicode(self):  # :61
        assert tok("café", strategy="edge_ngram", min_gram=2, max_gram=4) == [
            "ca", "caf", "café"]

    def test_lowercase(self):  # :82
        assert tok("SEARCH", strategy="edge_ngram", min_gram=2, max_gram=6) == [
            "se", "sea", "sear", "searc", "search"]

    def test_lowercase_disabled(self):  # :98
        assert tok("Search", strategy="edge_ngram", min_gram=2, max_gram=6,
                   lowercase=False) == ["Se", "Sea", "Sear", "Searc", "Search"]

    def test_remove_punct(self):  # :115
        assert tok("hello!", strategy="edge_ngram", min_gram=2, max_gram=4,
                   lowercase=False, remove_punctuation=True) == ["he", "hel", "hell"]

    def test_autocomplete(self):  # :122
        t = tok("laptop", strategy="edge_ngram", min_gram=2, max_gram=15)
        for w in ("la", "lap", "lapt", "lapto", "laptop"):
            assert w in t

    def test_min_gram_zero(self):  # :136
        with pytest.raises(ConfigError, match="min_gram must be positive"):
            tok("test", strategy="edge_ngram", min_gram=0, max_gram=2)

    def test_min_gt_max(self):  # :142
        with pytest.raises(ConfigError, match="max_gram .* must be >= min_gram"):
            tok("test", strategy="edge_ngram", min_gram=3, max_gram=1)

    def test_both_zero(self):  # :148
        with pytest.raises(ConfigError, match="min_gram must be positive"):
            tok("test", strategy="edge_ngram", min_gram=0, max_gram=0)

    def test_min_gram_exceeds_word(self):  # :154
        assert tok("test", strategy="edge_ngram", min_gram=10, max_gram=15) == []

    def test_valid_params(self):  # :160
        assert tok("test", strategy="edge_ngram", min_gram=2, max_gram=3) == [
            "te", "tes"]

    def test_min_eq_max(self):  # :165
        assert tok("test", strategy="edge_ngram", min_gram=2, max_gram=2) == ["te"]

    def test_long_word(self):  # :172
        t = tok("a" * 100, strategy="edge_ngram", min_gram=2, max_gram=5)
        assert t == ["aa", "aaa", "aaaa", "aaaaa"]


# ---- spec/ngram_tokenizer_spec.rb -------------------------------------------

class TestNgramSpec:
    def test_single_word(self):  # :15
        assert sorted(tok("quick", strategy="ngram", min_gram=2, max_gram=3)) == sorted(
            ["qu", "ui", "ic", "ck", "qui", "uic", "ick"])

    def test_multiple_words(self):  # :20
        assert sorted(tok("hi there", strategy="ngram", min_gram=2, max_gram=3)) == sorted(
            ["hi", "th", "he", "er", "re", "the", "her", "ere"])

    def test_min_gram(self):  # :25
        assert sorted(tok("test", strategy="ngram", min_gram=3, max_gram=4,
                          lowercase=False)) == sorted(["tes", "est", "test"])

    def test_max_gram(self):  # :37
        assert sorted(tok("hello", strategy="ngram", min_gram=2, max_gram=2,
                          lowercase=False)) == sorted(["he", "el", "ll", "lo"])

    def test_single_char(self):  # :49
        assert tok("a", strategy="ngram", min_gram=2, max_gram=3) == []

    def test_empty(self):  # :54
        assert tok("", strategy="ngram", min_gram=2, max_gram=3) == []

    def test_unicode(self):  # :59
        t = tok("café", strategy="ngram", min_gram=2, max_gram=3)
        for w in ("ca", "af", "fé", "caf", "afé"):
            assert w in t

    def test_lowercase(self):  # :65
        t = tok("TEST", strategy="ngram", min_gram=2, max_gram=3)
        for w in ("te", "es", "st", "tes", "est"):
            assert w in t

    def test_lowercase_disabled(self):  # :81
        t = tok("TEST", strategy="ngram", min_gram=2, max_gram=3, lowercase=False)
        for w in ("TE", "ES", "ST", "TES", "EST"):
            assert w in t

    def test_remove_punct(self):  # :98
        assert sorted(tok("hello!", strategy="ngram", min_gram=2, max_gram=3,
                          lowercase=False, remove_punctuation=True)) == sorted(
            ["he", "el", "ll", "lo", "hel", "ell", "llo"])

    def test_fuzzy(self):  # :114
        t = tok("search", strategy="ngram", min_gram=2, max_gram=4)
        for w in ("se", "ea", "ar", "rc", "ch", "sea", "ear", "arc", "rch",
                  "sear", "earc", "arch"):
            assert w in t

    def test_misspelling_overlap(self):  # :124
        a = set(tok("search", strategy="ngram", min_gram=2, max_gram=3))
        b = set(tok("serch", strategy="ngram", min_gram=2, max_gram=3))
        assert len(a & b) > 0

    def test_min_gram_zero(self):  # :139
        with pytest.raises(ConfigError, match="min_gram must be positive"):
            tok("test", strategy="ngram", min_gram=0, max_gram=2)

    def test_min_gt_max(self):  # :145
        with pytest.raises(ConfigError, match="max_gram .* must be >= min_gram"):
            tok("test", strategy="ngram", min_gram=3, max_gram=1)

    def test_both_zero(self):  # :151
        with pytest.raises(ConfigError, match="min_gram must be positive"):
            tok("test", strategy="ngram", min_gram=0, max_gram=0)

    def test_min_exceeds_word(self):  # :157
        assert tok("test", strategy="ngram", min_gram=10, max_gram=15) == []

    def test_size_major_order(self):  # :163
        assert tok("test", strategy="ngram", min_gram=2, max_gram=3) == [
            "te", "es", "st", "tes", "est"]

    def test_min_eq_max(self):  # :168
        assert tok("test", strategy="ngram", min_gram=2, max_gram=2) == [
            "te", "es", "st"]

    def test_long_word(self):  # :174
        t = tok("a" * 100, strategy="ngram", min_gram=2, max_gram=3)
        assert len(t) == 197
        assert t[0] == "aa" and t[-1] == "aaa"


# ---- spec/whitespace_tokenizer_spec.rb --------------------------------------

class TestWhitespaceSpec:
    def test_basic(self):  # :10
        assert tok("Hello world test", strategy="whitespace") == [
            "hello", "world", "test"]

    def test_tabs_newlines(self):  # :15
        assert tok("Hello\tworld\ntest", strategy="whitespace") == [
            "hello", "world", "test"]

    def test_multiple_spaces(self):  # :20
        assert tok("Hello    world", strategy="whitespace") == ["hello", "world"]

    def test_contractions(self):  # :25
        assert tok("can't won't don't", strategy="whitespace") == [
            "can't", "won't", "don't"]

    def test_hyphens(self):  # :30
        assert tok("anti-CD3 top-notch", strategy="whitespace") == [
            "anti-cd3", "top-notch"]

    def test_preserve(self):  # :36
        assert tok("Patient has BRCA1 and TP53 mutations", strategy="whitespace",
                   preserve=[r"BRCA\d+", r"TP53"]) == [
            "patient", "has", "BRCA1", "and", "TP53", "mutations"]

    def test_preserve_measurements(self):  # :47
        assert tok("Dosage 100mg twice 50ug daily", strategy="whitespace",
                   preserve=[r"(?i)\d+(ug|mg|ml)"]) == [
            "dosage", "100mg", "twice", "50ug", "daily"]

    def test_preserve_emails(self):  # :58
        assert tok("Contact John.Doe@example.com today", strategy="whitespace",
                   preserve=[r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"]) == [
            "contact", "John.Doe@example.com", "today"]

    def test_preserve_multiple_types(self):  # :69
        assert tok("Anti-CD3 IgG 100ml BRCA treatment", strategy="whitespace",
                   preserve=[r"(?i)anti-CD\d+", r"Ig[GMAE]", r"(?i)\d+ml",
                             r"[A-Z]{2,}"]) == [
            "Anti-CD3", "IgG", "100ml", "BRCA", "treatment"]

    def test_preserve_remove_punct(self):  # :85
        assert tok("Price: USD50! Amazing!", strategy="whitespace",
                   remove_punctuation=True, preserve=[r"USD\d+"]) == [
            "price", "USD50", "amazing"]


# ---- spec/unicode_tokenizer_spec.rb + tokenkit_spec.rb ----------------------

class TestTokenKitApi:
    def test_default_simple(self):  # tokenkit_spec:10
        assert tok("Hello world") == ["hello", "world"]

    def test_default_unicode(self):  # tokenkit_spec:15
        assert tok("café résumé") == ["café", "résumé"]

    def test_default_contractions(self):  # tokenkit_spec:20
        assert tok("can't won't don't") == ["can't", "won't", "don't"]

    def test_oneoff_lowercase_disabled(self):  # tokenkit_spec:27
        assert tok("Hello World", lowercase=False) == ["Hello", "World"]

    def test_oneoff_whitespace(self):  # tokenkit_spec:32
        assert tok("can't do it", strategy="whitespace") == ["can't", "do", "it"]

    def test_oneoff_preserve(self):  # tokenkit_spec:37
        t = tok("Anti-CD3 antibody 100ug", preserve=[r"(?i)\d+ug"])
        assert "100ug" in t and "antibody" in t

    def test_configure_applies(self):  # tokenkit_spec:51
        tk.configure(strategy="whitespace", lowercase=False)
        assert tok("Hello World") == ["Hello", "World"]

    def test_configure_persists(self):  # tokenkit_spec:61
        tk.configure(lowercase=False)
        assert tok("Hello") == ["Hello"]
        assert tok("World") == ["World"]

    def test_configure_preserve(self):  # tokenkit_spec:73
        tk.configure(preserve_patterns=[r"(?i)\d+ug", r"(?i)anti-\w+"])
        assert "100ug" in tok("Anti-CD3 antibody 100ug dose")

    def test_config_introspection(self):  # tokenkit_spec:86
        tk.configure(strategy="whitespace", lowercase=False)
        cfg = tk.current_config()
        assert cfg.strategy == "whitespace" and cfg.lowercase is False

    def test_config_hash(self):  # tokenkit_spec:100
        tk.configure(strategy="unicode", lowercase=True)
        h = tk.current_config().to_hash()
        assert h["strategy"] == "unicode" and h["lowercase"] is True

    def test_reset(self):  # tokenkit_spec:114
        tk.configure(lowercase=False)
        tk.reset()
        assert tok("Hello") == ["hello"]

    def test_unicode_preserve_case_kept(self):  # unicode_spec:49
        tk.configure(preserve_patterns=[r"(?i)\d+ug", r"(?i)anti-cd\d+"])
        t = tok("Anti-CD3 antibody")
        assert "Anti-CD3" in t and "antibody" in t


# ---- spec/grapheme_tokenizer_spec.rb ----------------------------------------

class TestGraphemeSpec:
    def test_clusters(self):  # :11
        assert tok("hello", strategy="grapheme", lowercase=False) == [
            "h", "e", "l", "l", "o"]

    def test_emoji(self):  # :16
        assert tok("👋🌍", strategy="grapheme", lowercase=False) == ["👋", "🌍"]

    def test_zwj_family(self):  # :21
        t = tok("👨‍👩‍👧‍👦", strategy="grapheme", lowercase=False)
        assert t == ["👨‍👩‍👧‍👦"]

    def test_accented_nfc(self):  # :27
        assert tok("café", strategy="grapheme", lowercase=False) == [
            "c", "a", "f", "é"]

    def test_combining(self):  # :32
        t = tok("é", strategy="grapheme", lowercase=False)
        assert t == ["é"]

    def test_flags(self):  # :39
        assert tok("🇺🇸", strategy="grapheme", lowercase=False) == ["🇺🇸"]

    def test_empty(self):  # :44
        assert tok("", strategy="grapheme", lowercase=False) == []

    def test_mixed(self):  # :49
        assert tok("a👋b", strategy="grapheme", lowercase=False) == ["a", "👋", "b"]

    def test_legacy_ascii(self):  # :63
        assert tok("hello", strategy="grapheme", extended=False,
                   lowercase=False) == ["h", "e", "l", "l", "o"]

    def test_lowercase(self):  # :77
        assert tok("ABC", strategy="grapheme", lowercase=True) == ["a", "b", "c"]

    def test_remove_punct(self):  # :92
        assert tok("a,b!", strategy="grapheme", lowercase=False,
                   remove_punctuation=True) == ["a", "b"]


# ---- spec/keyword_tokenizer_spec.rb -----------------------------------------

class TestKeywordSpec:
    def test_single_token(self):  # :11
        assert tok("hello world", strategy="keyword", lowercase=False) == [
            "hello world"]

    def test_trims(self):  # :16
        assert tok("  product-sku-123  ", strategy="keyword", lowercase=False) == [
            "product-sku-123"]

    def test_internal_whitespace_kept(self):  # :21
        assert tok("hello   world   test", strategy="keyword", lowercase=False) == [
            "hello   world   test"]

    def test_empty(self):  # :26
        assert tok("", strategy="keyword", lowercase=False) == []

    def test_whitespace_only(self):  # :31
        assert tok("   ", strategy="keyword", lowercase=False) == []

    def test_special_chars(self):  # :36
        assert tok("SKU-12345-XYZ", strategy="keyword", lowercase=False) == [
            "SKU-12345-XYZ"]

    def test_punct(self):  # :41
        assert tok("user@example.com", strategy="keyword", lowercase=False) == [
            "user@example.com"]

    def test_unicode(self):  # :46
        assert tok("café-résumé", strategy="keyword", lowercase=False) == [
            "café-résumé"]

    def test_lowercase(self):  # :59
        assert tok("PRODUCT-SKU-123", strategy="keyword", lowercase=True) == [
            "product-sku-123"]

    def test_lowercase_unicode(self):  # :64
        assert tok("CAFÉ", strategy="keyword", lowercase=True) == ["café"]

    def test_remove_punct(self):  # :79
        assert tok("SKU-12345-XYZ!", strategy="keyword", lowercase=False,
                   remove_punctuation=True) == ["SKU12345XYZ"]

    def test_remove_punct_empty(self):  # :84
        assert tok("!!!", strategy="keyword", lowercase=False,
                   remove_punctuation=True) == []

    def test_product_sku(self):  # :91
        assert tok("PROD-2024-ABC-001", strategy="keyword", lowercase=False) == [
            "PROD-2024-ABC-001"]

    def test_uuid(self):  # :96
        assert tok("UUID-123e4567-e89b-12d3", strategy="keyword",
                   lowercase=False) == ["UUID-123e4567-e89b-12d3"]

    def test_category(self):  # :101
        assert tok("Electronics & Computers", strategy="keyword",
                   lowercase=False) == ["Electronics & Computers"]


# ---- spec/pattern_tokenizer_spec.rb + preserve_patterns_spec.rb -------------

class TestPatternAndPreserveSpec:
    def test_word_pattern(self):  # pattern:4
        tk.configure(strategy="pattern", regex=r"\w+")
        assert tok("Hello, world! Test.") == ["hello", "world", "test"]

    def test_alnum_pattern(self):  # pattern:14
        tk.configure(strategy="pattern", regex="[a-zA-Z0-9]+")
        assert tok("Test123 abc456") == ["test123", "abc456"]

    def test_delimiter_pattern(self):  # pattern:24
        tk.configure(strategy="pattern", regex="[^,]+")
        assert tok("apple,banana,cherry") == ["apple", "banana", "cherry"]

    def test_measurements(self):  # preserve:12
        tk.configure(preserve_patterns=[r"(?i)\d+(ug|mg|ml)"])
        t = tok("Give patient 100ug daily dose")
        for w in ("100ug", "give", "patient", "daily", "dose"):
            assert w in t

    def test_case_kept_no_lowercase(self):  # preserve:17
        tk.configure(preserve_patterns=[r"(?i)\d+(ug|mg|ml)"])
        assert "100UG" in tok("100UG dose", lowercase=False)

    def test_hyphenated(self):  # preserve:31
        tk.configure(preserve_patterns=[r"(?i)anti-cd\d+", r"(?i)\w+(?:-\w+)+"])
        t = tok("anti-cd3 antibody treatment")
        for w in ("anti-cd3", "antibody", "treatment"):
            assert w in t

    def test_multi_hyphen(self):  # preserve:36
        tk.configure(preserve_patterns=[r"(?i)anti-cd\d+", r"(?i)\w+(?:-\w+)+"])
        t = tok("top-of-the-line product")
        assert "top-of-the-line" in t and "product" in t

    def test_overlapping_first_wins(self):  # preserve:50
        tk.configure(preserve_patterns=[r"\d+", r"(?i)\d+mg"])
        t = tok("Take 100mg daily")
        for w in ("100mg", "take", "daily"):
            assert w in t

    def test_without_preserve(self):  # preserve:57
        assert tok("anti-cd3 antibody") == ["anti", "cd3", "antibody"]

    def test_invalid_preserve_raises(self):  # preserve:64
        with pytest.raises(ConfigError, match="Invalid regex pattern"):
            tk.configure(preserve_patterns=["[invalid(regex"])


# ---- spec/tokenizer_instance_spec.rb ----------------------------------------

class TestAnalyzerInstanceSpec:
    def test_default_instance(self):  # :8
        a = Analyzer(AnalyzerConfig())
        assert isinstance(a.config, AnalyzerConfig)

    def test_kwargs_config(self):  # :14
        a = Analyzer(AnalyzerConfig(strategy="whitespace", lowercase=False))
        assert a.config.strategy == "whitespace" and a.config.lowercase is False

    def test_config_object(self):  # :20
        cfg = AnalyzerConfig(strategy="unicode", lowercase=False)
        a = Analyzer(cfg)
        assert a.config.strategy == "unicode" and a.config.lowercase is False

    def test_ngram_params(self):  # :31
        a = Analyzer(AnalyzerConfig(strategy="ngram", min_gram=3, max_gram=5))
        assert a.config.min_gram == 3 and a.config.max_gram == 5

    def test_inherits_global_defaults(self):  # :43
        tk.configure(strategy="whitespace", remove_punctuation=True)
        cfg = tk.current_config().replace(lowercase=False)
        a = Analyzer(cfg)
        assert a.config.strategy == "whitespace"
        assert a.config.lowercase is False
        assert a.config.remove_punctuation is True

    def test_instance_strategies_differ(self):  # :57
        t1 = Analyzer(AnalyzerConfig(strategy="whitespace"))
        t2 = Analyzer(AnalyzerConfig(strategy="unicode"))
        text = "hello-world test"
        assert t1.tokenize(text) == ["hello-world", "test"]
        assert t2.tokenize(text) == ["hello", "world", "test"]

    def test_instance_lowercase(self):  # :66
        t1 = Analyzer(AnalyzerConfig(lowercase=True))
        t2 = Analyzer(AnalyzerConfig(lowercase=False))
        assert t1.tokenize("Hello World") == ["hello", "world"]
        assert t2.tokenize("Hello World") == ["Hello", "World"]

    def test_instance_preserve(self):  # :75
        t1 = Analyzer(AnalyzerConfig(preserve_patterns=[r"(?i)anti-\w+"]))
        t2 = Analyzer(AnalyzerConfig(preserve_patterns=[]))
        text = "This anti-inflammatory medicine"
        assert "anti-inflammatory" in t1.tokenize(text)
        r2 = t2.tokenize(text)
        assert "anti-inflammatory" not in r2
        assert "anti" in r2 and "inflammatory" in r2

    def test_concurrent_instances(self):  # :93
        results = []
        lock = threading.Lock()

        def work(i):
            a = Analyzer(AnalyzerConfig(
                strategy="whitespace" if i % 2 == 0 else "unicode",
                lowercase=i < 5,
            ))
            r = a.tokenize("Hello World Test")
            with lock:
                results.append(tuple(r))

        threads = [threading.Thread(target=work, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 10
        assert len(set(results)) > 1

    def test_global_change_does_not_affect_instance(self):  # :162
        a = Analyzer(AnalyzerConfig(strategy="whitespace"))
        tk.configure(strategy="unicode")
        assert a.tokenize("hello-world") == ["hello-world"]

    def test_instances_independent(self):  # :174
        t1 = Analyzer(AnalyzerConfig(strategy="whitespace"))
        t2 = Analyzer(AnalyzerConfig(strategy="unicode"))
        assert t1.tokenize("hello-world") == ["hello-world"]
        assert t2.tokenize("hello-world") == ["hello", "world"]
        t3 = Analyzer(AnalyzerConfig(strategy="letter"))
        assert t3.tokenize("hello123") == ["hello"]

    @pytest.mark.parametrize(
        "strategy,kwargs,text,check",
        [
            ("unicode", {}, "hello-world", ("count", 2)),
            ("whitespace", {}, "hello world", ("count", 2)),
            ("letter", {}, "hello123world", ("count", 2)),
            ("lowercase", {}, "HeLLo WoRLD", ("includes", ["hello", "world"])),
            ("keyword", {}, "hello world", ("first", "hello world")),
            ("sentence", {}, "Hello. World!", ("count", 2)),
            ("ngram", {"min_gram": 2, "max_gram": 3}, "test", ("includes", ["te", "tes"])),
            ("edge_ngram", {"min_gram": 2, "max_gram": 3}, "test", ("includes", ["te", "tes"])),
            ("path_hierarchy", {"delimiter": "/"}, "/usr/local/bin", ("includes", ["/usr"])),
            ("char_group", {"split_on_chars": ","}, "hello,world", ("count", 2)),
            ("grapheme", {}, "hello", ("count", 5)),
        ],
    )
    def test_all_strategies(self, strategy, kwargs, text, check):  # :188-225
        a = Analyzer(AnalyzerConfig(strategy=strategy, **kwargs))
        result = a.tokenize(text)
        kind, want = check
        if kind == "count":
            assert len(result) == want
        elif kind == "first":
            assert result[0] == want
        else:
            for w in want:
                assert w in result

    def test_many_instances(self):  # :228
        analyzers = [
            Analyzer(AnalyzerConfig(strategy="unicode" if i % 2 == 0 else "whitespace"))
            for i in range(100)
        ]
        for a in analyzers:
            assert isinstance(a.tokenize("test text"), list)

    def test_isolates_config_between_threaded_instances(self):  # :116
        import time as _time

        out = {}

        def make(name, strategy):
            a = Analyzer(AnalyzerConfig(strategy=strategy))
            _time.sleep(0.01)
            out[name] = a.config.strategy

        t1 = threading.Thread(target=make, args=("a", "whitespace"))
        t2 = threading.Thread(target=make, args=("b", "unicode"))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert out == {"a": "whitespace", "b": "unicode"}

    def test_rapid_instance_creation(self):  # :139
        errors = []
        strategies = ["whitespace", "unicode", "letter"]

        def work(i):
            try:
                a = Analyzer(AnalyzerConfig(
                    strategy=strategies[i % 3], lowercase=bool(i % 2)))
                a.tokenize("test text")
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(100)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []

    def test_releases_resources(self):  # :239
        import gc

        for _ in range(1000):
            Analyzer(AnalyzerConfig(strategy="unicode")).tokenize("test")
        gc.collect()
        assert Analyzer(AnalyzerConfig()).tokenize("test") == ["test"]


# ---- spec/configuration_spec.rb + configuration_immutability_spec.rb --------

class TestConfigurationSpec:
    def test_default_strategy(self):  # configuration:10
        assert AnalyzerConfig().strategy == "unicode"

    def test_boolean_flags(self):  # configuration:15
        cfg = AnalyzerConfig(lowercase=False, remove_punctuation=True)
        assert cfg.lowercase is False and cfg.remove_punctuation is True

    def test_preserve_list(self):  # configuration:24
        cfg = AnalyzerConfig(preserve_patterns=["email", "url"])
        assert list(cfg.preserve_patterns) == ["email", "url"]

    def test_predicates(self):  # configuration:31-49
        assert AnalyzerConfig(strategy="pattern", regex=r"\w+").is_pattern
        assert AnalyzerConfig(strategy="grapheme").is_grapheme
        assert AnalyzerConfig(strategy="edge_ngram").is_edge_ngram
        assert AnalyzerConfig(strategy="path_hierarchy").is_path_hierarchy

    def test_strategy_accessors(self):  # configuration:53-85
        assert AnalyzerConfig(strategy="pattern", regex=r"\w+").regex == r"\w+"
        assert AnalyzerConfig(strategy="grapheme", extended=False).extended is False
        cfg = AnalyzerConfig(strategy="edge_ngram", min_gram=3, max_gram=7)
        assert cfg.min_gram == 3 and cfg.max_gram == 7
        assert AnalyzerConfig(strategy="path_hierarchy", delimiter="\\").delimiter == "\\"

    def test_to_hash_is_copy(self):  # configuration:88 / immutability:28
        cfg = AnalyzerConfig()
        h = cfg.to_hash()
        h["strategy"] = "whitespace"
        assert cfg.strategy == "unicode"

    def test_config_hash_reflects_state(self):  # configuration:109-136
        tk.configure(strategy="path_hierarchy", delimiter="|", lowercase=False)
        h = tk.current_config().to_hash()
        assert h["strategy"] == "path_hierarchy"
        assert h["delimiter"] == "|"
        assert h["lowercase"] is False

    def test_frozen(self):  # immutability:7
        cfg = AnalyzerConfig()
        with pytest.raises(Exception):
            cfg.strategy = "whitespace"

    def test_preserve_tuple_immutable(self):  # immutability:19
        cfg = AnalyzerConfig(preserve_patterns=["p1", "p2"])
        assert isinstance(cfg.preserve_patterns, tuple)  # no .append

    def test_reset_restores_defaults(self):  # immutability:52
        tk.configure(strategy="pattern", regex=r"\w+", lowercase=False,
                     remove_punctuation=True, preserve_patterns=[r"test"],
                     min_gram=5, max_gram=15)
        tk.reset()
        cfg = tk.current_config()
        assert cfg.strategy == "unicode"
        assert cfg.lowercase is True
        assert cfg.remove_punctuation is False
        assert cfg.preserve_patterns == ()
        assert cfg.min_gram == 2 and cfg.max_gram == 10

    def test_snapshot_immutable(self):  # immutability:76
        tk.configure(strategy="whitespace", lowercase=False)
        snap = tk.current_config()
        tk.configure(strategy="unicode", lowercase=True)
        assert snap.strategy == "whitespace" and snap.lowercase is False
        now = tk.current_config()
        assert now.strategy == "unicode" and now.lowercase is True

    def test_percall_preserve_isolation(self):  # immutability:121
        tk.configure(preserve_patterns=[r"GENE-\d+"])
        tok("GENE-123 test", preserve=[r"test"])
        assert "GENE-456" in tok("GENE-456 test")

    def test_invalid_strategy(self):  # immutability:139
        with pytest.raises(ConfigError, match="Invalid strategy"):
            tk.configure(strategy="invalid_strategy")

    def test_percall_does_not_touch_global(self):  # immutability:104
        tk.configure(strategy="unicode", lowercase=True)
        tok("Test Text", strategy="whitespace", lowercase=False)
        cfg = tk.current_config()
        assert cfg.strategy == "unicode" and cfg.lowercase is True

    def test_min_max_gram_relationship(self):  # immutability:147
        with pytest.raises(ConfigError, match=r"max_gram .* must be >= min_gram"):
            tk.configure(strategy="edge_ngram", min_gram=10, max_gram=5)

    def test_lifecycle_flow(self):  # immutability:159
        tk.configure(strategy="whitespace", lowercase=False)
        assert tok("Test One") == ["Test", "One"]
        tk.reset()
        assert tok("Test Two") == ["test", "two"]
        tk.configure(strategy="unicode", lowercase=False)
        assert tok("Test Three") == ["Test", "Three"]


# ---- spec/configuration_state_machine_spec.rb -------------------------------

class TestConfigStateMachine:
    def test_default_to_configured(self):  # :8
        assert tk.current_config().strategy == "unicode"
        assert tk.current_config().lowercase is True
        tk.configure(strategy="whitespace", lowercase=False)
        assert tok("Test Text") == ["Test", "Text"]

    def test_transitions_between_strategies(self):  # :27
        for s in ("unicode", "whitespace", "letter", "sentence", "keyword"):
            tk.configure(strategy=s)
            assert tk.current_config().strategy == s
            assert isinstance(tok("test text"), list)

    def test_configure_tokenize_cycle(self):  # :40
        tk.configure(strategy="whitespace", lowercase=False)
        assert tok("First Test") == ["First", "Test"]
        tk.configure(strategy="unicode", lowercase=True)
        assert tok("Second Test") == ["second", "test"]

    def test_reset_configure_cycle(self):  # :60
        tk.configure(strategy="pattern", regex=r"\w+", lowercase=False,
                     remove_punctuation=True)
        tk.reset()
        cfg = tk.current_config()
        assert cfg.strategy == "unicode" and cfg.lowercase is True
        assert cfg.remove_punctuation is False
        tk.configure(strategy="whitespace")
        assert tk.current_config().strategy == "whitespace"

    def test_rollback_on_validation_error(self):  # :85
        tk.configure(strategy="unicode", lowercase=False,
                     preserve_patterns=[r"test"])
        with pytest.raises(ConfigError):
            tk.configure(strategy="edge_ngram", min_gram=-5)
        cfg = tk.current_config()
        assert cfg.strategy == "unicode"
        assert cfg.lowercase is False
        assert cfg.preserve_patterns == (r"test",)

    def test_rollback_invalid_strategy(self):  # :127
        initial = tk.current_config().strategy
        with pytest.raises(ConfigError):
            tk.configure(strategy="nonexistent_strategy")
        assert tk.current_config().strategy == initial

    def test_partial_updates(self):  # :157
        tk.configure(strategy="edge_ngram", min_gram=2, max_gram=5)
        tk.configure(max_gram=10)
        cfg = tk.current_config()
        assert cfg.strategy == "edge_ngram"
        assert cfg.min_gram == 2 and cfg.max_gram == 10

    def test_patterns_survive_strategy_change(self):  # :187
        tk.configure(strategy="unicode", preserve_patterns=[r"GENE-\d+", r"v\d+\.\d+"])
        tk.configure(strategy="whitespace")
        assert tk.current_config().preserve_patterns == (r"GENE-\d+", r"v\d+\.\d+")
        t = tok("GENE-123 v2.0 test")
        assert "GENE-123" in t and "v2.0" in t

    def test_gram_params_retained(self):  # :208
        tk.configure(strategy="edge_ngram", min_gram=3, max_gram=7)
        tk.configure(strategy="unicode")
        assert tk.current_config().min_gram == 3
        tk.configure(strategy="edge_ngram")
        cfg = tk.current_config()
        assert cfg.min_gram == 3 and cfg.max_gram == 7

    def test_empty_configure(self):  # :239
        initial = tk.current_config().strategy
        tk.configure()
        assert tk.current_config().strategy == initial
        assert isinstance(tok("test"), list)

    def test_rapid_resets(self):  # :249
        for _ in range(5):
            tk.configure(strategy="whitespace")
            tk.reset()
            assert tk.current_config().strategy == "unicode"

    def test_atomic_apply(self):  # :286
        tk.configure(strategy="edge_ngram", min_gram=2, max_gram=5,
                     lowercase=False, remove_punctuation=True)
        cfg = tk.current_config()
        assert (cfg.strategy, cfg.min_gram, cfg.max_gram) == ("edge_ngram", 2, 5)
        assert cfg.lowercase is False and cfg.remove_punctuation is True

    def test_atomic_rollback(self):  # :303
        tk.configure(strategy="unicode", lowercase=False,
                     remove_punctuation=False, preserve_patterns=[])
        with pytest.raises(ConfigError):
            tk.configure(strategy="edge_ngram", lowercase=True,
                         remove_punctuation=True, min_gram=5, max_gram=3)
        cfg = tk.current_config()
        assert cfg.strategy == "unicode"
        assert cfg.lowercase is False
        assert cfg.remove_punctuation is False

    def test_rollback_on_engine_side_errors(self):  # :111
        initial = tk.current_config().strategy
        with pytest.raises(Exception):
            tk.configure(strategy="pattern", regex="[invalid(")
            tok("test")
        assert tk.current_config().strategy == initial

    def test_config_and_hash_stay_consistent(self):  # :141
        tk.configure(strategy="whitespace", lowercase=False)
        cfg = tk.current_config()
        assert cfg.strategy == "whitespace"
        assert cfg.lowercase is False
        h = cfg.to_hash()  # the reference's config_hash introspection
        assert h["strategy"] == "whitespace"
        assert h["lowercase"] is False

    def test_rapid_strategy_switching(self):  # :176
        strategies = ["unicode", "whitespace", "letter", "lowercase", "sentence"]
        for i in range(10):
            tk.configure(strategy=strategies[i % len(strategies)])
            assert isinstance(tok("Quick test"), list)

    def test_configure_without_changes(self):  # :257
        tk.configure()  # no kwargs: valid, applies current config
        assert isinstance(tok("test"), list)

    def test_percall_options_leave_global_intact(self):  # :266
        tk.configure(strategy="unicode", lowercase=True)
        tok("TEST", strategy="whitespace", lowercase=False)
        cfg = tk.current_config()
        assert cfg.strategy == "unicode"
        assert cfg.lowercase is True
        assert tok("TEST") == ["test"]


# ---- spec/thread_safety_spec.rb ---------------------------------------------

class TestThreadSafety:
    def test_concurrent_tokenization(self):  # :7
        results = []
        lock = threading.Lock()

        def work(i):
            r = tok(f"thread {i} text")
            with lock:
                results.append(r)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 10
        for r in results:
            assert isinstance(r, list) and len(r) >= 2

    def test_concurrent_percall_options(self):  # :110
        strategies = ["whitespace", "unicode", "letter"]
        results = []
        lock = threading.Lock()

        def work(i):
            r = tok(f"Test TEXT {i}", strategy=strategies[i % 3],
                    lowercase=bool(i % 2))
            with lock:
                results.append(r)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 10
        assert all(isinstance(r, list) for r in results)

    def test_rapid_config_changes(self):  # :136
        strategies = ["whitespace", "unicode", "letter"]
        for i in range(100):
            tk.configure(strategy=strategies[i % 3], lowercase=bool(i % 2))
        assert isinstance(tok("test"), list)

    def test_concurrent_reset_configure(self):  # :156
        errors = []

        def work():
            try:
                tk.reset()
                tk.configure(strategy="unicode")
                tok("test")
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=work) for _ in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []

    def test_same_config_same_result(self):  # :180
        tk.configure(strategy="unicode", lowercase=True)
        results = []
        lock = threading.Lock()

        def work():
            r = tok("Hello World")
            with lock:
                results.append(tuple(r))

        threads = [threading.Thread(target=work) for _ in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(results) == {("hello", "world")}

    def test_repeated_configuration_no_leak(self):  # :282 (smoke)
        for i in range(1000):
            tk.configure(strategy="whitespace" if i % 2 == 0 else "unicode",
                         preserve_patterns=[r"test", r"pattern"])
            tok("test text with patterns")

    def test_concurrent_configure_and_tokenize(self):  # :28
        errors, results = [], []
        lock = threading.Lock()

        def configure_and_tok(i):
            try:
                tk.configure(
                    strategy=["whitespace", "unicode", "letter"][i % 3],
                    lowercase=bool(i % 2),
                )
                r = tok(f"Test TEXT {i}")
                with lock:
                    results.append(r)
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append(e)

        def tok_only(i):
            try:
                r = tok(f"Test TEXT {i}")
                with lock:
                    results.append(r)
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append(e)

        threads = [threading.Thread(target=configure_and_tok, args=(i,)) for i in range(5)]
        threads += [threading.Thread(target=tok_only, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        assert len(results) == 10

    def test_config_is_global_last_writer_wins(self):  # :70
        import time as _time

        config_values, tokenize_results = [], []
        lock = threading.Lock()

        def work(i):
            tk.configure(strategy="whitespace" if i == 0 else "unicode")
            _time.sleep(0.01)
            with lock:
                config_values.append(tk.current_config().strategy)
                tokenize_results.append(tok("hello-world"))

        threads = [threading.Thread(target=work, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(config_values) == 2
        assert len(tokenize_results) == 2
        flat = {t for r in tokenize_results for t in r}
        assert "hello" in flat  # unicode splits the hyphen; ws keeps it

    def test_tokenize_does_not_block_peers(self):  # :206
        import time as _time

        starts, ends = [], []
        lock = threading.Lock()
        # Release all workers together so "overlap" is a property of
        # tokenize (no global lock held across calls), not of how fast
        # the OS scheduler spawned the threads on a loaded box.
        barrier = threading.Barrier(5)

        def work(i):
            barrier.wait(timeout=10)
            with lock:
                starts.append(_time.monotonic())
            tok(f"This is test text number {i}")
            with lock:
                ends.append(_time.monotonic())

        threads = [threading.Thread(target=work, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # generous slack: scheduler jitter on a throttled VM, not lock time
        assert max(starts) < min(ends) + 0.25  # threads overlapped

    def test_config_changes_during_tokenization(self):  # :230
        import time as _time

        results = []
        lock = threading.Lock()

        def reconf(i):
            tk.configure(strategy="whitespace" if i % 2 == 0 else "unicode")
            _time.sleep(0.001)

        def work():
            _time.sleep(0.001)
            r = tok("hello-world")
            with lock:
                results.append(r)

        threads = [threading.Thread(target=reconf, args=(i,)) for i in range(5)]
        threads += [threading.Thread(target=work) for _ in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 10
        assert all(r for r in results)

    def test_high_concurrency_efficiency(self):  # :262
        import time as _time

        t0 = _time.monotonic()
        threads = [
            threading.Thread(
                target=lambda i=i: [tok(f"Test text {i}") for _ in range(10)]
            )
            for i in range(100)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # the spec allows 1.0s in Ruby/Rust; pure Python + regex gets
        # headroom but must stay interactive
        assert _time.monotonic() - t0 < 10.0


# ---- legacy grapheme mode (UAX-29 Table 1b; reference lib.rs:159-165) -------

class TestLegacyGraphemeMode:
    """extended=False removes exactly GB9a (SpacingMark) and GB9b
    (Prepend) from the extended rules (VERDICT r01 missing item 4)."""

    @pytest.mark.parametrize(
        "s,n_ext,n_legacy",
        [
            ("நி", 1, 2),          # Tamil vowel sign (SpacingMark)
            ("का", 1, 2),          # Devanagari AA (SpacingMark)
            ("؀١", 1, 2),  # Arabic number sign (Prepend) + digit
            ("؀ؐ", 1, 1),  # Prepend + Extend: GB9 keeps both modes
            ("กำ", 1, 2),  # Thai SARA AM (Lo but GCB=SpacingMark)
            ("ကး", 2, 2),  # SpacingMark-exception Mc: split in BOTH
            ("각", 1, 1),           # Hangul syllable
            ("👨‍👩‍👧‍👦", 1, 1),    # ZWJ family (GB11 in both modes)
            ("é", 1, 1),            # NFC precomposed
            ("é", 1, 1),      # combining acute (Mn) attaches in both
            ("🇺🇸", 1, 1),          # regional indicator pair
        ],
    )
    def test_mode_deltas(self, s, n_ext, n_legacy):
        assert len(tok(s, strategy="grapheme", lowercase=False)) == n_ext
        assert len(tok(s, strategy="grapheme", extended=False,
                       lowercase=False)) == n_legacy
