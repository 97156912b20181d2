"""Porter stemmer conformance + filter-chain semantics (incl. the
preserve-pattern exemption) on both the Python and Spark paths."""

import pytest

from tokenkit_spark.analyzers.filters import (
    ENGLISH_STOPWORDS,
    FilterChain,
    filter_chain_col,
)
from tokenkit_spark.analyzers.stem import porter_stem

# Published example pairs from Porter 1980 (full-pipeline outputs;
# 'differentli' continues past the paper's step-2 illustration to
# 'differ' via step 4 -ent removal).
PORTER_PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll",
}


@pytest.mark.parametrize("word,want", sorted(PORTER_PAIRS.items()))
def test_porter_published_pairs(word, want):
    assert porter_stem(word) == want


def test_porter_short_words_untouched():
    for w in ("a", "is", "be", "go"):
        assert porter_stem(w) == w


class TestFilterChain:
    def test_stopwords_keep_order_and_dups(self):
        chain = FilterChain(stopwords=ENGLISH_STOPWORDS).compile()
        assert chain(["the", "cat", "and", "the", "hat", "hat"]) == ["cat", "hat", "hat"]

    def test_stem_chain(self):
        chain = FilterChain(stem=True).compile()
        assert chain(["running", "flies", "BRCA1"]) == ["run", "fli", "BRCA1"]

    def test_preserve_exempts_stop_and_stem(self):
        chain = FilterChain(
            stopwords=frozenset({"the", "running"}),
            stem=True,
            preserve_patterns=(r"[A-Z]+\d+", r"running"),
        ).compile()
        # BRCA1 not stemmed; 'running' preserved verbatim though stopworded
        assert chain(["the", "BRCA1", "running", "jumped"]) == ["BRCA1", "running", "jump"]

    def test_none_passthrough(self):
        assert FilterChain(stem=True).compile()(None) is None


class TestFilterChainSpark:
    def test_native_stopword_path(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(["the", "dog", "and", "the", "dog"],)], "toks array<string>"
        )
        chain = FilterChain(stopwords=ENGLISH_STOPWORDS)
        out = df.select(filter_chain_col("toks", chain).alias("f")).first()["f"]
        assert out == ["dog", "dog"]
        # native path: no BatchEvalPython/ArrowEvalPython in the plan
        plan = df.select(filter_chain_col("toks", chain))._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_udf_stem_preserve_path(self, spark):
        df = spark.createDataFrame(
            [(["the", "BRCA1", "generalization", "agreed"],)], "toks array<string>"
        )
        chain = FilterChain(
            stopwords=ENGLISH_STOPWORDS, stem=True, preserve_patterns=(r"[A-Z]+\d+",)
        )
        out = df.select(filter_chain_col("toks", chain).alias("f")).first()["f"]
        assert out == ["BRCA1", "gener", "agre"]


class TestAsciiFold:
    def test_python_fold(self):
        from tokenkit_spark.analyzers.filters import ascii_fold

        assert ascii_fold("café résumé naïve ñoño ôtel ü") == (
            "cafe resume naive nono otel u"
        )
        assert ascii_fold("æon ßtraße Œuvre Øre łódź") == "aeon sstrasse OEuvre Ore lodz"
        assert ascii_fold("İstanbul ıśïk") == "Istanbul isik"  # İ→I like Lucene
        # stroke letters with no NFD decomposition fold 1:1 like Lucene
        assert ascii_fold("ħaġar ŧest ŋame ſtreet ĦŦŊ") == "hagar test name street HTN"
        assert ascii_fold(None) is None
        assert ascii_fold("plain ascii") == "plain ascii"

    def test_spark_parity_and_native(self, spark):
        from pyspark.sql import functions as F

        from tokenkit_spark.analyzers.filters import ascii_fold, ascii_fold_col

        vals = ["café résumé", "æon ßtraße", "Łódź Øre Þing", "no accents", ""]
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        got = [r.f for r in df.select(ascii_fold_col("t").alias("f")).collect()]
        assert got == [ascii_fold(v) for v in vals]
        plan = df.select(ascii_fold_col("t"))._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestSynonyms:
    def test_contract_mode(self, spark):
        from tokenkit_spark.analyzers.filters import synonyms_col

        df = spark.createDataFrame(
            [(["usa", "auto", "dog"],), ([],)], "toks array<string>"
        )
        m = {"usa": "united_states", "auto": "car"}
        got = [r.f for r in df.select(synonyms_col("toks", m).alias("f")).collect()]
        assert got == [["united_states", "car", "dog"], []]
        plan = df.select(synonyms_col("toks", m))._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_expand_mode(self, spark):
        from tokenkit_spark.analyzers.filters import synonyms_col

        df = spark.createDataFrame([(["fast", "dog"],)], "toks array<string>")
        m = {"fast": ["fast", "quick", "rapid"]}
        got = df.select(synonyms_col("toks", m, expand=True).alias("f")).first()["f"]
        assert got == ["fast", "quick", "rapid", "dog"]

    def test_contract_rejects_list_values(self):
        import pytest as _pytest

        from tokenkit_spark.analyzers.filters import synonyms_col

        with _pytest.raises(ValueError):
            synonyms_col("toks", {"a": ["b", "c"]})

    def test_join_path_parity(self, spark):
        from tokenkit_spark.analyzers.filters import apply_synonyms_join, synonyms_col

        rows = [
            (0, ["usa", "dog", "auto"], "x"),
            (1, ["auto", "auto"], "y"),
            (2, [], "z"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, toks array<string>, extra string")
        m = {"usa": "united_states", "auto": "car"}
        syn = spark.createDataFrame(list(m.items()), "term string, canonical string")
        got = {
            r.doc_id: (r.toks, r.extra)
            for r in apply_synonyms_join(df, ["doc_id"], "toks", syn).collect()
        }
        want = {
            r.doc_id: (r.f, r.extra)
            for r in df.select(
                "doc_id", synonyms_col("toks", m).alias("f"), "extra"
            ).collect()
        }
        assert got == want


class TestShingles:
    def test_shingles(self, spark):
        from tokenkit_spark.analyzers.filters import shingles_col

        df = spark.createDataFrame(
            [(["a", "b", "c", "d"],), (["a", "b"],), (["a"],), ([],)],
            "toks array<string>",
        )
        got2 = [r.f for r in df.select(shingles_col("toks", 2).alias("f")).collect()]
        assert got2 == [["a b", "b c", "c d"], ["a b"], [], []]
        got3 = [r.f for r in df.select(shingles_col("toks", 3).alias("f")).collect()]
        assert got3 == [["a b c", "b c d"], [], [], []]
        plan = df.select(shingles_col("toks", 2))._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_bad_n(self):
        import pytest as _pytest

        from tokenkit_spark.analyzers.filters import shingles_col

        with _pytest.raises(ValueError):
            shingles_col("toks", 0)
