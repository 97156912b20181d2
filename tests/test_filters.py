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
