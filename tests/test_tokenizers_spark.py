"""Spark-side tokenizer tests: the pandas-UDF path and the Catalyst-native
fast path must both agree with the pure-Python analyzer (the conformance
reference), on the same fixtures plus the documents testdata table."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig, get_analyzer
from tokenkit_spark.functions import tokenize_col, tokenize_udf, try_tokenize_native
from tokenkit_spark.functions.native import supports_native

TEXTS = [
    "Hello world",
    "can't won't",
    "anti-CD3",
    "café résumé naïve",
    "Patient has BRCA1 and TP53 mutations",
    "Contact support@example.com or visit https://example.com",
    "  product-sku-123  ",
    "John Doe,30,Software Engineer",
    "/usr/local/bin/ruby",
    "test123done can't 100mg $99.99",
    "",
    None,
    "multi\t whitespace\n\n here",
    "Hello, world! How are you? I am fine.",
    "👨‍👩‍👧‍👦 emoji 👋🌍 test",
    # round-2 conformance additions: multi-char lowercasing, SpacingMark /
    # Prepend legacy-grapheme deltas, unicode separators, log brackets
    "İSTANBUL İZMİR",
    "நி கா กำ ؀١",
    "北京、上海、深圳",
    "[INFO] User logged in successfully",
    "a::b::c x|y|z",
]

CONFIGS = [
    AnalyzerConfig(),
    AnalyzerConfig(strategy="whitespace"),
    AnalyzerConfig(strategy="whitespace", remove_punctuation=True),
    AnalyzerConfig(strategy="whitespace", lowercase=False),
    AnalyzerConfig(strategy="letter"),
    AnalyzerConfig(strategy="lowercase"),
    AnalyzerConfig(strategy="keyword"),
    AnalyzerConfig(strategy="char_group", split_on_chars=", "),
    AnalyzerConfig(strategy="edge_ngram", min_gram=2, max_gram=5),
    AnalyzerConfig(strategy="ngram", min_gram=2, max_gram=3),
    AnalyzerConfig(strategy="pattern", regex=r"\w+"),
    AnalyzerConfig(strategy="grapheme"),
    AnalyzerConfig(strategy="sentence", lowercase=False),
    AnalyzerConfig(strategy="path_hierarchy"),
    AnalyzerConfig(strategy="url_email"),
    AnalyzerConfig(preserve_patterns=(r"BRCA\d+", "TP53")),
    AnalyzerConfig(
        strategy="whitespace", remove_punctuation=True, preserve_patterns=(r"\$\d+(\.\d{2})?",)
    ),
    AnalyzerConfig(strategy="grapheme", extended=False, lowercase=False),
    AnalyzerConfig(strategy="char_group", split_on_chars="、|:", lowercase=False),
    AnalyzerConfig(strategy="ngram", min_gram=2, max_gram=2, remove_punctuation=True),
    AnalyzerConfig(strategy="path_hierarchy", delimiter="::"),
    AnalyzerConfig(strategy="url_email", preserve_patterns=(r"#\w+", r"@\w+")),
    AnalyzerConfig(strategy="edge_ngram", min_gram=3, max_gram=4, lowercase=False),
]


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [Row(id=i, text=t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows).cache()


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"{c.strategy}-{hash(c.key()) & 0xffff:x}")
def test_udf_matches_python(spark, text_df, cfg):
    got = (
        text_df.withColumn("toks", tokenize_udf(cfg)(F.col("text")))
        .orderBy("id")
        .collect()
    )
    an = get_analyzer(cfg)
    for row in got:
        expected = None if row.text is None else an.tokenize(row.text)
        assert row.toks == expected, f"{cfg.strategy}: {row.text!r}"


NATIVE_CONFIGS = [c for c in CONFIGS if supports_native(c)]


@pytest.mark.parametrize(
    "cfg", NATIVE_CONFIGS, ids=lambda c: f"{c.strategy}-{hash(c.key()) & 0xffff:x}"
)
def test_native_matches_python(spark, text_df, cfg):
    got = (
        text_df.withColumn("toks", try_tokenize_native(F.col("text"), cfg))
        .orderBy("id")
        .collect()
    )
    an = get_analyzer(cfg)
    for row in got:
        if row.text is None:
            continue
        assert row.toks == an.tokenize(row.text), f"native {cfg.strategy}: {row.text!r}"


def test_native_coverage():
    # the strategies we promise stay in WholeStageCodegen
    native_strategies = {c.strategy for c in NATIVE_CONFIGS}
    assert {"whitespace", "letter", "lowercase", "keyword", "char_group", "edge_ngram", "ngram"} <= native_strategies


def test_tokenize_col_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        "doc_id", tokenize_col("text", strategy="whitespace").alias("toks")
    ).limit(50)
    rows = out.collect()
    an = get_analyzer(AnalyzerConfig(strategy="whitespace"))
    src = {r.doc_id: r.text for r in docs.limit(50).collect()}
    for r in rows:
        assert r.toks == an.tokenize(src[r.doc_id])


def test_native_path_has_no_python_udf(spark, text_df):
    plan = text_df.select(
        tokenize_col("text", strategy="whitespace").alias("t")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
