"""Entity decode, mojibake repair, encoding stats, readability."""

from pyspark.sql import functions as F

from tokenkit_spark.ops import webclean


def _one(spark, s, fn):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(fn(F.col("t")).alias("o")).collect()[0].o


def test_decode_entities_full(spark):
    assert (
        _one(spark, "a &amp; b &#60;x&#x3E; &rsquo; &zzz;", webclean.decode_entities)
        == "a & b <x> ’ &zzz;"
    )
    # WHATWG quirk: some legacy entities decode WITHOUT a semicolon
    assert _one(spark, "&notit;", webclean.decode_entities) == "¬it;"
    # single-pass: double-encoded decodes ONE level
    assert _one(spark, "&amp;lt;", webclean.decode_entities) == "&lt;"


def test_decode_entities_basic_order(spark):
    # &amp; decodes last, so &amp;lt; does not cascade to '<'
    assert _one(spark, "&amp;lt; &gt;", webclean.decode_entities_basic) == "&lt; >"


def test_mojibake_roundtrip(spark):
    s = "café — über ≠ plain"
    # '≠' (U+2260) mojibakes to 'â\x89 ' which still repairs cleanly
    assert _one(spark, s, lambda c: webclean.fix_mojibake(webclean.mojibake(c))) == s


def test_mojibake_repair_keeps_clean_text(spark):
    # already-correct non-ASCII text must NOT be "repaired": cp1252
    # round-trip of real 'café' bytes fails UTF-8 decode, so it's kept
    assert _one(spark, "café", webclean.fix_mojibake) == "café"
    assert _one(spark, "plain ascii", webclean.fix_mojibake) == "plain ascii"


def test_encoding_stats_flags(spark):
    docs = spark.createDataFrame(
        [(1, "clean text."), (2, "bad � here"), (3, "cafÃ©"), (4, "ctl\x07")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in webclean.encoding_stats(docs).collect()}
    assert rows[1].suspect == 0
    assert rows[2].n_replacement == 1 and rows[2].suspect == 1
    assert rows[3].n_mojibake_sig == 1
    assert rows[4].n_control == 1
    # tab/newline are NOT control damage
    docs2 = spark.createDataFrame([(5, "a\tb\nc")], "doc_id int, text string")
    assert webclean.encoding_stats(docs2).collect()[0].n_control == 0


def test_readability_arithmetic(spark):
    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id int, text string"
    )
    r = webclean.readability(docs).collect()[0]
    assert r.n_words == 6 and r.n_sentences == 2 and r.n_syllables == 6
    # 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(r.flesch - 119.19) < 1e-6
