"""clean_corpus pipeline semantics: language filter, quality/token
floors, and exact dedup keeping the lowest doc_id per duplicate class."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops.pipeline import clean_corpus
from tokenkit_spark.ops.textstats import detect_language, quality_features

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and then runs back "
    "home with a bone for its young pups before the sun sets on that "
    "warm field of tall grass near the old stone bridge"
)
GOOD_EN2 = (
    "a little boat drifted down the wide river while the birds sang in "
    "the trees and an old man watched from the bank with his dog as "
    "clouds moved slowly over the quiet valley that afternoon"
)
SHORT_EN = "the cat sat on the mat"
NON_EN = (
    "el perro corre por la calle y la casa es grande pero el gato "
    "duerme en la cama porque la noche es fria y los ninos juegan "
    "en el parque con la pelota roja de su madre"
)
JUNK = "%%% !!! ### $$$ ((( ))) @@@ *** ^^^ &&& ~~~ ||| ??? +++ === " * 3


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (0, GOOD_EN),
        (1, GOOD_EN),     # exact dup of 0 -> dropped (0 is canonical)
        (2, GOOD_EN2),
        (3, SHORT_EN),    # under min_tokens
        (4, NON_EN),      # not 'en'
        (5, JUNK),        # quality floor
        (6, GOOD_EN),     # second dup of 0 -> dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_stages(spark, raw):
    out = clean_corpus(raw, langs=("en",), min_quality=0.5, min_tokens=20)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {0, 2}
    assert all(r.lang_pred == "en" for r in got.values())
    assert all(r.quality_score >= 0.5 and r.n_tokens >= 20 for r in got.values())

    # sanity on WHY each loser lost (pins the pipeline to its parts)
    lang = {
        r.doc_id: r.l
        for r in raw.select("doc_id", detect_language(F.col("text")).alias("l")).collect()
    }
    assert lang[4] != "en"
    feats = {r.doc_id: r for r in quality_features(raw).collect()}
    assert feats[3].n_tokens < 20
    assert feats[5].quality_score < 0.5


def test_clean_corpus_keeps_lowest_doc_id(spark, raw):
    # flip ids so the canonical representative is NOT the first row read
    flipped = raw.withColumn(
        "doc_id", F.when(F.col("doc_id") == 0, F.lit(9)).otherwise(F.col("doc_id"))
    )
    ids = {r.doc_id for r in clean_corpus(flipped, min_tokens=20).collect()}
    assert 1 in ids and 9 not in ids and 6 not in ids


def test_clean_corpus_empty_input(spark, raw):
    assert clean_corpus(raw.limit(0)).count() == 0
