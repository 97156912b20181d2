"""RAKE — Rapid Automatic Keyword Extraction (Rose, Engel, Cramer &
Cowley, "Automatic keyword extraction from individual documents",
Text Mining: Applications and Theory, 2010).

Candidate phrases are the maximal runs of content words between
stopword/punctuation delimiters; each content word w is scored by
deg(w)/freq(w) where, over all of the document's candidate phrase
occurrences, freq(w) counts w's occurrences and deg(w) sums the
length of every phrase occurrence containing w (co-occurrence degree,
self included — the paper's word-graph degree); a phrase scores the
sum of its member words' scores (with multiplicity). Unlike tf-idf /
TextRank keywording (ops/textstats.py), RAKE needs NO corpus
statistics — it is the single-document extractor, which is exactly
why it distributes embarrassingly.

Scale shape: everything is doc-partitioned — one posexplode, one
run-grouping window per doc, two doc-keyed aggregates, one doc-keyed
join. No corpus-wide shuffle at all beyond the initial scan; at
10^12 docs the job is a single map-side pipeline per partition after
the per-doc window (docs are small, partitions hold many). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.analyzers.filters import ENGLISH_STOPWORDS

# punctuation (any non-alphanumeric, non-space run) splits the text
# into fragments — a phrase can never cross it; within a fragment,
# stopwords are the remaining delimiters
_PUNCT_RX = r"[^a-z0-9\s]+"


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    min_phrase_len: int = 1,
    stopwords: frozenset = ENGLISH_STOPWORDS,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k RAKE keyphrases per document: (doc_id, rank, phrase,
    n_words, score), rank by (score desc, phrase asc) per doc."""
    frags = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.col(text_col)), _PUNCT_RX)
        ).alias("fidx", "frag"),
    )
    toks = frags.select(
        "doc_id", "fidx",
        F.posexplode(F.split(F.col("frag"), r"\s+")).alias("pos", "w"),
    )
    content = toks.filter(
        (F.col("w") != "") & ~F.col("w").isin(*sorted(stopwords))
    )
    # maximal runs of consecutive content positions within a fragment:
    # pos - rank is constant within a run (stopword gaps break the
    # arithmetic chain; punctuation already broke the fragment)
    wd = Window.partitionBy("doc_id", "fidx").orderBy("pos")
    runs = content.withColumn(
        "grp",
        F.concat_ws(
            ":",
            F.col("fidx"),
            (F.col("pos") - F.row_number().over(wd)).cast("string"),
        ),
    )
    phrases = runs.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
    )
    # word stats over candidate occurrences: freq + degree (sum of the
    # containing phrase's length per occurrence)
    occ = runs.join(
        phrases.select("doc_id", "grp", "n_words"), ["doc_id", "grp"]
    )
    wstats = occ.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("n_words").alias("deg"),
    )
    scored = (
        occ.join(wstats, ["doc_id", "w"])
        .groupBy("doc_id", "grp")
        .agg(F.sum(F.col("deg") / F.col("freq")).alias("score"))
        .join(phrases, ["doc_id", "grp"])
        .filter(F.col("n_words") >= min_phrase_len)
        # identical phrases in one doc keep their best (equal) score,
        # merged so ranks are over distinct phrases
        .groupBy("doc_id", "phrase", "n_words")
        .agg(F.round(F.max("score"), round_digits).alias("score"))
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "phrase", "n_words", "score")
        .orderBy("doc_id", "rank")
    )
