"""Phrase suggester (ES ``phrase`` suggester contract): correct a whole
2-term query phrase, not term-by-term — per-position candidates come
from the distance-1 dictionary neighbourhood and whole candidate PAIRS
are ranked by an add-α bigram language model over the corpus, so
"hash joinn" corrects to "hash join" because that PAIR is likely, even
when some per-term candidate has higher df alone.

Scale shape (everything stays relational):

* candidate generation reuses the SymSpell deletion-neighbourhood
  equi-join (`_deletion_variants`) — the dictionary stays distributed,
  only candidates pay the exact JVM ``levenshtein``, and per position
  they cap at ``max_expansions`` by (df desc, term asc);
* candidate pairs per query are bounded by max_expansions², a tiny
  relation that joins the DISTRIBUTED unigram/bigram count tables
  (AQE broadcasts the pair side);
* the LM score ln P(w1) + ln P(w2|w1) with add-α smoothing is pure
  Catalyst arithmetic after the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from ..functions.udfs import tokenize_col
from .query import _deletion_variants


def phrase_suggest(
    spark: SparkSession,
    index: dict,
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    n: int = 3,
    alpha: float = 0.5,
    max_expansions: int = 10,
) -> DataFrame:
    """Top-``n`` whole-phrase corrections per 2-term query.

    ``queries``: (query_id, text); queries that do not analyze to
    exactly two terms are dropped (the ES phrase suggester's shingle
    scorer is bigram-based — longer inputs chain the same machinery).
    Returns (query_id, rank, w1, w2, score, is_original).
    """
    cfg = config or AnalyzerConfig()
    qt = queries.select(
        "query_id", F.posexplode(tokenize_col("text", cfg)).alias("pos", "qterm")
    )
    two = qt.groupBy("query_id").count().filter(F.col("count") == 2).select("query_id")
    qt = qt.join(F.broadcast(two), "query_id")

    # --- per-position distance<=1 candidates, capped by (df desc, term) ---
    qv = qt.select(
        "query_id", "pos", "qterm",
        F.explode(_deletion_variants("qterm")).alias("variant"),
    )
    dv = index["term_stats"].select(
        "term", "df", F.explode(_deletion_variants("term")).alias("variant")
    )
    cand = (
        dv.join(F.broadcast(qv), "variant")
        .select("query_id", "pos", "qterm", "term", "df")
        .distinct()
        .filter(F.levenshtein(F.col("qterm"), F.col("term")) <= 1)
    )
    wexp = Window.partitionBy("query_id", "pos").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    cand = (
        cand.withColumn("__r", F.row_number().over(wexp))
        .filter(F.col("__r") <= max_expansions)
        .drop("__r", "df")
    )

    pairs = (
        cand.filter(F.col("pos") == 0)
        .select("query_id", F.col("term").alias("w1"), F.col("qterm").alias("q1"))
        .join(
            cand.filter(F.col("pos") == 1).select(
                "query_id", F.col("term").alias("w2"), F.col("qterm").alias("q2")
            ),
            "query_id",
        )
    )

    # --- corpus LM tables (distributed), built with the SAME analyzer as
    # the query/dictionary side — a stemming or punctuation-stripping
    # config would otherwise produce candidates the LM tables have never
    # seen, collapsing every pair to the smoothed-zero score
    tok_arr = docs.select(tokenize_col("text", cfg).alias("toks"))
    toks = tok_arr.select(F.explode("toks").alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    bigram = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i).alias("w1"),
                F.element_at(F.col("toks"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    bi = (
        tok_arr.select(F.explode(bigram).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    g = toks.agg(
        F.count(F.lit(1)).alias("n_tok"), F.countDistinct("term").alias("vocab")
    )

    a = float(alpha)
    scored = (
        pairs.join(uni.withColumnRenamed("term", "w1"), "w1", "left")
        .join(bi, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(g))
        .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
        .withColumn("c12", F.coalesce(F.col("c12"), F.lit(0)))
        .withColumn(
            "score",
            F.round(
                F.log((F.col("c1") + a) / (F.col("n_tok") + a * F.col("vocab")))
                + F.log((F.col("c12") + a) / (F.col("c1") + a * F.col("vocab"))),
                4,
            ),
        )
        .withColumn(
            "is_original", (F.col("w1") == F.col("q1")) & (F.col("w2") == F.col("q2"))
        )
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= n)
        .select("query_id", "rank", "w1", "w2", "score", "is_original")
    )
