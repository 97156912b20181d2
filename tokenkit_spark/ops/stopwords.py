"""Corpus-driven stopword induction: find the function words of a
corpus from its own statistics instead of a hand-curated list.

The classic signals (Church & Gale, "Poisson mixtures", 1995; Wilbur &
Sirotkin, "The automatic identification of stop words", 1992): a
stopword (1) appears in a large share of documents (high df/N) and
(2) spreads its occurrences EVENLY across those documents — its
per-document distribution is close to uniform, unlike a topical term
that bursts in a few documents. We measure (2) exactly as the
normalized entropy of the term's occurrence distribution over
documents:

    H(t)      = -Σ_d p_d ln p_d,   p_d = tf(t, d) / cf(t)
    H_norm(t) = H(t) / ln(df(t))          (∈ [0, 1], df ≥ 2)

and rank by ``stop_score = (df / N) · H_norm`` — high only when a term
is both widespread and evenly spread. Burstiness cf/df is reported
alongside as the Church-Gale diagnostic (topical terms have high
burstiness, function words ≈ low single digits).

This feeds the filter chain (analyzers/filters.py): a reference-style
deployment on a new language/domain induces its stopword table here
and passes it to ``stopword_filter`` — no curated list required.

Scale shape: one tokenize pass, one (term, doc) aggregate, one term
aggregate, one ordered top-N window. All map-side-combinable
hash aggregates; nothing driver-side; no UDFs. At 10^12 docs the
(term, doc) aggregate is the same shuffle the index build already
pays — in production this piggybacks on the postings relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def induce_stopwords(
    docs: DataFrame,
    top_n: int = 25,
    min_df: int = 2,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-``top_n`` induced stopwords: (rank, term, df, cf, df_ratio,
    burstiness, norm_entropy, stop_score), ranked by stop_score desc
    (ties: term asc). Terms with df < ``min_df`` are excluded —
    H_norm is undefined at df=1 and a 1-doc term is never a stopword.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    td = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    # H(t) = ln(cf) - (Σ_d tf ln tf) / cf  — one aggregate, no second join
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.sum(F.col("tf") * F.log(F.col("tf").cast("double"))).alias("tlt"),
    )
    scored = (
        stats.where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            "cf",
            (F.col("df") / F.col("n_docs")).alias("df_ratio"),
            (F.col("cf") / F.col("df")).alias("burstiness"),
            (
                (F.log(F.col("cf").cast("double")) - F.col("tlt") / F.col("cf"))
                / F.log(F.col("df").cast("double"))
            ).alias("norm_entropy"),
        )
        .withColumn(
            "stop_score", F.col("df_ratio") * F.col("norm_entropy")
        )
    )
    w = Window.orderBy(
        F.round("stop_score", 6).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select(
            "rank",
            "term",
            "df",
            "cf",
            F.round("df_ratio", round_digits).alias("df_ratio"),
            F.round("burstiness", round_digits).alias("burstiness"),
            F.round("norm_entropy", round_digits).alias("norm_entropy"),
            F.round("stop_score", round_digits).alias("stop_score"),
        )
    )
