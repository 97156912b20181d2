"""URL-type document priors for entry-page search (Kraaij, Westerveld
& Hiemstra, "The Importance of Prior Probabilities for Entry Page
Search", SIGIR 2002): the probability that a page is a site's entry
page depends overwhelmingly on its URL FORM — root URLs are entry
pages far more often than deep files — so a language-model ranker
multiplies its query likelihood by a URL-class prior:

    score(d, q) = log P(q | d) + log P(entry | class(d))

with four URL classes (the paper's taxonomy):

    root     no path segments          (https://host/)
    subroot  one path segment
    path     deeper directory path
    file     deepest segment is a file (contains '.')

Priors are ESTIMATED from a labeled entry-page set with Laplace
smoothing — P(entry|class) = (n_entry + 1) / (n + 2) — exactly as the
paper trains them, then applied as a rank-time additive log prior over
the LM-Dirichlet candidate window.

Shape: URL classification is codegen string ops; priors are a 4-row
aggregate broadcast into the re-rank; the LM stage is the existing
lmsim plan.  Two-stage (LM top-w, then prior re-rank to top-k) keeps
the prior join bounded by the candidate window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.lmsim import lm_dirichlet


def url_class(url_col) -> F.Column:
    """root / subroot / path / file per the Kraaij taxonomy."""
    path = F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    last = F.element_at(segs, -1)
    return (
        F.when(F.size(segs) == 0, "root")
        .when(F.size(segs) == 1, "subroot")
        .when(last.contains("."), "file")
        .otherwise("path")
    )


def entry_priors(
    urls: DataFrame,
    label_col: str = "is_entry",
    url_col: str = "url",
) -> DataFrame:
    """(url_class, n, n_entry, prior): Laplace-smoothed
    P(entry | class) over the labeled set."""
    return (
        urls.select(
            url_class(F.col(url_col)).alias("url_class"),
            F.col(label_col).cast("int").alias("e"),
        )
        .groupBy("url_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("e").cast("long").alias("n_entry"),
        )
        .withColumn(
            "prior", (F.col("n_entry") + 1.0) / (F.col("n") + 2.0)
        )
    )


def url_prior_rerank(
    docs: DataFrame,
    queries: DataFrame,
    urls: DataFrame,
    label_col: str = "is_entry",
    mu: float = 2000.0,
    window: int = 50,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """``urls``: (doc_id, url, is_entry).  LM-Dirichlet top-``window``
    candidates re-ranked by lm_score + ln P(entry | class), top-k per
    query: (query_id, rank, doc_id, score)."""
    cand = lm_dirichlet(docs, queries, mu=mu, k=window,
                        round_digits=round_digits)
    priors = entry_priors(urls, label_col)
    classed = urls.select(
        "doc_id", url_class(F.col("url")).alias("url_class")
    ).join(F.broadcast(priors.select("url_class", "prior")), "url_class")
    rescored = cand.join(classed, "doc_id").withColumn(
        "score2", F.col("score") + F.log(F.col("prior"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score2"), round_digits).desc(), F.col("doc_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round("score2", round_digits).alias("score"),
        )
    )
