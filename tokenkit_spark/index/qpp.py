"""Pre-retrieval query performance prediction (QPP) — the classic
predictor battery (He & Ounis 2004; Carmel & Yom-Tov, "Estimating the
Query Difficulty for Information Retrieval", 2010) computed per query
from collection statistics alone, before any scoring:

  * avg_idf / max_idf — specificity of the query vocabulary;
  * avg_ictf — inverse collection term frequency, ln(|C| / cf_t)
    averaged over query terms (He & Ounis's AvICTF);
  * sum_scq — collection-query similarity, Σ (1 + ln cf_t) · idf_t
    (Zhao, Scholer & Tsegay 2008);
  * scs — simplified clarity score, Σ (1/m) · ln( (1/m) / (cf_t/|C|) )
    over the m query terms (He & Ounis's SCS with a uniform query LM);
  * query_scope — -ln(n_union / N): fraction of the corpus touched by
    ≥1 query term (broad queries are hard).

Unmatched query terms (df = 0) are skipped, matching how a search
engine's stats lookup treats them.

Scale shape: one corpus tokenize pass feeds (term → df, cf) and the
union-doc count; query terms broadcast onto it; everything else is one
groupBy(query_id). Predictors are deterministic closed forms — fully
SQL-expressible for the oracle twin.

Reference parity: the reference (scientist-labs/tokenkit) ships no
query engine; the predictor contracts are from the cited public papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .query import _idf


def qpp_predictors(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    qtext_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(query_id, n_terms, avg_idf, max_idf, avg_ictf, sum_scq, scs,
    query_scope) per query — see module doc for the predictor battery."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tstats = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
    )
    g = toks.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("c_size"),
    ).collect()[0]
    n_docs, c_size = int(g.n_docs), int(g.c_size)

    qterms = (
        queries.select(
            "query_id",
            F.explode(F.split(F.lower(F.col(qtext_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    matched = F.broadcast(qterms).join(tstats, "term")
    m = F.count("*")
    idf = _idf(F.col("df"), n_docs)
    per_q = matched.groupBy("query_id").agg(
        m.cast("long").alias("n_terms"),
        F.round(F.avg(idf), round_digits).alias("avg_idf"),
        F.round(F.max(idf), round_digits).alias("max_idf"),
        F.round(
            F.avg(F.log(F.lit(float(c_size)) / F.col("cf"))), round_digits
        ).alias("avg_ictf"),
        F.round(
            F.sum((1.0 + F.log(F.col("cf"))) * idf), round_digits
        ).alias("sum_scq"),
        # scs = Σ (1/m)·ln((1/m)/p_t) = -ln m - (1/m)·Σ ln(cf/|C|)
        F.round(
            -F.log(m.cast("double"))
            - F.sum(F.log(F.col("cf") / F.lit(float(c_size)))) / m,
            round_digits,
        ).alias("scs"),
    )
    scope = (
        F.broadcast(qterms)
        .join(toks, "term")
        .groupBy("query_id")
        .agg(F.countDistinct("doc_id").alias("n_union"))
        .select(
            "query_id",
            F.round(
                -F.log(F.col("n_union") / F.lit(float(n_docs))), round_digits
            ).alias("query_scope"),
        )
    )
    return per_q.join(scope, "query_id").orderBy("query_id")
