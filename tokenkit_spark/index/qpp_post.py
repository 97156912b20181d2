"""Post-retrieval query performance prediction, fully relational.

The three classic predictors computed FROM the result list (vs the
pre-retrieval battery in index/qpp.py), per Carmel & Yom-Tov's QPP
survey ("Estimating the Query Difficulty for Information Retrieval",
Morgan & Claypool 2010):

* **Clarity** (Cronen-Townsend, Zhou & Croft, "Predicting Query
  Performance", SIGIR 2002): KL divergence (bits) between the query
  language model induced from the top-``k_fb`` retrieved docs and the
  collection model,

      clarity = sum_w P(w|q) * log2( P(w|q) / P(w|C) )

  with P(w|q) = sum_{d in R} P(d|q) * P_smooth(w|d), doc models
  linearly smoothed P_smooth(w|d) = lam*tf/dl + (1-lam)*cf/T
  (lam = 0.6 per the paper) and P(d|q) the softmax-normalized
  query likelihood over the feedback set.  The sum nominally runs
  over the WHOLE vocabulary; because every term outside the feedback
  docs has P(w|q) = (1-lam)*P(w|C) exactly, its contribution closes
  to (1-lam)*log2(1-lam)*(1 - sum_{w in FBvocab} P(w|C)) — so the
  distributed pass only ever touches feedback-doc postings.

* **WIG** (Zhou & Croft, "Query Performance Prediction in Web Search
  Environments", SIGIR 2007), over Dirichlet query-likelihood scores:

      WIG = (1/k) * sum_{d in top-k} ( S(d) - S(C) ) / sqrt(m)

  where S(C) = sum_t ln(cf_t / T) is the corpus "document" score and
  m the number of in-vocabulary distinct query terms.

* **NQC** (Shtok, Kurland, Carmel, Raiber, "Predicting Query
  Performance by Query-Drift Estimation", TOIS 30(2) 2012):
  normalized query commitment — the standard deviation of the top-k
  scores over |S(C)|:

      NQC = sqrt( (1/k) * sum (S(d) - mean)^2 ) / |S(C)|

First-pass scoring is the same Dirichlet QL relation RM3 uses
(index/rm3.py:_ql_scores); OOV query terms are dropped, the standard
stats-lookup rule.

Scale shape: one postings pass for stats, QL over candidate docs
(docs matching >= 1 query term), a per-query top-k window, then
per-query aggregates; the clarity term pass joins the k feedback docs
back to postings — k*avg_dl rows per query, map-side combinable.  No
UDFs, no driver loops; a million-query batch shuffles on (doc) and
(query) keys only.

Reference parity: the reference (scientist-labs/tokenkit) ships no
query engine; predictor contracts are from the cited public papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.lmsim import _relations
from tokenkit_spark.index.rm3 import _ql_scores


def post_retrieval_qpp(
    docs: DataFrame,
    queries: DataFrame,
    mu: float = 2000.0,
    k_fb: int = 10,
    lam: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, n_terms, wig, nqc, clarity) — one row per query with
    >= 1 in-vocabulary term; see module doc for the three formulas."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    ql = _ql_scores(qterms, postings, dstats, tstats, globals_, mu, id_col)

    w_fb = Window.partitionBy("query_id").orderBy(
        F.round("ql", 6).desc(), F.col(id_col).asc()
    )
    top = ql.withColumn("r", F.row_number().over(w_fb)).filter(
        F.col("r") <= k_fb
    )

    # per-query collection score S(C) and in-vocab term count m
    vq = qterms.join(tstats, "term").crossJoin(F.broadcast(globals_))
    qstats = vq.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.log(F.col("cf") / F.col("total_tokens"))).alias("s_coll"),
    )

    wig_nqc = (
        top.groupBy("query_id")
        .agg(
            F.avg("ql").alias("mean_s"),
            F.stddev_pop("ql").alias("std_s"),
        )
        .join(qstats, "query_id")
        .select(
            "query_id",
            F.col("m").alias("n_terms"),
            ((F.col("mean_s") - F.col("s_coll")) / F.sqrt(F.col("m"))).alias(
                "wig"
            ),
            (F.col("std_s") / F.abs(F.col("s_coll"))).alias("nqc"),
        )
    )

    # clarity: P(d|q) softmax over the feedback set, then the
    # feedback-vocab KL sum + the closed-form out-of-vocab remainder
    w_q = Window.partitionBy("query_id")
    fbw = top.withColumn(
        "w_raw", F.exp(F.col("ql") - F.max("ql").over(w_q))
    ).withColumn("p_dq", F.col("w_raw") / F.sum("w_raw").over(w_q))

    fb_terms = (
        fbw.select("query_id", id_col, "p_dq")
        .join(postings, id_col)
        .join(dstats, id_col)
        .groupBy("query_id", "term")
        .agg(
            F.sum(F.col("p_dq") * F.col("tf") / F.col("dl")).alias("p_wd_rel")
        )
        .join(tstats.select("term", "cf"), "term")
        .crossJoin(F.broadcast(globals_))
        .withColumn("p_wc", F.col("cf") / F.col("total_tokens"))
        .withColumn(
            "p_wq",
            F.lit(lam) * F.col("p_wd_rel") + F.lit(1.0 - lam) * F.col("p_wc"),
        )
    )
    log2 = float(__import__("math").log(2.0))
    clarity = fb_terms.groupBy("query_id").agg(
        (
            F.sum(
                F.col("p_wq") * F.log(F.col("p_wq") / F.col("p_wc")) / log2
            )
            # every vocab term OUTSIDE the feedback docs contributes
            # (1-lam)*P(w|C)*log2(1-lam); their total P(w|C) mass is
            # 1 - sum(fb-vocab P(w|C))
            + F.lit((1.0 - lam))
            * (1.0 - F.sum("p_wc"))
            * F.lit(float(__import__("math").log(1.0 - lam)) / log2)
        ).alias("clarity")
    )

    return (
        wig_nqc.join(clarity, "query_id")
        .select(
            "query_id",
            "n_terms",
            F.round("wig", round_digits).alias("wig"),
            F.round("nqc", round_digits).alias("nqc"),
            F.round("clarity", round_digits).alias("clarity"),
        )
    )
