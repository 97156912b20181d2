"""RM3 pseudo-relevance-feedback query expansion, fully relational.

RM1/RM3 (Lavrenko & Croft, "Relevance-Based Language Models", SIGIR
2001; the RM3 interpolated variant from Abdul-Jaleel et al., UMass at
TREC 2004) is the classic PRF method every Lucene/Anserini stack ships
(``Rm3Reranker``).  Pipeline:

1. **First pass** — query-likelihood retrieval with Dirichlet
   smoothing (Zhai & Lafferty SIGIR 2001):

       QL(q, d) = sum_{t in q} log((tf + mu * cf_t / T) / (dl + mu))

   over candidate docs (docs matching >= 1 query term).  Query terms
   absent from the corpus (cf = 0) are dropped, the standard OOV rule.

2. **Relevance model (RM1)** — over the top ``fb_docs`` feedback docs,
   with softmax doc weights w_d ∝ exp(QL(q,d)) (shift-invariant, so we
   subtract the per-query max before exp for stability):

       P(w|R) = sum_{d in FB} w_d / W * tf_{w,d} / dl_d

   (maximum-likelihood doc models, per the original paper).

3. **Term clipping** — keep the ``fb_terms`` highest-P(w|R) terms
   (ties on term asc), renormalise over the kept set.

4. **RM3 interpolation** with the uniform original-query model:

       P'(w|q) = a * 1/|q| * [w in q] + (1 - a) * P(w|R)

5. **Second pass** — KL-divergence ranking (equivalent to weighted
   query likelihood up to a query constant):

       score(q, d) = sum_w P'(w|q) * log((tf + mu * cf_w / T) / (dl + mu))

   over docs matching >= 1 expanded-query term, missing terms fully
   smoothed via a left join (tf -> 0).

Scale shape: every step is a groupBy/join/window over the same
(doc, term) postings relation the BM25 plan uses — map-side partial
aggregates throughout, the only per-query state is |q| + fb_terms + |q|
weighted terms (tiny, broadcastable), no driver collect, no UDFs.  The
feedback-doc selection and term clipping are top-k windows partitioned
by query_id, so a million-query batch stays one shuffle per stage.

Determinism: feedback docs pinned by (round(QL, 6) desc, doc_id asc),
expansion terms by (round(P(w|R), 9) desc, term asc), final ranking by
(round(score, 4) desc, doc_id asc) — the same pinned-tie contract as
the rest of the ranking family (index/lmsim.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _topk
from tokenkit_spark.index.lmsim import _relations


def _ql_scores(
    qterms: DataFrame,
    postings: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    globals_: DataFrame,
    mu: float,
    id_col: str,
) -> DataFrame:
    """Dirichlet query-likelihood per (query, candidate doc).

    Candidates are docs matching >= 1 in-vocabulary query term; the sum
    runs over ALL in-vocabulary query terms (missing ones smoothed),
    which a candidates x qterms left join against postings expresses
    without ever scoring the full corpus.
    """
    vterms = qterms.join(tstats, "term")  # drops OOV terms (cf = 0)
    cand = (
        vterms.select("query_id", "term")
        .join(postings, "term")
        .select("query_id", id_col)
        .distinct()
    )
    return (
        cand.join(vterms, "query_id")
        .join(postings, ["term", id_col], "left")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .withColumn(
            "t_ll",
            F.log(
                (F.coalesce(F.col("tf"), F.lit(0))
                 + F.lit(mu) * F.col("cf") / F.col("total_tokens"))
                / (F.col("dl") + F.lit(mu))
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("t_ll").alias("ql"))
    )


def rm3_search(
    docs: DataFrame,
    queries: DataFrame,
    mu: float = 2000.0,
    fb_docs: int = 5,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Two-pass RM3 retrieval; returns (query_id, rank, doc_id, score)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    ql = _ql_scores(qterms, postings, dstats, tstats, globals_, mu, id_col)

    # feedback docs: top fb_docs by pinned QL order
    w_fb = Window.partitionBy("query_id").orderBy(
        F.round("ql", 6).desc(), F.col(id_col).asc()
    )
    fb = ql.withColumn("r", F.row_number().over(w_fb)).filter(
        F.col("r") <= fb_docs
    )
    # softmax doc weights (shift by per-query max for stability)
    w_q = Window.partitionBy("query_id")
    fb = fb.withColumn(
        "w_raw", F.exp(F.col("ql") - F.max("ql").over(w_q))
    ).withColumn("w_norm", F.col("w_raw") / F.sum("w_raw").over(w_q))

    # RM1: P(w|R) = sum_d w_norm * tf/dl
    prm = (
        fb.select("query_id", id_col, "w_norm")
        .join(postings, id_col)
        .join(dstats, id_col)
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("w_norm") * F.col("tf") / F.col("dl")).alias("p_rm"))
    )
    w_t = Window.partitionBy("query_id").orderBy(
        F.round("p_rm", 9).desc(), F.col("term").asc()
    )
    exp_terms = (
        prm.withColumn("tr", F.row_number().over(w_t))
        .filter(F.col("tr") <= fb_terms)
        .withColumn("p_rm_n", F.col("p_rm") / F.sum("p_rm").over(w_q))
        .select("query_id", "term", "p_rm_n")
    )

    # RM3 interpolation with the uniform original-query model
    n_q = qterms.join(tstats.select("term"), "term").groupBy("query_id").agg(
        F.countDistinct("term").alias("n_qt")
    )
    orig = (
        qterms.join(tstats.select("term"), "term")
        .join(n_q, "query_id")
        .select(
            "query_id", "term", (F.lit(1.0) / F.col("n_qt")).alias("p_orig")
        )
    )
    wq = (
        orig.join(exp_terms, ["query_id", "term"], "full")
        .select(
            "query_id",
            "term",
            (
                F.lit(orig_weight) * F.coalesce(F.col("p_orig"), F.lit(0.0))
                + F.lit(1.0 - orig_weight)
                * F.coalesce(F.col("p_rm_n"), F.lit(0.0))
            ).alias("wt"),
        )
        # zero-weight terms can't move a score but would inflate the
        # candidate set (every doc matching them joins in) — drop them
        .filter(F.col("wt") > 0)
    )

    # second pass: KL-divergence scoring over the expanded term set
    cand2 = (
        wq.select("query_id", "term")
        .join(postings, "term")
        .select("query_id", id_col)
        .distinct()
    )
    scored = (
        cand2.join(wq, "query_id")
        .join(tstats, "term")
        .join(postings, ["term", id_col], "left")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .withColumn(
            "t_s",
            F.col("wt")
            * F.log(
                (F.coalesce(F.col("tf"), F.lit(0))
                 + F.lit(mu) * F.col("cf") / F.col("total_tokens"))
                / (F.col("dl") + F.lit(mu))
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("t_s").alias("score"))
    )
    return _topk(scored, k, round_digits)


def rm3_expansion_terms(
    docs: DataFrame,
    queries: DataFrame,
    mu: float = 2000.0,
    fb_docs: int = 5,
    fb_terms: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The clipped, renormalised RM1 term distribution per query —
    (query_id, term, p_rm rounded) — the expansion-audit view."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    ql = _ql_scores(qterms, postings, dstats, tstats, globals_, mu, id_col)
    w_fb = Window.partitionBy("query_id").orderBy(
        F.round("ql", 6).desc(), F.col(id_col).asc()
    )
    fb = ql.withColumn("r", F.row_number().over(w_fb)).filter(
        F.col("r") <= fb_docs
    )
    w_q = Window.partitionBy("query_id")
    fb = fb.withColumn(
        "w_raw", F.exp(F.col("ql") - F.max("ql").over(w_q))
    ).withColumn("w_norm", F.col("w_raw") / F.sum("w_raw").over(w_q))
    prm = (
        fb.select("query_id", id_col, "w_norm")
        .join(postings, id_col)
        .join(dstats, id_col)
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("w_norm") * F.col("tf") / F.col("dl")).alias("p_rm"))
    )
    w_t = Window.partitionBy("query_id").orderBy(
        F.round("p_rm", 9).desc(), F.col("term").asc()
    )
    return (
        prm.withColumn("tr", F.row_number().over(w_t))
        .filter(F.col("tr") <= fb_terms)
        .withColumn("p_rm_n", F.col("p_rm") / F.sum("p_rm").over(w_q))
        .select(
            "query_id",
            "term",
            F.round("p_rm_n", 6).alias("p_rm"),
        )
    )
