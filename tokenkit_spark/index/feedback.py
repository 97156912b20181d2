"""Vector-space (Rocchio) and DFR (Bo1) pseudo-relevance feedback,
fully relational — the two classic PRF families next to RM3
(index/rm3.py):

* **Rocchio** (Rocchio, "Relevance Feedback in Information
  Retrieval", SMART 1971; Manning/Raghavan/Schutze IIR §9.1.1; the
  Anserini ``RocchioReranker`` pseudo-feedback configuration with no
  negative set):

      q' = alpha * q  +  beta * (1/|Dr|) * sum_{d in Dr} v_d

  over tf-idf doc vectors v_d[t] = (tf/dl) * ln(1 + (N-df+.5)/(df+.5))
  (length-normalized tf, the repo's Lucene-form idf), Dr = the top
  ``fb_docs`` docs of a first-pass BM25 run, q[t] = 1 per distinct
  query term.  The ``fb_terms`` highest-weight q' terms are kept
  (ties term asc) and the second pass ranks by the inner product
  score(q', d) = sum_t q'_t * v_d[t].

* **Bo1** (Amati's Bose-Einstein 1 DFR term-weighting model —
  Amati & van Rijsbergen TOIS 20(4) 2002; Terrier's default query
  expansion, ``Bo1`` in Macdonald et al., "From Puppy to Maturity",
  OSIR 2012):

      w(t)  = tfx * log2((1 + lam)/lam) + log2(1 + lam),
      lam   = cf_t / N

  with tfx = t's frequency in the top ``fb_docs`` docs.  The top
  ``fb_terms`` terms by w(t) (ties term asc) are merged with the
  original query at Terrier's weights

      qtw(t) = qtf(t)/qtf_max + rocchio_beta * w(t)/w_max

  (rocchio_beta = 0.4) and the second pass is weighted BM25:
  score = sum_t qtw(t) * bm25(t, d) at the engine's k1=1.2, b=0.75.

Scale shape: both are exactly the RM3 plan — one postings/stats pass,
candidate-restricted first pass, per-query top-k windows for feedback
docs and expansion terms (each query's state is fb_terms rows, tiny),
second pass over docs matching >= 1 expanded term. No UDFs, no driver
loops; batches of 10^6 queries shuffle on (doc) and (query) keys only.

Reference parity: the reference (scientist-labs/tokenkit) ships no
query engine; contracts are from the cited public papers/systems.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _topk
from tokenkit_spark.index.lmsim import _relations


def _bm25_term(k1: float, b: float):
    """Per-(query-term, doc) BM25 contribution over joined
    postings/tstats/dstats/globals columns (Lucene-form idf)."""
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    return idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )


def _bm25_first_pass(qterms, postings, dstats, tstats, globals_, id_col,
                     k1, b):
    """(query_id, doc_id, score): BM25 over docs matching >=1 term."""
    return (
        qterms.join(postings, "term")
        .join(tstats, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(_bm25_term(k1, b)).alias("score"))
    )


def _fb_docs(first_pass, fb_docs, id_col):
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col(id_col).asc()
    )
    return (
        first_pass.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= fb_docs)
        .select("query_id", id_col)
    )


def rocchio_expand(
    docs: DataFrame,
    queries: DataFrame,
    alpha: float = 1.0,
    beta: float = 0.75,
    fb_docs: int = 5,
    fb_terms: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, term, weight): the clipped Rocchio q' vector."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    fp = _bm25_first_pass(
        qterms, postings, dstats, tstats, globals_, id_col, k1, b
    )
    fb = _fb_docs(fp, fb_docs, id_col)
    n_fb = fb.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_fb"))

    # centroid of tf-idf doc vectors over the feedback set
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    centroid = (
        fb.join(postings, id_col)
        .join(dstats, id_col)
        .join(tstats, "term")
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("tf") / F.col("dl") * idf).alias("c_sum"))
        .join(n_fb, "query_id")
        .select(
            "query_id", "term",
            (F.lit(beta) * F.col("c_sum") / F.col("n_fb")).alias("fb_w"),
        )
    )
    qvec = qterms.select(
        "query_id", "term", F.lit(alpha).alias("q_w")
    )
    merged = (
        qvec.join(centroid, ["query_id", "term"], "full")
        .select(
            "query_id", "term",
            (
                F.coalesce(F.col("q_w"), F.lit(0.0))
                + F.coalesce(F.col("fb_w"), F.lit(0.0))
            ).alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )
    w_t = Window.partitionBy("query_id").orderBy(
        F.round("weight", 9).desc(), F.col("term").asc()
    )
    return (
        merged.withColumn("tr", F.row_number().over(w_t))
        .filter(F.col("tr") <= fb_terms)
        .select(
            "query_id", "term", F.round("weight", round_digits).alias("weight")
        )
    )


def rocchio_search(
    docs: DataFrame,
    queries: DataFrame,
    alpha: float = 1.0,
    beta: float = 0.75,
    fb_docs: int = 5,
    fb_terms: int = 10,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Two-pass Rocchio retrieval: inner product of the clipped q'
    vector with tf-idf doc vectors; (query_id, rank, doc_id, score)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    wq = rocchio_expand(
        docs, queries, alpha, beta, fb_docs, fb_terms, k1, b,
        id_col, text_col, round_digits=9,
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        wq.join(postings, "term")
        .join(dstats, id_col)
        .join(tstats, "term")
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(
            F.sum(
                F.col("weight") * F.col("tf") / F.col("dl") * idf
            ).alias("score")
        )
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def bo1_expand(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 3,
    fb_terms: int = 10,
    rocchio_beta: float = 0.4,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, term, qtw): Terrier-style Bo1 expanded query weights
    qtf/qtf_max + rocchio_beta * w(t)/w_max over the merged original +
    top-``fb_terms`` expansion vocabulary."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    fp = _bm25_first_pass(
        qterms, postings, dstats, tstats, globals_, id_col, k1, b
    )
    fb = _fb_docs(fp, fb_docs, id_col)

    log2 = math.log(2.0)
    lam = F.col("cf") / F.col("n_docs")
    w_t_expr = (
        F.col("tfx") * F.log((1.0 + lam) / lam) / log2
        + F.log(1.0 + lam) / log2
    )
    wt = (
        fb.join(postings, id_col)
        .groupBy("query_id", "term")
        .agg(F.sum("tf").alias("tfx"))
        .join(tstats, "term")
        .crossJoin(F.broadcast(globals_))
        .select("query_id", "term", w_t_expr.alias("w_t"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.round("w_t", 9).desc(), F.col("term").asc()
    )
    top_terms = wt.withColumn("tr", F.row_number().over(w_rank)).filter(
        F.col("tr") <= fb_terms
    )
    w_q = Window.partitionBy("query_id")
    top_terms = top_terms.withColumn("w_max", F.max("w_t").over(w_q))

    # original-query term frequencies, duplicates kept
    qtf = (
        queries.select(
            "query_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
        .withColumn("qtf_max", F.max("qtf").over(w_q))
    )
    return (
        qtf.join(
            top_terms.select("query_id", "term", "w_t", "w_max"),
            ["query_id", "term"],
            "full",
        )
        .select(
            "query_id", "term",
            F.round(
                F.coalesce(F.col("qtf") / F.col("qtf_max"), F.lit(0.0))
                + F.lit(rocchio_beta)
                * F.coalesce(F.col("w_t") / F.col("w_max"), F.lit(0.0)),
                round_digits,
            ).alias("qtw"),
        )
        .filter(F.col("qtw") > 0)
    )


def bo1_search(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 3,
    fb_terms: int = 10,
    rocchio_beta: float = 0.4,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Two-pass Bo1 retrieval: weighted BM25 over the expanded query;
    (query_id, rank, doc_id, score)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    wq = bo1_expand(
        docs, queries, fb_docs, fb_terms, rocchio_beta, k1, b,
        id_col, text_col, round_digits=9,
    )
    scored = (
        wq.join(postings, "term")
        .join(tstats, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("qtw") * _bm25_term(k1, b)).alias("score"))
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def bm25_param_sensitivity(
    docs: DataFrame,
    queries: DataFrame,
    grid: list[tuple[float, float]] = ((1.2, 0.0), (1.2, 1.0),
                                       (0.5, 0.75), (2.0, 0.75)),
    baseline: tuple[float, float] = (1.2, 0.75),
    depth: int = 50,
    k_overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """BM25 free-parameter sensitivity audit: how much does the ranking
    actually move when k1/b leave the Robertson defaults? For every
    (k1, b) grid point, the top-``depth`` run is compared against the
    baseline run per query and summarized as

      * mean Kendall tau-a / Spearman rho over common docs
        (index/rankeval.py:rank_correlation — Fagin et al.'s
        intersection convention), and
      * mean overlap@``k_overlap`` (the set agreement of the head).

    This is the tuning-risk table Robertson & Zaragoza ("The
    Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009,
    §5.2) recommend inspecting before any parameter sweep: b moves
    rankings far more than k1 on length-skewed corpora, and the audit
    quantifies that on YOURS.

    One row per grid point: (k1, b, mean_tau, mean_rho, mean_overlap).
    Scale shape: |grid|+1 candidate-restricted scoring passes over the
    shared postings relation; comparisons touch only window rows.
    """
    from tokenkit_spark.index.bm25f import _topk
    from tokenkit_spark.index.lmsim import _relations
    from tokenkit_spark.index.rankeval import rank_correlation

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )

    def run(k1: float, b: float) -> DataFrame:
        fp = _bm25_first_pass(
            qterms, postings, dstats, tstats, globals_, id_col, k1, b
        ).withColumnRenamed(id_col, "doc_id")
        return _topk(fp, depth, 4)

    base = run(*baseline).localCheckpoint()
    base10 = base.filter(F.col("rank") <= k_overlap).select(
        "query_id", "doc_id"
    )
    out = None
    for k1, b in grid:
        var = run(float(k1), float(b))
        corr = rank_correlation(base, var).agg(
            F.round(F.avg("kendall_tau"), round_digits).alias("mean_tau"),
            F.round(F.avg("spearman_rho"), round_digits).alias("mean_rho"),
        )
        var10 = var.filter(F.col("rank") <= k_overlap).select(
            "query_id", "doc_id"
        )
        n_q = base10.select("query_id").distinct().count()
        ov = base10.join(var10, ["query_id", "doc_id"]).count()
        row = corr.select(
            F.lit(float(k1)).alias("k1"),
            F.lit(float(b)).alias("b"),
            "mean_tau",
            "mean_rho",
            F.round(
                F.lit(ov) / F.lit(float(n_q * k_overlap)), round_digits
            ).alias("mean_overlap"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("k1", "b")


def rsj_weights(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 5,
    fb_terms: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Robertson/Sparck Jones relevance weighting with pseudo-relevance
    feedback — the Binary Independence Model's term reweighting.

    Robertson & Sparck Jones, "Relevance weighting of search terms"
    (JASIS 1976) with the 0.5-offset point estimate (Robertson, "The
    Probability Ranking Principle in IR", 1977 framing; the F4 formula):
    for a term with global df n over N docs, appearing in r of the R
    (pseudo-)relevant docs,

        w_rsj = ln( (r + .5)(N - n - R + r + .5)
                    / ((n - r + .5)(R - r + .5)) )

    and Robertson's term-selection OFFER WEIGHT r * w_rsj ("On term
    selection for query expansion", J.Doc 1990) ranks expansion
    candidates.  The pseudo-relevant set is the BM25 top-``fb_docs``
    (the same first pass Rocchio/Bo1 use — ``_fb_docs``), so the three
    classic expansion schemes share one pipeline and differ only in
    the weighting formula.

    Returns (query_id, term, r, n, w_rsj, offer_weight): the
    top-``fb_terms`` candidates per query by (offer_weight desc, term
    asc), original query terms excluded.  Scale shape: feedback-doc
    postings are |q| * fb_docs rows joined against the term stats —
    per-query work independent of corpus size after the first pass.
    """
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    fp = _bm25_first_pass(
        qterms, postings, dstats, tstats, globals_, id_col, k1, b
    )
    fb = _fb_docs(fp, fb_docs, id_col)
    big_r = fb.groupBy("query_id").agg(F.count(F.lit(1)).alias("big_r"))

    r_t = (
        fb.join(postings, id_col)
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    w = (
        r_t.join(F.broadcast(big_r), "query_id")
        .join(tstats, "term")
        .crossJoin(F.broadcast(globals_))
        .join(qterms.withColumn("is_q", F.lit(1)), ["query_id", "term"], "left")
        .filter(F.col("is_q").isNull())
        .withColumn(
            "w_rsj",
            F.log(
                ((F.col("r") + 0.5)
                 * (F.col("n_docs") - F.col("df") - F.col("big_r")
                    + F.col("r") + 0.5))
                / ((F.col("df") - F.col("r") + 0.5)
                   * (F.col("big_r") - F.col("r") + 0.5))
            ),
        )
        .withColumn("offer_weight", F.col("r") * F.col("w_rsj"))
    )
    w_t = Window.partitionBy("query_id").orderBy(
        F.round("offer_weight", 9).desc(), F.col("term").asc()
    )
    return (
        w.withColumn("tr", F.row_number().over(w_t))
        .filter(F.col("tr") <= fb_terms)
        .select(
            "query_id",
            "term",
            "r",
            F.col("df").alias("n"),
            F.round("w_rsj", round_digits).alias("w_rsj"),
            F.round("offer_weight", round_digits).alias("offer_weight"),
        )
    )


def prf_drift_audit(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 5,
    fb_terms: int = 10,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Query-drift audit of pseudo-relevance feedback — how far does
    Rocchio expansion move the top-k?

    The classic PRF failure mode (Mitra, Singhal & Buckley, "Improving
    automatic query expansion", SIGIR 1998 named it query DRIFT): when
    the feedback docs are off-topic, expansion pulls the whole
    ranking with them.  Since relevance labels don't exist at run
    time, the operational proxy every PRF deployment monitors is the
    SHIFT ITSELF: the overlap between the original BM25 top-k and the
    Rocchio-expanded top-k, per query.  Near-total overlap = the
    expansion is a no-op; tiny overlap on a query = drift risk, gate
    it (the selective-PRF policy).

    Per query: (query_id, n_expansion_terms, topk_overlap,
    top1_match, drift_risk) with drift_risk = overlap < k/2.
    Reuses the shared first-pass/expansion machinery of this module.
    """
    from pyspark.sql import Window

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    fp = _bm25_first_pass(
        qterms, postings, dstats, tstats, globals_, id_col, 1.2, 0.75
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col(id_col).asc()
    )
    base_top = (
        fp.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("b_doc"),
            F.col("rank").alias("b_rank"),
        )
    )
    expanded = rocchio_search(
        docs, queries, fb_docs=fb_docs, fb_terms=fb_terms, k=k,
        id_col=id_col, text_col=text_col,
    )
    n_exp = (
        rocchio_expand(
            docs, queries, fb_docs=fb_docs, fb_terms=fb_terms,
            id_col=id_col, text_col=text_col,
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_expansion_terms"))
    )
    cmp = (
        expanded.join(
            base_top,
            (expanded.query_id == base_top.query_id)
            & (expanded.doc_id == F.col("b_doc")),
            "left",
        )
        .groupBy(expanded.query_id)
        .agg(
            F.sum(F.col("b_rank").isNotNull().cast("long")).alias(
                "topk_overlap"
            ),
            F.max(
                ((F.col("rank") == 1) & (F.col("b_rank") == 1)).cast(
                    "long"
                )
            ).alias("top1_match"),
        )
    )
    return cmp.join(n_exp, "query_id").select(
        "query_id",
        "n_expansion_terms",
        "topk_overlap",
        "top1_match",
        (F.col("topk_overlap") < k / 2.0).alias("drift_risk"),
    )
