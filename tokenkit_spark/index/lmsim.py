"""Language-model and classic-TF-IDF ranking similarities, relationally.

Lucene ships a family of pluggable similarities beyond BM25; the two
language-model ones and the legacy vector-space one are exact closed
forms over the same (tf, dl, df, cf) statistics the BM25 plan already
computes, so they cost the same relational shape:

* **LM Dirichlet** (Zhai & Lafferty, "A Study of Smoothing Methods for
  Language Models Applied to Ad Hoc Information Retrieval", SIGIR 2001;
  Lucene ``LMDirichletSimilarity``): Bayesian smoothing with pseudo-
  count ``mu`` of the document LM toward the collection LM.  Per
  matched term, with Lucene's add-one collection probability
  ``p(w|C) = (cf_w + 1) / (T + 1)`` (cf = collection term frequency,
  T = total tokens):

      s(t,d) = log(1 + tf / (mu * p(w|C))) + log(mu / (dl + mu))

  clamped at 0 per term (Lucene returns ``max(score, 0)``), summed
  over distinct query terms present in the doc.

* **LM Jelinek-Mercer** (same paper; Lucene
  ``LMJelinekMercerSimilarity``): linear interpolation with weight
  ``lambda``:

      s(t,d) = log(1 + ((1 - λ) * tf / dl) / (λ * p(w|C)))

  clamped at 0 per term.  Small λ → conjunctive-ish (title queries),
  λ≈0.7 → long queries — the published tuning.

* **Classic TF-IDF** (Salton's vector space model as Lucene's
  ``ClassicSimilarity``, post-Lucene-7 — no coord, no queryNorm):

      s(t,d) = sqrt(tf) * (1 + ln(N / (df + 1)))^2 * (1 / sqrt(dl))

Scale shape: identical to the BM25 relational plan — (doc, term) tf
aggregate, per-doc dl, per-term df/cf, one-row broadcast of global
stats, per-query top-k window.  No UDFs, no driver state; every stat
has a map-side partial.  Reference semantics: Lucene 9
``LMSimilarity``/``ClassicSimilarity`` contracts as documented above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _toks, _topk


def _relations(docs, queries, id_col, text_col):
    """Shared stats: (qterms, postings tf, dstats dl, term stats df+cf,
    one-row globals n_docs/avgdl/total_tokens)."""
    toks = _toks(docs, id_col, text_col)
    postings = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    tstats = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("term"),
    )
    return qterms, postings, dstats, tstats, globals_


def _rank(qterms, postings, dstats, tstats, globals_, per_term, id_col,
          k, round_digits):
    scored = (
        qterms.join(postings, "term")
        .join(tstats, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(per_term).alias("score"))
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def lm_dirichlet(
    docs: DataFrame,
    queries: DataFrame,
    mu: float = 2000.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k LM-Dirichlet ranking; ``queries``: (query_id, text)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    p_c = (F.col("cf") + 1.0) / (F.col("total_tokens") + 1.0)
    s = F.log(1.0 + F.col("tf") / (F.lit(float(mu)) * p_c)) + F.log(
        F.lit(float(mu)) / (F.col("dl") + F.lit(float(mu)))
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        F.greatest(s, F.lit(0.0)), id_col, k, round_digits,
    )


def lm_jelinek_mercer(
    docs: DataFrame,
    queries: DataFrame,
    lam: float = 0.7,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k LM-Jelinek-Mercer ranking; λ per Zhai & Lafferty."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    p_c = (F.col("cf") + 1.0) / (F.col("total_tokens") + 1.0)
    s = F.log(
        1.0
        + ((1.0 - lam) * F.col("tf") / F.col("dl")) / (F.lit(float(lam)) * p_c)
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        F.greatest(s, F.lit(0.0)), id_col, k, round_digits,
    )


def classic_tfidf(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k classic vector-space ranking (Lucene ClassicSimilarity)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    idf = 1.0 + F.log(F.col("n_docs") / (F.col("df") + 1.0))
    s = F.sqrt(F.col("tf")) * idf * idf / F.sqrt(F.col("dl"))
    return _rank(
        qterms, postings, dstats, tstats, globals_, s, id_col, k,
        round_digits,
    )


def pivoted_norm(
    docs: DataFrame,
    queries: DataFrame,
    slope: float = 0.2,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k pivoted-length-normalization VSM ranking (Singhal, Buckley
    & Mitra, "Pivoted Document Length Normalization", SIGIR 1996 — the
    ``piv`` weighting of the axiomatic-IR comparisons; qtf = 1 per
    distinct query term):

        s(t,d) = (1 + ln(1 + ln(tf)))
                 / ((1 - slope) + slope * dl / avgdl)
                 * ln((N + 1) / df)

    The fix the paper made — cosine normalization over-penalizes long
    docs, so rotate the normalizer around the average length pivot —
    is the direct ancestor of BM25's ``b``. Same relational shape as
    the siblings above."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    s = (
        (1.0 + F.log(1.0 + F.log(F.col("tf"))))
        / ((1.0 - slope) + F.lit(float(slope)) * F.col("dl") / avgdl)
        * F.log((F.col("n_docs") + 1.0) / F.col("df"))
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_, s, id_col, k,
        round_digits,
    )


def dfr_pl2(
    docs: DataFrame,
    queries: DataFrame,
    c: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k DFR PL2 ranking (Amati & van Rijsbergen, "Probabilistic
    Models of Information Retrieval Based on Measuring the Divergence
    from Randomness", TOIS 20(4) 2002; Lucene ``DFRSimilarity`` with
    BasicModelP + AfterEffectL + NormalizationH2, Terrier's default
    ``PL2``): Poisson basic model with Laplace after-effect and the
    second length normalization

        tfn    = tf * log2(1 + c * avgdl / dl)
        lambda = cf / N            (Poisson mean per document)
        s(t,d) = (1 / (tfn + 1)) * (tfn * log2(tfn / lambda)
                 + (lambda - tfn) * log2(e)
                 + 0.5 * log2(2 * pi * tfn))

    clamped at 0 per matched term (Lucene similarities must return
    non-negative scores; rare head terms with tfn < lambda go
    negative under the raw form). Completes the pluggable-similarity
    family alongside the LM/classic/pivoted/DFI siblings above — same
    relational shape, no new statistics."""
    import math

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    tfn = F.col("tf") * F.log2(1.0 + F.lit(float(c)) * avgdl / F.col("dl"))
    lam = F.col("cf") / F.col("n_docs")
    log2e = F.lit(1.0 / math.log(2.0))
    s = (
        (
            tfn * F.log2(tfn / lam)
            + (lam - tfn) * log2e
            + 0.5 * F.log2(2.0 * math.pi * tfn)
        )
        / (tfn + 1.0)
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        F.greatest(s, F.lit(0.0)), id_col, k, round_digits,
    )


def dfi_standardized(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k divergence-from-independence ranking (Kocabaş, Dinçer &
    Karaoğlan, Inf. Retrieval 17(2), 2014; Lucene ``DFISimilarity``
    with ``IndependenceStandardized``): under term/doc independence
    the expected frequency of t in d is e = (cf_t + 1) * dl / (T + 1)
    (Lucene's add-one smoothing); a term scores

        s(t,d) = log2(1 + (tf - e) / sqrt(e))   if tf > e, else 0

    — non-parametric: no tunables at all, the collection's own
    contingency table is the model. Same relational shape as the
    siblings above."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    e = (F.col("cf") + 1.0) * F.col("dl") / (F.col("total_tokens") + 1.0)
    s = F.when(
        F.col("tf") > e,
        F.log2(1.0 + (F.col("tf") - e) / F.sqrt(e)),
    ).otherwise(F.lit(0.0))
    return _rank(
        qterms, postings, dstats, tstats, globals_, s, id_col, k,
        round_digits,
    )


def ib_ll(
    docs: DataFrame,
    queries: DataFrame,
    c: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Information-Based ranking with the log-logistic distribution
    (Clinchant & Gaussier, "Information-Based Models for Ad Hoc IR",
    SIGIR 2010 — Lucene's ``IBSimilarityLL`` family with the H2/DFR
    normalization and the TTF lambda):

        tfn = tf * log2(1 + c * avgdl / dl)
        lam = cf_t / N
        score_t = log2( (tfn + lam) / lam )

    (the -log2 of the log-logistic survival P(X >= tfn) = lam /
    (lam + tfn)).  Scale shape identical to the sibling similarities:
    one stats pass + the broadcast-query-term scoring join."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    log2 = 0.6931471805599453
    avgdl = F.col("total_tokens") / F.col("n_docs")
    tfn = F.col("tf") * F.log(1.0 + F.lit(float(c)) * avgdl / F.col("dl")) / log2
    lam = F.col("cf") / F.col("n_docs")
    s = F.log((tfn + lam) / lam) / log2
    return _rank(
        qterms, postings, dstats, tstats, globals_, s, id_col, k,
        round_digits,
    )


def lm_two_stage(
    docs: DataFrame,
    queries: DataFrame,
    mu: float = 2000.0,
    lam: float = 0.7,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Two-stage smoothing (Zhai & Lafferty, "Two-Stage Language
    Models for Information Retrieval", SIGIR 2002): Dirichlet first
    (estimation smoothing), Jelinek-Mercer second (query-noise
    modeling):

        p(w|d) = (1 - lam) * (tf + mu * p(w|C)) / (dl + mu)
                 + lam * p(w|C)

    scored in the rank-equivalent odds form the sibling similarities
    use (log(p(w|d) / (lam * p(w|C))), clamped at 0 like Lucene's LM
    similarities so absent terms never contribute):

        s_t = log(1 + ((1-lam) * (tf + mu*p_c) / (dl + mu)) / (lam*p_c)
                    - (1-lam) * mu / (dl + mu) / lam)

    — expanding p(w|d), the tf=0 baseline subtracts out exactly, so
    s_t = log(1 + (1-lam)*tf / ((dl+mu) * lam * p_c) + 0) for the
    matched-term delta... kept in the direct odds form below with the
    tf=0 offset subtracted to preserve the "only matched terms score"
    contract: s_t = log(num(tf) / num(0)) with
    num(x) = (1-lam)*(x + mu*p_c)/(dl+mu) + lam*p_c."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    p_c = (F.col("cf") + 1.0) / (F.col("total_tokens") + 1.0)

    def num(tf_expr):
        return (
            F.lit(1.0 - lam) * (tf_expr + F.lit(float(mu)) * p_c)
            / (F.col("dl") + F.lit(float(mu)))
            + F.lit(float(lam)) * p_c
        )

    s = F.log(num(F.col("tf")) / num(F.lit(0.0)))
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        F.greatest(s, F.lit(0.0)), id_col, k, round_digits,
    )


def _axiomatic_tfn(s: float):
    """Axiomatic normalized tf (Fang & Zhai, "An Exploration of
    Axiomatic Approaches to Information Retrieval", SIGIR 2005;
    Lucene ``AxiomaticF2EXP``/``AxiomaticF2LOG``):
    tfn = tf / (tf + s + s * dl / avgdl)."""
    avgdl = F.col("total_tokens") / F.col("n_docs")
    return F.col("tf") / (
        F.col("tf") + F.lit(float(s)) + F.lit(float(s)) * F.col("dl") / avgdl
    )


def axiomatic_f2exp(
    docs: DataFrame,
    queries: DataFrame,
    s: float = 0.5,
    growth: float = 0.35,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k Axiomatic F2EXP ranking (Fang & Zhai SIGIR 2005; Lucene
    ``AxiomaticF2EXP``): per matched term tfn * (N/df)^growth — the
    power-law idf the axiomatic constraints derive. Same single
    relational pass as the LM/BM25 siblings."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    per_term = _axiomatic_tfn(s) * F.pow(
        F.col("n_docs") / F.col("df").cast("double"), F.lit(float(growth))
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        per_term, id_col, k, round_digits,
    )


def axiomatic_f2log(
    docs: DataFrame,
    queries: DataFrame,
    s: float = 0.5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k Axiomatic F2LOG ranking (Lucene ``AxiomaticF2LOG``): per
    matched term tfn * ln((N+1)/df)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    per_term = _axiomatic_tfn(s) * F.log(
        (F.col("n_docs") + 1.0) / F.col("df")
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        per_term, id_col, k, round_digits,
    )


def dlh13(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """DFR DLH13 (Amati's parameter-free hypergeometric
    divergence-from-randomness model, as shipped by Terrier's
    ``DLH13`` and Lucene's ``DFRSimilarity`` with the H3 aftereffect;
    Amati & van Rijsbergen TOIS 2002 framework).  Per matched term,
    with f = tf/dl:

        s(t,d) = [ tf·log2( (tf·avgdl/dl) · (N/cf) )
                   + 0.5·log2( 2π·tf·(1-f) ) ] / (tf + 0.5)

    clamped at 0 per term (a term filling the whole doc drives the
    Bernoulli correction to -inf; both engines clamp the 1-f factor at
    1e-10 and the per-term score at 0 so rank order is well-defined).
    Parameter-free: no k1/b/mu to tune — the reason Terrier ships it
    as the robust default.  Same relational plan as the LM rankers."""
    import math

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    f = F.col("tf") / F.col("dl")
    ln2 = math.log(2.0)
    log2 = lambda x: F.log(x) / F.lit(ln2)
    s = (
        F.col("tf")
        * log2(
            (F.col("tf") * avgdl / F.col("dl"))
            * (F.col("n_docs") / F.col("cf"))
        )
        + 0.5 * log2(2.0 * math.pi * F.col("tf") * F.greatest(1.0 - f, F.lit(1e-10)))
    ) / (F.col("tf") + 0.5)
    return _rank(
        qterms, postings, dstats, tstats, globals_,
        F.greatest(s, F.lit(0.0)), id_col, k, round_digits,
    )


def dfr_ifb2(
    docs: DataFrame,
    queries: DataFrame,
    c: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k DFR IFB2 ranking (Amati & van Rijsbergen TOIS 2002;
    Terrier's ``IFB2`` weighting model): Inverse-Term-Frequency basic
    model with the Bernoulli after-effect and the second length
    normalization —

        tfn    = tf * log2(1 + c * avgdl / dl)
        s(t,d) = (cf + 1) / (df * (tfn + 1))
                 * tfn * log2((N + 1) / (cf + 0.5))

    where cf is the collection frequency and df the document
    frequency.  The I(F)/B pairing is the other canonical corner of
    the DFR design space from PL2 (Poisson/Laplace, ``dfr_pl2``) —
    its informative content comes from the term's total occurrences
    rather than a Poisson fit, and the Bernoulli ratio (cf+1)/(df·(tfn+1))
    replaces Laplace smoothing.  Same relational shape as every
    similarity in this module; no new statistics."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    tfn = F.col("tf") * F.log2(1.0 + F.lit(float(c)) * avgdl / F.col("dl"))
    s = (
        (F.col("cf") + 1.0)
        / (F.col("df") * (tfn + 1.0))
        * tfn
        * F.log2((F.col("n_docs") + 1.0) / (F.col("cf") + 0.5))
    )
    return _rank(
        qterms, postings, dstats, tstats, globals_, s, id_col, k,
        round_digits,
    )


def length_bias_audit(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Ranker document-length bias battery — mean top-k length vs the
    corpus, per similarity.

    The diagnostic behind two decades of length-normalization papers
    (Singhal/Buckley/Mitra SIGIR 1996 framed it; Lv & Zhai's BM25+
    fixed its tail): run the SAME query set under several pluggable
    similarities and compare the mean document length of their top-k
    against the corpus mean.  A ratio well above 1 = the ranker's
    normalization under-penalizes long documents (classic TF-IDF's
    failure); well below 1 = over-penalization (raw BM25 at high b).
    One row per similarity: (similarity, mean_topk_dl, corpus_avgdl,
    bias_ratio) averaged over queries.

    Shape: the shared ``_relations`` stats feed each similarity's
    scoring join; the audit adds one dl join + two rollups per
    ranker.
    """
    import math

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    avgdl_row = dstats.agg(F.avg("dl").alias("a")).collect()[0]
    corpus_avgdl = float(avgdl_row.a)
    avgdl = F.col("total_tokens") / F.col("n_docs")
    sims = {
        "bm25": (
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * 2.2
            / (
                F.col("tf")
                + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)
            )
        ),
        "classic_tfidf": (
            F.sqrt(F.col("tf"))
            * F.pow(
                F.log(
                    F.col("n_docs") / (F.col("df") + 1.0)
                )
                + 1.0,
                2.0,
            )
            / F.sqrt(F.col("dl"))
        ),
        "lm_dirichlet": F.greatest(
            F.log(
                1.0
                + F.col("tf")
                / (
                    2000.0
                    * (
                        (F.col("cf") + 1.0)
                        / (F.col("total_tokens") + 1.0)
                    )
                )
            )
            + F.log(2000.0 / (F.col("dl") + 2000.0)),
            F.lit(0.0),
        ),
    }
    from pyspark.sql import Window

    out = None
    for name, per_term in sims.items():
        scored = (
            qterms.join(postings, "term")
            .join(tstats, "term")
            .join(dstats, id_col)
            .crossJoin(F.broadcast(globals_))
            .groupBy("query_id", id_col)
            .agg(F.sum(per_term).alias("s"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.round("s", 4).desc(), F.col(id_col).asc()
        )
        top = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .join(dstats, id_col)
        )
        row = top.agg(
            F.lit(name).alias("similarity"),
            F.round(F.avg("dl"), round_digits).alias("mean_topk_dl"),
            F.round(F.lit(corpus_avgdl), round_digits).alias(
                "corpus_avgdl"
            ),
            F.round(
                F.avg("dl") / F.lit(corpus_avgdl), round_digits
            ).alias("bias_ratio"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def idf_variants_audit(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """IDF-formula sensitivity audit — how much does the idf variant
    actually move the top-k?

    The three canonical forms (Robertson, "Understanding inverse
    document frequency: on theoretical arguments for IDF", J.Doc
    2004): plain Sparck-Jones ln(N/df), the probabilistic
    ln((N-df)/df) (negative for df > N/2 — the quirk BM25's +0.5
    smoothing exists to tame), and Lucene/BM25's smoothed
    ln(1 + (N-df+0.5)/(df+0.5)).  Same tf/length factor, same query
    set; per (query, variant): top-k overlap and top-1 agreement
    against the smoothed baseline.  High agreement = the endless idf
    debate is immaterial on this corpus; divergence concentrates on
    stopword-heavy queries, visible per query.

    One scoring join per variant over shared stats.
    """
    from pyspark.sql import Window

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    tf_part = (
        F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl))
    )
    idfs = {
        "smoothed": F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        ),
        "plain": F.log(
            F.col("n_docs") / F.col("df").cast("double")
        ),
        "probabilistic": F.log(
            (F.col("n_docs") - F.col("df"))
            / F.col("df").cast("double")
        ),
    }

    def top(expr):
        scored = (
            qterms.join(postings, "term")
            .join(tstats, "term")
            .join(dstats, id_col)
            .crossJoin(F.broadcast(globals_))
            .filter(F.col("df") < F.col("n_docs"))
            .groupBy("query_id", id_col)
            .agg(F.sum(expr * tf_part).alias("s"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.round("s", 4).desc(), F.col(id_col).asc()
        )
        return scored.withColumn(
            "rank", F.row_number().over(w)
        ).filter(F.col("rank") <= k)

    base = top(idfs["smoothed"]).select(
        "query_id",
        F.col(id_col).alias("b_doc"),
        F.col("rank").alias("b_rank"),
    )
    out = None
    for name, expr in idfs.items():
        t = top(expr)
        cmp = (
            t.join(
                base,
                (t.query_id == base.query_id)
                & (t[id_col] == F.col("b_doc")),
                "left",
            )
            .groupBy(t.query_id)
            .agg(
                F.sum(F.col("b_rank").isNotNull().cast("long")).alias(
                    "topk_overlap"
                ),
                F.max(
                    ((F.col("rank") == 1) & (F.col("b_rank") == 1))
                    .cast("long")
                ).alias("top1_match"),
            )
            .select(
                "query_id",
                F.lit(name).alias("variant"),
                "topk_overlap",
                "top1_match",
            )
        )
        out = cmp if out is None else out.unionByName(cmp)
    return out
