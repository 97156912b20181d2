"""Search-quality evaluation — the ES `_rank_eval` API, relationally.

Given a ranked result table and a graded judgment table, compute the
standard ranking metrics per query:

* precision@k / recall@k  (relevant = grade > 0)
* MRR                      (reciprocal rank of the first relevant hit)
* NDCG@k                   (exponential gain (2^grade - 1)/log2(rank+1),
                            ideal ordering from the query's judgments)

Why this matters at 100 TB: ranking evaluation over millions of logged
queries is itself a data-pipeline job — per-query metrics are one
(query_id)-keyed join + aggregate, the ideal-DCG window is partitioned
per query and bounded by that query's judged docs (never corpus-sized),
and means reduce over query count. Nothing touches the driver.

Reference: the ES rank evaluation API contract (metric definitions);
gain/discount follow the ES dcg metric (exponential gain, log2
discount).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """``results``: (query_id, rank, doc_id) with rank 1-based;
    ``judgments``: (query_id, doc_id, grade) — unjudged docs count as
    grade 0 (the ES default). Returns one row per query:
    (query_id, precision_k, recall_k, mrr, dcg, idcg, ndcg)."""
    graded = (
        results.filter(F.col("rank") <= k)
        .join(judgments, ["query_id", "doc_id"], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
    )
    per_q = graded.groupBy("query_id").agg(
        (F.sum((F.col("grade") > 0).cast("int")) / F.lit(float(k))).alias(
            "precision_k"
        ),
        F.coalesce(
            1.0
            / F.min(F.when(F.col("grade") > 0, F.col("rank"))),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
            / F.log2(F.col("rank") + F.lit(1.0))
        ).alias("dcg"),
    )
    # total relevant + ideal DCG from the judgment side (per-query window,
    # bounded by judged docs per query)
    jw = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    ideal = (
        judgments.filter(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(jw))
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_relevant"),
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                    / F.log2(F.col("irank") + F.lit(1.0)),
                ).otherwise(0.0)
            ).alias("idcg"),
        )
    )
    out = per_q.join(ideal, "query_id", "left").select(
        "query_id",
        F.round("precision_k", round_digits).alias("precision_k"),
        F.round(
            F.when(
                F.col("n_relevant").isNull() | (F.col("n_relevant") == 0), 0.0
            ).otherwise(
                F.col("precision_k") * k / F.col("n_relevant")
            ),
            round_digits,
        ).alias("recall_k"),
        F.round("mrr", round_digits).alias("mrr"),
        F.round("dcg", round_digits).alias("dcg"),
        F.round(F.coalesce("idcg", F.lit(0.0)), round_digits).alias("idcg"),
        F.round(
            F.when(
                F.col("idcg").isNull() | (F.col("idcg") == 0.0), 0.0
            ).otherwise(F.col("dcg") / F.col("idcg")),
            round_digits,
        ).alias("ndcg"),
    )
    return out


def err_rbp_ap(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    max_grade: int = 3,
    p: float = 0.8,
    round_digits: int = 6,
) -> DataFrame:
    """The cascade/utility metric family missing from ``rank_eval``:

    * **ERR@k** (Chapelle et al., "Expected Reciprocal Rank for Graded
      Relevance", CIKM 2009): with per-rank stop probability
      R_r = (2^g_r - 1) / 2^max_grade,

          ERR = sum_r (1/r) * R_r * prod_{i<r} (1 - R_i)

      — the running no-stop product is exp(sum ln(1-R)) over the
      preceding-rows window frame (1-R clamped at 1e-12 so a perfect
      grade zeroes the tail identically on every engine).
    * **RBP@k** (Moffat & Zobel, "Rank-Biased Precision", TOIS 26(1)
      2008, persistence ``p``): (1-p) * sum_r rel_r * p^(r-1), binary
      relevance (grade > 0).
    * **AP@k**: sum_r P@r * rel_r / n_relevant with n_relevant the
      query's total relevant judged docs (the trec_eval cutoff form).

    Inputs as in ``rank_eval``: results (query_id, rank, doc_id) with
    rank 1-based, judgments (query_id, doc_id, grade), unjudged = 0.
    One row per query: (query_id, err_k, rbp_k, ap_k).

    Scale shape: one left join, two per-query rank windows (k rows
    each), one aggregate — identical to rank_eval's plan.
    """
    graded = (
        results.filter(F.col("rank") <= k)
        .join(judgments, ["query_id", "doc_id"], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
        .withColumn(
            "r_stop",
            (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
            / F.lit(float(2 ** max_grade)),
        )
        .withColumn("rel", (F.col("grade") > 0).cast("int"))
    )
    wprev = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_rank = graded.withColumn(
        "no_stop",
        F.exp(
            F.coalesce(
                F.sum(
                    F.log(F.greatest(1.0 - F.col("r_stop"), F.lit(1e-12)))
                ).over(wprev),
                F.lit(0.0),
            )
        ),
    ).withColumn("p_at_r", F.sum("rel").over(wrun) / F.col("rank"))
    n_rel = judgments.filter(F.col("grade") > 0).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    return (
        per_rank.groupBy("query_id")
        .agg(
            F.sum(
                F.col("r_stop") * F.col("no_stop") / F.col("rank")
            ).alias("err_raw"),
            F.sum(
                F.col("rel")
                * F.pow(F.lit(float(p)), F.col("rank") - F.lit(1.0))
            ).alias("rbp_sum"),
            F.sum(F.col("p_at_r") * F.col("rel")).alias("ap_num"),
        )
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.round("err_raw", round_digits).alias("err_k"),
            F.round(F.lit(1.0 - p) * F.col("rbp_sum"), round_digits).alias(
                "rbp_k"
            ),
            F.round(
                F.when(
                    F.coalesce(F.col("n_relevant"), F.lit(0)) > 0,
                    F.col("ap_num") / F.col("n_relevant"),
                ).otherwise(0.0),
                round_digits,
            ).alias("ap_k"),
        )
    )


def bpref(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """bpref (Buckley & Voorhees, "Retrieval Evaluation with Incomplete
    Information", SIGIR 2004; trec_eval's ``bpref`` implementation):
    the preference-based metric that IGNORES unjudged documents — the
    right headline metric when judgments are shallow pools:

        bpref = (1/R) * sum_{r in rel retrieved}
                  1 - min(n_above_r, R) / min(R, N)

    with R / N the judged relevant / nonrelevant counts for the query
    and n_above_r the number of judged-NONRELEVANT docs retrieved above
    r (unjudged docs between them simply don't count).  If the query
    has no judged nonrelevant docs (min(R, N) = 0), each relevant
    retrieved doc contributes 1 — trec_eval's convention.

    Also emits ``judged_k``: the judged fraction of the top-k results
    (the standard pool-coverage diagnostic reported next to bpref).

    Inputs as in ``rank_eval``: results (query_id, rank, doc_id) with
    rank 1-based, judgments (query_id, doc_id, grade), grade > 0 =
    relevant.  One row per judged query: (query_id, bpref, judged_k).

    Scale shape: one left join + one per-query rank window + one
    aggregate — rank_eval's plan.
    """
    topk = results.filter(F.col("rank") <= k)
    joined = topk.join(judgments, ["query_id", "doc_id"], "left").withColumn(
        "judged", F.col("grade").isNotNull()
    )
    per_q = judgments.groupBy("query_id").agg(
        F.sum((F.col("grade") > 0).cast("long")).alias("n_rel"),
        F.sum((F.col("grade") <= 0).cast("long")).alias("n_nonrel"),
    )
    w_above = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = (
        joined.withColumn(
            "nonrel_above",
            F.coalesce(
                F.sum(
                    (F.col("judged") & (F.col("grade") <= 0)).cast("long")
                ).over(w_above),
                F.lit(0),
            ),
        )
        .filter(F.col("judged") & (F.col("grade") > 0))
        .join(per_q, "query_id")
        .withColumn(
            "contrib",
            F.when(
                F.least("n_rel", "n_nonrel") > 0,
                1.0
                - F.least(F.col("nonrel_above"), F.col("n_rel"))
                / F.least("n_rel", "n_nonrel"),
            ).otherwise(F.lit(1.0)),
        )
    )
    judged_k = joined.groupBy("query_id").agg(
        F.round(
            F.sum(F.col("judged").cast("long")) / F.count(F.lit(1)),
            round_digits,
        ).alias("judged_k")
    )
    return (
        per_q.join(
            scored.groupBy("query_id").agg(F.sum("contrib").alias("s")),
            "query_id",
            "left",
        )
        .join(judged_k, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.when(
                    F.col("n_rel") > 0,
                    F.coalesce(F.col("s"), F.lit(0.0)) / F.col("n_rel"),
                ).otherwise(0.0),
                round_digits,
            ).alias("bpref"),
            F.coalesce(F.col("judged_k"), F.lit(0.0)).alias("judged_k"),
        )
    )


def rank_correlation(
    run_a: DataFrame,
    run_b: DataFrame,
    round_digits: int = 6,
) -> DataFrame:
    """Kendall tau-a and Spearman rho between two ranked runs, per
    query, over their COMMON documents (the standard way two top-k
    lists are compared — Fagin, Kumar & Sivakumar, "Comparing top k
    lists", SODA 2003 discuss why the intersection convention is the
    tractable one).  Both runs carry (query_id, rank, doc_id); common
    docs are re-ranked 1..n within each run by their original rank so
    ranks are tie-free permutations, then

        tau  = (C - D) / (n(n-1)/2)        (Kendall 1938)
        rho  = 1 - 6 * sum d_i^2 / (n(n^2-1))   (Spearman 1904)

    Queries with n < 2 common docs emit NULL correlations (undefined).

    Use: smoothing/ranker drift audits — e.g. how far LM-Dirichlet
    reorders BM25's candidates.  Shape: the pair join is per-query
    over <= k common docs (k^2/2 pairs of WINDOW rows, never corpus
    rows); everything else is two rank windows and an aggregate.

    Returns (query_id, n_common, kendall_tau, spearman_rho).
    """
    common = run_a.select(
        "query_id", "doc_id", F.col("rank").alias("rank_a")
    ).join(
        run_b.select("query_id", "doc_id", F.col("rank").alias("rank_b")),
        ["query_id", "doc_id"],
    )
    wa = Window.partitionBy("query_id").orderBy("rank_a")
    wb = Window.partitionBy("query_id").orderBy("rank_b")
    rr = common.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rb", F.row_number().over(wb)
    )
    n = rr.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_common"))
    pairs = (
        rr.alias("x")
        .join(
            rr.alias("y"),
            (F.col("x.query_id") == F.col("y.query_id"))
            & (F.col("x.ra") < F.col("y.ra")),
        )
        .select(
            F.col("x.query_id").alias("query_id"),
            F.when(
                F.signum(F.col("y.ra") - F.col("x.ra"))
                == F.signum(F.col("y.rb") - F.col("x.rb")),
                1,
            ).otherwise(-1).alias("cd"),
        )
        .groupBy("query_id")
        .agg(F.sum("cd").alias("c_minus_d"))
    )
    dsq = rr.groupBy("query_id").agg(
        F.sum(
            (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
        ).alias("sum_d2")
    )
    return (
        n.join(pairs, "query_id", "left")
        .join(dsq, "query_id")
        .select(
            "query_id",
            "n_common",
            F.round(
                F.when(
                    F.col("n_common") >= 2,
                    F.col("c_minus_d")
                    / (F.col("n_common") * (F.col("n_common") - 1) / 2.0),
                ),
                round_digits,
            ).alias("kendall_tau"),
            F.round(
                F.when(
                    F.col("n_common") >= 2,
                    1.0
                    - 6.0
                    * F.col("sum_d2")
                    / (
                        F.col("n_common")
                        * (
                            F.col("n_common") * F.col("n_common")
                            - 1.0
                        )
                    ),
                ),
                round_digits,
            ).alias("spearman_rho"),
        )
    )


def rbo(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    round_digits: int = 6,
) -> DataFrame:
    """Rank-Biased Overlap between two indefinite rankings (Webber,
    Moffat & Zobel, "A Similarity Measure for Indefinite Rankings",
    TOIS 28(4) 2010), truncated at depth ``k`` (the paper's eq. 5
    prefix — the minimal RBO the observed prefixes guarantee):

        RBO@k = (1 - p) * sum_{d=1..k} p^(d-1) * X_d / d

    with X_d = |A[1..d] ∩ B[1..d]| the overlap at depth d and ``p``
    the persistence (top-weightedness) parameter.  The set-based
    complement of rank_correlation above: RBO handles lists that are
    not permutations of each other and weights the head.

    Runs carry (query_id, rank, doc_id); queries appearing in either
    run emit a row (a query missing from one run scores 0).

    Shape: a doc enters the overlap at depth max(rank_a, rank_b), so
    X_d is one conditional count against a k-row depth ladder — the
    join is |common docs| x k window rows per query, never corpus
    rows.

    Returns (query_id, rbo_k).
    """
    a = run_a.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("rank_a")
    )
    b = run_b.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("rank_b")
    )
    common = a.join(b, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("rank_a", "rank_b").alias("enter_d")
    )
    qids = (
        run_a.select("query_id").unionByName(run_b.select("query_id"))
        .distinct()
    )
    depths = qids.crossJoin(
        F.broadcast(
            qids.sparkSession.range(1, k + 1).select(
                F.col("id").alias("d")
            )
        )
    )
    xd = (
        depths.join(common, "query_id", "left")
        .groupBy("query_id", "d")
        .agg(
            F.sum(
                F.when(F.col("enter_d") <= F.col("d"), 1).otherwise(0)
            ).alias("x_d")
        )
    )
    return (
        xd.groupBy("query_id")
        .agg(
            F.round(
                F.lit(1.0 - p)
                * F.sum(
                    F.pow(F.lit(p), F.col("d") - 1)
                    * F.col("x_d")
                    / F.col("d")
                ),
                round_digits,
            ).alias("rbo_k")
        )
    )


def diversity_eval(
    results: DataFrame,
    aspect_judgments: DataFrame,
    k: int = 10,
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Novelty/diversity evaluation over aspect (intent) judgments:

    * **alpha-DCG@k** (Clarke et al., "Novelty and Diversity in
      Information Retrieval Evaluation", SIGIR 2008): the gain of the
      doc at rank r is sum_a J(d_r, a) * (1 - alpha)^(c_a) with c_a =
      number of HIGHER-ranked docs already covering aspect a;
      discounted by log2(1 + r).  Emitted UNNORMALIZED — the ideal
      reordering that alpha-nDCG divides by is NP-hard and ndeval
      ships a greedy approximation that is inherently sequential; the
      unnormalized score is the comparable-across-runs quantity on a
      fixed judgment set (normalize offline with ndeval's greedy ideal
      if cross-topic averaging is needed).
    * **ERR-IA@k** (Chapelle et al. CIKM 2009 / the TREC diversity
      track's intent-aware expansion): uniform-weight average over the
      query's judged aspects of per-aspect ERR with binary stop
      probability R = 1/2.

    Inputs: results (query_id, rank, doc_id), aspect_judgments
    (query_id, doc_id, aspect) — binary: a row means the doc is
    relevant to that aspect.  One row per judged query:
    (query_id, n_aspects, alpha_dcg, err_ia).

    Scale shape: one join of the k-deep result lists against the
    judgment pairs, two (query, aspect) rank windows, one aggregate —
    rank_eval's plan with an extra aspect key in the shuffle.
    """
    topk = results.filter(F.col("rank") <= k)
    hits = topk.join(aspect_judgments, ["query_id", "doc_id"])
    w_prior = (
        Window.partitionBy("query_id", "aspect")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_hit = hits.withColumn(
        "c_prior",
        F.coalesce(F.count(F.lit(1)).over(w_prior), F.lit(0)),
    )
    adcg = (
        per_hit.groupBy("query_id")
        .agg(
            F.sum(
                F.pow(F.lit(1.0 - alpha), F.col("c_prior"))
                / (F.log(F.col("rank") + 1.0) / math.log(2.0))
            ).alias("alpha_dcg")
        )
    )
    # per-aspect ERR with R = 1/2: ranks r_1 < r_2 < ... of the
    # aspect's relevant docs contribute (1/r_m) * (1/2) * (1/2)^(m-1)
    err_a = (
        per_hit.withColumn(
            "err_term",
            F.lit(0.5)
            * F.pow(F.lit(0.5), F.col("c_prior"))
            / F.col("rank"),
        )
        .groupBy("query_id", "aspect")
        .agg(F.sum("err_term").alias("err"))
    )
    n_aspects = aspect_judgments.groupBy("query_id").agg(
        F.countDistinct("aspect").alias("n_aspects")
    )
    err_ia = (
        n_aspects.join(
            err_a.groupBy("query_id").agg(F.sum("err").alias("err_sum")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            "n_aspects",
            (
                F.coalesce(F.col("err_sum"), F.lit(0.0)) / F.col("n_aspects")
            ).alias("err_ia"),
        )
    )
    return (
        err_ia.join(adcg, "query_id", "left")
        .select(
            "query_id",
            "n_aspects",
            F.round(F.coalesce("alpha_dcg", F.lit(0.0)), round_digits).alias(
                "alpha_dcg"
            ),
            F.round("err_ia", round_digits).alias("err_ia"),
        )
    )


def wilcoxon_signed_rank(
    per_query_a: DataFrame,
    per_query_b: DataFrame,
    metric_col: str = "metric",
    round_digits: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test between two systems' per-query
    effectiveness scores — the matched-pairs significance test the IR
    evaluation literature recommends over the sign test (Wilcoxon,
    "Individual comparisons by ranking methods", Biometrics 1945;
    Smucker, Allan & Carterette, "A Comparison of Statistical
    Significance Tests for Information Retrieval Evaluation", CIKM
    2007 study it against the t-test/bootstrap).

    Procedure (deterministic, shared with the SQL oracle): pair on
    query_id, drop zero differences, rank |d| ascending with AVERAGE
    ranks for ties, W+ = rank sum of positive d, and the normal
    approximation with the tie correction

        z = (W+ - n(n+1)/4)
            / sqrt(n(n+1)(2n+1)/24 - sum_ties(t^3 - t)/48)

    Returns ONE row: (n_pairs, n_nonzero, w_plus, w_minus, z).
    z is NULL when every pair ties (variance 0) or n_nonzero = 0.

    Shape: the pair join is per-query; ranking |d| is one window over
    n query rows (never corpus rows); one aggregate emits the
    statistic.  Evaluating two rankers over 10^7 logged queries is a
    join + window + agg — nothing driver-side.
    """
    d = (
        per_query_a.select(
            "query_id", F.col(metric_col).alias("ma")
        )
        .join(
            per_query_b.select(
                "query_id", F.col(metric_col).alias("mb")
            ),
            "query_id",
        )
        .select(
            "query_id",
            (F.col("ma") - F.col("mb")).alias("d"),
        )
    )
    nz = d.filter(F.col("d") != 0).withColumn("absd", F.abs(F.col("d")))
    # average ranks for ties: min_rank + (tie_count - 1)/2
    wr = Window.orderBy("absd")
    ranked = (
        nz.withColumn("min_rank", F.rank().over(wr))
        .withColumn(
            "tie_n", F.count(F.lit(1)).over(Window.partitionBy("absd"))
        )
        .withColumn(
            "avg_rank",
            F.col("min_rank") + (F.col("tie_n") - 1) / 2.0,
        )
    )
    ties = (
        ranked.groupBy("absd")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n_nonzero"),
        F.sum(F.when(F.col("d") > 0, F.col("avg_rank")).otherwise(0.0)).alias(
            "w_plus"
        ),
        F.sum(F.when(F.col("d") < 0, F.col("avg_rank")).otherwise(0.0)).alias(
            "w_minus"
        ),
    )
    n_pairs = d.agg(F.count(F.lit(1)).alias("n_pairs"))
    nn = F.col("n_nonzero").cast("double")
    var = nn * (nn + 1.0) * (2.0 * nn + 1.0) / 24.0 - F.col(
        "tie_term"
    ) / 48.0
    return (
        n_pairs.crossJoin(
            stats.crossJoin(F.broadcast(ties))
        )
        .select(
            "n_pairs",
            F.col("n_nonzero").cast("long").alias("n_nonzero"),
            F.round(F.coalesce("w_plus", F.lit(0.0)), round_digits).alias(
                "w_plus"
            ),
            F.round(F.coalesce("w_minus", F.lit(0.0)), round_digits).alias(
                "w_minus"
            ),
            F.round(
                F.when(
                    (F.col("n_nonzero") > 0) & (var > 0),
                    (F.col("w_plus") - nn * (nn + 1.0) / 4.0)
                    / F.sqrt(var),
                ),
                round_digits,
            ).alias("z"),
        )
    )


def condorcet_audit(
    runs: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Condorcet analysis of multiple rankers' top-k lists — does a
    pairwise-majority winner exist, and does Borda agree?

    Social-choice rank aggregation (de Borda 1781; Condorcet 1785;
    the framing Dwork, Kumar, Naor & Sivakumar, "Rank aggregation
    methods for the web", WWW 2001 brought to metasearch): treat each
    ranker as a voter over the union of returned documents (absent
    documents rank worst, position k+1).  A CONDORCET WINNER beats
    every other candidate in pairwise majority; it need not exist
    (Condorcet's paradox), and when it does, Kemeny-optimal
    aggregations must rank it first — so its existence and the Borda
    winner's agreement certify cheap Borda fusion per query.

    ``runs``: (ranker, query_id, doc_id, rank).  Per query:
    (query_id, n_candidates, condorcet_winner, borda_winner,
    winners_agree) with NULL condorcet_winner when none exists.
    Shape: per-query candidate union (<= rankers*k docs), pairwise
    vote join bounded by that union, two rollups.
    """
    n_rankers = runs.select("ranker").distinct().count()
    cand = runs.select("query_id", "doc_id").distinct()
    grid = (
        cand.join(
            runs.select(
                "ranker", "query_id",
                F.col("doc_id").alias("r_doc"),
                F.col("rank").alias("r_rank"),
            ).alias("r"),
            "query_id",
        )
        .filter(F.col("doc_id") == F.col("r_doc"))
        .select("query_id", "doc_id", "ranker", "r_rank")
    )
    full = (
        cand.crossJoin(
            F.broadcast(runs.select("ranker").distinct())
        )
        .join(
            grid,
            ["query_id", "doc_id", "ranker"],
            "left",
        )
        .na.fill({"r_rank": k + 1})
    )
    a = full.select(
        "query_id", "ranker",
        F.col("doc_id").alias("a"),
        F.col("r_rank").alias("ra"),
    )
    b = full.select(
        "query_id", "ranker",
        F.col("doc_id").alias("b"),
        F.col("r_rank").alias("rb"),
    )
    votes = (
        a.join(b, ["query_id", "ranker"])
        .filter(F.col("a") != F.col("b"))
        .groupBy("query_id", "a", "b")
        .agg(
            F.sum((F.col("ra") < F.col("rb")).cast("long")).alias(
                "wins"
            )
        )
    )
    majority = n_rankers / 2.0
    beats_all = (
        votes.groupBy("query_id", "a")
        .agg(
            F.min(
                (F.col("wins") > majority).cast("int")
            ).alias("all_maj")
        )
        .filter(F.col("all_maj") == 1)
        .groupBy("query_id")
        .agg(F.min("a").alias("condorcet_winner"))
    )
    borda = (
        full.groupBy("query_id", "doc_id")
        .agg(F.sum(F.lit(k + 1) - F.col("r_rank")).alias("pts"))
    )
    from pyspark.sql import Window

    wb = Window.partitionBy("query_id").orderBy(
        F.col("pts").desc(), F.col("doc_id").asc()
    )
    borda_w = (
        borda.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("doc_id").alias("borda_winner"))
    )
    n_cand = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    return (
        n_cand.join(borda_w, "query_id")
        .join(beats_all, "query_id", "left")
        .select(
            "query_id",
            "n_candidates",
            "condorcet_winner",
            "borda_winner",
            (
                F.col("condorcet_winner") == F.col("borda_winner")
            ).alias("winners_agree"),
        )
    )


def score_calibration_audit(
    docs: DataFrame,
    queries: DataFrame,
    thresholds=(1.0, 2.0, 4.0),
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Cross-query score-calibration audit — why absolute BM25-style
    thresholds don't work.

    The practitioner lesson every relevance-threshold feature
    relearns (Lucene documents it as "scores are not comparable
    across queries"): raw retrieval scores depend on query length and
    idf mass, so one absolute cutoff keeps everything for one query
    and nothing for another.  This audit makes the failure measurable:
    per query, the top-k score range; per candidate threshold, the
    fraction of queries whose ENTIRE top-k clears it vs loses it —
    a well-calibrated score would move smoothly, an uncalibrated one
    bimodally (all-or-nothing per query), which is what the spread
    between all_above and none_above shows.

    Per threshold: (threshold, n_queries, q_all_above, q_none_above,
    q_split, mean_kept_frac).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    dfs_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(tf, "term")
        .join(dfs_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("s")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    out = None
    for t in thresholds:
        per_q = top.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("nk"),
            F.sum((F.round("s", 6) >= t).cast("long")).alias(
                "n_above"
            ),
        )
        row = per_q.agg(
            F.lit(float(t)).alias("threshold"),
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                (F.col("n_above") == F.col("nk")).cast("long")
            ).alias("q_all_above"),
            F.sum((F.col("n_above") == 0).cast("long")).alias(
                "q_none_above"
            ),
            F.sum(
                (
                    (F.col("n_above") > 0)
                    & (F.col("n_above") < F.col("nk"))
                ).cast("long")
            ).alias("q_split"),
            F.round(
                F.avg(
                    F.col("n_above") / F.col("nk").cast("double")
                ),
                round_digits,
            ).alias("mean_kept_frac"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def doc_visibility_audit(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    top_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Reverse top-k — which documents are VISIBLE, and through how
    many queries?

    The inverse view of retrieval (Vlachou et al., "Reverse top-k
    queries", ICDE 2010 formalized it; SEO tooling calls it "ranking
    keywords per page"): for each document, the number of query-set
    members whose top-k contains it and its best rank — the
    document's query-surface area.  Documents invisible to every
    query are the dead inventory content audits prune (the corpus-
    side complement of ``content_gap_audit``'s query-side view).

    Top-``top_n`` docs by (n_queries desc, best_rank asc, doc):
    (rank, doc_id, n_queries, best_rank, mean_rank).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    dfs_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(tf, "term")
        .join(dfs_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("s")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    top = scored.withColumn("qrank", F.row_number().over(w)).filter(
        F.col("qrank") <= k
    )
    vis = top.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.min("qrank").alias("best_rank"),
        F.round(F.avg("qrank"), round_digits).alias("mean_rank"),
    )
    wr = Window.orderBy(
        F.col("n_queries").desc(),
        F.col("best_rank").asc(),
        F.col("doc_id").asc(),
    )
    return (
        vis.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_n)
        .select(
            "rank", "doc_id", "n_queries", "best_rank", "mean_rank"
        )
    )


def score_tie_audit(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Score-tie exposure of the top-k — how much of the ranking is
    decided by the tie-break, not the score?

    The determinism audit behind this repo's own round-then-tiebreak
    discipline (and the reason TREC runs specify a secondary sort):
    adjacent top-k entries with EQUAL rounded scores are ordered by
    doc id alone — their relative order is an artifact, and any
    evaluation metric difference inside a tie block is noise.  Per
    query: the number of tied adjacent boundaries in the top-k, the
    largest tie-block size, and whether rank 1 itself is tied (the
    worst case: the 'winner' is arbitrary).

    (query_id, n_tied_boundaries, max_tie_block, top1_tied).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    dfs_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(tf, "term")
        .join(dfs_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log(1.0 + F.col("tf"))
                    * F.log(F.lit(float(n_docs)) / F.col("df"))
                ),
                6,
            ).alias("s")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("doc_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    wl = Window.partitionBy("query_id").orderBy("rank")
    t2 = top.withColumn("prev_s", F.lag("s").over(wl)).withColumn(
        "tied", (F.col("s") == F.col("prev_s")).cast("long")
    )
    blocks = top.groupBy("query_id", "s").agg(
        F.count(F.lit(1)).alias("bs")
    )
    mx = blocks.groupBy("query_id").agg(
        F.max("bs").alias("max_tie_block")
    )
    per = t2.groupBy("query_id").agg(
        F.coalesce(F.sum("tied"), F.lit(0)).alias(
            "n_tied_boundaries"
        ),
    )
    top1 = (
        t2.filter(F.col("rank") == 2)
        .select(
            "query_id", (F.col("tied") == 1).alias("top1_tied")
        )
    )
    return (
        per.join(mx, "query_id")
        .join(top1, "query_id", "left")
        .na.fill({"top1_tied": False})
        .select(
            "query_id", "n_tied_boundaries", "max_tie_block",
            "top1_tied",
        )
    )
