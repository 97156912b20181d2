"""Taily resource selection — moment-based shard routing from term
statistics alone (no sample index).

Aly, Hiemstra & Demeester, "Taily: shard selection using the tail of
score distributions" (SIGIR 2013): where ReDDE (``redde.py``) runs
every query against a central sample and CORI (``cori.py``) scores
collection language models, Taily keeps only per-(term, shard)
SUFFICIENT STATISTICS — document frequency and the first two moments
of the per-document term score — and at query time combines them
under term independence into a per-shard score distribution, then
estimates how many of the shard's documents score above a cutoff
``s_c``.  Selection cost is O(|q| * n_shards) regardless of corpus
size: the 10^12-doc-friendly end of the resource-selection spectrum.

Per (term t, shard i), over the docs of shard i containing t:

    f_ti   = |{d : tf > 0}|
    E_ti   = mean of w_dt,   E2_ti = mean of w_dt^2

with the per-doc term score w_dt = ln(1 + tf) * ln(N / df_t) (global
df).  For query q = {t1..tm} and shard i with |D_i| docs, under the
paper's conjunctive independence model:

    f_qi     = (prod_t f_ti) / |D_i|^(m-1)      (docs with ALL terms)
    mu_qi    = sum_t E_ti
    var_qi   = sum_t (E2_ti - E_ti^2)

Taily fits Gamma(k = mu^2/var, theta = var/mu) to the score
distribution and takes the upper tail at s_c.  DOCUMENTED DEVIATION:
the regularized incomplete gamma function has no closed form shared
by Spark SQL and the DuckDB oracle, so this implementation bounds the
tail with the one-sided Chebyshev (Cantelli) inequality instead —

    P(S > s_c) <= var / (var + (s_c - mu)^2)   for s_c > mu, else 1

— same sufficient statistics, same pipeline, a distribution-free
bound in place of the Gamma CDF (the fitted k, theta are still
emitted so the Gamma view is recoverable).  The audit joins the
estimate against the EXACT per-shard count of conjunctive docs
scoring above s_c, so the quality of the bound is measured, not
assumed.

Scale shape: the statistics table is one (term, shard)-keyed
aggregation over the postings (built once, incrementally mergeable —
moments are sums); query-time work is a broadcast join of the tiny
query-term table against it.  The exact twin is the expensive
full-corpus scan — present here only as the audit's ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.routing import route_shard_col


def _toks(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )


def _tf_df_ndocs(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Shared base tables for the statistics AND the exact audit twin
    (ADVICE r03: taily_select recomputed all of this a second time):
    per-(term, doc) tf, per-term df, and the doc count — one
    tokenization pass, one count action."""
    toks = _toks(docs, text_col, id_col)
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    n_docs = docs.select(F.col(id_col)).distinct().count()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf, df_t, n_docs


def taily_shard_stats(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    _base: tuple | None = None,
) -> DataFrame:
    """(term, shard, f, e1, e2) — Taily sufficient statistics: doc
    frequency and raw first/second moments of w = ln(1+tf)*ln(N/df)
    per (term, shard); plus the per-shard doc counts as a second
    return value (shard, n_docs). ``_base`` lets taily_select pass the
    shared (tf, df, n_docs) tables instead of recomputing them."""
    tf, df_t, n_docs = _base or _tf_df_ndocs(docs, text_col, id_col)
    w = (
        tf.join(df_t, "term")
        .select(
            "term",
            "doc_id",
            (
                F.log(F.lit(1.0) + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("w"),
        )
        .withColumn("shard", route_shard_col("doc_id", n_shards))
    )
    return w.groupBy("term", "shard").agg(
        F.count(F.lit(1)).alias("f"),
        F.avg("w").alias("e1"),
        F.avg(F.col("w") * F.col("w")).alias("e2"),
    )


def taily_select(
    docs: DataFrame,
    queries: DataFrame,
    n_shards: int = 8,
    s_c: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Audit Taily shard selection against exact conjunctive counts:
    (query_id, shard, n_terms, f_q, mu, k_gamma, theta_gamma, est_n,
    exact_n, est_rank, exact_rank) for every shard holding ALL the
    query's terms.  ``est_n`` uses the Cantelli tail bound (module
    docstring); ``exact_n`` counts the shard's conjunctive docs with
    score > s_c.  The tokenization / tf / df / doc-count base is
    computed ONCE and shared between the statistics table and the
    exact audit branch (ADVICE r03)."""
    base = _tf_df_ndocs(docs, text_col, id_col)
    stats = taily_shard_stats(docs, n_shards, text_col, id_col, _base=base)
    shard_sizes = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            route_shard_col(id_col, n_shards).alias("shard"),
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_shard_docs"))
    )
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    ).distinct()
    qsizes = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms")
    )

    per_shard = (
        F.broadcast(qterms)
        .join(stats, "term")
        .groupBy("query_id", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.product("f").alias("f_prod"),
            F.sum("e1").alias("mu"),
            F.sum(F.col("e2") - F.col("e1") * F.col("e1")).alias("var"),
        )
    )
    est = (
        per_shard.join(F.broadcast(qsizes), "query_id")
        .filter(F.col("n_present") == F.col("n_terms"))
        .join(F.broadcast(shard_sizes), "shard")
        .withColumn(
            "f_q",
            F.col("f_prod")
            / F.pow(F.col("n_shard_docs"), F.col("n_terms") - F.lit(1)),
        )
        .withColumn(
            "p_tail",
            F.when(F.lit(s_c) <= F.col("mu"), F.lit(1.0))
            .when(F.col("var") <= 0, F.lit(0.0))
            .otherwise(
                F.col("var")
                / (
                    F.col("var")
                    + (F.lit(s_c) - F.col("mu")) * (F.lit(s_c) - F.col("mu"))
                )
            ),
        )
        .withColumn("est_n", F.col("f_q") * F.col("p_tail"))
        .withColumn(
            "k_gamma",
            F.when(
                F.col("var") > 0,
                F.col("mu") * F.col("mu") / F.col("var"),
            ),
        )
        .withColumn(
            "theta_gamma",
            F.when(F.col("var") > 0, F.col("var") / F.col("mu")),
        )
    )

    # exact twin: conjunctive docs above the cutoff, per shard —
    # reuses the SAME tf/df/n_docs tables as the statistics branch
    tf, df_t, n_docs = base
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(df_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.sum(
                F.log(F.lit(1.0) + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("score"),
        )
        .join(F.broadcast(qsizes), "query_id")
        .filter(
            (F.col("n_hit") == F.col("n_terms")) & (F.col("score") > s_c)
        )
        .withColumn("shard", route_shard_col("doc_id", n_shards))
        .groupBy("query_id", "shard")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )

    joined = est.join(scored, ["query_id", "shard"], "left").na.fill(
        {"exact_n": 0}
    )
    we = Window.partitionBy("query_id").orderBy(
        F.round(F.col("est_n"), round_digits).desc(), F.col("shard").asc()
    )
    wx = Window.partitionBy("query_id").orderBy(
        F.col("exact_n").desc(), F.col("shard").asc()
    )
    return (
        joined.withColumn("est_rank", F.row_number().over(we))
        .withColumn("exact_rank", F.row_number().over(wx))
        .select(
            "query_id",
            "shard",
            "n_terms",
            F.round("f_q", round_digits).alias("f_q"),
            F.round("mu", round_digits).alias("mu"),
            F.round("k_gamma", round_digits).alias("k_gamma"),
            F.round("theta_gamma", round_digits).alias("theta_gamma"),
            F.round("est_n", round_digits).alias("est_n"),
            "exact_n",
            "est_rank",
            "exact_rank",
        )
    )
