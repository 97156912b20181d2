"""Two-tier index with a per-query correctness guarantee.

Ntoulas & Cho, "Pruning Policies for Two-Tiered Inverted Index with
Correctness Guarantee" (SIGIR 2007): serve queries from a small
first-tier index (per term, the top-``keep_per_term`` postings by
impact) and fall back to the full second tier ONLY when the first
tier cannot PROVE its answer equals the full index's — unlike blind
static pruning (index/pruning.py, Carmel et al.), no query ever
returns a silently wrong top-k.

The guarantee evaluated here: let s1(d) be a doc's tier-1 BM25 score
and pbar_t the maximum per-term impact among the postings PRUNED out
of term t's tier-1 list (0 if nothing was pruned). Any doc's true
score is at most s1(d) + Σ_t pbar_t, so if

    s1(d_k)  >=  s1(d_{k+1}) + Σ_t pbar_t

(with s1(d_{k+1}) = 0 when tier 1 found fewer than k+1 docs) then no
doc outside the tier-1 top-k can overtake rank k and the answer is
provably complete — the conservative form of the paper's bound (a doc
already holding tier-1 postings for every query term cannot gain the
full pruned mass; tightening that needs per-doc bookkeeping the
broker doesn't have). The audit ALSO computes ground truth against
the unpruned index, so the reported guarantee can be checked: every
``guaranteed`` query must be ``identical``; the converse may fail
(lucky answers the bound cannot certify — exactly the tier-2
fallback traffic).

Scale shape: tier-1 cut is one window over the (term)-partitioned
posting relation; pbar_t is the same window's complement aggregated
per term (no second scan: rank once, split by the rank predicate);
both evaluations are the standard BM25 join; per-query bound is a
broadcast-sized join of query terms to the tiny pbar relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _toks
from tokenkit_spark.index.pruning import _bm25_over


def tiered_eval(
    docs: DataFrame,
    queries: DataFrame,
    keep_per_term: int = 8,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Per query: (query_id, kth_score, next_score, pruned_bound,
    guaranteed, identical, tier1_frac) — guaranteed per the bound
    above; identical = tier-1 top-k doc set equals the full-index
    top-k doc set; tier1_frac = fraction of this query's posting rows
    that live in tier 1 (the served cost)."""
    toks = _toks(docs, id_col, text_col).withColumnRenamed(id_col, "doc_id")
    postings = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
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
    # rank once per term by impact (tf desc, doc_id asc — the same
    # deterministic order as prune_postings); split into tiers
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    ranked = postings.withColumn("__pr", F.row_number().over(w))
    tier1 = ranked.filter(F.col("__pr") <= keep_per_term).drop("__pr")
    pruned = ranked.filter(F.col("__pr") > keep_per_term).drop("__pr")

    # pbar_t: max per-term BM25 impact among the pruned postings
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
        )
    )
    pbar = (
        pruned.join(df_t, "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(globals_))
        .groupBy("term")
        .agg(F.max(idf * sat).alias("pbar"))
    )
    bound = (
        qterms.join(pbar, "term", "left")
        .groupBy("query_id")
        .agg(
            F.round(F.sum(F.coalesce(F.col("pbar"), F.lit(0.0))),
                    round_digits).alias("pruned_bound")
        )
    )

    # k+1 tier-1 scores so both the k-th and (k+1)-th are visible
    t1_top = _bm25_over(
        qterms, tier1, df_t, dstats, globals_, k1, b, k + 1, round_digits
    )
    full_top = _bm25_over(
        qterms, postings, df_t, dstats, globals_, k1, b, k, round_digits
    )
    edge = t1_top.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == k, F.col("score"))).alias("kth_score"),
        F.max(F.when(F.col("rank") == k + 1, F.col("score")))
        .alias("next_score"),
    )
    t1_set = (
        t1_top.filter(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(F.collect_set("doc_id").alias("__t1"))
    )
    full_set = full_top.groupBy("query_id").agg(
        F.collect_set("doc_id").alias("__fd")
    )
    cost = (
        qterms.join(
            ranked.select(
                "term", (F.col("__pr") <= keep_per_term).alias("in_t1")
            ),
            "term",
        )
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.col("in_t1").cast("long"))
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                round_digits,
            ).alias("tier1_frac")
        )
    )
    return (
        queries.select("query_id")
        .join(edge, "query_id", "left")
        .join(bound, "query_id", "left")
        .join(t1_set, "query_id", "left")
        .join(full_set, "query_id", "left")
        .join(cost, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("kth_score", F.lit(0.0)).alias("kth_score"),
            F.coalesce("next_score", F.lit(0.0)).alias("next_score"),
            F.coalesce("pruned_bound", F.lit(0.0)).alias("pruned_bound"),
            (
                F.coalesce("kth_score", F.lit(0.0))
                >= F.coalesce("next_score", F.lit(0.0))
                + F.coalesce("pruned_bound", F.lit(0.0))
            ).alias("guaranteed"),
            (
                F.size(
                    F.array_except(
                        F.coalesce("__fd", F.array()),
                        F.coalesce("__t1", F.array()),
                    )
                )
                == 0
            ).alias("identical"),
            F.coalesce("tier1_frac", F.lit(0.0)).alias("tier1_frac"),
        )
        .orderBy("query_id")
    )
