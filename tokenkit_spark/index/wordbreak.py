"""Word-break / word-combine spelling suggestions.

Lucene's ``WordBreakSpellChecker`` contract: a query term that does
not occur in the corpus may really be two corpus words run together
("hashjoin" -> "hash join"), and two adjacent query terms may really
be one corpus word ("ta ble" -> "table"). Suggestions come from the
corpus vocabulary itself — no external dictionary:

* **break**: for each out-of-vocabulary query term, try every split
  point; keep splits where BOTH halves are vocabulary words with
  df >= ``min_df``. Scored by the weaker half (min df), the standard
  both-parts-must-be-real heuristic.
* **combine**: for each adjacent pair of query terms that are BOTH
  out-of-vocabulary (a pair of real words is a phrase, not a typo),
  keep the concatenation when it IS a vocabulary word; scored by its
  df.

Scale shape: the vocabulary relation (term, df) is the posting
dictionary the index already maintains; query terms are tiny; break
explodes |term|-1 split points per OOV term and equi-joins the vocab
twice; combine is one lead() over query positions + one vocab join.
All joins are broadcast-sized on the query side. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_break_suggest(
    docs: DataFrame,
    queries: DataFrame,
    min_df: int = 1,
    k: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Per query: (query_id, kind, original, suggestion, freq, rank)
    — kind in ('break', 'combine'), rank per (query_id, original) by
    (freq desc, suggestion asc), top-``k`` suggestions kept."""
    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    qterms = queries.select(
        "query_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("qpos", "term"),
    )
    oov = qterms.join(vocab.select("term"), "term", "left_anti")

    # break: split an OOV term at every interior position
    splits = oov.select(
        "query_id",
        F.col("term").alias("original"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("term") - 1, F.lit(1)))
        ).alias("sp"),
    ).filter(F.col("sp") < F.length("original")).select(
        "query_id",
        "original",
        F.expr("substring(original, 1, sp)").alias("left"),
        F.expr("substring(original, sp + 1)").alias("right"),
    )
    breaks = (
        splits.join(
            vocab.select(F.col("term").alias("left"),
                         F.col("df").alias("df_l")),
            "left",
        )
        .join(
            vocab.select(F.col("term").alias("right"),
                         F.col("df").alias("df_r")),
            "right",
        )
        .select(
            "query_id",
            F.lit("break").alias("kind"),
            "original",
            F.concat_ws(" ", "left", "right").alias("suggestion"),
            F.least("df_l", "df_r").alias("freq"),
        )
    )

    # combine: adjacent OOV+OOV pairs whose concatenation is in vocab
    wq = Window.partitionBy("query_id").orderBy("qpos")
    in_vocab = qterms.join(
        vocab.select("term", F.lit(True).alias("__iv")), "term", "left"
    ).withColumn("__iv", F.coalesce("__iv", F.lit(False)))
    pairs = (
        in_vocab.withColumn("nxt", F.lead("term").over(wq))
        .withColumn("nxt_iv", F.lead("__iv").over(wq))
        .filter(
            F.col("nxt").isNotNull() & ~F.col("__iv") & ~F.col("nxt_iv")
        )
        .select(
            "query_id",
            F.concat_ws(" ", "term", "nxt").alias("original"),
            F.concat("term", "nxt").alias("joined"),
        )
    )
    combines = pairs.join(
        vocab.select(F.col("term").alias("joined"), "df"), "joined"
    ).select(
        "query_id",
        F.lit("combine").alias("kind"),
        "original",
        F.col("joined").alias("suggestion"),
        F.col("df").alias("freq"),
    )

    out = breaks.unionByName(combines)
    wr = Window.partitionBy("query_id", "original").orderBy(
        F.col("freq").desc(), F.col("suggestion").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "kind", "original", "suggestion", "freq", "rank")
        .orderBy("query_id", "original", "rank")
    )


def spell_recall_eval(
    docs: DataFrame,
    typo_mod: int = 7,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Planted-typo evaluation of the edit-distance-1 spelling
    suggester — the harness behind every spell-correction quality
    claim.

    Protocol per the suggester literature (Whitelaw et al., "Using
    the web for language independent spellchecking", EMNLP 2009
    evaluate exactly this way): plant DETERMINISTIC single-edit typos
    of vocabulary words — here: for every ``typo_mod``-th distinct
    vocabulary term (length >= 4, alphabetical order pinned), delete
    its second character — run the df-ranked distance-1 suggester,
    and score whether the ORIGINAL word comes back at rank 1.
    A planted typo that collides with a real vocabulary word is
    excluded (it is not a typo to the system) and reported.

    One row: (n_planted, n_excluded_real, n_top1_correct,
    n_in_candidates, top1_acc, recall_any).

    Scale shape: the candidate join is typo x vocabulary filtered by
    levenshtein = 1 — the same bounded join the live suggester uses;
    everything else is rank windows.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term")
    )
    tstats = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.orderBy("term")
    planted = (
        tstats.filter(
            F.col("term").rlike("^[a-z]{4,}$")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % typo_mod == 0)
        .select(
            F.col("term").alias("truth"),
            F.concat(
                F.substring("term", 1, 1),
                F.expr("substring(term, 3)"),
            ).alias("typo"),
        )
    )
    real = planted.join(
        tstats.select(F.col("term").alias("typo")), "typo", "left_semi"
    )
    n_excluded = real.count()
    valid = planted.join(real.select("typo"), "typo", "left_anti")
    n_planted = valid.count()
    cand = valid.join(
        tstats,
        F.levenshtein(F.col("typo"), F.col("term")) == 1,
    )
    wr = Window.partitionBy("typo").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    ranked = cand.withColumn("r", F.row_number().over(wr))
    agg = ranked.agg(
        F.sum(
            ((F.col("r") == 1) & (F.col("term") == F.col("truth")))
            .cast("long")
        ).alias("top1"),
        F.sum(
            (F.col("term") == F.col("truth")).cast("long")
        ).alias("any_"),
    ).collect()[0]
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_planted,
                n_excluded,
                int(agg.top1 or 0),
                int(agg.any_ or 0),
                round((agg.top1 or 0) / n_planted, round_digits)
                if n_planted
                else 0.0,
                round((agg.any_ or 0) / n_planted, round_digits)
                if n_planted
                else 0.0,
            )
        ],
        "n_planted long, n_excluded_real long, n_top1_correct long, "
        "n_in_candidates long, top1_acc double, recall_any double",
    )


def typo_robustness_audit(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Retrieval robustness to query typos, with and without a
    spelling front-end.

    The end-to-end eval the planted-typo harness (``spell_recall_eval``)
    feeds: corrupt each query's FIRST term with the deterministic
    delete-2nd-char typo, retrieve under (a) the raw typo and (b) the
    typo corrected by the df-ranked distance-1 suggester, and compare
    both top-k lists to the clean query's.  The gap between the two
    rows is the business case for the correction front-end.

    Per (query, mode in {typo_raw, typo_corrected}): (query_id, mode,
    topk_overlap, top1_match).  Scoring is the shared
    ln(1+tf)*ln(N/df) ranker; correction picks the highest-df
    distance-1 vocabulary term (ties alphabetical), falling back to
    the typo itself when no candidate exists.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col("doc_id"),
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
    n_docs = docs.select("doc_id").distinct().count()
    tstats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    def topk(qterms):
        scored = (
            qterms.join(tf, "term")
            .join(tstats, "term")
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
        return scored.withColumn(
            "rank", F.row_number().over(w)
        ).filter(F.col("rank") <= k)

    split_q = queries.select(
        "query_id",
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
        ).alias("ts"),
    )
    first_t = F.element_at("ts", 1)
    typo = F.concat(
        F.substring(first_t, 1, 1), F.expr("substring(ts[0], 3)")
    )
    qbase = split_q.select(
        "query_id",
        F.explode("ts").alias("term"),
    ).distinct()
    clean = topk(qbase).select(
        "query_id",
        F.col("doc_id").alias("c_doc"),
        F.col("rank").alias("c_rank"),
    )
    typo_first = split_q.select(
        "query_id", first_t.alias("orig"), typo.alias("typo")
    )
    q_typo = (
        split_q.select(
            "query_id",
            F.explode(
                F.concat(
                    F.array(typo), F.slice("ts", 2, 10000)
                )
            ).alias("term"),
        )
        .distinct()
    )
    # correction: best distance-1 vocab term for the typo
    cand = typo_first.join(
        tstats,
        F.levenshtein(F.col("typo"), F.col("term")) == 1,
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    corr = (
        cand.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("term").alias("corrected"))
    )
    q_corr = (
        split_q.join(corr, "query_id", "left")
        .select(
            "query_id",
            F.explode(
                F.concat(
                    F.array(
                        F.coalesce(F.col("corrected"), typo)
                    ),
                    F.slice("ts", 2, 10000),
                )
            ).alias("term"),
        )
        .distinct()
    )
    out = None
    for mode, qt in (("typo_raw", q_typo), ("typo_corrected", q_corr)):
        t = topk(qt)
        cmp = (
            t.join(
                clean,
                (t.query_id == clean.query_id)
                & (t.doc_id == F.col("c_doc")),
                "left",
            )
            .groupBy(t.query_id)
            .agg(
                F.sum(F.col("c_rank").isNotNull().cast("long")).alias(
                    "topk_overlap"
                ),
                F.max(
                    ((F.col("rank") == 1) & (F.col("c_rank") == 1))
                    .cast("long")
                ).alias("top1_match"),
            )
            .select(
                "query_id",
                F.lit(mode).alias("mode"),
                "topk_overlap",
                "top1_match",
            )
        )
        out = cmp if out is None else out.unionByName(cmp)
    return out


def autocomplete_selectivity(
    docs: DataFrame,
    max_len: int = 6,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Prefix-length selectivity curve for autocomplete — how fast
    does typing narrow the dictionary?

    The latency/UX planning number behind every search-as-you-type
    box (Bast & Weber's CompleteSearch analyses formalized it): at
    prefix length L, how many dictionary terms still match, averaged
    over the observed prefixes at that length (weighted by the terms
    that produce them)?  Fast decay = suggestions are cheap after 2-3
    keystrokes and the completion index (``complete_terms``'s prefix
    table, the FST of ``fst_dict_sizes``) can cap per-prefix lists
    aggressively; slow decay marks the pathological prefix families.

    Per L: (prefix_len, n_prefixes, mean_candidates, max_candidates,
    frac_resolved) with frac_resolved = share of prefixes that
    already identify a unique term.
    """
    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term")
        )
        .distinct()
    )
    out = None
    for lp in range(1, max_len + 1):
        per = (
            vocab.filter(F.length("term") >= lp)
            .select(F.substring("term", 1, lp).alias("prefix"))
            .groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row = per.agg(
            F.lit(lp).alias("prefix_len"),
            F.count(F.lit(1)).alias("n_prefixes"),
            F.round(F.avg("c"), round_digits).alias(
                "mean_candidates"
            ),
            F.max("c").alias("max_candidates"),
            F.round(
                F.sum((F.col("c") == 1).cast("long"))
                / F.count(F.lit(1)),
                round_digits,
            ).alias("frac_resolved"),
        )
        out = row if out is None else out.unionByName(row)
    return out
