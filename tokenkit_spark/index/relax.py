"""Conjunctive query relaxation: the AND-retry ladder, computed flat.

Engines that default to conjunctive (AND) semantics need an escape
hatch when a query over-constrains: drop the least selective term and
retry, until enough results exist (the classic "query relaxation" /
ES `minimum_should_match` auto-tuning territory; cf. the and->or
fallbacks in commercial engines and Broccoli/CompleteSearch-style
relaxation ladders). The naive form is a retry LOOP on the broker; at
10^12 docs the right form is to evaluate the whole ladder in ONE plan —
level L keeps the query's terms minus its L least-selective ones, every
level's conjunctive hit count is computed from the same postings scan,
and the chosen level is the first that clears the target k.

Drop order is (df desc, term asc): highest document frequency = least
selective goes first; terms absent from the corpus (df 0) are maximally
selective and therefore drop last — a query containing one stays
unsatisfiable until everything else is gone, and the ladder reports
that honestly.

Scale shape: the ladder multiplies the query-term relation by at most
|q| levels (queries are tiny); the conjunctive check is the standard
count-distinct-equals-kept group — one postings join + one aggregate
shared across all levels. No loop, no driver round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def relaxation_ladder(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per (query, level): the kept-term set, its conjunctive match
    count, and whether this is the CHOSEN level (first with >= k
    matches; the fully-relaxed last level if none clears). Returns
    (query_id, level, n_kept, kept_terms, n_matches, chosen), levels
    0..n_terms-1, kept_terms space-joined in drop-order-ascending
    (i.e. most selective last)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    postings = toks.select("doc_id", "term").distinct()
    tstats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("term"),
    ).distinct()
    qdf = qterms.join(tstats, "term", "left").withColumn(
        "df", F.coalesce(F.col("df"), F.lit(0))
    )
    worder = Window.partitionBy("query_id").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    wq = Window.partitionBy("query_id")
    ranked = qdf.withColumn("drop_rank", F.row_number().over(worder)).withColumn(
        "n_terms", F.count(F.lit(1)).over(wq)
    )
    # level L keeps terms with drop_rank > L; explode levels 0..n_terms-1
    levels = ranked.select(
        "query_id",
        "term",
        "drop_rank",
        "n_terms",
        F.explode(F.sequence(F.lit(0), F.col("n_terms") - 1)).alias("level"),
    ).filter(F.col("drop_rank") > F.col("level"))
    kept = levels.groupBy("query_id", "level").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("drop_rank", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("kept_terms"),
    )
    hits = (
        levels.join(postings, "term")
        .groupBy("query_id", "level", "doc_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .join(
            kept.select("query_id", "level", "n_kept"), ["query_id", "level"]
        )
        .filter(F.col("m") == F.col("n_kept"))
        .groupBy("query_id", "level")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    ladder = kept.join(hits, ["query_id", "level"], "left").withColumn(
        "n_matches", F.coalesce(F.col("n_matches"), F.lit(0))
    )
    # chosen = first level clearing k, else the deepest level
    wc = Window.partitionBy("query_id")
    first_ok = F.min(
        F.when(F.col("n_matches") >= k, F.col("level"))
    ).over(wc)
    deepest = F.max("level").over(wc)
    return (
        ladder.withColumn(
            "chosen", F.col("level") == F.coalesce(first_ok, deepest)
        )
        .select(
            "query_id", "level", "n_kept", "kept_terms", "n_matches", "chosen"
        )
        .orderBy("query_id", "level")
    )
