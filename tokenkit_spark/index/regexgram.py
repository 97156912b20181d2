"""Trigram/bigram-index acceleration of regex queries — the Code
Search trick.

Cox, "Regular expression matching with a trigram index, or how
Google Code Search worked" (2012; the design behind every
gram-accelerated regex scan since — Zoekt, Sourcegraph, PostgreSQL
pg_trgm): a regex can only match a string that contains every
character n-gram forced by the pattern's LITERAL runs, so an
inverted index over n-grams turns a corpus-wide regex scan into a
gram-conjunction candidate fetch plus a regex post-filter over the
(small) candidate set.

This implementation handles the dot-wildcard pattern subset: the
required grams are all n-grams of each maximal literal run (runs
shorter than n force nothing).  Patterns whose runs are all short
degrade to a full scan — reported honestly, the same failure mode
the k-gram wildcard audit (``wildcardindex.py``) measures for its
family.  Per pattern:

    (query_id, pattern, n_grams, n_candidates, n_matches, precision,
     scan_frac)

with n_candidates the gram-conjunction survivors, n_matches the true
regex matches among them (anchored full-match, Java/RE2-shared
subset), precision their ratio, scan_frac = candidates / vocabulary.

Scale shape: gram index = one explode over the vocabulary; each
pattern is a broadcast row; candidate generation is one gram
equi-join + per-(pattern, term) counting — never a corpus regex scan
unless the pattern forces one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def required_grams(pattern: str, n: int = 2) -> list[str]:
    """All n-grams of the pattern's maximal literal runs (the
    dot-wildcard subset: '.' is the only metacharacter)."""
    runs = [r for r in pattern.split(".") if r]
    grams = []
    for r in runs:
        for i in range(len(r) - n + 1):
            g = r[i : i + n]
            if g not in grams:
                grams.append(g)
    return grams


def regex_gram_audit(
    docs: DataFrame,
    patterns: list[tuple[int, str]],
    n: int = 2,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    spark = docs.sparkSession
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
    n_vocab = vocab.count()
    grams = vocab.select(
        "term",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            F.greatest(
                                F.length("term") - n, F.lit(0)
                            ),
                        ),
                        lambda i: F.when(
                            i + n <= F.length("term"),
                            F.col("term").substr(i + 1, F.lit(n)),
                        ),
                    ),
                    lambda g: g.isNotNull(),
                )
            )
        ).alias("gram"),
    )
    preq = []
    for qid, pat in patterns:
        for g in required_grams(pat, n):
            preq.append((qid, pat, g))
    gramless = [
        (qid, pat)
        for qid, pat in patterns
        if not required_grams(pat, n)
    ]
    pats_df = spark.createDataFrame(
        patterns, "query_id long, pattern string"
    )
    out_parts = []
    if preq:
        pq = spark.createDataFrame(
            preq, "query_id long, pattern string, gram string"
        )
        npg = pq.groupBy("query_id", "pattern").agg(
            F.count(F.lit(1)).alias("n_grams")
        )
        cand = (
            F.broadcast(pq)
            .join(grams, "gram")
            .groupBy("query_id", "pattern", "term")
            .agg(F.count(F.lit(1)).alias("nh"))
            .join(F.broadcast(npg), ["query_id", "pattern"])
            .filter(F.col("nh") == F.col("n_grams"))
            .select("query_id", "pattern", "term", "n_grams")
        )
        out_parts.append(cand)
    if gramless:
        gl = spark.createDataFrame(
            gramless, "query_id long, pattern string"
        )
        out_parts.append(
            F.broadcast(gl)
            .crossJoin(vocab)
            .select(
                "query_id", "pattern", "term",
                F.lit(0).cast("long").alias("n_grams"),
            )
        )
    allc = out_parts[0]
    for p in out_parts[1:]:
        allc = allc.unionByName(p)
    scored = allc.withColumn(
        "hit",
        F.regexp_like(
            F.col("term"),
            F.concat(F.lit("^"), F.col("pattern"), F.lit("$")),
        ).cast("long"),
    )
    agg = scored.groupBy("query_id", "pattern").agg(
        F.max("n_grams").alias("n_grams"),
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("hit").alias("n_matches"),
    )
    return (
        F.broadcast(pats_df)
        .join(agg, ["query_id", "pattern"], "left")
        .na.fill({"n_grams": 0, "n_candidates": 0, "n_matches": 0})
        .select(
            "query_id",
            "pattern",
            "n_grams",
            "n_candidates",
            "n_matches",
            F.round(
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("n_matches") / F.col("n_candidates"),
                ),
                round_digits,
            ).alias("precision"),
            F.round(
                F.col("n_candidates") / F.lit(float(n_vocab)),
                round_digits,
            ).alias("scan_frac"),
        )
    )
