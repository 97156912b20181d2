"""Wildcard-query index structures — permuterm and k-gram dictionaries.

The two classic dictionary auxiliaries for leading/infix wildcards
(Manning, Raghavan & Schutze, IIR §3.2; permuterm due to Garfield
1976, used by Lucene only via its FST cousin):

* PERMUTERM: every rotation of ``term$`` goes into the dictionary,
  pointing back at the term.  A wildcard ``X*Y`` rotates to
  ``Y$X*`` — a pure PREFIX query over rotations — so any single-``*``
  pattern is answered by one dictionary range scan.  The price is
  dictionary blowup: len(term)+1 rotations per term.

* K-GRAM: every k-character substring of ``$term$`` goes into an
  inverted index over terms; a wildcard becomes a CONJUNCTION of its
  k-grams, answered by intersecting gram posting lists, then a
  POST-FILTER removes false positives (grams can match out of order
  — the IIR "mon*" / "moon" example).

This module builds both (relationally — rotations and grams via
``sequence`` + ``substring``, no UDFs) and audits them on a wildcard
query set: dictionary sizes and, per query, the candidate-set size
each structure yields before post-filtering, with the exact answer
set (regex scan over the vocabulary) as ground truth — the空间/
velocity trade quantified rather than asserted.

Scale shape: rotations/grams explode the vocabulary by ~avg-term-
length — a (term)-keyed projection, no shuffle wider than the gram
rollup; query answering is a broadcast of the tiny pattern table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vocab(docs: DataFrame, text_col: str) -> DataFrame:
    return (
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


def wildcard_index_audit(
    docs: DataFrame,
    patterns: DataFrame,
    k: int = 3,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Audit permuterm vs k-gram candidate generation for single-*
    wildcard patterns.

    ``patterns``: (query_id, pattern) with exactly one '*'.  Returns
    one row per query: (query_id, pattern, n_exact, n_permuterm,
    n_kgram_raw, n_kgram_filtered, kgram_precision) where n_exact is
    the true matching-vocabulary count, n_permuterm the permuterm
    prefix-scan candidate count (always exact for single-*),
    n_kgram_raw the gram-conjunction candidate count before the
    post-filter, and kgram_precision = n_exact / n_kgram_raw.
    """
    vocab = _vocab(docs, text_col)
    # rotations: term$ rotated so the suffix-start comes first
    t_dollar = F.concat(F.col("term"), F.lit("$"))
    rot = vocab.select(
        "term",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(t_dollar)),
                lambda i: F.concat(
                    F.substr(t_dollar, i),
                    F.substr(t_dollar, F.lit(1), i - 1),
                ),
            )
        ).alias("rotation"),
    )
    # k-grams of $term$
    padded = F.concat(F.lit("$"), F.col("term"), F.lit("$"))
    grams = vocab.select(
        "term",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length(padded) - F.lit(k - 1)
                    ),
                    lambda i: F.substr(padded, i, F.lit(k)),
                )
            )
        ).alias("gram"),
    )

    p = patterns.select(
        "query_id",
        "pattern",
        F.substring_index("pattern", "*", 1).alias("pre"),
        F.substring_index("pattern", "*", -1).alias("suf"),
    )
    # exact answers: prefix+suffix containment with length guard
    exact = (
        F.broadcast(p)
        .crossJoin(vocab)
        .filter(
            F.col("term").startswith(F.col("pre"))
            & F.col("term").endswith(F.col("suf"))
            & (
                F.length("term")
                >= F.length("pre") + F.length("suf")
            )
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    # permuterm: X*Y -> prefix scan for Y$X
    pquery = p.select(
        "query_id",
        F.concat(F.col("suf"), F.lit("$"), F.col("pre")).alias("rq"),
    )
    perm = (
        F.broadcast(pquery)
        .join(rot, rot.rotation.startswith(F.col("rq")))
        .groupBy("query_id")
        .agg(F.countDistinct("term").alias("n_permuterm"))
    )
    # k-gram conjunction: grams of $pre and suf$ (only full k-grams)
    pg = p.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.concat(
                        F.transform(
                            F.sequence(
                                F.lit(1),
                                F.greatest(
                                    F.lit(0),
                                    F.length(
                                        F.concat(F.lit("$"),
                                                 F.col("pre"))
                                    ) - F.lit(k - 1),
                                ),
                            ),
                            lambda i: F.substr(
                                F.concat(F.lit("$"), F.col("pre")),
                                i, F.lit(k),
                            ),
                        ),
                        F.transform(
                            F.sequence(
                                F.lit(1),
                                F.greatest(
                                    F.lit(0),
                                    F.length(
                                        F.concat(F.col("suf"),
                                                 F.lit("$"))
                                    ) - F.lit(k - 1),
                                ),
                            ),
                            lambda i: F.substr(
                                F.concat(F.col("suf"), F.lit("$")),
                                i, F.lit(k),
                            ),
                        ),
                    ),
                    lambda g: F.length(g) == k,
                )
            )
        ).alias("gram"),
    )
    n_pg = pg.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    kraw_grams = (
        F.broadcast(pg)
        .join(grams, "gram")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(n_pg), "query_id")
        .filter(F.col("n_hit") == F.col("n_grams"))
        .select("query_id", "term")
    )
    # a pattern whose halves are shorter than k yields NO grams — the
    # k-gram index cannot narrow it and the candidate set is the whole
    # vocabulary (the IIR §3.2.2 failure mode this audit exposes)
    gramless = p.join(n_pg, "query_id", "left_anti").select("query_id")
    kraw = kraw_grams.unionByName(
        F.broadcast(gramless).crossJoin(vocab)
    )
    kraw_n = kraw.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_kgram_raw")
    )
    kfil = (
        kraw.join(p, "query_id")
        .filter(
            F.col("term").startswith(F.col("pre"))
            & F.col("term").endswith(F.col("suf"))
            & (
                F.length("term")
                >= F.length("pre") + F.length("suf")
            )
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_kgram_filtered"))
    )
    return (
        p.select("query_id", "pattern")
        .join(exact, "query_id", "left")
        .join(perm, "query_id", "left")
        .join(kraw_n, "query_id", "left")
        .join(kfil, "query_id", "left")
        .na.fill(
            {
                "n_exact": 0,
                "n_permuterm": 0,
                "n_kgram_raw": 0,
                "n_kgram_filtered": 0,
            }
        )
        .select(
            "query_id",
            "pattern",
            "n_exact",
            "n_permuterm",
            "n_kgram_raw",
            "n_kgram_filtered",
            F.round(
                F.when(
                    F.col("n_kgram_raw") > 0,
                    F.col("n_exact") / F.col("n_kgram_raw"),
                ),
                round_digits,
            ).alias("kgram_precision"),
        )
    )


def dictionary_blowup(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """One row: (n_terms, n_rotations, n_gram_postings, permuterm_x,
    kgram_x) — the dictionary-size cost of each wildcard structure."""
    vocab = _vocab(docs, text_col)
    t_dollar = F.concat(F.col("term"), F.lit("$"))
    n_rot = vocab.select(
        F.sum(F.length(t_dollar)).alias("n_rotations")
    )
    padded = F.concat(F.lit("$"), F.col("term"), F.lit("$"))
    n_gram = vocab.select(
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length(padded) - F.lit(k - 1)
                    ),
                    lambda i: F.substr(padded, i, F.lit(k)),
                )
            )
        ).alias("gram")
    ).agg(F.count(F.lit(1)).alias("n_gram_postings"))
    n_terms = vocab.agg(F.count(F.lit(1)).alias("n_terms"))
    return (
        n_terms.crossJoin(n_rot)
        .crossJoin(n_gram)
        .select(
            "n_terms",
            "n_rotations",
            "n_gram_postings",
            F.round(
                F.col("n_rotations") / F.col("n_terms"), 4
            ).alias("permuterm_x"),
            F.round(
                F.col("n_gram_postings") / F.col("n_terms"), 4
            ).alias("kgram_x"),
        )
    )
