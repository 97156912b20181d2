"""Term-dictionary front-coding audit — the Lucene block-tree /
FST-adjacent design question: how many bytes does the sorted term
dictionary cost raw (length-prefixed full terms) vs front-coded in
blocks of ``block`` terms (block head stored fully; every other entry
stores (shared-prefix length, suffix)) — Witten/Moffat/Bell "Managing
Gigabytes" §4, the dictionary layout Lucene's BlockTreeTermsWriter
implements with a prefix FST on top.

Scale shape: the dictionary is BUCKETED by leading character (the
natural prefix-preserving partition key — same-prefix terms co-locate,
which is exactly what front-coding needs), so every window runs inside
a bucket partition, never globally. One distinct-terms aggregate, one
per-bucket window pass, one per-bucket rollup; vocabulary-bounded
throughout (the corpus is touched once, by the tokenize scan).

Prefix lengths are counted at CHARACTER granularity and suffix/full
sizes in UTF-8 OCTETS (a character boundary is always a valid UTF-8
split, so the coded form stays decodable — the same rule Lucene's
UTF-8-sorted term blocks follow).

Reference parity: the reference (scientist-labs/tokenkit) ships no
index, so this audits OUR segment term dictionary design; cited in
SURVEY.md §2 as an index-design audit alongside the Elias-Fano and
roaring-bitmap A/Bs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# character-granularity longest common prefix of two string columns:
# prefix-match is monotone in i, so counting matching prefixes equals
# the LCP length (pure Catalyst array lambda, no UDF)
_LCP = (
    "size(filter(sequence(1, least(length(term), length(prev))), "
    "i -> substring(term, 1, i) = substring(prev, 1, i)))"
)


def front_coding_audit(
    docs: DataFrame,
    text_col: str = "text",
    block: int = 16,
    top: int = 20,
) -> DataFrame:
    """Per leading-character bucket: raw vs front-coded dictionary
    bytes for the whitespace-lowercase vocabulary. Returns the ``top``
    buckets by term count: (rank, bucket, n_terms, n_blocks,
    raw_bytes, coded_bytes, ratio)."""
    terms = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
        .withColumn("bucket", F.substring("term", 1, 1))
    )
    w = Window.partitionBy("bucket").orderBy("term")
    coded = (
        terms.withColumn("rn", F.row_number().over(w))
        .withColumn("prev", F.lag("term").over(w))
        .withColumn(
            "coded_bytes",
            F.when(
                (F.col("rn") - 1) % block == 0,  # block head: full term
                1 + F.octet_length("term"),
            ).otherwise(
                # (prefix-len byte, suffix-len byte, suffix octets)
                2
                + F.octet_length(
                    F.expr(f"substring(term, {_LCP} + 1, length(term))")
                )
            ),
        )
    )
    per_bucket = coded.groupBy("bucket").agg(
        F.count("*").alias("n_terms"),
        F.ceil(F.count("*") / block).cast("long").alias("n_blocks"),
        F.sum(1 + F.octet_length("term")).alias("raw_bytes"),
        F.sum("coded_bytes").alias("coded_bytes"),
        F.round(
            F.sum("coded_bytes") / F.sum(1 + F.octet_length("term")), 4
        ).alias("ratio"),
    )
    wr = Window.orderBy(F.col("n_terms").desc(), F.col("bucket").asc())
    return (
        per_bucket.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= top)
        .select(
            "rank", "bucket", "n_terms", "n_blocks",
            "raw_bytes", "coded_bytes", "ratio",
        )
    )


def stemming_collision_audit(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Porter step-1a stemming collision audit — what plural folding
    buys and breaks in the term dictionary.

    Stemming shrinks the dictionary and posting count but merges
    distinct lemmas into one key (the recall/precision trade Porter
    1980 documents).  This audit applies just step 1a (sses->ss,
    ies->i, ss->ss, s->drop) to the distinct alphabetic vocabulary
    and measures: dictionary compression, how many stems absorb >=2
    surface forms, and the worst fan-in — the numbers that decide
    whether the index stems at write time or expands at query time.

    One row: (n_terms, n_stems, n_collision_stems, max_variants) —
    integer counts only (compression is 1 - n_stems / n_terms), so
    the audit hashes identically on every engine.
    """
    term = F.explode(
        F.split(F.lower(F.col(text_col)), r"\s+")
    ).alias("t")
    terms = (
        docs.select(term)
        .filter(F.col("t").rlike("^[a-z]+$"))
        .distinct()
    )
    t = F.col("t")
    ln = F.length(t)
    stem = (
        F.when(t.endswith("sses"), F.substring(t, 1, ln - 2))
        .when(t.endswith("ies"), F.substring(t, 1, ln - 2))
        .when(t.endswith("ss"), t)
        .when(t.endswith("s"), F.substring(t, 1, ln - 1))
        .otherwise(t)
    )
    per = terms.groupBy(stem.alias("stem")).agg(
        F.count(F.lit(1)).alias("nv")
    )
    return per.agg(
        F.sum("nv").alias("n_terms"),
        F.count(F.lit(1)).alias("n_stems"),
        F.sum((F.col("nv") >= 2).cast("long")).alias(
            "n_collision_stems"
        ),
        F.max("nv").alias("max_variants"),
    )
