"""Host-level mirror detection (Bharat & Broder, "Mirror, mirror on
the web: a study of host pairs with replicated content", WWW 1999).

A mirror pair is two hosts serving largely the same content under
different URLs — at crawl scale the single biggest source of wasted
fetches after URL-level duplicates. The classic detector profiles
each host by its set of content shingles and reports host pairs whose
profile resemblance (Jaccard over shingle sets) or containment
(|A∩B| / min) clears a threshold; the crawler then collapses the pair
to one representative.

Differs from doc-pair near-dup (ops/dedup.py ngram-Jaccard /
MinHash): the rollup unit is the HOST — two hosts can mirror while no
single page pair is an exact duplicate (pagination drift, ads), and
the candidate space is hosts², not docs², which is what makes the
exact set-resemblance computation tractable at web scale.

Scale shape: one shingle explode + distinct (host, shingle), a
df-capped self-join on shingle (the ngram-containment guard: a
shingle on more than ``max_shingle_df`` hosts is boilerplate and
generates O(hosts²) candidate rows — cap first), then one aggregate
per host pair. Shingles are kept as strings here so the DuckDB oracle
is exact; production would hash them to int64 first (noted, not
semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_shingles(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct (host, shingle): word n-gram shingles over the host's
    concatenated page texts (per-page shingling, host-level union)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return (
        pages.select(F.col(host_col).alias("host"), grams.alias("gs"))
        .select("host", F.explode("gs").alias("shingle"))
        .distinct()
    )


def mirror_pairs(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    n: int = 3,
    min_resemblance: float = 0.05,
    max_shingle_df: int | None = 1_000,
    round_digits: int = 4,
) -> DataFrame:
    """Host pairs ranked by shingle-profile resemblance: (host_a,
    host_b, shared, size_a, size_b, resemblance, containment) with
    host_a < host_b, resemblance = |A∩B|/|A∪B| >= min_resemblance,
    containment = |A∩B|/min(|A|,|B|); ordered (resemblance desc,
    host_a, host_b)."""
    hs = host_shingles(pages, host_col, text_col, n)
    sizes = hs.groupBy("host").agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_df is not None:
        rare = (
            hs.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("hdf"))
            .filter(F.col("hdf") <= max_shingle_df)
            .select("shingle")
        )
        joinable = hs.join(rare, "shingle")
    else:
        joinable = hs
    a = joinable.select(F.col("host").alias("host_a"), "shingle")
    b = joinable.select(F.col("host").alias("host_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("size_b")),
            "host_b",
        )
        .withColumn(
            "resemblance",
            F.round(
                F.col("shared")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")),
                round_digits,
            ),
        )
        .withColumn(
            "containment",
            F.round(
                F.col("shared") / F.least("size_a", "size_b"), round_digits
            ),
        )
        .filter(F.col("resemblance") >= min_resemblance)
        .select(
            "host_a", "host_b", "shared", "size_a", "size_b",
            "resemblance", "containment",
        )
        .orderBy(F.col("resemblance").desc(), "host_a", "host_b")
    )
