"""Distributed exact heavy hitters via a two-pass Misra-Gries sieve.

The problem at 100 TB: "terms with frequency > θ·N" cannot be answered
by a full term count — the vocabulary of a web corpus does not fit
anywhere, and a full ``groupBy(term)`` shuffles the entire token
stream. The classic fix (Misra & Gries 1982; mergeability per Agarwal
et al., "Mergeable Summaries", PODS 2012):

* **Pass 1 (candidates)**: each partition runs a Misra-Gries summary
  with ``capacity`` counters over its token stream — O(capacity)
  memory regardless of partition vocabulary, deterministic, no
  sampling. MG guarantees every item with partition frequency
  > N_p/(capacity+1) survives; summed over partitions, every GLOBAL
  θ-heavy hitter appears in at least one summary when
  capacity ≥ 1/θ (enforced). The union of summaries —
  ≤ partitions·capacity rows, tiny — is the candidate set.
* **Pass 2 (verify)**: exact counts for candidates only — the token
  stream inner-joins the broadcast candidate set, then one hash
  aggregate over ≤ |candidates| keys. Estimates from pass 1 are
  discarded; the output is EXACT, so it is independent of
  partitioning, cluster size, and execution order (and a SQL oracle
  can replay it as a plain frequency filter).

The vectorized MG step processes whole Arrow batches: add the batch's
value_counts into the summary, and when the summary exceeds capacity
subtract the (capacity+1)-th largest count from everything and drop
the non-positive counters — each unit subtracted is simultaneously
subtracted from > capacity items, which is exactly the MG amortized
decrement.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summaries(capacity: int):
    def gen(batches):
        import pandas as pd

        summary = None
        for pdf in batches:
            counts = pdf["term"].value_counts()
            summary = (
                counts
                if summary is None
                else summary.add(counts, fill_value=0)
            )
            if len(summary) > capacity:
                offset = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary[summary > offset] - offset
        if summary is not None and len(summary):
            yield pd.DataFrame(
                {
                    "term": summary.index.astype(str),
                    "est": summary.to_numpy().astype("int64"),
                }
            )

    return gen


def heavy_hitters(
    docs: DataFrame,
    threshold: float = 0.005,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Exact (term, cnt) for every whitespace-lowercase token with
    corpus frequency > ``threshold`` · total-token-count. ``capacity``
    is the per-partition MG counter budget (raised to ceil(1/θ) if
    below — the superset guarantee needs it)."""
    if not 0 < threshold < 1:
        raise ValueError("heavy_hitters: threshold must be in (0, 1)")
    capacity = max(capacity, math.ceil(1.0 / threshold))
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term")
    )
    cand = (
        toks.mapInPandas(_mg_summaries(capacity), "term string, est long")
        .groupBy("term")
        .agg(F.sum("est").alias("est"))
        .select("term")
    )
    n_total = toks.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        toks.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") > F.lit(float(threshold)) * F.col("n"))
        .select("term", "cnt")
    )


# Count-Min audit: fixed universal-hash constants (depth 4). p is the
# Mersenne prime 2^31 - 1; (a, b) pairs are arbitrary odd constants —
# pinned so the DuckDB oracle reproduces the sketch bit-for-bit.
CM_P = 2_147_483_647
CM_ROWS = [(1_000_003, 12_345), (999_983, 54_321),
           (722_233, 98_765), (611_953, 13_579)]


def count_min_audit(
    docs: DataFrame,
    width: int = 1024,
    text_col: str = "text",
    doc_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Count-Min sketch accuracy audit (Cormode & Muthukrishnan, "An
    Improved Data Stream Summary: the Count-Min Sketch and its
    Applications", J. Algorithms 55(1) 2005): build a depth-4 x
    ``width`` CM sketch of the corpus term-frequency stream with
    pinned universal hashes h_i(t) = ((a_i * x + b_i) mod p) mod w
    (x = the term's md5-prefix integer, the engine-portable base hash
    used by ops/dsir.py), estimate every term as min_i sketch[i][h_i],
    and report the overestimate distribution per log2-cf stratum —
    overestimate = estimate - exact, never negative (CM is one-sided).

    The paper's guarantee — overestimate <= (e/w) * N with probability
    1 - e^-depth — is emitted per stratum as ``bound`` so the audit
    reads as observed-vs-guaranteed.

    Why it matters at 100 TB: CM sketches are the mergeable map-side
    summary for heavy-hitter detection when the exact Misra-Gries
    pass above is too wide; this audit tells you what width the real
    corpus skew needs.  Shape: one token pass, one (row, bucket)
    aggregate (4w cells), one broadcast join back to the exact term
    counts — no driver loops, no UDFs.

    Returns one row per stratum: (cf_bucket, n_terms, mean_over,
    max_over, frac_exact, bound).
    """
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term")
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    x = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
    hashed = exact.select(
        "term",
        "cf",
        *[
            (((F.lit(a) * x + F.lit(b)) % CM_P) % width).alias(f"h{i}")
            for i, (a, b) in enumerate(CM_ROWS)
        ],
    )
    # sketch cells: depth x width counters
    cells = None
    for i in range(len(CM_ROWS)):
        c = hashed.groupBy(F.col(f"h{i}").alias("bucket")).agg(
            F.sum("cf").alias("cell")
        ).withColumn("row", F.lit(i))
        cells = c if cells is None else cells.unionByName(c)

    est = hashed
    for i in range(len(CM_ROWS)):
        cell_i = cells.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"h{i}"), F.col("cell").alias(f"c{i}")
        )
        est = est.join(F.broadcast(cell_i), f"h{i}")
    est = est.select(
        "term",
        "cf",
        F.least(*[F.col(f"c{i}") for i in range(len(CM_ROWS))]).alias("est"),
    )
    n_total = toks.count()
    bound = 2.718281828459045 / width * n_total
    return (
        est.withColumn("over", F.col("est") - F.col("cf"))
        .withColumn(
            "cf_bucket", F.floor(F.log2(F.col("cf"))).cast("long")
        )
        .groupBy("cf_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.avg("over"), round_digits).alias("mean_over"),
            F.max("over").alias("max_over"),
            F.round(
                F.avg((F.col("over") == 0).cast("double")), round_digits
            ).alias("frac_exact"),
        )
        .withColumn("bound", F.round(F.lit(bound), round_digits))
        .orderBy("cf_bucket")
    )
