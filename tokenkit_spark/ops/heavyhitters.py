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
