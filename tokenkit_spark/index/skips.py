"""Skip-pointer placement audit for conjunctive posting intersection.

Moffat & Zobel, "Self-Indexing Inverted Files for Fast Text Retrieval"
(TOIS 1996) — the classic analysis behind every skip-list knob
(Lucene's ``skipInterval``, our block-max block size): when a
conjunctive query probes a long posting list with the candidates from
a shorter one, embedding a skip pointer every L postings lets the
reader hop whole blocks, and the textbook cost model for an ascending
merge of k candidate probes into a list of length n is

    cost(L) = n/L  +  k · L/2

(every skip pointer is visited at most once across the ascending scan;
each probe then linearly scans half a block on average).  Minimizing
over L gives the famous L* = sqrt(2n/k); with k unknown at index-build
time, engines bake in L = sqrt(n) per list (IIR §2.3's rule of thumb),
which this audit evaluates against the actual reference query set.

For each conjunctive query: the driver list is the rarest indexed term
(df_min candidates, always fully decoded); every other matched term
list of length df is charged min(df, df/L + df_min·L/2) with
L = ceil(sqrt(df)) — min() because a reader never does worse than the
plain full scan (for df_min ≈ df skipping degenerates and the scan
wins).  Reported per query against the skip-less baseline
(decode every list fully).

All inputs are per-term df scalars — pure arithmetic over the term
statistics relation; no posting data moves.  Scale shape: the same
(qterm ⋈ tstats) join every QPP audit uses, one hash aggregate per
query; no UDFs, no windows over data-sized relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skip_audit(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Per-query skip-list cost audit: (query_id, n_terms, df_min,
    cost_full, cost_skip, saving_frac).  ``cost_full`` = Σ df over
    matched non-driver lists (+ df_min for the driver); ``cost_skip``
    replaces each non-driver term with its skip-hop estimate."""
    toks = docs.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    tstats = (
        toks.groupBy("term", id_col)
        .agg(F.lit(1).alias("one"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
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
    qt = qterms.join(tstats, "term")
    per_q = qt.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.min("df").alias("df_min"),
        F.sum("df").alias("df_sum"),
    )
    # Non-driver lists: every matched list pays its skip estimate
    # except ONE instance of the rarest (the driver, always decoded in
    # full). L = ceil(sqrt(df)) exactly, via integer floor-sqrt.
    l_col = F.ceil(F.sqrt(F.col("df").cast("double"))).cast("long")
    est = F.least(
        F.col("df").cast("double"),
        F.col("df") / l_col + F.col("df_min") * l_col / 2.0,
    )
    skip_cost = (
        qt.join(per_q.select("query_id", "df_min"), "query_id")
        .groupBy("query_id")
        .agg(
            F.sum(est).alias("skip_all"),
            # the driver's own skip estimate (df == df_min row, one
            # instance) gets replaced by a full decode; subtract the
            # MIN estimate over rows where df == df_min and add df_min.
            F.min(F.when(F.col("df") == F.col("df_min"), est)).alias(
                "driver_est"
            ),
        )
    )
    out = per_q.join(skip_cost, "query_id").select(
        "query_id",
        "n_terms",
        "df_min",
        F.col("df_sum").cast("double").alias("cost_full"),
        F.round(
            F.col("skip_all") - F.col("driver_est") + F.col("df_min"),
            round_digits,
        ).alias("cost_skip"),
    )
    return out.withColumn(
        "saving_frac",
        F.round(1.0 - F.col("cost_skip") / F.col("cost_full"), round_digits),
    )
