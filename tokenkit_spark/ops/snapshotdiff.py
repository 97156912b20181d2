"""Crawl snapshot diff — page churn classification between two crawl
epochs.

Ntoulas, Cho & Olston, "What's new on the web? The evolution of the
web from a search engine perspective" (WWW 2004): re-crawls are
classified per URL into added / removed / changed / unchanged by
content hash, and the churn shares drive recrawl scheduling and index
maintenance budgets (their headline: ~8%/week new pages, ~25%/week new
links). This operator is that classification as one full-outer join.

Scale shape: both snapshots are hashed map-side (md5 of the content —
at 10^12 docs the hash rides in the page manifest instead of
re-reading bodies), then ONE full-outer hash join on the page key and
a 4-way CASE classify + hash aggregate. No windows, no skew concern
beyond the join key itself (URLs are unique).

``synthetic_second_crawl`` derives epoch B from the documents table
with pinned arithmetic (drop doc_id%13, mutate text of doc_id%7,
add a clone at id+1000000 for doc_id%17) so the DuckDB oracle
reproduces the exact churn table — no external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthetic_second_crawl(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic epoch-B crawl: doc_id%13==0 removed, doc_id%7==0
    (and not removed) re-crawled with changed content, doc_id%17==0
    contributes an added page at id+1000000."""
    kept = docs.filter(F.col(id_col) % 13 != 0).select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.col(id_col) % 7 == 0,
            F.concat(F.col(text_col), F.lit(" updated")),
        )
        .otherwise(F.col(text_col))
        .alias("text"),
    )
    added = docs.filter(F.col(id_col) % 17 == 0).select(
        (F.col(id_col) + 1_000_000).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return kept.unionByName(added)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Churn classification: (status, n_docs, share) over the union of
    both snapshots' page keys, status in (added, removed, changed,
    unchanged), share of the union universe; ordered by status."""
    a = old.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h_old")
    )
    b = new.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h_new")
    )
    j = a.join(b, "doc_id", "full_outer").select(
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status")
    )
    counts = j.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "status",
            "n_docs",
            F.round(F.col("n_docs") / F.col("tot"), round_digits).alias(
                "share"
            ),
        )
        .orderBy("status")
    )
