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


def idf_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    k: int = 20,
    min_df: int = 3,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """IDF churn between two corpus snapshots — which terms' weights
    move, and how much reweighting a rebuilt index implies.

    The ranking-stability side of snapshot churn (the page-level diff
    lives in ``snapshot_churn`` above): BM25 weights depend on df/N,
    so corpus drift silently re-scores every cached ranking.  For
    terms above ``min_df`` in either snapshot, compute Robertson idf
    under both and report the top-``k`` movers by |delta idf| — the
    terms whose cached query results a re-index most perturbs (and
    the empirical input to "how stale can the df statistics table
    get" policies in distributed scoring, ``index/dfs.py``).

    (rank, term, df_a, df_b, idf_a, idf_b, delta_idf).
    """
    from pyspark.sql import Window

    def dfs(d):
        toks = d.select(
            F.col("doc_id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term"),
        ).distinct()
        return toks.groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        ), d.select("doc_id").distinct().count()

    dfa, na = dfs(docs_a)
    dfb, nb = dfs(docs_b)

    def idf(df_col, n):
        return F.log(
            1.0 + (F.lit(float(n)) - df_col + 0.5) / (df_col + 0.5)
        )

    j = (
        dfa.withColumnRenamed("df", "df_a")
        .join(dfb.withColumnRenamed("df", "df_b"), "term", "full")
        .na.fill({"df_a": 0, "df_b": 0})
        .filter(
            (F.col("df_a") >= min_df) | (F.col("df_b") >= min_df)
        )
        .withColumn("idf_a", idf(F.col("df_a"), na))
        .withColumn("idf_b", idf(F.col("df_b"), nb))
        .withColumn(
            "delta", F.abs(F.col("idf_b") - F.col("idf_a"))
        )
    )
    w = Window.orderBy(F.round("delta", 9).desc(), F.col("term").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "df_a",
            "df_b",
            F.round("idf_a", round_digits).alias("idf_a"),
            F.round("idf_b", round_digits).alias("idf_b"),
            F.round("delta", round_digits).alias("delta_idf"),
        )
    )
