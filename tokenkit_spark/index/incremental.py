"""Incremental crawl updates: snapshot diff + one-call index refresh.

Ties the lifecycle together: ``diff_snapshots`` compares two crawl
snapshots relationally (full-outer join on doc_id + content hash — all
Catalyst, shuffles only on doc_id), and ``incremental_update`` applies
the diff to an existing index as delete(removed + changed) ->
build_index(delta of added + changed) -> merge — the base corpus is
never re-tokenized. Result is exactly equal to rebuilding from the new
snapshot (tested).

Scale notes: the diff is a doc_id-keyed join (co-partitionable with the
corpus layout); the delete ships only the changed/removed id set; the
delta build tokenizes only new/changed docs. At a daily-crawl cadence
this turns an O(corpus) rebuild into O(churn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from .build import build_index, load_index
from .delete import delete_docs
from .merge import merge_indexes


def diff_snapshots(
    old_docs: DataFrame, new_docs: DataFrame, text_col: str = "text"
) -> dict[str, DataFrame]:
    """Compare two corpus snapshots by doc_id + content hash.

    Returns {'added', 'removed', 'changed'} DataFrames of doc_ids:
    added = in new only; removed = in old only; changed = in both with
    different text bytes (xxhash64 content fingerprint).
    """
    o = old_docs.select("doc_id", F.xxhash64(F.col(text_col)).alias("h_old"))
    n = new_docs.select("doc_id", F.xxhash64(F.col(text_col)).alias("h_new"))
    j = o.join(n, "doc_id", "full_outer")
    return {
        "added": j.filter(F.col("h_old").isNull()).select("doc_id"),
        "removed": j.filter(F.col("h_new").isNull()).select("doc_id"),
        "changed": j.filter(
            F.col("h_old").isNotNull()
            & F.col("h_new").isNotNull()
            & (F.col("h_old") != F.col("h_new"))
        ).select("doc_id"),
    }


def incremental_update(
    spark: SparkSession,
    base_path: str,
    old_docs: DataFrame,
    new_docs: DataFrame,
    out_path: str,
    config: AnalyzerConfig | None = None,
    work_dir: str | None = None,
) -> dict:
    """Refresh the index at ``base_path`` from snapshot ``old_docs`` to
    ``new_docs`` without re-tokenizing unchanged documents.

    Pipeline: diff -> delete(removed+changed) -> build delta index over
    (added+changed) rows of ``new_docs`` -> merge -> ``out_path``.
    Layout (n_shards/n_buckets) is inherited from the base index.
    Returns the merged stats plus churn counts.
    """
    cfg = config or AnalyzerConfig()
    base_stats = load_index(spark, base_path)["stats"]
    n_shards, n_buckets = int(base_stats["n_shards"]), int(base_stats["n_buckets"])
    work = work_dir or (out_path.rstrip("/") + "_work")

    d = diff_snapshots(old_docs, new_docs)
    stale = d["removed"].unionByName(d["changed"])
    fresh_ids = d["added"].unionByName(d["changed"])
    n_stale = stale.count()
    # no broadcast hint: daily-crawl churn can exceed the broadcast size
    # limit; fresh_ids is a 1-column id set, AQE picks broadcast when it
    # actually fits and shuffle-join otherwise
    fresh_docs = new_docs.join(fresh_ids, "doc_id", "left_semi")
    n_fresh = fresh_docs.count()

    if n_stale == 0 and n_fresh == 0:
        raise ValueError("no changes between snapshots; keep using the base index")

    if n_fresh == 0:
        # deletions only: delete straight into out_path, no merge needed
        stats = delete_docs(spark, base_path, stale, out_path)
        return {**stats, "n_added_or_changed": 0, "n_removed_or_changed": n_stale}

    pruned_path = base_path
    if n_stale:
        pruned_path = f"{work}/pruned"
        delete_docs(spark, base_path, stale, pruned_path)

    delta_path = f"{work}/delta"
    build_index(
        spark, fresh_docs, delta_path, cfg,
        n_shards=n_shards, n_buckets=n_buckets, resume=False,
    )
    stats = merge_indexes(spark, pruned_path, delta_path, out_path)
    return {**stats, "n_added_or_changed": n_fresh, "n_removed_or_changed": n_stale}
