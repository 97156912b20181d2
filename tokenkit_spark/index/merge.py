"""Segment merge: combine two indexes (base + delta) into one without
re-tokenizing anything (north_star: "merges per-partition segment
postings with delta-encoded, varint-compressed docID gaps").

Use case: incremental crawls. Build a small delta index over the new
batch of pages (cheap), then merge — the expensive tokenize + postings
shuffle never re-runs for the base corpus.

Requirements: both indexes share n_shards, n_buckets, and the analyzer
config (doc-sharding is by xxhash64(doc_id) % n_shards, so the same
(shard, term_bucket, term) run in both sources lands in the same merged
run). Doc sets must be disjoint (same doc re-crawled -> delete first or
build the delta with the superseding doc only).

Plan shape: union the two segment tables -> repartition(shard,
term_bucket) + sortWithinPartitions(..., term) -> a streaming
mapInPandas kernel decodes each term-run group (1 or 2 source rows),
merge-sorts postings by doc_id, and re-encodes. Block metadata
(max_tf, min_dl per block) is avgdl-independent (codec.py), so the
merged index needs no norm recomputation — only the global stats row
carries the merged avgdl.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import codec
from .build import IndexPaths, SEGMENT_SCHEMA, load_index


def _merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge sorted segment rows: adjacent rows sharing (shard, bucket,
    term) are decoded, merge-sorted by doc_id, re-encoded as one run."""
    shards = pdf["shard"].to_numpy()
    buckets = pdf["term_bucket"].to_numpy()
    terms = pdf["term"].to_numpy()
    n = len(pdf)
    change = np.flatnonzero(
        (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1]) | (buckets[1:] != buckets[:-1])
    ) + 1
    g_starts = np.concatenate(([0], change))
    g_ends = np.concatenate((change, [n]))

    # decode every source run once
    dec_ids, dec_tfs, dec_dls, dec_pos = [], [], [], []
    for row in pdf.itertuples(index=False):
        ids, tfs, dls = codec.decode_posting_list(
            {
                "n_postings": int(row.n_postings),
                "doc_ids_blob": row.doc_ids_blob,
                "tfs_blob": row.tfs_blob,
                "dls_blob": row.dls_blob,
                "codec": getattr(row, "codec", "varint"),
                "block_doc_off": getattr(row, "block_doc_off", None),
                "block_last": getattr(row, "block_last", None),
            }
        )
        dec_ids.append(ids)
        dec_tfs.append(tfs)
        dec_dls.append(dls)
        pos_blob = bytes(row.pos_blob) if row.pos_blob is not None else b""
        if pos_blob:
            flat, offs = codec.decode_positions(pos_blob, tfs)
            dec_pos.append(
                [flat[o : o + t] for o, t in zip(offs.tolist(), tfs.tolist())]
            )
        else:
            dec_pos.append(None)

    # build the merged posting arrays, tracking run boundaries
    all_ids, all_tfs, all_dls, all_pos = [], [], [], []
    run_lens = []
    has_pos = all(p is not None for p in dec_pos) and len(dec_pos) > 0
    for s, e in zip(g_starts, g_ends):
        ids = np.concatenate(dec_ids[s:e])
        tfs = np.concatenate(dec_tfs[s:e])
        dls = np.concatenate(dec_dls[s:e])
        order = np.argsort(ids, kind="stable")
        all_ids.append(ids[order])
        all_tfs.append(tfs[order])
        all_dls.append(dls[order])
        if has_pos:
            plists = [p for i in range(s, e) for p in dec_pos[i]]
            all_pos.extend(plists[j] for j in order.tolist())
        run_lens.append(ids.size)

    run_lens = np.asarray(run_lens, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(run_lens)[:-1]))
    ends = np.cumsum(run_lens)
    doc_ids = np.concatenate(all_ids) if all_ids else np.zeros(0, dtype=np.int64)
    tfs = np.concatenate(all_tfs) if all_tfs else np.zeros(0, dtype=np.int64)
    dls = np.concatenate(all_dls) if all_dls else np.zeros(0, dtype=np.int64)

    encoded = codec.encode_runs(starts, ends, doc_ids, tfs, dls)
    if has_pos:
        pos_blobs = codec.encode_positions_runs(starts, ends, tfs, all_pos)
    else:
        pos_blobs = [b""] * len(starts)
    rows = [
        (
            int(shards[s]),
            int(buckets[s]),
            terms[s],
            enc[0],
            enc[10],
            enc[1], enc[2], enc[3],
            enc[4], enc[5], enc[6],
            enc[7], enc[8], enc[9],
            pb,
            "varint",  # merge re-encodes with the default codec
        )
        for s, enc, pb in zip(g_starts, encoded, pos_blobs)
    ]
    return pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])


def _merge_stream():
    """Streaming kernel: carry the trailing (possibly split) term run
    into the next Arrow batch, mirroring the build encoder."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batch_iter:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            sh = pdf["shard"].to_numpy()
            tb = pdf["term_bucket"].to_numpy()
            tm = pdf["term"].to_numpy()
            eq = (sh == sh[-1]) & (tb == tb[-1]) & (tm == tm[-1])
            rev = eq[::-1]
            not_rev = ~rev
            run = int(np.argmax(not_rev)) if not_rev.any() else len(eq)
            split = len(pdf) - run
            carry = pdf.iloc[split:]
            if split > 0:
                yield _merge_rows(pdf.iloc[:split])
        if carry is not None and len(carry):
            yield _merge_rows(carry)

    return fn


def _has_positions(index: dict) -> bool:
    """Whether an index stores positions: stats flag when present (builds
    since r02 write it), else probe segments for a non-empty pos_blob."""
    flag = index["stats"].get("store_positions")
    if flag is not None:
        return bool(flag)
    row = index["segments"].agg(
        F.max(F.length("pos_blob")).alias("m")
    ).collect()[0]
    return bool(row.m and row.m > 0)


def merge_indexes(
    spark: SparkSession,
    base_path: str,
    delta_path: str,
    out_path: str,
    check_disjoint: bool = True,
) -> dict:
    """Merge delta into base -> out_path. Returns merged global stats.

    ``check_disjoint`` (default on) verifies the documented contract that
    the two doc sets don't overlap — a re-crawled doc merged without a
    prior delete would silently double its postings and corrupt BM25
    stats. The check is one semi-join over the (small) doc_stats tables;
    disable only when disjointness is guaranteed by construction."""
    base = load_index(spark, base_path)
    delta = load_index(spark, delta_path)
    bs, ds = base["stats"], delta["stats"]
    for key in ("n_shards", "n_buckets"):
        if int(bs[key]) != int(ds[key]):
            raise ValueError(f"index layout mismatch on {key}: {bs[key]} != {ds[key]}")
    # position parity: merging a positional index with a non-positional
    # one would silently write empty pos_blobs for some runs and crash
    # phrase_search later — fail fast instead (stats flag when present,
    # else probe the segments for any non-empty position blob)
    bpos, dpos = _has_positions(base), _has_positions(delta)
    if bpos != dpos:
        raise ValueError(
            "position parity mismatch: base index "
            f"store_positions={bpos} but delta store_positions={dpos}; "
            "rebuild one side with the matching store_positions setting"
        )
    if check_disjoint:
        overlap = (
            base["doc_stats"].select("doc_id")
            .join(delta["doc_stats"].select("doc_id"), "doc_id", "left_semi")
            .count()
        )
        if overlap:
            raise ValueError(
                f"merge_indexes requires disjoint doc sets: {overlap} doc_ids "
                "appear in both indexes (delete_docs the stale copies first, "
                "or use incremental_update)"
            )
    n_shards, n_buckets = int(bs["n_shards"]), int(bs["n_buckets"])
    n_docs = int(bs["n_docs"]) + int(ds["n_docs"])
    total_tokens = int(bs["total_tokens"]) + int(ds["total_tokens"])
    avgdl = total_tokens / n_docs

    paths = IndexPaths(out_path)
    seg_cols = [f.name for f in SEGMENT_SCHEMA.fields]
    union = base["segments"].select(seg_cols).unionByName(delta["segments"].select(seg_cols))
    # no pinned partition count: hash partitioning on (shard, term_bucket)
    # keeps every term group complete at any N, so AQE sizes the merge
    # tasks from shuffle bytes (see build.py segment-encode note)
    merged = (
        union.repartition("shard", "term_bucket")
        .sortWithinPartitions("shard", "term_bucket", "term")
        .mapInPandas(_merge_stream(), SEGMENT_SCHEMA)
    )
    merged.write.mode("overwrite").partitionBy("shard", "term_bucket").parquet(paths.segments)

    dstats = base["doc_stats"].unionByName(delta["doc_stats"])
    dstats.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(paths.doc_stats)

    all_segments = spark.read.parquet(paths.segments)
    term_stats = all_segments.groupBy("term").agg(
        F.sum("n_postings").alias("df"), F.sum("cf_shard").alias("cf")
    )
    term_stats.write.mode("overwrite").parquet(paths.term_stats)

    spark.createDataFrame(
        [(n_docs, total_tokens, float(avgdl), n_shards, n_buckets, bool(bpos))],
        "n_docs long, total_tokens long, avgdl double, n_shards int, "
        "n_buckets int, store_positions boolean",
    ).write.mode("overwrite").parquet(paths.stats)

    manifest = (
        all_segments.groupBy("shard")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("n_postings").alias("n_postings"),
            F.expr("bit_xor(xxhash64(term, n_postings))").alias("checksum"),
        )
        .withColumn("status", F.lit("done"))
    )
    manifest.write.mode("overwrite").parquet(paths.manifest)
    return {"n_docs": n_docs, "total_tokens": total_tokens, "avgdl": avgdl}


def tiered_merge_plan(
    segstats: DataFrame,
    merge_factor: int = 10,
    floor_docs: int = 1000,
    id_col: str = "segment_id",
    size_col: str = "size_docs",
) -> DataFrame:
    """Size-tiered merge selection (the Lucene TieredMergePolicy core
    discipline, simplified to its deterministic skeleton): segments land
    in a tier by floor(log_mf(size / floor_docs)) (sizes under the floor
    all share tier 0 — tiny flush segments merge eagerly), and within a
    tier every FULL group of ``merge_factor`` segments (smallest first,
    id tiebreak) becomes one merge candidate; leftovers wait for the
    tier to fill. Output: one row per segment selected for merging —
    (tier, group_id, segment_id, size_docs, group_docs) — group_docs
    being the merged segment's size (which decides ITS tier next round).

    Scale shape: the input is one row per segment (thousands, not
    corpus-sized), so the per-tier window is trivially bounded; the
    planner is a pure function of the stats table and is itself
    re-runnable/resumable — planning is separated from execution
    (merge_indexes) exactly so the driver never holds merge state.
    """
    lmf = math.log(float(merge_factor))
    tier = F.greatest(
        F.lit(0),
        F.floor(
            F.log(F.col(size_col).cast("double") / F.lit(float(floor_docs))) / F.lit(lmf)
        ),
    ).cast("int")
    w = Window.partitionBy("tier").orderBy(
        F.col(size_col).asc(), F.col(id_col).asc()
    )
    ranked = (
        segstats.select(id_col, size_col, tier.alias("tier"))
        .withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn("group_id", (F.col("__rn") / merge_factor).cast("int"))
    )
    gw = Window.partitionBy("tier", "group_id")
    return (
        ranked.withColumn("__gn", F.count("*").over(gw))
        .withColumn("group_docs", F.sum(size_col).over(gw))
        .filter(F.col("__gn") == merge_factor)
        .select("tier", "group_id", id_col, size_col, "group_docs")
    )
