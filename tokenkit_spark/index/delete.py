"""Physical document deletion: rewrite an index without a set of doc_ids.

Completes the incremental-crawl lifecycle with merge.py: re-crawled or
takedown'd pages are deleted from the base index, then the fresh batch
is merged in (merge.py requires disjoint doc sets).

Exactness contract (tested): ``delete_docs(base, D)`` produces an index
whose BM25 results, term stats, and phrase hits are identical to
rebuilding from scratch on ``corpus - D``. Block metadata is
avgdl-independent (codec.py: per-block max_tf/min_dl, bound computed at
query time), so the rewrite only has to drop deleted postings and
re-encode the surviving runs; the post-delete avgdl lives solely in the
global stats row.

Plan shape (scale notes): zero shuffles. Each segment row is already a
complete (shard, term_bucket, term) run, so the rewrite is a pure
``mapInPandas`` over the existing partition layout; the deleted-id set
ships once per executor as a broadcast, and runs that lose every
posting drop out (vanished terms disappear from term_stats via the
post-rewrite re-aggregation). For deletion sets too large to broadcast
(say >10^8 ids), rebuild instead — the rewrite cost is the same and the
build path is simpler.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec
from .build import IndexPaths, SEGMENT_SCHEMA, load_index


def _delete_kernel(bc_deleted):
    """mapInPandas kernel: decode each run, drop deleted postings,
    re-encode. Encoding is batched across all surviving runs of the
    Arrow batch (one codec.encode_runs call)."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        deleted = bc_deleted.value  # sorted int64 array
        for pdf in batch_iter:
            if not len(pdf):
                continue
            kept_ids, kept_tfs, kept_dls, kept_pos = [], [], [], []
            kept_meta = []  # (shard, bucket, term, has_pos)
            for row in pdf.itertuples(index=False):
                ids, tfs, dls = codec.decode_posting_list(
                    {
                        "n_postings": int(row.n_postings),
                        "doc_ids_blob": row.doc_ids_blob,
                        "tfs_blob": row.tfs_blob,
                        "dls_blob": row.dls_blob,
                        "codec": getattr(row, "codec", "varint"),
                        "block_doc_off": getattr(
                            row, "block_doc_off", None
                        ),
                        "block_last": getattr(row, "block_last", None),
                    }
                )
                keep = ~np.isin(ids, deleted)
                if not keep.any():
                    continue
                pos_blob = bytes(row.pos_blob) if row.pos_blob is not None else b""
                if pos_blob:
                    flat, offs = codec.decode_positions(pos_blob, tfs)
                    plists = [
                        flat[o : o + t]
                        for o, t, k in zip(offs.tolist(), tfs.tolist(), keep.tolist())
                        if k
                    ]
                    kept_pos.extend(plists)
                    has_pos = True
                else:
                    has_pos = False
                kept_ids.append(ids[keep])
                kept_tfs.append(tfs[keep])
                kept_dls.append(dls[keep])
                kept_meta.append((row.shard, row.term_bucket, row.term, has_pos))
            if not kept_meta:
                continue
            run_lens = np.array([a.size for a in kept_ids], dtype=np.int64)
            ends = np.cumsum(run_lens)
            starts = np.concatenate(([0], ends[:-1]))
            doc_ids = np.concatenate(kept_ids)
            tfs_all = np.concatenate(kept_tfs)
            dls_all = np.concatenate(kept_dls)
            encoded = codec.encode_runs(starts, ends, doc_ids, tfs_all, dls_all)
            all_pos = all(m[3] for m in kept_meta)
            if all_pos and kept_pos:
                pos_blobs = codec.encode_positions_runs(starts, ends, tfs_all, kept_pos)
            else:
                pos_blobs = [b""] * len(starts)
            rows = [
                (
                    int(meta[0]), int(meta[1]), meta[2],
                    enc[0], enc[10],
                    enc[1], enc[2], enc[3],
                    enc[4], enc[5], enc[6],
                    enc[7], enc[8], enc[9],
                    pb,
                    "varint",  # rewrite uses the default codec
                )
                for meta, enc, pb in zip(kept_meta, encoded, pos_blobs)
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return fn


def delete_docs(
    spark: SparkSession,
    base_path: str,
    doc_ids: DataFrame | Iterable[int],
    out_path: str,
) -> dict:
    """Rewrite the index at ``base_path`` without ``doc_ids`` -> ``out_path``.
    Returns the post-delete global stats; raises if nothing would remain."""
    norm = lambda p: os.path.abspath(p) if "://" not in p else p.rstrip("/")
    if norm(out_path) == norm(base_path):
        raise ValueError(
            "delete_docs: out_path must differ from base_path — overwriting "
            "the index being read corrupts it mid-job (in-place deletion "
            "needs a temp dir + swap)"
        )
    base = load_index(spark, base_path)
    bs = base["stats"]
    n_shards, n_buckets = int(bs["n_shards"]), int(bs["n_buckets"])

    # keep the deleted ids RELATIONAL (joins, not Column.isin literal
    # lists: a 10^8-id isin inflates the plan and OOMs the driver); the
    # only driver materialization is the sorted array the rewrite kernel
    # ships once per executor via broadcast
    if isinstance(doc_ids, DataFrame):
        del_df = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    else:
        ids = sorted(set(int(d) for d in doc_ids))
        del_df = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    del_arr = np.array(
        sorted(r.doc_id for r in del_df.collect()), dtype=np.int64
    )

    # post-delete globals from doc_stats (only actually-present ids count)
    removed = (
        base["doc_stats"]
        .join(del_df, "doc_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t"))
        .collect()[0]
    )
    n_docs = int(bs["n_docs"]) - int(removed.n)
    total_tokens = int(bs["total_tokens"]) - int(removed.t)
    if n_docs <= 0:
        raise ValueError("delete_docs would remove every document; rebuild instead")
    avgdl = total_tokens / n_docs

    bc = spark.sparkContext.broadcast(del_arr)
    paths = IndexPaths(out_path)
    seg_cols = [f.name for f in SEGMENT_SCHEMA.fields]
    rewritten = base["segments"].select(seg_cols).mapInPandas(
        _delete_kernel(bc), SEGMENT_SCHEMA
    )
    rewritten.write.mode("overwrite").partitionBy("shard", "term_bucket").parquet(
        paths.segments
    )

    dstats = base["doc_stats"].join(del_df, "doc_id", "left_anti")
    dstats.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(paths.doc_stats)

    all_segments = spark.read.parquet(paths.segments)
    term_stats = all_segments.groupBy("term").agg(
        F.sum("n_postings").alias("df"), F.sum("cf_shard").alias("cf")
    )
    term_stats.write.mode("overwrite").parquet(paths.term_stats)

    spark.createDataFrame(
        [(n_docs, total_tokens, float(avgdl), n_shards, n_buckets,
          bool(bs.get("store_positions", True)))],
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
    return {"n_docs": n_docs, "total_tokens": total_tokens, "avgdl": avgdl,
            "n_deleted": int(removed.n)}
