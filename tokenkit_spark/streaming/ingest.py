"""Continuous crawl ingestion: Structured Streaming -> index generations.

The reference is strictly batch (SURVEY.md §2.E), and the north rule asks
for resumable BATCH builds — this module is the Spark-native extension a
continuous crawl needs on top: new page files land in a directory, a
file-source stream picks them up, and each micro-batch becomes a new
immutable INDEX GENERATION:

    gen 1 = build_index(batch 1)
    gen N = merge_indexes(gen N-1, build_index(batch N))

Why foreachBatch + generations instead of a custom stateful operator:

* The index build is a heavy multi-stage batch job (tokenize -> postings
  shuffle -> sorted segment encode). ``foreachBatch`` reuses the EXACT
  batch engine (build.py/merge.py, both parity-tested against fresh
  rebuilds) — no second implementation to keep correct.
* Generations are immutable directories with a ``LATEST`` pointer
  written last; queries always read a complete, consistent index, and a
  crash mid-merge leaves the previous generation intact (the streaming
  checkpoint replays the batch, which rebuilds the SAME generation
  directory — idempotent by construction, keyed on batch_id).
* At scale the merge cost is O(index), so production would compact every
  K batches (tiered merge) — the generation layout supports that without
  changing the query side, which only follows LATEST.

Contract: streamed batches carry NEW documents (crawl appends). Re-crawl
updates/deletes go through ``index.incremental.incremental_update`` —
merge_indexes requires disjoint doc sets and will double-count dupes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config import AnalyzerConfig
from ..index.build import _hadoop_delete, build_index, load_index
from ..index.merge import merge_indexes
from ..sources.pages import PAGES_SCHEMA, pages_to_docs


def _gen_dir(root: str, gen: int) -> str:
    return os.path.join(root, f"gen={gen}")


def _latest_file(root: str) -> str:
    return os.path.join(root, "LATEST")


def _read_latest(spark: SparkSession, root: str) -> int:
    """Current generation number, 0 if none. The LATEST pointer is a
    one-row text file written AFTER the generation is complete."""
    path = _latest_file(root)
    jvm = spark.sparkContext._jvm
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(jconf)
    if not fs.exists(p):
        return 0
    stream = fs.open(p)
    try:
        data = []
        b = stream.read()
        while b != -1 and len(data) < 32:
            data.append(b)
            b = stream.read()
        return int(bytes(data).decode("ascii").strip() or 0)
    finally:
        stream.close()


def _write_latest(spark: SparkSession, root: str, gen: int) -> None:
    jvm = spark.sparkContext._jvm
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(_latest_file(root))
    fs = p.getFileSystem(jconf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(str(gen).encode("ascii")))
    finally:
        out.close()


def prune_generations(spark: SparkSession, root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` COMPLETE generations (those <=
    LATEST; a partially-written gen above LATEST is never touched — its
    batch will be replayed). Returns the deleted generation numbers.
    Production would run this on the same cadence as compaction."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    latest = _read_latest(spark, root)
    jvm = spark.sparkContext._jvm
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(jconf)
    if not fs.exists(p):
        return []
    gens = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("gen="):
            try:
                gens.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    doomed = sorted(g for g in gens if g <= latest - keep)
    for g in doomed:
        _hadoop_delete(spark, _gen_dir(root, g))
    return doomed


def latest_index_path(spark: SparkSession, root: str) -> str | None:
    gen = _read_latest(spark, root)
    return _gen_dir(root, gen) if gen > 0 else None


def load_latest_index(spark: SparkSession, root: str) -> dict:
    path = latest_index_path(spark, root)
    if path is None:
        raise ValueError(f"no index generation published under {root}")
    return load_index(spark, path)


def stream_index_updates(
    spark: SparkSession,
    pages_path: str,
    index_root: str,
    config: AnalyzerConfig | None = None,
    n_shards: int = 8,
    n_buckets: int = 16,
    checkpoint: str | None = None,
    work_dir: str | None = None,
    available_now: bool = True,
):
    """Run the ingestion stream over ``pages_path`` (a directory new page
    parquet files are appended to). Returns the StreamingQuery; with
    ``available_now=True`` (default, used by tests) it processes all
    currently-available files and stops.
    """
    cfg = config or AnalyzerConfig()
    ckpt = checkpoint or os.path.join(index_root, "_checkpoint")
    work = work_dir or os.path.join(index_root, "_work")

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(pages_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = pages_to_docs(batch_df).select("doc_id", "text")
        if docs.limit(1).count() == 0:
            return
        prev = _read_latest(spark, index_root)
        gen = prev + 1
        gen_path = _gen_dir(index_root, gen)
        # replayed batch after a crash: rebuild the generation from
        # scratch (directories are cheap-to-drop partial state; LATEST
        # still points at the previous complete generation)
        _hadoop_delete(spark, gen_path)
        if prev == 0:
            build_index(
                spark, docs, gen_path, cfg,
                n_shards=n_shards, n_buckets=n_buckets, resume=False,
            )
        else:
            delta_path = os.path.join(work, f"delta_{batch_id}")
            _hadoop_delete(spark, delta_path)
            build_index(
                spark, docs, delta_path, cfg,
                n_shards=n_shards, n_buckets=n_buckets, resume=False,
            )
            merge_indexes(spark, _gen_dir(index_root, prev), delta_path, gen_path)
            _hadoop_delete(spark, delta_path)
        _write_latest(spark, index_root, gen)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
