"""Per-phase wall-clock attribution of build_index at a given core count.

Replicates build_index's exact action sequence with a timer around each
Spark action, so the Amdahl "serial" seconds measured by scaling_bench
can be attributed to a phase. Run at 2 and 8 cores on the same corpus:
the phase whose wall does NOT shrink ~4x is the scaling limiter.

Usage: python tools/build_phase_profile.py <cores> [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 480000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tokenkit_spark import AnalyzerConfig
    from tokenkit_spark.index.build import (
        SEGMENT_SCHEMA,
        IndexPaths,
        _encode_stream,
        _hadoop_delete,
        shard_col,
        term_bucket_col,
        tokens_with_dl_df,
    )
    from tokenkit_spark.sources.pages import pages_to_docs, synth_pages

    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName(f"phase-profile-{CORES}")
        .config("spark.sql.shuffle.partitions", str(CORES * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = AnalyzerConfig(strategy="whitespace", lowercase=True)

    data_dir = os.path.join(tempfile.gettempdir(), f"tokenkit_scaling_corpus_{N_DOCS}")
    if not os.path.isdir(data_dir):
        synth_pages(
            spark, n_docs=N_DOCS, seed=42, vocab_size=50_000, doc_len=120,
            n_partitions=64,
        ).write.mode("overwrite").parquet(data_dir)
    docs = pages_to_docs(spark.read.parquet(data_dir)).select("doc_id", "text")
    docs.count()
    spark.range(CORES * 4).mapInPandas(lambda it: it, "id long").count()

    idx_path = os.path.join(
        tempfile.gettempdir(), f"tokenkit_phaseprof_idx_{CORES}_{os.getpid()}"
    )
    paths = IndexPaths(idx_path)
    shutil.rmtree(idx_path, ignore_errors=True)

    n_shards, n_buckets = 32, 8
    t = {}
    t_all0 = time.monotonic()

    docs = docs.withColumn("shard", shard_col(F.col("doc_id"), n_shards))
    postings_base = (
        tokens_with_dl_df(docs, cfg)
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.max("dl").alias("dl"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .persist()
    )
    dstats = (
        postings_base.groupBy("doc_id")
        .agg(F.max("dl").alias("dl"))
        .withColumn("shard", shard_col(F.col("doc_id"), n_shards))
        .persist()
    )
    t0 = time.monotonic()
    dstats.repartition(n_shards, "shard").write.mode("append").partitionBy(
        "shard"
    ).parquet(paths.doc_stats)
    t["1_tokenize_agg_docstats_write"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    g = dstats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        F.avg("dl").alias("avgdl"),
    ).collect()[0]
    t["2_stats_collect"] = round(time.monotonic() - t0, 2)

    cols = ["shard", "term_bucket", "term", "doc_id", "tf", "dl", "positions"]
    postings = (
        postings_base.withColumn("shard", shard_col(F.col("doc_id"), n_shards))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
        .select(*cols)
    )
    segments = (
        postings.repartition("shard", "term_bucket")
        .sortWithinPartitions("shard", "term_bucket", "term", "doc_id")
        .mapInPandas(_encode_stream(), SEGMENT_SCHEMA)
    )
    t0 = time.monotonic()
    segments.write.mode("append").partitionBy("shard", "term_bucket").parquet(
        paths.segments
    )
    t["3_encode_write"] = round(time.monotonic() - t0, 2)
    postings_base.unpersist()
    dstats.unpersist()

    t0 = time.monotonic()
    all_segments = spark.read.parquet(paths.segments).select(
        "shard", "term", "n_postings", "cf_shard"
    ).persist()
    term_stats = all_segments.groupBy("term").agg(
        F.sum("n_postings").alias("df"), F.sum("cf_shard").alias("cf")
    )
    term_stats.write.mode("overwrite").parquet(paths.term_stats)
    t["4_termstats_rescan_write"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    stats_row = spark.createDataFrame(
        [(int(g.n_docs), int(g.total_tokens), float(g.avgdl), n_shards,
          n_buckets, True)],
        "n_docs long, total_tokens long, avgdl double, n_shards int, "
        "n_buckets int, store_positions boolean",
    )
    stats_row.write.mode("overwrite").parquet(paths.stats)
    t["5_statsrow_write"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
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
    all_segments.unpersist()
    t["6_manifest_write"] = round(time.monotonic() - t0, 2)

    t["total"] = round(time.monotonic() - t_all0, 2)
    t["cores"] = CORES
    t["n_docs"] = N_DOCS
    print(json.dumps(t))
    shutil.rmtree(idx_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
