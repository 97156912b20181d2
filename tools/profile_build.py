"""Stage-level profile of the sf0.1 index build.

Times each build stage independently (forcing materialization per stage)
so the 18s headline can be attributed: tokenize+postings agg, doc_stats
write, segment encode+write, derived stats.  Stages overlap in the real
build (the postings cache is shared), so the sum here exceeds the real
wall-clock; the point is the *ratio*.

Usage: python tools/profile_build.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tokenkit_spark.config import AnalyzerConfig
    from tokenkit_spark.index import build

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    docs.count()  # warm the scan

    cfg = AnalyzerConfig(strategy="whitespace", lowercase=True)
    t = {}

    t0 = time.monotonic()
    toks = build.tokens_with_dl_df(docs, cfg)
    n_tok = toks.count()
    t["tokenize_count"] = time.monotonic() - t0

    t0 = time.monotonic()
    pb = (
        toks.groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.max("dl").alias("dl"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .persist()
    )
    n_post = pb.count()
    t["postings_agg_cached"] = time.monotonic() - t0

    tmp = tempfile.mkdtemp(prefix="profbuild_")
    try:
        t0 = time.monotonic()
        dstats = (
            pb.groupBy("doc_id")
            .agg(F.max("dl").alias("dl"))
            .withColumn("shard", build.shard_col(F.col("doc_id"), 16))
        )
        dstats.repartition(16, "shard").write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(f"{tmp}/doc_stats")
        t["doc_stats_write"] = time.monotonic() - t0

        t0 = time.monotonic()
        cols = ["shard", "term_bucket", "term", "doc_id", "tf", "dl", "positions"]
        postings = (
            pb.withColumn("shard", build.shard_col(F.col("doc_id"), 16))
            .withColumn("term_bucket", build.term_bucket_col(F.col("term"), 64))
            .select(*cols)
        )
        n_parts = max(16, spark.sparkContext.defaultParallelism * 2)
        seg = (
            postings.repartition(n_parts, "shard", "term_bucket")
            .sortWithinPartitions("shard", "term_bucket", "term", "doc_id")
            .mapInPandas(build._encode_stream(), build.SEGMENT_SCHEMA)
        )
        seg.write.mode("overwrite").partitionBy("shard", "term_bucket").parquet(
            f"{tmp}/segments"
        )
        t["segment_encode_write"] = time.monotonic() - t0

        t0 = time.monotonic()
        allseg = spark.read.parquet(f"{tmp}/segments")
        allseg.groupBy("term").agg(
            F.sum("n_postings").alias("df"), F.sum("cf_shard").alias("cf")
        ).write.mode("overwrite").parquet(f"{tmp}/term_stats")
        allseg.groupBy("shard").agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("n_postings").alias("n_postings"),
            F.expr("bit_xor(xxhash64(term, n_postings))").alias("checksum"),
        ).write.mode("overwrite").parquet(f"{tmp}/manifest")
        t["derived_stats"] = time.monotonic() - t0

        # the real end-to-end call, clean path, for reference
        t0 = time.monotonic()
        build.build_index(spark, docs, f"{tmp}/real_idx", cfg, resume=False)
        t["end_to_end_build"] = time.monotonic() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(f"docs={docs.count()} tokens={n_tok} postings={n_post}")
    for k, v in t.items():
        print(f"{k:24s} {v:7.2f}s")


if __name__ == "__main__":
    main()
