"""spark-submit job: build (or resume) the inverted index on a cluster.

    spark-submit --py-files dist/tokenkit_spark.zip \
        tools/submit_index_build.py \
        --input  <pages parquet path | iceberg table> \
        --output <index root path> \
        [--input-format parquet|iceberg] [--strategy whitespace]
        [--n-shards 256] [--n-buckets 64] [--no-resume]

The input is the Common-Crawl-style pages table (url, warc_ts, html,
text, lang — BASELINE.json input_hint); doc_id = xxhash64(url). Prints
one JSON line of build metrics (lineage lives in <output>/manifest).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--strategy", default="whitespace")
    ap.add_argument("--lowercase", default=True, type=lambda s: s not in ("0", "false"))
    ap.add_argument("--lang", default=None, help="optional lang filter, e.g. en")
    ap.add_argument("--n-shards", type=int, default=256)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # master/executors come from spark-submit; nothing hard-coded here
    spark = SparkSession.builder.appName("tokenkit-index-build").getOrCreate()

    from tokenkit_spark import AnalyzerConfig
    from tokenkit_spark.index.build import build_index
    from tokenkit_spark.sources.pages import pages_to_docs, read_pages

    pages = read_pages(spark, args.input, use_iceberg=args.input_format == "iceberg")
    if args.lang:
        pages = pages.filter(pages.lang == args.lang)
    docs = pages_to_docs(pages).select("doc_id", "text")

    cfg = AnalyzerConfig(strategy=args.strategy, lowercase=args.lowercase)
    metrics = build_index(
        spark,
        docs,
        args.output,
        cfg,
        n_shards=args.n_shards,
        n_buckets=args.n_buckets,
        resume=not args.no_resume,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
