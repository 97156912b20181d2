"""spark-submit job: serve a batch of BM25 top-k queries from an index.

    spark-submit --py-files dist/tokenkit_spark.zip \
        tools/submit_query.py \
        --index <index root path> --query "spark shard merge" \
        [--query ...] [--k 10] [--strategy whitespace] \
        [--queries-parquet path --out path]

Prints one JSON line per query with the top-k (rank, doc_id, score).
With --queries-parquet (a table of query_id long, text string), the job
switches to the BATCH engine (bm25_segments_batch — relational term
join, no driver term collect) and writes results to --out instead of
printing: the 10^5+-query regime. The analyzer config MUST match the
index build (index-time/query-time parity — reference README.md:512-541).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", default=None)
    ap.add_argument("--queries-parquet", default=None,
                    help="parquet of (query_id long, text string): batch mode")
    ap.add_argument("--out", default=None, help="output parquet path (batch mode)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--strategy", default="whitespace")
    ap.add_argument("--lowercase", default=True, type=lambda s: s not in ("0", "false"))
    args = ap.parse_args()
    if not args.query and not args.queries_parquet:
        ap.error("need --query or --queries-parquet")

    spark = SparkSession.builder.appName("tokenkit-query").getOrCreate()

    from tokenkit_spark import AnalyzerConfig
    from tokenkit_spark.index.build import load_index
    from tokenkit_spark.index.query import bm25_segments, bm25_segments_batch

    cfg = AnalyzerConfig(strategy=args.strategy, lowercase=args.lowercase)
    index = load_index(spark, args.index)

    if args.queries_parquet:
        qdf = spark.read.parquet(args.queries_parquet)
        out = bm25_segments_batch(spark, index, qdf, cfg, k=args.k)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out}))
        else:
            for r in out.collect():
                print(json.dumps({"query_id": int(r.query_id), "rank": int(r.rank),
                                  "doc_id": int(r.doc_id),
                                  "score": round(float(r.score), 6)}))
        spark.stop()
        return

    qdf = spark.createDataFrame(
        list(enumerate(args.query)), "query_id long, text string"
    )
    rows = bm25_segments(spark, index, qdf, cfg, k=args.k).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r.query_id), []).append(
            {"rank": int(r.rank), "doc_id": int(r.doc_id), "score": round(float(r.score), 6)}
        )
    for qid, text in enumerate(args.query):
        print(json.dumps({"query": text, "top_k": by_q.get(qid, [])}))
    spark.stop()


if __name__ == "__main__":
    main()
