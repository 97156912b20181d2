"""spark-submit job: serve a batch of BM25 top-k queries from an index.

    spark-submit --py-files dist/tokenkit_spark.zip \
        tools/submit_query.py \
        --index <index root path> --query "spark shard merge" \
        [--query ...] [--k 10] [--strategy whitespace]

Prints one JSON line per query with the top-k (rank, doc_id, score).
The analyzer config MUST match the index build (index-time/query-time
parity — reference README.md:512-541).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--strategy", default="whitespace")
    ap.add_argument("--lowercase", default=True, type=lambda s: s not in ("0", "false"))
    args = ap.parse_args()

    spark = SparkSession.builder.appName("tokenkit-query").getOrCreate()

    from tokenkit_spark import AnalyzerConfig
    from tokenkit_spark.index.build import load_index
    from tokenkit_spark.index.query import bm25_segments

    cfg = AnalyzerConfig(strategy=args.strategy, lowercase=args.lowercase)
    index = load_index(spark, args.index)
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
