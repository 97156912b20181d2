"""WAND-vs-exhaustive end-to-end probe at parameterized corpus size.

VERDICT r04: at 100k docs zipf_e2e showed WAND ~parity with exhaustive
despite 54% block pruning; the advice asks for evidence at >=1M docs
(where head lists are ~10x longer and decode work dominates the Python
block-loop overhead) before keeping Block-Max WAND as the default.

Usage: python tools/wand_scale_probe.py [n_docs] [cpus]

Prints one JSON line per run: build_sec, pruned_frac, query_sec_wand,
query_sec_exhaustive, speedup, rank_identical.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shards_arg = int(sys.argv[3]) if len(sys.argv) > 3 else None
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 14
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from tokenkit_spark.index.build import build_index, load_index
    from tokenkit_spark.index.query import bm25_segments, bm25_wand_stats

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    vocab, doc_len, s = 20_000, 16, 1.2
    w = 1.0 / np.power(np.arange(1, vocab + 1), s)
    cdf = np.cumsum(w / w.sum())

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            j = np.arange(doc_len, dtype=np.uint64)
            h = ids[:, None] * np.uint64(2654435761) + (j + 1) * np.uint64(1315423911)
            h ^= h >> np.uint64(16)
            h *= np.uint64(2246822519)
            h ^= h >> np.uint64(13)
            u = (h & np.uint64(0x7FFFFFFF)).astype(np.float64) / float(0x80000000)
            ranks = np.searchsorted(cdf, u)
            texts = [" ".join(f"t{r}" for r in row) for row in ranks]
            yield pd.DataFrame({"doc_id": pdf["id"].astype(np.int64), "text": texts})

    docs = spark.range(n_docs).repartition(cpus).mapInPandas(
        gen, "doc_id long, text string"
    )
    idx_path = os.path.join(
        tempfile.gettempdir(), f"tokenkit_probe_zipf_{n_docs}_{os.getpid()}"
    )
    shutil.rmtree(idx_path, ignore_errors=True)
    # default keeps per-shard density constant-ish with the bench
    # (~25k docs/shard); pass an explicit shard count to probe the
    # realistic high-density regime (10^5+ docs/shard)
    n_shards = shards_arg if shards_arg else max(4, n_docs // 25_000)
    t0 = time.monotonic()
    build_index(spark, docs, idx_path, entry.WS, n_shards=n_shards,
                n_buckets=16, resume=False)
    t_build = time.monotonic() - t0
    index = load_index(spark, idx_path)

    qrows = [(i, f"t{i % 3} t{300 + (i * 23) % 1500}") for i in range(n_queries)]
    qrows += [(n_queries, "t0 t1"), (n_queries + 1, "t1 t2")]
    qdf = spark.createDataFrame(qrows, "query_id long, text string")

    bm25_segments(spark, index, qdf, entry.WS, k=10).collect()
    bm25_segments(spark, index, qdf, entry.WS, k=10, use_blockmax=False).collect()

    runs = {"wand": [], "ex": []}
    wand_rows = ex_rows = None
    for _ in range(3):
        t0 = time.monotonic()
        wand_rows = bm25_segments(spark, index, qdf, entry.WS, k=10).collect()
        runs["wand"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        ex_rows = bm25_segments(
            spark, index, qdf, entry.WS, k=10, use_blockmax=False
        ).collect()
        runs["ex"].append(time.monotonic() - t0)

    ranked = sorted((r.query_id, r.rank, r.doc_id, r.score) for r in wand_rows)
    ranked_ex = sorted((r.query_id, r.rank, r.doc_id, r.score) for r in ex_rows)

    st = (
        bm25_wand_stats(spark, index, qdf, entry.WS, k=10)
        .agg(F.sum("blocks_total").alias("bt"), F.sum("blocks_decoded").alias("bd"))
        .collect()[0]
    )
    shutil.rmtree(idx_path, ignore_errors=True)
    t_wand, t_ex = min(runs["wand"]), min(runs["ex"])
    print(json.dumps({
        "n_docs": n_docs, "cpus": cpus, "n_shards": n_shards,
        "build_sec": round(t_build, 2),
        "blocks_total": int(st.bt or 0), "blocks_decoded": int(st.bd or 0),
        "pruned_frac": round(1 - (st.bd or 0) / max(st.bt or 1, 1), 4),
        "query_sec_wand": round(t_wand, 3),
        "query_sec_exhaustive": round(t_ex, 3),
        "wand_runs": [round(x, 3) for x in runs["wand"]],
        "ex_runs": [round(x, 3) for x in runs["ex"]],
        "speedup": round(t_ex / t_wand, 3) if t_wand else None,
        "rank_identical": ranked == ranked_ex,
    }))


if __name__ == "__main__":
    main()
