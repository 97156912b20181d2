"""Regenerate ops/bpe_pinned.py: the BPE merge table trained by the
DISTRIBUTED trainer (ops/bpe.py:train_bpe) on the sf0.01 documents corpus.

Pinning (the PCA-model precedent, tools/pin_pca_model.py): the encode
queries apply a FIXED merge table so both engines — the Spark Arrow
kernel and the DuckDB oracle's inlined pretoken->tokens map — run the
same deterministic model; the live trainer stays verified by
tests/test_bpe.py (distributed == independent reference implementation)
and by the bpe_merges driver query.

Usage: python tools/pin_bpe_model.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 24
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tokenkit_spark",
    "ops",
    "bpe_pinned.py",
)


def main() -> None:
    from pyspark.sql import SparkSession

    from tokenkit_spark.ops import bpe

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    merges = bpe.train_bpe(docs, n_merges=N_MERGES)
    with open(OUT, "w") as f:
        f.write(
            '"""PINNED BPE merge table: ops/bpe.py:train_bpe output at sf0.01\n'
            f"(n_merges={N_MERGES}). Regenerate with tools/pin_bpe_model.py.\n"
            '"""\n\n'
        )
        f.write("MERGES = [\n")
        for l, r in merges:
            f.write(f"    ({l!r}, {r!r}),\n")
        f.write("]\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
