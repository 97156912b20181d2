"""Regenerate ops/wordpiece_pinned.py: the WordPiece merge table +
vocabulary trained by the DISTRIBUTED trainer
(ops/bpe.py:train_wordpiece) on the sf0.01 documents corpus.

Same pinning contract as tools/pin_bpe_model.py: encode queries apply
a FIXED vocab so Spark and the DuckDB oracle run the same model; the
live trainer stays verified by tests (distributed == independent
reference) and the wordpiece_merges driver query.

Usage: python tools/pin_wordpiece_model.py [sf_dir] [n_merges]
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
    "wordpiece_pinned.py",
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
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe.train_wordpiece(docs, n_merges=N_MERGES)
    alphabet = {
        r["c"]
        for r in bpe.pretoken_counts(docs)
        .selectExpr("explode(transform(sequence(1, length(pretoken)), "
                    "i -> substring(pretoken, i, 1))) AS c")
        .distinct()
        .collect()
    }
    vocab = bpe.wordpiece_vocab(merges, alphabet)
    with open(OUT, "w") as f:
        f.write(
            '"""PINNED WordPiece model: ops/bpe.py:train_wordpiece output at\n'
            f"sf0.01 (n_merges={N_MERGES}). Regenerate with "
            "tools/pin_wordpiece_model.py.\n"
            '"""\n\n'
        )
        f.write("MERGES = [\n")
        for l, r in merges:
            f.write(f"    ({l!r}, {r!r}),\n")
        f.write("]\n\nVOCAB = [\n")
        for v in vocab:
            f.write(f"    {v!r},\n")
        f.write("]\n")
    print(f"wrote {len(merges)} merges, {len(vocab)} vocab to {OUT}")


if __name__ == "__main__":
    main()
