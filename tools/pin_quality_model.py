"""Regenerate ops/quality_pinned.py: logistic-regression weights trained
by the DISTRIBUTED trainer (ops/quality_model.py:train_logistic) on the
sf0.01 documents corpus (label: lang == 'en').

Pinning (PCA/BPE precedent): the driver query scores with a FIXED weight
vector so the DuckDB oracle can inline the same constants; live training
stays verified by tests/test_quality_model.py (numpy gradient parity +
accuracy bound).

Usage: python tools/pin_quality_model.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tokenkit_spark",
    "ops",
    "quality_pinned.py",
)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tokenkit_spark.ops import quality_model as qm

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = qm.labeled_quality_corpus(docs).persist()
    feats = qm.doc_features(corpus, label_expr=F.col("label")).persist()
    w, losses = qm.train_logistic(feats)
    scored = qm.score_docs(corpus, w)
    acc = (
        scored.join(corpus.select("doc_id", "label"), "doc_id")
        .select((F.col("keep") == F.col("label").cast("int")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    with open(OUT, "w") as f:
        f.write(
            '"""PINNED quality-classifier weights: ops/quality_model.py:'
            "train_logistic\noutput at sf0.01 on labeled_quality_corpus "
            f"(clean vs repeated-junk; train\naccuracy {acc:.3f}, final loss "
            f'{losses[-1]:.4f}). Regenerate with\ntools/pin_quality_model.py."""\n\n'
            "# feature order: " + ", ".join(qm.FEATURE_NAMES) + "\n"
        )
        f.write("WEIGHTS = [\n")
        for x in w:
            f.write(f"    {float(x)!r},\n")
        f.write("]\n")
    print(f"train_acc={acc:.3f} final_loss={losses[-1]:.4f} -> {OUT}")


if __name__ == "__main__":
    main()
