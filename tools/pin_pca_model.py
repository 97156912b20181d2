"""Regenerate tokenkit_spark/ops/pca_pinned.py: train the 8-component
PCA on the sf0.01 embeddings (ops.pca.train_pca — the distributed
sufficient-statistics pass, numpy-parity-pinned in tests/test_pca.py)
and freeze mean + components as module constants.

Pinning makes the projection+cosine query (``pca_cosine_top10``)
oracle-checkable: both the Spark query and its DuckDB twin apply the
SAME fixed linear map, so the driver's value-hash compare covers the
distributed projection kernel end-to-end at any sf. Training itself
stays covered by the pytest parity suite.

Usage: python tools/pin_pca_model.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import numpy as np
    from pyspark.sql import SparkSession

    from tokenkit_spark.ops import pca as pca_ops

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_ops.train_pca(emb, n_components=8)
    mean = np.round(model.mean, 8).tolist()
    w = np.round(model.components, 8).tolist()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tokenkit_spark", "ops", "pca_pinned.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Pinned PCA model: ops.pca.train_pca output (8 components) on\n'
            f"the {os.path.basename(sf_dir)} embeddings table. "
            "Regenerate with tools/pin_pca_model.py.\n\n"
            "MEAN is the training mean (dim,), W the column-orthonormal\n"
            'components (dim, k) — rows are input dims, columns components."""\n\n'
        )
        f.write(f"MEAN = {mean}\n\n")
        f.write("W = [\n")
        for row in w:
            f.write(f"    {row},\n")
        f.write("]\n")
    print(f"wrote {out}: dim={len(mean)}, k={len(w[0])}")


if __name__ == "__main__":
    main()
