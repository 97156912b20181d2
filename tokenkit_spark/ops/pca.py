"""Distributed PCA over an embedding column: train on partial sums,
project with Arrow-batched matmuls — the dimensionality cut (e.g.
768 -> 64) that makes brute-force and IVF cosine affordable at corpus
scale, pairing with int8 quantization (similarity.quantize_embeddings)
for the full ANN memory budget.

Training never collects vectors: each partition emits ONE row of
sufficient statistics (count, sum, Gram matrix X^T X — dim x dim
doubles), the driver reduces them (sum of a handful of small matrices)
and eigendecomposes the covariance there (dim <= a few thousand, so the
eigh is microseconds — the classic "sufficient statistics to the
driver, never the data" pattern).  Projection is a mapInPandas matmul
over Arrow batches: (M - mean) @ W per batch, embarrassingly parallel,
no shuffle.

Eigenvector sign is pinned (largest-|coefficient| entry positive) so a
trained model is deterministic up to float-sum ordering across
partitions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: np.ndarray        # (dim,)
    components: np.ndarray  # (dim, k) column-orthonormal
    explained_variance: np.ndarray  # (k,) descending


def _partials_kernel(dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    return fn


def train_pca(
    emb: DataFrame, n_components: int, vec_col: str = "embedding"
) -> PCAModel:
    """Fit PCA from one distributed pass of sufficient statistics."""
    head = emb.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("train_pca: input has no (non-null) vectors")
    dim = len(head[0])
    if not (0 < n_components <= dim):
        raise ValueError(f"train_pca: need 0 < n_components <= dim ({dim})")
    parts = (
        emb.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(_partials_kernel(dim), "n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r.n for r in parts)
    if n < 2:
        raise ValueError("train_pca: need at least 2 vectors")
    s = np.sum([np.array(r.s) for r in parts], axis=0)
    g = np.sum([np.array(r.g).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:n_components]
    w = vecs[:, order]
    # sign convention: the largest-|coefficient| entry of each component
    # is positive — kills the eigh sign ambiguity
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    return PCAModel(mean=mean, components=w * flip,
                    explained_variance=vals[order])


def project_embeddings(
    emb: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "reduced",
) -> DataFrame:
    """(id, reduced array<double>): one Arrow-batch matmul per batch."""
    mean, w = model.mean.copy(), model.components.copy()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"vec_id": [], out_col: []})
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            red = (m - mean) @ w
            yield pd.DataFrame(
                {"vec_id": pdf["i"].to_numpy(), out_col: list(map(list, red))}
            )

    return emb.select(
        F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v")
    ).mapInPandas(fn, f"vec_id long, {out_col} array<double>")
