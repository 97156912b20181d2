"""Trained document-quality / language classifier: distributed logistic
regression over JVM-computed text features.

The fastText-classifier slot of an LLM data pipeline (quality and
language gates ahead of pre-training) built cluster-shaped:

* Features are pure Catalyst expressions (stopword-family ratios, mean
  token length, type-token ratio) — whole-stage codegen, and each has an
  exact SQL twin so scoring is oracle-checkable.
* Training is full-batch gradient descent where each iteration is ONE
  mapInPandas pass emitting per-partition sufficient statistics
  (X^T(sigmoid(Xw) - y) and the example count — d+1 doubles per
  partition); the driver holds only the weight vector. No example ever
  leaves its partition; iterations scale with model dimension, not data.
* Scoring with trained/pinned weights is a single Catalyst projection.

Determinism: fixed iteration count + fixed learning rate, no RNG; float
reduction order varies with partitioning only in final ulps (tests use
np.allclose; the driver query scores with PINNED weights, see
ops/quality_pinned.py / tools/pin_quality_model.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import STOPWORDS

FEATURE_NAMES = [
    "bias",
    "stop_en",
    "stop_fr",
    "stop_de",
    "stop_es",
    "mean_tok_len",
    "ttr",
]


def _toks(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != F.lit(""))


def _stop_ratio(toks: Column, stops: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in stops])))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def feature_cols(text_col: Column) -> list[Column]:
    """The model's feature vector as Catalyst columns (order pinned by
    FEATURE_NAMES)."""
    toks = _toks(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    mean_len = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n
    )
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    return [
        F.lit(1.0),
        _stop_ratio(toks, STOPWORDS["en"]),
        _stop_ratio(toks, STOPWORDS["fr"]),
        _stop_ratio(toks, STOPWORDS["de"]),
        _stop_ratio(toks, STOPWORDS["es"]),
        mean_len,
        ttr,
    ]


def labeled_quality_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic labeled corpus for the quality gate: even doc_ids
    keep their text (label 1 = clean); odd doc_ids are degraded into
    boilerplate junk — the first 25 chars repeated 12 times (label 0),
    the repetitive-spam signature Gopher/C4-style filters remove. Pure
    string expressions, so the SQL oracle constructs the identical
    corpus (the synthetic tables carry no organic junk to learn from)."""
    junk = F.repeat(F.concat(F.substring(F.col(text_col), 1, 25), F.lit(" ")), 12)
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.col(text_col))
        .otherwise(junk)
        .alias(text_col),
        (F.col("doc_id") % 2 == 0).cast("double").alias("label"),
    )


def doc_features(
    docs: DataFrame, text_col: str = "text", label_expr: Column | None = None
) -> DataFrame:
    """(doc_id, features array<double>[, label double]) for training or
    scoring."""
    cols = [
        F.col("doc_id"),
        F.array(*feature_cols(F.col(text_col))).alias("features"),
    ]
    if label_expr is not None:
        cols.append(label_expr.cast("double").alias("label"))
    return docs.select(*cols)


def _grad_kernel(w: np.ndarray):
    d = w.size

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros(d)
        n = 0
        loss = 0.0
        for pdf in batch_iter:
            if not len(pdf):
                continue
            X = np.stack(pdf["features"].to_numpy())
            y = pdf["label"].to_numpy(dtype=np.float64)
            z = X @ w
            p = 1.0 / (1.0 + np.exp(-z))
            g += X.T @ (p - y)
            # numerically-stable logistic loss
            loss += float(np.sum(np.logaddexp(0.0, z) - y * z))
            n += len(pdf)
        yield pd.DataFrame(
            {"g": [g.tolist()], "n": [n], "loss": [loss]}
        )

    return fn


def train_logistic(
    feats: DataFrame, lr: float = 0.5, n_iters: int = 200, l2: float = 0.0
) -> tuple[np.ndarray, list[float]]:
    """Full-batch gradient descent; returns (weights, per-iter mean
    loss). ``feats`` must have (features array<double>, label double)
    and is persisted by the caller when reused."""
    d = len(FEATURE_NAMES)
    w = np.zeros(d)
    losses: list[float] = []
    feats = feats.select("features", "label")
    for _ in range(n_iters):
        parts = feats.mapInPandas(
            _grad_kernel(w), "g array<double>, n long, loss double"
        ).collect()
        g = np.zeros(d)
        n = 0
        loss = 0.0
        for r in parts:
            g += np.array(r["g"])
            n += r["n"]
            loss += r["loss"]
        if n == 0:
            raise ValueError("no training rows")
        g = g / n + l2 * w
        w = w - lr * g
        losses.append(loss / n)
    return w, losses


def score_expr(text_col: Column, weights) -> Column:
    """sigmoid(w . features) as one Catalyst expression — the serving /
    oracle-twin path for a trained or pinned model."""
    cols = feature_cols(text_col)
    z = F.lit(0.0)
    for wi, c in zip(weights, cols):
        z = z + F.lit(float(wi)) * c
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_docs(
    docs: DataFrame, weights, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """(doc_id, score, keep) under a weight vector: the pipeline gate."""
    s = score_expr(F.col(text_col), weights)
    return docs.select(
        "doc_id",
        F.round(s, 4).alias("score"),
        (s >= threshold).cast("int").alias("keep"),
    )
