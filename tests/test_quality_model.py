"""Distributed logistic-regression quality classifier: gradient parity
vs numpy, convergence on the separable junk-vs-clean corpus, scoring
expression parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import quality_model as qm


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, f"the quick brown fox {i} jumps over the lazy dog value {i * 7}"))
        else:
            rows.append((i, "spam spam " * 12))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def feats(docs):
    corpus = qm.labeled_quality_corpus(docs)
    return qm.doc_features(corpus, label_expr=F.col("label")).cache()


def test_labeled_corpus_shape(docs):
    c = qm.labeled_quality_corpus(docs).collect()
    by_id = {r.doc_id: r for r in c}
    orig = {r.doc_id: r.text for r in docs.collect()}
    for i, r in by_id.items():
        assert r.label == (1.0 if i % 2 == 0 else 0.0)
        if i % 2 == 0:
            assert r.text == orig[i]
        else:
            assert r.text == (orig[i][:25] + " ") * 12


def test_one_iteration_matches_numpy_gradient(feats):
    rows = feats.collect()
    X = np.stack([r.features for r in rows])
    y = np.array([r.label for r in rows])
    lr = 0.7
    # one distributed step
    w1, _ = qm.train_logistic(feats, lr=lr, n_iters=1)
    # numpy step from w=0
    w0 = np.zeros(X.shape[1])
    p = 1.0 / (1.0 + np.exp(-X @ w0))
    want = w0 - lr * (X.T @ (p - y)) / len(y)
    assert np.allclose(w1, want, atol=1e-9)


def test_training_separates_junk(spark, docs, feats):
    w, losses = qm.train_logistic(feats, lr=0.5, n_iters=40)
    assert losses[-1] < losses[0]
    corpus = qm.labeled_quality_corpus(docs)
    scored = qm.score_docs(corpus, w)
    acc = (
        scored.join(corpus.select("doc_id", "label"), "doc_id")
        .select((F.col("keep") == F.col("label").cast("int")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95


def test_score_expr_matches_numpy(feats, docs):
    w = np.array([0.3, -1.0, 0.5, 0.0, 0.2, -0.1, 2.0])
    rows = feats.collect()
    X = np.stack([r.features for r in rows])
    want = {r.doc_id: 1.0 / (1.0 + np.exp(-(x @ w))) for r, x in zip(rows, X)}
    corpus = qm.labeled_quality_corpus(docs)
    got = {r.doc_id: r.score for r in qm.score_docs(corpus, w).collect()}
    for d, s in want.items():
        assert abs(got[d] - round(s, 4)) < 1e-9


def test_pinned_model_separates_sf_corpus(spark, sf_dir):
    from tokenkit_spark.ops.quality_pinned import WEIGHTS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = qm.labeled_quality_corpus(docs)
    scored = qm.score_docs(corpus, WEIGHTS)
    acc = (
        scored.join(corpus.select("doc_id", "label"), "doc_id")
        .select((F.col("keep") == F.col("label").cast("int")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    # trained at sf0.01; generalizes to the other SF corpora
    assert acc >= 0.97
