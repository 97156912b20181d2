"""Distributed PCA tests: parity with a numpy reference, invariants."""

import numpy as np
import pytest
from pyspark.sql import Row

from tokenkit_spark.ops import pca


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    # anisotropic cloud: 3 dominant directions out of 12
    basis = rng.normal(size=(12, 12))
    scales = np.array([10, 6, 3] + [0.3] * 9)
    return rng.normal(size=(300, 12)) * scales @ basis.T


@pytest.fixture(scope="module")
def emb(spark, data):
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(data)]
    return spark.createDataFrame(rows).cache()


def test_train_matches_numpy_reference(spark, emb, data):
    m = pca.train_pca(emb, n_components=3)
    cov = np.cov(data, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    np.testing.assert_allclose(m.explained_variance, vals[order], rtol=1e-8)
    # components equal up to sign; compare |dot| ~ 1 per column
    ref = vecs[:, order]
    dots = np.abs(np.sum(m.components * ref, axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)
    assert m.components.shape == (12, 3)
    # orthonormal
    np.testing.assert_allclose(m.components.T @ m.components, np.eye(3), atol=1e-10)


def test_projection_matches_numpy(spark, emb, data):
    m = pca.train_pca(emb, n_components=3)
    got = {r.vec_id: np.array(r.reduced) for r in pca.project_embeddings(emb, m).collect()}
    want = (data - m.mean) @ m.components
    for i in range(0, 300, 37):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-8, atol=1e-10)


def test_variance_capture_and_partition_stability(spark, emb, data):
    m = pca.train_pca(emb, n_components=3)
    total_var = np.trace(np.cov(data, rowvar=False))
    assert m.explained_variance.sum() / total_var > 0.9  # 3 dominant dirs
    m2 = pca.train_pca(emb.repartition(7), n_components=3)
    np.testing.assert_allclose(
        np.abs(np.sum(m.components * m2.components, axis=0)), 1.0, atol=1e-6
    )


def test_train_validation(spark, emb):
    with pytest.raises(ValueError):
        pca.train_pca(emb, n_components=0)
    with pytest.raises(ValueError):
        pca.train_pca(emb, n_components=13)
    one = emb.limit(1)
    with pytest.raises(ValueError):
        pca.train_pca(one, n_components=2)
