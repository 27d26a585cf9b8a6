"""fit_pca / transform_pca vs exact numpy PCA on the same rows:
covariance-eigen parity, projection parity, whitening identity,
partitioning invariance, real embeddings table, validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.pca import fit_pca, transform_pca


def _data(seed=0, n=400, d=12):
    rng = np.random.RandomState(seed)
    # anisotropic: random linear map of iid gaussians + offset
    A = rng.randn(d, d) * np.linspace(3.0, 0.1, d)
    return rng.randn(n, d) @ A.T + rng.randn(d) * 5


def _df(spark, X, parts=None):
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id int, embedding array<double>",
    )
    return df.repartition(parts) if parts else df


def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evals[order], evecs[:, order].T


def test_fit_matches_numpy(spark):
    X = _data()
    m = fit_pca(_df(spark, X), d_out=5)
    mean, evals, W = _numpy_pca(X, 5)
    assert m.n == len(X)
    np.testing.assert_allclose(m.mean, mean, rtol=1e-10)
    np.testing.assert_allclose(m.eigvals, evals, rtol=1e-8)
    # eigenvectors equal up to sign; model fixes sign deterministically
    for i in range(5):
        dot = abs(float(W[i] @ m.components[i]))
        assert dot == pytest.approx(1.0, abs=1e-9)


def test_transform_matches_numpy_projection(spark):
    X = _data(seed=3, n=200, d=8)
    df = _df(spark, X)
    m = fit_pca(df, d_out=4)
    out = {r.vec_id: np.asarray(r.pca) for r in transform_pca(df, m).collect()}
    want = (X - m.mean) @ m.components.T
    for i in range(len(X)):
        np.testing.assert_allclose(out[i], want[i], rtol=1e-9, atol=1e-9)


def test_whitening_unit_covariance(spark):
    X = _data(seed=7, n=600, d=10)
    df = _df(spark, X)
    m = fit_pca(df, d_out=6)
    Y = np.array([
        r.pca for r in transform_pca(df, m, whiten=True).orderBy("vec_id").collect()
    ])
    cov = np.cov(Y, rowvar=False, ddof=1)
    np.testing.assert_allclose(cov, np.eye(6), atol=1e-6)


def test_partitioning_invariance(spark):
    X = _data(seed=11, n=300, d=6)
    m1 = fit_pca(_df(spark, X, parts=2), d_out=3)
    m2 = fit_pca(_df(spark, X, parts=17), d_out=3)
    np.testing.assert_allclose(m1.mean, m2.mean, rtol=1e-12)
    np.testing.assert_allclose(m1.eigvals, m2.eigvals, rtol=1e-9)
    np.testing.assert_allclose(m1.components, m2.components, rtol=1e-7, atol=1e-10)


def test_real_embeddings_table(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = fit_pca(emb, d_out=16)
    assert m.d == 64 and m.d_out == 16 and m.n == emb.count()
    assert np.all(np.diff(m.eigvals) <= 1e-12)  # descending
    out = transform_pca(emb.limit(50), m, whiten=True).collect()
    assert all(len(r.pca) == 16 for r in out)


def test_validation(spark):
    X = _data(n=10, d=4)
    df = _df(spark, X)
    with pytest.raises(ValueError):
        fit_pca(df, d_out=0)
    with pytest.raises(ValueError):
        fit_pca(df, d_out=5)
    one = _df(spark, X[:1])
    with pytest.raises(ValueError):
        fit_pca(one)
    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError):
        fit_pca(empty)
    nulls = spark.createDataFrame([(0, None)], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError):
        fit_pca(nulls)
