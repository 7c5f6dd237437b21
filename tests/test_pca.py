"""Tests for distributed PCA (operators/pca) — numpy parity on the same
data, orthonormality, sign canonicalization, projection invariants."""

from __future__ import annotations

import numpy as np

from m13_sparkstreaming_python_azure_spark.operators.pca import (
    pca_fit,
    pca_project,
)


def _vec_df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def _rng_data(n=200, d=6, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic: variance concentrated in two directions
    base = rng.randn(n, d) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rot, _ = np.linalg.qr(rng.randn(d, d))
    return base @ rot + rng.randn(d)


def test_fit_matches_numpy(spark):
    x = _rng_data()
    model = pca_fit(_vec_df(spark, x).repartition(5), "embedding", k=3)
    cov = np.cov(x, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(model.eigenvalues, evals, rtol=1e-8)
    assert np.isclose(model.total_variance, np.trace(cov))
    assert np.allclose(model.mean, x.mean(axis=0))


def test_components_orthonormal_and_canonical(spark):
    x = _rng_data(seed=11)
    model = pca_fit(_vec_df(spark, x), "embedding", k=4)
    gram = model.components @ model.components.T
    assert np.allclose(gram, np.eye(4), atol=1e-10)
    for row in model.components:
        assert row[int(np.argmax(np.abs(row)))] > 0  # canonical sign


def test_projection_variance_equals_eigenvalues(spark):
    x = _rng_data(seed=3)
    df = _vec_df(spark, x).repartition(4)
    model = pca_fit(df, "embedding", k=2)
    proj = np.stack(
        [
            r["proj"]
            for r in pca_project(df, "embedding", model).collect()
        ]
    )
    assert proj.shape == (len(x), 2)
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-9)  # centered
    assert np.allclose(
        proj.var(axis=0, ddof=1), model.eigenvalues, rtol=1e-8
    )


def test_partitioning_invariance(spark):
    x = _rng_data(seed=19)
    m1 = pca_fit(_vec_df(spark, x).repartition(1), "embedding", k=2)
    m8 = pca_fit(_vec_df(spark, x).repartition(8), "embedding", k=2)
    # moment partials are exact up to float addition order; eigen results
    # must agree to tight tolerance regardless of partitioning
    assert np.allclose(m1.eigenvalues, m8.eigenvalues, rtol=1e-9)
    assert np.allclose(
        np.abs(m1.components), np.abs(m8.components), atol=1e-8
    )


def test_covariance_moments_reject_out_of_range_components(spark):
    """ADVICE r3 #4: the int64-overflow row bound assumes |x| <= 1 after
    quantization; unnormalized embeddings must fail loudly, not wrap the
    integer partials into a silently-wrong covariance."""
    import pytest

    from m13_sparkstreaming_python_azure_spark.operators.pca import (
        covariance_int_moments,
    )

    ok = spark.createDataFrame(
        [(i, [0.5, -0.25, 1.0]) for i in range(10)],
        "id long, embedding array<double>",
    )
    n, s, o = covariance_int_moments(ok, "embedding")
    assert n == 10
    bad = spark.createDataFrame(
        [(0, [0.5, 3.75, 0.0])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="exceeds"):
        covariance_int_moments(bad, "embedding")
