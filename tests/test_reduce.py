"""Tests for svd_project (V5-V7 analog) against NumPy SVD."""

import numpy as np
import pytest

from entity_resolver_spark.operators.reduce import svd_project


@pytest.fixture(scope="module")
def mat():
    rng = np.random.default_rng(7)
    # low-rank + noise so the spectrum is well-separated (stable test)
    base = rng.standard_normal((200, 4)) @ rng.standard_normal((4, 32))
    return base + 0.01 * rng.standard_normal((200, 32))


def _project(spark, mat, k, beta=0.0):
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "id long, vec array<double>",
    )
    out = svd_project(df, k=k, id_col="id", vec_col="vec", damping_beta=beta)
    got = {r["id"]: np.array(r["proj"]) for r in out.collect()}
    return np.stack([got[i] for i in range(len(mat))])


def test_svd_matches_numpy(spark, mat):
    k = 6
    P = _project(spark, mat, k)
    U, s, Vt = np.linalg.svd(mat, full_matrices=False)
    ref = U[:, :k] * s[:k]
    # singular values: column norms of the projection
    assert np.allclose(
        np.linalg.norm(P, axis=0), s[:k] * np.sqrt((U[:, :k] ** 2).sum(0)), rtol=1e-6
    )
    # projections agree up to per-component sign
    for j in range(k):
        c = np.dot(P[:, j], ref[:, j]) / (
            np.linalg.norm(P[:, j]) * np.linalg.norm(ref[:, j])
        )
        assert abs(abs(c) - 1.0) < 1e-6
    # pairwise geometry is sign-invariant: full Gram matrices match
    assert np.allclose(P @ P.T, ref @ ref.T, atol=1e-6 * np.abs(ref @ ref.T).max())


def test_svd_damping_rescales_spectrum(spark, mat):
    k = 4
    raw = _project(spark, mat, k, beta=0.0)
    damp = _project(spark, mat, k, beta=0.4)
    _, s, _ = np.linalg.svd(mat, full_matrices=False)
    ratios = np.linalg.norm(damp, axis=0) / np.linalg.norm(raw, axis=0)
    assert np.allclose(ratios, s[:k] ** (-0.4), rtol=1e-6)
