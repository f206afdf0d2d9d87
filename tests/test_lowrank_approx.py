"""Pivoted-Cholesky low-rank approximation tests, mirroring the study in
``python/pivoted_cholesky.py``: factorisations reproduce the matrix, the
pivoted variant converges on smooth covariance matrices, truncated SVD is the
lower bound."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigridmc_tpu.ops.lowrank_approx import (
    cholesky_crout,
    cholesky_crout_ldlt,
    pivoted_cholesky,
    truncated_svd_error,
)


def make_covariance(n=12, Lambda=0.2):
    """Smooth 2d covariance 1/(Lambda^2 + d^2) (cf. ``pivoted_cholesky.py:52-67``)."""
    h = 1.0 / n
    idx = np.arange(n)
    j1, j2, k1, k2 = np.meshgrid(idx, idx, idx, idx, indexing="ij")
    dsq = h * h * ((j1 - k1) ** 2 + (j2 - k2) ** 2)
    A = 1.0 / (Lambda**2 + dsq)
    return A.transpose(0, 1, 2, 3).reshape(n * n, n * n)


def test_cholesky_crout_matches_numpy():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(20, 20))
    A = M @ M.T + 20 * np.eye(20)
    L = np.asarray(cholesky_crout(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-10, atol=1e-10)


def test_ldlt_reconstructs():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(15, 15))
    A = M @ M.T + 15 * np.eye(15)
    L, D = cholesky_crout_ldlt(jnp.asarray(A))
    L, D = np.asarray(L), np.asarray(D)
    np.testing.assert_allclose(L @ np.diag(D) @ L.T, A, rtol=1e-9, atol=1e-9)


def test_pivoted_cholesky_full_rank_reconstructs():
    rng = np.random.default_rng(2)
    M = rng.normal(size=(18, 18))
    A = M @ M.T + 18 * np.eye(18)
    L, rel = pivoted_cholesky(jnp.asarray(A), tolerance=0.0)
    np.testing.assert_allclose(L @ L.T, A, rtol=1e-8, atol=1e-8)
    assert rel[0] == 1.0 and rel[-1] < 1e-12


def test_pivoted_cholesky_low_rank_convergence():
    """On the smooth covariance the trace error decays with rank (the point of
    the Harbrecht et al. method; decay rate depends on Lambda as in the
    reference's relative_error.pdf study)."""
    A = make_covariance(n=10, Lambda=0.2)
    L, rel = pivoted_cholesky(jnp.asarray(A), tolerance=0.0, max_rank=60)
    assert rel[40] < 0.1 and rel[60] < 0.05
    # the greedy factor reproduces A on the selected subspace
    resid = np.abs(np.diag(A - L @ L.T)).sum() / np.abs(np.diag(A)).sum()
    np.testing.assert_allclose(resid, rel[60], rtol=1e-6, atol=1e-9)


def test_truncated_svd_error_decreases():
    A = make_covariance(n=8, Lambda=0.3)
    rel = truncated_svd_error(A)
    assert rel[0] == 1.0
    assert np.all(np.diff(rel) <= 1e-12)
    assert rel[30] < 0.05
