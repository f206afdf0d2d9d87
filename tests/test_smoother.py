"""Smoother fixed-point/invariance tests, mirroring
``src/smoother/test_smoother.hh:90-114``: an SOR/SSOR sweep leaves the exact
solution of A x = b invariant to ~1e-12, with and without the low-rank update
(32^2 FEM prior + 10 random measurements fixture, ``test_smoother.hh:18-69``),
plus splitting-identity checks of the colour-ordered machinery."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fem
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import (
    BACKWARD,
    FORWARD,
    SORSmoother,
    SSORSmoother,
    color_order,
    splitting_solve,
)


def make_operators():
    lattice = Lattice((32, 32))
    prior = shiftedlaplace_fem(lattice, ConstantCorrelationLengthModel(Lambda=0.2))
    rng = np.random.default_rng(2151517)
    n_meas = 10
    params = MeasurementParameters(
        measurement_locations=rng.uniform(size=(n_meas, 2)),
        mean=rng.normal(size=n_meas),
        variance=0.1 * (1.0 + rng.uniform(size=n_meas)),
    )
    posterior = measured_operator(prior, params)
    return prior, posterior


PRIOR, POSTERIOR = make_operators()


@pytest.mark.parametrize("op", [PRIOR, POSTERIOR], ids=["prior", "posterior"])
@pytest.mark.parametrize("smoother_cls", [SSORSmoother])
def test_fixed_point_invariance(op, smoother_cls):
    """The exact solution of A x = b is a fixed point of the sweep
    (test_smoother.hh:90-114, tolerance 1e-12)."""
    rng = np.random.default_rng(42)
    x_exact = jnp.asarray(rng.normal(size=op.vshape))
    b = op.apply(x_exact)
    smoother = smoother_cls(op, omega=0.8)
    x = smoother.apply(b, x_exact)
    err = np.linalg.norm(np.asarray(x - x_exact)) / np.linalg.norm(np.asarray(x_exact))
    assert err < 1e-12


@pytest.mark.parametrize("direction", [FORWARD, BACKWARD])
def test_fixed_point_invariance_sor(direction):
    rng = np.random.default_rng(7)
    op = POSTERIOR
    x_exact = jnp.asarray(rng.normal(size=op.vshape))
    b = op.apply(x_exact)
    smoother = SORSmoother(op, omega=1.0, direction=direction)
    x = smoother.apply(b, x_exact)
    err = np.linalg.norm(np.asarray(x - x_exact)) / np.linalg.norm(np.asarray(x_exact))
    assert err < 1e-12


def test_splitting_solve_is_exact():
    """Colour-ordered forward substitution solves (L_c + D/omega) y = v exactly.

    Verified against a dense construction of the colour-ordered splitting matrix.
    """
    lat = Lattice((8, 8))
    op = shiftedlaplace_fem(lat, ConstantCorrelationLengthModel(Lambda=0.4))
    omega = 0.9
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks())
    order = color_order(coloring.n_colors, FORWARD)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=op.vshape))
    y = splitting_solve(op, masks, omega, order, v)
    # dense check: M = D/omega + strict lower part in colour order
    A = op.to_dense_stencil()
    colors = coloring.field.reshape(-1)
    n = A.shape[0]
    M = np.diag(np.diag(A)) / omega
    for i in range(n):
        for j in range(n):
            if i != j and colors[j] < colors[i]:
                M[i, j] = A[i, j]
    y_dense = np.linalg.solve(M, np.asarray(v).reshape(-1))
    np.testing.assert_allclose(np.asarray(y).reshape(-1), y_dense, rtol=1e-11, atol=1e-12)


def test_sor_sweep_matches_dense_colored_sor():
    """One multi-colour SOR sweep equals the dense splitting iteration
    x' = x + M^{-1}(b - A x) with M = D/omega + L_c."""
    lat = Lattice((8, 6))
    op = shiftedlaplace_fem(lat, ConstantCorrelationLengthModel(Lambda=0.4))
    omega = 1.2
    smoother = SORSmoother(op, omega=omega, direction=FORWARD)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.normal(size=op.vshape))
    b = jnp.asarray(rng.normal(size=op.vshape))
    x1 = smoother.apply(b, x0)
    A = op.to_dense_stencil()
    colors = smoother.coloring.field.reshape(-1)
    n = A.shape[0]
    M = np.diag(np.diag(A)) / omega
    for i in range(n):
        for j in range(n):
            if i != j and colors[j] < colors[i]:
                M[i, j] = A[i, j]
    x0f = np.asarray(x0).reshape(-1)
    bf = np.asarray(b).reshape(-1)
    x1_dense = x0f + np.linalg.solve(M, bf - A @ x0f)
    np.testing.assert_allclose(np.asarray(x1).reshape(-1), x1_dense, rtol=1e-11, atol=1e-12)


def test_batched_smoother():
    op = POSTERIOR
    smoother = SSORSmoother(op, omega=1.0)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(4,) + op.vshape))
    b = jnp.asarray(rng.normal(size=(4,) + op.vshape))
    out = smoother.apply(b, x)
    assert out.shape == x.shape
    single = smoother.apply(b[1], x[1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), rtol=1e-12, atol=1e-13)
