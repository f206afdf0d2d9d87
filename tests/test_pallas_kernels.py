"""Pallas fused-sweep kernel tests (interpret mode on CPU).

The fused kernel must implement the *same* colour-ordered splitting as the
pure-JAX sweep - verified exactly for the deterministic sweep, and statistically
(noise formula) for the stochastic one."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.prior import shiftedlaplace_fd, shiftedlaplace_fem
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.ops.kernels.sor_pallas import (
    fused_gibbs_sweep,
    fused_sor_sweep,
    supports,
)
from multigridmc_tpu.smoothers import FORWARD, SORSmoother, color_order, sor_sweep


def make_op(assemble=shiftedlaplace_fd, nx=16, dtype=jnp.float32):
    lat = Lattice((nx, nx))
    return assemble(lat, ConstantCorrelationLengthModel(0.2), dtype=dtype)


@pytest.mark.parametrize("assemble", [shiftedlaplace_fd, shiftedlaplace_fem])
@pytest.mark.parametrize("direction_rev", [False, True])
def test_fused_sweep_matches_pure_jax(assemble, direction_rev):
    op = make_op(assemble)
    coloring = coloring_for(op.offsets, op.vshape)
    order = tuple(reversed(range(coloring.n_colors))) if direction_rev else tuple(
        range(coloring.n_colors)
    )
    masks = jnp.asarray(coloring.masks(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32)
    omega = 0.9
    expected = sor_sweep(op, masks, omega, order, b, x)
    out = fused_sor_sweep(
        op.coeffs, b, x,
        offsets=op.offsets, diag_index=op.diag_index, omega=omega, order=order,
        color_weights=coloring.weights, n_colors=coloring.n_colors, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_seed has no CPU interpret support; validated on TPU "
    "via native/validate_pallas_tpu.py",
)
def test_fused_gibbs_sweep_noise_statistics():
    """Mean over many stochastic sweeps from a fixed state matches the
    deterministic sweep applied to f (noise has zero mean), and the injected
    noise has the right per-site variance."""
    op = make_op(nx=8)
    coloring = coloring_for(op.offsets, op.vshape)
    order = color_order(coloring.n_colors, FORWARD)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32)
    x0 = jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32)
    omega = 1.0
    masks = jnp.asarray(coloring.masks(), dtype=jnp.float32)

    nrep = 600
    acc = np.zeros(op.vshape)
    for k in range(nrep):
        out = fused_gibbs_sweep(
            k + 1, op.coeffs, f, x0,
            offsets=op.offsets, diag_index=op.diag_index, omega=omega, order=order,
            color_weights=coloring.weights, n_colors=coloring.n_colors, interpret=False,
        )
        acc += np.asarray(out)
    mean_sweep = acc / nrep
    det = np.asarray(sor_sweep(op, masks, omega, order, f, x0))
    # E[sweep] = deterministic sweep since noise is zero-mean and enters linearly
    err = np.max(np.abs(mean_sweep - det))
    # per-site std of one sweep output is O(1/sqrt(diag)); nrep=600 gives ~4% MC error
    scale = float(np.max(1.0 / np.sqrt(np.asarray(op.diag_stencil()))))
    assert err < 6.0 * scale / np.sqrt(nrep), (err, scale)


def test_supports_policy():
    op = make_op(nx=64)
    assert supports(op.vshape, jnp.float32, len(op.offsets), 1)
    assert not supports(op.vshape, jnp.float64, len(op.offsets), 1)
    assert not supports((4095, 4095), jnp.float32, 9, 1)
    assert not supports((63,), jnp.float32, 3, 1)


def test_smoother_pallas_integration_interpret(monkeypatch):
    """SORSmoother routes batched sweeps through the fused v2 kernel under
    MGMC_PALLAS_INTERPRET and the result matches the pure-JAX smoother;
    single-chain sweeps stay on the XLA path."""
    monkeypatch.setenv("MGMC_PALLAS", "1")
    monkeypatch.setenv("MGMC_PALLAS_INTERPRET", "1")
    op = make_op(nx=64)
    sm_pallas = SORSmoother(op, omega=1.0)
    assert sm_pallas.use_pallas_batched
    monkeypatch.setenv("MGMC_PALLAS", "0")
    sm_ref = SORSmoother(op, omega=1.0)
    assert not sm_ref.use_pallas_batched
    rng = np.random.default_rng(2)
    C = 3
    b = jnp.asarray(rng.normal(size=(C,) + op.vshape), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sm_pallas.apply(b, x)), np.asarray(sm_ref.apply(b, x)),
        rtol=2e-5, atol=2e-5,
    )
    # unbatched rhs broadcasting over a 2d chain batch (the MG-solver shape)
    x2 = jnp.asarray(rng.normal(size=(2, 2) + op.vshape), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sm_pallas.apply(b[0], x2)), np.asarray(sm_ref.apply(b[0], x2)),
        rtol=2e-5, atol=2e-5,
    )


def test_fused_batched_sweep_matches_single(monkeypatch):
    """Batched fused sweep (grid over chains) equals per-chain single-tile sweeps."""
    from multigridmc_tpu.ops.kernels.sor_pallas import fused_sor_sweep_batched

    op = make_op(shiftedlaplace_fd, nx=16)
    coloring = coloring_for(op.offsets, op.vshape)
    order = tuple(range(coloring.n_colors))
    rng = np.random.default_rng(3)
    C = 8  # exercises multi-chain blocks (pick_block_chains -> 8 or 4)
    b = jnp.asarray(rng.normal(size=(C,) + op.vshape), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), dtype=jnp.float32)
    out = fused_sor_sweep_batched(
        op.coeffs, b, x,
        offsets=op.offsets, diag_index=op.diag_index, omega=1.0, order=order,
        color_weights=coloring.weights, n_colors=coloring.n_colors, interpret=True,
    )
    for c in range(C):
        single = fused_sor_sweep(
            op.coeffs, b[c], x[c],
            offsets=op.offsets, diag_index=op.diag_index, omega=1.0, order=order,
            color_weights=coloring.weights, n_colors=coloring.n_colors, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out[c]), np.asarray(single), rtol=1e-6, atol=1e-6)
