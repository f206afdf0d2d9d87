"""Solver convergence tests, mirroring ``src/solver/test_solver.hh:98-170``.

The fast tier runs the same gates at reduced scale (64^2, 4 levels) to keep the
suite quick; ``MGMC_THOROUGH=1`` adds the reference-scale gates - 256^2
posterior, 5 levels, MG-preconditioned Richardson (SSOR, V-cycle) to rtol 1e-13
within 100 iterations (``test_solver.hh:25-26,129-137``) and the band ("sparse")
Cholesky direct solve at 256^2."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

THOROUGH = os.environ.get("MGMC_THOROUGH", "0") == "1"

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fem
from multigridmc_tpu.solvers.cholesky import BandCholeskySolver, DenseCholeskySolver
from multigridmc_tpu.solvers.loop import CGSolver, IterativeSolverParameters, LoopSolver
from multigridmc_tpu.solvers.multigrid import MultigridPreconditioner


def make_operators(nx=64):
    lattice = Lattice((nx, nx))
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
def test_dense_cholesky_solver(op):
    """cf. test_solver.hh: Cholesky solve error <= 1e-11."""
    rng = np.random.default_rng(1)
    x_exact = jnp.asarray(rng.normal(size=op.vshape))
    b = op.apply(x_exact)
    solver = DenseCholeskySolver(op)
    x = solver.apply(b)
    err = np.linalg.norm(np.asarray(x - x_exact)) / np.linalg.norm(np.asarray(x_exact))
    assert err < 1e-11


@pytest.mark.parametrize("op", [PRIOR, POSTERIOR], ids=["prior", "posterior"])
@pytest.mark.parametrize("cycle", [1, 2], ids=["V", "W"])
def test_multigrid_richardson(op, cycle):
    """MG-preconditioned Richardson reaches rtol 1e-13 within 100 iterations
    (test_solver.hh:129-137: 5 levels, SSOR smoothing)."""
    precond = MultigridPreconditioner(
        op, nlevel=4, smoother="SSOR", npresmooth=1, npostsmooth=1, omega=1.0, cycle=cycle
    )
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=op.vshape))
    solver = LoopSolver(
        op, precond, IterativeSolverParameters(rtol=1e-13, atol=1e-9, maxiter=100)
    )
    result = solver.solve(b)
    assert result.converged, f"MG solver did not converge: ||r||={result.rnorm}"
    # contraction factor should be multigrid-like (measure before the f64 floor;
    # the near-exact measurements make the posterior legitimately harder)
    hist = result.rnorm_history
    rates = [hist[k + 1] / hist[k] for k in range(1, min(len(hist) - 1, 8))]
    assert np.median(rates) < 0.7


@pytest.mark.parametrize("op", [PRIOR, POSTERIOR], ids=["prior", "posterior"])
def test_multigrid_cg(op):
    """MG-preconditioned CG converges (faster than Richardson)."""
    precond = MultigridPreconditioner(op, nlevel=4, smoother="SSOR")
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=op.vshape))
    solver = CGSolver(op, precond, IterativeSolverParameters(rtol=1e-12, atol=1e-8, maxiter=50))
    result = solver.solve(b)
    assert result.converged
    x_direct = DenseCholeskySolver(op).apply(b)
    err = np.linalg.norm(np.asarray(result.x - x_direct)) / np.linalg.norm(np.asarray(x_direct))
    assert err < 1e-9


def test_loop_solver_jit_matches_host():
    op = PRIOR
    precond = MultigridPreconditioner(op, nlevel=3, smoother="SOR")
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.normal(size=op.vshape))
    params = IterativeSolverParameters(rtol=1e-12, atol=1e-8, maxiter=100)
    host = LoopSolver(op, precond, params).solve(b)
    dev = LoopSolver(op, precond, params).solve_jit(b)
    assert host.converged and dev.converged
    np.testing.assert_allclose(np.asarray(host.x), np.asarray(dev.x), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("op", [PRIOR, POSTERIOR], ids=["prior", "posterior"])
def test_band_cholesky_solver(op):
    """Band ("sparse") direct solve matches the dense one to ~1e-11."""
    rng = np.random.default_rng(6)
    x_exact = jnp.asarray(rng.normal(size=op.vshape))
    b = op.apply(x_exact)
    solver = BandCholeskySolver(op)
    x = solver.apply(b)
    err = np.linalg.norm(np.asarray(x - x_exact)) / np.linalg.norm(np.asarray(x_exact))
    assert err < 1e-11


@pytest.mark.skipif(not THOROUGH, reason="reference-scale gate (MGMC_THOROUGH=1)")
@pytest.mark.parametrize("which", ["prior", "posterior"])
def test_multigrid_richardson_reference_scale(which):
    """The reference gate at full scale (``test_solver.hh:25-26,129-137``):
    256^2 FEM posterior, 5 levels, SSOR V-cycle, rtol 1e-13 within 100 iters."""
    prior, posterior = make_operators(nx=256)
    op = prior if which == "prior" else posterior
    precond = MultigridPreconditioner(
        op, nlevel=5, smoother="SSOR", npresmooth=1, npostsmooth=1, omega=1.0, cycle=1
    )
    rng = np.random.default_rng(12)
    b = jnp.asarray(rng.normal(size=op.vshape))
    solver = LoopSolver(
        op, precond, IterativeSolverParameters(rtol=1e-13, atol=1e-9, maxiter=100)
    )
    result = solver.solve_jit(b)
    assert result.converged, f"MG solver did not converge: ||r||={result.rnorm}"


@pytest.mark.skipif(not THOROUGH, reason="reference-scale gate (MGMC_THOROUGH=1)")
def test_band_cholesky_solver_reference_scale():
    """Direct ("sparse") solve at the reference's 256^2 solver scale
    (``test_solver.hh:98-115`` uses CholMod; here the exact band factor)."""
    prior, posterior = make_operators(nx=256)
    rng = np.random.default_rng(13)
    x_exact = jnp.asarray(rng.normal(size=posterior.vshape))
    b = posterior.apply(x_exact)
    x = BandCholeskySolver(posterior).apply(b)
    err = np.linalg.norm(np.asarray(x - x_exact)) / np.linalg.norm(np.asarray(x_exact))
    assert err < 1e-11


def test_dense_cholesky_solver_batched_rhs():
    """Batched right-hand sides solve identically to per-rhs solves (the MG
    preconditioner's coarse level sees batched rhs when solving many systems)."""
    op = PRIOR
    solver = DenseCholeskySolver(op)
    rng = np.random.default_rng(8)
    B = jnp.asarray(rng.normal(size=(5,) + op.vshape))
    X = solver.apply(B)
    assert X.shape == B.shape
    for k in range(5):
        np.testing.assert_allclose(
            np.asarray(X[k]), np.asarray(solver.apply(B[k])), rtol=1e-11, atol=1e-12
        )


def test_multigrid_preconditioner_batched_rhs():
    op = PRIOR
    pre = MultigridPreconditioner(op, nlevel=3, smoother="SSOR")
    rng = np.random.default_rng(9)
    B = jnp.asarray(rng.normal(size=(3,) + op.vshape))
    X = pre.apply(B)
    assert X.shape == B.shape
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(X[k]), np.asarray(pre.apply(B[k])), rtol=1e-10, atol=1e-11
        )
