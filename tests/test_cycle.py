"""Full-cycle explicit-halo distributed MGMC tests (parallel/cycle.py).

Three-layer validation of the production multi-chip path:

1. deterministic mode (noise off) against the single-device
   MultigridPreconditioner on the unpadded operator - exact up to fp roundoff,
   proving the padded layout, halo exchange, psum Woodbury, restriction,
   prolongation, and agglomerated coarse solve all match;
2. bitwise-trajectory equivalence between a 1-device mesh and an 8-device
   (2 chains x 2 x 2 lattice) mesh in "global" noise mode - proving the
   distributed execution is numerically identical to the replicated one;
3. statistical mean/covariance oracle vs the dense inverse in "sharded"
   (production per-shard PRNG) mode - proving the distributed sampler targets
   the exact posterior (test_sampler.hh:113-153 oracle).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import PeriodicCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fd, shiftedlaplace_fem
from multigridmc_tpu.parallel.cycle import (
    ShardedMGMCSampler,
    pad_field,
    unpad_field,
)
from multigridmc_tpu.solvers.multigrid import MultigridPreconditioner


def make_posterior(nx=16, fem=False):
    lattice = Lattice((nx, nx))
    model = PeriodicCorrelationLengthModel(Lambda_min=1.2, Lambda_max=2.3)
    prior = (shiftedlaplace_fem if fem else shiftedlaplace_fd)(lattice, model)
    rng = np.random.default_rng(1212417)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.2, 0.8, size=(4, 2)),
        mean=np.zeros(4),
        variance=1.0 + 2.0 * rng.uniform(size=4),
    )
    return measured_operator(prior, params)


def lattice_mesh_2d(ly, lx, chains=None):
    n = ly * lx * (chains or 1)
    devs = np.asarray(jax.devices()[:n])
    if chains:
        return Mesh(devs.reshape(chains, ly, lx), ("chains", "ly", "lx"))
    return Mesh(devs.reshape(ly, lx), ("ly", "lx"))


@pytest.mark.parametrize("fem", [False, True], ids=["fd5pt", "fem9pt"])
@pytest.mark.parametrize("cycle", [1, 2], ids=["V", "W"])
def test_deterministic_cycle_matches_preconditioner(fem, cycle):
    """Sharded deterministic cycle == single-device MultigridPreconditioner."""
    op = make_posterior(nx=16, fem=fem)
    mesh = lattice_mesh_2d(2, 2)
    sh = ShardedMGMCSampler(
        op, nlevel=3, mesh=mesh, smoother="SOR", cycle=cycle,
        agglomerate_below=4, deterministic=True,
    )
    ref = MultigridPreconditioner(op, nlevel=3, smoother="SOR", cycle=cycle)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=op.vshape))
    bp = pad_field(b, op.vshape)
    xp = jnp.zeros_like(bp)
    out = sh.apply(jax.random.PRNGKey(0), bp, xp)
    out_valid = unpad_field(out, op.vshape)
    expected = ref.apply(b)
    np.testing.assert_allclose(
        np.asarray(out_valid), np.asarray(expected), rtol=1e-11, atol=1e-12
    )
    # padding stays exactly zero
    pad_mask = np.ones(tuple(m + 1 for m in op.vshape), dtype=bool)
    pad_mask[tuple(slice(0, m) for m in op.vshape)] = False
    assert float(jnp.abs(jnp.asarray(np.asarray(out)[..., pad_mask])).max()) == 0.0


def test_global_noise_mesh_equivalence():
    """Identical trajectories on a 1-device mesh and an 8-device composite
    chains x lattice mesh under 'global' noise (the dryrun_multichip assert)."""
    op = make_posterior(nx=16)
    kwargs = dict(
        nlevel=3, smoother="SOR", cycle=2, agglomerate_below=4,
        noise_mode="global",
    )
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), ("chains", "ly", "lx"))
    mesh8 = lattice_mesh_2d(2, 2, chains=2)
    s1 = ShardedMGMCSampler(op, mesh=mesh1, **kwargs)
    s8 = ShardedMGMCSampler(op, mesh=mesh8, **kwargs)

    rng = np.random.default_rng(4)
    nchains = 4
    f = pad_field(jnp.asarray(rng.normal(size=op.vshape)), op.vshape)
    x = pad_field(
        jnp.asarray(rng.normal(size=(nchains,) + op.vshape)), op.vshape
    )
    key = jax.random.PRNGKey(7)
    y1, y8 = x, x
    for step in range(3):
        k = jax.random.fold_in(key, step)
        y1 = s1.apply(k, f, y1)
        y8 = s8.apply(k, f, y8)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y8), rtol=1e-10, atol=1e-11
    )


def test_sharded_sampler_statistics():
    """Production mode (per-shard PRNG): chain mean vs Q^{-1} f and sample
    covariance vs Q^{-1} on the full 8-device mesh."""
    op = make_posterior(nx=8)
    mesh = lattice_mesh_2d(2, 2, chains=2)
    sampler = ShardedMGMCSampler(
        op, nlevel=2, mesh=mesh, smoother="SSOR", cycle=1,
        agglomerate_below=2, noise_mode="sharded",
    )
    n = op.lattice.nvertex
    rng = np.random.default_rng(1342517)
    mean_exact = rng.uniform(size=n)
    Q = op.to_dense()
    f = jnp.asarray((Q @ mean_exact).reshape(op.lattice.vshape))
    cov_exact = np.linalg.inv(Q)

    fp = pad_field(f, op.vshape)
    nchains, nwarmup, nsteps = 512, 25, 150
    x = jnp.zeros((nchains,) + tuple(m + 1 for m in op.vshape))
    key = jax.random.PRNGKey(99)

    vsel = np.ones(tuple(m + 1 for m in op.vshape), dtype=bool)
    vsel[-1, :] = False
    vsel[:, -1] = False

    sx = np.zeros(n)
    sxx = np.zeros((n, n))
    for i in range(nwarmup):
        x = sampler.apply(jax.random.fold_in(key, i), fp, x)
    for i in range(nsteps):
        x = sampler.apply(jax.random.fold_in(key, nwarmup + i), fp, x)
        xf = np.asarray(x)[:, vsel]
        sx += xf.sum(axis=0)
        sxx += xf.T @ xf
    total = nchains * nsteps
    Ex = sx / total
    cov = sxx / total - np.outer(Ex, Ex)
    em = np.max(np.abs(Ex - mean_exact))
    ec = np.max(np.abs(cov - cov_exact))
    assert em < 6e-3 and ec < 6e-3, (em, ec)
