"""Chains-data-parallel execution (parallel/data_parallel.py).

Three gates:

1. the fused level-visit Pallas kernels execute correctly *inside shard_map*
   over a multi-device mesh (deterministic data path, interpret mode - the
   stochastic kernels' on-chip PRNG has no CPU lowering and is validated on
   TPU by native/validate_dp_tpu.py);
2. the DP sampler is a valid sampler: statistical mean/covariance gate
   (``test_sampler.hh:113-153``) across 8 shards with per-shard key streams;
3. per-shard streams are independent and the wrapper is deterministic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fd
from multigridmc_tpu.parallel.data_parallel import DataParallelMGMCSampler, chains_mesh
from multigridmc_tpu.solvers.multigrid import MultigridPreconditioner

from test_sampler import make_posterior_2d, mean_covariance_error, tier


def _posterior_f32(nx=24):
    lattice = Lattice((nx, nx))
    prior = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.3),
                              dtype=jnp.float32)
    rng = np.random.default_rng(5)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.1, 0.9, size=(4, 2)),
        mean=rng.normal(size=4),
        variance=0.5 + rng.uniform(size=4),  # O(1): f32 exactness comparison
    )
    return measured_operator(prior, params)


def test_fused_visits_inside_shard_map():
    """The fused kernels run per shard inside shard_map and reproduce the
    composed path: a multigrid preconditioner cycle with fused interpret
    kernels forced on, executed per-shard over an 8-device chains mesh,
    equals the unsharded composed cycle (deterministic data path)."""
    op = _posterior_f32()
    pc_fused = MultigridPreconditioner(
        op, nlevel=3, smoother="SOR", cycle=2,
        fused=True, fused_min_vertices=0, fused_interpret=True, distill=False,
    )
    assert pc_fused.fused_levels, "fused kernels did not activate under force"
    pc_ref = MultigridPreconditioner(op, nlevel=3, smoother="SOR", cycle=2,
                                     fused=False, distill=False)
    mesh = chains_mesh(8)
    vdim = 2
    spec = P("chains", *([None] * vdim))

    try:  # pallas_call inside shard_map needs vma checking off
        fn = shard_map(pc_fused.apply, mesh=mesh, in_specs=(spec,),
                       out_specs=spec, check_vma=False)
    except TypeError:  # older jax: check_rep
        fn = shard_map(pc_fused.apply, mesh=mesh, in_specs=(spec,),
                       out_specs=spec, check_rep=False)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(16,) + op.vshape), jnp.float32)
    out = jax.jit(fn)(b)
    exp = pc_ref.apply(b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)


def test_dp_sampler_deterministic_and_independent():
    op = _posterior_f32()
    mesh = chains_mesh(8)
    dp = DataParallelMGMCSampler(op, nlevel=3, mesh=mesh, fused=False,
                                 distill=True, cycle=2, smoother="SOR")
    assert dp.sampler.distilled is not None
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.zeros((16,) + op.vshape, jnp.float32)
    key = jax.random.PRNGKey(0)
    out = dp.apply(key, f, x)
    out2 = dp.apply(key, f, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    assert bool((out == out2).all()), "DP step not deterministic"
    # chains on different shards see different noise (per-shard fold)
    blocks = np.asarray(out).reshape(8, 2, -1)
    for i in range(1, 8):
        assert np.max(np.abs(blocks[0] - blocks[i])) > 1e-3
    # wrong chain count is rejected
    with pytest.raises(ValueError):
        dp.apply(key, f, jnp.zeros((9,) + op.vshape, jnp.float32))


def test_dp_sampler_statistical_gate():
    """The DP sampler passes the reference mean/covariance oracle: 8 shards x
    chains with per-shard independent streams and the distilled subtree
    active per shard (fused kernels off on CPU - no PRNG lowering)."""
    op = make_posterior_2d(8)
    mesh = chains_mesh(8)
    dp = DataParallelMGMCSampler(
        op, nlevel=3, mesh=mesh, fused=False, distill=True,
        smoother="SSOR", cycle=2,
    )
    nchains, nsteps, tol = tier(1024, 400, 4e-3)
    em, ec = mean_covariance_error(op, dp, nchains=nchains, nwarmup=20,
                                   nsteps=nsteps)
    assert em < tol and ec < tol, (em, ec)
