"""On-TPU validation of the chains-data-parallel path with the full
single-chip engine active (fused level-visit Pallas kernels + distilled
subtree) inside shard_map.

The CPU test suite can only exercise the deterministic kernel path (the
on-chip PRNG has no CPU lowering); this script runs the REAL stochastic
kernels under a chains mesh on hardware and gates the sampler moments
against the exact dense posterior:

    64x64 posterior (8 near-exact measurements), 4-level W-cycle SOR MGMC,
    DataParallelMGMCSampler on a 1d chains mesh over all available devices
    (1 device behind the axon tunnel - the shard_map-wrapped pallas_call
    lowering is what hardware must prove; N>1 chips shard the same program).

Run as the sole TPU client.  Expected: all gates PASS.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import (
        MeasurementParameters,
        measured_operator,
    )
    from multigridmc_tpu.models.prior import shiftedlaplace_fd
    from multigridmc_tpu.parallel.data_parallel import (
        DataParallelMGMCSampler,
        chains_mesh,
    )
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    nx, nlevel, nchains = 64, 4, 256
    with jax.default_device(jax.devices("cpu")[0]):
        lattice = Lattice((nx, nx))
        prior = shiftedlaplace_fd(
            lattice, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32
        )
        rng = np.random.default_rng(20260818)
        params = MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
            mean=rng.normal(size=8),
            variance=1e-4 * (1.0 + rng.uniform(size=8)),
        )
        op = measured_operator(prior, params)
        mesh = chains_mesh()
        dp = DataParallelMGMCSampler(
            op, nlevel=nlevel, mesh=mesh, fused=True, distill=True,
            fused_min_vertices=2000, smoother="SOR", cycle=2,
        )
    print(f"mesh: {dict(mesh.shape)}  fused levels: {sorted(dp.sampler.fused_levels)}"
          f"  distill level: {dp.sampler.distill_level}")
    assert dp.sampler.fused_levels, "fused kernels must be active"
    assert dp.sampler.distilled is not None, "distilled subtree must be active"

    # exact posterior moments (float64, host)
    Q = op.to_dense()
    cov = np.linalg.inv(Q)
    mean_exact = rng.normal(size=Q.shape[0])
    f = jnp.asarray((Q @ mean_exact).reshape(op.vshape), jnp.float32)
    n = Q.shape[0]

    # zero-mean protocol (BASELINE.md protocol B): sample fluctuations, the
    # covariance is the gated quantity; plus the direct-mean A protocol check.
    # Accumulate per-chunk in f32 on device (HIGHEST-precision MXU), sum the
    # chunks in float64 on host (x64 stays off for the production sampler).
    nwarm, chunk, nchunks = 60, 100, 8
    x = jnp.zeros((nchains,) + op.vshape, jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def chain(x, key):
        def step(carry, i):
            x, sx, sxx = carry
            x = dp.apply(jax.random.fold_in(key, i), f, x)
            xf = x.reshape(nchains, n)
            sxx = sxx + jax.lax.dot_general(
                xf, xf, (((0,), (0,)), ((), ())), precision=hi)
            return (x, sx + xf.sum(0), sxx), 0.0

        (x, sx, sxx), _ = jax.lax.scan(
            step,
            (x, jnp.zeros((n,), jnp.float32), jnp.zeros((n, n), jnp.float32)),
            jnp.arange(chunk),
        )
        return x, sx, sxx

    @jax.jit
    def warm(x, key):
        def body(i, x):
            return dp.apply(jax.random.fold_in(key, i), f, x)
        return jax.lax.fori_loop(0, nwarm, body, x)

    x = warm(x, sampling_key(1))
    sx64 = np.zeros(n)
    sxx64 = np.zeros((n, n))
    for ci in range(nchunks):
        x, sx, sxx = chain(x, sampling_key(2 + ci))
        sx64 += np.asarray(sx, np.float64)
        sxx64 += np.asarray(sxx, np.float64)
    nsteps = chunk * nchunks
    total = nchains * nsteps
    Ex = sx64 / total
    cov_emp = sxx64 / total - np.outer(Ex, Ex)

    sd = np.sqrt(np.diag(cov))
    mean_err = np.max(np.abs(Ex - mean_exact))
    # f32 protocol A carries the known systematic mean bias (BASELINE.md);
    # gate it loosely and gate the covariance (the quantity MGMC samples) hard
    var_rel = np.abs(np.diag(cov_emp) - np.diag(cov)) / np.max(np.diag(cov))
    cov_err = np.max(np.abs(cov_emp - cov)) / np.max(np.abs(cov))
    stat_band = 6.0 / np.sqrt(total / 10.0)  # ~tau-inflated MC band
    print(f"samples: {total}  mean_err: {mean_err:.3e}  "
          f"max var rel err: {np.max(var_rel):.3e}  cov rel err: {cov_err:.3e}"
          f"  (band ~{stat_band:.3e})")
    ok = True
    if not mean_err < 50 * np.max(sd) / np.sqrt(total / 10.0) + 5e-2:
        print("FAIL: mean")
        ok = False
    if not cov_err < stat_band:
        print("FAIL: covariance")
        ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
