"""On-TPU statistical gate for the fused biharmonic (13-point) MGMC path.

The 5-colour fused visits now run the biharmonic stencil in production
(measured 1.70x over composed, BASELINE.md r5); the interpret-mode test
proves the deterministic data path, this script gates the STOCHASTIC
moments: 64^2 biharmonic posterior, fused visits forced at the small size,
mean/covariance vs the dense float64 inverse (the ``test_sampler.hh:113-153``
oracle).  Run as the sole TPU client.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

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
    from multigridmc_tpu.models.prior import squared_shiftedlaplace_fd
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    nx, nlevel, nchains, nwarm, nsteps = 64, 3, 256, 80, 800
    with jax.default_device(jax.devices("cpu")[0]):
        lattice = Lattice((nx, nx))
        prior = squared_shiftedlaplace_fd(
            lattice, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
        rng = np.random.default_rng(20260821)
        params = MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
            mean=rng.normal(size=8),
            variance=1e-2 * (1.0 + rng.uniform(size=8)),
        )
        op = measured_operator(prior, params)
        sampler = MultigridMCSampler(op, nlevel=nlevel, smoother="SOR",
                                     cycle=2, fused=True,
                                     fused_min_vertices=0, distill=False)
    assert sampler.fused_levels, "fused biharmonic visits must engage"
    print(f"fused levels: {sorted(sampler.fused_levels)}  n_colors: "
          f"{sampler.presamplers[0].smoother.coloring.n_colors}",
          file=sys.stderr, flush=True)

    n = op.lattice.nvertex
    Q = np.asarray(op.to_dense(), np.float64)
    cov_exact = np.linalg.inv(Q)
    mean_exact = rng.uniform(size=n)
    f = jnp.asarray((Q @ mean_exact).reshape(op.vshape), jnp.float32)

    # zero-mean protocol: the biharmonic posterior conditions ~1e9 in f32,
    # so sample the fluctuation and shift by the exact f64 mean (the
    # validated production protocol B, BASELINE.md round 1)
    fz = jnp.zeros_like(f)
    x = jnp.zeros((nchains,) + op.vshape, jnp.float32)
    key = sampling_key(31)

    @jax.jit
    def warm(x, key):
        def body(k, x):
            return sampler.apply(jax.random.fold_in(key, k), fz, x)

        return jax.lax.fori_loop(0, nwarm, body, x)

    @jax.jit
    def collect(x, key):
        def step(carry, k):
            x, sx, sxx = carry
            x = sampler.apply(jax.random.fold_in(key, k), fz, x)
            xf = x.reshape(nchains, n)
            return (x, sx + xf.sum(0), sxx + xf.T @ xf), 0.0

        (x, sx, sxx), _ = jax.lax.scan(
            step, (x, jnp.zeros((n,)), jnp.zeros((n, n))), jnp.arange(nsteps))
        return sx, sxx

    x = warm(x, jax.random.fold_in(key, 0))
    sx, sxx = collect(x, jax.random.fold_in(key, 1))
    total = nchains * nsteps
    Ex = np.asarray(sx, np.float64) / total
    cov = np.asarray(sxx, np.float64) / total - np.outer(Ex, Ex)
    em = float(np.max(np.abs(Ex)))  # zero-mean chain: E[e] = 0
    scale = float(np.max(np.abs(cov_exact)))
    ec = float(np.max(np.abs(cov - cov_exact)) / scale)
    band = 3.0 * np.sqrt(2.0 / total)  # ~3-sigma rel band, tau ~ 1
    print(f"samples {total}  |E[e]|_max {em:.3e}  cov rel err {ec:.3e}  "
          f"(band ~{band:.3e})", flush=True)
    ok = ec < max(2 * band, 3e-2) and em < 5e-2 * np.sqrt(scale)
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
