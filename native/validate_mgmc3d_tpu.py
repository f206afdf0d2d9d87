"""On-TPU statistical validation of the 3d MGMC configuration (64^3 posterior).

Zero-mean protocol: sample e ~ N(0, Q^-1) in float32 on TPU, compare the
variance of a point observation against the exact float64 value computed on
host via CG.  Run as the sole TPU client.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from native.bench_mgmc3d_tpu import NX, NLEVEL, CYCLE
    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import (
        MeasurementParameters,
        measured_operator,
        measurement_vector,
        observed_mean_and_variance,
    )
    from multigridmc_tpu.models.prior import shiftedlaplace_fd
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        lattice = Lattice((NX, NX, NX))
        prior = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
        rng = np.random.default_rng(7)
        params = MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(8, 3)),
            mean=rng.normal(2.0, 1.0, size=8),
            variance=1e-6 * (1.0 + rng.uniform(size=8)),
        )
        op = measured_operator(prior, params)
        sampler = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR", cycle=CYCLE)
    log("setup done")

    jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            op64 = jax.tree.map(
                lambda v: np.asarray(v, dtype=np.float64) if hasattr(v, "astype") else v, op
            )
            w = measurement_vector(lattice, np.array([0.5, 0.5, 0.5]), 0.0)
            _, z_var_exact = observed_mean_and_variance(
                op64, np.zeros(op.vshape), params.y(), w
            )
    finally:
        jax.config.update("jax_enable_x64", False)
    log(f"exact var = {z_var_exact:.6e}")

    wj = jnp.asarray(w, dtype=jnp.float32)
    dev = jax.devices()[0]
    import os

    nchains, nwarmup = 32, 30
    nsteps = int(os.environ.get("MGMC_VALIDATE3D_NSTEPS", "300"))
    f = jax.device_put(jnp.zeros(op.vshape, dtype=jnp.float32), dev)
    x = jax.device_put(jnp.zeros((nchains,) + op.vshape, dtype=jnp.float32), dev)

    @jax.jit
    def run(x, key):
        def body(k, x):
            return sampler.apply(jax.random.fold_in(key, k), f, x)

        x = jax.lax.fori_loop(0, nwarmup, body, x)

        def step(carry, k):
            x, sz, szz = carry
            x = sampler.apply(jax.random.fold_in(key, nwarmup + k), f, x)
            z = jnp.tensordot(x, wj, axes=3).astype(jnp.float32)
            return (x, sz + z.sum(), szz + (z * z).sum()), 0.0

        (x, sz, szz), _ = jax.lax.scan(
            step, (x, jnp.float32(0), jnp.float32(0)), jnp.arange(nsteps)
        )
        return sz, szz

    sz, szz = run(x, jax.random.PRNGKey(99))
    jax.block_until_ready(sz)
    total = nchains * nsteps
    e_mean = float(sz) / total
    e_var = float(szz) / total - e_mean**2
    stat = np.sqrt(2.0 / total) * z_var_exact  # sd of the sample variance
    log(f"observed var = {e_var:.6e} (exact {z_var_exact:.6e}, "
        f"rel err {abs(e_var - z_var_exact) / z_var_exact:.3%}, "
        f"stat ~ {3 * stat / z_var_exact:.3%}) over {total} samples")
    log(f"zero-mean E[z] = {e_mean:.3e} (should be ~0, sd {np.sqrt(z_var_exact / total):.3e})")
    assert abs(e_var - z_var_exact) / z_var_exact < 0.05
    assert abs(e_mean) < 6 * np.sqrt(z_var_exact / total)
    print("VALIDATION OK")


if __name__ == "__main__":
    main()
