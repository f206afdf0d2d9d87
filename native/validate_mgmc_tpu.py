"""On-TPU statistical validation of the flagship MGMC configuration.

Runs the bench problem (2d 256x256 posterior, 5-level W-cycle, float32, the
fused level-visit Pallas kernels on the finest level) with batched chains on
the TPU and compares
the observed mean and variance of a point observation z = w^T x against the
exact posterior values computed on the host in float64 - the same oracle as
``measure_sampling_time`` (``driver_mgmc.cc:40-107``).

Run: ``python native/validate_mgmc_tpu.py [total_steps]`` (sole TPU client!).
``total_steps`` (default 400, x 128 chains) is rounded up to a multiple of
the 400-step dispatch chunk; chunks accumulate in float64 on host (the
long-assurance runs use 3200 -> 409,600 samples).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from multigridmc_tpu.models.posterior import (
        measurement_vector,
        observed_mean_and_variance,
        posterior_mean,
    )
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        op = bench.build_problem()
        sampler = MultigridMCSampler(op, nlevel=5, smoother="SOR", cycle=2)
    log(f"setup done (backend={jax.default_backend()})")

    # exact posterior mean / observed stats in float64 on host
    rng = np.random.default_rng(20260816)
    # rebuild the same measurement parameters bench used to get y
    mrng = np.random.default_rng(20260816)
    _ = mrng.uniform(0.1, 0.9, size=(8, 2))
    y = mrng.normal(2.0, 1.0, size=8)

    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(jax.devices("cpu")[0]):  # CG solves on host f64
            xbar = np.zeros(op.lattice.vshape)
            op64 = jax.tree.map(
                lambda v: np.asarray(v, dtype=np.float64) if hasattr(v, "astype") else v, op
            )
            mean_exact_field = posterior_mean(op64, xbar, y)
            w = measurement_vector(op.lattice, np.array([0.5, 0.5]), 0.0)
            z_mean_exact, z_var_exact = observed_mean_and_variance(op64, xbar, y, w)
    finally:
        _jax.config.update("jax_enable_x64", False)
    log(f"exact: mean={z_mean_exact:.6e} var={z_var_exact:.6e}")

    with jax.default_device(jax.devices("cpu")[0]):
        f = np.asarray(op.apply(jnp.asarray(mean_exact_field, dtype=op.coeffs.dtype)))
    f = jnp.asarray(f, dtype=op.coeffs.dtype)
    wj = jnp.asarray(w, dtype=op.coeffs.dtype)

    nchains, nwarmup, nsteps = 128, 40, 400
    nchunks = max(1, -(-(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
                       // nsteps))
    dev = jax.devices()[0]
    f = jax.device_put(f, dev)
    x = jax.device_put(jnp.zeros((nchains,) + op.lattice.vshape, dtype=op.coeffs.dtype), dev)

    @jax.jit
    def warm(x, key):
        def body(k, x):
            return sampler.apply(jax.random.fold_in(key, k), f, x)

        return jax.lax.fori_loop(0, nwarmup, body, x)

    @jax.jit
    def collect(x, key):
        def step(carry, k):
            x, sz, szz = carry
            x = sampler.apply(jax.random.fold_in(key, k), f, x)
            z = jnp.tensordot(x, wj, axes=2).astype(jnp.float32)
            return (x, sz + z.sum(), szz + (z * z).sum()), 0.0

        (x, sz, szz), _ = jax.lax.scan(
            step, (x, jnp.float32(0), jnp.float32(0)), jnp.arange(nsteps)
        )
        return x, sz, szz

    from multigridmc_tpu.utils.runtime import sampling_key
    key = sampling_key(5418513)
    total = nchains * nsteps * nchunks
    stat_err = np.sqrt(z_var_exact / total)  # ignores IACT, chains are near-iid
    log(f"collecting {total} samples ({nchunks} chunks x {nsteps} steps "
        f"x {nchains} chains)")

    # ---- protocol A: direct rhs f (reference semantics). With near-exact
    # measurements cond(Q) ~ 1e6, so the implicit mean solve in float32 carries
    # an O(cond * eps32) bias - measured and bounded here, not hidden.
    xa = warm(x, jax.random.fold_in(key, 0))
    jax.block_until_ready(xa)
    log("A: warmup done")
    sz64 = szz64 = 0.0
    for ci in range(nchunks):
        xa, sz, szz = collect(xa, jax.random.fold_in(key, 1 + 100 * ci))
        sz64 += float(sz)
        szz64 += float(szz)
    z_mean = sz64 / total
    z_var = szz64 / total - z_mean**2
    log(f"A direct-f: mean={z_mean:.6e} (exact {z_mean_exact:.6e}, "
        f"err {abs(z_mean - z_mean_exact):.3e}, stat {3 * stat_err:.3e})")
    rel_var_err = abs(z_var - z_var_exact) / z_var_exact
    log(f"A var rel err = {rel_var_err:.3%}")
    assert rel_var_err < 0.05, "variance off by >5%"
    assert abs(z_mean - z_mean_exact) < 0.1 * abs(z_mean_exact) + 6 * stat_err

    # ---- protocol B: zero-mean sampling + exact float64 mean shift - the
    # recommended float32 production protocol: sample e ~ N(0, Q^{-1}) with
    # f = 0 and add the host-computed exact mean, x = mu + e.  E[e] has no
    # conditioning-amplified bias.
    fz = jnp.zeros_like(f)

    @jax.jit
    def warm0(x, key):
        def body(k, x):
            return sampler.apply(jax.random.fold_in(key, k), fz, x)

        return jax.lax.fori_loop(0, nwarmup, body, x)

    @jax.jit
    def collect0(x, key):
        def step(carry, k):
            x, sz, szz = carry
            x = sampler.apply(jax.random.fold_in(key, k), fz, x)
            z = jnp.tensordot(x, wj, axes=2).astype(jnp.float32)
            return (x, sz + z.sum(), szz + (z * z).sum()), 0.0

        (x, sz, szz), _ = jax.lax.scan(
            step, (x, jnp.float32(0), jnp.float32(0)), jnp.arange(nsteps)
        )
        return x, sz, szz

    xb = warm0(jnp.zeros_like(x), jax.random.fold_in(key, 2))
    jax.block_until_ready(xb)
    log("B: warmup done")
    sz64 = szz64 = 0.0
    for ci in range(nchunks):
        xb, sz0, szz0 = collect0(xb, jax.random.fold_in(key, 3 + 100 * ci))
        sz64 += float(sz0)
        szz64 += float(szz0)
    e_mean = sz64 / total
    e_var = szz64 / total - e_mean**2
    z_mean_shifted = float(np.vdot(w, mean_exact_field)) + e_mean
    log(f"B zero-mean+shift: mean={z_mean_shifted:.6e} "
        f"(err {abs(z_mean_shifted - z_mean_exact):.3e}, stat {3 * stat_err:.3e})")
    rel_var_err0 = abs(e_var - z_var_exact) / z_var_exact
    log(f"B var rel err = {rel_var_err0:.3%}")
    assert abs(z_mean_shifted - z_mean_exact) < 6 * stat_err, "B mean outside 6 sigma"
    assert rel_var_err0 < 0.05
    print("VALIDATION OK")


if __name__ == "__main__":
    main()
