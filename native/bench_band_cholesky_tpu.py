"""Band-Cholesky sampler benchmark at config-3 scale: sequential block scan
vs recursive-doubling (parallel-prefix) substitution.

The round-2 measurement of the exact-sampler row (BASELINE.md "Direct
Cholesky sampler vs MGMC") ran the sequential ``lax.scan`` strategy: 6.14
ms/step at 64 chains on the 2d 256^2 posterior, latency-bound on ~255
serialised row-block solves.  Round 3 added the recursive-doubling strategy
(`samplers/cholesky.py:169-290`, O(log n) sequential depth, precomputed
affine-prefix level tensors) but never benchmarked it; this script measures
both on hardware, plus the one-time setup costs (host band factorisation,
doubling-level build), using the same two-length slope protocol as bench.py
(the axon tunnel adds ~30 ms fixed cost per dispatch).

cf. the supernodal-solve role of
``/root/reference/src/auxilliary/cholesky_wrapper.cc:39-77``.
"""

import functools
import os
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

NCHAINS = int(os.environ.get("MGMC_BENCH_NCHAINS", "64"))
NSTEPS = (10, 40)


def slope(run, key_fn, n1, n2):
    import jax

    def force(x):
        return float(x.ravel()[0])

    ts = {}
    for n in (n1, n2):
        force(run(key_fn(n), n))  # compile + warmup
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            force(run(key_fn(10 * n + i), n))
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[1]
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    sys.path.insert(0, str(REPO))
    from bench import build_problem

    with jax.default_device(jax.devices("cpu")[0]):
        op = build_problem()

    import numpy as np
    import scipy.linalg

    from multigridmc_tpu.samplers.cholesky import (
        BandCholeskySampler,
        BandFactor,
        _band_matrix_stencil,
    )

    # --- setup timings (host factorisation is shared; doubling build extra)
    t0 = time.perf_counter()
    ab, bw = _band_matrix_stencil(op)
    cb = scipy.linalg.cholesky_banded(ab, lower=True)
    t_factor = time.perf_counter() - t0
    print(f"band factorisation (host, bandwidth {bw}): {t_factor:.2f} s",
          file=sys.stderr)

    results = {"bandwidth": bw, "setup_factor_s": round(t_factor, 2),
               "nchains": NCHAINS}
    f = jnp.asarray(
        np.random.default_rng(0).uniform(size=op.vshape), jnp.float32)
    x0 = jnp.zeros((NCHAINS,) + op.vshape, jnp.float32)

    # one full sampler build (includes the Woodbury setup); the per-strategy
    # factor is swapped in below, re-using the shared host band factor.
    # parallel=False here: the auto gate would eagerly build CPU doubling
    # tensors we immediately discard
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        sampler = BandCholeskySampler.__new__(BandCholeskySampler)
        from multigridmc_tpu.samplers.base import Sampler

        Sampler.__init__(sampler, op)
        sampler.bandwidth = bw
        sampler._dtype = jnp.float32
        sampler.factor = BandFactor(cb, jnp.float32, parallel=False)
        sampler._mu = None
        if op.lowrank is not None:
            from multigridmc_tpu.samplers.cholesky import _np_band_solve

            Bt = np.asarray(op.lowrank.B, dtype=np.float64).reshape(
                op.m_lowrank, -1)
            Ainv_B = _np_band_solve(cb, bw, Bt.T)
            Sig = np.asarray(op.lowrank.Sigma_diag, dtype=np.float64)
            S = np.diag(Sig) + Bt @ Ainv_B
            sampler.W = jnp.asarray(Ainv_B @ np.linalg.inv(S), jnp.float32)
            sampler.B_flat = jnp.asarray(Bt.T, jnp.float32)
            sampler.sqrt_Sigma = jnp.asarray(np.sqrt(Sig), jnp.float32)
        else:
            sampler.W = None
    results["setup_sampler_total_s"] = round(time.perf_counter() - t0, 2)
    print(f"sampler setup {results['setup_sampler_total_s']} s", file=sys.stderr,
          flush=True)

    which = sys.argv[1:] or ["sequential", "doubling"]
    for name, par in (("sequential", False), ("doubling", True)):
        if name not in which:
            continue
        t0 = time.perf_counter()
        sampler.factor = BandFactor(cb, jnp.float32, parallel=par)
        jax.block_until_ready(sampler.factor.Ld)
        if par:
            jax.block_until_ready(sampler.factor._lev_L[-1])
        t_setup = time.perf_counter() - t0
        print(f"{name}: factor setup {t_setup:.2f} s", file=sys.stderr,
              flush=True)
        sampler.fix_rhs(f)
        jax.block_until_ready(sampler._mu)
        print(f"{name}: fix_rhs done", file=sys.stderr, flush=True)

        # The doubling level tensors are ~2 GB at this band width; closed
        # over inside jit they'd be embedded as HLO constants and blow the
        # remote-compile tunnel's request limit (round-4 HTTP 413).  Pass
        # them as arguments and rebind during trace instead.
        fac = sampler.factor
        tensors = ((fac.Linv, tuple(fac._lev_L), tuple(fac._lev_LT))
                   if par else (fac.Ld, fac.Ls))

        @functools.partial(jax.jit, static_argnames=("nsteps",))
        def run(key, nsteps, tensors=tensors, sampler=sampler, par=par):
            fac = sampler.factor
            if par:
                fac.Linv, fac._lev_L, fac._lev_LT = tensors
            else:
                fac.Ld, fac.Ls = tensors

            def step(x, i):
                return sampler.apply(jax.random.fold_in(key, i), f, x), 0.0

            x, _ = jax.lax.scan(step, x0, jnp.arange(nsteps))
            return x

        try:
            dt = slope(lambda k, n: run(k, n, tensors), sampling_key, *NSTEPS)
        finally:
            if par:
                fac.Linv, fac._lev_L, fac._lev_LT = tensors
            else:
                fac.Ld, fac.Ls = tensors
        print(f"{name}: {1e3 * dt:.3f} ms/step, "
              f"{NCHAINS / dt:,.0f} samples/s (setup {t_setup:.2f} s)",
              file=sys.stderr)
        results[name] = {"ms_per_step": round(1e3 * dt, 3),
                         "samples_per_sec": round(NCHAINS / dt, 1),
                         "setup_s": round(t_setup, 2)}

    if "sequential" in results and "doubling" in results:
        results["doubling_speedup"] = round(
            results["sequential"]["ms_per_step"]
            / results["doubling"]["ms_per_step"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
