"""On-TPU statistical validation of the distilled-subtree matmul precision.

The distilled subtree (samplers/distill.py) replaces the sub-level MGMC
recursion with ``x = f @ T + xi @ S^T``.  At MXU precision HIGHEST the map is
within ~1e-6 of the composed recursion; DEFAULT (one bf16 pass) is measured
~20% faster end-to-end (native/micro/scan_tail.py) but perturbs the Markov
kernel by O(1e-3) relative - this script decides whether that perturbation
biases the *stationary distribution* beyond the reference statistical
tolerance class (2e-3, ``src/sampler/test_sampler.hh:170-173``).

Protocol (bench problem: 2d 256x256 posterior, 5-level W-cycle, f32, fused
visits + distilled subtree, zero-mean sampling = production protocol B):

1. anchor: HIGHEST-precision run vs the exact f64 posterior variance of
   point/average observations (same oracle as native/validate_mgmc_tpu.py);
2. paired bias estimate: re-run with the IDENTICAL key stream at DEFAULT
   (and HIGH) precision.  The noise stream being identical and the chain a
   contraction, var_default - var_highest estimates the precision bias with
   correlated-difference noise far below the independent-run stat error;
3. a direct report of the per-application map perturbation
   ||f T_def - f T_hi|| / ||f T_hi||.

Gates: anchor rel var err < 3 sigma + 0.2%; paired |delta var| / var < 0.2%
per precision; protocol-B mean within 6 sigma.

Run: ``python native/validate_distill_precision_tpu.py [nsteps]``
(sole TPU client!).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

CHUNK = 500  # steps per dispatch; host accumulates in f64 across chunks


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    # round up to one full chunk (advisor r3: nsteps < CHUNK made total = 0)
    nsteps = max(nsteps, CHUNK)
    import bench
    from multigridmc_tpu.models.posterior import (
        measurement_vector,
        observed_mean_and_variance,
        posterior_mean,
    )
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.samplers.distill import _PRECISIONS
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        op = bench.build_problem()
        sampler = MultigridMCSampler(op, nlevel=bench.NLEVEL, smoother="SOR",
                                     cycle=bench.CYCLE)
    assert sampler.distilled is not None, "distillation inactive - nothing to test"
    assert sampler.fused_levels, "fused visits inactive - not the production path"
    log(f"setup done: distill level {sampler.distill_level} "
        f"(n={sampler.distilled.n}, K={sampler.distilled.info['K']}), "
        f"fused levels {sorted(sampler.fused_levels)}")

    # ---- exact observed variances in f64 on host (probes: center point,
    # off-center point, global average)
    lattice = op.lattice
    probes = [
        ("point(0.5,0.5)", measurement_vector(lattice, np.array([0.5, 0.5]), 0.0)),
        ("point(0.25,0.75)", measurement_vector(lattice, np.array([0.25, 0.75]), 0.0)),
        ("avg(r=0.2)", measurement_vector(lattice, np.array([0.5, 0.5]), 0.2)),
    ]
    mrng = np.random.default_rng(20260816)
    _ = mrng.uniform(0.1, 0.9, size=(8, 2))
    y = mrng.normal(2.0, 1.0, size=8)
    jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            xbar = np.zeros(lattice.vshape)
            op64 = jax.tree.map(
                lambda v: np.asarray(v, dtype=np.float64) if hasattr(v, "astype") else v,
                op,
            )
            exact = {}
            for name, w in probes:
                zm, zv = observed_mean_and_variance(op64, xbar, y, w)
                exact[name] = (float(zm), float(zv))
                log(f"exact {name}: var={zv:.6e}")
    finally:
        jax.config.update("jax_enable_x64", False)

    dtype = op.coeffs.dtype
    W = jnp.asarray(np.stack([w for _, w in probes]), dtype=dtype)  # (P, H, Wd)
    nchains, nwarmup = 256, 60
    dev = jax.devices()[0]
    fz = jax.device_put(jnp.zeros(lattice.vshape, dtype=dtype), dev)
    x0 = jax.device_put(
        jnp.zeros((nchains,) + lattice.vshape, dtype=dtype), dev)

    def make_fns():
        # fresh jits per precision: sampler.apply closes over the (mutated)
        # distilled.precision, so reusing a traced cache would silently keep
        # the first precision
        @jax.jit
        def warm(x, key):
            def body(k, x):
                return sampler.apply(jax.random.fold_in(key, k), fz, x)
            return jax.lax.fori_loop(0, nwarmup, body, x)

        @jax.jit
        def collect(x, key, base):
            def step(carry, k):
                x, sz, szz = carry
                x = sampler.apply(jax.random.fold_in(key, base + k), fz, x)
                # HIGHEST: the observable projection must not inject its own
                # bf16 rounding while adjudicating 1e-3-level variance
                # effects (advisor r3)
                z = jnp.tensordot(x, W, axes=([1, 2], [1, 2]),
                                  precision=jax.lax.Precision.HIGHEST)  # (C, P)
                return (x, sz + z.sum(0), szz + (z * z).sum(0)), 0.0
            P = W.shape[0]
            (x, sz, szz), _ = jax.lax.scan(
                step, (x, jnp.zeros(P, jnp.float32), jnp.zeros(P, jnp.float32)),
                jnp.arange(CHUNK))
            return x, sz, szz

        return warm, collect

    key = sampling_key(5418513)

    def run(precision):
        sampler.distilled.precision = _PRECISIONS[precision]
        warm, collect = make_fns()
        x = warm(x0, jax.random.fold_in(key, 0))
        float(x.ravel()[0])
        sz64 = np.zeros(len(probes))
        szz64 = np.zeros(len(probes))
        for c in range(nsteps // CHUNK):
            x, sz, szz = collect(x, jax.random.fold_in(key, 1), c * CHUNK)
            sz64 += np.asarray(sz, dtype=np.float64)
            szz64 += np.asarray(szz, dtype=np.float64)
        total = nchains * (nsteps // CHUNK) * CHUNK
        mean = sz64 / total
        var = szz64 / total - mean**2
        return mean, var, total

    results = {}
    for prec in ("highest", "default", "high"):
        tr = time.perf_counter()
        mean, var, total = run(prec)
        log(f"{prec}: {total} samples in {time.perf_counter() - tr:.0f}s "
            f"({total / (time.perf_counter() - tr):,.0f} samples/s)")
        results[prec] = (mean, var, total)
        for pi, (name, _) in enumerate(probes):
            zv = exact[name][1]
            log(f"  {prec} {name}: var={var[pi]:.6e} "
                f"(exact {zv:.6e}, rel err {abs(var[pi] - zv) / zv:+.4%}) "
                f"mean={mean[pi]:+.3e}")

    # direct map perturbation report
    rng = np.random.default_rng(7)
    fprobe = jnp.asarray(
        rng.standard_normal((4, sampler.distilled.n)), dtype=dtype)
    Tm = sampler.distilled.Tm
    hi = jnp.tensordot(fprobe, Tm, axes=([1], [0]),
                       precision=jax.lax.Precision.HIGHEST)
    for prec in ("default", "high"):
        lo = jnp.tensordot(fprobe, Tm, axes=([1], [0]),
                           precision=_PRECISIONS[prec])
        rel = float(jnp.linalg.norm(lo - hi) / jnp.linalg.norm(hi))
        log(f"map perturbation ({prec} vs highest): {rel:.3e}")

    # ---- gates.  Informational for every precision; the script FAILS only
    # if the anchor is off or the PRODUCTION default (distill.PRECISION,
    # currently "high" - see the decision record in samplers/distill.py) shows
    # paired bias.  "default" is expected to fail its paired gate (+0.26-0.67%
    # variance bias measured 2026-08-19); that failure is why it is opt-in.
    from multigridmc_tpu.samplers import distill as _distill

    production = next(
        k for k, v in _PRECISIONS.items() if v == _distill.PRECISION)
    failures = []
    mean_hi, var_hi, total = results["highest"]
    for pi, (name, w) in enumerate(probes):
        zm, zv = exact[name]
        stat = np.sqrt(2.0 * 6.0 / total) * zv  # tau_int <= ~6 (colored SOR)
        if abs(var_hi[pi] - zv) > 3 * stat + 2e-3 * zv:
            failures.append(f"anchor var {name}: {var_hi[pi]:.6e} vs {zv:.6e}")
        mean_stat = np.sqrt(zv * 6.0 / total)
        if abs(mean_hi[pi]) > 6 * mean_stat:
            failures.append(f"anchor mean {name}: {mean_hi[pi]:+.3e}")
        for prec in ("default", "high"):
            dv = results[prec][1][pi] - var_hi[pi]
            gated = prec == production
            verdict = ""
            if abs(dv) > 2e-3 * zv:
                verdict = " BIASED" + (" (production!)" if gated else "")
                if gated:
                    failures.append(
                        f"paired {prec} {name}: delta var {dv / zv:+.4%}")
            log(f"paired delta-var {prec} {name}: {dv / zv:+.4%}{verdict}")
            dm = results[prec][0][pi] - mean_hi[pi]
            if gated and abs(dm) > 2 * mean_stat:
                failures.append(f"paired {prec} mean {name}: {dm:+.3e}")

    if failures:
        for fmsg in failures:
            log("FAIL " + fmsg)
        sys.exit(1)
    print(f"DISTILL PRECISION VALIDATION OK (production={production})",
          flush=True)


if __name__ == "__main__":
    main()
