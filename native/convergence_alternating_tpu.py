"""TPU confirmation of the alternating sweep schedule's convergence win
(VERDICT r4 #4 "Done" criterion).

Two measurements with the PRODUCTIZED option (``sweep_schedule="alternating"``
on MultigridMCSampler, driven through ``apply_indexed`` exactly as the
drivers do), float32 on the chip:

1. **Rate confirmation at the scan problem** (2d 32x32 posterior with 8
   near-exact measurements, 4-level W-cycle): per-step contraction of
   q_j = |E[z_j] - E[z]| at 20k replica chains, fixed omega=1.0 vs
   alternating omega=1.4.  CPU f64 scan measured 0.617 vs 0.505
   (docs/CONVERGENCE.md).

2. **Warmup-to-tolerance at the flagship bench problem** (256^2 posterior,
   5-level W-cycle, fused kernels + distillation active in BOTH parity
   engines): steps for q_mean to reach 2% of |E[z]|, 2048 replicas.  The
   exact E[z] comes from the host float64 Woodbury posterior mean (no dense
   inverse needed at 65k unknowns).

Run as the sole TPU client.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def rate(q, floor):
    qs = [v for v in q if v > 5 * floor]
    if len(qs) < 2:
        return float("nan")
    return float(np.median([qs[i + 1] / qs[i] for i in range(len(qs) - 1)]))


def main():
    import jax
    import jax.numpy as jnp

    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key
    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import (
        MeasurementParameters,
        measured_operator,
    )
    from multigridmc_tpu.models.prior import shiftedlaplace_fd
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    configure_runtime(default_x64=False)
    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    results = {}

    def build(nx, nlevel, seed, var_scale):
        with jax.default_device(jax.devices("cpu")[0]):
            lattice = Lattice((nx, nx))
            prior = shiftedlaplace_fd(
                lattice, ConstantCorrelationLengthModel(0.2),
                dtype=jnp.float32)
            rng = np.random.default_rng(seed)
            params = MeasurementParameters(
                measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
                mean=rng.normal(2.0, 1.0, size=8),
                variance=var_scale * (1.0 + rng.uniform(size=8)),
            )
            return measured_operator(prior, params)

    def qmean_curve(sampler, op, f32, exact_mean, ci, cj, nrep, nsteps, key):
        import jax

        @jax.jit
        def run(key):
            x = jnp.zeros((nrep,) + op.vshape, jnp.float32)

            # lax.scan (the drivers' loop form): apply_indexed dispatches the
            # parity engines through ONE lax.cond - a Python-unrolled loop
            # would inline both fused+distilled engines nsteps times and blow
            # the executable size (measured: 4.4 GB serialized proto)
            def step(x, j):
                x = sampler.apply_indexed(
                    jax.random.fold_in(key, j), f32, x, j)
                return x, jnp.mean(x[:, ci, cj])

            _, zmeans = jax.lax.scan(step, x, jnp.arange(nsteps))
            return zmeans

        zm = np.asarray(run(key), dtype=np.float64)
        return np.abs(zm - exact_mean)

    # ---- 1. scan-problem rate confirmation -------------------------------
    op = build(32, 4, 42, 1e-4)
    n = op.lattice.nvertex
    c = n // 2
    ci, cj = c // op.vshape[1], c % op.vshape[1]
    Q = np.asarray(op.to_dense(), np.float64)
    cov = np.linalg.inv(Q)
    rng = np.random.default_rng(1482817)
    f = rng.standard_normal(n)
    exact_mean = float((cov @ f)[c])
    exact_var = float(cov[c, c])
    nrep, nsteps = 20000, 12
    floor = np.sqrt(exact_var / nrep)
    f32 = jnp.asarray(f.reshape(op.vshape), jnp.float32)
    log(f"scan problem: E[z]={exact_mean:.5f}, floor~{floor:.2e}")

    fixed = MultigridMCSampler(op, nlevel=4, smoother="SOR", omega=1.0,
                               cycle=2)
    alt = MultigridMCSampler(op, nlevel=4, smoother="SOR", omega=1.4,
                             cycle=2, sweep_schedule="alternating")
    for name, sam in (("fixed_omega1.0", fixed), ("alternating_omega1.4", alt)):
        q = qmean_curve(sam, op, f32, exact_mean, ci, cj, nrep, nsteps,
                        sampling_key(7))
        r = rate(q, floor)
        results[f"scan32_{name}"] = {
            "rate": round(r, 3), "q": [round(float(v), 5) for v in q]}
        log(f"32x32 {name}: rate {r:.3f}  q={[f'{v:.4f}' for v in q]}")

    # ---- 2. flagship warmup-to-tolerance ---------------------------------
    sys.path.insert(0, str(REPO))
    from bench import build_problem

    with jax.default_device(jax.devices("cpu")[0]):
        opf = build_problem()
    rngf = np.random.default_rng(5418513)
    fvec = rngf.standard_normal(opf.lattice.nvertex)
    # exact mean = Q^{-1} f via float64 CG on a host numpy stencil matvec
    # (no dense inverse at 65k unknowns; no f64 jax under the f32 runtime)
    import scipy.sparse.linalg as spla

    vshape = opf.vshape
    H, W = vshape
    coeffs64 = np.asarray(opf.coeffs, np.float64)
    if opf.lowrank is not None:
        B64 = np.asarray(opf.lowrank.B, np.float64).reshape(
            opf.m_lowrank, -1)
        sig64 = np.asarray(opf.lowrank.Sigma_diag, np.float64)

    def matvec(v):
        x = np.asarray(v, np.float64).reshape(vshape)
        y = np.zeros_like(x)
        for k, (oy, ox) in enumerate(opf.offsets):
            ys0, ys1 = max(0, -oy), min(H, H - oy)
            xs0, xs1 = max(0, -ox), min(W, W - ox)
            y[ys0:ys1, xs0:xs1] += (coeffs64[k, ys0:ys1, xs0:xs1]
                                    * x[ys0 + oy:ys1 + oy, xs0 + ox:xs1 + ox])
        out = y.ravel()
        if opf.lowrank is not None:
            out = out + B64.T @ ((B64 @ v) / sig64)
        return out

    # self-check the numpy matvec against the jax operator (f32 tolerance)
    xt = np.random.default_rng(0).standard_normal(fvec.size)
    with jax.default_device(jax.devices("cpu")[0]):
        yj = np.asarray(opf.apply(jnp.asarray(xt.reshape(vshape),
                                              jnp.float32)), np.float64)
    yn = matvec(xt).reshape(vshape)
    rel = float(np.max(np.abs(yn - yj)) / np.max(np.abs(yn)))
    assert rel < 1e-3, f"numpy matvec mismatch: {rel:.2e}"

    lin = spla.LinearOperator((fvec.size, fvec.size), matvec=matvec,
                              dtype=np.float64)
    mean_vec, info = spla.cg(lin, fvec, rtol=1e-12, maxiter=20000)
    assert info == 0, info
    nf = opf.vshape[1]
    cf = fvec.size // 2
    cfi, cfj = cf // nf, cf % nf
    exact_zf = float(mean_vec[cf])
    log(f"flagship: E[z]={exact_zf:.5f} (CG residual ok)")

    ff = jnp.asarray(fvec.reshape(vshape), jnp.float32)
    nrepf, nstepsf = 2048, 16
    out = {}
    for name, kw in (("fixed_omega1.0", dict(omega=1.0)),
                     ("alternating_omega1.4",
                      dict(omega=1.4, sweep_schedule="alternating"))):
        with jax.default_device(jax.devices("cpu")[0]):
            sam = MultigridMCSampler(opf, nlevel=5, smoother="SOR", cycle=2,
                                     **kw)
        q = qmean_curve(sam, opf, ff, exact_zf, cfi, cfj, nrepf, nstepsf,
                        sampling_key(11))
        tol = 0.02 * abs(exact_zf)
        steps = next((j + 1 for j, v in enumerate(q) if v < tol), None)
        out[name] = {"steps_to_2pct": steps,
                     "q": [round(float(v), 5) for v in q]}
        log(f"flagship {name}: steps to 2% = {steps}; q[:8]="
            f"{[f'{v:.3f}' for v in q[:8]]}")
    results["flagship256"] = out
    print(json.dumps(results))


if __name__ == "__main__":
    main()
