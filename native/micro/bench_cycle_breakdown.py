"""Component-level time budget of one MGMC W-cycle step on TPU.

Slope-based timing (see slope.py: the axon tunnel adds a ~30 ms fixed
per-call cost to most programs, so only two-length device-loop slopes measure
real per-iteration cost).  Same-process; control (full step) re-timed at the
end to bound thermal drift.

Per level l the cycle performs ``visits(l)`` times:
    pre Gibbs sweep   = noise (random_rhs) + det sweep (incl. Woodbury)
    residual + restrict ... prolongate_add   (rrpa, measured together)
    post Gibbs sweep
and ``visits(coarse)`` dense Cholesky samples.  Derived: det sweep = gibbs -
noise; predicted total vs measured full step shows what the decomposition
cannot see.

Usage: python native/micro/bench_cycle_breakdown.py [nchains ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

configure_runtime(default_x64=False)

import jax
import jax.numpy as jnp

from bench import build_problem, NLEVEL, CYCLE
from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
from multigridmc_tpu.ops.intergrid import prolongate_add, restrict
from native.micro.slope import slope_time

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_problem()
    sampler = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                 coarse_solver="Cholesky", omega=1.0, cycle=CYCLE)

key = sampling_key(17)
nfine = NLEVEL - 1
visits = [1] + [CYCLE ** l for l in range(1, nfine)]
coarse_visits = CYCLE ** (NLEVEL - 1)


def batchify(C, vshape):
    shape = vshape if C == 1 else (C,) + vshape
    return jax.device_put(jnp.zeros(shape, jnp.float32), dev)


for C in [int(a) for a in (sys.argv[1:] or ["1", "256"])]:
    print(f"=== nchains={C} ===", flush=True)
    rows = {}
    for l in range(nfine):
        lop = sampler.hierarchy.operators[l]
        pre = sampler.presamplers[l]
        fl = jax.device_put(jnp.asarray(
            np.random.default_rng(l).uniform(size=lop.vshape), jnp.float32), dev)
        xl = batchify(C, lop.vshape)

        t_gibbs = slope_time(lambda x, k, pre=pre, fl=fl: pre.apply(k, fl, x), xl, key)
        t_noise = slope_time(
            lambda x, k, pre=pre, fl=fl: 0.999 * x + 1e-3 * pre.random_rhs(k, fl, x),
            xl, key)
        t_rrpa = slope_time(
            lambda x, k, lop=lop, fl=fl: prolongate_add(
                1.0, restrict(fl - lop.apply(x), dim=lop.lattice.dim),
                0.999 * x, dim=lop.lattice.dim), xl, key)
        rows[l] = (t_gibbs, t_noise, t_rrpa)
        print(f"L{l} {str(lop.vshape):>12}: gibbs {t_gibbs*1e3:7.3f}  noise {t_noise*1e3:7.3f}"
              f"  det(sweep) {(t_gibbs-t_noise)*1e3:7.3f}  rrpa {t_rrpa*1e3:7.3f} ms", flush=True)

    cop = sampler.hierarchy.operators[-1]
    fc = jax.device_put(jnp.asarray(
        np.random.default_rng(9).uniform(size=cop.vshape), jnp.float32), dev)
    xc = batchify(C, cop.vshape)
    t_coarse = slope_time(
        lambda x, k: sampler.coarse_sampler.apply(k, fc, x), xc, key)
    print(f"coarse {str(cop.vshape):>9}: {t_coarse*1e3:7.3f} ms", flush=True)

    fl0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).uniform(size=op.vshape), jnp.float32), dev)
    xf = batchify(C, op.vshape)
    t_full = slope_time(lambda x, k: sampler.apply(k, fl0, x), xf, key)

    pred = sum(v * (2 * rows[l][0] + rows[l][2]) for l, v in enumerate(visits))
    pred += coarse_visits * t_coarse
    print(f"full step : {t_full*1e3:.3f} ms   predicted from parts: {pred*1e3:.3f} ms "
          f"(unaccounted {(t_full-pred)*1e3:+.3f})", flush=True)
    noise_tot = sum(v * 2 * rows[l][1] for l, v in enumerate(visits))
    sweep_tot = sum(v * 2 * (rows[l][0] - rows[l][1]) for l, v in enumerate(visits))
    rrpa_tot = sum(v * rows[l][2] for l, v in enumerate(visits))
    print(f"budget: noise {noise_tot*1e3:.3f}  sweeps {sweep_tot*1e3:.3f}  "
          f"rrpa {rrpa_tot*1e3:.3f}  coarse {coarse_visits*t_coarse*1e3:.3f} ms", flush=True)
    t_full2 = slope_time(lambda x, k: sampler.apply(k, fl0, x), xf, key)
    print(f"full step (re-timed): {t_full2*1e3:.3f} ms", flush=True)
