"""Fused level-visit kernels vs the composed XLA path, slope-timed.

Per level of the production bench hierarchy (2d 256^2 posterior, 5-level
W-cycle): descend visit (Gibbs presweep + residual + restrict) and ascend
visit (prolongate_add + Gibbs postsweep), fused vs composed; then the full
MGMC step both ways.  Control re-timed at the end.

Usage: python native/micro/bench_visit.py [nchains [min_extent]]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

configure_runtime(default_x64=False)

import jax
import jax.numpy as jnp

from bench import build_problem, NLEVEL, CYCLE
from multigridmc_tpu.ops.intergrid import prolongate_add, restrict
from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import FusedVisitLevel, supports_visit
import multigridmc_tpu.samplers.mgmc as mgmc_mod
from native.micro.slope import slope_time

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_problem()
    os.environ["MGMC_FUSED"] = "0"
    composed = mgmc_mod.MultigridMCSampler(
        op, nlevel=NLEVEL, smoother="SOR", coarse_solver="Cholesky",
        omega=1.0, cycle=CYCLE)

key = sampling_key(17)
nfine = NLEVEL - 1
min_extent = int(sys.argv[2]) if len(sys.argv) > 2 else 31

with jax.default_device(cpu):
    fused_levels = {}
    for l in range(nfine):
        lop = composed.hierarchy.operators[l]
        if min(lop.vshape) < min_extent:
            continue
        if supports_visit(lop.vshape, lop.coeffs.dtype, len(lop.offsets),
                          lop.m_lowrank, 16) is None:
            continue
        pre, post = composed.presamplers[l], composed.postsamplers[l]
        fused_levels[l] = FusedVisitLevel(
            lop, pre.smoother.coloring, pre.omega, pre.smoother.order,
            post.smoother.order, pre.smoother.B_bar, post.smoother.B_bar, 1.0)

for C in [int(a) for a in (sys.argv[1:2] or ["256"])]:
    print(f"=== nchains={C} (fused levels: {sorted(fused_levels)}) ===", flush=True)
    for l in range(nfine):
        lop = composed.hierarchy.operators[l]
        pre, post = composed.presamplers[l], composed.postsamplers[l]
        fl = fused_levels.get(l)
        fshape = lop.vshape
        fl_f = jax.device_put(jnp.asarray(
            np.random.default_rng(l).uniform(size=fshape), jnp.float32), dev)
        x0 = jax.device_put(jnp.zeros((C,) + fshape, jnp.float32), dev)
        vc = tuple(m // 2 for m in fshape)
        xc0 = jax.device_put(jnp.zeros((C,) + vc, jnp.float32), dev)

        def comp_desc(x, k, pre=pre, lop=lop, f=fl_f):
            x = pre.apply(k, f, x)
            fc = restrict(f - lop.apply(x), dim=2)
            # fold fc back so the scan carry has a fixed shape
            return x + 1e-6 * prolongate_add(1.0, fc, jnp.zeros_like(x), dim=2)

        def comp_asc(x, k, post=post, f=fl_f, xc=xc0):
            x = prolongate_add(1.0, 0.1 * xc, x, dim=2)
            return post.apply(k, f, x)

        t_cd = slope_time(comp_desc, x0, key, n1=25, n2=100)
        t_ca = slope_time(comp_asc, x0, key, n1=25, n2=100)
        line = (f"L{l} {str(fshape):>12}: composed desc {t_cd*1e3:7.3f} "
                f"asc {t_ca*1e3:7.3f}")
        if fl is not None:
            def fus_desc(x, k, fl=fl, f=fl_f):
                x, fc = fl.descend(k, f, x)
                return x + 1e-6 * prolongate_add(1.0, fc, jnp.zeros_like(x), dim=2)

            def fus_asc(x, k, fl=fl, f=fl_f, xc=xc0):
                return fl.ascend(k, f, x, 0.1 * xc)

            t_fd = slope_time(fus_desc, x0, key, n1=25, n2=100)
            t_fa = slope_time(fus_asc, x0, key, n1=25, n2=100)
            line += (f" | fused desc {t_fd*1e3:7.3f} ({t_cd/t_fd:4.2f}x) "
                     f"asc {t_fa*1e3:7.3f} ({t_ca/t_fa:4.2f}x)")

            # partial fusion: noise+sweep+Woodbury(+residual) in-kernel,
            # tensor-product transfers outside on the XLA path
            import copy

            from multigridmc_tpu.ops.intergrid import prolongate

            flp = copy.copy(fl)
            flp.fuse_transfers = False

            def par_desc(x, k, flp=flp, f=fl_f):
                x, r = flp.descend(k, f, x)
                fc = restrict(r, dim=2)
                return x + 1e-6 * prolongate_add(1.0, fc, jnp.zeros_like(x), dim=2)

            def par_asc(x, k, flp=flp, f=fl_f, xc=xc0, fshape=fshape):
                return flp.ascend(k, f, x, prolongate(0.1 * xc, fshape))

            t_pd = slope_time(par_desc, x0, key, n1=25, n2=100)
            t_pa = slope_time(par_asc, x0, key, n1=25, n2=100)
            line += (f" | partial desc {t_pd*1e3:7.3f} ({t_cd/t_pd:4.2f}x) "
                     f"asc {t_pa*1e3:7.3f} ({t_ca/t_pa:4.2f}x)")
        print(line, flush=True)

    # full step comparison
    fl0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).uniform(size=op.vshape), jnp.float32), dev)
    xf = jax.device_put(jnp.zeros((C,) + op.vshape, jnp.float32), dev)
    t_comp = slope_time(lambda x, k: composed.apply(k, fl0, x), xf, key,
                        n1=25, n2=100)
    print(f"full step composed: {t_comp*1e3:.3f} ms "
          f"({C/t_comp:.0f} samples/s)", flush=True)

    with jax.default_device(cpu):
        os.environ["MGMC_FUSED"] = "1"
        saved = mgmc_mod.MIN_FUSED_VERTICES
        mgmc_mod.MIN_FUSED_VERTICES = min_extent * min_extent
        fused_sampler = mgmc_mod.MultigridMCSampler(
            op, nlevel=NLEVEL, smoother="SOR", coarse_solver="Cholesky",
            omega=1.0, cycle=CYCLE)
        mgmc_mod.MIN_FUSED_VERTICES = saved
        os.environ["MGMC_FUSED"] = "0"
    t_fused = slope_time(lambda x, k: fused_sampler.apply(k, fl0, x), xf, key,
                         n1=25, n2=100)
    print(f"full step fused   : {t_fused*1e3:.3f} ms "
          f"({C/t_fused:.0f} samples/s, {t_comp/t_fused:4.2f}x)", flush=True)
    t_comp2 = slope_time(lambda x, k: composed.apply(k, fl0, x), xf, key,
                         n1=25, n2=100)
    print(f"full step composed (re-timed): {t_comp2*1e3:.3f} ms", flush=True)
