"""Component-level time budget of one 3d MGMC W-cycle step on TPU.

3d sibling of bench_cycle_breakdown.py at the 64^3 bench problem
(native/bench_mgmc3d_tpu.py): slope-times the fused L0 visit pair, the
out-of-kernel tensor-product transfers (3d keeps them outside the kernel),
the composed sub-level visits, and the distilled subtree call, to locate the
gap between the measured full step and the 2d flagship's per-byte rates.

Usage: python native/micro/bench_cycle_breakdown3d.py [nchains ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

configure_runtime(default_x64=False)

import jax
import jax.numpy as jnp

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fd
from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
from multigridmc_tpu.ops.intergrid import prolongate, prolongate_add, restrict
from native.micro.slope import slope_time

NX, NLEVEL, CYCLE = 64, 4, 2

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    lattice = Lattice((NX, NX, NX))
    prior = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2),
                              dtype=jnp.float32)
    rng = np.random.default_rng(7)
    op = measured_operator(
        prior,
        MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(8, 3)),
            mean=rng.normal(2.0, 1.0, size=8),
            variance=1e-6 * (1.0 + rng.uniform(size=8)),
        ),
    )
    sampler = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR", cycle=CYCLE)

key = sampling_key(17)
print(f"fused levels {sorted(sampler.fused_levels)}, distill level "
      f"{sampler.distill_level}", flush=True)


def batchify(C, vshape):
    shape = vshape if C == 1 else (C,) + vshape
    return jax.device_put(jnp.zeros(shape, jnp.float32), dev)


for C in [int(a) for a in (sys.argv[1:] or ["32"])]:
    print(f"=== nchains={C} ===", flush=True)
    # ---- L0 fused visit pair (transfers outside) ----
    l0 = sampler.hierarchy.operators[0]
    fused = sampler.fused_levels.get(0)
    f0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).uniform(size=l0.vshape), jnp.float32), dev)
    x0 = batchify(C, l0.vshape)
    vc = sampler.hierarchy.operators[1].vshape

    if fused is not None and fused.fuse_transfers:
        # flat engine: transfers in-kernel; descend returns the coarse rhs
        def pair(x, k, fused=fused, f0=f0):
            x, fc = fused.descend(k, f0, x)
            return fused.ascend(k, f0, x, 0.999 * fc)

        t_pair = slope_time(pair, x0, key)
        print(f"L0 flat fused pair (in-kernel transfers + boundary "
              f"reshapes): {t_pair*1e3:7.3f} ms", flush=True)

        ff = fused._flat_field(f0)
        xf0 = fused._flat_field(x0)

        def pair_flat(x, k, fused=fused, ff=ff):
            x, fc = fused.descend(k, ff, x, flat_io=True)
            return fused.ascend(k, ff, x, 0.999 * fc, flat_io=True)

        t_pair_f = slope_time(pair_flat, xf0, key)
        print(f"L0 flat fused pair, flat state (no boundary reshapes): "
              f"{t_pair_f*1e3:7.3f} ms", flush=True)

        def boundary(x, k, fused=fused):
            return fused._unflat_field(0.999 * fused._flat_field(x))

        t_b = slope_time(boundary, x0, key)
        print(f"chain-state flatten+unflatten relayout: {t_b*1e3:7.3f} ms",
              flush=True)
    elif fused is not None:
        def pair(x, k, fused=fused, f0=f0):
            x, r = fused.descend(k, f0, x)
            fc = restrict(r, dim=3)
            px = prolongate(0.999 * fc, l0.vshape)
            return fused.ascend(k, f0, x, px)

        t_pair = slope_time(pair, x0, key)
        print(f"L0 fused pair + out-of-kernel transfers: {t_pair*1e3:7.3f} ms",
              flush=True)

    if 1 in sampler.fused_levels:
        fl1 = sampler.fused_levels[1]
        l1v = sampler.hierarchy.operators[1].vshape
        f1d = jax.device_put(jnp.asarray(
            np.random.default_rng(2).uniform(size=l1v), jnp.float32), dev)
        x1d = batchify(C, l1v)

        def pair1(x, k, fl1=fl1, f1d=f1d):
            x, fc = fl1.descend(k, f1d, x)
            return fl1.ascend(k, f1d, x, 0.999 * fc)

        t_p1 = slope_time(pair1, x1d, key)
        print(f"L1 flat fused pair: {t_p1*1e3:7.3f} ms", flush=True)

    pre0 = sampler.presamplers[0]
    t_g0 = slope_time(lambda x, k: pre0.apply(k, f0, x), x0, key)
    print(f"L0 composed gibbs sweep: {t_g0*1e3:7.3f} ms", flush=True)

    # ---- L1 composed visit ----
    l1 = sampler.hierarchy.operators[1]
    pre1 = sampler.presamplers[1]
    f1 = jax.device_put(jnp.asarray(
        np.random.default_rng(1).uniform(size=l1.vshape), jnp.float32), dev)
    x1 = batchify(C, l1.vshape)
    t_g1 = slope_time(lambda x, k: pre1.apply(k, f1, x), x1, key)
    t_rr1 = slope_time(
        lambda x, k: prolongate_add(
            1.0, restrict(f1 - l1.apply(x), dim=3), 0.999 * x, dim=3), x1, key)
    print(f"L1 gibbs {t_g1*1e3:7.3f}  rrpa {t_rr1*1e3:7.3f} ms", flush=True)

    # ---- distilled subtree ----
    if sampler.distilled is not None:
        ld = sampler.hierarchy.operators[sampler.distill_level]
        fd = batchify(C, ld.vshape)
        t_d = slope_time(
            lambda x, k: 0.999 * x + sampler.distilled.apply(k, 1e-3 * x), fd, key)
        print(f"distilled call ({ld.vshape}): {t_d*1e3:7.3f} ms", flush=True)

    # ---- full step ----
    xf = batchify(C, op.vshape)
    t_full = slope_time(lambda x, k: sampler.apply(k, f0, x), xf, key)
    print(f"full step: {t_full*1e3:7.3f} ms", flush=True)
