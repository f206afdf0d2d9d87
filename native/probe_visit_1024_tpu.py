"""Hardware probe: fused finest-level visit at 1023^2 with m=8 measurements.

Round 2 measured the 1024^2 scaling row at 523x with the finest level running
COMPOSED: 23 resident coefficient/measurement planes (96 MB) blew the fused
kernel's VMEM plan.  Round 4's resident-set compression (visit_plan: baked
constant coefficient planes, static noise scale, SMEM-synthesized one-hot
measurement columns) shrinks the resident set to f + n_dirs*m Woodbury planes
(~38 MB).  This script answers, on hardware:

  1. which chain-block size the plan admits at each MGMC_VMEM_MB setting;
  2. whether Mosaic actually compiles + runs the kernels there;
  3. the slope-timed fused-vs-composed visit cost at the admitted bc.

Run as the sole TPU client.  Usage: python native/probe_visit_1024_tpu.py [vmem_mb ...]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

NX = 1024
NCHAINS = 16


def main():
    vmem_settings = [int(a) for a in sys.argv[1:]] or [112, 120, 128]

    import os

    import numpy as np

    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    import bench as benchmod

    benchmod.NX = NX
    with jax.default_device(jax.devices("cpu")[0]):
        op = benchmod.build_problem()
        from multigridmc_tpu.ops.coloring import coloring_for
        from multigridmc_tpu.smoothers import BACKWARD, FORWARD, SORSmoother

        coloring = coloring_for(op.offsets, op.vshape)
        pre = SORSmoother(op, 1.0, 1, FORWARD, coloring)
        post = SORSmoother(op, 1.0, 1, BACKWARD, coloring)

    import multigridmc_tpu.ops.kernels.mgmc_visit_pallas as vk

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(NCHAINS,) + op.vshape), jnp.float32)

    def force(t):
        return float(t.ravel()[0])

    combos = [(mb, planes) for mb in vmem_settings for planes in (16, 14, 12)]
    for mb, planes in combos:
        os.environ["MGMC_VMEM_MB"] = str(mb)
        vk._vmem_limit.cache_clear()
        vk._PLANES_PER_CHAIN = planes
        jax.clear_caches()  # bc is baked into traced kernels - force retrace
        plan = vk.visit_plan(op, 1.0, n_dirs=1, nchains=NCHAINS)
        print(f"--- MGMC_VMEM_MB={mb} planes/chain={planes}: plan bc="
              f"{None if plan is None else plan['bc']}", flush=True)
        if plan is None:
            continue
        with jax.default_device(jax.devices("cpu")[0]):
            fused = vk.FusedVisitLevel(
                op, coloring, 1.0, pre.order, post.order, pre.B_bar,
                post.B_bar, coarse_scaling=1.0, plan=plan,
            )
        try:
            t0 = time.perf_counter()
            out_x, fc = fused.descend(sampling_key(0), f, x)
            jax.block_until_ready(out_x)
            print(f"  descend compiled+ran in {time.perf_counter() - t0:.1f}s "
                  f"(finite={bool(jnp.isfinite(out_x).all())})", flush=True)
            xc = jnp.asarray(rng.normal(size=fc.shape), jnp.float32)
            out_a = fused.ascend(sampling_key(1), f, x, xc)
            jax.block_until_ready(out_a)
            print(f"  ascend ok (finite={bool(jnp.isfinite(out_a).all())})",
                  flush=True)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue

        # slope-timed fused visit vs composed visit (noise on, production path)
        @jax.jit
        def fused_steps(key, x, n):
            def body(i, x):
                k = jax.random.fold_in(key, i)
                x2, fc = fused.descend(k, f, x)
                return fused.ascend(k, f, x2, fc)
            return jax.lax.fori_loop(0, n, body, x)

        from multigridmc_tpu.ops.intergrid import prolongate, prolongate_add, restrict
        from multigridmc_tpu.samplers.sor import SORSampler

        with jax.default_device(jax.devices("cpu")[0]):
            pre_s = SORSampler(op, 1.0, 1, FORWARD)
            post_s = SORSampler(op, 1.0, 1, BACKWARD)

        @jax.jit
        def composed_steps(key, x, n):
            def body(i, x):
                k = jax.random.fold_in(key, i)
                x = pre_s.apply(k, f, x)
                r = f - op.apply(x)
                fc = restrict(r, dim=2)
                x = prolongate_add(1.0, fc, x, dim=2)
                return post_s.apply(jax.random.fold_in(k, 1), f, x)
            return jax.lax.fori_loop(0, n, body, x)

        for name, stepfn in (("fused", fused_steps), ("composed", composed_steps)):
            ts = {}
            for n in (4, 16):
                force(stepfn(sampling_key(n), x, n))  # compile + warm
                samples = []
                for i in range(3):
                    t0 = time.perf_counter()
                    force(stepfn(sampling_key(100 * n + i), x, n))
                    samples.append(time.perf_counter() - t0)
                ts[n] = sorted(samples)[1]
            dt = (ts[16] - ts[4]) / 12.0
            print(f"  {name}: {1e3 * dt:.3f} ms/visit-pair at bc={plan['bc']}",
                  flush=True)


if __name__ == "__main__":
    main()
