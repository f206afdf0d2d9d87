"""Focused flagship experiment: fuse the L1 (127^2) visits with a PER-LEVEL
chain-block cap (L0 keeps the global bc=8; the full-scan variant that raised
the global cap hit pathological Mosaic compile times at 255^2 x bc=16).

Usage: python native/micro/scan_l1_bc.py [bc ...]   (default 16 32 64)
"""
import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def slope(run_for, n1=100, n2=400):
    ts = {}
    for n in (n1, n2):
        run = run_for(n)
        float(run(jnp.float32(0.0)).ravel()[0])
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(jnp.float32(1.0 + 17 * n + i)).ravel()[0])
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[1]
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    bcs = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    from bench import CYCLE, NLEVEL, build_problem
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    C = 256
    dev = jax.devices()[0]

    def build(min_v):
        with jax.default_device(jax.devices("cpu")[0]):
            op = build_problem()
            sam = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                     omega=1.0, cycle=CYCLE, distill=True,
                                     fused_min_vertices=min_v)
        return op, sam

    op, base = build(40000)
    rng = np.random.default_rng(0)
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), jnp.float32),
                       dev)
    x0 = jax.device_put(jnp.zeros((C,) + op.vshape, jnp.float32), dev)

    def runner(sam):
        def run_for(n):
            @jax.jit
            def run(salt):
                def body(i, x):
                    return sam.apply(
                        jax.random.fold_in(sampling_key(3), i + salt), f, x)
                return jax.lax.fori_loop(0, n, body, x0 + salt * 1e-9)
            return run
        return run_for

    t = slope(runner(base))
    print(f"base (L0 fused, HIGH): {1e3 * t:.3f} ms/step ({C / t:.0f} samples/s)",
          flush=True)

    for bc in bcs:
        _, sam = build(16000)
        assert 1 in sam.fused_levels, "L1 must fuse"
        sam.fused_levels[1].bc_max = bc
        t = slope(runner(sam))
        print(f"L1 fused bc_max={bc:3d}: {1e3 * t:.3f} ms/step "
              f"({C / t:.0f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
