"""Scan the remaining step-tail attacks on hardware (solid slope protocol):
distilled-matmul precision, and fusing the L1 (127^2) level visits with
larger chain blocks.  Usage: python native/micro/scan_tail.py [bc_max]
(bc_max only affects the L1-fused variants via MGMC_VISIT_BC_MAX)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def slope(run, n1, n2):
    ts = {}
    for n in (n1, n2):
        float(run(jnp.float32(0.0), n).ravel()[0])
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(jnp.float32(1.0 + 17 * n + i), n).ravel()[0])
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[1]
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    from bench import NLEVEL, CYCLE, build_problem
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    C = 256
    with jax.default_device(jax.devices("cpu")[0]):
        op = build_problem()
        dtype = op.coeffs.dtype
        base = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                  omega=1.0, cycle=CYCLE, distill=True)
        l1f = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                 omega=1.0, cycle=CYCLE, distill=True,
                                 fused_min_vertices=16000)
    print("base fused:", sorted(base.fused_levels),
          " l1f fused:", sorted(l1f.fused_levels), flush=True)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), dtype), dev)
    x0 = jax.device_put(jnp.zeros((C,) + op.vshape, dtype), dev)

    def make_run(sam):
        @jax.jit
        def run(salt, n):
            def body(i, x):
                return sam.apply(
                    jax.random.fold_in(sampling_key(3), i + salt), f, x)
            return jax.lax.fori_loop(0, n, body, x0 + salt * 1e-9)
        return lambda salt, n: run(salt, jnp.int32(0) * 0 + n)  # static n? no
    # static loop lengths: separate jits per n
    def make_runs(sam):
        def runner(salt, n):
            key = ("r", id(sam), n)
            if key not in cache:
                @jax.jit
                def run(salt, n=n):
                    def body(i, x):
                        return sam.apply(
                            jax.random.fold_in(sampling_key(3), i + salt), f, x)
                    return jax.lax.fori_loop(0, n, body, x0 + salt * 1e-9)
                cache[key] = run
            return cache[key](salt)
        return runner
    cache = {}

    variants = [
        ("distill-highest", base, "highest"),
        ("distill-high", base, "high"),
        ("distill-default", base, "default"),
        ("L1fused+highest", l1f, "highest"),
        ("L1fused+high", l1f, "high"),
        ("distill-highest(again)", base, "highest"),
    ]
    from multigridmc_tpu.samplers.distill import _PRECISIONS
    for name, sam, prec in variants:
        sam.distilled.precision = _PRECISIONS[prec]
        cache.clear()
        t = slope(make_runs(sam), 100, 400)
        print(f"{name:24s}: {1e3*t:.3f} ms/step  ({C/t:.0f} samples/s)",
              flush=True)


if __name__ == "__main__":
    main()
