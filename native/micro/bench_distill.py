"""Same-process slope comparison: composed subtree vs distilled affine map,
plus full-step timing with distill on/off and precision variants.

Slope-timing per the round-2 measurement rules (NOTES_R2.md): lax.fori_loop
chains inside one jit, two lengths, scalar host read to force completion.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def slope(make_run, n1, n2):
    ts = {}
    for n in (n1, n2):
        run = make_run(n)
        out = run(0)
        float(np.asarray(out).ravel()[0])
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(10 * n + i)).ravel()[0])
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[1]
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    from bench import NX, NLEVEL, CYCLE, build_problem
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    with jax.default_device(jax.devices("cpu")[0]):
        op = build_problem()
        dtype = op.coeffs.dtype
        samplers = {}
        samplers["distill"] = MultigridMCSampler(
            op, nlevel=NLEVEL, smoother="SOR", omega=1.0, cycle=CYCLE,
            distill=True)
        samplers["composed"] = MultigridMCSampler(
            op, nlevel=NLEVEL, smoother="SOR", omega=1.0, cycle=CYCLE,
            distill=False)
    s = samplers["distill"]
    print("distill level:", s.distill_level, "info:", s.distilled.info,
          "fused:", sorted(s.fused_levels))

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    C = 256
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), dtype), dev)

    # ---- isolated: composed subtree vs distilled map at the distill level --
    li = s.distill_level
    cop = s.hierarchy.operators[li]
    fc = jax.device_put(
        jnp.asarray(rng.normal(size=(C,) + cop.vshape), dtype), dev)

    def make_sub(fn):
        def make_run(n):
            @jax.jit
            def run(salt):
                def body(i, acc):
                    k = jax.random.fold_in(sampling_key(7), i + salt)
                    return fn(k, fc + acc * 1e-9)
                return jax.lax.fori_loop(0, n, body, jnp.zeros_like(fc))
            return run
        return make_run

    t_dist = slope(make_sub(lambda k, v: s.distilled.apply(k, v)), 50, 200)
    t_comp = slope(
        make_sub(lambda k, v: samplers["composed"]._sample(
            li, k, v, jnp.zeros_like(v))), 50, 200)
    print(f"subtree invocation: composed {1e3*t_comp:.3f} ms  "
          f"distilled {1e3*t_dist:.3f} ms  ({t_comp/t_dist:.2f}x)")

    # ---- full step ---------------------------------------------------------
    for name, sam in samplers.items():
        x0 = jax.device_put(jnp.zeros((C,) + op.vshape, dtype), dev)

        def make_run(n, sam=sam):
            @jax.jit
            def run(salt):
                def body(i, x):
                    return sam.apply(
                        jax.random.fold_in(sampling_key(3), i + salt), f, x)
                return jax.lax.fori_loop(0, n, body, x0)
            return run

        t = slope(make_run, 25, 100)
        print(f"full step [{name}]: {1e3*t:.3f} ms/step  "
              f"({C/t:.0f} samples/s)")


if __name__ == "__main__":
    main()
