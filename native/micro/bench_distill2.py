"""Interleaved A/B/A full-step slope: distill on vs off, artifact-hardened
(NOTES_R2 rules: device-loop slopes, distinct inputs per rep, scalar reads,
control re-timed at the end)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def make_runs(sam, op, f, C, dtype, lengths):
    from multigridmc_tpu.utils.runtime import sampling_key
    x0 = jnp.zeros((C,) + op.vshape, dtype)

    runs = {}
    for n in lengths:
        @jax.jit
        def run(salt, n=n):
            def body(i, x):
                return sam.apply(
                    jax.random.fold_in(sampling_key(3), i + salt), f, x0 * 0 + x)
            return jax.lax.fori_loop(0, n, body, x0 + salt * 1e-9)
        runs[n] = run
    return runs


def slope(runs, n1, n2, tag):
    ts = {}
    for n in (n1, n2):
        r = runs[n]
        # device-side scalar slice: forces completion without pulling the
        # full 66 MB state over the tunnel (np.asarray would add ~2 s of
        # highly variable transfer time per rep and swamp the slope)
        float(r(jnp.float32(0.0)).ravel()[0])  # compile+warm
        samples = []
        for i in range(5):
            t0 = time.perf_counter()
            float(r(jnp.float32(1.0 + 17 * n + i)).ravel()[0])
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[2]
        print(f"  [{tag}] T({n}) = {ts[n]*1e3:.1f} ms  (all: "
              + " ".join(f"{s*1e3:.0f}" for s in sorted(samples)) + ")")
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    from bench import NX, NLEVEL, CYCLE, build_problem
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import configure_runtime

    configure_runtime(default_x64=False)
    with jax.default_device(jax.devices("cpu")[0]):
        op = build_problem()
        dtype = op.coeffs.dtype
        son = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                 omega=1.0, cycle=CYCLE, distill=True)
        soff = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                  omega=1.0, cycle=CYCLE, distill=False)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    C = 256
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), dtype), dev)
    lengths = (100, 400)
    runs_on = make_runs(son, op, f, C, dtype, lengths)
    runs_off = make_runs(soff, op, f, C, dtype, lengths)
    for phase in ("on", "off", "on2", "off2"):
        runs = runs_on if phase.startswith("on") else runs_off
        t = slope(runs, *lengths, phase)
        print(f"full step distill={phase}: {1e3*t:.3f} ms/step "
              f"({C/t:.0f} samples/s)")


if __name__ == "__main__":
    main()
