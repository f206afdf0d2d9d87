"""Deterministic multigrid solver benchmark on TPU (BASELINE.json config 1).

Times the multigrid-preconditioned Richardson iteration (driver_mg path) on the
bench posterior problem and reports ms/cycle and the residual reduction, to be
compared against ``native/baseline_mgmc.cc --deterministic``.  Run as the sole
TPU client.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from multigridmc_tpu.solvers.multigrid import MultigridPreconditioner

    with jax.default_device(jax.devices("cpu")[0]):
        op = bench.build_problem()
        precond = MultigridPreconditioner(
            op, nlevel=bench.NLEVEL, smoother="SOR", cycle=bench.CYCLE, omega=1.0
        )
    dev = jax.devices()[0]
    rng = np.random.default_rng(1482817)
    b = jax.device_put(jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32), dev)

    # two-length device-loop slope (the tunnel adds ~30 ms per dispatch,
    # see NOTES_R2.md "LATE-ROUND CORRECTION"); both lengths must be large
    # enough to sit in the slow/looped regime - short deterministic loops
    # (K<~20) hit a fast path that skips the fixed cost entirely and would
    # corrupt the slope
    K1, K2 = 40, 160

    def make(K):
        @jax.jit
        def run(b):
            def body(_, x):
                return x - precond.apply(op.apply(x) - b)

            x = jax.lax.fori_loop(0, K, body, jnp.zeros_like(b))
            return x, jnp.linalg.norm(op.apply(x) - b) / jnp.linalg.norm(b)

        return run

    def slope(shape, label, n=1, Ks=None):
        # distinct rhs per repetition: the tunnel serves repeated calls with
        # identical (program, args) from a result cache (~0.1 ms round trips)
        rhss = [jax.device_put(
            jnp.asarray(rng.normal(size=shape), dtype=jnp.float32), dev)
            for _ in range(4)]
        ts = {}
        red = None

        def force(x):
            # block_until_ready does not reliably block on the tunnel for
            # deterministic loops; a scalar host read does (cost cancels in
            # the slope)
            return float(x.ravel()[0])

        for K in (Ks or (K1, K2)):
            run = make(K)
            x, red = run(rhss[3])
            force(x)
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                x, red = run(rhss[i])
                force(x)
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        Ka, Kb = Ks or (K1, K2)
        dt = (ts[Kb] - ts[Ka]) / (Kb - Ka)
        print(f"tpu deterministic MG, {label}: {dt * 1e3 / n:.4f} ms/cycle"
              + (f"-batch ({n / dt:.0f} cycle-solves/s)" if n > 1 else
                 f", residual reduction {float(red):.3e} over {Kb} cycles"
                 " (float32 floor ~1e-6)"),
              flush=True)

    # the single-rhs cycle is ~0.1 ms: 40/160 loops put the length delta
    # inside the tunnel's run-to-run jitter (round-5 measured a negative
    # slope); longer loops keep it well above
    slope(op.vshape, "1 rhs", Ks=(200, 1000))
    nrhs = 64
    print(f"fused levels: {sorted(precond.fused_levels)}", flush=True)
    slope((nrhs,) + op.vshape, f"{nrhs} rhs", n=nrhs)
    nrhs = 256
    slope((nrhs,) + op.vshape, f"{nrhs} rhs", n=nrhs)


if __name__ == "__main__":
    main()
