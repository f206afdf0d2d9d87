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

    K = 20

    @jax.jit
    def run(b):
        def body(_, x):
            return x - precond.apply(op.apply(x) - b)

        x = jax.lax.fori_loop(0, K, body, jnp.zeros_like(b))
        return x, jnp.linalg.norm(op.apply(x) - b) / jnp.linalg.norm(b)

    x, red = run(b)
    jax.block_until_ready(x)
    # time over several calls with *different* rhs to defeat any caching/CSE
    nrep = 5
    bs = [
        jax.device_put(jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32), dev)
        for _ in range(nrep)
    ]
    for bb_ in bs:
        jax.block_until_ready(bb_)
    # per-call sync; discard the first timed rep (async completion race on the
    # remote transport makes it report ~0)
    times = []
    for bb_ in bs:
        t0 = time.perf_counter()
        x, red = run(bb_)
        jax.block_until_ready(x)
        jax.block_until_ready(red)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times[1:]))
    print(
        f"tpu deterministic MG: {dt / K * 1e3:.3f} ms/cycle, "
        f"residual reduction {float(red):.3e} over {K} cycles "
        f"(from x=0; float32 floor ~1e-6)"
    )

    # batched right-hand sides: the production way to run many solves
    nrhs = 64
    bb = jax.device_put(
        jnp.asarray(rng.normal(size=(nrhs,) + op.vshape), dtype=jnp.float32), dev
    )

    @jax.jit
    def runb(b):
        def body(_, x):
            return x - precond.apply(op.apply(x) - b)

        return jax.lax.fori_loop(0, K, body, jnp.zeros_like(b))

    xb = runb(bb)
    jax.block_until_ready(xb)
    t0 = time.perf_counter()
    xb = runb(bb)
    jax.block_until_ready(xb)
    dt = time.perf_counter() - t0
    print(f"tpu deterministic MG, {nrhs} rhs: {dt / K * 1e3:.2f} ms/cycle-batch "
          f"({nrhs * K / dt:.0f} cycle-solves/s)")


if __name__ == "__main__":
    main()
