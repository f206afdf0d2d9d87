"""Smoother sweep throughput on TPU - the "nnz/s per chip" north-star metric.

One multi-colour SOR sweep of a K-colour stencil performs K masked stencil
applications; the useful work per sweep is K * nnz multiply-adds over nnz =
n_offsets * n nonzeros.  The sweep is memory-bound: the speed-of-light estimate
on one chip is

    t_sol ~ K * passes * bytes_per_pass / HBM_bandwidth

where a pass streams x, the coefficient planes, b and the output.  This script
measures the fused Pallas sweep (single-tile sizes) and the pure-JAX/XLA sweep
(any size, incl. batched), and reports effective nnz/s.

Run as the sole TPU client: ``python native/bench_smoother_tpu.py``.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def slope_ms(step, b, x, n1=20, n2=80):
    """Two-length device-loop slope: the tunnel adds a ~30 ms fixed per-call
    cost, so per-call timing measures the constant (NOTES_R2.md)."""
    def make(K):
        @jax.jit
        def run(b, x):
            return jax.lax.fori_loop(0, K, lambda _, x: step(b, x), x)

        return run

    ts = {}
    xs = [x * (1.0 + 1e-6 * i) for i in range(4)]  # distinct inputs per rep
    for K in (n1, n2):
        run = make(K)
        float(run(b, xs[3]).ravel()[0])  # scalar read forces completion
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(run(b, xs[i]).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.prior import shiftedlaplace_fd, shiftedlaplace_fem
    from multigridmc_tpu.ops.coloring import coloring_for
    from multigridmc_tpu.ops.kernels.sor_pallas import fused_sor_sweep, supports
    from multigridmc_tpu.ops.kernels.sor_pallas_v2 import supports_v2, sweep_batched_v2
    from multigridmc_tpu.smoothers import sor_sweep

    print(f"backend: {jax.default_backend()}")
    results = []
    for assemble, name in ((shiftedlaplace_fd, "fd5"), (shiftedlaplace_fem, "fem9")):
        for nx, batch in ((256, 1), (384, 1), (1024, 1), (2048, 1), (256, 64), (512, 16)):
            with jax.default_device(jax.devices("cpu")[0]):
                lat = Lattice((nx, nx))
                op = assemble(lat, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
                coloring = coloring_for(op.offsets, op.vshape)
            order = tuple(range(coloring.n_colors))
            masks = jnp.asarray(coloring.masks(), dtype=jnp.float32)
            rng = np.random.default_rng(0)
            shape = ((batch,) if batch > 1 else ()) + op.vshape
            b = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
            x = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
            dev = jax.devices()[0]
            b, x = jax.device_put(b, dev), jax.device_put(x, dev)
            coeffs = jax.device_put(op.coeffs, dev)
            n = op.lattice.nvertex * batch
            nnz = n * len(op.offsets)

            kw = dict(offsets=op.offsets, diag_index=op.diag_index, omega=1.0,
                      order=order, color_weights=coloring.weights,
                      n_colors=coloring.n_colors)

            # scale loop lengths so the slope signal clears timing noise on
            # small shapes (aim for >= ~50 ms of device time at length n2)
            n2 = max(80, min(4000, int(3e9 / max(nnz, 1))))
            n1 = n2 // 4
            slope = lambda step: slope_ms(step, b, x, n1=n1, n2=n2)

            t = slope(lambda b, x: sor_sweep(op, masks, 1.0, order, b, x))
            results.append((name, nx, batch, "xla", t, coloring.n_colors * nnz / t))

            if batch == 1 and supports(op.vshape, jnp.float32, len(op.offsets), 1):
                t = slope(lambda b, x: fused_sor_sweep(coeffs, b, x, **kw))
                results.append((name, nx, batch, "pallas", t,
                                coloring.n_colors * nnz / t))
            if batch > 1 and supports_v2(op.vshape, jnp.float32, len(op.offsets)):
                t = slope(lambda b, x: sweep_batched_v2(coeffs, b, x, **kw))
                results.append((name, nx, batch, "pallas-v2", t,
                                coloring.n_colors * nnz / t))

    print(f"{'stencil':>8} {'nx':>5} {'batch':>5} {'path':>7} {'ms/sweep':>9} {'Gnnz/s':>8}")
    for name, nx, batch, path, t, rate in results:
        print(f"{name:>8} {nx:>5} {batch:>5} {path:>7} {t * 1e3:9.3f} {rate / 1e9:8.2f}")


if __name__ == "__main__":
    main()
