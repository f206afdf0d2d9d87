"""3d MGMC throughput on TPU (BASELINE.json config 4 scale).

Problem: 3d 64^3 lattice (250,047 unknowns - 3.8x the 2d bench), shifted-Laplace
FD prior, posterior with 8 point measurements, 4-level V-cycle MGMC with SOR
smoothing.  Run as the sole TPU client.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from multigridmc_tpu.utils.runtime import sampling_key

import os

NX = int(os.environ.get("MGMC_BENCH3D_NX", "64"))
NLEVEL = int(os.environ.get("MGMC_BENCH3D_NLEVEL", "4"))
CYCLE = 2
NCHAINS = int(os.environ.get("MGMC_BENCH3D_NCHAINS", "32"))
# two-length device-loop slope (the axon tunnel adds ~30 ms per dispatch;
# see NOTES_R2.md "LATE-ROUND CORRECTION")
K1, K2 = 10, 40


def main():
    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
    from multigridmc_tpu.models.prior import shiftedlaplace_fd
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        lattice = Lattice((NX, NX, NX))
        prior = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
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
    log(f"setup done: {op.lattice.nvertex} unknowns, backend={jax.default_backend()}")

    dev = jax.devices()[0]
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), dtype=jnp.float32), dev)

    chain_counts = ((1, NCHAINS)
                    if os.environ.get("MGMC_BENCH3D_SINGLE", "1") == "1"
                    else (NCHAINS,))
    for nchains in chain_counts:
        shape = ((nchains,) if nchains > 1 else ()) + op.vshape

        def make(K):
            @jax.jit
            def run(x, key):
                def step(x, k):
                    return sampler.apply(jax.random.fold_in(key, k), f, x), 0.0

                x, _ = jax.lax.scan(step, x, jnp.arange(K))
                return x

            return run

        x0 = jax.device_put(jnp.zeros(shape, dtype=jnp.float32), dev)
        ts = {}
        for K in (K1, K2):
            run = make(K)
            x = run(x0, sampling_key(0))
            float(x.ravel()[0])  # scalar read forces remote completion
            best = float("inf")
            for i in range(3):
                t1 = time.perf_counter()
                float(run(x0, sampling_key(1 + i)).ravel()[0])
                best = min(best, time.perf_counter() - t1)
            ts[K] = best
            assert bool(jnp.isfinite(x).all())
        dt = (ts[K2] - ts[K1]) / (K2 - K1)
        log(
            f"nchains={nchains}: {nchains / dt:.1f} samples/s "
            f"({dt * 1e3:.2f} ms/step, slope; fused levels: "
            f"{sorted(sampler.fused_levels)}, distill level: "
            f"{sampler.distill_level})"
        )


if __name__ == "__main__":
    main()
