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

NX = 64
NLEVEL = 4
CYCLE = 2
NCHAINS = 32
K = 10


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

    for nchains in (1, NCHAINS):
        shape = ((nchains,) if nchains > 1 else ()) + op.vshape

        @jax.jit
        def run(x, key):
            def step(x, k):
                return sampler.apply(jax.random.fold_in(key, k), f, x), 0.0

            x, _ = jax.lax.scan(step, x, jnp.arange(K))
            return x

        x = jax.device_put(jnp.zeros(shape, dtype=jnp.float32), dev)
        x = run(x, sampling_key(0))
        jax.block_until_ready(x)
        log(f"nchains={nchains}: compiled")
        t1 = time.perf_counter()
        x = run(x, sampling_key(1))
        jax.block_until_ready(x)
        dt = time.perf_counter() - t1
        assert bool(jnp.isfinite(x).all())
        log(
            f"nchains={nchains}: {nchains * K / dt:.1f} samples/s "
            f"({dt / K * 1e3:.2f} ms/step)"
        )


if __name__ == "__main__":
    main()
