"""Biharmonic (13-point squared shifted-Laplace) MGMC throughput on TPU:
fused 5-colour visits vs the composed XLA path (VERDICT r4 #8).

The fused level-visit kernels have no width-1 assumption - ``_shifted``
rolls by any offset and the 5-colouring covers the diamond stencil
(``squared_shiftedlaplace_fd_operator.cc:58-93``); exactness is gated by
tests/test_mgmc_visit.py::test_biharmonic_visits_match_composed.  This
script records whether fusion PAYS on the 13-point stencil at bench scale.

Problem: 2d 256^2 biharmonic posterior (Lambda=0.2, 8 near-exact point
measurements), 5-level W-cycle MGMC / SOR.  Run as the sole TPU client.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

NX, NLEVEL, CYCLE, NCHAINS = 256, 5, 2, 256
K1, K2 = 10, 40


def main():
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    import jax
    import jax.numpy as jnp

    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import (
        MeasurementParameters,
        measured_operator,
    )
    from multigridmc_tpu.models.prior import squared_shiftedlaplace_fd
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        lattice = Lattice((NX, NX))
        prior = squared_shiftedlaplace_fd(
            lattice, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
        rng = np.random.default_rng(20260820)
        op = measured_operator(
            prior,
            MeasurementParameters(
                measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
                mean=rng.normal(size=8),
                variance=1e-6 * (1.0 + rng.uniform(size=8)),
            ),
        )
        samplers = {
            "fused": MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                        cycle=CYCLE, fused=True),
            "composed": MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                           cycle=CYCLE, fused=False),
        }
    log(f"setup done: {op.lattice.nvertex} unknowns; fused levels "
        f"{sorted(samplers['fused'].fused_levels)}, distill "
        f"{samplers['fused'].distill_level}")

    dev = jax.devices()[0]
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), jnp.float32),
                       dev)
    x0 = jax.device_put(jnp.zeros((NCHAINS,) + op.vshape, jnp.float32), dev)
    results = {}
    for name, sampler in samplers.items():
        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(key, n, sampler=sampler):
            def step(x, k):
                return sampler.apply(jax.random.fold_in(key, k), f, x), 0.0

            x, _ = jax.lax.scan(step, x0, jnp.arange(n))
            return x

        ts = {}
        for K in (K1, K2):
            x = run(sampling_key(0), K)
            float(x.ravel()[0])
            best = []
            for i in range(3):
                t1 = time.perf_counter()
                float(run(sampling_key(1 + 10 * K + i), K).ravel()[0])
                best.append(time.perf_counter() - t1)
            ts[K] = sorted(best)[1]
            assert bool(jnp.isfinite(x).all())
        dt = (ts[K2] - ts[K1]) / (K2 - K1)
        results[name] = {"ms_per_step": round(dt * 1e3, 3),
                         "samples_per_sec": round(NCHAINS / dt, 1)}
        log(f"{name}: {dt*1e3:.3f} ms/step, {NCHAINS/dt:,.0f} samples/s")
    if "fused" in results and "composed" in results:
        results["fused_speedup"] = round(
            results["composed"]["ms_per_step"]
            / results["fused"]["ms_per_step"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
