"""Benchmark: MGMC sampling throughput on TPU vs the reference-equivalent CPU baseline.

Prints ONE JSON line:
    {"metric": "mgmc_samples_per_sec", "value": ..., "unit": "samples/s", "vs_baseline": ...}

Problem (BASELINE.json config 2/3 scaled to production size): 2d 256x256 lattice,
shifted-Laplace FD prior (Lambda=0.2), posterior with 8 point measurements
(variance ~1e-6, like measurements_template.cfg), MGMC with 5 levels (the
measured optimum), W-cycle, SOR smoothing - the flagship sampler of the
reference (``src/driver_mgmc.cc``).

* TPU path: float32, batched independent chains (the TPU-native way to produce
  samples; every chain is a statistically valid MCMC chain) + single-chain
  latency for a like-for-like comparison.
* Baseline: ``native/baseline_mgmc.cc`` - a single-core C++ re-creation of the
  reference's CSR hot path (the reference itself cannot be built here: its
  Eigen/libconfig deps are unavailable offline), float64 like the reference,
  same hierarchy exported via ``multigridmc_tpu.utils.baseline_export``.
  Measured once and cached in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / "BASELINE_MEASURED.json"

NX = 256
NLEVEL = 5
CYCLE = 2
# chain count is a throughput knob (each chain is an independent MCMC chain);
# the default is the measured throughput optimum on v5e
NCHAINS = int(os.environ.get("MGMC_BENCH_NCHAINS", "256"))
# two-length slope timing: the axon tunnel adds a large fixed per-call cost
# (~30 ms) to every dispatched program, so per-call timing measures the tunnel,
# not the sampler.  T(n2)-T(n1) over (n2-n1) steps cancels the constant and
# reports true steady-state device throughput (a production chain runs
# thousands of steps per dispatch anyway).
NSTEPS_BATCHED = (25, 100)
NSTEPS_SINGLE = (100, 400)


def build_problem(dtype=None):
    import jax.numpy as jnp

    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
    from multigridmc_tpu.models.prior import shiftedlaplace_fd

    lattice = Lattice((NX, NX))
    prior = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2), dtype=dtype)
    rng = np.random.default_rng(20260816)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
        mean=rng.normal(2.0, 1.0, size=8),
        variance=1e-6 * (1.0 + rng.uniform(size=8)),
    )
    return measured_operator(prior, params)


def measure_tpu():
    import jax
    import jax.numpy as jnp

    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import sampling_key

    # assembly / Galerkin coarsening / Woodbury+Cholesky setup on the host CPU:
    # eager per-primitive dispatch to a remote TPU is latency-bound (setup math
    # is tiny); the jitted sampling step pulls the constants to the device once.
    with jax.default_device(jax.devices("cpu")[0]):
        op = build_problem()
        dtype = op.coeffs.dtype
        sampler = MultigridMCSampler(
            op, nlevel=NLEVEL, smoother="SOR", coarse_solver="Cholesky",
            omega=1.0, cycle=CYCLE,
        )
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), dtype=dtype), dev)

    def chain(x, key, nsteps):
        def step(x, k):
            return sampler.apply(jax.random.fold_in(key, k), f, x), 0.0

        x, _ = jax.lax.scan(step, x, jnp.arange(nsteps))
        return x

    def slope_seconds_per_step(x0, n1, n2):
        """Median-of-3 two-length slope; returns (s/step, fixed s/call)."""
        runs = {n: jax.jit(lambda x, key, n=n: chain(x, key, n)) for n in (n1, n2)}
        ts = {}

        def force(x):
            # a scalar host read forces remote completion (block_until_ready
            # does not reliably block on the tunnel for all program classes);
            # its fixed cost cancels in the slope
            return float(x.ravel()[0])

        for n, run in runs.items():
            x = run(x0, sampling_key(n))  # compile + warmup
            force(x)
            samples = []
            for i in range(3):
                t0 = time.perf_counter()
                force(run(x0, sampling_key(10 * n + i)))
                samples.append(time.perf_counter() - t0)
            ts[n] = sorted(samples)[1]
        per_step = (ts[n2] - ts[n1]) / (n2 - n1)
        return per_step, ts[n1] - n1 * per_step, runs[n2]

    results = {}
    # single chain
    x1 = jax.device_put(jnp.zeros(op.vshape, dtype=dtype), dev)
    dt, fixed1, run1 = slope_seconds_per_step(x1, *NSTEPS_SINGLE)
    results["single_chain_ms_per_sample"] = 1e3 * dt
    results["single_chain_samples_per_sec"] = 1.0 / dt
    results["fixed_ms_per_dispatch"] = round(1e3 * fixed1, 3)
    x1 = run1(x1, sampling_key(1))

    # batched chains
    xb = jax.device_put(jnp.zeros((NCHAINS,) + op.vshape, dtype=dtype), dev)
    dtb, _, runb = slope_seconds_per_step(xb, *NSTEPS_BATCHED)
    results["batched_samples_per_sec"] = NCHAINS / dtb
    results["nchains"] = NCHAINS
    xb = runb(xb, sampling_key(4))

    # sanity: finite samples
    assert bool(jnp.isfinite(xb).all()), "non-finite samples"
    results["platform"] = jax.default_backend()
    results["dtype"] = str(dtype)
    return results


def measure_baseline():
    """Compile and run the native reference-equivalent baseline in a CPU/f64
    subprocess (the reference is single-core float64); cached across runs."""
    if BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        if (
            cached.get("nx") == NX
            and cached.get("nlevel") == NLEVEL
            and cached.get("cycle") == CYCLE
        ):
            return cached
    out = subprocess.run(
        [sys.executable, "-m", "multigridmc_tpu.utils.baseline_export",
         str(NX), str(NLEVEL), str(CYCLE), "5", "50"],
        check=True, capture_output=True, text=True, cwd=str(REPO), timeout=1200,
    )
    result = json.loads(out.stdout.strip().splitlines()[-1])
    result["cycle"] = CYCLE
    BASELINE_CACHE.write_text(json.dumps(result, indent=1))
    return result


def main():
    os.environ.setdefault("MGMC_X64", "0")
    from multigridmc_tpu.utils.runtime import configure_runtime

    configure_runtime(default_x64=False)

    baseline = None
    try:
        baseline = measure_baseline()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"# baseline measurement failed: {e}", file=sys.stderr)

    tpu = measure_tpu()

    value = tpu["batched_samples_per_sec"]
    vs_baseline = None
    if baseline and baseline.get("samples_per_sec"):
        vs_baseline = value / baseline["samples_per_sec"]

    record = {
        "metric": "mgmc_samples_per_sec",
        "value": round(value, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
        "detail": {
            "problem": f"2d {NX}x{NX} posterior, {NLEVEL}-level W-cycle MGMC, SOR",
            "tpu": {k: (round(v, 4) if isinstance(v, float) else v) for k, v in tpu.items()},
            "baseline_cpu": baseline,
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
