"""Colored vs lexicographic MGMC convergence-rate comparison.

The multi-colour sweep order is the one algorithmic deviation from the
reference (its lexicographic SOR loop is inherently sequential,
``sor_smoother.cc:56-78``).  The stationary distribution is provably identical
for any fixed sweep order; what can differ is the *convergence rate* to
stationarity.  The reference's own diagnostic for this is
``measure_convergence`` (``driver_mgmc.cc:188-314``): run many replica chains
from x = 0 and track q_j = |E[z_j] - E[z]| and |Var[z_j] - Var[z]| for the
centre-vertex observable z over the first chain steps.

This script produces that table for BOTH sweep orders on the same problem
(2d 32x32 shifted-Laplace FD posterior with 8 near-exact measurements,
4-level W-cycle MGMC/SOR, the reference's default experiment scale):

* lexicographic: ``native/baseline_mgmc.cc --convergence`` (the validated
  reference-equivalent C++ baseline, float64, true sequential sweeps);
* colored: the production multi-colour sampler, batched replica chains on
  CPU float64.

Writes the markdown table to stdout (captured into docs/CONVERGENCE.md).
CPU-only; runs in minutes.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

NX = 32
NLEVEL = 4
CYCLE = 2
NSTEPS = 12
NREPLICA = 20000


def build_problem():
    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
    from multigridmc_tpu.models.prior import shiftedlaplace_fd

    lattice = Lattice((NX, NX))
    prior = shiftedlaplace_fd(
        lattice, ConstantCorrelationLengthModel(0.2), dtype=np.float64
    )
    rng = np.random.default_rng(20260816)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
        mean=rng.normal(2.0, 1.0, size=8),
        variance=1e-6 * (1.0 + rng.uniform(size=8)),
    )
    return measured_operator(prior, params)


def main():
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.solvers.multigrid import MultigridHierarchy
    from multigridmc_tpu.utils.baseline_export import export_problem

    op = build_problem()
    hierarchy = MultigridHierarchy(op, NLEVEL)
    problem_path = "/tmp/mgmc_conv_problem.bin"
    export_problem(hierarchy, problem_path, omega=1.0, cycle=CYCLE)

    binary = "/tmp/baseline_mgmc_conv"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o", binary,
         str(REPO / "native" / "baseline_mgmc.cc")],
        check=True,
    )
    # obtain the baseline's rhs f (mt19937_64 stream, dumped to binary)
    subprocess.run(
        [binary, problem_path, "0", "1", "/tmp/mgmc_conv_dump"],
        check=True, capture_output=True,
    )
    n = op.lattice.nvertex
    f = np.fromfile("/tmp/mgmc_conv_dump_f.bin", dtype=np.float64, count=n)

    # exact posterior mean/variance of z = x[n/2] (dense, n = 961)
    Q = op.to_dense()
    cov = np.linalg.inv(Q)
    c = n // 2
    exact_mean = float((cov @ f)[c])
    exact_var = float(cov[c, c])
    print(f"exact: E[z] = {exact_mean:.6f}, Var[z] = {exact_var:.6e}",
          file=sys.stderr)

    # ---- lexicographic (C++ reference-equivalent) --------------------------
    out = subprocess.run(
        [binary, problem_path, str(NSTEPS), str(NREPLICA), "--convergence",
         repr(exact_mean), repr(exact_var)],
        check=True, capture_output=True, text=True,
    )
    lex = json.loads(out.stdout.strip())

    # ---- colored (production sampler, batched replicas) --------------------
    sampler = MultigridMCSampler(
        op, nlevel=NLEVEL, smoother="SOR", coarse_solver="Cholesky",
        omega=1.0, cycle=CYCLE,
    )
    fj = jnp.asarray(f.reshape(op.vshape))
    key = jax.random.PRNGKey(2813741)

    @jax.jit
    def run_chains(key):
        x = jnp.zeros((NREPLICA,) + op.vshape)

        def step(x, j):
            x = sampler.apply(jax.random.fold_in(key, j), fj, x)
            z = x.reshape(NREPLICA, -1)[:, c]
            return x, z

        _, zs = jax.lax.scan(step, x, jnp.arange(NSTEPS))
        return zs  # (NSTEPS, NREPLICA)

    zs = np.asarray(run_chains(key))
    col_mean = np.abs(zs.mean(axis=1) - exact_mean)
    zm = zs.mean(axis=1)
    col_var = np.abs((zs**2).mean(axis=1) - zm**2 - exact_var)

    # statistical floors: q_j estimates bottom out at the replica-count noise
    mean_floor = np.sqrt(exact_var / NREPLICA)
    var_floor = np.sqrt(2.0 / NREPLICA) * exact_var

    # ---- markdown table ----------------------------------------------------
    print(f"Problem: 2d {NX}x{NX} FD posterior (8 near-exact measurements), "
          f"{NLEVEL}-level W-cycle MGMC/SOR, {NREPLICA} replica chains.")
    print(f"Statistical floors at {NREPLICA} replicas: "
          f"~{mean_floor:.1e} (mean), ~{var_floor:.1e} (variance).")
    print()
    print("| j | q_mean lex | q_mean colored | q_var lex | q_var colored |")
    print("|---|---|---|---|---|")
    for j in range(NSTEPS):
        print(
            f"| {j + 1} | {lex['q_mean'][j]:.3e} | {col_mean[j]:.3e} "
            f"| {lex['q_var'][j]:.3e} | {col_var[j]:.3e} |"
        )
    print()

    def rate(q, floor):
        qs = [v for v in q if v > 5 * floor]
        if len(qs) < 2:
            return float("nan")
        r = [qs[i + 1] / qs[i] for i in range(len(qs) - 1)]
        return float(np.median(r))

    print(f"median contraction q_j+1/q_j (mean, above floor): "
          f"lex {rate(lex['q_mean'], mean_floor):.3f}, "
          f"colored {rate(col_mean, mean_floor):.3f}")
    print(f"median contraction q_j+1/q_j (var,  above floor): "
          f"lex {rate(lex['q_var'], var_floor):.3f}, "
          f"colored {rate(col_var, var_floor):.3f}")


if __name__ == "__main__":
    main()
