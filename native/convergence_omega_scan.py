"""Scan of SOR relaxation omega and colour-schedule variants for the MGMC
warmup convergence rate.

docs/CONVERGENCE.md measures the colored order's per-step contraction of
q_j = |E[z_j] - E[z]| at 0.776 vs lexicographic 0.685 (a 1.5x warmup factor)
at the reference defaults (omega = 1).  This script asks whether tuning
closes the gap, using the reference's own diagnostic (``measure_convergence``,
``driver_mgmc.cc:188-314``) on the same problem (2d 32x32 FD posterior with
8 near-exact measurements, 4-level W-cycle MGMC/SOR, 20k replica chains):

* omega scan: the stationary distribution is exact for ANY omega in (0, 2)
  (the Gibbs noise scale ``sqrt(D (2-omega)/omega)`` compensates,
  ``sor_sampler.cc:39-46``), so omega is a free convergence knob;
* alternating colour schedule: even steps sweep colours forward-pre /
  backward-post, odd steps the reverse - a step-dependent composition of
  kernels with the same invariant distribution (still a valid MCMC).

Writes a markdown table to stdout (captured into docs/CONVERGENCE.md).
CPU float64; runs in tens of minutes.
"""

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
OMEGAS = (0.8, 0.9, 1.0, 1.1, 1.2, 1.4, 1.6)


def main():
    from native.convergence_compare import build_problem
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    op = build_problem()
    n = op.lattice.nvertex
    c = n // 2
    Q = op.to_dense()
    cov = np.linalg.inv(Q)
    rng = np.random.default_rng(1482817)
    f = rng.standard_normal(n)
    exact_mean = float((cov @ f)[c])
    exact_var = float(cov[c, c])
    mean_floor = np.sqrt(exact_var / NREPLICA)
    print(f"exact: E[z] = {exact_mean:.6f}, Var[z] = {exact_var:.6e}; "
          f"mean floor ~{mean_floor:.1e}", file=sys.stderr)

    fj = jnp.asarray(f.reshape(op.vshape))
    key = jax.random.PRNGKey(2813741)

    def chain_qmean(samplers):
        """q_mean per step for a (possibly alternating) sampler schedule."""
        @jax.jit
        def run(key):
            x = jnp.zeros((NREPLICA,) + op.vshape)
            zs = []
            for j in range(NSTEPS):
                sam = samplers[j % len(samplers)]
                x = sam.apply(jax.random.fold_in(key, j), fj, x)
                zs.append(x.reshape(NREPLICA, -1)[:, c])
            return jnp.stack(zs)

        zs = np.asarray(run(key))
        return np.abs(zs.mean(axis=1) - exact_mean)

    def rate(q):
        qs = [v for v in q if v > 5 * mean_floor]
        if len(qs) < 2:
            return float("nan")
        return float(np.median([qs[i + 1] / qs[i] for i in range(len(qs) - 1)]))

    rows = []
    for omega in OMEGAS:
        sam = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                                 omega=omega, cycle=CYCLE)
        q = chain_qmean([sam])
        rows.append((f"SOR omega={omega}", q))
        print(f"omega={omega}: rate={rate(q):.3f}", file=sys.stderr, flush=True)

    # alternating direction schedule at the best-looking omegas
    for omega in (1.0, 1.2, 1.4):
        a = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                               omega=omega, cycle=CYCLE)
        b = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SOR",
                               omega=omega, cycle=CYCLE)
        # swap pre/post role: odd steps presample backward, postsample forward
        b.presamplers, b.postsamplers = b.postsamplers, b.presamplers
        q = chain_qmean([a, b])
        rows.append((f"alternating omega={omega}", q))
        print(f"alternating omega={omega}: rate={rate(q):.3f}",
              file=sys.stderr, flush=True)

    # SSOR smoother for completeness (two directed sweeps per visit)
    sam = MultigridMCSampler(op, nlevel=NLEVEL, smoother="SSOR",
                             omega=1.0, cycle=CYCLE)
    q = chain_qmean([sam])
    rows.append(("SSOR omega=1.0", q))
    print(f"SSOR omega=1.0: rate={rate(q):.3f}", file=sys.stderr, flush=True)

    print(f"Problem: 2d {NX}x{NX} FD posterior (8 near-exact measurements), "
          f"{NLEVEL}-level W-cycle MGMC, {NREPLICA} replica chains; "
          f"colored order, CPU float64.")
    print()
    print("| variant | " + " | ".join(f"q_{j + 1}" for j in range(6))
          + " | median rate |")
    print("|---|" + "---|" * 7)
    for name, q in rows:
        cells = " | ".join(f"{q[j]:.2e}" for j in range(6))
        print(f"| {name} | {cells} | {rate(q):.3f} |")


if __name__ == "__main__":
    main()
