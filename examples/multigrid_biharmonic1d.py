"""Multigrid for the 1d biharmonic equation - framework demo.

Counterpart of the reference's standalone toy ``python/multigrid_biharmonic1d.py``
(which informed the 2d C++ design), rebuilt on the framework: the 1d biharmonic
operator is just a custom 5-point ``StencilOperator``, and the multigrid solver
stack (multi-colour smoothers, Galerkin probing, V/W-cycle, Richardson loop)
works on it unchanged.

Run: ``python examples/multigrid_biharmonic1d.py [n]``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.ops.stencil import StencilOperator
from multigridmc_tpu.solvers.loop import IterativeSolverParameters, LoopSolver
from multigridmc_tpu.solvers.multigrid import MultigridPreconditioner


def biharmonic_1d(n: int) -> StencilOperator:
    """u'''' with clamped (Dirichlet-on-function-and-derivative-ish) boundary:
    5-point stencil [1, -4, 6, -4, 1] / h^4, entries outside the grid dropped
    (cf. the toy's ``discretisation_matrix``)."""
    lattice = Lattice((n,))
    m = lattice.nvertex
    h4 = float(n) ** 4
    coeffs = jnp.stack(
        [
            jnp.full((m,), 1.0 * h4),
            jnp.full((m,), -4.0 * h4),
            jnp.full((m,), 6.0 * h4),
            jnp.full((m,), -4.0 * h4),
            jnp.full((m,), 1.0 * h4),
        ]
    )
    return StencilOperator(
        coeffs=coeffs,
        offsets=((-2,), (-1,), (0,), (1,), (2,)),
        lattice=lattice,
    ).normalized()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    op = biharmonic_1d(n)
    nlevel = 4
    precond = MultigridPreconditioner(
        op, nlevel=nlevel, smoother="SSOR", npresmooth=4, npostsmooth=4, cycle=2
    )
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=op.vshape))
    solver = LoopSolver(
        op, precond, IterativeSolverParameters(rtol=1e-10, atol=1e-30, maxiter=30, verbose=0)
    )
    result = solver.solve(b)
    h = result.rnorm_history
    rates = [h[k + 1] / h[k] for k in range(1, min(len(h) - 1, 10))]
    print(f"converged={result.converged} after {result.niter} W-cycles, "
          f"contraction rho ~ {np.median(rates):.3f}")
    print("(point-smoother multigrid is a weak solver for the biharmonic "
          "operator - the same finding as the reference toy; the 2d production "
          "path treats (-Lap+k^2)^2 only as a sampling precision operator)")


if __name__ == "__main__":
    main()
