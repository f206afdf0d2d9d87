"""Direct Cholesky solvers.

TPU-native counterpart of ``src/solver/cholesky_solver.{hh,cc}`` plus the
factorisation backends of ``src/auxilliary/cholesky_wrapper.{hh,cc}``.  On TPU
there is no supernodal sparse LLT; the design (SURVEY.md section 7) is:

* coarse-level / small systems: **dense** on-device Cholesky (the only place the
  reference ever factorises inside multigrid is the tiny coarsest level,
  ``multigridmc_sampler.cc:99``);
* large standalone baselines: **banded** Cholesky - lattice operators in
  lexicographic order have bandwidth ~ prod of the minor grid extents, so a
  band factorisation is O(n b^2) at setup with O(n b) storage (see
  :mod:`multigridmc_tpu.samplers.cholesky`).

The low-rank term is handled by the precomputed Woodbury correction exactly as
``cholesky_solver.cc:8-44``: ``B_bar = A^{-1} B (Sigma + B^T A^{-1} B)^{-1}``,
``x = y - B_bar B^T y`` with ``y = A^{-1} b``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencil import StencilOperator


class DenseCholeskySolver:
    """Dense LLT solve of the stencil part + Woodbury low-rank correction."""

    def __init__(self, op: StencilOperator):
        self.op = op
        dtype = op.coeffs.dtype
        A = jnp.asarray(op.to_dense_stencil(), dtype=dtype)
        self.L = jnp.linalg.cholesky(A)
        self.B_bar = None
        if op.lowrank is not None:
            B = op.lowrank.B.reshape(op.m_lowrank, -1).T  # (n, m)
            Ainv_B = jax.scipy.linalg.cho_solve((self.L, True), B)
            S = jnp.diag(op.lowrank.Sigma_diag) + B.T @ Ainv_B
            self.B_bar = Ainv_B @ jnp.linalg.inv(S)  # (n, m)
            self.B_flat = B

    def apply(self, b: jax.Array) -> jax.Array:
        """Solve ``A x = b`` for a grid field b (cf. ``cholesky_solver.cc:28-44``)."""
        shape = b.shape
        y = jax.scipy.linalg.cho_solve((self.L, True), b.reshape(-1))
        if self.B_bar is not None:
            y = y - self.B_bar @ (self.B_flat.T @ y)
        return y.reshape(shape)
