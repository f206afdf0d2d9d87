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
        """Solve ``A x = b`` for a grid field b, supporting leading batch dims
        (cf. ``cholesky_solver.cc:28-44``)."""
        shape = b.shape
        vdim = len(self.op.vshape)
        n = self.L.shape[0]
        bf = b.reshape((-1, n)).T  # (n, nbatch)
        y = jax.scipy.linalg.cho_solve((self.L, True), bf)
        if self.B_bar is not None:
            y = y - self.B_bar @ (self.B_flat.T @ y)
        return y.T.reshape(shape)


class BandCholeskySolver:
    """Band ("sparse") direct solver for large lattice systems on host.

    Counterpart of the reference's CholMod-backed ``CholeskySolver``
    (``cholesky_solver.cc:8-44``) for problems too large to densify: the
    lexicographic band factorisation is the exact sparse factor for lattice
    operators (all fill-in stays inside the band).  The low-rank term is handled
    with the same precomputed Woodbury correction.
    """

    def __init__(self, op: StencilOperator):
        import scipy.linalg
        import dataclasses as _dc

        from ..samplers.cholesky import _band_matrix

        self.op = op
        stencil_only = _dc.replace(op, lowrank=None)
        ab, self.bandwidth = _band_matrix(stencil_only)
        self.cb = scipy.linalg.cholesky_banded(ab, lower=True)
        self._scipy = scipy.linalg
        self.B_bar = None
        if op.lowrank is not None:
            m = op.m_lowrank
            B = np.asarray(op.lowrank.B, dtype=np.float64).reshape(m, -1).T  # (n, m)
            Ainv_B = self._solveh(B)
            S = np.diag(np.asarray(op.lowrank.Sigma_diag, dtype=np.float64)) + B.T @ Ainv_B
            self.B_bar = Ainv_B @ np.linalg.inv(S)
            self.B_flat = B

    def _solveh(self, v):
        g = self._scipy.solve_banded((self.bandwidth, 0), self.cb, v)
        b, n = self.bandwidth, self.cb.shape[1]
        ub = np.zeros((b + 1, n))
        for k in range(b + 1):
            ub[b - k, k:] = self.cb[k, : n - k]
        return self._scipy.solve_banded((0, b), ub, g)

    def apply(self, b):
        shape = b.shape
        y = self._solveh(np.asarray(b, dtype=np.float64).reshape(-1))
        if self.B_bar is not None:
            y = y - self.B_bar @ (self.B_flat.T @ y)
        import jax.numpy as jnp

        return jnp.asarray(y.reshape(shape), dtype=self.op.coeffs.dtype)
