"""Direct (exact) samplers via Cholesky factorisation of the precision matrix.

TPU-native counterpart of ``src/sampler/cholesky_sampler.{hh,cc}``.  Given the
full precision ``Q = A_stencil + B Sigma^{-1} B^T = U^T U``, a sample is

    1. xi ~ N(0, I)
    2. solve U^T g = f            (cacheable via fix_rhs, cholesky_sampler.hh:77-92)
    3. solve U x = xi + g         (cholesky_sampler.hh:50-66)

Backends (replacing the CholMod/Eigen switch of ``cholesky_wrapper.hh:103-109``):

* :class:`DenseCholeskySampler` - dense on-device LLT; the right tool for the
  (tiny) coarse multigrid level and for small/medium standalone problems.
* :class:`BandCholeskySampler` ("sparse" factorisation) - lattice precision
  matrices in lexicographic order are banded with bandwidth b = prod of the
  minor extents; a host-side band Cholesky gives an O(n b) factor (the band
  contains all fill-in, so this *is* the exact sparse factor) with O(n b^2)
  setup.  Solves currently run on host; this sampler is the exactness baseline
  the MGMC sampler is compared against, not the production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..ops.stencil import StencilOperator
from .base import Sampler


def _split_batch(op: StencilOperator, f: jax.Array):
    vdim = len(op.vshape)
    batch = f.shape[: f.ndim - vdim]
    n = int(np.prod(op.vshape))
    return batch, n


class DenseCholeskySampler(Sampler):
    """cf. ``DenseCholeskySampler`` (``cholesky_sampler.cc:26-38``): densify the
    full precision (incl. low-rank) and factorise once at setup."""

    def __init__(self, op: StencilOperator):
        super().__init__(op)
        dtype = op.coeffs.dtype
        Q = jnp.asarray(op.to_dense(), dtype=dtype)
        self.L = jnp.linalg.cholesky(Q)  # Q = L L^T, i.e. U = L^T
        self._g = None

    def _solve_L(self, v: jax.Array) -> jax.Array:
        """Solve U^T g = v, i.e. L g = v; v shape (*batch, n) with any number
        of leading batch axes (flattened to one for the triangular solve)."""
        vt = jnp.atleast_2d(v).reshape(-1, v.shape[-1]).T  # (n, batch)
        g = jax.scipy.linalg.solve_triangular(self.L, vt, lower=True)
        return g.T.reshape(v.shape)

    def _solve_LT(self, v: jax.Array) -> jax.Array:
        """Solve U x = v, i.e. L^T x = v."""
        vt = jnp.atleast_2d(v).reshape(-1, v.shape[-1]).T
        y = jax.scipy.linalg.solve_triangular(self.L.T, vt, lower=False)
        return y.T.reshape(v.shape)

    def fix_rhs(self, f: jax.Array) -> None:
        batch, n = _split_batch(self.op, f)
        self._g = self._solve_L(f.reshape(batch + (n,)))

    def unfix_rhs(self) -> None:
        self._g = None

    def apply(self, key: jax.Array, f: jax.Array, x: jax.Array) -> jax.Array:
        batch, n = _split_batch(self.op, x)
        fbatch, _ = _split_batch(self.op, f)
        xi = jax.random.normal(key, batch + (n,), dtype=x.dtype)
        g = self._g if self._g is not None else self._solve_L(f.reshape(fbatch + (n,)))
        y = self._solve_LT(xi + g)  # broadcasts g over the chain batch
        return y.reshape(x.shape)


def _band_matrix(op: StencilOperator):
    """Lower band storage ``ab[i, j] = Q[j + i, j]`` of the full precision."""
    Q = op.to_dense()  # host-side, setup only
    n = Q.shape[0]
    vshape = op.vshape
    strides = np.cumprod([1] + list(reversed(vshape)))[:-1][::-1]  # array-order strides
    b = int(max(abs(int(np.dot(off, strides))) for off in op.offsets))
    if op.lowrank is not None:
        # dense measurement columns can widen the band up to full
        nz = np.nonzero(np.any(np.abs(np.asarray(op.lowrank.B).reshape(op.m_lowrank, -1)) > 0, axis=0))[0]
        if len(nz):
            b = max(b, int(nz.max() - nz.min()))
    ab = np.zeros((b + 1, n))
    for i in range(b + 1):
        ab[i, : n - i] = np.diagonal(Q, -i)
    return ab, b


class BandCholeskySampler(Sampler):
    """Band ("sparse") Cholesky sampler, cf. ``SparseCholeskySampler``
    (``cholesky_sampler.cc:9-23``)."""

    def __init__(self, op: StencilOperator):
        super().__init__(op)
        ab, self.bandwidth = _band_matrix(op)
        self.cb = scipy.linalg.cholesky_banded(ab, lower=True)  # L band: cb[k,j] = L[j+k,j]
        self._g = None
        self._dtype = np.asarray(op.coeffs).dtype
        # upper band form of U = L^T for solve_banded((0, b), ...)
        b, n = self.bandwidth, self.cb.shape[1]
        ub = np.zeros((b + 1, n))
        for k in range(b + 1):
            ub[b - k, k:] = self.cb[k, : n - k]
        self.ub = ub

    def _solve_L(self, v: np.ndarray) -> np.ndarray:
        """Solve L g = v (v may be (n,) or (n, k))."""
        return scipy.linalg.solve_banded((self.bandwidth, 0), self.cb, v)

    def _solve_LT(self, v: np.ndarray) -> np.ndarray:
        """Solve L^T x = v."""
        return scipy.linalg.solve_banded((0, self.bandwidth), self.ub, v)

    def fix_rhs(self, f) -> None:
        self._g = self._solve_L(np.asarray(f, dtype=np.float64).reshape(-1))

    def unfix_rhs(self) -> None:
        self._g = None

    def apply(self, key: jax.Array, f: jax.Array, x: jax.Array) -> jax.Array:
        batch, n = _split_batch(self.op, x)
        xi = np.asarray(jax.random.normal(key, batch + (n,), dtype=jnp.float64))
        if batch:
            if self._g is not None:
                # fixed rhs: the cached g = L^{-1} f broadcasts over the batch
                y = self._solve_LT(xi.reshape(-1, n).T + self._g[:, None])
            else:
                f_np = np.broadcast_to(
                    np.asarray(f, dtype=np.float64), x.shape
                ).reshape(-1, n)
                g = self._solve_L(f_np.T)  # (n, k)
                y = self._solve_LT(xi.reshape(-1, n).T + g)
            y = y.T.reshape(batch + (n,))
        else:
            f_np = np.asarray(f, dtype=np.float64).reshape(n)
            g = self._g if self._g is not None else self._solve_L(f_np)
            y = self._solve_LT(xi + g)
        return jnp.asarray(y.reshape(x.shape), dtype=self._dtype)


# Naming parity with the reference's factorisation switch (parameters.hh:87-91)
SparseCholeskySampler = BandCholeskySampler
