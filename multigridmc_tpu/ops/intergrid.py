"""Intergrid transfer operators: d-linear prolongation and its transpose.

TPU-native counterpart of ``src/intergrid/intergrid_operator.hh:43-161`` and
``intergrid_operator_linear.cc:13-30``.  The reference stores an explicit 3^d
stencil with indirection arrays; on dense grid fields the same operator is a
zero-interleave followed by a constant-coefficient {0.5, 1, 0.5} tensor-product
convolution (prolongation), and the matching convolve-then-subsample gather
(restriction).  Restriction is the exact transpose of prolongation by
construction, as verified by the adjointness test (cf.
``src/intergrid/test_intergrid.hh:155-171``).

A coarse interior vertex with array index i corresponds to fine array index
2 i + 1 per dimension (cf. ``Lattice1d::fine_vertex_idx``, ``lattice1d.hh:145-148``).
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp

from .stencil import shift

_WEIGHT_1D = {-1: 0.5, 0: 1.0, 1: 0.5}


def _offsets_weights(dim: int):
    for off in itertools.product((-1, 0, 1), repeat=dim):
        w = 1.0
        for o in off:
            w *= _WEIGHT_1D[o]
        yield off, w


def prolongate(x_coarse: jax.Array, fine_vshape: Tuple[int, ...]) -> jax.Array:
    """``P x_c``: d-linear interpolation from the coarse to the fine grid.

    Injects coarse values at fine positions ``2 i + 1`` and spreads them with the
    tensor-product {0.5, 1, 0.5} stencil (cf. ``intergrid_operator.hh:106-120``
    and the linear weights ``intergrid_operator_linear.cc:13-30``).
    """
    dim = len(fine_vshape)
    batch = x_coarse.shape[:-dim] if x_coarse.ndim > dim else ()
    z = jnp.zeros(batch + tuple(fine_vshape), dtype=x_coarse.dtype)
    inject = tuple(slice(None) for _ in batch) + tuple(slice(1, None, 2) for _ in range(dim))
    z = z.at[inject].set(x_coarse)
    y = None
    for off, w in _offsets_weights(dim):
        t = w * shift(z, off)
        y = t if y is None else y + t
    return y


def restrict(x_fine: jax.Array, dim: int | None = None) -> jax.Array:
    """``R x_f`` with ``R = P^T``: full-weighting gather onto coarse vertices.

    ``(R x)[i] = sum_off w(off) x[2 i + 1 + off]`` per dimension, matching the
    stencil gather in ``intergrid_operator.hh:74-88``.
    """
    dim = x_fine.ndim if dim is None else dim
    y = None
    for off, w in _offsets_weights(dim):
        t = w * shift(x_fine, off)
        y = t if y is None else y + t
    sub = tuple(slice(None) for _ in range(x_fine.ndim - dim)) + tuple(
        slice(1, None, 2) for _ in range(dim)
    )
    return y[sub]


def prolongate_add(
    alpha: float, x_coarse: jax.Array, x_fine: jax.Array, dim: int | None = None
) -> jax.Array:
    """``x_f + alpha * P x_c`` (cf. ``intergrid_operator.hh:106-120``)."""
    dim = x_fine.ndim if dim is None else dim
    return x_fine + alpha * prolongate(x_coarse, x_fine.shape[x_fine.ndim - dim :])
