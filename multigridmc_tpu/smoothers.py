"""Multi-colour SOR / SSOR smoothers.

TPU-native counterpart of ``src/smoother/sor_smoother.{hh,cc}`` and
``ssor_smoother.{hh,cc}``.  The reference's lexicographic CSR sweep
(``sor_smoother.cc:56-78``) is inherently sequential; here the sweep order is a
multi-colour order (see :mod:`multigridmc_tpu.ops.coloring`), so one sweep is
``n_colors`` fully parallel masked stencil applications:

    for colour c in order:
        x <- x + mask_c * omega * (b - A_stencil x) / diag

This is SOR with splitting ``M = D/omega + L_c`` where ``L_c`` is the strictly
block-lower part of ``A_stencil`` under the colour order.

Low-rank operators (posterior precision ``A = A_s + B Sigma^{-1} B^T``) follow the
reference's Woodbury-corrected splitting (math in ``sor_smoother.hh:20-43``): the
sweep runs on the stencil part only, then applies

    x <- x - B_bar (B^T x),
    B_bar = M^{-1} B (Sigma + B^T M^{-1} B)^{-1}

with ``M = L_c + D/omega`` (forward) or its transpose (backward).  ``M^{-1} B`` is
computed at setup by colour-ordered forward substitution - exact because M is
block-triangular in the colour order.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.coloring import Coloring, coloring_for
from .ops.stencil import StencilOperator

FORWARD = "forward"
BACKWARD = "backward"

#: smallest grid extent for which the batched Pallas sweep kernels beat XLA
#: (below this the per-kernel overhead outweighs the saved HBM passes)
MIN_PALLAS_EXTENT = 31


def color_order(n_colors: int, direction: str) -> Tuple[int, ...]:
    order = tuple(range(n_colors))
    return order if direction == FORWARD else tuple(reversed(order))


def splitting_solve(
    op: StencilOperator,
    masks: jax.Array,
    omega: float,
    order: Tuple[int, ...],
    v: jax.Array,
) -> jax.Array:
    """Solve ``(L_c + D/omega) y = v`` by colour-ordered forward substitution.

    Exact because the colour-order splitting matrix is block lower-triangular:
    colour c couples only to previously updated colours.
    """
    diag = op.diag_stencil()
    y = jnp.zeros_like(v)
    for c in order:
        s = op.apply_offdiag(y)
        y = y + masks[c] * ((v - s) * omega / diag)
    return y


def sor_sweep(
    op: StencilOperator,
    masks: jax.Array,
    omega: float,
    order: Tuple[int, ...],
    b: jax.Array,
    x: jax.Array,
) -> jax.Array:
    """One multi-colour SOR sweep on the stencil part
    (cf. ``sor_smoother.cc:56-78``: ``x[l] += omega*(b[l] - (Ax)[l]) / a_ll``)."""
    diag = op.diag_stencil()
    for c in order:
        ax = op.apply_stencil(x)
        x = x + masks[c] * (omega * (b - ax) / diag)
    return x


def compute_B_bar(
    op: StencilOperator, masks: jax.Array, omega: float, order: Tuple[int, ...]
) -> jax.Array:
    """Precompute the Woodbury correction factor ``B_bar`` for one direction
    (cf. ``sor_smoother.cc:17-37``).  Returns shape ``(m, *vshape)``."""
    lr = op.lowrank
    Y = jax.jit(jax.vmap(lambda col: splitting_solve(op, masks, omega, order, col)))(lr.B)
    # S = Sigma + B^T M^{-1} B   (m x m); full precision - see LowRank notes
    hi = jax.lax.Precision.HIGHEST
    S = jnp.diag(lr.Sigma_diag) + jnp.einsum("m...,k...->mk", lr.B, Y, precision=hi)
    W = jnp.linalg.inv(S)
    return jnp.einsum("l...,lk->k...", Y, W, precision=hi)


class SORSmoother:
    """Deterministic multi-colour SOR smoother, forward or backward.

    Mirrors ``SORSmoother`` (``src/smoother/sor_smoother.hh:44-125``).  Note: the
    reference's ``apply`` runs ``nsmooth^2`` sparse sweeps due to a nested loop
    quirk (``sor_smoother.cc:41-53`` vs ``:64``); here ``nsmooth`` means what it
    says - callers in the reference always use nsmooth=1 sub-sweeps anyway.
    """

    def __init__(
        self,
        op: StencilOperator,
        omega: float = 1.0,
        nsmooth: int = 1,
        direction: str = FORWARD,
        coloring: Optional[Coloring] = None,
    ):
        self.op = op
        self.omega = float(omega)
        self.nsmooth = int(nsmooth)
        self.direction = direction
        self.coloring = coloring or coloring_for(op.offsets, op.vshape)
        self.masks = jnp.asarray(self.coloring.masks(), dtype=op.coeffs.dtype)
        self.order = color_order(self.coloring.n_colors, direction)
        self.B_bar = (
            compute_B_bar(op, self.masks, self.omega, self.order)
            if op.lowrank is not None
            else None
        )
        # Isolated Pallas sweep kernels are OFF by default (MGMC_PALLAS=1
        # opts in; MGMC_PALLAS_INTERPRET=1 additionally enables them on CPU
        # for tests).  Slope-measured on v5e (NOTES_R2.md "LATE-ROUND
        # CORRECTION"): the roll-based v2 kernel wins 4.0x in isolation at
        # 256 x 255^2, but *in the production cycle* XLA fuses the noise /
        # Woodbury / residual passes around its sweep and the isolated kernel
        # loses that fusion (L0 1.55 vs 1.46 ms) while small levels pay pure
        # kernel overhead (L3 0.161 vs 0.019 ms).  Single-chain sweeps always
        # stay on XLA (0.7 us vs 2-4.6 us per 255^2 sweep).  The production
        # win is the *fused level-visit* kernel family
        # (ops/kernels/mgmc_visit_pallas.py), which swallows the whole
        # noise+sweep+Woodbury+residual visit so there is no boundary to
        # lose fusion across.
        self._pallas_interpret = False
        self.use_pallas_batched = False
        if os.environ.get("MGMC_PALLAS", "0") == "1" and min(op.vshape) >= MIN_PALLAS_EXTENT:
            from .ops.kernels import sor_pallas_v2

            if sor_pallas_v2.supports_v2(op.vshape, op.coeffs.dtype, len(op.offsets)):
                backend = jax.default_backend()
                if backend == "cpu" and os.environ.get("MGMC_PALLAS_INTERPRET", "0") == "1":
                    self.use_pallas_batched, self._pallas_interpret = True, True
                elif backend != "cpu":
                    self.use_pallas_batched = True

    def _kernel_params(self) -> dict:
        return dict(
            offsets=self.op.offsets, diag_index=self.op.diag_index,
            omega=self.omega, order=self.order,
            color_weights=self.coloring.weights,
            n_colors=self.coloring.n_colors,
            interpret=self._pallas_interpret,
        )

    def sweep_stencil(self, b: jax.Array, x: jax.Array) -> jax.Array:
        vdim = len(self.op.vshape)
        if self.use_pallas_batched and x.ndim > vdim:
            from .ops.kernels.sor_pallas_v2 import sweep_batched_v2

            batch = x.shape[:-vdim]
            xf = x.reshape((-1,) + self.op.vshape)
            bf = jnp.broadcast_to(b, x.shape).reshape(xf.shape)
            out = sweep_batched_v2(self.op.coeffs, bf, xf, **self._kernel_params())
            return out.reshape(batch + self.op.vshape)
        return sor_sweep(self.op, self.masks, self.omega, self.order, b, x)

    def _lowrank_correct(self, x: jax.Array) -> jax.Array:
        bt_x = self.op.lowrank.bt(x)  # (*batch, m)
        return x - jnp.tensordot(
            bt_x, self.B_bar, axes=([bt_x.ndim - 1], [0]),
            precision=jax.lax.Precision.HIGHEST,
        )

    def apply(self, b: jax.Array, x: jax.Array) -> jax.Array:
        """``nsmooth`` SOR sweeps, each followed by the low-rank correction
        (cf. ``sor_smoother.cc:41-53``)."""
        for _ in range(self.nsmooth):
            x = self.sweep_stencil(b, x)
            if self.B_bar is not None:
                x = self._lowrank_correct(x)
        return x


class SSORSmoother:
    """Symmetric SOR: one forward then one backward sweep per smoothing step
    (cf. ``src/smoother/ssor_smoother.cc:9-16``)."""

    def __init__(
        self,
        op: StencilOperator,
        omega: float = 1.0,
        nsmooth: int = 1,
        coloring: Optional[Coloring] = None,
    ):
        self.nsmooth = int(nsmooth)
        coloring = coloring or coloring_for(op.offsets, op.vshape)
        self.forward = SORSmoother(op, omega, 1, FORWARD, coloring)
        self.backward = SORSmoother(op, omega, 1, BACKWARD, coloring)
        self.op = op

    def apply(self, b: jax.Array, x: jax.Array) -> jax.Array:
        for _ in range(self.nsmooth):
            x = self.forward.apply(b, x)
            x = self.backward.apply(b, x)
        return x


def smoother_factory(name: str, omega: float, nsmooth: int, direction: str = FORWARD):
    """Factory mirroring ``SmootherFactory`` (``src/smoother/smoother.hh:39-44``):
    returns a callable ``op -> smoother`` for per-level instantiation."""
    name = name.upper()
    if name == "SOR":
        return lambda op: SORSmoother(op, omega, nsmooth, direction)
    if name == "SSOR":
        return lambda op: SSORSmoother(op, omega, nsmooth)
    raise ValueError(f"unknown smoother '{name}'")
