"""Sampler base interface.

TPU-native counterpart of ``src/sampler/sampler.hh:23-85``.  Where the reference
threads a single shared ``std::mt19937_64&`` through every sampler, here every
``apply`` takes an explicit ``jax.random`` key and the caller splits keys per
step - deterministic, parallel-safe, and shardable (per-chip key folding happens
inside Pallas kernels / shard_map when running distributed).

Samplers draw the next chain state ``x' ~ K(x, .)`` of a Markov chain whose
stationary distribution is ``pi(x) ~ exp(-1/2 x^T A x + f^T x)``, i.e.
``N(A^{-1} f, A^{-1})``.

The ``fix_rhs`` / ``unfix_rhs`` protocol (``sampler.hh:49-63``) lets direct
samplers cache the f-dependent part of their update.
"""

from __future__ import annotations

import jax

from ..ops.stencil import StencilOperator


class Sampler:
    def __init__(self, op: StencilOperator):
        self.op = op

    def apply(self, key: jax.Array, f: jax.Array, x: jax.Array) -> jax.Array:
        """Draw the next chain state given rhs f and current state x."""
        raise NotImplementedError

    def fix_rhs(self, f: jax.Array) -> None:
        """Cache f-dependent precomputations (no-op by default)."""

    def unfix_rhs(self) -> None:
        """Drop cached f-dependent state (no-op by default)."""
