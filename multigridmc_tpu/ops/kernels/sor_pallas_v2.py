"""Fused multi-colour SOR / Gibbs sweep kernels, v2 (roll-based).

Round-1's kernels (sor_pallas.py) kept a halo-padded copy of x in VMEM
scratch and addressed neighbours by static slices at lane offset +-1 - every
colour phase paid misaligned VMEM copies (the lane dimension shifted by one),
which is why the batched variants lost ~2x to XLA even though their HBM
traffic was lower.  v2 eliminates the scratch entirely:

* neighbour access = ``pltpu.roll`` (hardware lane/sublane rotate) with the
  wrapped-in column/row zeroed via an in-kernel iota mask - exactly the
  zero-Dirichlet shifted read of ``ops.stencil.shift``;
* colour masks regenerated from ``broadcasted_iota`` (no mask traffic);
* the Gibbs noise is drawn by the on-chip PRNG (full key words), so one
  stochastic sweep costs a single HBM pass: read f, read x, write x;
* chain batches ride the grid (``bc`` chains per step) with the coefficient
  block resident across steps, and the x input buffer is donated
  (``input_output_aliases``) to halve output buffering.

Exactness: the same colour-ordered splitting as ``smoothers.sor_sweep`` - the
full grid of every chain lives in VMEM during its sweep, so each phase sees
previously-updated colours (verified elementwise in tests/test_pallas_v2.py).

Measured outcome (round 2, un-throttled v5e, same-process fori_loop timing -
see NOTES_R2.md "Sweep kernel shoot-out"): despite ~3x lower HBM traffic these
kernels only TIE the XLA masked colour sweep (det 0.75 vs 0.66 ms, Gibbs 1.03
vs 0.99 ms at 128 x 255^2) - the colour phases are VPU/roll-bound, not
HBM-bound. They remain exported and bitwise-tested as the building block for
future fused-cycle work, but the production sweep path stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _normal_from_bits(shape):
    """Standard normals via Box-Muller from the on-chip PRNG."""
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    eight = jnp.uint32(8)

    def to_unit(bits):
        hi = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32), eight)
        return pltpu.bitcast(hi, jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)

    u1 = to_unit(b1) + (1.0 / 16777216.0)
    u2 = to_unit(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _shifted(x, off, iotas, vshape, layout=None):
    """Zero-Dirichlet shifted read z[i] = x[i+off] via roll + mask.

    ``x`` has shape (..., *array_spatial); ``iotas[d]`` is the index field of
    LOGICAL dim d, shaped like the array's spatial dims.  ``layout`` maps each
    logical lattice dim to its array axis: a tuple of ``(axis, stride)`` with
    ``axis`` negative from the end and ``stride`` the step of one logical unit
    within that axis.  Default: one axis per dim, stride 1 (2d/3d dense).

    A FLATTENED layout packs several logical dims into one array axis (e.g.
    3d (Z, Y, X) stored as (Z, Y*X) with y at stride X): rolls along the
    packed axis wrap across the inner boundary, but exactly those reads have
    an out-of-range inner index and are zero-masked - the same argument that
    makes plain per-axis rolls correct at lattice edges.
    """
    dim = len(vshape)
    if layout is None:
        layout = tuple((d - dim, 1) for d in range(dim))
    shifts = {}
    for d, o in enumerate(off):
        if o:
            ax, stride = layout[d]
            shifts[ax] = shifts.get(ax, 0) + o * stride
    z = x
    # pltpu.roll requires non-negative shifts; a backward shift of o is a
    # forward cyclic shift of (size - o)
    for ax, s in shifts.items():
        if s:
            size = z.shape[ax]
            z = pltpu.roll(z, (-s) % size, axis=z.ndim + ax)
    ok = None
    for d, o in enumerate(off):
        if o:
            m = (iotas[d] + o >= 0) & (iotas[d] + o <= vshape[d] - 1)
            ok = m if ok is None else (ok & m)
    if ok is None:
        return z
    return jnp.where(ok, z, jnp.zeros_like(z))


def layout_iotas(vshape, layout, ashape):
    """Per-LOGICAL-dim index fields of shape ``ashape`` for a (possibly
    flattened) layout: logical dim d's index = (iota(axis) // stride) mod
    extent."""
    arank = len(ashape)
    iotas = []
    for d, (ax, stride) in enumerate(layout):
        flat = jax.lax.broadcasted_iota(jnp.int32, ashape, arank + ax)
        iotas.append((flat // stride) % vshape[d])
    return iotas


def _sweep_body(coeffs, c, x, *, offsets, diag_index, omega, order,
                color_weights, n_colors, layout=None, vshape=None):
    """All colour phases of one sweep on VMEM-resident values (2d or 3d;
    ``layout``/``vshape`` describe a flattened storage - see _shifted)."""
    dim = len(offsets[0])
    if vshape is None:
        vshape = x.shape[-dim:]
    if layout is None:
        iotas = [
            jax.lax.broadcasted_iota(jnp.int32, vshape, d) for d in range(dim)
        ]
    else:
        arank = max(len(set(ax for ax, _ in layout)), 1)
        iotas = layout_iotas(vshape, layout, x.shape[x.ndim - arank:])
    color = sum(w * g for w, g in zip(color_weights, iotas)) % n_colors
    diag = coeffs[diag_index]
    for ci in order:
        ax = None
        for k, off in enumerate(offsets):
            t = coeffs[k] * _shifted(x, off, iotas, vshape, layout)
            ax = t if ax is None else ax + t
        upd = omega * (c - ax) / diag
        x = jnp.where(color == ci, x + upd, x)
    return x


def _deterministic_kernel(coeffs_ref, b_ref, x_ref, out_ref, *, params):
    out_ref[:] = _sweep_body(coeffs_ref[:], b_ref[:], x_ref[:], **params)


def _gibbs_kernel(seed_ref, coeffs_ref, f_ref, x_ref, out_ref, *, params,
                  n_seed_words, omega):
    i = pl.program_id(0)
    pltpu.prng_seed(*(seed_ref[i * n_seed_words + j] for j in range(n_seed_words)))
    coeffs = coeffs_ref[:]
    f = f_ref[:]
    xi = _normal_from_bits(f.shape)
    # c = f + sqrt(D (2-omega)/omega) xi   (sor_sampler.cc:39-46)
    c = f + jnp.sqrt(coeffs[params["diag_index"]] * ((2.0 - omega) / omega)) * xi.astype(f.dtype)
    out_ref[:] = _sweep_body(coeffs, c, x_ref[:], **params)


def _pick_bc(C, nvert, nk, vmem_budget=10 * 1024 * 1024):
    """Chains per grid step: x/f/out blocks double-buffered + resident coeffs."""
    plane = nvert * 4
    for bc in (16, 8, 4, 2, 1):
        if C % bc:
            continue
        if (2 * 2 * bc + 1 * bc) * plane + nk * plane <= vmem_budget:
            return bc
    return 1


def _common(offsets, diag_index, omega, order, color_weights, n_colors):
    return dict(
        offsets=offsets, diag_index=diag_index, omega=omega, order=order,
        color_weights=color_weights, n_colors=n_colors,
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "diag_index", "omega", "order", "color_weights",
                     "n_colors", "interpret"),
)
def sweep_batched_v2(coeffs, b, x, *, offsets, diag_index, omega, order,
                     color_weights, n_colors, interpret=False):
    """Deterministic batched sweep; the kernel updates x in place via
    ``input_output_aliases`` (when traced inside an outer jit XLA elides the
    copy whenever x is dead afterwards - donation hints on this inner jit
    would be ignored there, and eager donation would invalidate callers'
    arrays)."""
    dim = len(offsets[0])
    C, vshape = x.shape[0], x.shape[1:]
    nvert = 1
    for m in vshape:
        nvert *= m
    nk = coeffs.shape[0]
    bc = _pick_bc(C, nvert, nk)
    zeros = (0,) * dim
    params = _common(offsets, diag_index, omega, order, color_weights, n_colors)
    kern = functools.partial(_deterministic_kernel, params=params)
    return pl.pallas_call(
        kern,
        grid=(C // bc,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec((nk,) + vshape, lambda i: (0,) + zeros, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(coeffs, b, x)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "diag_index", "omega", "order", "color_weights",
                     "n_colors", "interpret"),
)
def gibbs_sweep_batched_v2(seeds, coeffs, f, x, *, offsets, diag_index, omega,
                           order, color_weights, n_colors, interpret=False):
    """Stochastic batched sweep with on-chip noise; one HBM pass total.

    ``seeds``: (>= n_blocks, n_words) int32 per-block key words (use
    sor_pallas.seed_words / vmapped key_data).  x is updated in place via
    ``input_output_aliases`` (see sweep_batched_v2 on donation).
    """
    dim = len(offsets[0])
    C, vshape = x.shape[0], x.shape[1:]
    nvert = 1
    for m in vshape:
        nvert *= m
    nk = coeffs.shape[0]
    bc = _pick_bc(C, nvert, nk)
    zeros = (0,) * dim
    nblocks = C // bc
    seeds = jnp.asarray(seeds)
    if seeds.dtype == jnp.uint32:
        seeds = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    seeds = seeds.astype(jnp.int32)
    if seeds.ndim == 1:
        seeds = seeds[:, None]
    from .sor_pallas import fold_seed_words

    seeds = fold_seed_words(seeds)
    n_seed_words = seeds.shape[1]
    seeds = seeds[:nblocks].reshape(-1)
    params = _common(offsets, diag_index, omega, order, color_weights, n_colors)
    kern = functools.partial(
        _gibbs_kernel, params=params, n_seed_words=n_seed_words, omega=omega
    )
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec((nblocks * n_seed_words,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nk,) + vshape, lambda i: (0,) + zeros, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(seeds, coeffs, f, x)


def supports_v2(vshape, dtype, n_offsets) -> bool:
    """v2 kernels hold one chain's full grid in VMEM per block (2d and 3d)."""
    if len(vshape) not in (2, 3) or jnp.dtype(dtype) != jnp.float32:
        return False
    nvert = 1
    for m in vshape:
        nvert *= m
    return (5 + n_offsets) * nvert * 4 <= 10 * 1024 * 1024
