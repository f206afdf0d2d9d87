"""Fused MGMC level-visit kernels: the whole descend / ascend of one level in
one Pallas call.

Round-2 slope measurements (NOTES_R2.md "LATE-ROUND CORRECTION") showed the
isolated v2 sweep kernels win big in isolation (det 0.28 vs 1.12 ms at
256 x 255^2) but *lose in the production cycle* (L0 1.55 vs 1.46 ms): XLA
fuses the noise / Woodbury / residual passes around its own sweep, and an
isolated kernel forfeits that fusion at its boundaries.  The fix is to move
the boundaries inside the kernel.  One **descend visit** of level l
(cf. ``src/sampler/multigridmc_sampler.cc:103-130``) is

    c   = f + sqrt(D (2-omega)/omega) xi + B Sigma^{-1/2} xi'   (Gibbs noise)
    x  <- colour-ordered SOR sweep(c, x)                        (forward)
    x  <- x - B_bar (B^T x)                                     (Woodbury)
    r   = f - A x            (A = stencil + B Sigma^{-1} B^T)
    f_c = R r                (full-weighting restriction)

and one **ascend visit** is

    x  <- x + gamma * P x_c                                     (prolongate_add)
    c   = f + noise                                             (as above)
    x  <- colour-ordered SOR sweep(c, x)                        (backward)
    x  <- x - B_bar_bwd (B^T x)

Each fused visit is a single HBM round trip: read f and x (and x_c), write x
(aliased in place) and f_c; the stencil coefficients, measurement fields B,
Woodbury factors B_bar and the banded intergrid matrices stay VMEM-resident
across chain blocks.  The field noise comes from the on-chip PRNG (Box-Muller
drawing the sin/cos *pair*, halving the transcendental count vs the v2
kernels); the m low-rank noise scalars per chain are drawn outside with the
production key stream and passed in (independent streams, like the
v2 batched path).

Restriction/prolongation use the same banded tensor-product matrices as
:mod:`multigridmc_tpu.ops.intergrid` (MXU matmuls at HIGHEST precision), so
the fused path computes the identical linear algebra to the composed XLA path
- verified elementwise by tests/test_mgmc_visit.py with noise disabled.

2d and 3d.  3d runs in FLAT storage by default (round 5): fields live as
(Z, Y*X) inside the kernel - the 63-extent lane dim would pad 2x, the packed
3969-wide lane dim pads 3% - and the tensor-product transfers become the
same two MXU matmuls as 2d (f_c = R_z r kron(R_y,R_x)^T), fusing in-kernel.
``MGMC_VISIT_FLAT3D=0`` restores the legacy dense-3d blocks with transfers
outside.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sor_pallas import seed_words
from .sor_pallas_v2 import _shifted, _sweep_body, layout_iotas

_TWO_PI = 6.283185307179586
_HI = jax.lax.Precision.HIGHEST

#: The v5e chip has ~128 MB VMEM but Mosaic's default scoped limit is 16 MB
#: (probed: 2x56 MB blocks compile with vmem_limit_bytes raised); the visit
#: kernels raise the limit and budget conservatively.  Other chip generations
#: are re-gated at first use by :func:`_vmem_limit` (device-kind table +
#: compile probe; MGMC_VMEM_MB overrides) instead of hard-coding the v5e
#: numbers (round-2 advice: a smaller-VMEM generation must fall back to the
#: composed path, not fail at compile time).
_VMEM_MB_ENV = os.environ.get("MGMC_VMEM_MB")


def _probe_limit_compiles(mb: int) -> bool:
    """Whether a trivial kernel compiles+runs with vmem_limit_bytes raised to
    ``mb`` MB on the current default device."""
    try:
        x = jnp.zeros((8, 128), jnp.float32)

        def _copy(x_ref, o_ref):
            o_ref[:] = x_ref[:]

        out = pl.pallas_call(
            _copy,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=mb * 1024 * 1024
            ),
        )(x)
        jax.block_until_ready(out)
        return True
    except Exception:  # compile or runtime rejection -> try a smaller limit
        return False


@functools.lru_cache(maxsize=None)
def _vmem_limit() -> int:
    """Per-core VMEM limit (bytes) requested from Mosaic - derived at first
    use from the device kind, with a compile-probe ladder for unknown chips."""
    if _VMEM_MB_ENV:
        return int(_VMEM_MB_ENV) * 1024 * 1024
    try:
        backend = jax.default_backend()
        kind = jax.devices()[0].device_kind.lower()
    except RuntimeError:
        return 112 * 1024 * 1024
    if backend != "tpu":
        # interpret mode (CPU tests): the budget only gates shapes
        return 112 * 1024 * 1024
    if "v2" in kind or "v3" in kind:  # 16-32 MB VMEM generations
        return 24 * 1024 * 1024
    if any(k in kind for k in ("v4", "v5", "v6", "v7")):
        return 112 * 1024 * 1024
    for mb in (112, 56, 24):
        if _probe_limit_compiles(mb):
            return mb * 1024 * 1024
    return 16 * 1024 * 1024


def _vmem_budget() -> int:
    """Planning budget for resident+block arrays: 6/7 of the requested limit
    (the 96/112 headroom ratio measured on v5e for Mosaic's own scratch)."""
    return (6 * _vmem_limit()) // 7


#: per-chain VMEM plane budget (in/out blocks + Mosaic temporaries).  Round 4
#: measured the true footprint at the VMEM edge: the 1023^2 m=8 visit (42 MB
#: resident after compression) compiles AND runs at the default 112 MB limit,
#: so the earlier 16-plane estimate was pessimistic - 12 admits it and every
#: admitted shape still compiles (native/probe_visit_1024_tpu.py).
#: MGMC_VISIT_PLANES=16 restores the conservative gate.
_PLANES_PER_CHAIN = int(os.environ.get("MGMC_VISIT_PLANES", "12"))

#: flat-3d kernels keep more live whole-field temporaries per chain (three
#: int32 iota fields, the 7 shifted stencil reads against a packed axis, and
#: MXU staging for the kron transfer matmuls): the 12-plane 2d estimate
#: under-budgets by ~2x (round-5: planner bc=4 at 63^3 -> Mosaic scoped
#: stack 116 MB vs the 112 MB limit).  24 planes/chain measured safe.
_PLANES_PER_CHAIN_FLAT = int(os.environ.get("MGMC_VISIT_PLANES_FLAT", "24"))


def _padded_plane(vshape):
    """f32 bytes of one (1, *vshape) field in VMEM: the last two dims tile to
    (8, 128), so e.g. a 63^3 grid occupies 63 x 64 x 128 floats (2.1 MB, 2x
    the logical size) - the budget must use padded sizes or 3d kernels OOM."""
    dims = list(vshape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // 8) * 8
    n = 4
    for d in dims:
        n *= d
    return n


def _unit_from_bits(bits):
    hi = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8))
    return pltpu.bitcast(hi, jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)


def _normals(shape):
    """N(0,1) field from the on-chip PRNG via Box-Muller.

    When the leading (chain) axis is even the sin/cos *pair* of each draw is
    used, halving the log/sqrt/trig count vs the v2 kernels' cos-only form.
    """
    if shape[0] % 2 == 0 and shape[0] > 1:
        half = (shape[0] // 2,) + shape[1:]
        u1 = _unit_from_bits(pltpu.prng_random_bits(half)) + (1.0 / 16777216.0)
        u2 = _unit_from_bits(pltpu.prng_random_bits(half))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        a = _TWO_PI * u2
        return jnp.concatenate([r * jnp.cos(a), r * jnp.sin(a)], axis=0)
    u1 = _unit_from_bits(pltpu.prng_random_bits(shape)) + (1.0 / 16777216.0)
    u2 = _unit_from_bits(pltpu.prng_random_bits(shape))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


#: MXU precision of the in-kernel transfer matmuls.  Default HIGHEST =
#: f32-exact (same as ops.intergrid, what the exactness tests compare
#: against; Mosaic supports only DEFAULT and HIGHEST in-kernel).  "default"
#: (single bf16 pass) is an opt-in measured tier: the in-kernel R then
#: deviates from the P/Galerkin pair by bf16 rounding, which perturbs the
#: invariant measure the same way the distill-DEFAULT tier does - use only
#: with a bias validation run.
_TRANSFER_TIERS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}
_TRANSFER_ENV = os.environ.get("MGMC_VISIT_TRANSFER_PRECISION", "highest")
if _TRANSFER_ENV not in _TRANSFER_TIERS:
    raise ValueError(
        f"MGMC_VISIT_TRANSFER_PRECISION={_TRANSFER_ENV!r}: Mosaic supports "
        f"only {sorted(_TRANSFER_TIERS)} in-kernel ('high' exists for "
        f"MGMC_DISTILL_PRECISION but not here)")
_TRANSFER_PRECISION = _TRANSFER_TIERS[_TRANSFER_ENV]


def _mm(a, b):
    """MXU matmul for the in-kernel transfers (precision: see
    _TRANSFER_PRECISION; f32-exact by default).

    Contracts the last axis of ``a`` with the first of ``b``; for rank-3 ``a``
    this is one batched lane-dim contraction (free dims stay in lhs order), so
    the whole chain block rides a single MXU dispatch."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=_TRANSFER_PRECISION, preferred_element_type=jnp.float32,
    )


def _apply_stencil(coeffs, x, offsets, iotas, vshape, layout=None):
    ax = None
    for k, off in enumerate(offsets):
        t = coeffs[k] * _shifted(x, off, iotas, vshape, layout)
        ax = t if ax is None else ax + t
    return ax


def _noisy_rhs(f, x, ns, xi_lr_ref, b_field, m, dim):
    """c = f + sqrt(D(2-omega)/omega) xi + sum_k xi'_k B_k (xi' pre-scaled by
    Sigma^{-1/2} outside), cf. ``sor_sampler.cc:39-56``.  ``ns`` is the noise
    scale (a value or a static float); ``b_field(k)`` yields the k-th
    measurement field as a ``vshape`` value (resident plane read or lazy
    SMEM synthesis)."""
    xi = _normals(x.shape)
    c = f + ns * xi
    if m:
        xi_lr = xi_lr_ref[:]  # (bc, 1, ..., 1, m)
        for k in range(m):
            c = c + xi_lr[..., k:k + 1] * b_field(k)[None]
    return c


def _synth_B_field(idx_refs, vals_ref, k, nz, iotas):
    """Rebuild ONE sparse measurement field from SMEM scalars: B_k has ``nz``
    (*index, val) tuples - one index array per lattice dim, padded with
    index = -1, never matching the iota.  Radius-0 measurement columns are
    one-hot (``measured_operator.cc:74-91``), so at large extents this
    replaces m resident VMEM planes with VPU masks (2d and 3d).  Called
    lazily at each use site so the synthesized value dies immediately
    instead of occupying a VMEM plane for the whole kernel."""
    acc = None
    for j in range(nz):
        mask = None
        for d, iota in enumerate(iotas):
            md = iota == idx_refs[d][k, j]
            mask = md if mask is None else mask & md
        t = jnp.where(mask, vals_ref[k, j], jnp.float32(0.0))
        acc = t if acc is None else acc + t
    return acc


def _reduce_spatial(t, dim):
    """Sum a (bc, *v) value over its trailing dim axes -> (bc, 1, ..., 1).

    One axis at a time: Mosaic crashes on multi-axis keepdims reductions
    (layout.h rank check), sequential single-axis reductions compile fine.
    """
    for ax in range(t.ndim - 1, t.ndim - 1 - dim, -1):
        t = jnp.sum(t, axis=ax, keepdims=True)
    return t


def _sweeps(coeffs, x, f, params, orders, m, noise, ns, xi_lr_ref, b_field,
            Bbar_ref, dim):
    """One visit's sweep stack: for each directed sweep d, fresh Gibbs noise,
    the colour sweep, and that direction's Woodbury correction (``Bbar_ref``
    holds ``n_dirs * m`` stacked fields).  One sweep = SOR visits; two
    (forward, backward) = SSOR visits.  Returns (x, btx of the last sweep)."""
    btx = None
    adim = x.ndim - 1  # array spatial rank (< dim under a flattened layout)
    for d, order in enumerate(orders):
        if noise:
            xi_lr_d = xi_lr_ref[..., d * m:(d + 1) * m] if m else None
            c = _noisy_rhs(f, x, ns, xi_lr_d, b_field, m, dim)
        else:
            c = f
        x = _sweep_body(coeffs, c, x, order=order, **params)
        if m:
            btx = [_reduce_spatial(x * b_field(k)[None], adim)
                   for k in range(m)]
            for l in range(m):
                x = x - btx[l] * Bbar_ref[d * m + l][None]
    return x, btx


def _unpack_coeffs(coeffs_ref, const_coeffs):
    """Per-offset coefficient values: static floats for spatially-constant
    planes, resident VMEM planes for the rest (``coeffs_ref`` holds only the
    varying planes, in offset order; None when all are constant)."""
    vals = []
    vi = 0
    for cval in const_coeffs:
        if cval is None:
            vals.append(coeffs_ref[vi])
            vi += 1
        else:
            vals.append(jnp.float32(cval))
    return tuple(vals)


def _make_descend_kernel(*, params, n_seed_words, noise, m, bc, fuse_restrict,
                         const_coeffs, ns_const, sparse_nz):
    dim = len(params["offsets"][0])
    layout = params.get("layout")
    orders = params["orders"]
    base_params = {k: v for k, v in params.items() if k != "orders"}
    nk_var = sum(1 for c in const_coeffs if c is None)

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it) if noise else None
        xi_lr_ref = next(it) if (noise and m) else None
        coeffs_ref = next(it) if nk_var else None
        ns_ref = next(it) if (noise and ns_const is None) else None
        if m and sparse_nz:
            b_idx_refs = tuple(next(it) for _ in range(dim))
            b_vals_ref = next(it)
            B_ref = None
        else:
            B_ref = next(it) if m else None
        Bbar_ref = next(it) if m else None
        sinv_ref = next(it) if m else None
        G_ref = next(it) if m else None
        Rh_ref = next(it) if fuse_restrict else None
        RwT_ref = next(it) if fuse_restrict else None
        f_ref = next(it)
        x_ref = next(it)
        xout_ref = next(it)
        fc_ref = next(it)

        if noise:
            i = pl.program_id(0)
            pltpu.prng_seed(
                *(seed_ref[i * n_seed_words + j] for j in range(n_seed_words))
            )
        coeffs = _unpack_coeffs(coeffs_ref, const_coeffs)
        f = f_ref[:]  # (bc, *v) or (1, *v): broadcasts against (bc, *v)
        x = x_ref[:]
        if layout is None:
            vshape = x.shape[-dim:]
            iotas = [jax.lax.broadcasted_iota(jnp.int32, vshape, d)
                     for d in range(dim)]
        else:
            vshape = base_params["vshape"]  # logical extents
            iotas = layout_iotas(vshape, layout, x.shape[1:])
        if m:
            if sparse_nz:
                def b_field(k):
                    return _synth_B_field(b_idx_refs, b_vals_ref,
                                          k, sparse_nz, iotas)
            else:
                def b_field(k):
                    return B_ref[k]
        else:
            b_field = None
        ns = jnp.float32(ns_const) if ns_const is not None else (
            ns_ref[:] if noise else None)

        x, btx = _sweeps(coeffs, x, f, base_params, orders, m, noise, ns,
                         xi_lr_ref, b_field, Bbar_ref, dim)
        xout_ref[:] = x

        # residual r = f - A x  (full operator incl. low-rank term)
        r = f - _apply_stencil(coeffs, x, base_params["offsets"], iotas,
                               vshape, layout)
        if m:
            # B^T x' after the LAST Woodbury correction without re-reducing
            # the full fields: B^T(x - Bbar btx) = (I - G) btx with the
            # precomputed m x m Gram matrix G[k,l] = <B_k, Bbar_last_l>
            for k in range(m):
                btx2 = btx[k]
                for l in range(m):
                    btx2 = btx2 - G_ref[k, l] * btx[l]
                r = r - (btx2 * sinv_ref[0, k]) * b_field(k)[None]

        if not fuse_restrict:
            # 3d (or diagnostic) variant: emit the residual, restrict outside
            fc_ref[:] = r
            return
        # restriction f_c = Rh r Rw^T per chain.  Slope-measured: batching
        # the lane contraction over the block (rank-3 dot_general) is ~0.3 ms
        # SLOWER here than per-chain rank-2 matmuls (collapsing (bc, H) with
        # H=255 unaligned forces a relayout of the full-size r), while in the
        # ascend kernel the same batching on the quarter-size x_c wins.
        Rh = Rh_ref[:]
        RwT = RwT_ref[:]
        for b in range(bc):
            fc_ref[b] = _mm(Rh, _mm(r[b], RwT))

    return kernel


def _make_ascend_kernel(*, params, n_seed_words, noise, m, bc, coarse_scaling,
                        fuse_prolongate, const_coeffs, ns_const, sparse_nz):
    dim = len(params["offsets"][0])
    layout = params.get("layout")
    orders = params["orders"]
    base_params = {k: v for k, v in params.items() if k != "orders"}
    nk_var = sum(1 for c in const_coeffs if c is None)

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it) if noise else None
        xi_lr_ref = next(it) if (noise and m) else None
        coeffs_ref = next(it) if nk_var else None
        ns_ref = next(it) if (noise and ns_const is None) else None
        if m and sparse_nz:
            b_idx_refs = tuple(next(it) for _ in range(dim))
            b_vals_ref = next(it)
            B_ref = None
        else:
            B_ref = next(it) if m else None
        Bbar_ref = next(it) if m else None
        RhT_ref = next(it) if fuse_prolongate else None
        Rw_ref = next(it) if fuse_prolongate else None
        f_ref = next(it)
        x_ref = next(it)
        xc_ref = next(it)
        xout_ref = next(it)

        if noise:
            i = pl.program_id(0)
            pltpu.prng_seed(
                *(seed_ref[i * n_seed_words + j] for j in range(n_seed_words))
            )
        coeffs = _unpack_coeffs(coeffs_ref, const_coeffs)
        f = f_ref[:]
        x = x_ref[:]
        if layout is None:
            vshape = x.shape[-dim:]
        else:
            vshape = base_params["vshape"]
        if m:
            if sparse_nz:
                if layout is None:
                    iotas = [jax.lax.broadcasted_iota(jnp.int32, vshape, d)
                             for d in range(dim)]
                else:
                    iotas = layout_iotas(vshape, layout, x.shape[1:])

                def b_field(k):
                    return _synth_B_field(b_idx_refs, b_vals_ref,
                                          k, sparse_nz, iotas)
            else:
                def b_field(k):
                    return B_ref[k]
        else:
            b_field = None
        ns = jnp.float32(ns_const) if ns_const is not None else (
            ns_ref[:] if noise else None)

        if fuse_prolongate:
            # x += gamma * P x_c: lane contraction batched, sublane per chain
            u = _mm(xc_ref[:], Rw_ref[:])  # (bc, Hc, W)
            RhT = RhT_ref[:]
            px = jnp.stack([_mm(RhT, u[b]) for b in range(bc)], axis=0)
            x = x + coarse_scaling * px
        else:
            # 3d variant: P x_c computed outside, xc_ref holds the fine-size px
            x = x + coarse_scaling * xc_ref[:]

        x, _ = _sweeps(coeffs, x, f, base_params, orders, m, noise, ns,
                       xi_lr_ref, b_field, Bbar_ref, dim)
        xout_ref[:] = x

    return kernel


#: chains per grid block, capped at the slope-measured optimum (bc=16 at the
#: bench shape is ~5% slower than bc=8: bigger blocks shrink the pipeline
#: depth without saving overhead); MGMC_VISIT_BC_MAX overrides for tuning
_BC_MAX = int(os.environ.get("MGMC_VISIT_BC_MAX", "8"))


def _pick_bc(C, resident_bytes, per_chain_bytes, budget=None,
             bc_max=None):
    budget = _vmem_budget() if budget is None else budget
    bc_max = _BC_MAX if bc_max is None else bc_max
    for bc in (64, 32, 16, 8, 4, 2, 1):
        if bc > bc_max:
            continue
        if C % bc == 0 and resident_bytes + bc * per_chain_bytes <= budget:
            return bc
    return None


def _block_seeds(key, nblocks):
    seeds = jax.vmap(seed_words)(jax.random.split(key, nblocks))
    return seeds.reshape(-1), seeds.shape[1]


def _check_compression(coeffs, const_coeffs, nk_var, offsets, B, m, sparse_nz,
                       vshape, lvshape=None):
    """Shape/dtype validation of the resident-set compression arguments
    (advisor r3: a caller passing the full unfiltered coeffs array with
    const_coeffs set would silently misassign planes to offsets).  ``vshape``
    is the ARRAY spatial shape (a flattened layout differs from the logical
    ``lvshape``)."""
    if nk_var == 0:
        if coeffs is not None:
            raise ValueError(
                "all stencil coefficients are baked constant: pass coeffs=None")
    elif coeffs.shape[0] != nk_var or coeffs.shape[1:] != vshape:
        raise ValueError(
            f"coeffs must hold exactly the {nk_var} varying planes of "
            f"{vshape} (offset order), got {coeffs.shape}")
    if len(const_coeffs) != len(offsets):
        raise ValueError("const_coeffs needs one entry per stencil offset")
    if sparse_nz:
        dim = len(lvshape if lvshape is not None else vshape)
        if len(B) != dim + 1:
            raise ValueError(
                f"sparse B needs {dim} index arrays + values, got {len(B)}")
        named = [(B[d], jnp.int32, f"idx{d}") for d in range(dim)]
        named.append((B[-1], jnp.float32, "vals"))
        for a, dt, nm in named:
            if a.shape != (m, sparse_nz) or a.dtype != dt:
                raise ValueError(
                    f"sparse B {nm} must be {dt.__name__}[{m}, {sparse_nz}], "
                    f"got {a.dtype}{list(a.shape)}")


def _visit_vmem_plan(vshape, nk_var, noise, ns_const, m, n_dirs, sparse_nz,
                     f_batched, C, r_bytes, fc_plane, bc_max=None,
                     flat=False):
    """Shared VMEM accounting for the visit kernels: resident planes are the
    varying coefficient planes, the noise-scale plane (unless constant), the
    Woodbury fields, and the measurement fields (unless SMEM-synthesized)."""
    plane = _padded_plane(vshape)
    planes_pc = _PLANES_PER_CHAIN_FLAT if flat else _PLANES_PER_CHAIN
    resident = (nk_var + (1 if noise and ns_const is None else 0)
                + n_dirs * m + (0 if sparse_nz else m)
                + (0 if f_batched else 1)) * plane + r_bytes
    per_chain = (planes_pc + (1 if f_batched else 0)) * plane + fc_plane
    return _pick_bc(C, resident, per_chain, bc_max=bc_max)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "diag_index", "omega", "orders", "color_weights",
                     "n_colors", "noise", "fuse_restrict", "interpret",
                     "const_coeffs", "ns_const", "sparse_nz", "bc_max",
                     "layout", "lvshape"),
)
def descend_visit(
    key, coeffs, noise_scale, B, Bbar, sinv, Rh, RwT, f, x, *,
    offsets, diag_index, omega, orders, color_weights, n_colors,
    noise=True, fuse_restrict=True, interpret=False,
    const_coeffs=None, ns_const=None, sparse_nz=0, bc_max=None,
    layout=None, lvshape=None,
):
    """One fused descend visit.  Returns ``(x_new, f_coarse)`` - or
    ``(x_new, r)`` with ``fuse_restrict=False`` (3d: the tensor-product
    restriction needs relayouts in-kernel, so it stays outside).

    ``f`` has shape ``(*v)`` (shared across chains) or ``(C, *v)``; ``x`` is
    ``(C, *v)``.  ``orders`` is a tuple of colour orders - one directed sweep
    per entry (one = SOR visits, (forward, backward) = SSOR visits), with
    ``Bbar`` holding ``len(orders) * m`` stacked Woodbury fields.
    ``noise_scale`` is the field ``sqrt(D (2-omega)/omega)``;
    ``B``/``Bbar``/``sinv`` are ``None`` for operators without a low-rank term
    (``sinv`` = ``Sigma^{-1/2}-scaled`` is split: pass ``(lr_scale, sigma_inv)``
    - see FusedVisitLevel).  With ``noise=False`` the kernel runs the purely
    deterministic data path (used by CPU interpret-mode exactness tests).

    Resident-set compression (VERDICT r2 #2: 1024^2-with-measurements fusion):

    * ``const_coeffs`` - tuple, one entry per offset: a float bakes that
      spatially-constant coefficient plane into the kernel; ``None`` entries
      are read from ``coeffs``, which then holds ONLY the varying planes.
    * ``ns_const`` - static float noise scale (``noise_scale`` ignored).
    * ``sparse_nz > 0`` - ``B`` is a ``(*index_arrays, vals)`` tuple (one
      int32 ``(m, sparse_nz)`` array per lattice dim + float32 values, SMEM);
      measurement fields are synthesized in-kernel instead of held as m
      resident planes.
    """
    dim = len(offsets[0])
    C, vshape = x.shape[0], x.shape[1:]
    adim = x.ndim - 1  # array spatial rank; < dim under a flattened layout
    if layout is not None and lvshape is None:
        raise ValueError("layout requires lvshape (logical extents)")
    if sparse_nz:
        m = B[0].shape[0]
    else:
        m = 0 if B is None else B.shape[0]
    n_dirs = len(orders)
    if const_coeffs is None:
        const_coeffs = (None,) * len(offsets)
    nk_var = sum(1 for c in const_coeffs if c is None)
    _check_compression(coeffs, const_coeffs, nk_var, offsets, B, m, sparse_nz,
                       vshape, lvshape)
    plane = _padded_plane(vshape)
    if fuse_restrict:
        vc = (Rh.shape[0], RwT.shape[1])
        r_bytes = 4 * (Rh.size + RwT.size)
    else:
        vc = vshape
        r_bytes = 0
    fc_plane = _padded_plane(vc)
    f_batched = f.ndim == x.ndim
    bc = _visit_vmem_plan(vshape, nk_var, noise, ns_const, m, n_dirs,
                          sparse_nz, f_batched, C, r_bytes, fc_plane,
                          bc_max=bc_max, flat=layout is not None)
    if bc is None:
        raise ValueError(f"visit kernel does not fit VMEM for C={C}, v={vshape}")
    nblocks = C // bc
    zeros = (0,) * adim

    params = dict(offsets=offsets, diag_index=diag_index, omega=omega,
                  orders=orders, color_weights=color_weights, n_colors=n_colors)
    if layout is not None:
        params.update(layout=layout, vshape=lvshape)

    args = []
    in_specs = []
    nw = 0
    if noise:
        kfield, klr = jax.random.split(key)
        seeds, nw = _block_seeds(kfield, nblocks)
        args.append(seeds)
        in_specs.append(
            pl.BlockSpec((nblocks * nw,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        if m:
            lr_scale, sinv, G = sinv
            # one (C, m) draw per directed sweep, shaped (C, 1, .., 1,
            # n_dirs * m) so the block's trailing dims equal the array dims
            # (Mosaic tiling rule); sliced (bc, 1, .., 1) in-kernel
            xi_lr = (jax.random.normal(klr, (C, n_dirs * m), x.dtype)
                     * jnp.tile(lr_scale, n_dirs)
                     ).reshape((C,) + (1,) * (adim - 1) + (n_dirs * m,))
            args.append(xi_lr)
            in_specs.append(
                pl.BlockSpec((bc,) + (1,) * (adim - 1) + (n_dirs * m,),
                             lambda i: (i,) + (0,) * adim,
                             memory_space=pltpu.VMEM)
            )
        else:
            sinv = None
    elif m:
        _, sinv, G = sinv
    kern = _make_descend_kernel(
        params=params, n_seed_words=nw, noise=noise, m=m, bc=bc,
        fuse_restrict=fuse_restrict, const_coeffs=const_coeffs,
        ns_const=ns_const, sparse_nz=sparse_nz,
    )

    def resident_spec(lead):
        return pl.BlockSpec((lead,) + vshape, lambda i: (0,) + zeros,
                            memory_space=pltpu.VMEM)

    if nk_var:
        args.append(coeffs)
        in_specs.append(resident_spec(nk_var))
    if noise and ns_const is None:
        args.append(noise_scale.reshape((1,) + vshape))
        in_specs.append(resident_spec(1))
    if m:
        def smem_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

        if sparse_nz:
            args.extend(list(B))
            in_specs.extend([smem_spec(a.shape) for a in B])
        else:
            args.append(B)
            in_specs.append(resident_spec(m))
        args.extend([Bbar, sinv.reshape(1, m), G])
        in_specs.extend([
            resident_spec(n_dirs * m),
            # scalars want a 2d SMEM layout (Mosaic rejects rank-1 f32 SMEM)
            smem_spec((1, m)),
            smem_spec((m, m)),
        ])
    if fuse_restrict:
        args.extend([Rh, RwT])
        in_specs.extend([
            pl.BlockSpec(Rh.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(RwT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ])
    if f_batched:
        args.append(f)
        in_specs.append(
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros,
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(f.reshape((1,) + vshape))
        in_specs.append(resident_spec(1))
    x_index = len(args)
    args.append(x)
    in_specs.append(
        pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros,
                     memory_space=pltpu.VMEM)
    )

    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((C,) + vc, x.dtype),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc,) + vc, lambda i: (i,) + zeros,
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={x_index: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "diag_index", "omega", "orders", "color_weights",
                     "n_colors", "coarse_scaling", "noise", "fuse_prolongate",
                     "interpret", "const_coeffs", "ns_const", "sparse_nz",
                     "bc_max", "layout", "lvshape"),
)
def ascend_visit(
    key, coeffs, noise_scale, B, Bbar, lr_scale, RhT, Rw, f, x, x_coarse, *,
    offsets, diag_index, omega, orders, color_weights, n_colors,
    coarse_scaling=1.0, noise=True, fuse_prolongate=True, interpret=False,
    const_coeffs=None, ns_const=None, sparse_nz=0, bc_max=None,
    layout=None, lvshape=None,
):
    """One fused ascend visit: ``x += gamma P x_c`` then the post Gibbs
    sweep(s) (+ Woodbury per sweep; ``orders``/stacked ``Bbar`` as in
    descend_visit).  Returns the new x.  With ``fuse_prolongate=False``
    ``x_coarse`` must hold the already-prolongated fine-size field ``P x_c``
    (3d path).  ``const_coeffs``/``ns_const``/``sparse_nz`` compress the
    resident set exactly as in :func:`descend_visit`."""
    dim = len(offsets[0])
    C, vshape = x.shape[0], x.shape[1:]
    adim = x.ndim - 1  # array spatial rank; < dim under a flattened layout
    if layout is not None and lvshape is None:
        raise ValueError("layout requires lvshape (logical extents)")
    if sparse_nz:
        m = B[0].shape[0]
    else:
        m = 0 if B is None else B.shape[0]
    n_dirs = len(orders)
    if const_coeffs is None:
        const_coeffs = (None,) * len(offsets)
    nk_var = sum(1 for c in const_coeffs if c is None)
    _check_compression(coeffs, const_coeffs, nk_var, offsets, B, m, sparse_nz,
                       vshape, lvshape)
    vc = x_coarse.shape[1:]
    fc_plane = _padded_plane(vc)
    f_batched = f.ndim == x.ndim
    r_bytes = 4 * (RhT.size + Rw.size) if fuse_prolongate else 0
    bc = _visit_vmem_plan(vshape, nk_var, noise, ns_const, m, n_dirs,
                          sparse_nz, f_batched, C, r_bytes, fc_plane,
                          bc_max=bc_max, flat=layout is not None)
    if bc is None:
        raise ValueError(f"visit kernel does not fit VMEM for C={C}, v={vshape}")
    nblocks = C // bc
    zeros = (0,) * adim

    params = dict(offsets=offsets, diag_index=diag_index, omega=omega,
                  orders=orders, color_weights=color_weights, n_colors=n_colors)
    if layout is not None:
        params.update(layout=layout, vshape=lvshape)

    args = []
    in_specs = []
    nw = 0
    if noise:
        kfield, klr = jax.random.split(key)
        seeds, nw = _block_seeds(kfield, nblocks)
        args.append(seeds)
        in_specs.append(
            pl.BlockSpec((nblocks * nw,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        if m:
            xi_lr = (jax.random.normal(klr, (C, n_dirs * m), x.dtype)
                     * jnp.tile(lr_scale, n_dirs)
                     ).reshape((C,) + (1,) * (adim - 1) + (n_dirs * m,))
            args.append(xi_lr)
            in_specs.append(
                pl.BlockSpec((bc,) + (1,) * (adim - 1) + (n_dirs * m,),
                             lambda i: (i,) + (0,) * adim,
                             memory_space=pltpu.VMEM)
            )
    kern = _make_ascend_kernel(
        params=params, n_seed_words=nw, noise=noise, m=m, bc=bc,
        coarse_scaling=float(coarse_scaling), fuse_prolongate=fuse_prolongate,
        const_coeffs=const_coeffs, ns_const=ns_const, sparse_nz=sparse_nz,
    )

    def resident_spec(lead):
        return pl.BlockSpec((lead,) + vshape, lambda i: (0,) + zeros,
                            memory_space=pltpu.VMEM)

    if nk_var:
        args.append(coeffs)
        in_specs.append(resident_spec(nk_var))
    if noise and ns_const is None:
        args.append(noise_scale.reshape((1,) + vshape))
        in_specs.append(resident_spec(1))
    if m:
        if sparse_nz:
            args.extend(list(B))
            in_specs.extend([
                pl.BlockSpec(a.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
                for a in B
            ])
        else:
            args.append(B)
            in_specs.append(resident_spec(m))
        args.append(Bbar)
        in_specs.append(resident_spec(n_dirs * m))
    if fuse_prolongate:
        args.extend([RhT, Rw])
        in_specs.extend([
            pl.BlockSpec(RhT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(Rw.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ])
    if f_batched:
        args.append(f)
        in_specs.append(
            pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros,
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(f.reshape((1,) + vshape))
        in_specs.append(resident_spec(1))
    x_index = len(args)
    args.append(x)
    in_specs.append(
        pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros,
                     memory_space=pltpu.VMEM)
    )
    args.append(x_coarse)
    in_specs.append(
        pl.BlockSpec((bc,) + vc, lambda i: (i,) + zeros, memory_space=pltpu.VMEM)
    )

    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros,
                               memory_space=pltpu.VMEM),
        input_output_aliases={x_index: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(*args)


def supports_visit(vshape, dtype, n_offsets, m, nchains, n_dirs=1,
                   n_var_coeffs=None, ns_const=False,
                   sparse_B=False, flat=False, r_bytes=0) -> Optional[int]:
    """Whether the fused visit kernels handle this level; returns the chain
    block size bc, or None.  2d and 3d float32 (3d without in-kernel
    transfers); the level's resident fields and one chain block of kernel
    temporaries must fit VMEM.  ``n_dirs`` = sweeps per visit (2 for SSOR:
    the stacked B_bar fields grow the resident set).  ``n_var_coeffs`` /
    ``ns_const`` / ``sparse_B`` mirror the wrappers' resident-set compression
    (constant coefficient planes baked static, SMEM-synthesized measurement
    fields) - at 1023^2 with m=8 they are what shrinks the resident set from
    23 to 9 planes (measured round 4; see BASELINE.md)."""
    if len(vshape) not in (2, 3) or jnp.dtype(dtype) != jnp.float32:
        return None
    plane = _padded_plane(vshape)
    nk = n_offsets if n_var_coeffs is None else n_var_coeffs
    planes_pc = _PLANES_PER_CHAIN_FLAT if flat else _PLANES_PER_CHAIN
    # matches the wrappers' accounting; r_bytes carries the resident transfer
    # matrices (the 2d banded R are tiny; the flat-3d kron is ~15 MB at 63^3)
    resident = (nk + (1 if not ns_const else 0) + 1
                + n_dirs * m + (0 if sparse_B else m)) * plane + plane + r_bytes
    per_chain = planes_pc * plane + plane
    return _pick_bc(nchains, resident, per_chain)


def compress_plan(op, omega):
    """Detect resident-set compression opportunities for a level operator.

    Returns ``(const_coeffs, ns_const, sparse_B)``:

    * ``const_coeffs`` - tuple with a float per spatially-constant coefficient
      plane (None per varying plane), or None when nothing is constant.
      Constant-kappa FD priors (``shiftedlaplace_fd_operator.cc:33-56``) have
      ALL planes constant; Galerkin-coarsened levels generally do not.
    * ``ns_const`` - static float Gibbs noise scale sqrt(D (2-omega)/omega)
      when the stencil diagonal is constant (computed in float32 to match
      the composed path's array arithmetic exactly).
    * ``sparse_B`` - ``(*index_arrays, vals)`` (one int32 ``(m, nz)`` array
      per lattice dim + float32 values) when every measurement column has at
      most ``MGMC_VISIT_SPARSE_NZ_MAX`` (default 16) nonzeros (radius-0
      columns are one-hot, ``measured_operator.cc:74-91``); else None.

    ``MGMC_VISIT_COMPRESS=0`` disables all three (diagnostic escape hatch).
    """
    import numpy as np

    from ..stencil import interior_mask

    if os.environ.get("MGMC_VISIT_COMPRESS", "1") == "0":
        return None, None, None
    coeffs = np.asarray(op.coeffs)
    cc = []
    for k, off in enumerate(op.offsets):
        # constancy is judged on the interior-valid region only: where the
        # shifted read is masked to zero the coefficient value never acts
        # (assembly may store either 0 or the interior value there)
        vals = coeffs[k][interior_mask(op.vshape, off) > 0]
        if vals.size == 0:
            cc.append(0.0)
        elif bool(np.all(vals == vals.flat[0])):
            cc.append(float(vals.flat[0]))
        else:
            cc.append(None)
    const_coeffs = None if all(c is None for c in cc) else tuple(cc)
    ns_const = None
    dval = cc[op.diag_index]
    if dval is not None:
        ns_const = float(np.sqrt(np.float32(dval)
                                 * np.float32((2.0 - omega) / omega)))
    sparse_B = None
    if op.lowrank is not None and len(op.vshape) in (2, 3):
        dim = len(op.vshape)
        Bnp = np.asarray(op.lowrank.B)
        m = Bnp.shape[0]
        nz_max = int(os.environ.get("MGMC_VISIT_SPARSE_NZ_MAX", "16"))
        counts = [int(np.count_nonzero(Bnp[k])) for k in range(m)]
        if max(counts) <= nz_max:
            nz = max(max(counts), 1)
            idx = np.full((dim, m, nz), -1, np.int32)
            vals = np.zeros((m, nz), np.float32)
            for k in range(m):
                nzk = np.nonzero(Bnp[k])
                cnt = len(nzk[0])
                for d in range(dim):
                    idx[d, k, :cnt] = nzk[d]
                vals[k, :cnt] = Bnp[k][nzk]
            sparse_B = tuple(jnp.asarray(idx[d]) for d in range(dim)) + (
                jnp.asarray(vals),)
    return const_coeffs, ns_const, sparse_B


def visit_plan(op, omega, n_dirs, nchains=16):
    """Gating + compression decision for one level: returns
    ``dict(const_coeffs, ns_const, sparse_B, bc)`` or None when the fused
    visit kernels cannot handle the level even compressed.  Sparse
    measurement synthesis costs VPU recomputation at every use site, so it
    engages only when it enlarges the feasible chain block."""
    if len(op.vshape) not in (2, 3) or op.coeffs.dtype != jnp.float32:
        return None
    const_coeffs, ns_const, sparse_B = compress_plan(op, omega)
    n_var = (len(op.offsets) if const_coeffs is None
             else sum(1 for c in const_coeffs if c is None))
    m = op.m_lowrank
    # flat-3d storage (FusedVisitLevel.flat): budget with the (Z, Y*X) padded
    # plane (~2x smaller than the (Z, Y, X) one at odd extents), the flat
    # per-chain temporary count, and the resident kron transfer matrix
    ashape = op.vshape
    flat3d = (len(op.vshape) == 3
              and os.environ.get("MGMC_VISIT_FLAT3D", "1") == "1")
    r_bytes = 0
    if flat3d:
        Z, Y, X = op.vshape
        ashape = (Z, Y * X)
        # each kernel holds one 1d Z-restrict matrix + one (Y*X, Yc*Xc) kron
        r_bytes = 4 * ((Z // 2) * Z + (Y // 2) * (X // 2) * Y * X)
    common = dict(n_dirs=n_dirs, n_var_coeffs=n_var,
                  ns_const=ns_const is not None, flat=flat3d, r_bytes=r_bytes)
    bc_dense = supports_visit(ashape, op.coeffs.dtype, len(op.offsets),
                              m, nchains, sparse_B=False, **common)
    bc = bc_dense
    use_sparse = False
    if sparse_B is not None and m:
        bc_sparse = supports_visit(ashape, op.coeffs.dtype,
                                   len(op.offsets), m, nchains,
                                   sparse_B=True, **common)
        if bc_sparse is not None and (bc_dense is None or bc_sparse > bc_dense):
            use_sparse, bc = True, bc_sparse
    if bc is None:
        return None
    return dict(const_coeffs=const_coeffs, ns_const=ns_const,
                sparse_B=sparse_B if use_sparse else None, bc=bc)


def _sweep_spec(obj):
    """Normalise a smoother/sampler object into the fused-visit sweep spec
    ``(orders, Bbar_stacked, coloring, omega)``, or None if unsupported.

    Handles SORSmoother (one directed sweep), SSORSmoother (forward +
    backward), and the samplers wrapping them (SORSampler / SSORSampler)."""
    if hasattr(obj, "smoother"):  # SORSampler
        return _sweep_spec(obj.smoother) if obj.nsmooth == 1 else None
    if hasattr(obj, "order"):  # SORSmoother
        if obj.nsmooth != 1:
            return None
        return (obj.order,), obj.B_bar, obj.coloring, obj.omega
    if hasattr(obj, "forward"):  # SSORSmoother / SSORSampler
        if obj.nsmooth != 1:
            return None
        f = _sweep_spec(obj.forward)
        b = _sweep_spec(obj.backward)
        if f is None or b is None:
            return None
        Bbar = None if f[1] is None else jnp.concatenate([f[1], b[1]], axis=0)
        return f[0] + b[0], Bbar, f[2], f[3]
    return None


def fused_levels_for(operators, presmoothers, postsmoothers, coarse_scaling,
                     min_vertices, interpret=False, force=None,
                     min_vertices_3d=None):
    """Shared gating + construction of per-level fused visit kernels.

    ``presmoothers``/``postsmoothers`` are SOR/SSOR smoother (or sampler)
    objects per level.  Enabled by default on a single TPU device
    (``MGMC_FUSED=0`` disables, ``=1`` forces); levels below ``min_vertices``
    or unsupported shapes stay on the composed path.  ``force=True/False``
    overrides the device-count auto gate (the data-parallel multi-chip path
    runs the kernels per shard inside shard_map, where the auto gate's
    single-device check would wrongly disable them); the env var still wins.
    """
    flag = os.environ.get("MGMC_FUSED", "auto")
    if flag == "0" or (force is False and flag != "1"):
        return {}
    if flag != "1" and force is not True:
        try:
            if jax.default_backend() == "cpu" or len(jax.devices()) != 1:
                return {}
        except RuntimeError:
            return {}
    levels = {}
    for level in range(len(operators) - 1):
        op = operators[level]
        pre = _sweep_spec(presmoothers[level])
        post = _sweep_spec(postsmoothers[level])
        if pre is None or post is None:
            continue
        # the 2d crossover (min_vertices, autotuned ~40k on v5e) does not
        # transfer to 3d: the composed 31^3 visit pays 4x lane padding and
        # relayout-prone tensor-product transfers, so flat-3d fused visits
        # pay at far smaller levels (round-5 breakdown: composed L1 gibbs
        # 1.2 ms vs the whole fused flat L0 pair ~2 ms at 8x the data).
        # An explicit min_vertices_3d (the samplers forward their explicit
        # fused_min_vertices argument) overrides the env/default.
        if len(op.vshape) == 2:
            mv = min_vertices
        elif min_vertices_3d is not None:
            mv = min_vertices_3d
        else:
            mv = int(os.environ.get("MGMC_FUSED_MIN_VERTICES_3D", "20000"))
        if op.lattice.nvertex < mv:
            continue
        plan = visit_plan(op, pre[3], n_dirs=len(pre[0]))
        if plan is None:
            continue
        levels[level] = FusedVisitLevel(
            op, pre[2], pre[3], pre[0], post[0],
            pre[1], post[1], coarse_scaling, interpret=interpret, plan=plan,
        )
    return levels


class FusedVisitLevel:
    """Per-level bundle of precomputed arrays + static config for the fused
    visit kernels.  Built by MultigridMCSampler when fused visits are enabled;
    holds no jax tracers (all arrays are constants closed over by the jitted
    wrappers)."""

    def __init__(self, op, coloring, omega, pre_orders, post_orders,
                 Bbar_pre, Bbar_post, coarse_scaling, interpret=False,
                 plan=None):
        """``pre_orders``/``post_orders``: tuple of colour orders - one
        directed sweep per entry (SOR: one; SSOR: (forward, backward)) - with
        ``Bbar_pre``/``Bbar_post`` holding the matching stacked
        ``len(orders) * m`` Woodbury fields (or None without low rank).
        Single orders/plain Bbar are accepted and wrapped.

        ``plan`` is the resident-set compression decision from
        :func:`visit_plan` (computed here when omitted): constant coefficient
        planes are baked into the kernel as static floats, a constant noise
        scale becomes ``ns_const``, and sparse measurement columns are passed
        as SMEM triplets instead of resident VMEM planes."""
        from ..intergrid import _restrict_matrix_1d

        if pre_orders and not isinstance(pre_orders[0], tuple):
            pre_orders = (pre_orders,)
        if post_orders and not isinstance(post_orders[0], tuple):
            post_orders = (post_orders,)

        self.op = op
        self.omega = float(omega)
        self.interpret = bool(interpret)
        self.coarse_scaling = float(coarse_scaling)
        #: flat-3d mode (round 5): store 3d fields as (Z, Y*X) inside the
        #: kernel.  This (a) cuts the VMEM/HBM footprint ~2x (a 63-extent
        #: lane dim pads to 128; the 3969-wide flattened lane dim pads 3%),
        #: and (b) makes the tensor-product transfers the same two MXU
        #: matmuls as 2d - f_c = R_z r kron(R_y, R_x)^T - so they fuse into
        #: the kernel instead of running as relayout-prone XLA contractions.
        #: Stencil reads stay exact: y/z shifts become strided rolls of the
        #: packed axis whose cross-boundary wraps are zero-masked by the
        #: per-logical-dim iotas (see sor_pallas_v2._shifted).
        self.flat = (len(op.vshape) == 3
                     and os.environ.get("MGMC_VISIT_FLAT3D", "1") == "1")
        self.fuse_transfers = len(op.vshape) == 2 or self.flat
        name = jnp.dtype(op.coeffs.dtype).name
        if len(op.vshape) == 2:
            H, W = op.vshape
            Rh = _restrict_matrix_1d(H, name)
            Rw = _restrict_matrix_1d(W, name)
            self.Rh = jnp.asarray(Rh)
            self.RwT = jnp.asarray(Rw.T)
            self.RhT = jnp.asarray(Rh.T)
            self.Rw = jnp.asarray(Rw)
        elif self.flat:
            import numpy as np

            Z, Y, X = op.vshape
            Rz = np.asarray(_restrict_matrix_1d(Z, name))
            Ry = np.asarray(_restrict_matrix_1d(Y, name))
            Rx = np.asarray(_restrict_matrix_1d(X, name))
            K = np.kron(Ry, Rx)
            self.Rh = jnp.asarray(Rz)
            self.RwT = jnp.asarray(K.T)
            self.RhT = jnp.asarray(Rz.T)
            self.Rw = jnp.asarray(K)
            self._vc3 = (Rz.shape[0], Ry.shape[0], Rx.shape[0])
        else:
            self.Rh = self.RwT = self.RhT = self.Rw = None
        self.noise_scale = jnp.sqrt(
            op.diag_stencil() * ((2.0 - self.omega) / self.omega)
        )
        if op.lowrank is not None:
            m = op.m_lowrank

            def stack(bb, n):
                # the Woodbury factor is DIRECTION-dependent: silently tiling
                # one direction's B_bar across sweeps would bias the sampler,
                # so require the caller to pass exactly n * m stacked fields
                bb = jnp.asarray(bb)
                if bb.shape[0] != n * m:
                    raise ValueError(
                        f"B_bar must stack {n} x {m} fields, got {bb.shape[0]}")
                return bb

            self.B = op.lowrank.B
            self.Bbar_pre = stack(Bbar_pre, len(pre_orders))
            self.Bbar_post = stack(Bbar_post, len(post_orders))
            self.lr_scale = 1.0 / jnp.sqrt(op.lowrank.Sigma_diag)
            self.sigma_inv = 1.0 / op.lowrank.Sigma_diag
            # Gram matrix for the kernel's (I - G) btx residual shortcut,
            # against the LAST pre-sweep's Bbar (that is the correction the
            # residual sees)
            self.G_pre = jnp.einsum(
                "k...,l...->kl", self.B, self.Bbar_pre[-m:],
                precision=jax.lax.Precision.HIGHEST)
        else:
            self.B = self.Bbar_pre = self.Bbar_post = None
            self.lr_scale = self.sigma_inv = None
        if plan is None:
            plan = visit_plan(op, self.omega, n_dirs=len(pre_orders))
        if plan is None:  # unsupported shape reached directly: no compression
            plan = dict(const_coeffs=None, ns_const=None, sparse_B=None)
        self.const_coeffs = plan["const_coeffs"]
        self.ns_const = plan["ns_const"]
        self._sparse_B = plan["sparse_B"]
        if self.const_coeffs is None:
            self._coeffs_k = op.coeffs
        else:
            var_idx = [k for k, c in enumerate(self.const_coeffs) if c is None]
            self._coeffs_k = op.coeffs[jnp.asarray(var_idx)] if var_idx else None
        self._sparse_nz = (0 if self._sparse_B is None
                           else int(self._sparse_B[0].shape[1]))
        #: per-level chain-block cap (None = global _BC_MAX); settable for
        #: per-level tuning (small levels amortize per-block overhead better
        #: with larger blocks)
        self.bc_max = None
        self._statics = dict(
            offsets=op.offsets, diag_index=op.diag_index, omega=self.omega,
            color_weights=coloring.weights, n_colors=coloring.n_colors,
            interpret=self.interpret, const_coeffs=self.const_coeffs,
            ns_const=self.ns_const, sparse_nz=self._sparse_nz,
        )
        if self.flat:
            Z, Y, X = op.vshape
            self._statics.update(
                layout=((-2, 1), (-1, X), (-1, 1)), lvshape=(Z, Y, X))
            flat = self._flat_field
            if self._coeffs_k is not None:
                self._coeffs_k = flat(self._coeffs_k)
            if self.ns_const is None:
                self.noise_scale = flat(self.noise_scale)
            if self.B is not None:
                if self._sparse_B is None:
                    self.B = flat(self.B)
                self.Bbar_pre = flat(self.Bbar_pre)
                self.Bbar_post = flat(self.Bbar_post)
        self.pre_orders = pre_orders
        self.post_orders = post_orders

    def _flat_field(self, a):
        """(..., Z, Y, X) -> (..., Z, Y*X)."""
        Z, Y, X = self.op.vshape
        return a.reshape(a.shape[:-3] + (Z, Y * X))

    def _unflat_field(self, a, vshape=None):
        vshape = self.op.vshape if vshape is None else vshape
        return a.reshape(a.shape[:-2] + tuple(vshape))

    def _b_arg(self):
        return self.B if self._sparse_B is None else self._sparse_B

    def descend(self, key, f, x, noise=True, flat_io=False):
        """Returns (x, f_coarse) when transfers are fused, else (x, r).

        ``flat_io`` (flat-3d mode only): f/x arrive and x/f_coarse return in
        the kernel's (Z, Y*X) storage - callers that keep the chain state
        flat across the whole cycle skip the per-call relayouts."""
        sinv = None if self.B is None else (
            self.lr_scale, self.sigma_inv, self.G_pre)
        ns = self.noise_scale if self.ns_const is None else None
        if self.flat and not flat_io:
            f, x = self._flat_field(f), self._flat_field(x)
        out_x, out_c = descend_visit(
            key, self._coeffs_k, ns, self._b_arg(), self.Bbar_pre,
            sinv, self.Rh, self.RwT, f, x,
            orders=self.pre_orders, noise=noise,
            fuse_restrict=self.fuse_transfers, bc_max=self.bc_max,
            **self._statics,
        )
        if self.flat and not flat_io:
            out_x = self._unflat_field(out_x)
            out_c = out_c.reshape(out_c.shape[:-2] + self._vc3)
        return out_x, out_c

    def ascend(self, key, f, x, x_coarse, noise=True, flat_io=False):
        """``x_coarse`` is the coarse field when transfers are fused, else
        the already-prolongated fine-size ``P x_c``."""
        ns = self.noise_scale if self.ns_const is None else None
        if self.flat and not flat_io:
            f, x = self._flat_field(f), self._flat_field(x)
            Zc = self.RhT.shape[1]
            x_coarse = x_coarse.reshape(x_coarse.shape[:-3] + (Zc, -1))
        out = ascend_visit(
            key, self._coeffs_k, ns, self._b_arg(), self.Bbar_post,
            self.lr_scale, self.RhT, self.Rw, f, x, x_coarse,
            orders=self.post_orders, coarse_scaling=self.coarse_scaling,
            noise=noise, fuse_prolongate=self.fuse_transfers,
            bc_max=self.bc_max, **self._statics,
        )
        if self.flat and not flat_io:
            out = self._unflat_field(out)
        return out
