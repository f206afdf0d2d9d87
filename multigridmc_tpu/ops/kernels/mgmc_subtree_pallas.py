"""The MGMC coarse *subtree* as one Pallas kernel.

Profiling the production step (NOTES_R2.md) shows the fused finest-level
visits cost 2.0 ms while the REST of the W-cycle - levels 1..L-1 plus the 16
coarse Cholesky samples - costs ~3.5 ms spread over ~1300 tiny XLA ops
(sweep phases at 31^2-127^2, noise, Woodbury reductions, intergrid matmuls):
the tail is op-count bound, not flops or bandwidth bound.  This module fuses
the *entire* subtree below the finest level into a single Pallas call per
MGMC step:

    x_1 = subtree(f_1):                     # all in VMEM per chain block
        for j in range(cycle):              # lax.fori_loop, noise via the
            pre Gibbs sweep (on-chip noise)  #   stateful on-chip PRNG
            Woodbury; residual; restrict     # (I - G) btx shortcut
            recurse to level 2 ... coarse
            coarse: x = Linv^T (xi + Linv f) # inverse-factor matmuls
            prolongate_add; post Gibbs sweep; Woodbury

Semantics mirror ``multigridmc_sampler.cc:103-130`` exactly: sub-level states
are zero-initialised at level entry and carried across the ``cycle``
iterations; pre-sweeps run forward, post-sweeps backward.  The coarse sample
uses precomputed inverse Cholesky factors (x = L^{-T}(xi + L^{-1} f) - the
same distribution as the triangular-solve path; matmuls are the kernel-
friendly form).  All noise (field + low-rank scalars) comes from the on-chip
PRNG, one seed per chain block, drawn sequentially across visits.

2d only, float32, SOR with one pre/post sweep (the production bench shape);
every other configuration stays on the composed XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mgmc_visit_pallas import (
    _vmem_limit,
    _apply_stencil,
    _block_seeds,
    _mm,
    _normals,
    _padded_plane,
    _pick_bc,
    _reduce_spatial,
)
from .sor_pallas_v2 import _sweep_body

#: sub-level fields are small, so the block size trades VMEM for per-op
#: parallel width: op overhead dominates tiny shapes, and fewer/wider blocks
#: amortise it (unlike the finest-level visit kernels, whose streaming
#: pipeline prefers bc=8)
_SUBTREE_BC_MAX = int(os.environ.get("MGMC_SUBTREE_BC_MAX", "32"))


def _level_noise(f, shape, ns_ref, B_ref, xi_slice, m, dim):
    """Noisy Gibbs rhs: the field noise is drawn on-chip; the m low-rank
    scalars per chain arrive pre-scaled from the slot table ``xi_slice``
    ((bc, 1, m), ref-loaded - Mosaic can broadcast slices of loaded values
    but rejects the same multiply on freshly *computed* (bc, 1, 1) normals).
    Cf. ``sor_sampler.cc:39-56``."""
    xi = _normals(shape)
    c = f + ns_ref[:] * xi
    for k in range(m):
        c = c + xi_slice[..., k:k + 1] * B_ref[k][None]
    return c


def _gibbs_sweep(x, c, coeffs, lv, order):
    params = dict(offsets=lv["offsets"], diag_index=lv["diag_index"],
                  omega=lv["omega"], order=order,
                  color_weights=lv["color_weights"], n_colors=lv["n_colors"])
    return _sweep_body(coeffs, c, x, **params)


def _woodbury_btx(x, B_ref, Bbar_ref, m, dim):
    """Returns (corrected x, btx list) - btx reusable for the residual."""
    btx = [_reduce_spatial(x * B_ref[k][None], dim) for k in range(m)]
    for l in range(m):
        x = x - btx[l] * Bbar_ref[l][None]
    return x, btx


def _slot_bases(levels, cycle):
    """Per-level base row of the low-rank noise slot table: level li is
    visited cycle^(li+1) times, two sweeps per visit."""
    bases = []
    base = 0
    for li, lv in enumerate(levels):
        bases.append(base)
        if lv["m"]:
            base += 2 * cycle ** (li + 1)
    return tuple(bases), base


def _make_subtree_kernel(*, levels, cycle, n_seed_words, noise, bc):
    """levels: tuple of per-level static dicts (finest sub-level first)."""
    dim = 2
    slot_bases, _ = _slot_bases(levels, cycle)
    any_m = any(lv["m"] for lv in levels)

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it) if noise else None
        xi_ref = next(it) if (noise and any_m) else None
        per_level = []
        for lv in levels:
            r = {"coeffs": next(it), "ns": next(it)}
            if lv["m"]:
                r["B"] = next(it)
                r["Bbar_f"] = next(it)
                r["Bbar_b"] = next(it)
                r["sinv"] = next(it)
                r["G"] = next(it)
            r["Rh"] = next(it)
            r["RwT"] = next(it)
            r["RhT"] = next(it)
            r["Rw"] = next(it)
            per_level.append(r)
        Linv_ref = next(it)
        LinvT3_ref = next(it)
        f_ref = next(it)
        xout_ref = next(it)

        if noise:
            i = pl.program_id(0)
            pltpu.prng_seed(
                *(seed_ref[i * n_seed_words + j] for j in range(n_seed_words))
            )

        def coarse_sample(f_l):
            """x = Linv^T (xi + Linv f) with the coarse vector kept FLAT
            (bc, n): Mosaic cannot shape-cast (bc, h, w) <-> (bc, h*w) or
            concat unaligned lane pieces, so the 2d->flat transition is folded
            into the Linv contraction (one (bc, w) @ (w, n) matmul per coarse
            row h, summed) and flat->2d is folded into the last sub-level's
            prolongation (see cycle_body)."""
            vc = levels[-1]["vc"]
            g = None
            for h in range(vc[0]):
                t = _mm(f_l[:, h, :], LinvT3_ref[h])  # (bc, n)
                g = t if g is None else g + t
            if noise:
                g = g + _normals(g.shape)
            return _mm(g, Linv_ref[:])  # flat rows of Linv^T (xi + g)

        def sample(li, f_l, v):
            """Levels below the kernel's finest are indexed li = 0.. ; the
            coarsest Cholesky level is li == len(levels).  ``v`` is the flat
            visit index threaded through the recursion (selects this visit's
            low-rank noise slots)."""
            if li == len(levels):
                return coarse_sample(f_l)
            lv = levels[li]
            r = per_level[li]
            m = lv["m"]
            coeffs = r["coeffs"][:]
            vshape = lv["vshape"]
            iotas = [jax.lax.broadcasted_iota(jnp.int32, vshape, d)
                     for d in range(dim)]

            def xi_slot(vv, phase):
                if not (noise and m):
                    return None
                # dynamic index on the untiled leading dim: the loaded value
                # keeps the (bc, 1, m) ref-block layout the broadcast multiply
                # requires (lane/sublane slicing instead breaks it)
                return xi_ref[slot_bases[li] + 2 * vv + phase]

            def cycle_body(j, x_l):
                vv = v * cycle + j
                c = (_level_noise(f_l, x_l.shape, r["ns"], r.get("B"),
                                  xi_slot(vv, 0), m, dim)
                     if noise else f_l)
                x = _gibbs_sweep(x_l, c, coeffs, lv, lv["order_f"])
                btx = None
                if m:
                    x, btx = _woodbury_btx(x, r["B"], r["Bbar_f"], m, dim)
                # residual (incl. low-rank via the (I - G) btx shortcut)
                rres = f_l - _apply_stencil(coeffs, x, lv["offsets"], iotas,
                                            vshape)
                if m:
                    for k in range(m):
                        btx2 = btx[k]
                        for l in range(m):
                            btx2 = btx2 - r["G"][k, l] * btx[l]
                        rres = rres - (btx2 * r["sinv"][0, k]) * r["B"][k][None]
                # restrict; recurse; prolongate_add (lane contraction
                # batched over the block; sublane contraction per chain)
                Rh = r["Rh"][:]
                sres = _mm(rres, r["RwT"][:])  # (bc, H, Wc)
                fc = jnp.stack(
                    [_mm(Rh, sres[b]) for b in range(bc)], axis=0)
                xc = sample(li + 1, fc, vv)
                RhT, Rw = r["RhT"][:], r["Rw"][:]
                if li + 1 == len(levels):
                    # xc is the coarse sample, FLAT (bc, n = hc * wc): fold
                    # the unflatten into the prolongation - per coarse row h,
                    # px += RhT[:, h] (outer) (xc[:, h wc:(h+1) wc] @ Rw)
                    hc, wc = lv["vc"]
                    px = None
                    for h in range(hc):
                        t = _mm(xc[:, h * wc:(h + 1) * wc], Rw)  # (bc, W)
                        col = RhT[:, h:h + 1][None]              # (1, H, 1)
                        term = col * t[:, None, :]               # (bc, H, W)
                        px = term if px is None else px + term
                else:
                    u = _mm(xc, Rw)  # (bc, Hc, W)
                    px = jnp.stack(
                        [_mm(RhT, u[b]) for b in range(bc)], axis=0)
                x = x + lv["coarse_scaling"] * px
                # post sweep (backward)
                c2 = (_level_noise(f_l, x.shape, r["ns"], r.get("B"),
                                   xi_slot(vv, 1), m, dim)
                      if noise else f_l)
                x = _gibbs_sweep(x, c2, coeffs, lv, lv["order_b"])
                if m:
                    x, _ = _woodbury_btx(x, r["B"], r["Bbar_b"], m, dim)
                return x

            x0 = jnp.zeros((f_l.shape[0],) + vshape, f_l.dtype)
            return jax.lax.fori_loop(0, cycle, cycle_body, x0)

        xout_ref[:] = sample(0, f_ref[:], 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("levels", "cycle", "noise",
                                             "interpret"))
def subtree_sample(key, arrays, Linv, LinvT, xi_scales, f, *, levels, cycle,
                   noise=True, interpret=False):
    """Run the whole coarse subtree for batched chains in one Pallas call.

    ``levels``: tuple of per-level static dicts (hashable via tuple of
    items - see SubtreeKernel); ``arrays``: flat tuple of per-level arrays in
    kernel order; ``f``: (C, *v1) batched rhs of the subtree's finest level.
    Returns the sampled (C, *v1) state.
    """
    levels = tuple(dict(lv) for lv in levels)
    C, vshape = f.shape[0], f.shape[1:]
    coarse_n = Linv.shape[0]

    # VMEM budget: resident fields of every sub-level + per-chain working set
    # (f32 = 4 bytes/element; the padded-plane accounting below uses the same)
    resident = 4 * (Linv.size + LinvT.size)
    per_chain = 0
    for lv in levels:
        plane = _padded_plane(lv["vshape"])
        resident += (lv["nk"] + 1 + 3 * lv["m"]) * plane
        per_chain += 20 * plane
    bc = _pick_bc(C, resident, per_chain, bc_max=_SUBTREE_BC_MAX)
    if bc is None:
        raise ValueError("subtree kernel does not fit VMEM")
    nblocks = C // bc
    zeros2 = (0, 0)

    args = []
    in_specs = []
    nw = 0
    if noise:
        kseed, klr = jax.random.split(key)
        seeds, nw = _block_seeds(kseed, nblocks)
        args.append(seeds)
        in_specs.append(
            pl.BlockSpec((nblocks * nw,), lambda i: (0,),
                         memory_space=pltpu.SMEM)
        )
        if xi_scales is not None:
            ns_slots, mmax = xi_scales.shape
            xi = jax.random.normal(klr, (ns_slots, C, 1, mmax), f.dtype) \
                * xi_scales[:, None, None, :]
            args.append(xi)
            in_specs.append(
                pl.BlockSpec((ns_slots, bc, 1, mmax),
                             lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM)
            )

    def resident_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    ai = iter(arrays)
    for lv in levels:
        for _ in range(2):  # coeffs, noise_scale
            a = next(ai)
            args.append(a)
            in_specs.append(resident_spec(a.shape))
        if lv["m"]:
            for _ in range(3):  # B, Bbar_f, Bbar_b
                a = next(ai)
                args.append(a)
                in_specs.append(resident_spec(a.shape))
            for _ in range(2):  # sinv, G (SMEM scalars)
                a = next(ai)
                args.append(a)
                in_specs.append(
                    pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.SMEM))
        for _ in range(4):  # Rh, RwT, RhT, Rw
            a = next(ai)
            args.append(a)
            in_specs.append(resident_spec(a.shape))
    args.extend([Linv, LinvT])
    in_specs.extend([resident_spec(Linv.shape), resident_spec(LinvT.shape)])
    # LinvT arrives pre-split as (hc, wc, n): LinvT3[h] = Linv[:, h wc:].T
    args.append(f)
    in_specs.append(
        pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros2,
                     memory_space=pltpu.VMEM)
    )

    kern = _make_subtree_kernel(
        levels=levels, cycle=cycle, n_seed_words=nw,
        noise=noise, bc=bc,
    )
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bc,) + vshape, lambda i: (i,) + zeros2,
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(*args)


class SubtreeKernel:
    """Precomputed arrays + statics for :func:`subtree_sample`, built from the
    MGMC sampler's hierarchy below its finest level."""

    def __init__(self, operators, presmoothers, postsmoothers, coarse_L,
                 omega, cycle, coarse_scaling, interpret=False):
        from ..intergrid import _restrict_matrix_1d

        self.cycle = int(cycle)
        self.interpret = bool(interpret)
        self.vshape = operators[0].vshape
        levels = []
        arrays = []
        name = "float32"
        for op, pre, post in zip(operators[:-1], presmoothers, postsmoothers):
            H, W = op.vshape
            Rh = _restrict_matrix_1d(H, name)
            Rw = _restrict_matrix_1d(W, name)
            m = op.m_lowrank
            lv = dict(
                offsets=op.offsets, diag_index=op.diag_index,
                omega=float(omega), order_f=pre.order, order_b=post.order,
                color_weights=pre.coloring.weights,
                n_colors=pre.coloring.n_colors, m=m, nk=len(op.offsets),
                vshape=op.vshape, vc=(Rh.shape[0], Rw.shape[0]),
                coarse_scaling=float(coarse_scaling),
            )
            levels.append(tuple(sorted(lv.items())))
            arrays.append(op.coeffs)
            arrays.append(jnp.sqrt(
                op.diag_stencil() * ((2.0 - float(omega)) / float(omega))
            ).reshape((1,) + op.vshape))
            if m:
                lr = op.lowrank
                arrays.extend([lr.B, pre.B_bar, post.B_bar])
                arrays.append((1.0 / lr.Sigma_diag).reshape(1, m))
                G = jnp.einsum("k...,l...->kl", lr.B, pre.B_bar,
                               precision=jax.lax.Precision.HIGHEST)
                arrays.append(G)
            arrays.extend([
                jnp.asarray(Rh), jnp.asarray(Rw.T),
                jnp.asarray(Rh.T), jnp.asarray(Rw),
            ])
        self.levels = tuple(levels)
        self.arrays = tuple(arrays)
        # per-visit low-rank noise slot scales (NS, m): row = one sweep of
        # one visit of one low-rank level, pre-scaled by that level's
        # Sigma^{-1/2}
        lv_dicts = [dict(lv) for lv in levels]
        bases, ns_slots = _slot_bases(lv_dicts, self.cycle)
        ms = {lv["m"] for lv in lv_dicts if lv["m"]}
        assert len(ms) <= 1, "mixed low-rank ranks unsupported in subtree"
        mmax = ms.pop() if ms else 0
        if ns_slots and mmax:
            scales = np.zeros((ns_slots, mmax), np.float32)
            for li, lv in enumerate(lv_dicts):
                if not lv["m"]:
                    continue
                nrows = 2 * self.cycle ** (li + 1)
                lr = operators[li].lowrank
                scales[bases[li]:bases[li] + nrows] = np.asarray(
                    1.0 / np.sqrt(lr.Sigma_diag))[None]
            self.xi_scales = jnp.asarray(scales)
        else:
            self.xi_scales = None
        n = coarse_L.shape[0]
        Linv = scipy.linalg.solve_triangular(
            np.asarray(coarse_L, dtype=np.float64), np.eye(n), lower=True)
        self.Linv = jnp.asarray(Linv, dtype=jnp.float32)
        # split transpose for the fold-flatten contraction in the kernel:
        # LinvT3[h] = Linv[:, h*wc:(h+1)*wc].T, shape (hc, wc, n)
        hc, wc = operators[-1].vshape
        self.LinvT = jnp.asarray(
            Linv.T.reshape(hc, wc, n), dtype=jnp.float32)

    def sample(self, key, f, noise=True):
        return subtree_sample(
            key, self.arrays, self.Linv, self.LinvT, self.xi_scales, f,
            levels=self.levels, cycle=self.cycle, noise=noise,
            interpret=self.interpret,
        )
