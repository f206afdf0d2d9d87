"""Fused multi-colour SOR sweep kernels (Pallas, TPU).

The pure-JAX colored sweep costs one full stencil application per colour plus a
separate pass for noise generation; XLA emits ~3-4 HBM passes per colour phase.
This kernel fuses an ENTIRE sweep (all colour phases, optionally including the
Gibbs noise) into one VMEM-resident pass: load x, b/f and the stencil
coefficients once, run the colour phases on-chip, write x back once.  For the
stochastic sweep the noise is drawn with the on-chip PRNG
(``pltpu.prng_random_bits`` + Box-Muller), eliminating the host-side
``jax.random.normal`` passes.

Exactness: the kernel performs the *same* colour-ordered splitting as
:func:`multigridmc_tpu.smoothers.sor_sweep` - every colour phase sees the
updated values of previously swept colours because the whole grid lives in VMEM
(this is why the kernel is single-tile: tiling with stale halos would change the
splitting and bias the sampler's stationary covariance).  Grids up to ~512^2 in
float32 fit; larger grids fall back to the pure-JAX path.

Colour masks are generated in-kernel from ``broadcasted_iota`` (linear-mod
colouring, cf. :mod:`multigridmc_tpu.ops.coloring`) - no mask traffic from HBM.
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
        # top 24 bits as int32 (Mosaic cannot cast uint32->f32 directly)
        hi = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32), eight)
        return pltpu.bitcast(hi, jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)

    # uniform in (0, 1]
    u1 = to_unit(b1) + (1.0 / 16777216.0)
    u2 = to_unit(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _color_field(shape, weights, n_colors):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (weights[0] * rows + weights[1] * cols) % n_colors


def _sweep_on_scratch(
    coeffs, b, x, xp_ref, offsets, diag_index, omega, order, color_weights, n_colors, pad
):
    """Shared in-VMEM sweep using a padded scratch ref; returns updated x.

    The padded copy lives in a VMEM scratch Ref because Mosaic has no value-level
    dynamic_update_slice; static ref slices lower to vector shifts.
    """
    H, W = x.shape
    diag = coeffs[diag_index]
    color = _color_field((H, W), color_weights, n_colors)

    xp_ref[:] = jnp.zeros((H + 2 * pad, W + 2 * pad), x.dtype)
    xp_ref[pad:pad + H, pad:pad + W] = x

    def apply_stencil():
        acc = None
        for k, (oy, ox) in enumerate(offsets):
            t = coeffs[k] * xp_ref[pad + oy:pad + oy + H, pad + ox:pad + ox + W]
            acc = t if acc is None else acc + t
        return acc

    for c in order:
        ax = apply_stencil()
        upd = omega * (b - ax) / diag
        x = x + jnp.where(color == c, upd, jnp.zeros_like(upd))
        xp_ref[pad:pad + H, pad:pad + W] = x
    return x


def _squeeze_block(v):
    """Blocks arrive as (H, W) in single-tile mode or (1, H, W) in batched mode."""
    return v[0] if v.ndim == 3 else v


def _deterministic_kernel(
    coeffs_ref, b_ref, x_ref, out_ref, xp_ref,
    *, offsets, diag_index, omega, order, color_weights, n_colors, pad,
):
    out = _sweep_on_scratch(
        coeffs_ref[:], _squeeze_block(b_ref[:]), _squeeze_block(x_ref[:]), xp_ref,
        offsets, diag_index, omega, order, color_weights, n_colors, pad,
    )
    out_ref[:] = out.reshape(out_ref.shape)


def _stochastic_kernel(
    seed_ref, coeffs_ref, f_ref, x_ref, out_ref, xp_ref,
    *, offsets, diag_index, omega, order, color_weights, n_colors, pad,
    n_seed_words=1,
):
    # the seed is the full PRNG key (2x int32 words for threefry), folded by
    # prng_seed - a single 31-bit seed would birthday-collide within ~46k
    # sweeps and silently reuse noise fields between sweeps
    pltpu.prng_seed(*(seed_ref[i] for i in range(n_seed_words)))
    coeffs = coeffs_ref[:]
    diag = coeffs[diag_index]
    f = _squeeze_block(f_ref[:])
    xi = _normal_from_bits(f.shape)
    # c = f + sqrt(D (2-omega)/omega) xi   (sor_sampler.cc:39-46)
    c = f + jnp.sqrt(diag * ((2.0 - omega) / omega)) * xi.astype(f.dtype)
    out = _sweep_on_scratch(
        coeffs, c, _squeeze_block(x_ref[:]), xp_ref, offsets, diag_index, omega, order,
        color_weights, n_colors, pad,
    )
    out_ref[:] = out.reshape(out_ref.shape)


def _sweep_on_scratch_block(
    coeffs, b, x, xp_ref, offsets, diag_index, omega, order, color_weights, n_colors, pad
):
    """Rank-3 variant of the sweep: a block of chains (B, H, W) per grid step."""
    B, H, W = x.shape
    diag = coeffs[diag_index]  # (H, W), broadcasts over chains
    color = _color_field((H, W), color_weights, n_colors)

    xp_ref[:] = jnp.zeros((B, H + 2 * pad, W + 2 * pad), x.dtype)
    xp_ref[:, pad:pad + H, pad:pad + W] = x

    def apply_stencil():
        acc = None
        for k, (oy, ox) in enumerate(offsets):
            t = coeffs[k] * xp_ref[:, pad + oy:pad + oy + H, pad + ox:pad + ox + W]
            acc = t if acc is None else acc + t
        return acc

    for c in order:
        ax = apply_stencil()
        upd = omega * (b - ax) / diag
        x = x + jnp.where(color == c, upd, jnp.zeros_like(upd))
        xp_ref[:, pad:pad + H, pad:pad + W] = x
    return x


def _deterministic_kernel_block(
    coeffs_ref, b_ref, x_ref, out_ref, xp_ref,
    *, offsets, diag_index, omega, order, color_weights, n_colors, pad,
):
    out_ref[:] = _sweep_on_scratch_block(
        coeffs_ref[:], b_ref[:], x_ref[:], xp_ref,
        offsets, diag_index, omega, order, color_weights, n_colors, pad,
    )


def _stochastic_kernel_block(
    seed_ref, coeffs_ref, f_ref, x_ref, out_ref, xp_ref,
    *, offsets, diag_index, omega, order, color_weights, n_colors, pad,
    n_seed_words=1,
):
    # one PRNG seed (n_seed_words int32 words) per chain block: blocks are
    # independent via distinct seeds, chains within a block draw from one
    # on-chip stream (still iid normals)
    i = pl.program_id(0)
    pltpu.prng_seed(*(seed_ref[i * n_seed_words + j] for j in range(n_seed_words)))
    coeffs = coeffs_ref[:]
    diag = coeffs[diag_index]
    f = f_ref[:]
    xi = _normal_from_bits(f.shape)
    c = f + jnp.sqrt(diag * ((2.0 - omega) / omega)) * xi.astype(f.dtype)
    out_ref[:] = _sweep_on_scratch_block(
        coeffs, c, x_ref[:], xp_ref, offsets, diag_index, omega, order,
        color_weights, n_colors, pad,
    )


def pick_block_chains(C, H, W, n_offsets, pad, vmem_budget=12 * 1024 * 1024):
    """Largest chain-block size that divides C and fits VMEM (with the
    pipeline's double buffering of the three chain-mapped blocks)."""
    for bc in (16, 8, 4, 2, 1):
        if C % bc:
            continue
        plane = (H + 2 * pad) * (W + 2 * pad) * 4
        need = 2 * 3 * bc * plane + n_offsets * plane + bc * plane
        if need <= vmem_budget:
            return bc
    return 1


def _vmem_bytes(n_offsets, H, W, pad, itemsize=4):
    return (n_offsets + 4) * (H + 2 * pad) * (W + 2 * pad) * itemsize


def supports(vshape, dtype, n_offsets, pad) -> bool:
    """Whether the single-tile fused kernel can run this problem."""
    if len(vshape) != 2:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    H, W = vshape
    return _vmem_bytes(n_offsets, H, W, pad) <= 14 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "diag_index", "omega", "order", "color_weights", "n_colors", "interpret",
    ),
)
def fused_sor_sweep(
    coeffs, b, x,
    *, offsets, diag_index, omega, order, color_weights, n_colors, interpret=False,
):
    """One deterministic multi-colour SOR sweep, fully fused."""
    pad = max(max(abs(o) for o in off) for off in offsets)
    kern = functools.partial(
        _deterministic_kernel,
        offsets=offsets, diag_index=diag_index, omega=omega, order=order,
        color_weights=color_weights, n_colors=n_colors, pad=pad,
    )
    H, W = x.shape
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2 * pad, W + 2 * pad), x.dtype)],
        interpret=interpret,
    )(coeffs, b, x)


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "diag_index", "omega", "order", "color_weights", "n_colors", "interpret",
    ),
)
def fused_sor_sweep_batched(
    coeffs, b, x,
    *, offsets, diag_index, omega, order, color_weights, n_colors, interpret=False,
):
    """Batched deterministic sweep: the chain axis is processed in VMEM-sized
    blocks (``pick_block_chains`` chains per grid step), amortising per-step
    overhead; the coefficient block has a constant index map so Mosaic keeps it
    resident across steps.  One streaming pass over the chain states instead of
    ~3 passes per colour."""
    pad = max(max(abs(o) for o in off) for off in offsets)
    C, H, W = x.shape
    nk = coeffs.shape[0]
    bc = pick_block_chains(C, H, W, nk, pad)
    kern = functools.partial(
        _deterministic_kernel_block,
        offsets=offsets, diag_index=diag_index, omega=omega, order=order,
        color_weights=color_weights, n_colors=n_colors, pad=pad,
    )
    return pl.pallas_call(
        kern,
        grid=(C // bc,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec((nk, H, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bc, H + 2 * pad, W + 2 * pad), x.dtype)],
        interpret=interpret,
    )(coeffs, b, x)


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "diag_index", "omega", "order", "color_weights", "n_colors", "interpret",
    ),
)
def fused_gibbs_sweep_batched(
    seeds, coeffs, f, x,
    *, offsets, diag_index, omega, order, color_weights, n_colors, interpret=False,
):
    """Batched stochastic sweep; ``seeds`` provides one PRNG seed per chain
    block - either rank-1 ``(>= n_blocks,)`` int32 or rank-2
    ``(>= n_blocks, n_words)`` full key words (the first n_blocks are used)."""
    pad = max(max(abs(o) for o in off) for off in offsets)
    C, H, W = x.shape
    nk = coeffs.shape[0]
    bc = pick_block_chains(C, H, W, nk, pad)
    nblocks = C // bc
    seeds = jnp.asarray(seeds)
    if seeds.dtype == jnp.uint32:
        seeds = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    seeds = seeds.astype(jnp.int32)
    if seeds.ndim == 2:
        seeds = fold_seed_words(seeds)
    n_seed_words = seeds.shape[1] if seeds.ndim == 2 else 1
    kern = functools.partial(
        _stochastic_kernel_block,
        offsets=offsets, diag_index=diag_index, omega=omega, order=order,
        color_weights=color_weights, n_colors=n_colors, pad=pad,
        n_seed_words=n_seed_words,
    )
    seeds = seeds[:nblocks].reshape(-1)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec((nblocks * n_seed_words,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nk, H, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bc, H + 2 * pad, W + 2 * pad), x.dtype)],
        interpret=interpret,
    )(seeds, coeffs, f, x)


# Mosaic's tpu.prng_set_seed_32 rejects more than 2 seed words (measured on
# v5e: "Setting seed with more than 2 values is not supported"), so wider key
# data (e.g. the rbg impl's 4 words) is hash-folded down to 2.
MAX_SEED_WORDS = 2


def fold_seed_words(words: jax.Array, max_words: int = MAX_SEED_WORDS) -> jax.Array:
    """Hash-fold the trailing word axis down to at most ``max_words`` words.

    Uses the boost ``hash_combine`` mix rather than plain XOR: rbg key data is
    the 2-word threefry data *duplicated* (``[a, b, a, b]``), which XOR would
    collapse to all-zeros for every key.
    """
    n = words.shape[-1]
    if n <= max_words:
        return words
    pad = (-n) % max_words
    if pad:
        z = jnp.zeros(words.shape[:-1] + (pad,), words.dtype)
        words = jnp.concatenate([words, z], axis=-1)
    w = words.reshape(words.shape[:-1] + (-1, max_words))
    gold = jnp.int32(-1640531527)  # 0x9E3779B9
    out = w[..., 0, :]
    for i in range(1, w.shape[-2]):
        c = w[..., i, :]
        out = out ^ (c + gold + (out << 6) + ((out >> 2) & jnp.int32(0x3FFFFFFF)))
    return out


def seed_words(key_or_seed) -> jax.Array:
    """Full-entropy int32 seed word vector for ``pltpu.prng_seed``.

    Accepts a typed PRNG key, raw uint32 key data, or a plain int scalar;
    returns a rank-1 int32 vector of at most :data:`MAX_SEED_WORDS` words (all
    key words are hash-folded into the kernel seed, so distinct keys give
    distinct on-chip noise streams).
    """
    k = key_or_seed
    if hasattr(k, "dtype") and jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
        k = jax.random.key_data(k)
    k = jnp.atleast_1d(jnp.asarray(k))
    if k.dtype == jnp.uint32:
        k = jax.lax.bitcast_convert_type(k, jnp.int32)
    return fold_seed_words(k.astype(jnp.int32).reshape(-1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "diag_index", "omega", "order", "color_weights", "n_colors", "interpret",
    ),
)
def fused_gibbs_sweep(
    seed, coeffs, f, x,
    *, offsets, diag_index, omega, order, color_weights, n_colors, interpret=False,
):
    """One stochastic (Gibbs) multi-colour SOR sweep with on-chip noise.

    ``seed`` is an int32 scalar or word vector (see :func:`seed_words`); the
    caller derives it from the step's PRNG key so chains remain reproducible.
    """
    pad = max(max(abs(o) for o in off) for off in offsets)
    seed = seed_words(seed)
    kern = functools.partial(
        _stochastic_kernel,
        offsets=offsets, diag_index=diag_index, omega=omega, order=order,
        color_weights=color_weights, n_colors=n_colors, pad=pad,
        n_seed_words=seed.shape[0],
    )
    H, W = x.shape
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2 * pad, W + 2 * pad), x.dtype)],
        interpret=interpret,
    )(seed, coeffs, f, x)
