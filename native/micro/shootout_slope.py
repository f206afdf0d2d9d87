"""Sweep shoot-out, slope-timed (v3 methodology).

The round-2 shoot-out (shootout.py) timed single calls of NS-iteration loops;
the axon tunnel's ~30 ms fixed per-call cost (see slope.py) compressed all
variants into apparent ties.  This re-run uses two-length device-loop slopes,
which cancel the constant exactly.

Variants (batched C x 255^2 and single-chain 255^2, 5-pt FD, red-black):
  det:   A  production XLA masked colour sweep
         V  v2 roll-based Pallas kernel
         P1 v1 single-tile Pallas kernel (single chain only)
  gibbs: Dr XLA sweep + rbg normal noise
         Dt XLA sweep + threefry noise
         Vg v2 Pallas fused Gibbs (on-chip PRNG)
         G1 v1 single-tile fused Gibbs (single chain only)

Usage: python native/micro/shootout_slope.py [C=128]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from multigridmc_tpu.utils.runtime import configure_runtime

configure_runtime(default_x64=False)

import jax
import jax.numpy as jnp

from native.bench_sweep_variants_tpu import build_op
from native.micro.slope import slope_time
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order, sor_sweep
from multigridmc_tpu.ops.kernels import sor_pallas_v2 as v2
from multigridmc_tpu.ops.kernels import sor_pallas as v1

C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
nx = 256

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_op(nx)
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    order = color_order(coloring.n_colors, "forward")

import dataclasses

op = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
masks = jax.device_put(masks, dev)
fb = jax.device_put(jnp.asarray(
    np.random.default_rng(0).random((C,) + op.vshape), jnp.float32), dev)
xb = jax.device_put(jnp.zeros((C,) + op.vshape, jnp.float32), dev)
f1 = fb[0]
x1 = xb[0]
sqrt_diag = jnp.sqrt(op.diag_stencil() * 1.0)

kw = dict(offsets=op.offsets, diag_index=op.diag_index, omega=1.0, order=order,
          color_weights=coloring.weights, n_colors=coloring.n_colors)

kt = jax.random.key(5, impl="threefry2x32")
kr = jax.random.key(5, impl="rbg")
nnz = len(op.offsets) * int(np.prod(op.vshape))


def report(tag, t, chains):
    print(f"RESULT {tag:28s}: {t*1e3:7.4f} ms/sweep   {chains*nnz/t/1e9:7.1f} Gnnz/s",
          flush=True)


# ---------------- batched ----------------
report(f"det  A  xla C={C}", slope_time(
    lambda x, k: sor_sweep(op, masks, 1.0, order, fb, x), xb), C)
report(f"det  V  pallas-v2 C={C}", slope_time(
    lambda x, k: v2.sweep_batched_v2(op.coeffs, fb, x, **kw), xb), C)
report(f"gibbs Dr xla+rbg C={C}", slope_time(
    lambda x, k: sor_sweep(op, masks, 1.0, order,
                           fb + sqrt_diag * jax.random.normal(k, x.shape, x.dtype), x),
    xb, kr), C)
report(f"gibbs Dt xla+threefry C={C}", slope_time(
    lambda x, k: sor_sweep(op, masks, 1.0, order,
                           fb + sqrt_diag * jax.random.normal(k, x.shape, x.dtype), x),
    xb, kt), C)


def vg(x, k):
    seeds = jax.vmap(v1.seed_words)(jax.random.split(k, x.shape[0]))
    return v2.gibbs_sweep_batched_v2(seeds, op.coeffs, fb, x, **kw)


report(f"gibbs Vg pallas-v2 onchip C={C}", slope_time(vg, xb, kr), C)

# ---------------- single chain ----------------
report("det  A  xla C=1", slope_time(
    lambda x, k: sor_sweep(op, masks, 1.0, order, f1, x), x1), 1)
report("det  P1 pallas-v1 C=1", slope_time(
    lambda x, k: v1.fused_sor_sweep(op.coeffs, f1, x, **kw), x1), 1)
report("det  V  pallas-v2 C=1", slope_time(
    lambda x, k: v2.sweep_batched_v2(op.coeffs, f1[None], x, **kw), x1[None]), 1)
report("gibbs Dr xla+rbg C=1", slope_time(
    lambda x, k: sor_sweep(op, masks, 1.0, order,
                           f1 + sqrt_diag * jax.random.normal(k, x.shape, x.dtype), x),
    x1, kr), 1)
report("gibbs G1 pallas-v1 C=1", slope_time(
    lambda x, k: v1.fused_gibbs_sweep(v1.seed_words(k), op.coeffs, f1, x, **kw),
    x1, kr), 1)

# drift control
report(f"det  A  xla C={C} (recheck)", slope_time(
    lambda x, k: sor_sweep(op, masks, 1.0, order, fb, x), xb), C)
