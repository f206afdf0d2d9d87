"""Isolate sweep costs: dense coeff reads and per-element divides.

Usage: bench_constcoeff.py {A|G|H}
  A  production sor_sweep            (dense coeffs, divide)        control
  G  scalar coeffs + recip multiply  (no coeff HBM traffic)
  H  dense coeffs + recip multiply   (isolates the divide cost)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

which = sys.argv[1]
NS = 50
C, nx = 128, 256

from native.bench_sweep_variants_tpu import build_op
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order, sor_sweep
from multigridmc_tpu.ops.stencil import shift

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_op(nx)
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    order = color_order(coloring.n_colors, "forward")
    rng = np.random.default_rng(0)
    bh = rng.random((C,) + op.vshape, dtype=np.float32)
    xh = rng.random((C,) + op.vshape, dtype=np.float32)
    # interior scalar value per offset (constant for the FD prior)
    mid = tuple(m // 2 for m in op.vshape)
    scalars = [float(op.coeffs[k][mid]) for k in range(len(op.offsets))]

import dataclasses
opd = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
b = jax.device_put(jnp.asarray(bh), dev)
x0 = jax.device_put(jnp.asarray(xh), dev)
inv_diag = jax.device_put(1.0 / op.diag_stencil(), dev)
inv_diag_s = 1.0 / scalars[op.diag_index]


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / NS


def sweep_G(b, x):
    for c in order:
        ax = None
        for k, off in enumerate(op.offsets):
            t = scalars[k] * shift(x, off)
            ax = t if ax is None else ax + t
        x = x + masks[c] * ((b - ax) * inv_diag_s)
    return x


def sweep_H(b, x):
    for c in order:
        ax = None
        for k, off in enumerate(op.offsets):
            t = opd.coeffs[k] * shift(x, off)
            ax = t if ax is None else ax + t
        x = x + masks[c] * ((b - ax) * inv_diag)
    return x


body = {
    "A": lambda i, x: sor_sweep(opd, masks, 1.0, order, b, x),
    "G": lambda i, x: sweep_G(b, x),
    "H": lambda i, x: sweep_H(b, x),
}[which]


@jax.jit
def run(b, x):
    return jax.lax.fori_loop(0, NS, lambda i, x: body(i, x), x)


dt = timed(run, b, x0)
nnz = len(op.offsets) * np.prod(op.vshape) * C
print(f"RESULT {which}: {dt*1e3:.3f} ms/sweep  {nnz/dt/1e9:.1f} Gnnz/s", flush=True)
