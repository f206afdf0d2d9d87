"""Micro-bench: matmul intergrid (restrict/prolongate) and rbg-noise Gibbs.

Usage: bench_rr.py {rr|pa|gibbs_rbg|gibbs_tf}

  rr         f_c = restrict(f - A x)  at 128 x 255^2   (was 1.135 ms shift-based)
  pa         x + alpha * prolongate(x_c)               (shift-based baseline TBD)
  gibbs_rbg  XLA Gibbs sweep, noise from an rbg key    (vs 1.196 ms threefry)
  gibbs_tf   XLA Gibbs sweep, threefry noise           (same-process control)
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
from multigridmc_tpu.ops.intergrid import restrict, prolongate_add

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_op(nx)
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    order = color_order(coloring.n_colors, "forward")
    rng = np.random.default_rng(0)
    fh = rng.random((C,) + op.vshape, dtype=np.float32)
    xh = rng.random((C,) + op.vshape, dtype=np.float32)

import dataclasses
opd = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
f = jax.device_put(jnp.asarray(fh), dev)
x = jax.device_put(jnp.asarray(xh), dev)


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / NS


if which == "rr":
    @jax.jit
    def run(f, x):
        def body(i, acc):
            fc = restrict(f - opd.apply_stencil(x + 1e-9 * i), dim=2)
            return acc + fc
        return jax.lax.fori_loop(0, NS, body,
                                 jnp.zeros((C, 127, 127), jnp.float32))
    dt = timed(run, f, x)
elif which == "pa":
    with jax.default_device(cpu):
        xc_h = rng.random((C, 127, 127), dtype=np.float32)
    xc = jax.device_put(jnp.asarray(xc_h), dev)

    @jax.jit
    def run(xc, x):
        def body(i, acc):
            return prolongate_add(1.0, xc + 1e-9 * i, acc, dim=2)
        return jax.lax.fori_loop(0, NS, body, x)
    dt = timed(run, xc, x)
elif which.startswith("gibbs"):
    impl = "rbg" if which.endswith("rbg") else None
    key = jax.random.key(7, impl=impl) if impl else jax.random.PRNGKey(7)
    sqrt_diag = jax.device_put(jnp.sqrt(op.diag_stencil()), dev)

    @jax.jit
    def run(f, x, key):
        def body(i, x):
            xi = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            c = f + sqrt_diag * xi
            return sor_sweep(opd, masks, 1.0, order, c, x)
        return jax.lax.fori_loop(0, NS, body, x)
    dt = timed(run, f, x, key)

print(f"RESULT {which}: {dt*1e3:.3f} ms/iter", flush=True)
