"""Single-process sweep shoot-out (process-to-process drift is ~25%, so only
same-process comparisons are trusted).  Deterministic and Gibbs variants:

  det:   A  production sor_sweep (dense coeffs, divide)
         H  dense coeffs + reciprocal multiply
         B  parity-packed red-black sweep
         V  v2 roll-based Pallas batched kernel
  gibbs: Dt XLA sweep + threefry noise
         Dr XLA sweep + rbg noise
         Hr recip-mul sweep + rbg noise      (candidate production path)
         Vg v2 Pallas fused Gibbs (on-chip PRNG)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

NS = 50
C, nx = 128, 256

from native.bench_sweep_variants_tpu import build_op
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order, sor_sweep
from multigridmc_tpu.ops.stencil import shift
from multigridmc_tpu.ops import rb_packed
from multigridmc_tpu.ops.kernels import sor_pallas_v2 as v2

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_op(nx)
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    order = color_order(coloring.n_colors, "forward")
    pop = rb_packed.pack_operator(op)
    rng = np.random.default_rng(0)
    bh = rng.random((C,) + op.vshape, dtype=np.float32)
    xh = rng.random((C,) + op.vshape, dtype=np.float32)

import dataclasses
opd = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
b = jax.device_put(jnp.asarray(bh), dev)
x0 = jax.device_put(jnp.asarray(xh), dev)
inv_diag = jax.device_put(1.0 / op.diag_stencil(), dev)
sqrt_diag = jax.device_put(jnp.sqrt(op.diag_stencil()), dev)
nnz = len(op.offsets) * np.prod(op.vshape) * C
kwargs = dict(offsets=op.offsets, diag_index=op.diag_index, omega=1.0, order=order,
              color_weights=coloring.weights, n_colors=coloring.n_colors)


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / NS


def report(tag, dt):
    print(f"RESULT {tag}: {dt*1e3:.3f} ms/sweep  {nnz/dt/1e9:.1f} Gnnz/s", flush=True)


def sweep_H(b, x):
    for c in order:
        ax = None
        for k, off in enumerate(op.offsets):
            t = opd.coeffs[k] * shift(x, off)
            ax = t if ax is None else ax + t
        x = x + masks[c] * ((b - ax) * inv_diag)
    return x


which = sys.argv[1] if len(sys.argv) > 1 else "det"

if which == "det":
    @jax.jit
    def runA(b, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: sor_sweep(opd, masks, 1.0, order, b, x), x)

    @jax.jit
    def runH(b, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: sweep_H(b, x), x)

    with jax.default_device(cpu):
        bq_h = rb_packed.pack(jnp.asarray(bh), op.vshape)
        xq_h = rb_packed.pack(jnp.asarray(xh), op.vshape)
    bq, xq = jax.device_put(bq_h, dev), jax.device_put(xq_h, dev)

    @jax.jit
    def runB(bq, xq):
        return jax.lax.fori_loop(0, NS, lambda i, xq: rb_packed.packed_rb_sweep(pop, 1.0, order, bq, xq), xq)

    def runV(x):
        for _ in range(NS):
            x = v2.sweep_batched_v2(opd.coeffs, b, x, **kwargs)
        return x

    report("A ", timed(runA, b, x0))
    report("H ", timed(runH, b, x0))
    report("B ", timed(runB, bq, xq))
    # v2: python-driven dependent chain (donated buffer); warm separately
    x = jnp.array(x0)
    x = v2.sweep_batched_v2(opd.coeffs, b, x, **kwargs)
    float(jnp.ravel(x)[0])
    t0 = time.perf_counter()
    x = runV(x)
    float(jnp.ravel(x)[0])
    report("V ", (time.perf_counter() - t0) / NS)
    # repeat A to bound in-process drift
    report("A2", timed(runA, b, x0))
else:
    keyt = jax.random.PRNGKey(7)
    keyr = jax.random.key(7, impl="rbg")

    def gibbs(sweep_fn, key, i, x):
        xi = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
        return sweep_fn(b + sqrt_diag * xi, x)

    @jax.jit
    def runDt(b_, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: gibbs(lambda c, x: sor_sweep(opd, masks, 1.0, order, c, x), keyt, i, x), x)

    @jax.jit
    def runDr(b_, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: gibbs(lambda c, x: sor_sweep(opd, masks, 1.0, order, c, x), keyr, i, x), x)

    @jax.jit
    def runHr(b_, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: gibbs(sweep_H, keyr, i, x), x)

    seeds0 = jnp.arange(2 * C, dtype=jnp.int32).reshape(C, 2)

    def runVg(x):
        for i in range(NS):
            x = v2.gibbs_sweep_batched_v2(seeds0 + i, opd.coeffs, b, x, **kwargs)
        return x

    report("Dt", timed(runDt, b, x0))
    report("Dr", timed(runDr, b, x0))
    report("Hr", timed(runHr, b, x0))
    x = jnp.array(x0)
    x = v2.gibbs_sweep_batched_v2(seeds0, opd.coeffs, b, x, **kwargs)
    float(jnp.ravel(x)[0])
    t0 = time.perf_counter()
    x = runVg(x)
    float(jnp.ravel(x)[0])
    report("Vg", (time.perf_counter() - t0) / NS)
    report("Dr2", timed(runDr, b, x0))
