"""v2 Pallas kernels timed INSIDE one jitted fori_loop (the previous
python-driven chain paid ~1 ms tunnel dispatch per call, swamping device time).
Controls A (XLA det) and Dr (XLA gibbs rbg) re-timed in the same process."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

NS = 50
C, nx = 128, 256

from native.bench_sweep_variants_tpu import build_op
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order, sor_sweep
from multigridmc_tpu.ops.kernels import sor_pallas_v2 as v2

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

import dataclasses
opd = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
b = jax.device_put(jnp.asarray(bh), dev)
x0 = jax.device_put(jnp.asarray(xh), dev)
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


@jax.jit
def runA(b, x):
    return jax.lax.fori_loop(0, NS, lambda i, x: sor_sweep(opd, masks, 1.0, order, b, x), x)


@jax.jit
def runV(b, x):
    def body(i, x):
        return v2.sweep_batched_v2(opd.coeffs, b, x, **kwargs)
    return jax.lax.fori_loop(0, NS, body, x)


keyr = jax.random.key(7, impl="rbg")


@jax.jit
def runDr(b, x):
    def body(i, x):
        xi = jax.random.normal(jax.random.fold_in(keyr, i), x.shape, x.dtype)
        return sor_sweep(opd, masks, 1.0, order, b + sqrt_diag * xi, x)
    return jax.lax.fori_loop(0, NS, body, x)


seeds0 = jnp.arange(2 * C, dtype=jnp.int32).reshape(C, 2)


@jax.jit
def runVg(b, x):
    def body(i, x):
        return v2.gibbs_sweep_batched_v2(seeds0 + i, opd.coeffs, b, x, **kwargs)
    return jax.lax.fori_loop(0, NS, body, x)


report("A  ", timed(runA, b, x0))
report("V  ", timed(runV, b, x0))
report("Dr ", timed(runDr, b, x0))
report("Vg ", timed(runVg, b, x0))
report("A2 ", timed(runA, b, x0))
