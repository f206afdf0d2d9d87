"""One micro-measurement per process invocation (tunnel-compile friendly).

Usage: python native/micro/measure_one.py {gibbs|rr|noise|sweepA}
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import dataclasses

which = sys.argv[1]
NS = 40
from native.bench_sweep_variants_tpu import build_op, timed
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order, sor_sweep
from multigridmc_tpu.ops.intergrid import restrict, prolongate_add

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    op = build_op(256)
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    order = color_order(coloring.n_colors, "forward")
    rng = np.random.default_rng(0)
    bh = rng.random((128,)+op.vshape, dtype=np.float32)
opd = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
b = jax.device_put(jnp.asarray(bh), dev)
x0 = jax.device_put(jnp.asarray(bh*0.5), dev)
sqrt_diag = jax.device_put(jnp.sqrt(op.diag_stencil()), dev)
key = jax.random.PRNGKey(7)

if which == "gibbs":
    @jax.jit
    def run(b, x, key):
        def body(i, x):
            xi = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            return sor_sweep(opd, masks, 1.0, order, b + sqrt_diag*xi, x)
        return jax.lax.fori_loop(0, NS, body, x)
    dt = timed(run, b, x0, key)/NS
elif which == "rr":
    @jax.jit
    def run(b, x):
        def body(i, x):
            r = b - opd.apply_stencil(x)
            rc = restrict(r, dim=2)
            return x + 1e-6*prolongate_add(1.0, rc, jnp.zeros_like(x), dim=2)
        return jax.lax.fori_loop(0, NS, body, x)
    dt = timed(run, b, x0)/NS
elif which == "noise":
    @jax.jit
    def run(x, key):
        def body(i, x):
            xi = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            return x + 1e-6*xi
        return jax.lax.fori_loop(0, NS, body, x)
    dt = timed(run, x0, key)/NS
elif which == "sweepA":
    @jax.jit
    def run(b, x):
        def body(i, x):
            return sor_sweep(opd, masks, 1.0, order, b, x)
        return jax.lax.fori_loop(0, NS, body, x)
    dt = timed(run, b, x0)/NS
print(f"RESULT {which}: {dt*1e3:.3f} ms", flush=True)
