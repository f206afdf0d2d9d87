"""Time the v2 roll-based kernels at the bench shape. Usage: bench_v2.py {det|gibbs|det3d}"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

which = sys.argv[1]
NS = 50
from native.bench_sweep_variants_tpu import build_op, timed
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order
from multigridmc_tpu.ops.kernels import sor_pallas_v2 as v2

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
dim = 3 if which.endswith("3d") else 2
nx, C = (64, 32) if dim == 3 else (256, 128)
with jax.default_device(cpu):
    op = build_op(nx, dim=dim)
    coloring = coloring_for(op.offsets, op.vshape)
    order = color_order(coloring.n_colors, "forward")
    rng = np.random.default_rng(0)
    bh = rng.random((C,)+op.vshape, dtype=np.float32)
coeffs = jax.device_put(op.coeffs, dev)
b = jax.device_put(jnp.asarray(bh), dev)
x = jax.device_put(jnp.asarray(bh*0.5), dev)
kwargs = dict(offsets=op.offsets, diag_index=op.diag_index, omega=1.0, order=order,
              color_weights=coloring.weights, n_colors=coloring.n_colors)

t0 = time.perf_counter()
if which.startswith("det"):
    fn = lambda xx: v2.sweep_batched_v2(coeffs, b, xx, **kwargs)
else:
    seeds0 = jnp.arange(2*C, dtype=jnp.int32).reshape(C, 2)
    fn = lambda xx: v2.gibbs_sweep_batched_v2(seeds0, coeffs, b, xx, **kwargs)
x1 = fn(x)
float(jnp.ravel(x1)[0])
print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
# timed dependent chain (x donated each call)
t0 = time.perf_counter()
for i in range(NS):
    x1 = fn(x1)
float(jnp.ravel(x1)[0])
dt = (time.perf_counter()-t0)/NS
nnz = len(op.offsets)*np.prod(op.vshape)*C
print(f"RESULT v2-{which}: {dt*1e3:.3f} ms/sweep  {nnz/dt/1e9:.1f} Gnnz/s", flush=True)
