"""Validate the fused Pallas Gibbs sweep on the real TPU chip."""
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.prior import shiftedlaplace_fd
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.ops.kernels.sor_pallas import fused_gibbs_sweep, fused_sor_sweep
from multigridmc_tpu.smoothers import sor_sweep

print("backend:", jax.default_backend())
lat = Lattice((16, 16))
op = shiftedlaplace_fd(lat, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
coloring = coloring_for(op.offsets, op.vshape)
order = tuple(range(coloring.n_colors))
masks = jnp.asarray(coloring.masks(), dtype=jnp.float32)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32)
x = jnp.asarray(rng.normal(size=op.vshape), dtype=jnp.float32)

# deterministic equivalence on TPU
out = fused_sor_sweep(op.coeffs, b, x, offsets=op.offsets, diag_index=op.diag_index,
                      omega=0.9, order=order, color_weights=coloring.weights,
                      n_colors=coloring.n_colors)
ref = sor_sweep(op, masks, 0.9, order, b, x)
print("det max err:", float(jnp.abs(out - ref).max()))

# stochastic: E[sweep] == det sweep
nrep = 2000
import functools
@jax.jit
def batch_mean(seeds):
    def one(seed):
        return fused_gibbs_sweep(seed, op.coeffs, b, x, offsets=op.offsets,
                                 diag_index=op.diag_index, omega=1.0, order=order,
                                 color_weights=coloring.weights, n_colors=coloring.n_colors)
    return jax.lax.map(one, seeds).mean(axis=0)
seeds = jnp.arange(1, nrep + 1, dtype=jnp.int32)
m = batch_mean(seeds)
det = sor_sweep(op, masks, 1.0, order, b, x)
err = float(jnp.abs(m - det).max())
scale = float(jnp.max(1.0 / jnp.sqrt(op.diag_stencil())))
print(f"stoch mean err: {err:.4f}  tol ~ {4*scale/np.sqrt(nrep):.4f}")
assert err < 6 * scale / np.sqrt(nrep)
print("OK")
