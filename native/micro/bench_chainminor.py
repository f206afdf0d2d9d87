"""Chain-minor layout experiment: put the chain axis on the TPU lane dimension.

With x stored (H, W, C) and C=128 chains, every spatial shift of the stencil is
a sublane / address-level move and the lane dimension is never permuted (the
production (C, H, W) layout pads/slices the lane axis = cross-lane relayouts).
Masks are recomputed from iota (no stored-mask HBM read).

  A   control: production sor_sweep on (C, H, W), stored masks
  M   (C, H, W) + iota masks
  L   (H, W, C) chains-last + iota masks
  Dg  gibbs control: (C, H, W) rbg noise
  Lg  gibbs (H, W, C) rbg noise
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

NS = 50
C, nx = 128, 256

from native.bench_sweep_variants_tpu import build_op
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.smoothers import color_order, sor_sweep

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

H, W = op.vshape
import dataclasses
opd = dataclasses.replace(op, coeffs=jax.device_put(op.coeffs, dev))
b = jax.device_put(jnp.asarray(bh), dev)
x0 = jax.device_put(jnp.asarray(xh), dev)
# chains-last copies
bl = jax.device_put(jnp.moveaxis(jnp.asarray(bh), 0, -1), dev)
xl0 = jax.device_put(jnp.moveaxis(jnp.asarray(xh), 0, -1), dev)
coeffs_l = jax.device_put(op.coeffs[..., None], dev)  # (nk, H, W, 1)
sqrt_diag = jax.device_put(jnp.sqrt(op.diag_stencil()), dev)
sqrt_diag_l = jax.device_put(jnp.sqrt(op.diag_stencil())[..., None], dev)
nnz = len(op.offsets) * H * W * C
weights = coloring.weights
n_colors = coloring.n_colors
iotas = [jax.lax.broadcasted_iota(jnp.int32, (H, W), d) for d in range(2)]
color_field = sum(w * g for w, g in zip(weights, iotas)) % n_colors


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / NS


def report(tag, dt):
    print(f"RESULT {tag}: {dt*1e3:.3f} ms/sweep  {nnz/dt/1e9:.1f} Gnnz/s", flush=True)


def shift_lead(x, off):
    """shift on the LEADING two axes of (H, W, C)."""
    pads, slices = [], []
    for o, n in zip(off, (H, W)):
        if o >= 0:
            pads.append((0, o))
            slices.append(slice(o, o + n))
        else:
            pads.append((-o, 0))
            slices.append(slice(0, n))
    pads.append((0, 0))
    slices.append(slice(None))
    return jnp.pad(x, pads)[tuple(slices)]


def sweep_M(b, x):  # (C,H,W), iota masks
    diag = opd.coeffs[op.diag_index]
    from multigridmc_tpu.ops.stencil import shift
    for c in order:
        ax = None
        for k, off in enumerate(op.offsets):
            t = opd.coeffs[k] * shift(x, off)
            ax = t if ax is None else ax + t
        x = jnp.where(color_field == c, x + (b - ax) / diag, x)
    return x


def sweep_L(b, x):  # (H,W,C), iota masks
    diag = coeffs_l[op.diag_index]
    for c in order:
        ax = None
        for k, off in enumerate(op.offsets):
            t = coeffs_l[k] * shift_lead(x, off)
            ax = t if ax is None else ax + t
        x = jnp.where((color_field == c)[..., None], x + (b - ax) / diag, x)
    return x


which = sys.argv[1] if len(sys.argv) > 1 else "det"

if which == "det":
    @jax.jit
    def runA(b, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: sor_sweep(opd, masks, 1.0, order, b, x), x)

    @jax.jit
    def runM(b, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: sweep_M(b, x), x)

    @jax.jit
    def runL(b, x):
        return jax.lax.fori_loop(0, NS, lambda i, x: sweep_L(b, x), x)

    report("A ", timed(runA, b, x0))
    report("M ", timed(runM, b, x0))
    report("L ", timed(runL, bl, xl0))
    report("A2", timed(runA, b, x0))
    # correctness cross-check: one sweep L == one sweep A (same splitting)
    xa = np.asarray(sor_sweep(opd, masks, 1.0, order, b, x0))
    xm = np.asarray(sweep_M(b, x0))
    xlr = np.moveaxis(np.asarray(sweep_L(bl, xl0)), -1, 0)
    print("maxdiff M:", np.abs(xa - xm).max(), " L:", np.abs(xa - xlr).max(), flush=True)
else:
    keyr = jax.random.key(7, impl="rbg")

    @jax.jit
    def runDg(b, x):
        def body(i, x):
            xi = jax.random.normal(jax.random.fold_in(keyr, i), x.shape, x.dtype)
            return sor_sweep(opd, masks, 1.0, order, b + sqrt_diag * xi, x)
        return jax.lax.fori_loop(0, NS, body, x)

    @jax.jit
    def runLg(b, x):
        def body(i, x):
            xi = jax.random.normal(jax.random.fold_in(keyr, i), x.shape, x.dtype)
            return sweep_L(b + sqrt_diag_l * xi, x)
        return jax.lax.fori_loop(0, NS, body, x)

    report("Dg ", timed(runDg, b, x0))
    report("Lg ", timed(runLg, bl, xl0))
    report("Dg2", timed(runDg, b, x0))
