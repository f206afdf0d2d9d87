"""Round-2 sweep shoot-out on the (un)throttled chip.

Round 1 measured three "dead ends" on a chip later shown to be bandwidth-
throttled (~75 GB/s); the round-2 probe (probe_bandwidth_tpu.py) measures
~408 GB/s streaming, so every comparison must be redone:

  A  XLA masked colour sweep            (current production batched path)
  B  parity-packed red-black sweep      (ops/rb_packed.py, exact)
  C  Pallas fused batched sweep         (ops/kernels/sor_pallas.py)
  D  XLA Gibbs sweep (noise + A)
  E  Pallas fused batched Gibbs sweep   (on-chip PRNG)

Timing: nsweep dependent iterations under one jit, hard host-read sync
(block_until_ready can return early through the tunnel).

Run as the sole TPU client:  python native/bench_sweep_variants_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return time.perf_counter() - t0


def build_op(nx, dtype=jnp.float32, dim=2):
    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.prior import shiftedlaplace_fd

    lattice = Lattice((nx,) * dim)
    return shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2), dtype=dtype)


def main(variants="ABCDE"):
    from multigridmc_tpu.ops.coloring import coloring_for
    from multigridmc_tpu.smoothers import color_order, sor_sweep
    from multigridmc_tpu.ops import rb_packed
    from multigridmc_tpu.ops.kernels import sor_pallas

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    nsweep = 50
    nchains = 128
    nx = 256

    with jax.default_device(cpu):
        op = build_op(nx)
        coloring = coloring_for(op.offsets, op.vshape)
        masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
        order = color_order(coloring.n_colors, "forward")
        pop = rb_packed.pack_operator(op)
        rng = np.random.default_rng(0)
        bh = rng.random((nchains,) + op.vshape, dtype=np.float32)
        xh = rng.random((nchains,) + op.vshape, dtype=np.float32)

    H, W = op.vshape
    coeffs = jax.device_put(op.coeffs, dev)
    b = jax.device_put(jnp.asarray(bh), dev)
    x0 = jax.device_put(jnp.asarray(xh), dev)
    nnz = len(op.offsets) * H * W * nchains
    print(f"problem: {nchains} chains x {H}x{W}, {len(op.offsets)}-pt stencil, "
          f"{coloring.n_colors} colors, nsweep={nsweep}", flush=True)

    import dataclasses
    opd = dataclasses.replace(op, coeffs=coeffs)

    kwargs = dict(
        offsets=op.offsets, diag_index=op.diag_index, omega=1.0, order=order,
        color_weights=coloring.weights, n_colors=coloring.n_colors,
    )

    if "A" in variants:
        @jax.jit
        def run_xla(b, x):
            def body(i, x):
                return sor_sweep(opd, masks, 1.0, order, b, x)
            return jax.lax.fori_loop(0, nsweep, body, x)

        dt = timed(run_xla, b, x0) / nsweep
        print(f"A  XLA masked sweep:      {dt*1e3:8.3f} ms/sweep  {nnz/dt/1e9:7.1f} Gnnz/s", flush=True)

    if "B" in variants:
        with jax.default_device(cpu):
            bq_h = rb_packed.pack(jnp.asarray(bh), op.vshape)
            xq_h = rb_packed.pack(jnp.asarray(xh), op.vshape)
        bq = jax.device_put(bq_h, dev)
        xq = jax.device_put(xq_h, dev)

        @jax.jit
        def run_packed(bq, xq):
            def body(i, xq):
                return rb_packed.packed_rb_sweep(pop, 1.0, order, bq, xq)
            return jax.lax.fori_loop(0, nsweep, body, xq)

        dt = timed(run_packed, bq, xq) / nsweep
        print(f"B  parity-packed sweep:   {dt*1e3:8.3f} ms/sweep  {nnz/dt/1e9:7.1f} Gnnz/s", flush=True)

    if "C" in variants:
        @jax.jit
        def run_pallas(b, x):
            def body(i, x):
                return sor_pallas.fused_sor_sweep_batched(coeffs, b, x, **kwargs)
            return jax.lax.fori_loop(0, nsweep, body, x)

        try:
            dt = timed(run_pallas, b, x0) / nsweep
            print(f"C  Pallas fused batched:  {dt*1e3:8.3f} ms/sweep  {nnz/dt/1e9:7.1f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"C  Pallas fused batched:  FAILED {type(e).__name__}: {e}", flush=True)

    if "D" in variants:
        sqrt_diag = jax.device_put(jnp.sqrt(op.diag_stencil()), dev)
        key = jax.random.PRNGKey(7)

        @jax.jit
        def run_gibbs_xla(b, x, key):
            def body(i, x):
                xi = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
                c = b + sqrt_diag * xi
                return sor_sweep(opd, masks, 1.0, order, c, x)
            return jax.lax.fori_loop(0, nsweep, body, x)

        dt = timed(run_gibbs_xla, b, x0, key) / nsweep
        print(f"D  XLA Gibbs sweep:       {dt*1e3:8.3f} ms/sweep  {nnz/dt/1e9:7.1f} Gnnz/s", flush=True)

    if "E" in variants:
        seeds = jnp.arange(nchains * 2, dtype=jnp.int32).reshape(nchains, 2)

        @jax.jit
        def run_gibbs_pallas(b, x):
            def body(i, x):
                return sor_pallas.fused_gibbs_sweep_batched(
                    seeds + i, coeffs, b, x, **kwargs)
            return jax.lax.fori_loop(0, nsweep, body, x)

        try:
            dt = timed(run_gibbs_pallas, b, x0) / nsweep
            print(f"E  Pallas fused Gibbs:    {dt*1e3:8.3f} ms/sweep  {nnz/dt/1e9:7.1f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"E  Pallas fused Gibbs:    FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ABCDE")
