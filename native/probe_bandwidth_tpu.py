"""HBM streaming-bandwidth probe (NOTES_R1.md finding 6, round-2 re-check).

Measures effective HBM bandwidth with dependent-chain loops so each timed call
does >= 10 ms of device work (single-call sub-ms timings through the tunnel are
unreliable, NOTES_R1.md finding 7).  The loop body is non-affine in the carry
so XLA cannot collapse the iteration count.

Run as the sole TPU client:  python native/probe_bandwidth_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    """block_until_ready can return before the device finishes through the
    axon tunnel (NOTES_R1.md finding 7); a host read of one element is a true
    completion barrier (costs ~1 ms tunnel latency - keep work >> 1 ms)."""
    out = fn(*args)
    float(jnp.ravel(out)[0])  # warmup + hard sync
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return time.perf_counter() - t0


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}, platform {jax.default_backend()}")

    # ---- streaming probe: z <- z*z - 1.5*z + y, NITER dependent passes -----
    n = 64 * 1024 * 1024  # 256 MB per f32 array
    niter = 40
    with jax.default_device(jax.devices("cpu")[0]):
        zh = np.random.default_rng(0).random(n, dtype=np.float32)
        yh = np.random.default_rng(1).random(n, dtype=np.float32)
    z = jax.device_put(jnp.asarray(zh), dev)
    y = jax.device_put(jnp.asarray(yh), dev)

    @jax.jit
    def stream(z, y):
        def body(i, z):
            # non-affine in z (z*z) -> the loop cannot be collapsed;
            # 0.5*jnp.abs(...) keeps values bounded in [0, ~2]
            return 0.5 * jnp.abs(z * z - 1.5 * z) + 0.1 * y

        return jax.lax.fori_loop(0, niter, body, z)

    dt = timed(stream, z, y)
    per_iter = 3 * n * 4  # read z, read y, write z
    print(
        f"stream n={n} x{niter}: {dt * 1e3:.2f} ms total, "
        f"{dt * 1e3 / niter:.3f} ms/pass -> {per_iter * niter / dt / 1e9:.1f} GB/s"
    )

    # ---- 9-point stencil chain at the round-1 reference shape --------------
    import sys
    sys.path.insert(0, "/root/repo")
    from multigridmc_tpu.ops.stencil import shift

    offsets = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    shape = (128, 255, 255)
    with jax.default_device(jax.devices("cpu")[0]):
        ch = np.random.default_rng(2).random((9,) + shape[1:], dtype=np.float32)
        fh = np.random.default_rng(3).random(shape, dtype=np.float32)
    coeffs = jax.device_put(jnp.asarray(ch), dev)
    f = jax.device_put(jnp.asarray(fh), dev)
    nsweep = 30

    @jax.jit
    def stencil_chain(coeffs, f):
        def body(i, f):
            out = None
            for k, off in enumerate(offsets):
                t = coeffs[k] * shift(f, off)
                out = t if out is None else out + t
            # normalise so values stay bounded (adds negligible traffic)
            return out * (1.0 / 9.0)

        return jax.lax.fori_loop(0, nsweep, body, f)

    dt3 = timed(stencil_chain, coeffs, f)
    per_sweep = dt3 / nsweep
    tr3 = (2 * np.prod(shape) + np.prod(shape[1:]) * 9) * 4  # f in+out, coeffs
    print(
        f"9pt stencil {shape} x{nsweep}: {per_sweep * 1e3:.3f} ms/sweep "
        f"(round-1: ~1.35 ms); min-traffic bw {tr3 / per_sweep / 1e9:.1f} GB/s"
    )

    # batched-chain 2d sweep shape from the bench (128 chains, 255^2)
    nnz = 9 * np.prod(shape)
    print(f"stencil nnz/s: {nnz / per_sweep / 1e9:.1f} Gnnz/s")


if __name__ == "__main__":
    main()
