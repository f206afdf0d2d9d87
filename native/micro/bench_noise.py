"""Compare Gibbs noise-generation options at the bench shape (128 x 255^2).

The round-2 sweep shoot-out showed the XLA Gibbs sweep costs 1.74 ms of which
~1.06 ms is threefry normal generation; the sweep body itself is the fastest
variant (0.67 ms).  Candidates to remove the noise cost:

  threefry  jax.random.normal with the default threefry key   (status quo)
  rbg       jax.random.normal with an rbg key (hardware RNG path)

Measured (v5e, 128 x 255^2): threefry 1.391 ms/field, rbg 0.638 ms/field, and a
one-pass Pallas on-chip-PRNG kernel 1.049 ms/field (Box-Muller transcendentals
are VPU-bound; kernel dropped) -> production noise uses rbg keys
(utils.runtime.sampling_key).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

C, nx = 128, 256
NS = 50
shape = (C, nx - 1, nx - 1)

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    rng = np.random.default_rng(0)
    fh = rng.random(shape[1:], dtype=np.float32)
    sh = rng.random(shape[1:], dtype=np.float32) + 0.5
f = jax.device_put(jnp.asarray(fh), dev)
s = jax.device_put(jnp.asarray(sh), dev)


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / NS


which = sys.argv[1]
if which in ("threefry", "rbg"):
    key = jax.random.PRNGKey(3) if which == "threefry" else jax.random.key(3, impl="rbg")

    @jax.jit
    def run(key, f, s):
        def body(i, acc):
            xi = jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
            return acc + (f + s * xi)
        return jax.lax.fori_loop(0, NS, body, jnp.zeros(shape, jnp.float32))

    dt = timed(run, key, f, s)

gb = np.prod(shape) * 4 / 1e9
print(f"RESULT noise-{which}: {dt*1e3:.3f} ms/field  ({gb/dt:.0f} GB/s written)", flush=True)
