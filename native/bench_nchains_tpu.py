"""Batched-chain throughput scaling probe for the bench MGMC config."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    with jax.default_device(jax.devices("cpu")[0]):
        op = bench.build_problem()
        sampler = MultigridMCSampler(op, nlevel=6, smoother="SOR", cycle=2)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    f = jax.device_put(jnp.asarray(rng.uniform(size=op.vshape), dtype=jnp.float32), dev)
    for nchains in (256, 512):
        K = 10

        @jax.jit
        def run(x, key):
            def step(x, k):
                return sampler.apply(jax.random.fold_in(key, k), f, x), 0.0

            x, _ = jax.lax.scan(step, x, jnp.arange(K))
            return x

        x = jax.device_put(jnp.zeros((nchains,) + op.vshape, dtype=jnp.float32), dev)
        x = run(x, jax.random.PRNGKey(0))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        x = run(x, jax.random.PRNGKey(1))
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        print(
            f"nchains={nchains}: {nchains * K / dt:.0f} samples/s ({dt / K * 1e3:.1f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
