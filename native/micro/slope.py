"""Slope-based timing: the axon tunnel adds a large (~30 ms) fixed per-call
cost to most compiled programs (anything beyond a trivial elementwise chain -
measured 2026-08-17: where/select, iota, non-literal matmul, RNG all trigger
it; see NOTES_R2.md).  Per-call timing therefore measures the constant, not
the program.  The cure: run the body in a device-side loop at two lengths and
take the slope - constants cancel exactly.

    t_iter = (T(n2) - T(n1)) / (n2 - n1)
"""
import time

import jax
import jax.numpy as jnp


def _timed(f, *args, rep=3):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[rep // 2]


def slope_time(body, x0, key=None, n1=50, n2=400, rep=3):
    """Seconds per iteration of ``x = body(x, key_k)`` in a device-side scan.

    ``body(carry, key)``; if key is None a dummy int key is passed.
    """
    def make(ns):
        def run(x, key):
            def step(c, k):
                kk = jax.random.fold_in(key, k) if key is not None else k
                return body(c, kk), 0.0
            c, _ = jax.lax.scan(step, x, jnp.arange(ns))
            return c
        return jax.jit(run)
    f1, f2 = make(n1), make(n2)
    t1 = _timed(f1, x0, key, rep=rep)
    t2 = _timed(f2, x0, key, rep=rep)
    return (t2 - t1) / (n2 - n1)
