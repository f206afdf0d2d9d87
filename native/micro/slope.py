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


def _force(out):
    """Force remote completion: block_until_ready does NOT reliably block on
    the axon tunnel for all program classes (deterministic loops return
    immediately); a scalar device->host read does.  The read's fixed cost
    cancels in the two-length slope."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def _timed(f, argv, rep=3):
    """argv: one (args tuple) per call - the warmup plus each rep must get
    DISTINCT inputs, because the tunnel serves repeated identical
    (program, args) calls from a result cache (~0.1 ms round trips)."""
    _force(f(*argv[0]))
    ts = []
    for i in range(rep):
        t0 = time.perf_counter()
        _force(f(*argv[1 + i]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[rep // 2]


def slope_time(body, x0, key=None, n1=50, n2=400, rep=3):
    """Seconds per iteration of ``x = body(x, key_k)`` in a device-side scan.

    ``body(carry, key)``; if key is None a dummy int key is passed.
    """
    def make(ns):
        def run(x, key, salt):
            def step(c, k):
                kk = jax.random.fold_in(key, k) if key is not None else k + salt
                return body(c, kk), 0.0
            c, _ = jax.lax.scan(step, x, jnp.arange(ns))
            return c
        return jax.jit(run)

    def argv(base):
        out = []
        for i in range(rep + 1):
            k = jax.random.fold_in(key, base + i) if key is not None else None
            out.append((x0, k, jnp.int32(base + i)))
        return out

    f1, f2 = make(n1), make(n2)
    t1 = _timed(f1, argv(100), rep=rep)
    t2 = _timed(f2, argv(200), rep=rep)
    return (t2 - t1) / (n2 - n1)
