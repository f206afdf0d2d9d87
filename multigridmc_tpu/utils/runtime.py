"""Runtime platform / precision selection for drivers and benchmarks.

The reference computes everything in float64 on CPU.  On TPU, float32 is the
native fast path (float64 is software-emulated), so drivers default to float64
for bitwise-comparable parity runs but can be switched via environment:

* ``MGMC_PLATFORM=cpu|tpu|axon``  - force the JAX platform (the session
  environment may pin an experimental TPU plugin, which only
  ``jax.config.update('jax_platforms', ...)`` can override);
* ``MGMC_X64=0|1``                - disable/enable float64 (default: enabled on
  CPU, disabled on TPU platforms);
* ``MGMC_PRNG_IMPL=auto|rbg|threefry2x32`` - PRNG key implementation for the
  sampling drivers/bench (default auto: hardware ``rbg`` on accelerators,
  ``threefry2x32`` on CPU).
"""

from __future__ import annotations

import os

import jax


def configure_runtime(default_x64: bool = True) -> None:
    cache_dir = os.environ.get("MGMC_COMPILE_CACHE", "/root/repo/.jax_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass
    plat = os.environ.get("MGMC_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    x64_env = os.environ.get("MGMC_X64")
    if x64_env is not None:
        jax.config.update("jax_enable_x64", x64_env not in ("0", "false", ""))
    else:
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "cpu"
        jax.config.update("jax_enable_x64", default_x64 and platform == "cpu")


def sampling_key(seed: int, impl: str | None = None) -> jax.Array:
    """Typed PRNG key for the sampling drivers / bench.

    ``impl=None`` reads ``MGMC_PRNG_IMPL`` (default ``auto``): on accelerators
    the ``rbg`` implementation uses the hardware RngBitGenerator - measured 22%
    faster Gibbs sweeps than threefry on TPU v5e (noise generation is a large
    share of the stochastic smoother cost; see NOTES_R2.md) with an identical
    sampling distribution; on CPU ``threefry2x32`` keeps runs bitwise
    reproducible against the float64 parity surface.
    """
    impl = impl or os.environ.get("MGMC_PRNG_IMPL", "auto")
    if impl == "auto":
        impl = "threefry2x32" if jax.default_backend() == "cpu" else "rbg"
    return jax.random.key(seed, impl=impl)
