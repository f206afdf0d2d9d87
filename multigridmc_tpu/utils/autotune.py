"""One-shot measured performance crossovers, cached per device kind.

Round 3 converted the fused-kernel VMEM budgets from v5e constants into a
device-kind table + compile-probe ladder (``mgmc_visit_pallas._vmem_limit``).
This module applies the same discipline to the two remaining single-chip-scan
magic numbers (round-3 review, "what's weak" #6):

* ``fused_min_vertices`` - the level vertex count above which the fused
  level-visit Pallas kernels beat the composed XLA visit
  (``MGMC_FUSED_MIN_VERTICES`` overrides);
* ``distill_max_n`` - the largest sub-level vertex count worth replacing by
  the distilled affine map ``x = T f + S xi`` (``MGMC_DISTILL_MAX_N``
  overrides): above it the two n x n matmuls go HBM-bandwidth-bound and lose
  to the composed recursion.

Values measured on known chips ship in ``_KNOWN`` below (slope-measured, see
BASELINE.md); an unknown TPU generation re-derives both ONCE by running the
underlying slope measurements on device (:func:`probe_fused_min_vertices`,
:func:`probe_distill_max_n`, ~2-3 min total) and caches the result in
``MGMC_AUTOTUNE_CACHE`` (default ``~/.cache/multigridmc_tpu/autotune.json``).
``MGMC_AUTOTUNE=0`` disables probing (static defaults everywhere).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional

#: static defaults (v5e round-2/3 slope scans) - also the CPU/interpret values
_DEFAULTS = {"fused_min_vertices": 40000, "distill_max_n": 4160}

#: measured per device kind (lowercased substring match); extend as chips are
#: measured.  v5e: 255^2 fused wins 1.5x, 127^2 loses (NOTES_R2.md); the
#: distilled matmul at 63^2 wins ~2x, at 127^2 the 2 GB/step T/S streaming
#: exceeds the composed tail (BASELINE.md round-4 autotune section).
_KNOWN = {
    "v5 lite": dict(_DEFAULTS),
    "v5e": dict(_DEFAULTS),
}


def _cache_path() -> Path:
    env = os.environ.get("MGMC_AUTOTUNE_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "multigridmc_tpu" / "autotune.json"


def _device_kind() -> Optional[str]:
    import jax

    try:
        if jax.default_backend() != "tpu":
            return None
        return jax.devices()[0].device_kind.lower()
    except RuntimeError:
        return None


def _cache_get(kind: str, key: str):
    try:
        data = json.loads(_cache_path().read_text())
        return data.get(kind, {}).get(key)
    except (OSError, ValueError):
        return None


def _cache_put(kind: str, key: str, value) -> None:
    path = _cache_path()
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        data = {}
    data.setdefault(kind, {})[key] = value
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(data, indent=1))
    except OSError:
        pass  # read-only filesystem: value still used this process


def _slope(fn, key_fn, n1=50, n2=200):
    """Two-length slope of a (key, nsteps)->array device loop (tunnel-safe).

    Lengths must keep both measurements in the tunnel's slow regime AND well
    above timing noise: the round-5 hardware validation caught the original
    4/16-step version measuring a NEGATIVE slope for the 127^2 fused pair
    (sub-ms per step against ~1 ms run-to-run jitter), which silently flipped
    the fused_min_vertices decision to 16000."""

    def force(t):
        return float(t.ravel()[0])

    ts = {}
    for n in (n1, n2):
        force(fn(key_fn(n), n))  # compile + warm
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            force(fn(key_fn(100 * n + i), n))
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[1]
    return (ts[n2] - ts[n1]) / (n2 - n1)


# ------------------------------------------------------------------- probes
def probe_fused_min_vertices(nchains: int = 256) -> int:
    """Measure the fused-vs-composed visit crossover on the current device:
    slope-time one descend+ascend pair at 127^2 and 255^2 (5-point FD prior,
    SOR, production noise).  Returns the vertex-count threshold."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..lattice import Lattice
    from ..models.correlation import ConstantCorrelationLengthModel
    from ..models.prior import shiftedlaplace_fd
    from ..ops.coloring import coloring_for
    from ..ops.intergrid import prolongate_add, restrict
    from ..ops.kernels import mgmc_visit_pallas as vk
    from ..samplers.sor import SORSampler
    from ..smoothers import BACKWARD, FORWARD, SORSmoother
    from .runtime import sampling_key

    wins = {}
    for side in (127, 255):
        with jax.default_device(jax.devices("cpu")[0]):
            lattice = Lattice((side + 1, side + 1))
            op = shiftedlaplace_fd(
                lattice, ConstantCorrelationLengthModel(0.2),
                dtype=jnp.float32)
            coloring = coloring_for(op.offsets, op.vshape)
            pre = SORSmoother(op, 1.0, 1, FORWARD, coloring)
            post = SORSmoother(op, 1.0, 1, BACKWARD, coloring)
            fused = vk.FusedVisitLevel(
                op, coloring, 1.0, pre.order, post.order, None, None, 1.0)
            pre_s = SORSampler(op, 1.0, 1, FORWARD)
            post_s = SORSampler(op, 1.0, 1, BACKWARD)
        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
        x = jnp.asarray(rng.normal(size=(nchains,) + op.vshape), jnp.float32)

        @jax.jit
        def fused_steps(key, n, x=x, f=f, fused=fused):
            def body(i, x):
                k = jax.random.fold_in(key, i)
                x2, fc = fused.descend(k, f, x)
                return fused.ascend(k, f, x2, fc)
            return jax.lax.fori_loop(0, n, body, x)

        @jax.jit
        def comp_steps(key, n, x=x, f=f, op=op, pre_s=pre_s, post_s=post_s):
            def body(i, x):
                k = jax.random.fold_in(key, i)
                x = pre_s.apply(k, f, x)
                fc = restrict(f - op.apply(x), dim=2)
                x = prolongate_add(1.0, fc, x, dim=2)
                return post_s.apply(jax.random.fold_in(k, 1), f, x)
            return jax.lax.fori_loop(0, n, body, x)

        tf = _slope(fused_steps, sampling_key)
        tc = _slope(comp_steps, sampling_key)
        wins[side] = tf < tc
    if wins[127]:
        return 16000  # fused pays from the 127^2 band up
    if wins[255]:
        return 40000  # v5e-like: 255^2 wins, 127^2 loses
    return 10 ** 9  # fused never pays on this chip


def probe_distill_max_n(nchains: int = 256) -> int:
    """Measure the distilled-matmul-vs-composed-subtree crossover: the
    distilled invocation streams 2 n^2 floats of T/S per step (chains
    amortize the read), the composed subtree is latency-bound.  Times the
    matmul pair with REPRESENTATIVE random matrices (the cost is shape-only)
    against a composed 3-level W-cycle rooted at that size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..lattice import Lattice
    from ..models.correlation import ConstantCorrelationLengthModel
    from ..models.prior import shiftedlaplace_fd
    from ..samplers.distill import PRECISION
    from ..samplers.mgmc import MultigridMCSampler
    from .runtime import sampling_key

    best = 0
    for side in (63, 127):
        n = side * side
        rng = np.random.default_rng(1)
        Tm = jnp.asarray(rng.normal(size=(n, n)) / np.sqrt(n), jnp.float32)
        S_T = jnp.asarray(rng.normal(size=(n, n)) / np.sqrt(n), jnp.float32)
        x = jnp.asarray(rng.normal(size=(nchains, n)), jnp.float32)

        # Tm/S_T as ARGUMENTS: closed over they embed as HLO constants
        # (2.1 GB at 127^2) and overflow the remote-compile transport
        @jax.jit
        def _dist_steps(key, nst, x, Tm, S_T):
            def body(i, x):
                xi = jax.random.normal(
                    jax.random.fold_in(key, i), x.shape, x.dtype)
                y = jnp.tensordot(x, Tm, axes=([1], [0]), precision=PRECISION)
                return y + jnp.tensordot(xi, S_T, axes=([1], [0]),
                                         precision=PRECISION)
            return jax.lax.fori_loop(0, nst, body, x)

        def dist_steps(key, nst, x=x, Tm=Tm, S_T=S_T):
            return _dist_steps(key, nst, x, Tm, S_T)

        with jax.default_device(jax.devices("cpu")[0]):
            lattice = Lattice((side + 1, side + 1))
            op = shiftedlaplace_fd(
                lattice, ConstantCorrelationLengthModel(0.2),
                dtype=jnp.float32)
            sampler = MultigridMCSampler(
                op, nlevel=3, smoother="SOR", cycle=2,
                fused=False, distill=False)
        f = jnp.zeros(op.vshape, jnp.float32)
        xg = jnp.zeros((nchains,) + op.vshape, jnp.float32)

        @jax.jit
        def comp_steps(key, nst, x=xg, f=f, sampler=sampler):
            def body(i, x):
                # the production subtree is rooted at level > 0, so ONE
                # distilled invocation replaces ``cycle`` visits of the root
                # (W-cycle multiplicity); a single root-level apply here
                # would undercount the composed work 2x - the round-5
                # hardware validation caught exactly that (probe returned 0)
                k = jax.random.fold_in(key, i)
                x = sampler.apply(jax.random.fold_in(k, 0), f, x)
                return sampler.apply(jax.random.fold_in(k, 1), f, x)
            return jax.lax.fori_loop(0, nst, body, x)

        td = _slope(dist_steps, sampling_key)
        tc = _slope(comp_steps, sampling_key)
        if td < tc:
            best = n
    if best >= 127 * 127:
        return 16512  # admits the 127^2/128^2-cell band
    if best >= 63 * 63:
        return 4160  # v5e-like: 63^2 wins, 127^2 streams too much
    return 0  # distillation never pays on this chip


# ------------------------------------------------------------------ lookups
def _lookup(key: str, probe_fn) -> int:
    kind = _device_kind()
    if kind is None:
        return _DEFAULTS[key]
    for known, vals in _KNOWN.items():
        if known in kind:
            return vals[key]
    if os.environ.get("MGMC_AUTOTUNE", "1") == "0":
        return _DEFAULTS[key]
    cached = _cache_get(kind, key)
    if cached is not None:
        return int(cached)
    print(f"[multigridmc_tpu] unknown TPU generation '{kind}': measuring "
          f"{key} crossover once (cache: {_cache_path()})", flush=True)
    try:
        value = int(probe_fn())
    except Exception as e:  # probe must never break construction
        print(f"[multigridmc_tpu] {key} probe failed ({e!r}); "
              f"using default {_DEFAULTS[key]}", flush=True)
        value = _DEFAULTS[key]
    _cache_put(kind, key, value)
    return value


def fused_min_vertices() -> int:
    env = os.environ.get("MGMC_FUSED_MIN_VERTICES")
    if env:
        return int(env)
    return _lookup("fused_min_vertices", probe_fused_min_vertices)


def distill_max_n() -> int:
    env = os.environ.get("MGMC_DISTILL_MAX_N")
    if env:
        return int(env)
    return _lookup("distill_max_n", probe_distill_max_n)
