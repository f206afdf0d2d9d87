"""On-TPU statistical gate for the sparse-B (SMEM-synthesized measurement
fields) fused-visit path.

The resident-set compression's sparse_nz option runs in PRODUCTION at 1024^2
(visit_plan engages it when it enlarges the feasible chain block).  The
interpret-mode tests prove the deterministic data path; the STOCHASTIC path
(measurement noise c += xi'_k B_k against synthesized one-hot fields, and the
Woodbury/residual shortcut through b_field) only shows up in moments.  This
script forces the sparse plan at a small posterior where the dense plan is
the default, and gates mean/covariance against the dense f64 inverse with
the same oracle as tests/test_sampler.py.

Run as the sole TPU client: python native/validate_sparse_visit_tpu.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multigridmc_tpu.lattice import Lattice
    from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
    from multigridmc_tpu.models.posterior import (
        MeasurementParameters,
        measured_operator,
    )
    from multigridmc_tpu.models.prior import shiftedlaplace_fd
    from multigridmc_tpu.ops.kernels import mgmc_visit_pallas as vk
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
    from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

    configure_runtime(default_x64=False)
    nx, nlevel, nchains, nwarm, nsteps = 64, 4, 256, 60, 800
    with jax.default_device(jax.devices("cpu")[0]):
        lattice = Lattice((nx, nx))
        prior = shiftedlaplace_fd(
            lattice, ConstantCorrelationLengthModel(0.2), dtype=jnp.float32)
        rng = np.random.default_rng(20260820)
        params = MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(8, 2)),
            mean=rng.normal(size=8),
            variance=1e-4 * (1.0 + rng.uniform(size=8)),
        )
        op = measured_operator(prior, params)
        sampler = MultigridMCSampler(
            op, nlevel=nlevel, smoother="SOR", cycle=2,
            fused=True, distill=True, fused_min_vertices=2000,
        )
        # force the sparse plan on every fused level that has measurements
        for lvl, fused in sampler.fused_levels.items():
            lop = sampler.hierarchy.operators[lvl]
            if lop.lowrank is None:
                continue
            cc, ns, sp = vk.compress_plan(lop, fused.omega)
            assert sp is not None, f"level {lvl}: no sparse triplets"
            plan = dict(const_coeffs=cc, ns_const=ns, sparse_B=sp, bc=8)
            coloring = sampler.presamplers[lvl].smoother.coloring
            sampler.fused_levels[lvl] = vk.FusedVisitLevel(
                lop, coloring, fused.omega, fused.pre_orders,
                fused.post_orders, fused.Bbar_pre, fused.Bbar_post,
                fused.coarse_scaling, plan=plan,
            )
    nzs = {lvl: f._sparse_nz for lvl, f in sampler.fused_levels.items()}
    print(f"fused levels: {sorted(sampler.fused_levels)}  sparse_nz: {nzs}  "
          f"distill level: {sampler.distill_level}", flush=True)
    assert any(nz > 0 for nz in nzs.values()), "sparse path must be active"

    Q = op.to_dense()
    cov = np.linalg.inv(Q)
    n = Q.shape[0]
    mean_exact = rng.normal(size=n)
    f = jnp.asarray((Q @ mean_exact).reshape(op.vshape), jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def chain(x, key):
        def step(carry, i):
            x, sx, sxx = carry
            x = sampler.apply(jax.random.fold_in(key, i), f, x)
            xf = x.reshape(nchains, n)
            sxx = sxx + jax.lax.dot_general(
                xf, xf, (((0,), (0,)), ((), ())), precision=hi)
            return (x, sx + xf.sum(0), sxx), 0.0

        (x, sx, sxx), _ = jax.lax.scan(
            step, (x, jnp.zeros((n,), jnp.float32),
                   jnp.zeros((n, n), jnp.float32)),
            jnp.arange(100))
        return x, sx, sxx

    @jax.jit
    def warm(x, key):
        def body(i, x):
            return sampler.apply(jax.random.fold_in(key, i), f, x)
        return jax.lax.fori_loop(0, nwarm, body, x)

    x = warm(jnp.zeros((nchains,) + op.vshape, jnp.float32), sampling_key(1))
    sx64, sxx64 = np.zeros(n), np.zeros((n, n))
    for ci in range(nsteps // 100):
        x, sx, sxx = chain(x, sampling_key(2 + ci))
        sx64 += np.asarray(sx, np.float64)
        sxx64 += np.asarray(sxx, np.float64)
    total = nchains * nsteps
    Ex = sx64 / total
    cov_emp = sxx64 / total - np.outer(Ex, Ex)
    mean_err = np.max(np.abs(Ex - mean_exact))
    cov_err = np.max(np.abs(cov_emp - cov)) / np.max(np.abs(cov))
    band = 6.0 / np.sqrt(total / 10.0)
    print(f"samples {total}  mean_err {mean_err:.3e}  cov rel err "
          f"{cov_err:.3e}  (band ~{band:.3e})", flush=True)
    ok = cov_err < band and mean_err < 5e-2 + 50 * np.sqrt(
        np.max(np.diag(cov)) / (total / 10.0))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
