"""On-TPU validation of the fused MGMC level-visit kernels.

Three gates (run on real hardware; CPU interpret mode cannot execute the
on-chip PRNG):

1. exactness: compiled deterministic (noise=False) descend/ascend visits match
   the composed XLA path at production-like shapes;
2. noise moments: the in-kernel Box-Muller sin/cos-pair normals have correct
   mean/var/skew/kurtosis and no pair correlation;
3. statistics: full fused MGMC sampling on a small posterior reproduces the
   dense-oracle mean and covariance (same gate as tests/test_sampler.py).

Usage: python native/validate_visit_tpu.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from multigridmc_tpu.utils.runtime import configure_runtime, sampling_key

configure_runtime(default_x64=False)

import jax
import jax.numpy as jnp

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fd
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.ops.intergrid import prolongate_add, restrict
from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import FusedVisitLevel
from multigridmc_tpu.samplers.mgmc import MultigridMCSampler
from multigridmc_tpu.smoothers import BACKWARD, FORWARD, SORSmoother

assert jax.default_backend() != "cpu", "run on TPU"
ok = True


def check(name, cond, detail=""):
    global ok
    print(f"{'PASS' if cond else 'FAIL'}  {name}  {detail}", flush=True)
    ok = ok and bool(cond)


def build(nx, lowrank, nmeas=8, var=1.0):
    lattice = Lattice((nx, nx))
    op = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2),
                           dtype=jnp.float32)
    if lowrank:
        rng = np.random.default_rng(5)
        params = MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(nmeas, 2)),
            mean=rng.normal(size=nmeas),
            variance=var * (1.0 + rng.uniform(size=nmeas)),
        )
        op = measured_operator(op, params)
    return op


def fused_for(op, omega=1.0, coarse_scaling=1.0):
    coloring = coloring_for(op.offsets, op.vshape)
    pre = SORSmoother(op, omega, 1, FORWARD, coloring)
    post = SORSmoother(op, omega, 1, BACKWARD, coloring)
    return pre, post, FusedVisitLevel(
        op, coloring, omega, pre.order, post.order, pre.B_bar, post.B_bar,
        coarse_scaling)


# ---------------------------------------------------------------- 1. exactness
for lowrank in (False, True):
    op = build(256, lowrank)
    pre, post, fused = fused_for(op, coarse_scaling=0.75)
    rng = np.random.default_rng(1)
    C = 8
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)
    out_x, out_fc = jax.jit(lambda f, x: fused.descend(
        jax.random.key(0), f, x, noise=False))(f, x)
    exp_x = jax.jit(pre.apply)(f, x)
    exp_fc = restrict(f - op.apply(exp_x), dim=2)
    ex = float(jnp.max(jnp.abs(out_x - exp_x)))
    ef = float(jnp.max(jnp.abs(out_fc - exp_fc)))
    check(f"descend exactness lowrank={lowrank}", ex < 2e-4 and ef < 2e-4,
          f"max|dx|={ex:.2e} max|dfc|={ef:.2e}")

    vc = tuple(m // 2 for m in op.vshape)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)
    out_a = jax.jit(lambda f, x, xc: fused.ascend(
        jax.random.key(0), f, x, xc, noise=False))(f, x, xc)
    exp_a = jax.jit(post.apply)(f, prolongate_add(0.75, xc, x, dim=2))
    ea = float(jnp.max(jnp.abs(out_a - exp_a)))
    check(f"ascend exactness lowrank={lowrank}", ea < 2e-4, f"max|dx|={ea:.2e}")

# ---------------------------------------------------------- 1b. 3d exactness
lattice3 = Lattice((64, 64, 64))
op3 = shiftedlaplace_fd(lattice3, ConstantCorrelationLengthModel(0.2),
                        dtype=jnp.float32)
rng3 = np.random.default_rng(11)
op3 = measured_operator(op3, MeasurementParameters(
    measurement_locations=rng3.uniform(0.1, 0.9, size=(8, 3)),
    mean=rng3.normal(size=8), variance=1.0 + rng3.uniform(size=8)))
pre3, post3, fused3 = fused_for(op3, coarse_scaling=0.75)
# round 5: 3d runs FLAT by default (fields (Z, Y*X) in-kernel, transfers
# fused); MGMC_VISIT_FLAT3D=0 would restore the legacy out-of-kernel form
assert fused3.flat and fused3.fuse_transfers
C3 = 4
f3 = jnp.asarray(rng3.normal(size=op3.vshape), jnp.float32)
x3 = jnp.asarray(rng3.normal(size=(C3,) + op3.vshape), jnp.float32)
out_x3, out_c3 = jax.jit(lambda f, x: fused3.descend(
    jax.random.key(0), f, x, noise=False))(f3, x3)
exp_x3 = jax.jit(pre3.apply)(f3, x3)
exp_c3 = restrict(f3 - op3.apply(exp_x3), dim=3)
ex3 = float(jnp.max(jnp.abs(out_x3 - exp_x3)))
er3 = float(jnp.max(jnp.abs(out_c3 - exp_c3)))
check("3d flat descend exactness", ex3 < 2e-3 and er3 < 2e-3,
      f"max|dx|={ex3:.2e} max|dfc|={er3:.2e}")
vc3 = tuple(v // 2 for v in op3.vshape)
xc3 = jnp.asarray(rng3.normal(size=(C3,) + vc3), jnp.float32)
out_a3 = jax.jit(lambda f, x, xc: fused3.ascend(
    jax.random.key(0), f, x, xc, noise=False))(f3, x3, xc3)
exp_a3 = jax.jit(post3.apply)(f3, prolongate_add(0.75, xc3, x3, dim=3))
ea3 = float(jnp.max(jnp.abs(out_a3 - exp_a3)))
check("3d flat ascend exactness", ea3 < 2e-3, f"max|dx|={ea3:.2e}")

# ------------------------------------------------------ 1c. SSOR exactness
from multigridmc_tpu.smoothers import SSORSmoother

op_s = build(256, True)
ssor = SSORSmoother(op_s, 0.9, 1)
f_sm, b_sm = ssor.forward, ssor.backward
Bbar_s = jnp.concatenate([f_sm.B_bar, b_sm.B_bar], axis=0)
fused_s = FusedVisitLevel(op_s, f_sm.coloring, 0.9,
                          (f_sm.order, b_sm.order), (f_sm.order, b_sm.order),
                          Bbar_s, Bbar_s, 0.75)
rngs = np.random.default_rng(13)
fs = jnp.asarray(rngs.normal(size=op_s.vshape), jnp.float32)
xs = jnp.asarray(rngs.normal(size=(8,) + op_s.vshape), jnp.float32)
out_xs, out_fcs = jax.jit(lambda f, x: fused_s.descend(
    jax.random.key(0), f, x, noise=False))(fs, xs)
exp_xs = jax.jit(ssor.apply)(fs, xs)
exp_fcs = restrict(fs - op_s.apply(exp_xs), dim=2)
exs = float(jnp.max(jnp.abs(out_xs - exp_xs)))
efs = float(jnp.max(jnp.abs(out_fcs - exp_fcs)))
check("SSOR descend exactness", exs < 2e-4 and efs < 2e-4,
      f"max|dx|={exs:.2e} max|dfc|={efs:.2e}")

# ------------------------------------------------------------ 2. noise moments
op = build(256, False)
pre, post, fused = fused_for(op)
C = 16
f0 = jnp.zeros(op.vshape, jnp.float32)
x0 = jnp.zeros((C,) + op.vshape, jnp.float32)

samples = []
for i in range(64):
    out_x, _ = fused.descend(sampling_key(100 + i), f0, x0)  # x reset each call
    # after one forward red-black Gibbs sweep from x=0, f=0:
    #   red sites:   x_r = omega * c_r / d  (c = noise)
    #   black sites: x_b = omega * (c_b - A_offdiag x_r) / d
    # red-site values are therefore iid N(0, omega^2 (2-omega)/omega / d) -
    # use them for moment checks
    samples.append(np.asarray(out_x))
s = np.stack(samples)  # (64, C, H, W)
H, W = op.vshape
ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
red = ((ii + jj) % 2 == 0)
d = np.asarray(op.diag_stencil())
std_exp = np.sqrt((2.0 - 1.0) / 1.0 / d)  # omega=1
z = s[:, :, red] / std_exp[None, None, red]
n = z.size
mean, var = z.mean(), z.var()
skew = (z**3).mean()
kurt = (z**4).mean()
se = 1.0 / np.sqrt(n)
check("noise mean", abs(mean) < 6 * se, f"{mean:+.2e} (n={n})")
check("noise var", abs(var - 1) < 6 * np.sqrt(2) * se, f"{var:.5f}")
check("noise skew", abs(skew) < 6 * np.sqrt(15) * se, f"{skew:+.2e}")
check("noise kurtosis", abs(kurt - 3) < 6 * np.sqrt(96) * se, f"{kurt:.4f}")
# sin/cos pair halves: chain c and c + C/2 within a block share (u1, u2);
# their red-site values must still be uncorrelated
zc = z.reshape(64, C, -1)
bc = 8  # block size picked for this shape; pairs are (i, i + bc//2) per block
corrs = []
for b0 in range(0, C, bc):
    for i in range(bc // 2):
        a, bv = zc[:, b0 + i].ravel(), zc[:, b0 + i + bc // 2].ravel()
        corrs.append(np.corrcoef(a, bv)[0, 1])
cmax = float(np.max(np.abs(corrs)))
check("sin/cos pair decorrelation", cmax < 6 / np.sqrt(zc.shape[0] * zc.shape[2]),
      f"max|corr|={cmax:.2e}")

# -------------------------------------------------------------- 3. statistics
op = build(16, True, nmeas=4, var=1e-2)
n = op.lattice.nvertex
rng = np.random.default_rng(0)
mean_exact = rng.uniform(size=n)
Q = np.asarray(op.to_dense(), dtype=np.float64)
f = jnp.asarray((Q @ mean_exact).reshape(op.vshape), jnp.float32)
cov_exact = np.linalg.inv(Q)

import os

import multigridmc_tpu.samplers.mgmc as mgmc_mod

os.environ["MGMC_FUSED"] = "1"
mgmc_mod.MIN_FUSED_VERTICES = 200
os.environ["MGMC_FUSED_MIN_VERTICES_3D"] = "200"  # the tiny 8^3 gate problem
sampler = mgmc_mod.MultigridMCSampler(
    op, nlevel=2, smoother="SOR", coarse_solver="Cholesky", omega=1.0, cycle=1)
assert sampler.fused_levels, "fused levels not built"

C, nsteps, nwarm = 512, 1500, 100


def run(x, key, nsteps):
    def step(x, k):
        return sampler.apply(jax.random.fold_in(key, k), f, x), 0.0

    x, _ = jax.lax.scan(step, x, jnp.arange(nsteps))
    return x


runj = jax.jit(run, static_argnums=2)
x = jnp.zeros((C,) + op.vshape, jnp.float32)
x = runj(x, sampling_key(1), nwarm)
sx = np.zeros(n)
sxx = np.zeros((n, n))
stepj = jax.jit(lambda x, k: sampler.apply(k, f, x))
key = sampling_key(2)
for i in range(nsteps):
    x = stepj(x, jax.random.fold_in(key, i))
    xf = np.asarray(x, dtype=np.float64).reshape(C, n)
    sx += xf.sum(axis=0)
    sxx += xf.T @ xf
total = C * nsteps
Ex = sx / total
cov = sxx / total - np.outer(Ex, Ex)
em = np.max(np.abs(Ex - mean_exact))
ec = np.max(np.abs(cov - cov_exact))
check("fused MGMC mean", em < 2.5e-3, f"maxerr={em:.2e} ({total} samples)")
check("fused MGMC cov", ec < 2.5e-3, f"maxerr={ec:.2e}")

# ------------------------------------------------- 3b. 3d fused statistics
lattice3s = Lattice((8, 8, 8))
op3s = shiftedlaplace_fd(lattice3s, ConstantCorrelationLengthModel(0.3),
                         dtype=jnp.float32)
n3 = op3s.lattice.nvertex
rng3s = np.random.default_rng(3)
mean_exact3 = rng3s.uniform(size=n3)
Q3 = np.asarray(op3s.to_dense(), dtype=np.float64)
f3s = jnp.asarray((Q3 @ mean_exact3).reshape(op3s.vshape), jnp.float32)
cov_exact3 = np.linalg.inv(Q3)
sampler3 = mgmc_mod.MultigridMCSampler(
    op3s, nlevel=2, smoother="SOR", coarse_solver="Cholesky", omega=1.0,
    cycle=1)
assert sampler3.fused_levels and sampler3.fused_levels[0].flat  # round-5 flat 3d
C3s, nsteps3, nwarm3 = 512, 1200, 100


def run3(x, key, nsteps):
    def step(x, k):
        return sampler3.apply(jax.random.fold_in(key, k), f3s, x), 0.0

    x, _ = jax.lax.scan(step, x, jnp.arange(nsteps))
    return x


runj3 = jax.jit(run3, static_argnums=2)
x = jnp.zeros((C3s,) + op3s.vshape, jnp.float32)
x = runj3(x, sampling_key(5), nwarm3)
sx = np.zeros(n3)
sxx = np.zeros((n3, n3))
stepj3 = jax.jit(lambda x, k: sampler3.apply(k, f3s, x))
key3 = sampling_key(6)
for i in range(nsteps3):
    x = stepj3(x, jax.random.fold_in(key3, i))
    xf = np.asarray(x, dtype=np.float64).reshape(C3s, n3)
    sx += xf.sum(axis=0)
    sxx += xf.T @ xf
total3 = C3s * nsteps3
Ex3 = sx / total3
cov3 = sxx / total3 - np.outer(Ex3, Ex3)
em3 = np.max(np.abs(Ex3 - mean_exact3))
ec3 = np.max(np.abs(cov3 - cov_exact3))
# gate calibrated against the composed XLA path at the same sample count
# (slow 2-level mixing on 8^3: composed measures mean 5.9e-3 / cov 9.5e-3,
# fused 4.7e-3 / 9.8e-3 - statistically identical); a fused-path bias would
# blow well past this
check("3d fused MGMC mean", em3 < 1.2e-2, f"maxerr={em3:.2e} ({total3} samples)")
check("3d fused MGMC cov", ec3 < 1.5e-2, f"maxerr={ec3:.2e}")

# ------------------------------------------------ 3c. SSOR fused statistics
op_ss = build(16, True, nmeas=4, var=1e-2)
nss = op_ss.lattice.nvertex
rng_ss = np.random.default_rng(4)
mean_exact_ss = rng_ss.uniform(size=nss)
Qss = np.asarray(op_ss.to_dense(), dtype=np.float64)
fss = jnp.asarray((Qss @ mean_exact_ss).reshape(op_ss.vshape), jnp.float32)
cov_exact_ss = np.linalg.inv(Qss)
sampler_ss = mgmc_mod.MultigridMCSampler(
    op_ss, nlevel=2, smoother="SSOR", coarse_solver="Cholesky", omega=1.0,
    cycle=1)
assert sampler_ss.fused_levels, "SSOR fused levels not built"
Css, nsteps_ss, nwarm_ss = 512, 1500, 100


def run_ss(x, key, nsteps):
    def step(x, k):
        return sampler_ss.apply(jax.random.fold_in(key, k), fss, x), 0.0

    x, _ = jax.lax.scan(step, x, jnp.arange(nsteps))
    return x


x = jax.jit(run_ss, static_argnums=2)(
    jnp.zeros((Css,) + op_ss.vshape, jnp.float32), sampling_key(7), nwarm_ss)
sx = np.zeros(nss)
sxx = np.zeros((nss, nss))
stepj_ss = jax.jit(lambda x, k: sampler_ss.apply(k, fss, x))
key_ss = sampling_key(8)
for i in range(nsteps_ss):
    x = stepj_ss(x, jax.random.fold_in(key_ss, i))
    xf = np.asarray(x, dtype=np.float64).reshape(Css, nss)
    sx += xf.sum(axis=0)
    sxx += xf.T @ xf
total_ss = Css * nsteps_ss
Ex_ss = sx / total_ss
cov_ss = sxx / total_ss - np.outer(Ex_ss, Ex_ss)
em_ss = np.max(np.abs(Ex_ss - mean_exact_ss))
ec_ss = np.max(np.abs(cov_ss - cov_exact_ss))
# SSOR mixes faster than single SOR; same calibration logic as gate 3
check("SSOR fused MGMC mean", em_ss < 2.5e-3,
      f"maxerr={em_ss:.2e} ({total_ss} samples)")
check("SSOR fused MGMC cov", ec_ss < 2.5e-3, f"maxerr={ec_ss:.2e}")

print("ALL PASS" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
