"""Fused MGMC level-visit kernels: exactness of the deterministic data path.

With noise disabled one fused descend visit must equal the composed XLA path

    sweep(f, x) -> Woodbury -> r = f - A x -> restrict

elementwise (same stencil algebra, same HIGHEST-precision intergrid matmuls),
and one fused ascend visit must equal prolongate_add -> sweep -> Woodbury.
Run in Pallas interpreter mode on CPU; the stochastic path (on-chip PRNG) is
validated on TPU by native/validate_visit_tpu.py plus the bench-scale
statistical gate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fd
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.ops.intergrid import prolongate_add, restrict
from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import FusedVisitLevel
from multigridmc_tpu.smoothers import BACKWARD, FORWARD, SORSmoother, color_order


def _setup(nx=24, lowrank=True, omega=1.0):
    lattice = Lattice((nx, nx))
    op = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.3),
                           dtype=jnp.float32)
    if lowrank:
        rng = np.random.default_rng(5)
        params = MeasurementParameters(
            measurement_locations=rng.uniform(0.1, 0.9, size=(4, 2)),
            mean=rng.normal(size=4),
            # O(1) variances: the exactness comparison needs both paths
            # well-conditioned (production 1e-6 variances are validated
            # statistically on TPU, where both paths share the same f32
            # cancellation - see module docstring)
            variance=0.5 + rng.uniform(size=4),
        )
        op = measured_operator(op, params)
    coloring = coloring_for(op.offsets, op.vshape)
    pre = SORSmoother(op, omega, 1, FORWARD, coloring)
    post = SORSmoother(op, omega, 1, BACKWARD, coloring)
    fused = FusedVisitLevel(
        op, coloring, omega, pre.order, post.order, pre.B_bar, post.B_bar,
        coarse_scaling=0.75, interpret=True,
    )
    return op, pre, post, fused


@pytest.mark.parametrize("lowrank", [False, True], ids=["prior", "posterior"])
@pytest.mark.parametrize("f_batched", [False, True], ids=["fshared", "fbatched"])
def test_descend_visit_matches_composed(lowrank, f_batched):
    op, pre, _, fused = _setup(lowrank=lowrank)
    rng = np.random.default_rng(1)
    C = 4
    f = jnp.asarray(
        rng.normal(size=((C,) if f_batched else ()) + op.vshape), jnp.float32
    )
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)

    out_x, out_fc = fused.descend(jax.random.key(0), f, x, noise=False)

    exp_x = pre.apply(f, x)
    r = f - op.apply(exp_x)
    exp_fc = restrict(r, dim=2)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(exp_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_fc), np.asarray(exp_fc),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("lowrank", [False, True], ids=["prior", "posterior"])
def test_ascend_visit_matches_composed(lowrank):
    op, _, post, fused = _setup(lowrank=lowrank, omega=0.9)
    rng = np.random.default_rng(2)
    C = 4
    vc = tuple(m // 2 for m in op.vshape)
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)

    out_x = fused.ascend(jax.random.key(0), f, x, xc, noise=False)

    exp = prolongate_add(0.75, xc, x, dim=2)
    exp = post.apply(f, exp)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)


def test_descend_visit_odd_chain_count():
    """bc=1 path (no sin/cos pairing, single chain per block)."""
    op, pre, _, fused = _setup(lowrank=False)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(3,) + op.vshape), jnp.float32)
    out_x, out_fc = fused.descend(jax.random.key(0), f, x, noise=False)
    exp_x = pre.apply(f, x)
    exp_fc = restrict(f - op.apply(exp_x), dim=2)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(exp_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_fc), np.asarray(exp_fc),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("flat", [True, False], ids=["flat", "legacy"])
def test_descend_ascend_visit_3d_matches_composed(flat, monkeypatch):
    """3d path.  Default (flat): fields stored (Z, Y*X) in-kernel with
    in-kernel tensor-product transfers (f_c = R_z r kron(R_y,R_x)^T).
    Legacy (MGMC_VISIT_FLAT3D=0): dense 3d blocks, transfers outside."""
    if not flat:
        monkeypatch.setenv("MGMC_VISIT_FLAT3D", "0")
    lattice = Lattice((10, 12, 14))
    op = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.3),
                           dtype=jnp.float32)
    coloring = coloring_for(op.offsets, op.vshape)
    pre = SORSmoother(op, 1.0, 1, FORWARD, coloring)
    post = SORSmoother(op, 1.0, 1, BACKWARD, coloring)
    fused = FusedVisitLevel(op, coloring, 1.0, pre.order, post.order,
                            pre.B_bar, post.B_bar, coarse_scaling=0.5,
                            interpret=True)
    assert fused.fuse_transfers == flat
    rng = np.random.default_rng(4)
    C = 4
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)

    out_x, out_c = fused.descend(jax.random.key(0), f, x, noise=False)
    exp_x = pre.apply(f, x)
    exp_r = f - op.apply(exp_x)
    exp_c = restrict(exp_r, dim=3) if flat else exp_r
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(exp_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(exp_c),
                               rtol=2e-5, atol=2e-5)

    from multigridmc_tpu.ops.intergrid import prolongate

    vc = tuple(m // 2 for m in op.vshape)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)
    # flat mode takes the coarse field itself (prolongation fused in-kernel);
    # legacy takes the pre-prolongated fine-size P x_c
    arg = xc if flat else prolongate(xc, op.vshape)
    out_a = fused.ascend(jax.random.key(0), f, x, arg, noise=False)
    exp = post.apply(f, prolongate_add(0.5, xc, x, dim=3))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)


def test_fused_mgmc_3d_flat_recursion_matches_composed():
    """Full 3d MGMC recursion with flat fused visits on BOTH fine levels
    (noise off -> deterministic W-cycle algebra) equals the composed cycle:
    exercises the flat-to-flat coarse handoff (descend's flat f_c feeding the
    next flat level directly) and the distill/flatten boundaries of
    MultigridMCSampler._sample."""
    from multigridmc_tpu.samplers.mgmc import MultigridMCSampler

    lattice = Lattice((16, 16, 16))
    op = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.3),
                           dtype=jnp.float32)
    rng = np.random.default_rng(31)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.1, 0.9, size=(3, 3)),
        mean=rng.normal(size=3),
        variance=0.5 + rng.uniform(size=3),
    )
    op = measured_operator(op, params)
    comp = MultigridMCSampler(op, nlevel=3, smoother="SOR", cycle=2,
                              coarse_scaling=0.75, distill=False)
    assert not comp.fused_levels
    fus = MultigridMCSampler(op, nlevel=3, smoother="SOR", cycle=2,
                             coarse_scaling=0.75, distill=False,
                             fused=True, fused_min_vertices=0,
                             fused_interpret=True)
    assert sorted(fus.fused_levels) == [0, 1]
    assert all(lv.flat and lv.fuse_transfers
               for lv in fus.fused_levels.values())

    C = 3
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)

    # noise off turns both cycles into the same deterministic algebra: patch
    # the composed Gibbs rhs to c = f, force noise=False through the fused
    # kernels, and swap the coarse Cholesky sample for a deterministic solve
    class DetCoarse:
        def __init__(self, inner):
            self.inner = inner

        def apply(self, key, fc, xc):
            g = self.inner._solve_L(fc.reshape(fc.shape[:-3] + (-1,)))
            y = self.inner._solve_LT(g)
            return y.reshape(fc.shape)

    class NoNoise:
        def __init__(self, lv):
            self._lv = lv

        def __getattr__(self, k):
            return getattr(self._lv, k)

        def descend(self, key, f_, x_, noise=True, flat_io=False):
            return self._lv.descend(key, f_, x_, noise=False, flat_io=flat_io)

        def ascend(self, key, f_, x_, xc, noise=True, flat_io=False):
            return self._lv.ascend(key, f_, x_, xc, noise=False,
                                   flat_io=flat_io)

    comp.coarse_sampler = DetCoarse(comp.coarse_sampler)
    fus.coarse_sampler = DetCoarse(fus.coarse_sampler)
    fus.fused_levels = {k: NoNoise(v) for k, v in fus.fused_levels.items()}
    for s in comp.presamplers + comp.postsamplers:
        s.random_rhs = lambda key, f_, x_: jnp.broadcast_to(f_, x_.shape)

    key = jax.random.key(0)
    out_c = comp.apply(key, f, x)
    out_f = fus.apply(key, f, x)
    scale = float(jnp.max(jnp.abs(out_c)))
    assert float(jnp.max(jnp.abs(out_f - out_c))) < 2e-5 * max(scale, 1.0)


def test_fused_preconditioner_matches_composed():
    """MultigridPreconditioner with fused (noise=False) visits equals the
    composed cycle elementwise for batched rhs."""
    from multigridmc_tpu.solvers.multigrid import MultigridPreconditioner

    op, _, _, fused = _setup(lowrank=True)
    prec = MultigridPreconditioner(op, nlevel=2, smoother="SOR", cycle=2,
                                   coarse_scaling=0.75)
    assert not prec.fused_levels  # gating off on CPU
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.normal(size=(4,) + op.vshape), jnp.float32)
    expected = prec.apply(b)

    # inject an interpret-mode fused level and re-apply
    pre, post = prec.presmoothers[0], prec.postsmoothers[0]
    prec.fused_levels = {0: FusedVisitLevel(
        op, pre.coloring, pre.omega, pre.order, post.order,
        pre.B_bar, post.B_bar, 0.75, interpret=True)}
    got = prec.apply(b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)

    # multi-dim batch reshaping path
    b2 = b.reshape((2, 2) + op.vshape)
    got2 = prec.apply(b2)
    np.testing.assert_allclose(np.asarray(got2),
                               np.asarray(expected).reshape(b2.shape),
                               rtol=1e-6, atol=1e-6)


def test_subtree_kernel_matches_composed():
    """The coarse-subtree kernel (noise=False) equals the composed
    deterministic recursion: per cycle iteration [forward sweep, Woodbury,
    residual, restrict, recurse, prolongate_add, backward sweep, Woodbury],
    coarse level solved exactly."""
    from multigridmc_tpu.ops.kernels.mgmc_subtree_pallas import SubtreeKernel
    from multigridmc_tpu.solvers.multigrid import MultigridHierarchy

    op, _, _, _ = _setup(nx=32, lowrank=True)
    hierarchy = MultigridHierarchy(op, 3)
    ops = hierarchy.operators
    cycle, gamma, omega = 2, 0.75, 1.0
    pres = [SORSmoother(o, omega, 1, FORWARD) for o in ops[:-1]]
    posts = [SORSmoother(o, omega, 1, BACKWARD) for o in ops[:-1]]
    import jax.numpy as jnp2

    L = jnp.linalg.cholesky(jnp.asarray(ops[-1].to_dense(), jnp.float32))
    sub = SubtreeKernel(ops, pres, posts, L, omega, cycle, gamma,
                        interpret=True)

    rng = np.random.default_rng(8)
    C = 4
    f = jnp.asarray(rng.normal(size=(C,) + ops[0].vshape), jnp.float32)
    got = sub.sample(jax.random.key(0), f, noise=False)

    Qc_inv = jnp.asarray(np.linalg.inv(ops[-1].to_dense()), jnp.float32)

    def composed(level, f_l):
        if level == len(ops) - 1:
            n = f_l.shape[-2] * f_l.shape[-1]
            return jnp.tensordot(
                f_l.reshape(C, n), Qc_inv, axes=([1], [1])
            ).reshape(f_l.shape)
        o = ops[level]
        x = jnp.zeros_like(f_l)
        for _ in range(cycle):
            x = pres[level].apply(f_l, x)
            r = f_l - o.apply(x)
            fc = restrict(r, dim=2)
            xc = composed(level + 1, fc)
            x = prolongate_add(gamma, xc, x, dim=2)
            x = posts[level].apply(f_l, x)
        return x

    exp = composed(0, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("lowrank", [False, True], ids=["prior", "posterior"])
def test_ssor_visits_match_composed(lowrank):
    """SSOR visits = two directed sweeps per fused kernel call (orders
    tuple + stacked Woodbury fields)."""
    from multigridmc_tpu.smoothers import SSORSmoother

    op, _, _, _ = _setup(lowrank=lowrank)
    ssor = SSORSmoother(op, 0.9, 1)
    f_sm, b_sm = ssor.forward, ssor.backward
    Bbar = None
    if op.lowrank is not None:
        Bbar = jnp.concatenate([f_sm.B_bar, b_sm.B_bar], axis=0)
    fused = FusedVisitLevel(
        op, f_sm.coloring, 0.9, (f_sm.order, b_sm.order),
        (f_sm.order, b_sm.order), Bbar, Bbar, coarse_scaling=0.75,
        interpret=True,
    )
    rng = np.random.default_rng(9)
    C = 4
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)

    out_x, out_fc = fused.descend(jax.random.key(0), f, x, noise=False)
    exp_x = ssor.apply(f, x)
    exp_fc = restrict(f - op.apply(exp_x), dim=2)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(exp_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_fc), np.asarray(exp_fc),
                               rtol=2e-5, atol=2e-5)

    vc = tuple(m // 2 for m in op.vshape)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)
    out_a = fused.ascend(jax.random.key(0), f, x, xc, noise=False)
    exp_a = ssor.apply(f, prolongate_add(0.75, xc, x, dim=2))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(exp_a),
                               rtol=2e-5, atol=2e-5)


def test_supports_visit_ssor_accounting_and_bbar_strictness():
    """The VMEM gate must count (1 + n_dirs) * m resident Woodbury planes,
    and FusedVisitLevel must reject mis-sized B_bar stacks rather than
    silently tiling one direction's factor."""
    from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import supports_visit

    # near the budget edge, SSOR (n_dirs=2) must be stricter than SOR
    v = (511, 511)
    bc_sor = supports_visit(v, jnp.float32, 5, 8, 16, n_dirs=1)
    bc_ssor = supports_visit(v, jnp.float32, 5, 8, 16, n_dirs=2)
    assert bc_sor is not None
    assert bc_ssor is None or bc_ssor <= bc_sor

    op, pre, post, _ = _setup(lowrank=True)
    with pytest.raises(ValueError, match="B_bar must stack"):
        FusedVisitLevel(
            op, pre.coloring, 1.0, (pre.order, post.order),
            (pre.order, post.order), pre.B_bar, post.B_bar,  # not stacked
            coarse_scaling=1.0, interpret=True,
        )


# ---------------------------------------------------------------- compression
def test_compress_plan_detection():
    """Constant-kappa FD prior: every plane interior-constant (boundary-masked
    entries never act), diag -> static noise scale; radius-0 measurement
    columns -> one-hot SMEM triplets."""
    from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import compress_plan

    op, _, _, _ = _setup(lowrank=True)
    cc, ns, sp = compress_plan(op, 1.0)
    assert cc is not None and all(c is not None for c in cc)
    d = float(np.asarray(op.diag_stencil())[5, 5])
    assert ns == pytest.approx(np.sqrt(d), rel=1e-6)
    rows, cols, vals = sp
    assert rows.shape == (4, 1) and vals.dtype == jnp.float32
    # triplets reproduce the dense fields
    B = np.asarray(op.lowrank.B)
    for k in range(4):
        dense = np.zeros(op.vshape, np.float32)
        dense[int(rows[k, 0]), int(cols[k, 0])] = float(vals[k, 0])
        np.testing.assert_array_equal(dense, B[k])


def _forced_sparse_plan(op, omega):
    from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import compress_plan

    cc, ns, sp = compress_plan(op, omega)
    assert sp is not None
    return dict(const_coeffs=cc, ns_const=ns, sparse_B=sp, bc=4)


def test_sparse_B_visits_match_dense(monkeypatch):
    """SMEM-synthesized measurement fields (sparse_nz path) produce the same
    deterministic visit as resident planes, and as the composed path."""
    op, pre, post, fused_dense = _setup(lowrank=True)
    coloring = pre.coloring
    fused_sp = FusedVisitLevel(
        op, coloring, 1.0, pre.order, post.order, pre.B_bar, post.B_bar,
        coarse_scaling=0.75, interpret=True,
        plan=_forced_sparse_plan(op, 1.0),
    )
    assert fused_sp._sparse_nz == 1
    rng = np.random.default_rng(11)
    C = 4
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)

    dx, dfc = fused_dense.descend(jax.random.key(0), f, x, noise=False)
    sx, sfc = fused_sp.descend(jax.random.key(0), f, x, noise=False)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(dx), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sfc), np.asarray(dfc), rtol=1e-6, atol=1e-6)

    vc = tuple(m // 2 for m in op.vshape)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)
    da = fused_dense.ascend(jax.random.key(0), f, x, xc, noise=False)
    sa = fused_sp.ascend(jax.random.key(0), f, x, xc, noise=False)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(da), rtol=1e-6, atol=1e-6)

    # and against the fully composed reference path
    exp_x = pre.apply(f, x)
    exp_fc = restrict(f - op.apply(exp_x), dim=2)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(exp_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sfc), np.asarray(exp_fc), rtol=2e-5, atol=2e-5)


def test_biharmonic_visits_match_composed():
    """13-point biharmonic stencil (width-2 offsets,
    ``squared_shiftedlaplace_fd_operator.cc:58-93``): the fused visit kernels
    handle it unchanged - ``_shifted`` rolls by any offset and the 5-colour
    ordering is valid for the diamond stencil (VERDICT r4 #8: there is no
    width-1 assumption).  Errors are gated RELATIVE to the O(h^-4) stencil
    scale."""
    from multigridmc_tpu.models.prior import squared_shiftedlaplace_fd
    from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import visit_plan

    lattice = Lattice((24, 24))
    op = squared_shiftedlaplace_fd(
        lattice, ConstantCorrelationLengthModel(0.3), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.1, 0.9, size=(4, 2)),
        mean=rng.normal(size=4),
        variance=0.5 + rng.uniform(size=4),
    )
    op = measured_operator(op, params)
    coloring = coloring_for(op.offsets, op.vshape)
    assert coloring.n_colors == 5  # diamond-stencil colouring
    assert visit_plan(op, 1.0, n_dirs=1) is not None
    pre = SORSmoother(op, 1.0, 1, FORWARD, coloring)
    post = SORSmoother(op, 1.0, 1, BACKWARD, coloring)
    fused = FusedVisitLevel(op, coloring, 1.0, pre.order, post.order,
                            pre.B_bar, post.B_bar, coarse_scaling=0.75,
                            interpret=True)
    C = 4
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)
    out_x, out_fc = fused.descend(jax.random.key(0), f, x, noise=False)
    exp_x = pre.apply(f, x)
    exp_fc = restrict(f - op.apply(exp_x), dim=2)
    scale = float(jnp.max(jnp.abs(exp_fc)))
    assert float(jnp.max(jnp.abs(out_x - exp_x))) < 2e-5
    assert float(jnp.max(jnp.abs(out_fc - exp_fc))) < 2e-5 * max(scale, 1.0)

    vc = tuple(m // 2 for m in op.vshape)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)
    out_a = fused.ascend(jax.random.key(0), f, x, xc, noise=False)
    exp_a = post.apply(f, prolongate_add(0.75, xc, x, dim=2))
    assert float(jnp.max(jnp.abs(out_a - exp_a))) < 2e-5


def test_sparse_B_visits_match_dense_3d():
    """3d SMEM synthesis (round 5, lifting the 2d-only gate): the sparse-B
    fused visit equals the resident-plane visit and the composed path on a
    3d posterior (transfers outside, as in the production 3d cycle)."""
    lattice = Lattice((10, 12, 14))
    op = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.3),
                           dtype=jnp.float32)
    rng = np.random.default_rng(21)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.1, 0.9, size=(4, 3)),
        mean=rng.normal(size=4),
        variance=0.5 + rng.uniform(size=4),
    )
    op = measured_operator(op, params)
    coloring = coloring_for(op.offsets, op.vshape)
    pre = SORSmoother(op, 1.0, 1, FORWARD, coloring)
    post = SORSmoother(op, 1.0, 1, BACKWARD, coloring)
    fused_dense = FusedVisitLevel(op, coloring, 1.0, pre.order, post.order,
                                  pre.B_bar, post.B_bar, coarse_scaling=0.5,
                                  interpret=True)
    plan = _forced_sparse_plan(op, 1.0)
    assert len(plan["sparse_B"]) == 4  # 3 index arrays + values
    fused_sp = FusedVisitLevel(op, coloring, 1.0, pre.order, post.order,
                               pre.B_bar, post.B_bar, coarse_scaling=0.5,
                               interpret=True, plan=plan)
    assert fused_sp._sparse_nz == 1
    C = 4
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)

    dx, dc = fused_dense.descend(jax.random.key(0), f, x, noise=False)
    sx, sc = fused_sp.descend(jax.random.key(0), f, x, noise=False)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(dx), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(dc), rtol=1e-6, atol=1e-6)
    exp_x = pre.apply(f, x)
    exp_r = f - op.apply(exp_x)
    exp_c = restrict(exp_r, dim=3) if fused_sp.fuse_transfers else exp_r
    np.testing.assert_allclose(np.asarray(sx), np.asarray(exp_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(exp_c), rtol=2e-5, atol=2e-5)

    from multigridmc_tpu.ops.intergrid import prolongate

    vc = tuple(m // 2 for m in op.vshape)
    xc = jnp.asarray(rng.normal(size=(C,) + vc), jnp.float32)
    arg = xc if fused_sp.fuse_transfers else prolongate(xc, op.vshape)
    da = fused_dense.ascend(jax.random.key(0), f, x, arg, noise=False)
    sa = fused_sp.ascend(jax.random.key(0), f, x, arg, noise=False)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(da), rtol=1e-6, atol=1e-6)
    exp_a = post.apply(f, prolongate_add(0.5, xc, x, dim=3))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(exp_a), rtol=2e-5, atol=2e-5)


def test_compression_disabled_matches(monkeypatch):
    """MGMC_VISIT_COMPRESS=0 (resident planes for everything) is elementwise
    identical to the compressed default."""
    op, pre, post, fused_c = _setup(lowrank=True)
    assert fused_c.const_coeffs is not None and fused_c.ns_const is not None
    monkeypatch.setenv("MGMC_VISIT_COMPRESS", "0")
    fused_u = FusedVisitLevel(
        op, pre.coloring, 1.0, pre.order, post.order, pre.B_bar, post.B_bar,
        coarse_scaling=0.75, interpret=True,
    )
    assert fused_u.const_coeffs is None and fused_u.ns_const is None
    rng = np.random.default_rng(12)
    C = 4
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + op.vshape), jnp.float32)
    cx, cfc = fused_c.descend(jax.random.key(0), f, x, noise=False)
    ux, ufc = fused_u.descend(jax.random.key(0), f, x, noise=False)
    # baked scalars reassociate the f32 arithmetic slightly (multiply by a
    # splat plane vs a scalar constant) - equal to f32 rounding, not bitwise
    np.testing.assert_allclose(np.asarray(cx), np.asarray(ux),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cfc), np.asarray(ufc),
                               rtol=1e-5, atol=1e-6)


def test_compression_validation_errors():
    """Advisor r3: passing the full unfiltered coeffs array alongside
    const_coeffs must raise, as must malformed sparse triplets / 3d sparse."""
    from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import (
        descend_visit,
        supports_visit,
    )

    op, pre, _, fused = _setup(lowrank=False)
    assert fused._coeffs_k is None  # all planes baked constant
    rng = np.random.default_rng(13)
    f = jnp.asarray(rng.normal(size=op.vshape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4,) + op.vshape), jnp.float32)
    with pytest.raises(ValueError, match="pass coeffs=None"):
        descend_visit(
            jax.random.key(0), op.coeffs, None, None, None, None,
            fused.Rh, fused.RwT, f, x,
            orders=fused.pre_orders, noise=False, **fused._statics,
        )
    # sparse synthesis covers 3d too (round 5); malformed tuples still raise
    assert supports_visit((8, 8, 8), jnp.float32, 7, 2, 4, sparse_B=True)
    sp2 = _forced_sparse_plan(_setup(lowrank=True)[0], 1.0)["sparse_B"]
    op2, pre2, _, fused2 = _setup(lowrank=True)
    with pytest.raises(ValueError, match="index arrays"):
        descend_visit(
            jax.random.key(0), fused2._coeffs_k, None, sp2[:2], fused2.Bbar_pre,
            (fused2.lr_scale, fused2.sigma_inv, fused2.G_pre),
            fused2.Rh, fused2.RwT, f, x,
            orders=fused2.pre_orders, noise=False,
            **{**fused2._statics, "sparse_nz": 1},
        )


def test_supports_visit_1023_with_compression():
    """VERDICT r4 #1 gate: the compressed 1023^2 m=8 SOR level must be
    admitted by the production accounting (measured 12-plane per-chain
    budget; hardware-verified by native/probe_visit_1024_tpu.py), while the
    uncompressed plan must still be rejected."""
    from multigridmc_tpu.ops.kernels.mgmc_visit_pallas import supports_visit

    v = (1023, 1023)
    assert supports_visit(v, jnp.float32, 5, 8, 16, n_dirs=1) is None
    bc = supports_visit(v, jnp.float32, 5, 8, 16, n_dirs=1,
                        n_var_coeffs=0, ns_const=True, sparse_B=True)
    assert bc == 1
