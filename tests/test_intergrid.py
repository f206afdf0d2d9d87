"""Intergrid algebraic-identity tests, mirroring
``src/intergrid/test_intergrid.hh:87-207``: prolongation equals hand-rolled
linear interpolation, <P x_c, r> = <x_c, R r> adjointness, and Galerkin
consistency (coarsened constant-coefficient FEM operator equals the operator
natively assembled on the coarse lattice)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.prior import shiftedlaplace_fem
from multigridmc_tpu.ops.coarsen import galerkin_coarsen
from multigridmc_tpu.ops.intergrid import prolongate, prolongate_add, restrict


def test_prolongation_matches_linear_interpolation_1d():
    lat = Lattice((8,))
    coarse = lat.coarsen()
    rng = np.random.default_rng(0)
    xc = rng.normal(size=coarse.vshape)
    xf = np.asarray(prolongate(jnp.asarray(xc), lat.vshape))
    # hand-rolled: coarse interior i at fine 2i+1; even fine points are averages
    xc_pad = np.concatenate([[0.0], xc, [0.0]])  # boundary values are zero
    for i_f in range(lat.vshape[0]):
        if i_f % 2 == 1:
            expected = xc_pad[(i_f - 1) // 2 + 1]
        else:
            expected = 0.5 * (xc_pad[i_f // 2] + xc_pad[i_f // 2 + 1])
        np.testing.assert_allclose(xf[i_f], expected, rtol=1e-12, atol=1e-15)


def test_prolongation_matches_bilinear_interpolation_2d():
    lat = Lattice((4, 4))
    coarse = lat.coarsen()
    rng = np.random.default_rng(1)
    xc = rng.normal(size=coarse.vshape)
    xf = np.asarray(prolongate(jnp.asarray(xc), lat.vshape))
    # pad coarse with zero boundary: coarse grid incl. boundary has (n/2+1)^2 points
    nc = coarse.vshape[0]
    xc_pad = np.zeros((nc + 2, nc + 2))
    xc_pad[1:-1, 1:-1] = xc
    # fine vertex (i,j) at coordinate ((j+1)h, (i+1)h) interpolates the coarse field
    for i in range(lat.vshape[0]):
        for j in range(lat.vshape[1]):
            # coarse-grid coordinates of the fine vertex (units of coarse h)
            yc = (i + 1) / 2.0
            xco = (j + 1) / 2.0
            i0, j0 = int(np.floor(yc)), int(np.floor(xco))
            di, dj = yc - i0, xco - j0
            expected = (
                (1 - di) * (1 - dj) * xc_pad[i0, j0]
                + (1 - di) * dj * xc_pad[i0, j0 + 1]
                + di * (1 - dj) * xc_pad[i0 + 1, j0]
                + di * dj * xc_pad[i0 + 1, j0 + 1]
            )
            np.testing.assert_allclose(xf[i, j], expected, rtol=1e-13, atol=1e-14)


@pytest.mark.parametrize("shape", [(8,), (8, 4), (4, 4, 8)])
def test_adjointness(shape):
    """<P x_c, r>_fine = <x_c, R r>_coarse (test_intergrid.hh:155-171)."""
    lat = Lattice(shape)
    coarse = lat.coarsen()
    rng = np.random.default_rng(2)
    xc = jnp.asarray(rng.normal(size=coarse.vshape))
    r = jnp.asarray(rng.normal(size=lat.vshape))
    lhs = float(jnp.vdot(prolongate(xc, lat.vshape), r))
    rhs = float(jnp.vdot(xc, restrict(r)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_prolongate_add_scaling():
    lat = Lattice((8, 8))
    coarse = lat.coarsen()
    rng = np.random.default_rng(3)
    xc = jnp.asarray(rng.normal(size=coarse.vshape))
    xf = jnp.asarray(rng.normal(size=lat.vshape))
    out = prolongate_add(0.75, xc, xf)
    expected = xf + 0.75 * prolongate(xc, lat.vshape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-14)


@pytest.mark.parametrize("shape", [(8, 8), (4, 4, 4)])
def test_galerkin_consistency_fem(shape):
    """Coarsening the constant-kappa FEM operator reproduces the natively
    assembled coarse-lattice operator (test_intergrid.hh:179-207)."""
    lat = Lattice(shape)
    model = ConstantCorrelationLengthModel(Lambda=0.5)
    fine_op = shiftedlaplace_fem(lat, model)
    coarse_via_galerkin = galerkin_coarsen(fine_op)
    coarse_native = shiftedlaplace_fem(lat.coarsen(), model)
    A_g = coarse_via_galerkin.to_dense_stencil()
    A_n = coarse_native.to_dense_stencil()
    np.testing.assert_allclose(A_g, A_n, rtol=1e-11, atol=1e-12)


def test_galerkin_probing_matches_explicit_rap():
    """The probed coarse stencil equals the dense R A P product exactly."""
    lat = Lattice((8, 6))
    model = ConstantCorrelationLengthModel(Lambda=0.3)
    op = shiftedlaplace_fem(lat, model)
    coarse = galerkin_coarsen(op)
    # dense RAP via operator application on basis vectors
    nc = coarse.lattice.nvertex
    eye = jnp.eye(nc).reshape((nc,) + coarse.lattice.vshape)
    rap = jax.vmap(lambda v: restrict(op.apply(prolongate(v, lat.vshape))))(eye)
    A_rap = np.asarray(rap.reshape(nc, nc)).T
    np.testing.assert_allclose(coarse.to_dense_stencil(), A_rap, rtol=1e-12, atol=1e-13)


def test_batched_intergrid():
    lat = Lattice((8, 8))
    coarse = lat.coarsen()
    rng = np.random.default_rng(4)
    xc = jnp.asarray(rng.normal(size=(5,) + coarse.vshape))
    out = prolongate(xc, lat.vshape)
    assert out.shape == (5,) + lat.vshape
    single = prolongate(xc[2], lat.vshape)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single), rtol=1e-14)
    rf = jnp.asarray(rng.normal(size=(5,) + lat.vshape))
    rc = restrict(rf, dim=2)
    assert rc.shape == (5,) + coarse.vshape
    np.testing.assert_allclose(np.asarray(rc[1]), np.asarray(restrict(rf[1])), rtol=1e-14)
