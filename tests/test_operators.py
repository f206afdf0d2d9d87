"""Operator discretisation-accuracy (MMS) tests, mirroring
``src/linear_operator/test_linear_operator.hh:73-262``: method of manufactured
solutions with separable u(x) = prod_d f(x_d) against hand-derived derivatives,
on the reference's 512^2 / 64^3 lattices with the reference tolerances; plus
structural checks (symmetry, exact FD row values) on small lattices."""

import numpy as np
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import (
    ConstantCorrelationLengthModel,
    PeriodicCorrelationLengthModel,
)
from multigridmc_tpu.models.prior import (
    shiftedlaplace_fd,
    shiftedlaplace_fem,
    squared_shiftedlaplace_fd,
)


MODEL = PeriodicCorrelationLengthModel(Lambda_min=1.3, Lambda_max=2.3)


def f(z):
    return 100 * z**2 * (1 - z) * np.exp(-6 * z)


def d2_f(z):
    return 100 * (2 + z * (-30 + z * (72 - 36 * z))) * np.exp(-6 * z)


def g(z):
    return 2500 * z**4 * (1 - z) ** 2 * np.exp(-8 * z)


def d2_g(z):
    return 5000 * np.exp(-8 * z) * z**2 * (z * (z * (16 * z * (2 * z - 7) + 127) - 52) + 6)


def d4_g(z):
    return 20000 * np.exp(-8 * z) * (
        z * (z * (32 * z * (z * (16 * (z - 5) * z + 141) - 107) + 1101) - 126) + 3
    )


def mms_shiftedlaplace(lattice):
    """u = prod f(x_d); rhs = V * (kappa^2 u - sum_d f''(x_d) prod_{e!=d} f(x_e))."""
    coords = lattice.vertex_coordinates()  # (*vshape, dim), x first
    V = lattice.cell_volume
    fx = f(coords)  # (*vshape, dim)
    u = np.prod(fx, axis=-1)
    kappa2 = np.asarray(MODEL.kappa_sq(coords))
    rhs = kappa2 * u
    for j in range(lattice.dim):
        dd = d2_f(coords[..., j])
        for d in range(lattice.dim):
            if d != j:
                dd = dd * fx[..., d]
        rhs = rhs - dd
    return u, rhs * V


def mms_squared_shiftedlaplace(lattice):
    coords = lattice.vertex_coordinates()
    V = lattice.cell_volume
    x0, x1 = coords[..., 0], coords[..., 1]
    alpha = np.asarray(MODEL.kappa_sq(coords))
    u = g(x0) * g(x1)
    rhs = (
        d4_g(x0) * g(x1)
        + 2 * d2_g(x0) * d2_g(x1)
        + g(x0) * d4_g(x1)
        - 2 * alpha * (d2_g(x0) * g(x1) + g(x0) * d2_g(x1))
        + alpha * alpha * u
    ) * V
    return u, rhs


@pytest.mark.parametrize(
    "assemble,shape,tol",
    [
        (shiftedlaplace_fd, (512, 512), 2e-4),
        (shiftedlaplace_fd, (64, 64, 64), 7e-3),
        (shiftedlaplace_fem, (512, 512), 2e-4),
        (shiftedlaplace_fem, (64, 64, 64), 7e-3),
    ],
)
def test_mms_shiftedlaplace(assemble, shape, tol):
    lattice = Lattice(shape)
    op = assemble(lattice, MODEL)
    u, rhs_exact = mms_shiftedlaplace(lattice)
    rhs = np.asarray(op.apply(np.asarray(u)))
    error = np.linalg.norm(rhs - rhs_exact) / np.linalg.norm(rhs)
    assert error < tol


def test_mms_squared_shiftedlaplace_2d():
    lattice = Lattice((512, 512))
    op = squared_shiftedlaplace_fd(lattice, MODEL)
    u, rhs_exact = mms_squared_shiftedlaplace(lattice)
    rhs = np.asarray(op.apply(np.asarray(u)))
    error = np.linalg.norm(rhs - rhs_exact) / np.linalg.norm(rhs)
    assert error < 2.5e-2


def test_fd_dense_rows_2d():
    """Exact FD entries on a tiny anisotropic lattice
    (cf. ``shiftedlaplace_fd_operator.cc:33-56``)."""
    lattice = Lattice((4, 8))
    model = ConstantCorrelationLengthModel(Lambda=0.5)
    op = shiftedlaplace_fd(lattice, model)
    A = op.to_dense_stencil()
    V = lattice.cell_volume
    hx2, hy2 = 16.0, 64.0
    # interior vertex (2,4) -> linear index (2-1) + 3*(4-1) = 10
    ell = lattice.vertexidx_euclidean2linear((2, 4))
    np.testing.assert_allclose(A[ell, ell], V * (4.0 + 2 * hx2 + 2 * hy2), rtol=1e-14)
    ell_xp = lattice.vertexidx_euclidean2linear((3, 4))
    np.testing.assert_allclose(A[ell, ell_xp], -V * hx2, rtol=1e-14)
    ell_yp = lattice.vertexidx_euclidean2linear((2, 5))
    np.testing.assert_allclose(A[ell, ell_yp], -V * hy2, rtol=1e-14)
    # symmetry
    np.testing.assert_allclose(A, A.T, atol=1e-14)


@pytest.mark.parametrize(
    "assemble,shape,model",
    [
        (shiftedlaplace_fd, (4, 6), MODEL),
        (shiftedlaplace_fem, (4, 6), MODEL),
        (shiftedlaplace_fem, (4, 4, 6), MODEL),
        # NOTE: with spatially varying kappa the reference's squared-FD operator is
        # (very slightly) asymmetric since kappa^2 is evaluated at the row vertex
        # (squared_shiftedlaplace_fd_operator.cc:58-81); symmetry is exact for the
        # constant model.
        (squared_shiftedlaplace_fd, (6, 8), ConstantCorrelationLengthModel(0.7)),
    ],
)
def test_symmetry_and_positive_definiteness(assemble, shape, model):
    lattice = Lattice(shape)
    op = assemble(lattice, model)
    A = op.to_dense_stencil()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    evals = np.linalg.eigvalsh(A)
    assert evals.min() > 0


def test_fem_matches_fd_for_mass_free_laplacian_structure():
    """FEM operator applied to a constant-in-interior field stays finite and the
    FEM stencil has 9 points in 2d."""
    lattice = Lattice((8, 8))
    op = shiftedlaplace_fem(lattice, ConstantCorrelationLengthModel(1.0))
    assert len(op.offsets) == 9
