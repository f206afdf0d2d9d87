"""Quadrature exactness tests, mirroring ``src/auxilliary/test_quadrature.hh:53-77``:
order-n Gauss-Legendre integrates monomials up to degree 2n+1 exactly in 3d."""

import itertools

import numpy as np
import pytest

from multigridmc_tpu.ops.quadrature import gauss_legendre


@pytest.mark.parametrize("order", [0, 1, 2])
def test_monomial_exactness_3d(order):
    points, weights = gauss_legendre(3, order)
    max_deg = 2 * order + 1
    for degs in itertools.product(range(max_deg + 1), repeat=3):
        vals = np.prod(points**np.array(degs), axis=1)
        approx = weights @ vals
        exact = np.prod([1.0 / (d + 1) for d in degs])
        np.testing.assert_allclose(approx, exact, rtol=1e-12, atol=1e-14)


def test_weights_sum_to_volume():
    for dim in (1, 2, 3):
        for order in (0, 1, 2):
            _, w = gauss_legendre(dim, order)
            np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-14)
