"""Lattice index-algebra tests, mirroring ``src/lattice/test_lattice.hh:35-242``:
exact linear<->Euclidean conversions, coordinates, fine/coarse correspondence and
coarsening rules on small anisotropic lattices."""

import numpy as np
import pytest

from multigridmc_tpu.lattice import Lattice


def test_vshape_and_counts_2d():
    lat = Lattice((4, 6))
    assert lat.dim == 2
    assert lat.vshape == (5, 3)  # (ny-1, nx-1)
    assert lat.nvertex == 15
    assert lat.ncell == 24
    assert lat.h == (0.25, 1.0 / 6.0)
    assert np.isclose(lat.cell_volume, 0.25 / 6.0)


def test_linear_euclidean_roundtrip_2d():
    lat = Lattice((4, 6))
    # reference lexicographic: x fastest
    assert lat.vertexidx_linear2euclidean(0) == (1, 1)
    assert lat.vertexidx_linear2euclidean(1) == (2, 1)
    assert lat.vertexidx_linear2euclidean(3) == (1, 2)
    for ell in range(lat.nvertex):
        p = lat.vertexidx_linear2euclidean(ell)
        assert lat.vertexidx_euclidean2linear(p) == ell


def test_linear_euclidean_roundtrip_3d():
    lat = Lattice((4, 6, 8))
    assert lat.vshape == (7, 5, 3)
    for ell in range(0, lat.nvertex, 7):
        p = lat.vertexidx_linear2euclidean(ell)
        assert lat.vertexidx_euclidean2linear(p) == ell
    # x fastest, then y, then z
    assert lat.vertexidx_linear2euclidean(3) == (1, 2, 1)
    assert lat.vertexidx_linear2euclidean(15) == (1, 1, 2)


def test_vertex_coordinates_match_linear_ordering():
    lat = Lattice((4, 6))
    coords = lat.vertex_coordinates().reshape(-1, 2)
    for ell in range(lat.nvertex):
        p = lat.vertexidx_linear2euclidean(ell)
        expected = np.array([p[0] / 4.0, p[1] / 6.0])
        np.testing.assert_allclose(coords[ell], expected, rtol=1e-14)


def test_cell_index_roundtrip():
    lat = Lattice((4, 6))
    for ell in range(lat.ncell):
        p = lat.cellidx_linear2euclidean(ell)
        assert lat.cellidx_euclidean2linear(p) == ell


def test_coarsening():
    lat = Lattice((8, 4))
    c = lat.coarsen()
    assert c.shape == (4, 2)
    assert not c.coarsenable  # extent 2 < 4
    with pytest.raises(ValueError):
        c.coarsen()
    with pytest.raises(ValueError):
        Lattice((5, 4)).coarsen()  # odd extent


def test_hierarchy():
    lat = Lattice((32, 32))
    levels = lat.hierarchy(4)
    assert [l.shape for l in levels] == [(32, 32), (16, 16), (8, 8), (4, 4)]


def test_fine_vertex_idx():
    lat = Lattice((8,))
    # coarse interior index i -> fine interior index 2i+1 (lattice1d.hh:145-148)
    assert lat.fine_vertex_idx((0,)) == (1,)
    assert lat.fine_vertex_idx((2,)) == (5,)
