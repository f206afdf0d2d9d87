"""Parity-packed red-black sweep: exact equivalence with the masked sweep."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import (
    ConstantCorrelationLengthModel,
    PeriodicCorrelationLengthModel,
)
from multigridmc_tpu.models.prior import shiftedlaplace_fd, shiftedlaplace_fem
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.ops.rb_packed import (
    pack,
    pack_operator,
    packed_sor_sweep_field,
    supports_packed,
    unpack,
)
from multigridmc_tpu.smoothers import sor_sweep


def test_supports_policy():
    lat = Lattice((16, 16))
    fd = shiftedlaplace_fd(lat, ConstantCorrelationLengthModel(0.2))
    fem = shiftedlaplace_fem(lat, ConstantCorrelationLengthModel(0.2))
    assert supports_packed(fd)
    assert not supports_packed(fem)  # diagonal couplings -> not RB


@pytest.mark.parametrize("shape", [(16, 16), (16, 12), (8, 16)])
def test_pack_unpack_roundtrip(shape):
    lat = Lattice(shape)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=lat.vshape))
    q = pack(x, lat.vshape)
    np.testing.assert_array_equal(np.asarray(unpack(q, lat.vshape)), np.asarray(x))
    # batched
    xb = jnp.asarray(rng.normal(size=(3,) + lat.vshape))
    qb = pack(xb, lat.vshape)
    assert qb.shape[:1] == (3,)
    np.testing.assert_array_equal(np.asarray(unpack(qb, lat.vshape)), np.asarray(xb))


@pytest.mark.parametrize("shape", [(16, 16), (16, 12), (10, 8)])
@pytest.mark.parametrize("order", [(0, 1), (1, 0)], ids=["fwd", "bwd"])
@pytest.mark.parametrize("omega", [1.0, 0.8])
def test_packed_sweep_matches_masked(shape, order, omega):
    lat = Lattice(shape)
    op = shiftedlaplace_fd(lat, PeriodicCorrelationLengthModel(1.2, 2.3))
    coloring = coloring_for(op.offsets, op.vshape)
    assert coloring.n_colors == 2
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    pop = pack_operator(op)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=op.vshape))
    x = jnp.asarray(rng.normal(size=op.vshape))
    expected = sor_sweep(op, masks, omega, order, b, x)
    out = packed_sor_sweep_field(op, pop, omega, order, b, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-12, atol=1e-13)


def test_packed_sweep_batched():
    lat = Lattice((16, 16))
    op = shiftedlaplace_fd(lat, ConstantCorrelationLengthModel(0.3))
    coloring = coloring_for(op.offsets, op.vshape)
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    pop = pack_operator(op)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=(4,) + op.vshape))
    x = jnp.asarray(rng.normal(size=(4,) + op.vshape))
    expected = sor_sweep(op, masks, 1.0, (0, 1), b, x)
    out = packed_sor_sweep_field(op, pop, 1.0, (0, 1), b, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-12, atol=1e-13)
