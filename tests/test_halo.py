"""Explicit shard_map halo-exchange sweep tests: equivalence with the global
multi-colour sweep on an 8-device mesh (the manual-communication groundwork for
multi-host scaling)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.prior import (
    shiftedlaplace_fd,
    shiftedlaplace_fem,
    squared_shiftedlaplace_fd,
)
from multigridmc_tpu.ops.coloring import coloring_for
from multigridmc_tpu.parallel.halo import halo_exchange, shard_map_sor_sweep
from multigridmc_tpu.parallel.mesh import lattice_mesh
from multigridmc_tpu.smoothers import sor_sweep

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_halo_exchange_matches_global_pad():
    """Gathered halo-padded blocks equal slices of the zero-padded global field."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import functools

    mesh = lattice_mesh(2, n_devices=8)  # ('ly', 'lx') = (4, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 64)))
    pad = 1

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("ly", "lx"),), out_specs=P("ly", "lx")
    )
    def get_halo(xl):
        xp = halo_exchange(xl, pad, ("ly", "lx"))
        # return the interior of the padded block (identity) to prove shapes,
        # plus fold halo contributions through a 5-point sum for content
        return (
            xp[1:-1, 1:-1]
            + xp[:-2, 1:-1]
            + xp[2:, 1:-1]
            + xp[1:-1, :-2]
            + xp[1:-1, 2:]
        )

    out = get_halo(x)
    xpad = jnp.pad(x, 1)
    expected = (
        xpad[1:-1, 1:-1] + xpad[:-2, 1:-1] + xpad[2:, 1:-1] + xpad[1:-1, :-2] + xpad[1:-1, 2:]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-13)


@pytest.mark.parametrize(
    "assemble,pad",
    [
        (shiftedlaplace_fd, 1),
        (shiftedlaplace_fem, 1),
        # 13-point biharmonic stencil: width-2 halos
        # (squared_shiftedlaplace_fd_operator.cc:58-94)
        (squared_shiftedlaplace_fd, 2),
    ],
)
def test_shard_map_sweep_matches_global(assemble, pad):
    """Explicit-halo colour sweep == global colour sweep (same splitting,
    including couplings across shard boundaries), width-1 and width-2 halos."""
    lattice = Lattice((65, 65))  # vshape (64, 64) divides the (4, 2) mesh
    op = assemble(lattice, ConstantCorrelationLengthModel(0.3))
    coloring = coloring_for(op.offsets, op.vshape)
    order = tuple(range(coloring.n_colors))
    masks = jnp.asarray(coloring.masks(), dtype=op.coeffs.dtype)
    mesh = lattice_mesh(2, n_devices=8)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=op.vshape))
    x = jnp.asarray(rng.normal(size=op.vshape))
    expected = sor_sweep(op, masks, 0.9, order, b, x)
    out = jax.jit(
        lambda b, x: shard_map_sor_sweep(op, coloring, 0.9, order, mesh, b, x)
    )(b, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("pad", [1, 2])
def test_halo_exchange_width(pad):
    """halo_exchange with width-2 halos (13-point biharmonic stencil) equals
    slicing the zero-padded global field."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import functools

    mesh = lattice_mesh(2, n_devices=8)  # ('ly', 'lx') = (4, 2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 64)))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("ly", "lx"),), out_specs=P("ly", "lx")
    )
    def padded(xl):
        # fold every halo entry into the block so content is verified, not
        # just shapes: sum over all shifts within the pad radius
        xp = halo_exchange(xl, pad, ("ly", "lx"))
        h, w = xl.shape
        out = jnp.zeros_like(xl)
        for dy in range(2 * pad + 1):
            for dx in range(2 * pad + 1):
                out = out + xp[dy:dy + h, dx:dx + w]
        return out

    out = padded(x)
    xpad = jnp.pad(x, pad)
    h, w = x.shape
    expected = sum(
        xpad[dy:dy + h, dx:dx + w]
        for dy in range(2 * pad + 1)
        for dx in range(2 * pad + 1)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-13)
