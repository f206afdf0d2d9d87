"""Validate the native C++ reference-equivalent baseline statistically.

Exports a small 2d posterior hierarchy, compiles ``native/baseline_mgmc.cc``,
runs many samples, and checks the chain mean of the central-vertex observation
against the exact posterior mean - the same oracle as the sampler tests."""

import json
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from multigridmc_tpu.lattice import Lattice
from multigridmc_tpu.models.correlation import ConstantCorrelationLengthModel
from multigridmc_tpu.models.posterior import MeasurementParameters, measured_operator
from multigridmc_tpu.models.prior import shiftedlaplace_fd
from multigridmc_tpu.solvers.multigrid import MultigridHierarchy
from multigridmc_tpu.utils.baseline_export import export_problem, stencil_to_csr, transfer_to_csr

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")


def make_problem():
    lattice = Lattice((16, 16))
    prior = shiftedlaplace_fd(lattice, ConstantCorrelationLengthModel(0.2))
    rng = np.random.default_rng(3)
    params = MeasurementParameters(
        measurement_locations=rng.uniform(0.2, 0.8, size=(4, 2)),
        mean=rng.normal(size=4),
        variance=0.05 * (1 + rng.uniform(size=4)),
    )
    return measured_operator(prior, params)


def test_csr_export_matches_dense():
    op = make_problem()
    A = stencil_to_csr(op).toarray()
    np.testing.assert_allclose(A, op.to_dense_stencil(), rtol=1e-12, atol=1e-14)


def test_transfer_export_matches_operator():
    import jax.numpy as jnp

    from multigridmc_tpu.ops.intergrid import prolongate

    fine = Lattice((16, 16))
    coarse = fine.coarsen()
    P = transfer_to_csr(fine.vshape, coarse.vshape)
    rng = np.random.default_rng(0)
    xc = rng.normal(size=coarse.vshape)
    expected = np.asarray(prolongate(jnp.asarray(xc), fine.vshape)).reshape(-1)
    np.testing.assert_allclose(P @ xc.reshape(-1), expected, rtol=1e-12)


def test_baseline_binary_statistics(tmp_path):
    """The C++ MGMC chain reproduces the exact mean of f = Q u (u uniform,
    matching the binary's built-in rhs), cf. the 'acc' output field."""
    op = make_problem()
    hierarchy = MultigridHierarchy(op, 3)
    problem = tmp_path / "problem.bin"
    export_problem(hierarchy, str(problem), omega=1.0, cycle=2)

    binary = tmp_path / "baseline_mgmc"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", str(binary), str(REPO / "native" / "baseline_mgmc.cc")],
        check=True,
    )
    out = subprocess.run(
        [str(binary), str(problem), "200", "40000", str(tmp_path / "dump")],
        check=True, capture_output=True, text=True, timeout=300,
    )
    result = json.loads(out.stdout.strip())
    n = op.lattice.nvertex
    assert result["n"] == n
    assert result["ms_per_sample"] > 0

    # the binary dumps its rhs f and the chain mean: compare against the exact
    # stationary mean Q^{-1} f (same oracle as the sampler tests)
    f = np.fromfile(tmp_path / "dump_f.bin", dtype=np.float64)
    chain_mean = np.fromfile(tmp_path / "dump_mean.bin", dtype=np.float64)
    Q = op.to_dense()
    mean_exact = np.linalg.solve(Q, f)
    err = np.max(np.abs(chain_mean - mean_exact))
    assert err < 2e-2, f"chain mean error {err}"
