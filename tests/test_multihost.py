"""Multi-process distributed backend test: runs native/dryrun_multihost.py
(2 localhost processes x 4 virtual CPU devices, gloo collectives) as a
subprocess and asserts the cross-process explicit-halo MGMC cycle matches the
single-device reference.  Exercises ``init_distributed`` and
``multihost_lattice_mesh`` (parallel/mesh.py) - the layer a single-process
test suite cannot reach."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_dryrun_multihost():
    out = subprocess.run(
        [sys.executable, str(REPO / "native" / "dryrun_multihost.py")],
        cwd=str(REPO), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "dryrun_multihost: OK" in out.stdout
    assert "proc 0: OK" in out.stdout and "proc 1: OK" in out.stdout
