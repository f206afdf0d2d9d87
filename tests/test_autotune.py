"""Measured-crossover autotune (utils/autotune.py): lookup precedence.

The probe functions themselves are hardware measurements (exercised on TPU);
these tests gate the resolution logic: env override > known-chip table >
cached probe > probe (mocked) > static default, and CPU never probes.
"""

import json

import pytest

from multigridmc_tpu.utils import autotune
from multigridmc_tpu.samplers.distill import pick_distill_level


def test_cpu_returns_static_defaults(monkeypatch):
    monkeypatch.setattr(autotune, "_device_kind", lambda: None)
    assert autotune.fused_min_vertices() == 40000
    assert autotune.distill_max_n() == 4160


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("MGMC_FUSED_MIN_VERTICES", "123")
    monkeypatch.setenv("MGMC_DISTILL_MAX_N", "456")
    assert autotune.fused_min_vertices() == 123
    assert autotune.distill_max_n() == 456


def test_known_chip_table(monkeypatch):
    monkeypatch.setattr(autotune, "_device_kind", lambda: "tpu v5 lite0")
    calls = []
    monkeypatch.setattr(autotune, "probe_fused_min_vertices",
                        lambda: calls.append(1) or 0)
    assert autotune.fused_min_vertices() == 40000
    assert not calls  # known kind: never probes


def test_unknown_chip_probes_once_and_caches(monkeypatch, tmp_path):
    cache = tmp_path / "autotune.json"
    monkeypatch.setenv("MGMC_AUTOTUNE_CACHE", str(cache))
    monkeypatch.setattr(autotune, "_device_kind", lambda: "tpu v99")
    calls = []

    def fake_probe():
        calls.append(1)
        return 777

    monkeypatch.setattr(autotune, "probe_fused_min_vertices", fake_probe)
    assert autotune.fused_min_vertices() == 777
    assert autotune.fused_min_vertices() == 777  # served from cache
    assert len(calls) == 1
    assert json.loads(cache.read_text())["tpu v99"]["fused_min_vertices"] == 777

    # MGMC_AUTOTUNE=0: unknown chip falls back to the static default
    monkeypatch.setenv("MGMC_AUTOTUNE", "0")
    monkeypatch.setattr(autotune, "_device_kind", lambda: "tpu v100")
    assert autotune.fused_min_vertices() == 40000


def test_probe_failure_falls_back(monkeypatch, tmp_path):
    monkeypatch.setenv("MGMC_AUTOTUNE_CACHE", str(tmp_path / "c.json"))
    monkeypatch.setattr(autotune, "_device_kind", lambda: "tpu v98")

    def boom():
        raise RuntimeError("no device")

    monkeypatch.setattr(autotune, "probe_distill_max_n", boom)
    assert autotune.distill_max_n() == 4160


def test_pick_distill_level_uses_resolved_max_n(monkeypatch):
    """pick_distill_level with no explicit max_n resolves through autotune
    (CPU: static 4160 admits a 63^2 sub-level, rejects 127^2)."""
    class FakeOp:
        def __init__(self, nv):
            self.lattice = type("L", (), {"nvertex": nv})()

    ops = [FakeOp(255 * 255), FakeOp(127 * 127), FakeOp(63 * 63), FakeOp(31 * 31)]
    assert pick_distill_level(ops) == 2
    monkeypatch.setenv("MGMC_DISTILL_MAX_N", "20000")
    assert pick_distill_level(ops) == 1
