"""Run the autotune probe functions on real hardware once (VERDICT r4 #6).

``utils/autotune._lookup`` short-circuits to the ``_KNOWN`` table on v5e, so
the probe functions (the code path that will run on the next chip
generation) had only ever executed under test monkeypatching.  This script
calls them directly on the real chip and checks they reproduce the shipped
values (fused_min_vertices=40000, distill_max_n=4160 on v5e); the result is
recorded in BASELINE.md and the cache JSON is committed as a fixture.

Run as the sole TPU client: python native/validate_autotune_probes_tpu.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    from multigridmc_tpu.utils.runtime import configure_runtime

    configure_runtime(default_x64=False)
    import jax

    from multigridmc_tpu.utils import autotune

    kind = jax.devices()[0].device_kind.lower()
    known = {}
    for name, vals in autotune._KNOWN.items():
        if name in kind:
            known = vals
            break
    print(f"device kind: {kind}; _KNOWN entry: {known or 'NONE'}",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    fmv = autotune.probe_fused_min_vertices()
    t_fmv = time.perf_counter() - t0
    print(f"probe_fused_min_vertices -> {fmv}  ({t_fmv:.0f} s)",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    dmn = autotune.probe_distill_max_n()
    t_dmn = time.perf_counter() - t0
    print(f"probe_distill_max_n -> {dmn}  ({t_dmn:.0f} s)",
          file=sys.stderr, flush=True)

    result = {
        "device_kind": kind,
        "probe_fused_min_vertices": fmv,
        "probe_distill_max_n": dmn,
        "known_fused_min_vertices": known.get("fused_min_vertices"),
        "known_distill_max_n": known.get("distill_max_n"),
        "probes_match_known": (fmv == known.get("fused_min_vertices")
                               and dmn == known.get("distill_max_n")),
        "probe_seconds": round(t_fmv + t_dmn, 1),
    }
    print(json.dumps(result))
    # cache fixture for the repo (what an unknown chip generation would write)
    fix = REPO / "native" / "autotune_probe_fixture.json"
    fix.write_text(json.dumps({kind: {
        "fused_min_vertices": fmv, "distill_max_n": dmn}}, indent=1))
    print(f"fixture written: {fix}", file=sys.stderr)


if __name__ == "__main__":
    main()
