"""Problem-size scaling rows for BASELINE.md: the flagship MGMC bench at
NX other than 256 (512^2, 1024^2), same protocol as bench.py (two-length
slope timing, CPU/f64 native baseline cached per size).

Usage: python native/bench_scaling_tpu.py NX NLEVEL NCHAINS [n1 n2]

Round-2 context: at 1024^2 the finest level ran COMPOSED (fused-visit VMEM
gate) and the row read 523x.  Round 4's resident-set compression + measured
per-chain budget admit the 1023^2 fused level at the default VMEM limit;
this script measures the recovered row end-to-end.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    nx, nlevel, nchains = (int(a) for a in sys.argv[1:4])
    rest = [int(a) for a in sys.argv[4:6]]
    n1, n2 = rest if rest else (10, 40)

    import os

    os.environ.setdefault("MGMC_X64", "0")
    from multigridmc_tpu.utils.runtime import configure_runtime

    configure_runtime(default_x64=False)
    import bench as benchmod

    benchmod.NX = nx
    benchmod.NLEVEL = nlevel
    benchmod.NCHAINS = nchains
    benchmod.NSTEPS_BATCHED = (n1, n2)
    benchmod.BASELINE_CACHE = REPO / f"BASELINE_MEASURED_{nx}.json"

    baseline = None
    try:
        baseline = benchmod.measure_baseline()
    except Exception as e:
        print(f"# baseline failed: {e}", file=sys.stderr)
    tpu = benchmod.measure_tpu()
    value = tpu["batched_samples_per_sec"]
    vs = (value / baseline["samples_per_sec"]
          if baseline and baseline.get("samples_per_sec") else None)
    print(json.dumps({
        "metric": f"mgmc_samples_per_sec_{nx}",
        "value": round(value, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "problem": f"2d {nx}x{nx} posterior, {nlevel}-level W-cycle, SOR",
            "tpu": {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in tpu.items()},
            "baseline_cpu": baseline,
        },
    }))


if __name__ == "__main__":
    main()
