"""Platform scaling control: pure-compute Ray tasks, no Ray Data, no shuffle.

128 independent tasks each doing a fixed cache-resident BLAS workload
(600x600 matmul x60) — embarrassingly parallel, zero data movement. The
wall-clock ratio between two ``num_cpus`` levels is therefore the ceiling
the VM itself delivers for ANY workload; an engine pipeline cannot scale
better than this control on the same host.

Usage: python tools/cpu_control_probe.py [N M ...]   (default: 4 16 8 32)

Measured 2026-08-17 on the shared bench VM (fresh processes, interleaved;
two runs per level):
  4 -> 16: 57.5s / 16.0s = 3.59x  -> 0.90 efficiency
  8 -> 32: 32.5s / 12.4s = 2.62x  -> 0.66 efficiency  (the 16 -> 32 step
  yields only 1.29x even for pure BLAS — beyond ~16-20 effective cores the
  VM has no additional real CPU to give)

So on this host the >= 0.8 N -> 4N criterion is only *measurable* at
4 -> 16; at 8 -> 32 the platform ceiling is ~0.65-0.66 and the engine's
kg_pipeline measures 0.65 (~the ceiling).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def run_level(n: int) -> float:
    code = (
        "import sys, time\n"
        "import ray\n"
        f"ray.init(address='local', num_cpus={n}, include_dashboard=False, logging_level='ERROR')\n"
        "import numpy as np\n"
        "@ray.remote\n"
        "def work(seed):\n"
        "    rng = np.random.default_rng(seed)\n"
        "    a = rng.random((600, 600))\n"
        "    s = 0.0\n"
        "    for _ in range(60):\n"
        "        s += float(np.linalg.norm(a @ a))\n"
        "    return s\n"
        "t0 = time.time()\n"
        "ray.get([work.remote(i) for i in range(128)])\n"
        "print(time.time() - t0)\n"
        "ray.shutdown()\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"control probe failed at num_cpus={n} (stderr above)")
    return float(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [4, 16, 8, 32]
    walls = {n: run_level(n) for n in levels}
    result: dict = {"metric": "platform_control", "walls_sec": walls}
    pairs = []
    for lo in levels:
        for hi in levels:
            if hi == 4 * lo and lo in walls and hi in walls:
                eff = (walls[lo] / walls[hi]) / 4
                pairs.append({"pair": f"{lo}->{hi}", "speedup": round(walls[lo] / walls[hi], 3), "efficiency": round(eff, 3)})
    result["pairs"] = pairs
    print(json.dumps(result))


if __name__ == "__main__":
    main()
