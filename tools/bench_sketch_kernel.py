"""Microbench: HLL grouped-sketch kernels vs the r3 per-key-object loops
(VERDICT r3 #2). Pure numpy/pyarrow, no Ray. Prints one JSON line.

Run: PYTHONPATH=/root/repo python tools/bench_sketch_kernel.py

Shapes measured:
- map side: 500k occurrence rows -> 60k group sketches (scalar (idx, rank)
  work per row — the vectorized sort+reduceat kernel wins big);
- reduce side: 200k sketch rows (4 KB each) -> 100k merged keys + estimates
  (row work is cache-resident — the scatter loop beats every full-matrix
  vectorized sweep; the estimate pass is element-bound either way).
"""

from __future__ import annotations

import json
import time

import numpy as np
import pyarrow as pa

from duke_ray.functions.sketch import (
    HLL,
    estimate_rows,
    grouped_registers,
    merge_grouped_registers,
    registers_from_binary,
)

P = 12
M = 1 << P


def bench_map_side() -> dict:
    n_rows, n_groups = 500_000, 60_000
    gen = np.random.Generator(np.random.Philox(key=5))
    h = gen.integers(0, 1 << 63, size=n_rows, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    codes = gen.integers(0, n_groups, size=n_rows)

    t0 = time.perf_counter()
    grouped_registers(h, codes, n_groups, P)
    t_new = time.perf_counter() - t0

    t0 = time.perf_counter()
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    starts = np.flatnonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))
    bounds = np.append(starts, len(sc))
    for s, e in zip(bounds[:-1], bounds[1:]):
        HLL(P).add_hashes(h[order[s:e]]).to_bytes()
    t_old = time.perf_counter() - t0
    return {"rows": n_rows, "groups": n_groups, "old_sec": round(t_old, 3),
            "new_sec": round(t_new, 3), "speedup": round(t_old / t_new, 1)}


def bench_reduce_side() -> dict:
    n_keys, rows_per = 100_000, 2
    gen = np.random.Generator(np.random.Philox(key=31))
    regs = gen.integers(0, 12, size=(rows_per * n_keys, M), dtype=np.uint8)
    codes = np.repeat(np.arange(n_keys), rows_per)
    perm = gen.permutation(len(regs))
    regs, codes = regs[perm], codes[perm]
    sk = pa.array([r.tobytes() for r in regs], pa.binary())

    t0 = time.perf_counter()
    R = registers_from_binary(sk, M)
    merged = merge_grouped_registers(R, codes, n_keys)
    est_new = np.rint(estimate_rows(merged)).astype(np.int64)
    t_new = time.perf_counter() - t0

    # r3 shape: to_pylist + from_bytes per row + per-key np.power estimate
    t0 = time.perf_counter()
    sketches = sk.to_pylist()
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    starts = np.flatnonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))
    bounds = np.append(starts, len(sc))
    est_old = np.empty(len(starts), np.int64)
    for gi, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        rows = order[s:e]
        h = HLL.from_bytes(sketches[rows[0]], P)
        for r in rows[1:]:
            h.merge(HLL.from_bytes(sketches[r], P))
        est_old[gi] = int(round(h.estimate()))
    t_old = time.perf_counter() - t0

    assert np.array_equal(np.sort(est_new), np.sort(est_old)), "estimate mismatch"
    return {"sketch_rows": rows_per * n_keys, "keys": n_keys,
            "old_sec": round(t_old, 3), "new_sec": round(t_new, 3),
            "speedup": round(t_old / t_new, 1)}


if __name__ == "__main__":
    print(json.dumps({
        "metric": "hll_kernel_microbench",
        "p": P,
        "map_side": bench_map_side(),
        "reduce_side": bench_reduce_side(),
    }))
