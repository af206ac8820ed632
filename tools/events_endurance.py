"""Event-analytics endurance: cohort_retention and funnel_over at 10M
events with answers recomputed independently in numpy from the same
splitmix rules (no reference engine).

Corpus: event i -> user = mix(i,1) % N_USERS, day offset = mix(i,2) % 30
(ts = epoch-anchored day + i-dependent second), stage type drawn from
{view, click, purchase, other} by mix(i,3) % 8 (view:3, click:2,
purchase:1, other:2 weights). The checker rebuilds the exact per-user
day sets and stage time sequences with vectorized numpy + lexsort —
cohort matrix and funnel prefix counts match cell-for-cell.

Fresh subprocess per (op, width); input materialized before the timer;
fixed 64-block budget.

Usage:
  EV_N=10000000 EV_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/events_endurance.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

N = int(os.environ.get("EV_N", 10_000_000))
N_USERS = int(os.environ.get("EV_USERS", 500_000))
DAYS = 30
BASE_US = 1_700_000_000_000_000 - (1_700_000_000_000_000 % 86_400_000_000)
DAY_US = 86_400_000_000
TYPES = np.array(["view", "view", "view", "click", "click", "purchase", "other", "other"])
STAGES = ("view", "click", "purchase")


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(salt * 0x9E3779B97F4A7C15 & (1 << 64) - 1)).astype(
            np.uint64
        )
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return z


def _fields(i: np.ndarray):
    user = (_mix(i, 1) % np.uint64(N_USERS)).astype(np.int64)
    day = (_mix(i, 2) % np.uint64(DAYS)).astype(np.int64)
    sec = (_mix(i, 4) % np.uint64(86_400)).astype(np.int64)
    ts_us = BASE_US + day * DAY_US + sec * 1_000_000
    ty_idx = (_mix(i, 3) % np.uint64(8)).astype(np.int64)
    return user, day, ts_us, ty_idx


def event_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    user, _day, ts_us, ty_idx = _fields(i)
    return pa.table(
        {
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(TYPES[ty_idx], pa.string()),
            "ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
        }
    )


def _expected_cohort() -> dict:
    i = np.arange(N, dtype=np.uint64)
    user, day, _ts, _ty = _fields(i)
    # distinct (user, day) pairs -> cohort = per-user min day
    key = user * DAYS + day
    uniq = np.unique(key)
    u, d = uniq // DAYS, uniq % DAYS
    order = np.lexsort((d, u))
    u, d = u[order], d[order]
    first = np.r_[True, u[1:] != u[:-1]]
    cohort = d[first][np.cumsum(first) - 1]
    key = cohort * 64 + (d - cohort)
    uk, counts = np.unique(key, return_counts=True)
    return {(int(k) // 64, int(k) % 64): int(n) for k, n in zip(uk, counts)}


def _expected_funnel() -> list:
    i = np.arange(N, dtype=np.uint64)
    user, _day, ts, ty_idx = _fields(i)
    # stage code: view=1, click=2, purchase=3, other=0
    stage = np.zeros(len(i), np.int8)
    stage[ty_idx <= 2] = 1
    stage[(ty_idx == 3) | (ty_idx == 4)] = 2
    stage[ty_idx == 5] = 3
    keep = stage > 0
    user, ts, stage = user[keep], ts[keep], stage[keep]
    order = np.lexsort((ts, user))
    u, t, st = user[order], ts[order], stage[order]
    new_seg = np.r_[True, u[1:] != u[:-1]]
    starts = np.flatnonzero(new_seg)
    seg_id = np.cumsum(new_seg) - 1
    BIG = np.iinfo(np.int64).max
    prev = np.full(starts.size, np.iinfo(np.int64).min, np.int64)
    counts = []
    for s in (1, 2, 3):
        v = np.where((st == s) & (t > prev[seg_id]), t, BIG)
        cur = np.minimum.reduceat(v, starts)
        counts.append(int((cur < BIG).sum()))
        prev = cur
    return counts


def run_once(op: str) -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.pipelines.relational import funnel_over
    from duke_ray.state.exchange import grouped_sum, partitioned_reduce  # noqa: F401

    tune_context()
    blocks = int(os.environ.get("EV_BLOCKS", 64))
    ev = (
        ray.data.range(N, override_num_blocks=blocks)
        .map_batches(event_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )
    if op == "cohort":
        import datetime
        import tempfile

        from duke_ray.pipelines import relational as rel

        import pyarrow.parquet as pq

        # cohort_retention's public entry reads an sf dir whose tables are
        # single files — land the synthetic events as ONE parquet file so
        # the REAL read->exchange path runs
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            tbl = pa.concat_tables(ray.get(ev.to_arrow_refs()))
            pq.write_table(tbl, os.path.join(d, "events.parquet"))
            t0 = time.time()
            rows = rel.cohort_retention(d).take_all()
            sec = time.time() - t0
        got = {}
        epoch_day0 = BASE_US // DAY_US
        for r in rows:
            day = datetime.date.fromisoformat(r["cohort"])
            abs_day = (datetime.datetime(day.year, day.month, day.day) - datetime.datetime(1970, 1, 1)).days
            got[(abs_day - epoch_day0, r["offset_days"])] = r["active_users"]
        exp = _expected_cohort()
        assert got == exp, (len(got), len(exp))
        total = sum(exp.values())
    else:
        t0 = time.time()
        got_counts = funnel_over(ev, STAGES)
        sec = time.time() - t0
        exp_counts = _expected_funnel()
        assert got_counts == exp_counts, (got_counts, exp_counts)
        total = exp_counts[0]
    print(json.dumps({f"{op}_sec_{cpus}": round(sec, 2), f"{op}_n": total}))
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("EV_WIDTHS", "8,32").split(",")]
    out: dict = {"n_events": N, "n_users": N_USERS, "widths": widths}
    for op in ["cohort", "funnel"]:
        for w in widths:
            env = dict(os.environ, PYTHONPATH=repo, RAY_GRAFT_CPUS=str(w))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "once", op],
                env=env, capture_output=True, text=True, check=True,
            )
            out.update(json.loads(r.stdout.strip().splitlines()[-1]))
        if len(widths) == 2:
            lo, hi = widths
            out[f"{op}_speedup"] = round(out[f"{op}_sec_{lo}"] / out[f"{op}_sec_{hi}"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) > 1 and sys.argv[1] == "once":
        run_once(sys.argv[2])
    else:
        main()
