"""Range-join endurance: the per-user follow-window join at 10M events.

`pipelines/relational.py:follow_window_over` promises the interval join
never materializes pairs (windowed aggregates come from searchsorted +
prefix-sum differences inside ONE user-keyed exchange). This harness
runs it at 10M synthetic events with a CLOSED-FORM answer: every user's
events are exactly EVERY_MIN minutes apart, so with a WINDOW_MIN window
each event is followed by exactly floor(WINDOW_MIN / EVERY_MIN) events,
except the last k events of each user's timeline (k, k-1, ..., 0
followers). The total follow count is therefore exact:

    per_user = E * k - k*(k+1)/2        (E events/user, k = W//gap)
    total    = n_users * per_user

and the value sums are exact too (values are a pure hash of event id).
Fresh subprocess per width (session aging), input materialized before
the timer, fixed block budget.

Usage:
  RJ_N=10000000 RJ_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/rangejoin_endurance.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

N = int(os.environ.get("RJ_N", 10_000_000))
USERS = int(os.environ.get("RJ_USERS", 100_000))
EVERY_MIN = 5
WINDOW_MIN = 30  # k = 6 followers per interior event


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


def row_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    user = i % USERS
    seq = i // USERS  # the user's seq-th event
    base = 1_700_000_000_000_000
    ts = base + seq * (EVERY_MIN * 60_000_000)
    # value in milli = hash-derived integer/1000 so ROUND(v*1000) is exact
    vm = (_mix(i.astype(np.uint64), 3) % np.uint64(1_000_000)).astype(np.int64)
    return pa.table(
        {
            "event_id": pa.array(i, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(vm.astype(np.float64) / 1000.0, pa.float64()),
        }
    )


def run_once() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR"
    )
    from duke_ray.context import tune_context
    from duke_ray.pipelines.relational import follow_window_over

    tune_context()
    assert N % USERS == 0, "N must be a multiple of RJ_USERS"
    rows = (
        ray.data.range(N, override_num_blocks=int(os.environ.get("RJ_BLOCKS", 64)))
        .map_batches(row_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )

    t0 = time.time()
    out = follow_window_over(rows, window_minutes=WINDOW_MIN).materialize()
    sec = time.time() - t0

    stats = out.map_batches(
        lambda b: pa.table(
            {
                "rows": pa.array([b.num_rows], pa.int64()),
                "nf": pa.array(
                    [int(b["n_follow"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "sm": pa.array(
                    [int(b["sum_follow_milli"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_rows = int(stats["rows"].sum())
    total_follow = int(stats["nf"].sum())
    total_sum = int(stats["sm"].sum())

    E = N // USERS
    k = WINDOW_MIN // EVERY_MIN
    expect_follow = USERS * (E * k - k * (k + 1) // 2)
    assert n_rows == N, (n_rows, N)
    assert total_follow == expect_follow, (total_follow, expect_follow)
    # exact value check: each event id i is counted as a FOLLOWER once per
    # predecessor within k steps: multiplicity = min(seq, k)
    i = np.arange(N, dtype=np.int64)
    mult = np.minimum(i // USERS, k)
    vm = (_mix(i.astype(np.uint64), 3) % np.uint64(1_000_000)).astype(np.int64)
    expect_sum = int((mult * vm).sum())
    assert total_sum == expect_sum, (total_sum, expect_sum)
    print(json.dumps({f"sec_{cpus}": round(sec, 2), "total_follow": total_follow}))
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("RJ_WIDTHS", "8,32").split(",")]
    out: dict = {"n_rows": N, "n_users": USERS, "widths": widths}
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
