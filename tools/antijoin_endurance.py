"""Anti/semi-join endurance: the Q22-shaped anti-join and Q4-shaped
semi-join exchanges at 10M orders / 1M customers, with CLOSED-FORM
expected results.

Everything derives from splitmix hashes of the row id, so the checker
recomputes the exact per-nation / per-priority answers with vectorized
numpy over the full id range (no reference engine needed):

  - order i: custkey = mix(i,5) % N_CUST, priority = mix(i,6) % 5
  - customer c: nationkey = c % 25, bal_cents = mix(c,3) % 1e6 - 2e5
  - lineitem j (one per order j): qualifies iff mix(j,2) % 16 == 0
    (encoded as discount .06 / qty 46 vs .0 / 1)

Protocol lessons applied: fresh subprocess per (op, width) — session
aging; inputs materialized BEFORE the op timer; fixed 64-block budget so
width changes executor parallelism only.

Usage:
  AJ_N=10000000 AJ_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/antijoin_endurance.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

N_ORDERS = int(os.environ.get("AJ_N", 10_000_000))
N_CUST = int(os.environ.get("AJ_CUST", 1_000_000))
N_NATIONS = 25
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


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


def order_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    prio_idx = (_mix(i.astype(np.uint64), 6) % np.uint64(5)).astype(np.int64)
    prio = pa.compute.take(pa.array(PRIORITIES, pa.string()), pa.array(prio_idx, pa.int64()))
    return pa.table(
        {
            "o_orderkey": pa.array(i, pa.int64()),
            "o_custkey": pa.array(
                (_mix(i.astype(np.uint64), 5) % np.uint64(N_CUST)).astype(np.int64), pa.int64()
            ),
            "o_orderpriority": prio,
        }
    )


def cust_batch(batch: pa.Table) -> pa.Table:
    c = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bal_cents = (_mix(c.astype(np.uint64), 3) % np.uint64(1_000_000)).astype(np.int64) - 200_000
    return pa.table(
        {
            "c_custkey": pa.array(c, pa.int64()),
            "c_nationkey": pa.array(c % N_NATIONS, pa.int64()),
            "c_acctbal": pa.array(bal_cents.astype(np.float64) / 100.0, pa.float64()),
        }
    )


def line_batch(batch: pa.Table) -> pa.Table:
    j = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qual = (_mix(j.astype(np.uint64), 2) % np.uint64(16)) == 0
    return pa.table(
        {
            "l_orderkey": pa.array(j, pa.int64()),
            "l_discount": pa.array(np.where(qual, 0.06, 0.0), pa.float64()),
            "l_quantity": pa.array(np.where(qual, 46.0, 1.0), pa.float64()),
        }
    )


def _expected_anti() -> dict:
    i = np.arange(N_ORDERS, dtype=np.uint64)
    urgent = (_mix(i, 6) % np.uint64(5)) == 0
    marker = np.zeros(N_CUST, dtype=bool)
    marker[(_mix(i, 5) % np.uint64(N_CUST)).astype(np.int64)[urgent]] = True
    c = np.arange(N_CUST, dtype=np.uint64)
    bal = (_mix(c, 3) % np.uint64(1_000_000)).astype(np.int64) - 200_000
    pos = bal > 0
    sum_pos, n_pos = int(bal[pos].sum()), int(pos.sum())
    cand = bal * n_pos > sum_pos
    kept = cand & ~marker
    nat = (np.arange(N_CUST) % N_NATIONS)[kept]
    return {
        "numcust": np.bincount(nat, minlength=N_NATIONS).astype(np.int64),
        "totbal": np.bincount(nat, weights=bal[kept], minlength=N_NATIONS).astype(np.int64),
    }


def _expected_semi() -> np.ndarray:
    j = np.arange(N_ORDERS, dtype=np.uint64)
    qual = (_mix(j, 2) % np.uint64(16)) == 0
    prio_idx = (_mix(j, 6) % np.uint64(5)).astype(np.int64)
    return np.bincount(prio_idx[qual], minlength=5).astype(np.int64)


def run_once(op: str) -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.pipelines.relational import inactive_customers_over, priority_semijoin_over

    tune_context()
    if op == "share":
        _run_share(cpus)
        ray.shutdown()
        return
    blocks = int(os.environ.get("AJ_BLOCKS", 64))
    orders = (
        ray.data.range(N_ORDERS, override_num_blocks=blocks)
        .map_batches(order_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )
    if op == "anti":
        cust = (
            ray.data.range(N_CUST, override_num_blocks=blocks)
            .map_batches(cust_batch, batch_format="pyarrow", batch_size=65536)
            .materialize()
        )
        nation = pd.DataFrame(
            {
                "n_nationkey": np.arange(N_NATIONS, dtype=np.int64),
                "n_name": [f"N{k:02d}" for k in range(N_NATIONS)],
            }
        )
        t0 = time.time()
        rows = inactive_customers_over(cust, orders, nation).take_all()
        sec = time.time() - t0
        exp = _expected_anti()
        got_n = {r["n_name"]: r["numcust"] for r in rows}
        got_b = {r["n_name"]: r["totbal_cents"] for r in rows}
        for k in range(N_NATIONS):
            name = f"N{k:02d}"
            assert got_n.get(name, 0) == int(exp["numcust"][k]), (name, got_n.get(name))
            assert got_b.get(name, 0) == int(exp["totbal"][k]), (name, got_b.get(name))
        total = int(exp["numcust"].sum())
    else:
        li = (
            ray.data.range(N_ORDERS, override_num_blocks=blocks)
            .map_batches(line_batch, batch_format="pyarrow", batch_size=65536)
            .materialize()
        )
        t0 = time.time()
        rows = priority_semijoin_over(orders, li).take_all()
        sec = time.time() - t0
        exp = _expected_semi()
        got = {r["o_orderpriority"]: r["order_count"] for r in rows}
        for k, p in enumerate(PRIORITIES):
            assert got.get(p, 0) == int(exp[k]), (p, got.get(p), int(exp[k]))
        total = int(exp.sum())
    print(json.dumps({f"{op}_sec_{cpus}": round(sec, 2), f"{op}_rows": total}))
    ray.shutdown()


def _run_share(cpus: int) -> None:
    """order_share_over at N_ORDERS: the one exchange op whose OUTPUT is
    corpus-cardinality (window function semantics). Checks: row count ==
    N; the global share sum within the floor-division loss bound
    [1e6*NC - N, 1e6*NC]; and one sampled customer's rows exactly equal a
    numpy recomputation."""
    import ray

    from duke_ray.pipelines.relational import order_share_over

    blocks = int(os.environ.get("AJ_BLOCKS", 64))

    def order_money_batch(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = (_mix(i.astype(np.uint64), 9) % np.uint64(10_000_000)).astype(np.int64) + 100
        return pa.table(
            {
                "o_orderkey": pa.array(i, pa.int64()),
                "o_custkey": pa.array(
                    (_mix(i.astype(np.uint64), 5) % np.uint64(N_CUST)).astype(np.int64), pa.int64()
                ),
                "o_totalprice": pa.array(cents.astype(np.float64) / 100.0, pa.float64()),
            }
        )

    rows = (
        ray.data.range(N_ORDERS, override_num_blocks=blocks)
        .map_batches(order_money_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )

    t0 = time.time()
    shared = order_share_over(rows).materialize()
    sec = time.time() - t0

    n_rows = shared.count()
    assert n_rows == N_ORDERS, (n_rows, N_ORDERS)

    probe = 12345 % N_CUST

    def stats_batch(b: pa.Table) -> pa.Table:
        share = b["share_ppm"].to_numpy(zero_copy_only=False)
        mine = b.filter(pa.compute.equal(b["o_custkey"], pa.scalar(probe, pa.int64())))
        return pa.table(
            {
                "s": pa.array([int(share.sum())], pa.int64()),
                "probe_keys": pa.array(
                    [mine["o_orderkey"].to_pylist()], pa.list_(pa.int64())
                ),
                "probe_shares": pa.array(
                    [mine["share_ppm"].to_pylist()], pa.list_(pa.int64())
                ),
            }
        )

    agg = shared.map_batches(stats_batch, batch_format="pyarrow").take_all()
    total_share = sum(r["s"] for r in agg)
    # each present customer's shares sum to (1e6 - floor loss), loss < their
    # order count; hash assignment leaves a Poisson tail of ABSENT customers,
    # so the bound uses the count actually present
    all_i = np.arange(N_ORDERS, dtype=np.uint64)
    n_present = np.unique((_mix(all_i, 5) % np.uint64(N_CUST)).astype(np.int64)).size
    lo, hi = 1_000_000 * n_present - N_ORDERS, 1_000_000 * n_present
    assert lo <= total_share <= hi, (total_share, lo, hi)

    got = {}
    for r in agg:
        got.update(dict(zip(r["probe_keys"], r["probe_shares"])))
    i = np.arange(N_ORDERS, dtype=np.uint64)
    mine = (_mix(i, 5) % np.uint64(N_CUST)).astype(np.int64) == probe
    cents = (_mix(i, 9) % np.uint64(10_000_000)).astype(np.int64) + 100
    tot = int(cents[mine].sum())
    expect = {int(k): int(c) * 1_000_000 // tot for k, c in zip(np.flatnonzero(mine), cents[mine])}
    assert got == expect, (len(got), len(expect))
    print(json.dumps({f"share_sec_{cpus}": round(sec, 2), "share_rows": n_rows}))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("AJ_WIDTHS", "8,32").split(",")]
    out: dict = {"n_orders": N_ORDERS, "n_cust": N_CUST, "widths": widths}
    for op in ["anti", "semi", "share"]:
        for w in widths:
            env = dict(os.environ, PYTHONPATH=repo, RAY_GRAFT_CPUS=str(w))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "once", op],
                env=env,
                capture_output=True,
                text=True,
                check=True,
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
