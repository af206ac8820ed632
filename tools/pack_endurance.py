"""Shuffle + packing endurance: the metadata-exchange claim at 10M docs.

`stages/shuffle.py` and `stages/pack.py` both promise that only
(id, n_tokens, md5-key) rows cross their one exchange — volume
independent of document size — and that the resulting layout is a pure
function of the ids (bit-identical at any parallelism). This harness
evidences both at 10M synthetic docs: fresh subprocess per width
(session-aging protocol), input materialized before the timer
(worker-spawn protocol), FIXED input block budget (width must change
executor parallelism only — the r4 sort-endurance lesson).

Closed-form invariants checked in-run:
  - shuffle manifest: n_rows sums to N, sum_id sums to N*(N+1)/2
  - pack manifest: n_docs sums to N, n_tokens sums to the exact
    driver-side numpy sum of the hash-derived lengths
  - both manifests checksum bit-identically across widths

Usage:
  PACK_N=10000000 PACK_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/pack_endurance.py
Prints one JSON line with per-width seconds + shared checksums.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

N = int(os.environ.get("PACK_N", 10_000_000))
BUDGET = int(os.environ.get("PACK_BUDGET", 2048))
BUCKETS = int(os.environ.get("PACK_BUCKETS", 256))


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


def _tokens_of(i: np.ndarray) -> np.ndarray:
    # web-doc-shaped lengths: 1..2000, hash-derived (deterministic)
    return (_mix(i.astype(np.uint64), 5) % np.uint64(2000) + np.uint64(1)).astype(
        np.int64
    )


def row_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
    return pa.table(
        {
            "doc_id": pa.array(i, pa.int64()),
            "n_tokens": pa.array(_tokens_of(i), pa.int64()),
        }
    )


def _checksum(arr: np.ndarray) -> int:
    return int(np.bitwise_xor.reduce(_mix(np.ascontiguousarray(arr), 7)).astype(np.int64))


def run_once() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR"
    )
    from duke_ray.context import tune_context
    from duke_ray.stages.pack import pack_manifest
    from duke_ray.stages.shuffle import shuffle_manifest

    tune_context()
    rows = (
        ray.data.range(N, override_num_blocks=int(os.environ.get("PACK_BLOCKS", 64)))
        .map_batches(row_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )

    # time the distributed execution (materialize); the driver-side
    # collect for invariant checks is NOT the op (a real pipeline writes
    # the manifest as parquet) and runs outside the timer
    t0 = time.time()
    sm_ds = shuffle_manifest(rows, n_parts=BUCKETS, id_col="doc_id").materialize()
    shuf_sec = time.time() - t0
    sm = sm_ds.to_pandas().sort_values("part").reset_index(drop=True)
    assert int(sm["n_rows"].sum()) == N
    assert int(sm["sum_id"].sum()) == N * (N + 1) // 2
    shuf_ck = _checksum(
        np.concatenate(
            [sm["part"].to_numpy(np.int64), sm["n_rows"].to_numpy(np.int64),
             sm["sum_id"].to_numpy(np.int64)]
        )
    )

    t0 = time.time()
    pm_ds = pack_manifest(rows, budget=BUDGET, n_buckets=BUCKETS).materialize()
    pack_sec = time.time() - t0
    pm = pm_ds.to_pandas()
    assert int(pm["n_docs"].sum()) == N
    exact_tokens = int(_tokens_of(np.arange(1, N + 1, dtype=np.int64)).sum())
    assert int(pm["n_tokens"].sum()) == exact_tokens
    pm = pm.sort_values(["bucket", "seq_id"]).reset_index(drop=True)
    pack_ck = _checksum(
        pm[["bucket", "seq_id", "n_docs", "n_tokens", "min_id", "max_id"]]
        .to_numpy(np.int64)
        .reshape(-1)
    )

    print(
        json.dumps(
            {
                f"shuffle_sec_{cpus}": round(shuf_sec, 2),
                f"pack_sec_{cpus}": round(pack_sec, 2),
                "n_seqs": len(pm),
                "shuffle_ck": shuf_ck,
                "pack_ck": pack_ck,
            }
        )
    )
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("PACK_WIDTHS", "8,32").split(",")]
    out: dict = {"n_rows": N, "budget": BUDGET, "n_buckets": BUCKETS, "widths": widths}
    cks = []
    for w in widths:
        env = dict(os.environ, PYTHONPATH=repo, RAY_GRAFT_CPUS=str(w))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "once"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        d = json.loads(r.stdout.strip().splitlines()[-1])
        cks.append((d.pop("shuffle_ck"), d.pop("pack_ck")))
        out.update(d)
    out["bit_identical"] = len(set(cks)) == 1
    assert out["bit_identical"], f"manifests differ across widths: {cks}"
    if len(widths) == 2:
        lo, hi = widths
        out["pack_speedup"] = round(out[f"pack_sec_{lo}"] / out[f"pack_sec_{hi}"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) > 1 and sys.argv[1] == "once":
        run_once()
    else:
        main()
