"""Boilerplate-strip endurance: strip_boilerplate at corpus scale with an
EXACT closed form.

Corpus: every doc is 24 UNIQUE tokens (decimal strings of splitmix64 over
disjoint position ranges — a cross-doc duplicated 16-window would need 16
consecutive 64-bit collisions, impossible in practice), and every
doc_id % 16 == 0 doc gets the same 16-token boilerplate suffix. Therefore
the ONLY duplicated windows are the pure-boiler windows, and:

  - n_removed == 16 exactly on every planted doc, 0 on every other;
  - total kept + removed == total tokens (conservation);
  - results are invariant across CPU widths.

Boundary windows mixing a doc's unique tail with the boiler prefix occur
once each (the tail is unique), so they never reach min_docs — the
removal boundary is exactly the planted suffix.

Fresh subprocess per width (session aging), corpus materialized before
the timer, fixed 64-block budget.

Usage:
  STRIP_N=10000000 STRIP_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/strip_endurance.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N = int(os.environ.get("STRIP_N", 10_000_000))
TOKS = 24
W = 16
BOILER = (
    "subscribe to our newsletter for daily updates and never miss "
    "a single breaking story again friends"
)


def _mix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return z


def doc_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(i)
    pos = (i[:, None].astype(np.uint64) * np.uint64(TOKS * 2)) + np.arange(
        TOKS, dtype=np.uint64
    )
    toks = _mix(pos.ravel())
    flat = pc.cast(pa.array(toks.view(np.int64), pa.int64()), pa.string())
    offsets = pa.array(np.arange(0, (n + 1) * TOKS, TOKS, dtype=np.int64), pa.int64())
    lists = pa.LargeListArray.from_arrays(offsets, flat)
    base_text = pc.binary_join(lists, pa.scalar(" "))
    tail = pc.if_else(pa.array(i % 16 == 0), pa.scalar(" " + BOILER), pa.scalar(""))
    return pa.table(
        {
            "doc_id": pa.array(i, pa.int64()),
            "text": pc.binary_join_element_wise(base_text, tail, ""),
        }
    )


def run_once() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.spans import strip_boilerplate

    tune_context()
    assert len(BOILER.split(" ")) == W
    blocks = int(os.environ.get("STRIP_BLOCKS", 64))
    docs = (
        ray.data.range(N, override_num_blocks=blocks)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )

    t0 = time.time()
    out = strip_boilerplate(docs, w=W).materialize()
    sec = time.time() - t0

    def agg(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        rem = b["n_removed"].to_numpy(zero_copy_only=False)
        kept = b["n_kept"].to_numpy(zero_copy_only=False)
        planted = ids % 16 == 0
        bad = int((rem[planted] != W).sum() + (rem[~planted] != 0).sum())
        return pa.table(
            {
                "rows": pa.array([len(ids)], pa.int64()),
                "removed": pa.array([int(rem.sum())], pa.int64()),
                "kept": pa.array([int(kept.sum())], pa.int64()),
                "bad": pa.array([bad], pa.int64()),
            }
        )

    st = out.map_batches(agg, batch_format="pyarrow").to_pandas()
    n_planted = (N + 15) // 16
    assert int(st["rows"].sum()) == N
    assert int(st["bad"].sum()) == 0, "a doc's removal count deviates from the closed form"
    assert int(st["removed"].sum()) == W * n_planted
    # conservation: every input token is either kept or removed; planted
    # docs carry TOKS + W tokens, others TOKS
    assert int(st["kept"].sum()) + int(st["removed"].sum()) == N * TOKS + W * n_planted
    print(json.dumps({f"sec_{cpus}": round(sec, 2), "removed": int(st["removed"].sum())}))
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("STRIP_WIDTHS", "8,32").split(",")]
    out: dict = {"n_docs": N, "widths": widths}
    for w in widths:
        env = dict(os.environ, PYTHONPATH=repo, RAY_GRAFT_CPUS=str(w))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "once"],
            env=env, capture_output=True, text=True, check=True,
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
