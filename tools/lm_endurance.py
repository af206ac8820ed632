"""Bigram-LM scoring endurance: the salted attach exchange at corpus
scale — evidences that stages/lm.py's occurrence stream (corpus-linear,
unfilterable by construction: EVERY bigram occurrence needs its count)
holds at millions of documents, and that the integer formulation
reproduces BIT-IDENTICALLY at any parallelism (the north-rule
any-cluster-size claim, same protocol as graph/kmeans/sort endurance).

Corpus: ``read_documents_varied`` at GRAFT_REPLICAS — the same varied
synthetic corpus as the dedup endurance (deterministic token churn, so
any two widths see the same documents). Invariants checked per width:
- row count == corpus size (every doc scored);
- total n_bigrams == corpus-wide sum of (tokens-1) per doc (computed
  independently by one map over the same corpus);
- XOR checksum over (doc_id, n_bigrams, score_milli) rows — must be
  IDENTICAL across widths (asserted by the parent).

Each width runs in a fresh subprocess (session aging, CLAUDE.md); the
corpus is materialized before the timer (worker-spawn trap, CLAUDE.md).

Usage:
  GRAFT_REPLICAS=400 LM_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/lm_endurance.py
Prints one JSON line with per-width seconds + the shared checksum.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPLICAS = int(os.environ.get("GRAFT_REPLICAS", 400))


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(salt) * np.uint64(0x9E3779B97F4A7C15)).astype(
        np.uint64
    )
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def run_once() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from duke_ray.context import tune_context
    from duke_ray.sources import read_documents_varied
    from duke_ray.stages.lm import lm_score

    tune_context()
    docs = read_documents_varied(SF_DIR, replicas=REPLICAS).materialize()
    n_docs = docs.count()

    # independent corpus-wide bigram total (pure map, no LM code)
    import pyarrow.compute as pc

    def big_total(b: pa.Table) -> pa.Table:
        n_tok = pc.add(
            pc.count_substring(b["text"], " "), 1
        )  # tokens = spaces + 1 (corpus normal form)
        return pa.table(
            {"t": pa.array([int(pc.sum(pc.subtract(n_tok, 1)).as_py() or 0)], pa.int64())}
        )

    expected_bigrams = sum(
        r["t"] for r in docs.map_batches(big_total, batch_format="pyarrow").take_all()
    )

    t0 = time.time()
    scores = lm_score(docs).materialize()
    sec = time.time() - t0

    assert scores.count() == n_docs, (scores.count(), n_docs)

    def chk(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = b["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = b["score_milli"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _mix(d, 1) ^ _mix(n, 2) ^ _mix(s, 3)
        x = np.uint64(np.bitwise_xor.reduce(h)) if len(h) else np.uint64(0)
        return pa.table(
            {
                "x": pa.array([int(x)], pa.uint64()),
                "nb": pa.array([int(n.sum())], pa.int64()),
            }
        )

    parts = scores.map_batches(chk, batch_format="pyarrow").take_all()
    checksum = 0
    total_bigrams = 0
    for r in parts:
        checksum ^= int(r["x"])
        total_bigrams += int(r["nb"])
    assert total_bigrams == expected_bigrams, (total_bigrams, expected_bigrams)
    print(
        json.dumps(
            {
                f"sec_{cpus}": round(sec, 2),
                "checksum": checksum,
                "n_docs": n_docs,
                "total_bigrams": total_bigrams,
            }
        )
    )
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("LM_WIDTHS", "8,32").split(",")]
    out: dict = {"replicas": REPLICAS, "widths": widths}
    checksums = []
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
        checksums.append(d.pop("checksum"))
        out.update(d)
    out["checksum"] = checksums[0]
    out["bit_identical"] = len(set(checksums)) == 1
    assert out["bit_identical"], f"score checksums differ across widths: {checksums}"
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
