"""k-means endurance: full integer Lloyd over a synthetic embedding corpus
far beyond the testdata embeddings table — evidences that
stages/embedagg.py:kmeans_lloyd's per-iteration topology (one streamed
corpus pass -> k x dim metadata exchange) is corpus-scale, and that the
integer fixed-point arithmetic makes assignments BIT-IDENTICAL at any
parallelism (the north-rule any-cluster-size reproducibility claim, same
protocol as tools/graph_endurance.py's rank checksum).

Every vector is a pure hash of its index (planted blob structure so the
iterations actually move centroids), so runs at any CPU count see the
same corpus. Widths run in fresh subprocesses (session aging,
CLAUDE.md).

Usage:
  KMEANS_N=2000000 KMEANS_WIDTHS=8,32 PYTHONPATH=/root/repo \
    python tools/kmeans_endurance.py
Prints one JSON line with per-width seconds + the shared checksum.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

N = int(os.environ.get("KMEANS_N", 2_000_000))
DIM = int(os.environ.get("KMEANS_DIM", 64))
K = int(os.environ.get("KMEANS_K", 16))
ITERS = int(os.environ.get("KMEANS_ITERS", 3))
BLOBS = 12  # != K so assignment boundaries are non-trivial


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _mix_inner(x, salt)


def _mix_inner(x: np.ndarray, salt: int) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(salt * 0x9E3779B97F4A7C15 & (1 << 64) - 1)).astype(
        np.uint64
    )
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _centers() -> np.ndarray:
    g = np.arange(BLOBS * DIM, dtype=np.uint64)
    return (_mix(g, 17) % np.uint64(1 << 20)).astype(np.float64).reshape(BLOBS, DIM) / (
        1 << 20
    ) * 0.8 - 0.4


def vec_batch(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    blob = (_mix(i, 1) % np.uint64(BLOBS)).astype(np.int64)
    # per-(i, dim) noise, vectorized over the flat index space
    flat = (i[:, None] * np.uint64(DIM) + np.arange(DIM, dtype=np.uint64)[None, :]).reshape(-1)
    noise = (_mix(flat, 2) % np.uint64(1 << 20)).astype(np.float64).reshape(
        len(i), DIM
    ) / (1 << 20) * 0.1 - 0.05
    mat = (_centers()[blob] + noise).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.reshape(-1)), DIM).cast(
        pa.list_(pa.float32())
    )
    return pa.table({"vec_id": pa.array(i.astype(np.int64), pa.int64()), "embedding": emb})


def run_once() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.embedagg import kmeans_lloyd

    tune_context()
    # input construction OUTSIDE the timed region: materializing the synth
    # corpus first also warms the worker pool, so the timer measures the
    # OPERATOR (quantize + seeds + iterations + assign), not session spin-up
    # (the 32-wide leg otherwise pays ~15 s of worker spawn + synth and
    # reads slower than the 8-wide one)
    vecs = (
        ray.data.range(N, override_num_blocks=8 * cpus)
        .map_batches(vec_batch, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )
    t0 = time.time()
    assign = kmeans_lloyd(vecs, k=K, iters=ITERS).materialize()
    sec = time.time() - t0

    def stats(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = b["cluster"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ck = int(np.bitwise_xor.reduce(_mix(c + (vid << np.uint64(8)), 13)).astype(np.int64))
        sizes = np.bincount(c.astype(np.int64), minlength=K)
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "ck": pa.array([ck], pa.int64()),
                "sizes": pa.array([sizes.tolist()]),
            }
        )

    df = assign.map_batches(stats, batch_format="pyarrow").to_pandas()
    n = int(df["n"].sum())
    assert n == N, (n, N)
    sizes = np.sum(np.stack(df["sizes"].to_numpy()), axis=0)
    assert int(sizes.sum()) == N
    # blob structure guarantees non-degenerate clustering
    assert int((sizes > 0).sum()) >= min(K, BLOBS) - 1, sizes.tolist()
    checksum = int(
        np.bitwise_xor.reduce(df["ck"].to_numpy().astype(np.uint64)).astype(np.int64)
    )
    print(
        json.dumps(
            {
                f"sec_{cpus}": round(sec, 2),
                "checksum": checksum,
                "nonempty_clusters": int((sizes > 0).sum()),
            }
        )
    )
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    widths = [int(x) for x in os.environ.get("KMEANS_WIDTHS", "8,32").split(",")]
    out: dict = {"n_vectors": N, "dim": DIM, "k": K, "iters": ITERS, "widths": widths}
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
    assert out["bit_identical"], f"checksums differ across widths: {checksums}"
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
