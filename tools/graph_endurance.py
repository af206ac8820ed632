"""Graph-analytics endurance: PageRank + connected components over a
large synthetic entity graph (the KG edge-table shape, node count far
beyond any gazetteer) — evidences that the iterative exchange topology in
stages/graph.py is corpus-scale, not just gazetteer-scale.

Deterministic by construction: every edge is a pure hash of its index, so
runs at any parallelism produce the SAME graph, and integer PageRank must
produce BIT-IDENTICAL ranks at any CPU count — that equality is the scale
invariant this script checks when run at two parallelism levels.

Each op runs in its OWN Ray session (subprocess re-exec, like
``bench.py --scaling``): chained Ray Data executions age a session
measurably (~10-60% per repeated identical run, 2-3x after ~15 chained
executions — see CLAUDE.md "session aging"), so per-op numbers from one
shared session under-report the later op at high CPU counts.

Usage:
  GRAPH_NODES=1000000 GRAPH_EDGES=10000000 RAY_GRAFT_CPUS=32 \
    PYTHONPATH=/root/repo python tools/graph_endurance.py
Prints one JSON line:
  {"nodes": N, "edges": E, "pagerank_sec": s, "components_sec": s,
   "edges_per_sec_pagerank": ..., "n_components": C, "rank_checksum": ...}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

NODES = int(os.environ.get("GRAPH_NODES", 1_000_000))
EDGES = int(os.environ.get("GRAPH_EDGES", 10_000_000))
COMMUNITIES = int(os.environ.get("GRAPH_COMMUNITIES", 10_000))
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", 32))
PR_ITERS = int(os.environ.get("GRAPH_PR_ITERS", 3))


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — pure function of (index, salt)."""
    z = (x + np.uint64(salt) * np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def edge_batch(batch: pa.Table) -> pa.Table:
    """Edge i: skewed random graph (quadratic preference toward low ids —
    hot-key stress) plus, for i < NODES, an intra-community chain edge so
    the expected component structure is exact (COMMUNITIES components,
    labels = community minima)."""
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    K = NODES // COMMUNITIES
    chain = i < NODES
    # chain edges: node i -> i+1 within its community (self-loop at border)
    nxt = np.where((i.astype(np.int64) + 1) % K == 0, i, i + np.uint64(1))
    # random edges, community-local
    comm = (_mix(i, 1) % np.uint64(COMMUNITIES)).astype(np.int64)
    u = (_mix(i, 2) % np.uint64(1 << 32)).astype(np.float64) / float(1 << 32)
    src_r = comm * K + (_mix(i, 3) % np.uint64(K)).astype(np.int64)
    dst_r = comm * K + np.floor(u * u * K).astype(np.int64)  # quadratic skew
    src = np.where(chain, i.astype(np.int64), src_r)
    dst = np.where(chain, nxt.astype(np.int64), dst_r)
    w = 1 + (_mix(i, 4) % np.uint64(5)).astype(np.int64)
    return pa.table(
        {
            "subj_id": pa.array(src),
            "pred": pa.array(np.full(len(i), "p", dtype=object), pa.string()),
            "obj_id": pa.array(dst),
            "n_occurrences": pa.array(w),
            "n_pages": pa.array(np.ones(len(i), np.int64)),
        }
    )


def _build_edges(cpus: int):
    import ray

    edges = (
        ray.data.range(EDGES, override_num_blocks=8 * cpus)
        .map_batches(edge_batch, batch_format="pyarrow", batch_size=262144)
        .materialize()
    )
    return edges


def run_pagerank() -> None:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.graph import PR_SCALE, pagerank

    tune_context()
    edges = _build_edges(CPUS)

    t0 = time.time()
    pr = pagerank(edges, n_iter=PR_ITERS, n_meta=max(64, 4 * CPUS)).materialize()
    pr_sec = time.time() - t0
    # invariants: full node coverage, floor >= base term, deterministic checksum
    base = PR_SCALE - (85 * PR_SCALE) // 100
    stats = pr.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "mn": pa.array([int(np.min(b["rank"].to_numpy(zero_copy_only=False)))], pa.int64()),
                "ck": pa.array(
                    [int(np.bitwise_xor.reduce(_mix(
                        b["rank"].to_numpy(zero_copy_only=False).astype(np.uint64)
                        + (b["entity_id"].to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(32)),
                        7,
                    )).astype(np.int64))],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_ranked = int(stats["n"].sum())
    assert n_ranked == NODES, (n_ranked, NODES)
    assert int(stats["mn"].min()) >= base
    checksum = int(np.bitwise_xor.reduce(stats["ck"].to_numpy().astype(np.uint64)).astype(np.int64))
    print(json.dumps({"pagerank_sec": round(pr_sec, 2), "rank_checksum": checksum}))
    ray.shutdown()


def run_components() -> None:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.graph import kg_components

    tune_context()
    edges = _build_edges(CPUS)

    t0 = time.time()
    comp = kg_components(edges).materialize()
    comp_sec = time.time() - t0
    cstats = comp.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "bad": pa.array(
                    [
                        int(
                            np.sum(
                                b["component_id"].to_numpy(zero_copy_only=False)
                                != (
                                    b["entity_id"].to_numpy(zero_copy_only=False)
                                    // (NODES // COMMUNITIES)
                                )
                                * (NODES // COMMUNITIES)
                            )
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    assert int(cstats["n"].sum()) == NODES
    assert int(cstats["bad"].sum()) == 0, "component label != community minimum"
    print(json.dumps({"components_sec": round(comp_sec, 2)}))
    ray.shutdown()


def run_reach() -> None:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.graph import kg_reach

    tune_context()
    edges = _build_edges(CPUS)

    seed_mod, max_hops = 101, 4
    t0 = time.time()
    reach = kg_reach(
        edges, seed_mod=seed_mod, max_hops=max_hops, n_meta=max(64, 4 * CPUS)
    ).materialize()
    reach_sec = time.time() - t0
    def reach_stats(b: pa.Table) -> pa.Table:
        ids = b["entity_id"].to_numpy(zero_copy_only=False)
        hops = b["hops"].to_numpy(zero_copy_only=False)
        bad = int(np.sum((hops < 0) | (hops > max_hops)))
        bad += int(np.sum(ids[hops == 0] % seed_mod != 0))
        ck = (
            int(
                np.bitwise_xor.reduce(
                    _mix(
                        hops.astype(np.uint64) + (ids.astype(np.uint64) << np.uint64(8)),
                        9,
                    )
                ).astype(np.int64)
            )
            if b.num_rows
            else 0
        )
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "seeds": pa.array([int(np.sum(hops == 0))], pa.int64()),
                "bad": pa.array([bad], pa.int64()),
                "ck": pa.array([ck], pa.int64()),
            }
        )

    stats = reach.map_batches(reach_stats, batch_format="pyarrow").to_pandas()
    # every node id in [0, NODES) appears in the edge set (chain edges), so
    # the seed count is exact: ceil(NODES / seed_mod)
    n_seeds = int(stats["seeds"].sum())
    assert n_seeds == -(-NODES // seed_mod), (n_seeds, NODES, seed_mod)
    assert int(stats["bad"].sum()) == 0
    assert int(stats["n"].sum()) >= n_seeds
    checksum = int(
        np.bitwise_xor.reduce(stats["ck"].to_numpy().astype(np.uint64)).astype(np.int64)
    )
    print(
        json.dumps(
            {
                "reach_sec": round(reach_sec, 2),
                "n_reached": int(stats["n"].sum()),
                "reach_checksum": checksum,
            }
        )
    )
    ray.shutdown()


def run_triangles() -> None:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.graph import triangle_counts

    tune_context()
    edges = _build_edges(CPUS)

    t0 = time.time()
    tri = triangle_counts(edges, n_meta=max(64, 4 * CPUS)).materialize()
    tri_sec = time.time() - t0
    stats = tri.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "total": pa.array(
                    [int(b["n_triangles"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "ck": pa.array(
                    [
                        int(
                            np.bitwise_xor.reduce(
                                _mix(
                                    b["n_triangles"].to_numpy(zero_copy_only=False).astype(np.uint64)
                                    + (
                                        b["entity_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                                        << np.uint64(20)
                                    ),
                                    11,
                                )
                            ).astype(np.int64)
                        )
                        if b.num_rows
                        else 0
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    total = int(stats["total"].sum())
    # each triangle contributes exactly one count to each of its 3 vertices
    assert total % 3 == 0, total
    checksum = int(
        np.bitwise_xor.reduce(stats["ck"].to_numpy().astype(np.uint64)).astype(np.int64)
    )
    print(
        json.dumps(
            {
                "triangles_sec": round(tri_sec, 2),
                "n_triangles": total // 3,
                "triangle_checksum": checksum,
            }
        )
    )
    ray.shutdown()


def run_walks() -> None:
    """Deterministic walk-corpus leg: every node has a chain out-edge by
    construction (no sinks), so the output is EXACTLY
    n_nodes * (walk_len + 1) rows — a closed-form count — and the
    (walk_id, step, node) checksum must be bit-identical at any width."""
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from duke_ray.context import tune_context
    from duke_ray.stages.walks import random_walks

    tune_context()
    edges = _build_edges(CPUS)
    walk_len = int(os.environ.get("GRAPH_WALK_LEN", 4))

    t0 = time.time()
    walks = random_walks(
        edges,
        walk_len=walk_len,
        n_reps=1,
        src_col="subj_id",
        dst_col="obj_id",
        n_meta=max(64, 4 * CPUS),
    ).materialize()
    sec = time.time() - t0

    stats = walks.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "ck": pa.array(
                    [int(np.bitwise_xor.reduce(_mix(
                        b["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
                        + (b["walk_id"].to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(24))
                        + (b["step"].to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(56)),
                        7,
                    )).astype(np.int64))],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_rows = int(stats["n"].sum())
    assert n_rows == NODES * (walk_len + 1), (n_rows, NODES, walk_len)
    checksum = int(np.bitwise_xor.reduce(stats["ck"].to_numpy().astype(np.uint64)).astype(np.int64))
    print(json.dumps({"walks_sec": round(sec, 2), "walks_checksum": checksum}))
    ray.shutdown()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    out = {}
    ops = ("pagerank", "components", "reach", "triangles", "walks")
    if os.environ.get("GRAPH_OPS"):
        ops = tuple(os.environ["GRAPH_OPS"].split(","))
    for op in ops:
        # fresh process per op: session aging across chained executions
        # would otherwise inflate the second op's time (measured 2-3x)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), op],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out.update(json.loads(r.stdout.strip().splitlines()[-1]))
    result = {
        "nodes": NODES,
        "edges": EDGES,
        "num_cpus": CPUS,
        "pr_iters": PR_ITERS,
        # n_components is verified exactly by the components leg's `bad`
        # invariant when that leg runs
        "n_components": COMMUNITIES,
    }
    result.update(out)
    if "pagerank_sec" in out:
        result["edges_per_sec_pagerank"] = int(EDGES * PR_ITERS / out["pagerank_sec"])
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    _runners = {
        "pagerank": run_pagerank,
        "components": run_components,
        "reach": run_reach,
        "triangles": run_triangles,
        "walks": run_walks,
    }
    if len(sys.argv) > 1 and sys.argv[1] in _runners:
        _runners[sys.argv[1]]()
    else:
        main()
