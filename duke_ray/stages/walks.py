"""Deterministic random walks over an edge table — the walk-corpus
generator (DeepWalk / node2vec style) that turns a graph into training
sequences for embedding models.

The reference has no graph machinery at all (its pipeline stops at
per-column summaries, /root/reference/Duke/duke.py); the north-star KG
extension materializes an edge table, and THIS op is how that table
feeds representation learning: walk sequences are to graphs what packed
token sequences (stages/pack.py) are to text.

True randomness can't survive the engine's reproducibility bar (bit-
identical at any cluster width) or a SQL oracle, so the walker is a
pure integer hash of its state: at step t, walker w at node u takes
out-edge index

    c = ((w*1000003 + t*7919 + u*104729) % 2147483647) % outdeg(u)

with the adjacency list ordered by dst ascending — every term is exact
int64 (no overflow for node ids < ~1e12) and exactly expressible as a
DuckDB recursive CTE (the `graph_walks` driver-gate oracle). Walks
start at every node with an out-edge (`n_reps` walkers each,
walk_id = node * n_reps + rep) and stop early at sinks.

Topology per step: ONE node-keyed exchange unioning the constant-size
frontier (one row per live walker) with the adjacency rows; inside each
partition the next hop is fully vectorized (sort adjacency by
(src, dst), first-occurrence offsets per src, next = dst[start[u] + c]
— out-edge positions are dense, so no search). The frontier is
walker-count-sized throughout; the adjacency is re-shipped each of the
``walk_len`` exchanges — the honest cost of stateless steps (a
placement-pinned adjacency would amortize it on a real cluster; at
walk_len <= ~10 the re-ship is the simpler, restartable choice). Step
tables are materialized per round so lineage and block counts stay
fixed (the r2 iterative-loop lesson).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_A, _B, _C, _M = 1000003, 7919, 104729, 2147483647


def _walk_choice(walk_id: np.ndarray, step: int, node: np.ndarray) -> np.ndarray:
    return (walk_id * _A + step * _B + node * _C) % _M


def random_walks(
    edges: "ray.data.Dataset",
    walk_len: int = 4,
    n_reps: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """(walk_id, step, node) rows for ``n_reps`` deterministic walks of
    up to ``walk_len`` steps from every node with an out-edge. Parallel
    (src, dst) duplicates are collapsed first (edge multiplicity is not
    a sampling weight here; the oracle's UNION does the same)."""
    from ..state.exchange import partitioned_reduce

    if walk_len < 1:
        raise ValueError(f"walk_len must be >= 1, got {walk_len}")
    if n_reps < 1:
        raise ValueError(f"n_reps must be >= 1, got {n_reps}")

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[src_col]), pc.is_valid(b[dst_col]))
        b = b.filter(keep)
        return pa.table(
            {
                "id": b[src_col].cast(pa.int64()),
                "dst": b[dst_col].cast(pa.int64()),
            }
        )

    def dedup_partition(t: pa.Table) -> pa.Table:
        s = t["id"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.table(
            {
                "id": pa.array(uniq[:, 0], pa.int64()),
                "dst": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    adj = partitioned_reduce(
        edges.map_batches(proj, batch_format="pyarrow"),
        "id",
        dedup_partition,
        n_meta=n_meta,
    ).materialize()

    def start_rows(b: pa.Table) -> pa.Table:
        nodes = np.unique(b["id"].to_numpy(zero_copy_only=False))
        reps = np.arange(n_reps, dtype=np.int64)
        wid = (nodes[:, None] * n_reps + reps[None, :]).reshape(-1)
        return pa.table(
            {
                "walk_id": pa.array(wid, pa.int64()),
                "node": pa.array(np.repeat(nodes, n_reps), pa.int64()),
            }
        )

    def dedup_walkers(t: pa.Table) -> pa.Table:
        # a node's adjacency rows live in ONE partition, but map_batches
        # above ran per block — dedup walker rows per walk_id
        wid = t["walk_id"].to_numpy(zero_copy_only=False)
        _, first = np.unique(wid, return_index=True)
        return t.take(pa.array(np.sort(first)))

    frontier = partitioned_reduce(
        adj.map_batches(start_rows, batch_format="pyarrow"),
        "walk_id",
        dedup_walkers,
        n_meta=n_meta,
    ).materialize()

    def _tag(kind: int, cols):
        def f(b: pa.Table) -> pa.Table:
            out = {k: (v(b) if callable(v) else b[v]) for k, v in cols.items()}
            out["kind"] = pa.array(np.full(b.num_rows, kind, np.int8))
            return pa.table(out)

        return f

    zeros = lambda b: pa.array(np.zeros(b.num_rows, np.int64))  # noqa: E731

    outputs = [
        frontier.map_batches(
            lambda b: pa.table(
                {
                    "walk_id": b["walk_id"],
                    "step": pa.array(np.zeros(b.num_rows, np.int64)),
                    "node": b["node"],
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    ]

    for t_step in range(walk_len):
        if frontier.count() == 0:
            break
        f_u = frontier.map_batches(
            _tag(0, {"id": "node", "dst": zeros, "walk_id": "walk_id"}),
            batch_format="pyarrow",
        )
        # rebuilt lazily per step ON PURPOSE: the tag map fuses into the
        # exchange (materializing it once measured no faster at 10M edges)
        # and would otherwise hold a second full tagged copy of the edge
        # table across the loop — the wrong memory shape at scale
        e_u = adj.map_batches(
            _tag(1, {"id": "id", "dst": "dst", "walk_id": zeros}),
            batch_format="pyarrow",
        )

        def step_partition(t: pa.Table, t_step: int = t_step) -> pa.Table:
            kind = t["kind"].to_numpy(zero_copy_only=False)
            e_t, f_t = t.filter(pa.array(kind == 1)), t.filter(pa.array(kind == 0))
            empty = pa.table(
                {
                    "walk_id": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                }
            )
            if f_t.num_rows == 0 or e_t.num_rows == 0:
                return empty
            es = e_t["id"].to_numpy(zero_copy_only=False)
            ed = e_t["dst"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ed, es))
            es, ed = es[order], ed[order]
            uniq, starts_i, deg = np.unique(es, return_index=True, return_counts=True)
            wid = f_t["walk_id"].to_numpy(zero_copy_only=False)
            node = f_t["id"].to_numpy(zero_copy_only=False)
            j = np.searchsorted(uniq, node)
            live = (j < len(uniq)) & (uniq[np.minimum(j, len(uniq) - 1)] == node)
            if not live.any():
                return empty
            wid, node, j = wid[live], node[live], j[live]
            c = _walk_choice(wid, t_step, node) % deg[j]
            return pa.table(
                {
                    "walk_id": pa.array(wid, pa.int64()),
                    "node": pa.array(ed[starts_i[j] + c], pa.int64()),
                }
            )

        frontier = partitioned_reduce(
            f_u.union(e_u), "id", step_partition, n_meta=n_meta
        ).materialize()
        outputs.append(
            frontier.map_batches(
                lambda b, s=t_step + 1: pa.table(
                    {
                        "walk_id": b["walk_id"],
                        "step": pa.array(np.full(b.num_rows, s, np.int64)),
                        "node": b["node"],
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
        )

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out


def walk_texts(
    walks: "ray.data.Dataset", n_meta: int = 64
) -> "ray.data.Dataset":
    """(walk_id, step, node) rows -> (walk_id, text) walk sentences:
    node ids space-joined in step order — the bridge from graph walks to
    every text-side operator (co-occurrence, PPMI vectors, dedup,
    packing). One walk_id-keyed exchange; sentence assembly is the
    run-boundary concat of stages/pack.py (walks are short, so each
    partition's work is a vectorized sort + one binary_join)."""
    from ..state.exchange import partitioned_reduce

    def assemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "walk_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("walk_id", "ascending"), ("step", "ascending")]
            )
        )
        wid = t["walk_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
        toks = pc.cast(t["node"], pa.string()).combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[starts, len(wid)], pa.int32()), toks
        )
        return pa.table(
            {
                "walk_id": pa.array(wid[starts], pa.int64()),
                "text": pc.binary_join(lists, " "),
            }
        )

    return partitioned_reduce(walks, "walk_id", assemble, n_meta=n_meta)