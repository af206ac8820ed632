"""Graph analytics over the materialized KG edge table.

The reference (uncharted-distil/duke) stops at embedding-based
summarization; the north star (BASELINE.json) extends it into KG
construction with materialized node/edge tables. These operators are the
standard post-construction analyses over that output — degree profiles,
connected components, PageRank centrality — each expressed Ray-Data-first
so they hold at a 1e8-entity graph:

- degrees: per-batch partial rows -> one ``grouped_sum`` exchange; the
  edge table never shuffles whole.
- components: reuse of ``stages/dedup.cluster_pairs`` (distributed
  min-label + pointer jumping, O(log diameter) exchange rounds).
- pagerank: FIXED-POINT INTEGER arithmetic (micro-rank units, floor
  division per edge) so every sum is order-independent and the whole
  iteration is exactly reproducible by a DuckDB oracle — float
  PageRank can never survive a value-hash compare across summation
  orders (CLAUDE.md: avoid float aggregates). Each iteration is two
  hash-partitioned exchanges (deliver rank/out-weight to edges, then
  aggregate contributions per destination), the same topology as
  connected components; the rank table is materialized per round so
  lineage and block counts stay fixed (the r2 iterative-loop lesson).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PR_SCALE = 1_000_000  # one rank unit = 1e-6 (micro-ranks)
PR_DAMPING_PCT = 85  # damping 0.85, held as integer percent


def _project_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(subj_id, obj_id, n_occurrences) -> (src, dst, w) with null endpoints
    dropped (unlinkable surfaces carry no graph identity) and parallel
    edges pre-aggregated per (src, dst).

    The pre-aggregation is semantic, not just an optimization: PageRank
    contributions use floor division, so ``(r*w1)//W + (r*w2)//W`` differs
    from ``(r*(w1+w2))//W`` — the operator is DEFINED over the (src, dst)
    multigraph collapsed by summed weight, and the SQL oracle groups the
    same way."""
    from ..state.exchange import grouped_sum

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b["subj_id"]), pc.is_valid(b["obj_id"]))
        b = b.filter(keep)
        return pa.table(
            {
                "src": b["subj_id"].cast(pa.int64()),
                "dst": b["obj_id"].cast(pa.int64()),
                "w": b["n_occurrences"].cast(pa.int64()),
            }
        )

    return grouped_sum(
        edges.map_batches(proj, batch_format="pyarrow"), ["src", "dst"], {"w": "w"}
    )


def entity_degrees(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-entity degree profile over the edge table:
    (entity_id, out_edges, in_edges, w_out, w_in).

    out_edges counts edge-table rows (distinct (pred, obj) per subject —
    the table is already canonicalized per (subj, pred, obj)); w_* sums
    n_occurrences. One partial-rows map + one grouped_sum exchange."""
    from ..state.exchange import grouped_sum

    def partials(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b["subj_id"]), pc.is_valid(b["obj_id"]))
        b = b.filter(keep)
        n = b.num_rows
        occ = b["n_occurrences"].cast(pa.int64()).combine_chunks()
        ones = pa.array(np.ones(n, np.int64))
        zeros = pa.array(np.zeros(n, np.int64))
        zeros_w = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "entity_id": pa.concat_arrays(
                    [
                        b["subj_id"].cast(pa.int64()).combine_chunks(),
                        b["obj_id"].cast(pa.int64()).combine_chunks(),
                    ]
                ),
                "out_edges": pa.concat_arrays([ones, zeros]),
                "in_edges": pa.concat_arrays([zeros, ones]),
                "w_out": pa.concat_arrays([occ, zeros_w]),
                "w_in": pa.concat_arrays([zeros_w, occ]),
            }
        )

    return grouped_sum(
        edges.map_batches(partials, batch_format="pyarrow"),
        "entity_id",
        {c: c for c in ("out_edges", "in_edges", "w_out", "w_in")},
    )


def kg_components(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Connected components over the (undirected view of the) entity graph
    -> (entity_id, component_id), component_id = min entity id in the
    component. Thin adapter over dedup.cluster_pairs (distributed
    min-label + pointer jumping)."""
    from .dedup import cluster_pairs

    def as_pairs(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b["subj_id"]), pc.is_valid(b["obj_id"]))
        b = b.filter(keep)
        return pa.table(
            {
                "doc_a": b["subj_id"].cast(pa.int64()),
                "doc_b": b["obj_id"].cast(pa.int64()),
            }
        )

    labeled = cluster_pairs(edges.map_batches(as_pairs, batch_format="pyarrow"))
    return labeled.map_batches(
        lambda b: pa.table(
            {"entity_id": b["doc_id"], "component_id": b["cluster_id"]}
        ),
        batch_format="pyarrow",
    )


def _split_kinds(t: pa.Table, kind_col: str = "kind"):
    k = t[kind_col].to_numpy(zero_copy_only=False)
    return t.filter(pa.array(k == 0)), t.filter(pa.array(k == 1))


def kg_reach(
    edges: "ray.data.Dataset",
    seed_mod: int = 5,
    max_hops: int = 4,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Directed BFS hop distances from seed entities -> (entity_id, hops).

    Seeds are the nodes with ``entity_id % seed_mod == 0`` (a closed-form
    rule so the DuckDB recursive-CTE oracle names the same set); hops is
    the minimum number of directed edges from any seed, bounded by
    ``max_hops``. Nodes not reached within the bound are absent.

    Topology per hop (the pagerank/components shape — two metadata-sized
    exchanges): exchange 1 keyed by src expands the current frontier
    across its out-edges (per-partition numpy membership + unique, no
    per-key Python); exchange 2 keyed by node id settles candidates into
    the distance table (already-settled nodes keep their smaller hop —
    first arrival IS the BFS distance). The distance table is node-sized,
    materialized per round so lineage and block counts stay fixed (the r2
    iterative-loop lesson); the loop exits early once a round settles no
    new node, so the cost is 2 * min(max_hops, eccentricity) exchanges.
    Integer hop counts are summation-order-free, so any cluster size
    reproduces the oracle bit-exactly (CLAUDE.md: no float aggregates).
    """
    from ..state.exchange import partitioned_reduce

    proj = _project_edges(edges).materialize()
    heavy = proj.count() > 1_000_000  # heavy-plan reservation opt-in (see pagerank)
    if heavy:
        from ..context import reserve_memory_for

        proj = reserve_memory_for(proj)

    def seed_rows(b: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False),
                    b["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        ids = ids[ids % seed_mod == 0]
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "d": pa.array(np.zeros(len(ids), np.int64)),
            }
        )

    def dedup_ids(t: pa.Table) -> pa.Table:
        ids = np.unique(t["id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "d": pa.array(np.zeros(len(ids), np.int64)),
            }
        )

    dist = partitioned_reduce(
        proj.map_batches(seed_rows, batch_format="pyarrow"),
        "id",
        dedup_ids,
        n_meta=n_meta,
    ).materialize()
    if heavy:
        # dist/frontier are node-sized, but each hop unions them with the
        # edge-sized proj — re-flag after every materialize so the expand
        # exchange's whole lineage stays under the reservation policy
        dist = reserve_memory_for(dist)
    frontier = dist

    def _tag(col_extra: dict, kind: int):
        def f(b: pa.Table) -> pa.Table:
            cols = {k: (v(b) if callable(v) else b[v]) for k, v in col_extra.items()}
            cols["kind"] = pa.array(np.full(b.num_rows, kind, np.int8))
            return pa.table(cols)

        return f

    for hop in range(1, max_hops + 1):
        if frontier.count() == 0:
            break

        f_u = frontier.map_batches(
            _tag(
                {
                    "id": "id",
                    "dst": lambda b: pa.array(np.zeros(b.num_rows, np.int64)),
                },
                0,
            ),
            batch_format="pyarrow",
        )
        e_u = proj.map_batches(
            _tag({"id": "src", "dst": "dst"}, 1), batch_format="pyarrow"
        )

        def expand_partition(t: pa.Table) -> pa.Table:
            f_t, e_t = _split_kinds(t)
            fids = np.unique(f_t["id"].to_numpy(zero_copy_only=False))
            eid = e_t["id"].to_numpy(zero_copy_only=False)
            dst = e_t["dst"].to_numpy(zero_copy_only=False)
            hit = np.unique(dst[np.isin(eid, fids)])
            return pa.table({"id": pa.array(hit, pa.int64())})

        cand = partitioned_reduce(
            f_u.union(e_u), "id", expand_partition, n_meta=n_meta
        )

        d_u = dist.map_batches(
            _tag({"id": "id", "d": "d"}, 0), batch_format="pyarrow"
        )
        c_u = cand.map_batches(
            _tag(
                {
                    "id": "id",
                    "d": lambda b, hop=hop: pa.array(
                        np.full(b.num_rows, hop, np.int64)
                    ),
                },
                1,
            ),
            batch_format="pyarrow",
        )

        def settle_partition(t: pa.Table, hop: int = hop) -> pa.Table:
            d_t, c_t = _split_kinds(t)
            known = d_t["id"].to_numpy(zero_copy_only=False)
            kd = d_t["d"].to_numpy(zero_copy_only=False)
            cid = np.unique(c_t["id"].to_numpy(zero_copy_only=False))
            new = cid[~np.isin(cid, known)]
            return pa.table(
                {
                    "id": pa.array(np.concatenate([known, new]), pa.int64()),
                    "d": pa.array(
                        np.concatenate([kd, np.full(len(new), hop, np.int64)])
                    ),
                }
            )

        dist = partitioned_reduce(
            d_u.union(c_u), "id", settle_partition, n_meta=n_meta
        ).materialize()
        if heavy:
            dist = reserve_memory_for(dist)
        frontier = dist.map_batches(
            lambda b, hop=hop: b.filter(
                pc.equal(b["d"], pa.scalar(hop, pa.int64()))
            ),
            batch_format="pyarrow",
        )

    return dist.map_batches(
        lambda b: pa.table({"entity_id": b["id"], "hops": b["d"]}),
        batch_format="pyarrow",
    )


def triangle_counts(
    edges: "ray.data.Dataset",
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Per-entity triangle participation counts over the undirected simple
    entity graph -> (entity_id, n_triangles).

    Node-iterator algorithm, id-oriented: every undirected edge {u, v}
    (self-loops dropped, parallel/reverse edges collapsed) is stored as
    (u < v); wedges (a, b) are generated from each node's oriented
    adjacency list and closed against the oriented edge set, so each
    triangle a < b < c is found exactly once — the same enumeration the
    SQL oracle's three-way self-join performs.

    Topology: exchange 1 dedups oriented edges by (u, v); exchange 2
    (key = u) builds wedges per partition with O(1) numpy passes (the
    repeat/offset trick — no per-node Python); exchange 3 (key = first
    wedge leg) closes wedges against edges with a C++ hash join inside
    each partition; a final grouped_sum sums per-vertex counts. Wedge
    volume is sum(out_deg^2) under id orientation — the documented scale
    caveat; degree-based orientation (min-degree endpoint first) bounds
    it by arboricity and drops in as a different orient() if a skewed
    production graph needs it (the oracle would mirror the same rule).
    """
    from ..state.exchange import grouped_sum, partitioned_reduce

    proj = _project_edges(edges).materialize()
    heavy = proj.count() > 1_000_000  # heavy-plan reservation opt-in (see pagerank)
    if heavy:
        from ..context import reserve_memory_for

        proj = reserve_memory_for(proj)

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        u = np.minimum(s, d)[keep]
        v = np.maximum(s, d)[keep]
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())}
        )

    def unique_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["u", "v"]).aggregate([([], "count_all")])
        return g.select(["u", "v"])

    und = partitioned_reduce(
        proj.map_batches(orient, batch_format="pyarrow"),
        ["u", "v"],
        unique_pairs,
        n_meta=n_meta,
    ).materialize()
    if heavy:
        # a materialize starts a fresh lineage root — re-flag so the wedge
        # generation + close exchanges (the heavy part) stay reserved
        und = reserve_memory_for(und)

    def wedges_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by([("u", "ascending"), ("v", "ascending")])
        u = t["u"].to_numpy(zero_copy_only=False)
        adj = t["v"].to_numpy(zero_copy_only=False)
        n = len(u)
        # group boundaries of the sorted lower endpoints
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        lens = np.append(starts[1:], n) - starts
        # per-element pair fanout: element at in-group position p pairs with
        # the (len - 1 - p) neighbors after it
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        r = np.repeat(lens, lens) - 1 - pos
        m = int(r.sum())
        if m == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        left = np.repeat(adj, r)
        t_rep = np.repeat(np.arange(n, dtype=np.int64), r)
        off = np.cumsum(r) - r
        right = adj[t_rep + 1 + np.arange(m, dtype=np.int64) - np.repeat(off, r)]
        return pa.table(
            {
                "a": pa.array(left, pa.int64()),
                "b": pa.array(right, pa.int64()),
                "w": pa.array(np.repeat(u, r), pa.int64()),
            }
        )

    wedges = partitioned_reduce(und, "u", wedges_partition, n_meta=n_meta)

    # close wedges against edges: both keyed by the (lower, upper) pair
    wedge_u = wedges.map_batches(
        lambda b: pa.table(
            {
                "u": b["a"],
                "v": b["b"],
                "w": b["w"],
                "kind": pa.array(np.ones(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    edge_u = und.map_batches(
        lambda b: pa.table(
            {
                "u": b["u"],
                "v": b["v"],
                "w": pa.array(np.zeros(b.num_rows, np.int64)),
                "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )

    def close_partition(t: pa.Table) -> pa.Table:
        e_t, w_t = _split_kinds(t)
        tri = w_t.select(["u", "v", "w"]).join(
            e_t.select(["u", "v"]), keys=["u", "v"], join_type="inner"
        )
        if tri.num_rows == 0:
            return pa.table(
                {
                    "entity_id": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                }
            )
        ids = pa.concat_arrays(
            [
                tri["u"].combine_chunks().cast(pa.int64()),
                tri["v"].combine_chunks().cast(pa.int64()),
                tri["w"].combine_chunks().cast(pa.int64()),
            ]
        )
        g = pa.table(
            {
                "entity_id": ids,
                "one": pa.array(np.ones(len(ids), np.int64)),
            }
        ).group_by("entity_id").aggregate([("one", "sum")])
        return pa.table(
            {
                "entity_id": g["entity_id"],
                "n_triangles": g["one_sum"].cast(pa.int64()),
            }
        )

    per_partition = partitioned_reduce(
        wedge_u.union(edge_u), ["u", "v"], close_partition, n_meta=n_meta
    )
    # a vertex's triangles can close in different (a, b) partitions
    return grouped_sum(
        per_partition, "entity_id", {"n_triangles": "n_triangles"}, n_meta=n_meta
    )


def kcore(
    edges: "ray.data.Dataset",
    k: int = 2,
    rounds: int = 3,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Bounded k-core peeling over the undirected simple entity graph ->
    (entity_id, deg): the nodes surviving ``rounds`` simultaneous peel
    iterations (drop every node whose degree < k, induce, repeat), with
    their degree in the final induced subgraph.

    The op is DEFINED as the R-round peel — both the engine and the
    unrolled SQL oracle compute the same bounded iteration, so results
    hash-match whether or not the peel has converged (on small graphs R=3
    converges; convergence = a round that removes nothing, at which point
    the output IS the exact k-core). Degrees count distinct neighbors
    (parallel edges, directions and self-loops collapsed first).

    Topology per round: one node-keyed degree exchange (metadata-sized
    output) + two edge-scale survivor semi-join exchanges (one per
    endpoint — the survivor set must come from the PRE-round degree
    snapshot, so the two filters cannot be fused into the degree pass).
    The neighbor table is re-materialized per round to keep lineage and
    block counts fixed (the r2 iterative-loop lesson).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from ..state.exchange import grouped_sum, partitioned_reduce

    proj = _project_edges(edges).materialize()
    heavy = proj.count() > 1_000_000  # heavy-plan reservation opt-in (see pagerank)
    if heavy:
        from ..context import reserve_memory_for

        proj = reserve_memory_for(proj)

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d)[keep], pa.int64()),
                "v": pa.array(np.maximum(s, d)[keep], pa.int64()),
            }
        )

    def unique_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["u", "v"]).aggregate([([], "count_all")])
        return g.select(["u", "v"])

    und = partitioned_reduce(
        proj.map_batches(orient, batch_format="pyarrow"),
        ["u", "v"],
        unique_pairs,
        n_meta=n_meta,
    )

    # symmetric neighbor view: each undirected edge as (a, b) and (b, a)
    nbrs = und.map_batches(
        lambda b: pa.table(
            {
                "a": pa.concat_arrays(
                    [b["u"].combine_chunks(), b["v"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [b["v"].combine_chunks(), b["u"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    if heavy:
        nbrs = reserve_memory_for(nbrs)

    def degrees(ds):
        return grouped_sum(
            ds.map_batches(
                lambda b: pa.table(
                    {
                        "a": b["a"],
                        "one": pa.array(np.ones(b.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            "a",
            {"one": "d"},
            n_meta=n_meta,
        )

    def survivor_filter(ds, survivors, key):
        """Keep ds rows whose ``key`` endpoint is in the survivor node set."""
        s_u = survivors.map_batches(
            lambda b: pa.table(
                {
                    "a": b["a"],
                    "b": pa.array(np.zeros(b.num_rows, np.int64)),
                    "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        e_u = ds.map_batches(
            lambda b, key=key: pa.table(
                {
                    "a": b[key],
                    "b": b["b" if key == "a" else "a"],
                    "kind": pa.array(np.ones(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )

        def keep_partition(t: pa.Table, key=key) -> pa.Table:
            s_t, e_t = _split_kinds(t)
            ok = np.unique(s_t["a"].to_numpy(zero_copy_only=False))
            ea = e_t["a"].to_numpy(zero_copy_only=False)
            m = np.isin(ea, ok)
            eb = e_t["b"].to_numpy(zero_copy_only=False)[m]
            return pa.table(
                {
                    "a": pa.array(ea[m] if key == "a" else eb, pa.int64()),
                    "b": pa.array(eb if key == "a" else ea[m], pa.int64()),
                }
            )

        return partitioned_reduce(s_u.union(e_u), "a", keep_partition, n_meta=n_meta)

    for _ in range(rounds):
        deg = degrees(nbrs)
        survivors = deg.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["d"], pa.scalar(k, pa.int64()))
            ).select(["a"]),
            batch_format="pyarrow",
        ).materialize()
        nbrs = survivor_filter(nbrs, survivors, "a")
        nbrs = survivor_filter(nbrs, survivors, "b").materialize()
        if heavy:
            nbrs = reserve_memory_for(nbrs)

    return degrees(nbrs).map_batches(
        lambda b: pa.table({"entity_id": b["a"], "deg": b["d"]}),
        batch_format="pyarrow",
    )


def pagerank(
    edges: "ray.data.Dataset",
    n_iter: int = 5,
    damping_pct: int = PR_DAMPING_PCT,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Fixed-point integer PageRank over the KG edge table ->
    (entity_id, rank) in micro-rank units (PR_SCALE = 1.0).

    Per iteration, for every node j:
        rank'(j) = (1-d)*SCALE + (d_pct * SUM_{i->j} (rank(i)*w_ij // W_i)) // 100
    with W_i = total out-weight of i, all in int64 floor division — sums of
    integers are associative, so the distributed result is bit-identical to
    any serial evaluation (and to the unrolled DuckDB oracle). Dangling
    nodes (no out-edges) simply contribute nothing — the documented
    no-redistribution variant.

    Topology per iteration (the cluster_pairs shape — TWO exchanges):
      exchange 1 (key = src): deliver (rank, W) to every out-edge, emit
        per-edge contributions (dst, c);
      exchange 2 (key = dst/id): sum contributions per destination AND
        apply the update over the full node set in one partition pass
        (left-join semantics: nodes without in-edges get the base term);
        a per-batch pyarrow group_by combine bounds hot-dst row counts
        before the shuffle.
    The rank table is node-sized metadata; it is materialized each round so
    block counts and lineage depth stay constant across iterations."""
    from ..state.exchange import grouped_sum, partitioned_reduce

    proj = _project_edges(edges).materialize()

    # Gazetteer-sized graphs are lean metadata plans (keep the r3
    # no-reservation default); a corpus-scale graph pushes edge-sized
    # unions through Sort barriers every iteration — exactly the plan
    # class that livelocked the dedup verify exchange at 10M docs — so
    # opt its lineage back into progress-guaranteed reservation.
    heavy = proj.count() > 1_000_000
    if heavy:
        from ..context import reserve_memory_for

        proj = reserve_memory_for(proj)

    outw = grouped_sum(proj, "src", {"w": "W"})  # (src, W)

    def node_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [b["src"].combine_chunks(), b["dst"].combine_chunks()]
                )
            }
        )

    # rank table (id, r, W): distinct node ids left-joined with out-weight.
    # One exchange: node rows (kind 0) + outw rows (kind 1, W in val).
    nodes_u = proj.map_batches(node_rows, batch_format="pyarrow").map_batches(
        lambda b: pa.table(
            {
                "id": b["id"],
                "val": pa.array(np.zeros(b.num_rows, np.int64)),
                "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    outw_u = outw.map_batches(
        lambda b: pa.table(
            {
                "id": b["src"],
                "val": b["W"].cast(pa.int64()),
                "kind": pa.array(np.ones(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )

    def init_partition(t: pa.Table) -> pa.Table:
        node_t, w_t = _split_kinds(t)
        ids = np.unique(node_t["id"].to_numpy(zero_copy_only=False))
        W = np.zeros(len(ids), np.int64)
        w_ids = w_t["id"].to_numpy(zero_copy_only=False)
        if len(w_ids):
            W[np.searchsorted(ids, w_ids)] = w_t["val"].to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "id": pa.array(ids),
                "r": pa.array(np.full(len(ids), PR_SCALE, np.int64)),
                "W": pa.array(W),
            }
        )

    ranks = partitioned_reduce(
        nodes_u.union(outw_u), "id", init_partition, n_meta=n_meta
    ).materialize()
    if heavy:
        # each materialize starts a fresh lineage root; re-flag it so every
        # round's exchanges stay under the reservation policy
        ranks = reserve_memory_for(ranks)

    base = PR_SCALE - (damping_pct * PR_SCALE) // 100

    for _ in range(n_iter):
        # exchange 1: deliver (r, W) to out-edges keyed by src
        rank_u = ranks.map_batches(
            lambda b: pa.table(
                {
                    "id": b["id"],
                    "dst": pa.array(np.zeros(b.num_rows, np.int64)),
                    "a": b["r"],
                    "b": b["W"],
                    "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        edge_u = proj.map_batches(
            lambda b: pa.table(
                {
                    "id": b["src"],
                    "dst": b["dst"],
                    "a": b["w"],
                    "b": pa.array(np.zeros(b.num_rows, np.int64)),
                    "kind": pa.array(np.ones(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )

        def contrib_partition(t: pa.Table) -> pa.Table:
            rank_t, edge_t = _split_kinds(t)
            rid = rank_t["id"].to_numpy(zero_copy_only=False)
            order = np.argsort(rid, kind="stable")
            rid = rid[order]
            r = rank_t["a"].to_numpy(zero_copy_only=False)[order]
            W = rank_t["b"].to_numpy(zero_copy_only=False)[order]
            eid = edge_t["id"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(rid, eid)
            w = edge_t["a"].to_numpy(zero_copy_only=False)
            # every src has out-edges, so W[idx] > 0 by construction
            c = (r[idx] * w) // W[idx]
            return pa.table(
                {"dst": edge_t["dst"], "c": pa.array(c.astype(np.int64))}
            )

        # exchange 2: sum contributions AND apply the update in ONE exchange
        # (r4: was contribs -> grouped_sum -> apply, three barriers per
        # iteration; contribs keyed by dst and the apply keyed by id hash
        # the same int64 values, so the raw per-edge contributions union
        # directly with the rank table and the per-dst sum runs inside the
        # partition — integer sums are associative, values unchanged).
        # Map-side combine first: within a batch, contributions to the same
        # dst collapse via pyarrow group_by, bounding hot-key row counts.
        contribs = partitioned_reduce(
            rank_u.union(edge_u), "id", contrib_partition, n_meta=n_meta
        )

        prev_u = ranks.map_batches(
            lambda b: pa.table(
                {
                    "id": b["id"],
                    "val": b["W"],
                    "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        contrib_u = contribs.map_batches(
            lambda b: (
                lambda g: pa.table(
                    {
                        "id": g["dst"],
                        "val": g["c_sum"].cast(pa.int64()),
                        "kind": pa.array(np.ones(g.num_rows, np.int8)),
                    }
                )
            )(b.group_by("dst").aggregate([("c", "sum")])),
            batch_format="pyarrow",
        )

        def apply_partition(t: pa.Table) -> pa.Table:
            node_t, contrib_t = _split_kinds(t)
            ids = node_t["id"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            W = node_t["val"].to_numpy(zero_copy_only=False)[order]
            S = np.zeros(len(ids), np.int64)
            cid = contrib_t["id"].to_numpy(zero_copy_only=False)
            if len(cid):
                np.add.at(
                    S,
                    np.searchsorted(ids, cid),
                    contrib_t["val"].to_numpy(zero_copy_only=False),
                )
            r = base + (damping_pct * S) // 100
            return pa.table(
                {"id": pa.array(ids), "r": pa.array(r), "W": pa.array(W)}
            )

        ranks = partitioned_reduce(
            prev_u.union(contrib_u), "id", apply_partition, n_meta=n_meta
        ).materialize()
        if heavy:
            ranks = reserve_memory_for(ranks)

    return ranks.map_batches(
        lambda b: pa.table({"entity_id": b["id"], "rank": b["r"]}),
        batch_format="pyarrow",
    )
