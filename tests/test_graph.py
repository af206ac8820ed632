"""Graph analytics (stages/graph.py) + incremental KG maintenance.

Every assertion is against an independent serial reference (pandas
union-find / integer PageRank) — not against the engine's own kernels.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from duke_ray.stages.graph import (
    PR_DAMPING_PCT,
    PR_SCALE,
    entity_degrees,
    kg_components,
    pagerank,
)


def _edges_ds(rows):
    """rows: (subj_id, pred, obj_id, n_occurrences, n_pages)"""
    import ray.data

    t = pa.table(
        {
            "subj_id": pa.array([r[0] for r in rows], pa.int64()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj_id": pa.array([r[2] for r in rows], pa.int64()),
            "n_occurrences": pa.array([r[3] for r in rows], pa.int64()),
            "n_pages": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    # several single-row blocks so the exchanges actually cross blocks
    return ray.data.from_arrow([t.slice(i, 1) for i in range(t.num_rows)])


def _random_graph(seed=7, n_nodes=40, n_edges=160):
    rng = np.random.default_rng(seed)
    rows = []
    seen = set()
    while len(rows) < n_edges:
        s, o = (int(x) for x in rng.integers(0, n_nodes, 2))
        p = f"p{int(rng.integers(0, 3))}"
        if (s, p, o) in seen:
            continue
        seen.add((s, p, o))
        rows.append((s, p, o, int(rng.integers(1, 9)), 1))
    return rows


def test_entity_degrees_matches_pandas(ray_session):
    rows = _random_graph()
    got = (
        entity_degrees(_edges_ds(rows))
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    e = pd.DataFrame(rows, columns=["subj_id", "pred", "obj_id", "n_occurrences", "n_pages"])
    outs = e.groupby("subj_id").agg(out_edges=("pred", "size"), w_out=("n_occurrences", "sum"))
    ins = e.groupby("obj_id").agg(in_edges=("pred", "size"), w_in=("n_occurrences", "sum"))
    ref = (
        outs.join(ins, how="outer")
        .fillna(0)
        .astype(np.int64)
        .reset_index(names="entity_id")
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["entity_id", "out_edges", "in_edges", "w_out", "w_in"]].astype(np.int64),
        ref[["entity_id", "out_edges", "in_edges", "w_out", "w_in"]],
    )


def test_components_multiple_and_self_loop(ray_session):
    # two chains, one self-loop island, one 2-cycle
    rows = [
        (1, "p", 2, 1, 1),
        (2, "p", 3, 1, 1),
        (10, "p", 11, 1, 1),
        (20, "p", 20, 1, 1),  # self loop
        (30, "p", 31, 1, 1),
        (31, "p", 30, 1, 1),
    ]
    got = kg_components(_edges_ds(rows)).to_pandas()
    lab = dict(zip(got["entity_id"], got["component_id"]))
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 30: 30, 31: 30}


def _serial_pagerank(rows, n_iter):
    e = pd.DataFrame(rows, columns=["subj_id", "pred", "obj_id", "n_occurrences", "n_pages"])
    pe = e.groupby(["subj_id", "obj_id"], as_index=False)["n_occurrences"].sum()
    W = pe.groupby("subj_id")["n_occurrences"].sum().to_dict()
    nodes = sorted(set(pe["subj_id"]) | set(pe["obj_id"]))
    base = PR_SCALE - (PR_DAMPING_PCT * PR_SCALE) // 100
    r = {v: PR_SCALE for v in nodes}
    for _ in range(n_iter):
        S = {}
        for s, d, w in pe.itertuples(index=False):
            S[d] = S.get(d, 0) + (r[s] * int(w)) // W[s]
        r = {v: base + (PR_DAMPING_PCT * S.get(v, 0)) // 100 for v in nodes}
    return r


@pytest.mark.parametrize("n_iter", [1, 5])
def test_pagerank_bit_identical_to_serial(ray_session, n_iter):
    rows = _random_graph(seed=11)
    got = pagerank(_edges_ds(rows), n_iter=n_iter).to_pandas()
    assert dict(zip(got["entity_id"], got["rank"])) == _serial_pagerank(rows, n_iter)


def test_pagerank_dangling_and_source_nodes(ray_session):
    # 1 -> 2 -> 3 (3 dangling: no out-edges; 1 a source: no in-edges)
    rows = [(1, "p", 2, 4, 1), (2, "p", 3, 2, 1)]
    got = pagerank(_edges_ds(rows), n_iter=3).to_pandas()
    ref = _serial_pagerank(rows, 3)
    assert dict(zip(got["entity_id"], got["rank"])) == ref
    base = PR_SCALE - (PR_DAMPING_PCT * PR_SCALE) // 100
    assert ref[1] == base  # source node settles at the base term


def test_merge_tables_equals_batch(ray_session):
    """Incremental invariant: merging tables built from disjoint page sets
    equals the table built over the union (counts are pure sums)."""
    import ray.data

    from duke_ray.pipelines.kg import merge_edge_tables, merge_node_tables

    rows_a = [(1, "p0", 2, 3, 2), (2, "p1", 3, 1, 1)]
    rows_b = [(1, "p0", 2, 5, 4), (4, "p0", 1, 2, 2)]
    merged = (
        merge_edge_tables(_edges_ds(rows_a), _edges_ds(rows_b))
        .to_pandas()
        .sort_values(["subj_id", "pred", "obj_id"])
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        [(1, "p0", 2, 8, 6), (2, "p1", 3, 1, 1), (4, "p0", 1, 2, 2)],
        columns=["subj_id", "pred", "obj_id", "n_occurrences", "n_pages"],
    )
    pd.testing.assert_frame_equal(merged[ref.columns.tolist()], ref, check_dtype=False)

    def nodes_ds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([r[0] for r in rows], pa.int64()),
                    "surface": pa.array([r[1] for r in rows], pa.string()),
                    "class": pa.array([r[2] for r in rows], pa.string()),
                    "n_mentions": pa.array([r[3] for r in rows], pa.int64()),
                }
            )
        )

    got = (
        merge_node_tables(
            nodes_ds([(1, "a", "C", 5), (2, "b", "D", 1)]),
            nodes_ds([(1, "a", "C", 2)]),
        )
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert got["n_mentions"].tolist() == [7, 1]


def test_update_kg_tables_end_to_end(ray_session, sf_dir, tmp_path):
    """Dir-level incremental maintenance: full pipeline over the even-doc
    half, then update_kg_tables folds in the odd-doc delta; the merged
    node/edge tables must equal a batch build over the full corpus."""
    import pyarrow.compute as pc

    import ray.data

    from duke_ray.pipelines.kg import (
        build_kg_tables,
        run_kg_pipeline,
        update_kg_tables,
    )
    from duke_ray.sources import read_pages
    from duke_ray.stages.extract import extract_text
    from duke_ray.state.manifest import write_partitioned_with_manifests
    from duke_ray.synth import doc_id_from_url_arrow

    extracted = extract_text(read_pages(sf_dir)).materialize()

    def half(parity):
        def f(b: pa.Table) -> pa.Table:
            ids = doc_id_from_url_arrow(b["url"])
            return b.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

        return f

    base_dir = str(tmp_path / "base")
    nodes, edges = build_kg_tables(extracted.map_batches(half(0), batch_format="pyarrow"))
    write_partitioned_with_manifests(
        nodes, f"{base_dir}/nodes", key_cols=["entity_id"], n_buckets=4, fingerprint="base"
    )
    write_partitioned_with_manifests(
        edges, f"{base_dir}/edges", key_cols=["subj_id", "pred", "obj_id"],
        n_buckets=4, fingerprint="base",
    )

    upd_dir = str(tmp_path / "updated")
    metrics = update_kg_tables(
        base_dir,
        extracted.map_batches(half(1), batch_format="pyarrow"),
        upd_dir,
        n_buckets=4,
    )

    full_dir = str(tmp_path / "full")
    run_kg_pipeline(sf_dir, full_dir, n_buckets=4)

    for tbl, keys in (
        ("edges", ["subj_id", "pred", "obj_id"]),
        ("nodes", ["entity_id"]),
    ):
        got = (
            ray.data.read_parquet(f"{upd_dir}/{tbl}")
            .to_pandas()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        ref = (
            ray.data.read_parquet(f"{full_dir}/{tbl}")
            .to_pandas()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        cols = [c for c in ref.columns if c != "bucket"]
        pd.testing.assert_frame_equal(got[cols], ref[cols], check_dtype=False)
    assert metrics["n_edges"] > 0 and metrics["n_nodes"] > 0


def _bfs_serial(rows, seed_mod, max_hops):
    """Serial BFS reference over the distinct (src, dst) digraph."""
    from collections import deque

    edges = {}
    nodes = set()
    for s, _p, o, _w, _np in rows:
        edges.setdefault(s, set()).add(o)
        nodes.update((s, o))
    dist = {v: 0 for v in nodes if v % seed_mod == 0}
    dq = deque(sorted(dist))
    while dq:
        v = dq.popleft()
        if dist[v] >= max_hops:
            continue
        for u in sorted(edges.get(v, ())):
            if u not in dist:
                dist[u] = dist[v] + 1
                dq.append(u)
    return dist


@pytest.mark.parametrize("seed_mod,max_hops", [(5, 2), (7, 4), (1000, 3)])
def test_kg_reach_matches_serial_bfs(ray_session, seed_mod, max_hops):
    from duke_ray.stages.graph import kg_reach

    rows = _random_graph(seed=13, n_nodes=60, n_edges=150)
    got = kg_reach(_edges_ds(rows), seed_mod=seed_mod, max_hops=max_hops).to_pandas()
    want = _bfs_serial(rows, seed_mod, max_hops)
    assert dict(zip(got["entity_id"], got["hops"])) == want


def test_kg_reach_chain_hop_bound_and_early_exit(ray_session):
    """A directed chain 0->1->...->9: max_hops truncates exactly, and a
    disconnected seedless component is never reached."""
    from duke_ray.stages.graph import kg_reach

    chain = [(i, "p", i + 1, 1, 1) for i in range(9)]
    island = [(101, "p", 102, 1, 1)]  # no node % 100 == 0
    got = kg_reach(_edges_ds(chain + island), seed_mod=100, max_hops=3).to_pandas()
    assert dict(zip(got["entity_id"], got["hops"])) == {0: 0, 1: 1, 2: 2, 3: 3}


def _triangles_serial(rows):
    und = set()
    for s, _p, o, _w, _np in rows:
        if s != o:
            und.add((min(s, o), max(s, o)))
    cnt = {}
    und_l = sorted(und)
    for a, b in und_l:
        for c in [v for (u, v) in und_l if u == b]:
            if (a, c) in und:
                for v in (a, b, c):
                    cnt[v] = cnt.get(v, 0) + 1
    return cnt


def test_triangle_counts_matches_serial(ray_session):
    from duke_ray.stages.graph import triangle_counts

    rows = _random_graph(seed=5, n_nodes=25, n_edges=120)
    got = triangle_counts(_edges_ds(rows)).to_pandas()
    assert dict(zip(got["entity_id"], got["n_triangles"])) == _triangles_serial(rows)


def test_triangle_counts_explicit(ray_session):
    """K4 on {0..3} (every vertex in 3 triangles) plus a pendant and a
    self-loop + reverse duplicate that must all collapse away."""
    from duke_ray.stages.graph import triangle_counts

    k4 = [(i, "p", j, 1, 1) for i in range(4) for j in range(4) if i < j]
    noise = [(3, "p", 3, 1, 1), (1, "p", 0, 1, 1), (0, "p", 9, 1, 1)]
    got = triangle_counts(_edges_ds(k4 + noise)).to_pandas()
    assert dict(zip(got["entity_id"], got["n_triangles"])) == {0: 3, 1: 3, 2: 3, 3: 3}


def _kcore_serial(rows, k, rounds):
    und = set()
    for s, _p, o, _w, _np in rows:
        if s != o:
            und.add((min(s, o), max(s, o)))
    nbrs = {}
    for u, v in und:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    for _ in range(rounds):
        alive = {n for n, ns in nbrs.items() if len(ns) >= k}
        nbrs = {
            n: {m for m in ns if m in alive}
            for n, ns in nbrs.items()
            if n in alive
        }
        nbrs = {n: ns for n, ns in nbrs.items() if ns}
    return {n: len(ns) for n, ns in nbrs.items()}


@pytest.mark.parametrize("k,rounds", [(2, 3), (3, 2), (5, 3)])
def test_kcore_matches_serial(ray_session, k, rounds):
    from duke_ray.stages.graph import kcore

    rows = _random_graph(seed=11, n_nodes=30, n_edges=120)
    got = kcore(_edges_ds(rows), k=k, rounds=rounds).to_pandas()
    assert dict(zip(got["entity_id"], got["deg"])) == _kcore_serial(rows, k, rounds)


def test_kcore_peels_tail_into_triangle(ray_session):
    """Triangle {0,1,2} with a pendant chain 2-3-4: at k=2 the chain peels
    over two rounds (simultaneous semantics: node 3 survives round 1)."""
    from duke_ray.stages.graph import kcore

    rows = [(0, "p", 1, 1, 1), (1, "p", 2, 1, 1), (2, "p", 0, 1, 1),
            (2, "p", 3, 1, 1), (3, "p", 4, 1, 1)]
    one = kcore(_edges_ds(rows), k=2, rounds=1).to_pandas()
    assert dict(zip(one["entity_id"], one["deg"])) == {0: 2, 1: 2, 2: 3, 3: 1}
    done = kcore(_edges_ds(rows), k=2, rounds=2).to_pandas()
    assert dict(zip(done["entity_id"], done["deg"])) == {0: 2, 1: 2, 2: 2}
