"""Deterministic random walks: scalar parity, sinks, layout invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duke_ray.stages.walks import _walk_choice, random_walks


def _scalar_walks(src, dst, walk_len, n_reps):
    adj = {}
    for s, d in sorted(set(zip(map(int, src), map(int, dst)))):
        adj.setdefault(s, []).append(d)
    ref = {}
    for node in sorted(adj):
        for r in range(n_reps):
            w = node * n_reps + r
            u = node
            ref[(w, 0)] = u
            for t in range(walk_len):
                nbrs = adj.get(u)
                if not nbrs:
                    break
                c = int(_walk_choice(np.array([w]), t, np.array([u]))[0]) % len(nbrs)
                u = nbrs[c]
                ref[(w, t + 1)] = u
    return ref


def _got(out):
    return {(int(r.walk_id), int(r.step)): int(r.node) for r in out.itertuples()}


def test_walks_match_scalar_reference(ray_session):
    rng = np.random.default_rng(21)
    src = rng.integers(1, 300, 4000).astype(np.int64)
    dst = rng.integers(1, 300, 4000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    out = random_walks(ds, walk_len=3, n_reps=2).to_pandas()
    assert _got(out) == _scalar_walks(src, dst, 3, 2)


def test_walks_layout_invariant_and_duplicate_edges(ray_session):
    # duplicated parallel edges must not change adjacency positions
    src = np.array([1, 1, 1, 2, 2, 1], np.int64)
    dst = np.array([2, 3, 2, 1, 3, 2], np.int64)
    ref = _scalar_walks(src, dst, 4, 1)
    for parts in (1, 4):
        ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(parts)
        assert _got(random_walks(ds, walk_len=4, n_reps=1).to_pandas()) == ref


def test_walks_stop_at_sinks(ray_session):
    # chain 1 -> 2 -> 3, 3 is a sink: every walk is exactly the suffix
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 3], pa.int64())})
    )
    out = random_walks(ds, walk_len=5, n_reps=1).to_pandas()
    got = _got(out)
    assert got == {
        (1, 0): 1,
        (1, 1): 2,
        (1, 2): 3,
        (2, 0): 2,
        (2, 1): 3,
    }


def test_walks_validation(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())})
    )
    with pytest.raises(ValueError):
        random_walks(ds, walk_len=0)
    with pytest.raises(ValueError):
        random_walks(ds, n_reps=0)


def test_walk_texts_assembles_in_step_order(ray_session):
    from duke_ray.stages.walks import walk_texts

    rows = pa.table(
        {
            "walk_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
            "step": pa.array([2, 0, 1, 1, 0], pa.int64()),
            "node": pa.array([30, 10, 20, 55, 44], pa.int64()),
        }
    )
    out = walk_texts(ray.data.from_arrow(rows).repartition(3)).to_pandas()
    got = dict(zip(out["walk_id"], out["text"]))
    assert got == {7: "10 20 30", 9: "44 55"}


def test_walks_to_texts_end_to_end(ray_session):
    from duke_ray.stages.walks import walk_texts

    src = np.array([1, 2, 3], np.int64)
    dst = np.array([2, 3, 1], np.int64)  # 3-cycle: no sinks
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    walks = random_walks(ds, walk_len=3, n_reps=1)
    out = walk_texts(walks).to_pandas()
    assert len(out) == 3
    # each sentence is the deterministic cycle path of length 4
    ref = _scalar_walks(src, dst, 3, 1)
    for wid, text in zip(out["walk_id"], out["text"]):
        path = [str(ref[(int(wid), s)]) for s in range(4)]
        assert text == " ".join(path)
