"""Sequence packing: scalar parity, conservation, overflow semantics."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duke_ray.stages.pack import pack_assignments, pack_manifest


def _ref(ids, toks, budget):
    rows = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), int(i), int(t))
        for i, t in zip(ids, toks)
    )
    out, cum = {}, {}
    for k, i, t in rows:
        b = int(k[0], 16)
        before = cum.get(b, 0)
        out[i] = (b, before // budget)
        cum[b] = before + t
    return out


def _ds(ids, toks, parts=5):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
            }
        )
    ).repartition(parts)


def test_pack_assignments_match_scalar_reference(ray_session):
    rng = np.random.default_rng(11)
    ids = np.arange(1, 1201, dtype=np.int64)
    toks = rng.integers(0, 300, len(ids)).astype(np.int64)  # zero-len docs legal
    ref = _ref(ids, toks, 256)
    a = pack_assignments(_ds(ids, toks), budget=256).to_pandas()
    assert len(a) == len(ids)
    got = {int(r.doc_id): (int(r.bucket), int(r.seq_id)) for r in a.itertuples()}
    assert got == ref


def test_pack_manifest_conserves_and_matches(ray_session):
    rng = np.random.default_rng(12)
    ids = np.arange(1, 901, dtype=np.int64)
    toks = rng.integers(1, 200, len(ids)).astype(np.int64)
    m = pack_manifest(_ds(ids, toks), budget=256).to_pandas()
    assert m["n_docs"].sum() == len(ids)
    assert m["n_tokens"].sum() == toks.sum()
    ref = Counter(_ref(ids, toks, 256).values())
    got = {(int(r.bucket), int(r.seq_id)): int(r.n_docs) for r in m.itertuples()}
    assert got == dict(ref)
    # min_id/max_id bracket each sequence's members
    assert (m["min_id"] <= m["max_id"]).all()


def test_pack_layout_invariance(ray_session):
    ids = np.arange(1, 501, dtype=np.int64)
    toks = np.full(len(ids), 37, np.int64)
    a = pack_manifest(_ds(ids, toks, parts=1), budget=128).to_pandas()
    b = pack_manifest(_ds(ids, toks, parts=9), budget=128).to_pandas()
    key = ["bucket", "seq_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_pack_oversized_doc_consumes_slots(ray_session):
    # one doc far over budget: it owns the slot where it starts, and the
    # NEXT doc's seq id skips ahead by the slots it consumed
    ids = np.array([1, 2, 3], np.int64)
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), int(i)) for i in ids
    )
    # all three ids share bucket only if their first hex digit matches —
    # force one bucket by checking, else just verify per-doc math holds
    toks = {order[0][1]: 10, order[1][1]: 1000, order[2][1]: 10}
    a = pack_assignments(
        _ds(ids, np.array([toks[int(i)] for i in ids], np.int64)), budget=100
    ).to_pandas()
    got = {int(r.doc_id): (int(r.bucket), int(r.seq_id)) for r in a.itertuples()}
    ref = _ref(ids, [toks[int(i)] for i in ids], 100)
    assert got == ref
    # sanity on the semantics itself via the scalar model: within a bucket,
    # a successor of the 1000-token doc lands >= 10 slots later
    by_bucket = {}
    for k, i in order:
        by_bucket.setdefault(int(k[0], 16), []).append(i)
    for members in by_bucket.values():
        for prev, nxt in zip(members, members[1:]):
            if toks[prev] == 1000:
                assert ref[nxt][1] >= ref[prev][1] + 10


def test_pack_rejects_bad_budget(ray_session):
    with pytest.raises(ValueError):
        pack_manifest(_ds([1], [5], parts=1), budget=0)
    with pytest.raises(ValueError):
        pack_assignments(_ds([1], [5], parts=1), budget=0)


def test_pack_export_concatenates_in_pack_order(ray_session):
    from duke_ray.stages.pack import pack_export

    rng = np.random.default_rng(13)
    ids = np.arange(1, 401, dtype=np.int64)
    toks = rng.integers(1, 60, len(ids)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "text": pa.array([f"d{i}" for i in ids]),
            }
        )
    ).repartition(6)
    out = pack_export(ds, budget=128).to_pandas()
    ref = _ref(ids, toks, 128)
    # scalar reference concat: docs of each (bucket, seq) in key order
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), int(i)) for i in ids
    )
    texts, ntok = {}, {}
    for _, i in order:
        key = ref[i]
        texts.setdefault(key, []).append(f"d{i}")
        ntok[key] = ntok.get(key, 0) + int(toks[i - 1])
    got = {(int(r.bucket), int(r.seq_id)): r.seq_text for r in out.itertuples()}
    assert got == {k: " ".join(v) for k, v in texts.items()}
    gotn = {(int(r.bucket), int(r.seq_id)): int(r.n_tokens) for r in out.itertuples()}
    assert gotn == ntok
    assert out["n_docs"].sum() == len(ids)


def test_pack_export_empty_input(ray_session):
    from duke_ray.stages.pack import pack_export

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert len(pack_export(ds, budget=128).to_pandas()) == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 120),
    budget=st.integers(1, 50),
    seed=st.integers(0, 2**31 - 1),
)
def test_pack_partition_property_vs_scalar(n, budget, seed):
    # pure-kernel property: _pack_partition on ONE partition holding all
    # buckets must agree with the scalar greedy model for any sizes
    from duke_ray.stages.pack import _pack_partition
    from duke_ray.stages.sampling import _md5_hex
    from duke_ray.stages.shuffle import _KEY_HEX, _hex_part

    rng = np.random.default_rng(seed)
    ids = rng.choice(np.arange(1, 10 * n), size=n, replace=False).astype(np.int64)
    toks = rng.integers(0, 3 * budget, n).astype(np.int64)
    keys = _md5_hex(pa.array(ids, pa.int64()), _KEY_HEX)
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "skey": pa.array(keys),
            "bucket": pa.array(_hex_part(keys, 1), pa.int64()),
        }
    )
    out = _pack_partition(t, budget, manifest=False).to_pandas()
    ref = _ref(ids, toks, budget)
    got = {int(r.doc_id): (int(r.bucket), int(r.seq_id)) for r in out.itertuples()}
    assert got == ref


def test_pack_rejects_null_tokens(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "n_tokens": pa.array([5, None], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="null n_tokens"):
        pack_manifest(ds, budget=16).to_pandas()
