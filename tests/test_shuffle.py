"""Deterministic shuffle export: manifest parity, order, resume, seed."""

import hashlib
import os
import shutil
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from duke_ray.stages.shuffle import (
    _hex_part,
    _shuffle_key,
    shuffle_export_to_dir,
    shuffle_manifest,
)


def _ds(n=800, parts=6):
    ids = np.arange(1, n + 1, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"doc {i}" for i in ids]})
    ).repartition(parts)


def _ref_keys(n):
    return {i: hashlib.md5(str(i).encode()).hexdigest() for i in range(1, n + 1)}


def test_shuffle_manifest_matches_scalar_reference(ray_session):
    man = (
        shuffle_manifest(_ds(), n_parts=16)
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    ref = defaultdict(lambda: [0, "g" * 32, "", 0])
    for i, k in _ref_keys(800).items():
        r = ref[int(k[0], 16)]
        r[0] += 1
        r[1] = min(r[1], k)
        r[2] = max(r[2], k)
        r[3] += i
    assert man["n_rows"].sum() == 800
    for row in man.itertuples():
        exp = ref[int(row.part)]
        assert (row.n_rows, row.min_key, row.max_key, row.sum_id) == tuple(exp)


def test_shuffle_manifest_partitioning_invariant_of_layout(ray_session):
    # pure function of doc_id: identical manifest at any input block count
    a = shuffle_manifest(_ds(parts=1), n_parts=256).to_pandas()
    b = shuffle_manifest(_ds(parts=13), n_parts=256).to_pandas()
    a = a.sort_values("part").reset_index(drop=True)
    b = b.sort_values("part").reset_index(drop=True)
    assert a.equals(b)


def test_hex_part_matches_int_parse():
    keys = np.array(
        [hashlib.md5(str(i).encode()).hexdigest() for i in range(50)], dtype="<U32"
    )
    for k in (1, 2, 3):
        got = _hex_part(keys, k)
        exp = np.array([int(s[:k], 16) for s in keys], np.int64)
        assert (got == exp).all()


def test_shuffle_export_order_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "shuf")
    res = shuffle_export_to_dir(_ds(), out, n_parts=16, fingerprint="f1")
    assert sum(res["rows"].values()) == 800
    assert res["skipped_buckets"] == []
    keys = _ref_keys(800)
    seen = []
    for p in range(16):
        f = os.path.join(out, f"bucket={p}", "data.parquet")
        if not os.path.exists(f):
            continue
        t = pq.read_table(f)
        # payload columns survive; helper columns dropped
        assert t.column_names == ["doc_id", "text"]
        seen += [keys[i] for i in t["doc_id"].to_pylist()]
    # reading buckets in order == the deterministic global permutation
    assert seen == sorted(keys.values())

    # resume pays only the missing partition
    shutil.rmtree(os.path.join(out, "bucket=5"), ignore_errors=True)
    os.remove(os.path.join(out, "_manifests", "bucket=5.json"))
    res2 = shuffle_export_to_dir(_ds(), out, n_parts=16, fingerprint="f1")
    assert res2["written_buckets"] == [5]
    assert len(res2["skipped_buckets"]) == 15
    t5 = pq.read_table(os.path.join(out, "bucket=5", "data.parquet"))
    assert t5.num_rows == res["rows"][5]


def test_shuffle_seed_changes_permutation(ray_session):
    base = shuffle_manifest(_ds(), n_parts=16).to_pandas()
    seeded = shuffle_manifest(_ds(), n_parts=16, seed="s1").to_pandas()
    merged = base.merge(seeded, on="part", suffixes=("_a", "_b"))
    assert merged["n_rows_a"].sum() == merged["n_rows_b"].sum() == 800
    assert not (merged["sum_id_a"] == merged["sum_id_b"]).all()
    # and the seeded key matches its scalar definition: md5(str(id) + seed)
    k = _shuffle_key(pa.array([42], pa.int64()), seed="s1")[0]
    assert k == hashlib.md5(b"42s1").hexdigest()


def test_shuffle_rejects_bad_n_parts(ray_session):
    with pytest.raises(ValueError):
        shuffle_manifest(_ds(), n_parts=10)
