"""Global sorted export: range partitioning, total order, resume."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from duke_ray.stages.sortexport import range_bounds, sort_export_to_dir, sort_manifest


def _ds(seed=7, n=500):
    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "val": pa.array(rng.integers(0, 60, n).astype(np.int64)),
            }
        )
    ).repartition(5)


def test_sort_manifest_counts_and_ranges(ray_session):
    ds = _ds()
    man = sort_manifest(ds, "val", n_parts=8, id_col="doc_id").to_pandas()
    man = man.sort_values("part").reset_index(drop=True)
    assert man["n_rows"].sum() == 500
    # partitions are ordered and non-overlapping: max_val of part i is <=
    # min_val of part j for i < j (ties share a partition, so strict <
    # between ADJACENT value ranges is not required — non-overlap is)
    for i in range(1, len(man)):
        assert man.loc[i - 1, "max_val"] <= man.loc[i, "min_val"]


def test_sort_export_total_order_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "sorted")
    ds = _ds()
    res = sort_export_to_dir(ds, "val", out, n_parts=8, id_col="doc_id", fingerprint="f1")
    assert sorted(res["written_buckets"]) == list(range(8))

    # read buckets in ascending order -> globally sorted (val, doc_id)
    seen = []
    total = 0
    for p in range(8):
        f = os.path.join(out, f"bucket={p}", "data.parquet")
        if not os.path.exists(f):
            continue
        t = pq.read_table(f)
        total += t.num_rows
        pairs = list(zip(t["val"].to_pylist(), t["doc_id"].to_pylist()))
        assert pairs == sorted(pairs)  # sorted within the file
        seen.extend(pairs)
    assert total == 500
    assert seen == sorted(seen)  # total order across bucket boundaries

    # resume: drop two manifests + one bucket dir -> rerun rewrites ONLY those
    os.remove(os.path.join(out, "_manifests", "bucket=3.json"))
    os.remove(os.path.join(out, "_manifests", "bucket=5.json"))
    import shutil

    shutil.rmtree(os.path.join(out, "bucket=3"))
    res2 = sort_export_to_dir(ds, "val", out, n_parts=8, id_col="doc_id", fingerprint="f1")
    assert sorted(res2["written_buckets"]) == [3, 5]
    assert len(res2["skipped_buckets"]) == 6
    t3 = pq.read_table(os.path.join(out, f"bucket=3", "data.parquet"))
    assert t3.num_rows == res2["rows"][3] > 0

    # fingerprint bump invalidates everything
    res3 = sort_export_to_dir(ds, "val", out, n_parts=8, id_col="doc_id", fingerprint="f2")
    assert sorted(res3["written_buckets"]) == list(range(8))


def test_range_bounds_validation(ray_session):
    ds = _ds(n=10)
    with pytest.raises(ValueError):
        range_bounds(ds, "val", 7)  # 7 does not divide 1000
    assert list(range_bounds(ds, "val", 1)) == []


def test_sort_manifest_all_ties_single_partition(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(20, dtype=np.int64)),
                "val": pa.array(np.full(20, 42, np.int64)),
            }
        )
    )
    man = sort_manifest(ds, "val", n_parts=8, id_col="doc_id").to_pandas()
    # every boundary equals 42 and assignment counts bounds < val == 0
    assert list(man["part"]) == [0]
    assert man.loc[0, "n_rows"] == 20


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(st.integers(0, 12), min_size=1, max_size=60),
    n_parts=st.sampled_from([2, 4, 8, 10]),
)
def test_sort_manifest_property_vs_scalar(ray_session, vals, n_parts):
    """Random small-value-space data (heavy ties) through the distributed
    manifest equals a scalar reference applying the same PERCENTILE_DISC
    ceil rule and bounds-strictly-below assignment."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(vals), dtype=np.int64)),
                "val": pa.array(np.asarray(vals, np.int64)),
            }
        )
    ).repartition(3)
    got = {
        int(r.part): (r.n_rows, r.min_val, r.max_val, r.min_id, r.max_id)
        for r in sort_manifest(ds, "val", n_parts=n_parts).to_pandas().itertuples()
    }
    # scalar reference
    sv = sorted(vals)
    n = len(sv)
    bounds = sorted(
        sv[(p * n + 999) // 1000 - 1]
        for p in (i * 1000 // n_parts for i in range(1, n_parts))
    )
    want = {}
    for i, v in enumerate(vals):
        part = sum(1 for b in bounds if b < v)
        r = want.setdefault(part, [0, v, v, i, i])
        r[0] += 1
        r[1], r[2] = min(r[1], v), max(r[2], v)
        r[3], r[4] = min(r[3], i), max(r[4], i)
    assert got == {k: tuple(v) for k, v in want.items()}
