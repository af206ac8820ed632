"""One-scan table profiler (stages/profile.py)."""

import numpy as np
import pyarrow as pa

import ray

from duke_ray.stages.profile import table_profile


def _rows(ds):
    return {r["column"]: r for r in ds.take_all()}


def test_profile_mixed_types_with_nulls(ray_session):
    t = pa.table(
        {
            "i": pa.array([3, None, -7, 10], pa.int64()),
            "f": pa.array([1.25, None, -0.6, 2.0], pa.float64()),
            "s": pa.array(["b", "", None, "aa"], pa.string()),
            "ts": pa.array([1_000_000, 2_000_000, None, 500_000], pa.timestamp("us")),
            "blob": pa.array([b"xy", None, b"", b"zzz"], pa.binary()),
        }
    )
    got = _rows(table_profile(ray.data.from_arrow(t).repartition(3)))
    assert got["i"]["n"] == 4 and got["i"]["n_null"] == 1
    assert (got["i"]["min_int"], got["i"]["max_int"], got["i"]["sum_int"]) == (-7, 10, 6)
    # floats are milli-quantized: floor(v*1000+0.5)
    assert (got["f"]["min_int"], got["f"]["max_int"], got["f"]["sum_int"]) == (
        -600, 2000, 1250 - 600 + 2000,
    )
    assert (got["s"]["min_str"], got["s"]["max_str"], got["s"]["total_len"]) == ("", "b", 3)
    assert got["s"]["n_null"] == 1
    assert (got["ts"]["min_int"], got["ts"]["max_int"]) == (500_000, 2_000_000)
    assert got["ts"]["sum_int"] == 0  # sentinel: epoch sums omitted
    assert got["blob"]["total_len"] == 5
    # sentinels, never nulls
    for r in got.values():
        assert r["min_str"] is not None and r["min_int"] is not None


def test_profile_all_null_column(ray_session):
    t = pa.table({"x": pa.array([None, None], pa.int64()), "y": pa.array([1, 2], pa.int64())})
    got = _rows(table_profile(ray.data.from_arrow(t)))
    assert got["x"]["n"] == 2 and got["x"]["n_null"] == 2
    assert (got["x"]["min_int"], got["x"]["max_int"], got["x"]["sum_int"]) == (0, 0, 0)
    assert got["y"]["sum_int"] == 3


def test_profile_multi_batch_combine(ray_session):
    n = 10_000
    t = pa.table(
        {
            "v": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "s": pa.array([f"k{i:05d}" for i in range(n)], pa.string()),
        }
    )
    got = _rows(table_profile(ray.data.from_arrow(t).repartition(8)))
    assert (got["v"]["min_int"], got["v"]["max_int"], got["v"]["sum_int"]) == (
        0, n - 1, n * (n - 1) // 2,
    )
    assert got["s"]["min_str"] == "k00000" and got["s"]["max_str"] == "k09999"
    assert got["s"]["total_len"] == 6 * n


def test_profile_column_subset(ray_session):
    t = pa.table({"a": pa.array([1], pa.int64()), "b": pa.array(["x"], pa.string())})
    got = _rows(table_profile(ray.data.from_arrow(t), columns=["a"]))
    assert set(got) == {"a"}
