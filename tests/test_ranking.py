"""group_topk (stages/ranking.py): distributed per-group top-k by value
vs a pandas ROW_NUMBER reference, on random data with heavy value ties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from duke_ray.stages.ranking import group_topk


def _reference(df: pd.DataFrame, k: int, descending: bool) -> pd.DataFrame:
    df = df.sort_values(
        ["key", "val", "tid"], ascending=[True, not descending, True]
    ).reset_index(drop=True)
    df["rk"] = df.groupby("key").cumcount() + 1
    return df[df["rk"] <= k].reset_index(drop=True)


@pytest.mark.parametrize("descending", [True, False])
def test_group_topk_matches_rownumber_reference(ray_session, descending):
    rng = np.random.default_rng(42)
    n = 20_000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 700, n),          # ~30 rows/key
            "val": rng.integers(0, 25, n),           # heavy ties -> tie_col decides
            "tid": np.arange(n, dtype=np.int64),
            "extra": rng.integers(0, 9, n),          # passthrough column
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        group_topk(ds, "key", "val", k=3, tie_col="tid", descending=descending)
        .to_pandas()
        .sort_values(["key", "rk"])
        .reset_index(drop=True)
    )
    want = _reference(df, 3, descending)
    pd.testing.assert_frame_equal(
        got[["key", "val", "tid", "extra", "rk"]].astype("int64"),
        want[["key", "val", "tid", "extra", "rk"]].astype("int64"),
    )


def test_group_topk_small_groups_keep_all_rows(ray_session):
    # k larger than every group: output == input, ranks dense per key
    df = pd.DataFrame({"key": [1, 1, 2], "val": [5, 9, 3], "tid": [0, 1, 2]})
    got = (
        group_topk(ray.data.from_pandas(df), "key", "val", k=10, tie_col="tid")
        .to_pandas()
        .sort_values(["key", "rk"])
        .reset_index(drop=True)
    )
    assert got["tid"].tolist() == [1, 0, 2]
    assert got["rk"].tolist() == [1, 2, 1]


def test_group_topk_rejects_bad_k(ray_session):
    df = pd.DataFrame({"key": [1], "val": [1], "tid": [1]})
    with pytest.raises(ValueError):
        group_topk(ray.data.from_pandas(df), "key", "val", k=0, tie_col="tid")
