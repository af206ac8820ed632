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


def test_percentile_rank_milli_ties_and_edges(ray_session):
    from duke_ray.stages.ranking import percentile_rank_milli

    df = pd.DataFrame({"id": np.arange(7), "v": [5, 5, 1, 9, 5, 1, 9]})
    got = (
        percentile_rank_milli(ray.data.from_pandas(df).repartition(3), "v")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # N=7: cnt_less: v=1->0, v=5->2, v=9->5 ; milli = floor(1000*less/6)
    want = {1: 0, 5: 333, 9: 833}
    assert got["pct_milli"].tolist() == [want[v] for v in df["v"]]

    one = percentile_rank_milli(
        ray.data.from_pandas(pd.DataFrame({"id": [0], "v": [42]})), "v"
    ).to_pandas()
    assert one["pct_milli"].tolist() == [0]


def test_percentile_rank_milli_distinct_cap(ray_session):
    from duke_ray.stages.ranking import percentile_rank_milli

    df = pd.DataFrame({"v": np.arange(100)})
    with pytest.raises(ValueError, match="distinct"):
        percentile_rank_milli(ray.data.from_pandas(df), "v", max_distinct=10).to_pandas()
