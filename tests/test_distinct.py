"""approx_distinct_by_group (stages/distinct.py): HLL sketch-per-key vs
exact distinct counts, and merge associativity across repartitions."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from duke_ray.stages.distinct import approx_distinct_by_group


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(3)
    n = 60_000
    return pd.DataFrame(
        {
            # 6 groups with very different true cardinalities
            "g": rng.choice(["a", "b", "c", "d", "e", "f"], n, p=[0.4, 0.25, 0.15, 0.1, 0.07, 0.03]),
            "v": rng.integers(0, 20_000, n),
        }
    )


def _exact(df: pd.DataFrame) -> dict:
    return df.groupby("g")["v"].nunique().to_dict()


def test_estimates_within_error_bound(ray_session, frame):
    ds = ray.data.from_pandas(frame).repartition(8)
    got = approx_distinct_by_group(ds, "g", "v", p=12).to_pandas()
    exact = _exact(frame)
    assert set(got["g"]) == set(exact)
    for _, r in got.iterrows():
        e = exact[r["g"]]
        # p=12: sd ~1.6%; 5% is >3 sd, and small groups are linear-counted
        assert abs(r["n_distinct_est"] - e) / e <= 0.05, (r["g"], r["n_distinct_est"], e)


def test_partitioning_invariance(ray_session, frame):
    """Sketch merge is associative: estimates must be IDENTICAL regardless
    of how rows are split into blocks."""
    a = (
        approx_distinct_by_group(ray.data.from_pandas(frame).repartition(2), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    b = (
        approx_distinct_by_group(ray.data.from_pandas(frame).repartition(16), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_integer_group_keys(ray_session):
    df = pd.DataFrame({"g": [1, 1, 2, 2, 2], "v": [10, 10, 1, 2, 3]})
    got = approx_distinct_by_group(ray.data.from_pandas(df), "g", "v").to_pandas()
    est = dict(zip(got["g"], got["n_distinct_est"]))
    assert est == {1: 1, 2: 3}  # linear-counting regime -> exact
