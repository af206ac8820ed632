"""Deterministic KLL quantile sketch: scalar properties + distributed
sketch_quantiles (the unbounded-range quantile scale path)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from duke_ray.functions.kll import DEFAULT_K, EPS_RANK, KLLSketch
from duke_ray.stages.textstats import rank_bounds, sketch_quantiles

QS = (0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)


def interval_rank_err(sorted_vals: np.ndarray, q: float, est: float) -> float:
    """Distance from q to the estimate's true rank interval — the right
    error metric under ties (a tied value legitimately covers a rank
    RANGE, not a point)."""
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left") / n
    hi = np.searchsorted(sorted_vals, est, side="right") / n
    return max(0.0, lo - q, q - hi)


def merged_over_splits(vals: np.ndarray, n_splits: int, k: int = DEFAULT_K) -> KLLSketch:
    parts = [p for p in np.array_split(vals, n_splits) if len(p)]
    sks = [KLLSketch(k).update_many(p) for p in parts]
    sks.sort(key=lambda s: s.canonical_key())
    out = KLLSketch(k)
    for s in sks:
        out.merge(s)
    return out


def test_kll_exact_weight_and_bounded_state():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=200_000)
    sk = merged_over_splits(vals, 23)
    assert sk.total_weight() == len(vals)
    assert sk.n == len(vals)
    # state is k * n_levels, levels ~ log2(n/k)
    n_levels = len(sk.levels)
    assert sk.n_retained() <= DEFAULT_K * n_levels + n_levels
    assert n_levels <= int(np.log2(len(vals))) + 2


@pytest.mark.parametrize(
    "make",
    [
        lambda rng, n: rng.normal(size=n),
        lambda rng, n: np.sort(rng.normal(size=n)),
        lambda rng, n: np.sort(rng.normal(size=n))[::-1].copy(),
        lambda rng, n: rng.integers(0, 5, size=n).astype(np.float64),  # heavy ties
        lambda rng, n: np.exp(rng.uniform(-690, 690, size=n)),  # 1e-300..1e300
        lambda rng, n: np.zeros(n),
    ],
)
def test_kll_rank_error_within_half_eps(make):
    rng = np.random.default_rng(11)
    n = 300_000
    vals = make(rng, n)
    sk = merged_over_splits(vals, 37)
    srt = np.sort(vals)
    ests = sk.quantiles(QS)
    for q, e in zip(QS, ests):
        assert interval_rank_err(srt, q, e) <= EPS_RANK / 2, (q, e)


def test_kll_merge_order_canonicalized():
    rng = np.random.default_rng(5)
    vals = rng.exponential(size=50_000)
    parts = [p for p in np.array_split(vals, 17)]
    base = [KLLSketch(DEFAULT_K).update_many(p) for p in parts]
    outs = []
    for perm_seed in (0, 1, 2):
        order = np.random.default_rng(perm_seed).permutation(len(base))
        sks = sorted((base[i] for i in order), key=lambda s: s.canonical_key())
        m = KLLSketch(DEFAULT_K)
        for s in sks:
            m.merge(s)
        outs.append(m.quantiles(QS))
    assert np.array_equal(outs[0], outs[1]) and np.array_equal(outs[0], outs[2])


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=2000,
    ),
    n_splits=st.integers(1, 9),
    k=st.sampled_from([8, 32, 400]),
)
def test_kll_property_vs_scalar_reference(data, n_splits, k):
    """Any finite float data, any split: exact weight, and every
    quantile's rank interval within the k-dependent bound of q.
    At tiny k the bound degrades ~1/k-ish; use a loose cap for k=8/32
    and the documented EPS for the default k."""
    vals = np.asarray(data, np.float64)
    sk = merged_over_splits(vals, n_splits, k=k)
    assert sk.total_weight() == len(vals)
    srt = np.sort(vals)
    eps = EPS_RANK if k >= 400 else (0.30 if k == 8 else 0.12)
    for q, e in zip(QS, sk.quantiles(QS)):
        assert interval_rank_err(srt, q, e) <= eps, (k, q, e)


def test_kll_validation():
    sk = KLLSketch()
    with pytest.raises(ValueError):
        KLLSketch(4)
    with pytest.raises(ValueError):
        sk.update_many(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        sk.quantiles([0.5])  # empty sketch
    sk.update_many(np.array([1.0]))
    with pytest.raises(ValueError):
        sk.quantiles([0.0])
    with pytest.raises(ValueError):
        sk.quantiles([1.1])
    with pytest.raises(ValueError):
        KLLSketch(8).merge(KLLSketch(16))
    # exact tiny-n behavior: all values retained, quantiles exact
    s2 = KLLSketch().update_many(np.array([3.0, 1.0, 2.0]))
    assert s2.quantiles([1 / 3, 2 / 3, 1.0]).tolist() == [1.0, 2.0, 3.0]
    assert s2.rank(2.0) == 2


def test_sketch_quantiles_distributed(ray_session):
    rng = np.random.default_rng(9)
    vals = np.exp(rng.uniform(-200, 200, size=120_000))  # huge range
    t = pa.table({"value": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(8)
    out = sketch_quantiles(ds, "value", qs_milli=(100, 500, 900)).to_pandas()
    assert out["n"].tolist() == [len(vals)] * 3
    srt = np.sort(vals)
    for q_milli, est in zip(out["q_milli"], out["estimate"]):
        assert interval_rank_err(srt, q_milli / 1000.0, est) <= EPS_RANK
    # the live invariant helper agrees with the serial ranks
    lt, le, n = rank_bounds(ds, "value", out["estimate"].to_numpy())
    assert n == len(vals)
    np.testing.assert_array_equal(
        lt, np.searchsorted(srt, out["estimate"].to_numpy(), side="left")
    )
    np.testing.assert_array_equal(
        le, np.searchsorted(srt, out["estimate"].to_numpy(), side="right")
    )


def test_sketch_quantiles_nulls_and_empty(ray_session):
    t = pa.table({"value": pa.array([None, 1.0, None, 2.0], pa.float64())})
    out = sketch_quantiles(ray.data.from_arrow(t), "value", qs_milli=(500, 1000)).to_pandas()
    assert out["n"].tolist() == [2, 2]
    assert out["estimate"].tolist() == [1.0, 2.0]
    empty = pa.table({"value": pa.array([None, None], pa.float64())})
    out2 = sketch_quantiles(ray.data.from_arrow(empty), "value").to_pandas()
    assert len(out2) == 0
    with pytest.raises(ValueError):
        sketch_quantiles(ray.data.from_arrow(t), "value", qs_milli=(0,))


def test_sketch_quantiles_by_group_rank_error(ray_session):
    from duke_ray.functions.kll import EPS_RANK
    from duke_ray.stages.textstats import (
        grouped_rank_bounds,
        sketch_quantiles_by_group,
    )

    rng = np.random.default_rng(9)
    n = 40000
    g = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    v = np.where(g == "x", np.exp(rng.uniform(-200, 200, n)), rng.normal(0, 1, n))
    v = np.where(g == "y", rng.integers(0, 3, n).astype(float), v)  # ties
    ds = ray.data.from_arrow(pa.table({"seg": g, "value": v})).repartition(8)
    qs = (10, 500, 990)
    out = sketch_quantiles_by_group(ds, "seg", "value", qs_milli=qs).to_pandas()
    assert sorted(out["seg"].unique()) == ["x", "y", "z"]
    est = {
        grp: sub.sort_values("q_milli")["estimate"].to_numpy()
        for grp, sub in out.groupby("seg")
    }
    rb = grouped_rank_bounds(ds, "seg", "value", est)
    for grp, (lt, le, ng) in rb.items():
        assert ng == int((g == grp).sum())
        assert set(out[out["seg"] == grp]["n"]) == {ng}
        for q_milli, lo, hi in zip(qs, lt, le):
            err = max(0.0, lo / ng - q_milli / 1000.0, q_milli / 1000.0 - hi / ng)
            assert err <= EPS_RANK, (grp, q_milli, err)
    # small exact-regime group: estimates are exact quantile values
    for q_milli, est_v in zip(qs, est["y"]):
        assert est_v in (0.0, 1.0, 2.0)


def test_sketch_quantiles_by_group_nulls_and_validation(ray_session):
    from duke_ray.stages.textstats import sketch_quantiles_by_group

    t = pa.table(
        {
            "seg": ["a", "a", "b", "b"],
            "value": pa.array([None, 3.0, None, None], pa.float64()),
        }
    )
    out = sketch_quantiles_by_group(
        ray.data.from_arrow(t), "seg", "value", qs_milli=(500,)
    ).to_pandas()
    # all-null group b absent; a's single value is its median, n == 1
    assert out["seg"].tolist() == ["a"]
    assert out["estimate"].tolist() == [3.0]
    assert out["n"].tolist() == [1]
    with pytest.raises(ValueError):
        sketch_quantiles_by_group(
            ray.data.from_arrow(t), "seg", "value", qs_milli=(1001,)
        )


def test_value_histogram_exact(ray_session):
    from duke_ray.stages.textstats import value_histogram

    vals = np.array([0.0, 0.25, 0.4999, 0.5, 0.9999, 1.0, -0.1], np.float64)
    ds = ray.data.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    out = (
        value_histogram(ds, "value", lo_milli=0, hi_milli=1000, n_bins=2)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    # [0, 500): 0, 250, 499.9->500? ROUND(499.9)=500 -> bin 1. Recompute:
    # vm = round(v*1000): 0,250,500(!),500,1000(excluded),1000(excl),-100(excl)
    assert out.loc[0, "n"] == 2 and out.loc[0, "sum_milli"] == 250
    assert out.loc[1, "n"] == 2 and out.loc[1, "sum_milli"] == 1000
    with pytest.raises(ValueError):
        value_histogram(ds, "value", lo_milli=5, hi_milli=5)
