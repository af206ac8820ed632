"""Sampling operators: deterministic hash sample + token-budget head."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from duke_ray.stages.sampling import hash_sample, token_budget_head


@pytest.fixture(scope="module")
def docs_table(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def test_hash_sample_matches_direct_md5(ray_session, docs_table):
    ds = ray.data.from_arrow(docs_table)
    got = sorted(hash_sample(ds, rate_256=64).select_columns(["doc_id"]).to_pandas()["doc_id"])

    ids = docs_table["doc_id"].to_pylist()
    want = sorted(
        i for i in ids if hashlib.md5(str(i).encode()).hexdigest()[:2] < "40"
    )
    assert got == want
    # sanity: the rate is roughly 25% (md5 is uniform)
    assert 0.15 < len(want) / len(ids) < 0.35


def test_hash_sample_rate_bounds(ray_session, docs_table):
    """rate_256 >= 256 keeps everything; negative rates raise (ADVICE r3:
    a 3-hex bound vs 2-char prefixes silently inverted 'keep all' to ~1/16)."""
    ds = ray.data.from_arrow(docs_table)
    assert hash_sample(ds, rate_256=256).count() == docs_table.num_rows
    assert hash_sample(ds, rate_256=1000).count() == docs_table.num_rows
    assert hash_sample(ds, rate_256=0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(ds, rate_256=-1)


def test_md5_hex_respects_array_offset():
    """A sliced string array (offset != 0) must hash each row's own bytes —
    the offsets buffer is shared with the parent array (ADVICE r3)."""
    import pyarrow as pa

    from duke_ray.stages.sampling import _md5_hex

    full = pa.array([str(i) for i in range(100)], pa.string())
    sliced = full.slice(37, 41)
    assert sliced.offset == 37
    got = _md5_hex(sliced, 32)
    want = [hashlib.md5(str(i).encode()).hexdigest() for i in range(37, 78)]
    assert list(got) == want


def test_hash_sample_stable_across_partitionings(ray_session, docs_table):
    """Pure function of the key: any block layout yields the same subset."""
    a = ray.data.from_arrow(docs_table)
    b = ray.data.from_arrow(docs_table).repartition(7)
    sa = sorted(hash_sample(a, rate_256=32).select_columns(["doc_id"]).to_pandas()["doc_id"])
    sb = sorted(hash_sample(b, rate_256=32).select_columns(["doc_id"]).to_pandas()["doc_id"])
    assert sa == sb


def test_token_budget_head_matches_pandas_cumsum(ray_session, docs_table):
    budget = 10_000
    ds = ray.data.from_arrow(docs_table)
    got = (
        token_budget_head(ds, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    df = docs_table.to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = df["text"].str.split(" ").str.len().astype("int64")
    cum = n.cumsum()
    keep = cum <= budget
    want = pd.DataFrame(
        {
            "doc_id": df["doc_id"][keep].astype("int64"),
            "n_tokens": n[keep],
            "cum_tokens": cum[keep],
        }
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the head is a prefix in id order and the budget binds (some doc excluded)
    assert keep.sum() < len(df)
    assert got["cum_tokens"].iloc[-1] <= budget


def test_token_budget_head_small_bucket_size(ray_session, docs_table):
    """Bucket boundaries inside batches exercise the reset-at-boundary path."""
    budget = 5_000
    ds = ray.data.from_arrow(docs_table).repartition(5)
    got = (
        token_budget_head(ds, budget=budget, bucket_size=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = docs_table.to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = df["text"].str.split(" ").str.len().astype("int64")
    cum = n.cumsum()
    keep = cum <= budget
    assert got["doc_id"].tolist() == df["doc_id"][keep].astype("int64").tolist()
    assert np.array_equal(got["cum_tokens"].to_numpy(), cum[keep].to_numpy())


def test_stratified_hash_topk_matches_pandas(ray_session, sf_dir):
    from duke_ray.stages.sampling import stratified_hash_topk

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    ds = ray.data.from_arrow(docs).repartition(6)
    got = (
        stratified_hash_topk(ds, k=5, group_col="lang")
        .to_pandas()
        .sort_values(["lang", "rank_hex", "doc_id"])
        .reset_index(drop=True)
    )

    df = docs.to_pandas()
    df["rank_hex"] = [
        hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]
    ]
    want = (
        df.sort_values(["lang", "rank_hex", "doc_id"])
        .groupby("lang", sort=True)
        .head(5)[["lang", "doc_id", "rank_hex"]]
        .reset_index(drop=True)
    )
    want["doc_id"] = want["doc_id"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # every group hit its quota (or its full size)
    sizes = df.groupby("lang").size()
    for lang, n in got.groupby("lang").size().items():
        assert n == min(5, sizes[lang])


def test_mixture_sample_quotas(ray_session):
    import hashlib

    from duke_ray.stages.sampling import mixture_sample

    rng = np.random.default_rng(2)
    langs = rng.choice(["en", "de", "fr"], 500).tolist()
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(500, dtype=np.int64)),
            "lang": pa.array(langs),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(6)
    got = mixture_sample(ds, {"en": 7, "de": 3}).to_pandas()
    # serial reference
    want = []
    for g, quota in (("en", 7), ("de", 3)):
        ids = [i for i in range(500) if langs[i] == g]
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want += [(g, i) for i in ranked[:quota]]
    got_pairs = sorted(zip(got["lang"], got["doc_id"]))
    assert got_pairs == sorted(want)
    assert "fr" not in set(got["lang"])  # absent group dropped

    with pytest.raises(ValueError):
        mixture_sample(ds, {})
    with pytest.raises(ValueError):
        mixture_sample(ds, {"en": 0})


def test_weighted_sample_rule_exact(ray_session):
    import hashlib

    import numpy as np
    import pyarrow as pa

    from duke_ray.stages.sampling import weighted_sample

    n = 2000
    rng = np.random.default_rng(3)
    w = rng.integers(0, 1500, n).astype(np.int64)  # spans 0, <W and >=W
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "w": pa.array(w, pa.int64()),
            }
        )
    ).repartition(4)
    got = set(weighted_sample(ds, "w", 1000, id_col="doc_id").to_pandas()["doc_id"])
    want = set()
    for i in range(n):
        pref = hashlib.md5(str(i).encode()).hexdigest()[:4]
        if w[i] >= 1000 or pref < format(int(w[i]) * 65536 // 1000, "04x"):
            want.add(i)
    assert got == want
    # zero-weight rows never survive; full-weight rows always do
    assert not any(w[i] == 0 for i in got)
    kept_frac = len(got) / n
    assert 0.3 < kept_frac < 0.8  # E[p] ~ 0.54 for uniform weights


def test_weighted_sample_validates(ray_session):
    import pyarrow as pa

    from duke_ray.stages.sampling import weighted_sample

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "w": pa.array([5], pa.int64())})
    )
    with pytest.raises(ValueError):
        weighted_sample(ds, "w", 0)


def test_global_hash_topk_exact_k(ray_session):
    import hashlib

    from duke_ray.stages.sampling import global_hash_topk

    ids = np.arange(1, 501, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(7)
    out = global_hash_topk(ds, k=40).to_pandas()
    ref = sorted((hashlib.md5(str(i).encode()).hexdigest(), int(i)) for i in ids)[:40]
    assert len(out) == 40
    assert sorted(zip(out["rank_hex"], out["doc_id"])) == ref
    # k > N returns everything; layout does not matter
    assert len(global_hash_topk(ds.repartition(1), k=10_000).to_pandas()) == 500
    with pytest.raises(ValueError):
        global_hash_topk(ds, k=0)
