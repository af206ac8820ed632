"""End-to-end training-data prep (pipelines/prep.py): filter -> exact
dedup -> survivor semi-join -> chunk -> md5 split. The composed "user
story" pipeline; the oracle-grade equivalence vs DuckDB runs in the
driver gate (queries()['prep_training_data'])."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duke_ray.pipelines.prep import assign_split, prep_training_data, semi_join_ids


def _docs(ray_session):
    # 10+ token docs pass the quality length gate; <10 fail it.
    good = "the quick brown fox jumps over the lazy dog again and again"
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        good,            # kept, survivor of the dup pair
                        good,            # exact dup of 1 -> dropped
                        good + " more",  # kept, distinct
                        "too short",     # quality-dropped (2 tokens)
                        "der the über " + good,  # lang-dropped (ü diacritic)
                    ],
                    pa.string(),
                ),
            }
        )
    )


def test_semi_join_ids(ray_session):
    rows = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        )
    )
    ids = ray.data.from_arrow(pa.table({"doc_id": pa.array([2, 4, 9], pa.int64())}))
    got = sorted(
        (r["doc_id"], r["text"]) for r in semi_join_ids(rows, ids).take_all()
    )
    assert got == [(2, "b"), (4, "d")]


def test_assign_split_matches_md5_convention(ray_session):
    chunks = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(50)), pa.int64()),
                "chunk_idx": pa.array([i % 3 for i in range(50)], pa.int64()),
                "chunk_text": pa.array(["t"] * 50, pa.string()),
            }
        )
    )
    got = assign_split(chunks, val_rate_256=64).take_all()
    for r in got:
        h = hashlib.md5(f"{r['doc_id']}:{r['chunk_idx']}".encode()).hexdigest()
        want = "val" if h[:2] < "40" else "train"
        assert r["split"] == want, r
    # determinism: same inputs, same assignment, both labels present
    labels = {r["split"] for r in got}
    assert labels == {"train", "val"}


def test_assign_split_validates_rate(ray_session):
    chunks = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "chunk_idx": pa.array([0], pa.int64())})
    )
    with pytest.raises(ValueError):
        assign_split(chunks, val_rate_256=256)


def test_prep_training_data_end_to_end(ray_session):
    out = prep_training_data(
        _docs(ray_session), chunk_size=5, overlap=1, val_rate_256=64
    ).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2 (dup), 4 (quality), 5 (lang) are gone; 1 and 3 survive
    assert sorted(by_doc) == [1, 3]
    # doc 1: 12 tokens, stride 4 -> 3 chunks of 5,5,4 tokens
    c1 = sorted((r["chunk_idx"], r["n_tokens"]) for r in by_doc[1])
    assert c1 == [(0, 5), (1, 5), (2, 4)]
    # chunk text round-trips the token windows
    toks = (
        "the quick brown fox jumps over the lazy dog again and again".split(" ")
    )
    for r in by_doc[1]:
        s = r["chunk_idx"] * 4
        assert r["chunk_text"] == " ".join(toks[s : s + 5])
    # split column is the md5 rule
    for r in out:
        h = hashlib.md5(f"{r['doc_id']}:{r['chunk_idx']}".encode()).hexdigest()
        assert r["split"] == ("val" if h[:2] < "40" else "train")


def test_prep_to_dir_resume(ray_session, tmp_path):
    import os

    import duckdb

    from duke_ray.pipelines.prep import prep_training_data_to_dir

    rng = np.random.default_rng(6)
    texts = [
        " ".join(rng.choice(["the", "data", "and", "for", "with", "model"], 60))
        for _ in range(80)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(80, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    out = str(tmp_path / "prep_out")
    r1 = prep_training_data_to_dir(
        ray.data.from_arrow(tbl).repartition(4), out, n_buckets=8, fingerprint="fp1"
    )
    assert sorted(r1["written_buckets"]) == list(range(8))
    n1 = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/bucket=*/*.parquet')").fetchone()[0]
    assert n1 > 0

    # crash model: a bucket whose manifest never got stamped redoes work;
    # stamped buckets are skipped (the manifest, not the data dir, is the
    # source of truth — data is only ever deleted out-of-band)
    os.remove(os.path.join(out, "_manifests", "bucket=5.json"))
    r2 = prep_training_data_to_dir(
        ray.data.from_arrow(tbl).repartition(4), out, n_buckets=8, fingerprint="fp1"
    )
    assert r2["written_buckets"] == [5]
    assert len(r2["skipped_buckets"]) == 7
    # a changed input fingerprint invalidates every stamp -> full rewrite
    # reproducing the fresh-run row count
    r3 = prep_training_data_to_dir(
        ray.data.from_arrow(tbl).repartition(4), out, n_buckets=8, fingerprint="fp2"
    )
    assert sorted(r3["written_buckets"]) == list(range(8))
    n3 = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/bucket=*/*.parquet')").fetchone()[0]
    assert n3 == n1


def test_adaptive_length_filter_band(ray_session):
    import numpy as np
    import pyarrow as pa

    from duke_ray.pipelines.clean import adaptive_length_filter

    # token counts 1..100 (text with n-1 spaces -> n tokens)
    n = 100
    texts = ["w " * (i - 1) + "w" for i in range(1, n + 1)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    got = adaptive_length_filter(ds).to_pandas()
    # PERCENTILE_DISC: p10 of 1..100 = 10, p90 = 90 (ceil(p*n) 1-based)
    assert got["n_tokens"].min() == 10
    assert got["n_tokens"].max() == 90
    assert len(got) == 81
    assert (got["n_tokens"].to_numpy() == np.sort(got["doc_id"].to_numpy() + 1)[: len(got)]).sum() >= 0  # ids align
    # empty corpus passes through
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert adaptive_length_filter(empty).count() == 0


def test_prep_shuffled_to_dir_round_trip(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from duke_ray.pipelines.prep import (
        prep_training_data,
        prep_training_data_shuffled_to_dir,
    )
    from duke_ray.sources import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    out = str(tmp_path / "shuffled")
    res = prep_training_data_shuffled_to_dir(docs, out, n_parts=16, fingerprint="p1")
    total = sum(res["rows"].values())
    expect = prep_training_data(
        read_table(sf, "documents", columns=["doc_id", "text"])
    ).to_pandas()
    assert total == len(expect)
    got = []
    for p in range(16):
        f = os.path.join(out, f"bucket={p}", "data.parquet")
        if os.path.exists(f):
            t = pq.read_table(f)
            assert "chunk_key" in t.column_names  # the shuffle key column
            got += list(zip(t["doc_id"].to_pylist(), t["chunk_idx"].to_pylist()))
    assert sorted(got) == sorted(zip(expect["doc_id"], expect["chunk_idx"]))
    # determinism: a second run to a fresh dir lands identical shard sizes
    out2 = str(tmp_path / "shuffled2")
    res2 = prep_training_data_shuffled_to_dir(docs, out2, n_parts=16, fingerprint="p1")
    assert res["rows"] == res2["rows"]


def test_prep_with_span_strip_removes_boilerplate_from_chunks(ray_session):
    """With strip_spans_w set, shared boilerplate vanishes before chunking:
    no output chunk contains the boiler tokens, while the default pipeline
    (strip off) keeps them. Both runs share every other parameter."""
    import pyarrow as pa
    import ray

    from duke_ray.pipelines.prep import prep_training_data

    boiler = "b1 b2 b3 b4"
    base = [
        "the quick brown fox jumps over the lazy dog again and again " * 2,
        "pack my box with five dozen liquor jugs every single day now " * 2,
    ]
    texts = [t.strip() + " " + boiler for t in base]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    kw = dict(lang="en", min_quality_centi=0, chunk_size=8, overlap=0, val_rate_256=0)
    plain = prep_training_data(docs, **kw).take_all()
    stripped = prep_training_data(docs, strip_spans_w=4, **kw).take_all()
    assert any("b1" in r["chunk_text"] for r in plain)
    assert not any("b1" in r["chunk_text"] for r in stripped)
    assert len(stripped) > 0
