"""Varied-corpus synthesis (dedup/similarity endurance input).

The generator's contract is the closed-form ground truth the endurance
bench asserts against: planted pairs (and only planted pairs) are
near-dups, nothing is byte-identical, everything is deterministic.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from duke_ray.synth import (
    VARIED_PAIR_STRIDE,
    is_planted_pair_arrow,
    planted_pair_ids,
    varied_documents_batch,
)


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _trigrams(t: str) -> set:
    w = t.split(" ")
    return {tuple(w[i : i + 3]) for i in range(len(w) - 2)}


def test_varied_deterministic_and_ids(docs):
    n = docs.num_rows
    a = varied_documents_batch(docs, 3, n)
    b = varied_documents_batch(docs, 3, n)
    assert a.equals(b)
    assert a["doc_id"][0].as_py() == 3 * n
    assert a["doc_id"][n - 1].as_py() == 4 * n - 1


def test_varied_non_planted_zero_overlap(docs):
    """Different (doc, seed) rows share ZERO trigram shingles — the stride
    rewrite puts a seed-keyed token in every window."""
    n = docs.num_rows
    r0 = varied_documents_batch(docs, 0, n)["text"].to_pylist()
    r2 = varied_documents_batch(docs, 2, n)["text"].to_pylist()
    g0 = [_trigrams(t) for t in r0]
    for i in range(0, n, 7):
        assert not (g0[i] & _trigrams(r2[i]))  # same doc, different seed
        assert not (g0[i] & g0[(i + 1) % n])  # different docs


def test_varied_planted_pairs_near_dup_not_exact(docs):
    n = docs.num_rows
    lo = varied_documents_batch(docs, 0, n)["text"].to_pylist()
    hi = varied_documents_batch(docs, 1, n)["text"].to_pylist()
    js = []
    for a, b in zip(lo, hi):
        assert a != b  # position 0 always rewritten in the pair replica
        A, B = _trigrams(a), _trigrams(b)
        js.append(len(A & B) / max(1, len(A | B)))
    js = np.array(js)
    assert np.median(js) >= 0.8
    assert (js >= 0.6).mean() >= 0.93


def test_planted_pair_closed_forms():
    assert planted_pair_ids(500, 21) == 500 * 2  # r = 1, 11
    assert planted_pair_ids(500, 1) == 0
    n = 500
    a = np.array([0, 10, n + 3, 0, 5])
    b = np.array([n, n + 10, 3, 2 * n, 5 + 11 * n])
    # (0, n): r=1 pair; (10, n+10): pair; (3, n+3) reversed: pair;
    # (0, 2n): r=2 not a pair; (5, 5+11n): r=11 but |a-b| != n
    got = np.asarray(is_planted_pair_arrow(a, b, n))
    assert got.tolist() == [True, True, True, False, False]
    assert VARIED_PAIR_STRIDE == 10


def test_varied_dedup_pipeline_invariants(ray_session, sf_dir):
    """End-to-end over Ray at small scale: minhash + ngram emit ONLY planted
    pairs, exact dedup finds no duplicates."""
    from duke_ray.sources import documents_row_count, read_documents_varied
    from duke_ray.stages.dedup import exact_dedup, minhash_near_dup_pairs, ngram_jaccard_pairs

    n = documents_row_count(sf_dir)
    replicas = 12  # planted: r=1, r=11
    planted = planted_pair_ids(n, replicas)

    ds = read_documents_varied(sf_dir, replicas)
    assert exact_dedup(ds).count() == n * replicas

    pairs = ngram_jaccard_pairs(read_documents_varied(sf_dir, replicas), threshold=0.6).to_pandas()
    ok = np.asarray(is_planted_pair_arrow(pairs["doc_a"].values, pairs["doc_b"].values, n))
    assert ok.all()
    assert len(pairs) >= 0.93 * planted

    mh = minhash_near_dup_pairs(read_documents_varied(sf_dir, replicas), threshold=0.8).to_pandas()
    ok = np.asarray(is_planted_pair_arrow(mh["doc_a"].values, mh["doc_b"].values, n))
    assert ok.all()
    assert len(mh) >= 0.6 * planted
