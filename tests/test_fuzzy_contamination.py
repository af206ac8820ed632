"""Cross-corpus fuzzy decontamination vs a scalar brute-force reference:
exact k-shingle Jaccard over every train x eval pair, threshold + argmax
per train doc. LSH candidate recall at 64 perms / 32 bands is ~1-1e-6 for
jaccard >= 0.6, and verification is exact, so with fixed seeds the
distributed output must equal the reference exactly."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from duke_ray.stages.contamination import fuzzy_contamination_flags
from duke_ray.stages.dedup import cross_corpus_near_dup_pairs

K = 3
THR = 0.6


def _shingles(text: str) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i : i + K]) for i in range(max(len(toks) - K + 1, 0))}


def _jac(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 1.0


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    train = {}
    for d in range(40):
        n = int(rng.integers(8, 60))
        train[d] = " ".join(rng.choice(vocab, n))
    ev = {}
    for j, d in enumerate(range(0, 40, 4)):  # 10 perturbed copies
        toks = train[d].split(" ")
        ev[1000 + d] = " ".join(toks[2:])
    for j in range(5):  # 5 unrelated eval docs
        ev[2000 + j] = " ".join(rng.choice(vocab, 30))
    return train, ev


def _reference_flags(train, ev) -> pd.DataFrame:
    rows = []
    for d, t in train.items():
        sa = _shingles(t)
        matches = []
        for e, te in ev.items():
            j = _jac(sa, _shingles(te))
            if j >= THR:
                matches.append((e, j))
        if matches:
            # argmax jaccard, tie -> smallest eval id
            best = sorted(matches, key=lambda x: (-x[1], x[0]))[0]
            rows.append((d, len(matches), best[0], best[1]))
    return (
        pd.DataFrame(rows, columns=["doc_id", "n_matches", "matched_eval_id", "best_jaccard"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _ds(d: dict) -> "ray.data.Dataset":
    df = pd.DataFrame({"doc_id": list(d.keys()), "text": list(d.values())})
    return ray.data.from_pandas(df).repartition(4)


def test_fuzzy_flags_match_bruteforce(ray_session, corpora):
    train, ev = corpora
    got = (
        fuzzy_contamination_flags(_ds(train), _ds(ev), threshold=THR, k=K)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _reference_flags(train, ev)
    assert len(want) >= 8, "fixture must plant recoverable matches"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)


def test_cross_pairs_never_pair_within_a_side(ray_session, corpora):
    train, ev = corpora
    pairs = cross_corpus_near_dup_pairs(_ds(train), _ds(ev), threshold=THR, k=K).to_pandas()
    assert (pairs["doc_a"] < 1000).all()
    assert (pairs["doc_b"] >= 1000).all()
    # brute-force pair set matches exactly
    want = set()
    for d, t in train.items():
        sa = _shingles(t)
        for e, te in ev.items():
            if _jac(sa, _shingles(te)) >= THR:
                want.add((d, e))
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == want


def test_no_matches_yields_empty(ray_session):
    train = {0: "a b c d e f g h", 1: "p q r s t u v w"}
    ev = {1000: "x1 x2 x3 x4 x5 x6 x7"}
    out = fuzzy_contamination_flags(_ds(train), _ds(ev), threshold=THR, k=K).to_pandas()
    assert len(out) == 0
