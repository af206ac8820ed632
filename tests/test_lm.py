"""Distributed bigram-LM scoring (stages/lm.py) vs a serial reference."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray

from duke_ray.stages.lm import lm_score, perplexity_filter


def _ref(probe_texts, train_texts, ids=None, log_space=False):
    uni, big = Counter(), Counter()
    for t in train_texts:
        toks = (t or "").split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    V = len(uni)
    out = {}
    for i, t in zip(ids or range(len(probe_texts)), probe_texts):
        toks = (t or "").split(" ")
        n, s = 0, 0
        for a, b in zip(toks, toks[1:]):
            n += 1
            if log_space:
                p = (big[(a, b)] + 1.0) / (uni[a] + float(V))
                s += int(np.floor(-1_000_000.0 * np.log(p)))
            else:
                s += (1000 * (big[(a, b)] + 1)) // (uni[a] + V)
        out[i] = (n, s)
    return out


def _ds(texts, ids=None, parts=3):
    ids = list(ids or range(len(texts)))
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
    ).repartition(parts)


TEXTS = [
    "the cat sat on the mat",
    "the cat ran",
    "dogs bark loud",
    "",
    "single",
    "the the the",
    "a b a b a b a",
]


def test_self_scoring_parity(ray_session):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_milli"])
        for r in lm_score(_ds(TEXTS)).take_all()
    }
    assert got == _ref(TEXTS, TEXTS)


def test_self_scoring_log_space_parity(ray_session):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_micro"])
        for r in lm_score(_ds(TEXTS), log_space=True).take_all()
    }
    assert got == _ref(TEXTS, TEXTS, log_space=True)


def test_heldout_unseen_tokens(ray_session):
    train_texts = TEXTS[:3]
    probe_texts = ["the cat sat", "totally unseen words", "the zebra", ""]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_milli"])
        for r in lm_score(
            _ds(probe_texts, ids=[10, 11, 12, 13]), train=_ds(train_texts)
        ).take_all()
    }
    assert got == _ref(probe_texts, train_texts, ids=[10, 11, 12, 13])
    # unseen bigrams score the smoothing floor, never zero rows
    assert got[11][0] == 2 and got[11][1] > 0
    assert got[13] == (0, 0)


def test_width_determinism(ray_session):
    a = sorted(
        (r["doc_id"], r["n_bigrams"], r["score_milli"])
        for r in lm_score(_ds(TEXTS, parts=1)).take_all()
    )
    b = sorted(
        (r["doc_id"], r["n_bigrams"], r["score_milli"])
        for r in lm_score(_ds(TEXTS, parts=5), n_salt=2, n_meta=32).take_all()
    )
    assert a == b


def test_perplexity_filter(ray_session):
    scores = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_micro"])
        for r in lm_score(_ds(TEXTS), log_space=True).take_all()
    }
    avgs = {i: s // n for i, (n, s) in scores.items() if n > 0}
    thresh = int(np.median(list(avgs.values())))
    kept = perplexity_filter(_ds(TEXTS), max_avg_surprisal_micro=thresh).take_all()
    kept_ids = {r["doc_id"] for r in kept}
    assert kept_ids == {i for i, a in avgs.items() if a <= thresh}
    for r in kept:
        assert r["avg_surprisal_micro"] == avgs[r["doc_id"]]
    # zero-bigram docs (ids 3, 4) never pass the filter
    assert not kept_ids & {3, 4}


from hypothesis import given, settings, strategies as st

_tok = st.text(alphabet="abx", min_size=0, max_size=2)
_doc = st.lists(_tok, min_size=0, max_size=10).map(lambda ts: " ".join(ts))


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=6))
def test_lm_property_vs_scalar(ray_session, texts):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_milli"])
        for r in lm_score(_ds(texts, parts=2), n_salt=2, n_meta=16).take_all()
    }
    assert got == _ref(texts, texts)
