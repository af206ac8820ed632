"""Distributed BPE training/encoding vs an independent scalar reference."""

from collections import Counter

import pyarrow as pa
import pytest

import ray

from duke_ray.stages.bpe import END, bpe_encode, bpe_train, encode_word


def _scalar_train(texts, n_merges, min_frequency=2):
    """Independent reference: dict-of-tuples word representation (the
    textbook Sennrich formulation), not the engine's flat-buffer one."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[tuple(list(w) + [END])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_frequency:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_words = Counter()
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


def _ds(texts, parts=2):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(parts)


def test_train_classic_example(ray_session):
    texts = ["low low low low low", "lower lower", "newest newest newest newest newest newest", "widest widest widest"]
    got = bpe_train(_ds(texts), n_merges=10, n_meta=8, n_blocks=2)
    want = _scalar_train(texts, 10)
    assert got == want
    # the classic outcome: 'est▁' and 'low' form early
    joined = ["".join(m) for m in got]
    assert any("est" in j for j in joined)


def test_train_identical_pair_runs(ray_session):
    # 'aaaa' exercises leftmost-greedy overlap resolution (a == b)
    texts = ["aaaa aaaa aa", "aaaa aa aa"]
    got = bpe_train(_ds(texts), n_merges=6, min_frequency=1, n_meta=8, n_blocks=2)
    want = _scalar_train(texts, 6, min_frequency=1)
    assert got == want


def test_train_deterministic_across_widths(ray_session):
    texts = ["the cat sat on the mat"] * 3 + ["a stitch in time saves nine"] * 2
    m1 = bpe_train(_ds(texts, parts=1), n_merges=8, n_meta=4, n_blocks=1)
    m2 = bpe_train(_ds(texts, parts=4), n_merges=8, n_meta=32, n_blocks=4)
    assert m1 == m2 == _scalar_train(texts, 8)


def test_encode_word_greedy_rank():
    merges = [("e", "s"), ("es", "t"), ("est", END), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    assert encode_word("low", ranks) == ["low", END]
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]


def test_encode_corpus(ray_session):
    texts = ["low lowest low", "newest newest", "", "low"]
    merges = _scalar_train(texts, 8)
    ranks = {m: i for i, m in enumerate(merges)}
    out = {r["doc_id"]: r for r in bpe_encode(_ds(texts), merges).take_all()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        want_bpe = sum(len(encode_word(w, ranks)) if w else 0 for w in toks)
        assert out[i]["n_bpe_tokens"] == want_bpe, (i, t)
        assert out[i]["n_words"] == len(toks)
        assert out[i]["n_chars"] == len(t)
    # merged vocab shortens encodings vs characters
    assert out[0]["n_bpe_tokens"] < out[0]["n_chars"] + out[0]["n_words"]


def test_train_on_sf_corpus(ray_session, sf_dir):
    from duke_ray.sources import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    texts = [r["text"] for r in docs.take_all()]
    got = bpe_train(docs, n_merges=12, n_meta=16, n_blocks=4)
    want = _scalar_train(texts, 12)
    assert got == want
    assert len(got) == 12
