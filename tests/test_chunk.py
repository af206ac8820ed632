"""Fixed-window token chunking + regex redaction (stages/chunk.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duke_ray.stages.chunk import chunk_batch, chunk_tokens, regex_redact


def _ref_chunks(text: str, chunk_size: int, stride: int):
    """Scalar spec: split(' '), windows start at 0, stride, ... < n_tokens."""
    toks = text.split(" ")
    out = []
    for j, s in enumerate(range(0, len(toks), stride)):
        win = toks[s : s + chunk_size]
        out.append((j, len(win), " ".join(win)))
    return out


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e f g",   # 7 tokens: short + ragged tail
                        "x",                # single token
                        "",                 # empty -> [''] one empty token
                        "p q r s",          # exactly chunk-aligned cases below
                    ],
                    pa.string(),
                ),
            }
        )
    )


@pytest.mark.parametrize("chunk_size,overlap", [(3, 1), (4, 0), (2, 1), (64, 16)])
def test_chunk_matches_scalar_spec(docs, chunk_size, overlap):
    stride = chunk_size - overlap
    got = chunk_tokens(docs, chunk_size=chunk_size, overlap=overlap).take_all()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        )
    texts = ["a b c d e f g", "x", "", "p q r s"]
    for doc_id, text in enumerate(texts):
        want = _ref_chunks(text, chunk_size, stride)
        assert sorted(by_doc[doc_id]) == want, (doc_id, chunk_size, overlap)


def test_chunk_overlap_reconstructs(docs):
    # overlap=0 chunks concatenate back to the original text
    got = chunk_tokens(docs, chunk_size=3, overlap=0).take_all()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for doc_id, text in enumerate(["a b c d e f g", "x", "", "p q r s"]):
        parts = [t for _, t in sorted(by_doc[doc_id])]
        assert " ".join(parts) == text


def test_chunk_batch_vectorized_parity_random():
    # fuzz the grouped-arange kernel against the scalar spec
    rng = np.random.default_rng(7)
    vocab = ["aa", "b", "ccc", "dddd", "e"]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 40, size=200)
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = chunk_batch(batch, chunk_size=5, stride=3)
    by_doc = {}
    for i in range(out.num_rows):
        by_doc.setdefault(out["doc_id"][i].as_py(), []).append(
            (
                out["chunk_idx"][i].as_py(),
                out["n_tokens"][i].as_py(),
                out["chunk_text"][i].as_py(),
            )
        )
    for doc_id, text in enumerate(texts):
        assert by_doc[doc_id] == _ref_chunks(text, 5, 3)


def test_chunk_validates_params(docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, chunk_size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_tokens(docs, chunk_size=4, overlap=-1)


def test_regex_redact(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["hash hashing key", "no match here", ""], pa.string()
                ),
            }
        )
    )
    got = {r["doc_id"]: r for r in
           regex_redact(docs, pattern=r"\b(hash|key)\w*\b").take_all()}
    assert got[0]["n_redactions"] == 3
    assert got[0]["clean_text"] == "<RED> <RED> <RED>"
    assert got[1]["n_redactions"] == 0
    assert got[1]["clean_text"] == "no match here"
    assert got[2]["clean_text"] == ""


def test_doc_top_terms(ray_session):
    from collections import Counter

    from duke_ray.stages.textstats import doc_top_terms

    rng = np.random.default_rng(11)
    vocab = ["aa", "b", "ccc", "dddd", "e", "ff", "g"]
    texts = [" ".join(rng.choice(vocab, size=int(n))) for n in rng.integers(1, 30, size=100)]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )
    got = {}
    for r in doc_top_terms(docs, k=3).take_all():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"]))
    for doc_id, text in enumerate(texts):
        c = Counter(text.split(" "))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert sorted(got[doc_id]) == [
            (i + 1, t, n) for i, (t, n) in enumerate(want)
        ], doc_id


def test_contamination(ray_session):
    from duke_ray.stages.contamination import contamination_flags, leading_ngram_probes

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 50, 7, 8], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta",      # probe source: 'alpha beta gamma'
                        "red green blue",               # probe source: 'red green blue'
                        "x alpha beta gamma y",         # contains probe 0 at boundaries
                        "xalpha beta gamma",            # NOT boundary-exact for probe 0
                    ],
                    pa.string(),
                ),
            }
        )
    )
    probes = leading_ngram_probes(docs, n=3, every=50)
    assert probes == ["alpha beta gamma", "red green blue"]
    got = {r["doc_id"]: r for r in contamination_flags(docs, probes).take_all()}
    assert got[0]["n_hits"] == 1 and got[0]["contaminated"]
    assert got[50]["n_hits"] == 1 and got[50]["contaminated"]
    assert got[7]["n_hits"] == 1 and got[7]["contaminated"]
    assert got[8]["n_hits"] == 0 and not got[8]["contaminated"]


def test_contamination_semijoin_equals_broadcast(ray_session):
    from duke_ray.stages.contamination import (
        contamination_flags,
        contamination_flags_semijoin,
    )

    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 40))) for _ in range(120)]
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    # mixed probe lengths incl. single tokens; some guaranteed hits, some misses
    probes = [
        texts[0].split(" ")[0],                      # 1-gram, hits
        " ".join(texts[1].split(" ")[:2]),           # 2-gram
        " ".join(texts[2].split(" ")[:5]) if len(texts[2].split(" ")) >= 5 else "t0 t1 t2 t3 t4",
        "zz never present",                           # miss
    ]
    ds = ray.data.from_arrow(docs_tbl).repartition(5)
    a = (
        contamination_flags(ds, probes)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        contamination_flags_semijoin(ds, probes)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["contaminated"].any()  # non-vacuous


def test_contamination_semijoin_candidate_cap(ray_session):
    from duke_ray.stages.contamination import contamination_flags_semijoin

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["a b c", "a b d"])})
    )
    with pytest.raises(ValueError):
        contamination_flags_semijoin(ds, ["a b"], max_candidates=1).take_all()


def test_build_vocab_and_encode(ray_session):
    import numpy as np
    import pyarrow as pa

    from duke_ray.stages.chunk import build_vocab, encode_docs

    texts = ["b b b a a c", "a b zz", "c b"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    # counts: b=5, a=3, c=2, zz=1 -> truncate to top 3
    vocab = build_vocab(ds, vocab_size=3)
    assert vocab["token"].to_pylist() == ["b", "a", "c"]
    assert vocab["id"].to_pylist() == [0, 1, 2]
    assert vocab["n"].to_pylist() == [5, 3, 2]

    enc = encode_docs(ds, vocab).to_pandas().set_index("doc_id").sort_index()
    assert enc.loc[0, "ids"] == "0,0,0,1,1,2"
    assert enc.loc[1, "ids"] == "1,0,-1"  # zz is OOV after truncation
    assert enc.loc[1, "n_oov"] == 1
    assert enc.loc[2, "ids"] == "2,0"
    assert (enc["n_tokens"] == [6, 3, 2]).all()


def test_build_vocab_tie_break_lexicographic(ray_session):
    import pyarrow as pa

    from duke_ray.stages.chunk import build_vocab

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["z y x z y x"])})
    )
    vocab = build_vocab(ds, vocab_size=2)
    # all counts tie at 2 -> lexicographic order decides ids and the cut
    assert vocab["token"].to_pylist() == ["x", "y"]


from hypothesis import given, settings, strategies as st

_tok2 = st.text(alphabet="abqz", min_size=0, max_size=3)
_doc2 = st.lists(_tok2, min_size=0, max_size=10).map(lambda ts: " ".join(ts))


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_doc2, min_size=1, max_size=6), v=st.integers(1, 5))
def test_encode_docs_property_vs_scalar(ray_session, texts, v):
    from collections import Counter

    import pyarrow as pa

    from duke_ray.stages.chunk import build_vocab, encode_docs

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    vocab = build_vocab(ds, vocab_size=v)
    # scalar reference: rank by (count desc, token asc), truncate to v
    cnt = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    ranked = sorted(cnt, key=lambda k: (-cnt[k], k))[:v]
    assert vocab["token"].to_pylist() == ranked
    vid = {t: i for i, t in enumerate(ranked)}
    got = encode_docs(ds, vocab).to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        want = [vid.get(x, -1) for x in toks]
        assert got.loc[i, "ids"] == ",".join(map(str, want))
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_oov"] == sum(1 for x in want if x == -1)
