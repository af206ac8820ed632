"""duplicate_spans: substring-level duplicate-window detection."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duke_ray.stages.spans import duplicate_spans


def _serial(docs, w, min_docs=2):
    occ = defaultdict(int)
    dd = defaultdict(set)
    for d, t in docs:
        tok = t.split(" ")
        for i in range(len(tok) - w + 1):
            s = " ".join(tok[i : i + w])
            occ[s] += 1
            dd[s].add(d)
    return sorted((s, len(dd[s]), occ[s]) for s in occ if len(dd[s]) >= min_docs)


def _ds(docs, blocks=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(blocks)


def test_duplicate_spans_matches_serial(ray_session):
    docs = [
        (1, "a b c d e f g h unique one tail"),
        (2, "x a b c d e f g h y"),
        (3, "no shared window here at all sir maam"),
        (4, "short"),
        (5, "a b c d e f g h"),  # exactly one window, also shared
        (6, "rep rep rep rep rep rep rep rep rep"),  # 1 doc, 2 occ -> excluded
    ]
    got = (
        duplicate_spans(_ds(docs), w=8)
        .to_pandas()
        .sort_values("span")
        .reset_index(drop=True)
    )
    assert (
        list(map(tuple, got[["span", "n_docs", "n_occ"]].itertuples(index=False)))
        == _serial(docs, 8)
    )


def test_duplicate_spans_random_corpus_and_min_docs(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> organic collisions
    docs = [
        (i, " ".join(rng.choice(vocab, rng.integers(3, 30)))) for i in range(80)
    ]
    for w, min_docs in ((3, 2), (4, 3)):
        got = duplicate_spans(_ds(docs, blocks=7), w=w, min_docs=min_docs).to_pandas()
        want = _serial(docs, w, min_docs)
        if "span" not in got.columns:  # empty result loses schema via pandas
            assert want == [] and len(got) == 0
            continue
        got = got.sort_values("span").reset_index(drop=True)
        assert (
            list(map(tuple, got[["span", "n_docs", "n_occ"]].itertuples(index=False)))
            == want
        )
        assert want, f"w={w},min_docs={min_docs} case is vacuous"


def test_duplicate_spans_empty_and_validation(ray_session):
    empty = _ds([(1, "too short")], blocks=1)
    assert duplicate_spans(empty, w=8).count() == 0
    with pytest.raises(ValueError):
        duplicate_spans(empty, w=1)
    with pytest.raises(ValueError):
        duplicate_spans(empty, w=4, min_docs=1)
    with pytest.raises(ValueError):
        duplicate_spans(empty, w=4, mode="driver")


def test_duplicate_spans_semijoin_matches_broadcast(ray_session):
    """VERDICT r4 #2: the distributed doc-keyed verify path (no driver
    candidate array) must be value-identical to the broadcast path, and
    auto mode must escalate to it past max_broadcast_candidates."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(10)]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(3, 40)))) for i in range(120)]
    for w, min_docs in ((3, 2), (4, 3)):
        want = _serial(docs, w, min_docs)
        for kwargs in (
            {"mode": "semijoin"},
            {"mode": "auto", "max_broadcast_candidates": 0},  # force escalation
        ):
            got = duplicate_spans(
                _ds(docs, blocks=5), w=w, min_docs=min_docs, **kwargs
            ).to_pandas()
            if "span" not in got.columns:
                assert want == [] and len(got) == 0
                continue
            got = got.sort_values("span").reset_index(drop=True)
            assert (
                list(
                    map(tuple, got[["span", "n_docs", "n_occ"]].itertuples(index=False))
                )
                == want
            )
        assert want, f"w={w},min_docs={min_docs} case is vacuous"
    # null text and a doc with no candidates survive the semijoin path
    mixed = [(1, "p q r s t"), (2, "p q r s u"), (3, None), (4, "lonely doc words here")]
    got = duplicate_spans(_ds(mixed, blocks=2), w=3, mode="semijoin").to_pandas()
    assert sorted(got["span"]) == ["p q r", "q r s"]
    assert got["n_docs"].tolist() == [2, 2] and got["n_occ"].tolist() == [2, 2]


def test_strip_boilerplate_removes_shared_windows(ray_session):
    """Tokens covered by a >=2-doc duplicated w-window disappear; unique
    docs pass through byte-identical; token conservation holds."""
    import numpy as np
    import pyarrow as pa
    import ray

    from duke_ray.stages.spans import strip_boilerplate

    boiler = "please subscribe to our newsletter today ok"  # 7 tokens
    texts = [
        f"alpha beta gamma {boiler} delta",
        f"{boiler} epsilon zeta eta theta iota",
        "completely unique document with no shared windows at all",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, w=7).take_all()}
    # the 7-token boiler window occurs in docs 1 and 2 -> its tokens drop
    assert out[1]["text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 7
    assert out[2]["text"] == "epsilon zeta eta theta iota"
    assert out[2]["n_removed"] == 7
    assert out[3]["text"] == texts[2] and out[3]["n_removed"] == 0
    # conservation
    for i, t in enumerate(texts, 1):
        assert len(out[i]["text"].split(" ")) + out[i]["n_removed"] == len(t.split(" ")) or (
            out[i]["text"] == "" and out[i]["n_removed"] == len(t.split(" "))
        )


def test_strip_boilerplate_full_coverage_and_single_doc_repeat(ray_session):
    """A doc that is entirely boilerplate empties out; a window repeated
    only WITHIN one doc does not qualify (distinct-doc threshold)."""
    import pyarrow as pa
    import ray

    from duke_ray.stages.spans import strip_boilerplate

    b = "x1 x2 x3 x4"
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([b, b, f"solo {b.replace('x', 'y')} mid {b.replace('x', 'y')} end"], pa.string()),
            }
        )
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, w=4).take_all()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 4
    assert out[2]["text"] == "" and out[2]["n_removed"] == 4
    assert out[3]["n_removed"] == 0  # y-window repeats but only in one doc
