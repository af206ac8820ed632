"""Property tests: the Arrow-vectorized text kernels are byte-identical to
the scalar reference forms on arbitrary inputs (hypothesis-generated)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from duke_ray.text import (
    extract_html_text,
    extract_html_text_arrow,
    fnv1a64,
    fnv1a64_arrow,
    normalize_text,
    normalize_text_arrow,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_normalize_vectorized_matches_scalar(texts):
    arrow = normalize_text_arrow(pa.array(texts, pa.string())).to_pylist()
    assert arrow == [normalize_text(t, to_list=False) for t in texts]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(max_size=300), min_size=1, max_size=8))
def test_extract_vectorized_matches_scalar(blobs):
    arrow = extract_html_text_arrow(pa.array(blobs, pa.binary())).to_pylist()
    assert arrow == [extract_html_text(b) for b in blobs]


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_fnv_vectorized_matches_scalar(texts):
    hashes = fnv1a64_arrow(pa.array(texts, pa.string()))
    assert [int(h) for h in hashes] == [fnv1a64(t) for t in texts]
