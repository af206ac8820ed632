"""HLL sketch + approximate canonicalization."""

import numpy as np
import pytest

from duke_ray.functions.sketch import HLL


def _hashes(n, seed):
    gen = np.random.Generator(np.random.Philox(key=seed))
    return gen.integers(0, 1 << 63, size=n, dtype=np.uint64) * np.uint64(2) + np.uint64(1)


@pytest.mark.parametrize("n", [100, 5000, 200_000])
def test_hll_estimate_accuracy(n):
    h = HLL(12).add_hashes(_hashes(n, seed=n))
    assert abs(h.estimate() - n) / n < 0.05


def test_hll_merge_equals_union():
    a_h, b_h = _hashes(10_000, 1), _hashes(10_000, 2)
    merged = HLL(12).add_hashes(a_h).merge(HLL(12).add_hashes(b_h))
    union = HLL(12).add_hashes(np.concatenate([a_h, b_h]))
    np.testing.assert_array_equal(merged.registers, union.registers)


def test_hll_duplicates_dont_inflate():
    h = _hashes(1000, 3)
    est = HLL(12).add_hashes(np.tile(h, 50)).estimate()
    assert abs(est - 1000) / 1000 < 0.05


def test_hll_roundtrip_bytes():
    h = HLL(12).add_hashes(_hashes(500, 4))
    again = HLL.from_bytes(h.to_bytes(), 12)
    np.testing.assert_array_equal(h.registers, again.registers)


def test_approx_canonicalize_close_to_exact(ray_session, sf_dir):
    from duke_ray.sources import read_pages
    from duke_ray.stages.canonicalize import canonicalize_triples, canonicalize_triples_approx
    from duke_ray.stages.extract import extract_text
    from duke_ray.stages.triples import extract_triples

    triples = extract_triples(extract_text(read_pages(sf_dir)))
    exact = {(r["subj"], r["pred"], r["obj"]): (r["n_occurrences"], r["n_pages"]) for r in canonicalize_triples(triples).take_all()}
    approx = {(r["subj"], r["pred"], r["obj"]): (r["n_occurrences"], r["n_pages_est"]) for r in canonicalize_triples_approx(triples).take_all()}
    assert set(approx) == set(exact)
    for key, (occ, pages) in exact.items():
        a_occ, a_pages = approx[key]
        assert a_occ == occ                      # occurrence counts stay exact
        assert abs(a_pages - pages) <= max(2, 0.05 * pages)  # HLL small-range
