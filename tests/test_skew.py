"""Skew handling: a Zipf-extreme corpus where one triple dominates.

Verifies the canonicalization topology stays exact (and the partitioned
reduce doesn't funnel the hot key through one Python-visible bottleneck)
when ~90% of all triple occurrences share a single (subj, pred, obj)."""

import time

import pyarrow as pa
import pytest

import ray.data

from duke_ray.oracle import naive_canonicalize, naive_corpus_triples
from duke_ray.assets import default_assets
from duke_ray.stages.canonicalize import canonicalize_triples, canonicalize_triples_approx
from duke_ray.stages.extract import extract_text
from duke_ray.stages.triples import extract_triples


@pytest.fixture(scope="module")
def skewed_pages():
    # 2000 pages, each repeating the SAME hot pattern 20x plus one rare tail
    hot = "table join customer "              # -> (table, join, customer)
    rows = []
    for i in range(2000):
        tail = f"query merge {['data', 'row', 'batch'][i % 3]}"
        rows.append(
            {
                "url": f"https://skew.example/p/{i}",
                "warc_ts": 0,
                "html": None,
                "text": hot * 20 + tail,
                "lang": "en",
            }
        )
    return rows


def test_hot_key_exact(ray_session, skewed_pages):
    assets = default_assets()
    tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in skewed_pages], pa.string()),
            "warc_ts": pa.array([0] * len(skewed_pages), pa.timestamp("us")),
            "html": pa.array([None] * len(skewed_pages), pa.binary()),
            "text": pa.array([r["text"] for r in skewed_pages], pa.string()),
            "lang": pa.array(["en"] * len(skewed_pages), pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    ref = naive_canonicalize(naive_corpus_triples(skewed_pages, assets))

    t0 = time.time()
    got = {
        (r["subj"], r["pred"], r["obj"]): (r["n_occurrences"], r["n_pages"])
        for r in canonicalize_triples(extract_triples(extract_text(ds))).take_all()
    }
    wall = time.time() - t0
    assert got == ref
    hot_key = ("table", "join", "customer")
    assert got[hot_key][1] == 2000          # hot triple on every page
    assert got[hot_key][0] >= 2000 * 19     # dominates occurrences
    assert wall < 60, f"skewed canonicalize too slow: {wall:.1f}s"

    # approx path on the same skew: occurrence counts exact, pages within 5%
    approx = {
        (r["subj"], r["pred"], r["obj"]): (r["n_occurrences"], r["n_pages_est"])
        for r in canonicalize_triples_approx(extract_triples(extract_text(ds))).take_all()
    }
    assert approx[hot_key][0] == got[hot_key][0]
    assert abs(approx[hot_key][1] - 2000) <= 100
