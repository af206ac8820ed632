"""KG stages (extract -> mentions/triples -> canonicalize) vs the
single-process oracle, over synthesized pages from sf0.001 documents.
This is the local form of the P/R >= 0.95 triple-agreement gate
(BASELINE.md 'target: triple agreement')."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from duke_ray.assets import default_assets
from duke_ray.oracle import naive_canonicalize, naive_corpus_triples, naive_page_text
from duke_ray.sources import read_pages
from duke_ray.stages.canonicalize import canonicalize_triples
from duke_ray.stages.extract import extract_text
from duke_ray.stages.triples import extract_mentions, extract_triples
from duke_ray.synth import pages_batch_from_documents


@pytest.fixture(scope="module")
def pages_table(sf_dir):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return pages_batch_from_documents(docs)


@pytest.fixture(scope="module")
def pages_rows(pages_table):
    return pages_table.to_pylist()


def test_pages_synthesis_deterministic(pages_table, sf_dir):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    again = pages_batch_from_documents(docs)
    assert again.equals(pages_table)
    # even doc_ids carry html only, odd carry text only
    assert pages_table["html"][0].as_py() is not None
    assert pages_table["text"][0].as_py() is None
    assert pages_table["html"][1].as_py() is None
    assert pages_table["text"][1].as_py() is not None


def test_extract_byte_identical(ray_session, sf_dir, pages_rows):
    """Per-url extracted text is byte-identical to the scalar oracle AND to
    the original documents.text (round-trip through the HTML wrapper)."""
    import duckdb

    ds = extract_text(read_pages(sf_dir))
    got = {r["url"]: r["text"] for r in ds.take_all()}
    want = {p["url"]: naive_page_text(p["html"], p["text"]) for p in pages_rows}
    assert got == want

    orig = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    by_doc = dict(orig)
    for url, text in got.items():
        doc_id = int(url.rsplit("/", 1)[1])
        assert text == by_doc[doc_id], f"url {url} not byte-identical"


def test_triples_match_oracle_exactly(ray_session, sf_dir, pages_rows):
    assets = default_assets()
    want = set(map(tuple, naive_corpus_triples(pages_rows, assets)))
    ds = extract_triples(extract_text(read_pages(sf_dir)))
    got = {(r["url"], r["subj"], r["pred"], r["obj"], r["pred_pos"]) for r in ds.take_all()}
    assert want, "oracle produced no triples — synthetic corpus broken"
    # P/R gate (exact match expected; >=0.95 required)
    inter = len(got & want)
    precision = inter / len(got)
    recall = inter / len(want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert got == want  # engine spec == oracle spec, bit-exact


def test_mentions_match_oracle(ray_session, sf_dir, pages_rows):
    assets = default_assets()
    surfaces = set(assets.surface_to_entity)
    from duke_ray.oracle import naive_mentions, naive_page_text

    want = set()
    for p in pages_rows:
        text = naive_page_text(p["html"], p["text"])
        for pos, surf in naive_mentions(text, surfaces):
            want.add((p["url"], pos, surf, assets.surface_to_entity[surf]))
    ds = extract_mentions(extract_text(read_pages(sf_dir)))
    got = {(r["url"], r["pos"], r["surface"], r["entity_hint"]) for r in ds.take_all()}
    assert got == want


def test_canonicalize_matches_oracle(ray_session, sf_dir, pages_rows):
    assets = default_assets()
    ref = naive_canonicalize(naive_corpus_triples(pages_rows, assets))
    ds = canonicalize_triples(extract_triples(extract_text(read_pages(sf_dir))), n_salt=4)
    got = {(r["subj"], r["pred"], r["obj"]): (r["n_occurrences"], r["n_pages"]) for r in ds.take_all()}
    assert got == ref


def test_single_pass_union_matches_per_kind_extractors(ray_session, sf_dir):
    """The 'both' emit (one tokenize+scan) must produce exactly the rows the
    single-purpose mention and triple extractors produce, tagged by kind."""
    from duke_ray.stages.triples import extract_mentions_and_triples

    extracted = extract_text(read_pages(sf_dir))
    union = extract_mentions_and_triples(extracted).to_pandas()
    m_want = (
        extract_mentions(extract_text(read_pages(sf_dir)))
        .to_pandas()
        .sort_values(["url", "pos"])
        .reset_index(drop=True)
    )
    t_want = (
        extract_triples(extract_text(read_pages(sf_dir)))
        .to_pandas()
        .sort_values(["url", "pred_pos"])
        .reset_index(drop=True)
    )
    m_got = (
        union[union["kind"] == "m"][["url", "pos", "surface", "entity_hint"]]
        .sort_values(["url", "pos"])
        .reset_index(drop=True)
        .astype({"entity_hint": "int64"})
    )
    t_got = (
        union[union["kind"] == "t"][["url", "subj", "pred", "obj", "pos"]]
        .rename(columns={"pos": "pred_pos"})
        .sort_values(["url", "pred_pos"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(m_got, m_want)
    pd.testing.assert_frame_equal(t_got, t_want)


def test_read_pages_seed_path_matches_replica_loop(ray_session, sf_dir):
    """The bench-scale seed path (replicas>1: doc-chunk x replica-group
    tasks over a broadcast documents table) must produce EXACTLY the same
    page rows as the simple per-batch replica loop."""
    from duke_ray.sources import read_pages
    from duke_ray.synth import pages_batch_from_documents

    import pyarrow.parquet as pq

    got = (
        read_pages(sf_dir, replicas=3)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    want = pa.concat_tables(
        [pages_batch_from_documents(docs, replica=r, n_docs_per_replica=docs.num_rows) for r in range(3)]
    ).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == len(want) == 3 * docs.num_rows
    pd_cols = ["url", "warc_ts", "lang", "text", "html"]
    for c in pd_cols:
        assert got[c].equals(want[c]), c


def test_kg_partials_match_raw_extraction(ray_session, sf_dir):
    """extract_kg_partials summed == raw per-occurrence extraction: the
    per-batch (spo, n, pages) / (surface, n) partials must canonicalize to
    EXACTLY what the general per-(spo,url) exchange computes, and surface
    counts must match raw mention rows."""
    from duke_ray.sources import read_pages
    from duke_ray.stages.extract import extract_text
    from duke_ray.stages.triples import (
        extract_kg_partials,
        extract_mentions,
        extract_triples,
    )
    from duke_ray.stages.canonicalize import (
        canonicalize_from_partials,
        canonicalize_triples,
    )

    extracted = extract_text(read_pages(sf_dir, replicas=2)).materialize()
    parts = extract_kg_partials(extracted, batch_size=64).materialize()

    key = ["subj", "pred", "obj"]
    got_canon = (
        canonicalize_from_partials(
            parts.filter(lambda r: r["kind"] == "t").select_columns(
                ["subj", "pred", "obj", "n", "pages"]
            )
        )
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want_canon = (
        canonicalize_triples(extract_triples(extracted))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_canon[sorted(got_canon.columns)], want_canon[sorted(want_canon.columns)]
    )

    got_surf = (
        parts.filter(lambda r: r["kind"] == "m")
        .select_columns(["surface", "n"])
        .groupby("surface")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("surface")
        .reset_index(drop=True)
    )
    want_surf = (
        extract_mentions(extracted)
        .groupby("surface")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values("surface")
        .reset_index(drop=True)
    )
    got_surf["n"] = got_surf["n"].astype("int64")
    want_surf["n"] = want_surf["n"].astype("int64")
    pd.testing.assert_frame_equal(got_surf, want_surf)


def test_combine_kg_partials_equivalent(ray_session, sf_dir):
    """Per-block combine is exact: combined partials canonicalize to the
    same table as raw per-batch partials, with strictly fewer (or equal)
    rows and an unchanged tagged-union schema."""
    from duke_ray.sources import read_pages
    from duke_ray.stages.extract import extract_text
    from duke_ray.stages.triples import combine_kg_partials, extract_kg_partials
    from duke_ray.stages.canonicalize import canonicalize_from_partials

    extracted = extract_text(read_pages(sf_dir, replicas=2)).materialize()
    raw = extract_kg_partials(extracted, batch_size=32).materialize()
    combined = combine_kg_partials(extract_kg_partials(extracted, batch_size=32)).materialize()

    assert combined.schema().names == raw.schema().names
    assert combined.count() <= raw.count()

    def canon(parts):
        return (
            canonicalize_from_partials(
                parts.filter(lambda r: r["kind"] == "t").select_columns(
                    ["subj", "pred", "obj", "n", "pages"]
                )
            )
            .to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(canon(combined), canon(raw))

    def surf(parts):
        return (
            parts.filter(lambda r: r["kind"] == "m")
            .select_columns(["surface", "n"])
            .groupby("surface")
            .sum("n")
            .to_pandas()
            .sort_values("surface")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(surf(combined), surf(raw))
