"""End-to-end KG pipeline: node/edge tables vs the oracle, manifests,
checkpointed resume."""

import json
import os
import shutil

import duckdb
import pytest

from duke_ray.assets import default_assets
from duke_ray.oracle import naive_canonicalize, naive_corpus_triples
from duke_ray.pipelines.kg import run_kg_pipeline
from duke_ray.synth import pages_batch_from_documents

OUT = "/tmp/duke_ray_test_kg"


@pytest.fixture(scope="module")
def kg_run(ray_session, sf_dir):
    shutil.rmtree(OUT, ignore_errors=True)
    metrics = run_kg_pipeline(sf_dir, OUT, n_buckets=8, n_salt=4)
    return metrics


def test_edges_match_oracle(kg_run, sf_dir):
    import pyarrow.parquet as pq

    assets = default_assets()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = pages_batch_from_documents(docs).to_pylist()
    ref = naive_canonicalize(naive_corpus_triples(pages, assets))
    s2e = assets.surface_to_entity
    want = {(s2e[s], p, s2e[o]): v for (s, p, o), v in ref.items()}

    rows = duckdb.sql(
        f"SELECT subj_id, pred, obj_id, n_occurrences, n_pages FROM read_parquet('{OUT}/edges/bucket=*/*.parquet')"
    ).fetchall()
    got = {(r[0], r[1], r[2]): (r[3], r[4]) for r in rows}
    assert got == want
    assert kg_run["n_edges"] == len(want)


def test_nodes_match_oracle(kg_run, sf_dir):
    import pyarrow.parquet as pq

    assets = default_assets()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = pages_batch_from_documents(docs).to_pylist()
    from duke_ray.oracle import naive_mentions, naive_page_text

    surfaces = set(assets.surface_to_entity)
    counts: dict[int, int] = {}
    for p in pages:
        text = naive_page_text(p["html"], p["text"])
        for _pos, s in naive_mentions(text, surfaces):
            # linkable surfaces only (OOV surfaces like 'vector' never link)
            from duke_ray.synth import in_vocab_word

            if all(in_vocab_word(w) for w in s.split(" ")):
                eid = assets.surface_to_entity[s]
                counts[eid] = counts.get(eid, 0) + 1

    rows = duckdb.sql(
        f"SELECT entity_id, surface, class, n_mentions FROM read_parquet('{OUT}/nodes/bucket=*/*.parquet')"
    ).fetchall()
    got = {r[0]: r[3] for r in rows}
    assert got == counts
    # node metadata joins back to the gazetteer
    for eid, surface, cls, _n in rows:
        assert assets.entity_surfaces[eid] == surface
        assert assets.entity_classes[eid] == cls


def test_manifests_written(kg_run):
    for table in ["nodes", "edges"]:
        mdir = os.path.join(OUT, table, "_manifests")
        stamps = sorted(os.listdir(mdir))
        assert len(stamps) == 8
        m = json.load(open(os.path.join(mdir, stamps[0])))
        assert m["fingerprint"] == kg_run["fingerprint"]


def test_resume_skips_completed(kg_run, sf_dir):
    m2 = run_kg_pipeline(sf_dir, OUT, n_buckets=8, n_salt=4)
    assert m2["edges"]["written_buckets"] == []
    assert sorted(m2["edges"]["skipped_buckets"]) == list(range(8))
    assert m2["n_edges"] == kg_run["n_edges"]


def test_resume_rewrites_only_missing_bucket(kg_run, sf_dir):
    victim = 3
    os.remove(os.path.join(OUT, "edges", "_manifests", f"bucket={victim}.json"))
    shutil.rmtree(os.path.join(OUT, "edges", f"bucket={victim}"), ignore_errors=True)
    before = kg_run["edges"]["rows"][victim]
    m3 = run_kg_pipeline(sf_dir, OUT, n_buckets=8, n_salt=4)
    assert m3["edges"]["written_buckets"] == [victim]
    assert m3["edges"]["rows"][victim] == before
    assert m3["n_edges"] == kg_run["n_edges"]
