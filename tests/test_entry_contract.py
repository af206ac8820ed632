"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, and a sample of queries executes at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")


def test_contract_shape(ray_session):
    import __ray_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every callable takes one positional arg
    for fn in qs.values():
        assert callable(fn)


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    ds = m.entry()
    assert ds.count() > 0
    assert set(ds.schema().names) >= {"subj_id", "pred", "obj_id", "n_occurrences", "n_pages"}


def test_sample_queries_run(ray_session, sf_dir):
    import __ray_entry__ as m

    qs = m.queries()
    for name in ["extract_text", "canonical_triples", "kg_nodes", "quality_scores"]:
        res = qs[name](sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert len(df) > 0, name
