"""Lexical top-k retrieval over the corpus: integer TF-IDF scoring.

The IR complement to embedding-space kNN (stages/knn.py) and the
inverted index (stages/index.py): given a bag of query terms, rank
documents by ``sum(tf * idf_int)`` with ``idf_int(t) = n_docs //
df(t)`` — all int64, so the distributed score is summation-order-free
and the DuckDB oracle value-hashes exactly (CLAUDE.md: no float
aggregates; BM25's saturation/length terms need floats and are
deliberately traded for hash-exact semantics). The reference has no
retrieval at all — its text handling stops at vocab membership
(/root/reference/Duke/embedding.py).

Topology: ONE corpus scan emits (term, doc_id, tf) partials restricted
to the query terms — exact per batch because a document is one input
row (the stages/triples.py invariant), so a (term, doc) pair never
spans batches and the partials are globally unique per (term, doc).
The partials table (matching docs x query terms, << corpus) is
materialized once and reused for BOTH the df aggregate (<= |Q| rows ->
driver -> weights broadcast into the scoring map) and the per-doc
score sum; top-k is per-block partial top-k -> global sort over
~n_blocks*k rows (the relational.py:top_customers shape). The corpus
itself never shuffles.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .tokens import FlatTokens


def lexical_topk(
    docs: "ray.data.Dataset",
    query_terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """(doc_id, text) -> top-k (doc_id, score) by integer TF-IDF.

    ``n_docs`` (the idf numerator) defaults to ``docs.count()`` — pass it
    when the caller already knows the corpus size to avoid the extra
    metadata pass. Ties break by ascending doc_id (deterministic top-k).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    term_set = pa.array(terms, pa.string())
    if n_docs is None:
        n_docs = docs.count()

    def partials(batch: pa.Table) -> pa.Table:
        flat = FlatTokens.from_text(batch[text_col])
        keep = pc.is_in(flat.tokens, value_set=term_set).to_numpy(
            zero_copy_only=False
        )
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        doc = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)[flat.row[keep]]
        t = pa.table(
            {
                "term": flat.tokens.filter(pa.array(keep)),
                "doc_id": pa.array(doc, pa.int64()),
                "one": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )
        g = t.group_by(["term", "doc_id"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "term": g["term"],
                "doc_id": g["doc_id"],
                "tf": g["one_sum"].cast(pa.int64()),
            }
        )

    from ..state.exchange import grouped_sum

    hits = docs.map_batches(
        partials, batch_format="pyarrow", batch_size=8192
    ).materialize()

    # df per query term: partials are globally unique per (term, doc), so
    # df = row count per term. <= |Q| rows — driver-side is metadata-sized.
    df_rows = grouped_sum(
        hits.map_batches(
            lambda b: pa.table(
                {"term": b["term"], "one": pa.array(np.ones(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        "term",
        {"one": "df"},
        n_meta=min(n_meta, 16),
    ).to_pandas()
    idf_terms = pa.array(df_rows["term"].tolist(), pa.string())
    idf_vals = pa.array(
        [n_docs // int(d) for d in df_rows["df"]], pa.int64()
    )

    def score_rows(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["term"], value_set=idf_terms)
        w = pc.take(idf_vals, idx)
        return pa.table(
            {"doc_id": b["doc_id"], "s": pc.multiply(b["tf"], w)}
        )

    per_doc = grouped_sum(
        hits.map_batches(score_rows, batch_format="pyarrow"),
        "doc_id",
        {"s": "score"},
        n_meta=n_meta,
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(
            batch,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        return batch.take(idx.slice(0, k))

    return (
        per_doc.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
