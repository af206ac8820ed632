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


def doc_rarity(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Rare-token mass per document -> (doc_id, rarity_milli): the
    integer-exact analog of a unigram-LM perplexity filter (CCNet-style
    statistical quality scoring). Token weight = (total_tokens * 1000)
    // count(term) — inverse frequency in milli units, pure int64 so the
    distributed score hash-matches SQL exactly (the lexical_topk
    ``n_docs // df`` template; a float ``-ln p`` weight could never
    value-hash across engines).

    Two corpus passes: (1) term counts via per-batch C++ group_by
    partials + one term-keyed grouped_sum (the term_frequencies
    topology), weights broadcast once via ``ray.put`` (vocabulary-sized;
    at a 1e8-term vocab the weights join moves to a term-keyed exchange
    instead — same shape as the index); (2) one scan scoring each doc
    with a vectorized ``pc.index_in`` gather + ``np.add.reduceat``."""
    import ray

    from ..state.exchange import grouped_sum
    from ..text import fnv1a64_arrow  # noqa: F401  (kept: hash-join variant seam)

    def count_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b[text_col], ""), pattern=" ")
        flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) else toks.flatten()
        t = pa.table({"term": flat, "n": pa.array(np.ones(len(flat), np.int64))})
        g = t.group_by("term").aggregate([("n", "sum")])
        return g.rename_columns(["term", "n"])

    counts = (
        grouped_sum(
            docs.map_batches(count_partial, batch_format="pyarrow", batch_size=8192),
            "term",
            {"n": "n"},
            n_meta=n_meta,
        )
        .to_pandas()
    )
    total = int(counts["n"].sum())
    terms = pa.array(counts["term"], pa.string())
    weights = (total * 1000) // counts["n"].to_numpy().astype(np.int64)
    w_ref = ray.put((terms, weights))

    def score(b: pa.Table) -> pa.Table:
        tarr, w = ray.get(w_ref)
        toks = pc.split_pattern(pc.fill_null(b[text_col], ""), pattern=" ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        off = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
            flat.offset : flat.offset + len(flat) + 1
        ].astype(np.int64)
        idx = pc.index_in(flat.flatten(), value_set=tarr).to_numpy(zero_copy_only=False)
        tok_w = w[idx.astype(np.int64)]  # every token is in the corpus vocab
        starts = off - off[0]
        if len(tok_w):
            # clip trailing-empty-row start indices (reduceat requires
            # index < len; the where() below zeroes those rows anyway)
            sums = np.add.reduceat(tok_w, np.minimum(starts[:-1], len(tok_w) - 1))
        else:
            sums = np.zeros(len(b), np.int64)
        sums = np.where(np.diff(starts) > 0, sums, 0)
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "rarity_milli": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=8192)
