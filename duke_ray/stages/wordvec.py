"""PPMI-weighted co-occurrence vectors -> PCA word embeddings.

The word-vector user story (VERDICT r4 next-round #7): compose the two
existing primitives — windowed co-occurrence counting
(``stages/textstats.py:cooccurrence``) and distributed PCA
(``stages/embedagg.py:pca_project``) — into count-based word embeddings
(Levy & Goldberg 2014: PPMI + SVD/PCA factorization approximates
word2vec's objective). The reference consumes pre-trained wiki2vec
vectors (/root/reference/Duke/embedding.py) but never constructs them;
this is the construction path, built from public formulas only.

Scale shape: the pairs table is OUTPUT-bounded (min_count-filtered), so
everything here is post-aggregation metadata relative to the corpus.
Context dimensions are the top ``n_context`` tokens by unigram count
(total order: count desc, token asc) — selected via per-partition
partial top-k (only ~n_meta * n_context rows reach the driver, never
the vocab). Vector assembly is one token-keyed ``partitioned_reduce``
scattering each partition's pairs into a dense (tokens x n_context)
matrix — no Python per row, no corpus re-scan.

PPMI is derived purely from the already-exact integer ``lift_milli``:
``ppmi_milli = max(0, round(1000 * ln(lift_milli / 1000)))`` —
deterministic at any parallelism because its input is an exact integer
(the milli quantization of lift is documented in ``cooccurrence``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..text import fnv1a64_arrow


def _ppmi_milli(lift_milli: np.ndarray) -> np.ndarray:
    """max(0, round(1000 * ln(lift_milli/1000))) as int64; lift_milli = 0
    (sub-milli lift) maps to 0."""
    out = np.zeros(len(lift_milli), np.int64)
    pos = lift_milli > 1000  # ln <= 0 -> PPMI 0
    if pos.any():
        out[pos] = np.floor(
            1000.0 * np.log(lift_milli[pos].astype(np.float64) / 1000.0) + 0.5
        ).astype(np.int64)
    return out


def context_vocab(
    pairs: "ray.data.Dataset", n_context: int = 64, n_meta: int = 64
) -> list[str]:
    """Top ``n_context`` tokens by unigram count (desc, token asc) from a
    cooccurrence pairs table — per-partition partial top-k, driver merge
    of <= n_meta * n_context candidate rows."""
    from ..state.exchange import partitioned_reduce

    def tok_sides(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "token": pa.concat_arrays(
                    [b["tok_a"].combine_chunks(), b["tok_b"].combine_chunks()]
                ),
                "n_uni": pa.concat_arrays(
                    [
                        b["n_a"].combine_chunks().cast(pa.int64()),
                        b["n_b"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )
        g = t.group_by("token").aggregate([("n_uni", "max")])
        return g.rename_columns(["token", "n_uni"])

    def top_partition(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("n_uni", "max")])
        toks = g["token"].to_numpy(zero_copy_only=False)
        n = g["n_uni_max"].to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -n))[:n_context]
        idx = pa.array(order, pa.int64())
        return pa.table(
            {"token": g["token"].take(idx), "n_uni": g["n_uni_max"].take(idx)}
        )

    cand = partitioned_reduce(
        pairs.map_batches(tok_sides, batch_format="pyarrow"),
        "token",
        top_partition,
        n_meta=n_meta,
    ).to_pandas()
    if not len(cand):
        return []
    order = np.lexsort((cand["token"].to_numpy(), -cand["n_uni"].to_numpy()))
    return [str(t) for t in cand["token"].to_numpy()[order][:n_context]]


def ppmi_vectors(
    pairs: "ray.data.Dataset",
    n_context: int = 64,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Co-occurrence pairs -> (vec_id, token, embedding) dense PPMI
    vectors over the top-``n_context`` context tokens.

    Every token appearing in the pairs table gets a row (zero vector if
    none of its contexts made the top-C cut). ``vec_id`` is the token's
    FNV-1a64 hash viewed int64; a cross-token collision would silently
    merge two rows, so callers that need the guarantee assert
    ``count() == distinct vec_id`` (the gate query does)."""
    from ..state.exchange import partitioned_reduce

    ctx = context_vocab(pairs, n_context=n_context, n_meta=n_meta)
    dim_of = {t: i for i, t in enumerate(ctx)}
    c = len(ctx)
    ctx_ref = ray.put(dim_of)

    def expand(b: pa.Table) -> pa.Table:
        d = ray.get(ctx_ref)
        ta = b["tok_a"].combine_chunks()
        tb = b["tok_b"].combine_chunks()
        ppmi = _ppmi_milli(b["lift_milli"].to_numpy(zero_copy_only=False))
        # both directions: (row=a, ctx=b) and (row=b, ctx=a)
        rows = pa.concat_arrays([ta, tb])
        ctxs = pa.concat_arrays([tb, ta])
        pp = np.concatenate([ppmi, ppmi])
        dims = np.array(
            [d.get(x, -1) for x in ctxs.to_pylist()], np.int64
        )  # ctx vocab is tiny; dict lookup over pair rows (output-bounded)
        return pa.table(
            {
                "token": rows,
                "dim": pa.array(dims, pa.int64()),
                "ppmi_milli": pa.array(pp, pa.int64()),
            }
        )

    def assemble(t: pa.Table) -> pa.Table:
        toks = t["token"].to_numpy(zero_copy_only=False)
        dims = t["dim"].to_numpy(zero_copy_only=False)
        pp = t["ppmi_milli"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        mat = np.zeros((len(uniq), c), np.float64)
        keep = dims >= 0
        mat[inv[keep], dims[keep]] = pp[keep] / 1000.0
        tok_arr = pa.array(uniq, pa.string())
        return pa.table(
            {
                "vec_id": pa.array(
                    fnv1a64_arrow(tok_arr).view(np.int64), pa.int64()
                ),
                "token": tok_arr,
                "embedding": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, (len(uniq) + 1) * c, c, dtype=np.int32),
                        pa.int32(),
                    ),
                    pa.array(mat.ravel(), pa.float64()),
                ),
            }
        )

    expanded = pairs.map_batches(expand, batch_format="pyarrow")
    return partitioned_reduce(expanded, "token", assemble, n_meta=n_meta)


def ppmi_pca(
    docs: "ray.data.Dataset",
    k: int = 4,
    window: int = 4,
    min_count: int = 3,
    n_context: int = 64,
    text_col: str = "text",
    return_model: bool = False,
):
    """End-to-end count-based word embeddings: cooccurrence -> PPMI
    vectors -> distributed PCA projection. Returns the projection
    Dataset (vec_id, comp, coord_micro) plus, with ``return_model=True``,
    a dict carrying the PCA model AND the (vec_id, token) mapping
    Dataset for joining projections back to words."""
    from .embedagg import pca_project
    from .textstats import cooccurrence

    pairs = cooccurrence(
        docs, text_col=text_col, window=window, min_count=min_count
    ).materialize()
    vecs = ppmi_vectors(pairs, n_context=n_context).materialize()
    if vecs.count() == 0:
        # empty corpus / nothing above min_count: empty projection with
        # the pca_project schema instead of tripping its zero-row guard
        empty = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "comp": pa.array([], pa.int64()),
                    "coord_micro": pa.array([], pa.int64()),
                }
            )
        )
        if return_model:
            model = {
                "eigenvalues": np.zeros(0, np.float64),
                "components": np.zeros((0, 0), np.float64),
                "mean": np.zeros(0, np.float64),
                "tokens": vecs,
                "vectors": vecs,
            }
            return empty, model
        return empty
    proj, model = pca_project(
        vecs, k=k, vec_col="embedding", id_col="vec_id", return_model=True
    )
    if return_model:
        model = dict(model)
        model["tokens"] = vecs.select_columns(["vec_id", "token"])
        model["vectors"] = vecs
        return proj, model
    return proj
