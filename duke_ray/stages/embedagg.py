"""Distributed embedding aggregation: per-label centroid sums and full
Lloyd k-means in exact integer micro-units.

The k-means E-step / class-prototype building block over an embedding
column (`list<float>`). Floating-point vector sums are summation-order-
dependent, so a distributed mean could never value-hash against a serial
oracle; instead each component is quantized ONCE (micro-units,
``floor(x * 1e6 + 0.5)`` in float64 — bit-identical in numpy and DuckDB)
and the engine ships order-independent int64 sums (the same template
that makes integer PageRank bit-identical across cluster sizes,
stages/graph.py). The caller divides ``sum_micro / (n_vecs * 1e6)`` for
the float centroid.

Topology: per-batch C++ group-by partials (cardinality |labels in
batch| × dim), then one ``grouped_sum`` exchange keyed on a single
combined ``label * 2^20 + dim`` int64 (multi-column group keys are ~15×
slower in Ray's aggregate — state/exchange.py docs). Shuffle volume is
|labels| × dim per block — metadata-sized at any corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_DIM_BITS = 20  # combined key = label << 20 | dim; supports dim < 2^20


def _flatten_embeddings(batch: pa.Table, vec_col: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """list<float> column -> (row_index, dim, value_f64) flat arrays."""
    emb = batch[vec_col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    off_buf = emb.buffers()[1]
    offsets = np.frombuffer(off_buf, dtype=np.int32)[emb.offset : emb.offset + len(emb) + 1]
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    row = np.repeat(np.arange(len(emb), dtype=np.int64), lengths)
    g = np.arange(int(lengths.sum()), dtype=np.int64)
    dim = g - np.repeat(offsets[:-1].astype(np.int64) - offsets[0], lengths)
    return row, dim, flat


def label_centroid_sums(
    vecs: "ray.data.Dataset",
    label_col: str = "label",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """(label, embedding) -> (label, dim, sum_micro, n_vecs): exact int64
    component sums in micro-units plus the vector count per label."""

    def partial(batch: pa.Table) -> pa.Table:
        row, dim, val = _flatten_embeddings(batch, vec_col)
        if np.any(dim >= (1 << _DIM_BITS)):
            raise ValueError(f"embedding dim must be < 2^{_DIM_BITS}")
        labels = batch[label_col].cast(pa.int64()).to_numpy(zero_copy_only=False)[row]
        if labels.size and labels.min() < 0:
            raise ValueError("labels must be non-negative (packed key)")
        v_micro = np.floor(val * micro + 0.5).astype(np.int64)
        key = (labels << _DIM_BITS) | dim
        t = pa.table(
            {
                "k": pa.array(key, pa.int64()),
                "sum_micro": pa.array(v_micro, pa.int64()),
                # n_vecs per (label, dim) = vectors contributing that
                # component (equals the per-label count for fixed-dim data)
                "n_vecs": pa.array(np.ones(len(key), np.int64), pa.int64()),
            }
        )
        g = t.group_by("k").aggregate([("sum_micro", "sum"), ("n_vecs", "sum")])
        return g.rename_columns(["k", "sum_micro", "n_vecs"])

    from ..state.exchange import grouped_sum

    partials = vecs.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    summed = grouped_sum(
        partials, "k", {"sum_micro": "sum_micro", "n_vecs": "n_vecs"}, n_meta=n_meta
    )

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": pa.array(k >> _DIM_BITS, pa.int64()),
                "dim": pa.array(k & ((1 << _DIM_BITS) - 1), pa.int64()),
                "sum_micro": b["sum_micro"].cast(pa.int64()),
                "n_vecs": b["n_vecs"].cast(pa.int64()),
            }
        )

    return summed.map_batches(unpack, batch_format="pyarrow")


# --- full Lloyd k-means, integer fixed-point --------------------------------

# |v_micro| bound: squared distances must fit int64. dim < 2^20 and
# |v| <= 2^21 give dist <= dim * (2^22)^2 < 2^63.
_V_BOUND = 1 << 21


def _matrix_of(batch: pa.Table, vec_col: str, dim: int) -> np.ndarray:
    """Fixed-dim list<int64> column -> (n, dim) int64 matrix (validated)."""
    emb = batch[vec_col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    off = np.frombuffer(emb.buffers()[1], dtype=np.int32)[
        emb.offset : emb.offset + len(emb) + 1
    ]
    if np.any(np.diff(off) != dim):
        raise ValueError("k-means requires a fixed embedding dimension")
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(emb), dim)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero — DuckDB ``//`` semantics
    (numpy's ``//`` floors, which differs on negative sums)."""
    return np.sign(s) * (np.abs(s) // n)


def kmeans_lloyd(
    vecs: "ray.data.Dataset",
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """Full distributed Lloyd k-means in exact integer fixed-point ->
    (vec_id, cluster) assignments after ``iters`` iterations.

    The embedding-clustering step of a curation pipeline (semantic dedup /
    topic bucketing), built so the distributed result is BIT-IDENTICAL to
    a serial oracle at any cluster size (the integer-PageRank template,
    stages/graph.py):

    - components quantized ONCE to int64 micro-units
      (``floor(x * micro + 0.5)`` in float64 — same rule as
      :func:`label_centroid_sums` and its DuckDB oracle);
    - assignment = argmin of EXACT integer squared L2 distance, ties to
      the smallest cluster id;
    - update = per-(cluster, dim) int64 component sums via one
      ``grouped_sum`` exchange (shuffle = k x dim rows per block,
      metadata-sized), new centroid = ``sum // n`` truncating toward zero
      (DuckDB ``//``); an empty cluster keeps its previous centroid;
    - seeds = the k vectors with the smallest ids (per-batch partial
      top-k, so the corpus never sorts).

    Topology per iteration: one streamed corpus pass emitting k x dim
    partial rows per task; when ``k * dim <= 65536`` the partials come
    straight to the driver and combine in one numpy pass (blocks x k x
    dim rows — metadata-sized; skipping the per-iteration sort barrier
    measurably helps the barrier-bound scaling profile, like the r4
    PageRank fusion), else they reduce through one ``grouped_sum``
    exchange. The quantized corpus is materialized once and re-read from
    plasma each pass (``iters`` + 1 passes total, the final one emitting
    assignments). The reference has no clustering op; this extends its
    embedding aggregation surface
    (/root/reference/Duke/dataset_descriptor.py:57 dense similarity) to
    the iterative-clustering family.
    """
    if k < 1 or k >= (1 << 12):
        raise ValueError("k must be in [1, 4096)")

    def quant(batch: pa.Table) -> pa.Table:
        emb = batch[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = np.frombuffer(emb.buffers()[1], dtype=np.int32)[
            emb.offset : emb.offset + len(emb) + 1
        ]
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.floor(flat * micro + 0.5).astype(np.int64)
        if v.size and np.abs(v).max() >= _V_BOUND:
            raise ValueError("quantized component exceeds the int64 distance bound")
        q = pa.ListArray.from_arrays(pa.array(off - off[0], pa.int32()), pa.array(v, pa.int64()))
        return pa.table({id_col: batch[id_col].cast(pa.int64()), "q": q})

    qv = vecs.map_batches(quant, batch_format="pyarrow", batch_size=65536).materialize()

    # seeds: k smallest ids. Per-batch partial top-k, tiny driver combine.
    def seed_partial(batch: pa.Table) -> pa.Table:
        return batch.sort_by(id_col).slice(0, k)

    seeds = (
        qv.map_batches(seed_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
        .head(k)
    )
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the corpus size {len(seeds)}")
    C = np.stack([np.asarray(x, dtype=np.int64) for x in seeds["q"]])
    dim = C.shape[1]
    if dim >= (1 << _DIM_BITS):
        raise ValueError(f"embedding dim must be < 2^{_DIM_BITS}")

    from ..state.exchange import grouped_sum

    def assigned(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # exact int64: |x|^2 - 2 x.c + |c|^2; argmin's first-min rule ==
        # ties to the smallest cluster id
        xx = np.einsum("ij,ij->i", X, X)
        cc = np.einsum("ij,ij->i", cents, cents)
        d = xx[:, None] - 2 * (X @ cents.T) + cc[None, :]
        return np.argmin(d, axis=1)

    for _ in range(iters):
        cents = C  # bind per-iteration (closure captures the loop variable)

        def sum_partial(batch: pa.Table, cents: np.ndarray = cents) -> pa.Table:
            X = _matrix_of(batch, "q", dim)
            a = assigned(X, cents)
            sums = np.zeros((k, dim), np.int64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            key = (np.repeat(np.arange(k, dtype=np.int64), dim) << _DIM_BITS) | np.tile(
                np.arange(dim, dtype=np.int64), k
            )
            return pa.table(
                {
                    "kk": pa.array(key, pa.int64()),
                    "sum_micro": pa.array(sums.reshape(-1), pa.int64()),
                    "n_vecs": pa.array(np.repeat(counts, dim), pa.int64()),
                }
            )

        partials = qv.map_batches(sum_partial, batch_format="pyarrow", batch_size=65536)
        if k * dim <= 65536:
            agg = partials.to_pandas()
        else:
            agg = grouped_sum(
                partials, "kk", {"sum_micro": "sum_micro", "n_vecs": "n_vecs"}, n_meta=n_meta
            ).to_pandas()
        kk = agg["kk"].to_numpy()
        new_c = C.copy()
        s = np.zeros((k, dim), np.int64)
        n = np.zeros((k, dim), np.int64)
        # additive scatter: the driver-combine path carries one row per
        # (block, cluster, dim), so keys repeat across blocks
        np.add.at(s, (kk >> _DIM_BITS, kk & ((1 << _DIM_BITS) - 1)), agg["sum_micro"].to_numpy())
        np.add.at(n, (kk >> _DIM_BITS, kk & ((1 << _DIM_BITS) - 1)), agg["n_vecs"].to_numpy())
        nz = n > 0
        new_c[nz] = _trunc_div(s[nz], n[nz])
        C = new_c

    final_c = C

    def assign_out(batch: pa.Table) -> pa.Table:
        X = _matrix_of(batch, "q", dim)
        a = assigned(X, final_c)
        return pa.table(
            {
                "vec_id": batch[id_col].cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return qv.map_batches(assign_out, batch_format="pyarrow", batch_size=65536)


def gram_matrix(
    vecs: "ray.data.Dataset",
    vec_col: str = "embedding",
    quant: int = 1000,
) -> pa.Table:
    """Exact integer Gram / second-moment matrix of an embedding column ->
    (i, j, sum_q, n_vecs) for the upper triangle i <= j — the distributed
    PCA / covariance building block (covariance = Gram minus the outer
    product of the column means, both derivable from this output plus
    :func:`label_centroid_sums`).

    Each component is quantized ONCE (``floor(x * quant + 0.5)``, the
    label_centroid_sums template), so the per-batch partial ``Xq^T Xq``
    is an exact int64 dim x dim matrix and the distributed sum is
    summation-order-independent — value-hashes against a DuckDB
    self-join oracle at any parallelism. Valid while
    ``n_rows * (quant * |x|_max)^2 < 2**63`` (~2e12 rows at milli
    quantization of unit-scale embeddings); past that, raise the batch
    guard below and split into per-partition Python-int combines.

    Per the r4 kmeans lesson: dim^2 partials are metadata-sized, so each
    task ships ONE (dim, dim) int64 matrix to the driver (numpy combine)
    — no exchange at all. The matmul runs in float64 (exact for batch
    partial magnitudes below 2**53, guarded) for BLAS speed, then casts.
    """

    def partial(batch: pa.Table) -> pa.Table:
        row, dim, val = _flatten_embeddings(batch, vec_col)
        if len(row) == 0:
            # ADVICE r4: rows whose embeddings flatten to zero elements
            # still count toward n_vecs (the SQL oracle's COUNT(*) counts
            # every row) — emit an empty-Gram partial carrying n.
            return pa.table(
                {
                    "g": pa.array([[]], pa.list_(pa.int64())),
                    "n": pa.array([batch.num_rows], pa.int64()),
                }
            )
        d = int(dim.max()) + 1
        n = batch.num_rows
        x = np.zeros((n, d), np.float64)
        x[row, dim] = val
        xq = np.floor(x * quant + 0.5)
        g = xq.T @ xq
        if np.abs(g).max() >= 2.0**53:
            raise ValueError("batch Gram partial exceeds float64 exactness; lower batch_size")
        return pa.table(
            {
                "g": pa.array([g.astype(np.int64).ravel().tolist()], pa.list_(pa.int64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    parts = vecs.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    if not len(parts):
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "sum_q": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
    mats = [np.asarray(m, np.int64) for m in parts["g"]]
    d = int(round(max(len(m) for m in mats) ** 0.5))
    total = np.zeros((d, d), np.int64)
    for m in mats:
        md = int(round(len(m) ** 0.5))
        total[:md, :md] += m.reshape(md, md)
    n_vecs = int(parts["n"].sum())
    iu, ju = np.triu_indices(d)
    return pa.table(
        {
            "i": pa.array(iu.astype(np.int64), pa.int64()),
            "j": pa.array(ju.astype(np.int64), pa.int64()),
            "sum_q": pa.array(total[iu, ju], pa.int64()),
            "n_vecs": pa.array(np.full(len(iu), n_vecs, np.int64), pa.int64()),
        }
    )


def pca_project(
    vecs: "ray.data.Dataset",
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
    return_model: bool = False,
):
    """Distributed PCA projection: exact integer second moments
    (:func:`gram_matrix` + per-dim sums) -> driver eigendecomposition of
    the dim x dim covariance (metadata-sized, float64 once) -> broadcast
    components -> ONE streamed projection pass. The corpus crosses the
    wire zero times; only dim^2 partials move.

    Output (vec_id, comp, coord_micro): centered projections in integer
    micro-units. Approximate by construction (input quantization + one
    float eigensolve), hence rows-only in the driver gate with in-query
    invariants (orthonormal components, descending eigenvalues) — the
    same contract as ivf_topk. Component signs are fixed by making each
    eigenvector's largest-magnitude entry positive, so the result is
    deterministic at any parallelism.

    Returns the projection Dataset; with ``return_model=True`` returns
    ``(Dataset, model)`` where model = {"eigenvalues", "components",
    "mean"} — threaded explicitly to invariant checks instead of shared
    mutable function-attribute state (ADVICE r4: two concurrent
    pca_project calls on one driver would race on an attribute).
    """
    import ray

    g = gram_matrix(vecs, vec_col=vec_col, quant=quant).to_pandas()
    if not len(g):
        raise ValueError("pca_project on an empty dataset")
    n = int(g["n_vecs"].iloc[0])
    d = int(g["j"].max()) + 1
    s = np.zeros((d, d), np.float64)
    s[g["i"], g["j"]] = g["sum_q"] / (quant * quant)
    s = s + np.triu(s, 1).T  # mirror the upper triangle

    def sum_partial(b: pa.Table) -> pa.Table:
        row, dim, val = _flatten_embeddings(b, vec_col)
        out = np.zeros(d, np.float64)
        np.add.at(out, dim, np.floor(val * quant + 0.5) / quant)
        return pa.table({"s": pa.array([out.tolist()], pa.list_(pa.float64()))})

    sp = vecs.map_batches(sum_partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    col_sum = np.sum([np.asarray(r, np.float64) for r in sp["s"]], axis=0)
    mean = col_sum / n
    cov = (s - n * np.outer(mean, mean)) / max(1, n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals, w = evals[order], evecs[:, order]
    # deterministic sign: largest-|entry| of each component made positive
    flip = np.sign(w[np.argmax(np.abs(w), axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    w = w * flip
    model = {"eigenvalues": evals, "components": w, "mean": mean}
    w_ref = ray.put((mean, w))

    def project(b: pa.Table) -> pa.Table:
        mu, comp = ray.get(w_ref)
        row, dim, val = _flatten_embeddings(b, vec_col)
        x = np.zeros((b.num_rows, d), np.float64)
        x[row, dim] = np.floor(val * quant + 0.5) / quant
        coords = (x - mu) @ comp
        ids = b[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        kk = comp.shape[1]
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, kk), pa.int64()),
                "comp": pa.array(np.tile(np.arange(kk, dtype=np.int64), len(ids)), pa.int64()),
                "coord_micro": pa.array(
                    np.floor(coords.ravel() * 1_000_000 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    out = vecs.map_batches(project, batch_format="pyarrow", batch_size=4096)
    return (out, model) if return_model else out
