"""Distributed embedding aggregation: per-label centroid sums in exact
integer micro-units.

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
