"""Sequence packing: fixed token-budget training sequences.

LLM pretraining consumes fixed-length sequences; the prep step packs
variable-length documents into `budget`-token slots. The reference stops
at per-doc frames (/root/reference/Duke/dataset.py — one row per doc, no
notion of a training sequence). Distributed packing needs a total order
(greedy packing is sequential), which this module makes cheap and
deterministic the same way stages/shuffle.py does:

  bucket = int(md5(str(id))[:k], 16)    (16**k independent pack streams)
  order within bucket = (md5 key, id)   (the deterministic shuffle order
                                         — packs mix random docs, which
                                         is exactly what training wants)
  seq_id = tokens_before // budget      (exclusive prefix sum: boundary
                                         packing with overflow — a doc
                                         belongs to the slot where it
                                         starts; oversized docs consume
                                         multiple slot ids)

Only (id, n_tokens, key) rows cross the ONE bucket-keyed exchange —
metadata-sized per doc regardless of text size; the per-bucket reduce
sorts its slice, runs a vectorized cumsum, and emits either per-doc
assignments or the bounded per-sequence manifest. Bucket count scales
with the corpus (16**k) so one bucket's (id, len) rows fit a task.

Deterministic at any parallelism (pure function of ids), and exactly
SQL-expressible: SUM() OVER (PARTITION BY bucket ORDER BY key, id ROWS
UNBOUNDED PRECEDING AND 1 PRECEDING) // budget — the `pack_sequences`
driver-gate oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .sampling import _md5_hex
from .shuffle import _KEY_HEX, _hex_part, _log16


def _keyed_rows(
    ds: "ray.data.Dataset", id_col: str, tokens_col: str, k: int
) -> "ray.data.Dataset":
    def per_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if pc.any(pc.is_null(b[tokens_col])).as_py():
            # a null length would poison the prefix sums silently
            raise ValueError(f"null {tokens_col} in pack input; fill or drop first")
        keys = _md5_hex(b[id_col], _KEY_HEX)
        return pa.table(
            {
                "id": b[id_col].cast(pa.int64()),
                "n_tokens": b[tokens_col].cast(pa.int64()),
                "skey": pa.array(keys),
                "bucket": pa.array(_hex_part(keys, k), pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=65536)


def _seq_sorted(t: pa.Table, budget: int) -> tuple[pa.Table, np.ndarray]:
    """Sort one exchange partition (>= 1 whole buckets) into pack order
    and assign seq ids by per-bucket exclusive prefix sum. Returns the
    sorted table plus the aligned seq-id array."""
    import pyarrow.compute as pc

    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[
                ("bucket", "ascending"),
                ("skey", "ascending"),
                ("id", "ascending"),
            ],
        )
    )
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    toks = t["n_tokens"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(toks)
    # subtract each bucket run's inclusive-cumsum base -> per-bucket
    # exclusive prefix sum, fully vectorized over the sorted runs
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    base = np.zeros(len(toks), np.int64)
    base[starts] = cum[starts] - toks[starts]  # == cum before the run
    np.maximum.accumulate(base, out=base)
    before = cum - toks - base
    return t, before // budget


def _pack_partition(t: pa.Table, budget: int, manifest: bool) -> pa.Table:
    t, seq = _seq_sorted(t, budget)
    if not manifest:
        return pa.table(
            {
                "doc_id": t["id"],
                "bucket": t["bucket"],
                "seq_id": pa.array(seq, pa.int64()),
            }
        )
    g = pa.table(
        {
            "bucket": t["bucket"],
            "seq_id": pa.array(seq, pa.int64()),
            "n_tokens": t["n_tokens"],
            "id": t["id"],
        }
    ).group_by(["bucket", "seq_id"]).aggregate(
        [("seq_id", "count"), ("n_tokens", "sum"), ("id", "min"), ("id", "max")]
    )
    return g.rename_columns(
        ["bucket", "seq_id", "n_docs", "n_tokens", "min_id", "max_id"]
    )


def _export_partition(t: pa.Table, budget: int, sep: str) -> pa.Table:
    """Per-sequence concatenated text, docs in pack order. After
    ``_seq_sorted`` every (bucket, seq) group is a CONTIGUOUS run, so the
    concat builds straight from run boundaries — no hash aggregation, no
    reliance on grouped-list encounter order."""
    import pyarrow.compute as pc

    t, seq = _seq_sorted(t, budget)
    empty_cols = {
        "bucket": pa.array([], pa.int64()),
        "seq_id": pa.array([], pa.int64()),
        "n_docs": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "seq_text": pa.array([], pa.string()),
    }
    if t.num_rows == 0:
        return pa.table(empty_cols)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    toks = t["n_tokens"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(
        np.r_[True, (bucket[1:] != bucket[:-1]) | (seq[1:] != seq[:-1])]
    )
    ends = np.r_[starts[1:], len(bucket)]
    texts = pa.ListArray.from_arrays(
        pa.array(np.r_[starts, len(bucket)], pa.int32()),
        t["text"].combine_chunks(),
    )
    return pa.table(
        {
            "bucket": pa.array(bucket[starts], pa.int64()),
            "seq_id": pa.array(seq[starts], pa.int64()),
            "n_docs": pa.array(ends - starts, pa.int64()),
            "n_tokens": pa.array(np.add.reduceat(toks, starts), pa.int64()),
            "seq_text": pc.binary_join(texts, sep),
        }
    )


def pack_assignments(
    ds: "ray.data.Dataset",
    budget: int,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> "ray.data.Dataset":
    """Per-doc (doc_id, bucket, seq_id) pack assignment — join it back to
    the corpus to materialize packed sequences."""
    from ..state.exchange import partitioned_reduce

    k = _log16(n_buckets)
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    return partitioned_reduce(
        _keyed_rows(ds, id_col, tokens_col, k),
        "bucket",
        lambda t: _pack_partition(t, budget, manifest=False),
        n_meta=min(16, n_buckets),
    )


def pack_export(
    ds: "ray.data.Dataset",
    budget: int,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    text_col: str = "text",
    sep: str = " ",
) -> "ray.data.Dataset":
    """Materialized packed sequences: (bucket, seq_id, n_docs, n_tokens,
    seq_text) with seq_text = member docs joined by ``sep`` in pack
    order. The one op where text DOES cross the exchange — exactly once,
    as the actual output; everything else here ships metadata rows."""
    from ..state.exchange import partitioned_reduce

    k = _log16(n_buckets)
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    def per_batch(b: pa.Table) -> pa.Table:
        keys = _md5_hex(b[id_col], _KEY_HEX)
        return pa.table(
            {
                "id": b[id_col].cast(pa.int64()),
                "n_tokens": b[tokens_col].cast(pa.int64()),
                "text": b[text_col].cast(pa.string()),
                "skey": pa.array(keys),
                "bucket": pa.array(_hex_part(keys, k), pa.int64()),
            }
        )

    keyed = ds.map_batches(per_batch, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(
        keyed,
        "bucket",
        lambda t: _export_partition(t, budget, sep),
        n_meta=min(16, n_buckets),
    )


def pack_manifest(
    ds: "ray.data.Dataset",
    budget: int,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> "ray.data.Dataset":
    """Per-sequence manifest (bucket, seq_id, n_docs, n_tokens, min_id,
    max_id) — output bounded by corpus_tokens/budget rows."""
    from ..state.exchange import partitioned_reduce

    k = _log16(n_buckets)
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    return partitioned_reduce(
        _keyed_rows(ds, id_col, tokens_col, k),
        "bucket",
        lambda t: _pack_partition(t, budget, manifest=True),
        n_meta=min(16, n_buckets),
    )
