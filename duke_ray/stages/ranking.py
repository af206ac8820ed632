"""Distributed per-group top-k by VALUE (ROW_NUMBER-style ranking) —
the "best N per key" selection every leaderboard / keep-best pipeline
needs. Beyond the reference (its only ranking is a global argmax over a
788-class score map, /root/reference/Duke/dataset_descriptor.py:57); the
per-key md5-RANK variant lives in stages/sampling.py:stratified_sample.

Scale shape: top-k per key is a MERGEABLE aggregate — each input batch
keeps at most k rows per key it sees (pure map, no coordination), then
one hash exchange (state/exchange.partitioned_reduce) co-locates the
survivors per key and the same kernel finalizes with a 1-based rank.
Only ≤ k rows per (batch, key) cross the wire, never the corpus; key
cardinality may scale with the corpus (no driver state, no broadcast).

Kernel is one vectorized pass per partition: lexsort by
(key, value[desc], tie), segment-boundary run detection, rank =
offset-in-run (the stages/dedup.py _runs idiom) — no per-key Python call
(the ~60µs/key map_groups pathology, CLAUDE.md).

Determinism: (value, tie) must be unique per key for a stable top-k —
callers pass a unique id as ``tie_col`` (matches the SQL oracle's
``ORDER BY value DESC, tie`` ROW_NUMBER frame).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.exchange import partitioned_reduce


def _topk_take(
    t: pa.Table,
    key_col: str,
    value_col: str,
    tie_col: str,
    k: int,
    descending: bool,
) -> tuple[pa.Table, np.ndarray]:
    """Rows ranked < k within their key, plus each survivor's 0-based
    rank (in key-major, value-ordered output order)."""
    key = t[key_col].to_numpy(zero_copy_only=False)
    val = t[value_col].to_numpy(zero_copy_only=False)
    tie = t[tie_col].to_numpy(zero_copy_only=False)
    n = len(key)
    if n == 0:
        return t, np.zeros(0, np.int64)
    # int64 negation is safe for the value domains we rank (counts/cents
    # ≥ 0); guard the one unrepresentable point rather than copy to float.
    if descending:
        if val.dtype.kind == "i" and val.min() == np.iinfo(val.dtype).min:
            raise ValueError("group_topk: value contains INT_MIN; cannot negate")
        sortval = -val
    else:
        sortval = val
    order = np.lexsort((tie, sortval, key))
    ks = key[order]
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = ks[1:] != ks[:-1]
    seg_start = np.flatnonzero(new_seg)
    seg_len = np.diff(np.append(seg_start, n))
    rank = np.arange(n, dtype=np.int64) - np.repeat(seg_start, seg_len)
    keep = rank < k
    sel = order[keep]
    return t.take(pa.array(sel, pa.int64())), rank[keep]


def group_topk(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    k: int,
    tie_col: str,
    descending: bool = True,
    rank_col: str = "rk",
    n_meta: int = 256,
) -> "ray.data.Dataset":
    """Top-``k`` rows per ``key_col`` by ``value_col`` with a 1-based
    ``rank_col`` — all input columns pass through. Ranks are dense within
    a key by construction (every key keeps its first min(k, count) rows)."""
    if k < 1:
        raise ValueError("group_topk: k must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        kept, _ = _topk_take(batch, key_col, value_col, tie_col, k, descending)
        return kept

    def finalize(t: pa.Table) -> pa.Table:
        kept, rank = _topk_take(t, key_col, value_col, tie_col, k, descending)
        return kept.append_column(rank_col, pa.array(rank + 1, pa.int64()))

    pruned = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(pruned, key_col, finalize, n_meta=n_meta)


def percentile_rank_milli(
    ds: "ray.data.Dataset",
    value_col: str,
    out_col: str = "pct_milli",
    max_distinct: int = 4_000_000,
) -> "ray.data.Dataset":
    """Global PERCENT_RANK per row in integer milli —
    ``floor(1000 * cnt_less / (N - 1))`` (ties share a rank, SQL
    PERCENT_RANK semantics) — WITHOUT a global sort: one grouped_sum
    builds the (value -> count) histogram, the driver cumsums it into a
    CDF (metadata-sized under the bounded-distinct assumption: token
    counts, quantized scores, sizes), one ``ray.put`` broadcast + one
    stateless searchsorted map attaches the rank. The corpus itself never
    shuffles — this is the normalization shape for quality-score
    percentiles at 100 TB. Raises past ``max_distinct`` distinct values;
    the unbounded/adversarial-range path is the KLL sketch
    (functions/kll.py), which trades exactness for a bounded summary.

    Float discipline: milli = ``floor(1000.0 * (less / (N-1)))`` with the
    division FIRST — the exact operation order of
    ``FLOOR(1000 * PERCENT_RANK())`` in SQL, so the float64 results are
    bit-identical."""
    from ..state.exchange import grouped_sum

    def val_rows(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "v": b[value_col].cast(pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by("v").aggregate([("one", "sum")])
        return g.rename_columns(["v", "one"])

    hist = grouped_sum(
        ds.map_batches(val_rows, batch_format="pyarrow", batch_size=65536), "v", {"one": "n"}
    ).to_pandas()
    if len(hist) > max_distinct:
        raise ValueError(
            f"percentile_rank_milli: {len(hist)} distinct values > {max_distinct}; "
            "use the KLL sketch path for unbounded-range columns"
        )
    hist = hist.sort_values("v").reset_index(drop=True)
    vals = hist["v"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    cnt_less = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    ref = ray.put((vals, cnt_less, total))

    def attach(b: pa.Table) -> pa.Table:
        v, less, n = ray.get(ref)
        x = b[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(v, x)
        if n > 1:
            milli = np.floor(1000.0 * (less[idx] / (n - 1))).astype(np.int64)
        else:
            milli = np.zeros(len(x), np.int64)
        return b.append_column(out_col, pa.array(milli, pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=65536)
