"""Generic approximate distinct-count per group (HLL sketch-per-key) —
the mergeable-sketch exchange as a reusable operator over ANY
(group, value) column pair, e.g. distinct users per event type, distinct
domains per language, distinct n-grams per shard.

Same topology as the triple-scale instance in
stages/canonicalize.py:canonicalize_triples_approx (which keeps its
fused occurrence-count variant): each batch emits ONE constant-size
register row per group it sees (functions/sketch.py:grouped_registers —
vectorized, no per-key Python), rows merge associatively in one
partitioned_reduce (register-wise max), estimates come from the chunked
power-of-two LUT. Exchange volume is n_blocks x n_groups x 2^p bytes —
independent of row count, the 100-TB path for per-key cardinality where
exact distinct (a (group, value)-keyed exchange, cf. relational.py:
distinct_segments) would shuffle corpus-scale rows.

Error: +-~1.04/sqrt(2^p) (p=12 -> ~1.6%); small groups hit the
linear-counting regime and are near-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.sketch import (
    estimate_rows,
    grouped_registers,
    merge_grouped_registers,
    registers_from_binary,
    registers_to_binary,
)
from ..state.exchange import partitioned_reduce
from ..text import fnv1a64_arrow


def approx_distinct_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    p: int = 12,
    out_col: str = "n_distinct_est",
) -> "ray.data.Dataset":
    """(group_col, out_col) — HLL estimate of COUNT(DISTINCT value_col)
    per group. Values are hashed with FNV-1a64 over their string form
    (deterministic across runs and widths)."""
    m = 1 << p

    def batch_sketches(batch: pa.Table) -> pa.Table:
        col = batch[group_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dic = col.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dic.dictionary
        vh = fnv1a64_arrow(batch[value_col].cast(pa.string()))
        regs = grouped_registers(vh, codes, len(uniq), p)
        return pa.table({group_col: uniq, "sketch": registers_to_binary(regs)})

    def merge_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], pa.string()), out_col: pa.array([], pa.int64())}
            )
        col = t[group_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dic = col.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dic.dictionary
        merged = merge_grouped_registers(registers_from_binary(t["sketch"], m), codes, len(uniq))
        est = np.rint(estimate_rows(merged)).astype(np.int64)
        return pa.table({group_col: uniq, out_col: pa.array(est, pa.int64())})

    partials = ds.map_batches(batch_sketches, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(partials, group_col, merge_partition)
