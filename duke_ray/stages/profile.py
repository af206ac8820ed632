"""One-scan distributed table profiling — per-column stats for ingest
validation / data contracts (the "profile before you process" step of a
large-scale pipeline).

One streaming pass emits a metadata-sized partial per (batch, column);
a column-keyed reduce combines them (min of mins / max of maxes / sums).
Nothing corpus-scale ever shuffles: the exchange carries
O(n_batches x n_columns) rows.

Exactness contract (so the result value-hashes against a SQL oracle):
- integer columns: raw min / max / sum (int64);
- float columns: milli-quantized ints ``floor(v * 1000 + 0.5)`` —
  min / max / sum of the quantized values (both engines do the same
  IEEE double multiply-add-floor, so results match bit-for-bit);
- timestamps: epoch-microsecond min / max (sum omitted — epoch sums
  overflow int64 at ~5k rows);
- strings: bytewise min / max (DuckDB's default binary collation) and
  total utf8 length.

Distinct counts are deliberately NOT here: exact distinct is a
vocab-scale exchange per column (use ``term_frequencies``-style ops
when you need it) and approximate distinct already exists as the HLL
sketch op (``functions/sketch.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

PROFILE_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("min_int", pa.int64()),
        ("max_int", pa.int64()),
        ("sum_int", pa.int64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("total_len", pa.int64()),
    ]
)


def _col_partial(name: str, col: pa.ChunkedArray | pa.Array) -> dict:
    t = col.type
    n = len(col)
    n_null = col.null_count
    row = {
        "column": name,
        "n": n,
        "n_null": n_null,
        "min_int": None,
        "max_int": None,
        "sum_int": None,
        "min_str": None,
        "max_str": None,
        "total_len": None,
    }
    if n == n_null:
        return row
    if pa.types.is_integer(t):
        mm = pc.min_max(col)
        row["min_int"] = mm["min"].as_py()
        row["max_int"] = mm["max"].as_py()
        row["sum_int"] = pc.sum(col.cast(pa.int64())).as_py()
    elif pa.types.is_floating(t):
        v = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        q = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        row["min_int"] = int(q.min())
        row["max_int"] = int(q.max())
        row["sum_int"] = int(q.sum())
    elif pa.types.is_timestamp(t):
        us = col.cast(pa.timestamp("us")).cast(pa.int64())
        mm = pc.min_max(us)
        row["min_int"] = mm["min"].as_py()
        row["max_int"] = mm["max"].as_py()
        # sum omitted: epoch-us sums overflow int64 almost immediately
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(col)
        row["min_str"] = mm["min"].as_py()
        row["max_str"] = mm["max"].as_py()
        row["total_len"] = pc.sum(pc.utf8_length(col).cast(pa.int64())).as_py() or 0
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        row["total_len"] = pc.sum(pc.binary_length(col).cast(pa.int64())).as_py() or 0
    # other types: count/null-count only (documented)
    return row


def table_profile(
    ds: "ray.data.Dataset", columns: list[str] | None = None, n_meta: int = 16
) -> "ray.data.Dataset":
    """Per-column profile rows (PROFILE_SCHEMA), one row per column."""
    from ..state.exchange import partitioned_reduce

    def partial(batch: pa.Table) -> pa.Table:
        names = columns or batch.column_names
        rows = [_col_partial(c, batch[c]) for c in names]
        return pa.Table.from_pylist(rows, schema=PROFILE_SCHEMA)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("column").aggregate(
            [
                ("n", "sum"),
                ("n_null", "sum"),
                ("min_int", "min"),
                ("max_int", "max"),
                ("sum_int", "sum"),
                ("min_str", "min"),
                ("max_str", "max"),
                ("total_len", "sum"),
            ]
        )
        out = g.rename_columns(
            [
                "column",
                "n",
                "n_null",
                "min_int",
                "max_int",
                "sum_int",
                "min_str",
                "max_str",
                "total_len",
            ]
        ).cast(PROFILE_SCHEMA)
        # null-free output (a null string column breaks value-hash
        # comparison downstream): non-applicable stats get deterministic
        # sentinels — 0 for ints, '' for strings. Partials stay null
        # internally so the combine's min/max/sum are uncorrupted.
        filled = {
            "column": out["column"],
            "n": out["n"],
            "n_null": out["n_null"],
        }
        for c in ("min_int", "max_int", "sum_int", "total_len"):
            filled[c] = pc.fill_null(out[c], 0)
        for c in ("min_str", "max_str"):
            filled[c] = pc.fill_null(out[c], "")
        return pa.table(filled).select(PROFILE_SCHEMA.names).cast(PROFILE_SCHEMA)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(partials, "column", combine, n_meta=n_meta)
