"""Global sorted export: range-partitioned total ordering at corpus scale.

The reference sorts only driver-side leaderboards (
/root/reference/Duke/duke.py top-n handling); a 100-TB engine needs a
distributed ORDER BY whose output is consumable in order. The classic
shape (what ``ds.sort`` also does internally, here made explicit so the
partition layout is a durable, resumable artifact):

1. **Boundaries from metadata, not data movement** — exact
   PERCENTILE_DISC values of the sort column via the distributed value
   histogram (:func:`..stages.textstats.int_quantiles`): the only thing
   that reaches the driver is (distinct values × 1) rows.
2. **One scan assigns range partitions** — ``part = #{boundary < value}``
   (vectorized ``np.searchsorted``); all equal keys land in the same
   partition, so assignment is deterministic under any parallelism.
3. **Per-partition sort + write** — each partition's rows co-locate via
   one exchange, sort locally by ``(value, id)``, and land as ONE sorted
   parquet file under ``bucket=<part>/`` with stamp-after-write lineage
   manifests (``state/manifest.py`` contract) — bucket ids here are
   ORDERED range partitions, not hash buckets: reading ``bucket=0..P-1``
   concatenates to a globally sorted corpus. A killed run resumes paying
   only missing partitions.

``sort_manifest`` is the SQL-checkable projection of the same layout:
(part, n_rows, min/max value, min/max id) per range partition, value-
hashed against a DuckDB correlated-count oracle in the driver gate.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from .. import __version__
from ..state.manifest import _MANIFEST_DIR, _manifest_path, completed_buckets
from .textstats import int_quantiles


def range_bounds(
    ds: "ray.data.Dataset", col: str, n_parts: int
) -> np.ndarray:
    """Exact range-partition boundaries: PERCENTILE_DISC of ``col`` at
    p = i/n_parts, i in 1..n_parts-1, on the milli grid (``n_parts`` must
    divide 1000 so the boundary percentiles are exactly representable in
    the integer-milli quantile machinery AND in the SQL oracle)."""
    if n_parts < 1 or 1000 % n_parts:
        raise ValueError(f"n_parts must divide 1000, got {n_parts}")
    ps = tuple(i * 1000 // n_parts for i in range(1, n_parts))
    if not ps:
        return np.array([], np.int64)
    q = int_quantiles(ds, col, ps_milli=ps)
    return np.sort(q["value"].to_numpy(zero_copy_only=False).astype(np.int64))


def _assign(batch: pa.Table, col: str, bounds: np.ndarray) -> np.ndarray:
    val = batch[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    # partition = count of boundaries strictly below the value; ties
    # always share a partition (deterministic at any parallelism)
    return np.searchsorted(bounds, val, side="left").astype(np.int64)


def sort_manifest(
    ds: "ray.data.Dataset",
    col: str,
    n_parts: int = 8,
    id_col: str = "doc_id",
    n_meta: int = 16,
) -> "ray.data.Dataset":
    """Range-partition manifest of the global sort order ->
    (part, n_rows, min_val, max_val, min_id, max_id), all int64.

    Two streamed passes: one for the boundary histogram (metadata-sized
    exchange), one emitting per-batch per-part min/max/count partials
    combined by a part-keyed ``partitioned_reduce`` — the corpus itself
    never shuffles."""
    from ..state.exchange import partitioned_reduce

    bounds = range_bounds(ds, col, n_parts)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "part": pa.array(_assign(b, col, bounds), pa.int64()),
                "val": b[col].cast(pa.int64()),
                "id": b[id_col].cast(pa.int64()),
            }
        )
        g = t.group_by("part").aggregate(
            [("part", "count"), ("val", "min"), ("val", "max"), ("id", "min"), ("id", "max")]
        )
        return g.rename_columns(["part", "n_rows", "min_val", "max_val", "min_id", "max_id"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("part").aggregate(
            [
                ("n_rows", "sum"),
                ("min_val", "min"),
                ("max_val", "max"),
                ("min_id", "min"),
                ("max_id", "max"),
            ]
        )
        return g.rename_columns(["part", "n_rows", "min_val", "max_val", "min_id", "max_id"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(partials, "part", combine, n_meta=n_meta)


def sort_export_to_dir(
    ds: "ray.data.Dataset",
    col: str,
    out_dir: str,
    n_parts: int = 8,
    id_col: str = "doc_id",
    fingerprint: str = "",
) -> dict:
    """Materialize ``ds`` globally sorted by ``(col, id_col)`` under
    ``out_dir/bucket=<part>/`` — one SORTED parquet file per range
    partition, written inside the reduce task (tmp name + atomic rename;
    the partition either lands whole or not at all), manifests stamped
    after the run so a crash resumes paying only missing partitions.

    Reading bucket dirs in ascending order yields a total order. Size
    ``n_parts`` so one partition fits a task's heap (at 100 TB that
    means n_parts scales with the corpus; the boundary pass cost is
    unchanged — it is histogram-sized either way).

    Returns {"written_buckets", "skipped_buckets", "rows"}.
    """
    from ..state.exchange import partitioned_reduce

    os.makedirs(os.path.join(out_dir, _MANIFEST_DIR), exist_ok=True)
    done = completed_buckets(out_dir, fingerprint)
    for entry in os.listdir(out_dir):
        if entry.startswith("bucket="):
            b = int(entry.split("=", 1)[1])
            if b not in done:
                shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)

    bounds = range_bounds(ds, col, n_parts)
    done_arr = pa.array(sorted(done), pa.int64())

    def assign_filter(b: pa.Table) -> pa.Table:
        b = b.append_column("part", pa.array(_assign(b, col, bounds), pa.int64()))
        if len(done_arr):
            b = b.filter(pc.invert(pc.is_in(b["part"], value_set=done_arr)))
        return b

    def write_partition(t: pa.Table) -> pa.Table:
        # a meta group may hold several (small) parts — write each
        parts = pc.unique(t["part"]).to_pylist()
        out_p, out_n = [], []
        for p in sorted(parts):
            sub = t.filter(pc.equal(t["part"], p)).drop_columns(["part"])
            sub = sub.take(
                pc.sort_indices(
                    sub, sort_keys=[(col, "ascending"), (id_col, "ascending")]
                )
            )
            bdir = os.path.join(out_dir, f"bucket={p}")
            os.makedirs(bdir, exist_ok=True)
            tmp = os.path.join(bdir, ".data.parquet.tmp")
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(bdir, "data.parquet"))
            out_p.append(p)
            out_n.append(sub.num_rows)
        return pa.table(
            {"part": pa.array(out_p, pa.int64()), "n_rows": pa.array(out_n, pa.int64())}
        )

    stats = partitioned_reduce(
        ds.map_batches(assign_filter, batch_format="pyarrow"),
        "part",
        write_partition,
        n_meta=min(16, n_parts),
    ).to_pandas()

    rows = {int(r.part): int(r.n_rows) for r in stats.itertuples()}
    written = []
    for p in range(n_parts):
        if p in done:
            continue
        # empty partitions are legitimate (tied boundaries): stamp them too
        with open(_manifest_path(out_dir, p), "w") as f:
            json.dump(
                {
                    "fingerprint": fingerprint,
                    "rows": rows.get(p, 0),
                    "engine_version": __version__,
                },
                f,
            )
        written.append(p)
    return {
        "written_buckets": written,
        "skipped_buckets": sorted(done),
        "rows": rows,
    }
