"""Deterministic global shuffle: the training-export permutation.

LLM training prep ends with a global shuffle of the prepared corpus so
sequentially-written shards are i.i.d.-ish; `ds.random_shuffle()` gives a
non-reproducible order and an all-to-all exchange whose layout differs
run to run. The reference's only randomization is an UNSEEDED driver-side
subsample (/root/reference/Duke/dataset.py:83-86) — no shuffle export at
all. This module makes the shuffle a pure function of the row key:

  skey = md5(str(id))        (the repo-wide DuckDB-parity hash idiom,
                              stages/sampling.py)
  part = int(skey[:k], 16)   with n_parts = 16**k — closed-form range
                              boundaries over the uniform key space, so
                              unlike sortexport.range_bounds NO boundary
                              pass runs at all
  within-part order = (skey, id) ascending

Every step is deterministic under ANY parallelism and cluster size (the
north-rule reproducibility claim sortexport/kmeans evidence), resumable
(same manifest contract as sortexport), and the corpus crosses the wire
exactly once. Reading bucket=0..P-1 in order concatenates to the same
pseudo-random permutation on every run; a different `seed` string gives
an independent permutation.

`shuffle_manifest` is the SQL-checkable projection — per partition
(n_rows, min_key, max_key, sum_id) — value-hashed against a DuckDB
md5+strpos oracle in the driver gate.
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
from .sampling import _md5_hex

_KEY_HEX = 32  # full md5 digest: ties impossible across distinct ids


def _log16(n_parts: int) -> int:
    k, n = 0, 1
    while n < n_parts:
        k, n = k + 1, n * 16
    if n != n_parts or not 1 <= k <= 4:
        raise ValueError(f"n_parts must be 16**k, k in 1..4, got {n_parts}")
    return k


def _shuffle_key(ids: pa.Array, seed: str = "") -> np.ndarray:
    """md5 hex of str(id) (+ optional seed suffix) per row, '<U32'."""
    if seed:
        ids = pc.binary_join_element_wise(
            pc.cast(ids, pa.string()), pa.scalar(seed), ""
        )
    return _md5_hex(ids, _KEY_HEX)


def _hex_part(keys: np.ndarray, k: int) -> np.ndarray:
    """part = int(key[:k], 16), vectorized over a '<U32' key array."""
    cp = np.ascontiguousarray(keys).view(np.uint32).reshape(len(keys), -1)[:, :k]
    digit = np.where(cp >= 97, cp - 87, cp - 48).astype(np.int64)
    part = np.zeros(len(keys), np.int64)
    for j in range(k):
        part = part * 16 + digit[:, j]
    return part


def shuffle_manifest(
    ds: "ray.data.Dataset",
    n_parts: int = 16,
    id_col: str = "doc_id",
    seed: str = "",
    n_meta: int = 16,
) -> "ray.data.Dataset":
    """Partition manifest of the deterministic shuffle order ->
    (part, n_rows, min_key, max_key, sum_id). One streamed pass emitting
    per-batch per-part partials (<= n_parts rows each) combined by a
    part-keyed ``partitioned_reduce`` — the corpus never shuffles."""
    from ..state.exchange import partitioned_reduce

    k = _log16(n_parts)

    def partial(b: pa.Table) -> pa.Table:
        keys = _shuffle_key(b[id_col], seed)
        t = pa.table(
            {
                "part": pa.array(_hex_part(keys, k), pa.int64()),
                "skey": pa.array(keys),
                "id": b[id_col].cast(pa.int64()),
            }
        )
        g = t.group_by("part").aggregate(
            [("part", "count"), ("skey", "min"), ("skey", "max"), ("id", "sum")]
        )
        return g.rename_columns(["part", "n_rows", "min_key", "max_key", "sum_id"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("part").aggregate(
            [
                ("n_rows", "sum"),
                ("min_key", "min"),
                ("max_key", "max"),
                ("sum_id", "sum"),
            ]
        )
        return g.rename_columns(["part", "n_rows", "min_key", "max_key", "sum_id"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(partials, "part", combine, n_meta=min(n_meta, n_parts))


def shuffle_export_to_dir(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_parts: int = 16,
    id_col: str = "doc_id",
    seed: str = "",
    fingerprint: str = "",
) -> dict:
    """Materialize ``ds`` in deterministic-shuffle order under
    ``out_dir/bucket=<part>/`` — one parquet file per hash-range
    partition, rows sorted by (md5 key, id) inside it, tmp-name + atomic
    rename, manifests stamped after the run (sortexport contract: a
    killed run resumes paying only missing partitions).

    Reading bucket=0..P-1 in order yields the same pseudo-random
    permutation on every run at every cluster width. Size ``n_parts`` so
    one partition fits a task's heap — keys are uniform so partitions are
    balanced by construction (no skew handling needed, unlike value sort).

    Returns {"written_buckets", "skipped_buckets", "rows"}.
    """
    from ..state.exchange import partitioned_reduce

    k = _log16(n_parts)
    os.makedirs(os.path.join(out_dir, _MANIFEST_DIR), exist_ok=True)
    done = completed_buckets(out_dir, fingerprint)
    for entry in os.listdir(out_dir):
        if entry.startswith("bucket="):
            b = int(entry.split("=", 1)[1])
            if b not in done:
                shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)

    done_arr = pa.array(sorted(done), pa.int64())

    def assign_filter(b: pa.Table) -> pa.Table:
        keys = _shuffle_key(b[id_col], seed)
        b = b.append_column("_skey", pa.array(keys))
        b = b.append_column("part", pa.array(_hex_part(keys, k), pa.int64()))
        if len(done_arr):
            b = b.filter(pc.invert(pc.is_in(b["part"], value_set=done_arr)))
        return b

    def write_partition(t: pa.Table) -> pa.Table:
        parts = pc.unique(t["part"]).to_pylist()
        out_p, out_n = [], []
        for p in sorted(parts):
            sub = t.filter(pc.equal(t["part"], p)).drop_columns(["part"])
            sub = sub.take(
                pc.sort_indices(
                    sub, sort_keys=[("_skey", "ascending"), (id_col, "ascending")]
                )
            ).drop_columns(["_skey"])
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
        # uniform keys make empty partitions unlikely but legal: stamp them
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
