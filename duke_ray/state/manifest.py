"""Partitioned Parquet materialization with per-partition lineage manifests
and checkpointed resume (north rule: "per-partition lineage manifests and
checkpointed resumability"; SURVEY.md §4.2, M7).

Layout:

    out_dir/
      bucket=0/ part-*.parquet
      bucket=1/ ...
      _manifests/ bucket=0.json  {fingerprint, rows, engine_version}

Contract:
- ``bucket`` is a pure function of a stable key (FNV-1a of the key columns
  mod n_buckets) — reruns assign every row to the same bucket;
- a bucket's manifest is written only AFTER its data files are fully on
  disk; a crash leaves buckets either complete+stamped or unstamped;
- resume: stamped buckets with a matching input fingerprint are *filtered
  out at the map stage* (rows dropped early, far upstream of the write) and
  their stale unstamped siblings deleted, so a rerun only pays for missing
  buckets' shuffle/write (the input scan is still streamed — at 100 TB one
  would additionally partition the INPUT by the same bucketing to skip
  reads; documented trade).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .. import __version__
from ..text import fnv1a64_arrow

_MANIFEST_DIR = "_manifests"


def bucket_column(batch: pa.Table, key_cols: list[str], n_buckets: int) -> pa.Table:
    """Append ``bucket = fnv1a64(key_cols joined) % n_buckets`` (vectorized)."""
    key = batch[key_cols[0]].cast(pa.string())
    for c in key_cols[1:]:
        key = pa.compute.binary_join_element_wise(key, batch[c].cast(pa.string()), "\x1f")
    h = fnv1a64_arrow(key) % np.uint64(n_buckets)
    return batch.append_column("bucket", pa.array(h.astype(np.int32), pa.int32()))


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, _MANIFEST_DIR, f"bucket={bucket}.json")


def completed_buckets(out_dir: str, fingerprint: str) -> set[int]:
    mdir = os.path.join(out_dir, _MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for fn in os.listdir(mdir):
        if not fn.startswith("bucket=") or not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, fn)) as f:
                m = json.load(f)
            if m.get("fingerprint") == fingerprint:
                done.add(int(fn[len("bucket=") : -len(".json")]))
        except (json.JSONDecodeError, ValueError):
            continue
    return done


def write_partitioned_with_manifests(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_cols: list[str],
    n_buckets: int = 16,
    fingerprint: str = "",
) -> dict:
    """Materialize ``ds`` under ``out_dir`` partitioned by bucket; resume-safe.

    Returns {"written_buckets": [...], "skipped_buckets": [...], "rows": {bucket: n}}.
    """
    os.makedirs(os.path.join(out_dir, _MANIFEST_DIR), exist_ok=True)
    done = completed_buckets(out_dir, fingerprint)

    # drop stale (unstamped or fingerprint-mismatched) bucket dirs
    for entry in os.listdir(out_dir):
        if entry.startswith("bucket="):
            b = int(entry.split("=", 1)[1])
            if b not in done:
                shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)

    todo = [b for b in range(n_buckets) if b not in done]
    if todo:
        done_arr = pa.array(sorted(done), pa.int32())

        def add_bucket_and_filter(batch: pa.Table) -> pa.Table:
            batch = bucket_column(batch, key_cols, n_buckets)
            if len(done_arr):
                keep = pa.compute.invert(pa.compute.is_in(batch["bucket"], value_set=done_arr))
                batch = batch.filter(keep)
            return batch

        bucketed = ds.map_batches(add_bucket_and_filter, batch_format="pyarrow")
        bucketed.write_parquet(out_dir, partition_cols=["bucket"])

    # stamp manifests (after data is durable), counting rows from footers
    # (footer reads parallelized — serial driver-side scans add seconds when
    # blocks x buckets produce hundreds of part files)
    from concurrent.futures import ThreadPoolExecutor

    def bucket_rows(b: int) -> tuple[int, int]:
        bdir = os.path.join(out_dir, f"bucket={b}")
        n = 0
        if os.path.isdir(bdir):
            for fn in os.listdir(bdir):
                if fn.endswith(".parquet"):
                    n += pq.read_metadata(os.path.join(bdir, fn)).num_rows
        return b, n

    with ThreadPoolExecutor(max_workers=16) as pool:
        rows = dict(pool.map(bucket_rows, range(n_buckets)))
    written = []
    for b in range(n_buckets):
        if b in todo:
            # empty buckets are legitimate (no rows hashed there): stamp them
            # too so the rerun treats them as complete
            with open(_manifest_path(out_dir, b), "w") as f:
                json.dump(
                    {"fingerprint": fingerprint, "rows": rows[b], "engine_version": __version__},
                    f,
                )
            written.append(b)
    return {"written_buckets": written, "skipped_buckets": sorted(done), "rows": rows}
