"""Dataset sources over the driver-provided Parquet tables.

The pages table (BASELINE.json input_hint schema) is derived 1:1 from the
``documents`` table by a deterministic per-batch transform — so every DuckDB
oracle written against ``documents`` remains valid for pipelines over pages
(FIXTURES.md §1). ``replicas > 1`` tiles the corpus with offset doc_ids for
bench-scale runs; synthesis happens inside ``map_batches`` (distributed,
streaming), never on the driver.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray.data

from ..synth import pages_batch_from_documents


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _clean_schema(path: str, columns: list[str] | None):
    """File schema minus key-value metadata: pandas-written parquet carries a
    metadata dict that makes pa.Schema unhashable, which defeats Ray's
    schema-deduplication and spams 'Failed to hash the schemas' per task
    (VERDICT r1 #9-minor). Passing a stripped schema silences it at the
    source."""
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        import pyarrow as pa

        schema = pa.schema([schema.field(c) for c in columns])
    return schema


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Column-pruned Parquet read (prune at the read — SURVEY.md §1.2)."""
    from ..context import tune_context

    tune_context()
    path = table_path(sf_dir, name)
    return ray.data.read_parquet(path, columns=columns, schema=_clean_schema(path, columns))


def read_tabular(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Path-based tabular ingest: Parquet, CSV-with-header (the reference's
    primary input, /root/reference/Duke/dataset.py:37), or JSON-lines.
    Column pruning is applied at the read for Parquet and post-read for
    CSV/JSONL."""
    from ..context import tune_context

    tune_context()
    if path.endswith(".csv"):
        ds = ray.data.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if path.endswith((".json", ".jsonl")):
        ds = ray.data.read_json(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return ray.data.read_parquet(path, columns=columns)


def documents_row_count(sf_dir: str) -> int:
    return pq.read_metadata(table_path(sf_dir, "documents")).num_rows


def read_pages(sf_dir: str, replicas: int = 1) -> "ray.data.Dataset":
    """documents -> Common-Crawl-style pages Dataset (lazy, distributed).

    ``replicas > 1`` (the bench's scale knob) parallelizes over
    (doc-chunk x replica-group) SEED rows: the small documents table is
    broadcast once (``ray.put``), each seed task synthesizes the pages for
    its chunk x replica range with LARGE per-call batches. This keeps task
    count ~8 x cores (short tail) without shrinking the per-call batch
    (small calls measured 8x per-page synth overhead). At 100 TB the page
    input is thousands of files and read parallelism is natural — the
    seed path exists for the single-file synthetic corpus only."""
    import pyarrow as pa

    import ray

    n_docs = documents_row_count(sf_dir)
    path = table_path(sf_dir, "documents")
    small = os.path.getsize(path) <= 64 << 20

    ncpu = 8
    try:
        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        pass

    if replicas > 1 and small:
        tbl = pq.read_table(path, columns=["doc_id", "text", "lang"])
        tbl = tbl.replace_schema_metadata(None)  # pandas metadata breaks schema hashing
        docs_ref = ray.put(tbl)
        n_seeds_target = max(16, 8 * ncpu)
        n_doc_chunks = max(1, min(-(-tbl.num_rows // 512), n_seeds_target))
        step = -(-tbl.num_rows // n_doc_chunks)
        rep_group = max(1, (replicas * n_doc_chunks) // n_seeds_target)
        seeds = [
            (c, r0, min(r0 + rep_group, replicas))
            for c in range(0, tbl.num_rows, step)
            for r0 in range(0, replicas, rep_group)
        ]
        seed_tbl = pa.table(
            {
                "off": pa.array([s0 for s0, _, _ in seeds], pa.int64()),
                "rep_lo": pa.array([a for _, a, _ in seeds], pa.int64()),
                "rep_hi": pa.array([b for _, _, b in seeds], pa.int64()),
            }
        )
        seed_ds = ray.data.from_arrow(
            [seed_tbl.slice(i, 1) for i in range(len(seeds))]
        )

        def synth_seed(batch: "pa.Table") -> "pa.Table":
            docs = _docs_broadcast(docs_ref)
            parts = []
            for off, lo, hi in zip(
                batch["off"].to_pylist(), batch["rep_lo"].to_pylist(), batch["rep_hi"].to_pylist()
            ):
                sl = docs.slice(off, step)
                for r in range(lo, hi):
                    parts.append(
                        pages_batch_from_documents(sl, replica=r, n_docs_per_replica=n_docs)
                    )
            return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

        # ray_remote_args_fn (a no-op) BLOCKS operator fusion so downstream
        # extract stages bundle over the EXPANDED page blocks — a fused
        # chain bundles by INPUT seed rows and collapses task parallelism
        # (measured: a 2.5M-page run as 2 tasks, flat 16s at 8 and 32 CPUs).
        return seed_ds.map_batches(
            synth_seed, batch_format="pyarrow", batch_size=1, ray_remote_args_fn=dict
        )

    def synth(batch: "pa.Table") -> "pa.Table":
        parts = [
            pages_batch_from_documents(batch, replica=r, n_docs_per_replica=n_docs)
            for r in range(replicas)
        ]
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    if small:
        # single-row-group file -> ray reads it as ONE serial task; slice
        # driver-side into real blocks instead
        tbl = pq.read_table(path, columns=["doc_id", "text", "lang"])
        tbl = tbl.replace_schema_metadata(None)
        n_chunks = min(max(8, 4 * ncpu), max(1, tbl.num_rows))
        step = -(-tbl.num_rows // n_chunks)
        base = ray.data.from_arrow(
            [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)]
        )
    else:
        base = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return base.map_batches(
        synth, batch_format="pyarrow", batch_size=1024, ray_remote_args_fn=dict
    )


def read_documents_varied(sf_dir: str, replicas: int = 1) -> "ray.data.Dataset":
    """documents -> a varied (doc_id, text) corpus for dedup/similarity
    endurance benches (``synth.varied_documents_batch``: deterministic token
    churn with planted near-dup pairs; replica text is NOT identical, so
    near-dup pair counts stay corpus-linear instead of O(replicas^2)).

    Same seed-task layout as :func:`read_pages`: the small documents table
    is broadcast once and each seed task synthesizes its (doc-chunk x
    replica-range) slice — parallel from the first task, no 1-task read."""
    import pyarrow as pa

    import ray

    from ..synth import varied_documents_batch

    n_docs = documents_row_count(sf_dir)
    path = table_path(sf_dir, "documents")

    ncpu = 8
    try:
        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        pass

    tbl = pq.read_table(path, columns=["doc_id", "text"])
    tbl = tbl.replace_schema_metadata(None)
    if replicas <= 1:
        n_chunks = min(max(8, 4 * ncpu), max(1, tbl.num_rows))
        step = -(-tbl.num_rows // n_chunks)
        base = ray.data.from_arrow([tbl.slice(i, step) for i in range(0, tbl.num_rows, step)])
        return base.map_batches(
            lambda b: varied_documents_batch(b, replica=0, n_docs_per_replica=n_docs),
            batch_format="pyarrow",
            batch_size=1024,
            ray_remote_args_fn=dict,
        )

    docs_ref = ray.put(tbl)
    n_seeds_target = max(16, 8 * ncpu)
    n_doc_chunks = max(1, min(-(-tbl.num_rows // 512), n_seeds_target))
    step = -(-tbl.num_rows // n_doc_chunks)
    rep_group = max(1, (replicas * n_doc_chunks) // n_seeds_target)
    seeds = [
        (c, r0, min(r0 + rep_group, replicas))
        for c in range(0, tbl.num_rows, step)
        for r0 in range(0, replicas, rep_group)
    ]
    seed_tbl = pa.table(
        {
            "off": pa.array([s0 for s0, _, _ in seeds], pa.int64()),
            "rep_lo": pa.array([a for _, a, _ in seeds], pa.int64()),
            "rep_hi": pa.array([b for _, _, b in seeds], pa.int64()),
        }
    )
    seed_ds = ray.data.from_arrow([seed_tbl.slice(i, 1) for i in range(len(seeds))])

    def synth_seed(batch: "pa.Table") -> "pa.Table":
        docs = _docs_broadcast(docs_ref)
        parts = []
        for off, lo, hi in zip(
            batch["off"].to_pylist(), batch["rep_lo"].to_pylist(), batch["rep_hi"].to_pylist()
        ):
            sl = docs.slice(off, step)
            for r in range(lo, hi):
                parts.append(varied_documents_batch(sl, replica=r, n_docs_per_replica=n_docs))
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    # ray_remote_args_fn blocks fusion so downstream stages bundle over the
    # EXPANDED corpus blocks, not the seed rows (see read_pages)
    return seed_ds.map_batches(
        synth_seed, batch_format="pyarrow", batch_size=1, ray_remote_args_fn=dict
    )


_DOCS_BROADCAST_CACHE: dict = {}


def _docs_broadcast(ref):
    """Process-local cache of the broadcast documents table (one zero-copy
    plasma read per worker process, not one per task)."""
    key = ref.binary()
    val = _DOCS_BROADCAST_CACHE.get(key)
    if val is None:
        import ray

        if len(_DOCS_BROADCAST_CACHE) > 4:
            _DOCS_BROADCAST_CACHE.clear()
        val = _DOCS_BROADCAST_CACHE[key] = ray.get(ref)
    return val
