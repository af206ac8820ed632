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

    Replication happens INSIDE one map stage (each input batch emits its
    ``replicas`` doc-id-offset copies) — a union of R branches would build
    2R operators whose scheduling overhead dominates at small scale."""
    import pyarrow as pa

    n_docs = documents_row_count(sf_dir)

    def synth(batch: "pa.Table") -> "pa.Table":
        parts = [
            pages_batch_from_documents(batch, replica=r, n_docs_per_replica=n_docs)
            for r in range(replicas)
        ]
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    base = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    batch_size = max(64, 1024 // max(1, replicas))  # html payload bounds blocks
    return base.map_batches(synth, batch_format="pyarrow", batch_size=batch_size)
