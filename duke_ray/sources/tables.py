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


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Column-pruned Parquet read (prune at the read — SURVEY.md §1.2)."""
    from ..context import tune_context

    tune_context()
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns)


def read_tabular(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Path-based tabular ingest: Parquet or CSV-with-header (the reference's
    primary input, /root/reference/Duke/dataset.py:37). Column pruning is
    applied at the read for Parquet and post-read for CSV."""
    from ..context import tune_context

    tune_context()
    if path.endswith(".csv"):
        ds = ray.data.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return ray.data.read_parquet(path, columns=columns)


def documents_row_count(sf_dir: str) -> int:
    return pq.read_metadata(table_path(sf_dir, "documents")).num_rows


def read_pages(sf_dir: str, replicas: int = 1) -> "ray.data.Dataset":
    """documents -> Common-Crawl-style pages Dataset (lazy, distributed)."""
    n_docs = documents_row_count(sf_dir)
    base = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    parts = []
    for r in range(replicas):
        parts.append(
            base.map_batches(
                pages_batch_from_documents,
                fn_kwargs={"replica": r, "n_docs_per_replica": n_docs},
                batch_format="pyarrow",
                batch_size=1024,
            )
        )
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return ds
