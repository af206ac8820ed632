"""Stateful embedding + class-similarity scoring (actor pool).

The engine analogue of the reference's Word2Vec load + vocab filter + value
embedding + cosine-vs-classes matmul
(/root/reference/Duke/embedding.py:17,20-34; dataset.py:74-99;
dataset_descriptor.py:48-62). State — the ``(V, d)`` vocab matrix, the word
index, and the unit-normed class matrix — is pinned ONCE per actor in
``__init__`` (SURVEY.md T1/T2); each ``__call__`` is numpy-vectorized over
the batch.

The stage emits *partial aggregates* (one row per source per batch: sum
vector / max vector over per-value class-sim rows + kept/total counts), so
the downstream group-by runs over ``n_batches x n_sources`` tiny rows, never
over corpus values (partial+final distributed form of SURVEY.md A1/A2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..context import default_pool
from ..assets import SideAssets
from ..text import normalize_text


class EmbedScoreActor:
    """(source, value) rows -> per-(source, batch) partial class-score rows."""

    def __init__(self, assets: SideAssets | None = None):
        from ..assets import resolve_assets

        self.assets = resolve_assets(assets)
        # tokenization cache: the value-vocabulary of a column is typically
        # tiny relative to row count (Zipf), so memoize value -> embedding row
        self._memo: dict[str, np.ndarray | None] = {}

    def _embed_values(self, values: list[str]) -> list[np.ndarray | None]:
        """Embed ALL unmemoized unique values of the batch in one
        embed_value_rows call (one vstack + one unit-norm), not one call per
        value."""
        memo = self._memo
        assets = self.assets
        missing = list(dict.fromkeys(v for v in values if v not in memo))
        fresh: dict[str, np.ndarray | None] = {}
        if missing:
            keep, vecs = assets.embed_value_rows([normalize_text(v) for v in missing])
            vi = 0
            for v, kp in zip(missing, keep):
                if kp:
                    fresh[v] = vecs[vi]
                    vi += 1
                else:
                    fresh[v] = None
            for v, vec in fresh.items():
                if len(memo) >= 1_000_000:  # bound actor memory
                    break
                memo[v] = vec
        return [memo[v] if v in memo else fresh[v] for v in values]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized grouping (VERDICT r2 #5): dictionary-encode source and
        # value, embed + score each UNIQUE value once, then gather per-row
        # sim rows and segment-reduce per source — no per-row Python zip.
        import pyarrow.compute as pc

        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src = src.dictionary_encode()
        val = pc.fill_null(batch["value"], "")
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        val = val.dictionary_encode()

        src_codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        val_codes = val.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_src = src.dictionary.to_pylist()
        uniq_vals = val.dictionary.to_pylist()
        S = len(uniq_src)
        C = self.assets.class_matrix.shape[0]

        embedded_u = self._embed_values(uniq_vals)      # per unique value
        kept_u = [i for i, v in enumerate(embedded_u) if v is not None]
        u_rank = np.full(len(uniq_vals), -1, dtype=np.int64)
        u_rank[kept_u] = np.arange(len(kept_u))
        if kept_u:
            sims_u = np.stack([embedded_u[i] for i in kept_u]) @ self.assets.class_matrix.T
        else:
            sims_u = np.empty((0, C), dtype=np.float32)

        n_total = np.bincount(src_codes, minlength=S)
        row_rank = u_rank[val_codes]
        valid = row_rank >= 0
        vs, vr = src_codes[valid], row_rank[valid]
        order = np.argsort(vs, kind="stable")           # original order kept per source
        vs, vr = vs[order], vr[order]
        n_kept = np.bincount(vs, minlength=S)

        rows_sum = np.zeros((S, C), dtype=np.float64)
        rows_max = np.full((S, C), -np.inf, dtype=np.float64)
        nz = n_kept > 0
        if vs.size:
            sims_rows = sims_u[vr]                      # (n_valid, C) gather
            starts = np.zeros(S, dtype=np.int64)
            np.cumsum(n_kept[:-1], out=starts[1:])
            rows_sum[nz] = np.add.reduceat(sims_rows, starts[nz], axis=0)
            rows_max[nz] = np.maximum.reduceat(sims_rows, starts[nz], axis=0)

        return pa.table(
            {
                "source": pa.array(uniq_src, pa.string()),
                "sum_scores": pa.array(rows_sum.tolist(), pa.list_(pa.float64())),
                "max_scores": pa.array(rows_max.tolist(), pa.list_(pa.float64())),
                "n_kept": pa.array(n_kept.astype(np.int64), pa.int64()),
                "n_total": pa.array(n_total.astype(np.int64), pa.int64()),
            }
        )


def _combine_partials(group: pd.DataFrame) -> pd.DataFrame:
    sums = np.sum(np.stack(group["sum_scores"].to_numpy()), axis=0)
    maxs = np.max(np.stack(group["max_scores"].to_numpy()), axis=0)
    return pd.DataFrame(
        {
            "source": [group["source"].iloc[0]],
            "sum_scores": [sums.tolist()],
            "max_scores": [maxs.tolist()],
            "n_kept": [int(group["n_kept"].sum())],
            "n_total": [int(group["n_total"].sum())],
        }
    )


def score_sources(
    long_ds: "ray.data.Dataset",
    assets: SideAssets | None = None,
    batch_size: int = 8192,
    concurrency=None,
) -> "ray.data.Dataset":
    """(source, value) -> one combined partial row per source.

    Output: (source, sum_scores:list<f64>[C], max_scores, n_kept, n_total).
    Row aggregation (mean/max) is applied by the caller from these partials —
    both reference row_agg_funcs (/root/reference/Duke/utils.py:26-31) are
    recoverable exactly: mean = sum/n, max = max.
    """
    partials = long_ds.map_batches(
        EmbedScoreActor,
        fn_constructor_kwargs={"assets": assets},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else default_pool(),
    )
    return partials.groupby("source").map_groups(_combine_partials, batch_format="pandas")
