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
        sources = batch["source"].to_pylist()
        values = batch["value"].to_pylist()
        embedded = self._embed_values([v if v is not None else "" for v in values])

        # group by source within the batch (map-side combine)
        per_src: dict[str, list[np.ndarray]] = {}
        totals: dict[str, int] = {}
        for src, vec in zip(sources, embedded):
            totals[src] = totals.get(src, 0) + 1
            if vec is not None:
                per_src.setdefault(src, []).append(vec)

        C = self.assets.class_matrix.shape[0]
        rows_src, rows_sum, rows_max, rows_n, rows_total = [], [], [], [], []
        for src in totals:
            vecs = per_src.get(src)
            if vecs:
                sims = np.stack(vecs) @ self.assets.class_matrix.T  # (n, C)
                rows_sum.append(sims.sum(axis=0))
                rows_max.append(sims.max(axis=0))
                rows_n.append(sims.shape[0])
            else:
                rows_sum.append(np.zeros(C))
                rows_max.append(np.full(C, -np.inf))
                rows_n.append(0)
            rows_src.append(src)
            rows_total.append(totals[src])
        return pa.table(
            {
                "source": pa.array(rows_src, pa.string()),
                "sum_scores": pa.array([r.tolist() for r in rows_sum], pa.list_(pa.float64())),
                "max_scores": pa.array([r.tolist() for r in rows_max], pa.list_(pa.float64())),
                "n_kept": pa.array(rows_n, pa.int64()),
                "n_total": pa.array(rows_total, pa.int64()),
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
