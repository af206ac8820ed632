"""Labeled / heuristic evaluation harness — the reference's accuracy tooling
rebuilt on Datasets (reference: /root/reference/Duke/evaluate.py,
heuristic_evaluate.py, labels.py).

- labels: ``*_positive_examples.json`` is a JSON list of correct ontology
  class names (reference get_labels, evaluate.py:39-45) -> +/-1 vector
  aligned to the class order (broadcast semi-join, SURVEY.md J3/S5).
- metrics: avg score over positive vs negative classes + counts
  (evaluate.py:17-36) — a grouped mean over the tiny (class, score, label)
  table (SURVEY.md A6).
- grid: every (row_agg, tree_agg, source_agg) combo over a dataset, ranked
  by score gap (evaluate.py:113-136, A7/K3); trial rows land in a
  timestamped CSV/Parquet sink (S6).
- label stubs / positive-example conversion (labels.py:10-38, S7/S8).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray.data

from ..assets import SideAssets, default_assets
from .summarize import SummarizeResult, summarize_dataset


def load_positive_examples(path: str) -> list[str]:
    with open(path) as f:
        return list(json.load(f))


def labels_for_classes(classes: list[str], positives: list[str]) -> np.ndarray:
    """+1 for classes in the positive list, -1 otherwise (evaluate.py:39-45)."""
    pos = set(positives)
    return np.array([1 if c in pos else -1 for c in classes], dtype=np.int64)


def evaluate_scores(scores: np.ndarray, labels: np.ndarray) -> dict:
    """avg positive / avg negative score + counts (evaluate.py:17-36)."""
    pos = labels == 1
    neg = labels == -1
    avg_pos = float(scores[pos].mean()) if pos.any() else float("nan")
    avg_neg = float(scores[neg].mean()) if neg.any() else float("nan")
    return {
        "avg_positive": avg_pos,
        "avg_negative": avg_neg,
        "score_gap": avg_pos - avg_neg,
        "n_positive": int(pos.sum()),
        "n_negative": int(neg.sum()),
    }


def agg_config_grid() -> list[dict]:
    """The reference's 8-config grid (evaluate.py:115-122): row/source agg in
    {mean}, tree agg in {mean, max, mean+max, max+mean} x prep variants
    reduced to the named registry combos."""
    grid = []
    for row_agg in ["mean", "max"]:
        for tree_agg in ["mean", "max", "mean+max", "max+mean"]:
            grid.append({"row_agg": row_agg, "tree_agg": tree_agg, "source_agg": "mean"})
    return grid


def run_labeled_trials(
    ds: "ray.data.Dataset",
    positives: list[str],
    assets: SideAssets | None = None,
    configs: list[dict] | None = None,
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Grid evaluation -> one row per config with metrics, gap-ranked."""
    assets = assets or default_assets()
    configs = configs or agg_config_grid()
    rows = []
    for cfg in configs:
        res: SummarizeResult = summarize_dataset(ds, columns=columns, assets=assets, **cfg)
        labels = labels_for_classes(res.classes, positives)
        m = evaluate_scores(res.final_scores, labels)
        rows.append({"config": f"{cfg['row_agg']}|{cfg['tree_agg']}|{cfg['source_agg']}", **cfg, **m})
    out = pd.DataFrame(rows).sort_values("score_gap", ascending=False).reset_index(drop=True)
    return out


def write_trial_csv(trials: pd.DataFrame, out_dir: str, run_id: str) -> str:
    """Deterministic run-id naming replaces the reference's wall-clock
    timestamp file names (evaluate.py:107-108) — reruns overwrite."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"trial_{run_id}.csv")
    trials.to_csv(path, index=False)
    return path


def run_heuristic_grid(
    ds: "ray.data.Dataset",
    assets: SideAssets | None = None,
    configs: list[dict] | None = None,
    columns: list[str] | None = None,
    top_n: int = 5,
) -> pd.DataFrame:
    """Unlabeled grid: top-n words per agg config (the reference's
    heuristic_evaluate.py:59-113 eyeball harness, as a result table)."""
    assets = assets or default_assets()
    configs = configs or agg_config_grid()
    rows = []
    for cfg in configs:
        res = summarize_dataset(ds, columns=columns, assets=assets, **cfg)
        words, scores = res.top_n_words(top_n)
        rows.append(
            {
                "config": f"{cfg['row_agg']}|{cfg['tree_agg']}|{cfg['source_agg']}",
                "top_words": ", ".join(words),
                "top_score": float(scores[0]),
            }
        )
    return pd.DataFrame(rows)


def gen_label_stub(classes: list[str]) -> pd.DataFrame:
    """Empty labeling sheet (labels.py:10-22): class column + empty label."""
    return pd.DataFrame({"class": list(classes), "label": [""] * len(classes)})


def labels_to_positive_list(stub: pd.DataFrame) -> list[str]:
    """Filled stub -> positive-example list (labels.py:25-38): rows whose
    label parses as 1."""
    out = []
    for _, row in stub.iterrows():
        try:
            if int(row["label"]) == 1:
                out.append(row["class"])
        except (TypeError, ValueError):
            continue
    return out


def write_positive_examples(positives: list[str], path: str) -> None:
    with open(path, "w") as f:
        json.dump(list(positives), f, indent=2)
