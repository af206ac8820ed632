"""Report sink — the engine's replacement for the reference's plot sink.

The reference renders per-trial matplotlib figures (sorted class scores
with positive classes highlighted, /root/reference/Duke/evaluate.py:152-193)
to an interactive window. Headless cluster jobs need an artifact instead:
these sinks render the same information — per-config score distributions
with the positive/negative split, the gap-ranked leaderboard, and bench
records — into a single self-contained markdown file a human (or CI) can
read next to the trial CSV (SURVEY.md S11).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def _md_table(df: pd.DataFrame, float_fmt: str = "{:.4f}") -> str:
    """Minimal GitHub-markdown table renderer (no tabulate dependency)."""

    def cell(v) -> str:
        if isinstance(v, float):
            return float_fmt.format(v)
        return str(v)

    cols = list(df.columns)
    lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join(cell(row[c]) for c in cols) + " |")
    return "\n".join(lines)


def _score_profile(scores: np.ndarray, labels: np.ndarray) -> dict:
    """The plot's information content as numbers: how the positive classes
    sit inside the overall score distribution (evaluate.py draws exactly
    this — sorted scores, positives marked)."""
    order = np.argsort(-scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.int64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels == 1
    qs = np.quantile(scores, [0.0, 0.25, 0.5, 0.75, 1.0]) if len(scores) else [np.nan] * 5
    return {
        "min": float(qs[0]),
        "p25": float(qs[1]),
        "median": float(qs[2]),
        "p75": float(qs[3]),
        "max": float(qs[4]),
        "best_pos_rank": int(ranks[pos].min()) if pos.any() else -1,
        "mean_pos_rank": float(ranks[pos].mean()) if pos.any() else float("nan"),
    }


def write_eval_report(
    trials: pd.DataFrame,
    out_path: str,
    score_rows: list[tuple[str, np.ndarray, np.ndarray]] | None = None,
    title: str = "duke_ray evaluation report",
) -> str:
    """Render a labeled-trial grid (``run_labeled_trials`` output) to one
    markdown page: gap-ranked leaderboard + optional per-config score
    profiles (``score_rows`` = [(config, final_scores, labels), ...])."""
    parts = [f"# {title}", ""]
    parts.append(f"Configs evaluated: **{len(trials)}**; best score gap: "
                 f"**{float(trials['score_gap'].max()):.4f}** "
                 f"(`{trials.iloc[0]['config']}`).")
    parts += ["", "## Leaderboard (by score gap)", ""]
    cols = [c for c in ["config", "avg_positive", "avg_negative", "score_gap",
                        "n_positive", "n_negative"] if c in trials.columns]
    parts.append(_md_table(trials[cols]))
    if score_rows:
        parts += ["", "## Score distributions (positives vs the field)", ""]
        prof = pd.DataFrame(
            [{"config": cfg, **_score_profile(np.asarray(s), np.asarray(l))}
             for cfg, s, l in score_rows]
        )
        parts.append(_md_table(prof))
        parts += ["", "`best_pos_rank` = rank of the best-scoring positive "
                      "class (1 = top); the reference's plot showed this as "
                      "highlighted points on the sorted score curve.", ""]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(parts) + "\n")
    return out_path


def write_bench_report(
    bench_records: list[dict | str],
    out_path: str,
    title: str = "duke_ray bench report",
) -> str:
    """Render bench.py JSON records (dicts or paths to BENCH_r*.json-style
    files) into one markdown page: headline + per-query breakdown across
    rounds/runs."""
    recs: list[dict] = []
    for r in bench_records:
        if isinstance(r, str):
            with open(r) as f:
                loaded = json.load(f)
            recs.append(loaded.get("parsed", loaded))
        else:
            recs.append(dict(r))
    parts = [f"# {title}", ""]
    head = pd.DataFrame(
        [
            {
                "run": i + 1,
                "metric": r.get("metric", "?"),
                "sec": float(r.get("value", float("nan"))),
                "num_cpus": r.get("num_cpus", "?"),
                "docs_per_sec": r.get("docs_per_sec", ""),
                "triples_per_sec": r.get("triples_per_sec", ""),
            }
            for i, r in enumerate(recs)
        ]
    )
    parts += ["## Headline", "", _md_table(head, float_fmt="{:.3f}"), ""]
    q_rows = []
    for i, r in enumerate(recs):
        for qname, sec in (r.get("queries") or {}).items():
            q_rows.append({"run": i + 1, "query": qname, "sec": float(sec)})
    if q_rows:
        qdf = pd.DataFrame(q_rows).pivot_table(index="query", columns="run", values="sec")
        qdf.columns = [f"run{c} (s)" for c in qdf.columns]
        qdf = qdf.reset_index()
        parts += ["## Per-query", "", _md_table(qdf, float_fmt="{:.3f}"), ""]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(parts) + "\n")
    return out_path
