"""Aggregation-function algebra (reference: /root/reference/Duke/agg_functions.py,
/root/reference/Duke/utils.py:26-31).

All functions here are *vectorized across sources*: they operate on a list of
``(S,)`` float arrays (one entry per item being combined — own score +
per-child aggregated scores) and return one ``(S,)`` array. With ``S == 1``
they reduce to the reference's scalar semantics exactly (transliteration-
oracle-tested).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

AggFunc = Callable[[Sequence[np.ndarray]], np.ndarray]


def mean_of_rows(rows: Sequence[np.ndarray]) -> np.ndarray:
    return np.mean(np.stack(rows), axis=0)


def max_of_rows(rows: Sequence[np.ndarray]) -> np.ndarray:
    return np.max(np.stack(rows), axis=0)


# --- preps (Duke/agg_functions.py:4-14) ------------------------------------

def null_prep(rows: Sequence[np.ndarray]) -> list[np.ndarray]:
    return list(rows)


def exponential(rows: Sequence[np.ndarray]) -> list[np.ndarray]:
    return [np.exp(r) for r in rows]


def step(rows: Sequence[np.ndarray]) -> list[np.ndarray]:
    return [np.where(r > 0.5, r, 0.0) for r in rows]


def quadratic(rows: Sequence[np.ndarray]) -> list[np.ndarray]:
    return [r * r for r in rows]


def parent_children_funcs(parent: AggFunc, children: AggFunc, prep=null_prep) -> AggFunc:
    """``agg([own, child1, ...]) = parent([own, children([child1, ...])])``
    (Duke/agg_functions.py:16-24). With a single element, returns it
    unchanged (after prep), exactly like the reference."""

    def custom_agg(rows: Sequence[np.ndarray]) -> np.ndarray:
        rows = prep(rows)
        if len(rows) > 1:
            return parent([rows[0], children(rows[1:])])
        return np.asarray(rows[0])

    return custom_agg


AGG_REGISTRY: dict[str, AggFunc] = {
    "mean": mean_of_rows,
    "max": max_of_rows,
    "mean+max": parent_children_funcs(mean_of_rows, max_of_rows),
    "max+mean": parent_children_funcs(max_of_rows, mean_of_rows),
}

_PREPS = {"null": null_prep, "exp": exponential, "step": step, "quadratic": quadratic}


def build_combo_funcs(prep: str = "null") -> dict[str, AggFunc]:
    """The reference's combinator grid (Duke/agg_functions.py:26-28):
    {mean, max} plus both parent+children permutations, under a prep."""
    p = _PREPS[prep]
    out: dict[str, AggFunc] = {"mean": mean_of_rows, "max": max_of_rows}
    for a, fa in [("mean", mean_of_rows), ("max", max_of_rows)]:
        for b, fb in [("mean", mean_of_rows), ("max", max_of_rows)]:
            if a != b:
                name = f"{a}+{b}" if prep == "null" else f"{prep}:{a}+{b}"
                out[name] = parent_children_funcs(fa, fb, prep=p)
    return out


def resolve_agg(spec: str | AggFunc) -> AggFunc:
    if callable(spec):
        return spec
    return AGG_REGISTRY[spec]
