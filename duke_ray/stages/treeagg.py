"""Bottom-up DAG score aggregation over the ontology class tree.

Reference semantics: /root/reference/Duke/class_tree.py:63-102 (``tree_score``
+ ``apply_agg_func``) — leaves first; a node is processed only once *all* of
its children carry an aggregated score; a node's aggregate is
``agg_func([own_score] + [child aggregates])``.

This implementation precomputes the topological layering ONCE (``TreeTopo``)
and then applies it as vectorized NumPy passes over ``(n_sources, n_classes)``
score matrices — the per-node Python loop runs over the ~O(100..1000)-class
ontology, never over corpus rows, so it is driver/final-combine-scale work
regardless of corpus size (SURVEY.md A3/T3).

Documented deviation: the reference gates readiness on *truthiness* of child
scores (``agg_score.get(ch)``), so an exact 0.0 child score deadlocks it into
an ``assert`` failure (class_tree.py:70-71,88). We gate on "child processed"
instead, which is identical for all nonzero scores and total (never crashes).
The reference's redundant ``all(child_agg_scores)`` truthiness check inside
``apply_agg_func`` is likewise subsumed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.agg import AggFunc, resolve_agg


@dataclass
class TreeTopo:
    """Precomputed layering of a pruned class DAG, aligned to ``classes``."""

    classes: list[str]                      # fixed class order (score-vector alignment)
    layers: list[np.ndarray]                # node indices, leaves-first
    children: list[np.ndarray]              # per node: child indices into classes

    @classmethod
    def from_tree(cls, tree: dict[str, dict[str, list[str]]], classes: list[str] | None = None) -> "TreeTopo":
        classes = classes if classes is not None else sorted(tree)
        index = {c: i for i, c in enumerate(classes)}
        children = [np.array([index[ch] for ch in tree[c]["children"]], dtype=np.int64) for c in classes]
        parents = [np.array([index[p] for p in tree[c]["parents"]], dtype=np.int64) for c in classes]
        n = len(classes)
        remaining_children = np.array([len(ch) for ch in children])
        processed = np.zeros(n, dtype=bool)
        layers: list[np.ndarray] = []
        frontier = np.flatnonzero(remaining_children == 0)  # leaves (incl. isolated)
        while frontier.size:
            layers.append(frontier)
            processed[frontier] = True
            cand: set[int] = set()
            for node in frontier:
                for p in parents[node]:
                    remaining_children[p] -= 1
                    cand.add(int(p))
            frontier = np.array(
                sorted(c for c in cand if not processed[c] and remaining_children[c] == 0),
                dtype=np.int64,
            )
        if not processed.all():
            raise ValueError("class tree has a cycle; cannot layer")
        return cls(classes=classes, layers=layers, children=children)


def tree_score_matrix(scores: np.ndarray, topo: TreeTopo, agg_func: AggFunc | str) -> np.ndarray:
    """Aggregate ``(S, C)`` score matrix bottom-up over the DAG -> ``(S, C)``.

    Row ``s`` reproduces the reference's ``tree_score`` over source ``s``'s
    score map exactly (for nonzero scores; see module docstring).
    """
    agg = resolve_agg(agg_func)
    scores = np.atleast_2d(np.asarray(scores, dtype=np.float64))
    out = np.empty_like(scores)
    for layer in topo.layers:
        for node in layer:
            kids = topo.children[node]
            if kids.size:
                rows = [scores[:, node]] + [out[:, k] for k in kids]
                out[:, node] = agg(rows)
            else:
                out[:, node] = agg([scores[:, node]])
    return out
