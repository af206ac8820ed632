"""Vectorized tree aggregation vs the faithful reference transliteration
(/root/reference/Duke/class_tree.py:63-102), on the synthetic DAG and on
random DAGs (hypothesis-style seeds, plain loops)."""

import numpy as np
import pytest

from duke_ray.assets import default_assets, normalize_class_tree
from duke_ray.functions.agg import AGG_REGISTRY
from duke_ray.oracle import tree_score_reference
from duke_ray.stages.treeagg import TreeTopo, tree_score_matrix
from duke_ray.synth import class_tree_dict, in_vocab_word


def scalar_agg(name):
    """Scalar (reference-style) counterpart of the vectorized agg funcs."""
    if name == "mean":
        return np.mean
    if name == "max":
        return max
    if name == "mean+max":
        def f(v):
            return np.mean([v[0], max(v[1:])]) if len(v) > 1 else v[0]
        return f
    if name == "max+mean":
        def f(v):
            return max([v[0], np.mean(v[1:])]) if len(v) > 1 else v[0]
        return f
    raise KeyError(name)


@pytest.mark.parametrize("agg", ["mean", "max", "mean+max", "max+mean"])
def test_matches_reference_on_synthetic_tree(agg):
    tree = normalize_class_tree(class_tree_dict(), in_vocab_word)
    topo = TreeTopo.from_tree(tree)
    rng = np.random.Generator(np.random.Philox(key=7))
    scores = rng.uniform(0.05, 1.0, size=(3, len(topo.classes)))  # nonzero: truthiness-safe
    got = tree_score_matrix(scores, topo, AGG_REGISTRY[agg])
    for s in range(scores.shape[0]):
        score_map = dict(zip(topo.classes, scores[s]))
        ref = tree_score_reference(score_map, tree, scalar_agg(agg))
        want = np.array([ref[c] for c in topo.classes])
        np.testing.assert_allclose(got[s], want, rtol=1e-12)


@pytest.mark.parametrize("seed", range(5))
def test_matches_reference_on_random_dags(seed):
    rng = np.random.Generator(np.random.Philox(key=seed))
    n = 40
    names = [f"c{i}" for i in range(n)]
    tree = {name: {"parents": [], "children": []} for name in names}
    # random DAG: edges only from lower to higher index (parent = lower idx)
    for child in range(1, n):
        n_par = int(rng.integers(0, 3))
        for p in rng.choice(child, size=min(n_par, child), replace=False):
            parent = names[int(p)]
            if names[child] not in tree[parent]["children"]:
                tree[parent]["children"].append(names[child])
                tree[names[child]]["parents"].append(parent)
    topo = TreeTopo.from_tree(tree)
    scores = rng.uniform(0.01, 1.0, size=(1, n))
    for agg in ["mean", "mean+max"]:
        got = tree_score_matrix(scores, topo, AGG_REGISTRY[agg])
        order = {c: i for i, c in enumerate(topo.classes)}
        score_map = {c: scores[0, order[c]] for c in names}
        ref = tree_score_reference(score_map, tree, scalar_agg(agg))
        want = np.array([ref[c] for c in topo.classes])
        np.testing.assert_allclose(got[0], want, rtol=1e-12)


def test_synthetic_tree_shape():
    tree = class_tree_dict()
    # isolated classes present pre-prune
    assert tree["dup"] == {"parents": [], "children": []}
    # DAG: multi-parent nodes exist
    assert len(tree["data stream"]["parents"]) == 2
    # derived children are consistent
    for name, rels in tree.items():
        for p in rels["parents"]:
            assert name in tree[p]["children"]


def test_cycle_detection():
    tree = {
        "a": {"parents": ["b"], "children": ["b"]},
        "b": {"parents": ["a"], "children": ["a"]},
    }
    with pytest.raises(ValueError):
        TreeTopo.from_tree(tree)


def test_assets_build():
    a = default_assets()
    assert a.class_matrix.shape == (len(a.classes), 64)
    np.testing.assert_allclose(np.linalg.norm(a.class_matrix, axis=1), 1.0, rtol=1e-5)
    assert a.entity_matrix.shape[0] == len(a.entity_surfaces)
    assert len(a.entity_type_scores) == len(a.entity_surfaces)
    # pruning dropped OOV-named classes but kept a connected DAG
    assert set(a.classes) <= set(class_tree_dict())
