"""Single-process reference-semantics oracle.

Naive, loop-based implementations of the engine's deterministic specs
(tokenize, mention, triple, canonicalize, Duke summarization). These define
"reference triples" for the P/R >= 0.95 gate in BASELINE.json and back the
unit tests; they are NEVER used in pipelines. The ``tree_score_reference``
function is a faithful transliteration of the reference algorithm
(/root/reference/Duke/class_tree.py:63-102) including its truthiness gating,
used to property-test the vectorized ``tree_score_matrix``.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .assets import SideAssets
from .synth import TRIPLE_WINDOW
from .text import extract_html_text, normalize_text


def naive_tokens(text: str) -> list[str]:
    return normalize_text(text)


def naive_mentions(text: str, surfaces: set[str]) -> list[tuple[int, str]]:
    return [(i, t) for i, t in enumerate(naive_tokens(text)) if t in surfaces]


def naive_triples(text: str, surfaces: set[str], preds: set[str]) -> list[tuple[str, str, str, int]]:
    toks = naive_tokens(text)
    out = []
    for i, t in enumerate(toks):
        if t not in preds:
            continue
        subj = obj = None
        for j in range(i - 1, max(-1, i - TRIPLE_WINDOW - 1), -1):
            if toks[j] in surfaces:
                subj = toks[j]
                break
        for j in range(i + 1, min(len(toks), i + TRIPLE_WINDOW + 1)):
            if toks[j] in surfaces:
                obj = toks[j]
                break
        if subj is not None and obj is not None:
            out.append((subj, t, obj, i))
    return out


def naive_page_text(html: bytes | None, text: str | None) -> str | None:
    return text if text is not None else extract_html_text(html)


def naive_corpus_triples(pages: list[dict], assets: SideAssets) -> list[tuple[str, str, str, str, int]]:
    """[(url, subj, pred, obj, pred_pos)] over a list of page dicts."""
    surfaces = set(assets.surface_to_entity)
    preds = set(assets.pred_words)
    out = []
    for page in pages:
        text = naive_page_text(page.get("html"), page.get("text"))
        if text is None:
            continue
        for subj, pred, obj, pos in naive_triples(text, surfaces, preds):
            out.append((page["url"], subj, pred, obj, pos))
    return out


def naive_canonicalize(triples: list[tuple[str, str, str, str, int]]) -> dict[tuple[str, str, str], tuple[int, int]]:
    """{(s,p,o): (n_occurrences, n_pages)}."""
    occ: dict[tuple[str, str, str], int] = defaultdict(int)
    pages: dict[tuple[str, str, str], set] = defaultdict(set)
    for url, s, p, o, _pos in triples:
        occ[(s, p, o)] += 1
        pages[(s, p, o)].add(url)
    return {k: (occ[k], len(pages[k])) for k in occ}


# --- reference tree_score transliteration ----------------------------------

def tree_score_reference(score_map: dict[str, float], tree: dict[str, dict[str, list[str]]], agg_func) -> dict[str, float]:
    """Faithful transliteration of /root/reference/Duke/class_tree.py:63-102
    (scalar agg_func over Python lists, truthiness readiness gating)."""
    agg_score: dict[str, float] = {}
    processed: set[str] = set()

    def all_children_aggd(node):
        return all(agg_score.get(ch) for ch in tree[node]["children"])

    def apply_one(node):
        score_list = [score_map[node]]
        children = tree[node].get("children")
        if children:
            child_scores = [agg_score.get(ch) for ch in children]
            if all(child_scores):
                score_list = score_list + child_scores
        return agg_func(score_list)

    def process_layer(layer):
        assert layer
        for node in layer:
            agg_score[node] = apply_one(node)
            processed.add(node)

    all_nodes = set(tree)
    layer = [n for n in tree if not tree[n].get("children")]
    process_layer(layer)
    while all_nodes.difference(processed):
        nxt = set().union(*[set(tree[n]["parents"]) for n in layer])
        nxt = nxt.difference(processed)
        nxt = [n for n in nxt if all_children_aggd(n)]
        process_layer(nxt)
        layer = nxt
    return agg_score


def naive_summarize(sources: dict[str, list[str]], assets: SideAssets, row_agg="mean", tree_agg="mean+max", source_agg="mean") -> np.ndarray:
    """Reference DatasetDescriptor semantics end-to-end on small data
    (/root/reference/Duke/dataset_descriptor.py:48-114): per source embed
    values (all-words-in-vocab drop), cosine vs class matrix, row-agg,
    tree-agg, source-agg -> (n_classes,) final scores."""
    from .functions.agg import resolve_agg
    from .stages.treeagg import tree_score_matrix

    per_source = []
    for _src, values in sources.items():
        keep, vecs = assets.embed_value_rows([normalize_text(v) for v in values])
        if vecs.shape[0] == 0:
            continue
        sims = vecs @ assets.class_matrix.T                       # (n_kept, C)
        row_fn = resolve_agg(row_agg)
        row_scores = row_fn([sims[i] for i in range(sims.shape[0])])
        tree_scores = tree_score_matrix(row_scores[None, :], assets.topo, tree_agg)[0]
        per_source.append(tree_scores)
    src_fn = resolve_agg(source_agg)
    return src_fn(per_source)
