"""Deterministic synthetic side-assets and the pages table (FIXTURES.md).

Everything here is a pure function of its inputs plus fixed seeds — no
wall-clock, no RNG without an explicit seed, no external data. The pages
table is derived 1:1 from the driver-provided ``documents`` table so that
DuckDB oracles over ``documents`` stay valid for pipelines over pages.

Scale-design note: at 100 TB the pages table is the real Common-Crawl
corpus; these generators only stand in for it at test scale. The vocab /
class-tree / entity assets stay small (≤ millions of rows) at any corpus
scale — they are broadcast side-data, never shuffled with the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schemas import CLASS_TREE, EMBED_DIM, ENTITIES, PAGES, VOCAB_EMBEDDINGS
from .text import fnv1a64, normalize_text

# ---------------------------------------------------------------------------
# Fixed corpus vocabulary (31 words, verified identical across sf0.001/0.01/0.1
# of /root/testdata/*/documents.parquet).
CORPUS_WORDS = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

# Predicate lexicon for triple extraction (disjoint from entity surfaces).
PRED_WORDS = ["filter", "group", "hash", "join", "merge", "order", "scan", "sort"]

# Gazetteer surface forms = candidate entities (unigrams, normalized).
ENTITY_SURFACES = [
    "agg", "batch", "column", "customer", "data", "dup", "key", "line",
    "part", "query", "row", "spark", "stream", "table", "value", "vector",
    "window",
]

TRIPLE_WINDOW = 8  # max token distance pred <-> argument

# FIXTURES.md §5 tabular-path words (header/cell vocabulary for the
# summarization tests; 'notes' is OOV under the hash rule by construction).
FIXTURE_WORDS = [
    "player", "name", "team", "city", "position", "notes", "home", "runs", "total",
]


# --- embedding stand-in ----------------------------------------------------

def in_vocab_word(word: str) -> bool:
    """Deterministic vocab-membership rule (~90% of words are in-vocab) —
    the synthetic stand-in for gensim's ``word in model.wv.vocab``
    (/root/reference/Duke/embedding.py:41-44)."""
    return bool(word) and fnv1a64("v:" + word) % 10 != 0


def word_vector(word: str) -> np.ndarray:
    """Deterministic per-word embedding: Philox keyed by FNV-1a of the word.
    Stable across processes, machines and corpus subsets."""
    gen = np.random.Generator(np.random.Philox(key=fnv1a64("e:" + word)))
    return gen.standard_normal(EMBED_DIM).astype(np.float32)


def embed_words_mean(words: list[str]) -> np.ndarray | None:
    """Multi-word value -> mean of word vectors (reference
    ``embed_multi_words`` with mean_of_rows, /root/reference/Duke/embedding.py:33-34).
    Returns None if any word is out-of-vocab (all-words drop semantics)."""
    if not words or not all(in_vocab_word(w) for w in words):
        return None
    return np.mean([word_vector(w) for w in words], axis=0)


def build_vocab_table(extra_words: list[str] | None = None) -> pa.Table:
    """(word, vector) table over the corpus vocab + class/entity words."""
    words = set(CORPUS_WORDS) | set(FIXTURE_WORDS)
    for surface in ENTITY_SURFACES:
        words.update(surface.split(" "))
    for cls in class_tree_dict():
        words.update(cls.split(" "))
    if extra_words:
        words.update(extra_words)
    words = sorted(w for w in words if in_vocab_word(w))
    vecs = np.stack([word_vector(w) for w in words])
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), EMBED_DIM
            ),
        },
        schema=VOCAB_EMBEDDINGS,
    )


# --- class tree (DAG) ------------------------------------------------------

# name -> list of parent names; children derived (kept consistent by
# construction, unlike the reference JSON's dual bookkeeping,
# /root/reference/Duke/ontologies/class-tree_dbpedia_2016-10.json).
_PARENT_EDGES: dict[str, list[str]] = {
    # roots
    "data": [], "query": [], "stream": [], "table": [], "vector": [], "window": [],
    # mid layer (some multi-parent -> DAG)
    "big data": ["data"], "small data": ["data"],
    "fast query": ["query"], "slow query": ["query"],
    "data stream": ["data", "stream"],
    "big table": ["table"], "small table": ["table"],
    "hash table": ["table"], "sort key": ["table"],
    "batch window": ["window"], "stream window": ["stream", "window"],
    "row group": ["table"], "column group": ["table"],
    "key value": ["data"], "merge join": ["query"], "hash join": ["query"],
    "table scan": ["table", "query"], "query batch": ["query"],
    "vector column": ["vector"], "vector row": ["vector"],
    "agg query": ["query"], "customer data": ["data"], "line part": ["data"],
    # leaves
    "fast hash join": ["hash join"], "slow merge join": ["merge join"],
    "big data stream": ["data stream"], "small batch window": ["batch window"],
    "fast table scan": ["table scan"], "slow table scan": ["table scan"],
    "customer order": ["customer data"], "customer part": ["customer data"],
    "big vector column": ["vector column"], "small vector column": ["vector column"],
    "fast stream window": ["stream window"], "key value part": ["key value"],
    "agg group query": ["agg query"],
    "row group scan": ["row group", "table scan"],
    "sort key column": ["sort key", "column group"],
    "small line part": ["line part"], "big line part": ["line part"],
    "slow query batch": ["query batch"], "fast query batch": ["query batch"],
    "spark data stream": ["data stream"],
    # isolated classes (no parents, no children) — exercise pruning
    "dup": [], "the big": [], "slow part": [], "fast line": [], "a": [],
}


def class_tree_dict() -> dict[str, dict[str, list[str]]]:
    """Reference-shaped class tree: {name: {parents: [...], children: [...]}}
    (shape of /root/reference/Duke/class_tree.py:49-52 input)."""
    tree = {name: {"parents": list(parents), "children": []} for name, parents in _PARENT_EDGES.items()}
    for name, parents in _PARENT_EDGES.items():
        for p in parents:
            tree[p]["children"].append(name)
    for rels in tree.values():
        rels["children"].sort()
    return tree


def write_class_tree_json(path: str, tree: dict | None = None) -> None:
    """Persist a class tree in the reference's JSON shape
    ({name: {parents: [...], children: [...]}},
    /root/reference/Duke/class_tree.py:126-158's output format)."""
    import json

    with open(path, "w") as f:
        json.dump(tree if tree is not None else class_tree_dict(), f, indent=2)


def load_class_tree_json(path: str) -> dict[str, dict[str, list[str]]]:
    """Load a reference-shaped class-tree JSON (class_tree.py:49-52)."""
    import json

    with open(path) as f:
        tree = json.load(f)
    return {
        name: {"parents": list(rels.get("parents", [])), "children": list(rels.get("children", []))}
        for name, rels in tree.items()
    }


def class_tree_table() -> pa.Table:
    tree = class_tree_dict()
    names = sorted(tree)
    return pa.table(
        {
            "class": pa.array(names, pa.string()),
            "parents": pa.array([tree[n]["parents"] for n in names], pa.list_(pa.string())),
            "children": pa.array([tree[n]["children"] for n in names], pa.list_(pa.string())),
        },
        schema=CLASS_TREE,
    )


# --- entities --------------------------------------------------------------

_SURFACE_CLASS: dict[str, str] = {
    "agg": "agg query", "batch": "query batch", "column": "column group",
    "customer": "customer data", "data": "data", "dup": "big data",
    "key": "key value", "line": "line part", "part": "line part",
    "query": "query", "row": "row group", "spark": "spark data stream",
    "stream": "stream", "table": "table", "value": "key value",
    "vector": "vector", "window": "window",
}


def entities_table() -> pa.Table:
    """Entity-linking index: one entity per gazetteer surface, embedded with
    the same multi-word-mean rule as data values; unit-normalized."""
    rows = []
    for i, surface in enumerate(ENTITY_SURFACES):
        vec = embed_words_mean(normalize_text(surface))
        if vec is None:  # OOV surface: deterministic zero vector, never linked
            vec = np.zeros(EMBED_DIM, dtype=np.float32)
        else:
            vec = vec / np.linalg.norm(vec)
        rows.append((i, surface, vec.astype(np.float32), _SURFACE_CLASS[surface]))
    vecs = np.stack([r[2] for r in rows])
    return pa.table(
        {
            "entity_id": pa.array([r[0] for r in rows], pa.int64()),
            "surface": pa.array([r[1] for r in rows], pa.string()),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), EMBED_DIM
            ),
            "class": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=ENTITIES,
    )


# --- pages table -----------------------------------------------------------

_BASE_TS_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in µs


def doc_url(doc_id: int) -> str:
    return f"https://site{doc_id % 101}.example/p/{doc_id}"


def doc_id_from_url_arrow(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Inverse of ``doc_url`` — vectorized."""
    tail = pc.replace_substring_regex(url_col, pattern=r"^https://site\d+\.example/p/", replacement="")
    return pc.cast(tail, pa.int64())


def wrap_html(text: str, doc_id: int) -> bytes:
    """Deterministic HTML wrapper whose extraction round-trips to ``text``
    byte-identically (text has no entities / repeated whitespace)."""
    return (
        f'<html><head><meta name="doc" content="{doc_id}">'
        f"<script>var x = {doc_id};</script>"
        f"<style>p {{ margin: 0 }}</style></head>"
        f"<body><!-- synthetic {doc_id} --><p>{text}</p></body></html>"
    ).encode("utf-8")


def pages_batch_from_documents(batch: pa.Table, replica: int = 0, n_docs_per_replica: int = 0) -> pa.Table:
    """documents batch -> pages batch per FIXTURES.md §1 (vectorized).

    Even doc_id: html set, text null (forces the extract path).
    Odd  doc_id: text set, html null.
    ``replica`` > 0 offsets doc_id deterministically for bench-scale
    replication (doc_id' = doc_id + replica * n_docs_per_replica).
    """
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if replica:
        doc_id = doc_id + np.int64(replica) * np.int64(n_docs_per_replica)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    # fully vectorized (Arrow string kernels): byte-identical to the scalar
    # forms doc_url()/wrap_html(), golden-tested
    id_str = pc.cast(pa.array(doc_id, pa.int64()), pa.string())
    site_str = pc.cast(pa.array(doc_id % 101, pa.int64()), pa.string())
    urls = pc.binary_join_element_wise(
        "https://site", site_str, ".example/p/", id_str, ""
    )
    ts = pa.array(_BASE_TS_US + doc_id * 1_000_000, pa.timestamp("us"))
    even = pa.array(doc_id % 2 == 0)
    # odd rows discard their html below — blank their text first so the
    # join doesn't sweep/copy body bytes it immediately throws away
    text_for_html = pc.if_else(even, text, pa.scalar("", pa.string()))
    html_str = pc.binary_join_element_wise(
        '<html><head><meta name="doc" content="', id_str, '">',
        "<script>var x = ", id_str, ";</script>",
        "<style>p { margin: 0 }</style></head>",
        "<body><!-- synthetic ", id_str, " --><p>", text_for_html, "</p></body></html>",
        "",
    )
    null_str = pa.scalar(None, pa.string())
    html = pc.if_else(even, html_str, null_str).cast(pa.binary())
    text_out = pc.if_else(even, null_str, text)
    return pa.table(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": text_out,
            "lang": batch["lang"],
        },
        schema=PAGES,
    )


# --- varied corpus for dedup / similarity endurance benches -----------------
#
# ``pages_batch_from_documents`` replicas carry IDENTICAL text (only ids
# shift) — right for the KG bench (counts scale linearly) but degenerate for
# near-dup dedup at bench scale: 2000 exact copies per base doc would put
# every copy in one LSH bucket and pair emission would be O(copies^2).
# ``varied_documents_batch`` instead rewrites each (doc, replica)'s text
# with a deterministic seeded token substitution so pairwise similarity is
# CONTROLLED and the true near-dup pair set is known in closed form.

VARIED_MUT_STRIDE = 3  # every stride-th token position is rewritten, at a
# seeded phase — every k<=stride shingle window then contains a rewritten
# token, so trigram Jaccard between rows with different (doc, seed) is
# EXACTLY 0 (a Bernoulli mask instead left rare short-doc coincidences
# above near-dup thresholds, breaking the closed-form precision invariant)
VARIED_PAIR_STRIDE = 10  # replicas r with r % stride == 1 form a planted
# near-dup pair with replica r-1 (one pair per stride per base doc)
VARIED_PAIR_MUT_PCT = 2  # extra % mutation inside a planted pair (trigram
# Jaccard ~0.8-0.9: above the 0.6-0.8 near-dup thresholds)


def _mix64(*cols: np.ndarray) -> np.ndarray:
    """splitmix-style vectorized mix of equal-length uint64 columns."""
    h = np.zeros(len(cols[0]) if cols else 0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            h = (h ^ c.astype(np.uint64)) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
    return h


def varied_documents_batch(
    batch: pa.Table,
    replica: int,
    n_docs_per_replica: int,
    mut_stride: int = VARIED_MUT_STRIDE,
    pair_stride: int = VARIED_PAIR_STRIDE,
    pair_mut_pct: int = VARIED_PAIR_MUT_PCT,
) -> pa.Table:
    """documents batch -> (doc_id, text) rows with controlled similarity.

    Every ``mut_stride``-th token position (at a phase seeded by
    ``mix(doc_id, seed_replica)``) is rewritten to a token that is a pure
    function of ``mix(doc_id, seed_replica, pos)`` — so every shingle
    window of size <= mut_stride contains a rewritten token and any two
    rows with different (doc, seed) share ZERO shingles. ``seed_replica``
    is ``replica - 1`` for planted-pair replicas (``replica % pair_stride
    == 1``), which therefore share the partner's rewrite exactly and
    differ only in an extra ``pair_mut_pct`` rewrite (plus position 0,
    guaranteeing a planted pair is never an exact duplicate) keyed by
    (doc_id, replica). Everything is Arrow/numpy vectorized; the planted
    ground truth is: (d + (r-1)*N, d + r*N) for r % stride == 1.
    """
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    out_id = doc_id + np.int64(replica) * np.int64(n_docs_per_replica)
    is_pair = replica % pair_stride == 1 and replica > 0
    seed_replica = replica - 1 if is_pair else replica

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(pc.coalesce(text, ""), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.arange(len(flat), dtype=np.int64) - offsets[parent]

    base_did = doc_id[parent].view(np.uint64)
    seed_vec = np.full(len(flat), seed_replica, np.uint64)
    h1 = _mix64(base_did, seed_vec, pos.view(np.uint64))
    # per-row phase in [0, min(stride, row_len)): rows shorter than the
    # stride still get >= 1 rewrite, so no two (doc, seed) rows are ever
    # byte-identical (rows with empty text excepted — nothing to rewrite)
    row_len = (offsets[1:] - offsets[:-1])[parent]
    phase_mod = np.minimum(np.int64(mut_stride), np.maximum(row_len, 1)).view(np.uint64)
    phase = _mix64(base_did, seed_vec) % phase_mod
    mut = (pos.view(np.uint64) % np.uint64(mut_stride)) == phase
    repl_hash = h1
    if is_pair:
        h2 = _mix64(
            base_did,
            np.full(len(flat), replica + 0x5EED, np.uint64),
            pos.view(np.uint64),
        )
        extra = (h2 % np.uint64(10000)) < np.uint64(pair_mut_pct * 100)
        # position 0 always differs: a planted pair is a NEAR-dup, never an
        # exact dup (short docs could otherwise draw zero extra rewrites)
        extra |= pos == 0
        mut = mut | extra
        repl_hash = np.where(extra, h2, h1)

    # replacement tokens: "w" + decimal(hash % 1e9) — built once per batch
    # with Arrow kernels, applied with one if_else
    repl = pc.binary_join_element_wise(
        "w", pc.cast(pa.array(repl_hash % np.uint64(1_000_000_000), pa.uint64()), pa.string()), ""
    )
    new_flat = pc.if_else(pa.array(mut), repl, flat)
    new_lists = pa.ListArray.from_arrays(toks.offsets, new_flat)
    new_text = pc.binary_join(new_lists, " ")
    return pa.table(
        {"doc_id": pa.array(out_id, pa.int64()), "text": new_text}
    )


def planted_pair_ids(
    n_docs_per_replica: int, replicas: int, pair_stride: int = VARIED_PAIR_STRIDE
) -> int:
    """Number of planted near-dup pairs in a varied corpus (closed form)."""
    n_pair_replicas = len(range(1, replicas, pair_stride))
    return n_docs_per_replica * n_pair_replicas


def is_planted_pair_arrow(
    doc_a, doc_b, n_docs_per_replica: int, pair_stride: int = VARIED_PAIR_STRIDE
):
    """Vectorized membership test: is (doc_a, doc_b) a planted pair?

    Planted pairs are exactly (d + (r-1)*N, d + r*N), r % stride == 1 —
    i.e. |a-b| == N, same base doc, and the larger id's replica ≡ 1.
    Accepts either orientation; returns a pyarrow BooleanArray."""
    a = np.asarray(doc_a, dtype=np.int64)
    b = np.asarray(doc_b, dtype=np.int64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    n = np.int64(n_docs_per_replica)
    ok = (hi - lo == n) & ((hi // n) % np.int64(pair_stride) == 1) & (lo % n == hi % n)
    return pa.array(ok)
