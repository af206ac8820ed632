"""Broadcast side-assets: embedding vocab, class tree, entity index.

The reference loads a multi-GB Word2Vec model into the single driver process
(/root/reference/Duke/embedding.py:17) and re-loads it per REST request
(/root/reference/Duke/DukeRestListener.py:43-52). Here the assets are built
once on the driver, published to the object store with ``ray.put`` (one
zero-copy, node-local read per worker process), and captured by actor pools
in ``__init__`` — never re-shipped per batch (SURVEY.md T1/T2/T3/T5).

At 100 TB the corpus scales; these assets don't (vocab ≈ millions of words,
ontology ≈ 1e3 classes, entity index ≈ 1e6-1e8 rows → sharded broadcast
would be the next step, still never a corpus shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .functions.vector import fixed_list_to_matrix, unit_norm_rows
from .schemas import EMBED_DIM
from .stages.treeagg import TreeTopo, tree_score_matrix
from .synth import (
    PRED_WORDS,
    build_vocab_table,
    class_tree_dict,
    entities_table,
)


def load_word2vec_binary(path: str, limit: int | None = None) -> "pa.Table":
    """Parse the classic word2vec binary format into a ``(word, vector)``
    Arrow table (vector = fixed_size_list<float32>[D]).

    Format (public, from Mikolov's word2vec distribution, the same layout
    gensim's ``KeyedVectors.load_word2vec_format(binary=True)`` reads — the
    reference loads such a model at /root/reference/Duke/embedding.py:7-17):
    an ASCII header line ``"<vocab_size> <dim>\\n"``, then per entry the
    word bytes, one 0x20 separator, and ``dim`` little-endian float32s.
    Runs once on the driver; the resulting matrix is broadcast zero-copy
    via ``ray.put`` (see ``SideAssets.broadcast``).

    Compatibility with the reference's actual artifact: ``config.ini``
    names a gensim *pickle* (``en_1000_no_stem/en.model``). That format is
    gensim-version-specific, so this engine reads the stable public
    interchange formats instead; convert once with::

        from gensim.models import Word2Vec
        Word2Vec.load("en.model").wv.save_word2vec_format(
            "en.bin", binary=True)   # or binary=False for the text format

    and load the result here (``load_word2vec`` sniffs binary vs text).

    Bulk-parsed (VERDICT r3 #6): the per-word Python touches only the
    record FRAMING (one C-level ``mm.find`` per word — word lengths vary,
    so boundaries are inherently sequential, ~0.7 s/1e6 words); the payload
    moves in two vectorized gathers — an alignment-residue u32 fancy-index
    pulling every vector into the ``(n, dim)`` float32 matrix, and a
    ranges-trick gather building the word column as a single Arrow utf8
    array. A 1e6-word vocab loads in ~5-20 s on the shared VM (was minutes
    with the per-word parse; timed in tests/test_assets_scale.py)."""
    import pyarrow as pa

    from .functions.vector import matrix_to_fixed_list

    import mmap

    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        raw = u32 = None
        try:
            nl = mm.find(b"\n")
            n_words, dim = (int(x) for x in mm[:nl].split())
            if limit is not None:
                n_words = min(n_words, limit)
            vec_bytes = 4 * dim
            starts = np.empty(n_words, dtype=np.int64)
            ends = np.empty(n_words, dtype=np.int64)
            off = nl + 1
            find = mm.find
            for i in range(n_words):
                sp = find(b" ", off)
                starts[i] = off
                ends[i] = sp
                off = sp + 1 + vec_bytes
            raw = np.frombuffer(mm, dtype=np.uint8, count=off)
            # some writers emit a newline per row: strip it from the word
            starts = starts + (raw[starts] == 0x0A)
            lens = ends - starts

            # alignment-residue u32 gather. Byte-granularity fancy indexing
            # moves one index entry per BYTE (4*dim per word) and measured
            # 78 s at 1e6 x 100-d; a per-row memcpy loop, 47 s. Payload
            # starts sit at arbitrary byte offsets, but within the residue
            # class r = start % 4 every payload is u32-aligned in a view
            # shifted by r, so the gather moves 4-byte words with a
            # dim-wide index: 4.5 s for the same vocab. Chunked so the
            # int64 index stays bounded regardless of vocab size.
            mat = np.empty((n_words, dim), dtype="<f4")
            mat_u32 = mat.view(np.uint32)
            col = np.arange(dim, dtype=np.int64)
            vpos = ends + 1
            chunk = max(1, (64 << 20) // max(dim * 8, 1))
            for r in range(4):
                rows = np.flatnonzero((vpos & 3) == r)
                if rows.size == 0:
                    continue
                u32 = raw[r : r + ((len(raw) - r) & ~3)].view(np.uint32)
                base = (vpos[rows] - r) >> 2
                for i in range(0, rows.size, chunk):
                    idx = base[i : i + chunk][:, None] + col
                    mat_u32[rows[i : i + chunk]] = u32[idx]

            woffs = np.zeros(n_words + 1, dtype=np.int32)
            np.cumsum(lens, out=woffs[1:])
            flat = np.repeat(starts - woffs[:-1].astype(np.int64), lens) + np.arange(
                int(woffs[-1]), dtype=np.int64
            )
            data = raw[flat].tobytes()
            try:
                words_arr = pa.Array.from_buffers(
                    pa.binary(), n_words, [None, pa.py_buffer(woffs.tobytes()), pa.py_buffer(data)]
                ).cast(pa.string())  # binary->utf8 cast validates encoding
            except pa.ArrowInvalid:
                words_arr = pa.array(
                    [
                        bytes(raw[s:e]).decode("utf-8", errors="replace")
                        for s, e in zip(starts.tolist(), ends.tolist())
                    ],
                    pa.string(),
                )
        finally:
            raw = u32 = None  # release mmap-backed views before closing the map
            mm.close()
    return pa.table({"word": words_arr, "vector": matrix_to_fixed_list(np.ascontiguousarray(mat))})


def load_word2vec_text(path: str, limit: int | None = None) -> "pa.Table":
    """Parse the word2vec TEXT interchange format (``binary=False`` in both
    the original distribution and gensim's ``save_word2vec_format``): header
    ``"<vocab_size> <dim>"`` then one ``"word v1 v2 ... vD"`` line per
    entry. Same output schema as ``load_word2vec_binary``.

    Bulk-parsed (VERDICT r3 #6) through pandas' C CSV engine (one pass, no
    per-line Python); falls back to a per-line loop only if the fast parse
    rejects the file (e.g. ragged rows)."""
    import pyarrow as pa

    from .functions.vector import matrix_to_fixed_list

    with open(path, "rb") as f:
        n_words, dim = (int(x) for x in f.readline().split())
    if limit is not None:
        n_words = min(n_words, limit)
    try:
        import pandas as pd

        df = pd.read_csv(
            path,
            sep=" ",
            skiprows=1,
            header=None,
            nrows=n_words,
            usecols=range(dim + 1),
            quoting=3,  # QUOTE_NONE: words may contain quote chars
            na_filter=False,  # keep 'nan'/'null' words as strings
            dtype=dict.fromkeys(range(1, dim + 1), np.float32) | {0: str},
            encoding="utf-8",
            encoding_errors="replace",
        )
        words = pa.array(df[0], pa.string())
        mat = np.ascontiguousarray(df.iloc[:, 1:].to_numpy(dtype=np.float32))
        return pa.table({"word": words, "vector": matrix_to_fixed_list(mat)})
    except (ValueError, pd.errors.ParserError):
        pass
    with open(path, "rb") as f:
        f.readline()
        word_list: list[str] = []
        mat = np.empty((n_words, dim), dtype=np.float32)
        for i in range(n_words):
            parts = f.readline().rstrip(b"\n").split(b" ")
            word_list.append(parts[0].decode("utf-8", errors="replace"))
            mat[i] = np.array(parts[1 : dim + 1], dtype=np.float32)
    return pa.table({"word": pa.array(word_list, pa.string()), "vector": matrix_to_fixed_list(mat)})


_GENSIM_UNPICKLE_ALLOWED = {"numpy", "collections", "builtins", "copyreg"}


def _load_gensim_pickle(path: str):
    """Unpickle a gensim ``SaveLoad`` pickle WITHOUT gensim installed: every
    ``gensim.*`` class resolves to a generic attribute-bag stub (gensim
    model classes carry plain ``__dict__`` state, no custom ``__reduce__``),
    and any other non-numpy/stdlib global is REFUSED — loading a pickle
    must not execute arbitrary constructors."""
    import io
    import pickle

    class _Stub:
        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            else:
                self.__dict__["_state"] = state

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            root = module.split(".")[0]
            if root == "gensim":
                return type(name, (_Stub,), {"__module__": module})
            if root in _GENSIM_UNPICKLE_ALLOWED:
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"refusing to unpickle global {module}.{name} from a gensim model file"
            )

    with open(path, "rb") as f:
        return _Unpickler(io.BufferedReader(f)).load()


def _restore_gensim_sidecars(obj, fname: str, mmap_mode: str | None = "r") -> None:
    """Replay gensim's ``SaveLoad._load_specials`` walk: attributes large
    enough at save time were written as ``<fname>.<attrib>.npy`` sidecars
    (recursively for nested SaveLoad objects such as ``model.wv``), with the
    attribute names recorded in ``__numpys`` / ``__recursive_saveloads`` /
    ``__ignoreds`` on the pickled object. Vectors memory-map by default."""
    d = getattr(obj, "__dict__", None)
    if d is None:
        return
    for attrib in d.get("__recursive_saveloads", []):
        _restore_gensim_sidecars(d.get(attrib), f"{fname}.{attrib}", mmap_mode)
    for attrib in d.get("__numpys", []):
        d[attrib] = np.load(f"{fname}.{attrib}.npy", mmap_mode=mmap_mode)
    if d.get("__scipys"):
        raise ValueError(
            f"{fname}: sparse sidecar arrays ({d['__scipys']}) are not supported"
        )
    for attrib in d.get("__ignoreds", []):
        d[attrib] = None


def load_gensim_model(path: str, limit: int | None = None) -> "pa.Table":
    """Load a gensim-native ``Word2Vec.save()`` / ``KeyedVectors.save()``
    artifact (the reference's actual format — ``config.ini`` names
    ``en_1000_no_stem/en.model``, loaded at
    /root/reference/Duke/embedding.py:7-17) into the same ``(word, vector)``
    Arrow table as the word2vec interchange loaders — no gensim install and
    no offline conversion step needed (VERDICT r3 #4).

    Format (public, gensim ``utils.SaveLoad``): the main file is a pickle of
    the model object with large numpy attributes written as sidecar
    ``<path>.<attrib>.npy`` files (e.g. ``en.model.wv.vectors.npy``) and
    their names recorded on the object; the vocab order lives in
    ``wv.index_to_key`` (gensim 4) / ``wv.index2word`` (gensim 3). Handles
    both a saved ``Word2Vec`` (vectors under ``.wv``) and a directly saved
    ``KeyedVectors``; vectors in ``vectors`` (modern) or ``syn0`` (legacy)."""
    import pyarrow as pa

    from .functions.vector import matrix_to_fixed_list

    obj = _load_gensim_pickle(path)
    _restore_gensim_sidecars(obj, path)
    kv = getattr(obj, "wv", None) or obj
    words = None
    for attr in ("index_to_key", "index2word", "index2entity"):
        words = getattr(kv, attr, None)
        if words is not None:
            break
    vecs = None
    for attr in ("vectors", "syn0"):
        vecs = getattr(kv, attr, None)
        if vecs is not None:
            break
    if words is None or vecs is None:
        raise ValueError(
            f"{path}: no KeyedVectors payload found (looked for index_to_key/"
            "index2word + vectors/syn0 on the object and its .wv)"
        )
    vecs = np.asarray(vecs)
    if vecs.ndim != 2 or len(words) != vecs.shape[0]:
        raise ValueError(
            f"{path}: vocab/vector shape mismatch ({len(words)} words vs {vecs.shape})"
        )
    n = len(words) if limit is None else min(limit, len(words))
    words = [w.decode("utf-8", errors="replace") if isinstance(w, bytes) else str(w) for w in words[:n]]
    mat = np.ascontiguousarray(vecs[:n], dtype=np.float32)
    return pa.table({"word": pa.array(words, pa.string()), "vector": matrix_to_fixed_list(mat)})


def load_word2vec(path: str, limit: int | None = None) -> "pa.Table":
    """Load a word2vec artifact, sniffing the layout: a gensim-native
    ``.save()`` pickle (first byte ``\\x80``) routes to
    :func:`load_gensim_model`; otherwise text vs binary interchange — in
    the text format the second line decodes as ``word`` + ``dim`` ASCII
    floats; in the binary format the bytes after the first word's 0x20
    separator are raw little-endian float32s (virtually never valid ASCII
    numbers)."""
    with open(path, "rb") as f:
        first = f.read(1)
        if first == b"\x80":  # pickle protocol >= 2: gensim SaveLoad artifact
            return load_gensim_model(path, limit=limit)
        f.seek(0)
        header = f.readline().split()
        if len(header) != 2:
            raise ValueError(f"{path}: not a word2vec artifact (bad header)")
        dim = int(header[1])
        second = f.readline().rstrip(b"\n").split(b" ")
    is_text = False
    if len(second) >= dim + 1:
        try:
            [float(x) for x in second[1 : dim + 1]]
            is_text = True
        except ValueError:
            is_text = False
    return (load_word2vec_text if is_text else load_word2vec_binary)(path, limit=limit)


def _vector_dim(col) -> int:
    """Width of a fixed_size_list / uniform list vector column."""
    import pyarrow as pa

    t = col.type
    if pa.types.is_fixed_size_list(t):
        return t.list_size
    if len(col) == 0:
        return 0
    first = col[0].as_py()
    return len(first) if first is not None else 0


def normalize_class_tree(tree: dict[str, dict[str, list[str]]], in_vocab) -> dict[str, dict[str, list[str]]]:
    """Prune classes whose names contain out-of-vocab words, and drop edges to
    pruned classes (reference: /root/reference/Duke/class_tree.py:36-46)."""
    kept = {
        name: rels
        for name, rels in tree.items()
        if all(in_vocab(w) for w in name.split(" "))
    }
    names = set(kept)
    return {
        name: {
            "parents": [p for p in rels["parents"] if p in names],
            "children": [c for c in rels["children"] if c in names],
        }
        for name, rels in kept.items()
    }


@dataclass
class SideAssets:
    """Immutable per-job side data; cheap to pickle, broadcast via ray.put."""

    # embedding vocab
    vocab_words: list[str]
    vocab_matrix: np.ndarray                 # (V, d) float32
    vocab_index: dict[str, int] = field(repr=False)

    # ontology
    classes: list[str]                       # fixed order, post-prune
    class_matrix: np.ndarray                 # (C, d) float32, unit rows
    tree: dict[str, dict[str, list[str]]]
    topo: TreeTopo

    # entity index
    entity_surfaces: list[str]
    entity_matrix: np.ndarray                # (E, d) float32, unit rows
    entity_classes: list[str]
    entity_type_scores: np.ndarray           # (E,) tree-aggregated score of own class

    # lexicons
    pred_words: frozenset[str]
    surface_to_entity: dict[str, int]

    # lazily-built pyarrow value_set of vocab words (vectorized lookups)
    _vocab_pa: object = field(default=None, repr=False, compare=False)

    @property
    def dim(self) -> int:
        return self.vocab_matrix.shape[1]

    # --- embedding ---------------------------------------------------------

    def _vocab_value_set(self):
        import pyarrow as pa

        if self._vocab_pa is None:
            self._vocab_pa = pa.array(self.vocab_words, pa.string())
        return self._vocab_pa

    def embed_value_rows(self, token_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
        """Vocab-filter + embed a list of word-lists.

        Returns ``(keep_mask, vectors)`` where ``vectors`` has one unit-normed
        row per *kept* value (all-words-in-vocab drop semantics, reference
        /root/reference/Duke/embedding.py:20-34,41-44).

        Fully vectorized (VERDICT r2 #2): one flat token buffer, one
        ``pc.index_in`` C++ hash lookup, per-row min / sum via ``reduceat``
        aligned to NONEMPTY rows only (zero-length rows never shrink a
        neighbor's segment). Means accumulate in float64 then cast — a
        tolerance test (tests/test_summarize.py) pins drift vs the per-row
        float32 reference semantics to <1e-6.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(token_lists)
        lengths = np.fromiter((len(t) for t in token_lists), np.int64, count=n)
        keep = np.zeros(n, dtype=bool)
        if n == 0 or int(lengths.sum()) == 0:
            return keep, np.empty((0, self.dim), dtype=np.float32)

        flat: list[str] = []
        for t in token_lists:
            flat.extend(t)
        ids = (
            pc.index_in(pa.array(flat, pa.string()), value_set=self._vocab_value_set())
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        nonempty = lengths > 0
        row_min = np.minimum.reduceat(ids, offs[:-1][nonempty])
        keep[nonempty] = row_min >= 0
        if not keep.any():
            return keep, np.empty((0, self.dim), dtype=np.float32)

        kept_ids = ids[np.repeat(keep, lengths)]
        klens = lengths[keep]
        koffs = np.zeros(len(klens), dtype=np.int64)
        np.cumsum(klens[:-1], out=koffs[1:])
        sums = np.add.reduceat(self.vocab_matrix[kept_ids].astype(np.float64), koffs, axis=0)
        means = (sums / klens[:, None]).astype(np.float32)
        return keep, unit_norm_rows(means)

    # --- construction ------------------------------------------------------

    @classmethod
    def build(
        cls,
        tree=None,
        vocab_table: "pa.Table | str | None" = None,
        entities: "pa.Table | str | None" = None,
        tree_agg: str = "mean+max",
    ) -> "SideAssets":
        """Dependency-injected construction (the reference's ``embedding=`` /
        ``tree=`` path-or-object hooks, /root/reference/Duke/dataset_descriptor.py:29-31):
        each side asset may be a prebuilt object, a file path (class-tree
        JSON / parquet), or None for the deterministic synthetic default."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .synth import load_class_tree_json

        if isinstance(tree, str):
            tree = load_class_tree_json(tree)
        if isinstance(vocab_table, str):
            vocab_table = pq.read_table(vocab_table)
        if isinstance(entities, str):
            entities = pq.read_table(entities)
        return cls._build_impl(tree, vocab_table, entities, tree_agg)

    @classmethod
    def build_synthetic(cls, tree_agg: str = "mean+max") -> "SideAssets":
        return cls._build_impl(None, None, None, tree_agg)

    def broadcast(self) -> "object":
        """Publish to the object store: ONE ``ray.put``; every worker process
        on a node then maps the matrices zero-copy from shared memory (numpy
        arrays deserialize from plasma without copying). Pass the returned
        ref as ``assets=`` to the actor-pool stages."""
        import ray

        return ray.put(self)

    @classmethod
    def _build_impl(cls, tree_dict, vocab_tbl, ent_tbl, tree_agg: str) -> "SideAssets":
        vocab_tbl = vocab_tbl if vocab_tbl is not None else build_vocab_table()
        words = vocab_tbl["word"].to_pylist()
        dim = _vector_dim(vocab_tbl["vector"]) or EMBED_DIM
        vmat = fixed_list_to_matrix(vocab_tbl["vector"], dim)
        vindex = {w: i for i, w in enumerate(words)}

        raw_tree = tree_dict if tree_dict is not None else class_tree_dict()
        # vocab membership for pruning = presence in the actual vocab table
        tree = normalize_class_tree(raw_tree, lambda w: w in vindex)
        classes = sorted(tree)
        cmat = np.stack(
            [vmat[[vindex[w] for w in name.split(" ")]].mean(axis=0) for name in classes]
        )
        cmat = unit_norm_rows(cmat).astype(np.float32)
        topo = TreeTopo.from_tree(tree, classes)

        ent_tbl = ent_tbl if ent_tbl is not None else entities_table()
        ids = ent_tbl["entity_id"].to_pylist()
        if ids != list(range(len(ids))):
            raise ValueError("entity_id must equal row index (engine convention: "
                             "LinkActor emits matrix row indices as entity ids)")
        surfaces = ent_tbl["surface"].to_pylist()
        ent_dim = _vector_dim(ent_tbl["vector"]) or EMBED_DIM
        if ent_dim != dim:
            raise ValueError(
                f"entity vector dim {ent_dim} != vocab dim {dim}: inject a "
                "matching entities table when overriding the vocab"
            )
        emat = fixed_list_to_matrix(ent_tbl["vector"], ent_dim)
        eclasses = ent_tbl["class"].to_pylist()

        # tree-aggregated type score per entity: cosine(entity, classes) ->
        # tree aggregation -> take the entity's own class entry (north rule's
        # "vectorized inner products plus tree-aggregated type scores").
        sims = emat @ cmat.T                                  # (E, C)
        agg = tree_score_matrix(sims, topo, tree_agg)         # (E, C)
        cidx = {c: i for i, c in enumerate(classes)}
        type_scores = np.array(
            [agg[e, cidx[eclasses[e]]] if eclasses[e] in cidx else 0.0 for e in range(len(surfaces))],
            dtype=np.float32,
        )

        return cls(
            vocab_words=words,
            vocab_matrix=vmat,
            vocab_index=vindex,
            classes=classes,
            class_matrix=cmat,
            tree=tree,
            topo=topo,
            entity_surfaces=surfaces,
            entity_matrix=emat.astype(np.float32),
            entity_classes=eclasses,
            entity_type_scores=type_scores,
            pred_words=frozenset(PRED_WORDS),
            surface_to_entity=dict(
                zip(surfaces, ent_tbl["entity_id"].to_pylist())
            ),
        )


def resolve_assets(assets) -> "SideAssets":
    """None -> process-cached synthetic default; ObjectRef (from
    ``SideAssets.broadcast``) -> zero-copy ``ray.get``; object -> itself.
    Lets actor-pool stages accept a broadcast ref so a model-sized asset is
    stored in plasma ONCE and mapped read-only by every worker on a node."""
    if assets is None:
        return default_assets()
    import ray

    if isinstance(assets, ray.ObjectRef):
        return ray.get(assets)
    return assets


_CACHED: SideAssets | None = None


def default_assets() -> SideAssets:
    """Process-local cached synthetic assets (deterministic, seed-fixed)."""
    global _CACHED
    if _CACHED is None:
        _CACHED = SideAssets.build_synthetic()
    return _CACHED
