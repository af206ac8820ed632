"""Test-set contamination check — flag documents containing any probe
n-gram (the decontamination primitive of LLM training pipelines; beyond
the reference per SURVEY §2 "training-data ops", like stages/chunk.py).

Pinned semantics (SQL-oracle-equivalent): a probe HITS a document iff
``' ' + probe + ' '`` is a substring of ``' ' + text + ' '`` — i.e. the
probe's token sequence appears at token boundaries in the corpus normal
form (single-space separated). ``n_hits`` counts DISTINCT probes hitting
the document.

Scale shape: the probe set is the SMALL side — broadcast once via
``ray.put`` and read inside every task; the corpus streams through one
stateless ``map_batches`` (one vectorized ``match_substring`` pass per
probe — fine for benchmark-sized probe sets, P ~ 1e2-1e4). For 1e6+
probes the scale path is the token-join variant: shingle both sides to
n-gram hashes and semi-join via ``state/exchange.partitioned_reduce``
(same topology as dedup.py's candidate pairing); documented, not built —
real decontamination probe sets fit the broadcast path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def leading_ngram_probes(
    docs: "ray.data.Dataset",
    n: int = 3,
    every: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[str]:
    """Deterministic probe set: the first-``n``-token string of every
    ``every``-th document (doc_id % every == 0), deduplicated. Small by
    construction; collected to the driver for broadcast."""

    def head_ngram(b: pa.Table) -> pa.Table:
        ids = b[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % every == 0))
        if b.num_rows == 0:
            return pa.table({"ngram": pa.array([], pa.string())})
        toks = pc.split_pattern(b[text_col], pattern=" ")
        sliced = pc.list_slice(toks, start=0, stop=n)
        return pa.table({"ngram": pc.binary_join(sliced, " ")})

    out = docs.map_batches(head_ngram, batch_format="pyarrow").take_all()
    return sorted({r["ngram"] for r in out})


def contamination_flags(
    docs: "ray.data.Dataset",
    probes: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(doc_id, n_hits, contaminated) — n_hits = number of DISTINCT probes
    whose token sequence occurs in the document (boundary-exact, see
    module docstring). Probe list is broadcast once (ray.put), not
    re-shipped per batch."""
    probes_ref = ray.put(sorted(set(probes)))

    def flags(b: pa.Table) -> pa.Table:
        plist = ray.get(probes_ref)
        padded = pc.binary_join_element_wise(
            pa.scalar(" "), b[text_col].cast(pa.string()), pa.scalar(" "), ""
        )
        n_hits = np.zeros(b.num_rows, np.int64)
        for p in plist:
            hit = pc.match_substring(padded, pattern=f" {p} ")
            n_hits += hit.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return docs.map_batches(flags, batch_format="pyarrow", batch_size=8192)


def contamination_flags_semijoin(
    docs: "ray.data.Dataset",
    probes: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_meta: int = 256,
    max_candidates: int = 50_000_000,
) -> "ray.data.Dataset":
    """The 1e6+-probe scale path for :func:`contamination_flags` — SAME
    pinned semantics (boundary-exact token-sequence hit, n_hits =
    distinct probes), different topology: instead of broadcasting probe
    STRINGS and scanning once per probe (O(P) corpus passes worth of
    match_substring kernels), the probe set is joined to the corpus by
    window hash:

    1. window pass: for every distinct probe token-length L, each doc
       emits DISTINCT (fnv64(L-token window), doc) int pairs — exact
       per-batch partials, a doc is one row (stages/index.py invariant);
    2. one hash-keyed ``partitioned_reduce`` joins window pairs against
       the (hash, probe) side -> candidate (doc, probe) pairs. fnv
       collisions only ADD candidates;
    3. verify pass: candidates are bounded by true contamination volume
       (+ ~0 collisions), so they broadcast back (``ray.put``) and one
       corpus pass does the exact ``' probe ' in ' text '`` check per
       candidate, emitting n_hits for EVERY doc (0 for non-candidates).
       A candidate set above ``max_candidates`` raises — past that the
       right variant ships candidate docs' texts through an id-keyed
       exchange instead (pipelines/prep.py:semi_join_ids shape).

    Exactness: a true hit always yields a window-hash match (candidate
    superset), and the verify pass re-checks the full-text boundary-exact
    rule, so output == the broadcast path == the SQL oracle.
    """
    from ..state.exchange import partitioned_reduce
    from ..text import fnv1a64_arrow
    from .spans import _windows_batch

    plist = sorted(set(probes))
    probe_arr = pa.array(plist, pa.string())
    lengths = sorted({len(p.split(" ")) for p in plist})
    probe_h = fnv1a64_arrow(probe_arr).view(np.int64)
    probe_side = pa.table(
        {
            "h": pa.array(probe_h, pa.int64()),
            "doc": pa.array(np.full(len(plist), -1, np.int64), pa.int64()),
            "probe": probe_arr,
        }
    )

    def window_pairs(b: pa.Table) -> pa.Table:
        hs, ds_ = [], []
        for w in lengths:
            if w == 1:
                toks = pc.split_pattern(pc.fill_null(b[text_col], ""), pattern=" ")
                flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
                off = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
                    flat.offset : flat.offset + len(flat) + 1
                ]
                reps = np.diff(off - off[0]).astype(np.int64)
                ids = b[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
                spans_w = flat.flatten()
                docs_w = np.repeat(ids, reps)
            else:
                spans_w, docs_w = _windows_batch(b, w, id_col, text_col)
            if len(spans_w) == 0:
                continue
            hs.append(fnv1a64_arrow(spans_w).view(np.int64))
            ds_.append(docs_w)
        if not hs:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.int64()),
                    "probe": pa.array([], pa.string()),
                }
            )
        t = pa.table(
            {"h": pa.array(np.concatenate(hs), pa.int64()), "doc": pa.array(np.concatenate(ds_), pa.int64())}
        )
        g = t.group_by(["h", "doc"]).aggregate([])  # distinct per batch == global
        return pa.table(
            {"h": g["h"], "doc": g["doc"], "probe": pa.nulls(g.num_rows, pa.string())}
        )

    pairs = docs.map_batches(window_pairs, batch_format="pyarrow", batch_size=1024)
    both = pairs.union(ray.data.from_arrow(probe_side))

    def join_partition(t: pa.Table) -> pa.Table:
        is_probe = pc.is_valid(t["probe"])
        pr = t.filter(is_probe)
        wn = t.filter(pc.invert(is_probe))
        if pr.num_rows == 0 or wn.num_rows == 0:
            return pa.table(
                {"doc": pa.array([], pa.int64()), "probe": pa.array([], pa.string())}
            )
        j = wn.select(["h", "doc"]).join(
            pr.select(["h", "probe"]), keys="h", join_type="inner"
        )
        return j.select(["doc", "probe"])

    cand = partitioned_reduce(both, "h", join_partition, n_meta=n_meta).to_pandas()
    if len(cand) > max_candidates:
        raise ValueError(
            f"{len(cand)} candidates exceed max_candidates={max_candidates}; "
            "switch to the id-keyed text semi-join variant"
        )
    if len(cand):
        order = np.lexsort((cand["probe"].to_numpy(), cand["doc"].to_numpy()))
        cand_doc = cand["doc"].to_numpy()[order]
        cand_probe = cand["probe"].to_numpy()[order]
    else:
        cand_doc = np.array([], np.int64)
        cand_probe = np.array([], object)
    cand_ref = ray.put((cand_doc, cand_probe))

    def verify(b: pa.Table) -> pa.Table:
        cdoc, cprobe = ray.get(cand_ref)
        ids = b[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        padded = pc.binary_join_element_wise(
            pa.scalar(" "), b[text_col].cast(pa.string()), pa.scalar(" "), ""
        )
        n_hits = np.zeros(len(ids), np.int64)
        lo = np.searchsorted(cdoc, ids, side="left")
        hi = np.searchsorted(cdoc, ids, side="right")
        for i in np.flatnonzero(hi > lo):  # only docs WITH candidates
            text = padded[i].as_py()
            for p in cand_probe[lo[i] : hi[i]]:
                if f" {p} " in text:
                    n_hits[i] += 1
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return docs.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def fuzzy_contamination_flags(
    train: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    threshold: float = 0.6,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Fuzzy decontamination: one row per CONTAMINATED train doc —
    (doc_id, n_matches, matched_eval_id, best_jaccard) where
    ``matched_eval_id`` is the eval doc with the highest exact k-shingle
    Jaccard (tie -> smallest eval id). Catches paraphrased / lightly-edited
    test-set leakage that :func:`contamination_flags`' exact substring
    probes miss. Pairs come from stages/dedup.py:cross_corpus_near_dup_pairs
    (cross-side-only LSH candidates + exact verify); the reduction here is
    one more hash exchange keyed on the train doc id (argmax per key via
    lexsort + run detection — no per-key Python)."""
    from ..state.exchange import partitioned_reduce
    from .dedup import cross_corpus_near_dup_pairs

    pairs = cross_corpus_near_dup_pairs(
        train, eval_ds, threshold=threshold, k=k, id_col=id_col, text_col=text_col
    )

    def best_per_doc(t: pa.Table) -> pa.Table:
        doc = t["doc_a"].to_numpy(zero_copy_only=False)
        ev = t["doc_b"].to_numpy(zero_copy_only=False)
        jac = t["jaccard"].to_numpy(zero_copy_only=False)
        n = len(doc)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_matches": pa.array([], pa.int64()),
                    "matched_eval_id": pa.array([], pa.int64()),
                    "best_jaccard": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((ev, -jac, doc))
        d = doc[order]
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = d[1:] != d[:-1]
        seg_start = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(seg_start, n))
        return pa.table(
            {
                "doc_id": pa.array(d[seg_start], pa.int64()),
                "n_matches": pa.array(seg_len, pa.int64()),
                "matched_eval_id": pa.array(ev[order][seg_start], pa.int64()),
                "best_jaccard": pa.array(jac[order][seg_start], pa.float64()),
            }
        )

    return partitioned_reduce(pairs, "doc_a", best_per_doc)
