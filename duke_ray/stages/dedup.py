"""Deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard.

First-class training-data-pipeline operators (none exist in the reference;
its only set-op is a driver-side column diff, /root/reference/Duke/utils.py:40-41).
All variants follow the same scale topology:

    map_batches (vectorized signature computation, per-doc rows)
      -> explode to (bucket_key, doc_id) candidate rows
      -> groupby(bucket_key) (the only shuffle — signatures, never text)
      -> per-bucket pairing / verification
      -> pair table (doc_a < doc_b) [-> cluster ids via min-label propagation]

Text never shuffles; only fixed-width signatures do. Bucket-key cardinality
is tuned so per-bucket candidate sets stay small (LSH guarantee), which is
what makes the pairing step safe at 1e12 docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from ..text import fnv1a64_arrow
from .tokens import FlatTokens

# --- shared: shingle hashing ----------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text_col: pa.Array | pa.ChunkedArray, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-row word-k-shingle hash sets.

    Returns (flat uint64 shingle hashes, int64 row offsets); rows with fewer
    than k tokens get a single hash of their whole token sequence.
    Vectorized: token hashes once, then a rolling combine over k columns.
    """
    flat = FlatTokens.from_text(text_col)
    th = fnv1a64_arrow(flat.tokens)
    n_rows = flat.n_rows
    lengths = flat.row_lengths()
    # rolling combine: h_i = combine(th[i], th[i+1], ..., th[i+k-1])
    total = len(th)
    out_hashes: list[np.ndarray] = []
    out_counts = np.zeros(n_rows, dtype=np.int64)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    with np.errstate(over="ignore"):
        combined = th.copy()
        for j in range(1, k):
            shifted = np.empty_like(th)
            shifted[: total - j] = th[j:]
            shifted[total - j :] = 0
            combined = combined * np.uint64(1_000_003) + shifted
        # valid shingle start positions: pos + k <= row length
        valid = flat.pos + k <= lengths[flat.row]
        short_rows = np.flatnonzero(lengths < k)
    parts: list[np.ndarray] = []
    rows_of_parts: list[np.ndarray] = []
    parts.append(combined[valid])
    rows_of_parts.append(flat.row[valid])
    if short_rows.size:
        # whole-row hash for short rows (including empty -> hash of nothing)
        short_hashes = np.empty(short_rows.size, dtype=np.uint64)
        for i, r in enumerate(short_rows):
            seg = th[starts[r] : starts[r + 1]]
            h = np.uint64(0xCBF29CE484222325)
            with np.errstate(over="ignore"):
                for v in seg:
                    h = h * np.uint64(1_000_003) + v
            short_hashes[i] = h
        parts.append(short_hashes)
        rows_of_parts.append(short_rows.astype(np.int64))
    all_h = np.concatenate(parts)
    all_r = np.concatenate(rows_of_parts)
    order = np.argsort(all_r, kind="stable")
    all_h, all_r = all_h[order], all_r[order]
    np.add.at(out_counts, all_r, 1)
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(out_counts, out=offs[1:])
    return all_h, offs


def _minhash_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    gen = np.random.Generator(np.random.Philox(key=seed))
    a = gen.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = gen.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(text_col, n_perm: int = 64, k: int = 3, seed: int = 7) -> np.ndarray:
    """(n_rows, n_perm) uint64 MinHash signatures.

    Fully vectorized: permuted hash values are computed for ALL shingles of
    the batch at once (chunked over permutations to bound memory) and
    reduced per document with ``np.minimum.reduceat`` — no Python loop over
    rows or shingles."""
    hashes, offs = _shingle_hashes(text_col, k=k)
    a, b = _minhash_params(n_perm, seed)
    n_rows = len(offs) - 1
    sig = np.full((n_rows, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_rows == 0 or len(hashes) == 0:
        return sig
    lengths = offs[1:] - offs[:-1]
    nonempty = lengths > 0
    starts = offs[:-1]
    perm_chunk = max(1, min(n_perm, (32 << 20) // (8 * max(1, len(hashes)))))
    with np.errstate(over="ignore"):
        for c0 in range(0, n_perm, perm_chunk):
            c1 = min(n_perm, c0 + perm_chunk)
            hv = (hashes[:, None] * a[None, c0:c1] + b[None, c0:c1]) % _MERSENNE
            red = np.minimum.reduceat(hv, starts.clip(max=len(hashes) - 1), axis=0)
            sig[nonempty, c0:c1] = red[nonempty]
    return sig


class MinHashStage:
    """documents batch -> (doc_id, band, band_hash) LSH bucket rows."""

    def __init__(self, n_perm: int = 64, bands: int = 16, k: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert n_perm % bands == 0
        self.n_perm, self.bands, self.k, self.seed = n_perm, bands, k, seed
        self.rows_per_band = n_perm // bands
        self.id_col, self.text_col = id_col, text_col
        self.a, self.b = _minhash_params(n_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch[self.text_col], self.n_perm, self.k, self.seed)
        n = sig.shape[0]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # band hashes: fnv-fold each band's slice
        band_rows = []
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                seg = sig[:, bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
                h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
                for j in range(self.rows_per_band):
                    h = (h ^ seg[:, j]) * np.uint64(0x100000001B3)
                band_rows.append(h)
        band_hash = np.concatenate(band_rows)
        band_id = np.repeat(np.arange(self.bands, dtype=np.int32), 0) if n == 0 else np.concatenate(
            [np.full(n, bi, dtype=np.int32) for bi in range(self.bands)]
        )
        doc = np.tile(ids, self.bands) if n else ids
        # carry the full signature per (band, doc) for verification downstream
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(sig, (self.bands, 1)).ravel().astype(np.uint64), pa.uint64()),
            self.n_perm,
        ) if n else pa.FixedSizeListArray.from_arrays(pa.array([], pa.uint64()), self.n_perm)
        bh_i64 = band_hash.astype(np.int64).view(np.uint64).astype(np.int64)
        return pa.table(
            {
                "meta": pa.array(_meta_key(band_id, bh_i64), pa.int32()),
                "band": pa.array(band_id, pa.int32()),
                "band_hash": pa.array(bh_i64, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "sig": sig_list,
            }
        )


N_META_GROUPS = 256  # coarse co-location groups: per-call overhead amortizes
# over many LSH buckets, pairing inside is vectorized run detection


def _meta_key(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        mixed = (band_hash.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            band.astype(np.uint64) * np.uint64(0x100000001B3)
        )
    return (mixed % np.uint64(N_META_GROUPS)).astype(np.int32)


def _runs(sort_keys: list[np.ndarray], boundary_keys: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Lexsort rows by composite key -> (order, run boundary starts); a run
    boundary is a change in the first ``boundary_keys`` keys (default all)."""
    order = np.lexsort(tuple(reversed(sort_keys)))
    changed = np.zeros(len(order), dtype=bool)
    changed[0] = True
    for k in sort_keys[: boundary_keys if boundary_keys is not None else len(sort_keys)]:
        ks = k[order]
        changed[1:] |= ks[1:] != ks[:-1]
    return order, np.flatnonzero(changed)


def _bucket_pairs_meta(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """One meta-group = many LSH buckets: detect same-(band,band_hash) runs
    vectorized; all-pairs signature agreement only inside multi-doc runs."""
    n = len(group)
    empty = pd.DataFrame(
        {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64),
         "est_jaccard": np.array([], np.float64)}
    )
    if n < 2:
        return empty
    band = group["band"].to_numpy()
    bh = group["band_hash"].to_numpy()
    docs = group["doc_id"].to_numpy()
    order, starts = _runs([band, bh, docs], boundary_keys=2)
    sigs = np.stack(group["sig"].to_numpy())
    out_a, out_b, out_e = [], [], []
    bounds = np.append(starts, n)
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        idx = order[s:e]
        d = docs[idx]
        uniq, first = np.unique(d, return_index=True)
        if len(uniq) < 2:
            continue
        sg = sigs[idx[first]]
        ia, ib = np.triu_indices(len(uniq), k=1)
        est = (sg[ia] == sg[ib]).mean(axis=1)
        keep = est >= threshold
        out_a.append(uniq[ia[keep]])
        out_b.append(uniq[ib[keep]])
        out_e.append(est[keep])
    if not out_a:
        return empty
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
         "est_jaccard": np.concatenate(out_e)}
    )


def minhash_near_dup_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard >= threshold).

    Pairs surfacing in multiple buckets are deduplicated by a final grouped
    max (same estimate each time, max is a no-op but makes the reduce total).
    """
    buckets = docs.map_batches(
        MinHashStage(n_perm=n_perm, bands=bands, k=k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    pairs = buckets.groupby("meta").map_groups(
        lambda g: _bucket_pairs_meta(g, threshold), batch_format="pandas"
    )
    return _dedupe_pairs(pairs, "est_jaccard", "max")


def _dedupe_pairs(pairs: "ray.data.Dataset", val_col: str, how: str) -> "ray.data.Dataset":
    """Pair tables can be high-cardinality (one key per near-dup pair) ->
    partitioned_reduce with an Arrow per-partition group_by."""
    from ..state.exchange import partitioned_reduce

    def reduce_partition(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_a", "doc_b"]).aggregate([(val_col, how)])
        return pa.table(
            {
                "doc_a": g["doc_a"],
                "doc_b": g["doc_b"],
                val_col: g[f"{val_col}_{how}"],
            }
        )

    return partitioned_reduce(pairs, ["doc_a", "doc_b"], reduce_partition)


# --- exact dedup -----------------------------------------------------------

def exact_dedup(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Exact dedup by content hash: one survivor (min id) per distinct text.

    Only (hash, id) pairs shuffle — never the text. Output: (doc_id,) of
    survivors. Deterministic: the minimum id wins (the reference has no
    dedup; north-rule D4 semantics)."""

    def hash_ids(batch: pa.Table) -> pa.Table:
        h = fnv1a64_arrow(batch[text_col]).astype(np.int64)
        t = pa.table({"h": pa.array(h, pa.int64()), "doc_id": batch[id_col].cast(pa.int64())})
        # map-side combine: min id per hash within the batch
        g = t.group_by("h").aggregate([("doc_id", "min")])
        return pa.table({"h": g["h"], "doc_id": g["doc_id_min"]})

    from ..state.exchange import partitioned_reduce

    def min_per_hash(t: pa.Table) -> pa.Table:
        g = t.group_by("h").aggregate([("doc_id", "min")])
        return pa.table({"doc_id": g["doc_id_min"].cast(pa.int64())})

    partials = docs.map_batches(hash_ids, batch_format="pyarrow", batch_size=16384)
    # high-cardinality key (one per distinct text) -> partitioned_reduce
    return partitioned_reduce(partials, "h", min_per_hash)


# --- SimHash ---------------------------------------------------------------

def simhash_signatures(text_col, seed: int = 11) -> np.ndarray:
    """64-bit SimHash over token hashes (unweighted).

    Vectorized: per-row bit sums via ``np.add.reduceat`` over the row-major
    flattened token hashes (16-bit chunks bound peak memory); sig bit b is
    set iff more than half the row's token hashes have bit b set."""
    flat = FlatTokens.from_text(text_col)
    th = fnv1a64_arrow(flat.tokens)
    n_rows = flat.n_rows
    lengths = flat.row_lengths()
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(th) == 0 or n_rows == 0:
        return out
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    nonempty = lengths > 0
    red_starts = starts.clip(max=len(th) - 1)
    half = lengths[:, None]  # threshold: 2*sum > n
    with np.errstate(over="ignore"):
        for c0 in range(0, 64, 16):
            shifts = np.arange(c0, c0 + 16, dtype=np.uint64)
            bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
            sums = np.add.reduceat(bits, red_starts, axis=0)
            pos = (2 * sums > half) & nonempty[:, None]
            for j in range(16):
                out |= pos[:, j].astype(np.uint64) << np.uint64(c0 + j)
    return out


class SimHashStage:
    """documents batch -> (doc_id, chunk, chunk_val, sig) banding rows.

    Hamming-distance-<=3 candidates collide on at least one of 4 16-bit
    chunks (pigeonhole); verification computes the true distance per pair."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = simhash_signatures(batch[self.text_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        chunks, vals, docs, sigs = [], [], [], []
        for c in range(4):
            chunks.append(np.full(n, c, dtype=np.int32))
            vals.append(((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64))
            docs.append(ids)
            sigs.append(sig)
        chunk_arr = np.concatenate(chunks)
        val_arr = np.concatenate(vals)
        return pa.table(
            {
                "meta": pa.array(_meta_key(chunk_arr, val_arr), pa.int32()),
                "chunk": pa.array(chunk_arr, pa.int32()),
                "chunk_val": pa.array(val_arr, pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "sig": pa.array(np.concatenate(sigs).astype(np.int64), pa.int64()),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    ham = np.zeros(len(x), dtype=np.int64)
    x = x.copy()
    for _ in range(64):  # popcount via shift loop over uint64 (vectorized)
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
        if not x.any():
            break
    return ham


def _simhash_meta_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    """One meta-group = many (chunk, chunk_val) buckets; vectorized runs."""
    empty = pd.DataFrame(
        {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64),
         "hamming": np.array([], np.int64)}
    )
    n = len(group)
    if n < 2:
        return empty
    chunk = group["chunk"].to_numpy()
    val = group["chunk_val"].to_numpy()
    docs = group["doc_id"].to_numpy()
    sigs = group["sig"].to_numpy().astype(np.int64).view(np.uint64)
    order, starts = _runs([chunk, val, docs], boundary_keys=2)
    bounds = np.append(starts, n)
    out_a, out_b, out_h = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        idx = order[s:e]
        uniq, first = np.unique(docs[idx], return_index=True)
        if len(uniq) < 2:
            continue
        sg = sigs[idx[first]]
        ia, ib = np.triu_indices(len(uniq), k=1)
        ham = _popcount64(sg[ia] ^ sg[ib])
        keep = ham <= max_hamming
        out_a.append(uniq[ia[keep]])
        out_b.append(uniq[ib[keep]])
        out_h.append(ham[keep])
    if not out_a:
        return empty
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
         "hamming": np.concatenate(out_h)}
    )


def simhash_near_dup_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    buckets = docs.map_batches(
        SimHashStage(id_col=id_col, text_col=text_col), batch_format="pyarrow", batch_size=4096
    )
    pairs = buckets.groupby("meta").map_groups(
        lambda g: _simhash_meta_pairs(g, max_hamming), batch_format="pandas"
    )
    return _dedupe_pairs(pairs, "hamming", "min")


# --- exact n-gram Jaccard (LSH-candidates, exact verify) -------------------

def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.7,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Exact k-shingle Jaccard >= threshold; candidates from MinHash-LSH at a
    permissive estimate, verified exactly from carried shingle-hash sets."""

    class ShingleStage:
        def __init__(self):
            self.mh = MinHashStage(n_perm=64, bands=32, k=k, id_col=id_col, text_col=text_col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            hashes, offs = _shingle_hashes(batch[text_col], k=k)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            lsh = self.mh(batch)
            sets = [
                np.unique(hashes[offs[r] : offs[r + 1]]).astype(np.uint64)
                for r in range(len(ids))
            ]
            by_doc = {int(d): s for d, s in zip(ids, sets)}
            shingles = pa.array(
                [by_doc[int(d)].astype(np.int64).tolist() for d in lsh["doc_id"].to_numpy(zero_copy_only=False)],
                pa.list_(pa.int64()),
            )
            return pa.table(
                {
                    "meta": lsh["meta"],
                    "band": lsh["band"],
                    "band_hash": lsh["band_hash"],
                    "doc_id": lsh["doc_id"],
                    "shingles": shingles,
                }
            )

    def bucket_exact(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64),
             "jaccard": np.array([], np.float64)}
        )
        n = len(group)
        if n < 2:
            return empty
        band = group["band"].to_numpy()
        bh = group["band_hash"].to_numpy()
        docs_ = group["doc_id"].to_numpy()
        sets_col = group["shingles"].to_numpy()
        order, starts = _runs([band, bh, docs_], boundary_keys=2)
        bounds = np.append(starts, n)
        rows_a, rows_b, js = [], [], []
        seen_pairs: set[tuple[int, int]] = set()
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            idx = order[s:e]
            uniq, first = np.unique(docs_[idx], return_index=True)
            if len(uniq) < 2:
                continue
            sets = [set(int(v) for v in sets_col[i]) for i in idx[first]]
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    key = (int(uniq[i]), int(uniq[j]))
                    if key in seen_pairs:
                        continue
                    seen_pairs.add(key)
                    inter = len(sets[i] & sets[j])
                    union = len(sets[i] | sets[j])
                    jac = inter / union if union else 1.0
                    if jac >= threshold:
                        rows_a.append(uniq[i])
                        rows_b.append(uniq[j])
                        js.append(jac)
        if not rows_a:
            return empty
        return pd.DataFrame({"doc_a": np.array(rows_a, np.int64), "doc_b": np.array(rows_b, np.int64), "jaccard": np.array(js, np.float64)})

    buckets = docs.map_batches(ShingleStage, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4))
    pairs = buckets.groupby("meta").map_groups(bucket_exact, batch_format="pandas")
    return _dedupe_pairs(pairs, "jaccard", "max")


# --- clustering ------------------------------------------------------------

def cluster_pairs(pairs: "ray.data.Dataset", max_rounds: int = 10) -> "ray.data.Dataset":
    """Connected components over a near-dup pair table -> (doc_id, cluster_id)
    with cluster_id = min doc_id in the component (min-label propagation,
    distributed rounds of grouped mins — no driver union-find)."""
    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "src": pa.concat_arrays([b["doc_a"].combine_chunks().cast(pa.int64()), b["doc_b"].combine_chunks().cast(pa.int64())]),
                "dst": pa.concat_arrays([b["doc_b"].combine_chunks().cast(pa.int64()), b["doc_a"].combine_chunks().cast(pa.int64())]),
            }
        ),
        batch_format="pyarrow",
    )
    # label(v) starts at min(v, min neighbor)
    labels = edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
    labels = labels.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["src"].combine_chunks().cast(pa.int64()),
                "cluster_id": pa.compute.min_element_wise(
                    b["src"].combine_chunks().cast(pa.int64()), b["nbr_min"].combine_chunks().cast(pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    edges = edges.materialize()
    for _ in range(max_rounds):
        lab_pd = labels.to_pandas()  # label table is |V|-sized; pair graphs are
        # sparse near-dup sets, orders smaller than the corpus — safe to
        # broadcast. (At 1e12 docs with huge dup families, swap for a joined
        # propagate; topology unchanged.)
        lab_map = dict(zip(lab_pd["doc_id"], lab_pd["cluster_id"]))

        def propagate(b: pa.Table) -> pa.Table:
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            lab_dst = np.array([lab_map[d] for d in dst], dtype=np.int64)
            return pa.table({"doc_id": pa.array(src, pa.int64()), "cand": pa.array(lab_dst, pa.int64())})

        cand = edges.map_batches(propagate, batch_format="pyarrow")
        new_labels = cand.groupby("doc_id").aggregate(Min("cand", alias_name="nbr_lab"))

        def merge(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            own = np.array([lab_map[i] for i in ids], dtype=np.int64)
            nbr = b["nbr_lab"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "cluster_id": pa.array(np.minimum(own, nbr), pa.int64())}
            )

        merged = new_labels.map_batches(merge, batch_format="pyarrow").materialize()
        new_pd = merged.to_pandas()
        if dict(zip(new_pd["doc_id"], new_pd["cluster_id"])) == lab_map:
            break
        labels = merged
    return labels
