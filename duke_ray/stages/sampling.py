"""Corpus sampling operators — deterministic, coordination-free, oracle-able.

Training-data pipelines need reproducible subsets: a Bernoulli sample that
is a pure function of the row key (same subset on any cluster size, no RNG
state to ship), and a token-budget head ("the first N tokens' worth of
documents in key order") for budget-bounded corpus builds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _md5_hex(ids: pa.Array, n_hex: int) -> np.ndarray:
    """First ``n_hex`` hex chars of md5(str(id)) per row as '<U{n_hex}'.

    md5 is inherently per-row; the digests run over the utf8 buffer of the
    casted column (same discipline as textstats.fingerprint_batch)."""
    s = ids.cast(pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    buf = s.buffers()[2]
    # the offsets buffer is indexed from the ARRAY's offset, not 0: a sliced
    # array (offset != 0 — e.g. when id_col is already string-typed and the
    # cast is a no-op over a sliced batch) shares its parent's buffers, and
    # ignoring s.offset would hash the wrong byte ranges (ADVICE r3).
    offs = np.frombuffer(s.buffers()[1], dtype=np.int32, count=s.offset + len(s) + 1)[
        s.offset :
    ]
    mv = memoryview(buf)
    out = np.empty(len(s), dtype=f"<U{n_hex}")
    for i in range(len(s)):
        out[i] = hashlib.md5(mv[offs[i] : offs[i + 1]]).hexdigest()[:n_hex]
    return out


def _md5_prefix2(ids: pa.Array) -> np.ndarray:
    return _md5_hex(ids, 2)


def hash_sample(
    docs: "ray.data.Dataset", rate_256: int, id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Deterministic Bernoulli sample: keep rows whose md5(str(id)) hex
    prefix is below ``rate_256``/256 (granularity 1/256). Pure function of
    the key — reproducible across runs and cluster sizes, embarrassingly
    parallel, and expressible in SQL (md5 + substring) for the oracle.

    ``rate_256 >= 256`` keeps everything (short-circuit: a 3-hex-char bound
    would otherwise compare lexicographically against 2-char prefixes and
    silently invert to ~1/16 — ADVICE r3); negative rates are an error."""
    if rate_256 < 0:
        raise ValueError(f"rate_256 must be >= 0, got {rate_256}")
    if rate_256 >= 256:
        return docs
    bound = f"{rate_256:02x}"

    def per_batch(batch: pa.Table) -> pa.Table:
        keep = _md5_prefix2(batch[id_col]) < bound
        return batch.filter(pa.array(keep))

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=16384)


def stratified_hash_topk(
    docs: "ray.data.Dataset",
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-group quota sample: for each ``group_col`` value keep the ``k``
    rows with the smallest (md5(str(id)), id) rank — a deterministic,
    coordination-free stand-in for per-group reservoir sampling (md5 rank is
    uniform, so the quota is an unbiased sample; ties broken by id).

    Topology: per-batch partial top-k per group (each batch emits <= k rows
    per group it sees), then one tiny exchange of partials keyed on the
    group — the corpus itself never shuffles. Output: (group, id, rank_hex).
    Oracle: row_number() OVER (PARTITION BY group ORDER BY md5, id)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "rank_hex": pa.array([], pa.string()),
                }
            )
        h = _md5_hex(batch[id_col], 32)
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        g = grp.to_numpy(zero_copy_only=False)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, g))
        gs, hs, isrt = g[order], h[order], ids[order]
        # rank within group = position since last group start
        starts = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
        pos = np.arange(len(gs)) - np.repeat(starts, np.diff(np.concatenate([starts, [len(gs)]])))
        keep = pos < k
        return pa.table(
            {
                group_col: pa.array(gs[keep]),
                id_col: pa.array(isrt[keep], pa.int64()),
                "rank_hex": pa.array(hs[keep]),
            }
        )

    from ..state.exchange import partitioned_reduce

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    # the final reduce reuses the same keep-first-k kernel on the merged
    # partials (<= k rows per group per batch crossed the wire)
    return partitioned_reduce(
        partials, group_col, lambda t: partial(t.drop_columns(["rank_hex"]))
    )


def global_hash_topk(
    docs: "ray.data.Dataset", k: int, id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """EXACTLY min(k, N) rows: the k smallest (md5(str(id)), id) ranks
    globally — "give me exactly 100k uniform docs", the exact-size
    companion of :func:`hash_sample` (whose rate-based keep is only
    binomially close to a target size). Deterministic, unbiased (md5
    rank is uniform), coordination-free: each block emits <= k partial
    rows, and ONE k-bounded merge task picks the global winners — the
    corpus never shuffles and nothing unbounded reaches any single task
    beyond n_blocks * k metadata rows. Oracle: ORDER BY md5, id LIMIT k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "rank_hex": pa.array([], pa.string()),
                }
            )
        h = _md5_hex(batch[id_col], 32)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "rank_hex": pa.array(h[order]),
            }
        )

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    # all surviving partials merge in one task (<= n_blocks * k rows);
    # batch_size=None hands the whole block to one final partial() call
    return partials.repartition(1).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )


def token_budget_head(
    docs: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1024,
) -> "ray.data.Dataset":
    """Budget-bounded corpus head: documents in ascending ``id_col`` order
    whose INCLUSIVE running token total stays <= ``budget``.

    Distributed prefix sum without a global sort: per-batch (bucket =
    id // bucket_size, sum) partials reduce to one tiny per-bucket table
    (metadata-scale — 1e12 docs / 1024 = 1e9 rows would move to a tree
    reduce; at engine scales it is driver-safe), the driver prefix-sums
    bucket offsets, and a second streamed pass cumsums WITHIN each bucket
    and adds its offset. Output: (doc_id, n_tokens, cum_tokens)."""

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch[text_col], pattern=" "))
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "n_tokens": n.cast(pa.int64()),
            }
        )

    # materialized: the counted rows feed BOTH the per-bucket aggregate below
    # and the final partitioned_reduce — without this the lazy dataset would
    # re-run the tokenize+count corpus pass twice (ADVICE r3). The cost is
    # holding (doc_id, n_tokens) — 16 bytes/doc — in the object store, far
    # below the corpus it derives from.
    with_counts = docs.map_batches(
        counts, batch_format="pyarrow", batch_size=16384
    ).materialize()

    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = pc.divide(batch["doc_id"], pa.scalar(bucket_size, pa.int64()))
        t = pa.table({"bucket": b, "n": batch["n_tokens"]})
        g = t.group_by("bucket").aggregate([("n", "sum")])
        return pa.table({"bucket": g["bucket"], "n": g["n_sum"]})

    per_bucket = (
        with_counts.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .to_pandas()
    )
    if per_bucket.empty:
        # empty input: Ray's groupby drops the schema entirely
        buckets = np.array([], dtype=np.int64)
        offsets = np.array([], dtype=np.int64)
    else:
        per_bucket = per_bucket.sort_values("bucket")
        buckets = per_bucket["bucket"].to_numpy()
        offsets = np.concatenate([[0], np.cumsum(per_bucket["sum(n)"].to_numpy())[:-1]])
    # buckets whose offset already exceeds the budget can't contribute
    import ray as _ray

    carry_ref = _ray.put((buckets, offsets))

    def within_bucket(t: pa.Table) -> pa.Table:
        bk, off = _ray.get(carry_ref)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        doc, n = doc[order], n[order]
        b = doc // bucket_size
        cum = np.cumsum(n)
        # reset the running sum at bucket boundaries, then add the global
        # bucket offset
        starts = np.flatnonzero(np.concatenate([[True], b[1:] != b[:-1]]))
        base = np.repeat(cum[starts] - n[starts], np.diff(np.concatenate([starts, [len(b)]])))
        local = cum - base
        gidx = np.searchsorted(bk, b)
        total = local + off[gidx]
        keep = total <= budget
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], pa.int64()),
                "n_tokens": pa.array(n[keep], pa.int64()),
                "cum_tokens": pa.array(total[keep], pa.int64()),
            }
        )

    from ..state.exchange import partitioned_reduce

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pc.divide(batch["doc_id"], pa.scalar(bucket_size, pa.int64()))
        )

    bucketed = with_counts.map_batches(add_bucket, batch_format="pyarrow")

    def reduce_partition(t: pa.Table) -> pa.Table:
        return within_bucket(t.drop_columns(["bucket"]))

    return partitioned_reduce(bucketed, "bucket", reduce_partition)


def mixture_sample(
    docs: "ray.data.Dataset",
    quotas: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Training-mixture construction: per-group QUOTAS instead of a
    uniform k — ``quotas[g]`` rows kept for group ``g`` by deterministic
    (md5(str(id)), id) rank, groups absent from ``quotas`` dropped
    entirely. The op that turns per-source/language weights into an
    actual training set (RefinedWeb/DoReMi-style mixtures), built on the
    :func:`stratified_hash_topk` topology: per-batch partial top-quota
    per group, one group-keyed exchange of <= quota rows per (group,
    batch) — the corpus never shuffles and re-runs never reassign."""
    if not quotas or any(q < 1 for q in quotas.values()):
        raise ValueError("quotas must be a non-empty dict of positive ints")
    qkeys = pa.array(sorted(quotas), pa.string())
    qvals = np.array([quotas[k] for k in sorted(quotas)], np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "rank_hex": pa.array([], pa.string()),
                }
            )
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        qi = pc.index_in(grp, value_set=qkeys).to_numpy(zero_copy_only=False)
        in_mix = ~np.isnan(qi) if qi.dtype.kind == "f" else qi >= 0
        qi = np.where(in_mix, qi, 0).astype(np.int64)
        quota_row = np.where(in_mix, qvals[qi], 0)
        h = _md5_hex(batch[id_col], 32)
        g = grp.to_numpy(zero_copy_only=False)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, g))
        gs, hs, isrt, qs = g[order], h[order], ids[order], quota_row[order]
        starts = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
        pos = np.arange(len(gs)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(gs)]]))
        )
        keep = pos < qs
        return pa.table(
            {
                group_col: pa.array(gs[keep]),
                id_col: pa.array(isrt[keep], pa.int64()),
                "rank_hex": pa.array(hs[keep]),
            }
        )

    from ..state.exchange import partitioned_reduce

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    return partitioned_reduce(
        partials, group_col, lambda t: partial(t.drop_columns(["rank_hex"]))
    )


def weighted_sample(
    docs: "ray.data.Dataset",
    weight_col: str,
    full_weight: int,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic WEIGHTED Bernoulli sample: row kept with probability
    min(1, weight / full_weight) at 1/65536 granularity — importance
    sampling for training mixtures (e.g. weight = token count keeps
    long documents and thins short ones, preserving expected token mass
    per stratum). Pure function of the key: reproducible at any
    parallelism and expressible in SQL (md5 + printf) for the oracle.

    Rule: keep iff weight >= full_weight OR
    md5(str(id))[:4] < format((weight * 65536) // full_weight, '04x') —
    the hash_sample lexicographic idiom with a PER-ROW bound; bound
    strings are formatted once per DISTINCT weight in the batch (token
    counts repeat heavily), not per row."""
    if full_weight <= 0:
        raise ValueError(f"full_weight must be > 0, got {full_weight}")

    def per_batch(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if np.any(w < 0):
            raise ValueError("weights must be non-negative")
        prefix = _md5_hex(batch[id_col], 4)
        bound = (w * 65536) // full_weight
        uniq, inv = np.unique(np.minimum(bound, 0xFFFF), return_inverse=True)
        bstr = np.array([format(int(x), "04x") for x in uniq], dtype="<U4")[inv]
        keep = (w >= full_weight) | (prefix < bstr)
        return batch.filter(pa.array(keep))

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=16384)
