"""End-to-end training-data preparation — the composed "user story" of the
engine's training-data operators, as ONE pipeline:

    language + quality filter (fused scan, stages/textstats kernels)
    -> exact dedup (min doc_id per distinct text, stages/dedup)
    -> fixed-window token chunking (stages/chunk)
    -> deterministic md5 train/val split

Output rows: (doc_id, chunk_idx, n_tokens, chunk_text, split).

Scale shape: the filter fuses into the read scan; the dedup exchange
ships only (hash, id) pairs; the surviving TEXT crosses the wire exactly
once (the id-keyed semi-join below — unavoidable for any exact dedup
that keeps rows: the standard shuffle-by-content-hash ships text once
too); chunking and splitting are stateless per-batch maps. The filtered
corpus is materialized once so the dedup partials pass and the semi-join
read the same blocks instead of re-running the filter scan (the r3
token_budget_head double-scan lesson).

The split is a pure function of (doc_id, chunk_idx) via md5 — adding or
re-running shards never reassigns existing chunks (coordination-free,
like stages/sampling.hash_sample).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.chunk import chunk_tokens
from ..stages.dedup import exact_dedup
from ..stages.textstats import lang_id_batch, quality_batch
from ..state.exchange import partitioned_reduce


def semi_join_ids(
    rows: "ray.data.Dataset",
    ids: "ray.data.Dataset",
    key: str = "doc_id",
    n_meta: int = 256,
) -> "ray.data.Dataset":
    """Keep the rows of ``rows`` whose ``key`` appears in ``ids`` (a
    one-column id dataset). One hash-partitioned exchange; the id side is
    metadata-sized, the row side ships once."""
    schema = rows.schema()  # ray Schema wrapper: .names + .types
    if schema is None:  # empty row side -> empty result
        return rows
    cols = list(schema.names)
    col_type = dict(zip(schema.names, schema.types))

    def row_side(b: pa.Table) -> pa.Table:
        return b.append_column("semi_kind", pa.array(np.zeros(b.num_rows, np.int8)))

    def id_side(b: pa.Table) -> pa.Table:
        # null columns typed like the row side so the union schema is stable
        out = {c: pa.nulls(b.num_rows, col_type[c]) for c in cols if c != key}
        out[key] = b[key].cast(pa.int64())
        out["semi_kind"] = pa.array(np.ones(b.num_rows, np.int8))
        return pa.table(out).select([*cols, "semi_kind"])

    # align row-side schema: key cast to int64 for a stable union schema
    def cast_key(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(key)
        return b.set_column(i, key, b[key].cast(pa.int64()))

    u = rows.map_batches(cast_key, batch_format="pyarrow").map_batches(
        row_side, batch_format="pyarrow"
    ).union(ids.map_batches(id_side, batch_format="pyarrow"))

    def keep_matching(t: pa.Table) -> pa.Table:
        kind = t["semi_kind"].to_numpy(zero_copy_only=False)
        k = t[key].to_numpy(zero_copy_only=False)
        wanted = np.unique(k[kind == 1])
        rows_t = t.filter(pa.array(kind == 0))
        rk = rows_t[key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, rk)
        ok = (
            (pos < len(wanted)) & (wanted[pos.clip(max=max(len(wanted) - 1, 0))] == rk)
            if len(wanted)
            else np.zeros(len(rk), bool)
        )
        return rows_t.filter(pa.array(ok)).drop_columns(["semi_kind"])

    return partitioned_reduce(u, key, keep_matching, n_meta=n_meta)


def assign_split(
    chunks: "ray.data.Dataset", val_rate_256: int = 64
) -> "ray.data.Dataset":
    """Deterministic split: md5(doc_id || ':' || chunk_idx) first-two hex
    chars < hex(val_rate_256) -> 'val', else 'train' (val_rate_256/256 of
    chunks in expectation; same convention as sampling.hash_sample)."""
    if not (0 <= val_rate_256 <= 255):
        raise ValueError(f"val_rate_256 must be in [0, 255], got {val_rate_256}")
    bound = format(val_rate_256, "02x")

    def f(b: pa.Table) -> pa.Table:
        from ..stages.sampling import _md5_hex

        key = pc.binary_join_element_wise(
            b["doc_id"].cast(pa.string()), b["chunk_idx"].cast(pa.string()), ":"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        pre = _md5_hex(key, 2)
        split = np.where(pre < bound, "val", "train")
        return b.append_column("split", pa.array(split, pa.string()))

    return chunks.map_batches(f, batch_format="pyarrow", batch_size=8192)


def prep_training_data(
    docs: "ray.data.Dataset",
    lang: str = "en",
    min_quality_centi: int = 70,
    chunk_size: int = 40,
    overlap: int = 8,
    val_rate_256: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    strip_spans_w: int | None = None,
) -> "ray.data.Dataset":
    """The composed pipeline (see module docstring).

    ``strip_spans_w``: when set, a substring-dedup removal pass
    (stages/spans.py:strip_boilerplate, window = that many tokens) runs
    AFTER doc-level dedup and BEFORE chunking — shared boilerplate
    vanishes from every surviving doc instead of surviving inside chunks.
    Off by default (the oracle mirrors the unstripped pipeline)."""

    def keep(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch, id_col, text_col)["pred_lang"]
        q = quality_batch(batch, id_col, text_col)["quality_centi"]
        mask = pc.and_(
            pc.equal(pred, pa.scalar(lang)),
            pc.greater_equal(q, pa.scalar(min_quality_centi, pa.int64())),
        )
        return batch.filter(mask)

    kept = docs.map_batches(keep, batch_format="pyarrow", batch_size=8192).materialize()
    surv_ids = exact_dedup(kept, id_col=id_col, text_col=text_col)
    surv = semi_join_ids(kept, surv_ids, key=id_col)
    if strip_spans_w is not None:
        from ..stages.spans import strip_boilerplate

        stripped = strip_boilerplate(
            surv, w=strip_spans_w, id_col=id_col, text_col=text_col
        )
        surv = stripped.map_batches(
            lambda b: b.select(["doc_id", "text"]).rename_columns([id_col, text_col]),
            batch_format="pyarrow",
        )
    chunks = chunk_tokens(
        surv, chunk_size=chunk_size, overlap=overlap, id_col=id_col, text_col=text_col
    )
    return assign_split(chunks, val_rate_256=val_rate_256)


def prep_training_data_to_dir(
    docs: "ray.data.Dataset",
    out_dir: str,
    n_buckets: int = 16,
    fingerprint: str = "",
    **prep_kwargs,
) -> dict:
    """Resumable materialization of :func:`prep_training_data`: chunks land
    under ``out_dir/bucket=*/`` keyed on (doc_id, chunk_idx) — a pure
    function of the input, so reruns route every chunk to the same bucket
    — with per-bucket lineage manifests (state/manifest.py). A killed run
    resumes paying only the missing buckets' shuffle/write, the same
    contract the KG pipeline ships (north rule: checkpointed
    resumability), now on the training-data user story.

    Returns the manifest result dict ({written,skipped,rows}).
    """
    from ..state.manifest import write_partitioned_with_manifests

    chunks = prep_training_data(docs, **prep_kwargs)
    return write_partitioned_with_manifests(
        chunks, out_dir, key_cols=["doc_id", "chunk_idx"], n_buckets=n_buckets,
        fingerprint=fingerprint,
    )


def prep_training_data_shuffled_to_dir(
    docs: "ray.data.Dataset",
    out_dir: str,
    n_parts: int = 16,
    fingerprint: str = "",
    **prep_kwargs,
) -> dict:
    """:func:`prep_training_data` landed in DETERMINISTIC-SHUFFLE order
    (stages/shuffle.py): the end-to-end "filter -> dedup -> chunk ->
    split -> shuffle -> shard" training-export story. Chunks are keyed by
    the string "doc_id:chunk_idx" (a pure function of the input), so the
    permutation — and therefore every shard's contents and internal order
    — is bit-identical across runs and cluster widths, and a killed run
    resumes paying only missing shards (shuffle_export manifest
    contract). Reading bucket=0..P-1 in order replays the same
    pseudo-random chunk stream every time."""
    from ..stages.shuffle import shuffle_export_to_dir

    chunks = prep_training_data(docs, **prep_kwargs)

    def with_key(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b["doc_id"], pa.string()),
            pc.cast(b["chunk_idx"], pa.string()),
            ":",
        )
        return b.append_column("chunk_key", key)

    keyed = chunks.map_batches(with_key, batch_format="pyarrow")
    return shuffle_export_to_dir(
        keyed, out_dir, n_parts=n_parts, id_col="chunk_key", fingerprint=fingerprint
    )
