"""Fixed-window token chunking and regex redaction over a document
corpus — the training-data ops that turn raw documents into model-sized
samples and scrub unwanted spans (the reference's text handling stops at
normalization, /root/reference/Duke/utils.py:12-19; these extend it for
LLM-pipeline use per SURVEY §2 "beyond the reference").

Chunking spec (pinned, SQL-oracle-equivalent): a document's tokens are
its text split on single spaces (the corpus normal form; identical to
DuckDB ``string_split(text, ' ')`` including the empty-string -> ['']
case). Windows of ``chunk_size`` tokens start at 0, stride, 2*stride, ...
while start < n_tokens, stride = chunk_size - overlap; the final window
may be short. Output rows: (doc_id, chunk_idx, n_tokens, chunk_text).

Scale shape: a pure per-batch ``map_batches`` expansion — no shuffle, no
state, streams at any corpus size. The kernel is fully vectorized: a
grouped arange builds the flat gather index for every window in the
batch at once, one ``take`` gathers tokens, and a LargeListArray +
``binary_join`` emits chunk strings. No per-row Python. Row expansion is
~chunk_size/stride x, so downstream batch sizes see EXPANDED rows only
if fusion is blocked; at the default ~1.3x expansion fusion bundling is
safe (contrast sources/tables.py:read_pages' x500 case).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def chunk_batch(
    batch: pa.Table,
    chunk_size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    off = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + len(toks) + 1
    ].astype(np.int64)
    doc_start = off[:-1] - off[0]
    n_tok = off[1:] - off[:-1]  # >= 1 always: ''.split(' ') == ['']

    n_chunks = (n_tok + stride - 1) // stride
    total = int(n_chunks.sum())
    crow = np.repeat(np.arange(len(toks), dtype=np.int64), n_chunks)
    cidx = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_chunks) - n_chunks, n_chunks
    )
    starts = doc_start[crow] + cidx * stride
    ends = np.minimum(starts + chunk_size, doc_start[crow] + n_tok[crow])
    clen = ends - starts

    # grouped arange: flat gather index covering every window back-to-back
    tot = int(clen.sum())
    gidx = np.repeat(starts, clen) + (
        np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(clen) - clen, clen)
    )
    gathered = flat.take(pa.array(gidx, pa.int64()))
    if isinstance(gathered, pa.ChunkedArray):
        gathered = gathered.combine_chunks()
    loff = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=loff[1:])
    chunk_text = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(loff, pa.int64()), gathered), " "
    )

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            "doc_id": ids.cast(pa.int64()).take(pa.array(crow, pa.int64())),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "n_tokens": pa.array(clen, pa.int64()),
            "chunk_text": chunk_text,
        }
    )


def chunk_tokens(
    docs: "ray.data.Dataset",
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Cut every document into overlapping fixed-token windows (see module
    docstring for the pinned spec)."""
    if not (0 <= overlap < chunk_size):
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    return docs.map_batches(
        lambda b: chunk_batch(b, chunk_size, stride, id_col, text_col),
        batch_format="pyarrow",
        batch_size=4096,
    )


def regex_redact(
    docs: "ray.data.Dataset",
    pattern: str,
    replacement: str = "<RED>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """PII-style scrub: replace every non-overlapping RE2 match of
    ``pattern`` and count the replacements per document.

    Both pyarrow and DuckDB use RE2, so the same pattern string is valid
    on both sides of the oracle. Output: (doc_id, n_redactions,
    clean_text). Stateless map_batches; streams at any scale.
    """

    def f(b: pa.Table) -> pa.Table:
        text = b[text_col]
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "n_redactions": pc.count_substring_regex(text, pattern).cast(pa.int64()),
                "clean_text": pc.replace_substring_regex(
                    text, pattern=pattern, replacement=replacement
                ),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", batch_size=8192)


def build_vocab(
    docs: "ray.data.Dataset",
    vocab_size: int = 1000,
    text_col: str = "text",
    n_meta: int = 64,
) -> pa.Table:
    """Frequency-ranked vocabulary (token -> dense id) — the tokenizer
    'fit' step of a training pipeline. id = rank by (count DESC, token
    ASC), a TOTAL order, so the vocabulary is deterministic at any
    parallelism and matches SQL ``ROW_NUMBER() OVER (ORDER BY n DESC,
    tok)`` exactly.

    Counts flow through the term_frequencies topology (per-batch C++
    group partials, one vocab-keyed grouped_sum); each count block then
    emits only its LOCAL top-``vocab_size`` (sorted slice), so the
    driver sees at most blocks x vocab_size rows — the corpus-scale
    vocabulary never materializes on the driver. Tokens are raw space
    splits (byte-identical to ``string_split``)."""
    from ..state.exchange import grouped_sum

    def count_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b[text_col], ""), pattern=" ")
        flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) else toks.flatten()
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return g.rename_columns(["token", "n"])

    counts = grouped_sum(
        docs.map_batches(count_partial, batch_format="pyarrow", batch_size=8192),
        "token",
        {"n": "n"},
        n_meta=n_meta,
    )

    def local_top(b: pa.Table) -> pa.Table:
        t = b.take(
            pc.sort_indices(
                b, sort_keys=[("n", "descending"), ("token", "ascending")]
            )
        )
        return t.slice(0, vocab_size)

    tops = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    if not len(tops):
        return pa.table(
            {
                "token": pa.array([], pa.string()),
                "id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    tops = tops.sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort"
    ).head(vocab_size)
    return pa.table(
        {
            "token": pa.array(tops["token"], pa.string()),
            "id": pa.array(np.arange(len(tops), dtype=np.int64), pa.int64()),
            "n": pa.array(tops["n"].to_numpy(), pa.int64()),
        }
    )


def encode_docs(
    docs: "ray.data.Dataset",
    vocab: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Encode documents as dense vocabulary ids -> (doc_id, ids,
    n_tokens, n_oov); ``ids`` is the comma-joined id sequence (OOV =
    -1) — the tokenizer 'transform' step. The vocabulary broadcasts
    once via ``ray.put`` (bounded by vocab_size); encoding is one
    streamed pass: ``index_in`` gather + list reconstruction +
    ``binary_join``, no per-row Python."""
    import ray

    v_ref = ray.put((vocab["token"].combine_chunks(), vocab["id"].to_numpy(zero_copy_only=False)))

    def encode(b: pa.Table) -> pa.Table:
        v_toks, v_ids = ray.get(v_ref)
        toks = pc.split_pattern(pc.fill_null(b[text_col], ""), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        off = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
            toks.offset : toks.offset + len(toks) + 1
        ]
        off0 = (off - off[0]).astype(np.int32)
        idx_arr = pc.index_in(flat, value_set=v_toks)
        hit = pc.is_valid(idx_arr).to_numpy(zero_copy_only=False)
        idx_i = pc.fill_null(idx_arr, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v_ids):
            ids = np.where(hit, v_ids[idx_i], np.int64(-1))
        else:
            ids = np.full(len(flat), -1, np.int64)
        id_strs = pc.cast(pa.array(ids, pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(off0, pa.int32()), id_strs)
        joined = pc.binary_join(lists, ",")
        n_tok = (off0[1:] - off0[:-1]).astype(np.int64)
        n_oov = np.zeros(b.num_rows, np.int64)
        np.add.at(n_oov, np.repeat(np.arange(b.num_rows), n_tok), (ids == -1).astype(np.int64))
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "ids": joined,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow", batch_size=8192)
