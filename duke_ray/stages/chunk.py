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
