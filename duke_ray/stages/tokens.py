"""Tokenization and the flattened-token view used by mention/triple stages.

The reference's unit of processing is a normalized word list per cell
(/root/reference/Duke/utils.py:12-19, dataset.py:28-30). Here the same
normalization runs as Arrow kernels, and downstream positional logic
(mention scan, triple window) operates on the *flattened* token buffer of a
whole batch — token values, row ids, and in-row positions as parallel numpy
arrays. No per-row Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..text import tokenize_arrow


@dataclass
class FlatTokens:
    """Flattened view of a batch's token lists (zero-copy where Arrow allows)."""

    tokens: pa.Array          # (N,) string — all tokens of the batch, row-major
    row: np.ndarray           # (N,) int64 — row index within the batch
    pos: np.ndarray           # (N,) int64 — 0-based token position within the row
    n_rows: int

    @classmethod
    def from_text(cls, text: pa.Array | pa.ChunkedArray) -> "FlatTokens":
        toks = tokenize_arrow(text)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        # list offsets (account for slice offset)
        off_buf = toks.buffers()[1]
        offsets = np.frombuffer(off_buf, dtype=np.int32)[toks.offset : toks.offset + len(toks) + 1]
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        row = np.repeat(np.arange(len(toks), dtype=np.int64), lengths)
        g = np.arange(lengths.sum(), dtype=np.int64)
        pos = g - np.repeat(offsets[:-1].astype(np.int64) - offsets[0], lengths)
        return cls(tokens=flat, row=row, pos=pos, n_rows=len(toks))

    def row_lengths(self) -> np.ndarray:
        out = np.zeros(self.n_rows, dtype=np.int64)
        np.add.at(out, self.row, 1)
        return out
