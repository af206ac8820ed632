"""Small dense-vector kernels shared by the embedding/scoring stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def unit_norm_rows(vectors: np.ndarray) -> np.ndarray:
    """L2-normalize each row (reference: /root/reference/Duke/utils.py:22-23).
    Zero rows stay zero instead of producing NaN (documented deviation — the
    reference divides by zero there)."""
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    return np.divide(vectors, norms, out=np.zeros_like(vectors), where=norms != 0)


def fixed_list_to_matrix(col: pa.Array | pa.ChunkedArray, dim: int) -> np.ndarray:
    """Zero-copy-ish fixed_size_list<float32>[dim] -> (n, dim) float32."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        flat = col.flatten()
    else:  # plain list<float> (e.g. driver embeddings table)
        flat = col.flatten()
    vals = flat.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    return vals.reshape(len(col), dim)


def matrix_to_fixed_list(mat: np.ndarray, dtype=np.float32) -> pa.FixedSizeListArray:
    """(n, d) matrix -> fixed_size_list array, no per-row Python."""
    pa_type = pa.float32() if dtype == np.float32 else pa.float64()
    mat = np.ascontiguousarray(mat, dtype=dtype)
    return pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel(), pa_type), mat.shape[1])
