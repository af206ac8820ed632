"""Pure, deterministic text functions — the byte-identical invariants.

Two forms of each function are provided and golden-tested against each other:

- a scalar pure-Python reference form (``normalize_text``,
  ``extract_html_text``) that defines the semantics, row by row;
- an Arrow-vectorized batch form (``normalize_text_arrow``,
  ``extract_html_text_arrow``) used in the hot path of every pipeline.

Semantics of ``normalize_text`` follow the reference engine
(/root/reference/Duke/utils.py:12-19): CamelCase -> snake_case (the public
``inflection.underscore`` algorithm: two regex passes + dash fold + lower),
then ``_``/``-`` -> space, ``(``/``)`` removed, split on single spaces
(empty tokens preserved, exactly like ``str.split(' ')``).

``extract_html_text`` is this engine's deterministic HTML->text extractor
(the reference ingests CSVs and has none; required by BASELINE.json
input_hint ``html:binary``): per-url byte-identical, enforced by tests.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- underscore (CamelCase -> snake_case), inflection-compatible ----------

_UNDER_RE1 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_UNDER_RE2 = re.compile(r"([a-z\d])([A-Z])")


def underscore(word: str) -> str:
    """CamelCase/dash -> snake_case, matching the public inflection algorithm
    used by the reference (/root/reference/Duke/utils.py:13)."""
    word = _UNDER_RE1.sub(r"\1_\2", word)
    word = _UNDER_RE2.sub(r"\1_\2", word)
    word = word.replace("-", "_")
    return word.lower()


def normalize_text(text: str, to_list: bool = True):
    """Reference-equivalent cell normalization (Duke/utils.py:12-19)."""
    text = underscore(text)
    text = text.replace("_", " ").replace("-", " ")
    text = text.replace("(", "").replace(")", "")
    return text.split(" ") if to_list else text


def normalize_text_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``normalize_text(..., to_list=False)`` over a string array."""
    col = pc.replace_substring_regex(col, pattern=r"([A-Z]+)([A-Z][a-z])", replacement=r"\1_\2")
    col = pc.replace_substring_regex(col, pattern=r"([a-z\d])([A-Z])", replacement=r"\1_\2")
    col = pc.replace_substring(col, pattern="-", replacement="_")
    col = pc.utf8_lower(col)
    col = pc.replace_substring(col, pattern="_", replacement=" ")
    col = pc.replace_substring(col, pattern="(", replacement="")
    col = pc.replace_substring(col, pattern=")", replacement="")
    return col


def tokenize_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``normalize_text(..., to_list=True)``: list<string> per row.

    Splits on single spaces, preserving empty tokens — byte-identical to the
    scalar form's ``.split(' ')``.
    """
    return pc.split_pattern(normalize_text_arrow(col), pattern=" ")


# --- HTML -> text ----------------------------------------------------------

# Script/style/comment removal is ONE fused leftmost-first alternation in
# BOTH the scalar spec and the Arrow form. Sequential passes and the fused
# pass disagree on interleaved malformed HTML (e.g.
# b'<style>a<script>b</style>c</script>d': sequential yields 'a d', fused
# yields 'c d') — the fused form is the pinned semantics because it is one
# memory sweep instead of three on a bandwidth-bound stage, and Python re
# and RE2 share leftmost-first alternation discipline so the two forms stay
# byte-identical (regression-tested on the interleaved case).
_BLOCK_RE = re.compile(
    r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>|<!--.*?-->"
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")

# minimal fixed entity set — deterministic, no external tables
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must be last so &amp;lt; -> &lt; (literal), not <
]


def extract_html_text(html: bytes | None) -> str | None:
    """Deterministic HTML -> plain text. Scalar reference form."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    s = _WS_RE.sub(" ", s).strip(" \t\r\n\f\v")  # explicit set: Python's
    # bare strip() removes ALL unicode whitespace (\x1c etc.) which Arrow's
    # trim cannot mirror; the spec pins the ASCII class
    return s


def extract_html_text_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized extractor over a binary column (RE2 kernels, zero-copy in).

    Falls back to the scalar form per-row only if the bytes are not valid
    UTF-8 (cast failure) — the scalar and vector forms are golden-tested
    byte-identical.
    """
    try:
        s = pc.cast(col, pa.string())
    except pa.ArrowInvalid:
        vals = col.to_pylist() if not isinstance(col, pa.ChunkedArray) else col.combine_chunks().to_pylist()
        return pa.array([extract_html_text(v) for v in vals], type=pa.string())
    # Same fused alternation as the scalar spec's _BLOCK_RE (see comment
    # there): one memory sweep, leftmost-first in both Python re and RE2.
    s = pc.replace_substring_regex(s, pattern=_BLOCK_RE.pattern, replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"<[^>]*>", replacement=" ")
    # Entity decode guard: every entity contains '&', so one cheap scan
    # skips SIX full copy-sweeps on corpora without entities (this stage is
    # memory-bandwidth-bound; semantics unchanged).
    if pc.any(pc.match_substring(s, "&")).as_py():
        for ent, rep in _ENTITIES:
            s = pc.replace_substring(s, pattern=ent, replacement=rep)
    s = pc.replace_substring_regex(s, pattern=r"[ \t\r\n\f\v]+", replacement=" ")
    s = pc.utf8_trim(s, characters=" \t\r\n\f\v")
    return s


# --- deterministic hashing -------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(data: str | bytes) -> int:
    """FNV-1a 64-bit hash — stable across processes (unlike ``hash()``)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_arrow(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized FNV-1a over a string array -> uint64 ndarray.

    Operates on the flattened UTF-8 buffer with numpy (no per-row Python);
    a per-byte loop over the max row length, vectorized across rows.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = col.cast(pa.large_binary())  # int64 offsets, handles >2GiB blocks
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    maxlen = int(lengths.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    starts = offsets[:-1].astype(np.int64)
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            active = lengths > i
            if not active.any():
                break
            idx = starts[active] + i
            b = data[idx].astype(np.uint64)
            h[active] = (h[active] ^ b) * _FNV_PRIME
    return h
