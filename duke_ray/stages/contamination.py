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
