"""Triple canonicalization — salted two-stage grouped aggregation.

North-rule step: "canonicalized via hash-partitioned groupby-aggregate on
normalized surface forms with salted keys for head-entity skew". Surface
forms are already normalized by the tokenizer; the group key is the
(subj, pred, obj) surface triple.

Skew design (SURVEY.md A9/D4): head surfaces are Zipfian, so a naive
``groupby(['subj','pred','obj'])`` sends every occurrence of a hot triple to
one reducer. Instead:

1. **map-side partial aggregation**: within each batch, collapse to
   ``(subj, pred, obj, url) -> n`` counts (pyarrow group_by per batch) —
   this alone removes the per-occurrence row volume;
2. **salted stage**: group by ``(subj, pred, obj, salt)`` where
   ``salt = fnv1a64(url) % n_salt``. Because the salt is a pure function of
   ``url``, each url lands in exactly one salt bucket, so per-bucket
   *distinct-url counts are additive across buckets* — the final stage is
   exact, not approximate;
3. **final stage**: group by ``(subj, pred, obj)`` summing occurrence and
   page counts — cardinality = distinct triples x n_salt, tiny.

At 1e12 docs, stage-2 distinct-url sets for a single hot (triple, salt)
bucket can still be large; the scale path swaps the exact nunique for an
HLL sketch per bucket (mergeable) — same topology, documented trade.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..text import fnv1a64_arrow

_KEY = ["subj", "pred", "obj"]


def partial_counts(batch: pa.Table, n_salt: int) -> pa.Table:
    """Per-batch combiner: (subj,pred,obj,url) -> n, plus the url-salt."""
    g = batch.group_by(_KEY + ["url"]).aggregate([("url", "count")])
    salt = (fnv1a64_arrow(g["url"]) % np.uint64(n_salt)).astype(np.int32)
    return pa.table(
        {
            "subj": g["subj"],
            "pred": g["pred"],
            "obj": g["obj"],
            "url": g["url"],
            "n": g["url_count"],
            "salt": pa.array(salt, pa.int32()),
        }
    )


def _salted_reduce(group: pa.Table) -> pa.Table:
    """Per (subj,pred,obj,salt) group: exact occurrence + distinct-page counts.

    Distinct urls within the group may repeat across *batches* (partials), so
    re-group by url here; distinct across salt buckets is additive because
    salt is a function of url.
    """
    per_url = group.group_by(_KEY + ["salt", "url"]).aggregate([("n", "sum")])
    first = per_url.slice(0, 1)
    return pa.table(
        {
            "subj": first["subj"],
            "pred": first["pred"],
            "obj": first["obj"],
            "salt": first["salt"],
            "occ": pa.array([pa.compute.sum(per_url["n_sum"]).as_py() or 0], pa.int64()),
            "pages": pa.array([len(per_url)], pa.int64()),
        }
    )


def canonicalize_triples(triples: "ray.data.Dataset", n_salt: int = 16) -> "ray.data.Dataset":
    """(url, subj, pred, obj, ...) -> (subj, pred, obj, n_occurrences, n_pages)."""
    partials = triples.map_batches(
        lambda b: partial_counts(b, n_salt), batch_format="pyarrow", batch_size=65536
    )
    salted = partials.groupby(_KEY + ["salt"]).map_groups(_salted_reduce, batch_format="pyarrow")
    final = salted.groupby(_KEY).aggregate(
        Sum("occ", alias_name="n_occurrences"),
        Sum("pages", alias_name="n_pages"),
    )
    return final


def exact_dedup_first(ds: "ray.data.Dataset", key: list[str] | str) -> "ray.data.Dataset":
    """Exact dedup: hash-partition on ``key``, keep the first row per group
    (deterministic tie-break: lexicographically smallest of the remaining
    columns is NOT guaranteed — callers needing determinism should pass a
    pre-sorted or keyed dataset; see dedup.py for the deterministic variant).
    """
    keys = [key] if isinstance(key, str) else list(key)
    return ds.groupby(keys).map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
