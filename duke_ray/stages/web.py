"""Webtext URL operators: host extraction and per-domain corpus stats.

The per-domain rollup (page counts + token mass per registered host) is
the CommonCrawl-style bookkeeping step every web-corpus pipeline runs
before domain-level filtering/weighting; the reference has no URL
handling at all (its inputs are CSV columns, /root/reference/Duke/
dataset.py:37). Host parsing is one RE2 kernel over the url column;
the rollup is per-batch C++ group_by partials into one ``grouped_sum``
exchange whose key cardinality is |domains| (≪ corpus), so shuffle
volume is metadata-sized at any corpus scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+).*$"


def url_host(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """scheme://host/... -> host (lowercased; port kept if present).
    Rows that do not look like a URL map to null."""
    m = pc.extract_regex(url_col, _HOST_RE)  # RE2 needs a NAMED group
    host = pc.struct_field(m, "host")
    return pc.utf8_lower(host)


def filter_blocklist(
    pages: "ray.data.Dataset",
    blocked_hosts,
    url_col: str = "url",
) -> "ray.data.Dataset":
    """Anti-join against a domain blocklist: drop every page whose url host
    is in ``blocked_hosts``. The blocklist is broadcast into the batch
    closure (never shuffled — the CCNet/RefinedWeb-style small-side
    pattern); rows whose url does not parse are dropped too (fail-closed:
    a page that cannot be attributed to a host cannot be cleared).

    Output: the input rows minus blocked/unparseable ones, with the parsed
    ``domain`` column appended. Pure per-batch map — no shuffle at any
    corpus size.
    """
    bl = pa.array(sorted(set(blocked_hosts)), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        host = url_host(batch[url_col])
        keep = pc.and_(pc.is_valid(host), pc.invert(pc.is_in(host, value_set=bl)))
        return batch.append_column("domain", host).filter(
            pc.fill_null(keep, False)
        )

    return pages.map_batches(f, batch_format="pyarrow", batch_size=8192)


def domain_stats(
    pages: "ray.data.Dataset",
    url_col: str = "url",
    text_col: str = "text",
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """(url, text, ...) -> (domain, n_pages, n_tokens): page count and
    total token count per host. Tokens = text split on single spaces (the
    corpus normal form); null text counts 0 tokens."""

    def partial(batch: pa.Table) -> pa.Table:
        host = url_host(batch[url_col])
        text = batch[text_col]
        n_tok = pc.if_else(
            pc.is_valid(text),
            pc.add(
                pc.count_substring(pc.coalesce(text, pa.scalar("")), " "),
                pa.scalar(1, pa.int32()),
            ),
            pa.scalar(0, pa.int32()),
        ).cast(pa.int64())
        t = pa.table({"domain": host, "n_tokens": n_tok})
        g = t.group_by("domain").aggregate(
            [("n_tokens", "sum"), ("n_tokens", "count")]
        )
        return pa.table(
            {
                "domain": g["domain"],
                "n_tokens": g["n_tokens_sum"].cast(pa.int64()),
                "n_pages": g["n_tokens_count"].cast(pa.int64()),
            }
        )

    from ..state.exchange import grouped_sum

    partials = pages.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return grouped_sum(
        partials, "domain", {"n_pages": "n_pages", "n_tokens": "n_tokens"}, n_meta=n_meta
    )


# --- URL canonicalization ---------------------------------------------------

# One RE2 grammar, three extractions: scheme, host, pre-fragment tail.
# pyarrow and DuckDB both run RE2, so the canonicalization is DEFINED as
# this exact kernel chain and the SQL oracle replays it verbatim (the
# same shared-RE2 trick as stages/chunk.py:regex_redact).
_SCHEME_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/?#]*)"
_TAIL_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(?P<tail>[^#]*)"
# tracking-param scrub over the tail (covers <=2 consecutive utm params;
# the rewrite is deterministic RE2 global-replace on both sides)
_UTM_MID = r"([?&])utm_[^&#]*&"
_UTM_END = r"[?&]utm_[^&#]*$"


def _field(url_col, pattern: str, name: str):
    m = pc.extract_regex(url_col, pattern)
    return pc.struct_field(m, name)


def canonical_url(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical form: lowercased scheme and host, fragment stripped,
    utm_* query params removed. Unparseable urls map to null."""
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    scheme = pc.utf8_lower(_field(url_col, _SCHEME_RE, "scheme"))
    host = pc.utf8_lower(_field(url_col, _HOST_RE, "host"))
    tail = _field(url_col, _TAIL_RE, "tail")
    tail = pc.replace_substring_regex(tail, _UTM_MID, r"\1")
    tail = pc.replace_substring_regex(tail, _UTM_MID, r"\1")
    tail = pc.replace_substring_regex(tail, _UTM_END, "")
    host_tail = pc.binary_join_element_wise(host, tail, "")
    return pc.binary_join_element_wise(scheme, host_tail, "://")


def url_dedup(
    pages: "ray.data.Dataset",
    url_col: str = "url",
    id_col: str = "doc_id",
    n_meta: int = 256,
) -> "ray.data.Dataset":
    """Exact dedup by canonical URL -> (canonical_url, doc_id, n_urls):
    the surviving (minimum) id and the number of raw urls that collapsed
    onto each canonical form. Unparseable urls are dropped (fail-closed,
    same policy as :func:`filter_blocklist`).

    Shape: per-batch canonicalize + (canonical, min_id, count) C++
    group_by partials, then ONE canonical-keyed ``partitioned_reduce``
    combining min/sum — the exact-dedup topology (stages/dedup.py) keyed
    on the canonical string instead of a content hash."""
    from ..state.exchange import partitioned_reduce

    def partial(batch: pa.Table) -> pa.Table:
        canon = canonical_url(batch[url_col])
        t = pa.table(
            {"canonical_url": canon, "doc_id": batch[id_col].cast(pa.int64())}
        ).filter(pc.is_valid(canon))
        g = t.group_by("canonical_url").aggregate([("doc_id", "min"), ("doc_id", "count")])
        return pa.table(
            {
                "canonical_url": g["canonical_url"],
                "doc_id": g["doc_id_min"].cast(pa.int64()),
                "n_urls": g["doc_id_count"].cast(pa.int64()),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("canonical_url").aggregate([("doc_id", "min"), ("n_urls", "sum")])
        return pa.table(
            {
                "canonical_url": g["canonical_url"],
                "doc_id": g["doc_id_min"].cast(pa.int64()),
                "n_urls": g["n_urls_sum"].cast(pa.int64()),
            }
        )

    partials = pages.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return partitioned_reduce(partials, "canonical_url", combine, n_meta=n_meta)
