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
