"""Pages -> extracted text (stateless, Arrow-vectorized).

Per BASELINE.json input_hint: the input pages table carries
``html:binary`` and ``text:string``; where ``text`` is null the text is
extracted from ``html`` by the deterministic extractor in
``duke_ray.text`` (byte-identical per url, golden-tested). The reference
has no HTML path (CSV-only ingest, /root/reference/Duke/dataset.py:37);
this stage is the engine's ingest boundary for web pages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..text import extract_html_text_arrow


def extract_batch(batch: pa.Table) -> pa.Table:
    """Vectorized: text = coalesce(text, extract(html)); html column dropped.

    Dropping ``html`` here matters at scale — the binary payload is the bulk
    of the bytes and must not flow through later shuffles.
    """
    text = pc.coalesce(batch["text"], extract_html_text_arrow(batch["html"]))
    cols = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "text": text,
        "lang": batch["lang"],
    }
    return pa.table(cols)


def extract_text(pages: "ray.data.Dataset", batch_size: int = 1024) -> "ray.data.Dataset":
    """Small ``batch_size``: rows are wide (html binary payload), cap the
    bytes per task rather than the row count a narrow table would allow."""
    return pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
