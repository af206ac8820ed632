"""Corpus cleaning — the standard pretraining-data filter chain composed
from the engine's own operators, as ONE streaming pipeline:

    language filter (rule lang-ID) AND quality filter (Gopher/C4-style
    composite, integer centi-score) -> exact-dedup survivor (min doc id
    per distinct text)

Both filters fuse into the scan (one map_batches, no shuffle); only the
(hash, id) pairs of the SURVIVING rows enter the dedup exchange — at 100 TB
the shuffle is proportional to the post-filter corpus, never the raw one.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.dedup import exact_dedup
from ..stages.textstats import lang_id_batch, quality_batch


def clean_corpus(
    docs: "ray.data.Dataset",
    lang: str = "en",
    min_quality_centi: int = 70,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(doc_id, text) -> (doc_id,) of cleaned-corpus survivors."""

    def keep(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch, id_col, text_col)["pred_lang"]
        q = quality_batch(batch, id_col, text_col)["quality_centi"]
        mask = pc.and_(
            pc.equal(pred, pa.scalar(lang)),
            pc.greater_equal(q, pa.scalar(min_quality_centi, pa.int64())),
        )
        return batch.filter(mask)

    kept = docs.map_batches(keep, batch_format="pyarrow", batch_size=8192)
    return exact_dedup(kept, id_col=id_col, text_col=text_col)


def adaptive_length_filter(
    docs: "ray.data.Dataset",
    lo_milli: int = 100,
    hi_milli: int = 900,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Corpus-ADAPTIVE length filter -> (doc_id, n_tokens) of documents
    whose token count lies within the corpus's own [p_lo, p_hi]
    percentile band — the dynamic-threshold form of a Gopher length
    filter (fixed bounds misfire when the corpus mix shifts; a
    percentile band self-calibrates).

    Two-phase topology: the exact percentile bounds come from the
    distributed value histogram (``int_quantiles`` — only distinct
    token counts cross the wire), broadcast into a second streamed
    filter pass. The token-count projection is computed once and
    materialized so the corpus is scanned, not tokenized, twice.
    """
    import pyarrow.compute as pc

    from ..stages.textstats import int_quantiles

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b[text_col], ""), pattern=" ")
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    counts = docs.map_batches(
        with_tokens, batch_format="pyarrow", batch_size=8192
    ).materialize()
    q = int_quantiles(counts, "n_tokens", ps_milli=(lo_milli, hi_milli)).to_pydict()
    band = dict(zip(q["p_milli"], q["value"]))
    if not band:
        return counts  # empty corpus: nothing to filter
    lo, hi = band[lo_milli], band[hi_milli]

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["n_tokens"], lo), pc.less_equal(b["n_tokens"], hi)
        )
        return b.filter(m)

    return counts.map_batches(keep, batch_format="pyarrow")
