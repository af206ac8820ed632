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
