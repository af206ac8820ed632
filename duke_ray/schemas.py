"""Fixed, explicit Arrow schemas at every stage boundary.

The reference engine infers schemas via pandas dtype sniffing
(/root/reference/Duke/dataset.py:37,45); this engine replaces that with
declared ``pyarrow.Schema`` constants validated in tests (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

EMBED_DIM = 64  # matches /root/testdata/*/embeddings.parquet

# Primary input per BASELINE.json input_hint.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# After the extract stage: exactly one non-null text per url.
EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("pos", pa.int32()),        # token position within the page
        ("surface", pa.string()),   # gazetteer surface form (normalized)
        ("entity_hint", pa.int64()),  # gazetteer entity id (pre-linking)
    ]
)

TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("pred_pos", pa.int32()),
    ]
)

CANONICAL_TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("n_occurrences", pa.int64()),
        ("n_pages", pa.int64()),
    ]
)

# KG node / edge tables materialized as partitioned Parquet.
NODES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("surface", pa.string()),
        ("class", pa.string()),
        ("type_score", pa.float32()),
        ("n_mentions", pa.int64()),
        ("bucket", pa.int32()),
    ]
)

EDGES = pa.schema(
    [
        ("subj_id", pa.int64()),
        ("pred", pa.string()),
        ("obj_id", pa.int64()),
        ("n_occurrences", pa.int64()),
        ("n_pages", pa.int64()),
        ("bucket", pa.int32()),
    ]
)

VOCAB_EMBEDDINGS = pa.schema(
    [
        ("word", pa.string()),
        ("vector", pa.list_(pa.float32(), EMBED_DIM)),
    ]
)

CLASS_TREE = pa.schema(
    [
        ("class", pa.string()),
        ("parents", pa.list_(pa.string())),
        ("children", pa.list_(pa.string())),
    ]
)

ENTITIES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("surface", pa.string()),
        ("vector", pa.list_(pa.float32(), EMBED_DIM)),
        ("class", pa.string()),
    ]
)
