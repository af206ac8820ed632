"""Mention detection and (subj, pred, obj) triple extraction.

Deterministic spec (this engine's reference semantics; a pure single-process
transliteration lives in ``duke_ray/oracle.py`` and the P/R gate compares
the two, per BASELINE.json "P/R >= 0.95 vs reference triples"):

- tokens: ``normalize_text`` of the page text, split on single spaces,
  0-based positions (byte-compatible with the reference normalizer,
  /root/reference/Duke/utils.py:12-19).
- mention: any token exactly matching a gazetteer surface form
  (``SideAssets.surface_to_entity``). The reference's analogue is a cell's
  word list (/root/reference/Duke/dataset.py:28-30, SURVEY.md M8).
- triple: for each token p in the predicate lexicon at position i, let
  subj = nearest mention at position < i with i - pos <= TRIPLE_WINDOW and
  obj = nearest mention at position > i with pos - i <= TRIPLE_WINDOW, both
  within the same page; emit (subj, p, obj) iff both exist. Predicate and
  surface lexicons are disjoint by construction.

Implementation is fully vectorized: one forward and one backward
``maximum.accumulate`` over the batch's flattened token buffer — no Python
loop over tokens or rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_pool
from ..assets import SideAssets
from ..assets import default_assets as _default_assets
from ..synth import TRIPLE_WINDOW
from .tokens import FlatTokens

_NEG = np.int64(-1)


def _mention_scan(flat: FlatTokens, surface_arr: pa.Array, pred_arr: pa.Array):
    """Shared vectorized scan: mention ids + nearest-mention-before/after."""
    ent_idx = pc.index_in(flat.tokens, value_set=surface_arr).fill_null(-1)
    ent_idx = ent_idx.to_numpy(zero_copy_only=False).astype(np.int64)
    is_pred = pc.is_in(flat.tokens, value_set=pred_arr).to_numpy(zero_copy_only=False)

    n = len(ent_idx)
    g = np.arange(n, dtype=np.int64)
    is_mention = ent_idx >= 0

    # forward fill: index of nearest mention at-or-before each position
    m_fwd = np.where(is_mention, g, _NEG)
    prev = np.maximum.accumulate(m_fwd) if n else m_fwd
    # backward fill: index of nearest mention at-or-after each position
    m_bwd = np.where(is_mention, n - 1 - g, _NEG)[::-1]
    nxt_rev = np.maximum.accumulate(m_bwd) if n else m_bwd
    nxt = np.where(nxt_rev[::-1] >= 0, n - 1 - nxt_rev[::-1], _NEG)
    return ent_idx, is_mention, is_pred, prev, nxt


class TripleExtractor:
    """Actor-pool stage: gazetteer + predicate lexicon pinned once per actor
    (SURVEY.md T5-adjacent; state is small but per-batch rebuild would still
    dominate at 1e12 docs)."""

    def __init__(self, assets: SideAssets | None = None, emit: str = "triples"):
        assets = assets or _default_assets()
        self.surface_arr = pa.array(list(assets.surface_to_entity), pa.string())
        self.entity_ids = np.array(
            [assets.surface_to_entity[s] for s in self.surface_arr.to_pylist()], dtype=np.int64
        )
        self.pred_arr = pa.array(sorted(assets.pred_words), pa.string())
        self.emit = emit

    def _mentions_table(self, flat: FlatTokens, url, ent_idx, is_mention) -> pa.Table:
        sel = np.flatnonzero(is_mention)
        return pa.table(
            {
                "url": url.take(pa.array(flat.row[sel])),
                "pos": pa.array(flat.pos[sel].astype(np.int32), pa.int32()),
                "surface": flat.tokens.take(pa.array(sel)),
                "entity_hint": pa.array(self.entity_ids[ent_idx[sel]], pa.int64()),
            }
        )

    @staticmethod
    def _triple_indices(flat: FlatTokens, is_pred, prev, nxt):
        """Filtered flat-buffer indices (p, subj_i, obj_i) of valid triples."""
        p = np.flatnonzero(is_pred)
        if p.size == 0:
            return p, p, p
        subj_i = prev[p]          # nearest mention at-or-before; preds are never mentions
        obj_i = nxt[p]
        ok = (subj_i >= 0) & (obj_i >= 0)
        # same-row + window constraints
        ok &= np.where(subj_i >= 0, flat.row[subj_i] == flat.row[p], False)
        ok &= np.where(obj_i >= 0, flat.row[obj_i] == flat.row[p], False)
        ok &= np.where(subj_i >= 0, flat.pos[p] - flat.pos[subj_i] <= TRIPLE_WINDOW, False)
        ok &= np.where(obj_i >= 0, flat.pos[obj_i] - flat.pos[p] <= TRIPLE_WINDOW, False)
        return p[ok], subj_i[ok], obj_i[ok]

    def _triples_table(self, flat: FlatTokens, url, is_pred, prev, nxt) -> pa.Table:
        p, subj_i, obj_i = self._triple_indices(flat, is_pred, prev, nxt)
        if p.size == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "subj": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                    "pred_pos": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "url": url.take(pa.array(flat.row[p])),
                "subj": flat.tokens.take(pa.array(subj_i)),
                "pred": flat.tokens.take(pa.array(p)),
                "obj": flat.tokens.take(pa.array(obj_i)),
                "pred_pos": pa.array(flat.pos[p].astype(np.int32), pa.int32()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = FlatTokens.from_text(text)
        ent_idx, is_mention, is_pred, prev, nxt = _mention_scan(flat, self.surface_arr, self.pred_arr)
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()

        if self.emit == "mentions":
            return self._mentions_table(flat, url, ent_idx, is_mention)
        if self.emit == "triples":
            return self._triples_table(flat, url, is_pred, prev, nxt)
        if self.emit == "partials":
            # EXACT per-batch KG partials (kind "m": surface counts; kind
            # "t": per-spo occurrence + distinct-page counts). A page is one
            # input row, so all its mentions/triples land in THIS batch and
            # no url ever spans batches -> the partials sum exactly across
            # batches (stages/canonicalize.canonicalize_from_partials).
            # Shrinks the KG checkpoint and the canonicalize exchange from
            # corpus-row scale to unique-key-per-batch scale. The batch row
            # INDEX stands in for the url (urls are unique per row), so no
            # corpus-row-scale string column is ever built on this path.
            sel = np.flatnonzero(is_mention)
            gm = (
                pa.table({"surface": flat.tokens.take(pa.array(sel))})
                .group_by(["surface"])
                .aggregate([("surface", "count")])
            )
            p, subj_i, obj_i = self._triple_indices(flat, is_pred, prev, nxt)
            t = pa.table(
                {
                    "subj": flat.tokens.take(pa.array(subj_i)),
                    "pred": flat.tokens.take(pa.array(p)),
                    "obj": flat.tokens.take(pa.array(obj_i)),
                    "row": pa.array(flat.row[p], pa.int64()),
                }
            )
            g1 = t.group_by(["subj", "pred", "obj", "row"]).aggregate([("row", "count")])
            g2 = g1.group_by(["subj", "pred", "obj"]).aggregate(
                [("row_count", "sum"), ("row_count", "count")]
            )
            pm = pa.table(
                {
                    "kind": pa.array(["m"] * gm.num_rows, pa.string()),
                    "surface": gm["surface"],
                    "subj": pa.nulls(gm.num_rows, pa.string()),
                    "pred": pa.nulls(gm.num_rows, pa.string()),
                    "obj": pa.nulls(gm.num_rows, pa.string()),
                    "n": gm["surface_count"].cast(pa.int64()),
                    "pages": pa.nulls(gm.num_rows, pa.int64()),
                }
            )
            pt = pa.table(
                {
                    "kind": pa.array(["t"] * g2.num_rows, pa.string()),
                    "surface": pa.nulls(g2.num_rows, pa.string()),
                    "subj": g2["subj"],
                    "pred": g2["pred"],
                    "obj": g2["obj"],
                    "n": g2["row_count_sum"].cast(pa.int64()),
                    "pages": g2["row_count_count"].cast(pa.int64()),
                }
            )
            return pa.concat_tables([pm, pt])
        # emit == "both": ONE tokenize+scan of the text emits a tagged union
        # of mention and triple rows (VERDICT r2 #1 — the two KG branches
        # previously each re-ran FlatTokens.from_text + _mention_scan over
        # the same checkpointed corpus).
        m = self._mentions_table(flat, url, ent_idx, is_mention)
        t = self._triples_table(flat, url, is_pred, prev, nxt)
        um = pa.table(
            {
                "kind": pa.array(["m"] * m.num_rows, pa.string()),
                "url": m["url"],
                "pos": m["pos"],
                "surface": m["surface"],
                "entity_hint": m["entity_hint"],
                "subj": pa.nulls(m.num_rows, pa.string()),
                "pred": pa.nulls(m.num_rows, pa.string()),
                "obj": pa.nulls(m.num_rows, pa.string()),
            }
        )
        ut = pa.table(
            {
                "kind": pa.array(["t"] * t.num_rows, pa.string()),
                "url": t["url"],
                "pos": t["pred_pos"],
                "surface": pa.nulls(t.num_rows, pa.string()),
                "entity_hint": pa.nulls(t.num_rows, pa.int64()),
                "subj": t["subj"],
                "pred": t["pred"],
                "obj": t["obj"],
            }
        )
        return pa.concat_tables([um, ut])


# Process-local extractor cache: the gazetteer/lexicon state is tiny, so the
# stage runs as STATELESS TASKS (elastic, no actor-pool ramp-up — an
# autoscaling pool never reaches full width inside a short job) with the
# state built once per worker process. Pass ``assets`` explicitly to force
# the actor-pool form instead (the right shape when state is model-sized).
_EXTRACTOR_CACHE: dict[str, TripleExtractor] = {}


def _extract_batch(batch: pa.Table, emit: str) -> pa.Table:
    ex = _EXTRACTOR_CACHE.get(emit)
    if ex is None:
        ex = _EXTRACTOR_CACHE[emit] = TripleExtractor(emit=emit)
    return ex(batch)


def _mentions_batch(batch: pa.Table) -> pa.Table:
    return _extract_batch(batch, "mentions")


def _triples_batch(batch: pa.Table) -> pa.Table:
    return _extract_batch(batch, "triples")


def _partials_batch(batch: pa.Table) -> pa.Table:
    return _extract_batch(batch, "partials")


def _both_batch(batch: pa.Table) -> pa.Table:
    return _extract_batch(batch, "both")


def extract_mentions_and_triples(
    extracted: "ray.data.Dataset",
    batch_size: int = 4096,
    concurrency=None,
    assets: SideAssets | None = None,
) -> "ray.data.Dataset":
    """Single-pass extraction: one tokenize + mention scan per page emits a
    tagged union (``kind`` = "m" mention / "t" triple). Consumers split by
    ``kind`` (the KG pipeline checkpoints this partitioned by kind so each
    branch re-reads only its own rows + columns)."""
    if assets is not None:
        return extracted.map_batches(
            TripleExtractor,
            fn_constructor_kwargs={"assets": assets, "emit": "both"},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None else default_pool(),
        )
    return extracted.map_batches(_both_batch, batch_format="pyarrow", batch_size=batch_size)


def extract_kg_partials(
    extracted: "ray.data.Dataset",
    batch_size: int = 4096,
    concurrency=None,
    assets: SideAssets | None = None,
) -> "ray.data.Dataset":
    """Single-pass extraction emitting EXACT per-batch KG partials (tagged
    ``kind`` = "m" surface counts / "t" per-spo occurrence+page counts).
    Output is unique-keys-per-batch sized, not corpus-row sized — the KG
    pipeline's checkpoint/shuffle-volume path. See
    TripleExtractor.__call__ ``emit="partials"`` for the exactness
    argument."""
    if assets is not None:
        return extracted.map_batches(
            TripleExtractor,
            fn_constructor_kwargs={"assets": assets, "emit": "partials"},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None else default_pool(),
        )
    return extracted.map_batches(_partials_batch, batch_format="pyarrow", batch_size=batch_size)


def _combine_partials_block(b: pa.Table) -> pa.Table:
    g = b.group_by(["kind", "surface", "subj", "pred", "obj"]).aggregate(
        [("n", "sum"), ("pages", "sum")]
    )
    return pa.table(
        {
            "kind": g["kind"],
            "surface": g["surface"],
            "subj": g["subj"],
            "pred": g["pred"],
            "obj": g["obj"],
            "n": g["n_sum"].cast(pa.int64()),
            # all-null groups (kind=m rows) sum to null, preserving the
            # tagged-union schema byte-for-byte
            "pages": g["pages_sum"].cast(pa.int64()),
        }
    )


def combine_kg_partials(partials: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-BLOCK combine of tagged KG partials: collapse the
    per-extraction-batch rows within each task's output block to one row per
    key. Exact (sums of per-batch sums are sums).

    ``extract_kg_partials`` emits one partial row per key per extraction
    BATCH (~4096 pages), so a 10M-page corpus carries ~2400x |unique keys|
    rows into the checkpoint and the canonicalize exchange. Each extraction
    TASK spans ~10 batches; combining at block granularity cuts checkpoint
    and shuffle volume by that factor for one C++ ``group_by`` per block.
    Runs UNFUSED (``ray_remote_args_fn`` blocks operator fusion — see
    sources/tables.py): fused, its ``batch_size=None`` would see single
    upstream batches (already combined) instead of whole per-task blocks."""
    return partials.map_batches(
        _combine_partials_block,
        batch_format="pyarrow",
        batch_size=None,
        ray_remote_args_fn=dict,
    )


def extract_mentions(
    extracted: "ray.data.Dataset",
    batch_size: int = 4096,
    concurrency=None,
    assets: SideAssets | None = None,
) -> "ray.data.Dataset":
    if assets is not None:
        return extracted.map_batches(
            TripleExtractor,
            fn_constructor_kwargs={"assets": assets, "emit": "mentions"},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None else default_pool(),
        )
    return extracted.map_batches(_mentions_batch, batch_format="pyarrow", batch_size=batch_size)


def extract_triples(
    extracted: "ray.data.Dataset",
    batch_size: int = 4096,
    concurrency=None,
    assets: SideAssets | None = None,
) -> "ray.data.Dataset":
    if assets is not None:
        return extracted.map_batches(
            TripleExtractor,
            fn_constructor_kwargs={"assets": assets, "emit": "triples"},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None else default_pool(),
        )
    return extracted.map_batches(_triples_batch, batch_format="pyarrow", batch_size=batch_size)
