"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline at sf0.001. ``queries()`` exposes
one callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible one (driver compares row count + schema +
order-insensitive value hash at sf0.01).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

Column-name discipline: every computed column is named identically in the
Ray pipeline and in the SQL (the driver sorts columns by name before
hashing). Float-valued aggregates are expressed in exact integer units
(cents / milli) wherever summation order could cause drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _require(cond: bool, msg: str) -> None:
    """In-query invariant (VERDICT r2 #6): rows-only queries (no SQL oracle)
    self-check their semantics; a violation fails the query — and therefore
    the driver gate — loudly instead of passing on row count alone."""
    if not cond:
        raise ValueError(f"in-query invariant violated: {msg}")


def _ensure_workers_can_import() -> None:
    """Ray workers resolve ``duke_ray`` via the driver's cwd / PYTHONPATH at
    raylet start — NOT via driver-side sys.path edits. If a probe task can't
    import it, ship the package by value (cloudpickle) as a fallback so the
    contract works regardless of the driver's launch directory."""
    import types

    import ray

    if not ray.is_initialized():
        return
    probe_mod = types.ModuleType("duke_ray_probe_dynamic")
    exec(
        "def probe():\n"
        "    import importlib.util\n"
        "    return importlib.util.find_spec('duke_ray') is not None\n",
        probe_mod.__dict__,
    )
    try:
        ok = ray.get(ray.remote(num_cpus=0)(probe_mod.probe).remote(), timeout=60)
    except Exception:  # noqa: BLE001
        return
    if ok:
        return
    import importlib
    import pkgutil

    from ray import cloudpickle

    import duke_ray

    mods = [duke_ray]
    for info in pkgutil.walk_packages(duke_ray.__path__, prefix="duke_ray."):
        try:
            mods.append(importlib.import_module(info.name))
        except Exception:  # noqa: BLE001
            continue
    for m in mods:
        try:
            cloudpickle.register_pickle_by_value(m)
        except Exception:  # noqa: BLE001
            pass


_ensure_workers_can_import()


# --- helpers ----------------------------------------------------------------

def _extracted(sf_dir: str):
    """pages -> extracted text with doc_id recovered from url (the pages
    table is derived 1:1 from documents; see duke_ray/sources/tables.py)."""
    from duke_ray.sources import read_pages
    from duke_ray.stages.extract import extract_text
    from duke_ray.synth import doc_id_from_url_arrow

    ds = extract_text(read_pages(sf_dir))

    def add_doc_id(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": doc_id_from_url_arrow(batch["url"]),
                "text": batch["text"],
                "lang": batch["lang"],
            }
        )

    return ds.map_batches(add_doc_id, batch_format="pyarrow")


def _url_to_doc_id(ds, keep: list[str]):
    from duke_ray.synth import doc_id_from_url_arrow

    def conv(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": doc_id_from_url_arrow(batch["url"])}
        for c in keep:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(conv, batch_format="pyarrow")


def _surfaces_sql_list() -> str:
    from duke_ray.assets import default_assets

    return ", ".join(f"'{s}'" for s in default_assets().surface_to_entity)


def _preds_sql_list() -> str:
    from duke_ray.assets import default_assets

    return ", ".join(f"'{p}'" for p in sorted(default_assets().pred_words))


_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
)
"""


def _triples_sql_core() -> str:
    """Shared CTE chain producing (doc_id, subj, pred, obj, pred_pos)."""
    from duke_ray.synth import TRIPLE_WINDOW

    return f"""
WITH {_TOKS_CTE},
m AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok IN ({_surfaces_sql_list()}) THEN pos END AS mpos
  FROM toks
),
w AS (
  SELECT doc_id, pos, tok,
    last_value(mpos IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_pos,
    last_value(CASE WHEN mpos IS NOT NULL THEN tok END IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_tok,
    first_value(mpos IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_pos,
    first_value(CASE WHEN mpos IS NOT NULL THEN tok END IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_tok
  FROM m
),
triples AS (
  SELECT doc_id, prev_tok AS subj, tok AS pred, next_tok AS obj,
         CAST(pos AS INTEGER) AS pred_pos
  FROM w
  WHERE tok IN ({_preds_sql_list()})
    AND prev_pos IS NOT NULL AND next_pos IS NOT NULL
    AND pos - prev_pos <= {TRIPLE_WINDOW} AND next_pos - pos <= {TRIPLE_WINDOW}
)
"""


# --- entry ------------------------------------------------------------------

def entry() -> Any:
    """Flagship KG pipeline at sf0.001; returns the edge table Dataset."""
    import shutil

    out = "/tmp/duke_ray_entry"
    shutil.rmtree(out, ignore_errors=True)
    from duke_ray.pipelines.kg import run_kg_pipeline

    run_kg_pipeline("/root/testdata/sf0.001", out, n_buckets=8, n_salt=8)
    import ray.data

    return ray.data.read_parquet(f"{out}/edges")


# --- queries ----------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from duke_ray.assets import default_assets
    from duke_ray.sources import read_table
    from duke_ray.pipelines import relational as rel

    q: dict[str, Callable[[str], Any]] = {}

    # -- KG path over pages (oracles run on the 1:1 documents view) --------
    def extract_text(sf):
        """HTML -> visible text extraction over the pages table (vectorized
        RE2 tag strip + entity decode, duke_ray/text.py), keyed to doc_id."""
        return _extracted(sf).select_columns(["doc_id", "text"])

    q["extract_text"] = extract_text

    def token_counts(sf):
        """Per-doc whitespace token counts (token_stats projection)."""
        from duke_ray.stages.textstats import token_stats

        return token_stats(_extracted(sf)).select_columns(["doc_id", "n_tokens"])

    q["token_counts"] = token_counts

    def token_percentile(sf):
        """Global PERCENT_RANK normalization of per-doc token counts in
        integer milli — histogram+broadcast CDF, no global sort (see
        stages/ranking.py:percentile_rank_milli)."""
        from duke_ray.stages.ranking import percentile_rank_milli

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            nt = pc.list_value_length(pc.split_pattern(b["text"], pattern=" "))
            return pa.table(
                {
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "n_tokens": nt.cast(pa.int64()),
                }
            )

        ds = docs.map_batches(with_tokens, batch_format="pyarrow", batch_size=65536)
        return percentile_rank_milli(ds, "n_tokens")

    q["token_percentile"] = token_percentile

    def token_stats_full(sf):
        from duke_ray.stages.textstats import token_stats

        return token_stats(_extracted(sf))

    q["token_stats"] = token_stats_full

    def term_frequencies(sf):
        from duke_ray.stages.textstats import term_frequencies as tf

        return tf(_extracted(sf))

    q["term_frequencies"] = term_frequencies

    def frequent_terms(sf):
        """Heavy-hitter terms (>= 2 per-mille of all tokens) via the
        bounded-memory Misra-Gries two-pass; output is EXACT (candidate
        superset + exact verify pass), so the oracle is the plain
        count-and-filter SQL. The synthetic vocab (31 tokens) is below
        the capacity the exactness guarantee needs, so truncation cannot
        fire here — the truncating path is exercised by
        tests/test_graph.py-style Zipf fixtures in test_textstats."""
        from duke_ray.stages.textstats import frequent_terms as ft

        return ft(_extracted(sf), threshold_milli=2)

    q["frequent_terms"] = frequent_terms

    def token_quantiles(sf):
        """Exact PERCENTILE_DISC of per-doc token counts via distributed
        value histogram + driver-side cumulative selection."""
        from duke_ray.stages.textstats import int_quantiles, token_stats

        return int_quantiles(token_stats(_extracted(sf)), "n_tokens")

    q["token_quantiles"] = token_quantiles

    def lang_token_quantiles(sf):
        """Per-language PERCENTILE_DISC of per-doc token counts — the
        grouped exact-quantile op with DISTRIBUTED selection (two
        metadata-sized exchanges, no driver loop)."""
        from duke_ray.stages.textstats import grouped_int_quantiles

        docs = read_table(sf, "documents", columns=["lang", "text"])

        def counts(b: pa.Table) -> pa.Table:
            n = pc.add(
                pc.count_substring(b["text"], " "), pa.scalar(1, pa.int32())
            ).cast(pa.int64())
            return pa.table({"lang": b["lang"], "n_tokens": n})

        return grouped_int_quantiles(
            docs.map_batches(counts, batch_format="pyarrow"),
            "lang",
            "n_tokens",
            (250, 500, 900),
        )

    q["lang_token_quantiles"] = lang_token_quantiles

    def event_value_quantiles(sf):
        """Quantiles over a CONTINUOUS column (events.value): quantize to
        milli-units once (half-up, the corpus-wide rule), then the exact
        distributed integer PERCENTILE_DISC — the unbounded-cardinality
        scale path for value quantiles (histogram cardinality is bounded
        by the value RANGE in millis, not the corpus)."""
        from duke_ray.stages.textstats import int_quantiles

        ev = read_table(sf, "events", columns=["value"])

        def to_milli(b: pa.Table) -> pa.Table:
            m = pc.cast(
                pc.round(
                    pc.multiply(b["value"], pa.scalar(1000.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            return pa.table({"milli": m})

        return int_quantiles(
            ev.map_batches(to_milli, batch_format="pyarrow"), "milli",
            ps_milli=(100, 500, 950, 999),
        )

    q["event_value_quantiles"] = event_value_quantiles

    def value_quantiles_sketch(sf):
        """Mergeable deterministic KLL quantile sketch over events.value —
        the UNBOUNDED-range continuous-quantile scale path (rows-only:
        the sketch is approximate by construction). In-query invariants:
        n equals the exact non-null row count, and every estimate's TRUE
        rank interval (one exact counting scan, stages/textstats.py:
        rank_bounds) is within the documented EPS_RANK of its requested
        quantile."""
        from duke_ray.functions.kll import EPS_RANK
        from duke_ray.stages.textstats import rank_bounds, sketch_quantiles

        ev = read_table(sf, "events", columns=["value"])
        qs = (10, 250, 500, 750, 900, 990)
        out = sketch_quantiles(ev, "value", qs_milli=qs)
        est = out["estimate"].to_numpy()
        lt, le, n = rank_bounds(ev, "value", est)
        _require(
            out["n"].to_pylist() == [n] * len(qs), "sketch n != exact row count"
        )
        for q_milli, lo, hi in zip(qs, lt, le):
            err = max(0.0, lo / n - q_milli / 1000.0, q_milli / 1000.0 - hi / n)
            _require(
                err <= EPS_RANK,
                f"sketch rank error {err:.4f} > {EPS_RANK} at q={q_milli}",
            )
        return out

    q["value_quantiles_sketch"] = value_quantiles_sketch

    def event_value_sketch(sf):
        """Per-group KLL quantiles over events.value grouped by
        event_type (stages/textstats.py:sketch_quantiles_by_group) —
        the grouped unbounded-range scale path (rows-only: approximate
        by construction). In-query invariants: per-group n equals the
        exact non-null count and every estimate's TRUE per-group rank
        interval (one exact counting scan) is within EPS_RANK."""
        from duke_ray.functions.kll import EPS_RANK
        from duke_ray.stages.textstats import (
            grouped_rank_bounds,
            sketch_quantiles_by_group,
        )

        ev = read_table(sf, "events", columns=["event_type", "value"])
        qs = (10, 500, 990)
        out = sketch_quantiles_by_group(
            ev, "event_type", "value", qs_milli=qs
        ).to_pandas()
        est = {
            g: sub.sort_values("q_milli")["estimate"].to_numpy()
            for g, sub in out.groupby("event_type")
        }
        rb = grouped_rank_bounds(ev, "event_type", "value", est)
        for g, (lt, le, n) in rb.items():
            _require(
                set(out[out["event_type"] == g]["n"]) == {n},
                f"sketch n != exact count for group {g}",
            )
            for q_milli, lo, hi in zip(qs, lt, le):
                err = max(0.0, lo / n - q_milli / 1000.0, q_milli / 1000.0 - hi / n)
                _require(
                    err <= EPS_RANK,
                    f"group {g} rank error {err:.4f} > {EPS_RANK} at q={q_milli}",
                )
        return out.sort_values(["event_type", "q_milli"]).reset_index(drop=True)

    q["event_value_sketch"] = event_value_sketch

    def doc_rollup(sf):
        """GROUP BY ROLLUP(lang, source): doc counts + token mass at all
        three levels from one corpus scan; rolled-up keys hold 'ALL'."""
        from duke_ray.pipelines.relational import rollup_counts

        docs = read_table(sf, "documents", columns=["lang", "source", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            n = pc.add(
                pc.count_substring(b["text"], " "), pa.scalar(1, pa.int32())
            ).cast(pa.int64())
            return pa.table({"lang": b["lang"], "source": b["source"], "n_tok": n})

        return rollup_counts(
            docs.map_batches(with_tokens, batch_format="pyarrow"),
            ["lang", "source"],
            {"n_tok": "n_tokens"},
        )

    q["doc_rollup"] = doc_rollup

    def doc_cube(sf):
        """GROUP BY CUBE(lang, source): counts + token mass at ALL four
        subsets — the rollup's sibling adds the source-only marginal,
        derived from the finest level's aggregate-sized output, never a
        second corpus scan (pipelines/relational.py:cube_counts)."""
        from duke_ray.pipelines.relational import cube_counts

        docs = read_table(sf, "documents", columns=["lang", "source", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            n = pc.add(
                pc.count_substring(b["text"], " "), pa.scalar(1, pa.int32())
            ).cast(pa.int64())
            return pa.table({"lang": b["lang"], "source": b["source"], "n_tok": n})

        return cube_counts(
            docs.map_batches(with_tokens, batch_format="pyarrow"),
            ["lang", "source"],
            {"n_tok": "n_tokens"},
        )

    q["doc_cube"] = doc_cube

    def bigram_frequencies(sf):
        from duke_ray.stages.textstats import bigram_frequencies as bf

        return bf(read_table(sf, "documents", columns=["doc_id", "text"]))

    q["bigram_frequencies"] = bigram_frequencies

    def doc_chunks(sf):
        """Fixed-window token chunking (chunk_size=40, overlap=8) — the
        document -> training-sample expansion op; pure per-batch
        map_batches, no shuffle."""
        from duke_ray.stages.chunk import chunk_tokens

        return chunk_tokens(
            read_table(sf, "documents", columns=["doc_id", "text"]),
            chunk_size=40,
            overlap=8,
        )

    q["doc_chunks"] = doc_chunks

    def pii_redact(sf):
        """RE2 scrub + per-doc redaction count (pattern picked to have
        real matches in the synthetic vocab: hash/key/spark stems)."""
        from duke_ray.stages.chunk import regex_redact

        return regex_redact(
            read_table(sf, "documents", columns=["doc_id", "text"]),
            pattern=r"\b(hash|key|spark)\w*\b",
        )

    q["pii_redact"] = pii_redact

    def doc_top_terms(sf):
        """Per-doc top-5 terms by tf, ties by term asc (keyword
        extraction); per-batch only — a doc is one row, no shuffle."""
        from duke_ray.stages.textstats import doc_top_terms as dtt

        return dtt(read_table(sf, "documents", columns=["doc_id", "text"]), k=5)

    q["doc_top_terms"] = doc_top_terms

    def repetition_stats(sf):
        """Gopher-style within-doc repetition signals (integer milli
        units); pure per-batch map, no shuffle."""
        from duke_ray.stages.textstats import repetition_stats as rs

        return rs(read_table(sf, "documents", columns=["doc_id", "text"]))

    q["repetition_stats"] = repetition_stats

    def inverted_index(sf):
        """Sharded inverted index: (term, doc-range bucket) -> df, tf and
        the sorted posting list; one term-keyed exchange of exact
        per-batch partials."""
        from duke_ray.stages.index import inverted_index as inv

        return inv(
            read_table(sf, "documents", columns=["doc_id", "text"]),
            bucket_span=1024,
        )

    q["inverted_index"] = inverted_index

    def index_update(sf):
        """Incremental index maintenance: index docs < 256, fold the rest
        in as a delta crawl (bucket_span=64 keeps the split range-aligned);
        the result must value-hash against the FULL-corpus rebuild oracle
        — incremental == batch, the update_kg_tables pattern."""
        from duke_ray.stages.index import inverted_index as inv
        from duke_ray.stages.index import update_inverted_index

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def half(lt: bool):
            def f(b: pa.Table) -> pa.Table:
                m = pc.less(b["doc_id"].cast(pa.int64()), pa.scalar(256, pa.int64()))
                return b.filter(m if lt else pc.invert(m))

            return f

        old_idx = inv(docs.map_batches(half(True), batch_format="pyarrow"), bucket_span=64)
        delta = docs.map_batches(half(False), batch_format="pyarrow")
        return update_inverted_index(old_idx, delta, bucket_span=64)

    q["index_update"] = index_update

    def lexical_topk(sf):
        """Integer TF-IDF top-20 retrieval for a fixed term bag: one
        corpus scan -> (term, doc, tf) partials; idf = n_docs // df in
        int64 so the distributed score hash-matches SQL exactly."""
        from duke_ray.sources import documents_row_count
        from duke_ray.stages.retrieval import lexical_topk as topk

        return topk(
            read_table(sf, "documents", columns=["doc_id", "text"]),
            query_terms=("dup", "scan", "batch"),
            k=20,
            n_docs=documents_row_count(sf),
        )

    q["lexical_topk"] = lexical_topk

    def duplicate_spans(sf):
        """Substring-level duplicate windows (w=8 tokens, stride 1)
        across the corpus — the Lee-et-al substring-dedup inventory.
        Shared boilerplate is planted on every doc_id % 5 == 0 document
        (the corpus vocab makes organic 8-gram collisions rare), exactly
        mirrored in the oracle."""
        from duke_ray.stages.spans import duplicate_spans as dup

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_boiler(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].cast(pa.int64())
            mask = ids.to_numpy(zero_copy_only=False) % 5 == 0
            boiler = pc.if_else(
                pa.array(mask),
                pa.scalar(" please subscribe to our newsletter for daily updates"),
                pa.scalar(""),
            )
            return pa.table(
                {
                    "doc_id": ids,
                    "text": pc.binary_join_element_wise(
                        b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray) else b["text"],
                        boiler,
                        "",
                    ),
                }
            )

        return dup(docs.map_batches(with_boiler, batch_format="pyarrow"), w=8)

    q["duplicate_spans"] = duplicate_spans

    def strip_boilerplate_docs(sf):
        """Substring-dedup REMOVAL transform (stages/spans.py:
        strip_boilerplate): same planted boilerplate as duplicate_spans
        (8-token suffix on doc_id % 5 == 0), tokens covered by any
        >=2-doc duplicated 8-window excised. Rows-only; in-query
        invariants: row count preserved; exact token conservation
        (kept + removed == input, aggregated distributed); every planted
        doc loses >= 8 tokens (its pure-boiler window is corpus-wide)."""
        from duke_ray.stages.spans import strip_boilerplate

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_boiler(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].cast(pa.int64())
            mask = ids.to_numpy(zero_copy_only=False) % 5 == 0
            boiler = pc.if_else(
                pa.array(mask),
                pa.scalar(" please subscribe to our newsletter for daily updates"),
                pa.scalar(""),
            )
            return pa.table(
                {
                    "doc_id": ids,
                    "text": pc.binary_join_element_wise(
                        b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray) else b["text"],
                        boiler,
                        "",
                    ),
                }
            )

        boiled = docs.map_batches(with_boiler, batch_format="pyarrow").materialize()
        out = strip_boilerplate(boiled, w=8).materialize()
        if out.count() != boiled.count():
            raise AssertionError("strip_boilerplate changed the row count")

        def out_stats(b: pa.Table) -> pa.Table:
            # n_kept is authoritative (an emptied doc's "" re-splits to one
            # empty token); additionally pin n_kept to the re-split length
            # for non-empty texts
            kept = b["n_kept"].to_numpy(zero_copy_only=False)
            rem = b["n_removed"].to_numpy(zero_copy_only=False)
            ids = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            split_len = pc.list_value_length(
                pc.split_pattern(b["text"], pattern=" ")
            ).to_numpy(zero_copy_only=False)
            nonempty = kept > 0
            if (split_len[nonempty] != kept[nonempty]).any():
                raise AssertionError("n_kept disagrees with the re-split length")
            empt = ~nonempty
            if (pc.not_equal(b["text"], pa.scalar("")).to_numpy(zero_copy_only=False)[empt]).any():
                raise AssertionError("a zero-kept doc has non-empty text")
            return pa.table(
                {
                    "kept": pa.array([int(kept.sum())], pa.int64()),
                    "removed": pa.array([int(rem.sum())], pa.int64()),
                    "planted_short": pa.array(
                        [int(((ids % 5 == 0) & (rem < 8)).sum())], pa.int64()
                    ),
                }
            )

        def in_stats(b: pa.Table) -> pa.Table:
            nt = pc.sum(pc.list_value_length(pc.split_pattern(b["text"], pattern=" ")))
            return pa.table({"toks": pa.array([nt.as_py() or 0], pa.int64())})

        a = out.map_batches(out_stats, batch_format="pyarrow").to_pandas()
        b = boiled.map_batches(in_stats, batch_format="pyarrow").to_pandas()
        if int(a["kept"].sum()) + int(a["removed"].sum()) != int(b["toks"].sum()):
            raise AssertionError("strip_boilerplate broke token conservation")
        if int(a["planted_short"].sum()):
            raise AssertionError("a planted boilerplate doc lost fewer than 8 tokens")
        return out.select_columns(["doc_id", "n_kept", "n_removed"])

    q["strip_boilerplate"] = strip_boilerplate_docs

    def url_dedup(sf):
        """Canonical-URL dedup: crawl variants of the same page (tracking
        params, fragments, upper-cased scheme/host) collapse onto one
        canonical form; min doc_id survives. Urls derive 1:1 from doc_id
        (doc_id // 2 pairs collide after canonicalization), mirrored in
        the oracle."""
        from duke_ray.stages.web import url_dedup as dedup

        docs = read_table(sf, "documents", columns=["doc_id"])

        def mk_urls(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            gid = ids // 2
            urls = [
                (
                    f"https://s{g % 7}.example.com/p/{g}"
                    if i % 2 == 0
                    else f"HTTPS://S{g % 7}.EXAMPLE.COM/p/{g}?utm_source=feed#frag"
                )
                for i, g in zip(ids, gid)
            ]
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "url": pa.array(urls, pa.string())}
            )

        return dedup(docs.map_batches(mk_urls, batch_format="pyarrow"))

    q["url_dedup"] = url_dedup

    def domain_stats(sf):
        """Per-host page + token rollup over the pages table (host parsed
        from the url column; oracle reconstructs the synthetic host from
        doc_id — synth.doc_url embeds doc_id % 101)."""
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.web import domain_stats as dstats
        from duke_ray.sources import read_pages

        return dstats(extract_text(read_pages(sf)))

    q["domain_stats"] = domain_stats

    def doc_rarity(sf):
        """Rare-token mass per doc in integer milli units — the exact-
        arithmetic unigram-LM quality-scoring analog (weights derived
        from the corpus itself)."""
        from duke_ray.stages.retrieval import doc_rarity as rar

        return rar(read_table(sf, "documents", columns=["doc_id", "text"]))

    q["doc_rarity"] = doc_rarity

    def cooccurrence(sf):
        """Windowed term co-occurrence with integer lift scores — the
        word2vec/GloVe context-pair statistic (one scan, kind-tagged
        partials through one exchange, two hash joins for unigrams)."""
        from duke_ray.stages.textstats import cooccurrence as cooc

        return cooc(read_table(sf, "documents", columns=["doc_id", "text"]))

    q["cooccurrence"] = cooccurrence

    def sort_manifest(sf):
        """Range-partition manifest of a global ORDER BY n_tokens:
        exact percentile boundaries from a metadata-sized histogram
        exchange, one assignment scan, per-part min/max/count — the
        distributed-sort layout as an oracle-checkable artifact."""
        from duke_ray.stages.sortexport import sort_manifest as sm

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            toks = pa.compute.split_pattern(
                pa.compute.fill_null(b["text"], ""), pattern=" "
            )
            return pa.table(
                {
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "n_tokens": pa.compute.list_value_length(toks).cast(pa.int64()),
                }
            )

        return sm(
            docs.map_batches(with_tokens, batch_format="pyarrow"),
            col="n_tokens",
            n_parts=8,
        )

    q["sort_manifest"] = sort_manifest

    def shuffle_manifest(sf):
        """Partition manifest of the deterministic training-export
        shuffle (md5-key range partitioning, stages/shuffle.py): per
        partition n_rows / min_key / max_key / sum_id. The permutation
        is a pure function of doc_id, so the manifest is bit-identical
        at any parallelism and SQL-checkable."""
        from duke_ray.stages.shuffle import shuffle_manifest as shm

        docs = read_table(sf, "documents", columns=["doc_id"])
        return shm(docs, n_parts=16)

    q["shuffle_manifest"] = shuffle_manifest

    def sample_exact_k(sf):
        """Exactly k=200 uniform docs: global smallest (md5, id) ranks
        via per-block partial top-k + one k-bounded merge
        (stages/sampling.py:global_hash_topk)."""
        from duke_ray.stages.sampling import global_hash_topk

        docs = read_table(sf, "documents", columns=["doc_id"])
        return global_hash_topk(docs, k=200)

    q["sample_exact_k"] = sample_exact_k

    def value_histogram(sf):
        """Fixed 25-bin histogram of events.value over [0, 500) on the
        integer milli grid (stages/textstats.py:value_histogram) — one
        map pass, bounded bin-keyed exchange."""
        from duke_ray.stages.textstats import value_histogram as vh

        ev = read_table(sf, "events", columns=["value"])
        return vh(ev, "value", lo_milli=0, hi_milli=500_000, n_bins=25)

    q["value_histogram"] = value_histogram

    def value_histogram_by_type(sf):
        """Per-event-type fixed-bin histograms in one pass (grouped
        variant of value_histogram)."""
        from duke_ray.stages.textstats import value_histogram as vh

        ev = read_table(sf, "events", columns=["event_type", "value"])
        return vh(
            ev, "value", lo_milli=0, hi_milli=500_000, n_bins=10,
            group_col="event_type",
        )

    q["value_histogram_by_type"] = value_histogram_by_type

    def pack_sequences(sf):
        """Per-sequence manifest of fixed 512-token training packing
        (stages/pack.py): docs in deterministic-shuffle order per hash
        bucket, seq = tokens_before // budget via ONE metadata-sized
        exchange. Exactly a SQL window cumsum."""
        from duke_ray.stages.pack import pack_manifest

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            toks = pa.compute.split_pattern(
                pa.compute.fill_null(b["text"], ""), pattern=" "
            )
            return pa.table(
                {
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "n_tokens": pa.compute.list_value_length(toks).cast(pa.int64()),
                }
            )

        return pack_manifest(
            docs.map_batches(with_tokens, batch_format="pyarrow"),
            budget=512,
            n_buckets=16,
        )

    q["pack_sequences"] = pack_sequences

    def pack_texts(sf):
        """Materialized packed training sequences: member docs joined in
        pack order (stages/pack.py:pack_export) — text crosses the one
        bucket exchange exactly once, as the output itself."""
        from duke_ray.stages.pack import pack_export

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            text = pa.compute.fill_null(b["text"], "")
            toks = pa.compute.split_pattern(text, pattern=" ")
            return pa.table(
                {
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "text": text,
                    "n_tokens": pa.compute.list_value_length(toks).cast(pa.int64()),
                }
            )

        return pack_export(
            docs.map_batches(with_tokens, batch_format="pyarrow"),
            budget=512,
            n_buckets=16,
        )

    q["pack_texts"] = pack_texts

    def graph_walks(sf):
        """Deterministic random walks (stages/walks.py) over the
        customer<->order bipartite graph: 2 walkers per node, 4 steps,
        hash-of-state edge choice — the DeepWalk-style walk-corpus
        generator, bit-identical at any width and exactly reproduced by
        a DuckDB recursive CTE."""
        from duke_ray.stages.walks import random_walks

        orders = read_table(sf, "orders", columns=["o_orderkey", "o_custkey"])
        OFF = 1_000_000_000

        def to_edges(b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].cast(pa.int64())
            ok = pa.compute.add(
                b["o_orderkey"].cast(pa.int64()), pa.scalar(OFF, pa.int64())
            )
            return pa.table(
                {
                    "src": pa.concat_arrays(
                        [ck.combine_chunks(), ok.combine_chunks()]
                    ),
                    "dst": pa.concat_arrays(
                        [ok.combine_chunks(), ck.combine_chunks()]
                    ),
                }
            )

        edges = orders.map_batches(to_edges, batch_format="pyarrow")
        return random_walks(edges, walk_len=4, n_reps=2)

    q["graph_walks"] = graph_walks

    def node_vectors(sf):
        """DeepWalk-by-composition node embeddings (rows-only: driver
        eigensolve): deterministic walks over the customer<->order graph
        -> walk sentences (stages/walks.py:walk_texts) -> the existing
        PPMI->PCA word-vector path, with node ids as the vocabulary.
        In-query invariants: every embedded token IS a node id of the
        graph, no vec_id collisions, PCA components orthonormal with
        descending eigenvalues, projection rows == 4 per embedded node."""
        from duke_ray.stages.walks import random_walks, walk_texts
        from duke_ray.stages.wordvec import ppmi_pca as pp

        orders = read_table(sf, "orders", columns=["o_orderkey", "o_custkey"])
        OFF = 1_000_000_000

        def to_edges(b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].cast(pa.int64())
            ok = pa.compute.add(
                b["o_orderkey"].cast(pa.int64()), pa.scalar(OFF, pa.int64())
            )
            return pa.table(
                {
                    "src": pa.concat_arrays([ck.combine_chunks(), ok.combine_chunks()]),
                    "dst": pa.concat_arrays([ok.combine_chunks(), ck.combine_chunks()]),
                }
            )

        edges = orders.map_batches(to_edges, batch_format="pyarrow")
        texts = walk_texts(random_walks(edges, walk_len=4, n_reps=2))
        proj, model = pp(
            texts, k=4, window=4, min_count=2, n_context=32, return_model=True
        )
        proj = proj.materialize()
        vecs = model["tokens"].to_pandas()
        _require(len(vecs), "no node vectors produced")
        _require(vecs["vec_id"].nunique() == len(vecs), "vec_id fnv collision")
        # tokens must parse as node ids (the astype raises otherwise) and
        # be positive: walk sentences contain nothing but graph nodes
        ids = vecs["token"].astype("int64")
        _require(bool((ids >= 0).all()), "non-node token in walk vocabulary")
        w, evals = model["components"], model["eigenvalues"]
        _require(
            bool(np.allclose(w.T @ w, np.eye(w.shape[1]), atol=1e-9)),
            "PCA components not orthonormal",
        )
        _require(
            bool(np.all(np.diff(evals) <= 1e-12)), "eigenvalues not descending"
        )
        _require(proj.count() == 4 * len(vecs), "projection rows != 4 per node")
        return proj

    q["node_vectors"] = node_vectors

    def gram_matrix(sf):
        """Exact integer Gram matrix of the embedding column (upper
        triangle) — the distributed covariance/PCA building block; each
        task ships one dim x dim int64 partial to a driver numpy
        combine (metadata-sized, the kmeans-partials pattern)."""
        from duke_ray.stages.embedagg import gram_matrix as gm

        return gm(read_table(sf, "embeddings", columns=["vec_id", "embedding"]))

    q["gram_matrix"] = gram_matrix

    def pca_project(sf):
        """Distributed PCA projection (rows-only: one float eigensolve
        on the driver makes it non-SQL-expressible). Invariants checked
        in-query: components orthonormal, eigenvalues descending, and
        per-component projected variance matches its eigenvalue."""
        from duke_ray.stages.embedagg import pca_project as pca

        ds, m = pca(
            read_table(sf, "embeddings", columns=["vec_id", "embedding"]),
            k=8,
            return_model=True,
        )
        ds = ds.materialize()
        w, evals = m["components"], m["eigenvalues"]
        _require(
            bool(np.allclose(w.T @ w, np.eye(w.shape[1]), atol=1e-9)),
            "PCA components not orthonormal",
        )
        _require(
            bool(np.all(np.diff(evals) <= 1e-12)), "eigenvalues not descending"
        )
        df = ds.to_pandas()
        var = (
            df.assign(c=df["coord_micro"] / 1e6)
            .groupby("comp")["c"]
            .apply(lambda s: float((s**2).sum() / max(1, len(s) - 1)))
        )
        _require(
            bool(np.allclose(var.to_numpy(), evals[var.index], rtol=1e-3, atol=1e-9)),
            "projected variance != eigenvalue",
        )
        return ds

    q["pca_project"] = pca_project

    def ppmi_pca(sf):
        """Count-based word embeddings end-to-end (rows-only: driver
        eigensolve): cooccurrence -> PPMI milli weighting -> distributed
        PCA. In-query invariants: (a) no vec_id hash collision (every
        token keeps its own vector row); (b) spot-check — sampled PPMI
        vector entries recompute exactly from the ORACLED cooccurrence
        pairs table; (c) PCA components orthonormal with descending
        eigenvalues; (d) every pair token got a projection row."""
        from duke_ray.stages.wordvec import _ppmi_milli, ppmi_pca as pp

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        proj, model = pp(
            docs, k=4, window=4, min_count=3, n_context=32, return_model=True
        )
        proj = proj.materialize()
        vecs = model["vectors"].to_pandas()
        _require(
            vecs["vec_id"].nunique() == len(vecs), "vec_id fnv collision"
        )
        w, evals = model["components"], model["eigenvalues"]
        _require(
            bool(np.allclose(w.T @ w, np.eye(w.shape[1]), atol=1e-9)),
            "PCA components not orthonormal",
        )
        _require(
            bool(np.all(np.diff(evals) <= 1e-12)), "eigenvalues not descending"
        )
        # spot-check vector entries against the oracled pairs table
        from duke_ray.stages.textstats import cooccurrence
        from duke_ray.stages.wordvec import context_vocab

        pairs_ds = cooccurrence(docs, window=4, min_count=3).materialize()
        pairs = pairs_ds.to_pandas()
        ctx = context_vocab(pairs_ds, n_context=32)
        dim = {t: i for i, t in enumerate(ctx)}
        vm = vecs.set_index("token")["embedding"]
        checked = 0
        for r in pairs.sort_values(["tok_a", "tok_b"]).head(25).itertuples():
            want = _ppmi_milli(np.array([r.lift_milli], np.int64))[0] / 1000.0
            if r.tok_b in dim:
                _require(
                    float(vm[r.tok_a][dim[r.tok_b]]) == want, "PPMI entry mismatch"
                )
                checked += 1
            if r.tok_a in dim:
                _require(
                    float(vm[r.tok_b][dim[r.tok_a]]) == want, "PPMI entry mismatch"
                )
                checked += 1
        _require(checked > 0, "spot-check vacuous: no pair hit the context vocab")
        n_tokens = len(set(pairs["tok_a"]) | set(pairs["tok_b"]))
        _require(
            proj.count() == n_tokens * 4, "projection rows != tokens * k"
        )
        return proj

    q["ppmi_pca"] = ppmi_pca

    def lm_predictability(sf):
        """Add-one-smoothed bigram-LM self-scoring (stages/lm.py): one
        salted attach exchange ships each bigram occurrence once; integer
        milli contributions make the distributed sum hash-match SQL."""
        from duke_ray.stages.lm import lm_score

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        return lm_score(docs)

    q["lm_predictability"] = lm_predictability

    def lm_predictability_heldout(sf):
        """Held-out variant: train on even doc_ids, score the odd ones —
        unseen bigrams/unigrams exercise the smoothing fallback."""
        import pyarrow.compute as _pc

        from duke_ray.stages.lm import lm_score

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        train = docs.map_batches(
            lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b["doc_id"], 1), 0)),
            batch_format="pyarrow",
        )
        probe = docs.map_batches(
            lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b["doc_id"], 1), 1)),
            batch_format="pyarrow",
        )
        return lm_score(probe, train=train)

    q["lm_predictability_heldout"] = lm_predictability_heldout

    def lm_surprisal_filter(sf):
        """Perplexity-style quality filter (rows-only: ln not
        SQL-hashable). In-query invariants: (a) per-doc surprisal
        recomputes exactly for a sample from the ORACLED count tables;
        (b) every kept doc is at or below the threshold and avg =
        floor(total / n); (c) every probe doc has a score row."""
        from collections import Counter

        from duke_ray.stages.lm import lm_score, perplexity_filter

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        thresh = 12_000_000
        kept = perplexity_filter(docs, max_avg_surprisal_micro=thresh).materialize()
        df = kept.to_pandas()
        _require(
            bool((df["avg_surprisal_micro"] <= thresh).all()), "kept doc over threshold"
        )
        _require(
            bool((df["surprisal_micro"] // df["n_bigrams"] == df["avg_surprisal_micro"]).all()),
            "avg != floor(total/n)",
        )
        # exact sample recomputation from first principles
        sample = read_table(sf, "documents", columns=["doc_id", "text"]).take(400)
        scores = {
            int(r["doc_id"]): (int(r["n_bigrams"]), int(r["surprisal_micro"]))
            for r in lm_score(docs, log_space=True).take_all()
        }
        uni, big = Counter(), Counter()
        texts = {}
        for r in read_table(sf, "documents", columns=["doc_id", "text"]).take_all():
            toks = (r["text"] or "").split(" ")
            texts[int(r["doc_id"])] = toks
            uni.update(toks)
            big.update(zip(toks, toks[1:]))
        V = len(uni)
        checked = 0
        for r in sample[:50]:
            did = int(r["doc_id"])
            toks = texts[did]
            n = max(0, len(toks) - 1)
            s = int(
                sum(
                    int(np.floor(-1_000_000.0 * np.log((big[(a, b)] + 1.0) / (uni[a] + float(V)))))
                    for a, b in zip(toks, toks[1:])
                )
            )
            _require(scores[did] == (n, s), f"surprisal mismatch doc {did}")
            checked += 1
        _require(checked >= 50, "spot-check vacuous")
        _require(len(scores) == len(texts), "a doc lost its score row")
        return kept

    q["lm_surprisal_filter"] = lm_surprisal_filter

    def events_profile(sf):
        """One-scan per-column table profile (stages/profile.py): exact
        count/null/min/max/sum stats per dtype class — ints raw, floats
        milli-quantized, timestamps epoch-us, strings bytewise+length."""
        from duke_ray.stages.profile import table_profile

        return table_profile(read_table(sf, "events"))

    q["events_profile"] = events_profile

    def bpe_tokenize(sf):
        """Distributed BPE tokenizer training + corpus encoding
        (stages/bpe.py; rows-only — iterative merge training is not
        SQL-expressible; the trainer is unit-tested against an
        independent scalar reference). In-query invariants: (a) a sample
        of per-doc encoded lengths recomputes exactly via the scalar
        greedy encoder on raw text; (b) per-doc bounds n_words <=
        n_bpe_tokens <= n_chars + n_words hold corpus-wide (empty-token
        words excluded from the lower bound); (c) every doc has a row;
        (d) the merges actually compress (total encoded symbols <
        character-level total)."""
        from duke_ray.stages.bpe import bpe_encode, bpe_train, encode_word

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        merges = bpe_train(docs, n_merges=24, n_meta=32, n_blocks=8)
        _require(len(merges) == 24, "training stopped early on this corpus")
        enc = bpe_encode(docs, merges).materialize()
        df = enc.to_pandas()
        docs_pd = {
            int(r["doc_id"]): r["text"]
            for r in read_table(sf, "documents", columns=["doc_id", "text"]).take_all()
        }
        _require(len(df) == len(docs_pd), "a doc lost its encoding row")
        _require(
            bool((df["n_bpe_tokens"] <= df["n_chars"] + df["n_words"]).all()),
            "encoding longer than character level",
        )
        char_total = int((df["n_chars"] + df["n_words"]).sum())
        _require(int(df["n_bpe_tokens"].sum()) < char_total, "merges compressed nothing")
        ranks = {m: i for i, m in enumerate(merges)}
        checked = 0
        by_id = df.set_index("doc_id")
        for did in sorted(docs_pd)[:60]:
            toks = (docs_pd[did] or "").split(" ")
            want = sum(len(encode_word(w, ranks)) if w else 0 for w in toks)
            _require(
                int(by_id.loc[did, "n_bpe_tokens"]) == want,
                f"encoded length mismatch doc {did}",
            )
            checked += 1
        _require(checked >= 60, "spot-check vacuous")
        return enc

    q["bpe_tokenize"] = bpe_tokenize

    def compression_stats(sf):
        """zlib compressibility quality signal (rows-only: no zlib in
        SQL). In-query invariants: one row per doc; ratios bounded; an
        exact spot-check of 3 docs against a driver-side zlib call."""
        import zlib

        import pyarrow.parquet as pq

        from duke_ray.stages.textstats import compression_stats as cs

        ds = cs(read_table(sf, "documents", columns=["doc_id", "text"])).materialize()
        df = ds.to_pandas()
        raw = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        _require(len(df) == raw.num_rows, "row count != doc count")
        _require(bool((df["comp_len"] > 0).all()), "non-positive comp_len")
        _require(
            bool((df["ratio_milli"] <= 1200).all()),
            "zlib expansion beyond overhead bound",
        )
        spot = raw.slice(0, 3).to_pydict()
        by_id = df.set_index("doc_id")
        for did, text in zip(spot["doc_id"], spot["text"]):
            want = len(zlib.compress((text or "").encode("utf-8"), 6))
            _require(
                int(by_id.loc[did, "comp_len"]) == want,
                f"comp_len mismatch for doc {did}",
            )
        return ds

    q["compression_stats"] = compression_stats

    def encode_docs(sf):
        """Tokenizer fit + transform: frequency-ranked top-1000 vocab
        (total order: count DESC, token ASC) broadcast once, documents
        encoded as comma-joined dense ids with OOV = -1."""
        from duke_ray.stages.chunk import build_vocab, encode_docs as enc

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        vocab = build_vocab(docs, vocab_size=1000)
        return enc(docs, vocab)

    q["encode_docs"] = encode_docs

    def adaptive_length_filter(sf):
        """Corpus-adaptive length filter: exact [p10, p90] token-count
        band from the distributed value histogram, broadcast into one
        filter pass (dynamic-threshold Gopher length filter)."""
        from duke_ray.pipelines.clean import adaptive_length_filter as alf

        return alf(read_table(sf, "documents", columns=["doc_id", "text"]))

    q["adaptive_length_filter"] = adaptive_length_filter

    def weighted_sample(sf):
        """Importance sampling: keep each doc with probability
        min(1, n_tokens/1000) via the deterministic md5 rule —
        token-mass-preserving mixture thinning."""
        from duke_ray.stages.sampling import weighted_sample as ws

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def with_tokens(b: pa.Table) -> pa.Table:
            toks = pa.compute.split_pattern(
                pa.compute.fill_null(b["text"], ""), pattern=" "
            )
            return pa.table(
                {
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "n_tokens": pa.compute.list_value_length(toks).cast(pa.int64()),
                }
            )

        return ws(
            docs.map_batches(with_tokens, batch_format="pyarrow"),
            weight_col="n_tokens",
            full_weight=1000,
        )

    q["weighted_sample"] = weighted_sample

    def blocklist_filter(sf):
        """Domain-blocklist anti-join over the pages table: blocklist
        broadcast into the batch closure (small-side pattern, no
        shuffle); survivors keyed back to doc_id for the oracle."""
        from duke_ray.stages.web import filter_blocklist
        from duke_ray.sources import read_pages
        from duke_ray.synth import doc_id_from_url_arrow

        kept = filter_blocklist(
            read_pages(sf),
            blocked_hosts=("site0.example", "site13.example", "site50.example"),
        )

        def key_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": doc_id_from_url_arrow(b["url"]),
                    "domain": b["domain"],
                }
            )

        return kept.map_batches(key_rows, batch_format="pyarrow")

    q["blocklist_filter"] = blocklist_filter

    def contamination(sf):
        """Decontamination: flag docs containing any probe n-gram (probes
        = first trigram of every 50th doc, broadcast via ray.put; corpus
        streams through one vectorized match_substring pass per probe)."""
        from duke_ray.stages.contamination import (
            contamination_flags,
            leading_ngram_probes,
        )

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        probes = leading_ngram_probes(docs, n=3, every=50)
        return contamination_flags(docs, probes)

    q["contamination"] = contamination

    def contamination_semijoin(sf):
        """SAME semantics/oracle as `contamination`, via the 1e6+-probe
        scale path: window-hash semi-join + candidate-only exact verify
        (no O(P) broadcast scans). Shares the `contamination` SQL — the
        two paths must hash-match each other through it."""
        from duke_ray.stages.contamination import (
            contamination_flags_semijoin,
            leading_ngram_probes,
        )

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        probes = leading_ngram_probes(docs, n=3, every=50)
        return contamination_flags_semijoin(docs, probes)

    q["contamination_semijoin"] = contamination_semijoin

    def contamination_fuzzy(sf):
        """Fuzzy decontamination (LSH + exact Jaccard — not SQL-
        expressible; rows-only with in-query invariants). Eval set =
        every 20th doc with its first 3 tokens dropped, id += 10M (the
        planted ground truth: each eval doc should flag its source doc).
        Invariants: flagged ids are train ids; every match points into
        the eval set with jaccard in [threshold, 1]; >=90% of planted
        sources recovered WITH the right matched_eval_id (measured ~99%
        at sf0.01 — only very short docs fall under 0.6)."""
        from duke_ray.stages.contamination import fuzzy_contamination_flags

        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def variants(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            b = batch.filter(pa.array(ids % 20 == 0))
            toks = pc.split_pattern(b["text"], pattern=" ")
            return pa.table(
                {
                    "doc_id": pc.add(b["doc_id"].cast(pa.int64()), pa.scalar(10_000_000, pa.int64())),
                    "text": pc.binary_join(pc.list_slice(toks, 3), " "),
                }
            )

        eval_ds = docs.map_batches(variants, batch_format="pyarrow")
        ds = fuzzy_contamination_flags(docs, eval_ds, threshold=0.6).materialize()
        df = ds.to_pandas()
        _require(df["best_jaccard"].between(0.6, 1.0).all(), "best_jaccard outside [thr,1]")
        _require((df["doc_id"] < 10_000_000).all(), "flagged id not a train id")
        _require((df["matched_eval_id"] >= 10_000_000).all(), "match not an eval id")
        _require(((df["matched_eval_id"] - 10_000_000) % 20 == 0).all(), "match not in eval set")
        _require((df["n_matches"] >= 1).all(), "flagged row with no matches")
        from duke_ray.sources import documents_row_count

        n_planted = (documents_row_count(sf) + 19) // 20
        hit = int((df["matched_eval_id"] - df["doc_id"] == 10_000_000).sum())
        _require(hit / max(n_planted, 1) >= 0.9, f"planted recall {hit}/{n_planted} < 0.9")
        return ds

    q["contamination_fuzzy"] = contamination_fuzzy

    def mentions(sf):
        from duke_ray.stages.triples import extract_mentions
        from duke_ray.sources import read_pages
        from duke_ray.stages.extract import extract_text

        ds = extract_mentions(extract_text(read_pages(sf)))
        return _url_to_doc_id(ds, ["pos", "surface"])

    q["mentions"] = mentions

    def triples(sf):
        from duke_ray.stages.triples import extract_triples
        from duke_ray.sources import read_pages
        from duke_ray.stages.extract import extract_text

        ds = extract_triples(extract_text(read_pages(sf)))
        return _url_to_doc_id(ds, ["subj", "pred", "obj", "pred_pos"])

    q["triples"] = triples

    def canonical_triples(sf):
        from duke_ray.sources import read_pages
        from duke_ray.stages.canonicalize import canonicalize_triples
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.triples import extract_triples

        return canonicalize_triples(extract_triples(extract_text(read_pages(sf))), n_salt=16)

    q["canonical_triples"] = canonical_triples

    def canonical_triples_approx(sf):
        """HLL-sketched page counts (rows-only; approximate by design).
        Invariants: triple keys + exact occurrence counts match the exact
        canonicalization, and every HLL page estimate is within 10% (p=12
        => ~1.6% expected error)."""
        from duke_ray.sources import read_pages
        from duke_ray.stages.canonicalize import canonicalize_triples, canonicalize_triples_approx
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.triples import extract_triples

        approx = canonicalize_triples_approx(
            extract_triples(extract_text(read_pages(sf)))
        ).materialize()
        a = approx.to_pandas()
        e = canonicalize_triples(
            extract_triples(extract_text(read_pages(sf))), n_salt=16
        ).to_pandas()
        m = a.merge(e, on=["subj", "pred", "obj"], how="outer", indicator=True,
                    suffixes=("_a", "_e"))
        _require((m["_merge"] == "both").all(), "approx/exact triple key sets differ")
        _require((m["n_occurrences_a"] == m["n_occurrences_e"]).all(),
                 "occurrence counts must be exact in the approx variant")
        abs_err = (m["n_pages_est"] - m["n_pages"]).abs()
        rel_err = abs_err / m["n_pages"]
        # small counts are integer-granular (est 7 vs exact 6 is fine);
        # large counts must track the ~1.6% HLL error with headroom
        ok = (abs_err <= 2) | (rel_err <= 0.10)
        _require(bool(ok.all()),
                 f"HLL page estimate off by {float(rel_err[~ok].max()):.3f} (>10% and >2 pages)")
        return approx

    q["canonical_triples_approx"] = canonical_triples_approx

    def kg_edges(sf):
        from duke_ray.pipelines.kg import build_edges
        from duke_ray.sources import read_pages
        from duke_ray.stages.canonicalize import canonicalize_triples
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.triples import extract_triples

        canon = canonicalize_triples(extract_triples(extract_text(read_pages(sf))), n_salt=16)
        return build_edges(canon, default_assets())

    q["kg_edges"] = kg_edges

    def kg_nodes(sf):
        from duke_ray.pipelines.kg import build_nodes
        from duke_ray.sources import read_pages
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.link import link_mentions
        from duke_ray.stages.triples import extract_mentions

        linked = link_mentions(extract_mentions(extract_text(read_pages(sf))))
        nodes = build_nodes(linked, default_assets())
        return nodes.select_columns(["entity_id", "surface", "class", "n_mentions"])

    q["kg_nodes"] = kg_nodes

    def _kg_edges_ds(sf):
        from duke_ray.pipelines.kg import build_edges
        from duke_ray.sources import read_pages
        from duke_ray.stages.canonicalize import canonicalize_triples
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.triples import extract_triples

        canon = canonicalize_triples(extract_triples(extract_text(read_pages(sf))), n_salt=16)
        return build_edges(canon, default_assets())

    def kg_degrees(sf):
        """Per-entity degree profile over the KG edge table."""
        from duke_ray.stages.graph import entity_degrees

        return entity_degrees(_kg_edges_ds(sf))

    q["kg_degrees"] = kg_degrees

    def kg_components(sf):
        """Connected components over the entity graph (distributed
        min-label + pointer jumping, reused from dedup.cluster_pairs)."""
        from duke_ray.stages.graph import kg_components as comp

        return comp(_kg_edges_ds(sf))

    q["kg_components"] = kg_components

    def kg_pagerank(sf):
        """Fixed-point integer PageRank (5 iterations, damping 0.85,
        micro-rank units): floor-division arithmetic makes the distributed
        result bit-identical to the unrolled DuckDB oracle — a float
        PageRank could never survive the value-hash compare."""
        from duke_ray.stages.graph import pagerank

        return pagerank(_kg_edges_ds(sf), n_iter=5)

    q["kg_pagerank"] = kg_pagerank

    def kg_update_edges(sf):
        """Incremental KG maintenance: build the edge table from even-doc
        pages (the 'existing KG'), then from odd-doc pages (the 'delta
        crawl'), and merge count-wise — the oracle is the FULL-corpus edge
        SQL, so this value-checks incremental == batch."""
        from duke_ray.pipelines.kg import merge_edge_tables
        from duke_ray.pipelines.kg import build_edges
        from duke_ray.sources import read_pages
        from duke_ray.stages.canonicalize import canonicalize_triples
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.triples import extract_triples
        from duke_ray.synth import doc_id_from_url_arrow

        extracted = extract_text(read_pages(sf)).materialize()

        def half(parity):
            def f(b: pa.Table) -> pa.Table:
                ids = doc_id_from_url_arrow(b["url"])
                return b.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

            return f

        def edges_of(ds):
            return build_edges(
                canonicalize_triples(extract_triples(ds), n_salt=8), default_assets()
            )

        base = edges_of(extracted.map_batches(half(0), batch_format="pyarrow"))
        delta = edges_of(extracted.map_batches(half(1), batch_format="pyarrow"))
        return merge_edge_tables(base, delta)

    q["kg_update_edges"] = kg_update_edges

    def kg_reach(sf):
        """Directed BFS hop distances from seed entities (id % 5 == 0):
        integer hops are summation-order-free, so the distributed
        frontier expansion hash-matches the recursive-CTE oracle."""
        from duke_ray.stages.graph import kg_reach as reach

        return reach(_kg_edges_ds(sf), seed_mod=5, max_hops=4)

    q["kg_reach"] = kg_reach

    def kg_triangles(sf):
        """Per-entity triangle counts over the undirected simple entity
        graph (node-iterator with id orientation; wedges close via a C++
        hash join per partition)."""
        from duke_ray.stages.graph import triangle_counts

        return triangle_counts(_kg_edges_ds(sf))

    q["kg_triangles"] = kg_triangles

    def kg_kcore(sf):
        """3-round k=2 core peel (defined as the bounded iteration, so
        the unrolled SQL oracle hash-matches converged or not)."""
        from duke_ray.stages.graph import kcore

        return kcore(_kg_edges_ds(sf), k=2, rounds=3)

    q["kg_kcore"] = kg_kcore

    def entity_link(sf):
        """Linked mentions; the per-surface link decision is deterministic,
        so the oracle inlines the expected surface->entity map as VALUES
        (computed by the same top-k NN logic, single-process)."""
        from duke_ray.sources import read_pages
        from duke_ray.stages.extract import extract_text
        from duke_ray.stages.link import link_mentions
        from duke_ray.stages.triples import extract_mentions

        ds = link_mentions(extract_mentions(extract_text(read_pages(sf))))
        ds = _url_to_doc_id(ds, ["pos", "surface", "entity_id", "entity_class"])
        return ds.map_batches(
            lambda b: b.filter(pc.is_valid(b["entity_id"])), batch_format="pyarrow"
        )

    q["entity_link"] = entity_link

    # -- dedup family ------------------------------------------------------
    def exact_dedup(sf):
        from duke_ray.stages.dedup import exact_dedup as dd

        return dd(_extracted(sf))

    q["exact_dedup"] = exact_dedup

    def corpus_diff(sf):
        """Incremental-crawl anti-join: the full corpus as the 'new crawl'
        vs the doc_id % 4 != 0 subset as the 'previous snapshot' — only
        the 1-in-4 genuinely new texts survive. Hash-only shuffle."""
        from duke_ray.stages.dedup import anti_join_text

        docs = read_table(sf, "documents", columns=["doc_id", "text"])
        base = docs.map_batches(
            lambda b: b.filter(
                pc.not_equal(pc.bit_wise_and(b["doc_id"], pa.scalar(3)), 0)
            ),
            batch_format="pyarrow",
        )
        return anti_join_text(docs, base)

    q["corpus_diff"] = corpus_diff

    def embedding_coverage(sf):
        """Full-outer presence audit: documents vs a half-embedded corpus
        (even vec_ids only) — counts of keys in both / left_only /
        right_only via one key-hashed exchange (stages/dedup.py:
        key_reconcile). FULL OUTER JOIN oracle."""
        from duke_ray.stages.dedup import key_reconcile

        docs = read_table(sf, "documents", columns=["doc_id"])
        embs = read_table(sf, "embeddings", columns=["vec_id"]).map_batches(
            lambda b: b.filter(
                pc.equal(pc.bit_wise_and(b["vec_id"], pa.scalar(1)), 0)
            ),
            batch_format="pyarrow",
        )
        return key_reconcile(docs, embs, left_key="doc_id", right_key="vec_id")

    q["embedding_coverage"] = embedding_coverage

    def clean_corpus(sf):
        """Composed cleaning chain (lang filter + quality filter +
        exact-dedup survivor) — the pretraining-data path end to end.
        Input = documents plus EXACT copies (doc_id + 20M; dedup must keep
        the originals) plus truncated 5-token variants (doc_id + 30M;
        quality length gate must drop them)."""
        from duke_ray.pipelines.clean import clean_corpus as cc

        docs = _extracted(sf)

        def variants(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            toks = pc.split_pattern(batch["text"], pattern=" ")
            short = pc.binary_join(pc.list_slice(toks, 0, 5), pa.scalar(" "))
            return pa.table(
                {
                    "doc_id": pa.array(
                        np.concatenate([ids + 20_000_000, ids + 30_000_000]), pa.int64()
                    ),
                    "text": pa.concat_arrays(
                        [batch["text"].combine_chunks(), short.combine_chunks()]
                    ),
                }
            )

        corpus = docs.union(docs.map_batches(variants, batch_format="pyarrow"))
        return cc(corpus)

    q["clean_corpus"] = clean_corpus

    def prep_training_data(sf):
        """End-to-end training-data prep (pipelines/prep.py): lang+quality
        filter -> exact dedup -> survivor semi-join -> fixed-window token
        chunking -> deterministic md5 train/val split. Input = documents
        plus EXACT copies (doc_id + 20M) so the dedup leg has real work;
        output rows are (doc_id, chunk_idx, n_tokens, chunk_text, split)."""
        from duke_ray.pipelines.prep import prep_training_data as prep

        docs = _extracted(sf)

        def copies(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids + 20_000_000, pa.int64()),
                    "text": batch["text"].combine_chunks(),
                }
            )

        corpus = docs.union(docs.map_batches(copies, batch_format="pyarrow"))
        return prep(corpus, chunk_size=40, overlap=8, val_rate_256=64)

    q["prep_training_data"] = prep_training_data

    def hash_sample(sf):
        """Deterministic md5-keyed Bernoulli sample (rate 64/256 = 25%)."""
        from duke_ray.stages.sampling import hash_sample as hs

        return hs(_extracted(sf), rate_256=64).select_columns(["doc_id"])

    q["hash_sample"] = hash_sample

    def token_budget_head(sf):
        """Budget-bounded corpus head: docs in id order while the inclusive
        running token total stays <= 10k."""
        from duke_ray.stages.sampling import token_budget_head as tbh

        return tbh(_extracted(sf), budget=10_000)

    q["token_budget_head"] = token_budget_head

    def stratified_sample(sf):
        """Per-language quota of 20 docs by deterministic md5 rank."""
        from duke_ray.stages.sampling import stratified_hash_topk

        return stratified_hash_topk(_extracted(sf), k=20, group_col="lang")

    q["stratified_sample"] = stratified_sample

    def mixture_sample(sf):
        """Training-mixture quotas: 40 en / 10 de / 5 zh docs by
        deterministic md5 rank; es/fr dropped (not in the mixture)."""
        from duke_ray.stages.sampling import mixture_sample as mix

        return mix(_extracted(sf), {"en": 40, "de": 10, "zh": 5}, group_col="lang")

    q["mixture_sample"] = mixture_sample

    def _perturbed_corpus(sf):
        """documents plus deterministic near-duplicates: copy of each doc
        with its first 3 tokens dropped, doc_id += 10_000_000."""
        docs = read_table(sf, "documents", columns=["doc_id", "text"])

        def variants(batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern(batch["text"], pattern=" ")
            clipped = pc.binary_join(pc.list_slice(toks, 3), " ")
            return pa.table(
                {
                    "doc_id": pc.add(batch["doc_id"], pa.scalar(10_000_000, pa.int64())),
                    "text": clipped,
                }
            )

        return docs.union(docs.map_batches(variants, batch_format="pyarrow"))

    def _planted_fraction(df, a_col: str, b_col: str, sf: str) -> float:
        """Fraction of corpus docs whose planted variant (id + 10M) was
        recovered as a pair."""
        from duke_ray.sources import documents_row_count

        planted = int(((df[b_col] - df[a_col]) == 10_000_000).sum())
        return planted / max(documents_row_count(sf), 1)

    def near_dup_minhash(sf):
        """Invariants: est_jaccard in [0,1], a<b, and >=90% of the planted
        (doc, doc+10M) variants recovered (measured 99.4% at sf0.01; only
        very short docs legitimately fall under the 0.6 threshold)."""
        from duke_ray.stages.dedup import minhash_near_dup_pairs

        ds = minhash_near_dup_pairs(_perturbed_corpus(sf), threshold=0.6).materialize()
        df = ds.to_pandas()
        _require(df["est_jaccard"].between(0.0, 1.0).all(), "est_jaccard outside [0,1]")
        _require((df["doc_a"] < df["doc_b"]).all(), "pair not canonical (a<b)")
        frac = _planted_fraction(df, "doc_a", "doc_b", sf)
        _require(frac >= 0.9, f"planted-pair recall {frac:.3f} < 0.9")
        return ds

    q["near_dup_minhash"] = near_dup_minhash

    def near_dup_simhash(sf):
        """Invariants: hamming <= max, a<b, and >=40% planted recall
        (simhash at max_hamming=3 is deliberately the stricter/blunter
        sketch; measured 54.6% at sf0.01)."""
        from duke_ray.stages.dedup import simhash_near_dup_pairs

        ds = simhash_near_dup_pairs(_perturbed_corpus(sf), max_hamming=3).materialize()
        df = ds.to_pandas()
        _require(df["hamming"].between(0, 3).all(), "hamming outside [0, max_hamming]")
        _require((df["doc_a"] < df["doc_b"]).all(), "pair not canonical (a<b)")
        frac = _planted_fraction(df, "doc_a", "doc_b", sf)
        _require(frac >= 0.4, f"planted-pair recall {frac:.3f} < 0.4")
        return ds

    q["near_dup_simhash"] = near_dup_simhash

    def ngram_jaccard(sf):
        from duke_ray.stages.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(_perturbed_corpus(sf), threshold=0.6)

    q["ngram_jaccard"] = ngram_jaccard

    def dedup_clusters(sf):
        """Components over the EXACT-Jaccard pair set (not the MinHash
        estimate) so a DuckDB recursive-CTE oracle can value-check the
        clustering end to end (VERDICT r1 #3)."""
        from duke_ray.stages.dedup import cluster_pairs, ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(_perturbed_corpus(sf), threshold=0.6)
        return cluster_pairs(pairs)

    q["dedup_clusters"] = dedup_clusters

    def dedup_keep_best(sf):
        """Quality-aware canonical selection: per dedup cluster keep the
        highest-quality member (tie -> smallest doc_id) — the survivor
        rule real cleaning pipelines use instead of min-id. Composes
        exact-Jaccard clustering with the quality scorer; full
        recursive-CTE + row_number oracle."""
        from duke_ray.stages.dedup import (
            cluster_pairs,
            keep_best_in_cluster,
            ngram_jaccard_pairs,
        )
        from duke_ray.stages.textstats import quality_batch

        corpus = _perturbed_corpus(sf).materialize()  # feeds pairs AND scores
        clusters = cluster_pairs(ngram_jaccard_pairs(corpus, threshold=0.6))
        scores = corpus.map_batches(quality_batch, batch_format="pyarrow")
        return keep_best_in_cluster(clusters, scores)

    q["dedup_keep_best"] = dedup_keep_best

    def dedup_clusters_minhash(sf):
        """Same clustering over MinHash-estimated pairs (rows-only: the
        estimate is not SQL-expressible). Invariants: min-label property
        (cluster_id <= doc_id, and every cluster_id is itself a member
        doc), and >=90% of planted variants co-clustered with their
        original (measured 99.4% at sf0.01)."""
        from duke_ray.sources import documents_row_count
        from duke_ray.stages.dedup import cluster_pairs, minhash_near_dup_pairs

        pairs = minhash_near_dup_pairs(_perturbed_corpus(sf), threshold=0.6)
        ds = cluster_pairs(pairs).materialize()
        df = ds.to_pandas()
        _require((df["cluster_id"] <= df["doc_id"]).all(), "cluster_id > member doc_id")
        _require(set(df["cluster_id"]) <= set(df["doc_id"]),
                 "cluster label is not a member doc")
        lab = dict(zip(df["doc_id"], df["cluster_id"]))
        n_docs = documents_row_count(sf)
        co = sum(
            1
            for d, c in lab.items()
            if d < 10_000_000 and lab.get(d + 10_000_000) == c
        )
        _require(co >= 0.9 * n_docs, f"planted co-clustering {co}/{n_docs} < 0.9")
        return ds

    q["dedup_clusters_minhash"] = dedup_clusters_minhash

    def varied_dedup_pairs(sf):
        """Near-dup pairs over the VARIED endurance corpus (rows-only: the
        corpus is synthesized in-engine). ``read_documents_varied`` rewrites
        every 3rd token per (doc, replica) seed, so non-planted trigram
        Jaccard is EXACTLY 0 and the planted pair set is closed-form —
        invariants: precision vs planted == 1.0, recall >= 0.93 (97%+ of
        planted pairs sit above the 0.6 threshold; bench.py --endurance
        runs the same contract at 10M rows)."""
        import numpy as np

        from duke_ray.sources import documents_row_count, read_documents_varied
        from duke_ray.stages.dedup import ngram_jaccard_pairs
        from duke_ray.synth import is_planted_pair_arrow, planted_pair_ids

        n = documents_row_count(sf)
        replicas = 12  # planted pairs at r = 1 and 11
        ds = ngram_jaccard_pairs(
            read_documents_varied(sf, replicas), threshold=0.6
        ).materialize()
        df = ds.to_pandas()
        ok = np.asarray(is_planted_pair_arrow(df["doc_a"].values, df["doc_b"].values, n))
        _require(bool(ok.all()), "non-planted pair emitted (precision < 1.0)")
        planted = planted_pair_ids(n, replicas)
        _require(len(df) >= 0.93 * planted, f"planted recall {len(df)}/{planted} < 0.93")
        return ds

    q["varied_dedup_pairs"] = varied_dedup_pairs

    def dedup_clusters_embedding(sf):
        """Embedding-cosine near-dup clustering end to end: exact cosine
        pairs (distributed block-pair tiling) at threshold 0.4 over the
        embeddings table, components via distributed min-label
        propagation. Fully value-checked: the DuckDB oracle recomputes the
        pair set with list_cosine_similarity and the clustering with a
        recursive CTE."""
        from duke_ray.stages.dedup import cluster_pairs
        from duke_ray.stages.knn import cosine_pairs_exact as cpe

        vectors = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
        pairs = cpe(vectors, threshold=0.4).map_batches(
            lambda b: pa.table({"doc_a": b["vec_a"], "doc_b": b["vec_b"]}),
            batch_format="pyarrow",
        )
        return cluster_pairs(pairs).map_batches(
            lambda b: pa.table({"vec_id": b["doc_id"], "cluster_id": b["cluster_id"]}),
            batch_format="pyarrow",
        )

    q["dedup_clusters_embedding"] = dedup_clusters_embedding

    # -- similarity search -------------------------------------------------
    def knn_topk(sf):
        import pyarrow.parquet as pq

        from duke_ray.stages.knn import knn_topk as knn

        emb = pq.read_table(f"{sf}/embeddings.parquet")
        qmask = pc.less(emb["vec_id"], pa.scalar(5, pa.int64()))
        qtbl = emb.filter(qmask)
        queries_mat = np.asarray(qtbl["embedding"].to_pylist(), dtype=np.float64)
        qids = np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64)
        vectors = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
        return knn(vectors, queries_mat, qids, k=5)

    q["knn_topk"] = knn_topk

    def label_centroids(sf):
        """Per-label centroid component sums in exact integer micro-units
        (order-independent int64 sums — the k-means E-step, hash-
        comparable via the integer-PageRank template)."""
        from duke_ray.stages.embedagg import label_centroid_sums

        return label_centroid_sums(
            read_table(sf, "embeddings", columns=["label", "embedding"])
        )

    q["label_centroids"] = label_centroids

    def kmeans_clusters(sf):
        """Full integer Lloyd k-means (k=4, 3 iterations) over the
        embeddings table — distributed assignments are bit-identical to
        the unrolled DuckDB oracle (integer micro-unit quantization,
        exact int64 squared distances, trunc-div centroid updates)."""
        from duke_ray.stages.embedagg import kmeans_lloyd

        return kmeans_lloyd(
            read_table(sf, "embeddings", columns=["vec_id", "embedding"]),
            k=4,
            iters=3,
        )

    q["kmeans_clusters"] = kmeans_clusters

    def lsh_cosine_pairs(sf):
        """Embedding near-dup pairs over the corpus plus deterministic noisy
        copies (vec_id + 10M, vector + 0.1*Philox(vec_id) noise) — the driver
        embeddings are isotropic-random, so real near-dups must be planted."""
        from duke_ray.stages.knn import lsh_cosine_pairs as lsh

        vectors = read_table(sf, "embeddings", columns=["vec_id", "embedding"])

        def noisy(batch: pa.Table) -> pa.Table:
            from duke_ray.stages.knn import _matrix_to_fsl, _to_matrix

            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _to_matrix(batch["embedding"])
            out = np.empty_like(mat)
            for i, vid in enumerate(ids):
                # per-id Philox keeps the planted noise batch-independent
                gen = np.random.Generator(np.random.Philox(key=int(vid)))
                g = gen.standard_normal(mat.shape[1])
                # ~3% relative perturbation -> cosine ~0.9995 to the original
                out[i] = mat[i] + 0.03 * np.linalg.norm(mat[i]) * g / np.linalg.norm(g)
            return pa.table(
                {
                    "vec_id": pa.array(ids + 10_000_000, pa.int64()),
                    "embedding": _matrix_to_fsl(out),
                }
            )

        def to_f64(batch: pa.Table) -> pa.Table:
            from duke_ray.stages.knn import _matrix_to_fsl, _to_matrix

            return pa.table(
                {
                    "vec_id": batch["vec_id"].cast(pa.int64()),
                    "embedding": _matrix_to_fsl(_to_matrix(batch["embedding"])),
                }
            )

        corpus = vectors.map_batches(to_f64, batch_format="pyarrow").union(
            vectors.map_batches(noisy, batch_format="pyarrow")
        )
        ds = lsh(corpus, threshold=0.9).materialize()
        # invariants: cosine within [threshold, 1], canonical pair order,
        # and >=75% of the planted (id, id+10M) near-dups recovered
        # (hyperplane-LSH recall is probabilistic; measured 90.2% at sf0.01)
        df = ds.to_pandas()
        _require(df["cosine"].between(0.9, 1.0 + 1e-9).all(), "cosine outside [threshold, 1]")
        _require((df["vec_a"] < df["vec_b"]).all(), "pair not canonical (a<b)")
        planted = int(((df["vec_b"] - df["vec_a"]) == 10_000_000).sum())
        n_vec = vectors.count()
        _require(planted >= 0.75 * n_vec,
                 f"planted-pair recall {planted}/{n_vec} < 0.75")
        return ds

    q["lsh_cosine_pairs"] = lsh_cosine_pairs

    def cosine_pairs_exact(sf):
        """Brute-force exact cosine pairs (the similarity-search baseline);
        ids-only output is value-checked against DuckDB
        list_cosine_similarity."""
        from duke_ray.stages.knn import cosine_pairs_exact as cpe

        vectors = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
        return cpe(vectors, threshold=0.3)

    q["cosine_pairs_exact"] = cosine_pairs_exact

    def ivf_topk(sf):
        """IVF approximate top-k (rows-only). Invariant: recall vs the
        exact brute-force top-k computed in the same query is >= 0.8."""
        import pyarrow.parquet as pq

        from duke_ray.stages.knn import ivf_topk as ivf
        from duke_ray.stages.knn import knn_topk as knn_exact

        emb = pq.read_table(f"{sf}/embeddings.parquet")
        qmask = pc.less(emb["vec_id"], pa.scalar(5, pa.int64()))
        qtbl = emb.filter(qmask)
        queries_mat = np.asarray(qtbl["embedding"].to_pylist(), dtype=np.float64)
        qids = np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64)
        vectors = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
        ds = ivf(vectors, queries_mat, qids, k=5, n_centroids=16, nprobe=10).materialize()
        got = ds.to_pandas()
        exact = knn_exact(vectors, queries_mat, qids, k=5).to_pandas()
        g = got.groupby("query_id")["neighbor_id"].apply(set)
        e = exact.groupby("query_id")["neighbor_id"].apply(set)
        hits = sum(len(g.get(qid, set()) & e[qid]) for qid in e.index)
        total = int(sum(len(v) for v in e))
        _require(hits >= 0.8 * total, f"IVF recall {hits}/{total} < 0.8")
        return ds

    q["ivf_topk"] = ivf_topk

    # -- text analysis -----------------------------------------------------
    def lang_id(sf):
        from duke_ray.stages.textstats import lang_id as li

        return li(_extracted(sf))

    q["lang_id"] = lang_id

    def quality_scores(sf):
        from duke_ray.stages.textstats import quality_scores as qs

        return qs(_extracted(sf))

    q["quality_scores"] = quality_scores

    def bpe_token_counts(sf):
        from duke_ray.stages.textstats import bpe_token_counts as bc

        return bc(_extracted(sf))

    q["bpe_token_counts"] = bpe_token_counts

    def fingerprints_md5(sf):
        """Per-doc md5 content fingerprints (hashlib over Arrow buffers in
        one map pass) — the exact-dup / sampling / split key primitive."""
        from duke_ray.stages.textstats import fingerprints

        return fingerprints(_extracted(sf)).select_columns(["doc_id", "md5"])

    q["fingerprints_md5"] = fingerprints_md5

    def winnow(sf):
        from duke_ray.sources import documents_row_count
        from duke_ray.stages.textstats import winnow_fingerprints

        ds = winnow_fingerprints(_extracted(sf)).materialize()
        # invariants: every doc emits >=1 fingerprint (empty text hashes the
        # whole row) and (doc, fingerprint) rows are distinct
        df = ds.to_pandas()
        n_docs = documents_row_count(sf)
        _require(df["doc_id"].nunique() == n_docs,
                 f"{df['doc_id'].nunique()} fingerprinted docs != {n_docs} corpus docs")
        _require(not df.duplicated(["doc_id", "fingerprint"]).any(),
                 "duplicate (doc, fingerprint) rows")
        return ds

    q["winnow_fingerprints"] = winnow

    # -- summarization (the reference's product; NumPy-oracle unit tests) --
    def summarize_topn(sf):
        import pandas as pd

        import ray.data

        from duke_ray.pipelines.summarize import summarize_dataset

        ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text", "lang", "source"])
        res = summarize_dataset(ds)
        words, scores = res.top_n_words(10)
        # invariants: full top-10, known ontology classes, strictly ordered
        _require(len(words) == 10, f"top-n returned {len(words)} != 10")
        _require(all(w in res.classes for w in words), "top word outside ontology")
        vals = [float(s) for s in scores]
        _require(all(a >= b for a, b in zip(vals, vals[1:])), "scores not descending")
        _require(all(np.isfinite(vals)), "non-finite score")
        return pd.DataFrame({"rank": np.arange(1, len(words) + 1, dtype=np.int64), "class": words})

    q["summarize_topn"] = summarize_topn

    # -- relational coverage ----------------------------------------------
    q["pricing_summary"] = rel.pricing_summary
    q["order_revenue_join"] = rel.order_revenue_join
    q["top_orders_per_customer"] = rel.top_orders_per_customer
    q["promo_revenue"] = rel.promo_revenue
    q["regional_revenue"] = rel.regional_revenue
    q["customer_order_profile"] = rel.customer_order_profile
    q["user_running_values"] = rel.user_running_values
    q["clicks_asof_purchases"] = rel.clicks_asof_purchases
    q["top_customers"] = rel.top_customers_by_revenue
    q["customers_per_region"] = rel.customers_per_region
    q["filtered_parts"] = rel.filtered_parts
    q["events_tumbling"] = rel.events_tumbling_hourly
    q["events_sliding"] = rel.events_sliding_hourly
    q["follow_window"] = rel.follow_window
    q["shipping_priority"] = rel.shipping_priority
    q["large_volume_customers"] = rel.large_volume_customers
    q["customer_distribution"] = rel.customer_distribution
    q["part_revenue_share"] = rel.part_revenue_share
    q["inactive_customers"] = rel.inactive_customers
    q["priority_semijoin"] = rel.priority_semijoin
    q["events_pivot"] = rel.events_pivot
    q["brand_supplier_counts"] = rel.brand_supplier_counts
    q["event_gaps"] = rel.event_gaps
    q["top_event_type_per_user"] = rel.top_event_type_per_user
    q["events_debounce"] = rel.events_debounce
    q["cumulative_users"] = rel.cumulative_users
    q["cohort_retention"] = rel.cohort_retention
    q["props_rollup"] = rel.props_rollup
    q["order_share_of_customer"] = rel.order_share_of_customer
    q["funnel_counts"] = rel.funnel_counts
    q["small_quantity_revenue"] = rel.small_quantity_revenue
    q["cheapest_supplier_per_part"] = rel.cheapest_supplier_per_part
    q["forecast_revenue"] = rel.forecast_revenue
    q["returned_item_report"] = rel.returned_item_report
    q["user_event_spans"] = rel.user_event_spans
    q["distinct_segments"] = rel.distinct_segments
    q["user_sessions"] = rel.user_sessions

    def first_event_per_user(sf):
        """Keep-first dedup over an event stream: each user's earliest
        event (ts, then event_id) via the generic group_topk selection —
        ascending order, k=1. SQL ROW_NUMBER oracle."""
        from duke_ray.stages.ranking import group_topk

        ev = read_table(sf, "events", columns=["event_id", "user_id", "ts"])

        def to_us(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": b["user_id"].cast(pa.int64()),
                    "event_id": b["event_id"].cast(pa.int64()),
                    "ts_us": b["ts"].cast(pa.int64()),
                }
            )

        ds = ev.map_batches(to_us, batch_format="pyarrow", batch_size=65536)
        out = group_topk(ds, "user_id", "ts_us", k=1, tie_col="event_id", descending=False)
        return out.drop_columns(["rk"])

    q["first_event_per_user"] = first_event_per_user

    def approx_distinct_users(sf):
        """HLL sketch-per-key distinct users per event type (approximate —
        not SQL-value-comparable; rows-only). In-query invariant: every
        estimate within 5% of the EXACT distinct count (computed via the
        exact two-level distinct exchange on the same input; p=12 gives
        ~1.6% sd and these groups sit in the near-exact linear-counting
        regime)."""
        from duke_ray.stages.distinct import approx_distinct_by_group
        from duke_ray.state.exchange import grouped_sum, partitioned_reduce

        ev = read_table(sf, "events", columns=["event_type", "user_id"])
        est = approx_distinct_by_group(ev, "event_type", "user_id", p=12).materialize()

        # exact reference: distinct (type, user) pairs, then count per type
        def pair_dedup(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "user_id"]).aggregate([])
            return pa.table(
                {
                    "event_type": g["event_type"],
                    "one": pa.array(np.ones(g.num_rows, np.int64), pa.int64()),
                }
            )

        pairs = partitioned_reduce(
            ev.map_batches(
                lambda b: b.group_by(["event_type", "user_id"]).aggregate([]),
                batch_format="pyarrow",
                batch_size=65536,
            ),
            ["event_type", "user_id"],
            lambda t: pair_dedup(t),
        )
        exact = {
            r["event_type"]: r["n"]
            for r in grouped_sum(pairs, "event_type", {"one": "n"}).take_all()
        }
        df = est.to_pandas()
        _require(len(df) == len(exact), "estimate group set != exact group set")
        for _, row in df.iterrows():
            e, g = exact[row["event_type"]], row["n_distinct_est"]
            _require(abs(g - e) / max(e, 1) <= 0.05, f"HLL est {g} vs exact {e} off >5%")
        return est

    q["approx_distinct_users"] = approx_distinct_users

    # -- multimodal: media columns wired to the documents input table ------
    def media_features(sf):
        """Decode-features actor pool over the documents-derived media
        table; the byte stats and payload digest are value-checked against
        a DuckDB oracle over documents."""
        from duke_ray.stages.multimodal import decode_features, media_from_documents

        return decode_features(media_from_documents(sf), backend="fake").select_columns(
            ["media_id", "mime", "n_bytes", "payload_md5"]
        )

    q["media_features"] = media_features

    def media_frames(sf):
        """Frame-sampling actor pool (video path shape) over the same media
        table; (media_id, frame_no) is SQL-expressible."""
        from duke_ray.stages.multimodal import media_from_documents, sample_frames

        return sample_frames(media_from_documents(sf), every_n=10).select_columns(
            ["media_id", "frame_no"]
        )

    q["media_frames"] = media_frames

    def media_features_synth(sf):
        """Original synthetic-payload variant (rows-only; exercises varying
        binary payload sizes independent of the corpus)."""
        import ray.data

        from duke_ray.stages.multimodal import decode_features, synth_media_table

        media = synth_media_table(n=64)
        ds = (
            decode_features(ray.data.from_arrow(media), backend="fake")
            .select_columns(["media_id", "mime", "n_bytes"])
            .materialize()
        )
        # invariants: one row per media item, n_bytes equals the actual
        # payload length, mime passed through
        df = ds.to_pandas().set_index("media_id").sort_index()
        _require(len(df) == media.num_rows, "row count != media items")
        want_bytes = {
            mid: len(p) for mid, p in zip(media["media_id"].to_pylist(), media["payload"].to_pylist())
        }
        _require(
            all(int(df.loc[m, "n_bytes"]) == n for m, n in want_bytes.items()),
            "n_bytes != payload length",
        )
        return ds

    q["media_features_synth"] = media_features_synth

    def media_real_features(sf):
        """REAL codec backend (rows-only: pixel/sample decode is not
        SQL-expressible): encode every doc into actual PNG / WAV /
        concatenated-PNG bytes (stdlib codecs, functions/codecs.py),
        decode them back distributed, and summarize. In-query invariants:
        (a) one row per document, all four modalities present; (b) for a
        sample of rows per modality, the decoded mean recomputes EXACTLY
        from the pre-codec closed-form byte rule (proves the round trip,
        not just the plumbing); (c) dims/rate/frame-count match the synth
        rule."""
        from duke_ray.stages.multimodal import (
            decode_features,
            real_media_bytes,
            real_media_dims,
            real_media_from_documents,
        )

        media = real_media_from_documents(sf)
        feats = decode_features(media, backend="real")

        def summarize(b):
            f = np.stack([np.asarray(x, np.float64) for x in b["features"].to_pylist()]) \
                if b.num_rows else np.empty((0, 16))
            return pa.table(
                {
                    "media_id": b["media_id"],
                    "mime": b["mime"],
                    "n_bytes": b["n_bytes"],
                    "mean_milli": pa.array(
                        np.floor(f[:, 3] * 1000 + 0.5).astype(np.int64)
                        if b.num_rows else np.array([], np.int64),
                        pa.int64(),
                    ),
                }
            )

        ds = feats.map_batches(summarize, batch_format="pyarrow").materialize()
        df = ds.to_pandas().set_index("media_id").sort_index()
        docs = read_table(sf, "documents", columns=["doc_id", "text"]).take_all()
        _require(len(df) == len(docs), "row count != documents")
        _require(df["mime"].nunique() == 4, "a modality went missing")
        checked = 0
        for d in docs[:120]:
            did, text = int(d["doc_id"]), d["text"]
            w, h = real_media_dims(did)
            kind = did % 4
            if kind == 0 or kind == 3:
                truth = real_media_bytes(text, w * h).astype(np.float64)
            elif kind == 1:
                truth = real_media_bytes(text, w * h * 3).astype(np.float64)
            else:
                n = did % 500 + 100
                truth = (real_media_bytes(text, n).astype(np.float64) - 128) * 256
            # the feature vector is stored float32; replicate that rounding
            want = int(np.floor(float(np.float32(truth.mean())) * 1000 + 0.5))
            _require(
                int(df.loc[did, "mean_milli"]) == want,
                f"decoded mean mismatch for doc {did}",
            )
            checked += 1
        _require(checked >= 100, "spot-check vacuous")
        return ds

    q["media_real_features"] = media_real_features

    return q


# --- oracle SQL -------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from duke_ray.assets import default_assets
    from duke_ray.stages.textstats import STOPWORDS
    from duke_ray.synth import in_vocab_word

    assets = default_assets()
    surfaces = _surfaces_sql_list()
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)

    # entity metadata as a VALUES relation (the gazetteer is a fixed,
    # code-defined constant — legitimately inlined into the oracle)
    ent_values = ", ".join(
        f"({eid}, '{s}', '{assets.entity_classes[eid]}')"
        for s, eid in assets.surface_to_entity.items()
    )
    linkable = ", ".join(
        f"'{s}'"
        for s in assets.entity_surfaces
        if all(in_vocab_word(w) for w in s.split(" "))
    )

    sql: dict[str, str] = {}

    sql["extract_text"] = "SELECT doc_id, text FROM documents"

    sql["token_counts"] = (
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents"
    )

    sql["token_percentile"] = """
SELECT doc_id, n_tokens,
       CAST(FLOOR(1000 * PERCENT_RANK() OVER (ORDER BY n_tokens)) AS BIGINT) AS pct_milli
FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
"""

    sql["token_stats"] = f"""
WITH {_TOKS_CTE}
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       ANY_VALUE(length(d.text)) AS n_chars,
       SUM(length(t.tok)) / GREATEST(COUNT(*), 1) AS avg_token_len,
       SUM(CASE WHEN t.tok IN ({stop_list}) THEN 1 ELSE 0 END) / GREATEST(COUNT(*), 1) AS stopword_ratio
FROM toks t JOIN documents d USING (doc_id)
GROUP BY t.doc_id
"""

    # chunking spec pinned in duke_ray/stages/chunk.py: starts 0, 32, 64, ...
    # while start < n_tokens; list_slice is 1-based inclusive and truncates.
    sql["doc_chunks"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t,
        unnest(generate_series(0, CAST((len(t)-1)//32 AS BIGINT))) AS chunk_idx
        FROM toks)
SELECT doc_id, chunk_idx,
       CAST(least(len(t) - chunk_idx*32, 40) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, chunk_idx*32+1, chunk_idx*32+40), ' ') AS chunk_text
FROM idx
"""

    sql["pii_redact"] = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\b(hash|key|spark)\w*\b')) AS BIGINT) AS n_redactions,
       regexp_replace(text, '\b(hash|key|spark)\w*\b', '<RED>', 'g') AS clean_text
FROM documents
"""

    sql["doc_top_terms"] = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
cnt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
rk AS (SELECT doc_id, term, tf,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS BIGINT) AS rank
       FROM cnt)
SELECT doc_id, term, tf, rank FROM rk WHERE rank <= 5
"""

    sql["repetition_stats"] = """
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
base AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
  FROM flat GROUP BY doc_id
),
bg AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM flat
),
bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg WHERE b IS NOT NULL GROUP BY doc_id, b),
bgm AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_bigram_n FROM bgc GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens, b.n_distinct_tokens,
       b.n_tokens - 1 AS n_bigrams,
       COALESCE(m.max_bigram_n, 0) AS max_bigram_n,
       (b.n_tokens - b.n_distinct_tokens) * 1000 // b.n_tokens AS dup_token_milli,
       COALESCE(m.max_bigram_n, 0) * 1000 // GREATEST(b.n_tokens - 1, 1) AS top_bigram_milli
FROM base b LEFT JOIN bgm m USING (doc_id)
"""

    # integer TF-IDF: idf = n_docs // df (floor division), score =
    # SUM(tf * idf) in int64; ties broken by ascending doc_id.
    sql["lexical_topk"] = """
WITH flat AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tfs AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM flat
  WHERE term IN ('dup', 'scan', 'batch') GROUP BY 1, 2
),
dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfs GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
sc AS (
  SELECT t.doc_id, CAST(SUM(t.tf * (nn.n // d.df)) AS BIGINT) AS score
  FROM tfs t JOIN dfs d USING (term) CROSS JOIN nn GROUP BY t.doc_id
)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20
"""

    sql["inverted_index"] = """
WITH flat AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tfs AS (SELECT term, doc_id, COUNT(*) AS tf FROM flat GROUP BY term, doc_id)
SELECT term, CAST(doc_id // 1024 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS tf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tfs GROUP BY term, (doc_id // 1024)
"""

    # index_update must equal the FULL rebuild at its bucket span
    sql["index_update"] = sql["inverted_index"].replace("1024", "64")

    # host reconstructed from doc_id: synth.doc_url = 'site{id%101}.example'
    sql["duplicate_spans"] = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' please subscribe to our newsletter for daily updates'
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM aug),
wins AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks),
spans AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 7), ' ') AS span FROM wins)
SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
"""

    sql["lm_predictability"] = f"""
WITH {_TOKS_CTE},
uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vs FROM uni),
big AS (
  SELECT t1.doc_id, t1.tok AS ta, t2.tok AS tb
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
),
bc AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big GROUP BY ta, tb),
contrib AS (
  SELECT big.doc_id,
         (1000 * (bc.c_ab + 1)) // (u.c + (SELECT vs FROM v)) AS per
  FROM big JOIN bc ON big.ta = bc.ta AND big.tb = bc.tb
           JOIN uni u ON u.tok = big.ta
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(per) AS BIGINT) AS s
  FROM contrib GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(agg.s, 0) AS BIGINT) AS score_milli
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""

    sql["lm_predictability_heldout"] = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
  WHERE doc_id % 2 = 0 GROUP BY tok
),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vs FROM uni),
big AS (
  SELECT t1.doc_id, t1.tok AS ta, t2.tok AS tb
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.doc_id % 2 = 0
),
bc AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big GROUP BY ta, tb),
probe_big AS (
  SELECT t1.doc_id, t1.tok AS ta, t2.tok AS tb
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.doc_id % 2 = 1
),
contrib AS (
  SELECT p.doc_id,
         (1000 * (COALESCE(bc.c_ab, 0) + 1))
           // (COALESCE(u.c, 0) + (SELECT vs FROM v)) AS per
  FROM probe_big p
  LEFT JOIN bc ON p.ta = bc.ta AND p.tb = bc.tb
  LEFT JOIN uni u ON u.tok = p.ta
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(per) AS BIGINT) AS s
  FROM contrib GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(agg.s, 0) AS BIGINT) AS score_milli
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
WHERE d.doc_id % 2 = 1
"""

    sql["events_profile"] = """
SELECT 'event_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
  CAST(MIN(event_id) AS BIGINT) AS min_int,
  CAST(MAX(event_id) AS BIGINT) AS max_int,
  CAST(SUM(event_id) AS BIGINT) AS sum_int,
  '' AS min_str, '' AS max_str, CAST(0 AS BIGINT) AS total_len
FROM events
UNION ALL
SELECT 'ts', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(ts) AS BIGINT),
  CAST(epoch_us(MIN(ts)) AS BIGINT), CAST(epoch_us(MAX(ts)) AS BIGINT),
  CAST(0 AS BIGINT), '', '', CAST(0 AS BIGINT) FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
  CAST(MIN(user_id) AS BIGINT), CAST(MAX(user_id) AS BIGINT),
  CAST(SUM(user_id) AS BIGINT), '', '', CAST(0 AS BIGINT) FROM events
UNION ALL
SELECT 'event_type', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
  MIN(event_type), MAX(event_type),
  CAST(SUM(LENGTH(event_type)) AS BIGINT) FROM events
UNION ALL
SELECT 'value', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(value) AS BIGINT),
  CAST(MIN(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT),
  CAST(MAX(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT),
  CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT),
  '', '', CAST(0 AS BIGINT) FROM events
UNION ALL
SELECT 'props', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(props) AS BIGINT),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
  MIN(props), MAX(props), CAST(SUM(LENGTH(props)) AS BIGINT) FROM events
"""

    # url_dedup: replay the engine's RE2 canonicalization chain verbatim
    # (stages/web.py:canonical_url — shared-RE2 trick, like pii_redact)
    _u_scheme = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
    _u_host = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
    _u_tail = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"
    sql["url_dedup"] = f"""
WITH urls AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0
      THEN 'https://s' || CAST((doc_id // 2) % 7 AS VARCHAR) || '.example.com/p/'
           || CAST(doc_id // 2 AS VARCHAR)
      ELSE 'HTTPS://S' || CAST((doc_id // 2) % 7 AS VARCHAR) || '.EXAMPLE.COM/p/'
           || CAST(doc_id // 2 AS VARCHAR) || '?utm_source=feed#frag'
    END AS url
  FROM documents),
canon AS (
  SELECT doc_id,
    lower(regexp_extract(url, '{_u_scheme}', 1)) || '://' ||
    lower(regexp_extract(url, '{_u_host}', 1)) ||
    regexp_replace(regexp_replace(regexp_replace(
      regexp_extract(url, '{_u_tail}', 1),
      '([?&])utm_[^&#]*&', '\\1', 'g'), '([?&])utm_[^&#]*&', '\\1', 'g'),
      '[?&]utm_[^&#]*$', '', 'g') AS canonical_url
  FROM urls WHERE regexp_matches(url, '{_u_scheme}'))
SELECT canonical_url, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM canon GROUP BY canonical_url
"""

    sql["domain_stats"] = """
SELECT 'site' || CAST(doc_id % 101 AS VARCHAR) || '.example' AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents GROUP BY domain
"""

    sql["blocklist_filter"] = """
SELECT doc_id, 'site' || CAST(doc_id % 101 AS VARCHAR) || '.example' AS domain
FROM documents WHERE doc_id % 101 NOT IN (0, 13, 50)
"""

    sql["event_value_quantiles"] = (
        "WITH ms AS (SELECT CAST(ROUND(value * 1000) AS BIGINT) AS n_tokens"
        " FROM events)\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST({p} AS BIGINT) AS p_milli, "
            f"CAST(PERCENTILE_DISC({p / 1000.0}) WITHIN GROUP (ORDER BY n_tokens)"
            f" AS BIGINT) AS value FROM ms"
            for p in (100, 500, 950, 999)
        )
    )

    sql["doc_rollup"] = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents GROUP BY ROLLUP(lang, source)
"""

    sql["doc_cube"] = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents GROUP BY CUBE(lang, source)
"""

    sql["contamination"] = """
WITH probes AS (
  SELECT DISTINCT array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS ngram
  FROM documents WHERE doc_id % 50 = 0
)
SELECT d.doc_id,
       CAST(SUM(CASE WHEN contains(' ' || d.text || ' ', ' ' || p.ngram || ' ') THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       SUM(CASE WHEN contains(' ' || d.text || ' ', ' ' || p.ngram || ' ') THEN 1 ELSE 0 END) > 0 AS contaminated
FROM documents d CROSS JOIN probes p
GROUP BY d.doc_id
"""

    # the semi-join scale path must reproduce the broadcast path exactly
    sql["contamination_semijoin"] = sql["contamination"]

    sql["term_frequencies"] = f"""
WITH {_TOKS_CTE}
SELECT tok AS token, COUNT(*) AS n FROM toks GROUP BY tok
"""

    sql["doc_rarity"] = f"""
WITH {_TOKS_CTE},
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt)
SELECT t.doc_id,
       CAST(SUM((tot.total * 1000) // c.n) AS BIGINT) AS rarity_milli
FROM toks t JOIN cnt c ON t.tok = c.tok CROSS JOIN tot
GROUP BY t.doc_id
"""

    sql["cooccurrence"] = f"""
WITH {_TOKS_CTE},
pairs AS (
  SELECT CASE WHEN t1.tok < t2.tok THEN t1.tok ELSE t2.tok END AS tok_a,
         CASE WHEN t1.tok < t2.tok THEN t2.tok ELSE t1.tok END AS tok_b
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id AND t2.pos > t1.pos AND t2.pos <= t1.pos + 4
   AND t1.tok <> t2.tok
),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt),
pr AS (SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_ab
       FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT p.tok_a, p.tok_b, p.n_ab, ca.n AS n_a, cb.n AS n_b,
       CAST((p.n_ab * tot.total * 1000) // (ca.n * cb.n) AS BIGINT) AS lift_milli
FROM pr p JOIN cnt ca ON p.tok_a = ca.tok JOIN cnt cb ON p.tok_b = cb.tok
CROSS JOIN tot
"""

    _sm_bounds = "\nUNION ALL\n".join(
        f"SELECT CAST(PERCENTILE_DISC({i / 8.0}) WITHIN GROUP (ORDER BY val)"
        " AS BIGINT) AS bv FROM v"
        for i in range(1, 8)
    )
    sql["sort_manifest"] = f"""
WITH v AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS val
  FROM documents
),
b AS ({_sm_bounds}),
p AS (
  SELECT doc_id, val,
         (SELECT COUNT(*) FROM b WHERE b.bv < v2.val) AS part
  FROM v v2
)
SELECT CAST(part AS BIGINT) AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(val) AS min_val, MAX(val) AS max_val,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM p GROUP BY part
"""

    sql["shuffle_manifest"] = """
WITH keyed AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey FROM documents
)
SELECT CAST(strpos('0123456789abcdef', substr(skey, 1, 1)) - 1 AS BIGINT) AS part,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(skey) AS min_key, MAX(skey) AS max_key,
       CAST(SUM(doc_id) AS BIGINT) AS sum_id
FROM keyed GROUP BY 1
"""

    sql["value_histogram"] = """
WITH v AS (
  SELECT CAST(ROUND(value * 1000) AS BIGINT) AS vm FROM events
)
SELECT (vm - 0) * 25 // 500000 AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vm) AS BIGINT) AS sum_milli
FROM v WHERE vm >= 0 AND vm < 500000
GROUP BY 1
"""

    sql["value_histogram_by_type"] = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS vm FROM events
)
SELECT event_type, (vm - 0) * 10 // 500000 AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vm) AS BIGINT) AS sum_milli
FROM v WHERE vm >= 0 AND vm < 500000
GROUP BY 1, 2
"""

    sql["sample_exact_k"] = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS rank_hex
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
LIMIT 200
"""

    sql["pack_sequences"] = """
WITH keyed AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens, skey,
         CAST(strpos('0123456789abcdef', substr(skey, 1, 1)) - 1 AS BIGINT) AS bucket
  FROM keyed
),
c AS (
  SELECT doc_id, n_tokens, bucket,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY bucket ORDER BY skey, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM b
)
SELECT bucket, CAST(cum_before // 512 AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM c GROUP BY 1, 2
"""

    sql["pack_texts"] = """
WITH keyed AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
),
b AS (
  SELECT doc_id, text, n_tokens, skey,
         CAST(strpos('0123456789abcdef', substr(skey, 1, 1)) - 1 AS BIGINT) AS bucket
  FROM keyed
),
c AS (
  SELECT doc_id, text, n_tokens, bucket, skey,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY bucket ORDER BY skey, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM b
)
SELECT bucket, CAST(cum_before // 512 AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       STRING_AGG(text, ' ' ORDER BY skey, doc_id) AS seq_text
FROM c GROUP BY 1, 2
"""

    sql["graph_walks"] = """
WITH RECURSIVE e0 AS (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey + 1000000000 AS BIGINT) AS dst FROM orders
  UNION
  SELECT CAST(o_orderkey + 1000000000 AS BIGINT) AS src,
         CAST(o_custkey AS BIGINT) AS dst FROM orders
),
adj AS (
  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS pos
  FROM e0
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY src),
walk(walk_id, step, node) AS (
  SELECT src * 2 + r, CAST(0 AS BIGINT), src
  FROM (SELECT DISTINCT src FROM e0) CROSS JOIN (SELECT UNNEST([0, 1]) AS r)
  UNION ALL
  SELECT w.walk_id, w.step + 1, a.dst
  FROM walk w
  JOIN deg g ON g.src = w.node
  JOIN adj a ON a.src = w.node
   AND a.pos = ((w.walk_id * 1000003 + w.step * 7919 + w.node * 104729)
                % 2147483647) % g.d
  WHERE w.step < 4
)
SELECT walk_id, step, node FROM walk
"""

    sql["frequent_terms"] = f"""
WITH {_TOKS_CTE},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
cnt AS (SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok)
SELECT c.token, c.n FROM cnt c, tot WHERE c.n >= (tot.n * 2 + 999) // 1000
"""

    _pd = (
        "CAST(PERCENTILE_DISC({f}) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS value"
    )
    sql["token_quantiles"] = (
        f"WITH {_TOKS_CTE},\n"
        "ts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks GROUP BY doc_id)\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST({p} AS BIGINT) AS p_milli, "
            + _pd.format(f=p / 1000.0)
            + " FROM ts"
            for p in (250, 500, 750, 900, 990)
        )
    )

    sql["lang_token_quantiles"] = (
        "WITH ts AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT)"
        " AS n_tokens FROM documents)\n"
        + "\nUNION ALL\n".join(
            f"SELECT lang, CAST({p} AS BIGINT) AS p_milli, "
            f"CAST(PERCENTILE_DISC({p / 1000.0}) WITHIN GROUP (ORDER BY n_tokens)"
            f" AS BIGINT) AS value FROM ts GROUP BY lang"
            for p in (250, 500, 900)
        )
    )

    sql["bigram_frequencies"] = f"""
WITH {_TOKS_CTE}
SELECT t1.tok || ' ' || t2.tok AS bigram, COUNT(*) AS n
FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
GROUP BY bigram
"""

    sql["mentions"] = f"""
WITH {_TOKS_CTE}
SELECT doc_id, CAST(pos AS INTEGER) AS pos, tok AS surface
FROM toks WHERE tok IN ({surfaces})
"""

    sql["triples"] = _triples_sql_core() + "SELECT doc_id, subj, pred, obj, pred_pos FROM triples"

    sql["canonical_triples"] = _triples_sql_core() + """
SELECT subj, pred, obj, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_pages
FROM triples GROUP BY subj, pred, obj
"""

    sql["kg_edges"] = _triples_sql_core() + f"""
, ent(entity_id, surface, class) AS (VALUES {ent_values})
SELECT CAST(es.entity_id AS BIGINT) AS subj_id, t.pred,
       CAST(eo.entity_id AS BIGINT) AS obj_id,
       COUNT(*) AS n_occurrences, COUNT(DISTINCT t.doc_id) AS n_pages
FROM triples t JOIN ent es ON t.subj = es.surface
               JOIN ent eo ON t.obj = eo.surface
GROUP BY es.entity_id, t.pred, eo.entity_id
"""

    sql["kg_nodes"] = f"""
WITH {_TOKS_CTE},
ent(entity_id, surface, class) AS (VALUES {ent_values})
SELECT CAST(e.entity_id AS BIGINT) AS entity_id, e.surface, e.class,
       COUNT(*) AS n_mentions
FROM toks t JOIN ent e ON t.tok = e.surface
WHERE t.tok IN ({linkable})
GROUP BY e.entity_id, e.surface, e.class
"""

    # graph analytics over the edge table. kg_update_edges shares the
    # kg_edges oracle verbatim: incremental (even-docs + odd-docs delta
    # merge) must equal the batch build over the full corpus.
    sql["kg_update_edges"] = sql["kg_edges"]

    _eg_cte = f"""
, ent(entity_id, surface, class) AS (VALUES {ent_values}),
eg AS (
  SELECT CAST(es.entity_id AS BIGINT) AS subj_id, t.pred,
         CAST(eo.entity_id AS BIGINT) AS obj_id, COUNT(*) AS n_occ
  FROM triples t JOIN ent es ON t.subj = es.surface
                 JOIN ent eo ON t.obj = eo.surface
  GROUP BY 1, 2, 3
)"""

    sql["kg_degrees"] = _triples_sql_core() + _eg_cte + """,
outs AS (
  SELECT subj_id AS entity_id, CAST(COUNT(*) AS BIGINT) AS out_edges,
         CAST(SUM(n_occ) AS BIGINT) AS w_out
  FROM eg GROUP BY 1
),
ins AS (
  SELECT obj_id AS entity_id, CAST(COUNT(*) AS BIGINT) AS in_edges,
         CAST(SUM(n_occ) AS BIGINT) AS w_in
  FROM eg GROUP BY 1
)
SELECT COALESCE(o.entity_id, i.entity_id) AS entity_id,
       CAST(COALESCE(o.out_edges, 0) AS BIGINT) AS out_edges,
       CAST(COALESCE(i.in_edges, 0) AS BIGINT) AS in_edges,
       CAST(COALESCE(o.w_out, 0) AS BIGINT) AS w_out,
       CAST(COALESCE(i.w_in, 0) AS BIGINT) AS w_in
FROM outs o FULL OUTER JOIN ins i ON o.entity_id = i.entity_id
"""

    sql["kg_components"] = _triples_sql_core().replace(
        "WITH ", "WITH RECURSIVE ", 1
    ) + _eg_cte + """,
cedges AS (
  SELECT subj_id AS s, obj_id AS d FROM eg
  UNION
  SELECT obj_id AS s, subj_id AS d FROM eg
),
walk(v, lab) AS (
  SELECT DISTINCT s, s FROM cedges
  UNION
  SELECT e.d, w.lab FROM walk w JOIN cedges e ON e.s = w.v
)
SELECT v AS entity_id, MIN(lab) AS component_id FROM walk GROUP BY v
"""

    # fixed-point integer PageRank, 5 iterations unrolled: identical
    # floor-division arithmetic to stages/graph.pagerank, so values (not
    # just shapes) hash-match.
    from duke_ray.stages.graph import PR_DAMPING_PCT, PR_SCALE

    _pr_base = PR_SCALE - (PR_DAMPING_PCT * PR_SCALE) // 100
    _pr_chain = f""",
pe AS (
  SELECT subj_id AS src, obj_id AS dst, CAST(SUM(n_occ) AS BIGINT) AS w
  FROM eg GROUP BY 1, 2
),
ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS W FROM pe GROUP BY src),
vs AS (SELECT src AS id FROM pe UNION SELECT dst FROM pe),
pr0 AS (SELECT id, CAST({PR_SCALE} AS BIGINT) AS r FROM vs)"""
    for _k in range(1, 6):
        _pr_chain += f""",
c{_k} AS (
  SELECT e.dst AS id, CAST(SUM((p.r * e.w) // o.W) AS BIGINT) AS S
  FROM pe e JOIN pr{_k - 1} p ON p.id = e.src JOIN ow o ON o.src = e.src
  GROUP BY e.dst
),
pr{_k} AS (
  SELECT v.id,
         CAST({_pr_base} + ({PR_DAMPING_PCT} * COALESCE(c.S, 0)) // 100 AS BIGINT) AS r
  FROM vs v LEFT JOIN c{_k} c ON c.id = v.id
)"""
    sql["kg_pagerank"] = (
        _triples_sql_core()
        + _eg_cte
        + _pr_chain
        + '\nSELECT id AS entity_id, r AS "rank" FROM pr5\n'
    )

    # per-entity triangle counts: each triangle a<b<c enumerated exactly
    # once by the oriented three-way self-join, then unnested per vertex.
    sql["kg_triangles"] = _triples_sql_core() + _eg_cte + """,
ue AS (
  SELECT LEAST(subj_id, obj_id) AS u, GREATEST(subj_id, obj_id) AS v
  FROM eg WHERE subj_id <> obj_id GROUP BY 1, 2
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ue e1 JOIN ue e2 ON e2.u = e1.v JOIN ue e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
  SELECT a AS entity_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
) GROUP BY 1
"""

    # bounded k-core peel, 3 rounds unrolled (same iteration the engine
    # runs; simultaneous-peel semantics — survivors come from the
    # pre-round degree snapshot)
    _kc_chain = """,
up AS (
  SELECT LEAST(subj_id, obj_id) AS u, GREATEST(subj_id, obj_id) AS v
  FROM eg WHERE subj_id <> obj_id GROUP BY 1, 2
),
nb0 AS (SELECT u AS a, v AS b FROM up UNION ALL SELECT v, u FROM up)"""
    for _r in range(3):
        _kc_chain += f""",
d{_r} AS (SELECT a, COUNT(*) AS d FROM nb{_r} GROUP BY a),
s{_r} AS (SELECT a FROM d{_r} WHERE d >= 2),
nb{_r + 1} AS (
  SELECT n.a, n.b FROM nb{_r} n
  JOIN s{_r} x ON x.a = n.a JOIN s{_r} y ON y.a = n.b
)"""
    sql["kg_kcore"] = (
        _triples_sql_core()
        + _eg_cte
        + _kc_chain
        + "\nSELECT a AS entity_id, CAST(COUNT(*) AS BIGINT) AS deg FROM nb3 GROUP BY a\n"
    )

    # BFS hop distances: recursive walk bounded at 4 hops; MIN(h) over all
    # enumerated (node, hops) rows is the BFS distance. UNION (not UNION
    # ALL) dedups rows, so the recursion terminates on cyclic graphs.
    sql["kg_reach"] = _triples_sql_core().replace(
        "WITH ", "WITH RECURSIVE ", 1
    ) + _eg_cte + """,
redges AS (SELECT subj_id AS s, obj_id AS d FROM eg GROUP BY 1, 2),
rvs AS (SELECT s AS id FROM redges UNION SELECT d FROM redges),
walk(v, h) AS (
  SELECT id, 0 FROM rvs WHERE id % 5 = 0
  UNION
  SELECT e.d, w.h + 1 FROM walk w JOIN redges e ON e.s = w.v WHERE w.h < 4
)
SELECT v AS entity_id, CAST(MIN(h) AS BIGINT) AS hops FROM walk GROUP BY v
"""

    # expected per-surface link decisions, computed locally by the same
    # deterministic top-k NN logic the distributed LinkActor runs
    from duke_ray.stages.link import LinkActor

    _linker = LinkActor()
    link_rows = []
    for surface in assets.surface_to_entity:
        res = _linker._link_surface(surface)
        if res is not None:
            link_rows.append((surface, res[0], res[2]))
    link_values = ", ".join(
        f"('{sfc}', {eid}, '{cls}')" for sfc, eid, cls in link_rows
    )
    sql["entity_link"] = f"""
WITH {_TOKS_CTE},
links(surface, entity_id, entity_class) AS (VALUES {link_values})
SELECT t.doc_id, CAST(t.pos AS INTEGER) AS pos, t.tok AS surface,
       CAST(l.entity_id AS BIGINT) AS entity_id, l.entity_class
FROM toks t JOIN links l ON t.tok = l.surface
"""

    sql["exact_dedup"] = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"

    # null-safe anti-join (IS NOT DISTINCT FROM = the engine's sentinel rule)
    sql["corpus_diff"] = """
SELECT n.doc_id FROM documents n
WHERE NOT EXISTS (
  SELECT 1 FROM documents b
  WHERE b.doc_id % 4 <> 0 AND b.text IS NOT DISTINCT FROM n.text
)
"""

    sql["embedding_coverage"] = """
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
  SELECT CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL THEN 'both'
              WHEN d.doc_id IS NOT NULL THEN 'left_only'
              ELSE 'right_only' END AS status
  FROM (SELECT DISTINCT doc_id FROM documents) d
  FULL OUTER JOIN (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 2 = 0) e
    ON d.doc_id = e.vec_id
)
GROUP BY status
"""

    sql["hash_sample"] = """
SELECT doc_id FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
"""

    sql["stratified_sample"] = """
SELECT lang, doc_id, rank_hex FROM (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS rank_hex,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 20
"""

    sql["mixture_sample"] = """
SELECT lang, doc_id, rank_hex FROM (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS rank_hex,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE (lang = 'en' AND rn <= 40)
   OR (lang = 'de' AND rn <= 10)
   OR (lang = 'zh' AND rn <= 5)
"""

    sql["token_budget_head"] = """
SELECT doc_id, n_tokens, cum_tokens FROM (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(SUM(len(string_split(text, ' ')))
              OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM documents
) WHERE cum_tokens <= 10000
"""

    sql["clean_corpus"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 30000000 AS doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS text
  FROM documents
),
toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok
  FROM corpus
),
st AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) / GREATEST(COUNT(*), 1) AS stop_ratio,
         SUM(length(tok)) / GREATEST(COUNT(*), 1) AS avg_len
  FROM toks GROUP BY doc_id
),
q AS (
  SELECT doc_id,
         (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END
          + CASE WHEN stop_ratio >= 0.01 AND stop_ratio <= 0.6 THEN 30 ELSE 0 END
          + CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 30 ELSE 0 END)::BIGINT AS quality_centi
  FROM st
),
kept AS (
  SELECT d.doc_id, d.text FROM corpus d JOIN q USING (doc_id)
  WHERE q.quality_centi >= 70
    AND NOT regexp_matches(d.text, '[\\x{{4E00}}-\\x{{9FFF}}]')
    AND NOT regexp_matches(d.text, '[ñ¿¡]')
    AND NOT regexp_matches(d.text, '[äöüß]')
    AND NOT regexp_matches(d.text, '[àâçèéêëîïôùûœ]')
)
SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text
"""

    # prep_training_data: clean_corpus's filter chain (copies-only corpus),
    # then the doc_chunks windowing spec (40/8 -> stride 32), then the
    # hash_sample md5 split convention on (doc_id ':' chunk_idx).
    sql["prep_training_data"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus
),
st AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) / GREATEST(COUNT(*), 1) AS stop_ratio,
         SUM(length(tok)) / GREATEST(COUNT(*), 1) AS avg_len
  FROM toks GROUP BY doc_id
),
q AS (
  SELECT doc_id,
         (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END
          + CASE WHEN stop_ratio >= 0.01 AND stop_ratio <= 0.6 THEN 30 ELSE 0 END
          + CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 30 ELSE 0 END)::BIGINT AS quality_centi
  FROM st
),
kept AS (
  SELECT d.doc_id, d.text FROM corpus d JOIN q USING (doc_id)
  WHERE q.quality_centi >= 70
    AND NOT regexp_matches(d.text, '[\\x{{4E00}}-\\x{{9FFF}}]')
    AND NOT regexp_matches(d.text, '[ñ¿¡]')
    AND NOT regexp_matches(d.text, '[äöüß]')
    AND NOT regexp_matches(d.text, '[àâçèéêëîïôùûœ]')
),
surv AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
docs2 AS (SELECT k.doc_id, string_split(k.text, ' ') AS t FROM kept k JOIN surv USING (doc_id)),
chunks AS (
  SELECT doc_id, t,
         unnest(generate_series(0, CAST((len(t)-1)//32 AS BIGINT))) AS chunk_idx
  FROM docs2
)
SELECT doc_id, chunk_idx,
       CAST(least(len(t) - chunk_idx*32, 40) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, chunk_idx*32+1, chunk_idx*32+40), ' ') AS chunk_text,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)), 1, 2) < '40'
            THEN 'val' ELSE 'train' END AS split
FROM chunks
"""

    # Exact k=3-shingle Jaccard over the perturbed corpus (documents plus a
    # variant of each doc with its first 3 tokens dropped, doc_id += 10M) —
    # mirrors queries()['_perturbed_corpus'] + ngram_jaccard_pairs. Shingle
    # identity is the token triple (hash-collision-free at this scale);
    # short rows (<3 tokens) contribute one whole-sequence shingle, marked
    # 'S:' to keep the classes distinct, exactly like the engine's
    # whole-row hash.
    _NGRAM_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string(list_slice(string_split(text, ' '), 4, len(string_split(text, ' '))), ' ') AS text
  FROM documents
),
tks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] || chr(31) || t[i+2] AS s
  FROM tks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
  WHERE len(t) >= 3
  UNION
  SELECT doc_id, 'S:' || array_to_string(t, chr(31)) AS s FROM tks WHERE len(t) < 3
),
shc AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
ipairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jpairs AS (
  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
  FROM ipairs JOIN shc ca ON ipairs.doc_a = ca.doc_id
              JOIN shc cb ON ipairs.doc_b = cb.doc_id
  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.6
)
"""

    sql["ngram_jaccard"] = f"""
WITH {_NGRAM_CORPUS_CTE}
SELECT doc_a, doc_b, jaccard FROM jpairs
"""

    # Connected components over the exact pair set: min reachable node via
    # a recursive closure (terminates because UNION deduplicates).
    sql["dedup_clusters"] = f"""
WITH RECURSIVE {_NGRAM_CORPUS_CTE},
cedges AS (
  SELECT doc_a AS s, doc_b AS d FROM jpairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM jpairs
),
walk(v, lab) AS (
  SELECT DISTINCT s, s FROM cedges
  UNION
  SELECT e.d, w.lab FROM walk w JOIN cedges e ON e.s = w.v
)
SELECT v AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY v
"""

    sql["dedup_keep_best"] = f"""
WITH RECURSIVE {_NGRAM_CORPUS_CTE},
cedges AS (
  SELECT doc_a AS s, doc_b AS d FROM jpairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM jpairs
),
walk(v, lab) AS (
  SELECT DISTINCT s, s FROM cedges
  UNION
  SELECT e.d, w.lab FROM walk w JOIN cedges e ON e.s = w.v
),
clus AS (SELECT v AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY v),
ctoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
cst AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) / GREATEST(COUNT(*), 1) AS stop_ratio,
         SUM(length(tok)) / GREATEST(COUNT(*), 1) AS avg_len
  FROM ctoks GROUP BY doc_id
),
ql AS (
  SELECT doc_id,
         (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END
          + CASE WHEN stop_ratio >= 0.01 AND stop_ratio <= 0.6 THEN 30 ELSE 0 END
          + CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 30 ELSE 0 END)::BIGINT AS quality_centi
  FROM cst
)
SELECT cluster_id, doc_id, quality_centi FROM (
  SELECT c.cluster_id, c.doc_id, ql.quality_centi,
         row_number() OVER (
           PARTITION BY c.cluster_id
           ORDER BY ql.quality_centi DESC, c.doc_id
         ) AS rn
  FROM clus c JOIN ql USING (doc_id)
) WHERE rn = 1
"""

    sql["dedup_clusters_embedding"] = """
WITH RECURSIVE cpairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
),
cedges AS (
  SELECT va AS s, vb AS d FROM cpairs UNION SELECT vb, va FROM cpairs
),
walk(v, lab) AS (
  SELECT DISTINCT s, s FROM cedges
  UNION
  SELECT e.d, w.lab FROM walk w JOIN cedges e ON e.s = w.v
)
SELECT v AS vec_id, MIN(lab) AS cluster_id FROM walk GROUP BY v
"""

    sql["lang_id"] = """
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh'
       WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
       WHEN regexp_matches(text, '[äöüß]') THEN 'de'
       WHEN regexp_matches(text, '[àâçèéêëîïôùûœ]') THEN 'fr'
       ELSE 'en' END AS pred_lang
FROM documents
"""

    sql["fingerprints_md5"] = "SELECT doc_id, md5(text) AS md5 FROM documents"

    sql["quality_scores"] = f"""
WITH {_TOKS_CTE},
st AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) / GREATEST(COUNT(*), 1) AS stop_ratio,
         SUM(length(tok)) / GREATEST(COUNT(*), 1) AS avg_len
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END
        + CASE WHEN stop_ratio >= 0.01 AND stop_ratio <= 0.6 THEN 30 ELSE 0 END
        + CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 30 ELSE 0 END)::BIGINT AS quality_centi
FROM st
"""

    from duke_ray.stages.textstats import BPE_SPLIT_PATTERN

    bpe_sql_pattern = BPE_SPLIT_PATTERN.replace("'", "''")
    sql["bpe_token_counts"] = f"""
SELECT doc_id, len(regexp_extract_all(text, '{bpe_sql_pattern}')) AS n_bpe_tokens
FROM documents
"""

    sql["knn_topk"] = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC
         ) AS rank
  FROM q CROSS JOIN embeddings e
) WHERE rank <= 5
"""

    # micro-unit quantization: floor(CAST(e AS DOUBLE)*1e6 + 0.5) is the
    # same IEEE float64 op chain numpy runs, so both sides produce the
    # identical int64 before any summation-order-dependent arithmetic
    sql["encode_docs"] = f"""
WITH {_TOKS_CTE},
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT) AS id
  FROM cnt ORDER BY n DESC, tok LIMIT 1000
),
enc AS (
  SELECT t.doc_id, COALESCE(v.id, -1) AS id, t.pos
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id,
       array_to_string(list(id ORDER BY pos), ',') AS ids,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM enc GROUP BY doc_id
"""

    sql["adaptive_length_filter"] = """
WITH ts AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT CAST(PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS lo,
         CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS hi
  FROM ts
)
SELECT t.doc_id, t.n_tokens FROM ts t, b
WHERE t.n_tokens BETWEEN b.lo AND b.hi
"""

    sql["weighted_sample"] = """
WITH ts AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens FROM ts
WHERE n_tokens >= 1000
   OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      < printf('%04x', (n_tokens * 65536) // 1000)
"""

    sql["gram_matrix"] = """
WITH flat AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM embeddings
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings)
SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS sum_q, n.n_vecs
FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.dim <= b.dim CROSS JOIN n
GROUP BY a.dim, b.dim, n.n_vecs
"""

    sql["label_centroids"] = """
WITH flat AS (
  SELECT label, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim - 1 AS BIGINT) AS dim,
       CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM flat GROUP BY label, dim
"""

    # kmeans_clusters: unrolled integer Lloyd (k=4, 3 iterations) — the
    # engine's spec exactly: micro-unit quantization, exact int64 squared
    # L2, argmin ties to the smallest cluster id, centroid = sum // n
    # (DuckDB // truncates toward zero, matching _trunc_div), empty
    # clusters keep the previous centroid, seeds = k smallest vec_ids.
    _km_k, _km_iters = 4, 3
    _km = """
WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
  FROM embeddings
),
seeds AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
  FROM (SELECT DISTINCT vec_id FROM q ORDER BY vec_id LIMIT {k})
),
c0 AS (SELECT s.c, q.dim, q.v FROM seeds s JOIN q USING (vec_id))"""
    for _i in range(1, _km_iters + 1):
        _km += f""",
a{_i} AS (
  SELECT vec_id, c FROM (
    SELECT q.vec_id, c.c,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT), c.c
           ) AS rn
    FROM q JOIN c{_i - 1} c USING (dim)
    GROUP BY q.vec_id, c.c
  ) WHERE rn = 1
),
s{_i} AS (
  SELECT a.c, q.dim,
         CAST(SUM(q.v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS v
  FROM a{_i} a JOIN q USING (vec_id) GROUP BY a.c, q.dim
),
c{_i} AS (
  SELECT p.c, p.dim, COALESCE(s.v, p.v) AS v
  FROM c{_i - 1} p LEFT JOIN s{_i} s ON s.c = p.c AND s.dim = p.dim
)"""
    _km += f"""
SELECT vec_id, CAST(c AS BIGINT) AS cluster FROM (
  SELECT q.vec_id, c.c,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT), c.c
         ) AS rn
  FROM q JOIN c{_km_iters} c USING (dim)
  GROUP BY q.vec_id, c.c
) WHERE rn = 1
"""
    sql["kmeans_clusters"] = _km.replace("{k}", str(_km_k))

    from duke_ray.pipelines import relational as rel

    sql["cosine_pairs_exact"] = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""

    # media derivation is 1:1 from documents (payload = utf-8 text bytes):
    # octet_length/md5 over the text ARE the engine's byte stats/digest
    sql["media_features"] = """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image/png'
            WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""

    sql["media_frames"] = """
SELECT doc_id AS media_id, CAST(f.f AS INTEGER) AS frame_no
FROM documents,
LATERAL (SELECT unnest(generate_series(
           0, CAST(greatest(octet_length(encode(text)) // 256, 1) AS BIGINT) - 1, 10)) AS f) f
"""

    sql["pricing_summary"] = rel.PRICING_SUMMARY_SQL
    sql["order_revenue_join"] = rel.order_revenue_join_sql()
    sql["top_orders_per_customer"] = rel.top_orders_per_customer_sql()
    sql["promo_revenue"] = rel.PROMO_REVENUE_SQL
    sql["regional_revenue"] = rel.regional_revenue_sql()
    sql["customer_order_profile"] = rel.CUSTOMER_ORDER_PROFILE_SQL
    sql["user_running_values"] = rel.USER_RUNNING_VALUES_SQL
    sql["clicks_asof_purchases"] = rel.CLICKS_ASOF_PURCHASES_SQL
    sql["top_customers"] = rel.top_customers_sql()
    sql["customers_per_region"] = rel.CUSTOMERS_PER_REGION_SQL
    sql["filtered_parts"] = rel.filtered_parts_sql()
    sql["events_tumbling"] = rel.EVENTS_TUMBLING_SQL
    sql["events_sliding"] = rel.EVENTS_SLIDING_SQL
    sql["follow_window"] = rel.follow_window_sql()
    sql["shipping_priority"] = rel.shipping_priority_sql()
    sql["large_volume_customers"] = rel.large_volume_customers_sql()
    sql["customer_distribution"] = rel.CUSTOMER_DISTRIBUTION_SQL
    sql["part_revenue_share"] = rel.part_revenue_share_sql()
    sql["inactive_customers"] = rel.inactive_customers_sql()
    sql["priority_semijoin"] = rel.PRIORITY_SEMIJOIN_SQL
    sql["events_pivot"] = rel.EVENTS_PIVOT_SQL
    sql["brand_supplier_counts"] = rel.brand_supplier_counts_sql()
    sql["event_gaps"] = rel.event_gaps_sql()
    sql["top_event_type_per_user"] = rel.TOP_EVENT_TYPE_SQL
    sql["events_debounce"] = rel.events_debounce_sql()
    sql["cumulative_users"] = rel.CUMULATIVE_USERS_SQL
    sql["cohort_retention"] = rel.COHORT_RETENTION_SQL
    sql["props_rollup"] = rel.PROPS_ROLLUP_SQL
    sql["order_share_of_customer"] = rel.ORDER_SHARE_SQL
    sql["funnel_counts"] = rel.funnel_counts_sql()
    sql["small_quantity_revenue"] = rel.SMALL_QUANTITY_REVENUE_SQL
    sql["cheapest_supplier_per_part"] = rel.CHEAPEST_SUPPLIER_SQL
    sql["forecast_revenue"] = rel.forecast_revenue_sql()
    sql["returned_item_report"] = rel.returned_item_report_sql()
    sql["user_event_spans"] = rel.USER_EVENT_SPANS_SQL
    sql["distinct_segments"] = rel.DISTINCT_SEGMENTS_SQL
    sql["first_event_per_user"] = """
SELECT user_id, event_id, ts_us FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rk
  FROM events
) WHERE rk = 1
"""
    sql["user_sessions"] = rel.user_sessions_sql()

    return sql
