"""Benchmark driver (driver contract + scaling evidence).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:
  {"metric": "kg_pipeline_sec", "value": N, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "triples_per_sec": ...}

--scaling: run the SAME job twice in fresh processes at num_cpus=N and 4N
(default 4 and 16; the sandbox protocol standing in for N- vs 4N-node
clusters, BASELINE.md) and print throughput at both + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("GRAFT_REPLICAS", "40"))
OVERLAP = os.environ.get("GRAFT_OVERLAP", "1") == "1"


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))

    # GRAFT_PIN_CPUS=1 (set by --scaling): enforce the parallelism level at
    # the OS level — sched_setaffinity before ray.init is inherited by the
    # raylet and every worker, so the N-CPU leg really runs on N cores.
    # Ray's num_cpus alone only caps SCHEDULING SLOTS; io threads, the
    # raylet, plasma and the driver still use every core on the machine,
    # which silently inflates the low-parallelism leg of a scaling pair.
    # Pin to CPUs drawn from the process's CURRENT allowed set (ADVICE r3):
    # range(NUM_CPUS) could name offline/disallowed CPUs (OSError) and fixed
    # low indices risk landing on SMT siblings. Taking every other entry of
    # the allowed list first (stride 2) spreads the picks across physical
    # cores on the common sibling layouts; falls back to the full prefix
    # when the allowed set is too small.
    if os.environ.get("GRAFT_PIN_CPUS") == "1":
        allowed = sorted(os.sched_getaffinity(0))
        if len(allowed) > NUM_CPUS:
            spread = allowed[::2] + allowed[1::2]
            os.sched_setaffinity(0, set(spread[:NUM_CPUS]))
        # else: already at or below the requested width — leave affinity alone

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from duke_ray.pipelines.kg import run_kg_pipeline
    from duke_ray.sources import documents_row_count

    out = f"/tmp/duke_ray_bench_{NUM_CPUS}"
    shutil.rmtree(out, ignore_errors=True)

    # warm the OS page cache so both scaling levels measure compute+shuffle
    with open(os.path.join(SF_DIR, "documents.parquet"), "rb") as f:
        f.read()

    timings: dict[str, float] = {}

    t0 = time.time()
    metrics = run_kg_pipeline(SF_DIR, out, replicas=REPLICAS, n_buckets=16, n_salt=16, overlap_branches=OVERLAP)
    kg_sec = time.time() - t0
    timings["kg_pipeline"] = round(kg_sec, 3)

    n_docs = documents_row_count(SF_DIR) * REPLICAS
    n_triple_occurrences = 0
    try:
        import duckdb

        n_triple_occurrences = duckdb.sql(
            f"SELECT COALESCE(SUM(n_occurrences), 0) FROM read_parquet('{out}/edges/bucket=*/*.parquet')"
        ).fetchone()[0]
    except Exception:  # noqa: BLE001
        pass

    # secondary pipelines (timed, smaller weight)
    from duke_ray.pipelines.relational import pricing_summary, top_customers_by_revenue
    from duke_ray.stages.dedup import minhash_near_dup_pairs
    from duke_ray.sources import read_table

    t0 = time.time()
    pricing_summary(SF_DIR).to_pandas()
    timings["pricing_summary"] = round(time.time() - t0, 3)

    t0 = time.time()
    top_customers_by_revenue(SF_DIR).to_pandas()
    timings["top_customers"] = round(time.time() - t0, 3)

    t0 = time.time()
    minhash_near_dup_pairs(
        read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    ).count()
    timings["minhash_dedup"] = round(time.time() - t0, 3)

    from duke_ray.stages.dedup import cluster_pairs, ngram_jaccard_pairs

    t0 = time.time()
    pairs = ngram_jaccard_pairs(
        read_table(SF_DIR, "documents", columns=["doc_id", "text"]), threshold=0.6
    )
    cluster_pairs(pairs).count()
    timings["ngram_dedup_clusters"] = round(time.time() - t0, 3)

    # composed training-data prep user story (filter -> dedup -> semi-join
    # -> chunk -> split); consumed with count() so the chunk expansion runs
    from duke_ray.pipelines.prep import prep_training_data

    t0 = time.time()
    prep_training_data(
        read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    ).count()
    timings["prep_training_data"] = round(time.time() - t0, 3)

    # r5 export-side prep: deterministic shuffle layout + sequence packing
    # (manifest exchanges move only (id, n_tokens, key) rows)
    from duke_ray.stages.pack import pack_manifest
    from duke_ray.stages.shuffle import shuffle_manifest

    import pyarrow as pa
    import pyarrow.compute as _pc

    def _with_tokens(b: "pa.Table") -> "pa.Table":
        toks = _pc.split_pattern(_pc.fill_null(b["text"], ""), pattern=" ")
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_tokens": _pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    t0 = time.time()
    docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"]).map_batches(
        _with_tokens, batch_format="pyarrow"
    )
    shuffle_manifest(docs, n_parts=256).count()
    pack_manifest(docs, budget=2048, n_buckets=256).count()
    timings["shuffle_pack"] = round(time.time() - t0, 3)

    result = {
        "metric": "kg_pipeline_sec",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicas": REPLICAS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / kg_sec, 1),
        "n_triple_occurrences": int(n_triple_occurrences),
        "triples_per_sec": round(int(n_triple_occurrences) / kg_sec, 1),
        "n_nodes": metrics["n_nodes"],
        "n_edges": metrics["n_edges"],
    }
    ray.shutdown()
    return result


def run_endurance() -> dict:
    """Dedup/ANN endurance at bench scale (VERDICT r3 #7): minhash near-dup,
    exact n-gram Jaccard + connected-component clustering, and exact dedup
    over the VARIED corpus (``read_documents_varied``: deterministic token
    churn, planted near-dup pairs — replica text is NOT identical, so pair
    counts stay corpus-linear). Every leg carries closed-form invariants:
    precision vs the planted pair set must be exactly 1.0 (non-planted
    trigram Jaccard is 0 by construction), recall above a floor set by the
    planted-pair Jaccard distribution (97.2% >= 0.6, 74.8% >= 0.8 trigram
    Jaccard at sf0.1), clusters are exactly the found pairs, and no
    two rows are byte-identical."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("GRAFT_PIN_CPUS") == "1":
        allowed = sorted(os.sched_getaffinity(0))
        if len(allowed) > NUM_CPUS:
            spread = allowed[::2] + allowed[1::2]
            os.sched_setaffinity(0, set(spread[:NUM_CPUS]))

    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from duke_ray.sources import documents_row_count, read_documents_varied
    from duke_ray.stages.dedup import (
        cluster_pairs,
        exact_dedup,
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )
    from duke_ray.synth import is_planted_pair_arrow, planted_pair_ids

    n_docs = documents_row_count(SF_DIR)
    n_rows = n_docs * REPLICAS
    planted_total = planted_pair_ids(n_docs, REPLICAS)
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}

    def pair_stats(pairs) -> tuple[int, int]:
        def s(b: pa.Table) -> pa.Table:
            ok = is_planted_pair_arrow(b["doc_a"], b["doc_b"], n_docs)
            return pa.table(
                {
                    "n": pa.array([b.num_rows], pa.int64()),
                    "planted": pa.array([int(np.asarray(ok).sum())], pa.int64()),
                }
            )

        df = pairs.map_batches(s, batch_format="pyarrow").to_pandas()
        return int(df["n"].sum()), int(df["planted"].sum())

    t0 = time.time()
    found, found_planted = pair_stats(
        minhash_near_dup_pairs(read_documents_varied(SF_DIR, REPLICAS), threshold=0.8)
    )
    timings["minhash_pairs"] = round(time.time() - t0, 3)
    stats["minhash_pairs"] = {
        "found": found,
        "planted_total": planted_total,
        "recall": round(found_planted / max(1, planted_total), 4),
        "precision": round(found_planted / max(1, found), 4),
    }
    assert found == found_planted, "minhash emitted a non-planted pair"
    assert found_planted / max(1, planted_total) >= 0.65, stats["minhash_pairs"]

    t0 = time.time()
    # materialized: pairs feed BOTH clustering and pair_stats below —
    # without the snapshot the final verify exchange (a full sets pass)
    # would execute twice. Pairs are ids-only, ~24 B/pair.
    pairs = ngram_jaccard_pairs(
        read_documents_varied(SF_DIR, REPLICAS), threshold=0.6
    ).materialize()
    n_clustered = cluster_pairs(pairs).count()
    timings["ngram_dedup_clusters"] = round(time.time() - t0, 3)
    found, found_planted = pair_stats(pairs)
    stats["ngram_dedup_clusters"] = {
        "found": found,
        "planted_total": planted_total,
        "recall": round(found_planted / max(1, planted_total), 4),
        "precision": round(found_planted / max(1, found), 4),
        "clustered_docs": n_clustered,
    }
    assert found == found_planted, "ngram emitted a non-planted pair"
    assert found_planted / max(1, planted_total) >= 0.93, stats["ngram_dedup_clusters"]
    # planted pairs are doc-disjoint -> every component is one pair
    assert n_clustered == 2 * found, (n_clustered, found)

    t0 = time.time()
    n_survivors = exact_dedup(read_documents_varied(SF_DIR, REPLICAS)).count()
    timings["exact_dedup"] = round(time.time() - t0, 3)
    stats["exact_dedup"] = {"survivors": n_survivors, "rows": n_rows}
    assert n_survivors == n_rows, "varied corpus has no exact dups by construction"

    # inverted index: the posting-partials exchange is corpus-TOKEN-scale
    # (one row per distinct (term, doc) pair), the heaviest shuffle in the
    # suite — the leg that would livelock first if backpressure regresses.
    # In-flight working set ~ the partials table -> heavy-plan reservation
    # opt-in, same as the dedup verify exchanges (BASELINE.md r4).
    from duke_ray.context import reserve_memory_for
    from duke_ray.stages.index import inverted_index

    t0 = time.time()
    corpus = read_documents_varied(SF_DIR, REPLICAS)
    if n_rows > 1_000_000:
        reserve_memory_for(corpus)
    idx = inverted_index(corpus, bucket_span=65536)

    def shard_checks(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_docs_in_postings = pc.add(
            pc.count_substring(b["postings"], ","), pa.scalar(1, pa.int32())
        ).cast(pa.int64())
        ok_df = pc.equal(n_docs_in_postings, b["df"])
        ok_tf = pc.greater_equal(b["tf"], b["df"])
        return pa.table(
            {
                "shards": pa.array([b.num_rows], pa.int64()),
                "df_sum": pa.array([pc.sum(b["df"]).as_py() or 0], pa.int64()),
                "tf_sum": pa.array([pc.sum(b["tf"]).as_py() or 0], pa.int64()),
                "bad": pa.array(
                    [pc.sum(pc.invert(pc.and_(ok_df, ok_tf))).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    chk = idx.map_batches(shard_checks, batch_format="pyarrow").to_pandas()
    timings["inverted_index"] = round(time.time() - t0, 3)
    stats["inverted_index"] = {
        "shards": int(chk["shards"].sum()),
        "df_sum": int(chk["df_sum"].sum()),
        "tf_sum": int(chk["tf_sum"].sum()),
    }
    assert int(chk["bad"].sum()) == 0, "postings/df/tf invariant violated"
    assert int(chk["df_sum"].sum()) > 0

    # cross-snapshot anti-join: varied texts are pairwise distinct, so with
    # base = rows having doc_id % 4 != 0 the survivor count is EXACTLY the
    # doc_id % 4 == 0 row count — a closed-form invariant at any scale.
    from duke_ray.stages.dedup import anti_join_text

    t0 = time.time()
    new_ds = read_documents_varied(SF_DIR, REPLICAS)
    base_ds = read_documents_varied(SF_DIR, REPLICAS).map_batches(
        lambda b: b.filter(
            pa.compute.not_equal(
                pa.compute.bit_wise_and(b["doc_id"], pa.scalar(3)), 0
            )
        ),
        batch_format="pyarrow",
    )
    n_new = anti_join_text(new_ds, base_ds).count()
    timings["corpus_diff"] = round(time.time() - t0, 3)
    # varied ids are doc_id + r * n_docs, texts pairwise distinct -> the
    # survivor count is exactly the (id % 4 == 0) row count, closed form
    base_ids = np.arange(n_docs, dtype=np.int64)
    expected = int(
        sum(int(((base_ids + r * n_docs) % 4 == 0).sum()) for r in range(REPLICAS))
    )
    stats["corpus_diff"] = {"survivors": n_new, "expected": expected}
    assert n_new == expected, (n_new, expected)

    # integer TF-IDF retrieval: one corpus scan + metadata exchanges;
    # invariants: exactly k rows, scores positive and non-increasing.
    from duke_ray.stages.retrieval import lexical_topk

    t0 = time.time()
    top = lexical_topk(
        read_documents_varied(SF_DIR, REPLICAS),
        query_terms=("dup", "scan", "batch"),
        k=20,
        n_docs=n_rows,
    ).to_pandas()
    timings["lexical_topk"] = round(time.time() - t0, 3)
    stats["lexical_topk"] = {
        "k": len(top),
        "top_score": int(top["score"].iloc[0]) if len(top) else 0,
    }
    assert len(top) == 20, len(top)
    assert (top["score"] > 0).all()
    assert (top["score"].diff().dropna() <= 0).all(), "scores not sorted"

    # substring-level duplicate spans: the candidate exchange is corpus-
    # TOKEN-scale ((hash, doc) int pairs per window), the substring analog
    # of the inverted-index leg. A 16-token boilerplate is planted on every
    # doc_id % 16 == 0 row; 'subscribe' is OOV for the corpus vocab, so the
    # boiler window's (n_docs, n_occ) have an exact closed form.
    from duke_ray.stages.spans import duplicate_spans

    _BOILER = (
        "subscribe to our newsletter for daily updates and never miss "
        "a single breaking story again friends"
    )
    assert len(_BOILER.split(" ")) == 16

    def _with_boiler(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        tail = pa.compute.if_else(
            pa.array(ids % 16 == 0), pa.scalar(" " + _BOILER), pa.scalar("")
        )
        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        t = b.drop_columns(["text"])
        return t.append_column("text", pc.binary_join_element_wise(text, tail, ""))

    t0 = time.time()
    corpus2 = read_documents_varied(SF_DIR, REPLICAS).map_batches(
        _with_boiler, batch_format="pyarrow"
    )
    if n_rows > 1_000_000:
        reserve_memory_for(corpus2)
    spans = duplicate_spans(corpus2, w=16).materialize()
    timings["duplicate_spans"] = round(time.time() - t0, 3)
    boiler_rows = spans.map_batches(
        lambda b: b.filter(pa.compute.equal(b["span"], pa.scalar(_BOILER))),
        batch_format="pyarrow",
    ).to_pandas()
    expected_boiler = (n_rows + 15) // 16
    stats["duplicate_spans"] = {
        "n_spans": spans.count(),
        "boiler_docs": int(boiler_rows["n_docs"].iloc[0]) if len(boiler_rows) else 0,
        "expected_boiler_docs": expected_boiler,
    }
    assert len(boiler_rows) == 1, "planted boilerplate span missing"
    assert int(boiler_rows["n_docs"].iloc[0]) == expected_boiler
    assert int(boiler_rows["n_occ"].iloc[0]) == expected_boiler

    # free the held spans materialization before the heaviest leg: its
    # spilled blocks (plus this session's accumulated spill) cost the
    # cooccurrence leg its disk budget at 10M (two OutOfDiskError runs)
    del spans, boiler_rows

    # windowed co-occurrence: the pair-partials exchange carries up to
    # window x corpus-tokens distinct string keys — the pair analog of the
    # index/spans legs, and the largest SPILL in the suite (~"50% of
    # disk" standalone at 10M). It runs in a FRESH SUBPROCESS: the
    # documented fresh-session-per-op protocol (session aging + isolated
    # spill that the OS reclaims at process exit). The PARENT session
    # shuts down FIRST: cooccurrence is the last leg, the parent needs no
    # Ray afterward, and the raylet only deletes this session's spill
    # files at shutdown — `del spans` alone left ~30 GB of session spill
    # pinning the disk this host's ~90 GB usable budget can't spare (a
    # third 10M OutOfDiskError run proved it).
    import subprocess as _sp

    ray.shutdown()
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
        RAY_GRAFT_CPUS=str(NUM_CPUS),
        GRAFT_REPLICAS=str(REPLICAS),
        GRAFT_SF_DIR=SF_DIR,
    )
    r = _sp.run(
        [sys.executable, os.path.abspath(__file__), "--cooc-leg"],
        env=env,
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"cooc leg failed (exit {r.returncode}); stderr tail:\n"
            + "\n".join(r.stderr.strip().splitlines()[-15:])
        )
    leg = json.loads(r.stdout.strip().splitlines()[-1])
    timings["cooccurrence"] = leg["sec"]
    stats["cooccurrence"] = leg["stats"]

    total = sum(timings.values())
    result = {
        "metric": "dedup_endurance_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "stats": stats,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicas": REPLICAS,
        "n_rows": n_rows,
        "rows_per_sec": round(4 * n_rows / total, 1),
    }
    ray.shutdown()
    return result


def run_cooc_leg() -> dict:
    """The endurance suite's co-occurrence leg, in its own Ray session
    (invoked as a subprocess by run_endurance — see the note there).
    A 2-token tail is planted on every doc_id % 8 == 0 row; both tokens
    are outside the synthetic vocab, so the planted pair's n_ab, n_a and
    n_b all equal the planted row count EXACTLY."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from duke_ray.context import reserve_memory_for
    from duke_ray.sources import documents_row_count, read_documents_varied
    from duke_ray.stages.textstats import cooccurrence

    n_docs = documents_row_count(SF_DIR)
    n_rows = n_docs * REPLICAS
    _PTOK_A, _PTOK_B = "zqxalpha", "zqxbeta"

    def _with_pair(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        tail = pc.if_else(
            pa.array(ids % 8 == 0),
            pa.scalar(f" {_PTOK_A} {_PTOK_B}"),
            pa.scalar(""),
        )
        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        t = b.drop_columns(["text"])
        return t.append_column("text", pc.binary_join_element_wise(text, tail, ""))

    t0 = time.time()
    corpus3 = read_documents_varied(SF_DIR, REPLICAS).map_batches(
        _with_pair, batch_format="pyarrow"
    )
    if n_rows > 1_000_000:
        reserve_memory_for(corpus3)
    mc = 100 if n_rows > 100_000 else 3
    cooc = cooccurrence(corpus3, window=4, min_count=mc).materialize()
    sec = round(time.time() - t0, 3)
    planted = cooc.map_batches(
        lambda b: b.filter(
            pa.compute.and_(
                pa.compute.equal(b["tok_a"], pa.scalar(_PTOK_A)),
                pa.compute.equal(b["tok_b"], pa.scalar(_PTOK_B)),
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    base_ids = np.arange(n_docs, dtype=np.int64)
    expected_pair = int(
        sum(int(((base_ids + r * n_docs) % 8 == 0).sum()) for r in range(REPLICAS))
    )
    stats = {
        "n_pairs": cooc.count(),
        "planted_n_ab": int(planted["n_ab"].iloc[0]) if len(planted) else 0,
        "expected": expected_pair,
        "min_count": mc,
    }
    assert len(planted) == 1, "planted co-occurrence pair missing"
    for c in ("n_ab", "n_a", "n_b"):
        assert int(planted[c].iloc[0]) == expected_pair, (c, stats)
    ray.shutdown()
    return {"sec": sec, "stats": stats}


def run_scaling() -> dict:
    """Same job, same input, fresh ray.init processes at N and 4N CPUs.

    Defaults: levels 4 -> 16 (SCALING_LEVELS env overrides, e.g. "8,32") at
    replicas=2000 (~10M pages: round-3's per-core throughput is ~7x
    round 1's, so smaller corpora are fixed-cost-dominated and understate
    scaling). Round-3 note on the pair choice: a pure-compute control
    (tools/cpu_control_probe.py — independent BLAS tasks, no Ray Data, no
    shuffle) shows THIS VM delivers only 2.62x from 8 -> 32 vCPUs (0.66
    ceiling; the 16 -> 32 step gives 1.29x even for raw numpy), while
    4 -> 16 delivers 3.59x (0.90). The engine measures 0.836 median at
    4 -> 16 and 0.65 at 8 -> 32 = 0.98x the platform's own 8 -> 32
    ceiling. Both pairs + the control are recorded in BASELINE.md.
    """
    levels = os.environ.get("SCALING_LEVELS", "4,16")
    lo, hi = (int(x) for x in levels.split(","))
    replicas = os.environ.get("GRAFT_REPLICAS", "2000")
    # scaling runs measure pure data-parallel scaling of ONE pipeline;
    # branch overlap (an intra-job concurrency optimization) is reported
    # separately in BASELINE.md because it preferentially speeds up the
    # low-parallelism baseline (fills idle slots), lowering the ratio even
    # as absolute times improve at every level
    overlap = os.environ.get("GRAFT_OVERLAP", "0")

    def run_at(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_REPLICAS=replicas,
                   GRAFT_OVERLAP=overlap,
                   GRAFT_PIN_CPUS=os.environ.get("GRAFT_PIN_CPUS", "1"),
                   PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo = run_at(lo)
    r_hi = run_at(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "levels": [lo, hi],
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        f"triples_per_sec_{lo}": r_lo["triples_per_sec"],
        f"triples_per_sec_{hi}": r_hi["triples_per_sec"],
        "sf": SF_DIR,
        "replicas": int(replicas),
        "overlap_branches": overlap == "1",
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--endurance" in sys.argv:
        print(json.dumps(run_endurance()))
    elif "--cooc-leg" in sys.argv:
        print(json.dumps(run_cooc_leg()))
    else:
        print(json.dumps(run_bench()))
