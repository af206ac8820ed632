"""Distributed n-gram language-model scoring — the perplexity-style
quality filter of large-scale training-data pipelines (CCNet / Gopher
keep-or-drop signals), built from public formulas only.

Model: add-one-smoothed bigram LM over the corpus normal form (tokens =
text split on single spaces, matching ``textstats.FlatTokens`` and the
``term_frequencies`` / ``bigram_frequencies`` oracles):

    p(b | a) ~ (c_ab + 1) / (c_a + V)

where ``c_ab`` is the global adjacent-pair count, ``c_a`` the global
unigram count and ``V`` the training vocabulary size. Two scores per
document over its bigram occurrences:

- ``score_milli`` (the oracle-able gate form): per-occurrence integer
  ``(1000 * (c_ab + 1)) // (c_a + V)``, summed — exact in int64, so the
  distributed result value-hashes against a DuckDB oracle.
- ``surprisal_micro`` (``log_space=True``): per-occurrence
  ``floor(-1e6 * ln(p))`` summed — micro-nats of total surprisal, the
  true cross-entropy signal. Deterministic given the counts (plain
  numpy log over int ratios) but not SQL-hashable (ln in two engines
  differs in the last ulp), so it ships with a scalar-parity unit test
  instead of an oracle.

Scale shape (the part that matters at 100 TB): scoring needs the count
of EVERY bigram occurrence, so the occurrence stream is corpus-linear
and cannot be pre-filtered (unlike cooccurrence's output-bounded
attach). The design ships it through exactly ONE attach exchange:

1. The unigram count table (``term_frequencies``, already an oracled
   exchange) is materialized once and reused twice: its row count is V,
   and its vocab-scale rows feed the attach exchange replicated to all
   S salts.
2. One scan of the PROBE corpus emits per-batch-combined occurrence
   rows (doc_id, ta, tb, k).
3. A single exchange keyed by (ta, salt) where salt = hash(tb) % S:
   all occurrences of a bigram co-locate, so for SELF-scoring c_ab is
   derived inside the partition from the occurrence rows themselves —
   no separate bigram-count pass or rows at all. (Held-out scoring
   unions in kind-'b' bigram partials from one train scan.) Salting
   bounds hot-first-token skew ("the" as ta) to 1/S of the token's
   mass per partition. In-partition: sum partials, then two vectorized
   C++ hash joins (pyarrow Table.join) attach c_ab and c_a.
4. One doc-keyed grouped_sum folds per-occurrence contributions into
   per-document scores; a baseline row per probe doc keeps zero-bigram
   documents present.

Self-scoring therefore touches the corpus exactly twice (unigram
exchange + occurrence scan) and ships each bigram occurrence once.

Train defaults to the probe corpus (self-scoring — the gate query);
passing a separate train set gives held-out scoring (the contamination
/ quality-filter use), where unseen bigrams fall back to c_ab = 0 and
unseen unigrams to c_a = 0 — exactly what add-one smoothing is for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..text import fnv1a64_arrow
from .tokens import FlatTokens


def _unigram_side(uni_counts: "ray.data.Dataset", n_salt: int):
    """already-aggregated (token, n) unigram table -> kind-'u' rows
    replicated to every salt (vocab x S rows — small next to the
    corpus-linear occurrence stream)."""

    def rep(b: pa.Table) -> pa.Table:
        u_ta = b["token"].combine_chunks()
        u_c = b["n"].cast(pa.int64()).combine_chunks()
        nu = len(u_ta)
        return pa.table(
            {
                "kind": pa.array(["u"] * (nu * n_salt), pa.string()),
                "ta": pa.concat_arrays([u_ta] * n_salt),
                "tb": pa.nulls(nu * n_salt, pa.string()),
                "salt": pa.array(
                    np.repeat(np.arange(n_salt, dtype=np.int32), nu), pa.int32()
                ),
                "doc_id": pa.nulls(nu * n_salt, pa.int64()),
                "k": pa.concat_arrays([u_c] * n_salt),
            }
        )

    return uni_counts.map_batches(rep, batch_format="pyarrow", batch_size=65536)


def _bigram_partials(train: "ray.data.Dataset", text_col: str, n_salt: int):
    """kind-'b' global bigram count partials, routed by (ta, salt(tb)) —
    only needed for HELD-OUT scoring; self-scoring derives c_ab from the
    occurrence rows inside the partition."""

    def partial(batch: pa.Table) -> pa.Table:
        flat = FlatTokens.from_text(batch[text_col])
        toks = flat.tokens
        n = len(toks)
        if n >= 2:
            same = pa.array(flat.row[1:] == flat.row[:-1])
            first = toks.slice(0, n - 1).filter(same)
            second = toks.slice(1, n - 1).filter(same)
            bg = (
                pa.table({"ta": first, "tb": second})
                .group_by(["ta", "tb"])
                .aggregate([([], "count_all")])
            )
            b_ta = bg["ta"].combine_chunks()
            b_tb = bg["tb"].combine_chunks()
            b_c = bg["count_all"].cast(pa.int64()).combine_chunks()
        else:
            b_ta = b_tb = pa.array([], pa.string())
            b_c = pa.array([], pa.int64())
        b_salt = (
            fnv1a64_arrow(b_tb) % np.uint64(n_salt)
        ).astype(np.int32) if len(b_tb) else np.array([], np.int32)
        return pa.table(
            {
                "kind": pa.array(["b"] * len(b_ta), pa.string()),
                "ta": b_ta,
                "tb": b_tb,
                "salt": pa.array(b_salt, pa.int32()),
                "doc_id": pa.nulls(len(b_ta), pa.int64()),
                "k": b_c,
            }
        )

    return train.map_batches(partial, batch_format="pyarrow", batch_size=8192)


def _probe_occurrences(probe: "ray.data.Dataset", id_col: str, text_col: str, n_salt: int):
    """per-batch-combined bigram occurrence rows (doc_id, ta, tb, k),
    kind 'o', routed by (ta, hash(tb) % n_salt)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat = FlatTokens.from_text(batch[text_col])
        toks = flat.tokens
        n = len(toks)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if n >= 2:
            same = pa.array(flat.row[1:] == flat.row[:-1])
            first = toks.slice(0, n - 1).filter(same)
            second = toks.slice(1, n - 1).filter(same)
            rows = flat.row[:-1][flat.row[1:] == flat.row[:-1]]
            og = (
                pa.table(
                    {
                        "doc_id": pa.array(ids[rows], pa.int64()),
                        "ta": first,
                        "tb": second,
                    }
                )
                .group_by(["doc_id", "ta", "tb"])
                .aggregate([([], "count_all")])
            )
            o_id = og["doc_id"].combine_chunks()
            o_ta = og["ta"].combine_chunks()
            o_tb = og["tb"].combine_chunks()
            o_k = og["count_all"].cast(pa.int64()).combine_chunks()
        else:
            o_id = pa.array([], pa.int64())
            o_ta = o_tb = pa.array([], pa.string())
            o_k = pa.array([], pa.int64())
        salt = (
            fnv1a64_arrow(o_tb) % np.uint64(n_salt)
        ).astype(np.int32) if len(o_tb) else np.array([], np.int32)
        return pa.table(
            {
                "kind": pa.array(["o"] * len(o_ta), pa.string()),
                "ta": o_ta,
                "tb": o_tb,
                "salt": pa.array(salt, pa.int32()),
                "doc_id": o_id,
                "k": o_k,
            }
        )

    return probe.map_batches(partial, batch_format="pyarrow", batch_size=8192)


def lm_score(
    probe: "ray.data.Dataset",
    train: "ray.data.Dataset | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    log_space: bool = False,
    n_salt: int = 4,
    n_meta: int = 256,
) -> "ray.data.Dataset":
    """Per-document add-one bigram-LM score.

    Output (doc_id, n_bigrams, score_milli) — or (doc_id, n_bigrams,
    surprisal_micro) with ``log_space=True``. Every probe document gets
    a row (zero-bigram docs score 0)."""
    from ..state.exchange import grouped_sum, partitioned_reduce

    self_scoring = train is None
    train_ds = probe if self_scoring else train

    # the unigram table is materialized once and reused twice: its row
    # count IS the vocabulary size, and its rows feed the attach
    # exchange's unigram side (vocab-scale, not corpus-scale).
    from .textstats import term_frequencies

    uni_counts = term_frequencies(train_ds, text_col=text_col).materialize()
    vocab_size = int(uni_counts.count())

    occurrences = _probe_occurrences(probe, id_col, text_col, n_salt)
    tagged = _unigram_side(uni_counts, n_salt).union(occurrences)
    if not self_scoring:
        # held-out: global bigram counts come from a separate train scan.
        # Self-scoring skips this entirely — every occurrence of a bigram
        # lands in the same partition, so c_ab is derivable there.
        tagged = tagged.union(_bigram_partials(train_ds, text_col, n_salt))

    def attach_partition(t: pa.Table) -> pa.Table:
        kind = t["kind"]
        occ = t.filter(pc.equal(kind, "o"))
        if occ.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_big": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        if self_scoring:
            # c_ab = sum of per-doc occurrence counts within the partition
            bc = (
                occ.select(["ta", "tb", "k"])
                .group_by(["ta", "tb"])
                .aggregate([("k", "sum")])
            )
        else:
            bp = t.filter(pc.equal(kind, "b"))
            bc = (
                bp.select(["ta", "tb", "k"])
                .group_by(["ta", "tb"])
                .aggregate([("k", "sum")])
            )
        up = t.filter(pc.equal(kind, "u"))
        uc = up.select(["ta", "k"]).group_by("ta").aggregate([("k", "sum")])
        o = occ.select(["doc_id", "ta", "tb", "k"]).combine_chunks()
        o = o.join(
            bc.rename_columns(["ta", "tb", "c_ab"]),
            keys=["ta", "tb"],
            join_type="left outer",
        )
        o = o.join(
            uc.rename_columns(["ta", "c_a"]), keys=["ta"], join_type="left outer"
        )
        k = o["k"].to_numpy(zero_copy_only=False)
        c_ab = pc.fill_null(o["c_ab"], 0).to_numpy(zero_copy_only=False)
        c_a = pc.fill_null(o["c_a"], 0).to_numpy(zero_copy_only=False)
        if log_space:
            # micro-nats of surprisal: floor(-1e6 * ln p) per occurrence
            p = (c_ab + 1.0) / (c_a + float(vocab_size))
            per = np.floor(-1_000_000.0 * np.log(p)).astype(np.int64)
        else:
            per = (1000 * (c_ab + 1)) // (c_a + vocab_size)
        return pa.table(
            {
                "doc_id": o["doc_id"],
                "n_big": pa.array(k, pa.int64()),
                "s": pa.array(per * k, pa.int64()),
            }
        )

    contribs = partitioned_reduce(tagged, ["ta", "salt"], attach_partition, n_meta=n_meta)

    # baseline row per probe doc so zero-bigram documents appear
    def baseline(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "n_big": pa.array(np.zeros(n, np.int64), pa.int64()),
                "s": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    base = probe.map_batches(baseline, batch_format="pyarrow", batch_size=8192)
    out_col = "surprisal_micro" if log_space else "score_milli"
    return grouped_sum(
        contribs.union(base),
        "doc_id",
        {"n_big": "n_bigrams", "s": out_col},
        n_meta=n_meta,
    )


def perplexity_filter(
    docs: "ray.data.Dataset",
    train: "ray.data.Dataset | None" = None,
    max_avg_surprisal_micro: int = 12_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Keep documents whose average per-bigram surprisal is at most the
    threshold (micro-nats) — the CCNet-style keep side. Zero-bigram docs
    are dropped (no evidence). Returns (doc_id, n_bigrams,
    surprisal_micro, avg_surprisal_micro) for the kept docs; join back
    on doc_id for payloads."""
    scores = lm_score(docs, train=train, id_col=id_col, text_col=text_col, log_space=True)

    def keep(b: pa.Table) -> pa.Table:
        n = b["n_bigrams"].to_numpy(zero_copy_only=False)
        s = b["surprisal_micro"].to_numpy(zero_copy_only=False)
        avg = np.where(n > 0, s // np.maximum(n, 1), np.iinfo(np.int64).max)
        t = b.append_column("avg_surprisal_micro", pa.array(avg, pa.int64()))
        return t.filter(pa.array(avg <= max_avg_surprisal_micro))

    return scores.map_batches(keep, batch_format="pyarrow")
