"""Distributed BPE tokenizer training + corpus encoding.

Byte-pair-encoding subword training (Sennrich, Haddow & Birch 2016 —
public algorithm) in its word-frequency formulation: merges are learned
from the (word, count) vocabulary, NOT the raw corpus, so after one
corpus-scale count exchange every training iteration runs over a
vocab-scale table. That is the property that makes tokenizer training
feasible at 100 TB: the corpus is touched exactly twice (once to count
words, once to encode), and the 10k-100k merge iterations stream over a
table ~1e6-1e8 rows regardless of corpus bytes.

Topology per merge iteration (all over the words table):
1. per-batch vectorized pair counts — flat symbol buffer, same-row
   adjacent pairs, weights = word counts (no per-row Python);
2. one small grouped_sum exchange + per-partition arg-best partials —
   only n_meta candidate rows reach the driver;
3. the winning pair (count desc, then lexicographically smallest —
   the documented deterministic tie-break) broadcast back and applied
   as a vectorized leftmost-greedy merge (run-parity resolution for
   overlapping matches, the same idiom as dedup's run detection).

The carried words table is re-materialized with a FIXED block budget
every round (the compounding-block-count lesson, CLAUDE.md r2).

``bpe_encode`` then encodes documents with the classic greedy
lowest-rank-first algorithm; the merge list is metadata-sized and
broadcast via ``ray.put``, and a process-local memo over DISTINCT
tokens (Zipf: a few thousand entries serve millions of occurrences)
keeps the per-token Python cost amortized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_ENCODE_CACHE: dict = {}  # per-process encode memo, keyed by merge-list ref

END = "▁"  # end-of-word sentinel symbol (assumed absent from corpus
# text — the corpus normal form is ASCII; a literal ▁ would merely blur
# into the sentinel, never crash)


def _word_table(docs: "ray.data.Dataset", text_col: str, n_meta: int) -> "ray.data.Dataset":
    """corpus -> (word, n) — the one corpus-scale exchange."""
    from .textstats import term_frequencies

    wf = term_frequencies(docs, text_col=text_col)
    # drop the empty token (split artifact of empty/multi-space text)
    return wf.map_batches(
        lambda b: b.filter(pc.greater(pc.utf8_length(b["token"]), 0)),
        batch_format="pyarrow",
    )


def _to_symbols(word: str) -> str:
    return " ".join(list(word) + [END])


def _pair_partial(batch: pa.Table) -> pa.Table:
    """vectorized weighted adjacent-pair counts over the symbol strings."""
    from .tokens import FlatTokens

    flat = FlatTokens.from_text(batch["sym"])
    s = flat.tokens
    n = len(s)
    if n < 2:
        return pa.table({"pair": pa.array([], pa.string()), "w": pa.array([], pa.int64())})
    w = batch["n"].to_numpy(zero_copy_only=False)
    same = flat.row[1:] == flat.row[:-1]
    first = s.slice(0, n - 1).filter(pa.array(same))
    second = s.slice(1, n - 1).filter(pa.array(same))
    pair = pc.binary_join_element_wise(first, second, " ")
    ww = w[flat.row[:-1][same]]
    g = (
        pa.table({"pair": pair, "w": pa.array(ww, pa.int64())})
        .group_by("pair")
        .aggregate([("w", "sum")])
    )
    return g.rename_columns(["pair", "w"])


def _best_pair(words: "ray.data.Dataset", n_meta: int) -> tuple[str, str, int] | None:
    """argmax-count pair (ties: lexicographically smallest), via
    grouped_sum + per-partition best partials (n_meta rows to driver)."""
    from ..state.exchange import grouped_sum

    counts = grouped_sum(
        words.map_batches(_pair_partial, batch_format="pyarrow", batch_size=65536),
        "pair",
        {"w": "w"},
        n_meta=n_meta,
    )

    def best_of(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        w = b["w"].to_numpy(zero_copy_only=False)
        p = b["pair"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -w))
        return b.take(pa.array(order[:1], pa.int64()))

    cand = counts.map_batches(best_of, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return None
    order = np.lexsort((cand["pair"].to_numpy(), -cand["w"].to_numpy()))
    row = cand.iloc[order[0]]
    a, b = str(row["pair"]).split(" ", 1)
    return a, b, int(row["w"])


def _apply_merge(words: "ray.data.Dataset", a: str, b: str) -> "ray.data.Dataset":
    """leftmost-greedy merge of adjacent (a, b) -> a+b in every word,
    fully vectorized (run-parity overlap resolution)."""
    merged_sym = a + b

    def apply(batch: pa.Table) -> pa.Table:
        from .tokens import FlatTokens

        flat = FlatTokens.from_text(batch["sym"])
        s = flat.tokens
        n = len(s)
        if n < 2:
            return batch
        sa = pc.equal(s, a).to_numpy(zero_copy_only=False)
        sb = pc.equal(s, b).to_numpy(zero_copy_only=False)
        cand = sa[:-1] & sb[1:] & (flat.row[1:] == flat.row[:-1])
        if not cand.any():
            return batch
        # leftmost-greedy: inside each run of consecutive candidate
        # positions keep every other one, starting at the run head.
        # (consecutive candidates share a symbol only when a == b; for
        # a != b, candidates are never adjacent and parity is a no-op)
        idx = np.flatnonzero(cand)
        if a == b and len(idx) > 1:
            # only identical pairs can have adjacent candidates; resolve
            # left-to-right (touch only the matched positions)
            keep = np.ones(len(idx), bool)
            last_kept = -2
            for j, i in enumerate(idx):
                if i == last_kept + 1:
                    keep[j] = False
                else:
                    last_kept = i
            idx = idx[keep]
        take = np.ones(n, bool)
        take[idx + 1] = False  # drop the second symbol of each merge
        out_syms = s.to_numpy(zero_copy_only=False).astype(object)
        out_syms[idx] = merged_sym
        kept = pa.array(out_syms[take], pa.string())
        rows = flat.row[take]
        # rebuild one space-joined string per word
        lengths = np.zeros(batch.num_rows, np.int64)
        np.add.at(lengths, rows, 1)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        return pa.table(
            {
                "word": batch["word"],
                "n": batch["n"],
                "sym": pc.binary_join(lists, " "),
            }
        )

    return words.map_batches(apply, batch_format="pyarrow", batch_size=65536)


def bpe_train(
    docs: "ray.data.Dataset",
    n_merges: int = 64,
    min_frequency: int = 2,
    text_col: str = "text",
    n_meta: int = 64,
    n_blocks: int = 32,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ranked
    merge list (deterministic: count desc, lexicographic tie-break)."""
    words = _word_table(docs, text_col, n_meta).map_batches(
        lambda b: pa.table(
            {
                "word": b["token"],
                "n": b["n"].cast(pa.int64()),
                "sym": pa.array(
                    [_to_symbols(w) for w in b["token"].to_pylist()], pa.string()
                ),
            }
        ),
        batch_format="pyarrow",
    ).repartition(n_blocks).materialize()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = _best_pair(words, n_meta)
        if best is None or best[2] < min_frequency:
            break
        a, b, _w = best
        merges.append((a, b))
        words = _apply_merge(words, a, b).repartition(n_blocks).materialize()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """classic greedy BPE encode: repeatedly merge the lowest-rank pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(doc_id, n_words, n_bpe_tokens, n_chars) per document — the
    encoded-length accounting a token-budget pipeline needs. The merge
    list is broadcast once; a process-local memo over distinct tokens
    amortizes the per-word Python under Zipf."""
    merges_ref = ray.put(list(merges))

    def per_batch(batch: pa.Table) -> pa.Table:
        from .tokens import FlatTokens

        # PROCESS-local memo (module global): a function attribute would
        # be rebuilt per task (cloudpickle re-instantiates the closure),
        # while worker processes persist across tasks.
        key = merges_ref.hex()
        state = _ENCODE_CACHE.setdefault(key, {})
        if "ranks" not in state:
            state["ranks"] = {tuple(m): i for i, m in enumerate(ray.get(merges_ref))}
            state["lens"] = {}
        ranks = state["ranks"]
        cache = state["lens"]
        flat = FlatTokens.from_text(batch[text_col])
        toks = flat.tokens.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        lens = np.empty(len(uniq), np.int64)
        for i, w in enumerate(uniq):
            if w not in cache:
                cache[w] = len(encode_word(w, ranks)) if w else 0
            lens[i] = cache[w]
        per_tok = lens[inv]
        n_rows = batch.num_rows
        n_bpe = np.zeros(n_rows, np.int64)
        np.add.at(n_bpe, flat.row, per_tok)
        n_words = flat.row_lengths()
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
                "n_chars": pc.utf8_length(batch[text_col]).cast(pa.int64()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=4096)
