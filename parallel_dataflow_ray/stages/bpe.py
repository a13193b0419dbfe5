"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016; the GPT-2 recipe), re-expressed Ray-Data-first:

1. **Word counting is the 100 TB part.**  One explode pass with
   per-batch ``value_counts`` partials and ONE grouped-sum shuffle
   produces the (word, count) table — O(distinct words) rows move, the
   corpus text never shuffles.  The table is then CAPPED at the top-W
   words by (count desc, word asc): the long tail of hapax words
   contributes negligible pair mass, and the cap is what bounds the
   merge loop's working set independently of corpus size (the same
   discipline as ``lm.unigram_model``'s vocab cap — the capped count
   table IS the training sketch; drops are reported, never silent).

2. **The merge loop runs over the capped table** — O(W) symbols total,
   a few MB at W=1M regardless of whether the corpus was 1 GB or
   100 TB — as a fully VECTORIZED numpy fold: every round computes all
   weighted adjacent-pair counts in one pass, picks argmax with a
   deterministic tie-break (count desc, then (left, right) lexicographic
   asc), and applies the merge with left-to-right non-overlap semantics
   ("aaaa" + merge "a a" -> "aa aa", not "aa a a").  No Python loop
   over words; the per-round loop is over MERGES, which is the
   algorithm's intrinsic sequential dimension.

3. **Encoding is map-only**: the learned merge ranks broadcast once
   (``ray.put``) and every batch applies them with the same vectorized
   kernel — zero shuffles, the production shape for tokenizing a crawl.

Correctness: bit-exact against a pure-Python reference trainer on the
same word counts (``tests/test_bpe.py``), partition-count invariant by
construction (counts are exact integers; ties broken by value).

Reference analog: the iterative-fixpoint shape (`impls/src/parallel.rs:
29-73` — frontier rounds with a deterministic sequential merge step);
the capped-sketch-then-local-fold discipline mirrors the reference's
size-thresholded MixedExecutor dispatch (`impls/src/mixed.rs:32-38`).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from . import relational as rel

__all__ = ["word_count_table", "train_bpe_merges", "bpe_train",
           "apply_merges", "encode_word_counts", "bpe_encode"]



def word_count_table(ds: rd.Dataset, *, text_col: str = "text",
                     max_words: int = 1 << 20, num_buckets: int = 16,
                     batch_size: int = 1024) -> tuple[pd.DataFrame, dict]:
    """The distributed half: (word, n) over the corpus, capped at the
    top-``max_words`` by (n desc, word asc).  Returns ``(table,
    stats)`` where stats reports how much mass the cap dropped (the
    no-silent-caps rule)."""
    def counts(b: pd.DataFrame) -> pd.DataFrame:
        words = b[text_col].fillna("").str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts(sort=False)
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "n": vc.to_numpy(np.int64)})

    full = rel.grouped_sum(
        ds.map_batches(counts, batch_format="pandas",
                       batch_size=batch_size),
        ["word"], ["n"], num_buckets=num_buckets).materialize()
    total_words = full.count()
    total_mass = int(full.sum("n") or 0)
    top = rel.top_k(full, [("n", True), ("word", False)],
                    max_words).to_pandas()
    kept_mass = int(top["n"].sum())
    stats = {"distinct_words": int(total_words),
             "kept_words": len(top),
             "dropped_words": int(total_words) - len(top),
             "total_tokens": total_mass,
             "dropped_token_mass": total_mass - kept_mass}
    return top.reset_index(drop=True), stats


def _explode_symbols(words: np.ndarray, counts: np.ndarray):
    """Flatten words into parallel arrays (sym, word_id, n) with one
    row per character — the vectorized working representation."""
    lens = np.fromiter((len(w) for w in words), np.int64, len(words))
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    n = np.repeat(counts.astype(np.int64), lens)
    sym = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for w in words:                       # one pass to build; O(chars)
        for ch in w:
            sym[pos] = ch
            pos += 1
    return sym, wid, n


def _keep_nonoverlap(m: np.ndarray) -> np.ndarray:
    """Left-to-right non-overlapping match selection: within each run of
    consecutive True positions keep every other one (offset 0, 2, ...).
    Vectorized: run starts via m & ~shift(m); offsets via arange minus a
    cummax of start indices."""
    if not m.any():
        return m
    idx = np.arange(len(m))
    start = m & ~np.concatenate(([False], m[:-1]))
    run_start = np.where(start, idx, -1)
    run_start = np.maximum.accumulate(run_start)
    keep = m & (((idx - run_start) & 1) == 0)
    return keep


def _merge_pass(sym, wid, n, left: str, right: str):
    """Apply one merge to the flattened arrays; returns new arrays."""
    same = wid[:-1] == wid[1:]
    m = np.concatenate(
        (same & (sym[:-1] == left) & (sym[1:] == right), [False]))
    keep_first = _keep_nonoverlap(m)
    if not keep_first.any():
        return sym, wid, n
    sym = sym.copy()
    sym[keep_first] = left + right
    drop = np.concatenate(([False], keep_first[:-1]))
    sel = ~drop
    return sym[sel], wid[sel], n[sel]


def train_bpe_merges(word_table: pd.DataFrame, *, num_merges: int = 64,
                     min_count: int = 2) -> pd.DataFrame:
    """The merge loop over a (word, n) table — vectorized numpy, the
    canonical greedy BPE: each round counts all weighted adjacent
    symbol pairs, merges the most frequent (ties: lexicographically
    smallest (left, right)), stops early when the best pair's weighted
    count drops below ``min_count``.  Returns the merge table
    ``(rank, left, right, pair_count)``."""
    words = word_table["word"].to_numpy()
    counts = word_table["n"].to_numpy(np.int64)
    sym, wid, n = _explode_symbols(words, counts)
    out = {"rank": [], "left": [], "right": [], "pair_count": []}
    for rank in range(num_merges):
        if len(sym) < 2:
            break
        same = wid[:-1] == wid[1:]
        if not same.any():
            break
        # integer pair codes: np.unique sorts symbols ascending, so
        # code order == string order and the combined key's ascending
        # order == (left, right) lexicographic order — the tie-break
        # falls out of the encoding
        u, inv = np.unique(sym, return_inverse=True)
        k = np.int64(len(u))
        key = inv[:-1][same] * k + inv[1:][same]
        w = n[:-1][same]
        if k * k <= (1 << 24):
            cnt = np.bincount(key, weights=w, minlength=int(k * k))
            best_n = int(cnt.max())
            best_key = int(np.flatnonzero(cnt == best_n)[0])
        else:                                  # huge symbol alphabet
            agg = pd.Series(w).groupby(key, sort=True).sum()
            best_n = int(agg.max())
            best_key = int(agg.index[agg.to_numpy() == best_n][0])
        if best_n < min_count:
            break
        left, right = str(u[best_key // k]), str(u[best_key % k])
        out["rank"].append(rank)
        out["left"].append(left)
        out["right"].append(right)
        out["pair_count"].append(best_n)
        sym, wid, n = _merge_pass(sym, wid, n, left, right)
    return pd.DataFrame(out)


def bpe_train(ds: rd.Dataset, *, text_col: str = "text",
              num_merges: int = 64, max_words: int = 1 << 20,
              min_count: int = 2, num_buckets: int = 16
              ) -> tuple[pd.DataFrame, dict]:
    """Distributed-count + capped-table merge training; returns the
    merge table and the cap stats."""
    table, stats = word_count_table(ds, text_col=text_col,
                                    max_words=max_words,
                                    num_buckets=num_buckets)
    merges = train_bpe_merges(table, num_merges=num_merges,
                              min_count=min_count)
    return merges, stats


def apply_merges(words: np.ndarray, merges: pd.DataFrame) -> list[list[str]]:
    """Tokenize each word under the learned merges, applied in rank
    order with the same vectorized kernel as training (so train-time
    and encode-time segmentation agree by construction)."""
    uniq, inv = np.unique(words.astype(object), return_inverse=True)
    sym, wid, n = _explode_symbols(uniq, np.ones(len(uniq), np.int64))
    for left, right in zip(merges["left"], merges["right"]):
        sym, wid, n = _merge_pass(sym, wid, n, left, right)
    toks: list[list[str]] = [[] for _ in range(len(uniq))]
    for s, w in zip(sym, wid):
        toks[w].append(s)
    return [toks[i] for i in inv]


def encode_word_counts(merges: pd.DataFrame):
    """Batch kernel factory: per-doc BPE token count + distinct-token
    count under the broadcast merge table (map-only)."""
    merges_ref = ray.put(merges)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(merges_ref)
        ex = b["text"].fillna("").str.split(" ").explode()
        ex = ex[ex != ""]
        if len(ex) == 0:
            return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                                 "n_words": np.zeros(len(b), np.int64),
                                 "n_bpe_tokens": np.zeros(len(b), np.int64)})
        toks = apply_merges(ex.to_numpy(), m)
        ntok = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        per = pd.DataFrame({"doc_id": b["doc_id"].reindex(ex.index)
                            .to_numpy(), "nt": ntok})
        agg = per.groupby("doc_id", sort=False).agg(
            n_words=("nt", "size"), n_bpe_tokens=("nt", "sum"))
        out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy()}).merge(
            agg, left_on="doc_id", right_index=True, how="left")
        for c in ("n_words", "n_bpe_tokens"):
            out[c] = out[c].fillna(0).astype(np.int64)
        return out

    return encode


def bpe_encode(ds: rd.Dataset, merges: pd.DataFrame, *,
               batch_size: int = 512) -> rd.Dataset:
    """Tokenize a corpus map-only against the broadcast merge table."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        encode_word_counts(merges), batch_format="pandas",
        batch_size=batch_size)
