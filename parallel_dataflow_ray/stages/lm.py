"""Unigram language-model quality scoring — the CCNet/Wenzek et al.
perplexity-filter shape (score every document by a broadcast LM; keep
or bucket by score) re-expressed Ray-Data-first.

The production recipe scores a crawl with a KenLM model trained on a
trusted corpus; the engine-shaped part — and what this module builds —
is (1) TRAIN a capped-vocabulary unigram model over a Dataset with one
map-side-combined token-count shuffle, and (2) SCORE every document
map-only against the broadcast model.  The corpus text never shuffles;
the model is O(vocab_size) and ships once via ``ray.put``.

Determinism discipline: per-token log-probs are quantized to integer
MICRO-NATS before any summation (the repo-wide exact-integer rule, cf.
``tfidf_top_terms``), so per-doc sums are order/partition invariant and
bit-match the DuckDB twin's ``SUM`` over the same quantized terms.

Reference analog: the pluggable pass over a parsed corpus
(`utils/src/dataflow_spec.rs:5-31`) — a pure per-unit scoring function
driven by a globally-derived model, the same shape as ConstProp's
globally-initialised lattice.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from . import relational as rel

__all__ = ["unigram_model", "load_or_train_unigram",
           "score_docs_logprob", "unigram_logprob",
           "score_docs_importance"]


def _count_tokens_fn(text_col: str):
    def counts(b: pd.DataFrame) -> pd.DataFrame:
        words = b[text_col].fillna("").str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts(sort=False)
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "n": vc.to_numpy(np.int64)})
    return counts


def unigram_model(ds: rd.Dataset, *, text_col: str = "text",
                  vocab_size: int = 65536, num_buckets: int = 16,
                  batch_size: int = 1024):
    """Train the capped-vocab unigram model: returns
    ``(vocab_index, lp_micro, oov_lp_micro, total_tokens)`` where
    ``vocab_index`` is a ``pd.Index`` of the top-``vocab_size`` tokens
    by (count desc, token asc) and ``lp_micro[i]`` is
    ``rint(ln(count_i / total) * 1e6)`` as int64.  Out-of-vocabulary
    tokens score ``ln(1 / total)`` (a single unseen-mass floor).

    One explode pass with per-batch ``value_counts`` partials, one
    grouped-sum shuffle sized O(vocab); the count table materializes
    once (it is the model — at corpus scale persist it like
    ``load_or_train_centroids`` persists k-means centroids).  The cap
    is what makes the broadcast bounded at 100 TB: the long tail of
    hapax tokens collapses into the OOV floor instead of shipping to
    every scoring task."""
    counts = rel.grouped_sum(
        ds.map_batches(_count_tokens_fn(text_col), batch_format="pandas",
                       batch_size=batch_size),
        ["word"], ["n"], num_buckets=num_buckets).materialize()

    total = int(counts.sum("n") or 0)
    top = rel.top_k(counts, [("n", True), ("word", False)],
                    vocab_size).to_pandas()
    lp_micro = np.rint(np.log(
        top["n"].to_numpy(np.float64) / float(total)) * 1e6).astype(np.int64)
    oov_lp = int(np.rint(np.log(1.0 / float(total)) * 1e6)) if total else 0
    return pd.Index(top["word"]), lp_micro, oov_lp, total


def load_or_train_unigram(ds: rd.Dataset, *, cache_path: str,
                          text_col: str = "text",
                          vocab_size: int = 65536, num_buckets: int = 16):
    """The model trained ONCE per corpus and persisted as a tiny parquet
    artifact (one (word, lp_micro) row per vocab entry + the OOV floor
    and total in metadata rows) — repeat scoring jobs (the production
    shape: model from the trusted corpus, scores over every crawl
    shard) load instead of re-counting the corpus.  Training is
    deterministic, so a cache hit is bit-identical to a retrain.  Same
    artifact discipline as ``similarity.load_or_train_centroids``."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(cache_path):
        t = pq.read_table(cache_path)
        words = t["word"].to_pandas()
        lp = t["lp_micro"].to_numpy()
        oov = int(t.schema.metadata[b"oov_lp_micro"])
        total = int(t.schema.metadata[b"total_tokens"])
        return pd.Index(words), lp.astype(np.int64), oov, total

    vocab, lp, oov, total = unigram_model(
        ds, text_col=text_col, vocab_size=vocab_size,
        num_buckets=num_buckets)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    tmp = f"{cache_path}.tmp.{os.getpid()}"
    tbl = pa.table({"word": pa.array(list(vocab), type=pa.string()),
                    "lp_micro": pa.array(lp)})
    tbl = tbl.replace_schema_metadata(
        {b"oov_lp_micro": str(oov).encode(),
         b"total_tokens": str(total).encode()})
    pq.write_table(tbl, tmp)
    os.replace(tmp, cache_path)     # atomic: concurrent callers race safely
    return vocab, lp, oov, total


def score_docs_logprob(ds: rd.Dataset, vocab: pd.Index,
                       lp_micro: np.ndarray, oov_lp_micro: int, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       batch_size: int = 1024) -> rd.Dataset:
    """Score every doc against the broadcast model — map-only, zero
    shuffles.  Emits one row per input doc: ``n_tokens``, ``n_oov``,
    ``logprob_micro`` (int64 sum of quantized per-token log-probs —
    partition/replay invariant), and ``avg_logprob_micro`` (the
    quality-filter ranking key; 0.0 for empty docs).  The model rides
    the object store once (``ray.put``), never per batch."""
    model_ref = ray.put((np.asarray(vocab), lp_micro))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        v, lp = ray.get(model_ref)
        vi = pd.Index(v)
        ex = b[text_col].fillna("").str.split(" ").explode()
        ex = ex[ex != ""]
        pos = vi.get_indexer(ex.to_numpy()) if len(ex) else \
            np.empty(0, np.int64)
        oov = pos < 0
        tok_lp = np.where(oov, np.int64(oov_lp_micro),
                          lp[np.where(oov, 0, pos)])
        per = pd.DataFrame({id_col: b[id_col].reindex(ex.index).to_numpy(),
                            "lp": tok_lp,
                            "oov": oov.astype(np.int64)})
        agg = per.groupby(id_col, sort=False).agg(
            n_tokens=("lp", "size"), n_oov=("oov", "sum"),
            logprob_micro=("lp", "sum"))
        out = pd.DataFrame({id_col: b[id_col].to_numpy()}).merge(
            agg, left_on=id_col, right_index=True, how="left")
        for c in ("n_tokens", "n_oov", "logprob_micro"):
            out[c] = out[c].fillna(0).astype(np.int64)
        n = out["n_tokens"].to_numpy(np.int64)
        out["avg_logprob_micro"] = np.where(
            n > 0, out["logprob_micro"].to_numpy(np.float64)
            / np.maximum(n, 1), 0.0)
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=batch_size)


def score_docs_importance(ds: rd.Dataset, target_model, raw_model, *,
                          text_col: str = "text", id_col: str = "doc_id",
                          batch_size: int = 1024) -> rd.Dataset:
    """DSIR-shape importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-doc
    ``lw_micro = sum_tok [ log p_target(tok) - log p_raw(tok) ]`` under
    two unigram models, each term quantized to integer micro-nats
    BEFORE the sum (partition/replay invariant, bit-matches the SQL
    twin's SUM).  ``target_model`` / ``raw_model`` are
    ``(vocab_index, lp_micro, oov_lp_micro)`` triples from
    :func:`unigram_model`.

    One fused MAP-ONLY pass: both models ship together in a single
    ``ray.put`` and every token is looked up against both vocabularies
    in the same explode — no per-model scoring pass, no doc_id join to
    recombine the two scores (the 100 TB shape: the corpus text is read
    once and never shuffles)."""
    v_t, lp_t, oov_t = target_model
    v_r, lp_r, oov_r = raw_model
    model_ref = ray.put((np.asarray(v_t), lp_t, np.asarray(v_r), lp_r))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vt, lt, vr, lr = ray.get(model_ref)
        it, ir = pd.Index(vt), pd.Index(vr)
        ex = b[text_col].fillna("").str.split(" ").explode()
        ex = ex[ex != ""]
        toks = ex.to_numpy()
        if len(toks):
            pos_t = it.get_indexer(toks)
            pos_r = ir.get_indexer(toks)
        else:
            pos_t = pos_r = np.empty(0, np.int64)
        lw = (np.where(pos_t < 0, np.int64(oov_t),
                       lt[np.where(pos_t < 0, 0, pos_t)])
              - np.where(pos_r < 0, np.int64(oov_r),
                         lr[np.where(pos_r < 0, 0, pos_r)]))
        per = pd.DataFrame({id_col: b[id_col].reindex(ex.index).to_numpy(),
                            "lw": lw})
        agg = per.groupby(id_col, sort=False).agg(
            n_tokens=("lw", "size"), lw_micro=("lw", "sum"))
        out = pd.DataFrame({id_col: b[id_col].to_numpy()}).merge(
            agg, left_on=id_col, right_index=True, how="left")
        out["n_tokens"] = out["n_tokens"].fillna(0).astype(np.int64)
        out["lw_micro"] = out["lw_micro"].fillna(0).astype(np.int64)
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=batch_size)


def unigram_logprob(ds: rd.Dataset, *, text_col: str = "text",
                    id_col: str = "doc_id", vocab_size: int = 65536,
                    num_buckets: int = 16,
                    batch_size: int = 1024) -> rd.Dataset:
    """Train-then-score composition (self-scored corpus): the
    boilerplate/gibberish filter a curation pipeline runs — docs whose
    average token log-prob is far below the corpus norm are outliers
    (rare-token soup); far above are repetitive boilerplate.  Two
    passes over the text (count, score), one O(vocab) shuffle."""
    vocab, lp, oov, _total = unigram_model(
        ds, text_col=text_col, vocab_size=vocab_size,
        num_buckets=num_buckets, batch_size=batch_size)
    return score_docs_logprob(ds, vocab, lp, oov, text_col=text_col,
                              id_col=id_col, batch_size=batch_size)


_SEP = "\x1f"          # unit separator: joins (w1, w2) into one key


def bigram_model(ds: rd.Dataset, *, text_col: str = "text",
                 max_bigrams: int = 1 << 20, vocab_size: int = 65536,
                 num_buckets: int = 16, batch_size: int = 1024):
    """Train the stupid-backoff bigram model (Brants et al. 2007 shape):
    one explode pass emits per-batch (w1, w2) count partials (adjacency
    AFTER empty-token removal), ONE grouped-sum shuffle sizes the
    exchange O(distinct bigrams), and the table is capped at the top
    ``max_bigrams`` by (count desc, pair asc) — the cap is what bounds
    the broadcast at 100 TB, same discipline as the unigram cap.  The
    conditional log-prob ``ln(c(w1,w2)/c(w1))`` is quantized to integer
    micro-nats at TRAIN time (c(w1) = exact corpus unigram count,
    fetched only for the capped table's w1 set), so scoring is pure
    lookup.  Returns ``(bigram_keys: pd.Index of "w1␟w2",
    lp12_micro: int64[], unigram model triple)`` — the backoff side is
    the capped unigram model with its OOV floor plus the quantized
    ``ln(0.4)`` backoff penalty applied per MISSED bigram at score
    time."""
    def pair_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = {"k": [], "n": []}
        toks = b[text_col].fillna("").str.split(" ")
        for lst in toks:
            # drop empty tokens AND tokens carrying the in-band pair
            # separator: "a\x1fb" followed by "c" would otherwise alias
            # the distinct pair ("a", "b\x1fc") in the count table
            lst = [t for t in lst if t != "" and _SEP not in t]
            if len(lst) < 2:
                continue
            a = pd.Series(np.array(lst[:-1], dtype=object))
            z = pd.Series(np.array(lst[1:], dtype=object))
            out["k"].append((a + _SEP + z))
        if not out["k"]:
            return pd.DataFrame({"k": np.empty(0, object),
                                 "n": np.empty(0, np.int64)})
        vc = pd.concat(out["k"], ignore_index=True).value_counts(sort=False)
        return pd.DataFrame({"k": vc.index.to_numpy(),
                             "n": vc.to_numpy(np.int64)})

    from . import relational as rel2

    big = rel2.grouped_sum(
        ds.map_batches(pair_counts, batch_format="pandas",
                       batch_size=batch_size),
        ["k"], ["n"], num_buckets=num_buckets).materialize()
    top = rel2.top_k(big, [("n", True), ("k", False)],
                     max_bigrams).to_pandas()

    # exact corpus unigram counts for the capped table's w1 set only
    uni_counts = rel2.grouped_sum(
        ds.map_batches(_count_tokens_fn(text_col), batch_format="pandas",
                       batch_size=batch_size),
        ["word"], ["n"], num_buckets=num_buckets).to_pandas()
    uni_idx = pd.Index(uni_counts["word"])
    w1 = top["k"].str.split(_SEP).str[0]
    c1 = uni_counts["n"].to_numpy(np.int64)[uni_idx.get_indexer(w1)]
    lp12 = np.rint(np.log(top["n"].to_numpy(np.float64)
                          / c1.astype(np.float64)) * 1e6).astype(np.int64)
    uni = unigram_model(ds, text_col=text_col, vocab_size=vocab_size,
                        num_buckets=num_buckets, batch_size=batch_size)
    return pd.Index(top["k"]), lp12, uni


BACKOFF_MICRO = int(np.rint(np.log(0.4) * 1e6))


def score_docs_bigram(ds: rd.Dataset, bigram_keys: pd.Index,
                      lp12_micro: np.ndarray, uni_model, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      batch_size: int = 1024) -> rd.Dataset:
    """Score every doc MAP-ONLY under stupid backoff: the first token
    scores unigram; token i>1 scores the bigram conditional when
    (w_{i-1}, w_i) is in the capped table, else ``ln(0.4)`` + its
    unigram score (capped vocab, OOV floor).  Every term is an int64
    micro-nat BEFORE the per-doc sum — partition/replay invariant and
    bit-matching the SQL twin.  Both models ship in one ``ray.put``."""
    v_u, lp_u, oov_u = uni_model
    ref = ray.put((np.asarray(bigram_keys), lp12_micro,
                   np.asarray(v_u), lp_u))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        bk, l12, vu, lu = ray.get(ref)
        bi, ui = pd.Index(bk), pd.Index(vu)
        ex = b[text_col].fillna("").str.split(" ").explode()
        # same token filter as training (empty + separator-carrying),
        # so score-time adjacency matches the trained pair table
        ex = ex[(ex != "") & ~ex.str.contains(_SEP, regex=False)]
        n_out = len(b)
        if len(ex) == 0:
            z = np.zeros(n_out, np.int64)
            return pd.DataFrame({id_col: b[id_col].to_numpy(),
                                 "n_tokens": z, "n_hits": z.copy(),
                                 "logprob_micro": z.copy(),
                                 "avg_logprob_micro": np.zeros(n_out)})
        doc = b[id_col].reindex(ex.index).to_numpy()
        tok = ex.to_numpy()
        prev = np.roll(tok, 1)
        first = np.empty(len(tok), bool)
        first[0] = True
        first[1:] = doc[1:] != doc[:-1]
        # unigram term for every token (used for firsts and misses)
        pu = ui.get_indexer(tok)
        lp_uni = np.where(pu < 0, np.int64(oov_u),
                          lu[np.where(pu < 0, 0, pu)])
        key = pd.Series(prev.astype(object)) + _SEP + \
            pd.Series(tok.astype(object))
        pb = bi.get_indexer(key.to_numpy())
        hit = (pb >= 0) & ~first
        lp = np.where(first, lp_uni,
                      np.where(hit, l12[np.where(pb < 0, 0, pb)],
                               np.int64(BACKOFF_MICRO) + lp_uni))
        per = pd.DataFrame({id_col: doc, "lp": lp,
                            "hit": hit.astype(np.int64)})
        agg = per.groupby(id_col, sort=False).agg(
            n_tokens=("lp", "size"), n_hits=("hit", "sum"),
            logprob_micro=("lp", "sum"))
        out = pd.DataFrame({id_col: b[id_col].to_numpy()}).merge(
            agg, left_on=id_col, right_index=True, how="left")
        for c in ("n_tokens", "n_hits", "logprob_micro"):
            out[c] = out[c].fillna(0).astype(np.int64)
        n = out["n_tokens"].to_numpy(np.int64)
        out["avg_logprob_micro"] = np.where(
            n > 0, out["logprob_micro"].to_numpy(np.float64)
            / np.maximum(n, 1), 0.0)
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=batch_size)


def bigram_logprob(ds: rd.Dataset, *, text_col: str = "text",
                   id_col: str = "doc_id", max_bigrams: int = 1 << 20,
                   vocab_size: int = 65536, num_buckets: int = 16,
                   batch_size: int = 1024) -> rd.Dataset:
    """Train-then-score composition: two count shuffles (bigrams,
    unigrams), then one map-only scoring pass."""
    bk, l12, uni = bigram_model(ds, text_col=text_col,
                                max_bigrams=max_bigrams,
                                vocab_size=vocab_size,
                                num_buckets=num_buckets,
                                batch_size=batch_size)
    return score_docs_bigram(ds, bk, l12, uni[:3], text_col=text_col,
                             id_col=id_col, batch_size=batch_size)
