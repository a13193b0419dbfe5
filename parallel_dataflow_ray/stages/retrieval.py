"""BM25 retrieval scoring (Robertson/Spärck Jones, public formula) —
the lexical-retrieval half of a RAG/data-curation stack, Ray-Data-first.

Shape: corpus statistics (per-term document frequency for the QUERY's
terms only, document count, total token count) come from ONE
map-side-combined pass — O(query terms) + O(1) rows move, text never
shuffles — then every document is scored MAP-ONLY against the broadcast
(term → idf) table and the global top-k comes off per-block partial
top-ks, never a full sort.

Determinism discipline: every per-term score is quantized to integer
MICRO units before the per-doc sum (the repo-wide exact-integer rule),
so document scores are partition/replay invariant and bit-match the
DuckDB twin's SUM over identically-quantized terms.

Reference analog: the pluggable per-unit scoring pass driven by a
globally-derived model (`utils/src/dataflow_spec.rs:5-31`), same shape
as the unigram/bigram scorers in ``stages/lm.py``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from . import relational as rel

__all__ = ["bm25_stats", "bm25_topk"]


def _explode_tokens(bt: pd.DataFrame, text_col: str):
    """(row_pos, token) for non-empty tokens, plus per-row token count
    — one vectorized explode, shared by both kernels."""
    toks = bt[text_col].fillna("").str.split(" ")
    ex = toks.explode()
    ex = ex[ex != ""]
    pos = ex.index.to_numpy()            # original row label per token
    lens = ex.groupby(ex.index).size().reindex(bt.index, fill_value=0)
    return pos, ex.to_numpy(), lens.to_numpy(np.int64)


def bm25_stats(ds: rd.Dataset, query_terms: list[str], *,
               text_col: str = "text", num_buckets: int = 4,
               batch_size: int = 1024):
    """One pass over the corpus: per-query-term document frequency,
    corpus document count, total token count.  Only O(|terms|) + 2
    rows cross the shuffle."""
    terms = sorted(set(query_terms))
    # the corpus-metadata rows ride the term column behind a "\x02"
    # prefix; a query term carrying that byte would alias them (corpus
    # tokens can't — only query-term matches are ever emitted as rows)
    bad = [t for t in terms if "\x02" in t]
    if bad:
        raise ValueError(f"query terms may not contain \\x02: {bad!r}")
    tref = ray.put(np.array(terms, dtype=object))

    def partial(bt: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tref)
        pos, tok, lens = _explode_tokens(bt, text_col)
        hit = np.isin(tok, t)
        # distinct (doc, term) pairs -> df per term
        pairs = pd.DataFrame({"p": pos[hit], "w": tok[hit]})
        dfc = pairs.drop_duplicates().groupby("w", sort=False).size()
        out = pd.DataFrame({
            "term": np.concatenate([t, ["\x02n_docs", "\x02n_tokens"]]),
            "df": np.concatenate([
                dfc.reindex(t, fill_value=0).to_numpy(np.int64),
                [np.int64(len(bt)), lens.sum()]]).astype(np.int64)})
        return out

    agg = rel.grouped_sum(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=batch_size),
        ["term"], ["df"], num_buckets=num_buckets).to_pandas()
    meta = agg[agg["term"].str.startswith("\x02")].set_index("term")
    n_docs = int(meta.loc["\x02n_docs", "df"])
    n_tokens = int(meta.loc["\x02n_tokens", "df"])
    dfs = agg[~agg["term"].str.startswith("\x02")]
    df_map = dict(zip(dfs["term"], dfs["df"].astype(int)))
    return ({t: df_map.get(t, 0) for t in terms}, n_docs, n_tokens)


def bm25_topk(ds: rd.Dataset, query_terms: list[str], k: int = 20, *,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75,
              batch_size: int = 1024) -> rd.Dataset:
    """Score every doc map-only and return the global top-``k`` by
    (score desc, id asc).  idf = ln((N - df + 0.5)/(df + 0.5) + 1)
    (the Lucene-standard non-negative variant); per-term contribution
    ``idf * tf*(k1+1)/(tf + k1*(1-b+b*len/avgdl))``, quantized to
    int64 micro before the per-doc sum."""
    dfs, n_docs, n_tokens = bm25_stats(ds, query_terms,
                                       text_col=text_col,
                                       batch_size=batch_size)
    avgdl = n_tokens / max(n_docs, 1)
    terms = sorted(dfs)
    idf = np.array([np.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)
                           + 1.0) for t in terms])
    mref = ray.put((np.array(terms, dtype=object), idf, avgdl))

    def score(bt: pd.DataFrame) -> pd.DataFrame:
        t, w, ad = ray.get(mref)
        bt = bt.reset_index(drop=True)
        pos, tok, lens = _explode_tokens(bt, text_col)
        ti = pd.Index(t)
        code = ti.get_indexer(tok)
        hit = code >= 0
        # tf matrix (rows x terms) from the exploded hits
        tf = np.zeros((len(bt), len(t)), dtype=np.float64)
        np.add.at(tf, (pos[hit], code[hit]), 1.0)
        dl = lens.astype(np.float64)
        denom_len = (k1 * (1.0 - b + b * dl / ad))[:, None]
        s = w[None, :] * tf * (k1 + 1.0) / (tf + denom_len)
        s = np.where(tf > 0, s, 0.0)
        total = np.rint(s * 1e6).astype(np.int64).sum(axis=1)
        return pd.DataFrame({id_col: bt[id_col].to_numpy(),
                             "bm25_micro": total})

    scored = ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=batch_size)
    return rel.top_k(scored, [("bm25_micro", True), (id_col, False)], k)
