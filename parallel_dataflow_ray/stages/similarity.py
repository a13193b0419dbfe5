"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and an IVF-bucketed approximate variant (scale path).

Brute force: the query matrix is broadcast once (``ray.put``); every
``map_batches`` task computes a (batch x queries) float64 matmul and
emits only its local top-k per query; a final tiny merge selects the
global top-k.  No full similarity matrix ever exists.

IVF: k-means-ish coarse centroids (deterministic seed, few Lloyd
rounds on a sample), assign each vector to its nearest centroid inside
``map_batches``, search only the ``nprobe`` closest centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _stack(batch: pd.DataFrame, vec_col: str) -> np.ndarray:
    m = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds: rd.Dataset, queries: np.ndarray, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_self: bool = True) -> pd.DataFrame:
    """Exact cosine top-k. Returns (query_id, rank, vec_id, cos_milli)."""
    Q = queries.astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(Q)

    class LocalTopK:
        def __init__(self):
            self.Q = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _stack(batch, vec_col)
            ids = batch[id_col].to_numpy()
            sim = X @ self.Q.T  # (n, q)
            kk = min(k + 1, sim.shape[0])
            top = np.argpartition(-sim, kk - 1, axis=0)[:kk]
            rows = []
            for q in range(sim.shape[1]):
                for i in top[:, q]:
                    rows.append((q, ids[i], sim[i, q]))
            return pd.DataFrame(rows, columns=["query_id", id_col, "cos"])

    local = ds.map_batches(LocalTopK, batch_format="pandas", batch_size=4096,
                           concurrency=(1, 8)).to_pandas()
    out = []
    for q, g in local.groupby("query_id"):
        g = g.sort_values(["cos", id_col], ascending=[False, True])
        if exclude_self:
            g = g[g[id_col] != q]
        g = g.head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cos_milli"] = np.rint(res["cos"] * 1000).astype(np.int64)
    return res[["query_id", "rank", id_col, "cos_milli"]]


def train_centroids(ds: rd.Dataset, n_centroids: int, vec_col: str = "embedding",
                    sample: int = 4096, iters: int = 5, seed: int = 7,
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic mini k-means on an UNBIASED driver-side sample
    (hash-priority reservoir over the whole dataset — a ``limit()``
    sample only saw the first blocks)."""
    from .sampling import reservoir_sample

    X = _stack(reservoir_sample(ds, sample, id_col=id_col, seed=seed)
               .to_pandas(), vec_col)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            m = X[assign == c]
            if len(m):
                v = m.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_topk(ds: rd.Dataset, queries: np.ndarray, k: int, *,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Approximate top-k: search only vectors whose centroid is among the
    query's ``nprobe`` nearest.  Same output schema as brute force."""
    C = train_centroids(ds, n_centroids, vec_col)
    cref = ray.put(C)
    Q = queries.astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    allowed = [set(map(int, row)) for row in probe]
    aref = ray.put(allowed)
    qref = ray.put(Q)

    class ProbedTopK:
        def __init__(self):
            self.C = ray.get(cref)
            self.allowed = ray.get(aref)
            self.Q = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _stack(batch, vec_col)
            ids = batch[id_col].to_numpy()
            cent = np.argmax(X @ self.C.T, axis=1)
            sim = X @ self.Q.T
            rows = []
            for q in range(self.Q.shape[0]):
                mask = np.fromiter((int(c) in self.allowed[q] for c in cent),
                                   dtype=bool, count=cent.size)
                idx = np.nonzero(mask)[0]
                if idx.size == 0:
                    continue
                kk = min(k + 1, idx.size)
                loc = idx[np.argpartition(-sim[idx, q], kk - 1)[:kk]]
                rows.extend((q, ids[i], sim[i, q]) for i in loc)
            return pd.DataFrame(rows, columns=["query_id", id_col, "cos"])

    local = ds.map_batches(ProbedTopK, batch_format="pandas", batch_size=4096,
                           concurrency=(1, 8)).to_pandas()
    out = []
    for q, g in local.groupby("query_id"):
        g = g.sort_values(["cos", id_col], ascending=[False, True])
        g = g[g[id_col] != q].head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", id_col, "cos", "rank"])
    res["cos_milli"] = np.rint(res["cos"].astype(float) * 1000).astype(np.int64)
    return res[["query_id", "rank", id_col, "cos_milli"]]
