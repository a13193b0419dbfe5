"""Distributed k-means (stages/similarity.py kmeans_fit/kmeans_assign).

The quantized-integer partial sums make the reduction order-independent,
so the distributed fit must be BIT-IDENTICAL to a driver-local twin and
invariant to partitioning — the same determinism discipline as the
streaming aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.sampling import reservoir_sample
from parallel_dataflow_ray.stages.similarity import (
    _stack, kmeans_assign, kmeans_fit,
)

DIM, N, K, ITERS, SEED, QB = 16, 2000, 6, 4, 7, 20


def _vecs(n=N, dim=DIM, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K, dim))
    X = centers[rng.integers(0, K, n)] + 0.3 * rng.normal(size=(n, dim))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [r.astype(np.float32) for r in X]})


def _local_twin(df: pd.DataFrame, C0: np.ndarray, iters: int, q_bits: int):
    """Driver-local re-implementation of the same quantized update."""
    Q = np.int64(1) << q_bits
    X = _stack(df, "embedding")
    C = C0.copy()
    hist = []
    for _ in range(iters):
        cos = X @ C.T
        a = np.argmax(cos, axis=1)
        best_q = np.rint(cos[np.arange(len(a)), a] * Q).astype(np.int64)
        Xq = np.rint(X * Q).astype(np.int64)
        sums = np.zeros((C.shape[0], X.shape[1]), dtype=np.int64)
        np.add.at(sums, a, Xq)
        cnt = np.bincount(a, minlength=C.shape[0]).astype(np.int64)
        hist.append(int((Q - best_q).sum()))
        touched = cnt > 0
        mean = sums[touched].astype(np.float64) / float(Q) \
            / cnt[touched][:, None]
        mean /= np.maximum(np.linalg.norm(mean, axis=1, keepdims=True), 1e-12)
        C[touched] = mean
    return C, hist


def test_distributed_fit_equals_local_twin_bitexact():
    df = _vecs()
    ds = rd.from_pandas(df).repartition(7)
    C, hist = kmeans_fit(ds, K, iters=ITERS, seed=SEED, q_bits=QB)
    init = reservoir_sample(ds, K, id_col="vec_id", seed=SEED
                            ).to_pandas().sort_values("vec_id")
    C0 = _stack(init, "embedding")
    Cl, hl = _local_twin(df, C0, ITERS, QB)
    np.testing.assert_array_equal(C, Cl)         # bit-identical, not close
    assert hist["inertia_q"].tolist() == hl


def test_partition_invariance():
    df = _vecs()
    fits = [kmeans_fit(rd.from_pandas(df).repartition(p), K,
                       iters=3, seed=SEED, q_bits=QB)[0]
            for p in (2, 13)]
    np.testing.assert_array_equal(fits[0], fits[1])


def test_inertia_non_increasing():
    ds = rd.from_pandas(_vecs())
    _, hist = kmeans_fit(ds, K, iters=5, seed=SEED, q_bits=QB)
    v = hist["inertia_q"].to_numpy()
    # quantization can wobble the objective by O(n) units on a ~n*2^20
    # scale; require monotone within that noise bound
    assert (np.diff(v) <= N).all(), v.tolist()


def test_assign_covers_all_and_matches_fit_labels():
    df = _vecs()
    ds = rd.from_pandas(df).repartition(5)
    C, _ = kmeans_fit(ds, K, iters=2, seed=SEED, q_bits=QB)
    lab = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    assert len(lab) == len(df)
    X = _stack(df, "embedding")
    want = np.argmax(X @ C.T, axis=1)
    np.testing.assert_array_equal(lab["cluster"].to_numpy(), want)
