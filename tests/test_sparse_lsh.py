"""Sparse 5-of-6 subset LSH + identical-sketch collapse in
``hamming_pairs`` — the round-4 fix for the audio near-dup hot bucket
(round-3 measured: 93% of clips in ONE 16-bit chunk-band bucket ->
single-task quadratic popcount).

Contracts:
- scheme="sparse_topk" pair set == brute-force hamming ball (exact for
  max_hamming <= 3, by the even-distance / shared-5-subset argument);
- identical sketches are collapsed before distance work, so a corpus
  that is ONE sketch repeated many times finishes in seconds;
- clique_cap declines oversized cliques into star edges with IDENTICAL
  connected components, and hamming_clique_stats reports exactly what
  was declined (no silent caps).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from parallel_dataflow_ray.stages import dedup as dd


def _rand_sparse6(rng: np.random.Generator, n: int) -> np.ndarray:
    """n random 6-of-64-bit fingerprints (the audio sketch's shape)."""
    out = np.zeros(n, np.uint64)
    for i in range(n):
        pos = rng.choice(64, size=6, replace=False)
        out[i] = np.bitwise_or.reduce(np.uint64(1) << pos.astype(np.uint64))
    return out


def _flip_pair(rng: np.random.Generator, h: np.uint64) -> np.uint64:
    """A sketch at hamming distance 2: move one set bit elsewhere."""
    pos = np.flatnonzero([(int(h) >> b) & 1 for b in range(64)])
    clear = rng.choice(pos)
    zeros = np.setdiff1d(np.arange(64), pos)
    setb = rng.choice(zeros)
    return np.uint64(int(h) ^ (1 << int(clear)) ^ (1 << int(setb)))


def _brute(ids: np.ndarray, hs: np.ndarray, max_h: int) -> set:
    out = set()
    for i in range(ids.size):
        for j in range(i + 1, ids.size):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= max_h:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b, d))
    return out


def _fixture(n=120, seed=11):
    rng = np.random.default_rng(seed)
    hs = _rand_sparse6(rng, n)
    # plant near pairs (distance 2) and identical-sketch cliques
    for i in range(0, n, 10):
        hs[i + 1] = _flip_pair(rng, hs[i])
    hs[3] = hs[13] = hs[23]            # a 3-clique
    hs[7] = hs[47]                     # a 2-clique
    ids = np.arange(n, dtype=np.int64) * 7 + 1   # non-contiguous ids
    return ids, hs


def _run(ids, hs, **kw) -> set:
    sk = rd.from_pandas(pd.DataFrame(
        {"doc_id": ids, "simhash": hs.view(np.int64)})).repartition(5)
    got = dd.hamming_pairs(sk, id_col="doc_id", hash_col="simhash",
                           max_hamming=3, **kw).to_pandas()
    return set(zip(got["id_a"].astype(int), got["id_b"].astype(int),
                   got["hamming"].astype(int)))


def test_sparse_topk_equals_bruteforce(ray_session):
    ids, hs = _fixture()
    want = _brute(ids, hs, 3)
    got = _run(ids, hs, scheme="sparse_topk")
    assert got == want
    assert len(want) >= 12          # planted pairs + cliques actually hit


def test_sparse_equals_chunk16_on_sparse_sketches(ray_session):
    """Both schemes are exact -> identical pair sets on the same input."""
    ids, hs = _fixture(n=80, seed=5)
    assert _run(ids, hs, scheme="sparse_topk") == _run(ids, hs,
                                                       scheme="chunk16")


def test_sparse_subset_keys_shared_subset():
    """Distance-2 equal-popcount sketches share exactly one subset key;
    identical sketches share all six."""
    rng = np.random.default_rng(3)
    a = _rand_sparse6(rng, 1)[0]
    b = _flip_pair(rng, a)
    ka = set(dd._sparse_subset_keys(np.array([a]))[0].tolist())
    kb = set(dd._sparse_subset_keys(np.array([b]))[0].tolist())
    assert len(ka) == 6 and len(kb) == 6
    assert len(ka & kb) == 1
    assert ka == set(dd._sparse_subset_keys(np.array([a]))[0].tolist())


def test_sparse_rejects_variable_popcount():
    with pytest.raises(ValueError, match="constant popcount"):
        dd._sparse_subset_keys(np.array([np.uint64(0b111)]))
    sk = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2],
                                      "simhash": [3, 63]}))
    with pytest.raises(Exception):
        dd.hamming_pairs(sk, scheme="sparse_topk").to_pandas()


def test_identical_sketch_stress_completes_fast(ray_session):
    """100k rows of ONE sketch: collapse means zero popcount work and
    clique_cap means O(n) star output — must complete in seconds (the
    uncollapsed form would emit 5e9 pairs)."""
    n = 100_000
    h = _rand_sparse6(np.random.default_rng(1), 1)[0]
    ids = np.arange(n, dtype=np.int64)
    sk = rd.from_pandas(pd.DataFrame(
        {"doc_id": ids, "simhash": np.full(n, h).view(np.int64)}))
    t0 = time.perf_counter()
    got = dd.hamming_pairs(sk, id_col="doc_id", hash_col="simhash",
                           scheme="sparse_topk",
                           clique_cap=10_000).to_pandas()
    dt = time.perf_counter() - t0
    assert dt < 60, f"stress took {dt:.1f}s"
    # star: min id -> every other member, hamming 0
    assert len(got) == n - 1
    assert (got["id_a"] == 0).all()
    assert (got["hamming"] == 0).all()
    assert set(got["id_b"]) == set(range(1, n))


def test_clique_cap_preserves_components(ray_session):
    """Capped output must yield the same connected components as the
    exact pair set."""
    ids, hs = _fixture(n=60, seed=9)
    # widen a clique so the cap bites: 10 identical sketches
    hs[40:50] = hs[40]
    exact = _run(ids, hs, scheme="sparse_topk")
    capped = _run(ids, hs, scheme="sparse_topk", clique_cap=3)

    def components(pairs):
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, _ in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {frozenset(i for i in parent if find(i) == r)
                for r in {find(i) for i in parent}}

    assert components(capped) == components(exact)
    assert len(capped) < len(exact)          # the cap actually declined


def test_hamming_clique_stats(ray_session):
    ids, hs = _fixture(n=60, seed=9)
    hs[40:50] = hs[40]
    sk = rd.from_pandas(pd.DataFrame(
        {"doc_id": ids, "simhash": hs.view(np.int64)}))
    st = dd.hamming_clique_stats(sk, hash_col="simhash", clique_cap=3)
    assert int(st["n_rows"].iloc[0]) == 60
    assert int(st["max_clique"].iloc[0]) == 10
    # the 10-clique has 45 pairs > cap 3 -> declines 45 - 9 = 36
    assert int(st["declined_pairs"].iloc[0]) == 36
    st_nocap = dd.hamming_clique_stats(sk, hash_col="simhash")
    assert int(st_nocap["declined_pairs"].iloc[0]) == 0
    assert int(st_nocap["clique_pairs"].iloc[0]) >= 45


def test_chunk16_identical_collapse_unchanged(ray_session):
    """Text-side (chunk16) behavior with cliques: exact pair set is
    unchanged by the internal collapse."""
    rng = np.random.default_rng(21)
    n = 50
    hs = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    hs[10] = hs[5] ^ np.uint64(0b101)
    hs[20] = hs[5]
    hs[30] = hs[5]
    ids = np.arange(n, dtype=np.int64)
    want = _brute(ids, hs, 3)
    got = _run(ids, hs, scheme="chunk16")
    assert got == want
