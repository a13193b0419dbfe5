"""SimHash pair generation: the distributed vectorized path must equal
the brute-force hamming-ball pair set (for max_hamming <= 3 the 4x16-bit
band LSH is EXACT by pigeonhole), including under forced tiling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from parallel_dataflow_ray.functions.hashing import (hamming64, popcount64,
                                                     simhash64_batch)
from parallel_dataflow_ray.sources.tables import read_table
from parallel_dataflow_ray.stages import dedup as dd

SF_DIR = "/root/testdata/sf0.001"


def test_popcount64_matches_hamming64():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    got = popcount64(a ^ b)
    want = np.array([hamming64(int(x), int(y)) for x, y in zip(a, b)])
    assert (got == want).all()
    # shape-preserving on matrices
    m = popcount64(a[:5, None] ^ b[None, :5])
    assert m.shape == (5, 5)
    assert m[2, 3] == hamming64(int(a[2]), int(b[3]))


def _bruteforce_pairs(texts: list[str], ids: np.ndarray,
                      max_hamming: int) -> set[tuple[int, int, int]]:
    hs = simhash64_batch(texts)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = hamming64(int(hs[i]), int(hs[j]))
            if d <= max_hamming:
                a, b = int(ids[i]), int(ids[j])
                out.add((min(a, b), max(a, b), d))
    return out


def test_simhash_candidates_matches_bruteforce():
    docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    pdf = docs.to_pandas()
    want = _bruteforce_pairs(pdf["text"].fillna("").tolist(),
                             pdf["doc_id"].to_numpy(), max_hamming=3)
    got_df = dd.simhash_candidates(docs, max_hamming=3).to_pandas()
    got = set(zip(got_df["id_a"].astype(int), got_df["id_b"].astype(int),
                  got_df["hamming"].astype(int)))
    assert got == want
    assert len(want) > 0, "fixture should contain simhash near-dups"


def test_simhash_bucket_pairs_tiled(monkeypatch):
    """Forcing a tiny tile must not change the pair set (hot-bucket path)."""
    rng = np.random.default_rng(7)
    n = 60
    base = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    # sprinkle near-identical sketches to create hits
    base[10] = base[5] ^ np.uint64(0b101)          # hamming 2
    base[20] = base[5]                              # hamming 0
    ids = np.arange(n, dtype=np.int64)

    def collect(tile):
        monkeypatch.setattr(dd, "_SIMHASH_TILE", tile)
        outs = dd._simhash_bucket_pairs(ids, base, max_hamming=3)
        if not outs:
            return set()
        df = pd.concat(outs, ignore_index=True)
        return set(zip(df["id_a"], df["id_b"], df["hamming"]))

    full = collect(4096)
    tiled = collect(7)
    assert full == tiled
    assert (5, 10, 2) in full and (5, 20, 0) in full
