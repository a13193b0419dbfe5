"""MinHash / SimHash sketch kernels — numpy-vectorized, mergeable.

Sketches are the scale path for dedup: each is O(1)-size, computed per
batch, and mergeable across partitions (min / bit-vote), so the wide
step operates on sketches instead of documents.
"""

from __future__ import annotations

import numpy as np

from .text import word_shingles

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def _stable_token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hashes of tokens — pandas SipHash with a fixed key
    (process-independent, vectorized C; the per-byte-Python FNV loop it
    replaced was the dominant cost of MinHash/SimHash sketching)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(tokens, dtype=object),
                              hash_key="graft-paralleldf", categorize=False)


class MinHasher:
    """k-permutation MinHash over word shingles.

    Universal-hash family h_i(x) = (a_i * x + b_i) mod p, p = 2^61-1 —
    the classic Broder construction.  Instantiate ONCE per actor
    (coefficients are derived from a fixed seed, so every worker holds
    the identical family).
    """

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, seed: int = 1337):
        rng = np.random.default_rng(seed)
        self.k = num_hashes
        self.shingle_k = shingle_k
        self.a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        """uint32[k] MinHash signature."""
        sh = word_shingles(text, self.shingle_k)
        if not sh:
            return np.full(self.k, _MAX_HASH, dtype=np.uint32)
        x = _stable_token_hashes(sh) % np.uint64(_MERSENNE)
        # (k, n) matrix of permuted hashes; min over shingles
        hx = (np.outer(self.a, x) + self.b[:, None]) % np.uint64(_MERSENNE)
        return (hx.min(axis=1) & np.uint64(_MAX_HASH)).astype(np.uint32)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """LSH band hashes: split the signature into ``bands`` rows and
        hash each band — candidates share >=1 band key."""
        rows = self.k // bands
        keys = []
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            h = 0
            for v in chunk:
                h = (h * 1_000_003 + int(v)) % _MERSENNE
            keys.append(h)
        return keys


def simhash64(text: str, token_hashes: np.ndarray | None = None) -> int:
    """64-bit SimHash over word tokens (bit-vote of token hashes)."""
    tokens = text.split()
    if not tokens:
        return 0
    h = _stable_token_hashes(tokens) if token_hashes is None else token_hashes
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[tuple[int, int]]:
    """Split the 64-bit simhash into ``bands`` chunks; near-dups within
    hamming distance < bands share at least one exact chunk (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [(i, (h >> (i * width)) & mask) for i in range(bands)]
