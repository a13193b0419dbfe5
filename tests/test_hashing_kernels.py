"""Vectorized sketch kernels vs naive Python-int references.

Pins the exact-mod-Mersenne MinHash family (round-1 advisor finding:
a plain uint64 ``np.outer`` wraps mod 2^64 before the mod-(2^61-1)
reduction, silently breaking the Broder universal-hash guarantee) and
the batch==single parity of every whole-batch kernel.  Pure numpy —
no Ray session needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from parallel_dataflow_ray.functions.hashing import (
    _MERSENNE, MinHasher, _mulmod_mersenne, _stable_token_hashes,
    simhash64, simhash64_batch, simhash_band_keys, simhash_band_matrix)
from parallel_dataflow_ray.functions.text import word_shingles

TEXTS = [
    "the quick brown fox jumps over the lazy dog and runs away fast",
    "",
    "one two three four five six seven",
    "solo",
    "a b",
    "repeated words repeated words repeated words repeated tokens here",
]


def test_mulmod_exact_vs_python_ints():
    rng = np.random.default_rng(7)
    a = rng.integers(1, _MERSENNE, 50, dtype=np.uint64)
    x = rng.integers(0, _MERSENNE, 37, dtype=np.uint64)
    got = _mulmod_mersenne(a, x)
    ref = np.array([[(int(ai) * int(xi)) % _MERSENNE for xi in x]
                    for ai in a], dtype=np.uint64)
    assert (got == ref).all()


def test_mulmod_boundary_values():
    p = np.uint64(_MERSENNE)
    edge = np.array([1, 2, _MERSENNE - 1, (1 << 32) - 1, 1 << 32,
                     (1 << 60) + 12345], dtype=np.uint64)
    got = _mulmod_mersenne(edge, edge)
    ref = np.array([[(int(a) * int(b)) % _MERSENNE for b in edge]
                    for a in edge], dtype=np.uint64)
    assert (got == ref).all()
    assert (got < p).all()


def test_minhash_signatures_match_naive_and_chunks():
    mh = MinHasher(num_hashes=64, shingle_k=3, seed=1337)
    sigs = mh.signatures(TEXTS)
    for i, t in enumerate(TEXTS):
        sh = word_shingles(t, 3)
        if not sh:
            assert (sigs[i] == 0xFFFFFFFF).all()
            continue
        xs = _stable_token_hashes(sh) % np.uint64(_MERSENNE)
        ref = np.array(
            [min((int(ai) * int(xi) + int(bi)) % _MERSENNE for xi in xs)
             & 0xFFFFFFFF for ai, bi in zip(mh.a, mh.b)], dtype=np.uint32)
        assert (sigs[i] == ref).all(), f"doc {i}"
        assert (mh.signature(t) == sigs[i]).all()
    # multi-chunk path (tiny budget forces several reduceat passes)
    mh2 = MinHasher(64, 3, 1337)
    mh2._CHUNK = 8
    assert (mh2.signatures(TEXTS) == sigs).all()


def test_band_keys_matrix_matches_per_signature():
    mh = MinHasher(64, 3, 1337)
    sigs = mh.signatures(TEXTS)
    for bands in (8, 16):
        bk = mh.band_keys_matrix(sigs, bands)
        for i in range(len(TEXTS)):
            assert mh.band_keys(sigs[i], bands) == bk[i].tolist()


def test_simhash_batch_matches_single_and_bands():
    hs = simhash64_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        assert int(hs[i]) == simhash64(t)
    m = simhash_band_matrix(hs, 4)
    for i, h in enumerate(hs):
        assert m[i].tolist() == [k for _, k in simhash_band_keys(int(h), 4)]


@pytest.mark.parametrize("none_like", [None, ""])
def test_empty_doc_sentinels(none_like):
    mh = MinHasher(16, 3, 1)
    sig = mh.signatures([none_like])[0]
    assert (sig == 0xFFFFFFFF).all()
    assert int(simhash64_batch([none_like])[0]) == 0
