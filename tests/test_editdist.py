"""Exact edit-distance near-dup join (stages/editdist.py).

The blocking must have recall 1 (pigeonhole segments) and the batched
DP must equal a reference Levenshtein — together the pipeline output
must EQUAL the brute-force O(n^2) pair set, including unicode
(byte-level distance, char-level prefix — DuckDB twin semantics),
null text, and strings short enough to defeat segmentation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.editdist import (
    _byte_matrix, edit_distance_pairs, levenshtein_batch,
)


def _lev_ref(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i]
        for j in range(1, len(b) + 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (a[i - 1] != b[j - 1])))
        prev = cur
    return prev[-1]


def _brute(texts: dict[int, str], k: int, prefix: int) -> set:
    pre = {i: t[:prefix].encode("utf-8") for i, t in texts.items()}
    ids = sorted(pre)
    out = set()
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            d = _lev_ref(pre[a], pre[b])
            if d <= k:
                out.add((a, b, d))
    return out


def _corpus(seed=0, n=120) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    words = ["join", "scan", "sort", "merge", "key", "日本", "batch", "row"]
    texts = {}
    for i in range(n):
        base = " ".join(rng.choice(words, rng.integers(3, 14)))
        texts[i] = base
    # planted near-dups: small in-place edits of earlier docs
    for i in range(n, n + 20):
        src = texts[int(rng.integers(0, n))]
        pos = int(rng.integers(0, max(1, len(src))))
        texts[i] = src[:pos] + "x" * int(rng.integers(0, 4)) + src[pos:]
    # pathological shorts (segmentation would produce empty segments)
    texts[n + 20] = ""
    texts[n + 21] = "ab"
    texts[n + 22] = "abcd"
    return texts


def test_batched_dp_equals_reference():
    rng = np.random.default_rng(3)
    A = ["".join(map(chr, rng.integers(97, 123, rng.integers(0, 20))))
         for _ in range(200)]
    B = ["".join(map(chr, rng.integers(97, 123, rng.integers(0, 20))))
         for _ in range(200)]
    am, al = _byte_matrix(pd.Series(A), 64)
    bm, bl = _byte_matrix(pd.Series(B), 64)
    got = levenshtein_batch(am, al, bm, bl)
    want = [_lev_ref(a.encode(), b.encode()) for a, b in zip(A, B)]
    assert got.tolist() == want


def test_pipeline_equals_brute_force(ray_session):
    texts = _corpus()
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = rd.from_pandas(df).repartition(5)
    out = edit_distance_pairs(ds, prefix_chars=64, max_dist=4).to_pandas()
    got = set(zip(out.doc_a, out.doc_b, out.dist))
    assert got == _brute(texts, 4, 64)


def test_null_text_reads_as_empty(ray_session):
    df = pd.DataFrame({"doc_id": np.int64([1, 2, 3]),
                       "text": [None, "", "abc"]})
    out = edit_distance_pairs(rd.from_pandas(df), max_dist=4).to_pandas()
    got = set(zip(out.doc_a, out.doc_b, out.dist))
    assert got == {(1, 2, 0), (1, 3, 3), (2, 3, 3)}


def test_unicode_byte_level_distance(ray_session):
    # DuckDB levenshtein('日','a') = 3 (bytes); blocking must still
    # find the pair and the dist column must be the BYTE distance
    df = pd.DataFrame({"doc_id": np.int64([1, 2]),
                       "text": ["日本語のテキスト", "日本語のテキスト!"]})
    out = edit_distance_pairs(rd.from_pandas(df), max_dist=4).to_pandas()
    assert [(r.doc_a, r.doc_b, r.dist) for r in out.itertuples()] == [(1, 2, 1)]


def _wer_ref(a: list[str], b: list[str]) -> int:
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i]
        for j, wb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (wa != wb)))
        prev = cur
    return prev[-1]


def test_token_distance_adjacent_equals_bruteforce(ray_session):
    from parallel_dataflow_ray.stages.editdist import \
        token_distance_adjacent

    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 90)))
             for _ in range(80)]
    texts[10] = ""          # empty doc
    texts[11] = None        # null doc
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                       "text": texts})
    out = token_distance_adjacent(rd.from_pandas(df).repartition(6),
                                  max_tokens=64).to_pandas() \
        .sort_values("doc_a", ignore_index=True)
    assert len(out) == 79
    toks = [[w for w in (t or "").split(" ") if w][:64] for t in texts]
    for r in out.itertuples():
        want = _wer_ref(toks[r.doc_a], toks[r.doc_b])
        assert r.word_dist == want, (r.doc_a, r.doc_b)
        assert r.n_tokens_a == len(toks[r.doc_a])
        assert r.n_tokens_b == len(toks[r.doc_b])
        assert r.wer_micro == int(np.rint(
            1e6 * want / max(len(toks[r.doc_a]), 1)))


def test_token_distance_word_not_char_semantics(ray_session):
    """'aa ab' vs 'aa ac': ONE word substitution (char distance would
    be 1 as well here, so also check a swap where they diverge)."""
    from parallel_dataflow_ray.stages.editdist import \
        token_distance_adjacent

    df = pd.DataFrame({
        "doc_id": np.int64([0, 1, 2]),
        "text": ["hello world foo", "hello universe foo",
                 "universe hello foo"]})
    out = token_distance_adjacent(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_a", ignore_index=True)
    # one substitution; then one transposition = 2 word edits
    assert out["word_dist"].tolist() == [1, 2]
