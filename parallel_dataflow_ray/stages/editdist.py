"""Exact edit-distance (Levenshtein) near-duplicate self-join.

The missing rung between exact dedup (hash equality) and the sketch
family (MinHash / SimHash, probabilistic): pairs of documents whose
text PREFIXES are within ``max_dist`` single-byte edits, computed
EXACTLY — the oracle-SQL twin is DuckDB's ``levenshtein`` over the
same prefixes, so the driver gate is a hash match, not a recall bound.

Scale shape (PassJoin-style segment blocking — Li/Deng/Feng, VLDB'11,
public knowledge):

- Candidate generation uses the pigeonhole lemma: split a string of
  byte-length ``l`` into ``max_dist+1`` disjoint segments; any string
  within edit distance ``max_dist`` contains at least one segment as
  an EXACT substring, start position shifted by at most ``max_dist``.
  Every doc INDEXES its own segments (K+1 keys) and PROBES the
  windowed substrings for every plausible partner length
  (≤ (2K+1)·(K+1)·(2K+1) keys, constant per doc) — recall is 1 by
  construction, so the verified output is exact, never approximate.
- Only (key-hash, doc_id) pairs cross the candidate shuffle — text
  stays behind; prefixes are re-attached to the (tiny) verified
  candidate set by two bucket joins.
- Verification is a batched Levenshtein DP vectorized ACROSS pairs
  (the per-row insert chain closed with the min-accumulate trick), so
  a batch of P pairs costs P·L vectorized ops per DP row, no Python
  pair loop.

Semantics match the SQL twin bit-for-bit: the prefix is taken by
CHARACTERS (DuckDB ``substr``) and the distance computed over UTF-8
BYTES (DuckDB ``levenshtein`` is byte-level: ``levenshtein('日','a')``
= 3).  Null text reads as ``''`` (repo-wide COALESCE convention).

Reference analog: the candidate/verify split mirrors the reference's
frontier-batched two-phase executors (impls/src/parallel.rs:14-91) —
a cheap over-approximating frontier, then an exact refinement pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_HASH_MUL = np.uint64(0x9E3779B97F4A7C15)
_POLY = np.uint64(1099511628211)


def _poly_hash_cols(mat: np.ndarray, lo: int, hi: int,
                    salt: np.uint64) -> np.ndarray:
    """Vectorized polynomial hash of byte-matrix columns [lo, hi)."""
    with np.errstate(over="ignore"):
        h = np.full(mat.shape[0], salt * _HASH_MUL, np.uint64)
        for j in range(lo, hi):
            h = h * _POLY + mat[:, j].astype(np.uint64)
        return h


def _seg_bounds(l: int, k: int) -> list[tuple[int, int]]:
    """Even split of a length-l string into k+1 segments (floor
    boundaries — every segment non-empty when l >= k+1)."""
    return [(i * l // (k + 1), (i + 1) * l // (k + 1)) for i in range(k + 1)]


def _byte_matrix(texts: pd.Series, prefix_chars: int):
    """(matrix, lengths): UTF-8 bytes of the char-prefix, zero-padded."""
    bs = [s.encode("utf-8")
          for s in texts.fillna("").astype(str).str.slice(0, prefix_chars)]
    lens = np.fromiter((len(b) for b in bs), np.int64, len(bs))
    width = max(1, int(lens.max()) if len(lens) else 1)
    mat = np.zeros((len(bs), width), np.uint8)
    for r, b in enumerate(bs):                      # one memcpy per row
        mat[r, :len(b)] = np.frombuffer(b, np.uint8)
    return mat, lens


def _salt(l: int, i: int) -> np.uint64:
    return np.uint64(l * 31 + i + 1)


_SHORT_SALT = np.uint64(0xDEAD0001)


def edit_distance_pairs(docs: rd.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", prefix_chars: int = 64,
                        max_dist: int = 4,
                        num_buckets: int = 32) -> rd.Dataset:
    """All unordered doc pairs with prefix Levenshtein <= max_dist.

    Returns (doc_a, doc_b, dist) with doc_a < doc_b, dist int64 —
    column names match the oracle twin.
    """
    from .relational import bucket_join, bucketed_groupby

    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be >= 1")

    def prefixes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "__pre": b[text_col].fillna("").astype(str)
                                .str.slice(0, prefix_chars)})

    pre = docs.map_batches(prefixes, batch_format="pandas")

    def index_keys(b: pd.DataFrame) -> pd.DataFrame:
        """Each doc's own K+1 segments (plus the short-string bucket
        for byte-length <= K, where segments would be empty)."""
        mat, lens = _byte_matrix(b["__pre"], prefix_chars)
        ids = b[id_col].to_numpy(np.int64)
        keys, out_ids = [], []
        for l in np.unique(lens):
            rows = np.flatnonzero(lens == l)
            li = int(l)
            if li <= k:
                keys.append(np.full(len(rows), _SHORT_SALT * _HASH_MUL,
                                    np.uint64))
                out_ids.append(ids[rows])
                continue
            sub = mat[rows]
            for i, (s, e) in enumerate(_seg_bounds(li, k)):
                keys.append(_poly_hash_cols(sub, s, e, _salt(li, i)))
                out_ids.append(ids[rows])
        key = (np.concatenate(keys) if keys else np.empty(0, np.uint64))
        return pd.DataFrame({"__key": key.view(np.int64),
                             "doc_a": (np.concatenate(out_ids) if out_ids
                                       else np.empty(0, np.int64))})

    max_bytes = prefix_chars * 4                    # UTF-8 worst case

    def probe_keys(b: pd.DataFrame) -> pd.DataFrame:
        """Windowed substrings for every plausible partner length:
        for l in [len-K, len+K], segment i of a length-l partner may
        occur here at start(l,i) +- K."""
        mat, lens = _byte_matrix(b["__pre"], prefix_chars)
        ids = b[id_col].to_numpy(np.int64)
        keys, out_ids = [], []
        for m in np.unique(lens):
            rows = np.flatnonzero(lens == m)
            mi = int(m)
            if mi <= 2 * k:                         # short partners
                keys.append(np.full(len(rows), _SHORT_SALT * _HASH_MUL,
                                    np.uint64))
                out_ids.append(ids[rows])
            sub = mat[rows]
            for l in range(max(k + 1, mi - k), min(mi + k, max_bytes) + 1):
                for i, (s, e) in enumerate(_seg_bounds(l, k)):
                    w = e - s
                    if w > mi:
                        continue
                    for p in range(max(0, s - k), min(mi - w, s + k) + 1):
                        keys.append(_poly_hash_cols(sub, p, p + w,
                                                    _salt(l, i)))
                        out_ids.append(ids[rows])
        key = (np.concatenate(keys) if keys else np.empty(0, np.uint64))
        return pd.DataFrame({"__key": key.view(np.int64),
                             "doc_b": (np.concatenate(out_ids) if out_ids
                                       else np.empty(0, np.int64))})

    idx = pre.map_batches(index_keys, batch_format="pandas")
    prb = pre.map_batches(probe_keys, batch_format="pandas")
    cand = bucket_join(idx, prb, on="__key", num_buckets=num_buckets)

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b["doc_a"].to_numpy(np.int64)
        c = b["doc_b"].to_numpy(np.int64)
        keep = a != c
        a, c = a[keep], c[keep]
        return pd.DataFrame({"doc_a": np.minimum(a, c),
                             "doc_b": np.maximum(a, c)}).drop_duplicates()

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["doc_a", "doc_b"]].drop_duplicates()

    pairs = bucketed_groupby(cand.map_batches(canon, batch_format="pandas"),
                             ["doc_a", "doc_b"], dedup_bucket,
                             num_buckets=num_buckets)

    withA = bucket_join(pairs, pre.map_batches(
        lambda b: b.rename(columns={id_col: "doc_a", "__pre": "__pre_a"}),
        batch_format="pandas"), on="doc_a", num_buckets=num_buckets)
    withB = bucket_join(withA, pre.map_batches(
        lambda b: b.rename(columns={id_col: "doc_b", "__pre": "__pre_b"}),
        batch_format="pandas"), on="doc_b", num_buckets=num_buckets)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_a": np.empty(0, np.int64),
                                 "doc_b": np.empty(0, np.int64),
                                 "dist": np.empty(0, np.int64)})
        amat, alen = _byte_matrix(b["__pre_a"], prefix_chars)
        bmat, blen = _byte_matrix(b["__pre_b"], prefix_chars)
        dist = levenshtein_batch(amat, alen, bmat, blen)
        keep = dist <= k
        return pd.DataFrame({
            "doc_a": b["doc_a"].to_numpy(np.int64)[keep],
            "doc_b": b["doc_b"].to_numpy(np.int64)[keep],
            "dist": dist[keep].astype(np.int64)})

    return withB.map_batches(verify, batch_format="pandas")


def levenshtein_batch(amat: np.ndarray, alen: np.ndarray,
                      bmat: np.ndarray, blen: np.ndarray) -> np.ndarray:
    """Byte-level Levenshtein for P string pairs at once.

    Classic DP over rows of `a`; the row recurrence's left-to-right
    insert chain ``cur[j] = min(cand[j], cur[j-1]+1)`` closes in one
    vectorized pass via ``j + cummin(base - j)`` — so each DP row is
    O(P*L) numpy, no Python pair loop.
    """
    p = amat.shape[0]
    la_max = int(alen.max()) if p else 0
    wb = bmat.shape[1]
    j_idx = np.arange(wb + 1, dtype=np.int32)
    prev = np.tile(j_idx, (p, 1))
    for i in range(1, la_max + 1):
        active = alen >= i
        cost = (bmat != amat[:, i - 1:i]).astype(np.int32)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        base = np.concatenate(
            [np.full((p, 1), i, np.int32), cand], axis=1) - j_idx
        cur = np.minimum.accumulate(base, axis=1) + j_idx
        prev = np.where(active[:, None], cur, prev)
    return prev[np.arange(p), blen] if p else np.empty(0, np.int32)


def token_distance_adjacent(docs: rd.Dataset, *, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_tokens: int = 64,
                            num_buckets: int = 32) -> rd.Dataset:
    """WORD-level edit distance (the WER numerator) between each doc
    and its successor (``id + 1``) — the transcript-revision /
    ASR-output QA comparison, token-exact.

    Tokens are ``text.split(' ')`` with empty strings removed, first
    ``max_tokens`` kept.  Each pair is encoded per batch with a LOCAL
    vocabulary (np.unique factorize — only within-pair equality
    matters, so no global dictionary ever builds or shuffles) and all
    pairs in a batch run through the same vectorized Levenshtein DP as
    :func:`edit_distance_pairs` (``levenshtein_batch`` is
    alphabet-agnostic: int32 token ids here, bytes there).  One
    successor bucket join moves only (id, group, truncated tokens);
    output ``wer_micro = round(1e6 * dist / max(n_tokens_a, 1))``.

    Rows-only (DuckDB's ``levenshtein`` is byte-level, so no SQL twin
    exists for token alphabets — measured: ``levenshtein('',
    chr(70000))`` = 4); exactness is pytest-gated against a
    brute-force per-pair python DP (tests/test_editdist.py)."""
    from .relational import bucket_join

    def prep(prefix: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            txt = b[text_col].fillna("").astype(str)
            toks = txt.str.split(" ").map(
                lambda ws: " ".join([w for w in ws if w][:max_tokens]))
            return pd.DataFrame({
                f"doc_{prefix}": b[id_col].to_numpy(np.int64),
                f"toks_{prefix}": toks,
                "__k": b[id_col].to_numpy(np.int64)
                + (1 if prefix == "a" else 0)})
        return fn

    left = docs.map_batches(prep("a"), batch_format="pandas")
    right = docs.map_batches(prep("b"), batch_format="pandas")
    pairs = bucket_join(left, right, on="__k",
                        num_buckets=num_buckets)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "n_tokens_a": pd.Series([], dtype=np.int64),
                                 "n_tokens_b": pd.Series([], dtype=np.int64),
                                 "word_dist": pd.Series([], dtype=np.int64),
                                 "wer_micro": pd.Series([], dtype=np.int64)})
        la = [s.split(" ") if s else [] for s in b["toks_a"]]
        lb = [s.split(" ") if s else [] for s in b["toks_b"]]
        alen = np.array([len(x) for x in la], dtype=np.int64)
        blen = np.array([len(x) for x in lb], dtype=np.int64)
        vocab, codes = np.unique(
            np.concatenate([np.concatenate([np.array(x, dtype=object)
                                            for x in la + lb])
                            if (alen.sum() + blen.sum()) else
                            np.array([], dtype=object)]),
            return_inverse=True)
        p = len(b)
        amat = np.zeros((p, max(int(alen.max(initial=0)), 1)), np.int32)
        bmat = np.full((p, max(int(blen.max(initial=0)), 1)), -1, np.int32)
        off = 0
        for i, x in enumerate(la):
            amat[i, :len(x)] = codes[off:off + len(x)]
            off += len(x)
        for i, x in enumerate(lb):
            bmat[i, :len(x)] = codes[off:off + len(x)]
            off += len(x)
        dist = levenshtein_batch(amat, alen.astype(np.int32),
                                 bmat, blen.astype(np.int32))
        return pd.DataFrame({
            "doc_a": b["doc_a"].to_numpy(np.int64),
            "doc_b": b["doc_b"].to_numpy(np.int64),
            "n_tokens_a": alen, "n_tokens_b": blen,
            "word_dist": dist.astype(np.int64),
            "wer_micro": np.rint(1e6 * dist
                                 / np.maximum(alen, 1)).astype(np.int64)})

    return pairs.map_batches(verify, batch_format="pandas",
                             batch_size=4096)
