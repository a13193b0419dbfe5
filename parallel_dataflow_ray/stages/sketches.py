"""Mergeable-sketch aggregates: distributed exact group quantiles and
HyperLogLog approximate distinct counts.

Both follow the engine-wide partial+final shape (the graft of the
reference's partial ``meet`` + exit ``meet``, impls/src/sequential.rs:
32-37,52-58): a map-side combiner collapses each batch to a tiny,
order-independent partial; a bucketed final merge folds partials per
key.  Nothing row-sized crosses the shuffle.

Quantiles are EXACT over integer-quantized values: the partial is a
per-(key, value) count — bounded by the distinct-value count of the
quantized domain, not the row count — and ``percentile_disc``
semantics (smallest value whose cumulative count reaches ``q * n``,
verified against DuckDB empirically) are recovered from the merged
count distribution.  This is the classic distributed exact quantile
for bounded domains; for unbounded/float domains swap the value map
for a fixed-width histogram and the same plumbing yields
epsilon-approximate quantiles.

HyperLogLog: p-bit register sketch (Flajolet et al., AMS 2007 HLL with
the standard small-range correction).  The partial is a 2^p-byte
register array; merge is an elementwise max — associative, commutative
and idempotent, so replays and arbitrary fold orders are safe (the
same delivery guarantees the streaming kernels are tested under).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import bucketed_groupby

# ---------------------------------------------------------------------------
# exact distributed quantiles over quantized values
# ---------------------------------------------------------------------------


def grouped_quantiles(ds: rd.Dataset, keys: list[str], val_col: str,
                      qs: list[float], out_names: list[str],
                      count_as: str | None = None,
                      num_buckets: int = 64) -> rd.Dataset:
    """Per-group ``percentile_disc`` quantiles of an int64 column.

    Map side: per-batch ``(keys, value) -> count`` (one partial row per
    distinct value per batch — the shuffle moves the value histogram,
    never the rows).  Final: merge counts per key, cumulative-sum the
    sorted value domain, read each quantile as the first value whose
    cumulative count reaches ``q * n`` (DuckDB ``percentile_disc``
    semantics, bit-compatible because both sides compute ``q * n`` with
    the same IEEE double multiply).
    """

    def local_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(keys + [val_col], as_index=False, sort=False).size()
        return out.rename(columns={"size": "__n"})

    partial = ds.map_batches(local_counts, batch_format="pandas",
                             batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in g.groupby(keys, sort=False):
            vc = sub.groupby(val_col, sort=True)["__n"].sum()
            vals = vc.index.to_numpy()
            cum = vc.to_numpy().cumsum()
            n = cum[-1]
            if not isinstance(kv, tuple):
                kv = (kv,)
            row = dict(zip(keys, kv))
            for q, name in zip(qs, out_names):
                row[name] = int(vals[np.searchsorted(cum, q * n, side="left")])
            if count_as:
                row[count_as] = int(n)
            rows.append(row)
        return pd.DataFrame(rows)

    return bucketed_groupby(partial, keys, final, num_buckets)


def grouped_quantiles_cont(ds: rd.Dataset, keys: list[str], val_col: str,
                           qs: list[float], out_names: list[str],
                           count_as: str | None = None,
                           num_buckets: int = 64) -> rd.Dataset:
    """Per-group INTERPOLATED quantiles (``percentile_cont`` semantics)
    of an int64 column, same histogram-partial shuffle as
    :func:`grouped_quantiles`.

    Read-off follows DuckDB's interpolator exactly: the target position
    is ``RN = q * (n - 1)`` over the 0-indexed sorted multiset; with
    ``FRN = floor(RN)`` / ``CRN = ceil(RN)`` the result is
    ``(CRN - RN) * v[FRN] + (RN - FRN) * v[CRN]`` (collapsing to
    ``v[FRN]`` when the position is integral).  Both ranks are read off
    the merged value histogram with one searchsorted each — the sorted
    multiset is never materialized.  Same IEEE double arithmetic on
    both sides keeps the twin bit-compatible."""
    import math

    def local_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(keys + [val_col], as_index=False, sort=False).size()
        return out.rename(columns={"size": "__n"})

    partial = ds.map_batches(local_counts, batch_format="pandas",
                             batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in g.groupby(keys, sort=False):
            vc = sub.groupby(val_col, sort=True)["__n"].sum()
            vals = vc.index.to_numpy()
            cum = vc.to_numpy().cumsum()
            n = int(cum[-1])
            if not isinstance(kv, tuple):
                kv = (kv,)
            row = dict(zip(keys, kv))
            for q, name in zip(qs, out_names):
                rn = q * (n - 1)
                frn, crn = math.floor(rn), math.ceil(rn)
                # value at 0-based rank r = first histogram value whose
                # cumulative count exceeds r
                vl = float(vals[np.searchsorted(cum, frn + 1, side="left")])
                if crn == frn:
                    row[name] = vl
                else:
                    vu = float(vals[np.searchsorted(cum, crn + 1,
                                                    side="left")])
                    row[name] = (crn - rn) * vl + (rn - frn) * vu
            if count_as:
                row[count_as] = n
            rows.append(row)
        return pd.DataFrame(rows)

    return bucketed_groupby(partial, keys, final, num_buckets)


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct
# ---------------------------------------------------------------------------

_HLL_P = 12                      # 4096 registers -> ~1.6 % std error
_HLL_M = 1 << _HLL_P


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for nonzero uint64 (6 halvings)."""
    w = w.copy()
    res = np.zeros(w.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        hi = w >> np.uint64(64 - s)
        zero = hi == np.uint64(0)
        res += np.where(zero, s, 0)
        w = np.where(zero, w << np.uint64(s), w)
    return res


def hll_registers(values) -> np.ndarray:
    """uint8[4096] register partial for one batch of values."""
    h = pd.util.hash_array(np.asarray(values, dtype=object),
                           categorize=False).astype(np.uint64)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    # sentinel bit below the register index keeps w nonzero and caps the
    # rank at 64 - p + 1 (the standard HLL trick)
    w = (h << np.uint64(_HLL_P)) | np.uint64(1 << (_HLL_P - 1))
    rank = (_clz64(w) + 1).astype(np.uint8)
    reg = np.zeros(_HLL_M, dtype=np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> int:
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)        # linear-counting small range
    return int(round(est))


def grouped_approx_distinct(ds: rd.Dataset, keys: list[str], val_col: str,
                            out: str = "approx_distinct",
                            num_buckets: int = 64) -> rd.Dataset:
    """Per-group HLL distinct-count estimate.

    Map side: one 4 KB register row per (batch, key).  Final: per-key
    elementwise-max merge + estimate.  At 100 TB the shuffle carries
    4 KB x #keys x #batches — independent of row count — and the merge
    is a np.maximum reduce; no exact-distinct shuffle of the raw values
    ever happens.
    """

    def local_sketch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in b.groupby(keys, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            row = dict(zip(keys, kv))
            row["__reg"] = hll_registers(sub[val_col].to_numpy()).tobytes()
            rows.append(row)
        return pd.DataFrame(rows)

    partial = ds.map_batches(local_sketch, batch_format="pandas",
                             batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in g.groupby(keys, sort=False):
            regs = np.frombuffer(
                b"".join(sub["__reg"].tolist()), dtype=np.uint8
            ).reshape(-1, _HLL_M)
            merged = regs.max(axis=0)
            if not isinstance(kv, tuple):
                kv = (kv,)
            row = dict(zip(keys, kv))
            row[out] = hll_estimate(merged)
            rows.append(row)
        return pd.DataFrame(rows)

    return bucketed_groupby(partial, keys, final, num_buckets)


# ---------------------------------------------------------------------------
# KLL quantile sketch: mergeable, distribution-free rank error — the
# continuous-domain companion to the exact histogram path above (whose
# partials are bounded by the quantized domain's cardinality and grow
# unboundedly on raw floats)
# ---------------------------------------------------------------------------


class KLLSketch:
    """Mergeable quantile sketch (Karnin-Lang-Liberty shape: weighted
    level buffers, randomized-offset compaction).  Items at level ``h``
    carry weight ``2**h``; a full level is sorted and every other item
    promoted.  Space is O(k · log(n/k)); empirical rank error at k=200
    is well under 1 % (asserted ≤ 2 % in tests, mirroring the HLL ≤5 %
    pattern).  Merge is level-wise concatenation + the same compaction,
    so partials fold in any order — the engine-wide partial+final shape
    (reference impls/src/sequential.rs:32-37,52-58)."""

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        # deterministic compaction offsets: a counter-hash bit stream,
        # so identical inputs give identical sketches (replay-safe)
        self._ctr = np.uint64(seed * 0x9E3779B97F4A7C15 + 1)

    def _coin(self) -> int:
        # LCG step; mod-2^64 wraparound is the point — keep numpy's
        # overflow warning out of user logs
        with np.errstate(over="ignore"):
            self._ctr = (self._ctr * np.uint64(6364136223846793005)
                         + np.uint64(1442695040888963407))
        return int(self._ctr >> np.uint64(63))

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            buf = self.levels[h]
            if buf.size <= self.k:
                h += 1
                continue
            buf = np.sort(buf)
            keep = buf[self._coin()::2]
            self.levels[h] = np.empty(0, dtype=np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], keep])
            h += 1

    def update_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compact()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, buf in enumerate(other.levels):
            if buf.size:
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        """Smallest stored value whose cumulative weight reaches q*n
        (percentile_disc shape over the weighted sample)."""
        if self.n == 0:
            return float("nan")
        vals = np.concatenate(self.levels)
        wts = np.concatenate([
            np.full(buf.size, 1 << h, dtype=np.int64)
            for h, buf in enumerate(self.levels)])
        order = np.argsort(vals, kind="mergesort")
        cum = np.cumsum(wts[order])
        i = int(np.searchsorted(cum, q * cum[-1], side="left"))
        return float(vals[order][min(i, vals.size - 1)])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, int(self._ctr),
                             [b for b in self.levels]))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "KLLSketch":
        import pickle

        k, n, ctr, levels = pickle.loads(raw)
        s = cls(k)
        s.n, s._ctr = n, np.uint64(ctr)
        s.levels = [np.asarray(b, dtype=np.float64) for b in levels]
        return s


def grouped_quantiles_approx(ds: rd.Dataset, keys: list[str], val_col: str,
                             qs: list[float], out_names: list[str],
                             count_as: str | None = None, k: int = 200,
                             num_buckets: int = 64) -> rd.Dataset:
    """Per-group approximate quantiles of a CONTINUOUS (float) column —
    the scale path when the exact per-distinct-value histogram of
    :func:`grouped_quantiles` would shuffle one row per distinct float.
    Map side: one serialized KLL sketch row per (batch, key) — bounded
    by O(k log n) bytes regardless of the value domain.  Final: per-key
    sketch merge + quantile reads."""

    def local_sketch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in b.groupby(keys, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            sk = KLLSketch(k)
            sk.update_batch(sub[val_col].to_numpy(dtype=np.float64))
            row = dict(zip(keys, kv))
            row["__kll"] = sk.to_bytes()
            row["__n"] = np.int64(sk.n)
            rows.append(row)
        return pd.DataFrame(rows)

    partial = ds.map_batches(local_sketch, batch_format="pandas",
                             batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in g.groupby(keys, sort=False):
            sk = KLLSketch(k)
            for raw in sub["__kll"]:
                sk.merge(KLLSketch.from_bytes(raw))
            if not isinstance(kv, tuple):
                kv = (kv,)
            row = dict(zip(keys, kv))
            for q, name in zip(qs, out_names):
                row[name] = sk.quantile(q)
            if count_as:
                row[count_as] = int(sub["__n"].sum())
            rows.append(row)
        return pd.DataFrame(rows)

    return bucketed_groupby(partial, keys, final, num_buckets)


# ---------------------------------------------------------------------------
# frequent items (heavy hitters): sketch candidates + exact recount
# ---------------------------------------------------------------------------


def heavy_hitters(ds: rd.Dataset, item_fn, *, item_col: str = "item",
                  count_col: str = "n_occurrences", inv_phi: int = 600,
                  num_buckets: int = 32) -> rd.Dataset:
    """EXACT frequent items: every item whose total count ``c`` satisfies
    ``c * inv_phi > n`` (frequency strictly above ``1/inv_phi``), found
    without ever shuffling the full item stream.

    Two passes over ``ds`` (the graft of the reference's partial-meet +
    exit-meet split, impls/src/sequential.rs:32-37,52-58, applied to the
    classic space-saving/Misra-Gries decomposition):

    1. **Sketch**: each batch emits its top ``2*inv_phi - 1`` items with
       their exact in-batch counts, plus one ``__is_total``-flagged row
       carrying the batch's total item count (a separate flag column, so
       every string — including "" — is a reportable item).  An item omitted from a
       batch's top-k has in-batch count <= batch_n/(k+1), so the summed
       lower bound undercounts any item by at most ``n/(k+1) = n/(2*inv_phi)``
       globally.  Partials are merged by a bucketed sum; candidates are
       the items with ``2 * inv_phi * cnt_lb >= n`` — a PROVABLE superset
       of the true heavy hitters, at most ``2*inv_phi`` of them.
    2. **Recount**: the tiny candidate list is broadcast into a second
       ``map_batches`` pass that counts ONLY candidate items exactly,
       then a bucketed sum + the exact ``c * inv_phi > n`` filter.

    The shuffle never carries more than (top-k x batches) sketch rows in
    pass 1 and (candidates x batches) rows in pass 2 — independent of
    the item-stream length, so the 100 TB cost is two streaming reads.

    ``item_fn(batch: pd.DataFrame) -> pd.Series`` extracts the item
    stream from a batch (vectorized; e.g. exploded word bigrams).
    """
    capacity = 2 * inv_phi - 1

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        items = item_fn(b)
        vc = items.value_counts().head(capacity)
        # per-batch total rides in a separate flag column, NOT an
        # in-band sentinel value — any string (incl. "") is a valid item
        out = pd.DataFrame({item_col: vc.index.astype(str),
                            "__cnt": vc.to_numpy(np.int64),
                            "__is_total": False})
        total = pd.DataFrame({item_col: [""],
                              "__cnt": np.array([len(items)], np.int64),
                              "__is_total": True})
        return pd.concat([out, total], ignore_index=True)

    sketch = ds.map_batches(local_topk, batch_format="pandas",
                            batch_size=65536)
    summed = bucketed_groupby(
        sketch, [item_col, "__is_total"],
        lambda g: g.groupby([item_col, "__is_total"], as_index=False,
                            sort=False)["__cnt"].sum(),
        num_buckets=num_buckets)

    # materialize the (small) summed partials once: read the total
    # n, then cut candidates DISTRIBUTED — the driver only ever pulls
    # the total row and the <= 2*inv_phi candidate rows, never the
    # full sketched-item table.
    summed = summed.materialize()
    n = int(summed.map_batches(
        lambda g: g[g["__is_total"]], batch_format="pandas"
    ).to_pandas()["__cnt"].sum())
    cand = summed.map_batches(
        lambda g: g.loc[(~g["__is_total"])
                        & (2 * inv_phi * g["__cnt"] >= n), [item_col]],
        batch_format="pandas").to_pandas()
    candidates = set(cand[item_col].tolist())

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        items = item_fn(b)
        vc = items[items.isin(candidates)].value_counts()
        return pd.DataFrame({item_col: vc.index.astype(str),
                             "__cnt": vc.to_numpy(np.int64)})

    exact = ds.map_batches(recount, batch_format="pandas", batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(item_col, as_index=False, sort=False)["__cnt"].sum()
        out = out[out["__cnt"] * inv_phi > n]
        return out.rename(columns={"__cnt": count_col})

    return bucketed_groupby(exact, [item_col], final,
                            num_buckets=num_buckets)


def explode_bigrams(b: pd.DataFrame, text_col: str = "text") -> pd.Series:
    """Word-bigram stream of a batch, matching DuckDB
    ``ws[i] || ' ' || ws[i+1]`` over ``string_split(text, ' ')``
    exactly (single-space split, empty tokens preserved)."""
    ex = b[text_col].fillna("").str.split(" ").explode()
    w = ex.to_numpy()
    if len(w) < 2:
        return pd.Series([], dtype=object)
    doc = ex.index.to_numpy()
    valid = doc[:-1] == doc[1:]
    left = pd.Series(w[:-1][valid], dtype=object)
    right = pd.Series(w[1:][valid], dtype=object)
    return left.str.cat(right, sep=" ")


# ---------------------------------------------------------------------------
# Bloom filter: mergeable bit-set membership sketch — the broadcast
# pre-filter for existence probes whose build side is small relative to
# the probe side (an eval suite's shingles probing a 100 TB training
# corpus).  Same partial+final shape as HLL above: the per-batch
# partial is an m-bit bitmap, merge is bitwise OR (associative,
# commutative, idempotent — replay/fold-order safe).  No false
# negatives ever; false-positive rate ~= (1 - e^{-kn/m})^k.
# ---------------------------------------------------------------------------

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions per uint64 hash, Kirsch-Mitzenmacher double
    hashing: pos_i = (h1 + i * h2) mod m with h2 forced odd.  Inputs are
    already high-quality 64-bit hashes (SipHash fingerprints), so no
    re-hash pass is needed."""
    h = np.asarray(h, dtype=np.uint64)
    m = np.uint64(m_bits)
    h1 = h % m
    h2 = (((h >> np.uint64(33)) ^ (h * _BLOOM_MIX)) | np.uint64(1)) % m
    i = np.arange(k, dtype=np.uint64)[:, None]
    # h1 < m, i * h2 < k * m: far below 2^64 for any sane (m, k)
    return (h1[None, :] + i * h2) % m


def bloom_partial(values: np.ndarray, m_bits: int = 1 << 23,
                  k: int = 4) -> np.ndarray:
    """uint8[m_bits/8] bitmap partial for one batch of int64/uint64
    hash values."""
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    v = np.asarray(values)
    if v.size:
        pos = _bloom_positions(v.view(np.uint64), m_bits, k).ravel()
        np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).astype(np.uint8)))
    return bm


def bloom_build(ds: rd.Dataset, col: str, *, m_bits: int = 1 << 23,
                k: int = 4) -> np.ndarray:
    """Distributed Bloom build over ``ds[col]`` (int64 hash column):
    one bitmap partial per batch, OR-merged on the driver.  Driver
    memory is O(#batches x m/8) transiently and O(m/8) after the
    reduce — by contract the BUILD side is the small side (the caller
    broadcasts the result), so this is bounded the way HLL's register
    partials are, not by the probe corpus."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bm = bloom_partial(b[col].to_numpy(np.int64), m_bits, k)
        return pd.DataFrame({"__bloom": [bm.tobytes()]})

    rows = ds.map_batches(partial, batch_format="pandas",
                          batch_size=65536).take_all()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in rows:
        np.bitwise_or(out, np.frombuffer(r["__bloom"], dtype=np.uint8),
                      out=out)
    return out


def bloom_probe_mask(values: np.ndarray, bitmap: np.ndarray,
                     m_bits: int, k: int) -> np.ndarray:
    """bool[n] membership mask (True = possibly present; False =
    definitely absent) — one vectorized gather per hash function."""
    v = np.asarray(values)
    if v.size == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(v.view(np.uint64), m_bits, k)
    byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
    bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return bit.all(axis=0)
