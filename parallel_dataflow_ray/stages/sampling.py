"""Deterministic sampling operators — reproducible across runs, workers,
and cluster sizes (SURVEY §2.4 "sorts / limits / top-k / sampling").

All three samplers key off the same multiplicative hash
``h(id) = ((id mod 2^32) * 2654435761 + seed) mod 2^32`` (Knuth's
golden-ratio constant) — chosen over SipHash because it is exactly
expressible in ANSI SQL, so every sampler has a bit-exact DuckDB
oracle.  Exact reproducibility is what makes sampling safe in a
resumable pipeline: a retried task keeps the same rows.

- ``hash_sample``      Bernoulli-by-hash: keep rows with h%1000 < frac_milli.
                       Pure filter inside map_batches — no shuffle, no state.
- ``reservoir_sample`` global fixed-size n: smallest-n by (h, id) via
                       block-local top-k + tiny driver merge (the
                       distributed equivalent of a reservoir; no full sort).
- ``stratified_sample`` per-stratum ceil(frac*n_key) rows by smallest (h, id)
                       within each key — one bucketed shuffle on the key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_KNUTH = 2654435761
_M32 = np.uint64(1 << 32)


def mult_hash(ids, seed: int = 0) -> np.ndarray:
    """uint64 in [0, 2^32): ((id % 2^32) * 2654435761 + seed) % 2^32.
    Products stay < 2^64, so numpy uint64 and SQL UBIGINT agree exactly."""
    x = np.asarray(ids).astype(np.uint64) % _M32
    return (x * np.uint64(_KNUTH) + np.uint64(seed)) % _M32


def hash_sample(ds: rd.Dataset, frac_milli: int, *, id_col: str,
                seed: int = 0) -> rd.Dataset:
    """Keep rows whose hash lands below ``frac_milli``/1000 — ~frac of
    the data, embarrassingly parallel, zero-shuffle."""
    def filt(t: pa.Table) -> pa.Table:
        h = mult_hash(t[id_col].to_numpy(), seed)
        return t.filter(pa.array((h % np.uint64(1000)) < frac_milli))

    return ds.map_batches(filt, batch_format="pyarrow")


def reservoir_sample(ds: rd.Dataset, n: int, *, id_col: str,
                     seed: int = 0) -> pa.Table:
    """Global deterministic n-row sample: the n rows with the smallest
    (hash, id).  Block-local top-k inside map_batches + one tiny merge —
    never a global sort of the dataset."""
    from .relational import top_k

    def pri(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__pri", pa.array(mult_hash(t[id_col].to_numpy(), seed)
                              .astype(np.int64)))

    small = top_k(ds.map_batches(pri, batch_format="pyarrow"),
                  [("__pri", False), (id_col, False)], n)
    return small.drop_columns(["__pri"])


def stratified_sample(ds: rd.Dataset, key: str, frac_milli: int, *,
                      id_col: str, seed: int = 0) -> rd.Dataset:
    """Exactly ``ceil(frac * n_key)`` rows per stratum (integer-exact:
    k = (n*frac_milli + 999) // 1000), picked as the smallest (hash, id)
    within the key.  One bucketed shuffle on the stratum key."""
    from .relational import bucketed_groupby

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(key, sort=False):
            k = (len(sub) * frac_milli + 999) // 1000
            pri = mult_hash(sub[id_col].to_numpy(), seed)
            order = np.lexsort((sub[id_col].to_numpy(), pri))
            outs.append(sub.iloc[order[:k]])
        return pd.concat(outs, ignore_index=True)

    return bucketed_groupby(ds, [key], per_key)


def split_by_hash(ds: rd.Dataset, bounds: list[tuple[str, int]], *,
                  id_col: str, seed: int = 0) -> rd.Dataset:
    """Deterministic train/val/test split labelling: row goes to the
    first bucket whose upper bound (in 1/1000ths, cumulative) exceeds
    ``h(id) % 1000`` — e.g. ``[("train", 800), ("val", 900),
    ("test", 1000)]`` is an 80/10/10 split.  Pure map, zero shuffle,
    and exactly reproducible: a retried task, a different cluster size,
    or a later incremental run labels every row identically — the
    property that keeps eval rows out of the training set forever."""
    names = np.array([n for n, _ in bounds], dtype=object)
    uppers = np.array([u for _, u in bounds], dtype=np.int64)
    if uppers[-1] != 1000:
        raise ValueError("split bounds must be cumulative and end at 1000")

    def lab(b: pd.DataFrame) -> pd.DataFrame:
        h = (mult_hash(b[id_col].to_numpy(), seed)
             % np.uint64(1000)).astype(np.int64)
        b = b.copy()
        b["split"] = names[np.searchsorted(uppers, h, side="right")]
        return b

    return ds.map_batches(lab, batch_format="pandas")


def cap_per_key(ds: rd.Dataset, key: str, k: int, *, id_col: str,
                seed: int = 0) -> rd.Dataset:
    """Per-source cap rebalancing (the data-mixing half of sampling):
    keep at most ``k`` rows per key — the smallest (hash, id) within
    each — so over-represented sources are down-sampled
    deterministically while small sources pass through whole.  One
    bucketed shuffle on the key; the per-bucket kernel is one mergesort
    + cumcount (no per-stratum Python loop)."""
    from .relational import bucketed_groupby

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        pri = mult_hash(g[id_col].to_numpy(), seed).astype(np.int64)
        g = g.assign(__pri=pri).sort_values([key, "__pri", id_col],
                                            kind="mergesort")
        rank = g.groupby(key, sort=False).cumcount().to_numpy()
        return g[rank < k].drop(columns="__pri")

    return bucketed_groupby(ds, [key], per_key)


def cap_budget_per_key(ds: rd.Dataset, key: str, budget: int, *,
                       weight_col: str, order_cols: list[str]
                       ) -> rd.Dataset:
    """Per-key WEIGHTED budget cap — the duration-hours analog of
    :func:`cap_per_key`: within each key, keep the prefix of rows (in
    ``order_cols`` order, which must totally order the key's rows for
    determinism) while the running total of ``weight_col`` BEFORE the
    row is still under ``budget``.  The row that crosses the budget is
    kept (the budget is "exhausted by" it), everything after is
    dropped — the standard anti-skew curation shape for audio corpora
    ("cap every speaker at N minutes, keep their earliest clips"), and
    the exact distributed twin of SQL's
    ``SUM(w) OVER (PARTITION BY key ORDER BY ... ) - w < budget``.

    One bucketed shuffle on the key; per bucket a mergesort + grouped
    cumsum (vectorized, no per-key Python loop).  A hot key costs
    O(its rows) in one task — linear, unlike pair-generation skew.
    Output adds ``cum_<weight_col>`` (the inclusive running total) so
    consumers can see how much budget each survivor consumed."""
    from .relational import bucketed_groupby

    cum_col = f"cum_{weight_col}"

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort")
        w = g[weight_col].to_numpy()
        cum = g.groupby(key, sort=False)[weight_col].cumsum().to_numpy()
        keep = (cum - w) < budget
        out = g.loc[keep].copy()
        out[cum_col] = cum[keep]
        return out

    return bucketed_groupby(ds, [key], per_key)


def weighted_systematic_sample(ds: rd.Dataset, k: int, *, id_col: str,
                               weight_col: str,
                               range_size: int = 1024) -> rd.Dataset:
    """Weighted systematic (stride) sampling — integer-exact, SQL-gated.

    Lay the rows out on the weight axis in ``id_col`` order (the
    cumulative-weight line), cut it every ``stride = total_weight //
    k`` units, and keep each row whose weight interval covers >= 1
    cut, with ``n_hits`` = number of cuts covered (a row heavier than
    the stride draws multiple times — importance sampling with
    replacement, the deterministic mixture-weighting shape an LM data
    pipeline uses to up/down-weight sources).  Inclusion count is
    proportional to weight by construction and reproducible across
    runs, partitionings, and retries — no RNG anywhere, so the DuckDB
    twin (a window SUM) gates it bit-exactly.  Cuts sit at stride,
    2*stride, ...; a row with exclusive-prefix ``cb`` and weight ``w``
    covers the cuts in the half-open interval (cb, cb+w], i.e.
    ``(cb+w)//stride - cb//stride`` of them.

    Scale shape: the same two-pass distributed prefix scan as
    ``token_shards`` (stages/packing.py) — per-range totals (one tiny
    row per range reaches the driver), exclusive offsets broadcast via
    ``ray.put``, per-range local cumsum.  The corpus shuffles once (by
    range bucket) and never materializes.

    Output: (id, weight, n_hits), n_hits >= 1, in id order per range.
    """
    import ray

    from .relational import bucketed_groupby, grouped_sum

    if k < 1:
        raise ValueError("k must be >= 1")

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, weight_col]].copy()
        b["__range"] = b[id_col].to_numpy() // range_size
        return b

    tagged = ds.map_batches(tag, batch_format="pandas")

    # pass 1: per-range totals -> exclusive offsets + grand total
    totals = grouped_sum(
        tagged.map_batches(
            lambda b: b.rename(columns={weight_col: "__w"})
                       [["__range", "__w"]],
            batch_format="pandas"),
        ["__range"], ["__w"]).to_pandas().sort_values("__range")
    total = int(totals["__w"].sum())
    stride = max(1, total // k)
    cum = totals["__w"].cumsum().shift(1, fill_value=0).astype("int64")
    ref = ray.put(dict(zip(totals["__range"].astype("int64"), cum)))

    class PerRange:
        """Instance-as-UDF: ships only the ObjectRef of the offsets."""

        def __init__(self):
            self.ref = ref
            self.off: dict | None = None

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            if self.off is None:
                self.off = ray.get(self.ref)
            parts = []
            for rid, sub in g.groupby("__range", sort=False):
                sub = sub.sort_values(id_col, kind="mergesort")
                w = sub[weight_col].to_numpy(np.int64)
                cb = int(self.off[int(rid)]) + (np.cumsum(w) - w)
                hits = (cb + w) // stride - cb // stride
                keep = hits > 0
                parts.append(pd.DataFrame({
                    id_col: sub[id_col].to_numpy(np.int64)[keep],
                    weight_col: w[keep],
                    "n_hits": hits[keep].astype(np.int64)}))
            return pd.concat(parts, ignore_index=True)

    return bucketed_groupby(tagged, ["__range"], PerRange())


def epoch_shuffle(ds: rd.Dataset, *, id_col: str, seed: int,
                  num_shards: int = 64) -> rd.Dataset:
    """Deterministic training-epoch reshuffle: assign every row a
    (shard, pos) drawn from a pseudo-random permutation keyed by
    ``seed`` — change the seed per epoch and the corpus re-shuffles;
    keep it and a resumed/retried job sees the identical order (the
    property ``Dataset.random_shuffle`` cannot give you).  Shard =
    ``h % num_shards``, pos = rank of (h, id) within the shard — one
    bucketed shuffle + a per-shard mergesort, no global sort.  The
    multiplicative hash is ANSI-SQL-expressible, so the full
    permutation is oracle-gated bit-exactly.

    Output: (id, shard, pos); a reader streams shard files in pos
    order for a globally well-mixed epoch.
    """
    from .relational import bucketed_groupby

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        h = mult_hash(b[id_col].to_numpy(), seed).astype(np.int64)
        return pd.DataFrame({id_col: b[id_col].to_numpy(np.int64),
                             "__h": h,
                             "shard": h % num_shards})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "__h", id_col], kind="mergesort")
        pos = g.groupby("shard", sort=False).cumcount().astype("int64")
        return pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                             "shard": g["shard"].to_numpy(np.int64),
                             "pos": pos.to_numpy()})

    return bucketed_groupby(ds.map_batches(tag, batch_format="pandas"),
                            ["shard"], per_shard)
