"""Stable hash partitioning + epoch framing for the streaming layer.

Partitioning contract: ``partition(key) = stable_hash(key) % P`` with a
process-independent hash (pandas' SipHash-based ``hash_array`` with a
fixed hash key) — NEVER Python's seeded ``hash()``.  Every stateful
stage (windowed aggregate, symmetric join, dedup) and every checkpoint
is keyed by this same function, so a key's state lives on exactly one
partition across runs, resumes, and cluster sizes with the same P.

Epoch framing: the input stream is cut into micro-batch epochs by
*arrival* order (``offset``).  Epoch boundaries are part of the job
config — the oracle and the engine consume the identical framing, which
is what makes the watermark schedule (and hence late-row drops and
emission times) reproducible.  One epoch ≡ one frontier round of the
reference's batched parallel executor (``impls/src/parallel.rs:29-73``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "graft-paralleldf"  # exactly 16 bytes, fixed -> stable across processes


def stable_hash(values) -> np.ndarray:
    """uint64 stable hash of an array-like of keys."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def partition_ids(values, num_partitions: int) -> np.ndarray:
    return (stable_hash(values) % np.uint64(num_partitions)).astype(np.int64)


def split_by_partition(table: pa.Table, key_column: str, num_partitions: int,
                       salted_keys: dict | None = None) -> list[pa.Table]:
    """One pass split of an Arrow table into P sub-tables by key hash.

    This is the map side of the engine's shuffle; it runs as a stateless
    Ray task per input block (see ``engine._split_block``).

    ``salted_keys = {key: n_salts}`` spreads a hot key's rows over
    ``n_salts`` deterministic sub-routes (salt = offset % n) so no single
    partition bears the whole key — the skew mitigation the reference
    lacked (``blog/blog.md:84``).  The partition actor then emits PARTIAL
    state for these keys; the owner merges (semilattice-safe).
    """
    keys = table[key_column].to_pylist()
    pids = partition_ids(keys, num_partitions)
    if salted_keys:
        offsets = table["offset"].to_numpy(zero_copy_only=False)
        keys_arr = np.asarray(keys, dtype=object)
        for k, n in salted_keys.items():
            mask = keys_arr == k
            if mask.any():
                salt = (offsets[mask] % n).astype(np.uint64)
                base = stable_hash([k])[0]
                pids[mask] = ((base + salt * np.uint64(0x9E3779B97F4A7C15))
                              % np.uint64(num_partitions)).astype(np.int64)
    order = np.argsort(pids, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    sorted_pids = pids[order]
    bounds = np.searchsorted(sorted_pids, np.arange(num_partitions + 1))
    return [sorted_tbl.slice(bounds[p], bounds[p + 1] - bounds[p])
            for p in range(num_partitions)]


def detect_hot_keys(table: pa.Table, key_column: str, *,
                    threshold_frac: float = 0.15, num_partitions: int = 8,
                    max_salts: int | None = None) -> dict:
    """Driver-side pre-scan: keys holding more than ``threshold_frac`` of
    rows get ``min(ceil(frac*P*2), max_salts or P)`` salts.  Determinism:
    pure function of the input table."""
    s = pd.Series(table[key_column].to_pylist())
    frac = s.value_counts(normalize=True)
    hot = frac[frac > threshold_frac]
    cap = max_salts or num_partitions
    return {k: int(min(cap, max(2, round(f * num_partitions * 2))))
            for k, f in hot.items()}


def epochs_from_table(table: pa.Table, epoch_rows: int) -> list[pa.Table]:
    """Cut an arrival-ordered table into fixed-size epochs."""
    assert epoch_rows > 0
    return [table.slice(i, epoch_rows) for i in range(0, table.num_rows, epoch_rows)]


def interleave_streams(left: pa.Table, right: pa.Table) -> pa.Table:
    """Merge two streams into one arrival-ordered table with a
    ``__stream`` column (0=left, 1=right), ordered by (offset, stream).
    Columns are unioned; missing columns null-filled."""
    left = left.append_column("__stream", pa.array(np.zeros(left.num_rows, dtype=np.int8)))
    right = right.append_column("__stream", pa.array(np.ones(right.num_rows, dtype=np.int8)))
    names: list[str] = list(dict.fromkeys(left.column_names + right.column_names))

    def conform(t: pa.Table, other: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in t.column_names:
                cols.append(t[n])
            else:
                typ = other[n].type
                cols.append(pa.nulls(t.num_rows, type=typ))
        return pa.table(dict(zip(names, cols)))

    merged = pa.concat_tables([conform(left, right), conform(right, left)])
    order = pa.array(np.lexsort((
        merged["__stream"].to_numpy(zero_copy_only=False),
        merged["offset"].to_numpy(zero_copy_only=False))))
    return merged.take(order)
