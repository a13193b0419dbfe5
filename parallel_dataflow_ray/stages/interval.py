"""Interval (range) join — match each point row to every interval row
whose ``[start, end)`` contains the point's timestamp, optionally also
matching on an equi-key.

Ray shape (time-chunked co-partitioning, the standard distributed
range-join decomposition):

- points get ``chunk = ts // chunk_us`` — exactly ONE chunk each, so no
  output dedup is ever needed;
- intervals are REPLICATED to every chunk they overlap
  (``start//chunk_us .. (end-1)//chunk_us``, vectorized repeat);
- both sides hash-bucket on ``(chunk [, key])`` via the same
  ``bucketed_groupby`` machinery as the equi-joins, and each bucket runs
  one vectorized ``pd.merge`` on ``(chunk [, key])`` followed by the
  ``start <= ts < end`` mask.

Partitioning assumption this relies on: interval length is bounded and
comparable to ``chunk_us`` — replication factor is
``ceil(len/chunk)+1`` per interval, so pick ``chunk_us`` near the
typical interval length (e.g. the join's time bound).  A single
pathological interval spanning the whole stream would replicate to
every chunk; cap or split such intervals upstream.

Reference analog: the frontier-batched executor joins facts against the
windowed state it co-partitions by key+time (SURVEY.md §2.3); DuckDB's
native range join is the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import bucketed_groupby


def interval_join(points: rd.Dataset, intervals: rd.Dataset, *,
                  ts: str, start: str, end: str, key: str | None = None,
                  chunk_us: int, num_buckets: int = 64) -> rd.Dataset:
    """Inner join: every (point, interval) pair with
    ``interval.start <= point.ts < interval.end`` (and equal ``key`` if
    given).  All timestamp columns are int64 (µs).  Output = point
    columns + interval columns (minus the join duplicates)."""
    chunk_us = int(chunk_us)
    psch, isch = points.schema(), intervals.schema()
    pcols = list(psch.names)
    icols = [c for c in isch.names if c not in pcols]
    keys = ["__chunk"] + ([key] if key else [])
    types = {**dict(zip(isch.names, isch.types)),
             **dict(zip(psch.names, psch.types))}

    def tag_points(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__chunk"] = b[ts].to_numpy(np.int64) // chunk_us
        b["__side"] = 0
        return b

    def tag_intervals(b: pd.DataFrame) -> pd.DataFrame:
        s = b[start].to_numpy(np.int64)
        e = b[end].to_numpy(np.int64)
        c0 = s // chunk_us
        c1 = np.maximum(e - 1, s) // chunk_us        # inclusive last chunk
        cnt = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), cnt)
        # per-interval chunk offsets 0..cnt-1, computed without a loop;
        # exclusive prefix sum as cumsum-cnt stays length-len(b) (and
        # empty for an empty batch — np.concatenate(([0], ...)) raised
        # on the repeat for len(b)==0)
        starts = np.cumsum(cnt) - cnt
        off = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(starts, cnt)
        out = b.iloc[idx].copy()
        out["__chunk"] = c0[idx] + off
        out["__side"] = 1
        return out

    tagged = points.map_batches(tag_points, batch_format="pandas").union(
        intervals.map_batches(tag_intervals, batch_format="pandas"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, pcols + ["__chunk"]]
        r = g.loc[g["__side"] == 1, list(dict.fromkeys(
            icols + keys))]
        m = l.merge(r, on=keys)
        m = m[(m[start].to_numpy(np.int64) <= m[ts].to_numpy(np.int64))
              & (m[ts].to_numpy(np.int64) < m[end].to_numpy(np.int64))]
        out_cols = pcols + [c for c in icols if c != "__chunk"]
        # union null-fill promoted int columns to float64 — restore
        m = m[out_cols].copy()
        for c in out_cols:
            if m[c].dtype.kind == "f" and _is_int_type(types.get(c)):
                m[c] = m[c].astype("int64")
        return m

    return bucketed_groupby(tagged, keys, per_bucket, num_buckets)


def _is_int_type(t) -> bool:
    """True for integer types in either convention — pyarrow DataType
    (Arrow blocks) or numpy dtype (pandas blocks)."""
    if t is None:
        return False
    import pyarrow as pa
    if isinstance(t, pa.DataType):
        return pa.types.is_integer(t)
    return getattr(np.dtype(t), "kind", "?") in ("i", "u")
