"""Batch-mode event-time windows over a bounded table (events analytics).

The streaming layer (``..streaming``) provides watermark-driven windows
for unbounded/epoch input; for bounded analytics the same window
semantics compose from stock Ray Data ops (SURVEY.md §2.4 "windowed
hash-aggregate ... for batch analytics"):

- tumbling: vectorized bucket column inside ``map_batches`` + grouped agg
- sliding:  pane replication (each row explodes into its windows) + agg
- session:  ``groupby(key).map_groups`` gaps-and-islands per key

Timestamps are int64 microseconds end to end (Arrow timestamp[us] is
cast zero-copy); outputs carry ``window_start_us`` so the DuckDB oracle
can reproduce them with integer arithmetic — no timezone traps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import grouped_sum


def _ts_us(table: pa.Table, ts_col: str) -> np.ndarray:
    return table[ts_col].cast(pa.int64()).to_numpy()


def add_tumbling_bucket(ds: rd.Dataset, ts_col: str, size_us: int,
                        out: str = "window_start_us") -> rd.Dataset:
    def bucket(t: pa.Table) -> pa.Table:
        ts = _ts_us(t, ts_col)
        return t.append_column(out, pa.array((ts // size_us) * size_us))

    return ds.map_batches(bucket, batch_format="pyarrow")


def tumbling_agg(ds: rd.Dataset, key: str, ts_col: str, size_us: int,
                 sums: list[str], count_as: str = "n_events") -> rd.Dataset:
    ds = add_tumbling_bucket(ds, ts_col, size_us)
    return grouped_sum(ds, [key, "window_start_us"], sums, count_as)


def explode_sliding(ds: rd.Dataset, ts_col: str, size_us: int, slide_us: int,
                    out: str = "window_start_us") -> rd.Dataset:
    """Pane replication: one output row per (input row, covering window).
    Row count multiplies by ceil(size/slide) — acceptable because the
    downstream aggregate combines map-side before the shuffle."""
    n_panes = -(-size_us // slide_us)

    def explode(t: pa.Table) -> pa.Table:
        ts = _ts_us(t, ts_col)
        pane_last = (ts // slide_us) * slide_us
        reps, starts = [], []
        for p in range(n_panes):
            s = pane_last - p * slide_us
            mask = (s <= ts) & (ts < s + size_us) & (s >= 0)
            idx = np.nonzero(mask)[0]
            reps.append(idx)
            starts.append(s[idx] if isinstance(s, np.ndarray) else np.full(idx.size, s))
        take = np.concatenate(reps)
        ws = np.concatenate(starts)
        return t.take(pa.array(take)).append_column(out, pa.array(ws.astype(np.int64)))

    return ds.map_batches(explode, batch_format="pyarrow")


def sliding_agg(ds: rd.Dataset, key: str, ts_col: str, size_us: int,
                slide_us: int, sums: list[str], count_as: str = "n_events"
                ) -> rd.Dataset:
    ds = explode_sliding(ds, ts_col, size_us, slide_us)
    return grouped_sum(ds, [key, "window_start_us"], sums, count_as)


def session_agg(ds: rd.Dataset, key: str, ts_col: str, gap_us: int,
                sums: list[str], count_as: str = "n_events") -> rd.Dataset:
    """Per-key sessionization: hash-bucket shuffle on key, then a sorted
    gaps-and-islands scan per key inside each bucket (bucketing avoids
    Ray's per-group Aggregate overhead; the scan is vectorized)."""
    from .relational import bucketed_groupby

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("int64").to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        new = np.empty(ts.size, dtype=bool)
        new[0] = True
        np.greater(np.diff(ts), gap_us, out=new[1:])
        sid = np.cumsum(new) - 1
        out = pd.DataFrame({
            key: g[key].iloc[0],
            "session_id": sid,
            "session_start_us": ts,
            "session_end_us": ts,
            count_as: 1,
        })
        for c in sums:
            out[c] = g[c].to_numpy()[order]
        agg = out.groupby("session_id", as_index=False).agg(
            {key: "first", "session_start_us": "min", "session_end_us": "max",
             count_as: "sum", **{c: "sum" for c in sums}})
        return agg.drop(columns=["session_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([sessions(sub) for _, sub in g.groupby(key, sort=False)],
                         ignore_index=True)

    return bucketed_groupby(ds, [key], per_bucket)
