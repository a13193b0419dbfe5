"""As-of (time-travel) join — match each left row to the latest right row
at or before its timestamp, per key.

Ray shape: hash-bucket both sides on the key (one shuffle each), then a
single vectorized ``pd.merge_asof(by=key)`` per bucket over the sorted
union.  Partitioning assumption: all rows of a key land in one bucket —
guaranteed by the bucket hash; within-bucket sort is local.

Oracle: DuckDB's native ``ASOF JOIN``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import bucketed_groupby


def asof_join(left: rd.Dataset, right: rd.Dataset, *, key: str, ts: str,
              right_ts: str | None = None, right_values: list[str],
              suffix: str = "_right", num_buckets: int = 64) -> rd.Dataset:
    right_ts = right_ts or ts

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__side"] = 0
        return b

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key, right_ts, *right_values]].copy()
        if right_ts != ts:
            b = b.rename(columns={right_ts: ts})
        b = b.rename(columns={c: c + suffix for c in right_values})
        b["__side"] = 1
        return b

    merged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas"))

    rv = [c + suffix for c in right_values]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0].drop(columns=["__side", *rv])
        r = g[g["__side"] == 1][[key, ts, *rv]]
        l = l.sort_values(ts, kind="stable")
        r = r.sort_values(ts, kind="stable")
        out = pd.merge_asof(l, r, on=ts, by=key, direction="backward",
                            suffixes=("", "__r"))
        if f"{ts}__r" in out.columns:
            out = out.drop(columns=[f"{ts}__r"])
        return out

    return bucketed_groupby(merged, [key], per_bucket, num_buckets)
