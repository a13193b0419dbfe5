"""Regression tests for the round-2 ADVICE findings: interval
replication on empty batches, heavy-hitters total-row flag (empty-string
items are reportable), and exact_dedup carry-from-winning-row when the
winner's carry value is null."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def test_interval_join_empty_interval_batch():
    """tag_intervals must not crash when a batch is empty (Ray version /
    fusion dependent); exercised via a split interval input whose filter
    empties one side."""
    from parallel_dataflow_ray.stages.interval import interval_join

    points = rd.from_pandas(pd.DataFrame({
        "pid": np.arange(6, dtype=np.int64),
        "ts": np.array([5, 15, 25, 35, 45, 55], dtype=np.int64)}))
    iv = pd.DataFrame({
        "iid": np.array([1, 2], dtype=np.int64),
        "lo": np.array([0, 30], dtype=np.int64),
        "hi": np.array([20, 50], dtype=np.int64)})
    # an all-filtered-out shard unions an empty block into the interval side
    intervals = rd.from_pandas(iv).union(
        rd.from_pandas(iv).filter(lambda r: False))
    out = interval_join(points, intervals, ts="ts", start="lo", end="hi",
                        chunk_us=10).to_pandas()
    got = set(zip(out["pid"], out["iid"]))
    assert got == {(0, 1), (1, 1), (3, 2), (4, 2)}


def test_interval_replication_empty_frame_direct():
    """The exclusive prefix sum ``cumsum(cnt) - cnt`` is empty-safe."""
    cnt = np.array([], dtype=np.int64)
    starts = np.cumsum(cnt) - cnt
    assert starts.shape == (0,)
    # and np.repeat over it is a no-op rather than a broadcast error
    assert np.repeat(starts, cnt).shape == (0,)


def test_heavy_hitters_empty_string_item():
    """'' is a valid, reportable item and does not inflate n (the batch
    total rides a separate __is_total flag, not an in-band sentinel)."""
    from parallel_dataflow_ray.stages.sketches import heavy_hitters

    # 60% of items are the empty string -> it IS the heavy hitter
    items = [""] * 60 + [f"w{i}" for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame({"text": items}))
    out = heavy_hitters(
        ds, lambda b: b["text"].astype(object), inv_phi=4).to_pandas()
    assert set(out["item"]) == {""}
    assert int(out.loc[out["item"] == "", "n_occurrences"].iloc[0]) == 60


def test_exact_dedup_carry_null_on_winner():
    """Carry columns come from the winning (min-id) row positionally —
    a null there stays null instead of borrowing the next dup's value."""
    from parallel_dataflow_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": np.array([10, 11, 12, 20], dtype=np.int64),
        "text": ["same", "same", "same", "other"],
        "tag": [None, "loser-a", "loser-b", "kept"]})
    out = exact_dedup(rd.from_pandas(df), carry=["tag"]).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [10, 20]
    assert out["n_dups"].tolist() == [3, 1]
    assert pd.isna(out["tag"].iloc[0])          # winner's null preserved
    assert out["tag"].iloc[1] == "kept"
