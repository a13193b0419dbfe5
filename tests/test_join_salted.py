"""Salted-key skew splitting for the symmetric hash join (the
salt-one-side / broadcast-the-other decomposition): output parity with
the unsalted engine on a skewed two-stream input, actual load spreading,
and idempotence under verbatim re-delivery."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parallel_dataflow_ray.streaming import StreamEngine
from parallel_dataflow_ray.streaming.partitioning import (
    detect_hot_keys, epochs_from_table, split_by_partition)

P = 4
HOT = 7
JOIN_KW = {"key_column": "user_id", "time_bound_us": 5_000_000,
           "left_columns": ("click_id",), "right_columns": ("purchase_id",)}


def _skewed_two_stream(n: int = 3000, hot_frac: float = 0.35,
                       seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    user = np.where(rng.random(n) < hot_frac, HOT,
                    rng.integers(0, 40, n)).astype(np.int64)
    ts = np.sort(rng.integers(0, 600_000_000, n)).astype(np.int64)
    side = rng.random(n) < 0.5
    ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "user_id": pa.array(user), "event_ts": pa.array(ts),
        "offset": pa.array(ids), "click_id": pa.array(ids),
        "purchase_id": pa.array(ids),
        "__stream": pa.array(side.astype(np.int8))})


def _run(engine: StreamEngine, epochs) -> list[tuple]:
    res = engine.run(epochs, collect=True, final_flush=True)
    rows = [r for ep in res["emitted"] for r in ep]
    return sorted((r["user_id"], r["ts_left"], r["ts_right"],
                   r["click_id"], r["purchase_id"]) for r in rows)


def test_salted_join_parity_with_unsalted():
    table = _skewed_two_stream()
    epochs = epochs_from_table(table, 250)
    want = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                             allowed_lateness_us=0, key_column="user_id"),
                epochs)
    got = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                            allowed_lateness_us=0, key_column="user_id",
                            salted_keys={HOT: 3}), epochs)
    assert want, "fixture must produce matches"
    assert any(r[0] == HOT for r in want), "hot key must produce matches"
    assert got == want


def test_salted_join_parity_multiple_hot_keys_and_salts():
    table = _skewed_two_stream(seed=11)
    epochs = epochs_from_table(table, 500)
    base = StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                        allowed_lateness_us=0, key_column="user_id")
    want = _run(base, epochs)
    got = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                            allowed_lateness_us=0, key_column="user_id",
                            salted_keys={HOT: 4, 3: 2}), epochs)
    assert got == want


def test_salted_join_broadcast_side_zero_parity():
    table = _skewed_two_stream(seed=19)
    epochs = epochs_from_table(table, 400)
    want = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                             allowed_lateness_us=0, key_column="user_id"),
                epochs)
    got = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                            allowed_lateness_us=0, key_column="user_id",
                            salted_keys={HOT: 3}, join_broadcast_side=0),
               epochs)
    assert got == want


def test_salted_join_redelivery_idempotent():
    """A verbatim re-delivered epoch (at-least-once source) changes
    nothing: replicated broadcast copies and salt routes dedup by offset
    exactly like the unsalted store."""
    table = _skewed_two_stream(seed=23)
    epochs = epochs_from_table(table, 300)
    redelivered = epochs[:3] + [epochs[2]] + epochs[3:]
    want = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                             allowed_lateness_us=0, key_column="user_id"),
                epochs)
    got = _run(StreamEngine("join", dict(JOIN_KW), num_partitions=P,
                            allowed_lateness_us=0, key_column="user_id",
                            salted_keys={HOT: 3}), redelivered)
    assert got == want


def test_salted_join_split_spreads_and_replicates():
    table = _skewed_two_stream()
    shards = split_by_partition(table, "user_id", P,
                                salted_keys={HOT: 3}, join_broadcast_side=1)
    assert sum(s.num_rows for s in shards) >= table.num_rows
    salt_side_parts, bcast_copies = set(), 0
    hot_bcast_offsets = set()
    for p, s in enumerate(shards):
        u = s["user_id"].to_numpy()
        st = s["__stream"].to_numpy(zero_copy_only=False)
        off = s["offset"].to_numpy()
        if ((u == HOT) & (st == 0)).any():
            salt_side_parts.add(p)
        m = (u == HOT) & (st == 1)
        bcast_copies += int(m.sum())
        hot_bcast_offsets.update(off[m].tolist())
    # the hot key's salt side now lives on several partitions...
    assert len(salt_side_parts) >= 2
    # ...and each broadcast-side row is replicated (3 salts, minus any
    # route collisions -> strictly more copies than distinct rows)
    assert bcast_copies > len(hot_bcast_offsets)
    # non-hot keys are untouched: each lives on exactly one partition
    for k in range(0, 40):
        if k == HOT:
            continue
        parts = [p for p, s in enumerate(shards)
                 if (s["user_id"].to_numpy() == k).any()]
        assert len(parts) <= 1, k


def test_detect_hot_keys_on_join_stream():
    table = _skewed_two_stream()
    hot = detect_hot_keys(table, "user_id", threshold_frac=0.15,
                          num_partitions=P)
    assert HOT in hot and hot[HOT] >= 2
