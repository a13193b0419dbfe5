"""Mid-stream hot-key re-detection: a key that becomes hot AFTER the
stream starts must get salted at runtime (the r1 design only salted
from an epoch-0 pre-scan), with output parity preserved (semilattice
partial-merge correctness).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parallel_dataflow_ray.streaming import (
    OracleExecutor, StreamEngine, TumblingWindows)
from parallel_dataflow_ray.streaming.kernels import KERNELS
from parallel_dataflow_ray.streaming.partitioning import epochs_from_table

N = 6000
WIN = TumblingWindows(1_000_000)


def _skewed_table() -> pa.Table:
    """First half: uniform over 20 speakers.  Second half: 70% of rows on
    one speaker that was cold before."""
    rng = np.random.default_rng(7)
    half = N // 2
    cold = np.array([f"s{i:02d}" for i in rng.integers(0, 20, half)], dtype=object)
    hot_mask = rng.random(N - half) < 0.7
    late = np.array([f"s{i:02d}" for i in rng.integers(0, 20, N - half)], dtype=object)
    late[hot_mask] = "hotspeaker"
    speakers = np.concatenate([cold, late])
    ts = (np.arange(N, dtype=np.int64) * 997)  # ~1 ms spacing, monotone
    return pa.table({
        "speaker_id": pa.array(speakers),
        "event_ts": pa.array(ts),
        "offset": pa.array(np.arange(N, dtype=np.int64)),
        "dur_ms": pa.array(np.full(N, 250, dtype=np.int64)),
        "sr_hz": pa.array(np.full(N, 16000, dtype=np.int32)),
    })


def test_hot_key_detected_and_parity_preserved():
    table = _skewed_table()
    epochs = epochs_from_table(table, 251)
    kw = {"spec": KERNELS["clip_stats"](), "assigner": WIN}
    oracle_rows, om = OracleExecutor("window", dict(kw), 0).run(
        epochs, final_flush=True)
    eng = StreamEngine("window", dict(kw), num_partitions=4,
                       allowed_lateness_us=0,
                       hot_key_config={"threshold_frac": 0.2, "min_rows": 500})
    res = eng.run(epochs, collect=True, final_flush=True)
    engine_rows = [r for ep in res["emitted"] for r in ep]
    # oracle appends final-flush rows at the end; compare as multisets of
    # canonical rows (both sides canonical_sort per epoch already)
    assert sorted(map(repr, engine_rows)) == sorted(map(repr, oracle_rows))
    assert "hotspeaker" in (eng.salted_keys or {}), (
        f"runtime salting did not trigger: {eng.salted_keys}")
    # cold-phase-only keys must not be salted
    assert all(k == "hotspeaker" for k in eng.salted_keys)


def test_no_resalt_below_threshold():
    table = _skewed_table().slice(0, N // 2)  # uniform half only
    epochs = epochs_from_table(table, 251)
    kw = {"spec": KERNELS["clip_stats"](), "assigner": WIN}
    eng = StreamEngine("window", dict(kw), num_partitions=4,
                       allowed_lateness_us=0,
                       hot_key_config={"threshold_frac": 0.2, "min_rows": 500})
    eng.run(epochs, collect=False, final_flush=True)
    assert not eng.salted_keys
