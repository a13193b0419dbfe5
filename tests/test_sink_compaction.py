"""Sink compaction + Dataset read path (streaming/sink.py).

The small-files maintenance pass must preserve the exactly-once read
set bit-for-bit, stay idempotent, keep same-P resume working (commit
dedup keys off manifest entries, which survive compaction), and refuse
the one unsafe interaction (rescale-revoking epochs whose rows were
folded into consolidated files).
"""

from __future__ import annotations

import os

import pytest

from parallel_dataflow_ray import fixtures
from parallel_dataflow_ray.streaming import (
    ExactlyOnceSink, OracleExecutor, StreamEngine, TumblingWindows,
)
from parallel_dataflow_ray.streaming.kernels import KERNELS
from parallel_dataflow_ray.streaming.oracle import canonical_sort
from parallel_dataflow_ray.streaming.partitioning import epochs_from_table
from parallel_dataflow_ray.streaming.sink import read_stream_output

N = 500
LATENESS_US = 50_000
WIN = TumblingWindows(1_000_000)
EPOCH_ROWS = 83
KW = None


def _kw():
    return {"spec": KERNELS["clip_stats"](), "assigner": WIN}


def _epochs():
    t = fixtures.clips_table(N, seed=42, lateness_ms=40, n_speakers=7)
    return epochs_from_table(t, EPOCH_ROWS)


def _sink_rows(root):
    t = ExactlyOnceSink.read_all(str(root))
    return canonical_sort(t.to_pylist()) if t is not None else []


def _run(tmp, p=4, **kw):
    return StreamEngine("window", _kw(), num_partitions=p,
                        allowed_lateness_us=LATENESS_US,
                        sink_root=str(tmp / "sink"),
                        ckpt_root=str(tmp / "ckpt"),
                        ckpt_interval=2).run(_epochs(), **kw)


def _n_data_files(tmp):
    return len([f for f in os.listdir(tmp / "sink" / "data")
                if f.endswith(".parquet")])


def test_compaction_preserves_rows_and_shrinks_files(tmp_path):
    _run(tmp_path)
    before = _sink_rows(tmp_path / "sink")
    files_before = _n_data_files(tmp_path)
    stats = ExactlyOnceSink.compact(str(tmp_path / "sink"))
    assert stats["fragments_removed"] > 0
    assert _n_data_files(tmp_path) < files_before
    assert _sink_rows(tmp_path / "sink") == before
    # idempotent: a second pass is a no-op (nothing left to fold)
    stats2 = ExactlyOnceSink.compact(str(tmp_path / "sink"))
    assert stats2["fragments_removed"] == 0
    assert _sink_rows(tmp_path / "sink") == before


def test_resume_after_compaction_same_p(tmp_path):
    epochs = _epochs()
    _run(tmp_path, stop_after_epoch=len(epochs) // 2)
    ExactlyOnceSink.compact(str(tmp_path / "sink"))
    # same-P resume: replayed commits dedup off manifest entries,
    # which compaction preserved
    res = _run(tmp_path)
    assert res["start_epoch"] > 0
    rows, _ = OracleExecutor("window", _kw(), LATENESS_US).run(epochs)
    assert _sink_rows(tmp_path / "sink") == canonical_sort(rows)


def test_rescale_past_compacted_epochs_refused(tmp_path):
    # crash at epoch 4 with checkpoints at {1, 3}: epoch 4's commit is
    # PAST the resumable checkpoint, so a rescale must revoke it — but
    # compaction folded its rows into consolidated files -> refuse
    _run(tmp_path, stop_after_epoch=4)
    ExactlyOnceSink.compact(str(tmp_path / "sink"))
    with pytest.raises(RuntimeError, match="compacted"):
        _run(tmp_path, p=2)


def test_read_stream_output_dataset(tmp_path, ray_session):
    _run(tmp_path)
    before = _sink_rows(tmp_path / "sink")
    ds = read_stream_output(str(tmp_path / "sink"))
    assert canonical_sort(ds.take_all()) == before
    ExactlyOnceSink.compact(str(tmp_path / "sink"))
    ds2 = read_stream_output(str(tmp_path / "sink"))
    assert canonical_sort(ds2.take_all()) == before
    cols = read_stream_output(str(tmp_path / "sink"),
                              columns=["key"]).schema().names
    assert cols == ["key"]
