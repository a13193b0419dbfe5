"""Sink compaction + Dataset read path (streaming/sink.py).

The small-files maintenance pass must preserve the exactly-once read
set bit-for-bit, stay idempotent, keep same-P resume working (commit
dedup keys off manifest entries, which survive compaction), and keep
rescale-revocation exact even for epochs whose rows were folded into
consolidated files (epoch-prefix truncation of the compacted chain —
round-5 closure of the one previously-refused interaction).
"""

from __future__ import annotations

import os


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


def test_rescale_after_compaction_exactly_once(tmp_path):
    """Crash at epoch 4 with checkpoints at {1, 3}: epoch 4's commit is
    PAST the resumable checkpoint, so the rescale must revoke it — and
    compaction already folded its rows into consolidated files.  The
    revoke truncates the compacted chain row-exactly via the manifest's
    per-epoch lineage (rows live in epoch order — the same invariant
    read_as_of relies on), so crash -> compact -> rescale-resume still
    equals the oracle."""
    epochs = _epochs()
    _run(tmp_path, stop_after_epoch=4)
    ExactlyOnceSink.compact(str(tmp_path / "sink"))
    res = _run(tmp_path, p=2)
    assert res["start_epoch"] > 0          # resumed, not replayed-from-0
    rows, _ = OracleExecutor("window", _kw(), LATENESS_US).run(epochs)
    assert _sink_rows(tmp_path / "sink") == canonical_sort(rows)


def test_rescale_after_two_compaction_generations(tmp_path):
    """Same, but with a second generation: crash, compact, run SAME P a
    bit further, compact again (second consolidated file), crash again,
    then rescale — the prefix arithmetic must span generations."""
    epochs = _epochs()
    _run(tmp_path, stop_after_epoch=4)
    ExactlyOnceSink.compact(str(tmp_path / "sink"))
    _run(tmp_path, stop_after_epoch=6)
    ExactlyOnceSink.compact(str(tmp_path / "sink"))
    res = _run(tmp_path, p=3)
    assert res["start_epoch"] > 0
    rows, _ = OracleExecutor("window", _kw(), LATENESS_US).run(epochs)
    assert _sink_rows(tmp_path / "sink") == canonical_sort(rows)


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


def _as_of_rows(root, e):
    t = ExactlyOnceSink.read_as_of(str(root), e)
    return canonical_sort(t.to_pylist()) if t is not None else []


def test_read_as_of_prefix_semantics(tmp_path):
    """Time-travel: read_as_of(E) == rows of every committed epoch <= E,
    identical before and after compaction (and after a second
    generation of epochs + compaction)."""
    _run(tmp_path)
    root = tmp_path / "sink"
    lineage = ExactlyOnceSink.lineage(str(root))
    max_epoch = max(r["epoch"] for r in lineage)
    mid = max_epoch // 2
    # ground truth from per-epoch lineage: fragments filtered by epoch
    want_mid = _as_of_rows(root, mid)
    want_all = _as_of_rows(root, max_epoch)
    assert want_all == _sink_rows(root)
    n_mid = sum(r["rows"] for r in lineage if r["epoch"] <= mid)
    assert sum(1 for _ in want_mid) == n_mid
    assert 0 < n_mid < len(want_all)

    # compaction must not change any snapshot
    ExactlyOnceSink.compact(str(root))
    assert _as_of_rows(root, mid) == want_mid
    assert _as_of_rows(root, max_epoch) == want_all
    # epoch horizons below the first commit yield nothing
    assert _as_of_rows(root, -1) == []


def test_read_as_of_across_two_compaction_generations(tmp_path):
    epochs = _epochs()
    half = len(epochs) // 2
    _run(tmp_path, stop_after_epoch=half)
    root = tmp_path / "sink"
    ExactlyOnceSink.compact(str(root))           # generation 1
    _run(tmp_path)                               # resume to the end
    lineage = ExactlyOnceSink.lineage(str(root))
    max_epoch = max(r["epoch"] for r in lineage)
    mid = max_epoch // 2
    want_mid = _as_of_rows(root, mid)
    want_all = _sink_rows(root)
    ExactlyOnceSink.compact(str(root))           # generation 2
    assert _as_of_rows(root, mid) == want_mid
    assert _as_of_rows(root, max_epoch) == want_all
