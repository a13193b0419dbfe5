"""Kill/resume exactly-once for the symmetric hash join (the north_star
flagship stateful operator): killed mid-stream, resumed, the sink holds
exactly the oracle's joined rows."""

from __future__ import annotations

from parallel_dataflow_ray import fixtures
from parallel_dataflow_ray.streaming import ExactlyOnceSink, OracleExecutor, StreamEngine
from parallel_dataflow_ray.streaming.oracle import canonical_sort
from parallel_dataflow_ray.streaming.partitioning import (
    epochs_from_table, interleave_streams)

N = 300
LATENESS_US = 50_000
BOUND_US = 5_000_000
JOIN_KW = dict(key_column="clip_id", time_bound_us=BOUND_US,
               left_columns=("sr_hz", "offset"), right_columns=("transcript",))


def _epochs():
    clips = fixtures.clips_table(N, seed=42, lateness_ms=30, n_speakers=5)
    clips = clips.drop_columns(["transcript", "bytes"])
    events = fixtures.transcript_events_table(N, seed=42, lateness_ms=30)
    return epochs_from_table(interleave_streams(clips, events), 73)


def _engine(tmp, salted_keys=None):
    return StreamEngine("join", dict(JOIN_KW), num_partitions=3,
                        allowed_lateness_us=LATENESS_US, key_column="clip_id",
                        sink_root=str(tmp / "sink"), ckpt_root=str(tmp / "ckpt"),
                        ckpt_interval=2, salted_keys=salted_keys)


def _kill_resume(tmp_path, salted_keys=None):
    epochs = _epochs()
    oracle_rows, _ = OracleExecutor("join", dict(JOIN_KW), LATENESS_US).run(epochs)
    oracle_rows = canonical_sort(oracle_rows)

    kill_at = len(epochs) // 2
    _engine(tmp_path, salted_keys).run(epochs, stop_after_epoch=kill_at,
                                       commit_partitions={0})  # mid-epoch crash
    res = _engine(tmp_path, salted_keys).run(epochs)  # resume, same routing
    assert res["start_epoch"] > 0

    t = ExactlyOnceSink.read_all(str(tmp_path / "sink"))
    got = canonical_sort(t.to_pylist()) if t is not None else []
    assert got == oracle_rows
    assert len(got) > 0


def test_join_kill_resume_exactly_once(tmp_path):
    _kill_resume(tmp_path)


def test_salted_join_kill_resume_exactly_once(tmp_path):
    """Kill/resume with salted hot keys: routing (and hence replicated
    broadcast state) is deterministic given the SAME salted_keys across
    resume, so the sink still holds exactly the oracle's rows."""
    clips = fixtures.clips_table(N, seed=42, lateness_ms=30, n_speakers=5)
    hot = clips["clip_id"].to_pylist()[:2]  # any keys may be salted
    _kill_resume(tmp_path, salted_keys={hot[0]: 3, hot[1]: 2})
