"""Global sort order + video frame-sample plumbing.

The driver's correctness hash is order-insensitive, so the total-order
property of ``sort_events`` is asserted here: iterating the sorted
Dataset's batches in block order must yield a globally nondecreasing
(ts_us, event_id) sequence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parallel_dataflow_ray.pipelines.queries import sort_events
from parallel_dataflow_ray.stages.multimodal import (VideoFrameSampleStage,
                                                     sample_video_frames)

SF_DIR = "/root/testdata/sf0.001"


def test_sort_events_is_globally_ordered(ray_session):
    ds = sort_events(SF_DIR)
    prev = (-1 << 62, -1 << 62)
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ts = b["ts_us"].to_numpy()
        eid = b["event_id"].to_numpy()
        # within-batch order
        key = np.lexsort((eid, ts))
        assert (key == np.arange(len(ts))).all(), "batch not sorted"
        # cross-batch boundary
        assert (ts[0], eid[0]) >= prev
        prev = (int(ts[-1]), int(eid[-1]))
        n += len(ts)
    assert n > 0


def _video_batch() -> pa.Table:
    # 3 clips: 4 frames of 8 bytes, 2 frames of 4 bytes, empty payload
    return pa.table({
        "clip_id": pa.array([1, 2, 3], type=pa.int64()),
        "n_frames": pa.array([4, 2, 0], type=pa.int64()),
        "bytes": pa.array([bytes(range(32)), bytes(range(100, 108)), b""],
                          type=pa.binary()),
    })


def test_video_frame_sample_stage_fake_mode():
    out = VideoFrameSampleStage(stride=2)(_video_batch())
    assert out.column_names == ["clip_id", "frame_idx", "frame_bytes"]
    assert out["clip_id"].to_pylist() == [1, 1, 2]
    assert out["frame_idx"].to_pylist() == [0, 2, 0]
    assert out["frame_bytes"].to_pylist() == [
        bytes(range(8)), bytes(range(16, 24)), bytes(range(100, 104))]


def test_video_frame_sample_strict_raises():
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(mode="strict")(_video_batch())
    with pytest.raises(ValueError):
        VideoFrameSampleStage(stride=0)
    with pytest.raises(ValueError):
        VideoFrameSampleStage(mode="webm")


def test_video_frame_sample_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_video_batch())
    out = sample_video_frames(ds, stride=1, concurrency=(1, 2)).to_pandas()
    # 4 + 2 + 0 frames
    assert len(out) == 6
    assert set(out["clip_id"]) == {1, 2}
