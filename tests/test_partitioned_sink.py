"""Resumable partitioned batch sink: full write/readback parity,
crash-resume partition skip, torn-fragment ignore."""

from __future__ import annotations

import os

import pandas as pd
import pytest
import ray.data as rd

from parallel_dataflow_ray.stages.partitioned_sink import (
    committed_partitions, read_partitioned, write_partitioned)


def _df(n=5000):
    return pd.DataFrame({"k": [i % 37 for i in range(n)],
                         "v": range(n)})


def test_write_read_roundtrip(tmp_path):
    root = str(tmp_path / "out")
    df = _df()
    stats = write_partitioned(rd.from_pandas(df), root, "k",
                              num_partitions=16, durable=False)
    assert stats["rows"] == len(df) and stats["skipped"] == 0
    back = read_partitioned(root).to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values(["k", "v"], ignore_index=True),
        df.sort_values(["k", "v"], ignore_index=True))


def test_resume_skips_committed(tmp_path):
    root = str(tmp_path / "out")
    df = _df()
    write_partitioned(rd.from_pandas(df), root, "k", num_partitions=16,
                      durable=False)
    done = committed_partitions(root)
    assert done
    # simulate a crash that lost half the partitions: remove markers +
    # fragments for half of them, then re-run over the SAME input
    lost = sorted(done)[::2]
    for pid in lost:
        os.remove(os.path.join(root, "_committed", f"part-{pid:05d}.json"))
        os.remove(os.path.join(root, "data", f"part-{pid:05d}.parquet"))
    stats = write_partitioned(rd.from_pandas(df), root, "k",
                              num_partitions=16, durable=False)
    assert stats["skipped"] == len(done) - len(lost)
    assert stats["written"] == len(lost)
    back = read_partitioned(root).to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values(["k", "v"], ignore_index=True),
        df.sort_values(["k", "v"], ignore_index=True))


def test_torn_fragment_ignored(tmp_path):
    root = str(tmp_path / "out")
    write_partitioned(rd.from_pandas(_df()), root, "k", num_partitions=8,
                      durable=False)
    # a tmp file left by a crashed writer must not be read back
    torn = os.path.join(root, "data", "part-00001.parquet.tmp.9999")
    with open(torn, "wb") as f:
        f.write(b"garbage")
    n = read_partitioned(root).count()
    assert n == 5000


def test_no_committed_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_partitioned(str(tmp_path / "nothing"))
