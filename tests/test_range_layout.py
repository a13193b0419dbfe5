"""Range-partitioned persisted layout + zone-map pruned reads
(stages/bucketed_io.py): pruned window == full-scan filter, pruning
actually prunes (files_read < files_total, reported — no silent caps),
boundary semantics [lo, hi), empty-window schema, idempotent re-write.
The registry entry events_range_scan is DuckDB-gated in
test_queries_oracle.py."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds_from(df, parts):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


@pytest.fixture()
def layout(tmp_path, ray_session):
    from parallel_dataflow_ray.stages.bucketed_io import \
        write_range_partitioned

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "eu": np.sort(rng.integers(1_000_000, 2_000_000, 5000)),
        "k": rng.integers(0, 7, 5000),
        "v": rng.integers(0, 100, 5000)})
    df = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    root = str(tmp_path / "range_layout")
    man = write_range_partitioned(_ds_from(df, 5), root, "eu",
                                  num_partitions=8)
    return df, root, man


def test_manifest_covers_all_rows_with_true_zones(layout):
    df, root, man = layout
    assert man["rows"].sum() == len(df)
    assert int(man["min"].min()) == int(df["eu"].min())
    assert int(man["max"].max()) == int(df["eu"].max())
    # zones are disjoint in partition order (nominal cuts are ordered)
    assert (man.sort_values("partition")["min"].to_numpy()[1:]
            > man.sort_values("partition")["max"].to_numpy()[:-1]).all()


def test_pruned_window_equals_full_filter_and_prunes(layout):
    from parallel_dataflow_ray.stages.bucketed_io import read_range_pruned

    df, root, man = layout
    lo, hi = 1_200_000, 1_400_000
    ds, stats = read_range_pruned(root, lo=lo, hi=hi)
    got = ds.to_pandas().sort_values(["eu", "k", "v"],
                                     ignore_index=True)
    want = df[(df["eu"] >= lo) & (df["eu"] < hi)] \
        .sort_values(["eu", "k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert 0 < stats["files_read"] < stats["files_total"]


def test_window_boundaries_are_half_open(layout):
    from parallel_dataflow_ray.stages.bucketed_io import read_range_pruned

    df, root, man = layout
    lo = int(df["eu"].min())
    hi = int(df["eu"].max())
    ds, _ = read_range_pruned(root, lo=lo, hi=hi)
    got = ds.to_pandas()
    assert (got["eu"] >= lo).all() and (got["eu"] < hi).all()
    assert len(got) == int((df["eu"] < hi).sum())


def test_empty_window_returns_typed_empty_and_reads_nothing(layout):
    from parallel_dataflow_ray.stages.bucketed_io import read_range_pruned

    df, root, man = layout
    ds, stats = read_range_pruned(root, lo=9_000_000, hi=9_500_000)
    assert stats["files_read"] == 0
    assert ds.count() == 0
    # Dataset-level schema survives (Ray's to_pandas drops columns on
    # any fully-empty dataset, so assert on the Arrow schema)
    assert set(ds.schema().names) == {"eu", "k", "v"}


def test_rewrite_is_idempotent(layout, ray_session):
    from parallel_dataflow_ray.stages.bucketed_io import (
        read_range_pruned, write_range_partitioned)

    df, root, man = layout
    man2 = write_range_partitioned(_ds_from(df, 3), root, "eu",
                                   num_partitions=8)
    pd.testing.assert_frame_equal(man2, man)
    ds, _ = read_range_pruned(root)
    assert len(ds.to_pandas()) == len(df)
    # no stray tmp files survive the rename protocol
    assert not [f for f in os.listdir(root) if f.endswith(".tmp")]
