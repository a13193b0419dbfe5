"""Persisted hash-bucketed layout (stages/bucketed_io.py).

The layout contract: (1) smb_join over two layouts equals the shuffle
join, (2) smb_probe_join equals a plain merge, (3) bucket files are
rewritten idempotently (resumable output), (4) the bucket hash is
stable across writes so layouts written by different jobs co-locate,
(5) the PageRank SMB path is bit-identical to the shuffle path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from parallel_dataflow_ray.stages.bucketed_io import (
    bucket_of, smb_join, smb_probe_join, write_bucketed,
)


def _frames(seed=0):
    rng = np.random.default_rng(seed)
    a = pd.DataFrame({"k": rng.integers(0, 150, 1200).astype(np.int64),
                      "va": np.arange(1200, dtype=np.int64)})
    b = pd.DataFrame({"k": rng.integers(0, 250, 900).astype(np.int64),
                      "vb": np.arange(900, dtype=np.int64)})
    return a, b


def _sorted(df, cols):
    return df.sort_values(cols, ignore_index=True)


def test_smb_join_equals_shuffle_join(tmp_path, ray_session):
    a, b = _frames()
    write_bucketed(rd.from_pandas(a).repartition(5), str(tmp_path / "a"),
                   "k", num_buckets=8)
    write_bucketed(rd.from_pandas(b).repartition(3), str(tmp_path / "b"),
                   "k", num_buckets=8)
    got = smb_join(str(tmp_path / "a"), str(tmp_path / "b"),
                   on="k").to_pandas()
    want = a.merge(b, on="k")
    pd.testing.assert_frame_equal(_sorted(got, ["k", "va", "vb"]),
                                  _sorted(want, ["k", "va", "vb"]))


def test_probe_join_and_string_keys(tmp_path, ray_session):
    t = pd.DataFrame({"name": [f"s{i%37}" for i in range(500)],
                      "vt": np.arange(500, dtype=np.int64)})
    write_bucketed(rd.from_pandas(t), str(tmp_path / "t"), "name",
                   num_buckets=6)
    probe = pd.DataFrame({"name": [f"s{i%41}" for i in range(300)],
                          "vp": np.arange(300, dtype=np.int64)})
    got = smb_probe_join(rd.from_pandas(probe).repartition(4),
                         str(tmp_path / "t"),
                         probe_on="name").to_pandas()
    want = probe.merge(t, on="name")
    pd.testing.assert_frame_equal(_sorted(got, ["name", "vp", "vt"]),
                                  _sorted(want, ["name", "vp", "vt"]))


def test_rewrite_is_idempotent_and_hash_stable(tmp_path, ray_session):
    a, _ = _frames(seed=3)
    m1 = write_bucketed(rd.from_pandas(a), str(tmp_path / "a"), "k",
                        num_buckets=8)
    # second job writes the identical layout over the first (resume)
    m2 = write_bucketed(rd.from_pandas(a).repartition(7),
                        str(tmp_path / "a"), "k", num_buckets=8)
    pd.testing.assert_frame_equal(m1, m2)
    # stable hash: the same keys land in the same buckets across calls
    ids1 = bucket_of(a["k"].to_numpy(), 8)
    ids2 = bucket_of(a["k"].to_numpy().astype(np.int32), 8)
    assert (ids1 == ids2).all()


def test_mismatched_layouts_refused(tmp_path, ray_session):
    a, b = _frames()
    write_bucketed(rd.from_pandas(a), str(tmp_path / "a"), "k",
                   num_buckets=8)
    write_bucketed(rd.from_pandas(b), str(tmp_path / "b"), "k",
                   num_buckets=4)
    with pytest.raises(ValueError):
        smb_join(str(tmp_path / "a"), str(tmp_path / "b"), on="k")


def test_empty_buckets_read_as_empty(tmp_path, ray_session):
    # two keys -> at most 2 of 16 buckets have files; the join still
    # runs one task per bucket and empty ones contribute nothing
    a = pd.DataFrame({"k": np.int64([1, 1, 2]), "va": np.int64([1, 2, 3])})
    b = pd.DataFrame({"k": np.int64([1, 3]), "vb": np.int64([7, 8])})
    write_bucketed(rd.from_pandas(a), str(tmp_path / "a"), "k",
                   num_buckets=16)
    write_bucketed(rd.from_pandas(b), str(tmp_path / "b"), "k",
                   num_buckets=16)
    got = smb_join(str(tmp_path / "a"), str(tmp_path / "b"),
                   on="k").to_pandas()
    assert _sorted(got, ["k", "va", "vb"]).to_dict("list") == {
        "k": [1, 1], "va": [1, 2], "vb": [7, 7]}
    n_files = len([f for f in os.listdir(tmp_path / "b")
                   if f.startswith("bucket=")])
    assert n_files <= 2


def test_pagerank_smb_path_bit_identical(tmp_path, ray_session):
    from parallel_dataflow_ray.stages.graph import pagerank

    rng = np.random.default_rng(11)
    e = pd.DataFrame({"src": rng.integers(0, 60, 400).astype(np.int64),
                      "dst": rng.integers(0, 60, 400).astype(np.int64)})
    plain = pagerank(rd.from_pandas(e).repartition(4), iters=3,
                     num_buckets=8).to_pandas()
    smb = pagerank(rd.from_pandas(e).repartition(4), iters=3,
                   num_buckets=8,
                   edges_layout=str(tmp_path / "edges")).to_pandas()
    pd.testing.assert_frame_equal(_sorted(plain, ["node"]),
                                  _sorted(smb, ["node"]))
