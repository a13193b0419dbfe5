"""Semi/anti bucket_join modes and the interval (range) join vs
obviously-correct pandas twins (differential, reference test.rs spirit),
including the cases the sf fixtures don't exercise: duplicate build-side
keys, intervals spanning many chunks, the unkeyed variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.interval import interval_join
from parallel_dataflow_ray.stages.relational import bucket_join


def _left() -> pd.DataFrame:
    return pd.DataFrame({"k": [1, 2, 3, 4, 5, 5], "lv": [10, 20, 30, 40, 50, 51]})


def _right() -> pd.DataFrame:
    # duplicate keys + a payload column that must NOT cross the shuffle
    return pd.DataFrame({"rk": [2, 2, 4, 9], "payload": ["x"] * 4})


def test_semi_join_matches_isin():
    l, r = _left(), _right()
    got = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="rk", how="semi", num_buckets=4).to_pandas()
    want = l[l["k"].isin(r["rk"])]
    pd.testing.assert_frame_equal(
        got.sort_values(["k", "lv"], ignore_index=True),
        want.sort_values(["k", "lv"], ignore_index=True))
    assert "payload" not in got.columns
    # duplicate right keys must not duplicate left rows (semi, not
    # inner: an inner join here would emit k=2 twice -> 3 rows)
    assert len(got) == 2


def test_anti_join_matches_not_isin():
    l, r = _left(), _right()
    got = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="rk", how="anti", num_buckets=4).to_pandas()
    want = l[~l["k"].isin(r["rk"])]
    pd.testing.assert_frame_equal(
        got.sort_values(["k", "lv"], ignore_index=True),
        want.sort_values(["k", "lv"], ignore_index=True))


def _canon_merge(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype.kind in "if":
            out[c] = out[c].astype("float64")
    return out.sort_values(cols, ignore_index=True)


def test_left_join_matches_pandas_merge():
    l, r = _left(), _right().rename(columns={"payload": "rv"})
    got = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="rk", how="left", num_buckets=4).to_pandas()
    want = l.merge(r.rename(columns={"rk": "k"}), on="k", how="left")
    pd.testing.assert_frame_equal(_canon_merge(got), _canon_merge(want))
    # unmatched left keys survive; duplicate right keys fan out
    assert len(got) == len(l) + 1


def test_outer_join_matches_pandas_merge():
    l, r = _left(), _right().rename(columns={"payload": "rv"})
    got = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="rk", how="outer", num_buckets=4).to_pandas()
    want = l.merge(r.rename(columns={"rk": "k"}), on="k", how="outer")
    pd.testing.assert_frame_equal(_canon_merge(got), _canon_merge(want))
    # the right-only key (9) must surface with a null left side
    assert (got["k"] == 9).any()


def _brute_interval(pts: pd.DataFrame, ivs: pd.DataFrame,
                    key: str | None) -> pd.DataFrame:
    if key:
        m = pts.merge(ivs, on=key)
    else:
        m = pts.merge(ivs, how="cross")
    m = m[(m["s"] <= m["ts"]) & (m["ts"] < m["e"])]
    cols = [c for c in m.columns]
    return m[cols].sort_values(cols, ignore_index=True)


def test_interval_join_keyed_spanning_chunks():
    rng = np.random.default_rng(3)
    n, m = 400, 60
    pts = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "key": rng.integers(0, 5, n),
        "ts": rng.integers(0, 10_000, n)})
    ivs = pd.DataFrame({
        "iid": np.arange(m, dtype=np.int64) + 1000,
        "key": rng.integers(0, 5, m),
        "s": rng.integers(0, 9_000, m)})
    # lengths from 1 chunk to ~12 chunks (chunk_us=500)
    ivs["e"] = ivs["s"] + rng.integers(1, 6_000, m)
    got = interval_join(rd.from_pandas(pts), rd.from_pandas(ivs),
                        ts="ts", start="s", end="e", key="key",
                        chunk_us=500, num_buckets=8).to_pandas()
    cols = sorted(got.columns)
    want = _brute_interval(pts, ivs, "key")[cols] \
        .sort_values(cols, ignore_index=True)
    got = got[cols].sort_values(cols, ignore_index=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_interval_join_unkeyed():
    pts = pd.DataFrame({"pid": np.arange(20, dtype=np.int64),
                        "ts": np.arange(20, dtype=np.int64) * 7})
    ivs = pd.DataFrame({"iid": [100, 101, 102],
                        "s": [0, 50, 130], "e": [15, 120, 131]})
    got = interval_join(rd.from_pandas(pts), rd.from_pandas(ivs),
                        ts="ts", start="s", end="e", chunk_us=10,
                        num_buckets=4).to_pandas()
    cols = sorted(got.columns)
    want = _brute_interval(pts, ivs, None)[cols] \
        .sort_values(cols, ignore_index=True)
    got = got[cols].sort_values(cols, ignore_index=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_interval_join_empty_result():
    pts = pd.DataFrame({"pid": [1], "ts": [1000]})
    ivs = pd.DataFrame({"iid": [2], "s": [0], "e": [10]})
    got = interval_join(rd.from_pandas(pts), rd.from_pandas(ivs),
                        ts="ts", start="s", end="e", chunk_us=100,
                        num_buckets=2).to_pandas()
    assert len(got) == 0


def test_right_join_matches_pandas_merge():
    l, r = _left(), _right().rename(columns={"payload": "rv"})
    got = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="rk", how="right", num_buckets=4).to_pandas()
    want = l.merge(r.rename(columns={"rk": "k"}), on="k", how="right")
    pd.testing.assert_frame_equal(_canon_merge(got), _canon_merge(want))
    # the right-only key (9) survives with a null left side
    assert (got["k"] == 9).any()


# property-based: every bucket_join mode == the pandas twin on random
# key multisets (duplicates, missing keys, both-side-only keys)
from hypothesis import given, settings, strategies as st

_keys = st.lists(st.integers(min_value=0, max_value=6), min_size=0,
                 max_size=12)


@settings(max_examples=8, deadline=None)
@given(lk=_keys, rk=_keys,
       how=st.sampled_from(["inner", "left", "right", "outer",
                            "semi", "anti"]))
def test_bucket_join_property_matches_pandas(lk, rk, how):
    l = pd.DataFrame({"k": pd.Series(lk, dtype="int64"),
                      "lv": pd.Series(range(len(lk)), dtype="int64")})
    r = pd.DataFrame({"rk": pd.Series(rk, dtype="int64"),
                      "rv": pd.Series(range(len(rk)), dtype="int64")})
    if len(l) == 0 or len(r) == 0:
        return  # from_pandas of an empty frame has no schema to join on
    got = bucket_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="rk", how=how, num_buckets=3).to_pandas()
    if how == "semi":
        want = l[l["k"].isin(set(rk))]
    elif how == "anti":
        want = l[~l["k"].isin(set(rk))]
    else:
        want = l.merge(r.rename(columns={"rk": "k"}), on="k", how=how)
    if len(want) == 0:
        assert len(got) == 0
        return
    pd.testing.assert_frame_equal(_canon_merge(got), _canon_merge(want))
