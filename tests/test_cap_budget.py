"""cap_budget_per_key — per-key weighted duration budget (the
"cap every speaker at N minutes, keep earliest clips" curation shape).

Laws checked against a driver-local pandas twin:
- exact row set + cum column parity on random keyed data
- the budget-CROSSING row is kept, rows after it are dropped
- a key whose total weight fits the budget passes through whole
- partition-count invariance (bucketed shuffle can't change results)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.sampling import cap_budget_per_key


def _local_twin(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    df = df.sort_values(["spk", "ts", "clip"], kind="mergesort")
    cum = df.groupby("spk", sort=False)["dur"].cumsum()
    out = df.assign(cum_dur=cum)
    out = out[out["cum_dur"] - out["dur"] < budget]
    return (out.sort_values(["spk", "ts", "clip"])
            .reset_index(drop=True)[["clip", "spk", "dur", "ts", "cum_dur"]])


def _df(n=4000, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "clip": np.arange(n, dtype=np.int64),
        "spk": rng.integers(0, 60, n),
        "dur": rng.integers(100, 2000, n),
        "ts": rng.integers(0, 10**9, n)})


def _run(df: pd.DataFrame, budget: int, parts: int) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(parts)
    out = cap_budget_per_key(ds, "spk", budget, weight_col="dur",
                             order_cols=["ts", "clip"]).to_pandas()
    return (out.sort_values(["spk", "ts", "clip"])
            .reset_index(drop=True)[["clip", "spk", "dur", "ts", "cum_dur"]]
            .astype({"cum_dur": "int64"}))


def test_matches_local_twin(ray_session):
    df = _df()
    got = _run(df, 6000, parts=5)
    pd.testing.assert_frame_equal(got, _local_twin(df, 6000))


def test_partition_invariance(ray_session):
    df = _df(seed=11)
    a = _run(df, 4000, parts=2)
    b = _run(df, 4000, parts=13)
    pd.testing.assert_frame_equal(a, b)


def test_crossing_row_kept_then_dropped(ray_session):
    # one speaker, durations 5,5,5 with budget 8: row 2 crosses the
    # budget (running-before = 5 < 8 -> kept), row 3 is dropped
    df = pd.DataFrame({"clip": np.array([1, 2, 3], dtype=np.int64),
                       "spk": np.zeros(3, dtype=np.int64),
                       "dur": np.array([5, 5, 5], dtype=np.int64),
                       "ts": np.array([10, 20, 30], dtype=np.int64)})
    got = _run(df, 8, parts=2)
    assert got["clip"].tolist() == [1, 2]
    assert got["cum_dur"].tolist() == [5, 10]


def test_small_key_passes_whole(ray_session):
    df = _df(seed=3)
    small = df[df["spk"] == 0].copy()
    small["dur"] = 1  # total well under budget
    rest = df[df["spk"] != 0]
    got = _run(pd.concat([small, rest]), 5000, parts=4)
    assert len(got[got["spk"] == 0]) == len(small)
