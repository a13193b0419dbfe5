"""Weighted systematic sampling (stages/sampling.py).

Integer-exact and RNG-free, so the distributed run must be
bit-identical to a driver-local twin, invariant to partitioning, and
hit counts must be exactly proportional-by-construction: row i covers
``(cb+w)//stride - cb//stride`` cuts of the cumulative-weight line.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.sampling import weighted_systematic_sample


def _local_twin(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values("doc_id", ignore_index=True)
    w = df["w"].to_numpy(np.int64)
    stride = max(1, int(w.sum()) // k)
    cb = np.cumsum(w) - w
    hits = (cb + w) // stride - cb // stride
    keep = hits > 0
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                         "w": w[keep], "n_hits": hits[keep].astype(np.int64)})


def _df(n=3000, seed=4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "w": rng.integers(1, 500, n).astype(np.int64)})


def _run(df: pd.DataFrame, k: int, parts: int, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df.sample(frac=1, random_state=0)).repartition(parts)
    out = weighted_systematic_sample(ds, k, id_col="doc_id",
                                     weight_col="w", **kw)
    return out.to_pandas().sort_values("doc_id", ignore_index=True)


def test_matches_local_twin(ray_session):
    df = _df()
    got = _run(df, 100, parts=7)
    pd.testing.assert_frame_equal(got, _local_twin(df, 100))


def test_partition_and_range_size_invariance(ray_session):
    df = _df(seed=9)
    a = _run(df, 64, parts=3, range_size=512)
    b = _run(df, 64, parts=11, range_size=128)
    pd.testing.assert_frame_equal(a, b)


def test_total_hits_and_heavy_row_multiplicity(ray_session):
    # one row carries half the mass -> it draws ~k/2 times
    df = pd.DataFrame({"doc_id": np.arange(101, dtype=np.int64),
                       "w": np.r_[np.full(100, 10), 1000].astype(np.int64)})
    got = _run(df, 20, parts=4)
    stride = int(df["w"].sum()) // 20
    heavy = got.set_index("doc_id")["n_hits"].get(100, 0)
    assert heavy >= 1000 // stride  # >= floor(w/stride) draws
    total = int(got["n_hits"].sum())
    assert total == int(df["w"].sum()) // stride  # every cut lands once


def test_temperature_mix_upweights_small_sources():
    """alpha=0.5 temperature weights: a source with 1/100 of the chars
    gets ~sqrt(1/100)=1/10 of the sampled mass — small sources are
    UP-weighted vs their raw share, large sources down-weighted."""
    import pandas as pd
    import ray.data as rd

    from parallel_dataflow_ray.stages.sampling import (
        weighted_systematic_sample)

    big = pd.DataFrame({"doc_id": np.arange(1000), "source": "big",
                        "n_chars": 1000})
    small = pd.DataFrame({"doc_id": np.arange(1000, 1010),
                          "source": "small", "n_chars": 1000})
    df = pd.concat([big, small], ignore_index=True)
    ns = df.groupby("source")["n_chars"].sum().to_dict()
    df["w_milli"] = np.maximum(np.rint(
        df["n_chars"] * np.power(df["source"].map(ns).astype(float), -0.5)
        * 1000).astype(np.int64), 1)
    out = weighted_systematic_sample(
        rd.from_pandas(df[["doc_id", "w_milli"]]), 500,
        id_col="doc_id", weight_col="w_milli").to_pandas()
    hits = out.merge(df[["doc_id", "source"]], on="doc_id")
    share = hits.groupby("source")["n_hits"].sum()
    total = share.sum()
    raw_small = 10 / 1010                 # raw char share ~1%
    temp_small = share.get("small", 0) / total
    # sqrt-temperature share ~ sqrt(10)/(sqrt(1000)+sqrt(10)) ~ 9.1%
    assert temp_small > 3 * raw_small
    assert abs(temp_small - 0.091) < 0.03
