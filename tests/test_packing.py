"""Sequence-packing properties (stages/packing.py).

token_shards is SQL-gated via the parametrized oracle suite; here the
distributed scan is checked against a local single-pass twin, and
pack_greedy's non-SQL-expressible recurrence gets its invariants:
row preservation, capacity, contiguity, range isolation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.packing import pack_greedy, token_shards

CAP = 100


def _docs(n=5000, seed=11, max_w=40) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "n_tokens": rng.integers(1, max_w, n).astype(np.int64)})


def test_token_shards_matches_local_scan():
    df = _docs()
    got = token_shards(rd.from_pandas(df), "doc_id", "n_tokens", CAP,
                       range_size=97).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)
    off = df["n_tokens"].cumsum().shift(1, fill_value=0).to_numpy()
    assert (got["doc_id"].to_numpy() == df["doc_id"].to_numpy()).all()
    assert (got["pack_id"].to_numpy() == off // CAP).all()
    assert (got["pack_offset"].to_numpy() == off % CAP).all()


def test_pack_greedy_invariants():
    df = _docs(max_w=60)
    got = pack_greedy(rd.from_pandas(df), "doc_id", "n_tokens", CAP,
                      range_size=97).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)
    # every doc exactly once, weights preserved
    assert (got["doc_id"].to_numpy() == df["doc_id"].to_numpy()).all()
    assert (got["n_tokens"].to_numpy() == df["n_tokens"].to_numpy()).all()
    by_pack = got.groupby("pack_id")
    fill = by_pack["n_tokens"].sum()
    single = by_pack.size() == 1
    # capacity respected unless a pack is a single oversized doc
    assert ((fill <= CAP) | single).all()
    for _, p in got.groupby("pack_id"):
        p = p.sort_values("doc_id")
        w = p["n_tokens"].to_numpy()
        o = p["pack_offset"].to_numpy()
        assert o[0] == 0
        assert (o[1:] == (w.cumsum()[:-1])).all()  # contiguous layout
    # range isolation: pack namespace = doc_id // range_size of members
    assert ((got["pack_id"].to_numpy() >> 32) ==
            got["doc_id"].to_numpy() // 97).all()


def test_pack_greedy_oversized_doc_isolated():
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "n_tokens": np.array([10, 500, 10, 10], np.int64)})
    got = pack_greedy(rd.from_pandas(df), "doc_id", "n_tokens", CAP,
                      range_size=1024).to_pandas().sort_values(
                          "doc_id", ignore_index=True)
    # next-fit: [10], then the 500 overflows into its own pack, then the
    # remaining 10s start pack 2 (next-fit never looks back)
    assert got["pack_id"].to_numpy().tolist() == [0, 1, 2, 2]
    assert got["pack_offset"].to_numpy().tolist() == [0, 0, 0, 10]
