"""df-cap on the shingle inverted index: a boilerplate-heavy corpus must
complete with bounded per-shingle fan-out, true near-dups linked by
under-cap shingles must survive, and the drop must be observable via
ngram_df_stats (no silent caps)."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages import dedup as dd

BOILER = "all rights reserved copyright notice terms of service apply here"


def _boiler_corpus(n: int, seed: int = 11) -> pd.DataFrame:
    """Every doc shares a 10-word boilerplate header (every boilerplate
    shingle has df == n) followed by a 40-word unique tail; one planted
    exact-dup pair (ids 0 and 1)."""
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(5000)]
    tails = [" ".join(rng.choice(words, size=40)) for _ in range(n)]
    tails[1] = tails[0]                      # planted near-dup pair (0, 1)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"{BOILER} {t}" for t in tails]})


def test_dfcap_bounds_boilerplate_fanout():
    n = 10_000
    ds = rd.from_pandas(_boiler_corpus(n))
    t0 = time.perf_counter()
    pairs = dd.ngram_jaccard_pairs(ds, threshold_milli=500,
                                   df_cap=64).to_pandas()
    elapsed = time.perf_counter() - t0
    # uncapped, the 8 boilerplate 3-grams alone emit 8 * n*(n-1)/2 = 4e8
    # co-occurrence rows; capped, the merge is bounded by cap² per shingle
    assert elapsed < 120, f"capped run took {elapsed:.1f}s"
    # the planted pair is linked by its 40-word unique tail (df == 2)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    # docs sharing ONLY boilerplate never reach the threshold anyway
    assert all(a == 0 and b == 1 for a, b in got), got


def test_dfcap_drop_is_observable():
    ds = rd.from_pandas(_boiler_corpus(300))
    stats = dd.ngram_df_stats(ds, df_cap=64)
    assert int(stats["n_dropped"].iloc[0]) > 0
    assert int(stats["max_df"].iloc[0]) == 300
    assert int(stats["n_shingles"].iloc[0]) > int(stats["n_dropped"].iloc[0])


def test_dfcap_noop_matches_exact():
    """On a corpus whose max df is under the cap, capped == exact."""
    ds = rd.from_pandas(_boiler_corpus(120))
    capped = dd.ngram_jaccard_pairs(ds, threshold_milli=500,
                                    df_cap=200).to_pandas()
    exact = dd.ngram_jaccard_pairs(ds, threshold_milli=500,
                                   df_cap=None).to_pandas()
    key = ["id_a", "id_b", "jaccard_milli"]
    assert (capped.sort_values(key).reset_index(drop=True)[key]
            .equals(exact.sort_values(key).reset_index(drop=True)[key]))
