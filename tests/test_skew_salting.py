"""Salted-key skew splitting: parity + actual load spreading.

The reference observed skew but did not mitigate it ("the largest
function ... places an upper bound on performance", blog/blog.md:84).
The graft salts hot keys across partitions and merges partial states at
the owner — output must be IDENTICAL to the unsalted oracle.
"""

from __future__ import annotations

import numpy as np

from parallel_dataflow_ray import fixtures
from parallel_dataflow_ray.streaming import OracleExecutor, StreamEngine, TumblingWindows
from parallel_dataflow_ray.streaming.kernels import KERNELS
from parallel_dataflow_ray.streaming.partitioning import (
    detect_hot_keys, epochs_from_table, split_by_partition)

N = 600
LATENESS_US = 50_000
WIN = TumblingWindows(2_000_000)
P = 4


def _skewed():
    # ~40% of rows land on speaker spk-0000 (the hot-speaker fixture)
    return fixtures.clips_table(N, seed=42, lateness_ms=40, n_speakers=6,
                                skew=0.4)


def test_detect_hot_keys_finds_the_hot_speaker():
    hot = detect_hot_keys(_skewed(), "speaker_id", threshold_frac=0.15,
                          num_partitions=P)
    assert "spk-0000" in hot
    assert hot["spk-0000"] >= 2


def test_salted_split_spreads_hot_key():
    table = _skewed()
    hot = {"spk-0000": 4}
    shards = split_by_partition(table, "speaker_id", P, salted_keys=hot)
    with_hot = sum(1 for s in shards
                   if "spk-0000" in set(s["speaker_id"].to_pylist()))
    assert with_hot >= 2  # the hot key now lives on several partitions


def _parity(kernel: str):
    table = _skewed()
    epochs = epochs_from_table(table, 97)
    spec = KERNELS[kernel]()
    kw = {"spec": spec, "assigner": WIN}
    oracle_rows, _ = OracleExecutor("window", dict(kw), LATENESS_US).run(epochs)
    hot = detect_hot_keys(table, "speaker_id", num_partitions=P)
    assert hot, "fixture must actually be skewed"
    eng = StreamEngine("window", dict(kw), num_partitions=P,
                       allowed_lateness_us=LATENESS_US, salted_keys=hot)
    res = eng.run(epochs, collect=True)
    engine_rows = [r for ep in res["emitted"] for r in ep]
    assert engine_rows == oracle_rows


def test_salted_parity_incremental_kernel():
    _parity("clip_stats")


def test_salted_parity_setunion_kernel():
    _parity("active_versions")


def test_salted_parity_buffered_reverse_kernel():
    # buffered/reverse spec: partials are row buffers, owner folds the
    # union in full (reverse) event order
    _parity("reverse_live_words")


def test_salted_parity_intersection_kernel():
    _parity("common_words")


def test_salted_parity_kleene_kernel():
    # buffered run automaton: salted partials are offset-keyed row
    # buffers, the owner folds the union in (event_ts, offset) order
    _parity("codec_kleene")


def test_salted_parity_content_dedup_kernel():
    # fingerprint-keyed MIN-meet: salted partials merge element-wise,
    # same semilattice argument as first_seen
    _parity("content_dedup")
