"""Map-side combine parity (shuffle ships partials, not payload rows).

The combine mode folds each split block into per-(key, window) partial
states inside the shuffle-map task, so raw rows — including audio
``bytes`` — never enter the object store.  It is legal exactly when
salted-key splitting is legal (``spec.merge`` over disjoint row
subsets, the semilattice contract of spec.py).  These tests pin:

* emitted-row parity combine vs row path vs sequential oracle, for
  tumbling AND sliding panes, in-order AND out-of-order input, P∈{1,3};
* metrics parity (rows_seen / late_rows sums match the oracle's);
* forced-mode validation errors (non-combinable spec, combine+salting).
"""

from __future__ import annotations

import pytest

from parallel_dataflow_ray import fixtures
from parallel_dataflow_ray.streaming import (
    OracleExecutor, SlidingWindows, StreamEngine, TumblingWindows,
)
from parallel_dataflow_ray.streaming.kernels import KERNELS
from parallel_dataflow_ray.streaming.oracle import canonical_sort
from parallel_dataflow_ray.streaming.partitioning import epochs_from_table

N = 500
LATENESS_US = 50_000
EPOCH_ROWS = 83


def _epochs(ooo: bool):
    t = fixtures.clips_table(N, seed=42, lateness_ms=40 if ooo else 0,
                             n_speakers=7, dup_every=13)
    return epochs_from_table(t, EPOCH_ROWS)


def _run(op_kwargs, epochs, *, combine, P):
    eng = StreamEngine("window", dict(op_kwargs), num_partitions=P,
                       allowed_lateness_us=LATENESS_US,
                       map_side_combine=combine)
    assert eng.combine is bool(combine)
    res = eng.run(epochs, collect=True)
    rows = canonical_sort([r for ep in res["emitted"] for r in ep])
    last = max(m["epoch"] for m in res["metrics"])
    fin = [m for m in res["metrics"] if m["epoch"] == last]
    return rows, (sum(m["rows_seen"] for m in fin),
                  sum(m["late_rows"] for m in fin))


@pytest.mark.parametrize("spec_name", ["audio_energy", "clip_stats",
                                       "top_words", "quantile_hist",
                                       "clip_profile", "vocab_sketch"])
@pytest.mark.parametrize("ooo", [False, True], ids=["inorder", "ooo"])
@pytest.mark.parametrize("win", [TumblingWindows(1_000_000),
                                 SlidingWindows(3_000_000, 2_000_000)],
                         ids=["tumbling", "sliding-nondivisor"])
def test_combine_parity(spec_name, ooo, win):
    kw = {"spec": KERNELS[spec_name](), "assigner": win}
    epochs = _epochs(ooo)
    oracle_rows, om = OracleExecutor("window", dict(kw), LATENESS_US).run(epochs)
    oracle_rows = canonical_sort(oracle_rows)
    for P in (1, 3):
        c_rows, c_m = _run(kw, epochs, combine=True, P=P)
        r_rows, r_m = _run(kw, epochs, combine=False, P=P)
        assert c_rows == oracle_rows
        assert r_rows == oracle_rows
        assert c_m == r_m == (om["rows_seen"], om["late_rows"])


def test_combine_fragment_rowgroup_fanout(tmp_path):
    """Parquet-fragment epochs with multiple row groups: combine mode
    fans each fragment into row-group-range sub-tasks (pruned reads).
    Output and accounting must match the in-memory row path exactly."""
    import pyarrow.parquet as pq

    from parallel_dataflow_ray.streaming.partitioning import parquet_epochs

    t = fixtures.clips_table(N, seed=42, lateness_ms=40, n_speakers=7,
                             dup_every=13)
    d = tmp_path / "frags"
    d.mkdir()
    for i, lo in enumerate(range(0, N, EPOCH_ROWS)):
        pq.write_table(t.slice(lo, EPOCH_ROWS), d / f"part-{i:04d}.parquet",
                       row_group_size=17)
    frag_epochs = parquet_epochs(str(d))
    # every full-size fragment fans into >1 row group (the 2-row tail
    # fragment legitimately has a single group)
    assert sum(e["num_row_groups"] > 1 for e in frag_epochs) >= len(frag_epochs) - 1
    kw = {"spec": KERNELS["audio_energy"](),
          "assigner": TumblingWindows(1_000_000)}
    mem_epochs = epochs_from_table(t, EPOCH_ROWS)
    oracle_rows, om = OracleExecutor("window", dict(kw),
                                     LATENESS_US).run(mem_epochs)
    rows, m = _run(kw, frag_epochs, combine=True, P=3)
    assert rows == canonical_sort(oracle_rows)
    assert m == (om["rows_seen"], om["late_rows"])


def test_combine_auto_defaults():
    win = TumblingWindows(1_000_000)
    on = StreamEngine("window", {"spec": KERNELS["audio_energy"](),
                                 "assigner": win})
    assert on.combine
    # non-incremental (backward/buffered) spec: auto stays off
    off = StreamEngine("window", {"spec": KERNELS["reverse_live_words"](),
                                  "assigner": win})
    assert not off.combine
    # salting keeps the row path (its own partial-routing protocol)
    salted = StreamEngine("window", {"spec": KERNELS["audio_energy"](),
                                     "assigner": win},
                          salted_keys={"spk-0": 3})
    assert not salted.combine


def test_combine_forced_validation():
    win = TumblingWindows(1_000_000)
    with pytest.raises(ValueError, match="incremental"):
        StreamEngine("window", {"spec": KERNELS["reverse_live_words"](),
                                "assigner": win}, map_side_combine=True)
    with pytest.raises(ValueError, match="salting"):
        StreamEngine("window", {"spec": KERNELS["audio_energy"](),
                                "assigner": win},
                     salted_keys={"spk-0": 3}, map_side_combine=True)
