"""Oracle-vs-engine differential conformance (SURVEY.md §5, FIXTURES.md F5).

The graft of the reference's `test` binary
(/root/reference/impls/src/bin/test.rs:21-70): the sequential oracle's
output is ground truth; the parallel engine must reproduce it exactly —
for in-order input, out-of-order input under the same watermark, and
for every kernel K1-K4 + the practical aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parallel_dataflow_ray import fixtures
from parallel_dataflow_ray.streaming import (
    OracleExecutor, SessionWindows, SlidingWindows, StreamEngine, TumblingWindows,
)
from parallel_dataflow_ray.streaming.kernels import KERNELS
from parallel_dataflow_ray.streaming.partitioning import epochs_from_table

N = 600
LATENESS_US = 50_000
WIN = TumblingWindows(2_000_000)  # 2 s windows over 10 ms-spaced events
EPOCH_ROWS = 97  # deliberately not a divisor of N


def _clips(ooo: bool) -> pa.Table:
    return fixtures.clips_table(
        N, seed=42, lateness_ms=40 if ooo else 0, n_speakers=7, dup_every=13)


def _run_both(op_kind, op_kwargs, table, lateness=LATENESS_US, P=4):
    epochs = epochs_from_table(table, EPOCH_ROWS)
    oracle_rows, om = OracleExecutor(op_kind, dict(op_kwargs), lateness).run(epochs)
    eng = StreamEngine(op_kind, dict(op_kwargs), num_partitions=P,
                       allowed_lateness_us=lateness)
    res = eng.run(epochs, collect=True)
    engine_rows = [r for ep in res["emitted"] for r in ep]
    return oracle_rows, engine_rows, om, res


@pytest.mark.parametrize("kernel", sorted(KERNELS))
@pytest.mark.parametrize("ooo", [False, True], ids=["inorder", "ooo"])
def test_kernel_parity_tumbling(kernel, ooo):
    spec = KERNELS[kernel]()
    table = _clips(ooo)
    oracle_rows, engine_rows, om, res = _run_both(
        "window", {"spec": spec, "assigner": WIN}, table)
    assert oracle_rows == engine_rows
    assert om["rows_seen"] == N
    # engine-side late counts must sum to the oracle's
    eng_late = {m["partition"]: m["late_rows"] for m in res["metrics"]
                if m["epoch"] == max(x["epoch"] for x in res["metrics"])}
    assert sum(eng_late.values()) == om["late_rows"]


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_sliding_window_parity(kernel):
    """EVERY kernel under sliding panes — incl. the buffered CEP
    automata, where "funnel within any covering pane" means the same
    row set folds per pane independently."""
    spec = KERNELS[kernel]()
    win = SlidingWindows(3_000_000, 1_000_000)
    table = _clips(True)
    oracle_rows, engine_rows, _, _ = _run_both(
        "window", {"spec": spec, "assigner": win}, table)
    assert oracle_rows == engine_rows
    assert len(oracle_rows) > 0


def test_sliding_assign_non_divisor():
    """size % slide != 0: the assigner must return every covering pane
    (brute-force enumeration as ground truth — the oracle shares the
    assigner, so differential parity alone cannot catch a dropped pane)."""
    for size, slide in [(5_000_000, 2_000_000), (3_000_000, 2_000_000),
                        (7_000_000, 3_000_000), (4_000_000, 4_000_000)]:
        win = SlidingWindows(size, slide)
        for ts in [0, 1, 4_500_000, 5_999_999, 6_000_000, 123_456_789]:
            last = (ts // slide) * slide
            want = [(s, s + size)
                    for s in range(last - 10 * slide, last + 1, slide)
                    if s <= ts < s + size]
            assert win.assign(ts) == want, (size, slide, ts)


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_session_window_parity(kernel):
    """EVERY kernel under merged session intervals — buffered specs
    must carry their offset-keyed row buffers through interval merges
    unchanged (the union IS the semilattice combine)."""
    spec = KERNELS[kernel]()
    win = SessionWindows(gap_us=500_000)
    # sessions need gaps: thin the stream so inter-arrival sometimes > gap
    table = _clips(True).filter(
        pa.array((np.arange(N) % 60 < 23)))
    oracle_rows, engine_rows, _, _ = _run_both(
        "session", {"spec": spec, "assigner": win}, table)
    assert oracle_rows == engine_rows
    assert len(oracle_rows) > 0


def test_watermark_gating_k4_emits_only_after_close():
    """CommonWords (∩, ⊤-init) emitted early would be a superset — verify
    nothing emits for a window before the watermark passes its end."""
    spec = KERNELS["common_words"]()
    table = _clips(True)
    epochs = epochs_from_table(table, EPOCH_ROWS)
    eng = StreamEngine("window", {"spec": spec, "assigner": WIN},
                       num_partitions=2, allowed_lateness_us=LATENESS_US)
    res = eng.run(epochs, collect=True)
    for e, rows in enumerate(res["emitted"]):
        wm = res["watermarks"][e]
        for r in rows:
            assert r["window_end"] <= wm


def test_frontier_monotone():
    table = _clips(True)
    epochs = epochs_from_table(table, EPOCH_ROWS)
    eng = StreamEngine("window", {"spec": KERNELS["clip_stats"](),
                                  "assigner": WIN},
                       num_partitions=2, allowed_lateness_us=LATENESS_US)
    res = eng.run(epochs, collect=True)
    wms = res["watermarks"]
    assert all(b >= a for a, b in zip(wms, wms[1:]))


def test_partition_count_invariance():
    """Same rows regardless of P — the across-partitions analog of the
    reference's executor-count invariance."""
    spec_kw = {"spec": KERNELS["active_versions"](), "assigner": WIN}
    table = _clips(True)
    epochs = epochs_from_table(table, EPOCH_ROWS)
    outs = []
    for P in (1, 3, 8):
        eng = StreamEngine("window", dict(spec_kw), num_partitions=P,
                           allowed_lateness_us=LATENESS_US)
        res = eng.run(epochs, collect=True)
        outs.append([r for ep in res["emitted"] for r in ep])
    assert outs[0] == outs[1] == outs[2]


def test_composite_equals_standalone_runs():
    """The defining composite contract: one engine run of clip_profile
    == three standalone runs, column for column (one scan + one
    shuffle buys exactly the same answers)."""
    table = _clips(True)

    def run(kernel):
        eng = StreamEngine("window", {"spec": KERNELS[kernel](),
                                      "assigner": WIN},
                           num_partitions=4, allowed_lateness_us=LATENESS_US)
        res = eng.run(epochs_from_table(table, EPOCH_ROWS), collect=True)
        rows = [r for ep in res["emitted"] for r in ep]
        return {(r.get("key", r.get("speaker_id")),
                 r.get("window_start", r.get("window_start_us"))): r
                for r in rows}

    comp = run("clip_profile")
    for sub in ("clip_stats", "quantile_hist", "top_words"):
        alone = run(sub)
        assert alone, sub
        for k, row in alone.items():
            # composite row must contain every standalone column value
            crow = comp[k]
            for c, v in row.items():
                if c in ("key", "speaker_id", "window_start_us"):
                    continue
                assert crow[c] == v, (sub, k, c)
