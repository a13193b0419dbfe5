"""CEP funnel semantics + engine differential (stages/cep.py).

The automaton's contract: strictly-prior running-max step chaining over
the (ts, id) total order — verified on hand-built sequences, then the
many-key vectorized kernel against the single-key scan, then the
streaming kernel (buffered, in-order fold) against the sequential
oracle under in-order AND out-of-order delivery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from parallel_dataflow_ray.stages.cep import (
    FunnelSpec, KleeneSpec, funnel_frame, funnel_scan, kleene_frame,
)
from parallel_dataflow_ray.streaming import (
    OracleExecutor, StreamEngine, TumblingWindows,
)
from parallel_dataflow_ray.streaming.partitioning import epochs_from_table

STEPS = ("a", "b", "c")


def _mask(types, ts=None, gap=10):
    et = np.array(types, dtype=object)
    t = np.arange(len(types), dtype=np.int64) if ts is None \
        else np.asarray(ts, dtype=np.int64)
    return funnel_scan(t, et, STEPS, gap).tolist()


def test_basic_chain():
    assert _mask(["a", "b", "c"]) == [False, False, True]


def test_interleaved_noise():
    assert _mask(["a", "x", "b", "y", "c"]) == [False] * 4 + [True]


def test_step_reuse_one_a_many_chains():
    # one 'a' can serve many 'b's; each qualified 'b' can serve 'c's
    assert _mask(["a", "b", "b", "c", "c"]) == \
        [False, False, False, True, True]


def test_gap_expiry():
    # b arrives 11 ticks after a (gap 10) -> chain broken
    assert _mask(["a", "b", "c"], ts=[0, 11, 12]) == [False, False, False]


def test_order_matters():
    assert _mask(["c", "b", "a"]) == [False, False, False]
    assert _mask(["b", "a", "c"]) == [False, False, False]


def test_strictly_prior_tie_excluded():
    # b at the SAME ts as a: 'prior' means earlier in (ts, id) order, so
    # the tie (same ts, later id) still counts as prior -> chain holds;
    # but a c BEFORE its b in id order at equal ts must not match.
    et = np.array(["a", "b", "c"], dtype=object)
    ts = np.array([5, 5, 5], dtype=np.int64)
    assert funnel_scan(ts, et, STEPS, 10).tolist() == [False, False, True]
    et2 = np.array(["a", "c", "b"], dtype=object)
    assert funnel_scan(ts, et2, STEPS, 10).tolist() == [False, False, False]


def test_reset_negation_blocks_chain():
    et = np.array(["a", "r", "b", "c"], dtype=object)
    ts = np.arange(4, dtype=np.int64)
    # r between a and b kills the a->b transition
    assert funnel_scan(ts, et, STEPS, 10, reset="r").tolist() == [False] * 4
    # without negation the same sequence matches
    assert funnel_scan(ts, et, STEPS, 10).tolist() == [False, False, False,
                                                       True]


def test_reset_between_b_and_c_blocks_final_step():
    et = np.array(["a", "b", "r", "c"], dtype=object)
    ts = np.arange(4, dtype=np.int64)
    assert funnel_scan(ts, et, STEPS, 10, reset="r").tolist() == [False] * 4


def test_reset_before_pattern_is_harmless():
    et = np.array(["r", "a", "b", "c"], dtype=object)
    ts = np.arange(4, dtype=np.int64)
    assert funnel_scan(ts, et, STEPS, 10, reset="r").tolist() == \
        [False, False, False, True]


def test_reset_then_fresh_chain_matches():
    et = np.array(["a", "b", "r", "a", "b", "c"], dtype=object)
    ts = np.arange(6, dtype=np.int64)
    assert funnel_scan(ts, et, STEPS, 10, reset="r").tolist() == \
        [False] * 5 + [True]


def test_frame_reset_matches_scan():
    g = _rand_events(n=4000, seed=13)
    # make 'x' the reset type
    got = funnel_frame(g, "user_id", "ts_us", "event_id", "event_type",
                       STEPS, gap_us=25, reset="x")
    rows = []
    for uid, sub in g.groupby("user_id"):
        sub = sub.sort_values(["ts_us", "event_id"], kind="mergesort")
        done = funnel_scan(sub["ts_us"].to_numpy(),
                           sub["event_type"].to_numpy(), STEPS, 25,
                           reset="x")
        if done.any():
            hit = sub["ts_us"].to_numpy()[done]
            rows.append({"user_id": uid, "n_funnels": int(done.sum()),
                         "first_funnel_us": int(hit.min())})
    want = pd.DataFrame(rows).astype({"n_funnels": "int64"})
    pd.testing.assert_frame_equal(
        got.sort_values("user_id", ignore_index=True),
        want.reset_index(drop=True))
    # negation must actually bite on this fixture
    plain = funnel_frame(g, "user_id", "ts_us", "event_id", "event_type",
                         STEPS, gap_us=25)
    assert want["n_funnels"].sum() < plain["n_funnels"].sum()


def _rand_events(n=3000, n_users=37, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, n_users, n),
        "ts_us": rng.integers(0, 500, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(list("abcxy"), n).astype(object),
    })


def test_funnel_frame_matches_per_key_scan():
    g = _rand_events()
    got = funnel_frame(g, "user_id", "ts_us", "event_id", "event_type",
                       STEPS, gap_us=25).sort_values("user_id",
                                                     ignore_index=True)
    rows = []
    for uid, sub in g.groupby("user_id"):
        sub = sub.sort_values(["ts_us", "event_id"], kind="mergesort")
        done = funnel_scan(sub["ts_us"].to_numpy(),
                           sub["event_type"].to_numpy(), STEPS, 25)
        if done.any():
            hit = sub["ts_us"].to_numpy()[done]
            rows.append({"user_id": uid, "n_funnels": int(done.sum()),
                         "first_funnel_us": int(hit.min())})
    want = pd.DataFrame(rows).astype({"n_funnels": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert len(want) > 0


def _event_table(ooo: bool, n=1200, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 40_000_000, n).astype(np.int64))
    tbl = pd.DataFrame({
        "user_id": rng.integers(0, 11, n),
        "event_ts": ts,
        "offset": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(list("abcxy"), n).astype(object),
    })
    if ooo:  # scramble arrival order; event times unchanged
        tbl = tbl.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return pa.Table.from_pandas(tbl, preserve_index=False)


@pytest.mark.parametrize("ooo", [False, True], ids=["inorder", "ooo"])
def test_stream_funnel_differential(ooo):
    """Engine (P=4, buffered non-incremental fold) == sequential oracle,
    under in-order and out-of-order delivery — the order-dependent
    automaton must be deterministic because the buffer folds in
    (event_ts, offset) order at window close."""
    spec = FunnelSpec(STEPS, gap_us=2_000_000, key_column="user_id")
    kw = {"spec": spec, "assigner": TumblingWindows(10_000_000)}
    epochs = epochs_from_table(_event_table(ooo), 131)
    lateness = 60_000_000  # nothing late even fully scrambled
    oracle_rows, om = OracleExecutor("window", dict(kw), lateness).run(
        epochs, final_flush=True)
    eng = StreamEngine("window", dict(kw), num_partitions=4,
                       allowed_lateness_us=lateness)
    res = eng.run(epochs, collect=True, final_flush=True)
    engine_rows = [r for ep in res["emitted"] for r in ep]
    key = lambda r: (r["user_id"], r["window_start_us"])
    assert sorted(engine_rows, key=key) == sorted(oracle_rows, key=key)
    assert len(oracle_rows) > 0


def test_stream_funnel_inorder_equals_ooo():
    out = {}
    for ooo in (False, True):
        spec = FunnelSpec(STEPS, gap_us=2_000_000, key_column="user_id")
        eng = StreamEngine("window",
                           {"spec": spec,
                            "assigner": TumblingWindows(10_000_000)},
                           num_partitions=4, allowed_lateness_us=60_000_000)
        res = eng.run(epochs_from_table(_event_table(ooo), 131),
                      collect=True, final_flush=True)
        rows = [r for ep in res["emitted"] for r in ep]
        out[ooo] = sorted(rows, key=lambda r: (r["user_id"],
                                               r["window_start_us"]))
    assert out[False] == out[True]


# ---------------------------------------------------------------- kleene


def _kframe(types, ts=None, gap=10, uid=None):
    n = len(types)
    g = pd.DataFrame({
        "user_id": np.zeros(n, np.int64) if uid is None
        else np.asarray(uid, np.int64),
        "ts_us": np.arange(n, dtype=np.int64) if ts is None
        else np.asarray(ts, np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": np.array(types, dtype=object),
    })
    return kleene_frame(g, "user_id", "ts_us", "event_id", "event_type",
                        "a", "b", "c", gap)


def test_kleene_single_mid():
    out = _kframe(["a", "b", "c"])
    assert out.to_dict("records") == [
        {"user_id": 0, "n_matches": 1, "n_mid": 1, "first_match_us": 2}]


def test_kleene_multi_mid_run():
    out = _kframe(["a", "b", "b", "b", "c"])
    assert out.to_dict("records") == [
        {"user_id": 0, "n_matches": 1, "n_mid": 3, "first_match_us": 4}]


def test_kleene_strict_contiguity_broken_by_noise():
    # an intervening non-b event splits the run; neither piece is
    # bounded by (a, c) on both sides
    assert _kframe(["a", "b", "x", "b", "c"]).empty
    # noise between a and the run, or between the run and c, also kills
    assert _kframe(["a", "x", "b", "c"]).empty
    assert _kframe(["a", "b", "x", "c"]).empty


def test_kleene_gap_violation_anywhere_in_span():
    # gap=10: violate a->b1, b1->b2, and b2->c in turn
    assert _kframe(["a", "b", "b", "c"], ts=[0, 20, 21, 22]).empty
    assert _kframe(["a", "b", "b", "c"], ts=[0, 1, 30, 31]).empty
    assert _kframe(["a", "b", "b", "c"], ts=[0, 1, 2, 40]).empty
    assert len(_kframe(["a", "b", "b", "c"], ts=[0, 9, 18, 27])) == 1


def test_kleene_two_matches_one_key():
    out = _kframe(["a", "b", "c", "a", "b", "b", "c"])
    assert out.to_dict("records") == [
        {"user_id": 0, "n_matches": 2, "n_mid": 3, "first_match_us": 2}]


def test_kleene_run_not_split_across_keys():
    # same positions, but the run's tail belongs to another key
    out = _kframe(["a", "b", "b", "c"], uid=[0, 0, 1, 1])
    assert out.empty


def _kleene_bruteforce(g: pd.DataFrame, gap: int) -> pd.DataFrame:
    rows = []
    for uid, sub in g.groupby("user_id"):
        sub = sub.sort_values(["ts_us", "event_id"], kind="mergesort")
        et = sub["event_type"].to_list()
        ts = sub["ts_us"].to_list()
        matches = []
        i = 0
        while i < len(et):
            if et[i] != "b":
                i += 1
                continue
            j = i
            while j + 1 < len(et) and et[j + 1] == "b":
                j += 1
            if (i > 0 and et[i - 1] == "a" and j + 1 < len(et)
                    and et[j + 1] == "c"
                    and all(ts[k] - ts[k - 1] <= gap
                            for k in range(i, j + 2))):
                matches.append((j - i + 1, ts[j + 1]))
            i = j + 1
        if matches:
            rows.append({"user_id": uid,
                         "n_matches": len(matches),
                         "n_mid": sum(m[0] for m in matches),
                         "first_match_us": min(m[1] for m in matches)})
    cols = ["user_id", "n_matches", "n_mid", "first_match_us"]
    return (pd.DataFrame(rows, columns=cols).astype("int64")
            .sort_values("user_id", ignore_index=True))


def test_kleene_frame_matches_bruteforce():
    g = _rand_events(n=4000, n_users=41, seed=11)
    got = kleene_frame(g, "user_id", "ts_us", "event_id", "event_type",
                       "a", "b", "c", 25).sort_values(
        "user_id", ignore_index=True)
    want = _kleene_bruteforce(
        g.rename(columns={}), 25)
    pd.testing.assert_frame_equal(got, want)
    assert want["n_matches"].sum() > 0
    assert (want["n_mid"] > want["n_matches"]).any()  # real Kleene runs


@pytest.mark.parametrize("ooo", [False, True], ids=["inorder", "ooo"])
def test_stream_kleene_differential(ooo):
    """Engine (P=4, buffered fold) == sequential oracle for the Kleene
    run automaton, in-order and out-of-order."""
    spec = KleeneSpec("a", "b", "c", gap_us=2_000_000,
                      key_column="user_id")
    kw = {"spec": spec, "assigner": TumblingWindows(10_000_000)}
    epochs = epochs_from_table(_event_table(ooo), 131)
    lateness = 60_000_000
    oracle_rows, om = OracleExecutor("window", dict(kw), lateness).run(
        epochs, final_flush=True)
    eng = StreamEngine("window", dict(kw), num_partitions=4,
                       allowed_lateness_us=lateness)
    res = eng.run(epochs, collect=True, final_flush=True)
    engine_rows = [r for ep in res["emitted"] for r in ep]
    key = lambda r: (r["user_id"], r["window_start_us"])
    assert sorted(engine_rows, key=key) == sorted(oracle_rows, key=key)
    assert len(oracle_rows) > 0


def test_funnel_session_windows_differential():
    """CEP over SESSION windows: the buffered funnel automaton folds
    per merged (key, session) interval — engine == sequential oracle,
    in-order and out-of-order (the session merge must carry the
    offset-keyed row buffers through interval merging unchanged)."""
    from parallel_dataflow_ray.streaming import SessionWindows

    for ooo in (False, True):
        spec = FunnelSpec(STEPS, gap_us=2_000_000, key_column="user_id")
        kw = {"spec": spec, "assigner": SessionWindows(3_000_000)}
        epochs = epochs_from_table(_event_table(ooo), 131)
        lateness = 60_000_000
        oracle_rows, om = OracleExecutor("session", dict(kw), lateness).run(
            epochs, final_flush=True)
        eng = StreamEngine("session", dict(kw), num_partitions=4,
                          allowed_lateness_us=lateness)
        res = eng.run(epochs, collect=True, final_flush=True)
        engine_rows = [r for ep in res["emitted"] for r in ep]
        key = lambda r: (r["user_id"], r["window_start_us"])
        assert sorted(engine_rows, key=key) == sorted(oracle_rows, key=key)
        assert len(oracle_rows) > 0
