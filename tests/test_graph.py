"""Integer-exact PageRank (stages/graph.py).

The fixpoint is pure int64 arithmetic (floor-division contributions,
quantized mass), so the distributed run must be BIT-IDENTICAL to a
driver-local twin and invariant to partitioning — the Ray restatement
of the reference's deterministic frontier-batched fixpoint
(impls/src/parallel.rs:14-91).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.graph import pagerank

Q_BITS = 30
Q = np.int64(1) << Q_BITS


def _local_twin(edges: pd.DataFrame, iters: int,
                damp_num: int = 17, damp_den: int = 20) -> pd.DataFrame:
    """Driver-local re-implementation of the same quantized update."""
    nodes = np.unique(np.concatenate([edges["src"], edges["dst"]]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = edges["src"].map(idx).to_numpy(np.int64)
    dst = edges["dst"].map(idx).to_numpy(np.int64)
    deg = np.bincount(src, minlength=n).astype(np.int64)
    rank = np.full(n, int(Q) // n, np.int64)
    base = (((damp_den - damp_num) * int(Q)) // damp_den) // n
    for _ in range(iters):
        contrib = rank[src] // deg[src]
        inbound = np.bincount(dst, weights=None, minlength=n) * 0
        np.add.at(inbound, dst, contrib)
        rank = base + (damp_num * inbound.astype(np.int64)) // damp_den
    return pd.DataFrame({"node": nodes, "rank_q": rank})


def _edges(n_nodes=60, n_edges=400, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "src": rng.integers(0, n_nodes, n_edges).astype(np.int64),
        "dst": rng.integers(0, n_nodes, n_edges).astype(np.int64)})


def _run(edges_df: pd.DataFrame, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(edges_df).repartition(7)
    out = pagerank(ds, **kw).to_pandas()
    return out.sort_values("node", ignore_index=True)


def test_matches_local_twin_bit_exact(ray_session):
    e = _edges()
    got = _run(e, iters=4, num_buckets=8)
    want = _local_twin(e, iters=4).sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


def test_partition_invariance(ray_session):
    e = _edges(seed=5)
    a = _run(e, iters=3, num_buckets=4)
    b = _run(e, iters=3, num_buckets=16)
    pd.testing.assert_frame_equal(a, b)


def test_multi_edges_ship_k_contributions(ray_session):
    # a->b twice, a->c once: b's inbound is 2x c's (exact multiset join)
    e = pd.DataFrame({"src": np.int64([1, 1, 1, 2, 3]),
                      "dst": np.int64([2, 2, 3, 1, 1])})
    got = _run(e, iters=1, num_buckets=4).set_index("node")["rank_q"]
    want = _local_twin(e, iters=1).set_index("node")["rank_q"]
    assert got.to_dict() == want.to_dict()
    base = (((20 - 17) * int(Q)) // 20) // 3
    r0 = int(Q) // 3
    assert got[2] == base + (17 * (2 * (r0 // 3))) // 20
    assert got[3] == base + (17 * (r0 // 3)) // 20


def test_sink_nodes_contribute_nothing(ray_session):
    # node 9 has no outgoing edges: deg 0 rows are dropped, not divided
    e = pd.DataFrame({"src": np.int64([1, 2]), "dst": np.int64([9, 9])})
    got = _run(e, iters=2, num_buckets=4)
    want = _local_twin(e, iters=2).sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


# --------------------------------------------------------------------------
# delta/frontier path (round 5): worklist semantics, bit-identical
# --------------------------------------------------------------------------

def _run_delta(edges_df: pd.DataFrame, stats=None, **kw) -> pd.DataFrame:
    from parallel_dataflow_ray.stages.graph import pagerank_delta

    ds = rd.from_pandas(edges_df).repartition(7)
    out = pagerank_delta(ds, round_stats=stats, **kw).to_pandas()
    return out.sort_values("node", ignore_index=True)


def test_delta_matches_dense_and_twin(ray_session):
    e = _edges()
    want = _local_twin(e, iters=4).sort_values("node", ignore_index=True)
    got = _run_delta(e, iters=4, num_buckets=8)
    pd.testing.assert_frame_equal(got, want)


def test_delta_partition_invariance(ray_session):
    e = _edges(seed=5)
    a = _run_delta(e, iters=3, num_buckets=4)
    b = _run_delta(e, iters=3, num_buckets=16)
    pd.testing.assert_frame_equal(a, b)


def test_delta_frontier_shrinks_and_early_exits(ray_session):
    """On a convergent graph the quantized contributions freeze, the
    frontier shrinks to empty, and the loop exits at the EXACT fixpoint
    — extra dense rounds change nothing (worklist semantics,
    impls/src/parallel.rs:48-56)."""
    # star + chain: tiny graph converges in a handful of rounds
    e = pd.DataFrame({
        "src": np.int64([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        "dst": np.int64([0, 0, 0, 0, 0, 1, 2, 3, 4, 5])})
    stats: list = []
    got = _run_delta(e, iters=100, num_buckets=4, stats=stats)
    fronts = [r["frontier_nodes"] for r in stats]
    assert fronts[-1] == 0                  # reached the exact fixpoint
    assert len(fronts) < 100                # ...well before the bound
    # monotone-ish shrink: every later round ships no more than round 0
    assert max(fronts[1:]) <= fronts[0]
    # shipped_rows is the real exchange size and also hits zero
    assert stats[-1]["shipped_rows"] == 0
    # and the early-exited result equals the dense run at the full bound
    want = _local_twin(e, iters=100).sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


def test_delta_smb_layout_same_result(ray_session, tmp_path):
    from parallel_dataflow_ray.stages.graph import pagerank_delta

    e = _edges(seed=9, n_nodes=40, n_edges=200)
    plain = _run_delta(e, iters=3, num_buckets=8)
    ds = rd.from_pandas(e).repartition(5)
    smb = pagerank_delta(ds, iters=3, num_buckets=8,
                         edges_layout=str(tmp_path / "pr_edges")
                         ).to_pandas().sort_values("node",
                                                   ignore_index=True)
    pd.testing.assert_frame_equal(plain, smb)
