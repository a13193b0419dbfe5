"""Iterative graph fixpoints on Ray Data.

The reference engine IS an iterative fixpoint framework (worklist /
frontier-batched executors over semilattice states —
`utils/src/dataflow_executor.rs:15-94`, `impls/src/parallel.rs:14-91`);
this module carries that identity to a numeric fixpoint at corpus
scale: PageRank as a bounded sequence of joins + map-side-combined
aggregations, with EVERY iteration in pure integer arithmetic so the
distributed run is bit-identical to any re-partitioning AND to a SQL
twin (the one numeric fixpoint shape a DuckDB oracle can gate
hash-exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def pagerank(edges: rd.Dataset, *, iters: int = 5, q_bits: int = 30,
             damp_num: int = 17, damp_den: int = 20,
             num_buckets: int = 32,
             edges_layout: str | None = None) -> rd.Dataset:
    """Integer-exact PageRank over an (src, dst) edge Dataset.

    Semantics (deliberately integer — deterministic by construction):
    ranks live as int64 ``rank_q`` with one unit = 2^-q_bits of mass;
    each iteration every edge ships ``rank_q // deg`` (floor) to its
    destination, and nodes update as ``base_q + (damp_num * inbound) //
    damp_den`` with ``base_q = (((damp_den - damp_num) * Q) // damp_den)
    // N``.  Floor division leaks a few units of mass per node per
    round — irrelevant for ranking, and it buys EXACT reproducibility:
    every sum is an int64 sum, so any partitioning, any fold order, and
    the unrolled SQL twin produce bit-identical ranks (the same
    quantize-before-sum discipline as ``kmeans_fit`` and the streaming
    kernels).  Multi-edges are honored (a pair appearing k times ships
    k contributions — matches the SQL twin's multiset join).

    100 TB shape, per iteration: ONE bucket join of the edge table
    against the O(nodes) rank state + ONE map-side-combined grouped sum
    of contributions + ONE left join back onto the node table.  Rank
    state is materialized between rounds (it is O(nodes), the small
    table) to keep lineage bounded — the edge table itself is never
    materialized.

    ``edges_layout``: directory for a persisted hash-bucketed edge
    layout (``stages/bucketed_io.py``).  When set, the edge table is
    written bucketed by ``src`` ONCE and every iteration's join becomes
    an ``smb_probe_join`` — only the O(nodes) rank state crosses the
    wire per round; the edges never re-shuffle.  This is the required
    shape at graph scale: per-round cost drops from O(edges) exchange
    to O(nodes) exchange + co-located bucket reads.
    """
    from .relational import bucket_join, grouped_sum, snap_lineage

    if not 0 < damp_num < damp_den:
        raise ValueError("damping must satisfy 0 < damp_num < damp_den")
    Q = np.int64(1) << q_bits

    def ends(b: pd.DataFrame) -> pd.DataFrame:
        # one emission covers both the node set and the out-degree:
        # src endpoints carry deg 1, dst endpoints deg 0, so the single
        # grouped sum yields (node, deg) with sink nodes at deg 0 —
        # ONE shuffle builds the whole initial state
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        return pd.DataFrame({
            "node": np.concatenate([s, d]),
            "deg": np.concatenate([np.ones(len(s), np.int64),
                                   np.zeros(len(d), np.int64)])})

    node_deg = grouped_sum(edges.map_batches(ends, batch_format="pandas"),
                           ["node"], ["deg"],
                           num_buckets=num_buckets).materialize()
    n = node_deg.count()
    if n == 0:
        return node_deg.map_batches(
            lambda b: b[["node"]].assign(rank_q=np.int64(0)),
            batch_format="pandas")
    init_q = int(Q) // n
    base_q = (((damp_den - damp_num) * int(Q)) // damp_den) // n
    state = node_deg.map_batches(
        lambda b: b.assign(rank_q=np.full(len(b), init_q, np.int64)),
        batch_format="pandas").materialize()

    if edges_layout is not None:
        from .bucketed_io import smb_probe_join, write_bucketed

        write_bucketed(edges, edges_layout, "src",
                       num_buckets=num_buckets)

    for _ in range(iters):
        rank_side = state.map_batches(
            lambda b: b.rename(columns={"node": "src"}),
            batch_format="pandas")
        if edges_layout is not None:
            # edges stay put; only the O(nodes) rank state shuffles
            j = smb_probe_join(rank_side, edges_layout, probe_on="src")
        else:
            j = bucket_join(edges, rank_side, on="src",
                            num_buckets=num_buckets)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            d = b["deg"].to_numpy(np.int64)
            r = b["rank_q"].to_numpy(np.int64)
            keep = d > 0
            return pd.DataFrame({
                "node": b["dst"].to_numpy(np.int64)[keep],
                "__c": r[keep] // d[keep]})

        inbound = grouped_sum(j.map_batches(contrib,
                                            batch_format="pandas"),
                              ["node"], ["__c"], num_buckets=num_buckets)

        def update(b: pd.DataFrame) -> pd.DataFrame:
            s = b["__c"].fillna(0).to_numpy(np.int64)
            return pd.DataFrame({
                "node": b["node"].to_numpy(np.int64),
                "deg": b["deg"].fillna(0).to_numpy(np.int64),
                "rank_q": base_q + (damp_num * s) // damp_den})

        # snap_lineage, NOT materialize(): the round plan contains
        # bucket_join unions, and a retained logical-plan chain
        # compounds exponentially across rounds (see relational.py)
        state = snap_lineage(bucket_join(state.map_batches(
            lambda b: b[["node", "deg"]], batch_format="pandas"),
            inbound, on="node", how="left",
            num_buckets=num_buckets).map_batches(
            update, batch_format="pandas"))

    return state.map_batches(lambda b: b[["node", "rank_q"]],
                             batch_format="pandas")


def pagerank_delta(edges: rd.Dataset, *, iters: int = 5, q_bits: int = 30,
                   damp_num: int = 17, damp_den: int = 20,
                   num_buckets: int = 32,
                   edges_layout: str | None = None,
                   round_stats: list | None = None) -> rd.Dataset:
    """Delta/frontier PageRank — the reference's literal WORKLIST
    semantics (`impls/src/parallel.rs:48-56`, `sequential.rs:42-48`:
    only blocks whose input state CHANGED are re-processed) applied to
    the numeric fixpoint, bit-identical to :func:`pagerank`.

    Instead of every edge re-shipping its source's full contribution
    every round, the per-node state carries the running inbound sum
    ``S(v)`` and the last SHIPPED per-edge contribution ``c(u) =
    rank_q(u) // deg(u)``.  A round ships only the nodes whose floor
    contribution moved — each frontier edge carries the int64
    DIFFERENCE ``c_new - c_shipped`` and destinations fold it into
    ``S(v)``.  Integer sums telescope exactly (the floor happens
    per-node BEFORE the delta), so after any number of rounds
    ``rank_q(v) = base_q + (damp_num * S(v)) // damp_den`` is
    bit-identical to the full recompute and to the unrolled-CTE SQL
    twin.  When the frontier empties, remaining rounds are exact
    no-ops — the loop exits early at the true fixpoint (something the
    dense path cannot detect).

    Per-round cost: O(frontier ∂-rows + their out-edges) exchange
    instead of O(edges) — the quantized contributions freeze
    geometrically, so late rounds ship a small fraction of the graph
    (the measured per-round counts land in ``round_stats``:
    ``{"round", "frontier_nodes", "shipped_rows"}`` per entry;
    ``shipped_rows`` counts the join fan-out actually exchanged).
    Composes with ``edges_layout`` exactly like :func:`pagerank`:
    bucketed edges never move, only frontier deltas shuffle.
    """
    from .relational import bucket_join, grouped_sum, snap_lineage

    if not 0 < damp_num < damp_den:
        raise ValueError("damping must satisfy 0 < damp_num < damp_den")
    Q = np.int64(1) << q_bits

    def ends(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        return pd.DataFrame({
            "node": np.concatenate([s, d]),
            "deg": np.concatenate([np.ones(len(s), np.int64),
                                   np.zeros(len(d), np.int64)])})

    node_deg = grouped_sum(edges.map_batches(ends, batch_format="pandas"),
                           ["node"], ["deg"],
                           num_buckets=num_buckets).materialize()
    n = node_deg.count()
    if n == 0:
        return node_deg.map_batches(
            lambda b: b[["node"]].assign(rank_q=np.int64(0)),
            batch_format="pandas")
    init_q = int(Q) // n
    base_q = (((damp_den - damp_num) * int(Q)) // damp_den) // n
    # state: (node, deg, S = running inbound sum, shipped = last
    # contribution each out-edge carried, rank_q)
    state = node_deg.map_batches(
        lambda b: b.assign(S=np.int64(0), shipped=np.int64(0),
                           rank_q=np.full(len(b), init_q, np.int64)),
        batch_format="pandas").materialize()

    if edges_layout is not None:
        from .bucketed_io import smb_probe_join, write_bucketed

        write_bucketed(edges, edges_layout, "src",
                       num_buckets=num_buckets)

    for rnd in range(iters):
        def front(b: pd.DataFrame) -> pd.DataFrame:
            d = b["deg"].to_numpy(np.int64)
            r = b["rank_q"].to_numpy(np.int64)
            sh = b["shipped"].to_numpy(np.int64)
            c_new = np.where(d > 0, r // np.maximum(d, 1), np.int64(0))
            keep = (d > 0) & (c_new != sh)
            return pd.DataFrame({"src": b["node"].to_numpy(np.int64)[keep],
                                 "delta": (c_new - sh)[keep]})

        frontier = state.map_batches(front,
                                     batch_format="pandas").materialize()
        n_front = frontier.count()
        if n_front == 0:
            if round_stats is not None:
                round_stats.append({"round": rnd, "frontier_nodes": 0,
                                    "shipped_rows": 0})
            break       # exact fixpoint: every further round is a no-op
        if edges_layout is not None:
            j = smb_probe_join(frontier, edges_layout, probe_on="src")
        else:
            j = bucket_join(edges, frontier, on="src",
                            num_buckets=num_buckets)

        def ship(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": b["dst"].to_numpy(np.int64),
                "__d": b["delta"].to_numpy(np.int64)})

        shipped = j.map_batches(ship, batch_format="pandas").materialize()
        if round_stats is not None:
            round_stats.append({"round": rnd,
                                "frontier_nodes": int(n_front),
                                "shipped_rows": int(shipped.count())})
        dS = grouped_sum(shipped, ["node"], ["__d"],
                         num_buckets=num_buckets)

        def update(b: pd.DataFrame) -> pd.DataFrame:
            d = b["deg"].fillna(0).to_numpy(np.int64)
            S = (b["S"].fillna(0).to_numpy(np.int64)
                 + b["__d"].fillna(0).to_numpy(np.int64))
            r_old = b["rank_q"].to_numpy(np.int64)
            return pd.DataFrame({
                "node": b["node"].to_numpy(np.int64), "deg": d, "S": S,
                # this round shipped c_new for every deg>0 node (a
                # non-frontier node's c_new equals its old shipped
                # value, so the unconditional write is identity there)
                "shipped": np.where(d > 0, r_old // np.maximum(d, 1),
                                    np.int64(0)),
                "rank_q": base_q + (damp_num * S) // damp_den})

        # snap_lineage, NOT materialize() — see the dense path's note
        state = snap_lineage(bucket_join(state, dS, on="node", how="left",
                                         num_buckets=num_buckets)
                             .map_batches(update, batch_format="pandas"))

    return state.map_batches(lambda b: b[["node", "rank_q"]],
                             batch_format="pandas")
