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
    from .relational import bucket_join, grouped_sum

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

        state = bucket_join(state.map_batches(
            lambda b: b[["node", "deg"]], batch_format="pandas"),
            inbound, on="node", how="left",
            num_buckets=num_buckets).map_batches(
            update, batch_format="pandas").materialize()

    return state.map_batches(lambda b: b[["node", "rank_q"]],
                             batch_format="pandas")
