"""Regression tests for the round-2 ADVICE findings: interval
replication on empty batches, heavy-hitters total-row flag (empty-string
items are reportable), and exact_dedup carry-from-winning-row when the
winner's carry value is null."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def test_interval_join_empty_interval_batch():
    """tag_intervals must not crash when a batch is empty (Ray version /
    fusion dependent); exercised via a split interval input whose filter
    empties one side."""
    from parallel_dataflow_ray.stages.interval import interval_join

    points = rd.from_pandas(pd.DataFrame({
        "pid": np.arange(6, dtype=np.int64),
        "ts": np.array([5, 15, 25, 35, 45, 55], dtype=np.int64)}))
    iv = pd.DataFrame({
        "iid": np.array([1, 2], dtype=np.int64),
        "lo": np.array([0, 30], dtype=np.int64),
        "hi": np.array([20, 50], dtype=np.int64)})
    # an all-filtered-out shard unions an empty block into the interval side
    intervals = rd.from_pandas(iv).union(
        rd.from_pandas(iv).filter(lambda r: False))
    out = interval_join(points, intervals, ts="ts", start="lo", end="hi",
                        chunk_us=10).to_pandas()
    got = set(zip(out["pid"], out["iid"]))
    assert got == {(0, 1), (1, 1), (3, 2), (4, 2)}


def test_interval_replication_empty_frame_direct():
    """The exclusive prefix sum ``cumsum(cnt) - cnt`` is empty-safe."""
    cnt = np.array([], dtype=np.int64)
    starts = np.cumsum(cnt) - cnt
    assert starts.shape == (0,)
    # and np.repeat over it is a no-op rather than a broadcast error
    assert np.repeat(starts, cnt).shape == (0,)


def test_heavy_hitters_empty_string_item():
    """'' is a valid, reportable item and does not inflate n (the batch
    total rides a separate __is_total flag, not an in-band sentinel)."""
    from parallel_dataflow_ray.stages.sketches import heavy_hitters

    # 60% of items are the empty string -> it IS the heavy hitter
    items = [""] * 60 + [f"w{i}" for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame({"text": items}))
    out = heavy_hitters(
        ds, lambda b: b["text"].astype(object), inv_phi=4).to_pandas()
    assert set(out["item"]) == {""}
    assert int(out.loc[out["item"] == "", "n_occurrences"].iloc[0]) == 60


def test_exact_dedup_carry_null_on_winner():
    """Carry columns come from the winning (min-id) row positionally —
    a null there stays null instead of borrowing the next dup's value."""
    from parallel_dataflow_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": np.array([10, 11, 12, 20], dtype=np.int64),
        "text": ["same", "same", "same", "other"],
        "tag": [None, "loser-a", "loser-b", "kept"]})
    out = exact_dedup(rd.from_pandas(df), carry=["tag"]).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [10, 20]
    assert out["n_dups"].tolist() == [3, 1]
    assert pd.isna(out["tag"].iloc[0])          # winner's null preserved
    assert out["tag"].iloc[1] == "kept"


# --------------------------------------------------------------------------
# round-4 ADVICE findings (fixed round 5)
# --------------------------------------------------------------------------

def test_resume_epoch_and_gc_are_read_only(tmp_path):
    """Probing resume/gc with an OVERESTIMATED num_partitions must not
    fabricate empty pNNNNN dirs — list_checkpoint_partitions infers the
    old partition count from max(pid)+1, and phantom dirs would push the
    next start onto the rescale path with no loadable epoch."""
    from parallel_dataflow_ray.streaming.checkpoint import CheckpointStore

    root = str(tmp_path / "ckpt")
    for p in range(2):
        CheckpointStore(root, p).save(3, b"state", watermark=7, max_offset=9)
    before = sorted(d for d in __import__("os").listdir(root))
    # overestimated probes: 8 partitions when only 2 exist
    assert CheckpointStore.resume_epoch(root, 8) is None
    CheckpointStore.gc(root, 8)
    after = sorted(d for d in __import__("os").listdir(root))
    assert after == before == ["p00000", "p00001"]
    # and the honest probe still resumes
    assert CheckpointStore.resume_epoch(root, 2) == 3


def test_read_as_of_dispatches_lance_fragments(tmp_path, monkeypatch):
    """read_as_of shares read_all's format dispatch: a manifest entry
    pointing at a .lance fragment routes through lance.dataset(), not
    pq.read_table (which would crash on the directory)."""
    import json
    import os
    import sys
    import types

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from parallel_dataflow_ray.streaming.sink import ExactlyOnceSink

    root = str(tmp_path / "sink")
    os.makedirs(os.path.join(root, "manifest"))
    os.makedirs(os.path.join(root, "data", "p00000-e000001.lance"))
    # epoch 2 is a real parquet fragment; epoch 1 is a (stub) lance one
    t2 = pa.table({"clip_id": ["b"], "epoch": [2]})
    pq_.write_table(t2, os.path.join(root, "data", "p00000-e000002.parquet"))
    man = {"partition": 0, "epochs": {
        "1": {"fragment": "p00000-e000001.lance", "rows": 1},
        "2": {"fragment": "p00000-e000002.parquet", "rows": 1}}}
    with open(os.path.join(root, "manifest", "p00000.json"), "w") as f:
        json.dump(man, f)

    t1 = pa.table({"clip_id": ["a"], "epoch": [1]})
    stub = types.ModuleType("lance")
    seen = []

    def dataset(path):
        seen.append(path)
        return types.SimpleNamespace(to_table=lambda: t1)

    stub.dataset = dataset
    monkeypatch.setitem(sys.modules, "lance", stub)

    as_of_1 = ExactlyOnceSink.read_as_of(root, 1)
    assert as_of_1.to_pydict()["clip_id"] == ["a"]
    assert seen and seen[0].endswith(".lance")
    as_of_2 = ExactlyOnceSink.read_as_of(root, 2)
    assert sorted(as_of_2.to_pydict()["clip_id"]) == ["a", "b"]


def test_pq_topk_shortlist_partition_invariant():
    """Local ADC selection uses the same quantized (cos_milli desc,
    id asc) key as the global merge, so the shortlist is identical
    regardless of how the code table is partitioned — including when
    MANY candidates tie exactly."""
    from parallel_dataflow_ray.stages.similarity import pq_topk

    rng = np.random.default_rng(7)
    m, n_codes, sub = 4, 8, 4
    codebooks = rng.normal(size=(m, n_codes, sub))
    # 40 vectors share ONE identical code word -> identical ADC cosine;
    # the old raw-float argpartition picked a batch-position-dependent
    # subset of the tie, the quantized lexsort picks the lowest ids
    codes = np.zeros((40, m), dtype=np.uint8)
    codes[:, :] = 3
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "pq_code": list(codes)})
    queries = rng.normal(size=(2, m * sub))
    outs = []
    for parts in (1, 5):
        code_ds = rd.from_pandas(df).repartition(parts)
        outs.append(pq_topk(code_ds, queries, 5, codebooks,
                            exclude_self=False))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # the deterministic winner of an all-tie is the lowest-id prefix
    assert outs[0][outs[0]["query_id"] == 0]["vec_id"].tolist() == [
        0, 1, 2, 3, 4]


def test_ivfpq_exclude_self_flag():
    """External-query callers (queries not in the corpus) can disable
    the vec_id==query_id self-exclusion convention."""
    from parallel_dataflow_ray.stages.similarity import (
        ivfpq_topk, pq_encode_ivf)

    rng = np.random.default_rng(3)
    d, n = 8, 32
    X = rng.normal(size=(n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    centroids = X[:4].copy()
    sub = 4
    codebooks = rng.normal(size=(2, 16, sub))
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}))
    code_ds = pq_encode_ivf(ds, centroids, codebooks)
    q = X[0:1]          # the query IS corpus row 0, but as an external query
    kw = dict(centroids=centroids, codebooks=codebooks, nprobe=4, rerank=8)
    with_excl = ivfpq_topk(ds, code_ds, q, 3, **kw)
    without = ivfpq_topk(ds, code_ds, q, 3, exclude_self=False, **kw)
    assert 0 not in with_excl["vec_id"].tolist()
    assert without["vec_id"].tolist()[0] == 0     # its own exact match


def test_bm25_rejects_sentinel_query_terms():
    """A query term carrying the in-band \\x02 metadata prefix would
    alias n_docs/n_tokens rows; it is rejected loudly."""
    import pytest

    from parallel_dataflow_ray.stages.retrieval import bm25_stats

    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1], "text": ["hello world"]}))
    with pytest.raises(ValueError, match="x02"):
        bm25_stats(ds, ["hello", "\x02n_docs"])


def test_bigram_separator_tokens_filtered():
    """Tokens containing the \\x1f pair separator are dropped at explode
    time in BOTH training and scoring (they would alias distinct bigram
    pairs); adjacency and counts behave as if they were never there."""
    from parallel_dataflow_ray.stages.lm import bigram_logprob

    clean = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a b a b", "a b"]})
    dirty = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a \x1fjunk\x1f b a b", "a b"]})
    out_c = bigram_logprob(rd.from_pandas(clean)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    out_d = bigram_logprob(rd.from_pandas(dirty)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # the BIGRAM layer treats the separator token as absent: same token
    # stream, same pair table, same hit pattern (the unigram backoff
    # model legitimately still counts it in its corpus totals, so raw
    # logprob values are not compared)
    cols = ["doc_id", "n_tokens", "n_hits"]
    pd.testing.assert_frame_equal(out_c[cols], out_d[cols])
    assert out_d["n_tokens"].tolist() == [4, 2]
    assert out_d["n_hits"].tolist() == [3, 1]   # a->b, b->a, a->b ; a->b


def test_topk_quantized_equals_full_lexsort():
    """argpartition + boundary-tie widening == full lexsort on random
    and heavy-tie inputs (the ADC hot-path selection)."""
    from parallel_dataflow_ray.stages.similarity import _topk_quantized

    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(1, 200))
        k = int(rng.integers(1, 2 * n))
        # heavy ties: values drawn from a tiny alphabet
        cm = rng.integers(-3, 4, n).astype(np.int64)
        ids = rng.permutation(n).astype(np.int64)
        got = _topk_quantized(cm, ids, k)
        want = np.lexsort((ids, -cm))[:k]
        assert np.array_equal(got, want), (trial, n, k)
