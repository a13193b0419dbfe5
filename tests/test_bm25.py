"""BM25: hand-computed score parity, stats accounting, partition
invariance, empty/no-hit docs."""
import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.retrieval import bm25_stats, bm25_topk


def _docs():
    return pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["cat dog cat", "dog dog dog fish", "bird", "",
                 None]})


def test_stats_accounting(ray_session):
    ds = rd.from_pandas(_docs())
    dfs, n_docs, n_tokens = bm25_stats(ds, ["cat", "dog", "absent"])
    assert n_docs == 5 and n_tokens == 8
    assert dfs == {"absent": 0, "cat": 1, "dog": 2}


def test_hand_computed_scores(ray_session):
    ds = rd.from_pandas(_docs())
    out = bm25_topk(ds, ["cat", "dog"], k=5).to_pandas()
    k1, b = 1.2, 0.75
    avgdl = 8 / 5
    def idf(df): return np.log((5 - df + 0.5) / (df + 0.5) + 1.0)
    def term(w_idf, tf, dl):
        return int(np.rint(w_idf * tf * (k1 + 1.0)
                           / (tf + k1 * (1 - b + b * dl / avgdl)) * 1e6))
    want0 = term(idf(1), 2.0, 3.0) + term(idf(2), 1.0, 3.0)   # doc0
    want1 = term(idf(2), 3.0, 4.0)                            # doc1
    got = out.set_index("doc_id")["bm25_micro"]
    assert got.loc[0] == want0 and got.loc[1] == want1
    # docs with no hits (incl. empty/null) score exactly 0
    assert got.loc[2] == 0 and got.loc[3] == 0 and got.loc[4] == 0
    # ranking: by score desc then id asc
    assert list(out["doc_id"][:2]) == sorted(
        [0, 1], key=lambda d: (-got.loc[d], d))


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(17)
    vocab = ["red", "green", "blue", "cyan", "teal"]
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.integers(1, 20)))
                 for _ in range(300)]})
    outs = []
    for p in (1, 4, 9):
        ds = rd.from_pandas(docs).repartition(p)
        outs.append(bm25_topk(ds, ["red", "teal"], k=25).to_pandas())
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o.reset_index(drop=True),
                                      outs[0].reset_index(drop=True))
