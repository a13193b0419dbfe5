"""Unigram-LM quality scoring (stages/lm.py) — brute-force local-twin
parity, OOV/cap binding, empty-doc handling, partition invariance.
The SQL-parity gate lives in test_queries_oracle.py via the
unigram_logprob_docs oracle entry."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.lm import (score_docs_logprob,
                                             unigram_logprob,
                                             unigram_model)


def _corpus() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    vocab = [f"w{i:02d}" for i in range(40)]
    # zipf-ish draw so the top-V cut is deterministic and distinct
    probs = 1.0 / (np.arange(40) + 1.0)
    probs /= probs.sum()
    rows = []
    for did in range(120):
        n = int(rng.integers(0, 30))            # incl. empty docs
        rows.append((did, " ".join(rng.choice(vocab, n, p=probs))))
    rows.append((900, ""))                      # explicitly empty
    rows.append((901, None))                    # null text
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _local_twin(df: pd.DataFrame, vocab_size: int) -> pd.DataFrame:
    toks = df["text"].fillna("").str.split(" ").explode()
    toks = toks[toks != ""]
    cnt = toks.value_counts(sort=False).rename_axis("word").reset_index(
        name="n").sort_values(["n", "word"], ascending=[False, True],
                              kind="mergesort")
    total = int(cnt["n"].sum())
    top = cnt.head(vocab_size)
    lp = {w: int(np.rint(np.log(n / total) * 1e6))
          for w, n in zip(top["word"], top["n"])}
    oov = int(np.rint(np.log(1.0 / total) * 1e6))
    out = []
    for did, text in zip(df["doc_id"], df["text"].fillna("")):
        ts = [t for t in text.split(" ") if t != ""]
        lps = [lp.get(t, oov) for t in ts]
        n_oov = sum(1 for t in ts if t not in lp)
        s = int(sum(lps))
        out.append((did, len(ts), n_oov, s,
                    (s / len(ts)) if ts else 0.0))
    return pd.DataFrame(out, columns=["doc_id", "n_tokens", "n_oov",
                                      "logprob_micro",
                                      "avg_logprob_micro"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["doc_id", "n_tokens", "n_oov", "logprob_micro",
             "avg_logprob_micro"]].copy()
    for c in df.columns[:-1]:
        df[c] = df[c].astype("int64")
    df["avg_logprob_micro"] = np.round(
        df["avg_logprob_micro"].astype("float64"), 6)
    return df.sort_values("doc_id", ignore_index=True)


def test_unigram_logprob_matches_local_twin_cap_binding():
    df = _corpus()
    got = unigram_logprob(rd.from_pandas(df), vocab_size=16,
                          batch_size=32).to_pandas()
    want = _local_twin(df, 16)
    assert (got["n_oov"] > 0).any()             # the cap BINDS
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_unigram_logprob_uncapped_no_oov():
    df = _corpus()
    got = unigram_logprob(rd.from_pandas(df), vocab_size=10_000,
                          batch_size=32).to_pandas()
    assert int(got["n_oov"].sum()) == 0
    pd.testing.assert_frame_equal(_canon(got), _canon(_local_twin(
        df, 10_000)))


def test_empty_and_null_docs_emit_zero_rows():
    df = _corpus()
    got = unigram_logprob(rd.from_pandas(df), vocab_size=16,
                          batch_size=32).to_pandas().set_index("doc_id")
    for did in (900, 901):
        assert got.loc[did, "n_tokens"] == 0
        assert got.loc[did, "logprob_micro"] == 0
        assert got.loc[did, "avg_logprob_micro"] == 0.0


def test_partition_invariance():
    df = _corpus()
    a = unigram_logprob(rd.from_pandas(df).repartition(1),
                        vocab_size=16).to_pandas()
    b = unigram_logprob(rd.from_pandas(df).repartition(7),
                        vocab_size=16, batch_size=8).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_model_reuse_scores_new_shard():
    """Train on one corpus, score a different shard (the CCNet shape:
    model from the trusted corpus, scores over the crawl)."""
    df = _corpus()
    vocab, lp, oov, total = unigram_model(rd.from_pandas(df),
                                          vocab_size=16)
    assert total == int(df["text"].fillna("").str.split(" ").explode()
                        .replace("", np.nan).dropna().shape[0])
    shard = pd.DataFrame({"doc_id": [1, 2],
                          "text": ["w00 w00 zzz-unseen", "w01"]})
    got = score_docs_logprob(rd.from_pandas(shard), vocab, lp, oov
                             ).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_tokens"] == 3 and got.loc[1, "n_oov"] == 1
    assert got.loc[2, "n_oov"] in (0, 1)        # w01 in-vocab iff top-16
    w00_lp = lp[list(vocab).index("w00")]
    assert got.loc[1, "logprob_micro"] == 2 * w00_lp + oov


def test_load_or_train_unigram_cache_roundtrip(tmp_path):
    df = _corpus()
    path = str(tmp_path / "model" / "unigram.parquet")
    v1, lp1, oov1, t1 = __import__(
        "parallel_dataflow_ray.stages.lm", fromlist=["x"]
    ).load_or_train_unigram(rd.from_pandas(df), cache_path=path,
                            vocab_size=16)
    assert __import__("os").path.exists(path)
    # poison-proof: a cache hit must not re-read the corpus
    v2, lp2, oov2, t2 = __import__(
        "parallel_dataflow_ray.stages.lm", fromlist=["x"]
    ).load_or_train_unigram(rd.from_pandas(df.head(1)), cache_path=path,
                            vocab_size=16)
    assert list(v1) == list(v2)
    np.testing.assert_array_equal(lp1, lp2)
    assert (oov1, t1) == (oov2, t2)
    # scoring through the loaded model == scoring through the trained one
    a = score_docs_logprob(rd.from_pandas(df), v1, lp1, oov1).to_pandas()
    b = score_docs_logprob(rd.from_pandas(df), v2, lp2, oov2).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
