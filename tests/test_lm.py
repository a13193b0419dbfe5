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


def _bicorpus() -> pd.DataFrame:
    """Two-domain corpus: 'good' docs speak g-words, 'crawl' docs
    c-words, with shared function words f0/f1 in both."""
    rng = np.random.default_rng(11)
    rows = []
    for did in range(200):
        tgt = did < 60
        voc = ([f"g{i}" for i in range(8)] if tgt
               else [f"c{i}" for i in range(20)]) + ["f0", "f1"]
        n = int(rng.integers(5, 25))
        rows.append((did, " ".join(rng.choice(voc, n)),
                     "good" if tgt else "crawl"))
    rows.append((900, "", "crawl"))
    rows.append((901, None, "crawl"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


def _importance_local_twin(df: pd.DataFrame, vocab_size: int
                           ) -> pd.DataFrame:
    def model(sub):
        toks = sub["text"].fillna("").str.split(" ").explode()
        toks = toks[toks != ""]
        cnt = toks.value_counts(sort=False).rename_axis("w").reset_index(
            name="n").sort_values(["n", "w"], ascending=[False, True],
                                  kind="mergesort")
        total = int(cnt["n"].sum())
        lp = {w: int(np.rint(np.log(n / total) * 1e6))
              for w, n in zip(cnt.head(vocab_size)["w"],
                              cnt.head(vocab_size)["n"])}
        return lp, int(np.rint(np.log(1.0 / total) * 1e6))

    lp_t, oov_t = model(df[df["source"] == "good"])
    lp_r, oov_r = model(df)
    out = []
    for did, text in zip(df["doc_id"], df["text"].fillna("")):
        ts = [t for t in text.split(" ") if t != ""]
        lw = sum(lp_t.get(t, oov_t) - lp_r.get(t, oov_r) for t in ts)
        out.append((did, len(ts), int(lw)))
    return pd.DataFrame(out, columns=["doc_id", "n_tokens", "lw_micro"])


def test_importance_weights_match_local_twin_and_separate_domains():
    from parallel_dataflow_ray.stages.lm import score_docs_importance

    df = _bicorpus()
    ds = rd.from_pandas(df)
    tgt = rd.from_pandas(df[df["source"] == "good"].reset_index(drop=True))
    v_t, lp_t, oov_t, _ = unigram_model(tgt, vocab_size=12)
    v_r, lp_r, oov_r, _ = unigram_model(ds, vocab_size=12)
    got = score_docs_importance(ds, (v_t, lp_t, oov_t),
                                (v_r, lp_r, oov_r),
                                batch_size=16).to_pandas()
    want = _importance_local_twin(df, 12)
    g = got.sort_values("doc_id", ignore_index=True)[want.columns]
    for c in ("doc_id", "n_tokens", "lw_micro"):
        g[c] = g[c].astype("int64")
    pd.testing.assert_frame_equal(g, want.sort_values(
        "doc_id", ignore_index=True))
    # the DSIR point: target-domain docs carry higher mean weight
    m = got.merge(df[["doc_id", "source"]], on="doc_id")
    per_tok = m[m["n_tokens"] > 0]
    mean_good = (per_tok[per_tok["source"] == "good"]["lw_micro"]
                 / per_tok[per_tok["source"] == "good"]["n_tokens"]).mean()
    mean_crawl = (per_tok[per_tok["source"] == "crawl"]["lw_micro"]
                  / per_tok[per_tok["source"] == "crawl"]["n_tokens"]).mean()
    assert mean_good > mean_crawl
    # empty/null docs: zero tokens, zero weight
    z = got.set_index("doc_id")
    assert z.loc[900, "lw_micro"] == 0 and z.loc[901, "n_tokens"] == 0


def test_importance_partition_invariance():
    from parallel_dataflow_ray.stages.lm import score_docs_importance

    df = _bicorpus()
    tgt = rd.from_pandas(df[df["source"] == "good"].reset_index(drop=True))
    mt = unigram_model(tgt, vocab_size=12)[:3]
    mr = unigram_model(rd.from_pandas(df), vocab_size=12)[:3]
    a = score_docs_importance(rd.from_pandas(df).repartition(1),
                              mt, mr).to_pandas()
    b = score_docs_importance(rd.from_pandas(df).repartition(7),
                              mt, mr, batch_size=8).to_pandas()
    key = ["doc_id", "n_tokens", "lw_micro"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("doc_id", ignore_index=True),
        b[key].sort_values("doc_id", ignore_index=True))
