"""Bigram stupid-backoff scorer: hand-computed tiny-corpus parity,
first-token/backoff/hit accounting, partition invariance."""
import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages.lm import (BACKOFF_MICRO, bigram_logprob,
                                             bigram_model)


def _docs():
    return pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b a b c", "a b", "c c c", None]})


def test_hand_computed_tiny_corpus(ray_session):
    ds = rd.from_pandas(_docs())
    out = bigram_logprob(ds, vocab_size=100, max_bigrams=100,
                         ).to_pandas().set_index("doc_id").sort_index()
    # corpus tokens: a:3 b:3 c:4  total 10
    # bigrams: (a,b):3 (b,a):1 (b,c):1 (c,c):2
    lp = lambda num, den: int(np.rint(np.log(num / den) * 1e6))
    uni = {"a": lp(3, 10), "b": lp(3, 10), "c": lp(4, 10)}
    big = {("a", "b"): lp(3, 3), ("b", "a"): lp(1, 3),
           ("b", "c"): lp(1, 3), ("c", "c"): lp(2, 4)}
    # doc0 "a b a b c": uni(a) + b|a + a|b + b|a + c|b
    want0 = (uni["a"] + big[("a", "b")] + big[("b", "a")]
             + big[("a", "b")] + big[("b", "c")])
    assert out.loc[0, "logprob_micro"] == want0
    assert out.loc[0, "n_hits"] == 4 and out.loc[0, "n_tokens"] == 5
    # doc2 "c c c": uni(c) + c|c + c|c
    assert out.loc[2, "logprob_micro"] == uni["c"] + 2 * big[("c", "c")]
    # null doc: zeros
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "logprob_micro"] == 0


def test_backoff_applies_when_bigram_capped_out(ray_session):
    ds = rd.from_pandas(_docs())
    # cap the bigram table at 1: only (a,b) [count 3] survives
    out = bigram_logprob(ds, vocab_size=100, max_bigrams=1,
                         ).to_pandas().set_index("doc_id").sort_index()
    lp = lambda num, den: int(np.rint(np.log(num / den) * 1e6))
    uni = {"a": lp(3, 10), "b": lp(3, 10), "c": lp(4, 10)}
    ab = lp(3, 3)
    # doc0: uni(a) + [a,b hit] + [b,a miss] + [a,b hit] + [b,c miss]
    want0 = (uni["a"] + ab + (BACKOFF_MICRO + uni["a"]) + ab
             + (BACKOFF_MICRO + uni["c"]))
    assert out.loc[0, "logprob_micro"] == want0
    assert out.loc[0, "n_hits"] == 2


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(8)
    vocab = ["u", "v", "w", "x", "y"]
    docs = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.integers(1, 15)))
                 for _ in range(200)]})
    outs = []
    for p in (1, 3, 8):
        ds = rd.from_pandas(docs).repartition(p)
        o = bigram_logprob(ds, vocab_size=3, max_bigrams=6
                           ).to_pandas().sort_values("doc_id",
                                                     ignore_index=True)
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])


def test_model_caps_bind_deterministically(ray_session):
    ds = rd.from_pandas(_docs())
    bk, l12, _uni = bigram_model(ds, max_bigrams=2, vocab_size=2)
    # top-2 bigrams by (count desc, key asc): (a,b):3 then (c,c):2
    assert list(bk) == ["a\x1fb", "c\x1fc"]
    assert len(l12) == 2
