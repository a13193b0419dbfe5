"""BPE trainer/encoder: bit-exactness vs a pure-Python reference,
partition invariance, cap accounting, encode round-trip."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from parallel_dataflow_ray.stages.bpe import (apply_merges, bpe_encode,
                                              bpe_train, train_bpe_merges,
                                              word_count_table)


def ref_train(words, counts, k, min_count=2):
    """Textbook greedy BPE over a word-count map (the twin)."""
    corpus = {w: list(w) for w in words}
    cnts = dict(zip(words, counts))
    merges = []
    for rank in range(k):
        pc = {}
        for w, syms in corpus.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnts[w]
        if not pc:
            break
        best_n = max(pc.values())
        best = min(p for p, c in pc.items() if c == best_n)
        if best_n < min_count:
            break
        merges.append((rank, best[0], best[1], best_n))
        left, right = best
        for w, syms in corpus.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            corpus[w] = out
    return merges


def ref_encode(word, merges):
    syms = list(word)
    for _rank, left, right, _n in merges:
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_trainer_matches_reference_classic():
    wt = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                       "n": [5, 2, 6, 3]})
    got = [tuple(x) for x in
           train_bpe_merges(wt, num_merges=10).itertuples(index=False)]
    assert got == ref_train(wt["word"].tolist(), wt["n"].tolist(), 10)


def test_trainer_overlap_semantics():
    # "aaaa" x3: pair (a,a) counts 9 (overlaps included in COUNTING),
    # but merging is left-to-right non-overlapping -> "aa aa"
    wt = pd.DataFrame({"word": ["aaaa", "ab"], "n": [3, 1]})
    got = [tuple(x) for x in
           train_bpe_merges(wt, num_merges=3).itertuples(index=False)]
    assert got == ref_train(["aaaa", "ab"], [3, 1], 3)
    assert got[0] == (0, "a", "a", 9)


def test_trainer_matches_reference_random():
    rng = np.random.default_rng(7)
    alpha = list("abcde")
    words = sorted({"".join(rng.choice(alpha, rng.integers(1, 9)))
                    for _ in range(120)})
    counts = rng.integers(1, 40, len(words)).tolist()
    wt = pd.DataFrame({"word": words, "n": counts})
    got = [tuple(x) for x in
           train_bpe_merges(wt, num_merges=32).itertuples(index=False)]
    assert got == ref_train(words, counts, 32)


def test_tie_break_is_lexicographic():
    # xy and yz both occur exactly twice -> (x, y) < (y, z) wins round 0
    wt = pd.DataFrame({"word": ["xy", "xy", "yz", "yz"], "n": [1, 1, 1, 1]})
    m = train_bpe_merges(wt, num_merges=1)
    assert (m["left"].iloc[0], m["right"].iloc[0]) == ("x", "y")


def test_min_count_stops_early():
    wt = pd.DataFrame({"word": ["ab"], "n": [1]})
    assert len(train_bpe_merges(wt, num_merges=5, min_count=2)) == 0


def test_encode_matches_reference_and_roundtrips():
    wt = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                       "n": [5, 2, 6, 3]})
    m = train_bpe_merges(wt, num_merges=10)
    merges = [tuple(x) for x in m.itertuples(index=False)]
    words = np.array(["lowest", "newest", "low", "zebra", "a"],
                     dtype=object)
    got = apply_merges(words, m)
    for w, toks in zip(words, got):
        assert toks == ref_encode(w, merges)
        assert "".join(toks) == w        # segmentation, never mutation


def test_distributed_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.integers(3, 12)))
                 for _ in range(300)]})
    outs = []
    for nparts in (1, 3, 8):
        ds = rd.from_pandas(docs).repartition(nparts)
        merges, stats = bpe_train(ds, num_merges=24, max_words=1 << 20)
        outs.append((merges, stats))
    for m, s in outs[1:]:
        pd.testing.assert_frame_equal(m, outs[0][0])
        assert s == outs[0][1]
    # and the distributed count matches a local reference train
    words = (docs["text"].str.split(" ").explode())
    vc = words[words != ""].value_counts()
    ref = ref_train(vc.index.tolist(), vc.tolist(), 24)
    assert [tuple(x) for x in outs[0][0].itertuples(index=False)] == ref


def test_cap_stats_report_dropped_mass(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["aa aa aa", "bb bb", "cc", "dd"]})
    ds = rd.from_pandas(docs)
    table, stats = word_count_table(ds, max_words=2)
    assert stats["distinct_words"] == 4
    assert stats["kept_words"] == 2 and stats["dropped_words"] == 2
    assert stats["total_tokens"] == 7
    assert stats["dropped_token_mass"] == 2          # cc + dd
    assert table["word"].tolist() == ["aa", "bb"]    # count desc, word asc


def test_bpe_encode_dataset(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["low lower", "newest", "", None, "low low low",
                 "widest newest"]})
    ds = rd.from_pandas(docs)
    merges, _ = bpe_train(ds, num_merges=16, max_words=1 << 20)
    out = bpe_encode(ds, merges).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == list(range(6))
    # null/empty docs -> zero tokens; others: n_bpe_tokens >= n_words
    assert out.loc[2, "n_words"] == 0 and out.loc[3, "n_words"] == 0
    nonzero = out[out["n_words"] > 0]
    assert (nonzero["n_bpe_tokens"] >= nonzero["n_words"]).all()
    # per-word parity with the reference encoder
    mt = [tuple(x) for x in merges.itertuples(index=False)]
    assert out.loc[4, "n_bpe_tokens"] == 3 * len(ref_encode("low", mt))
