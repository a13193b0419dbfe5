"""Gopher-rule quality signals + intra-doc repetition — unit laws
(the SQL-parity gate lives in test_queries_oracle.py via the
gopher_quality_docs / repetition_docs oracle entries)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from parallel_dataflow_ray.functions.text import (GOPHER_STOPWORDS,
                                                  dup_ngram_stats,
                                                  gopher_stats)


def test_gopher_stats_exact_small_cases():
    s = pd.Series(["a bb ccc", None, "", "#... x"])
    g = gopher_stats(s)
    assert g["n_words"].tolist() == [3, 1, 1, 2]
    # "a bb ccc": 6 word chars over 3 words -> 2000 milli
    assert g["mean_wlen_milli"][0] == 2000
    # "a" is a stopword token in the first doc
    assert g["stop_hits"][0] == 1
    # "#... x": one '#' + one '...' over 2 words -> 1000 milli
    assert g["symbol_milli"][3] == 1000
    assert not g["keep"].any()          # all fail the 50-word floor


def test_gopher_keep_thresholds():
    good = " ".join(["word"] * 48 + ["the", "and"])        # 50 words
    g = gopher_stats(pd.Series([good]))
    assert g["n_words"][0] == 50 and g["stop_hits"][0] == 2
    assert bool(g["keep"][0])
    # one word fewer -> fails the floor
    g2 = gopher_stats(pd.Series([" ".join(["word"] * 47 + ["the", "and"])]))
    assert not bool(g2["keep"][0])
    # symbol spam flips it
    g3 = gopher_stats(pd.Series([good + " " + "#" * 40]))
    assert not bool(g3["keep"][0])


def test_gopher_stopword_is_token_level():
    # 'the' inside a longer word must NOT count
    g = gopher_stats(pd.Series(["theory lather bathe"]))
    assert g["stop_hits"][0] == 0
    g2 = gopher_stats(pd.Series(["the x"]))                # leading token
    assert g2["stop_hits"][0] == 1
    assert len(GOPHER_STOPWORDS) == 5


def test_dup_ngram_stats_matches_bruteforce():
    rng = np.random.default_rng(4)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(50)] + ["", None, "one two"]
    got = dup_ngram_stats(pd.Series(texts), k=3)
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        grams = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert got["n_grams"][i] == len(grams)
        assert got["n_distinct"][i] == len(set(grams))
        want = (len(grams) - len(set(grams))) * 1000 // len(grams) \
            if grams else 0
        assert got["dup_milli"][i] == want


def test_dup_ngram_boilerplate_scores_high():
    looped = " ".join(["copy this line"] * 40)
    clean = " ".join(f"w{i}" for i in range(120))
    g = dup_ngram_stats(pd.Series([looped, clean]))
    assert g["dup_milli"][0] > 900
    assert g["dup_milli"][1] == 0


def test_compression_ratio_signal():
    import numpy as np
    import pandas as pd

    from parallel_dataflow_ray.functions.text import compression_ratio_milli

    rng = np.random.default_rng(4)
    rep = "spam ham " * 200
    prose = " ".join(rng.choice(
        ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
         "dogs", "while", "rivers", "bend"], 400))
    noise = "".join(chr(33 + int(x)) for x in rng.integers(0, 90, 1600))
    s = pd.Series([rep, prose, noise, "", None])
    r = compression_ratio_milli(s)
    # repetition compresses hardest; random printable noise barely
    assert r[0] < r[1] < r[2]
    assert r[0] < 100 and r[2] > 700
    # empty/null: compressing b"" still emits the zlib header (ratio
    # floor via max(len,1)) — just pin determinism and non-negativity
    assert r[3] >= 0 and r[4] >= 0
    r2 = compression_ratio_milli(s)
    assert (r == r2).all()
