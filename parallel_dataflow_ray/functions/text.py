"""Text-analysis kernels for the documents table — vectorized per batch.

Large-scale training-data pipeline primitives: token counting, language
ID (character n-gram heuristic), quality scoring, and rolling-hash
document fingerprinting.  All operate on a pandas Series / numpy array
of strings at once; per-row Python work is bounded to cheap string ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

def token_count(texts: pd.Series) -> np.ndarray:
    """Number of single-space-separated tokens (matches SQL
    ``array_length(string_split(text, ' '))``)."""
    return (texts.str.count(" ").fillna(0).to_numpy(np.int64) +
            (texts.str.len().fillna(0).to_numpy(np.int64) > 0))


def char_ngrams(text: str, n: int = 3) -> set:
    t = f" {text} "
    return {t[i:i + n] for i in range(max(0, len(t) - n + 1))}


# tiny per-language trigram profiles (public-knowledge heuristic: stopword
# and character-pattern cues, not a trained model)
_LANG_HINTS = {
    "en": (" th", "the", " an", "and", "ing", " of"),
    "es": (" de", " la", "os ", " el", "ión", " qu"),
    "de": (" de", "der", "ein", "sch", " un", "die"),
    "fr": (" de", " le", "es ", " la", "ent", " et"),
    "zh": (),  # CJK detected by codepoint range below
}


def lang_id(texts: pd.Series) -> np.ndarray:
    """Heuristic language ID. Returns a language code per row ('und' when
    no signal).  Deterministic; tie-break by language code order.

    Vectorized: one ``str.contains`` per (language, trigram) over the
    padded lowered prefix — a 3-gram is in ``char_ngrams(t)`` iff it is
    a substring of ``" t "`` — instead of a per-row Python gram-set."""
    s = texts.fillna("")
    n = len(s)
    cjk = s.str[:200].str.contains(r"[一-鿿]", regex=True).to_numpy()
    padded = " " + s.str[:500].str.lower() + " "
    best = np.full(n, "und", dtype=object)
    best_score = np.zeros(n, dtype=np.int64)
    for lang in sorted(_LANG_HINTS):
        hints = _LANG_HINTS[lang]
        if not hints:
            continue
        score = np.zeros(n, dtype=np.int64)
        for g in hints:
            score += padded.str.contains(g, regex=False).to_numpy()
        m = score > best_score  # strict > keeps the earlier code on ties
        best[m] = lang
        best_score[m] = score[m]
    best[cjk] = "zh"
    return best


def quality_score_milli(texts: pd.Series) -> dict[str, np.ndarray]:
    """Length / punctuation / stopword-ratio quality features, returned as
    integer milli-units so distributed recomputation is bit-exact."""
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(np.int64)
    n_tokens = token_count(s)
    n_alpha = s.str.count(r"[A-Za-z]").to_numpy(np.int64)
    n_punct = s.str.count(r"[^\w\s]").to_numpy(np.int64)
    n_stop = (
        s.str.count(r"\bthe\b") + s.str.count(r"\band\b") + s.str.count(r"\bof\b")
        + s.str.count(r"\ba\b") + s.str.count(r"\bto\b")
    ).to_numpy(np.int64)
    denom = np.maximum(n_chars, 1)
    tok_denom = np.maximum(n_tokens, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio_milli": (1000 * n_alpha) // denom,
        "punct_ratio_milli": (1000 * n_punct) // denom,
        "stop_ratio_milli": (1000 * n_stop) // tok_denom,
    }


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """64-bit content fingerprint (SipHash via ``pd.util.hash_array``,
    fixed key -> stable across processes/workers); equal documents get
    equal fingerprints.  Vectorized C — this sits on the exact-dedup hot
    path, where the per-byte-Python polynomial it replaced dominated."""
    h = pd.util.hash_array(texts.fillna("").to_numpy(dtype=object),
                           hash_key="graft-paralleldf", categorize=False)
    return h.view(np.int64)


def fingerprint128(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content fingerprint as two independent 64-bit SipHash
    passes under distinct fixed keys ``(lo, hi)``.  Collision odds drop
    from 2^-64 per pair (birthday-material near ~2^32 docs — i.e. AT
    the 10^12-doc design point) to 2^-128, with the same vectorized-C
    cost x2.  ``lo`` alone remains a valid partitioning key: rows equal
    in 128 bits are equal in ``lo``, so bucketing by ``lo`` co-locates
    every true duplicate pair while the in-bucket match compares both
    halves."""
    lo = fingerprint64(texts)       # same key: lo stays in lockstep
    hi = pd.util.hash_array(texts.fillna("").to_numpy(dtype=object),
                            hash_key="graft-parallel2d",
                            categorize=False).view(np.int64)
    return lo, hi


def word_shingles(text: str, k: int = 3) -> list[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish pre-tokenizer token count: letter runs, digit runs, and
    punctuation runs (the GPT-2-style pre-token split restricted to the
    ASCII classes both Python ``re`` and DuckDB's RE2 interpret
    identically, so the SQL oracle `len(regexp_extract_all(...))` is
    bit-exact).  Vectorized: one ``str.count`` pass over the series."""
    return (texts.fillna("").str.count(BPE_PRETOKEN_RE)
                 .to_numpy(np.int64))


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, public ruleset)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "and", "of", "to", "a")


def gopher_stats(texts: pd.Series) -> dict[str, np.ndarray]:
    """Vectorized Gopher-rule quality signals, all exact-integer so the
    DuckDB twin hash-matches: word count, mean word length (milli),
    symbol-to-word ratio (milli; '#' runs + non-overlapping '...'),
    stopword presence count, and the composite ``keep`` flag with the
    published thresholds (50 <= words <= 100k, 3 <= mean word length
    <= 10, symbol ratio < 0.1, >= 2 distinct stopwords present).

    Tokenization is the repo-wide SQL convention: split on single
    spaces (``string_split(text, ' ')``), so empty tokens count."""
    import re

    t = texts.fillna("")
    n_words = t.str.count(" ").to_numpy(np.int64) + 1
    chars = t.str.len().to_numpy(np.int64)
    word_chars = chars - (n_words - 1)
    mean_wlen_milli = (word_chars * 1000) // n_words
    n_sym = (t.str.count("#", flags=0).to_numpy(np.int64)
             + t.str.count(re.escape("...")).to_numpy(np.int64))
    symbol_milli = (n_sym * 1000) // n_words
    padded = " " + t + " "
    stop_hits = np.zeros(len(t), np.int64)
    for w in GOPHER_STOPWORDS:
        stop_hits += padded.str.contains(f" {w} ", regex=False
                                         ).to_numpy(bool)
    keep = ((n_words >= 50) & (n_words <= 100_000)
            & (mean_wlen_milli >= 3000) & (mean_wlen_milli <= 10_000)
            & (symbol_milli < 100) & (stop_hits >= 2))
    return {"n_words": n_words, "mean_wlen_milli": mean_wlen_milli,
            "symbol_milli": symbol_milli, "stop_hits": stop_hits,
            "keep": keep}


def dup_ngram_stats(texts: pd.Series, k: int = 3) -> dict[str, np.ndarray]:
    """Intra-document repetition: per doc, the number of word
    ``k``-grams, distinct k-grams, and the duplicate fraction in milli
    (``(n - distinct) * 1000 // n``) — the Gopher repetition-rule shape
    (a high duplicate-n-gram fraction marks boilerplate / looped text).
    Tokens split on single spaces to match ``string_split(text, ' ')``;
    k-grams are positions i..i+k-1 joined by spaces (the DuckDB twin's
    ``array_to_string(w[i:i+k-1], ' ')``).  Per-doc loop over an
    inherently per-doc structure; the hashing is C (``hash``) and the
    op is shuffle-free."""
    t = texts.fillna("")
    n_grams = np.zeros(len(t), np.int64)
    n_distinct = np.zeros(len(t), np.int64)
    for i, s in enumerate(t):
        toks = s.split(" ")
        n = len(toks) - k + 1
        if n < 1:
            continue
        seen = {" ".join(toks[j:j + k]) for j in range(n)}
        n_grams[i] = n
        n_distinct[i] = len(seen)
    dup_milli = np.where(n_grams > 0,
                         (n_grams - n_distinct) * 1000 // np.maximum(n_grams, 1),
                         0).astype(np.int64)
    return {"n_grams": n_grams, "n_distinct": n_distinct,
            "dup_milli": dup_milli}


def compression_ratio_milli(texts: pd.Series, level: int = 6) -> np.ndarray:
    """zlib compressibility as a boilerplate/repetition signal (the
    Gopher/RedPajama-class quality feature): ``1000 * compressed_len /
    max(raw_len, 1)`` per doc, int64.  Highly repetitive or templated
    text compresses far below natural prose (~400-700‰); binary-ish or
    high-entropy gibberish sits near (or above) 1000‰.  The per-row
    call is a C-library pass (zlib), same cost model as the compiled
    regexes above; deterministic for a fixed level by zlib's spec."""
    import zlib

    vals = texts.fillna("").to_numpy()
    out = np.empty(len(vals), dtype=np.int64)
    for i, s in enumerate(vals):
        raw = s.encode("utf-8", "surrogatepass")
        out[i] = (1000 * len(zlib.compress(raw, level))) // max(len(raw), 1)
    return out
