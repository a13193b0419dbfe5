"""Sketch-aggregate tests: HLL error bound + merge algebra, quantile
semantics vs DuckDB percentile_disc, ANN self-join vs brute force."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from parallel_dataflow_ray.stages.sketches import (
    _clz64, grouped_approx_distinct, hll_estimate, hll_merge, hll_registers)

SF_DIR = "/root/testdata/sf0.01"


def test_clz64_matches_python():
    rng = np.random.default_rng(3)
    w = rng.integers(1, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    w |= np.uint64(1)  # nonzero
    got = _clz64(w)
    want = np.array([64 - int(x).bit_length() for x in w])
    np.testing.assert_array_equal(got, want)


def test_hll_merge_is_union():
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the property that
    makes arbitrary fold orders and replays safe."""
    a = np.arange(0, 50_000)
    b = np.arange(25_000, 80_000)
    merged = hll_merge(hll_registers(a), hll_registers(b))
    union = hll_registers(np.arange(0, 80_000))
    np.testing.assert_array_equal(merged, union)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_error_bound(n):
    est = hll_estimate(hll_registers(np.arange(n)))
    assert abs(est - n) / n < 0.05, (est, n)


def test_grouped_approx_distinct_vs_exact():
    import ray.data as rd

    from parallel_dataflow_ray.sources.tables import read_table

    ds = read_table(SF_DIR, "events", columns=["event_type", "user_id"])
    got = grouped_approx_distinct(ds, ["event_type"], "user_id",
                                  out="approx_users").to_pandas()
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1").df()
    m = got.merge(exact, on="event_type")
    assert len(m) == len(exact)
    err = (m["approx_users"] - m["n"]).abs() / m["n"]
    assert (err < 0.05).all(), m

    # partial-count independence: a different batch size folds different
    # partials but must merge to the identical estimate
    small = grouped_approx_distinct(
        ds.repartition(12), ["event_type"], "user_id",
        out="approx_users").to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("event_type", ignore_index=True),
        small.sort_values("event_type", ignore_index=True))


def test_quantile_semantics_match_percentile_disc():
    """The searchsorted(cum, q*n) read-off must agree with DuckDB on
    boundary quantiles, including duplicate-heavy distributions."""
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.integers(0, 50, 500),
                           np.full(250, 7), np.full(1, 999)])
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM unnest($1::BIGINT[]) AS v(v)",
                [vals.tolist()])
    vc = pd.Series(vals).value_counts().sort_index()
    cum = vc.to_numpy().cumsum()
    uvals = vc.index.to_numpy()
    n = cum[-1]
    for q in (0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        want = con.execute(
            f"SELECT percentile_disc({q!r}) WITHIN GROUP (ORDER BY v) FROM t"
        ).fetchone()[0]
        got = int(uvals[np.searchsorted(cum, q * n, side="left")])
        assert got == want, (q, got, want)


def test_self_join_topk_matches_bruteforce():
    """Block-pair distributed result == driver-side exact top-k."""
    import ray.data as rd

    from parallel_dataflow_ray.sources.tables import read_table
    from parallel_dataflow_ray.stages.similarity import self_join_topk

    sf = "/root/testdata/sf0.001"
    ds = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    got = self_join_topk(ds, k=5, num_blocks=4).to_pandas() \
        .sort_values(["query_id", "rank"], ignore_index=True)

    df = ds.to_pandas()
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    ids = df["vec_id"].to_numpy()
    qm = np.rint((X @ X.T) * 1000).astype(np.int64)
    np.fill_diagonal(qm, -(1 << 20))
    rows = []
    for i in range(len(ids)):
        order = np.lexsort((ids, -qm[i]))[:5]
        for r, j in enumerate(order, 1):
            rows.append((ids[i], r, ids[j], qm[i, j]))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id",
                                       "cos_milli"]) \
        .sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_heavy_hitters_exact_under_pruning():
    """Zipf-ish skewed stream, many batches, capacity far below the
    distinct-item count so per-batch top-k pruning really happens —
    output must still be the EXACT set {item : cnt * inv_phi > n}
    (the candidate cut is a provable superset, the recount is exact)."""
    import ray.data as rd

    from parallel_dataflow_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(42)
    # 40k draws over 2000 items, zipf-like: a few items dominate
    items = np.floor(rng.pareto(1.2, 40_000) * 3).astype(np.int64) % 2000
    df = pd.DataFrame({"val": [f"item_{i}" for i in items]})
    ds = rd.from_pandas(df).repartition(16)

    inv_phi = 50  # capacity 99 << 2000 distinct
    got = heavy_hitters(ds, lambda b: b["val"], item_col="item",
                        count_col="cnt", inv_phi=inv_phi).to_pandas() \
        .sort_values("item", ignore_index=True)

    vc = df["val"].value_counts()
    want = vc[vc * inv_phi > len(df)].rename_axis("item") \
        .rename("cnt").reset_index().sort_values("item", ignore_index=True)
    assert len(want) > 0  # the fixture actually has heavy hitters
    pd.testing.assert_frame_equal(
        got.astype({"cnt": "int64"}), want.astype({"cnt": "int64"}))


def test_explode_bigrams_matches_duckdb():
    from parallel_dataflow_ray.stages.sketches import explode_bigrams

    texts = ["a b c", "", "one", "x  y", "p q r s"]
    got = explode_bigrams(pd.DataFrame({"text": texts})).tolist()
    want = duckdb.connect().execute("""
        WITH d AS (SELECT string_split(t, ' ') AS ws
                   FROM (SELECT unnest(?) AS t)),
        b AS (SELECT ws[i] || ' ' || ws[i+1] AS bg
              FROM d, unnest(range(1, len(ws))) AS t(i))
        SELECT bg FROM b""", [texts]).df()["bg"].tolist()
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# KLL quantile sketch (continuous domains)
# ---------------------------------------------------------------------------


def test_kll_rank_error_bound():
    """Empirical rank error at k=200 stays ≤ 2% (mirrors the HLL ≤5%
    pattern) on a skewed continuous distribution."""
    from parallel_dataflow_ray.stages.sketches import KLLSketch

    rng = np.random.default_rng(5)
    data = rng.lognormal(0.0, 1.5, size=100_000)
    sk = KLLSketch(200)
    for chunk in np.array_split(data, 50):
        sk.update_batch(chunk)
    s = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        v = sk.quantile(q)
        rank = np.searchsorted(s, v, side="right") / s.size
        assert abs(rank - q) <= 0.02, (q, rank)


def test_kll_merge_equals_bulk_ranks():
    """Partials merged in any order estimate the same quantiles as one
    bulk sketch, within the error bound (mergeability = the partial+
    final shape the distributed path relies on)."""
    from parallel_dataflow_ray.stages.sketches import KLLSketch

    rng = np.random.default_rng(9)
    data = rng.normal(0, 1, size=60_000)
    parts = np.array_split(data, 7)
    a = KLLSketch(200)
    for p in parts:
        a.merge(KLLSketch.from_bytes(
            (lambda s: (s.update_batch(p), s)[1])(KLLSketch(200)).to_bytes()))
    b = KLLSketch(200)
    for p in reversed(parts):
        sk = KLLSketch(200)
        sk.update_batch(p)
        b.merge(sk)
    s = np.sort(data)
    assert a.n == b.n == data.size
    for q in (0.25, 0.5, 0.75, 0.95):
        ra = np.searchsorted(s, a.quantile(q), side="right") / s.size
        rb = np.searchsorted(s, b.quantile(q), side="right") / s.size
        assert abs(ra - q) <= 0.02 and abs(rb - q) <= 0.02


def test_grouped_quantiles_approx_vs_exact_ranks(ray_session):
    """The distributed KLL path lands within 2% rank error of the true
    per-group quantiles of the raw float events.value column."""
    import ray.data as rd

    from parallel_dataflow_ray.stages.sketches import grouped_quantiles_approx

    rng = np.random.default_rng(13)
    n = 40_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=n),
        "v": rng.exponential(10.0, size=n)})
    out = grouped_quantiles_approx(
        rd.from_pandas(df), ["k"], "v", [0.5, 0.9], ["p50", "p90"],
        count_as="n_rows").to_pandas().set_index("k")
    for key, g in df.groupby("k"):
        s = np.sort(g["v"].to_numpy())
        assert int(out.loc[key, "n_rows"]) == s.size
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            rank = np.searchsorted(s, out.loc[key, col], side="right") / s.size
            assert abs(rank - q) <= 0.02, (key, q, rank)


def test_quantile_hist_relative_error_bound():
    """Streaming DDSketch-shape kernel: the reported bucket midpoint is
    within alpha = (gamma-1)/(gamma+1) ~ 1 % of the true
    percentile_disc value, for any fold granularity (bucket counts are
    multiset algebra, so granularity cannot change the result)."""
    from parallel_dataflow_ray.streaming.kernels import QuantileHist

    rng = np.random.default_rng(5)
    vals = np.exp(rng.normal(6.0, 1.2, 20_000))  # lognormal, wide range
    spec = QuantileHist()
    alpha = (spec._GAMMA - 1) / (spec._GAMMA + 1)

    # fold in three different granularities -> identical state
    s1 = spec.initial_state()
    s1 = spec._ingest(s1, vals)
    s2 = spec.initial_state()
    for chunk in np.array_split(vals, 137):
        s2 = spec._ingest(s2, chunk)
    s3 = spec.initial_state()
    for chunk in np.array_split(vals, 7):
        s3 = spec.merge(s3, spec._ingest(spec.initial_state(), chunk))
    assert s1 == s2 == s3

    row = spec.finish("k", (0, 1), s1)
    srt = np.sort(vals)
    for q in spec._QS:
        exact = srt[int(np.ceil(q * len(srt))) - 1]  # percentile_disc
        got = row[f"p{int(q * 100)}_micro"] / 1e6
        assert abs(got - exact) <= alpha * exact * 1.0001, (q, got, exact)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fpr_bound():
    from parallel_dataflow_ray.stages.sketches import (bloom_partial,
                                                       bloom_probe_mask)

    rng = np.random.default_rng(0)
    m, k = 1 << 17, 4
    members = rng.integers(-2**63, 2**63 - 1, 5000, dtype=np.int64)
    outsiders = np.setdiff1d(
        rng.integers(-2**63, 2**63 - 1, 50_000, dtype=np.int64), members)
    bm = bloom_partial(members, m, k)
    # no false negatives, ever
    assert bloom_probe_mask(members, bm, m, k).all()
    # FPR within 5x of (1 - e^{-kn/m})^k  (theory ~4e-4 here)
    theory = (1 - np.exp(-k * len(members) / m)) ** k
    assert bloom_probe_mask(outsiders, bm, m, k).mean() <= 5 * theory


def test_bloom_merge_is_union():
    from parallel_dataflow_ray.stages.sketches import bloom_partial

    rng = np.random.default_rng(1)
    m, k = 1 << 14, 4
    vals = rng.integers(-2**63, 2**63 - 1, 4000, dtype=np.int64)
    whole = bloom_partial(vals, m, k)
    # any split of the input ORs back to the single-pass bitmap
    for parts in (2, 7, 64):
        merged = np.zeros_like(whole)
        for chunk in np.array_split(vals, parts):
            np.bitwise_or(merged, bloom_partial(chunk, m, k), out=merged)
        assert np.array_equal(merged, whole)


def test_contamination_bloom_matches_exact():
    """The Bloom scale path is output-identical to the exact semi-join
    path (no false negatives + exact re-verification) on a corpus with
    planted contamination."""
    import ray.data as rd

    from parallel_dataflow_ray.stages.dedup import (contamination,
                                                    contamination_bloom)

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    bench_texts = [" ".join(rng.choice(words, 12)) for _ in range(20)]
    train_texts = [" ".join(rng.choice(words, 30)) for _ in range(150)]
    # plant contamination: splice a bench trigram into some train docs
    for i in range(0, 150, 7):
        src = bench_texts[i % len(bench_texts)].split()
        train_texts[i] = train_texts[i] + " " + " ".join(src[3:6])
    train = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(150, dtype=np.int64), "text": train_texts}))
    bench = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(1000, 1020, dtype=np.int64),
         "text": bench_texts}))

    def canon(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return df[["doc_id", "n_shared"]].astype("int64")

    exact = canon(contamination(train, bench, shingle_k=3))
    # a deliberately TINY filter (high FPR) still yields identical rows
    bloom = canon(contamination_bloom(train, bench, shingle_k=3,
                                      m_bits=1 << 12, k_hashes=2))
    assert len(exact) > 0
    pd.testing.assert_frame_equal(exact, bloom)


def test_vocab_sketch_estimate_accuracy():
    """Streaming HLL kernel: estimate within 10 % of the true distinct
    word count at 2^10 registers (theory ~3.3 %), and register-idempotent
    under replay (re-ingesting the same rows changes nothing)."""
    from parallel_dataflow_ray.streaming.kernels import VocabSketch

    rng = np.random.default_rng(2)
    words = [f"tok{i}" for i in rng.integers(0, 3000, 20_000)]
    true = len(set(words))
    spec = VocabSketch()
    s = spec._ingest(spec.initial_state(), words)
    est = spec.finish("k", (0, 1), s)["vocab_est"]
    assert abs(est - true) / true <= 0.10, (est, true)
    # idempotence: replaying the whole stream is a no-op
    s2 = spec._ingest(s.copy(), words)
    assert np.array_equal(s, s2)
    # merge of split partials == single pass
    a = spec._ingest(spec.initial_state(), words[:9000])
    b = spec._ingest(spec.initial_state(), words[9000:])
    assert np.array_equal(spec.merge(a, b), s)
