"""grouped_moments: DuckDB parity (also swept by test_queries_oracle),
numerical stability vs the sum-of-squares trap, and replay determinism
(bit-identical floats under any partition count / block order — the
canonical-sorted Chan fold)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds_from(df, parts):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


def test_grouped_moments_matches_pandas_and_is_partition_invariant(
        ray_session):
    from parallel_dataflow_ray.stages.relational import grouped_moments

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 4000),
        "x": rng.normal(100.0, 3.0, 4000)})
    outs = []
    for parts in (1, 3, 8):
        out = grouped_moments(_ds_from(df, parts), ["k"], "x",
                              num_buckets=4).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        outs.append(out)
    # bit-identical across partitionings (canonical fold order)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])
    want = df.groupby("k")["x"].agg(["count", "mean", "var", "std"])
    got = outs[0]
    assert (got["n"].to_numpy() == want["count"].to_numpy()).all()
    np.testing.assert_allclose(got["mean"], want["mean"], rtol=1e-12)
    np.testing.assert_allclose(got["var_samp"], want["var"], rtol=1e-9)
    np.testing.assert_allclose(got["std_samp"], want["std"], rtol=1e-9)


def test_grouped_moments_stable_where_sumsq_cancels(ray_session):
    """var << mean^2: E[x^2]-E[x]^2 in float64 would lose ~11 digits;
    the M2 path keeps full precision."""
    from parallel_dataflow_ray.stages.relational import grouped_moments

    rng = np.random.default_rng(3)
    x = 1e8 + rng.normal(0.0, 0.5, 20000)
    df = pd.DataFrame({"k": np.zeros(len(x), np.int64), "x": x})
    got = grouped_moments(_ds_from(df, 6), ["k"], "x",
                          num_buckets=2).to_pandas()
    want = df["x"].var()
    np.testing.assert_allclose(got["var_samp"][0], want, rtol=1e-9)
    # the naive path really does fail here (guard that the test bites)
    naive = (x ** 2).mean() - x.mean() ** 2
    assert abs(naive * len(x) / (len(x) - 1) - want) / want > 1e-6


def test_grouped_moments_singleton_and_null(ray_session):
    from parallel_dataflow_ray.stages.relational import grouped_moments

    df = pd.DataFrame({"k": ["a", "a", "b", "c"],
                       "x": [1.0, 3.0, 5.0, np.nan]})
    got = grouped_moments(_ds_from(df, 2), ["k"], "x",
                          num_buckets=2).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["n"].tolist() == [2, 1, 0]
    assert got["var_samp"][0] == 2.0           # var_samp of {1,3}
    assert np.isnan(got["var_samp"][1])        # n=1 -> NULL-like NaN


def test_grouped_corr_matches_pandas_and_is_partition_invariant(
        ray_session):
    from parallel_dataflow_ray.stages.relational import grouped_corr

    rng = np.random.default_rng(11)
    n = 5000
    x = rng.normal(50.0, 4.0, n)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "x": x,
        "y": 3.0 * x + rng.normal(0.0, 5.0, n)})
    outs = []
    for parts in (1, 4, 9):
        out = grouped_corr(_ds_from(df, parts), ["k"], "x", "y",
                           num_buckets=4).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        outs.append(out)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])
    got = outs[0]
    for i, (k, sub) in enumerate(df.groupby("k")):
        assert got["n"][i] == len(sub)
        np.testing.assert_allclose(got["corr"][i],
                                   sub["x"].corr(sub["y"]), rtol=1e-10)
        np.testing.assert_allclose(got["covar_samp"][i],
                                   sub["x"].cov(sub["y"]), rtol=1e-10)


def test_grouped_corr_pairwise_complete_nulls(ray_session):
    """Rows with a null in EITHER column are excluded (CORR /
    REGR_COUNT semantics), not zero-filled."""
    from parallel_dataflow_ray.stages.relational import grouped_corr

    df = pd.DataFrame({
        "k": ["a"] * 5,
        "x": [1.0, 2.0, np.nan, 4.0, 5.0],
        "y": [2.0, np.nan, 6.0, 8.0, 10.0]})
    got = grouped_corr(_ds_from(df, 2), ["k"], "x", "y",
                       num_buckets=2).to_pandas()
    assert got["n"][0] == 3                      # pairwise complete
    sub = df.dropna(subset=["x", "y"])
    np.testing.assert_allclose(got["corr"][0], sub["x"].corr(sub["y"]),
                               rtol=1e-12)


def test_grouped_mode_tiebreak_and_skew(ray_session):
    """Deterministic tie-break (count desc, value asc) and
    hot-value robustness: a 90%-one-value group costs one counter."""
    from parallel_dataflow_ray.stages.relational import grouped_mode

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"] * 1000,
        "v": ["x", "x", "y", "y",          # tie -> "x" (smaller)
              "q", "p", "q",               # clear winner "q"
              ] + ["hot"] * 900 + ["cold"] * 100})
    got = grouped_mode(_ds_from(df, 4), ["k"], "v",
                       num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["v"].tolist() == ["x", "q", "hot"]
    assert got["n_mode"].tolist() == [2, 2, 900]
