"""grouped_hmoments (skewness/kurtosis), grouped_quantiles_cont
(interpolated percentile_cont), and distinct_set_op (INTERSECT/EXCEPT):
local-twin parity + partition invariance.  DuckDB parity for the
registry entries is swept by test_queries_oracle.py; here the local
twins are pandas ``skew()``/``kurt()`` (the same Excel bias-corrected
forms DuckDB uses — verified empirically) and numpy's default linear
percentile (the same ``q*(n-1)`` lerp)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds_from(df, parts):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


def test_grouped_hmoments_matches_pandas_and_is_partition_invariant(
        ray_session):
    from parallel_dataflow_ray.stages.relational import grouped_hmoments

    rng = np.random.default_rng(11)
    # lognormal: real skew, so the M3/M4 terms actually bite
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 5000),
        "x": rng.lognormal(3.0, 0.7, 5000)})
    outs = []
    for parts in (1, 3, 8):
        out = grouped_hmoments(_ds_from(df, parts), ["k"], "x",
                               num_buckets=4).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        outs.append(out)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])
    want = df.groupby("k")["x"].agg(["count", "skew",
                                     lambda s: s.kurt()])
    got = outs[0]
    assert (got["n"].to_numpy() == want["count"].to_numpy()).all()
    np.testing.assert_allclose(got["skew_samp"], want["skew"], rtol=1e-9)
    np.testing.assert_allclose(got["kurt_samp"], want.iloc[:, 2],
                               rtol=1e-9)


def test_grouped_hmoments_shifted_mean_stability(ray_session):
    """Central-moment partials keep precision when mean >> std — the
    regime where raw-power sums (E[x^3] combinations) cancel."""
    from parallel_dataflow_ray.stages.relational import grouped_hmoments

    rng = np.random.default_rng(5)
    x = 1e6 + rng.normal(0.0, 1.0, 30000)
    df = pd.DataFrame({"k": np.zeros(len(x), np.int64), "x": x})
    got = grouped_hmoments(_ds_from(df, 6), ["k"], "x",
                           num_buckets=2).to_pandas()
    s = pd.Series(x)
    np.testing.assert_allclose(got["skew_samp"][0], s.skew(), atol=1e-6)
    np.testing.assert_allclose(got["kurt_samp"][0], s.kurt(), atol=1e-6)


def test_grouped_hmoments_small_groups_null_semantics(ray_session):
    """n<=2 -> NULL skew; n<=3 -> NULL kurtosis (SQL semantics)."""
    from parallel_dataflow_ray.stages.relational import grouped_hmoments

    df = pd.DataFrame({"k": [0, 0, 1, 1, 1, 2, 2, 2, 2],
                       "x": [1.0, 2.0, 1.0, 4.0, 9.0,
                             1.0, 2.0, 4.0, 8.0]})
    got = grouped_hmoments(_ds_from(df, 2), ["k"], "x", num_buckets=2) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert np.isnan(got.loc[0, "skew_samp"])          # n=2
    assert np.isnan(got.loc[0, "kurt_samp"])
    assert not np.isnan(got.loc[1, "skew_samp"])      # n=3: skew defined
    assert np.isnan(got.loc[1, "kurt_samp"])          # ... kurt not
    assert not np.isnan(got.loc[2, "kurt_samp"])      # n=4: both
    np.testing.assert_allclose(
        got.loc[2, "skew_samp"],
        pd.Series([1.0, 2.0, 4.0, 8.0]).skew(), rtol=1e-12)


def test_grouped_quantiles_cont_matches_numpy(ray_session):
    from parallel_dataflow_ray.stages.sketches import grouped_quantiles_cont

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 3000),
        "v": rng.integers(0, 500, 3000).astype(np.int64)})
    qs = [0.25, 0.5, 0.9]
    outs = []
    for parts in (1, 4, 7):
        out = grouped_quantiles_cont(
            _ds_from(df, parts), ["k"], "v", qs,
            ["p25", "p50", "p90"], count_as="n",
            num_buckets=4).to_pandas().sort_values("k") \
            .reset_index(drop=True)
        outs.append(out)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])
    got = outs[0]
    for k, sub in df.groupby("k"):
        row = got[got["k"] == k].iloc[0]
        # numpy's default 'linear' interpolation IS the q*(n-1) lerp
        want = np.percentile(sub["v"].to_numpy(), [25, 50, 90])
        np.testing.assert_allclose(
            [row["p25"], row["p50"], row["p90"]], want, rtol=1e-12)
        assert row["n"] == len(sub)


def test_grouped_quantiles_cont_exact_rank_collapses(ray_session):
    """When q*(n-1) is integral the read-off must be the exact value,
    not a degenerate lerp."""
    from parallel_dataflow_ray.stages.sketches import grouped_quantiles_cont

    df = pd.DataFrame({"k": [0] * 5, "v": [10, 20, 30, 40, 50]})
    got = grouped_quantiles_cont(_ds_from(df, 2), ["k"], "v",
                                 [0.0, 0.25, 0.5, 1.0],
                                 ["p0", "p25", "p50", "p100"],
                                 num_buckets=1).to_pandas()
    assert got.loc[0, "p0"] == 10.0
    assert got.loc[0, "p25"] == 20.0
    assert got.loc[0, "p50"] == 30.0
    assert got.loc[0, "p100"] == 50.0


def test_distinct_set_op_matches_pandas(ray_session):
    from parallel_dataflow_ray.stages.relational import distinct_set_op

    rng = np.random.default_rng(9)
    # duplicate-heavy multisets: the op is on DISTINCT keys
    a = pd.DataFrame({"id": rng.integers(0, 60, 500)})
    b = pd.DataFrame({"id": rng.integers(30, 90, 500)})
    sa, sb = set(a["id"]), set(b["id"])
    for op, want in (("intersect", sa & sb), ("except", sa - sb)):
        got = distinct_set_op(_ds_from(a, 3), _ds_from(b, 4), "id", op,
                              num_buckets=4).to_pandas()
        assert set(got["id"]) == want
        assert len(got) == len(want)          # distinct: no dup rows


def test_distinct_set_op_rejects_bad_op(ray_session):
    import pytest
    from parallel_dataflow_ray.stages.relational import distinct_set_op

    with pytest.raises(ValueError):
        distinct_set_op(None, None, "id", "union")
