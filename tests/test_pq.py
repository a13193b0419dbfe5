"""Product quantization: fit partition-invariance (bit-exact), encode
determinism + compression accounting, ADC recall, rerank exactness on
the shortlist, self-exclusion convention."""
import numpy as np
import pandas as pd
import ray.data as rd

from parallel_dataflow_ray.stages import similarity as sim


def _corpus(n=400, dim=32, clusters=10, seed=5) -> pd.DataFrame:
    """Clustered unit vectors: each point = normalized(center + noise)."""
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(clusters, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    lab = rng.integers(0, clusters, n)
    X = C[lab] + 0.3 * rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(X.astype(np.float32))})


def test_fit_partition_invariant_and_shape(ray_session):
    df = _corpus()
    a = sim.pq_fit(rd.from_pandas(df).repartition(1), m=8, n_codes=16,
                   iters=3)
    b = sim.pq_fit(rd.from_pandas(df).repartition(7), m=8, n_codes=16,
                   iters=3)
    assert a.shape == (8, 16, 4)
    assert np.array_equal(a, b)


def test_encode_deterministic_and_compressed(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df)
    C = sim.pq_fit(ds, m=8, n_codes=16, iters=3)
    e1 = sim.pq_encode(ds, C).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    e2 = sim.pq_encode(ds.repartition(5), C).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    codes1 = np.stack(e1["pq_code"].to_numpy())
    codes2 = np.stack(e2["pq_code"].to_numpy())
    assert np.array_equal(codes1, codes2)
    assert codes1.dtype == np.uint8 and codes1.shape == (len(df), 8)
    # 32 float32 dims (128 B) -> 8 uint8 codes: 16x compression
    assert codes1.nbytes * 16 == np.stack(df["embedding"]).nbytes


def test_adc_recall_and_rerank_exactness(ray_session):
    df = _corpus(n=500, dim=32, seed=11)
    ds = rd.from_pandas(df)
    q = np.stack(df["embedding"].head(6).to_numpy()).astype(np.float64)
    exact = sim.brute_force_topk(ds, q, k=10)
    C = sim.pq_fit(ds, m=16, n_codes=32, iters=5)
    codes = sim.pq_encode(ds, C)
    adc = sim.pq_topk(codes, q, 10, C)
    rec = np.mean([
        len(set(adc[adc.query_id == i]["vec_id"])
            & set(exact[exact.query_id == i]["vec_id"])) / 10
        for i in range(6)])
    assert rec >= 0.5, rec                      # coarse shortlist quality
    # ADC + exact rerank over a wide-enough shortlist == exact top-k
    rr = sim.pq_topk_rerank(ds, codes, q, 10, C, rerank=120)
    for i in range(6):
        got = rr[rr.query_id == i]
        want = exact[exact.query_id == i]
        assert list(got["vec_id"]) == list(want["vec_id"])
        assert list(got["cos_milli"]) == list(want["cos_milli"])


def test_rerank_scores_are_exact_even_when_shortlist_is_not(ray_session):
    # whatever the shortlist misses, every RETURNED score must be the
    # true cosine (rerank reads the float rows)
    df = _corpus(n=300, dim=32, seed=3)
    ds = rd.from_pandas(df)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = X[:4]
    C = sim.pq_fit(ds, m=8, n_codes=8, iters=2)    # deliberately coarse
    codes = sim.pq_encode(ds, C)
    rr = sim.pq_topk_rerank(ds, codes, q, 5, C, rerank=10)
    for _, r in rr.iterrows():
        true = int(np.rint(q[int(r.query_id)] @ X[int(r.vec_id)] * 1000))
        assert int(r.cos_milli) == true


def test_self_exclusion(ray_session):
    df = _corpus(n=100, dim=32, seed=9)
    ds = rd.from_pandas(df)
    q = np.stack(df["embedding"].head(4).to_numpy()).astype(np.float64)
    C = sim.pq_fit(ds, m=8, n_codes=16, iters=3)
    codes = sim.pq_encode(ds, C)
    adc = sim.pq_topk(codes, q, 5, C)
    assert not ((adc["vec_id"] == adc["query_id"]).any())
    incl = sim.pq_topk(codes, q, 5, C, exclude_self=False)
    # the query's own row scores highest under ADC for clustered data
    assert (incl.groupby("query_id").head(1)["vec_id"].to_numpy()
            == np.arange(4)).all()


def test_ivfpq_on_clustered_corpus(ray_session):
    df = _corpus(n=600, dim=32, clusters=12, seed=21)
    ds = rd.from_pandas(df)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = X[:6]
    exact = sim.brute_force_topk(ds, q, k=10)
    C, _ = sim.kmeans_fit(ds, n_clusters=12, iters=4, seed=7)
    B = sim.pq_fit(ds, m=16, n_codes=32, iters=5)
    codes = sim.pq_encode_ivf(ds, C, B)
    out = sim.ivfpq_topk(ds, codes, q, 10, centroids=C, codebooks=B,
                         nprobe=6, rerank=80)
    rec = np.mean([
        len(set(out[out.query_id == i]["vec_id"])
            & set(exact[exact.query_id == i]["vec_id"])) / 10
        for i in range(6)])
    # clustered data: probing 4/12 clusters keeps most true neighbors
    assert rec >= 0.8, rec
    # returned scores are always the TRUE cosine (exact rerank)
    for _, r in out.iterrows():
        true = int(np.rint(q[int(r.query_id)] @ X[int(r.vec_id)] * 1000))
        assert int(r.cos_milli) == true


def test_ivfpq_full_probe_equals_exact(ray_session):
    # nprobe == nlist -> nothing pruned; wide shortlist -> exact top-k
    df = _corpus(n=300, dim=32, clusters=8, seed=2)
    ds = rd.from_pandas(df)
    q = np.stack(df["embedding"].head(4).to_numpy()).astype(np.float64)
    exact = sim.brute_force_topk(ds, q, k=10)
    C, _ = sim.kmeans_fit(ds, n_clusters=8, iters=3, seed=7)
    B = sim.pq_fit(ds, m=16, n_codes=32, iters=5)
    codes = sim.pq_encode_ivf(ds, C, B)
    out = sim.ivfpq_topk(ds, codes, q, 10, centroids=C, codebooks=B,
                         nprobe=8, rerank=150)
    for i in range(4):
        assert (list(out[out.query_id == i]["vec_id"])
                == list(exact[exact.query_id == i]["vec_id"]))


def test_pq_encode_ivf_columns(ray_session):
    df = _corpus(n=50, dim=32, seed=1)
    ds = rd.from_pandas(df)
    C, _ = sim.kmeans_fit(ds, n_clusters=4, iters=2, seed=7)
    B = sim.pq_fit(ds, m=8, n_codes=8, iters=2)
    e = sim.pq_encode_ivf(ds, C, B).to_pandas()
    assert set(e.columns) == {"vec_id", "cluster", "pq_code"}
    assert e["cluster"].between(0, 3).all()
    assert np.stack(e["pq_code"].to_numpy()).shape == (50, 8)
