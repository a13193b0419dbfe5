"""ANN quality: IVF approximate top-k recall against the exact brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd

from parallel_dataflow_ray.sources.tables import read_table
from parallel_dataflow_ray.stages import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


def _queries(ds, n=5):
    df = ds.to_pandas().sort_values("vec_id").head(n)
    return np.stack(df["embedding"].to_numpy())


def test_ivf_recall_vs_brute_force(ray_session):
    ds = read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(ds)
    exact = sim.brute_force_topk(ds, q, k=10)
    approx = sim.ivf_topk(ds, q, k=10, n_centroids=8, nprobe=4)
    recalls = []
    for qi in range(len(q)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    # nprobe=4 of 8 centroids: expect to find most true neighbors
    assert np.mean(recalls) >= 0.5, recalls


def test_ivf_centroid_cache_row_identical(ray_session, tmp_path):
    """Cached centroids (parquet artifact) give bit-identical results to
    in-call training, and the cache file round-trips exactly."""
    ds = read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(ds)
    path = str(tmp_path / "centroids.parquet")
    c1 = sim.load_or_train_centroids(ds, 8, cache_path=path)   # trains
    c2 = sim.load_or_train_centroids(ds, 8, cache_path=path)   # loads
    assert (c1 == c2).all()
    fresh = sim.ivf_topk(ds, q, k=10, n_centroids=8, nprobe=4)
    cached = sim.ivf_topk(ds, q, k=10, n_centroids=8, nprobe=4,
                          centroids=c2)
    assert fresh.equals(cached)


def test_brute_force_is_exact_and_deterministic(ray_session):
    ds = read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(ds, n=3)
    a = sim.brute_force_topk(ds, q, k=5)
    b = sim.brute_force_topk(ds, q, k=5)
    assert a.equals(b)
    assert (a.groupby("query_id")["rank"].max() == 5).all()


def test_quantized_knn_recall_vs_float(ray_session):
    """int8 quantization: recall@10 vs the exact float path >= 0.95
    (cosine is per-vector scale-invariant, so only direction rounding
    perturbs ranks), and the dequantized direction is within int8
    rounding of the original."""
    import numpy as np
    import ray.data as rd

    from parallel_dataflow_ray.stages.similarity import (
        brute_force_topk, brute_force_topk_q8, quantize_embeddings)

    rng = np.random.default_rng(11)
    n, d = 600, 32
    X = rng.normal(size=(n, d)).astype(np.float32)
    # plant near-dup clusters so top-k is non-trivial
    for i in range(0, n, 20):
        X[i + 1] = X[i] + rng.normal(scale=0.05, size=d).astype(np.float32)
    import pandas as pd
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}))
    q8 = quantize_embeddings(ds)

    # direction error bound: |dequant_normalized - normalized| per
    # component <= rounding of the scaled grid
    row = q8.take(5)
    for r in row:
        x = X[r["vec_id"]]
        deq = np.asarray(r["q_embedding"], np.float32) * r["scale"]
        assert np.abs(deq - x).max() <= r["scale"] * 0.5 + 1e-6

    Q = X[:25]
    exact = brute_force_topk(ds, Q, k=10)
    quant = brute_force_topk_q8(q8, Q, k=10)
    rec = []
    for q in range(25):
        e = set(exact.loc[exact["query_id"] == q, "vec_id"])
        a = set(quant.loc[quant["query_id"] == q, "vec_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.95, np.mean(rec)


def test_semdedup_matches_bruteforce_twin(ray_session):
    """Distributed SemDeDup == a driver-local twin that uses the SAME
    (bit-identical) centroids: identical assignment, identical
    within-cluster components, identical survivors + group sizes.
    Planted exact duplicates must collapse to the min id."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parallel_dataflow_ray.sources.tables import read_table
    from parallel_dataflow_ray.stages.similarity import (kmeans_fit,
                                                         semdedup)

    ds = read_table("/root/testdata/sf0.001", "embeddings",
                    columns=["vec_id", "embedding"])
    pdf = ds.to_pandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    ids = pdf["vec_id"].to_numpy()
    # plant exact duplicates of every 25th vector under fresh ids
    dup_src = np.arange(0, len(ids), 25)
    Xp = np.vstack([X, X[dup_src]])
    idp = np.concatenate([ids, ids.max() + 1 + np.arange(dup_src.size)])
    planted = pd.DataFrame({"vec_id": idp, "embedding": list(Xp)})
    dsp = rd.from_pandas(planted).repartition(5)

    got = semdedup(dsp, n_clusters=4, threshold=0.96).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    # twin: same centroids (kmeans_fit is partition-invariant), local
    # assignment + union-find
    C, _ = kmeans_fit(dsp, 4, iters=5, seed=7)
    a = np.argmax(Xp @ C.T, axis=1)
    thr_q = int(round(0.96 * (1 << 20)))
    rows = []
    for cl in np.unique(a):
        sel = np.nonzero(a == cl)[0]
        sel = sel[np.argsort(idp[sel], kind="stable")]
        Xi, idi = Xp[sel], idp[sel]
        m = len(sel)
        parent = list(range(m))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        q = np.rint((Xi @ Xi.T) * (1 << 20)).astype(np.int64)
        for i in range(m):
            for j in range(i + 1, m):
                if q[i, j] >= thr_q:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(m)])
        sizes = np.bincount(roots, minlength=m)
        for i in range(m):
            if roots[i] == i:
                rows.append((int(idi[i]), int(cl), int(sizes[i])))
    want = pd.DataFrame(sorted(rows),
                        columns=["vec_id", "cluster", "n_semdups"])
    pd.testing.assert_frame_equal(
        got[["vec_id", "cluster", "n_semdups"]].astype("int64"), 
        want.astype("int64"))
    # every planted duplicate collapsed: its fresh id never survives
    assert not set(idp[len(ids):]) & set(got["vec_id"])
    assert (got["n_semdups"] >= 2).sum() >= dup_src.size * 0.9


# ---------------------------------------------------------------------------
# distributed PCA
# ---------------------------------------------------------------------------

def _pca_driver_twin(X, k, q_bits=20):
    """Local twin computing the SAME quantized sums."""
    Q = np.int64(1) << q_bits
    Xq = np.rint(X * Q).astype(np.int64)
    n, d = Xq.shape
    mean = Xq.sum(axis=0).astype(np.float64) / (n * Q)
    M2 = (Xq.T @ Xq).astype(np.float64)
    cov = M2 / (n * Q * Q) - np.outer(mean, mean)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    flip = V[np.abs(V).argmax(axis=0), np.arange(d)] < 0
    V[:, flip] *= -1.0
    return mean, V[:, :k].T.copy(), w


def _emb_df(n=400, d=16, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: a few dominant directions
    B = rng.normal(0, 1, (d, d))
    scale = np.geomspace(3.0, 0.1, d)
    X = rng.normal(0, 1, (n, d)) * scale @ B
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(X.astype(np.float32))}), X


def test_pca_fit_matches_twin_and_partition_invariant(ray_session):
    import ray.data as rd
    from parallel_dataflow_ray.stages.similarity import pca_fit

    df, X = _emb_df()
    Xf = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    fits = []
    for parts in (1, 5):
        ds = rd.from_pandas(df).repartition(parts)
        fits.append(pca_fit(ds, k=4))
    m1, C1, w1, n1 = fits[0]
    m2, C2, w2, n2 = fits[1]
    # bit-identical across partitionings (integer sums)
    assert n1 == n2 == len(df)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(C1, C2)
    np.testing.assert_array_equal(w1, w2)
    # equals the driver twin exactly (same sums -> same eigh input)
    mt, Ct, wt = _pca_driver_twin(Xf, 4)
    np.testing.assert_array_equal(m1, mt)
    np.testing.assert_array_equal(C1, Ct)
    # components are orthonormal, eigenvalues descending
    np.testing.assert_allclose(C1 @ C1.T, np.eye(4), atol=1e-10)
    assert (np.diff(w1) <= 1e-15).all()


def test_pca_transform_and_variance_law(ray_session):
    import ray.data as rd
    from parallel_dataflow_ray.stages.similarity import (pca_fit,
                                                         pca_transform)

    df, _ = _emb_df(n=300, d=12, seed=9)
    ds = rd.from_pandas(df).repartition(4)
    mean, comps, w, n = pca_fit(ds, k=12)
    out = pca_transform(ds, mean, comps).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    P = (X - mean) @ comps.T
    Q = 1 << 20
    for j in range(12):
        np.testing.assert_array_equal(
            out[f"p{j}"].to_numpy(),
            np.rint(P[:, j] * Q).astype(np.int64))
    # variance law: top-k explained variance is monotone and the full
    # k=d projection keeps the total variance
    tot = ((X - X.mean(0)) ** 2).sum() / len(X)
    assert abs(w.sum() - tot) / tot < 1e-6
    assert w[:4].sum() > 0.5 * tot      # anisotropic fixture
