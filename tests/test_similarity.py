"""ANN quality: IVF approximate top-k recall against the exact brute force."""

from __future__ import annotations

import numpy as np

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
