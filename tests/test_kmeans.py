"""Distributed Lloyd's k-means: blob recovery, partitioning
invariance, inertia monotonicity, empty-cluster survival."""

import numpy as np
import pandas as pd
import pytest

import ray


def _blobs(seed=0, n=600, d=8, k=4, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (k, d)) * 3
    pts = np.concatenate([c + rng.normal(0, spread, (n // k, d))
                          for c in centers])
    ids = np.arange(len(pts), dtype=np.int64)
    return pd.DataFrame({"vec_id": ids,
                         "embedding": pts.astype(np.float32).tolist()}), \
        centers


def _ds(df, nparts):
    return ray.data.from_pandas(df).repartition(nparts)


def test_kmeans_recovers_blobs_and_is_partition_invariant(ray_session):
    from georay.kmeans import kmeans_assign, kmeans_fit
    df, centers = _blobs()
    fit4 = kmeans_fit(_ds(df, 4), k=4, iters=15, sample_frac=0.2)
    fit16 = kmeans_fit(_ds(df, 16), k=4, iters=15, sample_frac=0.2)
    # deterministic across block layouts (hash init + exact partials;
    # float fold order differs → tiny tolerance)
    np.testing.assert_allclose(np.sort(fit4["centroids"], axis=0),
                               np.sort(fit16["centroids"], axis=0),
                               atol=1e-8)
    # every true center has a recovered centroid nearby
    got = fit4["centroids"]
    for c in centers:
        assert np.min(np.sum((got - c) ** 2, axis=1)) < 0.1
    # inertia is non-increasing
    h = fit4["inertia"]
    assert all(h[i + 1] <= h[i] * (1 + 1e-9) for i in range(len(h) - 1))
    # assignment matches nearest-centroid brute force
    assigned = kmeans_assign(_ds(df, 4), got).to_pandas()
    x = np.stack(df["embedding"]).astype(np.float64)
    brute = np.argmin(((x[:, None, :] - got[None]) ** 2).sum(-1), axis=1)
    assigned = assigned.sort_values("vec_id")
    np.testing.assert_array_equal(assigned["cluster"].to_numpy(), brute)
    assert fit4["counts"].sum() == len(df)


def test_kmeans_more_clusters_than_blobs(ray_session):
    """k > natural clusters: empty clusters keep their centroid and the
    fit still converges with monotone inertia."""
    from georay.kmeans import kmeans_fit
    df, _ = _blobs(seed=3, n=200, k=2)
    fit = kmeans_fit(_ds(df, 4), k=6, iters=12, sample_frac=0.5)
    h = fit["inertia"]
    assert all(h[i + 1] <= h[i] * (1 + 1e-9) for i in range(len(h) - 1))
    assert fit["counts"].sum() == len(df)
    assert (fit["counts"] > 0).sum() >= 2


def test_kmeans_init_too_small_raises(ray_session):
    from georay.kmeans import kmeans_fit
    df, _ = _blobs(n=40, k=2)
    with pytest.raises(ValueError, match="sample"):
        kmeans_fit(_ds(df, 2), k=30, iters=2, sample_frac=0.01)
