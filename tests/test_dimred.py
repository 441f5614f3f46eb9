"""Distributed PCA + random projection (georay.dimred): the streaming
moment pass must match exact numpy PCA on the same data; projections
must be deterministic and shape/variance-correct."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from georay.dimred import (pca_exact, pca_fit, pca_transform,
                           random_projection)
from georay.util import fsl_to_numpy


def _toy(n=400, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: a known dominant direction
    base = rng.standard_normal((n, d))
    base[:, 0] *= 6.0
    base[:, 1] *= 2.5
    base += rng.standard_normal(d) * 3  # nonzero mean
    return base


def _ds(mat, blocks=7):
    n, d = mat.shape
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), d)})
    return ray.data.from_arrow(t).repartition(blocks)


def test_pca_fit_matches_exact_numpy(ray_session):
    mat = _toy()
    fit = pca_fit(_ds(mat), k=3)
    ref = pca_exact(mat, k=3)
    assert fit["n"] == ref["n"] == mat.shape[0]
    np.testing.assert_allclose(fit["mean"], ref["mean"], atol=1e-9)
    np.testing.assert_allclose(fit["eigenvalues"], ref["eigenvalues"],
                               rtol=1e-9)
    np.testing.assert_allclose(fit["components"], ref["components"],
                               atol=1e-8)


def test_pca_sign_convention_deterministic(ray_session):
    mat = _toy(seed=9)
    a = pca_fit(_ds(mat, blocks=3), k=2)["components"]
    b = pca_fit(_ds(mat, blocks=11), k=2)["components"]
    np.testing.assert_allclose(a, b, atol=1e-8)
    for row in a:
        assert row[np.argmax(np.abs(row))] > 0


def test_pca_components_orthonormal(ray_session):
    fit = pca_fit(_ds(_toy()), k=4)
    np.testing.assert_allclose(fit["components"] @ fit["components"].T,
                               np.eye(4), atol=1e-9)
    e = fit["eigenvalues"]
    assert all(e[i] >= e[i + 1] - 1e-12 for i in range(len(e) - 1))


def test_pca_transform_centers_and_projects(ray_session):
    mat = _toy()
    fit = pca_fit(_ds(mat), k=2)
    out = pca_transform(_ds(mat), fit).take_all()
    out.sort(key=lambda r: r["vec_id"])
    got = np.array([r["pc"] for r in out])
    want = (mat - fit["mean"]) @ fit["components"].T
    np.testing.assert_allclose(got, want, atol=1e-8)
    # projected variance along PC1 equals the top eigenvalue
    np.testing.assert_allclose(got[:, 0].var(ddof=1),
                               fit["eigenvalues"][0], rtol=1e-9)


def test_random_projection_deterministic_and_jl(ray_session):
    mat = _toy(n=300, d=12, seed=5)
    a = random_projection(_ds(mat), out_dim=6, seed=42).take_all()
    b = random_projection(_ds(mat, blocks=2), out_dim=6,
                          seed=42).take_all()
    a.sort(key=lambda r: r["vec_id"])
    b.sort(key=lambda r: r["vec_id"])
    ga = np.array([r["rp"] for r in a])
    gb = np.array([r["rp"] for r in b])
    np.testing.assert_allclose(ga, gb, atol=1e-12)
    assert ga.shape == (300, 6)
    # JL: squared norms preserved in expectation (loose 3-sigma band)
    r0 = np.linalg.norm(ga, axis=1) ** 2 / np.linalg.norm(mat, axis=1) ** 2
    assert 0.5 < r0.mean() < 1.5


def test_random_projection_needs_dim_for_plain_lists(ray_session):
    t = pa.table({"vec_id": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array([[1.0, 2.0], [3.0, 4.0]],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="in_dim"):
        random_projection(ds, out_dim=2)
    out = random_projection(ds, out_dim=2, in_dim=2, seed=1).take_all()
    assert len(out) == 2 and len(out[0]["rp"]) == 2


def test_embedding_pca_query_gates(ray_session):
    from georay.queries import q_embedding_pca
    t = q_embedding_pca("/root/testdata/sf0.001")
    df = t.to_pandas()
    assert df["orthonormal"].all() and df["eig_ordered"].all()
    assert df["n"].sum() > 0 and df["quadrant"].is_unique
    # quadrant counts match exact numpy PCA on the same parquet
    import pyarrow.parquet as pq
    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["embedding"])
    mat = fsl_to_numpy(emb["embedding"], dtype=np.float64)
    ref = pca_exact(mat, k=2)
    proj = (mat - ref["mean"]) @ ref["components"].T
    q = (proj[:, 0] >= 0).astype(int) * 2 + (proj[:, 1] >= 0)
    want = {int(k): int(v) for k, v in zip(*np.unique(q,
                                                      return_counts=True))}
    got = dict(zip(df["quadrant"].astype(int), df["n"].astype(int)))
    assert got == want
