"""Distributed dimensionality reduction over an embedding column —
PCA via streaming covariance partials, and Johnson–Lindenstrauss
Gaussian random projection.

Training-data curation primitives (decorrelation before clustering,
2-D diagnostic projections, cheap pre-reduction ahead of ANN / k-means
at high d).  Reference scope: GDAL has no PCA utility; this extends the
engine's LLM-pipeline surface alongside georay.kmeans / georay.ann.

Scale shape (the part that matters at 100 TB):

- ``pca_fit`` is ONE streaming pass: each batch emits a single partial
  row ``(n, Σx, Σxxᵀ)`` (d + d² float64s — d is the embedding width,
  so a 256-d embedding costs 512 KB per partial, independent of batch
  rows).  Partials fold through ``fanin`` salted combine groups (same
  tree as sketch.approx_distinct / kmeans) so the driver folds
  ``fanin`` rows, never one per block.  The d×d eigendecomposition is
  driver-side numpy on a tiny matrix.
- ``pca_transform`` / ``random_projection`` broadcast the (k, d)
  matrix once via ``ray.put`` and append the projection with one
  matmul per batch — nothing but the projected columns is added to
  the stream.

Determinism: eigenvector signs are fixed by convention (largest-|v|
coordinate made positive), and the JL matrix is a pure function of
``seed``, so results are reproducible on any cluster size up to
float-sum jitter in the covariance fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import fsl_to_numpy

__all__ = ["pca_fit", "pca_transform", "random_projection", "pca_exact"]


def _moment_partials(ds, vec_col: str, fanin: int):
    """One (salt, n, Σx, Σxxᵀ) row per batch, folded to ≤fanin rows."""

    def partial(batch: pa.Table) -> pa.Table:
        m = fsl_to_numpy(batch[vec_col], dtype=np.float64)
        n, d = m.shape
        s = m.sum(axis=0)
        outer = m.T @ m
        # content-derived salt: stable under block reordering
        salt = int(np.abs(s).sum() * 1e6) % fanin if n else 0
        return pa.table({
            "salt__": pa.array([salt], pa.int64()),
            "n__": pa.array([n], pa.int64()),
            "d__": pa.array([d], pa.int64()),
            "sum__": pa.array([s.tobytes()], pa.binary()),
            "outer__": pa.array([outer.tobytes()], pa.binary()),
        })

    def combine(g: pa.Table) -> pa.Table:
        d = int(g["d__"][0].as_py())
        n = int(pa.compute.sum(g["n__"]).as_py())
        s = np.zeros(d)
        outer = np.zeros((d, d))
        for i in range(g.num_rows):
            s += np.frombuffer(g["sum__"][i].as_py(), np.float64)
            outer += np.frombuffer(g["outer__"][i].as_py(),
                                   np.float64).reshape(d, d)
        return pa.table({"n__": pa.array([n], pa.int64()),
                         "d__": pa.array([d], pa.int64()),
                         "sum__": pa.array([s.tobytes()], pa.binary()),
                         "outer__": pa.array([outer.tobytes()],
                                             pa.binary())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("salt__")
              .map_groups(combine, batch_format="pyarrow")
              .take_all())
    if not rows:
        raise ValueError("pca_fit: empty dataset")
    d = int(rows[0]["d__"])
    n = sum(int(r["n__"]) for r in rows)
    s = np.zeros(d)
    outer = np.zeros((d, d))
    for r in rows:
        s += np.frombuffer(r["sum__"], np.float64)
        outer += np.frombuffer(r["outer__"], np.float64).reshape(d, d)
    return n, s, outer


def _eig_from_moments(n: int, s: np.ndarray, outer: np.ndarray, k: int):
    mean = s / n
    cov = (outer - n * np.outer(mean, mean)) / max(1, n - 1)
    vals, vecs = np.linalg.eigh(cov)            # ascending
    order = np.argsort(vals)[::-1][:k]
    vals = vals[order]
    comps = vecs[:, order].T                    # (k, d)
    # sign convention: the largest-|coordinate| entry of each component
    # is made positive (removes the eigh sign ambiguity deterministically)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps, "eigenvalues": vals,
            "n": n}


def pca_fit(ds, vec_col: str = "embedding", k: int = 2,
            fanin: int = 64) -> dict:
    """Fit a k-component PCA with one streaming moment pass (see module
    docstring).  Returns {mean (d,), components (k, d), eigenvalues
    (k,), n}."""
    n, s, outer = _moment_partials(ds, vec_col, fanin)
    return _eig_from_moments(n, s, outer, k)


def pca_exact(mat: np.ndarray, k: int = 2) -> dict:
    """Driver-side exact PCA on an in-memory matrix — the closed-form
    oracle the distributed fit is tested against."""
    mat = np.asarray(mat, np.float64)
    n = mat.shape[0]
    return _eig_from_moments(n, mat.sum(axis=0), mat.T @ mat, k)


def pca_transform(ds, model: dict, vec_col: str = "embedding",
                  out_col: str = "pc"):
    """Append the (k,) projection of each row as a list<double> column.
    The (k, d) matrix ships once via ``ray.put``."""
    import ray

    ref = ray.put((model["mean"], model["components"]))

    class Project:
        def __init__(self):
            self.mean, self.comps = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = fsl_to_numpy(batch[vec_col], dtype=np.float64)
            proj = (m - self.mean) @ self.comps.T
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(proj.ravel(), pa.float64()), proj.shape[1])
            return batch.append_column(out_col, col)

    return ds.map_batches(Project, batch_format="pyarrow", concurrency=2)


def random_projection(ds, vec_col: str = "embedding", out_dim: int = 8,
                      seed: int = 0, in_dim: int | None = None,
                      out_col: str = "rp"):
    """Johnson–Lindenstrauss Gaussian projection to ``out_dim`` —
    R ~ N(0, 1/out_dim), a pure function of ``seed`` (reproducible on
    any cluster size).  ``in_dim`` may be omitted when the dataset
    schema carries a fixed_size_list width; otherwise pass it."""
    import ray

    if in_dim is None:
        t = ds.schema().base_schema.field(vec_col).type
        if not hasattr(t, "list_size"):
            raise ValueError("pass in_dim= for non-fixed-size embeddings")
        in_dim = t.list_size
    rng = np.random.default_rng(seed)
    r = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)
    ref = ray.put(r)

    class Project:
        def __init__(self):
            self.r = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = fsl_to_numpy(batch[vec_col], dtype=np.float64)
            proj = m @ self.r
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(proj.ravel(), pa.float64()), proj.shape[1])
            return batch.append_column(out_col, col)

    return ds.map_batches(Project, batch_format="pyarrow", concurrency=2)
