"""Distributed Lloyd's k-means over an embedding column.

Training-data curation primitive (diversity sampling, semantic
bucketing, IVF coarse quantizers — georay/ann.py builds its IVF lists
from a sampled variant of the same iteration).  The distributed shape:

- INIT — deterministic: a Knuth-hash sample of rows (pure function of
  the id column — same init on any cluster size) seeds k centroids via
  k-means++-style farthest-point selection on the sampled matrix.
- Each Lloyd iteration is ONE streaming pass: centroids broadcast via
  ``ray.put``, every batch assigns points (one matmul) and emits k
  partial rows (per-centroid vector sums + counts); partials fold
  through ``fanin`` salted combine groups (same tree as
  sketch.approx_distinct — the driver never sees one row per block)
  and the driver updates centroids from k tiny rows.
- ``assign`` is one more ``map_batches`` pass appending the cluster id.

Nothing materializes the dataset; per-iteration shuffle volume is
``blocks × k × (d+1)`` floats pre-fold, ``fanin × k`` rows post-fold.
Empty clusters keep their previous centroid (the standard fix).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sample import hash_bucket
from .util import fsl_to_numpy

__all__ = ["kmeans_fit", "kmeans_assign"]

_MOD = 1 << 32


def _init_centroids(ds, vec_col: str, id_col: str, k: int,
                    sample_frac: float) -> np.ndarray:
    """Deterministic farthest-point init on a hash sample."""
    cut = int(round(sample_frac * _MOD))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.select([id_col, vec_col]).filter(
            pa.array(hash_bucket(ids) < cut))

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    if len(rows) < k:
        raise ValueError(f"init sample ({len(rows)}) smaller than k={k} "
                         f"— raise sample_frac")
    rows.sort(key=lambda r: r[id_col])      # order-independent of blocks
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    # farthest-point (k-means++ with deterministic first pick)
    cent = [mat[0]]
    d2 = np.sum((mat - cent[0]) ** 2, axis=1)
    for _ in range(1, k):
        cent.append(mat[int(np.argmax(d2))])
        d2 = np.minimum(d2, np.sum((mat - cent[-1]) ** 2, axis=1))
    return np.asarray(cent)


def _iterate(ds, vec_col: str, cent: np.ndarray,
             fanin: int = 64) -> tuple[np.ndarray, np.ndarray, float]:
    """One Lloyd pass → (vector sums (k,d), counts (k,), inertia)."""
    import ray
    k, d = cent.shape
    ref = ray.put(cent)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = fsl_to_numpy(batch[vec_col], dtype=np.float64)
        if x.shape[0] == 0:
            return pa.table({"salt__": pa.array([], pa.int64()),
                             "blob__": pa.array([], pa.binary()),
                             "inertia__": pa.array([], pa.float64())})
        # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin drops the ||x||² term
        dots = x @ c.T
        c2 = np.sum(c * c, axis=1)
        a = np.argmin(c2[None, :] - 2.0 * dots, axis=1)
        best = np.min(c2[None, :] - 2.0 * dots, axis=1) \
            + np.sum(x * x, axis=1)
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, a, x)
        cnt = np.bincount(a, minlength=k).astype(np.float64)
        blob = np.concatenate([sums.ravel(), cnt]).tobytes()
        salt = int(a[0]) % fanin
        return pa.table({"salt__": pa.array([salt], pa.int64()),
                         "blob__": pa.array([blob], pa.binary()),
                         "inertia__": pa.array([float(best.sum())])})

    def combine(g: pa.Table) -> pa.Table:
        acc = np.zeros(k * d + k, np.float64)
        for b in g["blob__"]:
            acc += np.frombuffer(b.as_py(), dtype=np.float64)
        return pa.table({"blob__": pa.array([acc.tobytes()], pa.binary()),
                         "inertia__": pa.array(
                             [float(np.sum(g["inertia__"].to_numpy()))])})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("salt__")
              .map_groups(combine, batch_format="pyarrow")
              .take_all())
    acc = np.zeros(k * d + k, np.float64)
    inertia = 0.0
    for r in rows:
        acc += np.frombuffer(r["blob__"], dtype=np.float64)
        inertia += r["inertia__"]
    sums = acc[:k * d].reshape(k, d)
    cnt = acc[k * d:]
    return sums, cnt, inertia


def kmeans_fit(ds, vec_col: str = "embedding", id_col: str = "vec_id",
               k: int = 8, iters: int = 10, tol: float = 1e-7,
               sample_frac: float = 0.05):
    """Fit → dict(centroids (k,d), counts, inertia list, n_iters).

    The input's (id, vec) projection is ``materialize()``d ONCE before
    the loop: Lloyd fundamentally re-scans the data every iteration, so
    the pinned set (just the projected embedding table — the object
    store spills it if needed) is the Ray-idiomatic cache for an
    iterative consumer.

    SIZE-ADAPTIVE (the equi_join discipline): each distributed pass
    costs ~1 s of streaming-executor fixed overhead regardless of data
    size, so iters=10 on a small table pays ~10 s of pure orchestration
    (measured 12.9 s for 50k×64f at sf0.1).  When the pinned projection
    is ≤ ``local_cap`` bytes the loop runs driver-side on the collected
    matrix with the IDENTICAL init + update rules (float summation
    order differs — same tolerance contract as the distributed path,
    whose partial sums are block-order-dependent too)."""
    ds = ds.map_batches(
        lambda b: b.select([id_col, vec_col]),
        batch_format="pyarrow").materialize()
    local_cap = 64 << 20
    nbytes = ds.size_bytes() or 0
    if 0 < nbytes <= local_cap:
        t = pa.concat_tables(
            ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        mat = fsl_to_numpy(t[vec_col], dtype=np.float64)[order]
        ids = ids[order]
        cent = _local_init(ids, mat, k, sample_frac)
        history = []
        x2 = np.sum(mat * mat, axis=1)
        cnt = np.zeros(k)
        for it in range(iters):
            c2 = np.sum(cent * cent, axis=1)
            dist = c2[None, :] - 2.0 * (mat @ cent.T)
            a = np.argmin(dist, axis=1)
            history.append(float((np.min(dist, axis=1) + x2).sum()))
            sums = np.zeros_like(cent)
            np.add.at(sums, a, mat)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            new = cent.copy()
            nz = cnt > 0
            new[nz] = sums[nz] / cnt[nz, None]
            shift = float(np.max(np.sum((new - cent) ** 2, axis=1)))
            cent = new
            if shift < tol:
                break
        return {"centroids": cent, "counts": cnt.astype(np.int64),
                "inertia": history, "n_iters": len(history)}
    cent = _init_centroids(ds, vec_col, id_col, k, sample_frac)
    history = []
    for it in range(iters):
        sums, cnt, inertia = _iterate(ds, vec_col, cent)
        history.append(inertia)
        new = cent.copy()
        nz = cnt > 0
        new[nz] = sums[nz] / cnt[nz, None]
        shift = float(np.max(np.sum((new - cent) ** 2, axis=1)))
        cent = new
        if shift < tol:
            break
    return {"centroids": cent, "counts": cnt.astype(np.int64),
            "inertia": history, "n_iters": len(history)}


def _local_init(ids: np.ndarray, mat: np.ndarray, k: int,
                sample_frac: float) -> np.ndarray:
    """Driver-side mirror of :func:`_init_centroids` — same hash sample,
    same id sort, same farthest-point walk."""
    cut = int(round(sample_frac * _MOD))
    keep = hash_bucket(ids) < cut
    sub = mat[keep]
    if sub.shape[0] < k:
        raise ValueError(f"init sample ({sub.shape[0]}) smaller than "
                         f"k={k} — raise sample_frac")
    cent = [sub[0]]
    d2 = np.sum((sub - cent[0]) ** 2, axis=1)
    for _ in range(1, k):
        cent.append(sub[int(np.argmax(d2))])
        d2 = np.minimum(d2, np.sum((sub - cent[-1]) ** 2, axis=1))
    return np.asarray(cent)


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  out_col: str = "cluster"):
    """Append the nearest-centroid id (one matmul per batch)."""
    import ray
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = fsl_to_numpy(batch[vec_col], dtype=np.float64)
        if x.shape[0] == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        a = np.argmin(np.sum(c * c, axis=1)[None, :] - 2.0 * (x @ c.T),
                      axis=1)
        return batch.append_column(out_col, pa.array(a.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


def semantic_dedup(ds, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int = 8,
                   threshold: float = 0.95, iters: int = 10):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space, then within each
    cluster drop every point that has a LOWER-id neighbor with cosine
    ≥ ``threshold`` (first-occurrence-wins — deterministic on any
    partitioning, matching the exact-dedup keep rule).

    Scale shape: the clustering is the streaming distributed Lloyd fit
    above; the within-cluster pass is a ``groupby(cluster)`` co-shuffle
    with ONE vectorized normalized-matmul per cluster.  As in the
    paper, ``k`` must grow with N so per-cluster sizes stay bounded
    (the per-cluster work is O(n_c²) — choose k ≈ N/5000); the group
    count is k, so per-group Python dispatch is k calls, not N."""
    fit = kmeans_fit(ds, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    tagged = kmeans_assign(ds, fit["centroids"], vec_col=vec_col)

    def dedup_cluster(g: pa.Table) -> pa.Table:
        x = fsl_to_numpy(g[vec_col], dtype=np.float64)
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        x, ids = x[order], ids[order]
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                            1e-12)
        sim = xn @ xn.T
        # drop i iff any j < i has cosine ≥ threshold (strict upper
        # triangle read column-wise)
        dup = np.any(np.triu(sim >= threshold, 1), axis=0)
        keep = pa.array(order[~dup])
        return pa.table({
            id_col: g[id_col].take(keep),
            "cluster": g["cluster"].take(keep),
        })

    return tagged.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow")
