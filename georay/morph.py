"""Per-tile raster morphology: sieve filter, proximity (distance
transform), fill-nodata — SURVEY.md §2.7 (alg/gdalsievefilter.cpp,
alg/gdalproximity.cpp, alg/rasterfill.cpp analogs).

These are the per-tile kernels; the reference semantics are global over the
raster, so for multi-tile rasters a halo-exchange pass (fetch a margin from
neighbor tiles, iterate cross-tile relaxation) is still required — the
engine's tiles-are-rows model makes each image row an independent raster,
where these ARE exact.
"""

from __future__ import annotations

import numpy as np

from .polygonize import label_components

__all__ = ["sieve_filter", "proximity", "fill_nodata"]


def sieve_filter(band: np.ndarray, threshold: int,
                 connect8: bool = False) -> np.ndarray:
    """Remove raster polygons smaller than ``threshold`` pixels by merging
    them into their largest neighboring polygon (GDALSieveFilter
    semantics).  Iterates until no undersized region remains (small
    regions can merge into other small regions first, like the
    reference's multi-pass merge)."""
    out = band.copy()
    for _ in range(256):  # convergence bound
        lab = label_components(out, connect8)
        flat_lab = lab.ravel()
        ids, counts = np.unique(flat_lab, return_counts=True)
        sizes = dict(zip(ids.tolist(), counts.tolist()))
        small = [i for i in ids if sizes[i] < threshold]
        if not small:
            return out
        small_set = set(small)
        # neighbor tallies: for every small region, count boundary contacts
        # per neighboring region; merge into the largest neighbor
        h, w = out.shape
        contact: dict = {}

        def tally(a_lab, b_lab):
            m = a_lab != b_lab
            for sa, sb in ((a_lab[m], b_lab[m]), (b_lab[m], a_lab[m])):
                for x, y in zip(sa.ravel().tolist(), sb.ravel().tolist()):
                    if x in small_set:
                        contact.setdefault(x, {})
                        contact[x][y] = contact[x].get(y, 0) + 1

        tally(lab[:, :-1], lab[:, 1:])
        tally(lab[:-1, :], lab[1:, :])
        changed = False
        for s in small:
            nbrs = contact.get(s)
            if not nbrs:
                continue  # isolated region filling the whole tile
            # largest neighbor by pixel count (ties: most contact)
            target = max(nbrs, key=lambda n: (sizes.get(n, 0), nbrs[n]))
            out[lab == s] = out[lab == target].flat[0]
            changed = True
        if not changed:
            return out
    return out


def proximity(target_mask: np.ndarray, cellsize: float = 1.0,
              max_dist: float | None = None) -> np.ndarray:
    """Distance from every pixel to the nearest True pixel —
    GDALComputeProximity's two-pass scan, done as a numpy chamfer
    transform refined to exact Euclidean via per-row nearest-feature
    bookkeeping (Felzenszwalb-style two-pass 1-D transforms).

    Exact Euclidean distance; ``max_dist`` clips (GDAL MAXDIST option).
    """
    mask = np.asarray(target_mask, dtype=bool)
    h, w = mask.shape
    INF = np.float64(1e18)
    # 1-D distance transform along columns: distance to nearest True in col
    d = np.where(mask, 0.0, INF)
    for y in range(1, h):
        d[y] = np.minimum(d[y], d[y - 1] + 1.0)
    for y in range(h - 2, -1, -1):
        d[y] = np.minimum(d[y], d[y + 1] + 1.0)
    # now d[y,x] = vertical distance to nearest target in column x.
    # exact 2-D: dist² = min_x' ( d[y,x']² + (x-x')² ) — lower-envelope of
    # parabolas per row (Felzenszwalb & Huttenlocher, vectorized per row)
    out = np.empty((h, w), dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    for y in range(h):
        f = d[y] ** 2
        # brute per-row envelope via broadcasting (w ≤ ~512 per tile)
        out[y] = np.sqrt(np.min(f[None, :] + (xs[:, None] - xs[None, :]) ** 2,
                                axis=1))
    out *= cellsize
    if max_dist is not None:
        out = np.minimum(out, max_dist)
    return out


def fill_nodata(band: np.ndarray, nodata_mask: np.ndarray,
                max_search: int = 16, smoothing_iterations: int = 0,
                power: float = 2.0) -> np.ndarray:
    """Fill nodata holes by inverse-distance interpolation from valid
    pixels within ``max_search`` (GDALFillNodata semantics; optional 3×3
    smoothing passes over the filled areas)."""
    band = band.astype(np.float64)
    mask = np.asarray(nodata_mask, dtype=bool)
    if not mask.any():
        return band
    h, w = band.shape
    vy, vx = np.nonzero(~mask)
    vals = band[~mask]
    hy, hx = np.nonzero(mask)
    out = band.copy()
    # block the hole pixels against all valid pixels within the window
    for s in range(0, len(hy), 4096):
        yy = hy[s:s + 4096][:, None].astype(np.float64)
        xx = hx[s:s + 4096][:, None].astype(np.float64)
        dy = yy - vy[None, :]
        dx = xx - vx[None, :]
        d2 = dy * dy + dx * dx
        inr = d2 <= max_search * max_search
        with np.errstate(divide="ignore"):
            wgt = np.where(inr, 1.0 / np.power(np.sqrt(d2), power), 0.0)
        wgt[~np.isfinite(wgt)] = 0.0
        denom = wgt.sum(axis=1)
        est = (wgt * vals[None, :]).sum(axis=1) / np.where(denom > 0, denom, 1)
        out[hy[s:s + 4096], hx[s:s + 4096]] = np.where(denom > 0, est, 0.0)
    for _ in range(smoothing_iterations):
        p = np.pad(out, 1, mode="edge")
        sm = (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
              + p[1:-1, 1:-1]) / 5.0
        out[mask] = sm[mask]
    return out
