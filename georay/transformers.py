"""GCP-based georeferencing transformers — the non-affine members of
GDAL's transformer family (alg/gdaltransformer.cpp dispatch), from
public math:

* :class:`GCPPolynomialTransformer` — least-squares polynomial of order
  1-3 fit to ground control points, both directions fit independently
  (alg/gdal_crs.cpp semantics: GRASS-lineage CRS_compute_georef_equations
  solves the same normal equations).
* :class:`ThinPlateSplineTransformer` — exact-interpolating thin-plate
  spline with the r^2 ln r^2 radial kernel + affine part
  (alg/thinplatespline.cpp:719 VizGeorefSpline2D solve; textbook TPS).
* :class:`RPCTransformer` — RPC00B rational polynomial camera model: each
  image coordinate is a ratio of two 20-term cubic polynomials in
  normalized (lat, lon, height); the geo→pixel direction is closed-form,
  pixel→geo iterates (alg/gdal_rpc.cpp RPCInverseTransformPoint does the
  same fixed-point refinement).

All transformers expose ``pixel_to_geo(px, py)`` and
``geo_to_pixel(x, y)`` over numpy arrays (vectorized), and plug into
``raster.warp_affine_mercator(src_transformer=...)`` where they replace
the source-side affine geotransform.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GCPPolynomialTransformer", "ThinPlateSplineTransformer",
           "RPCTransformer", "GeolocArrayTransformer", "ApproxTransformer",
           "approx_indexed", "suggested_polynomial_order"]


def _poly_terms(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Monomial design matrix — columns match gdal_crs.cpp's term order
    (1, x, y, xy, x², y², x²y, xy², x³, y³ for order 3)."""
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x * x * x, y * y * y]
    return np.stack(cols, axis=-1)


def suggested_polynomial_order(n_gcps: int) -> int:
    """GDAL's default order choice: the highest order the GCP count can
    determine (gdal_crs.cpp: 3+ → order 1, 6+ → 2, 10+ → 3, capped 2 by
    default unless explicitly requested — we return the determinable
    order and let the caller cap)."""
    if n_gcps >= 10:
        return 3
    if n_gcps >= 6:
        return 2
    if n_gcps >= 3:
        return 1
    raise ValueError("need at least 3 GCPs")


class GCPPolynomialTransformer:
    """Order-1/2/3 polynomial fit to GCPs, both directions independently
    (as gdal_crs.cpp does — the inverse is its OWN least-squares fit, not
    an algebraic inversion)."""

    def __init__(self, pixel, line, geo_x, geo_y, order: int | None = None):
        px = np.asarray(pixel, dtype=np.float64)
        py = np.asarray(line, dtype=np.float64)
        gx = np.asarray(geo_x, dtype=np.float64)
        gy = np.asarray(geo_y, dtype=np.float64)
        if order is None:
            order = min(2, suggested_polynomial_order(len(px)))
        n_terms = {1: 3, 2: 6, 3: 10}[order]
        if len(px) < n_terms:
            raise ValueError(
                f"order {order} needs >= {n_terms} GCPs, got {len(px)}")
        self.order = order
        A = _poly_terms(order, px, py)
        self._fwd, *_ = np.linalg.lstsq(A, np.stack([gx, gy], axis=-1),
                                        rcond=None)
        B = _poly_terms(order, gx, gy)
        self._inv, *_ = np.linalg.lstsq(B, np.stack([px, py], axis=-1),
                                        rcond=None)
        # max residual of the forward fit in geo units (GDAL reports the
        # same per-GCP errors via GDALComputeGCPResiduals)
        res = A @ self._fwd - np.stack([gx, gy], axis=-1)
        self.max_error = float(np.abs(res).max()) if res.size else 0.0

    def pixel_to_geo(self, px, py):
        T = _poly_terms(self.order, np.asarray(px, np.float64),
                        np.asarray(py, np.float64))
        out = T @ self._fwd
        return out[..., 0], out[..., 1]

    def geo_to_pixel(self, x, y):
        T = _poly_terms(self.order, np.asarray(x, np.float64),
                        np.asarray(y, np.float64))
        out = T @ self._inv
        return out[..., 0], out[..., 1]


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    """U(r) = r² ln r² (thinplatespline.cpp uses base-e ln of r²; any
    constant factor is absorbed by the solved weights)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        out = r2 * np.log(r2)
    return np.where(r2 > 0.0, out, 0.0)


class _TPSDirection:
    """One-direction TPS: exact interpolation of (src → dst) samples."""

    def __init__(self, src_xy: np.ndarray, dst_xy: np.ndarray):
        n = len(src_xy)
        d2 = ((src_xy[:, None, :] - src_xy[None, :, :]) ** 2).sum(-1)
        K = _tps_kernel(d2)
        P = np.concatenate([np.ones((n, 1)), src_xy], axis=1)
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst_xy
        # lstsq tolerates duplicate GCPs (singular K) like GDAL's solver
        sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        self.src = src_xy
        self.w = sol[:n]
        self.a = sol[n:]

    def __call__(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        shape = np.broadcast_shapes(x.shape, y.shape)
        xf = np.broadcast_to(x, shape).reshape(-1)
        yf = np.broadcast_to(y, shape).reshape(-1)
        # chunked so the (npts × ngcp) distance matrix stays bounded
        ox = np.empty(xf.size)
        oy = np.empty(xf.size)
        step = max(1, (1 << 22) // max(1, len(self.src)))
        for s in range(0, xf.size, step):
            e = min(s + step, xf.size)
            dx = xf[s:e, None] - self.src[None, :, 0]
            dy = yf[s:e, None] - self.src[None, :, 1]
            U = _tps_kernel(dx * dx + dy * dy)
            out = U @ self.w
            out += self.a[0] + xf[s:e, None] * self.a[1] \
                + yf[s:e, None] * self.a[2]
            ox[s:e] = out[:, 0]
            oy[s:e] = out[:, 1]
        return ox.reshape(shape), oy.reshape(shape)


class ThinPlateSplineTransformer:
    """Forward and reverse thin-plate splines fit independently from the
    same GCP set (thinplatespline.cpp builds both for gdalwarp -tps)."""

    def __init__(self, pixel, line, geo_x, geo_y):
        pix = np.stack([np.asarray(pixel, np.float64),
                        np.asarray(line, np.float64)], axis=-1)
        geo = np.stack([np.asarray(geo_x, np.float64),
                        np.asarray(geo_y, np.float64)], axis=-1)
        if len(pix) < 3:
            raise ValueError("TPS needs at least 3 GCPs")
        self._fwd = _TPSDirection(pix, geo)
        self._inv = _TPSDirection(geo, pix)

    def pixel_to_geo(self, px, py):
        return self._fwd(px, py)

    def geo_to_pixel(self, x, y):
        return self._inv(x, y)


# RPC00B 20-term cubic polynomial: coefficient order is the standard
# NITF/GDAL layout (gdal_rpc.cpp RPCEvaluate)
def _rpc_poly(c: np.ndarray, P, L, H):
    return (c[0]
            + c[1] * L + c[2] * P + c[3] * H
            + c[4] * L * P + c[5] * L * H + c[6] * P * H
            + c[7] * L * L + c[8] * P * P + c[9] * H * H
            + c[10] * P * L * H
            + c[11] * L * L * L + c[12] * L * P * P + c[13] * L * H * H
            + c[14] * L * L * P + c[15] * P * P * P + c[16] * P * H * H
            + c[17] * L * L * H + c[18] * P * P * H + c[19] * H * H * H)


class RPCTransformer:
    """RPC00B camera model.  ``geo_to_pixel(lon, lat, height)`` is the
    closed-form direction; ``pixel_to_geo(px, py, height)`` iterates a
    damped fixed point seeded by a local linearization, as
    gdal_rpc.cpp:RPCInverseTransformPoint does."""

    def __init__(self, *, line_num, line_den, samp_num, samp_den,
                 lat_off, lat_scale, long_off, long_scale,
                 height_off, height_scale, line_off, line_scale,
                 samp_off, samp_scale):
        self.ln = np.asarray(line_num, np.float64)
        self.ld = np.asarray(line_den, np.float64)
        self.sn = np.asarray(samp_num, np.float64)
        self.sd = np.asarray(samp_den, np.float64)
        for c in (self.ln, self.ld, self.sn, self.sd):
            if c.shape != (20,):
                raise ValueError("RPC coefficient vectors must be length 20")
        self.lat_off, self.lat_scale = lat_off, lat_scale
        self.long_off, self.long_scale = long_off, long_scale
        self.height_off, self.height_scale = height_off, height_scale
        self.line_off, self.line_scale = line_off, line_scale
        self.samp_off, self.samp_scale = samp_off, samp_scale

    def geo_to_pixel(self, lon, lat, height=None):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        H = (np.zeros_like(lat) if height is None
             else np.asarray(height, np.float64))
        P = (lat - self.lat_off) / self.lat_scale
        L = (lon - self.long_off) / self.long_scale
        Hn = (H - self.height_off) / self.height_scale
        line = _rpc_poly(self.ln, P, L, Hn) / _rpc_poly(self.ld, P, L, Hn)
        samp = _rpc_poly(self.sn, P, L, Hn) / _rpc_poly(self.sd, P, L, Hn)
        return (samp * self.samp_scale + self.samp_off,
                line * self.line_scale + self.line_off)

    def pixel_to_geo(self, px, py, height=None, *, iterations: int = 10):
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        H = (np.zeros_like(px, dtype=np.float64) if height is None
             else np.asarray(height, np.float64))
        lon = np.full(np.broadcast_shapes(px.shape, py.shape),
                      self.long_off, np.float64)
        lat = np.full_like(lon, self.lat_off)
        eps_lon = 1e-7 * abs(self.long_scale)
        eps_lat = 1e-7 * abs(self.lat_scale)
        for _ in range(iterations):
            sx, sy = self.geo_to_pixel(lon, lat, H)
            ex = px - sx
            ey = py - sy
            # local Jacobian by central differences (vectorized)
            sx1, sy1 = self.geo_to_pixel(lon + eps_lon, lat, H)
            sx2, sy2 = self.geo_to_pixel(lon, lat + eps_lat, H)
            j11 = (sx1 - sx) / eps_lon   # dsamp/dlon
            j21 = (sy1 - sy) / eps_lon   # dline/dlon
            j12 = (sx2 - sx) / eps_lat   # dsamp/dlat
            j22 = (sy2 - sy) / eps_lat   # dline/dlat
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            lon = lon + (ex * j22 - ey * j12) / det
            lat = lat + (ey * j11 - ex * j21) / det
            if max(np.abs(ex).max(initial=0.0),
                   np.abs(ey).max(initial=0.0)) < 1e-10:
                break
        return lon, lat


class GeolocArrayTransformer:
    """Geolocation-array transformer (alg/gdalgeoloc.cpp): the source is
    georeferenced by two 2-D arrays GEO_X[row, col] / GEO_Y[row, col]
    giving the georeferenced position of geolocation-grid nodes, related
    to raster pixels by ``pixel = PIXEL_OFFSET + col·PIXEL_STEP``.

    * forward ``pixel_to_geo``: bilinear interpolation in the geolocation
      arrays (gdalgeoloc.cpp:369 "bilinearly-interpolated georeferenced
      position").
    * inverse ``geo_to_pixel``: a coarse BACKMAP (geoloc nodes splatted
      into a geo-referenced grid of pixel/line values, averaged, holes
      filled by neighbor relaxation — gdalgeoloc.cpp:1004-1226's
      resolution/averaging strategy) seeds vectorized Newton iterations
      on the forward bilinear surface, giving exact inverse bilinear
      solutions wherever the mapping is locally invertible (the
      reference's "exact inverse bilinear interpolation method",
      gdalgeoloc.cpp:948).
    """

    def __init__(self, geo_x: np.ndarray, geo_y: np.ndarray, *,
                 pixel_offset: float = 0.0, line_offset: float = 0.0,
                 pixel_step: float = 1.0, line_step: float = 1.0,
                 backmap_oversample: float = 1.3):
        self.gx = np.asarray(geo_x, np.float64)
        self.gy = np.asarray(geo_y, np.float64)
        if self.gx.shape != self.gy.shape or self.gx.ndim != 2:
            raise ValueError("GEO_X/GEO_Y must be equal-shape 2-D arrays")
        self.px_off, self.ln_off = float(pixel_offset), float(line_offset)
        self.px_step, self.ln_step = float(pixel_step), float(line_step)
        self._build_backmap(backmap_oversample)

    # -- pixel -> geoloc-array fractional index ---------------------------
    def _pix_to_arr(self, px, py):
        return ((np.asarray(px, np.float64) - self.px_off) / self.px_step,
                (np.asarray(py, np.float64) - self.ln_off) / self.ln_step)

    def _bilinear(self, c, r):
        h, w = self.gx.shape
        c = np.clip(c, 0.0, w - 1.0)
        r = np.clip(r, 0.0, h - 1.0)
        c0 = np.clip(np.floor(c).astype(np.int64), 0, w - 2) if w > 1 \
            else np.zeros_like(c, np.int64)
        r0 = np.clip(np.floor(r).astype(np.int64), 0, h - 2) if h > 1 \
            else np.zeros_like(r, np.int64)
        fc = c - c0
        fr = r - r0
        c1 = np.minimum(c0 + 1, w - 1)
        r1 = np.minimum(r0 + 1, h - 1)

        def interp(a):
            return (a[r0, c0] * (1 - fc) * (1 - fr)
                    + a[r0, c1] * fc * (1 - fr)
                    + a[r1, c0] * (1 - fc) * fr
                    + a[r1, c1] * fc * fr)

        return interp(self.gx), interp(self.gy)

    def pixel_to_geo(self, px, py):
        c, r = self._pix_to_arr(px, py)
        return self._bilinear(c, r)

    # -- backmap ----------------------------------------------------------
    def _build_backmap(self, oversample: float):
        h, w = self.gx.shape
        n = max(4, int(np.sqrt(h * w) * oversample))
        x0, x1 = self.gx.min(), self.gx.max()
        y0, y1 = self.gy.min(), self.gy.max()
        self._bm_x0, self._bm_y0 = x0, y0
        self._bm_dx = (x1 - x0) / n or 1.0
        self._bm_dy = (y1 - y0) / n or 1.0
        self._bm_n = n
        ci = np.clip(((self.gx - x0) / self._bm_dx), 0, n - 1).astype(int)
        ri = np.clip(((self.gy - y0) / self._bm_dy), 0, n - 1).astype(int)
        flat = ri.ravel() * n + ci.ravel()
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        cnt = np.bincount(flat, minlength=n * n).astype(np.float64)
        sc = np.bincount(flat, weights=cols.ravel(), minlength=n * n)
        sr = np.bincount(flat, weights=rows.ravel(), minlength=n * n)
        with np.errstate(invalid="ignore"):
            bm_c = (sc / cnt).reshape(n, n)
            bm_r = (sr / cnt).reshape(n, n)
        # fill holes by neighbor relaxation (bounded rounds — the backmap
        # only SEEDS Newton, it need not be precise)
        for _ in range(8):
            nan = np.isnan(bm_c)
            if not nan.any():
                break
            for a in (bm_c, bm_r):
                p = np.pad(a, 1, constant_values=np.nan)
                stack = np.stack([p[:-2, 1:-1], p[2:, 1:-1],
                                  p[1:-1, :-2], p[1:-1, 2:]])
                with np.errstate(invalid="ignore"):
                    mean = np.nanmean(stack, axis=0)
                a[nan] = mean[nan]
        np.nan_to_num(bm_c, copy=False, nan=(w - 1) / 2.0)
        np.nan_to_num(bm_r, copy=False, nan=(h - 1) / 2.0)
        self._bm_c, self._bm_r = bm_c, bm_r

    def geo_to_pixel(self, x, y, *, iterations: int = 12):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        n = self._bm_n
        qc = np.clip((x - self._bm_x0) / self._bm_dx, 0, n - 1).astype(int)
        qr = np.clip((y - self._bm_y0) / self._bm_dy, 0, n - 1).astype(int)
        c = self._bm_c[qr, qc].copy()
        r = self._bm_r[qr, qc].copy()
        h, w = self.gx.shape
        eps = 1e-4
        for _ in range(iterations):
            fx, fy = self._bilinear(c, r)
            ex, ey = x - fx, y - fy
            fx1, fy1 = self._bilinear(c + eps, r)
            fx2, fy2 = self._bilinear(c, r + eps)
            j11 = (fx1 - fx) / eps
            j21 = (fy1 - fy) / eps
            j12 = (fx2 - fx) / eps
            j22 = (fy2 - fy) / eps
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            c = np.clip(c + (ex * j22 - ey * j12) / det, 0, w - 1)
            r = np.clip(r + (ey * j11 - ex * j21) / det, 0, h - 1)
            if max(np.abs(ex).max(initial=0.0),
                   np.abs(ey).max(initial=0.0)) < 1e-12:
                break
        return (c * self.px_step + self.px_off,
                r * self.ln_step + self.ln_off)


class ApproxTransformer:
    """Scanline approximator (gdaltransformer.cpp:3839
    GDALCreateApproxTransformer / :3923 GDALApproxTransformInternal): the
    exact transformer is evaluated at interval endpoints + midpoints;
    where linear interpolation of the midpoint is within ``max_error``
    the whole interval is interpolated, else the interval subdivides.

    Vectorized re-expression: instead of the reference's recursion over
    one scanline, ALL active intervals across the batch subdivide
    together; each round evaluates the base transform once on the new
    midpoints.  Exact-evaluation fraction ≈ what the recursion does;
    output parity with the base transform is bounded by ``max_error``
    along-line (same contract as the reference)."""

    def __init__(self, base_forward, max_error: float = 0.125):
        self.base = base_forward
        self.max_error = float(max_error)

    def transform_scanline(self, x0: float, x1: float, y: float, n: int):
        """Transform the n evenly spaced points (x0..x1, y) — the warp
        inner loop's shape (one output scanline)."""
        xs = np.linspace(x0, x1, n)
        ys = np.full(n, y)
        out_x = np.full(n, np.nan)
        out_y = np.full(n, np.nan)
        # seed: endpoints exact
        ends = np.array([0, n - 1], dtype=np.int64)
        bx, by = self.base(xs[ends], ys[ends])
        out_x[ends], out_y[ends] = bx, by
        # active intervals as (lo, hi) index pairs
        lo = np.array([0], dtype=np.int64)
        hi = np.array([n - 1], dtype=np.int64)
        while lo.size:
            mid = (lo + hi) // 2
            fresh = np.isnan(out_x[mid])
            if fresh.any():
                mx, my = self.base(xs[mid[fresh]], ys[mid[fresh]])
                out_x[mid[fresh]] = mx
                out_y[mid[fresh]] = my
            # linear prediction of mid from interval ends
            t = ((xs[mid] - xs[lo])
                 / np.where(xs[hi] != xs[lo], xs[hi] - xs[lo], 1.0))
            pred_x = out_x[lo] + (out_x[hi] - out_x[lo]) * t
            pred_y = out_y[lo] + (out_y[hi] - out_y[lo]) * t
            err = np.abs(pred_x - out_x[mid]) + np.abs(pred_y - out_y[mid])
            split = (err > self.max_error) & (mid > lo) & (mid < hi)
            ok = ~split
            # interpolate accepted intervals wholesale, keeping the
            # already-exact midpoint values (the reference interpolates
            # each half against the exact midpoint)
            keep_x = out_x[mid[ok]].copy()
            keep_y = out_y[mid[ok]].copy()
            for l, h in zip(lo[ok], hi[ok]):
                if h > l + 1:
                    t2 = (xs[l + 1:h] - xs[l]) / (xs[h] - xs[l])
                    out_x[l + 1:h] = out_x[l] + (out_x[h] - out_x[l]) * t2
                    out_y[l + 1:h] = out_y[l] + (out_y[h] - out_y[l]) * t2
            out_x[mid[ok]] = keep_x
            out_y[mid[ok]] = keep_y
            lo = np.concatenate([lo[split], mid[split]])
            hi = np.concatenate([mid[split], hi[split]])
        return out_x, out_y


def approx_indexed(eval_at, n: int, max_error: float):
    """Adaptive piecewise-linear approximation of an expensive 1-D-indexed
    transform: ``eval_at(idx_array) -> (x, y)`` is evaluated exactly at
    interval endpoints + midpoints; where the midpoint's linear
    prediction is within ``max_error`` the interval interpolates, else
    it subdivides (gdaltransformer.cpp:3923's recursion as a vectorized
    interval worklist over INDEX space — the form the warp inner loop
    composes with GCP/TPS/RPC transformers)."""
    out_x = np.full(n, np.nan)
    out_y = np.full(n, np.nan)
    if n == 0:
        return out_x, out_y
    if n <= 4:
        idx = np.arange(n)
        out_x[:], out_y[:] = eval_at(idx)
        return out_x, out_y
    ends = np.array([0, n - 1], dtype=np.int64)
    out_x[ends], out_y[ends] = eval_at(ends)
    lo = np.array([0], dtype=np.int64)
    hi = np.array([n - 1], dtype=np.int64)
    while lo.size:
        mid = (lo + hi) // 2
        fresh = np.isnan(out_x[mid])
        if fresh.any():
            mx, my = eval_at(mid[fresh])
            out_x[mid[fresh]] = mx
            out_y[mid[fresh]] = my
        t = (mid - lo) / np.maximum(hi - lo, 1)
        pred_x = out_x[lo] + (out_x[hi] - out_x[lo]) * t
        pred_y = out_y[lo] + (out_y[hi] - out_y[lo]) * t
        err = np.abs(pred_x - out_x[mid]) + np.abs(pred_y - out_y[mid])
        split = (err > max_error) & (mid > lo) & (mid < hi)
        ok = ~split
        keep_x = out_x[mid[ok]].copy()
        keep_y = out_y[mid[ok]].copy()
        for a, b in zip(lo[ok], hi[ok]):
            if b > a + 1:
                t2 = np.arange(a + 1, b) - a
                out_x[a + 1:b] = out_x[a] + (out_x[b] - out_x[a]) \
                    * (t2 / (b - a))
                out_y[a + 1:b] = out_y[a] + (out_y[b] - out_y[a]) \
                    * (t2 / (b - a))
        out_x[mid[ok]] = keep_x
        out_y[mid[ok]] = keep_y
        lo = np.concatenate([lo[split], mid[split]])
        hi = np.concatenate([mid[split], hi[split]])
    return out_x, out_y
