"""GCP polynomial / TPS / RPC transformers (alg/gdal_crs.cpp,
alg/thinplatespline.cpp, alg/gdal_rpc.cpp parity surfaces)."""

import numpy as np
import pytest

from georay.transformers import (GCPPolynomialTransformer, RPCTransformer,
                                 ThinPlateSplineTransformer,
                                 suggested_polynomial_order)


def _grid_gcps(n=5):
    rng = np.random.default_rng(7)
    px, py = np.meshgrid(np.linspace(0, 512, n), np.linspace(0, 256, n))
    px = px.ravel() + rng.normal(0, 0.01, px.size)
    py = py.ravel()
    return px, py


class TestPolynomial:
    def test_order1_recovers_affine_exactly(self):
        px, py = _grid_gcps()
        gx = 100.0 + 0.5 * px - 0.1 * py
        gy = -20.0 + 0.02 * px + 0.6 * py
        t = GCPPolynomialTransformer(px, py, gx, gy, order=1)
        qx, qy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(qx, gx, atol=1e-9)
        np.testing.assert_allclose(qy, gy, atol=1e-9)
        assert t.max_error < 1e-9

    def test_order2_fits_quadratic_exactly_and_inverts(self):
        px, py = _grid_gcps()
        gx = 10 + 0.3 * px + 0.01 * py + 1e-4 * px * py + 2e-5 * px * px
        gy = -5 + 0.4 * py + 1e-5 * py * py
        t = GCPPolynomialTransformer(px, py, gx, gy, order=2)
        qx, qy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(qx, gx, rtol=1e-9)
        np.testing.assert_allclose(qy, gy, rtol=1e-9)
        # inverse is its own LS fit (gdal_crs.cpp style): on a mildly
        # nonlinear mapping the roundtrip lands within a small pixel tol
        rx, ry = t.geo_to_pixel(qx, qy)
        assert np.abs(rx - px).max() < 0.5
        assert np.abs(ry - py).max() < 0.5

    def test_order3_terms_and_gcp_minimums(self):
        px, py = _grid_gcps()
        gx = 1 + 1e-7 * px**3
        gy = 2 + 1e-7 * py**3
        t = GCPPolynomialTransformer(px, py, gx, gy, order=3)
        qx, qy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(qx, gx, rtol=1e-8)
        np.testing.assert_allclose(qy, gy, rtol=1e-8)
        with pytest.raises(ValueError):
            GCPPolynomialTransformer([0, 1, 2], [0, 1, 2],
                                     [0, 1, 2], [0, 1, 2], order=2)

    def test_suggested_order(self):
        assert suggested_polynomial_order(3) == 1
        assert suggested_polynomial_order(6) == 2
        assert suggested_polynomial_order(10) == 3
        with pytest.raises(ValueError):
            suggested_polynomial_order(2)


class TestTPS:
    def test_exact_interpolation_at_gcps(self):
        rng = np.random.default_rng(11)
        px = rng.uniform(0, 512, 25)
        py = rng.uniform(0, 256, 25)
        gx = 2.0 + 0.01 * px + np.sin(px / 80.0)
        gy = 48.0 + 0.01 * py + np.cos(py / 50.0)
        t = ThinPlateSplineTransformer(px, py, gx, gy)
        qx, qy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(qx, gx, atol=1e-8)
        np.testing.assert_allclose(qy, gy, atol=1e-8)

    def test_affine_gcps_reproduce_affine_everywhere(self):
        # with GCPs on an exact affine, the TPS affine part carries it and
        # the kernel weights vanish — test points OFF the GCPs are exact
        px, py = _grid_gcps(4)
        gx = 7.0 + 0.25 * px + 0.05 * py
        gy = -3.0 - 0.02 * px + 0.5 * py
        t = ThinPlateSplineTransformer(px, py, gx, gy)
        tx = np.array([13.7, 400.1, 255.5])
        ty = np.array([9.9, 100.0, 201.25])
        qx, qy = t.pixel_to_geo(tx, ty)
        np.testing.assert_allclose(qx, 7.0 + 0.25 * tx + 0.05 * ty,
                                   atol=1e-6)
        np.testing.assert_allclose(qy, -3.0 - 0.02 * tx + 0.5 * ty,
                                   atol=1e-6)

    def test_roundtrip_smooth_warp(self):
        rng = np.random.default_rng(3)
        px = rng.uniform(0, 512, 36)
        py = rng.uniform(0, 512, 36)
        gx = px + 5 * np.sin(py / 100)
        gy = py + 5 * np.cos(px / 100)
        t = ThinPlateSplineTransformer(px, py, gx, gy)
        qx, qy = t.pixel_to_geo(px, py)
        rx, ry = t.geo_to_pixel(qx, qy)
        assert np.abs(rx - px).max() < 0.2
        assert np.abs(ry - py).max() < 0.2

    def test_2d_grid_shapes(self):
        px, py = _grid_gcps(4)
        t = ThinPlateSplineTransformer(px, py, px * 0.5, py * 0.5)
        X, Y = np.meshgrid(np.arange(8.0), np.arange(6.0))
        qx, qy = t.pixel_to_geo(X, Y)
        assert qx.shape == (6, 8) and qy.shape == (6, 8)
        np.testing.assert_allclose(qx, X * 0.5, atol=1e-6)


def _affine_rpc():
    """Degenerate RPC encoding pixel = affine(lon, lat): numerators are
    linear, denominators 1 — closed-form ground truth."""
    ln = np.zeros(20); sn = np.zeros(20)
    ld = np.zeros(20); sd = np.zeros(20)
    ld[0] = sd[0] = 1.0
    # line = 0.2 + 0.9*P - 0.1*L (normalized); samp = -0.1 + 0.8*L + 0.05*P
    ln[0], ln[2], ln[1] = 0.2, 0.9, -0.1
    sn[0], sn[1], sn[2] = -0.1, 0.8, 0.05
    return RPCTransformer(
        line_num=ln, line_den=ld, samp_num=sn, samp_den=sd,
        lat_off=45.0, lat_scale=1.0, long_off=7.0, long_scale=1.5,
        height_off=500.0, height_scale=100.0,
        line_off=2048.0, line_scale=2048.0,
        samp_off=2048.0, samp_scale=2048.0)


class TestRPC:
    def test_forward_matches_closed_form(self):
        t = _affine_rpc()
        lon = np.array([7.0, 7.3, 6.8])
        lat = np.array([45.0, 45.2, 44.9])
        sx, sy = t.geo_to_pixel(lon, lat)
        L = (lon - 7.0) / 1.5
        P = (lat - 45.0) / 1.0
        np.testing.assert_allclose(
            sy, (0.2 + 0.9 * P - 0.1 * L) * 2048 + 2048, rtol=1e-12)
        np.testing.assert_allclose(
            sx, (-0.1 + 0.8 * L + 0.05 * P) * 2048 + 2048, rtol=1e-12)

    def test_inverse_roundtrip(self):
        t = _affine_rpc()
        rng = np.random.default_rng(5)
        lon = 7.0 + rng.uniform(-0.7, 0.7, 50)
        lat = 45.0 + rng.uniform(-0.5, 0.5, 50)
        sx, sy = t.geo_to_pixel(lon, lat)
        rlon, rlat = t.pixel_to_geo(sx, sy)
        assert np.abs(rlon - lon).max() < 1e-8
        assert np.abs(rlat - lat).max() < 1e-8

    def test_inverse_with_rational_terms(self):
        # nontrivial denominator + quadratic numerator terms
        t = _affine_rpc()
        t.ln[7] = 0.03       # L² term
        t.ld[1] = 0.05       # denominator varies with L
        t.sn[8] = -0.02      # P² term
        lon = np.array([6.6, 7.0, 7.4])
        lat = np.array([44.7, 45.1, 45.4])
        sx, sy = t.geo_to_pixel(lon, lat)
        rlon, rlat = t.pixel_to_geo(sx, sy)
        assert np.abs(rlon - lon).max() < 1e-7
        assert np.abs(rlat - lat).max() < 1e-7

    def test_bad_coeff_length(self):
        with pytest.raises(ValueError):
            RPCTransformer(
                line_num=np.zeros(19), line_den=np.zeros(20),
                samp_num=np.zeros(20), samp_den=np.zeros(20),
                lat_off=0, lat_scale=1, long_off=0, long_scale=1,
                height_off=0, height_scale=1, line_off=0, line_scale=1,
                samp_off=0, samp_scale=1)


class TestWarpIntegration:
    def test_warp_with_gcp_transformer_matches_affine_path(self):
        """GCPs sampled from the src affine ⇒ the order-1 transformer
        reproduces the geotransform (to lstsq round-off, ~1e-12 of a
        pixel — enough to flip `near` ties, so compare bilinear)."""
        from georay.raster import warp_affine_mercator
        rng = np.random.default_rng(9)
        src = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        src_gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)   # EPSG:4326
        dst_gt = (10.05, 0.008, 0.0, 49.95, 0.0, -0.008)
        shape = (48, 48)
        base = warp_affine_mercator(src, src_gt, dst_gt, shape,
                                    src_crs="EPSG:4326",
                                    dst_crs="EPSG:4326", kernel="bilinear")
        px, py = np.meshgrid(np.linspace(0, 64, 4), np.linspace(0, 64, 4))
        px, py = px.ravel(), py.ravel()
        gx = src_gt[0] + px * src_gt[1]
        gy = src_gt[3] + py * src_gt[5]
        t = GCPPolynomialTransformer(px, py, gx, gy, order=1)
        via_gcp = warp_affine_mercator(src, None, dst_gt, shape,
                                       src_crs="EPSG:4326",
                                       dst_crs="EPSG:4326",
                                       kernel="bilinear",
                                       src_transformer=t)
        np.testing.assert_allclose(via_gcp.astype(float),
                                   base.astype(float), atol=1.0)

    def test_warp_with_tps_transformer_matches_affine_path(self):
        from georay.raster import warp_affine_mercator
        rng = np.random.default_rng(13)
        src = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        src_gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)
        dst_gt = (10.1, 0.009, 0.0, 49.9, 0.0, -0.009)
        shape = (40, 40)
        base = warp_affine_mercator(src, src_gt, dst_gt, shape,
                                    src_crs="EPSG:4326",
                                    dst_crs="EPSG:4326", kernel="bilinear")
        px, py = np.meshgrid(np.linspace(0, 64, 5), np.linspace(0, 64, 5))
        px, py = px.ravel(), py.ravel()
        gx = src_gt[0] + px * src_gt[1]
        gy = src_gt[3] + py * src_gt[5]
        t = ThinPlateSplineTransformer(px, py, gx, gy)
        via = warp_affine_mercator(src, None, dst_gt, shape,
                                   src_crs="EPSG:4326",
                                   dst_crs="EPSG:4326", kernel="bilinear",
                                   src_transformer=t)
        np.testing.assert_allclose(via.astype(float), base.astype(float),
                                   atol=1.0)


# ---------------------------------------------------------------------------
# Geolocation-array transformer (alg/gdalgeoloc.cpp)
# ---------------------------------------------------------------------------

def _geoloc_from_tmerc(h=40, w=50):
    """Geoloc arrays generated from a smooth real mapping (UTM 31N inverse:
    pixel grid in projected meters -> lon/lat nodes)."""
    from georay.mercator import tmerc_inverse
    cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
    E = 400000.0 + cols * 500.0
    N = 5600000.0 - rows * 500.0
    lon, lat = tmerc_inverse(E.ravel(), N.ravel(), lon0=3.0)
    return lon.reshape(h, w), lat.reshape(h, w)


def test_geoloc_forward_matches_nodes_and_bilinear():
    from georay.transformers import GeolocArrayTransformer
    gx, gy = _geoloc_from_tmerc()
    t = GeolocArrayTransformer(gx, gy)
    # exact at the nodes
    px = np.array([0.0, 10.0, 49.0])
    py = np.array([0.0, 7.0, 39.0])
    lon, lat = t.pixel_to_geo(px, py)
    np.testing.assert_allclose(lon, gx[py.astype(int), px.astype(int)],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(lat, gy[py.astype(int), px.astype(int)],
                               rtol=0, atol=1e-12)
    # halfway between two nodes == average (bilinear on the grid line)
    lon_h, lat_h = t.pixel_to_geo(np.array([10.5]), np.array([7.0]))
    assert abs(lon_h[0] - (gx[7, 10] + gx[7, 11]) / 2) < 1e-14


def test_geoloc_inverse_roundtrip():
    from georay.transformers import GeolocArrayTransformer
    gx, gy = _geoloc_from_tmerc()
    t = GeolocArrayTransformer(gx, gy)
    rng = np.random.default_rng(5)
    px = rng.uniform(1, 48, 200)
    py = rng.uniform(1, 38, 200)
    lon, lat = t.pixel_to_geo(px, py)
    bx, by = t.geo_to_pixel(lon, lat)
    np.testing.assert_allclose(bx, px, atol=1e-6)
    np.testing.assert_allclose(by, py, atol=1e-6)


def test_geoloc_offset_step_convention():
    from georay.transformers import GeolocArrayTransformer
    gx, gy = _geoloc_from_tmerc(20, 20)
    # geoloc array subsampled 2x with half-pixel offset
    t = GeolocArrayTransformer(gx, gy, pixel_offset=0.5, line_offset=0.5,
                               pixel_step=2.0, line_step=2.0)
    lon, lat = t.pixel_to_geo(np.array([0.5]), np.array([0.5]))
    assert abs(lon[0] - gx[0, 0]) < 1e-14 and abs(lat[0] - gy[0, 0]) < 1e-14
    lon2, lat2 = t.pixel_to_geo(np.array([4.5]), np.array([2.5]))
    assert abs(lon2[0] - gx[1, 2]) < 1e-14


# ---------------------------------------------------------------------------
# Approx transformer (gdaltransformer.cpp:3923)
# ---------------------------------------------------------------------------

def test_approx_transformer_error_bound_and_savings():
    from georay.transformers import ApproxTransformer
    from georay.mercator import latlon_to_meters

    calls = {"n": 0}

    def base(x, y):
        # scanline coordinate drives LATITUDE -> merc y is strongly
        # nonlinear in x, so the subdivision actually has to work
        calls["n"] += int(np.asarray(x).size)
        mx, my = latlon_to_meters(np.asarray(x), np.asarray(y))
        return mx, my

    n = 2049
    ap = ApproxTransformer(base, max_error=50.0)  # meters
    ax, ay = ap.transform_scanline(0.0, 70.0, 45.0, n)
    ex, ey = latlon_to_meters(np.linspace(0, 70, n), np.full(n, 45.0))
    err = np.abs(ax - ex) + np.abs(ay - ey)
    assert err.max() <= 50.0 + 1e-9
    # the whole point: far fewer exact evaluations than points
    assert calls["n"] < n // 4


def test_approx_transformer_exact_when_linear():
    from georay.transformers import ApproxTransformer

    def affine(x, y):
        return 2.0 * x + 1.0, np.asarray(y) * 3.0

    ap = ApproxTransformer(affine, max_error=1e-9)
    ax, ay = ap.transform_scanline(0.0, 100.0, 5.0, 257)
    np.testing.assert_allclose(ax, 2.0 * np.linspace(0, 100, 257) + 1.0,
                               atol=1e-9)
    np.testing.assert_allclose(ay, 15.0, atol=1e-12)


def test_warp_with_geoloc_transformer_matches_affine_path():
    """A geolocation array that ENCODES an affine mapping must reproduce
    the affine warp (alg/gdalgeoloc.cpp plug-in parity, same discipline
    as the GCP/TPS warp tests)."""
    from georay.raster import warp_affine_mercator
    from georay.transformers import GeolocArrayTransformer
    rng = np.random.default_rng(21)
    src = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    src_gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)
    dst_gt = (10.05, 0.008, 0.0, 49.95, 0.0, -0.008)
    shape = (48, 48)
    base = warp_affine_mercator(src, src_gt, dst_gt, shape,
                                src_crs="EPSG:4326",
                                dst_crs="EPSG:4326", kernel="bilinear")
    # geoloc nodes every 4 pixels covering the source grid
    cols, rows = np.meshgrid(np.arange(0, 68, 4, dtype=np.float64),
                             np.arange(0, 68, 4, dtype=np.float64))
    gx = src_gt[0] + cols * src_gt[1]
    gy = src_gt[3] + rows * src_gt[5]
    t = GeolocArrayTransformer(gx, gy, pixel_step=4.0, line_step=4.0)
    via = warp_affine_mercator(src, None, dst_gt, shape,
                               src_crs="EPSG:4326", dst_crs="EPSG:4326",
                               kernel="bilinear", src_transformer=t)
    np.testing.assert_allclose(via.astype(float), base.astype(float),
                               atol=1.0)


def test_warp_with_approx_transformer_scanlines():
    """approx_error in the warp: TPS warp matches the exact path within
    the error budget while evaluating the transformer far fewer times
    (gdaltransformer.cpp:3839 composition)."""
    from georay.raster import warp_affine_mercator
    rng = np.random.default_rng(5)
    src = rng.integers(0, 255, (96, 96), dtype=np.uint8)
    src_gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)
    dst_gt = (10.05, 0.008, 0.0, 49.95, 0.0, -0.008)
    shape = (80, 80)
    px, py = np.meshgrid(np.linspace(0, 96, 5), np.linspace(0, 96, 5))
    px, py = px.ravel(), py.ravel()
    gx = src_gt[0] + px * src_gt[1]
    gy = src_gt[3] + py * src_gt[5]
    t = ThinPlateSplineTransformer(px, py, gx, gy)

    calls = {"n": 0}

    class Counting:
        def geo_to_pixel(self, x, y):
            calls["n"] += int(np.asarray(x).size)
            return t.geo_to_pixel(x, y)

    exact = warp_affine_mercator(src, None, dst_gt, shape,
                                 src_crs="EPSG:4326", dst_crs="EPSG:4326",
                                 kernel="bilinear", src_transformer=t)
    approx = warp_affine_mercator(src, None, dst_gt, shape,
                                  src_crs="EPSG:4326",
                                  dst_crs="EPSG:4326", kernel="bilinear",
                                  src_transformer=Counting(),
                                  approx_error=0.05)
    # 0.05-px source deviation -> at most a small pixel-value delta on
    # smooth bilinear sampling; allow a generous band
    diff = np.abs(exact.astype(float) - approx.astype(float))
    assert np.quantile(diff, 0.99) <= 8.0
    assert (diff <= 32).all()
    # the point: far fewer exact evaluations than output pixels
    assert calls["n"] < shape[0] * shape[1] // 4
