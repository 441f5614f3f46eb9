"""Non-WGS84 datum machinery (georay/datum.py): parameterized
ellipsoids, ECEF, Helmert, OSGB36 / ED50 projected CRS.

Anchors are published constants: the Ordnance Survey worked example
from "A guide to coordinate systems in Great Britain" (OSGB36 geodetic
→ National Grid), and the OS national Helmert set (±5 m class — the
engine's documented accuracy for EPSG:27700, vs OSTN15 which needs a
grid file)."""

import numpy as np

from georay.datum import (AIRY_1830, INTL_1924, WGS84, datum_crs_forward,
                          datum_crs_inverse, datum_shift_to_wgs84,
                          ecef_to_geodetic, geodetic_to_ecef,
                          helmert_apply, helmert_invert, tmerc_forward_e,
                          tmerc_inverse_e)
from georay.datum import _OSGB36_TO_WGS84

_BNG = dict(lat0=49.0, lon0=-2.0, k0=0.9996012717,
            e0=400000.0, n0=-100000.0)


def test_osgb36_worked_example_anchor():
    """OS guide worked example: OSGB36 (52°39'27.2531"N, 1°43'4.5177"E)
    → E 651409.903, N 313177.270 (Airy tmerc, natural origin 49N 2W)."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    E, N = tmerc_forward_e(lat, lon, ell=AIRY_1830, **_BNG)
    assert abs(E - 651409.903) < 1e-3
    assert abs(N - 313177.270) < 1e-3
    la, lo = tmerc_inverse_e(E, N, ell=AIRY_1830, **_BNG)
    assert abs(la - lat) < 1e-12 and abs(lo - lon) < 1e-12


def test_tmerc_wgs84_matches_mercator_fast_path():
    """The parameterized series with WGS84 constants must agree with the
    engine's existing UTM fast path to the nm."""
    from georay.mercator import tmerc_forward
    rng = np.random.default_rng(5)
    lat = rng.uniform(-80, 80, 200)
    lon = rng.uniform(-6, 6, 200) + 3.0
    e1, n1 = tmerc_forward(lat, lon, 3.0)
    e2, n2 = tmerc_forward_e(lat, lon, ell=WGS84, lat0=0.0, lon0=3.0,
                             k0=0.9996, e0=500000.0, n0=0.0)
    assert np.abs(e1 - e2).max() < 1e-6
    assert np.abs(n1 - n2).max() < 1e-6


def test_ecef_helmert_roundtrips():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-85, 85, 300)
    lon = rng.uniform(-179, 179, 300)
    h = rng.uniform(-100, 5000, 300)
    for ell in (WGS84, AIRY_1830, INTL_1924):
        la, lo, hh = ecef_to_geodetic(
            *geodetic_to_ecef(lat, lon, h, ell), ell)
        assert np.abs(la - lat).max() < 1e-11
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(hh - h).max() < 1e-6
    x, y, z = geodetic_to_ecef(lat, lon, 0.0)
    xx, yy, zz = helmert_invert(
        *helmert_apply(x, y, z, _OSGB36_TO_WGS84), _OSGB36_TO_WGS84)
    assert max(np.abs(xx - x).max(), np.abs(yy - y).max(),
               np.abs(zz - z).max()) < 1e-6


def test_osgb36_datum_shift_magnitude():
    """OSGB36→WGS84 over London is a ~120 m horizontal shift (published
    order of magnitude; the WGS84-equivalent approximation this module
    removes was that many meters wrong)."""
    la, lo = datum_shift_to_wgs84(51.5, -0.1, AIRY_1830, _OSGB36_TO_WGS84)
    d = np.hypot((la - 51.5) * 111320.0,
                 (lo + 0.1) * 111320.0 * np.cos(np.radians(51.5)))
    assert 100.0 < d < 150.0


def test_datum_crs_wgs84_roundtrips():
    """1e-7 deg (~1 cm) — the residual of the engine's h=0 2-D
    convention (ellipsoidal height is discarded across the shift)."""
    rng = np.random.default_rng(9)
    lat = rng.uniform(50.0, 58.0, 100)
    lon = rng.uniform(-6.0, 1.5, 100)
    la, lo = datum_crs_inverse("EPSG:27700",
                               *datum_crs_forward("EPSG:27700", lat, lon))
    assert np.abs(la - lat).max() < 1e-7
    assert np.abs(lo - lon).max() < 1e-7
    lat = rng.uniform(40.0, 52.0, 100)
    lon = rng.uniform(0.0, 6.0, 100)
    la, lo = datum_crs_inverse("EPSG:23031",
                               *datum_crs_forward("EPSG:23031", lat, lon))
    assert np.abs(la - lat).max() < 1e-7
    assert np.abs(lo - lon).max() < 1e-7


def test_tmerc_airy_conformality():
    """tmerc is conformal on ITS ellipsoid: the forward Jacobian of the
    projection (datum geodetic → grid) is a scaled rotation."""
    d = 1e-6
    for la0, lo0 in [(51.0, -1.0), (55.5, -4.0), (50.1, 0.5)]:
        x0, y0 = tmerc_forward_e(la0, lo0, ell=AIRY_1830, **_BNG)
        xe, ye = tmerc_forward_e(la0, lo0 + d, ell=AIRY_1830, **_BNG)
        xn, yn = tmerc_forward_e(la0 + d, lo0, ell=AIRY_1830, **_BNG)
        # columns of J, normalized by metric factors M and N·cosφ
        s = np.sin(np.radians(la0))
        one = 1.0 - AIRY_1830.e2 * s * s
        M = AIRY_1830.a * (1 - AIRY_1830.e2) / one ** 1.5
        Nc = AIRY_1830.a / np.sqrt(one) * np.cos(np.radians(la0))
        ex, ey = (xe - x0) / (np.radians(d) * Nc), \
            (ye - y0) / (np.radians(d) * Nc)
        nx, ny = (xn - x0) / (np.radians(d) * M), \
            (yn - y0) / (np.radians(d) * M)
        # scaled rotation: equal norms, orthogonal, positive orientation
        assert abs(np.hypot(ex, ey) / np.hypot(nx, ny) - 1.0) < 1e-5
        assert abs(ex * nx + ey * ny) / (np.hypot(ex, ey) ** 2) < 1e-5
        assert ex * ny - ey * nx > 0


def test_warp_bng_to_4326():
    """gdalwarp shape EPSG:27700→EPSG:4326 through the CRS dispatch —
    exercises the full Helmert + Airy tmerc path per pixel."""
    from georay import fixtures as fx
    from georay.raster import (_crs_to_latlon, _latlon_to_crs,
                               warp_affine_mercator)
    band = fx.pattern(3, 64, 64)[:, :, 0]
    E0, N0 = _latlon_to_crs("EPSG:27700", 51.6, -0.3)
    ps = 50.0
    src_gt = (float(E0), ps, 0.0, float(N0), 0.0, -ps)
    lat1, lon0 = _crs_to_latlon("EPSG:27700", E0, N0)
    lat0, lon1 = _crs_to_latlon("EPSG:27700", E0 + 64 * ps, N0 - 64 * ps)
    dst_gt = (float(lon0), (float(lon1) - float(lon0)) / 64, 0.0,
              float(lat1), 0.0, (float(lat0) - float(lat1)) / 64)
    out = warp_affine_mercator(band, src_gt, dst_gt, (64, 64),
                               src_crs="EPSG:27700",
                               dst_crs="EPSG:4326", kernel="bilinear")
    assert out.shape == (64, 64)
    assert out[8:-8, 8:-8].std() > 10
