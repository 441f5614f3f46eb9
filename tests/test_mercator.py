"""Golden tests for the GlobalMercator port (gdal2tiles.py:427-544).

The scalar reference implementations inside this file are transcribed
independently from the published formulas and evaluated with ``math`` —
the vectorized numpy kernels must agree exactly.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from georay import mercator as M


def _ref_latlon_to_meters(lat, lon):
    shift = 2 * math.pi * 6378137 / 2.0
    mx = lon * shift / 180.0
    my = math.log(math.tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
    my = my * shift / 180.0
    return mx, my


def _ref_tile(lat, lon, z, ts=256):
    mx, my = _ref_latlon_to_meters(lat, lon)
    res = (2 * math.pi * 6378137 / ts) / (2 ** z)
    px = (mx + 2 * math.pi * 6378137 / 2.0) / res
    py = (my + 2 * math.pi * 6378137 / 2.0) / res
    tx = int(math.ceil(px / float(ts)) - 1)
    ty = int(math.ceil(py / float(ts)) - 1)
    return tx, (2 ** z - 1) - ty  # XYZ flip


def test_known_tiles():
    # well-known slippy-map tiles (off-boundary points: ceil-1 == floor)
    assert tuple(np.ravel(M.latlon_to_tile_xyz(37.7749, -122.4194, 12))) == (655, 1583)
    assert tuple(np.ravel(M.latlon_to_tile_xyz(51.5074, -0.1278, 10))) == (511, 340)
    assert tuple(np.ravel(M.latlon_to_tile_xyz(-33.8688, 151.2093, 8))) == (235, 153)


def test_boundary_ceil_minus_one():
    # a point exactly on a tile boundary belongs to the tile below/left
    # (PixelsToTile = ceil(p/ts)-1, gdal2tiles.py:473-478)
    tx, ty = M.pixels_to_tile(256.0, 256.0)
    assert (tx, ty) == (0, 0)
    tx, ty = M.pixels_to_tile(256.0001, 256.0001)
    assert (tx, ty) == (1, 1)
    # lon=0 at z=1 is exactly between tiles -> west tile
    tx, ty = M.latlon_to_tile_xyz(0.0, 0.0, 1)
    assert (int(tx), int(ty)) == (0, 1)


def test_resolution_and_zoom():
    assert M.resolution(0) == pytest.approx(156543.03392804097)
    assert M.resolution(12) == pytest.approx(38.21851414258813)
    assert M.zoom_for_pixel_size(200000) == 0
    assert M.zoom_for_pixel_size(39) == 11  # res(12)=38.2 < 39 <= res(11)


@settings(max_examples=200, deadline=None)
@given(st.floats(-85.0, 85.0), st.floats(-180.0, 179.999),
       st.integers(0, 20))
def test_tile_matches_scalar_reference(lat, lon, z):
    tx, ty = M.latlon_to_tile_xyz(lat, lon, z)
    assert (int(tx), int(ty)) == _ref_tile(lat, lon, z)


@settings(max_examples=100, deadline=None)
@given(st.floats(-85.0, 85.0), st.floats(-180.0, 180.0))
def test_meters_latlon_roundtrip(lat, lon):
    mx, my = M.latlon_to_meters(lat, lon)
    lat2, lon2 = M.meters_to_latlon(mx, my)
    assert float(lat2) == pytest.approx(lat, abs=1e-9)
    assert float(lon2) == pytest.approx(lon, abs=1e-9)


def test_tile_bounds_contain_center():
    for z in (5, 12):
        tx, ty = M.meters_to_tile(*M.latlon_to_meters(48.85, 2.35), z)
        minx, miny, maxx, maxy = M.tile_bounds_meters(int(tx), int(ty), z)
        mx, my = M.latlon_to_meters(48.85, 2.35)
        assert minx <= mx <= maxx and miny <= my <= maxy
        assert maxx - minx == pytest.approx(float(M.resolution(z)) * 256)


def test_y_flip_involution():
    ty = np.array([0, 1, 5, 1000])
    z = 12
    assert np.array_equal(M.tms_to_xyz_y(M.tms_to_xyz_y(ty, z), z), ty)


def test_quadkey_known():
    # gdal2tiles QuadTree: tx=3, ty_tms=5, z=3 -> google ty=2
    # digits: z=3..1 -> mask 4,2,1: (3&4=0, 2&4=0)->0? compute reference by hand:
    # i=3: mask=4 -> tx&4=0, ty&4=0 -> '0'; i=2: mask=2 -> tx&2=2 ->1, ty&2=2 ->+2 ->'3'
    # i=1: mask=1 -> tx&1=1 ->1, ty&1=0 ->'1'  => "031"
    assert M.quadkey([3], [5], 3)[0] == "031"


def test_geo_query_window_math():
    # raster: 256x256 px at z12 tile resolution, north-up, centered on a tile
    ts = 256
    z = 12
    res = float(M.resolution(z))
    mx, my = M.latlon_to_meters(40.71, -74.0)
    tx, ty = M.meters_to_tile(mx, my, z)
    b = M.tile_bounds_meters(int(tx), int(ty), z)
    gt = (float(b[0]), res, 0.0, float(b[3]), 0.0, -res)
    # querying exactly the raster extent -> full window
    rq, wq = M.geo_query(gt, ts, ts, b[0], b[3], b[2], b[1], querysize=ts)
    assert rq == (0, 0, ts, ts)
    assert wq == (0, 0, ts, ts)
    # querying the neighbor tile east: read window clamps, write shifts
    b2 = M.tile_bounds_meters(int(tx) + 1, int(ty), z)
    rq2, wq2 = M.geo_query(gt, ts, ts, b2[0], b2[3], b2[2], b2[1], querysize=ts)
    assert rq2[2] == 0 or rq2[0] + rq2[2] <= ts


def test_tile_range_for_extent():
    minx, miny = M.latlon_to_meters(40.0, -75.0)
    maxx, maxy = M.latlon_to_meters(41.0, -73.0)
    r = M.tile_range_for_extent(float(minx), float(miny), float(maxx), float(maxy), 8)
    assert r[0] <= r[2] and r[1] <= r[3]
    n = (1 << 8) - 1
    assert all(0 <= v <= n for v in r)


def test_lcc_lambert93_known_anchor_and_roundtrip():
    """Lambert-93 (EPSG:2154): published coordinate of Paris Notre-Dame
    (RGF93≈WGS84) matches to < 0.5 m; dense roundtrip to 1e-12°."""
    import numpy as np
    from georay.mercator import lcc_forward, lcc_inverse
    p = dict(lat1=49.0, lat2=44.0, lat0=46.5, lon0=3.0,
             e0=700000.0, n0=6600000.0)
    x, y = lcc_forward(48.8566, 2.3522, **p)
    assert abs(float(x) - 652469.02) < 0.5
    assert abs(float(y) - 6862035.26) < 0.5
    rng = np.random.default_rng(0)
    lat = rng.uniform(41, 51, 500)
    lon = rng.uniform(-5, 10, 500)
    la, lo = lcc_inverse(*lcc_forward(lat, lon, **p), **p)
    assert np.abs(la - lat).max() < 1e-12
    assert np.abs(lo - lon).max() < 1e-12


def test_lcc_conformal_scale_on_standard_parallels():
    """On the standard parallels an LCC has scale factor exactly 1 (the
    defining property) — checked by finite differences along the
    meridian and the parallel against ellipsoidal arc lengths."""
    import numpy as np
    from georay.mercator import _TM_E2, _WGS84_A, lcc_forward
    p = dict(lat1=49.0, lat2=44.0, lat0=46.5, lon0=3.0)
    for lat in (49.0, 44.0):
        d = 1e-6  # degrees
        x0, y0 = lcc_forward(lat, 5.0, **p)
        x1, y1 = lcc_forward(lat, 5.0 + d, **p)
        ground = np.radians(d) * _WGS84_A * np.cos(np.radians(lat)) \
            / np.sqrt(1 - _TM_E2 * np.sin(np.radians(lat)) ** 2)
        k = float(np.hypot(x1 - x0, y1 - y0)) / ground
        assert abs(k - 1.0) < 1e-6
    # off the standard parallels the scale departs from 1
    x0, y0 = lcc_forward(55.0, 5.0, **p)
    x1, y1 = lcc_forward(55.0, 5.0 + 1e-6, **p)
    ground = np.radians(1e-6) * _WGS84_A * np.cos(np.radians(55.0)) \
        / np.sqrt(1 - _TM_E2 * np.sin(np.radians(55.0)) ** 2)
    assert abs(float(np.hypot(x1 - x0, y1 - y0)) / ground - 1.0) > 1e-3


def test_albers_equal_area_jacobian_and_roundtrip():
    """Albers (EPSG:5070 params): the projection Jacobian equals the
    ellipsoidal area element everywhere (defining property), and the
    inverse roundtrips to 1e-11°."""
    import numpy as np
    from georay.mercator import (_TM_E2, _WGS84_A, albers_forward,
                                 albers_inverse)
    p = dict(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0)
    rng = np.random.default_rng(1)
    lat = rng.uniform(25, 49, 200)
    lon = rng.uniform(-124, -66, 200)
    la, lo = albers_inverse(*albers_forward(lat, lon, **p), **p)
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(lo - lon).max() < 1e-11
    d = 1e-6
    for la0, lo0 in [(30.0, -100.0), (45.0, -80.0), (38.0, -120.0)]:
        x0, y0 = albers_forward(la0, lo0, **p)
        xe, ye = albers_forward(la0, lo0 + d, **p)
        xn, yn = albers_forward(la0 + d, lo0, **p)
        jac = abs((xe - x0) * (yn - y0) - (xn - x0) * (ye - y0))
        s = np.sin(np.radians(la0))
        # ellipsoidal area of a d×d degree cell at la0
        M = _WGS84_A * (1 - _TM_E2) / (1 - _TM_E2 * s * s) ** 1.5
        N = _WGS84_A / np.sqrt(1 - _TM_E2 * s * s)
        truth = (np.radians(d) ** 2) * M * N * np.cos(np.radians(la0))
        assert abs(jac / truth - 1.0) < 1e-4


def test_warp_lcc_to_4326():
    """gdalwarp shape EPSG:2154→EPSG:4326 through the conic dispatch —
    same discipline as the UTM warp test."""
    import numpy as np
    from georay import fixtures as fx
    from georay.mercator import conic_crs_forward, conic_crs_inverse
    from georay.raster import warp_affine_mercator
    band = fx.pattern(3, 64, 64)[:, :, 0]
    E0, N0 = conic_crs_forward("EPSG:2154", 46.0, 4.0)
    ps = 30.0
    src_gt = (float(E0), ps, 0.0, float(N0), 0.0, -ps)
    lat1, lon0 = conic_crs_inverse("EPSG:2154", E0, N0)
    lat0, lon1 = conic_crs_inverse("EPSG:2154", E0 + 64 * ps,
                                   N0 - 64 * ps)
    dst_gt = (float(lon0), (float(lon1) - float(lon0)) / 64, 0.0,
              float(lat1), 0.0, (float(lat0) - float(lat1)) / 64)
    for k in ("near", "bilinear"):
        out = warp_affine_mercator(band, src_gt, dst_gt, (64, 64),
                                   src_crs="EPSG:2154",
                                   dst_crs="EPSG:4326", kernel=k)
        assert out.shape == (64, 64)
        assert out[8:-8, 8:-8].std() > 10


def test_polar_stereographic_properties_and_roundtrip():
    """Polar stereographic B (EPSG:3413/3031/3995): scale exactly 1 on the
    standard parallel, conformal (meridian scale == parallel scale) away
    from it, pole maps to (e0,n0), grid-south along lon0 for the north
    aspect, and dense roundtrip to 1e-11 degrees."""
    import numpy as np
    from georay.mercator import (_TM_E2, _WGS84_A, conic_crs_forward,
                                 conic_crs_inverse, ps_forward, ps_inverse)
    p = dict(lat_ts=70.0, lon0=-45.0, south=False)
    # pole at origin; λ=lon0 lies on the −y axis (grid south)
    x, y = ps_forward(90.0, 12.0, **p)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    x, y = ps_forward(80.0, -45.0, **p)
    assert abs(float(x)) < 1e-6 and float(y) < 0
    # scale on the standard parallel == 1; conformality at 60N
    for lat, expect_one in [(70.0, True), (60.0, False)]:
        d = 1e-6
        x0, y0 = ps_forward(lat, 30.0, **p)
        xe, ye = ps_forward(lat, 30.0 + d, **p)
        xn, yn = ps_forward(lat + d, 30.0, **p)
        s = np.sin(np.radians(lat))
        m = np.cos(np.radians(lat)) / np.sqrt(1 - _TM_E2 * s * s)
        k_par = float(np.hypot(xe - x0, ye - y0)) / (
            np.radians(d) * _WGS84_A * m)
        M = _WGS84_A * (1 - _TM_E2) / (1 - _TM_E2 * s * s) ** 1.5
        k_mer = float(np.hypot(xn - x0, yn - y0)) / (np.radians(d) * M)
        assert abs(k_par / k_mer - 1.0) < 1e-5          # conformal
        assert (abs(k_par - 1.0) < 1e-6) == expect_one  # k(lat_ts) == 1
    rng = np.random.default_rng(5)
    lat = rng.uniform(55, 89.9, 400)
    lon = rng.uniform(-180, 180, 400)
    la, lo = ps_inverse(*ps_forward(lat, lon, **p), **p)
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(((lo - lon + 180) % 360) - 180).max() < 1e-11
    # south aspect (EPSG:3031): mirror symmetry with the north aspect and
    # roundtrip; grid-north along lon0
    ps_s = dict(lat_ts=-71.0, lon0=0.0, south=True)
    xs, ys = ps_forward(-80.0, 0.0, **ps_s)
    assert abs(float(xs)) < 1e-6 and float(ys) > 0
    xn_, yn_ = ps_forward(80.0, 0.0, lat_ts=71.0, lon0=0.0, south=False)
    xs2, ys2 = ps_forward(-80.0, 0.0, lat_ts=-71.0, lon0=0.0, south=True)
    assert float(xs2) == pytest.approx(float(xn_), abs=1e-9)
    assert float(ys2) == pytest.approx(-float(yn_), abs=1e-9)
    lat = rng.uniform(-89.9, -55, 300)
    lon = rng.uniform(-180, 180, 300)
    la, lo = ps_inverse(*ps_forward(lat, lon, **ps_s), **ps_s)
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(((lo - lon + 180) % 360) - 180).max() < 1e-11
    # named-CRS dispatch
    for crs, la0, lo0 in [("EPSG:3413", 75.0, -30.0),
                          ("EPSG:3031", -75.0, 120.0),
                          ("EPSG:3995", 78.0, 60.0)]:
        la1, lo1 = conic_crs_inverse(crs, *conic_crs_forward(crs, la0, lo0))
        assert (float(la1), float(lo1)) == pytest.approx((la0, lo0),
                                                         abs=1e-10)


def test_warp_polar_stereographic_to_4326():
    """gdalwarp shape EPSG:3413→EPSG:4326 through the dispatch (the NSIDC
    sea-ice grid case)."""
    import numpy as np
    from georay import fixtures as fx
    from georay.mercator import conic_crs_forward, conic_crs_inverse
    from georay.raster import warp_affine_mercator
    band = fx.pattern(5, 64, 64)[:, :, 0]
    E0, N0 = conic_crs_forward("EPSG:3413", 75.0, -45.0)
    ps = 100.0
    src_gt = (float(E0), ps, 0.0, float(N0), 0.0, -ps)
    lat1, lon0 = conic_crs_inverse("EPSG:3413", E0, N0)
    lat0, lon1 = conic_crs_inverse("EPSG:3413", E0 + 64 * ps, N0 - 64 * ps)
    dst_gt = (float(lon0), (float(lon1) - float(lon0)) / 64, 0.0,
              float(lat1), 0.0, (float(lat0) - float(lat1)) / 64)
    out = warp_affine_mercator(band, src_gt, dst_gt, (64, 64),
                               src_crs="EPSG:3413", dst_crs="EPSG:4326",
                               kernel="bilinear")
    assert out.shape == (64, 64)
    assert out[8:-8, 8:-8].std() > 10


def test_equal_area_families_jacobian_roundtrip_anchor():
    """LAEA (EPSG:3035), CEA (EASE-Grid 2.0, EPSG:6933) and Equal Earth
    (EPSG:8857): the projection Jacobian equals the ellipsoidal area
    element everywhere (the defining property of every member), inverses
    roundtrip to 1e-10°, and the 3035 false origin maps (52N,10E) →
    exactly (4321000, 3210000) by definition of the CRS."""
    import numpy as np
    from georay.mercator import (_TM_E2, _WGS84_A, cea_forward,
                                 cea_inverse, conic_crs_forward,
                                 eqearth_forward, eqearth_inverse,
                                 laea_forward, laea_inverse)
    x, y = conic_crs_forward("EPSG:3035", 52.0, 10.0)
    assert abs(x - 4321000.0) < 1e-6 and abs(y - 3210000.0) < 1e-6

    rng = np.random.default_rng(7)
    cases = [
        (laea_forward, laea_inverse, dict(lat0=52.0, lon0=10.0,
                                          e0=4321000.0, n0=3210000.0)),
        (cea_forward, cea_inverse, dict(lat_ts=30.0, lon0=0.0)),
        (eqearth_forward, eqearth_inverse, dict(lon0=0.0)),
    ]
    for fwd, inv, p in cases:
        lat = rng.uniform(-80, 80, 200)
        lon = rng.uniform(-170, 170, 200)
        la, lo = inv(*fwd(lat, lon, **p), **p)
        assert np.abs(la - lat).max() < 1e-10
        assert np.abs(lo - lon).max() < 1e-10
        d = 1e-6
        for la0, lo0 in [(0.0, 0.0), (45.0, 60.0), (-60.0, -120.0)]:
            x0, y0 = fwd(la0, lo0, **p)
            xe, ye = fwd(la0, lo0 + d, **p)
            xn, yn = fwd(la0 + d, lo0, **p)
            jac = abs((xe - x0) * (yn - y0) - (xn - x0) * (ye - y0))
            s = np.sin(np.radians(la0))
            M = _WGS84_A * (1 - _TM_E2) / (1 - _TM_E2 * s * s) ** 1.5
            N = _WGS84_A / np.sqrt(1 - _TM_E2 * s * s)
            truth = (np.radians(d) ** 2) * M * N * np.cos(np.radians(la0))
            assert abs(jac / truth - 1.0) < 1e-4


def test_equal_earth_shape_constants():
    """Equal Earth pins: equator maps to y=0, the map half-width at
    (0,180) is R_q·π/(M·A1) ≈ 17,243.959 km (the published aspect), the
    pole is a LINE (pseudocylindrical: x(90°,180°)/x(0°,180°) ≈ 0.40,
    cosθ_pole/dpoly ratio), and symmetry x(-λ)=-x(λ), y(-φ)=-y(φ)."""
    import numpy as np
    from georay.mercator import eqearth_forward
    x, y = eqearth_forward(0.0, 180.0, lon0=0.0)
    assert abs(y) < 1e-9
    assert abs(x - 17243959.06) < 1.0
    xp, yp = eqearth_forward(90.0, 180.0, lon0=0.0)
    assert 0.0 < xp < x and yp > 0
    x1, y1 = eqearth_forward(37.0, 55.0, lon0=0.0)
    x2, y2 = eqearth_forward(-37.0, -55.0, lon0=0.0)
    assert abs(x1 + x2) < 1e-6 and abs(y1 + y2) < 1e-6


def test_warp_laea_to_4326():
    """gdalwarp shape EPSG:3035→EPSG:4326 through the CRS dispatch —
    same discipline as the LCC/UTM warp tests."""
    from georay import fixtures as fx
    from georay.mercator import conic_crs_forward, conic_crs_inverse
    from georay.raster import warp_affine_mercator
    band = fx.pattern(3, 64, 64)[:, :, 0]
    E0, N0 = conic_crs_forward("EPSG:3035", 50.0, 8.0)
    ps = 40.0
    src_gt = (float(E0), ps, 0.0, float(N0), 0.0, -ps)
    lat1, lon0 = conic_crs_inverse("EPSG:3035", E0, N0)
    lat0, lon1 = conic_crs_inverse("EPSG:3035", E0 + 64 * ps,
                                   N0 - 64 * ps)
    dst_gt = (float(lon0), (float(lon1) - float(lon0)) / 64, 0.0,
              float(lat1), 0.0, (float(lat0) - float(lat1)) / 64)
    for k in ("near", "bilinear"):
        out = warp_affine_mercator(band, src_gt, dst_gt, (64, 64),
                                   src_crs="EPSG:3035",
                                   dst_crs="EPSG:4326", kernel=k)
        assert out.shape == (64, 64)
        assert out[8:-8, 8:-8].std() > 10


def test_conic_crs_registry_extension_roundtrips():
    """The round-3 registry rows (Australian/California/Texas Albers,
    Canada/StatsCan/Europe Lambert, south sea-ice PS): forward/inverse
    roundtrip to 1e-10 deg over each CRS's service area, and the
    projection-family invariants hold at the new parameters."""
    import numpy as np
    from georay.mercator import (_CONIC_CRS, conic_crs_forward,
                                 conic_crs_inverse)
    areas = {
        "EPSG:3577": (-44, -10, 112, 154),
        "EPSG:3112": (-44, -10, 112, 154),
        "EPSG:3978": (41, 84, -141, -52),
        "EPSG:3347": (41, 84, -141, -52),
        "EPSG:3310": (32, 42, -125, -114),
        "EPSG:3083": (25, 37, -107, -93),
        "EPSG:3034": (35, 71, -10, 31),
        "EPSG:3976": (-89, -55, -180, 180),
    }
    rng = np.random.default_rng(17)
    for crs, (la_lo, la_hi, lo_lo, lo_hi) in areas.items():
        assert crs in _CONIC_CRS
        lat = rng.uniform(la_lo, la_hi, 200)
        lon = rng.uniform(lo_lo, lo_hi, 200)
        E, N = conic_crs_forward(crs, lat, lon)
        la, lo = conic_crs_inverse(crs, E, N)
        assert np.abs(la - lat).max() < 1e-10, crs
        assert np.abs(((lo - lon + 180) % 360) - 180).max() < 1e-10, crs


def test_conic_crs_false_origin_pins():
    """Natural-origin pins: at (lat0, lon0) the projected coordinates are
    exactly the false easting/northing of the published parameter set."""
    from georay.mercator import _CONIC_CRS, conic_crs_forward
    for crs in ("EPSG:3577", "EPSG:3112", "EPSG:3978", "EPSG:3347",
                "EPSG:3310", "EPSG:3083", "EPSG:3034"):
        kind, p = _CONIC_CRS[crs]
        E, N = conic_crs_forward(crs, p["lat0"], p["lon0"])
        assert abs(float(E) - p["e0"]) < 1e-6, crs
        assert abs(float(N) - p["n0"]) < 1e-6, crs
