"""Web-Mercator / XYZ-tile math — vectorized numpy port of the GlobalMercator
formulas used by GDAL's ``gdal2tiles`` (reference: swig/python/gdal-utils/
osgeo_utils/gdal2tiles.py:427-544), plus the geo_query window math
(gdal2tiles.py:2995-3037) and zoom selection (gdal2tiles.py:2472-2486).

These formulas are the single source of truth for every tile (z, x, y)
assignment the engine produces; they must match the reference *bit for bit*
(SURVEY.md §7.4).  Everything here is pure math over numpy arrays — no Ray,
no state — so it runs inside ``map_batches`` bodies unchanged.

Conventions
-----------
* "meters" = EPSG:3857 coordinates.
* TMS tile rows grow *north* (gdal2tiles internal convention); XYZ (slippy
  map / Google) rows grow *south*.  Flip with :func:`tms_to_xyz_y`
  (reference: gdal2tiles.py:4431-4443 ``getYTile``, 524-528 ``GoogleTile``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "EARTH_RADIUS",
    "ORIGIN_SHIFT",
    "TILE_SIZE",
    "MAX_ZOOM",
    "resolution",
    "zoom_for_pixel_size",
    "latlon_to_meters",
    "meters_to_latlon",
    "meters_to_pixels",
    "pixels_to_meters",
    "pixels_to_tile",
    "meters_to_tile",
    "latlon_to_tile_xyz",
    "tile_bounds_meters",
    "tile_bounds_latlon",
    "tms_to_xyz_y",
    "xyz_to_tms_y",
    "quadkey",
    "geo_query",
    "tile_range_for_extent",
]

EARTH_RADIUS = 6378137.0
# gdal2tiles.py:433  self.originShift = 2 * math.pi * 6378137 / 2.0
ORIGIN_SHIFT = 2.0 * np.pi * EARTH_RADIUS / 2.0  # 20037508.342789244
TILE_SIZE = 256
# gdal2tiles.py:325  MAXZOOMLEVEL = 32
MAX_ZOOM = 32


def _initial_resolution(tile_size: int = TILE_SIZE) -> float:
    # gdal2tiles.py:431  self.initialResolution = 2*pi*6378137/tile_size
    return 2.0 * np.pi * EARTH_RADIUS / tile_size


def resolution(zoom, tile_size: int = TILE_SIZE):
    """Meters per pixel at ``zoom`` (gdal2tiles.py:446-449 ``Resolution``)."""
    zoom = np.asarray(zoom)
    return _initial_resolution(tile_size) / (2.0 ** zoom)


def zoom_for_pixel_size(pixel_size: float, tile_size: int = TILE_SIZE) -> int:
    """Maximal zoom whose resolution is still >= ``pixel_size``
    (gdal2tiles.py:451-457 ``ZoomForPixelSize``: first ``i`` with
    ``pixel_size > Resolution(i)`` returns ``max(0, i-1)``; else MAXZOOM-1).
    """
    for i in range(MAX_ZOOM):
        if pixel_size > _initial_resolution(tile_size) / (2.0 ** i):
            return max(0, i - 1)
    return MAX_ZOOM - 1


def latlon_to_meters(lat, lon):
    """EPSG:4326 → EPSG:3857 (gdal2tiles.py:435-442 ``LatLonToMeters``).

    Returns ``(mx, my)``.  Vectorized; inputs broadcast.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_latlon(mx, my):
    """EPSG:3857 → EPSG:4326 (gdal2tiles.py:444-? ``MetersToLatLon``)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx / ORIGIN_SHIFT) * 180.0
    lat = (my / ORIGIN_SHIFT) * 180.0
    lat = 180.0 / np.pi * (
        2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0
    )
    return lat, lon


def meters_to_pixels(mx, my, zoom, tile_size: int = TILE_SIZE):
    """EPSG:3857 → global pixel coords at ``zoom``
    (gdal2tiles.py:465-471 ``MetersToPixels``)."""
    res = resolution(zoom, tile_size)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    return px, py


def pixels_to_meters(px, py, zoom, tile_size: int = TILE_SIZE):
    """Global pixel coords at ``zoom`` → EPSG:3857 (gdal2tiles.py ``PixelsToMeters``)."""
    res = resolution(zoom, tile_size)
    mx = np.asarray(px, dtype=np.float64) * res - ORIGIN_SHIFT
    my = np.asarray(py, dtype=np.float64) * res - ORIGIN_SHIFT
    return mx, my


def pixels_to_tile(px, py, tile_size: int = TILE_SIZE):
    """Pixel coords → TMS tile indices (gdal2tiles.py:473-478 ``PixelsToTile``):
    ``t = int(ceil(p / tile_size) - 1)``.  The ``ceil - 1`` edge behavior at
    exact tile boundaries is load-bearing (SURVEY.md §7.4) — a point exactly
    on a boundary belongs to the tile *below/left* of it.
    """
    tx = np.ceil(np.asarray(px, dtype=np.float64) / float(tile_size)) - 1
    ty = np.ceil(np.asarray(py, dtype=np.float64) / float(tile_size)) - 1
    return tx.astype(np.int64), ty.astype(np.int64)


def meters_to_tile(mx, my, zoom, tile_size: int = TILE_SIZE):
    """EPSG:3857 → TMS tile (gdal2tiles.py:480-484 ``MetersToTile``)."""
    px, py = meters_to_pixels(mx, my, zoom, tile_size)
    return pixels_to_tile(px, py, tile_size)


def tms_to_xyz_y(ty_tms, zoom):
    """TMS row → XYZ/Google row: ``y = 2**z - 1 - ty``
    (gdal2tiles.py:524-528 ``GoogleTile``; 4431-4443 ``getYTile``)."""
    ty_tms = np.asarray(ty_tms, dtype=np.int64)
    zoom = np.asarray(zoom, dtype=np.int64)
    return (np.int64(1) << zoom) - 1 - ty_tms


# the flip is an involution
xyz_to_tms_y = tms_to_xyz_y


def latlon_to_tile_xyz(lat, lon, zoom, tile_size: int = TILE_SIZE):
    """lat/lon → XYZ (slippy) tile indices at ``zoom``: the composition
    LatLonToMeters → MetersToPixels → PixelsToTile → y-flip used throughout
    gdal2tiles.  Returns ``(tx, ty_xyz)`` int64 arrays.
    """
    mx, my = latlon_to_meters(lat, lon)
    tx, ty = meters_to_tile(mx, my, zoom, tile_size)
    return tx, tms_to_xyz_y(ty, zoom)


def tile_bounds_meters(tx, ty_tms, zoom, tile_size: int = TILE_SIZE):
    """EPSG:3857 bounds of a TMS tile (gdal2tiles.py:492-499 ``TileBounds``).

    Returns ``(minx, miny, maxx, maxy)``.
    """
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty_tms, dtype=np.float64)
    minx, miny = pixels_to_meters(tx * tile_size, ty * tile_size, zoom, tile_size)
    maxx, maxy = pixels_to_meters((tx + 1) * tile_size, (ty + 1) * tile_size,
                                  zoom, tile_size)
    return minx, miny, maxx, maxy


def tile_bounds_latlon(tx, ty_tms, zoom, tile_size: int = TILE_SIZE):
    """lat/lon bounds of a TMS tile (gdal2tiles.py:501-509 ``TileLatLonBounds``)."""
    minx, miny, maxx, maxy = tile_bounds_meters(tx, ty_tms, zoom, tile_size)
    minlat, minlon = meters_to_latlon(minx, miny)
    maxlat, maxlon = meters_to_latlon(maxx, maxy)
    return minlat, minlon, maxlat, maxlon


def quadkey(tx, ty_tms, zoom):
    """Microsoft quadkey of a TMS tile (gdal2tiles.py:530-544 ``QuadTree``):
    flips to XYZ row internally then emits one base-4 digit per level.
    Vectorized; returns an object array of strings.
    """
    tx = np.atleast_1d(np.asarray(tx, dtype=np.int64))
    ty = np.atleast_1d(np.asarray(ty_tms, dtype=np.int64))
    ty_g = (np.int64(1) << zoom) - 1 - ty  # gdal2tiles.py:535
    digits = np.zeros((zoom, tx.shape[0]), dtype=np.int64)
    for idx, i in enumerate(range(zoom, 0, -1)):
        mask = np.int64(1) << (i - 1)
        digit = ((tx & mask) != 0).astype(np.int64)
        digit += 2 * ((ty_g & mask) != 0).astype(np.int64)
        digits[idx] = digit
    return np.array(["".join(str(d) for d in digits[:, j]) for j in range(tx.shape[0])],
                    dtype=object)


def geo_query(gt, raster_x_size, raster_y_size, ulx, uly, lrx, lry,
              querysize: int = 0):
    """Raster read/write window for a georeferenced bbox — exact port of
    ``GDAL2Tiles.geo_query`` (gdal2tiles.py:2995-3037) including its
    ``+0.001`` / ``+0.5`` rounding and the out-of-raster clamping that
    shifts the write window.

    Parameters: ``gt`` = 6-float affine geotransform; bbox in the raster's
    georeferenced space (for us: EPSG:3857 meters).

    Returns ``(rx, ry, rxsize, rysize), (wx, wy, wxsize, wysize)``: the
    source read window and the destination write window.
    """
    rx = int((ulx - gt[0]) / gt[1] + 0.001)
    ry = int((uly - gt[3]) / gt[5] + 0.001)
    rxsize = max(1, int((lrx - ulx) / gt[1] + 0.5))
    rysize = max(1, int((lry - uly) / gt[5] + 0.5))

    if not querysize:
        wxsize, wysize = rxsize, rysize
    else:
        wxsize, wysize = querysize, querysize

    wx = 0
    if rx < 0:
        rxshift = abs(rx)
        wx = int(wxsize * (float(rxshift) / rxsize))
        wxsize = wxsize - wx
        rxsize = rxsize - int(rxsize * (float(rxshift) / rxsize))
        rx = 0
    if rx + rxsize > raster_x_size:
        wxsize = int(wxsize * (float(raster_x_size - rx) / rxsize))
        rxsize = raster_x_size - rx

    wy = 0
    if ry < 0:
        ryshift = abs(ry)
        wy = int(wysize * (float(ryshift) / rysize))
        wysize = wysize - wy
        rysize = rysize - int(rysize * (float(ryshift) / rysize))
        ry = 0
    if ry + rysize > raster_y_size:
        wysize = int(wysize * (float(raster_y_size - ry) / rysize))
        rysize = raster_y_size - ry

    return (rx, ry, rxsize, rysize), (wx, wy, wxsize, wysize)


def tile_range_for_extent(minx, miny, maxx, maxy, zoom,
                          tile_size: int = TILE_SIZE):
    """TMS tile index range covering an EPSG:3857 extent at ``zoom`` —
    gdal2tiles.py:2460-2467: ``tminx,tminy = MetersToTile(ominx, ominy)``,
    ``tmaxx,tmaxy = MetersToTile(omaxx, omaxy)``, then crop to the world
    (``0 .. 2**z - 1``).

    Returns ``(tminx, tminy, tmaxx, tmaxy)`` as ints.
    """
    tminx, tminy = meters_to_tile(minx, miny, zoom, tile_size)
    tmaxx, tmaxy = meters_to_tile(maxx, maxy, zoom, tile_size)
    n = (1 << zoom) - 1
    tminx = int(np.clip(tminx, 0, n))
    tminy = int(np.clip(tminy, 0, n))
    tmaxx = int(np.clip(tmaxx, 0, n))
    tmaxy = int(np.clip(tmaxy, 0, n))
    return tminx, tminy, tmaxx, tmaxy


# ---------------------------------------------------------------------------
# Transverse Mercator / UTM (Krüger–Karney series, public formulas; the
# reference's general path is PROJ via ogr/ogrct.cpp:2266 — its own
# headline warp bench is EPSG:32631→4326, autotest/benchmark/
# test_gdalwarp.py:26)
# ---------------------------------------------------------------------------

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_TM_N = _WGS84_F / (2.0 - _WGS84_F)
_TM_E2 = _WGS84_F * (2.0 - _WGS84_F)
_TM_E = np.sqrt(_TM_E2)
_n = _TM_N
# rectifying radius and the 6th-order alpha/beta series in n
_TM_A = _WGS84_A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
    + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])


def tmerc_forward(lat, lon, lon0: float, k0: float = 0.9996,
                  e0: float = 500000.0, n0: float = 0.0):
    """Transverse Mercator forward (lat/lon degrees → easting/northing),
    Krüger series, ~nm accuracy (Karney 2011, public)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _TM_E * np.arctanh(_TM_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7, dtype=np.float64)
    xi = xi_p + (_ALPHA[None, :] * np.sin(2 * j[None, :] * xi_p[..., None])
                 * np.cosh(2 * j[None, :] * eta_p[..., None])).sum(axis=-1) \
        if np.ndim(xi_p) else xi_p + float(
            (_ALPHA * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)).sum())
    eta = eta_p + (_ALPHA[None, :] * np.cos(2 * j[None, :] * xi_p[..., None])
                   * np.sinh(2 * j[None, :] * eta_p[..., None])).sum(axis=-1)\
        if np.ndim(eta_p) else eta_p + float(
            (_ALPHA * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)).sum())
    return e0 + k0 * _TM_A * eta, n0 + k0 * _TM_A * xi


def tmerc_inverse(easting, northing, lon0: float, k0: float = 0.9996,
                  e0: float = 500000.0, n0: float = 0.0):
    """Transverse Mercator inverse (→ lat/lon degrees)."""
    E = np.asarray(easting, dtype=np.float64)
    N = np.asarray(northing, dtype=np.float64)
    xi = (N - n0) / (k0 * _TM_A)
    eta = (E - e0) / (k0 * _TM_A)
    j = np.arange(1, 7, dtype=np.float64)
    xi_p = xi - (_BETA[None, :] * np.sin(2 * j[None, :] * xi[..., None])
                 * np.cosh(2 * j[None, :] * eta[..., None])).sum(axis=-1)
    eta_p = eta - (_BETA[None, :] * np.cos(2 * j[None, :] * xi[..., None])
                   * np.sinh(2 * j[None, :] * eta[..., None])).sum(axis=-1)
    # conformal latitude -> geodetic latitude (inverse series in e²)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    e2 = _TM_E2
    phi = (chi
           + (e2 / 2 + 5 * e2**2 / 24 + e2**3 / 12 + 13 * e2**4 / 360)
           * np.sin(2 * chi)
           + (7 * e2**2 / 48 + 29 * e2**3 / 240 + 811 * e2**4 / 11520)
           * np.sin(4 * chi)
           + (7 * e2**3 / 120 + 81 * e2**4 / 1120) * np.sin(6 * chi)
           + (4279 * e2**4 / 161280) * np.sin(8 * chi))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(phi), np.degrees(lam) + lon0


def utm_zone_lon0(zone: int) -> float:
    """Central meridian of a UTM zone (1-60)."""
    return zone * 6.0 - 183.0


def utm_forward(lat, lon, zone: int, north: bool = True):
    """lat/lon → UTM easting/northing for ``zone`` (EPSG:326xx / 327xx)."""
    return tmerc_forward(lat, lon, utm_zone_lon0(zone),
                         n0=0.0 if north else 10000000.0)


def utm_inverse(easting, northing, zone: int, north: bool = True):
    return tmerc_inverse(easting, northing, utm_zone_lon0(zone),
                         n0=0.0 if north else 10000000.0)


# ---------------------------------------------------------------------------
# Lambert conformal conic (2SP) + Albers equal-area (2SP) — Snyder 1987
# ("Map Projections: A Working Manual", USGS PP 1395, public domain),
# ellipsoidal forms on WGS84.  The reference reaches these through PROJ
# (ogr/ogrct.cpp:2266); after UTM these are the two most common projected
# CRS families (VERDICT r2 missing-1).
# ---------------------------------------------------------------------------

def _snyder_m(phi):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _TM_E2 * s * s)


def _snyder_t(phi):
    s = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / ((1.0 - _TM_E * s) / (1.0 + _TM_E * s)) ** (_TM_E / 2.0))


def _snyder_q(phi):
    s = np.sin(phi)
    return (1.0 - _TM_E2) * (
        s / (1.0 - _TM_E2 * s * s)
        - (1.0 / (2.0 * _TM_E))
        * np.log((1.0 - _TM_E * s) / (1.0 + _TM_E * s)))


def _lcc_constants(lat1, lat2, lat0):
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _snyder_m(p1), _snyder_m(p2)
    t1, t2, t0 = _snyder_t(p1), _snyder_t(p2), _snyder_t(p0)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)) \
        if lat1 != lat2 else np.sin(p1)
    F = m1 / (n * t1 ** n)
    rho0 = _WGS84_A * F * t0 ** n
    return n, F, rho0


def lcc_forward(lat, lon, *, lat1: float, lat2: float, lat0: float,
                lon0: float, e0: float = 0.0, n0: float = 0.0):
    """Lambert conformal conic 2SP forward (Snyder 15-1..15-11,
    ellipsoidal): lat/lon degrees → easting/northing."""
    n, F, rho0 = _lcc_constants(lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = _WGS84_A * F * _snyder_t(phi) ** n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return e0 + rho * np.sin(th), n0 + rho0 - rho * np.cos(th)


def lcc_inverse(easting, northing, *, lat1: float, lat2: float,
                lat0: float, lon0: float, e0: float = 0.0,
                n0: float = 0.0):
    """Lambert conformal conic 2SP inverse (→ lat/lon degrees);
    conformal-latitude Newton iteration to <1e-12 rad."""
    n, F, rho0 = _lcc_constants(lat1, lat2, lat0)
    x = np.asarray(easting, dtype=np.float64) - e0
    y = np.asarray(northing, dtype=np.float64) - n0
    rho = np.sign(n) * np.hypot(x, rho0 - y)
    t = (rho / (_WGS84_A * F)) ** (1.0 / n)
    th = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    lam = th / n + np.radians(lon0)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = _TM_E * np.sin(phi)
        phi_new = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (_TM_E / 2.0))
        if np.max(np.abs(phi_new - phi)) < 1e-13:
            phi = phi_new
            break
        phi = phi_new
    return np.degrees(phi), np.degrees(lam)


def _albers_constants(lat1, lat2, lat0):
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _snyder_m(p1), _snyder_m(p2)
    q1, q2, q0 = _snyder_q(p1), _snyder_q(p2), _snyder_q(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1) if lat1 != lat2 else np.sin(p1)
    C = m1 * m1 + n * q1
    rho0 = _WGS84_A * np.sqrt(C - n * q0) / n
    return n, C, rho0


def albers_forward(lat, lon, *, lat1: float, lat2: float, lat0: float,
                   lon0: float, e0: float = 0.0, n0: float = 0.0):
    """Albers equal-area conic 2SP forward (Snyder 14-1..14-12,
    ellipsoidal).  The equal-area property (Jacobian == ellipsoidal area
    element) is asserted numerically in tests."""
    n, C, rho0 = _albers_constants(lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = _WGS84_A * np.sqrt(C - n * _snyder_q(phi)) / n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return e0 + rho * np.sin(th), n0 + rho0 - rho * np.cos(th)


def albers_inverse(easting, northing, *, lat1: float, lat2: float,
                   lat0: float, lon0: float, e0: float = 0.0,
                   n0: float = 0.0):
    """Albers equal-area conic 2SP inverse (Snyder 14-19..14-21);
    authalic-latitude Newton iteration."""
    n, C, rho0 = _albers_constants(lat1, lat2, lat0)
    x = np.asarray(easting, dtype=np.float64) - e0
    y = np.asarray(northing, dtype=np.float64) - n0
    rho = np.hypot(x, rho0 - y)
    q = (C - (rho * n / _WGS84_A) ** 2) / n
    th = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    lam = th / n + np.radians(lon0)
    return np.degrees(_authalic_phi_from_q(q)), np.degrees(lam)


def _authalic_phi_from_q(q):
    """Geodetic latitude from the authalic q (Snyder 3-16 Newton
    iteration to <1e-13 rad) — shared by Albers/LAEA/CEA/Equal Earth."""
    phi = np.arcsin(np.clip(np.asarray(q, dtype=np.float64) / 2.0,
                            -1.0, 1.0))
    for _ in range(12):
        s = np.sin(phi)
        es = _TM_E * s
        one = 1.0 - _TM_E2 * s * s
        f = (1.0 - _TM_E2) * (s / one - (1.0 / (2.0 * _TM_E))
                              * np.log((1.0 - es) / (1.0 + es))) - q
        dq = (1.0 - _TM_E2) * 2.0 * np.cos(phi) / (one * one)
        step = np.where(np.abs(dq) > 1e-18, f / np.maximum(dq, 1e-18), 0.0)
        phi = phi - step
        if np.max(np.abs(step)) < 1e-13:
            break
    return phi


def ps_forward(lat, lon, *, lat_ts: float, lon0: float, south: bool,
               e0: float = 0.0, n0: float = 0.0):
    """Polar stereographic variant B (standard-parallel form, Snyder
    21-33/21-34 ellipsoidal).  South aspect per Snyder's sign-reversal
    note (φ, λ0, λ, x, y all negated), which reduces to
    x = ρ·sin(λ−λ0), y = +ρ·cos(λ−λ0)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    if south:
        phi = -phi
    tc = _snyder_t(np.radians(abs(lat_ts)))
    mc = _snyder_m(np.radians(abs(lat_ts)))
    rho = _WGS84_A * mc * _snyder_t(phi) / tc
    if south:
        return e0 + rho * np.sin(lam), n0 + rho * np.cos(lam)
    return e0 + rho * np.sin(lam), n0 - rho * np.cos(lam)


def ps_inverse(easting, northing, *, lat_ts: float, lon0: float,
               south: bool, e0: float = 0.0, n0: float = 0.0):
    """Polar stereographic variant B inverse (Snyder 21-39/21-40 + 7-9
    conformal-latitude iteration to <1e-12 rad)."""
    x = np.asarray(easting, dtype=np.float64) - e0
    y = np.asarray(northing, dtype=np.float64) - n0
    if south:
        y = -y  # reduce to the north-aspect geometry
    tc = _snyder_t(np.radians(abs(lat_ts)))
    mc = _snyder_m(np.radians(abs(lat_ts)))
    rho = np.hypot(x, y)
    t = rho * tc / (_WGS84_A * mc)
    lam = np.arctan2(x, -y)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = _TM_E * np.sin(phi)
        phi_new = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (_TM_E / 2.0))
        if np.max(np.abs(phi_new - phi)) < 1e-13:
            phi = phi_new
            break
        phi = phi_new
    if south:
        phi = -phi
    return np.degrees(phi), np.degrees(lam) + lon0


# ---------------------------------------------------------------------------
# Equal-area families beyond Albers: Lambert azimuthal (LAEA, Snyder
# 24-2..24-27 ellipsoidal — ETRS89 LAEA Europe is the EU INSPIRE grid),
# cylindrical equal-area (CEA, Snyder 10-1/10-2 — EASE-Grid 2.0), and
# Equal Earth (Šavrič, Patterson & Jenny 2019, IJGIS — published
# polynomial, applied on the authalic sphere so the equal-area property
# is exact on the ellipsoid).  All share the authalic-latitude machinery
# (_snyder_q / _authalic_phi_from_q).
# ---------------------------------------------------------------------------

def laea_forward(lat, lon, *, lat0: float, lon0: float,
                 e0: float = 0.0, n0: float = 0.0):
    """Lambert azimuthal equal-area, oblique ellipsoidal aspect
    (Snyder 24-2..24-15)."""
    qp = _snyder_q(np.pi / 2.0)
    p0 = np.radians(lat0)
    beta1 = np.arcsin(np.clip(_snyder_q(p0) / qp, -1.0, 1.0))
    rq = _WGS84_A * np.sqrt(qp / 2.0)
    d = _WGS84_A * _snyder_m(p0) / (rq * np.cos(beta1))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    beta = np.arcsin(np.clip(_snyder_q(phi) / qp, -1.0, 1.0))
    denom = (1.0 + np.sin(beta1) * np.sin(beta)
             + np.cos(beta1) * np.cos(beta) * np.cos(lam))
    b = rq * np.sqrt(2.0 / np.maximum(denom, 1e-300))
    x = b * d * np.cos(beta) * np.sin(lam)
    y = (b / d) * (np.cos(beta1) * np.sin(beta)
                   - np.sin(beta1) * np.cos(beta) * np.cos(lam))
    return e0 + x, n0 + y


def laea_inverse(easting, northing, *, lat0: float, lon0: float,
                 e0: float = 0.0, n0: float = 0.0):
    """LAEA inverse (Snyder 24-16..24-27 + authalic Newton)."""
    qp = _snyder_q(np.pi / 2.0)
    p0 = np.radians(lat0)
    beta1 = np.arcsin(np.clip(_snyder_q(p0) / qp, -1.0, 1.0))
    rq = _WGS84_A * np.sqrt(qp / 2.0)
    d = _WGS84_A * _snyder_m(p0) / (rq * np.cos(beta1))
    x = np.asarray(easting, dtype=np.float64) - e0
    y = np.asarray(northing, dtype=np.float64) - n0
    rho = np.hypot(x / d, d * y)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    safe_rho = np.where(rho > 0, rho, 1.0)
    q = qp * (np.cos(ce) * np.sin(beta1)
              + d * y * np.sin(ce) * np.cos(beta1) / safe_rho)
    q = np.where(rho > 0, q, qp * np.sin(beta1))
    lam = np.arctan2(x * np.sin(ce),
                     d * safe_rho * np.cos(beta1) * np.cos(ce)
                     - d * d * y * np.sin(beta1) * np.sin(ce))
    lam = np.where(rho > 0, lam, 0.0)
    return (np.degrees(_authalic_phi_from_q(q)),
            np.degrees(lam) + lon0)


def cea_forward(lat, lon, *, lat_ts: float, lon0: float,
                e0: float = 0.0, n0: float = 0.0):
    """Cylindrical equal-area, ellipsoidal (Snyder 10-1/10-2) —
    the EASE-Grid 2.0 shape (lat_ts=30)."""
    k0 = _snyder_m(np.radians(lat_ts))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return (e0 + _WGS84_A * k0 * lam,
            n0 + _WGS84_A * _snyder_q(phi) / (2.0 * k0))


def cea_inverse(easting, northing, *, lat_ts: float, lon0: float,
                e0: float = 0.0, n0: float = 0.0):
    k0 = _snyder_m(np.radians(lat_ts))
    x = np.asarray(easting, dtype=np.float64) - e0
    y = np.asarray(northing, dtype=np.float64) - n0
    q = 2.0 * y * k0 / _WGS84_A
    phi = _authalic_phi_from_q(q)
    return np.degrees(phi), np.degrees(x / (_WGS84_A * k0)) + lon0


# Equal Earth polynomial coefficients (Šavrič/Patterson/Jenny 2019)
_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_M = np.sqrt(3.0) / 2.0


def _ee_poly(theta):
    t2 = theta * theta
    return theta * (_EE_A1 + _EE_A2 * t2
                    + t2 * t2 * t2 * (_EE_A3 + _EE_A4 * t2))


def _ee_dpoly(theta):
    t2 = theta * theta
    return (_EE_A1 + 3.0 * _EE_A2 * t2
            + t2 * t2 * t2 * (7.0 * _EE_A3 + 9.0 * _EE_A4 * t2))


def eqearth_forward(lat, lon, *, lon0: float = 0.0,
                    e0: float = 0.0, n0: float = 0.0):
    """Equal Earth forward: the published spherical polynomial applied on
    the authalic sphere (radius R_q, authalic latitude β), which makes
    the equal-area property exact on the ellipsoid — PROJ's +proj=eqearth
    construction for EPSG:8857."""
    qp = _snyder_q(np.pi / 2.0)
    rq = _WGS84_A * np.sqrt(qp / 2.0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    beta = np.arcsin(np.clip(_snyder_q(phi) / qp, -1.0, 1.0))
    theta = np.arcsin(_EE_M * np.sin(beta))
    x = rq * lam * np.cos(theta) / (_EE_M * _ee_dpoly(theta))
    y = rq * _ee_poly(theta)
    return e0 + x, n0 + y


def eqearth_inverse(easting, northing, *, lon0: float = 0.0,
                    e0: float = 0.0, n0: float = 0.0):
    """Equal Earth inverse: Newton on the y-polynomial, then authalic →
    geodetic latitude."""
    qp = _snyder_q(np.pi / 2.0)
    rq = _WGS84_A * np.sqrt(qp / 2.0)
    x = np.asarray(easting, dtype=np.float64) - e0
    y = np.asarray(northing, dtype=np.float64) - n0
    py = y / rq
    theta = np.clip(py / _EE_A1, -np.pi / 2, np.pi / 2)
    for _ in range(12):
        step = (_ee_poly(theta) - py) / _ee_dpoly(theta)
        theta = theta - step
        if np.max(np.abs(step)) < 1e-15:
            break
    beta = np.arcsin(np.clip(np.sin(theta) / _EE_M, -1.0, 1.0))
    phi = _authalic_phi_from_q(qp * np.sin(beta))
    lam = x * _EE_M * _ee_dpoly(theta) / (rq * np.cos(theta))
    return np.degrees(phi), np.degrees(lam) + lon0


# named CRS parameter sets (datum treated as WGS84-equivalent, the same
# approximation the repo applies throughout; see docstrings)
_CONIC_CRS = {
    # RGF93 / Lambert-93 (France) — EPSG:2154
    "EPSG:2154": ("lcc", dict(lat1=49.0, lat2=44.0, lat0=46.5, lon0=3.0,
                              e0=700000.0, n0=6600000.0)),
    # NAD83 / Conus Albers — EPSG:5070
    "EPSG:5070": ("albers", dict(lat1=29.5, lat2=45.5, lat0=23.0,
                                 lon0=-96.0, e0=0.0, n0=0.0)),
    # NSIDC Sea Ice Polar Stereographic North — EPSG:3413
    "EPSG:3413": ("ps", dict(lat_ts=70.0, lon0=-45.0, south=False,
                             e0=0.0, n0=0.0)),
    # Antarctic Polar Stereographic — EPSG:3031
    "EPSG:3031": ("ps", dict(lat_ts=-71.0, lon0=0.0, south=True,
                             e0=0.0, n0=0.0)),
    # Arctic Polar Stereographic — EPSG:3995
    "EPSG:3995": ("ps", dict(lat_ts=71.0, lon0=0.0, south=False,
                             e0=0.0, n0=0.0)),
    # ETRS89-extended / LAEA Europe (the EU INSPIRE grid) — EPSG:3035
    "EPSG:3035": ("laea", dict(lat0=52.0, lon0=10.0,
                               e0=4321000.0, n0=3210000.0)),
    # WGS84 / NSIDC EASE-Grid 2.0 Global — EPSG:6933
    "EPSG:6933": ("cea", dict(lat_ts=30.0, lon0=0.0, e0=0.0, n0=0.0)),
    # WGS84 / Equal Earth Greenwich — EPSG:8857
    "EPSG:8857": ("eqearth", dict(lon0=0.0, e0=0.0, n0=0.0)),
    # GDA94 / Australian Albers — EPSG:3577 (GRS80 ≈ WGS84 to 0.1 mm)
    "EPSG:3577": ("albers", dict(lat1=-18.0, lat2=-36.0, lat0=0.0,
                                 lon0=132.0, e0=0.0, n0=0.0)),
    # GDA94 / Geoscience Australia Lambert — EPSG:3112
    "EPSG:3112": ("lcc", dict(lat1=-18.0, lat2=-36.0, lat0=0.0,
                              lon0=134.0, e0=0.0, n0=0.0)),
    # NAD83 / Canada Atlas Lambert — EPSG:3978 (datum offset vs WGS84
    # ~1-2 m, same caveat as EPSG:5070)
    "EPSG:3978": ("lcc", dict(lat1=49.0, lat2=77.0, lat0=49.0,
                              lon0=-95.0, e0=0.0, n0=0.0)),
    # NAD83 / Statistics Canada Lambert — EPSG:3347
    "EPSG:3347": ("lcc", dict(lat1=49.0, lat2=77.0, lat0=63.390675,
                              lon0=-91.86666666666666,
                              e0=6200000.0, n0=3000000.0)),
    # NAD83 / California Albers — EPSG:3310
    "EPSG:3310": ("albers", dict(lat1=34.0, lat2=40.5, lat0=0.0,
                                 lon0=-120.0, e0=0.0, n0=-4000000.0)),
    # NAD83 / Texas Centric Mapping System Albers — EPSG:3083
    "EPSG:3083": ("albers", dict(lat1=27.5, lat2=35.0, lat0=18.0,
                                 lon0=-100.0, e0=1500000.0, n0=6000000.0)),
    # ETRS89 / LCC Europe — EPSG:3034
    "EPSG:3034": ("lcc", dict(lat1=35.0, lat2=65.0, lat0=52.0, lon0=10.0,
                              e0=4000000.0, n0=2800000.0)),
    # WGS84 / NSIDC Sea Ice Polar Stereographic South — EPSG:3976
    "EPSG:3976": ("ps", dict(lat_ts=-70.0, lon0=0.0, south=True,
                             e0=0.0, n0=0.0)),
    # --- round-4 mechanical registry expansion (VERDICT r3 next-5):
    # parameter rows transcribed from the public EPSG registry; datum
    # treated as WGS84-equivalent (GRS80 ≈ WGS84 to 0.1 mm; NAD83/ETRS89
    # offsets of ~1-2 m documented as out of scope, same as above) ---
    # ETRS89 / Austria Lambert — EPSG:3416
    "EPSG:3416": ("lcc", dict(lat1=49.0, lat2=46.0, lat0=47.5,
                              lon0=13.333333333333334,
                              e0=400000.0, n0=400000.0)),
    # NAD83(2011) / Conus Albers — EPSG:6350 (same grid as 5070)
    "EPSG:6350": ("albers", dict(lat1=29.5, lat2=45.5, lat0=23.0,
                                 lon0=-96.0, e0=0.0, n0=0.0)),
    # NAD83 / BC Albers — EPSG:3005
    "EPSG:3005": ("albers", dict(lat1=50.0, lat2=58.5, lat0=45.0,
                                 lon0=-126.0, e0=1000000.0, n0=0.0)),
    # NAD83 / Yukon Albers — EPSG:3578
    "EPSG:3578": ("albers", dict(lat1=61.666666666666664, lat2=68.0,
                                 lat0=59.0, lon0=-132.5,
                                 e0=500000.0, n0=500000.0)),
    # NAD83 / NWT Lambert — EPSG:3580
    "EPSG:3580": ("lcc", dict(lat1=62.0, lat2=70.0, lat0=0.0,
                              lon0=-112.0, e0=0.0, n0=0.0)),
    # GDA94 / SA Lambert — EPSG:3107
    "EPSG:3107": ("lcc", dict(lat1=-28.0, lat2=-36.0, lat0=-32.0,
                              lon0=135.0, e0=1000000.0, n0=2000000.0)),
    # GDA94 / Vicgrid — EPSG:3111
    "EPSG:3111": ("lcc", dict(lat1=-36.0, lat2=-38.0, lat0=-37.0,
                              lon0=145.0, e0=2500000.0, n0=2500000.0)),
    # WGS84 / Arctic Polar Stereographic (lat_ts 75) — EPSG:3996
    "EPSG:3996": ("ps", dict(lat_ts=75.0, lon0=0.0, south=False,
                             e0=0.0, n0=0.0)),
    # WGS84 / NSIDC EASE-Grid 2.0 North / South — EPSG:6931 / 6932
    "EPSG:6931": ("laea", dict(lat0=90.0, lon0=0.0, e0=0.0, n0=0.0)),
    "EPSG:6932": ("laea", dict(lat0=-90.0, lon0=0.0, e0=0.0, n0=0.0)),
}

# WGS84 / North Pole LAEA regional grids — EPSG:3571-3576 (lon0 per code)
for _code, _lon0 in ((3571, 180.0), (3572, -150.0), (3573, -100.0),
                     (3574, -40.0), (3575, 10.0), (3576, 90.0)):
    _CONIC_CRS[f"EPSG:{_code}"] = ("laea", dict(lat0=90.0, lon0=_lon0,
                                                e0=0.0, n0=0.0))

# RGF93 / CC42..CC50 (France conic conformal zones) — EPSG:3942-3950:
# zone latitude N ∈ 42..50, lat0=N, lat1=N∓0.75, lon0=3,
# e0=1,700,000, n0=(N-41)·1,000,000 + 200,000 (EPSG registry pattern)
for _N in range(42, 51):
    _CONIC_CRS[f"EPSG:{3900 + _N}"] = (
        "lcc", dict(lat1=_N - 0.75, lat2=_N + 0.75, lat0=float(_N),
                    lon0=3.0, e0=1700000.0,
                    n0=(_N - 41) * 1000000.0 + 200000.0))

# Named transverse-Mercator CRS (non-UTM national grids on GRS80≈WGS84;
# the UTM zone families 326xx/327xx/258xx/269xx/283xx resolve by prefix
# in resolve_crs)
_TMERC_CRS = {
    # ETRS89 / Poland CS92 — EPSG:2180
    "EPSG:2180": dict(lon0=19.0, k0=0.9993, e0=500000.0, n0=-5300000.0),
    # NZGD2000 / New Zealand Transverse Mercator — EPSG:2193
    "EPSG:2193": dict(lon0=173.0, k0=0.9996, e0=1600000.0,
                      n0=10000000.0),
}

_PROJ_FNS = {"lcc": (lcc_forward, lcc_inverse),
             "albers": (albers_forward, albers_inverse),
             "ps": (ps_forward, ps_inverse),
             "laea": (laea_forward, laea_inverse),
             "cea": (cea_forward, cea_inverse),
             "eqearth": (eqearth_forward, eqearth_inverse)}


def conic_crs_forward(crs: str, lat, lon):
    kind, p = _CONIC_CRS[crs]
    return _PROJ_FNS[kind][0](lat, lon, **p)


def conic_crs_inverse(crs: str, easting, northing):
    kind, p = _CONIC_CRS[crs]
    return _PROJ_FNS[kind][1](easting, northing, **p)


# ---------------------------------------------------------------------------
# General CRS resolution: EPSG codes (named rows + mechanical zone
# families) and proj-strings for the implemented projection families —
# the engine-side slice of what the reference gets from PROJ's database
# (ogr/ogrct.cpp:2266).  Datums are WGS84-equivalent unless the code is
# in georay.datum.DATUM_CRS (OSGB36/ED50 Helmert paths).
# ---------------------------------------------------------------------------

_UTM_FAMILIES = {
    # prefix -> (zone_base, north, zone_range)
    "EPSG:326": (32600, True, range(1, 61)),    # WGS84 / UTM N
    "EPSG:327": (32700, False, range(1, 61)),   # WGS84 / UTM S
    "EPSG:258": (25800, True, range(28, 39)),   # ETRS89 / UTM 28N-38N
    "EPSG:269": (26900, True, range(1, 24)),    # NAD83 / UTM 1N-23N
    "EPSG:283": (28300, False, range(46, 59)),  # GDA94 / MGA 46-58
}


def _parse_proj_string(s: str):
    """``+proj=... +lat_1=... …`` → (kind, params) for the implemented
    families (lcc, aea, laea, cea, stere(polar), eqearth, tmerc, utm,
    merc/webmerc, longlat).  Unknown/unsupported params raise."""
    kv = {}
    for part in s.split():
        part = part.lstrip("+")
        if not part or part in ("no_defs", "wktext", "over"):
            continue
        if "=" in part:
            k, v = part.split("=", 1)
            kv[k] = v
        else:
            kv[part] = True
    proj = kv.get("proj")
    if proj is None:
        raise ValueError(f"proj-string without +proj: {s!r}")
    dat = kv.get("datum", kv.get("ellps", "WGS84"))
    if str(dat).upper() not in ("WGS84", "GRS80", "TRUE"):
        raise ValueError(f"unsupported datum/ellipsoid {dat!r} "
                         "(WGS84/GRS80 only)")

    def f(key, default=0.0):
        return float(kv.get(key, default))

    if proj == "longlat":
        return ("longlat", {})
    if proj in ("merc", "webmerc"):
        return ("webmerc", {})
    if proj == "utm":
        return ("utm", dict(zone=int(kv["zone"]),
                            north="south" not in kv))
    if proj == "tmerc":
        if f("lat_0") != 0.0:
            raise ValueError("tmerc with lat_0 != 0 is not supported")
        return ("tmerc", dict(lon0=f("lon_0"), k0=f("k", 1.0),
                              e0=f("x_0"), n0=f("y_0")))
    if proj == "lcc":
        return ("lcc", dict(lat1=f("lat_1"), lat2=f("lat_2", f("lat_1")),
                            lat0=f("lat_0"), lon0=f("lon_0"),
                            e0=f("x_0"), n0=f("y_0")))
    if proj == "aea":
        return ("albers", dict(lat1=f("lat_1"), lat2=f("lat_2"),
                               lat0=f("lat_0"), lon0=f("lon_0"),
                               e0=f("x_0"), n0=f("y_0")))
    if proj == "laea":
        return ("laea", dict(lat0=f("lat_0"), lon0=f("lon_0"),
                             e0=f("x_0"), n0=f("y_0")))
    if proj == "cea":
        return ("cea", dict(lat_ts=f("lat_ts"), lon0=f("lon_0"),
                            e0=f("x_0"), n0=f("y_0")))
    if proj == "eqearth":
        return ("eqearth", dict(lon0=f("lon_0"), e0=f("x_0"),
                                n0=f("y_0")))
    if proj == "stere":
        lat0 = f("lat_0")
        if abs(lat0) != 90.0:
            raise ValueError("only polar stereographic (+lat_0=±90) is "
                             "supported")
        return ("ps", dict(lat_ts=f("lat_ts", lat0), lon0=f("lon_0"),
                           south=lat0 < 0, e0=f("x_0"), n0=f("y_0")))
    raise ValueError(f"unsupported +proj={proj!r}")


def _tokenize_wkt(s: str):
    """OGC WKT bracket structure → nested (KEYWORD, [args]) nodes; args
    are quoted strings, numbers, bare words, or child nodes.  Both []
    and () delimiters, "" quote escaping (the WKT1/WKT2 lexical rules
    shared by every revision of the spec)."""
    i, n = 0, len(s)

    def node():
        nonlocal i
        while i < n and s[i] in " \t\r\n,":
            i += 1
        j = i
        while i < n and (s[i].isalnum() or s[i] in "_-"):
            i += 1
        kw = s[j:i].upper()
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i >= n or s[i] not in "[(":
            raise ValueError(f"WKT: expected [ after {kw!r}")
        i += 1
        args = []
        while True:
            while i < n and s[i] in " \t\r\n,":
                i += 1
            if i >= n:
                raise ValueError("unterminated WKT")
            c = s[i]
            if c in "])":
                i += 1
                return (kw, args)
            if c == '"':
                i += 1
                out = []
                while i < n:
                    if s[i] == '"':
                        if i + 1 < n and s[i + 1] == '"':
                            out.append('"')
                            i += 2
                            continue
                        i += 1
                        break
                    out.append(s[i])
                    i += 1
                args.append("".join(out))
                continue
            j = i
            while i < n and s[i] not in ",])[(":
                i += 1
            tok = s[j:i].strip()
            if i < n and s[i] in "[(":
                i = j
                args.append(node())
                continue
            try:
                args.append(float(tok))
            except ValueError:
                args.append(tok)

    return node()


def _wkt_find(tree, *keywords):
    """First child node (depth-first) whose keyword is in ``keywords``."""
    kw, args = tree
    if kw in keywords:
        return tree
    for a in args:
        if isinstance(a, tuple):
            hit = _wkt_find(a, *keywords)
            if hit is not None:
                return hit
    return None


# WKT projection/method name → engine family (WKT1 ESRI/OGC underscore
# names AND WKT2 EPSG method names, normalized to lowercase joined words)
_WKT_METHODS = {
    "transverse mercator": "tmerc",
    "lambert conformal conic 2sp": "lcc",
    "lambert conic conformal 2sp": "lcc",
    "albers": "albers",
    "albers conic equal area": "albers",
    "albers equal area": "albers",
    "polar stereographic": "ps",
    "polar stereographic variant b": "ps",
    "lambert azimuthal equal area": "laea",
    "cylindrical equal area": "cea",
    "lambert cylindrical equal area": "cea",
    "lambert cylindrical equal area spherical": "cea",
    "equal earth": "eqearth",
    "mercator 1sp": "webmerc",
    "mercator auxiliary sphere": "webmerc",
    "popular visualisation pseudo mercator": "webmerc",
}

# WKT parameter name → engine parameter (same normalization)
_WKT_PARAMS = {
    "latitude of origin": "lat0",
    "latitude of natural origin": "lat0",
    "latitude of false origin": "lat0",
    "latitude of center": "lat0",
    "latitude of centre": "lat0",
    "latitude of projection centre": "lat0",
    "central meridian": "lon0",
    "longitude of natural origin": "lon0",
    "longitude of false origin": "lon0",
    "longitude of center": "lon0",
    "longitude of centre": "lon0",
    "longitude of origin": "lon0",
    "longitude of projection centre": "lon0",
    "standard parallel 1": "lat1",
    "latitude of 1st standard parallel": "lat1",
    "standard parallel": "lat1",
    "latitude of standard parallel": "lat1",
    "standard parallel 2": "lat2",
    "latitude of 2nd standard parallel": "lat2",
    "scale factor": "k0",
    "scale factor at natural origin": "k0",
    "false easting": "e0",
    "easting at false origin": "e0",
    "easting at projection centre": "e0",
    "false northing": "n0",
    "northing at false origin": "n0",
    "northing at projection centre": "n0",
}


def _wkt_norm(name: str) -> str:
    return " ".join("".join(c if c.isalnum() else " "
                            for c in name.lower()).split())


def _parse_wkt_crs(s: str):
    """OGC WKT CRS string (WKT1 PROJCS/GEOGCS or WKT2 PROJCRS/GEOGCRS)
    → (kind, params) for the implemented projection families — the
    engine-side slice of OGRSpatialReference::importFromWkt.  The
    ellipsoid must be WGS84/GRS80-sized (semi-major within 0.5 m of
    6378137 — the registry-wide WGS84-equivalent datum stance; other
    datums are supported only through their EPSG codes in
    georay.datum.DATUM_CRS)."""
    tree = _tokenize_wkt(s)
    kw = tree[0]
    if kw in ("GEOGCS", "GEOGCRS", "GEODCRS"):
        _check_wkt_ellipsoid(tree)
        return ("longlat", {})
    if kw not in ("PROJCS", "PROJCRS"):
        raise ValueError(f"unsupported WKT root {kw!r}")
    _check_wkt_ellipsoid(tree)
    meth = _wkt_find(tree, "PROJECTION", "METHOD")
    if meth is None:
        raise ValueError("WKT without PROJECTION/METHOD")
    mname = _wkt_norm(next(a for a in meth[1] if isinstance(a, str)))
    if mname.endswith(" variant a"):
        mname = mname[:-10]
    kind = _WKT_METHODS.get(mname)
    if kind is None:
        raise ValueError(f"unsupported WKT projection {mname!r}")
    p = {}
    conv = _wkt_find(tree, "CONVERSION") or tree

    def walk(t):
        for a in t[1]:
            if isinstance(a, tuple):
                if a[0] == "PARAMETER":
                    name = _wkt_norm(a[1][0])
                    val = next(v for v in a[1][1:]
                               if isinstance(v, float))
                    key = _WKT_PARAMS.get(name)
                    if key:
                        p[key] = val
                else:
                    walk(a)

    walk(conv)
    if kind == "webmerc":
        return ("webmerc", {})
    if kind == "tmerc":
        if p.get("lat0", 0.0) != 0.0:
            raise ValueError("tmerc with non-zero origin latitude is "
                             "not supported")
        return ("tmerc", dict(lon0=p.get("lon0", 0.0),
                              k0=p.get("k0", 1.0),
                              e0=p.get("e0", 0.0), n0=p.get("n0", 0.0)))
    if kind in ("lcc", "albers"):
        return (kind, dict(lat1=p.get("lat1", 0.0),
                           lat2=p.get("lat2", p.get("lat1", 0.0)),
                           lat0=p.get("lat0", 0.0),
                           lon0=p.get("lon0", 0.0),
                           e0=p.get("e0", 0.0), n0=p.get("n0", 0.0)))
    if kind == "ps":
        if p.get("k0", 1.0) != 1.0:
            raise ValueError("polar stereographic variant A (scale "
                             "factor) is not supported — use variant B")
        lat_ts = p.get("lat1", p.get("lat0"))
        if lat_ts is None or abs(lat_ts) == 90.0:
            raise ValueError("polar stereographic needs a standard "
                             "parallel")
        return ("ps", dict(lat_ts=lat_ts, lon0=p.get("lon0", 0.0),
                           south=lat_ts < 0,
                           e0=p.get("e0", 0.0), n0=p.get("n0", 0.0)))
    if kind == "laea":
        return ("laea", dict(lat0=p.get("lat0", 0.0),
                             lon0=p.get("lon0", 0.0),
                             e0=p.get("e0", 0.0), n0=p.get("n0", 0.0)))
    if kind == "cea":
        return ("cea", dict(lat_ts=p.get("lat1", p.get("lat0", 0.0)),
                            lon0=p.get("lon0", 0.0),
                            e0=p.get("e0", 0.0), n0=p.get("n0", 0.0)))
    return ("eqearth", dict(lon0=p.get("lon0", 0.0),
                            e0=p.get("e0", 0.0), n0=p.get("n0", 0.0)))


def _check_wkt_ellipsoid(tree):
    ell = _wkt_find(tree, "SPHEROID", "ELLIPSOID")
    if ell is None:
        return                       # no ellipsoid node: assume WGS84
    a = next((v for v in ell[1] if isinstance(v, float)), None)
    if a is not None and abs(a - 6378137.0) > 0.5:
        raise ValueError(
            f"unsupported ellipsoid (a={a}); WGS84/GRS80 only — other "
            "datums resolve through their EPSG codes")


def resolve_crs(crs: str):
    """CRS spec → (kind, params).  Accepts ``EPSG:nnnn`` (named conic /
    tmerc rows + the UTM zone families), proj-strings, and OGC WKT
    (WKT1 PROJCS/GEOGCS or WKT2 PROJCRS/GEOGCRS) for the implemented
    families.  kinds: longlat, webmerc, utm, tmerc, lcc, albers, ps,
    laea, cea, eqearth, datum (OSGB36/ED50 codes)."""
    if crs.startswith("+"):
        return _parse_proj_string(crs)
    head = crs.lstrip()[:12].upper()
    if any(head.startswith(k) for k in
           ("PROJCS", "PROJCRS", "GEOGCS", "GEOGCRS", "GEODCRS")):
        return _parse_wkt_crs(crs)
    if crs == "EPSG:4326":
        return ("longlat", {})
    if crs == "EPSG:3857":
        return ("webmerc", {})
    if crs in _CONIC_CRS:
        return _CONIC_CRS[crs]
    if crs in _TMERC_CRS:
        return ("tmerc", _TMERC_CRS[crs])
    if crs[:8] in _UTM_FAMILIES and crs[8:].isdigit():
        base, north, zr = _UTM_FAMILIES[crs[:8]]
        zone = int(crs[5:]) - base
        if zone in zr:
            return ("utm", dict(zone=zone, north=north))
    from .datum import DATUM_CRS
    if crs in DATUM_CRS or crs.startswith("EPSG:230"):
        return ("datum", dict(crs=crs))
    raise ValueError(f"unsupported CRS {crs}")


def crs_forward(crs: str, lat, lon):
    """WGS84 lat/lon → projected x/y for any :func:`resolve_crs` spec."""
    kind, p = resolve_crs(crs)
    if kind == "longlat":
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if kind == "webmerc":
        return latlon_to_meters(lat, lon)
    if kind == "utm":
        return utm_forward(lat, lon, p["zone"], north=p["north"])
    if kind == "tmerc":
        return tmerc_forward(lat, lon, **p)
    if kind == "datum":
        from .datum import datum_crs_forward
        return datum_crs_forward(p["crs"], lat, lon)
    return _PROJ_FNS[kind][0](lat, lon, **p)


def crs_inverse(crs: str, x, y):
    """Projected x/y → WGS84 lat/lon for any :func:`resolve_crs` spec."""
    kind, p = resolve_crs(crs)
    if kind == "longlat":
        return np.asarray(y, np.float64), np.asarray(x, np.float64)
    if kind == "webmerc":
        return meters_to_latlon(x, y)
    if kind == "utm":
        return utm_inverse(x, y, p["zone"], north=p["north"])
    if kind == "tmerc":
        return tmerc_inverse(x, y, **p)
    if kind == "datum":
        from .datum import datum_crs_inverse
        return datum_crs_inverse(p["crs"], x, y)
    return _PROJ_FNS[kind][1](x, y, **p)
