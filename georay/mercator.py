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
