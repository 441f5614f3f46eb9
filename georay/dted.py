"""DTED (Digital Terrain Elevation Data, MIL-PRF-89020B) driver —
from-scratch read/write of the reference's frmts/dted/dted_api.c
format (UHL 80 B + DSI 648 B + ACC 2700 B headers, then one data
record per LONGITUDE COLUMN: 0xAA sentinel, 3-byte block count,
2-byte lon/lat counts, south→north SIGNED-MAGNITUDE big-endian int16
elevations, 4-byte arithmetic checksum over the record bytes).

Layout facts mirrored from the reference (cited by 0-based offsets):
- UHL origin fields: lon DDDMMSSH at [4:12], lat at [12:20]
  (dted_api.c:263-307), intervals in TENTHS of arcsec at [20:28]
  (:224-228), nXSize/nYSize at [47:55] (:229-230).
- Elevations: high byte & 0x7F, sign from 0x80 (dted_api.c:637-651).
- Checksum: 32-bit sum of bytes [0, 8+2n) compared to the trailing
  big-endian word (dted_api.c:675-711); nodata −32767 (dted_api.h:83).
- Geotransform: UL corner = LL origin − half pixel (dted_api.c:320,
  dteddataset.cpp:518).

Read is fully vectorized: the fixed record pitch lets one
``frombuffer`` + reshape decode every column and every checksum in
numpy (no per-record Python).  Like the other edge drivers
(simpleformats.py) this is the INPUT EDGE — the distributed path is
read → tile split → map_batches."""
from __future__ import annotations

import numpy as np

__all__ = ["dted_read", "dted_write", "DTED_NODATA"]

DTED_NODATA = -32767

# standard full-cell post counts per level (1° cell, inclusive edges)
_LEVEL_POSTS = {0: 121, 1: 1201, 2: 3601}


def _angle_field(value_deg: float, is_lon: bool) -> bytes:
    """degrees → DDDMMSSH (8 bytes, spec zero-padded)."""
    hemi = (b"E" if value_deg >= 0 else b"W") if is_lon else \
        (b"N" if value_deg >= 0 else b"S")
    v = abs(value_deg)
    deg = int(v + 1e-9)
    rem = (v - deg) * 60.0
    minute = int(rem + 1e-9)
    sec = int(round((rem - minute) * 60.0))
    if sec == 60:
        sec = 0
        minute += 1
    if minute == 60:
        minute = 0
        deg += 1
    return b"%03d%02d%02d%c" % (deg, minute, sec, hemi[0])


def _parse_angle(b: bytes) -> float:
    deg = int(b[0:3])
    minute = int(b[3:5])
    sec = int(b[5:7])
    v = deg + minute / 60.0 + sec / 3600.0
    return -v if b[7:8] in (b"W", b"S") else v


def dted_write(path: str, arr: np.ndarray, ll_lat: float, ll_lon: float,
               *, interval_tenths: tuple[int, int] | None = None) -> str:
    """North-up int16 grid → DTED file.  ``arr`` is (n_lat, n_lon) with
    row 0 at the NORTH edge (the engine's raster convention); columns
    are emitted west→east, each south→north per the spec.  The
    post interval defaults to the exact 1°-cell spacing
    (3600·10/(n−1) tenths of arcsec, the DTED level grids)."""
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("DTED writes a single-band grid")
    if a.dtype != np.int16:
        if np.any((a < -32767) | (a > 32767)):
            raise ValueError("DTED elevations must fit int16")
        a = a.astype(np.int16)
    n_lat, n_lon = a.shape
    if interval_tenths is None:
        interval_tenths = (int(round(36000 / (n_lon - 1))),
                           int(round(36000 / (n_lat - 1))))
    lon_i, lat_i = interval_tenths

    uhl = bytearray(b" " * 80)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _angle_field(ll_lon, True)
    uhl[12:20] = _angle_field(ll_lat, False)
    uhl[20:24] = b"%04d" % lon_i
    uhl[24:28] = b"%04d" % lat_i
    uhl[28:32] = b"0010"           # absolute vertical accuracy (m)
    uhl[32:35] = b"U  "            # security: unclassified
    uhl[35:47] = b"GEORAY      "   # unique reference
    uhl[47:51] = b"%04d" % n_lon
    uhl[51:55] = b"%04d" % n_lat
    uhl[55:56] = b"0"              # multiple accuracy: none
    dsi = bytearray(b" " * 648)
    dsi[0:3] = b"DSI"
    dsi[3:4] = b"U"
    acc = bytearray(b" " * 2700)
    acc[0:3] = b"ACC"

    # data records, vectorized: (n_lon, 8 + 2*n_lat + 4) uint8 matrix
    reclen = 8 + 2 * n_lat + 4
    rec = np.zeros((n_lon, reclen), dtype=np.uint8)
    rec[:, 0] = 0xAA
    cols = np.arange(n_lon, dtype=np.uint32)
    rec[:, 1] = (cols >> 16).astype(np.uint8)
    rec[:, 2] = (cols >> 8).astype(np.uint8)
    rec[:, 3] = (cols & 0xFF).astype(np.uint8)
    # longitude count (2 bytes, [4:6])
    rec[:, 4] = (cols >> 8).astype(np.uint8)
    rec[:, 5] = (cols & 0xFF).astype(np.uint8)
    # latitude count bytes [6:8] stay 0
    south_up = a[::-1, :]          # row 0 = south edge
    mag = np.abs(south_up.astype(np.int32)).astype(np.uint16)
    hi = ((mag >> 8) & 0x7F).astype(np.uint8)
    hi |= ((south_up < 0).astype(np.uint8) << 7)
    lo = (mag & 0xFF).astype(np.uint8)
    rec[:, 8:8 + 2 * n_lat:2] = hi.T
    rec[:, 9:8 + 2 * n_lat:2] = lo.T
    csum = rec[:, :8 + 2 * n_lat].astype(np.uint32).sum(axis=1)
    rec[:, -4] = (csum >> 24).astype(np.uint8)
    rec[:, -3] = (csum >> 16).astype(np.uint8)
    rec[:, -2] = (csum >> 8).astype(np.uint8)
    rec[:, -1] = (csum & 0xFF).astype(np.uint8)

    with open(path, "wb") as f:
        f.write(bytes(uhl))
        f.write(bytes(dsi))
        f.write(bytes(acc))
        f.write(rec.tobytes())
    return path


def dted_read(path: str, *, verify_checksums: bool = True):
    """DTED file → (north-up int16 array (n_lat, n_lon), GDAL
    geotransform (UL-corner convention), nodata).  Checksums verified
    vectorized (dted_api.c:675-711 semantics; here any mismatch
    raises rather than warning)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[0:3] != b"UHL":
        raise ValueError("not a DTED file (no UHL record)")
    uhl = data[:80]
    ll_lon = _parse_angle(uhl[4:12])
    ll_lat = _parse_angle(uhl[12:20])
    dx = int(uhl[20:24]) / 36000.0
    dy = int(uhl[24:28]) / 36000.0
    n_lon = int(uhl[47:51])
    n_lat = int(uhl[51:55])
    if data[80:83] != b"DSI" or data[728:731] != b"ACC":
        raise ValueError("DSI or ACC record missing")
    off = 80 + 648 + 2700
    reclen = 8 + 2 * n_lat + 4
    body = np.frombuffer(data, dtype=np.uint8,
                         count=n_lon * reclen, offset=off)
    rec = body.reshape(n_lon, reclen)
    if not np.all(rec[:, 0] == 0xAA):
        raise ValueError("bad data record sentinel")
    if verify_checksums:
        want = ((rec[:, -4].astype(np.uint64) << 24)
                | (rec[:, -3].astype(np.uint64) << 16)
                | (rec[:, -2].astype(np.uint64) << 8)
                | rec[:, -1])
        got = rec[:, :8 + 2 * n_lat].astype(np.uint64).sum(axis=1)
        bad = np.nonzero(want != got)[0]
        if bad.size:
            raise ValueError(f"DTED checksum mismatch in column(s) "
                             f"{bad[:5].tolist()}")
    hi = rec[:, 8:8 + 2 * n_lat:2].astype(np.int32)
    lo = rec[:, 9:8 + 2 * n_lat:2].astype(np.int32)
    mag = ((hi & 0x7F) << 8) | lo
    val = np.where(hi & 0x80, -mag, mag).astype(np.int16)
    arr = val.T[::-1, :].copy()        # columns south→north → north-up
    gt = (ll_lon - 0.5 * dx, dx, 0.0,
          ll_lat + (n_lat - 1) * dy + 0.5 * dy, 0.0, -dy)
    return arr, gt, DTED_NODATA
