"""Simple raster drivers: ENVI (flat binary + .hdr), Arc/Info ASCII
Grid (AAIGrid), and the XYZ grid reader — three real reference drivers
(frmts/raw/envidataset.cpp, frmts/aaigrid/aaigriddataset.cpp,
frmts/xyz/xyzdataset.cpp) whose on-disk forms are fully specified by
public documentation, re-implemented from scratch.

All three return/accept the engine's (h, w[, bands]) numpy convention
with a GDAL 6-tuple geotransform.  They are deliberately driver-side
(header parse + one contiguous read): at scale these formats are the
INPUT EDGE — the distributed path is `read → tile split → map_batches`
like every other raster source here (tiles.split_image_tiles)."""
from __future__ import annotations

import os

import numpy as np

__all__ = ["envi_write", "envi_read", "aaigrid_write", "aaigrid_read",
           "xyz_read_grid", "srtmhgt_read", "srtmhgt_write",
           "open_raster"]

# ENVI data type codes (ENVI header spec)
_ENVI_DT = {1: np.uint8, 2: np.int16, 3: np.int32, 4: np.float32,
            5: np.float64, 12: np.uint16, 13: np.uint32}
_ENVI_CODE = {np.dtype(v).name: k for k, v in _ENVI_DT.items()}


def envi_write(path: str, arr: np.ndarray, *, geotransform=None,
               interleave: str = "bsq") -> str:
    """Array → ENVI flat binary + ``.hdr`` sidecar (band sequential by
    default; bil/bip supported).  ``path`` is the data file; the header
    is ``path + '.hdr'`` (the reference's naming)."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, nb = a.shape
    code = _ENVI_CODE.get(a.dtype.name)
    if code is None:
        raise ValueError(f"ENVI: unsupported dtype {a.dtype}")
    if interleave == "bsq":
        data = np.ascontiguousarray(np.moveaxis(a, 2, 0))
    elif interleave == "bil":
        data = np.ascontiguousarray(np.moveaxis(a, 2, 1))
    elif interleave == "bip":
        data = np.ascontiguousarray(a)
    else:
        raise ValueError(interleave)
    with open(path, "wb") as f:
        f.write(data.tobytes())
    lines = ["ENVI",
             f"samples = {w}", f"lines   = {h}", f"bands   = {nb}",
             "header offset = 0", "file type = ENVI Standard",
             f"data type = {code}", f"interleave = {interleave}",
             "byte order = 0"]
    if geotransform is not None:
        gt = geotransform
        # map info: projection, ref x/y pixel (1-based), ref easting/
        # northing, x/y pixel size (the ENVI convention GDAL writes)
        lines.append(
            "map info = {Arbitrary, 1, 1, "
            f"{gt[0]}, {gt[3]}, {gt[1]}, {abs(gt[5])}}}")
    with open(path + ".hdr", "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def _parse_envi_hdr(text: str) -> dict:
    out = {}
    key = None
    buf = ""
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.upper() == "ENVI":
            continue
        if key is None:
            if "=" not in line:
                continue
            key, val = line.split("=", 1)
            key = key.strip().lower()
            buf = val.strip()
        else:
            buf += " " + line
        if buf.count("{") > buf.count("}"):
            continue                     # multi-line brace value
        out[key] = buf.strip()
        key, buf = None, ""
    return out


def envi_read(path: str):
    """ENVI data file (+``.hdr``) → (array, geotransform | None)."""
    hdr_path = path + ".hdr" if os.path.exists(path + ".hdr") \
        else os.path.splitext(path)[0] + ".hdr"
    with open(hdr_path) as f:
        hdr = _parse_envi_hdr(f.read())
    w = int(hdr["samples"])
    h = int(hdr["lines"])
    nb = int(hdr.get("bands", "1"))
    dt = np.dtype(_ENVI_DT[int(hdr["data type"])])
    if int(hdr.get("byte order", "0")) == 1:
        dt = dt.newbyteorder(">")
    off = int(hdr.get("header offset", "0"))
    il = hdr.get("interleave", "bsq").lower()
    with open(path, "rb") as f:
        f.seek(off)
        flat = np.frombuffer(f.read(h * w * nb * dt.itemsize), dt)
    if il == "bsq":
        a = np.moveaxis(flat.reshape(nb, h, w), 0, 2)
    elif il == "bil":
        a = np.moveaxis(flat.reshape(h, nb, w), 1, 2)
    elif il == "bip":
        a = flat.reshape(h, w, nb)
    else:
        raise ValueError(il)
    gt = None
    mi = hdr.get("map info")
    if mi:
        parts = [p.strip() for p in mi.strip("{}").split(",")]
        rx, ry = float(parts[1]), float(parts[2])
        ex, ny = float(parts[3]), float(parts[4])
        px, py = float(parts[5]), float(parts[6])
        # ref pixel is 1-based at the pixel's upper-left corner
        gt = (ex - (rx - 1) * px, px, 0.0,
              ny + (ry - 1) * py, 0.0, -py)
    a = a[:, :, 0] if nb == 1 else a
    return np.ascontiguousarray(a), gt


def aaigrid_write(path: str, arr: np.ndarray, *, geotransform=None,
                  nodata=None) -> str:
    """Single-band array → Arc/Info ASCII Grid (square cells only —
    the format's own constraint)."""
    if arr.ndim != 2:
        raise ValueError("AAIGrid is single-band")
    h, w = arr.shape
    gt = geotransform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    if abs(gt[1] - abs(gt[5])) > 1e-12:
        raise ValueError("AAIGrid needs square cells")
    lines = [f"ncols {w}", f"nrows {h}",
             f"xllcorner {gt[0]!r}",
             f"yllcorner {(gt[3] + h * gt[5])!r}",
             f"cellsize {gt[1]!r}"]
    if nodata is not None:
        lines.append(f"NODATA_value {nodata!r}")
    body = "\n".join(" ".join(repr(v) if arr.dtype.kind == "f"
                              else str(int(v)) for v in row)
                     for row in arr)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + body + "\n")
    return path


def aaigrid_read(path: str):
    """AAIGrid → (array float64|int64, geotransform, nodata | None)."""
    with open(path) as f:
        text = f.read()
    toks = text.split()
    hdr = {}
    i = 0
    while i + 1 < len(toks) and toks[i][0].isalpha():
        hdr[toks[i].lower()] = toks[i + 1]
        i += 2
    w = int(hdr["ncols"])
    h = int(hdr["nrows"])
    cell = float(hdr["cellsize"])
    vals = np.array(toks[i:], dtype=np.float64).reshape(h, w)
    if "xllcenter" in hdr:
        x0 = float(hdr["xllcenter"]) - cell / 2
        y0 = float(hdr["yllcenter"]) - cell / 2
    else:
        x0 = float(hdr["xllcorner"])
        y0 = float(hdr["yllcorner"])
    gt = (x0, cell, 0.0, y0 + h * cell, 0.0, -cell)
    nodata = float(hdr["nodata_value"]) if "nodata_value" in hdr else None
    if np.all(vals == np.rint(vals)) and np.abs(vals).max(initial=0) < 2**62:
        ivals = vals.astype(np.int64)
        if nodata is None or nodata == int(nodata):
            return ivals, gt, (None if nodata is None else int(nodata))
    return vals, gt, nodata


def xyz_read_grid(path: str):
    """XYZ text (x y z per line, any row/col order, regular grid) →
    (array, geotransform) — the reference's XYZ driver contract:
    coordinates are CELL CENTERS on a uniform grid."""
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    xs = np.unique(data[:, 0])
    ys = np.unique(data[:, 1])
    if len(xs) * len(ys) != len(data):
        raise ValueError("XYZ points do not form a full regular grid")
    dx = np.diff(xs)
    dy = np.diff(ys)
    if len(dx) and (dx.max() - dx.min()) > 1e-9 * max(abs(xs[-1]), 1):
        raise ValueError("XYZ grid spacing is not uniform in x")
    if len(dy) and (dy.max() - dy.min()) > 1e-9 * max(abs(ys[-1]), 1):
        raise ValueError("XYZ grid spacing is not uniform in y")
    sx = dx[0] if len(dx) else 1.0
    sy = dy[0] if len(dy) else 1.0
    ix = np.searchsorted(xs, data[:, 0])
    iy = np.searchsorted(ys, data[:, 1])
    grid = np.empty((len(ys), len(xs)), dtype=np.float64)
    # row 0 = NORTHERNMOST line (GDAL top-down convention)
    grid[len(ys) - 1 - iy, ix] = data[:, 2]
    gt = (xs[0] - sx / 2, sx, 0.0, ys[-1] + sy / 2, 0.0, -sy)
    return grid, gt


def srtmhgt_read(path: str):
    """SRTM ``.hgt`` tile (frmts/srtmhgt/srtmhgtdataset.cpp): raw
    big-endian int16, square n×n grid, georeference ENTIRELY from the
    filename (``N37W123.hgt`` = cell CORNERS at lat 37..38, lon
    -123..-122; rows north→south; -32768 = void).  Returns
    (array int16, geotransform, nodata)."""
    name = os.path.basename(path).split(".")[0].upper()
    ns, lat = name[0], int(name[1:3])
    ew, lon = name[3], int(name[4:7])
    if ns not in "NS" or ew not in "EW":
        raise ValueError(f"not an SRTM HGT name: {name!r}")
    lat0 = lat if ns == "N" else -lat
    lon0 = lon if ew == "E" else -lon
    raw = np.fromfile(path, dtype=">i2")
    n = int(round(np.sqrt(raw.size)))
    if n * n != raw.size:
        raise ValueError(f"HGT size {raw.size} is not a square grid")
    arr = raw.reshape(n, n).astype(np.int16)
    # sample spacing: the n×n grid spans exactly 1° INCLUSIVE of both
    # edges (3601 for 1-arcsec, 1201 for 3-arcsec); pixel-center georef
    step = 1.0 / (n - 1)
    gt = (lon0 - step / 2, step, 0.0,
          lat0 + 1 + step / 2, 0.0, -step)
    return arr, gt, -32768


def srtmhgt_write(path: str, arr: np.ndarray) -> str:
    """int16 square grid → .hgt (big-endian; the filename carries the
    georeference, so callers must name the file N##E###.hgt)."""
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        raise ValueError("HGT needs a square single-band grid")
    arr.astype(">i2").tofile(path)
    return path


def open_raster(path: str):
    """GDALOpen analog: identify the driver (extension + magic sniff)
    and return ``(array, geotransform | None, nodata | None)`` for any
    single-dataset raster format the engine reads (GTiff/BigTIFF/COG,
    PNG, JPEG, WebP-lossless, NITF, ENVI, AAIGrid, XYZ grid, SRTM HGT,
    Zarr store directory)."""
    low = path.lower()
    if os.path.isdir(path):
        from .zarrstore import zarr_meta, zarr_read
        meta = zarr_meta(path)
        return zarr_read(path), None, meta.get("fill_value")
    if low.endswith(".vrt"):
        from .vrtfile import vrt_read
        return vrt_read(path)
    if low.endswith(".hgt"):
        return srtmhgt_read(path)
    if low.endswith((".dt0", ".dt1", ".dt2")):
        from .dted import dted_read
        return dted_read(path)
    if low.endswith(".asc"):
        return aaigrid_read(path)
    if low.endswith(".xyz"):
        arr, gt = xyz_read_grid(path)
        return arr, gt, None
    if os.path.exists(path + ".hdr") or (
            low.endswith((".img", ".bsq", ".bil", ".bip"))
            and os.path.exists(os.path.splitext(path)[0] + ".hdr")):
        arr, gt = envi_read(path)
        return arr, gt, None
    with open(path, "rb") as f:
        head = f.read(16)
        f.seek(0)
        data = f.read()
    if head[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        from .gtiff import tiff_decode
        arr, meta = tiff_decode(data)
        return np.asarray(arr), meta.get("geotransform"), None
    if head[:9] == b"NITF02.10":
        from .nitf import nitf_decode
        arr, meta = nitf_decode(data)
        return arr, None, None
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        from .codecs import decode_image
        return decode_image(data, "png"), None, None
    if head[:2] == b"\xff\xd8":
        from .codecs import decode_image
        return decode_image(data, "jpeg"), None, None
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        from .codecs import decode_image
        return decode_image(data, "webp"), None, None
    if head[:6] in (b"GIF87a", b"GIF89a"):
        from .gifbmp import gif_decode
        return gif_decode(data), None, None
    if head[:2] == b"BM":
        from .gifbmp import bmp_decode
        return bmp_decode(data), None, None
    if head[:2] in (b"P2", b"P3", b"P5", b"P6") and head[2:3].isspace():
        from .gifbmp import pnm_decode
        return pnm_decode(data), None, None
    raise ValueError(f"open_raster: no driver identifies {path!r}")
