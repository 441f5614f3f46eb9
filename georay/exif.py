"""EXIF metadata in JPEG APP1 segments — reader AND writer from scratch.

The reference reads EXIF through gcore/gdalexif.cpp (tag-name table,
``EXIFOFFSETTAG 0x8769`` / ``GPSOFFSETTAG 0x8825`` sub-IFD chase) from
the JPEG driver's APP1 scan (frmts/jpeg/jpgdataset.cpp:215
``ReadEXIFMetadata``, APP1 marker 0xFFE1 + ``Exif\\0\\0`` signature).
Here:

* :func:`exif_parse` — scan JFIF markers for APP1/Exif, parse the
  embedded little/big-endian TIFF structure with the SAME IFD reader
  the GTiff driver uses (georay/gtiff.py ``_read_ifd``), follow the
  Exif and GPS sub-IFD pointers, and return ``EXIF_<Name>``-keyed
  values like the reference's metadata domain.
* :func:`exif_build` / :func:`jpeg_insert_app1` — emit a valid APP1
  payload (IFD0 + Exif IFD + GPS IFD, little-endian) and splice it
  after SOI, so pipelines can round-trip metadata through real bytes.
* :func:`exif_batch` — the Ray stage: one ``map_batches`` pure
  function appending typed metadata columns extracted from a binary
  image column (marker scan only — entropy-coded data is never
  touched, so this runs at memcpy speed per image).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .gtiff import _read_ifd

__all__ = ["exif_parse", "exif_build", "jpeg_insert_app1", "exif_batch"]

_EXIF_OFFSET = 0x8769
_GPS_OFFSET = 0x8825

# tag-id → name, the subset of gcore/gdalexif.cpp's tag tables we emit
_IFD0_NAMES = {0x010F: "Make", 0x0110: "Model", 0x0112: "Orientation",
               0x0132: "DateTime", 0x013B: "Artist",
               0x8298: "Copyright"}
_EXIF_NAMES = {0x829A: "ExposureTime", 0x829D: "FNumber",
               0x8827: "ISOSpeedRatings", 0x9201: "ShutterSpeedValue",
               0x9202: "ApertureValue", 0x920A: "FocalLength",
               0xA002: "PixelXDimension", 0xA003: "PixelYDimension"}
_GPS_NAMES = {0x0001: "GPSLatitudeRef", 0x0002: "GPSLatitude",
              0x0003: "GPSLongitudeRef", 0x0004: "GPSLongitude",
              0x0005: "GPSAltitudeRef", 0x0006: "GPSAltitude"}


def _find_app1(buf: bytes) -> bytes | None:
    """JFIF marker walk → first APP1 payload with the Exif signature
    (jpgdataset.cpp:329 scans the same way)."""
    n = len(buf)
    if n < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        return None
    off = 2
    while off + 4 <= n:
        if buf[off] != 0xFF:
            return None
        marker = buf[off + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            off += 2
            continue
        if marker == 0xDA:                   # SOS: entropy data follows
            return None
        (seglen,) = struct.unpack_from(">H", buf, off + 2)
        if marker == 0xE1 and buf[off + 4:off + 10] == b"Exif\x00\x00":
            return buf[off + 10:off + 2 + seglen]
        off += 2 + seglen
    return None


def exif_parse(buf: bytes) -> dict:
    """JPEG bytes → {"EXIF_Make": ..., "EXIF_GPSLatitude": (d, m, s), ...}
    (empty dict when no APP1/Exif present)."""
    tiff = _find_app1(bytes(buf))
    if tiff is None or len(tiff) < 8:
        return {}
    bo = tiff[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        return {}
    if struct.unpack_from(e + "H", tiff, 2)[0] != 42:
        return {}
    (ifd0_off,) = struct.unpack_from(e + "I", tiff, 4)
    mv = memoryview(tiff)
    out = {}
    try:
        tags, _ = _read_ifd(mv, ifd0_off, e)
    except (struct.error, IndexError):
        return {}
    for sub_tag, names in ((None, _IFD0_NAMES), (_EXIF_OFFSET, _EXIF_NAMES),
                           (_GPS_OFFSET, _GPS_NAMES)):
        cur = tags
        if sub_tag is not None:
            if sub_tag not in tags:
                continue
            try:
                cur, _ = _read_ifd(mv, int(tags[sub_tag][0]), e)
            except (struct.error, IndexError):
                continue
        for tid, vals in cur.items():
            name = names.get(tid)
            if name is None:
                continue
            out["EXIF_" + name] = vals[0] if len(vals) == 1 else vals
    return out


def _ifd_bytes(entries, base_off: int):
    """entries = [(tag, type, values)] → (ifd_bytes, extra_bytes).
    ``base_off`` is the TIFF offset where this IFD starts; out-of-line
    values are appended right after the IFD."""
    entries = sorted(entries)
    head = struct.pack("<H", len(entries))
    body = b""
    extra = b""
    extra_off = base_off + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        if typ == 2:                          # ASCII
            raw = vals.encode("ascii") + b"\x00"
            cnt = len(raw)
        elif typ == 5:                        # RATIONAL pairs
            raw = b"".join(struct.pack("<II", n, d) for n, d in vals)
            cnt = len(vals)
        elif typ == 3:
            raw = b"".join(struct.pack("<H", v) for v in vals)
            cnt = len(vals)
        else:                                 # LONG
            raw = b"".join(struct.pack("<I", v) for v in vals)
            cnt = len(vals)
        if len(raw) <= 4:
            slot = raw + b"\x00" * (4 - len(raw))
        else:
            slot = struct.pack("<I", extra_off + len(extra))
            extra += raw
        body += struct.pack("<HHI", tag, typ, cnt) + slot
    return head + body + struct.pack("<I", 0), extra


def exif_build(ifd0: dict | None = None, exif: dict | None = None,
               gps: dict | None = None) -> bytes:
    """Build an APP1 payload (``Exif\\0\\0`` + little-endian TIFF).

    Dicts map tag-id → (type, values): e.g.
    ``{0x010F: (2, "CamCo")}``, ``{0x829A: (5, [(1, 125)])}``."""
    ifd0 = dict(ifd0 or {})
    exif = dict(exif or {})
    gps = dict(gps or {})

    def entries(d):
        return [(t, typ, vals) for t, (typ, vals) in d.items()]

    # IFD0 gets pointer slots first so its size is known up front
    ifd0_entries = entries(ifd0)
    n0 = len(ifd0_entries) + (1 if exif else 0) + (1 if gps else 0)
    ifd0_base = 8

    # iteratively lay out: IFD0 | ifd0-extra | exifIFD | extra | gpsIFD
    def layout():
        e0 = list(ifd0_entries)
        pos = ifd0_base + 2 + 12 * n0 + 4
        # placeholder pointers; sizes below don't depend on their values
        chunks = []
        exif_off = gps_off = 0
        b0, x0 = _ifd_bytes(e0 + ([(_EXIF_OFFSET, 4, [0])] if exif else [])
                            + ([(_GPS_OFFSET, 4, [0])] if gps else []),
                            ifd0_base)
        pos = ifd0_base + len(b0) + len(x0)
        if exif:
            exif_off = pos
            b1, x1 = _ifd_bytes(entries(exif), exif_off)
            pos += len(b1) + len(x1)
            chunks.append((b1, x1))
        if gps:
            gps_off = pos
            b2, x2 = _ifd_bytes(entries(gps), gps_off)
            chunks.append((b2, x2))
        b0, x0 = _ifd_bytes(
            e0 + ([(_EXIF_OFFSET, 4, [exif_off])] if exif else [])
            + ([(_GPS_OFFSET, 4, [gps_off])] if gps else []), ifd0_base)
        return b0 + x0 + b"".join(b + x for b, x in chunks)

    tiff = struct.pack("<2sHI", b"II", 42, ifd0_base) + layout()
    return b"Exif\x00\x00" + tiff


def jpeg_insert_app1(jfif: bytes, payload: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (jpgdataset accepts APP1
    anywhere before SOS)."""
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("APP1 payload too large")
    seg = b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload
    return jfif[:2] + seg + jfif[2:]


def exif_batch(batch: pa.Table, bytes_col: str = "bytes") -> pa.Table:
    """map_batches stage: append EXIF columns (make, orientation,
    datetime, iso, exposure_s, gps_lat, gps_lon) parsed from real image
    bytes; missing tags become null/NaN."""
    bufs = batch.column(bytes_col).to_pylist()
    make, orient, dt, iso = [], [], [], []
    expo = np.full(len(bufs), np.nan)
    glat = np.full(len(bufs), np.nan)
    glon = np.full(len(bufs), np.nan)
    for i, b in enumerate(bufs):
        d = exif_parse(b) if b is not None else {}
        make.append(d.get("EXIF_Make"))
        orient.append(d.get("EXIF_Orientation"))
        dt.append(d.get("EXIF_DateTime"))
        iso.append(d.get("EXIF_ISOSpeedRatings"))
        if "EXIF_ExposureTime" in d:
            expo[i] = d["EXIF_ExposureTime"]
        if "EXIF_GPSLatitude" in d:
            dd, mm, ss = d["EXIF_GPSLatitude"]
            v = dd + mm / 60.0 + ss / 3600.0
            glat[i] = -v if d.get("EXIF_GPSLatitudeRef") == "S" else v
        if "EXIF_GPSLongitude" in d:
            dd, mm, ss = d["EXIF_GPSLongitude"]
            v = dd + mm / 60.0 + ss / 3600.0
            glon[i] = -v if d.get("EXIF_GPSLongitudeRef") == "W" else v
    return (batch
            .append_column("exif_make", pa.array(make, pa.string()))
            .append_column("exif_orientation", pa.array(orient, pa.int64()))
            .append_column("exif_datetime", pa.array(dt, pa.string()))
            .append_column("exif_iso", pa.array(iso, pa.int64()))
            .append_column("exif_exposure_s", pa.array(expo))
            .append_column("gps_lat", pa.array(glat))
            .append_column("gps_lon", pa.array(glon)))
