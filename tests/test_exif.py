"""EXIF APP1 reader/writer pins (georay/exif.py — gcore/gdalexif.cpp +
frmts/jpeg/jpgdataset.cpp ReadEXIFMetadata parity)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from georay.exif import exif_batch, exif_build, exif_parse, \
    jpeg_insert_app1
from georay.jpeg import jpeg_decode, jpeg_encode


def _sample_jpeg():
    base = jpeg_encode(np.arange(64, dtype=np.uint8).reshape(8, 8))
    app1 = exif_build(
        ifd0={0x010F: (2, "CamCo"), 0x0110: (2, "Model X"),
              0x0112: (3, [6]), 0x0132: (2, "2026:01:15 12:34:56")},
        exif={0x829A: (5, [(1, 128)]), 0x8827: (3, [400]),
              0xA002: (4, [8]), 0xA003: (4, [8])},
        gps={0x0001: (2, "N"), 0x0002: (5, [(10, 1), (30, 1), (1500, 100)]),
             0x0003: (2, "W"),
             0x0004: (5, [(20, 1), (15, 1), (900, 100)])})
    return jpeg_insert_app1(base, app1), base


def test_roundtrip_all_tags():
    jb, base = _sample_jpeg()
    d = exif_parse(jb)
    assert d["EXIF_Make"] == "CamCo"
    assert d["EXIF_Model"] == "Model X"
    assert d["EXIF_Orientation"] == 6
    assert d["EXIF_DateTime"] == "2026:01:15 12:34:56"
    assert d["EXIF_ExposureTime"] == pytest.approx(1 / 128)
    assert d["EXIF_ISOSpeedRatings"] == 400
    assert d["EXIF_PixelXDimension"] == 8
    assert d["EXIF_GPSLatitudeRef"] == "N"
    assert d["EXIF_GPSLatitude"] == (10.0, 30.0, 15.0)
    assert d["EXIF_GPSLongitudeRef"] == "W"
    # the spliced stream still decodes identically to the base image
    np.testing.assert_array_equal(np.asarray(jpeg_decode(jb)),
                                  np.asarray(jpeg_decode(base)))
    assert exif_parse(base) == {}


def test_big_endian_tiff_parses():
    # hand-built MM (big-endian) APP1: one IFD0 with Orientation=3
    tiff = struct.pack(">2sHI", b"MM", 42, 8)
    tiff += struct.pack(">H", 1)
    tiff += struct.pack(">HHIHH", 0x0112, 3, 1, 3, 0)
    tiff += struct.pack(">I", 0)
    payload = b"Exif\x00\x00" + tiff
    base = jpeg_encode(np.zeros((8, 8), np.uint8))
    d = exif_parse(jpeg_insert_app1(base, payload))
    assert d == {"EXIF_Orientation": 3}


def test_malformed_inputs_yield_empty():
    assert exif_parse(b"") == {}
    assert exif_parse(b"\xff\xd8\xff") == {}
    base = jpeg_encode(np.zeros((8, 8), np.uint8))
    # APP1 with garbage TIFF
    bad = jpeg_insert_app1(base, b"Exif\x00\x00garbagegarbage")
    assert exif_parse(bad) == {}
    # truncated IFD offset pointing past the buffer
    tiff = struct.pack("<2sHI", b"II", 42, 0xFFFF)
    assert exif_parse(jpeg_insert_app1(base, b"Exif\x00\x00" + tiff)) == {}


def test_exif_batch_columns():
    jb, base = _sample_jpeg()
    t = pa.table({"bytes": pa.array([jb, base, None], pa.binary())})
    out = exif_batch(t)
    assert out["exif_make"].to_pylist() == ["CamCo", None, None]
    assert out["exif_orientation"].to_pylist() == [6, None, None]
    lat = out["gps_lat"].to_pylist()
    assert lat[0] == pytest.approx(10 + 30 / 60 + 15 / 3600)
    assert np.isnan(lat[1])
    lon = out["gps_lon"].to_pylist()
    assert lon[0] == pytest.approx(-(20 + 15 / 60 + 9 / 3600))
