"""GeoTIFF codec (georay/gtiff.py) vs the public TIFF 6.0 spec and the
COG layout: roundtrips over dtype × compression × predictor, GeoKey
recovery, the spec's own PackBits worked example, a hand-crafted
big-endian file, and the IFDs-before-pixel-data COG property."""

import struct

import numpy as np
import pytest

from georay.gtiff import (cog_encode, lzw_decode, lzw_encode,
                          packbits_decode, packbits_encode, tiff_decode,
                          tiff_encode)

_GT = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)


def test_roundtrip_matrix():
    rng = np.random.default_rng(0)
    arrays = [rng.integers(0, 255, (37, 53), dtype=np.uint8),
              rng.integers(0, 65535, (20, 31, 3)).astype(np.uint16),
              rng.standard_normal((16, 17)).astype(np.float32),
              rng.standard_normal((9, 9)).astype(np.float64)]
    for arr in arrays:
        preds = (1, 2) if arr.dtype.kind in "ui" else (1,)
        for comp in ("none", "deflate", "packbits", "lzw"):
            for pred in preds:
                out, _ = tiff_decode(tiff_encode(
                    arr, compression=comp, predictor=pred))
                assert out.dtype == arr.dtype
                assert np.array_equal(out, arr), (comp, pred, arr.dtype)


def test_predictor2_rejected_for_float():
    with pytest.raises(ValueError, match="integer-only"):
        tiff_encode(np.zeros((4, 4), np.float32), predictor=2)


def test_geotiff_keys_roundtrip():
    a = np.arange(100, dtype=np.uint8).reshape(10, 10)
    for crs, key in [("EPSG:32631", 3072), ("EPSG:4326", 2048)]:
        b = tiff_encode(a, geotransform=_GT, crs=crs)
        _, meta = tiff_decode(b)
        assert np.allclose(meta["geotransform"], _GT)
        assert meta["crs"] == crs


def test_packbits_spec_worked_example():
    """The exact worked example from TIFF 6.0 §9."""
    packed = bytes.fromhex("FEAA02 80002A FDAA03 80002A22 F7AA"
                           .replace(" ", ""))
    unpacked = bytes.fromhex(
        "AAAAAA 80002A AAAAAAAA 80002A22 AAAAAAAAAAAAAAAAAAAA"
        .replace(" ", ""))
    assert packbits_decode(packed, len(unpacked)) == unpacked
    # our own packing must round-trip through our decoder too
    assert packbits_decode(packbits_encode(unpacked),
                           len(unpacked)) == unpacked


def test_lzw_long_stream_with_clears():
    rng = np.random.default_rng(1)
    data = bytes(rng.integers(0, 8, 200000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_big_endian_read():
    """Hand-crafted MM (big-endian) uncompressed 2×3 grayscale."""
    pix = bytes([10, 20, 30, 40, 50, 60])
    n = 8
    entries = [(256, 3, 1, 3 << 16), (257, 3, 1, 2 << 16),
               (258, 3, 1, 8 << 16), (259, 3, 1, 1 << 16),
               (262, 3, 1, 1 << 16),
               (273, 4, 1, 8 + 2 + 12 * n + 4),
               (277, 3, 1, 1 << 16), (279, 4, 1, 6)]
    buf = struct.pack(">2sHI", b"MM", 42, 8) + struct.pack(">H", n)
    for tag, typ, cnt, val in entries:
        buf += struct.pack(">HHII", tag, typ, cnt, val)
    buf += struct.pack(">I", 0) + pix
    out, _ = tiff_decode(buf)
    assert out.shape == (2, 3)
    assert np.array_equal(out.ravel(), np.frombuffer(pix, np.uint8))


def test_cog_layout_and_overviews():
    rng = np.random.default_rng(2)
    big = rng.integers(0, 255, (700, 900, 3), dtype=np.uint8)
    b = cog_encode(big, geotransform=_GT, crs="EPSG:32631", predictor=2)
    full, meta = tiff_decode(b)
    assert np.array_equal(full, big)
    assert meta["levels"] == [(700, 900), (350, 450)]
    # overview is the exact 2×2 AVERAGE reduction
    ov1, _ = tiff_decode(b, overview=1)
    want = big.reshape(350, 2, 450, 2, 3).astype(np.float64).mean((1, 3))
    assert np.array_equal(ov1, np.rint(want).astype(np.uint8))
    # COG property: every IFD and tag value precedes every tile byte —
    # walk the IFD chain, record max structural offset and min tile
    # offset from the raw bytes
    data = memoryview(b)
    off = struct.unpack_from("<I", data, 4)[0]
    max_struct, min_tile = 0, 1 << 62
    while off:
        cnt = struct.unpack_from("<H", data, off)[0]
        max_struct = max(max_struct, off + 2 + 12 * cnt + 4)
        for i in range(cnt):
            tag, typ, c, v = struct.unpack_from("<HHII", data,
                                                off + 2 + 12 * i)
            if tag == 324:
                voff = v if c > 1 else off + 2 + 12 * i + 8
                tile0 = struct.unpack_from("<I", data, voff)[0]
                min_tile = min(min_tile, tile0)
        off = struct.unpack_from("<I", data, off + 2 + 12 * cnt)[0]
    assert max_struct < min_tile


def test_tiled_non_multiple_dims():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 65535, (300, 277)).astype(np.uint16)
    out, _ = tiff_decode(cog_encode(a, tile=128, min_overview=10_000))
    assert np.array_equal(out, a)


def test_codec_dispatch():
    from georay.codecs import decode_image, encode_image
    rng = np.random.default_rng(4)
    a = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_image(a, "tiff"), "tiff"),
                          a)


import georay.gtiff as G


def test_bigtiff_roundtrip_strips_and_cog():
    """BigTIFF (magic 43, IFD8, u64 offsets): striped + COG encodes
    decode to identical pixels/geo as the classic layout."""
    rng = np.random.RandomState(9)
    arr = (rng.rand(70, 90, 3) * 255).astype(np.uint8)
    gt = (500000.0, 10.0, 0.0, 4600000.0, 0.0, -10.0)
    for comp in ("deflate", "none", "lzw"):
        big = G.tiff_encode(arr, compression=comp, geotransform=gt,
                            crs="EPSG:32631", bigtiff=True)
        assert big[2:4] == b"\x2b\x00"           # magic 43
        a, meta = G.tiff_decode(big)
        classic, meta2 = G.tiff_decode(
            G.tiff_encode(arr, compression=comp, geotransform=gt,
                          crs="EPSG:32631"))
        assert np.array_equal(a, classic)
        assert meta["geotransform"] == meta2["geotransform"]
    big_arr = (rng.rand(300, 420, 3) * 255).astype(np.uint8)
    cogb = G.cog_encode(big_arr, tile=64, geotransform=gt,
                        crs="EPSG:32631", bigtiff=True,
                        min_overview=128)
    a, meta = G.tiff_decode(cogb)
    classic = G.cog_encode(big_arr, tile=64, geotransform=gt,
                           crs="EPSG:32631", min_overview=128)
    ac, metac = G.tiff_decode(classic)
    assert np.array_equal(np.asarray(a), np.asarray(ac))
    assert meta["levels"] == metac["levels"] and len(meta["levels"]) >= 2
    ov, _ = G.tiff_decode(cogb, overview=1)
    ovc, _ = G.tiff_decode(classic, overview=1)
    assert np.array_equal(np.asarray(ov), np.asarray(ovc))
