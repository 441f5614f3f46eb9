"""Blosc container + LZ4 block codec (georay/blosc.py).

LZ4 decode is pinned with HAND-BUILT spec vectors (streams written
byte-by-byte from lz4_Block_format.md, never produced by our encoder),
the encoder is fuzzed against the decoder, and the Blosc1 container is
pinned at the header-byte level and roundtripped through the Zarr
store (no native blosc/lz4 exists in this container to compare
against — the hand vectors are the spec anchor)."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from georay import blosc
from georay.blosc import (blosc_decode, blosc_encode, lz4_compress,
                          lz4_decompress, shuffle_bytes, unshuffle_bytes)


# -- LZ4 spec vectors (hand-built) -------------------------------------------

def test_lz4_decode_literals_only():
    # token 0x50: 5 literals, no match (last sequence)
    assert lz4_decompress(b"\x50hello", 5) == b"hello"


def test_lz4_decode_empty():
    assert lz4_decompress(b"\x00", 0) == b""


def test_lz4_decode_simple_match():
    # seq1: 1 literal 'a', match offset=1 len=14 (low nibble 10 = 14-4)
    # seq2 (last): 5 literals 'bcdef'
    src = b"\x1a" + b"a" + b"\x01\x00" + b"\x50" + b"bcdef"
    assert lz4_decompress(src, 20) == b"a" * 15 + b"bcdef"


def test_lz4_decode_overlapping_match_repeats_pattern():
    # 2 literals 'ab', match offset=2 len=10 -> 'ab'*6, then 5 literals
    src = b"\x26" + b"ab" + b"\x02\x00" + b"\x50" + b"XYZWV"
    assert lz4_decompress(src, 17) == b"ab" * 6 + b"XYZWV"


def test_lz4_decode_literal_length_extension():
    # lit len 15+255+3 = 273 via extension bytes 0xFF 0x03
    lits = bytes(range(256)) + b"Q" * 17
    src = b"\xf0" + b"\xff\x03" + lits
    assert lz4_decompress(src, 273) == lits


def test_lz4_decode_match_length_extension():
    # 1 literal, match len 19+255+2 = 276 at offset 1, then 5 literals
    src = b"\x1f" + b"z" + b"\x01\x00" + b"\xff\x02" + b"\x50" + b"ABCDE"
    assert lz4_decompress(src, 282) == b"z" * 277 + b"ABCDE"


def test_lz4_decode_match_ext_multiple_of_255():
    # match len 19+255+0 = 274: extension bytes 0xFF 0x00 (last byte <255)
    src = b"\x1f" + b"z" + b"\x01\x00" + b"\xff\x00" + b"\x50" + b"ABCDE"
    assert lz4_decompress(src, 280) == b"z" * 275 + b"ABCDE"


def test_lz4_decode_rejects_zero_offset():
    with pytest.raises(ValueError):
        lz4_decompress(b"\x1a" + b"a" + b"\x00\x00" + b"\x50" + b"bcdef", 20)


def test_lz4_decode_rejects_offset_past_start():
    with pytest.raises(ValueError):
        lz4_decompress(b"\x1a" + b"a" + b"\x05\x00" + b"\x50" + b"bcdef", 20)


def test_lz4_decode_rejects_wrong_size():
    with pytest.raises(ValueError):
        lz4_decompress(b"\x50hello", 9)


# -- LZ4 encoder --------------------------------------------------------------

def test_lz4_encode_respects_end_rules():
    # repetitive data long enough to force matches: the stream must end
    # with a literals-only sequence covering >= the last 5 bytes.
    data = b"0123456789" * 40
    comp = lz4_compress(data)
    assert lz4_decompress(comp, len(data)) == data
    assert len(comp) < len(data) // 2   # actually compresses


def test_lz4_encode_tiny_inputs_are_literal_only():
    for n in range(0, 13):
        data = bytes(range(n))
        comp = lz4_compress(data)
        # literal-only stream: token high nibble = n, low nibble = 0
        assert comp[0] == n << 4
        assert lz4_decompress(comp, n) == data


def test_lz4_encode_incompressible():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    comp = lz4_compress(data)
    assert lz4_decompress(comp, len(data)) == data


def test_lz4_roundtrip_long_runs_and_long_literals():
    data = b"\x00" * 100000 + bytes(range(256)) * 8 + b"\x00" * 3
    comp = lz4_compress(data)
    assert lz4_decompress(comp, len(data)) == data
    assert len(comp) < 3000


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2000),
       st.integers(min_value=1, max_value=8))
def test_lz4_roundtrip_fuzz(data, rep):
    data = data * rep
    assert lz4_decompress(lz4_compress(data), len(data)) == data


# -- shuffle filter -----------------------------------------------------------

def test_shuffle_is_byte_transpose():
    # elements [0x0100, 0x0302] little-endian -> bytes 00 01 02 03;
    # shuffle(2) groups byte-0s then byte-1s: 00 02 01 03
    assert shuffle_bytes(2, bytes([0, 1, 2, 3])) == bytes([0, 2, 1, 3])


def test_shuffle_tail_copied_raw():
    buf = bytes(range(10))  # typesize 4 -> 8-byte core + 2 raw tail
    sh = shuffle_bytes(4, buf)
    assert sh[8:] == buf[8:]
    assert unshuffle_bytes(4, sh) == buf


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=600),
       st.sampled_from([1, 2, 4, 8, 3]))
def test_shuffle_roundtrip_fuzz(buf, typesize):
    assert unshuffle_bytes(typesize, shuffle_bytes(typesize, buf)) == buf


# -- Blosc1 container ---------------------------------------------------------

def test_blosc_header_layout_pinned():
    raw = np.arange(1000, dtype="<i4").tobytes()
    chunk = blosc_encode(raw, 4, cname="zlib", clevel=5, shuffle=1)
    version, versionlz, flags, typesize, nbytes, blocksize, cbytes = \
        struct.unpack_from("<BBBBiii", chunk, 0)
    assert version == 2 and versionlz == 1
    assert flags & 0x1          # byte-shuffle flag
    assert flags >> 5 == 3      # zlib codec bits (c-blosc codec table)
    assert typesize == 4
    assert nbytes == 4000
    assert cbytes == len(chunk)
    assert blocksize % typesize == 0
    # single block here: one bstart pointing just past header + bstarts
    (bstart0,) = struct.unpack_from("<i", chunk, 16)
    assert bstart0 == 20


def test_blosc_memcpy_path():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    chunk = blosc_encode(raw, 1, cname="zlib", clevel=5, shuffle=0)
    flags = chunk[2]
    assert flags & 0x2          # memcpy flag: incompressible data stored raw
    assert chunk[16:] == raw
    assert blosc_decode(chunk) == raw


def test_blosc_clevel0_is_memcpy():
    raw = b"\x00" * 256
    chunk = blosc_encode(raw, 1, clevel=0)
    assert chunk[2] & 0x2 and blosc_decode(chunk) == raw


def test_blosc_shuffle_helps_structured_data():
    # int32 ramp: byte-shuffle groups the constant high bytes together
    raw = np.arange(50000, dtype="<i4").tobytes()
    sh = blosc_encode(raw, 4, cname="zlib", clevel=5, shuffle=1)
    plain = blosc_encode(raw, 4, cname="zlib", clevel=5, shuffle=0)
    assert len(sh) < len(plain)
    assert blosc_decode(sh) == raw
    assert blosc_decode(plain) == raw


def test_blosc_multiblock():
    raw = np.arange(300000, dtype="<i2").tobytes()   # 600 kB
    chunk = blosc_encode(raw, 2, cname="zlib", clevel=1, shuffle=1,
                         blocksize=65536)
    assert blosc_decode(chunk) == raw
    nbytes, blocksize, _ = struct.unpack_from("<iii", chunk, 4)
    assert blocksize == 65536 and (nbytes + blocksize - 1) // blocksize == 10


def test_blosc_lz4_inner():
    raw = np.arange(20000, dtype="<f8").tobytes()
    chunk = blosc_encode(raw, 8, cname="lz4", clevel=5, shuffle=1)
    assert chunk[2] >> 5 == 1   # lz4 codec bits
    assert blosc_decode(chunk) == raw


def test_blosc_raw_stream_marker():
    # shuffle splits an incompressible block into typesize streams; each
    # stream stays raw (csize == neblock) but the container still decodes
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 2**31, 1024, dtype="<i4").tobytes()
    chunk = blosc_encode(raw, 4, cname="zlib", clevel=5, shuffle=1)
    assert blosc_decode(chunk) == raw


def test_blosc_rejects_bitshuffle_and_unknown_codec():
    with pytest.raises(NotImplementedError):
        blosc_encode(b"x" * 64, 4, shuffle=2)
    with pytest.raises(NotImplementedError):
        blosc_encode(b"x" * 64, 4, cname="zstd")
    hdr = struct.pack("<BBBBiii", 2, 1, 0x4, 4, 64, 64, 16 + 4)
    with pytest.raises(NotImplementedError):
        blosc_decode(hdr + b"\x00" * 4)


@settings(max_examples=30, deadline=None)
@given(st.sampled_from(["<u1", "<i2", "<i4", "<f4", "<f8"]),
       st.sampled_from(["zlib", "lz4"]),
       st.sampled_from([0, 1]),
       st.integers(min_value=0, max_value=400))
def test_blosc_roundtrip_fuzz(dt, cname, shuffle, nelem):
    rng = np.random.default_rng(nelem)
    arr = (rng.integers(0, 50, nelem) - 25).astype(dt)
    raw = arr.tobytes()
    chunk = blosc_encode(raw, arr.dtype.itemsize, cname=cname,
                         shuffle=shuffle, clevel=5)
    assert blosc_decode(chunk) == raw


# -- Zarr integration ---------------------------------------------------------

def test_zarr_blosc_chunk_roundtrip(tmp_path):
    from georay import zarrstore as z
    path = str(tmp_path / "arr")
    meta = z.zarr_create(path, (50, 60), (16, 16), "<f4",
                         compressor="blosc", level=5)
    assert meta["compressor"]["id"] == "blosc"
    a = np.arange(50 * 60, dtype="<f4").reshape(50, 60)
    for i in range(4):
        for j in range(4):
            z.zarr_write_chunk(
                path, (i, j), a[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16],
                meta)
    got = z.zarr_read(path)
    np.testing.assert_array_equal(got, a)


def test_zarr_blosc_lz4_dict_compressor(tmp_path):
    from georay import zarrstore as z
    path = str(tmp_path / "arr")
    comp = {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
            "blocksize": 0}
    meta = z.zarr_create(path, (20, 20), (20, 20), "<i4", compressor=comp)
    a = (np.arange(400, dtype="<i4") % 97).reshape(20, 20)
    z.zarr_write_chunk(path, (0, 0), a, meta)
    # the chunk file on disk is a Blosc1 chunk with lz4 codec bits
    with open(str(tmp_path / "arr" / "0.0"), "rb") as f:
        chunk = f.read()
    assert chunk[2] >> 5 == 1
    np.testing.assert_array_equal(z.zarr_read(path), a)


def test_zarr_blosc_zlib_stream_is_plain_zlib(tmp_path):
    # single unshuffled stream: the inner bytes ARE a stdlib zlib stream
    raw = b"A" * 4096
    chunk = blosc_encode(raw, 1, cname="zlib", clevel=5, shuffle=0)
    (bstart,) = struct.unpack_from("<i", chunk, 16)
    (csize,) = struct.unpack_from("<i", chunk, bstart)
    assert zlib.decompress(chunk[bstart + 4:bstart + 4 + csize]) == raw
