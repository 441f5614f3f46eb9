"""Blosc chunk container + LZ4 block codec — from scratch off the
public specs (c-blosc README_CHUNK_FORMAT.rst; lz4 lz4_Block_format.md).

The reference reads Blosc-compressed Zarr through the native c-blosc
library (frmts/zarr/zarrdriver.cpp); that library is unavailable in
this container, so this module implements the two public formats
directly so the Zarr store can read and write ``{"id": "blosc"}``
chunks:

* **LZ4 block format**: token / literal-run / 2-byte LE offset /
  match-run sequences, 64 KB window, end-of-block rules (last 5 bytes
  literal, no match starting in the final 12 bytes).  Decode is exact
  per spec; encode is a greedy hash-chain matcher (LZ4-fast shape:
  single-probe hash table + acceleration skip), with the 4-byte window
  hashes precomputed vectorized in numpy so the Python loop only does
  integer compares and slice copies.
* **Blosc1 chunk container**: 16-byte header (version, versionlz,
  flags, typesize, nbytes, blocksize, cbytes), ``bstarts`` int32 block
  offsets, per-block stream splitting (``shuffle && typesize > 1`` →
  ``typesize`` streams per block, matching c-blosc 1.x ``blosc_d``),
  each stream prefixed by an int32 csize and stored RAW when csize
  equals the stream size, whole-chunk memcpy fallback when compression
  does not pay.  Byte-shuffle is a vectorized numpy transpose.

Inner codecs supported: ``zlib`` (stdlib, the fast default for our own
writes) and ``lz4`` (this module).  ``blosclz``/``snappy``/``zstd``
streams and the bit-shuffle filter raise loudly.  Byte-level parity
with libblosc cannot be verified in this container (no native lib);
the formats are pinned by hand-built spec vectors for LZ4 decode,
header-layout pins, and hypothesis roundtrip fuzz (tests/test_blosc.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["lz4_compress", "lz4_decompress", "shuffle_bytes",
           "unshuffle_bytes", "blosc_encode", "blosc_decode"]

# -- LZ4 block format ---------------------------------------------------------

_MFLIMIT = 12          # no match may start within the last 12 bytes
_LASTLITERALS = 5      # the last 5 bytes are always literals
_MINMATCH = 4
_MAXOFFSET = 65535
_HASHLOG = 14
_HSIZE = 1 << _HASHLOG


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 block (lz4_Block_format.md) to exactly
    ``dst_size`` bytes."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if ll:
            out += src[i:i + ll]
            i += ll
        if i >= n:
            break                      # last sequence: literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("LZ4: zero offset")
        ml = (token & 15) + _MINMATCH
        if ml == 15 + _MINMATCH:
            while True:
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("LZ4: offset before block start")
        if off >= ml:
            out += out[start:start + ml]
        else:                          # overlapping match: repeat pattern
            seg = bytes(out[start:])
            while len(seg) < ml:
                seg = seg + seg
            out += seg[:ml]
    if len(out) != dst_size:
        raise ValueError(f"LZ4: decoded {len(out)} != expected {dst_size}")
    return bytes(out)


def _emit_sequence(out: bytearray, data: bytes, anchor: int, i: int,
                   off: int, ml: int) -> None:
    ll = i - anchor
    tok_ll = 15 if ll >= 15 else ll
    tok_ml = ml - _MINMATCH
    tok_mn = 15 if tok_ml >= 15 else tok_ml
    out.append((tok_ll << 4) | tok_mn)
    if ll >= 15:
        rest = ll - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data[anchor:i]
    out.append(off & 0xFF)
    out.append(off >> 8)
    if tok_ml >= 15:
        rest = tok_ml - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)


def _emit_last_literals(out: bytearray, data: bytes, anchor: int) -> None:
    ll = len(data) - anchor
    tok = 15 if ll >= 15 else ll
    out.append(tok << 4)
    if ll >= 15:
        rest = ll - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data[anchor:]


def lz4_compress(data: bytes, acceleration: int = 1) -> bytes:
    """Greedy single-probe LZ4 block encoder (the LZ4_compress_fast
    shape).  Valid per the block spec; ratio is within the fast-mode
    ballpark, not lz4hc."""
    n = len(data)
    out = bytearray()
    if n < _MFLIMIT + 1:
        _emit_last_literals(out, data, 0)
        return bytes(out)

    a = np.frombuffer(data, np.uint8)
    u32 = (a[:n - 3].astype(np.uint32)
           | (a[1:n - 2].astype(np.uint32) << 8)
           | (a[2:n - 1].astype(np.uint32) << 16)
           | (a[3:n].astype(np.uint32) << 24))
    hashes = ((u32 * np.uint32(2654435761)) >> np.uint32(32 - _HASHLOG))
    hl = hashes.tolist()               # Python-int indexing (NOTES fact 3)
    ul = u32.tolist()

    table = [-1] * _HSIZE
    match_limit = n - _MFLIMIT         # matches must start before here
    end_match = n - _LASTLITERALS      # matches may extend up to here
    anchor = 0
    i = 0
    searching = 1 << 6
    while i < match_limit:
        h = hl[i]
        cand = table[h]
        table[h] = i
        if cand >= 0 and i - cand <= _MAXOFFSET and ul[cand] == ul[i]:
            # extend the match forward (8-byte slice compares, then bytes)
            ml = _MINMATCH
            maxml = end_match - i
            while ml + 8 <= maxml and \
                    data[cand + ml:cand + ml + 8] == data[i + ml:i + ml + 8]:
                ml += 8
            while ml < maxml and data[cand + ml] == data[i + ml]:
                ml += 1
            # extend backward over pending literals
            while i > anchor and cand > 0 and data[i - 1] == data[cand - 1]:
                i -= 1
                cand -= 1
                ml += 1
            _emit_sequence(out, data, anchor, i, i - cand, ml)
            i += ml
            anchor = i
            searching = 1 << 6
        else:
            i += 1 + ((searching >> 6) - 1) * acceleration
            searching += 1
    _emit_last_literals(out, data, anchor)
    return bytes(out)


# -- byte shuffle filter ------------------------------------------------------

def shuffle_bytes(typesize: int, buf: bytes) -> bytes:
    """c-blosc byte shuffle: transpose an (nelem, typesize) byte matrix;
    the tail that does not fill an element is copied raw."""
    if typesize <= 1:
        return buf
    a = np.frombuffer(buf, np.uint8)
    n = len(a) - len(a) % typesize
    core = np.ascontiguousarray(a[:n].reshape(-1, typesize).T)
    return core.tobytes() + buf[n:]


def unshuffle_bytes(typesize: int, buf: bytes) -> bytes:
    if typesize <= 1:
        return buf
    a = np.frombuffer(buf, np.uint8)
    n = len(a) - len(a) % typesize
    core = np.ascontiguousarray(a[:n].reshape(typesize, -1).T)
    return core.tobytes() + buf[n:]


# -- Blosc1 chunk container ---------------------------------------------------

_BLOSC_VERSION = 2
_BLOSC_VERSIONLZ = 1
_F_SHUFFLE, _F_MEMCPY, _F_BITSHUFFLE = 0x1, 0x2, 0x4
_CODEC_BITS = {"blosclz": 0, "lz4": 1, "snappy": 2, "zlib": 3, "zstd": 4}
_BITS_CODEC = {v: k for k, v in _CODEC_BITS.items()}
# numcodecs shuffle constants: 0 = none, 1 = byte shuffle, 2 = bit shuffle
_DEFAULT_BLOCK = 1 << 20


def _inner_compress(cname: str, data: bytes, clevel: int) -> bytes:
    if cname == "zlib":
        return zlib.compress(data, min(max(clevel, 1), 9))
    if cname == "lz4":
        return lz4_compress(data)
    raise NotImplementedError(f"blosc inner codec {cname!r} not implemented "
                              "(supported: zlib, lz4)")


def _inner_decompress(cname: str, data: bytes, dst_size: int) -> bytes:
    if cname == "zlib":
        return zlib.decompress(data)
    if cname == "lz4":
        return lz4_decompress(data, dst_size)
    raise NotImplementedError(f"blosc inner codec {cname!r} not implemented "
                              "(supported: zlib, lz4)")


def blosc_encode(raw: bytes, typesize: int, *, cname: str = "zlib",
                 clevel: int = 5, shuffle: int = 1,
                 blocksize: int = 0) -> bytes:
    """Encode one Blosc1 chunk (README_CHUNK_FORMAT.rst layout)."""
    nbytes = len(raw)
    typesize = max(1, min(int(typesize), 255))
    if cname not in _CODEC_BITS:
        raise NotImplementedError(f"unknown blosc cname {cname!r}")
    codec_bits = _CODEC_BITS[cname] << 5
    if shuffle == 2:
        raise NotImplementedError("bit-shuffle filter not implemented")

    def _memcpy_chunk() -> bytes:
        header = struct.pack("<BBBBiii", _BLOSC_VERSION, _BLOSC_VERSIONLZ,
                             _F_MEMCPY | codec_bits, typesize, nbytes,
                             nbytes, nbytes + 16)
        return header + raw

    if clevel == 0 or nbytes == 0:
        return _memcpy_chunk()

    if blocksize <= 0:
        blocksize = min(nbytes, _DEFAULT_BLOCK)
    blocksize = max(typesize, blocksize - blocksize % typesize)
    nblocks = (nbytes + blocksize - 1) // blocksize

    doshuffle = bool(shuffle) and typesize > 1
    flags = (_F_SHUFFLE if doshuffle else 0) | codec_bits

    blobs = []
    for bi in range(nblocks):
        block = raw[bi * blocksize:(bi + 1) * blocksize]
        bsize = len(block)
        if doshuffle:
            block = shuffle_bytes(typesize, block)
        nsplits = typesize if (doshuffle and bsize % typesize == 0) else 1
        neblock = bsize // nsplits
        parts = bytearray()
        for j in range(nsplits):
            stream = block[j * neblock:(j + 1) * neblock]
            comp = _inner_compress(cname, stream, clevel)
            if len(comp) >= neblock:            # raw stream marker
                comp = stream
            parts += struct.pack("<i", len(comp))
            parts += comp
        blobs.append(bytes(parts))

    cbytes = 16 + 4 * nblocks + sum(len(b) for b in blobs)
    if cbytes >= nbytes + 16:
        return _memcpy_chunk()
    header = struct.pack("<BBBBiii", _BLOSC_VERSION, _BLOSC_VERSIONLZ,
                         flags, typesize, nbytes, blocksize, cbytes)
    bstarts = bytearray()
    pos = 16 + 4 * nblocks
    for b in blobs:
        bstarts += struct.pack("<i", pos)
        pos += len(b)
    return header + bytes(bstarts) + b"".join(blobs)


def blosc_decode(chunk: bytes) -> bytes:
    """Decode one Blosc1 chunk to its raw bytes."""
    if len(chunk) < 16:
        raise ValueError("blosc chunk shorter than its header")
    (version, _versionlz, flags, typesize, nbytes, blocksize,
     cbytes) = struct.unpack_from("<BBBBiii", chunk, 0)
    if version > _BLOSC_VERSION:
        raise ValueError(f"unsupported blosc format version {version}")
    if len(chunk) < cbytes:
        raise ValueError("blosc chunk truncated")
    if flags & _F_MEMCPY:
        return bytes(chunk[16:16 + nbytes])
    if flags & _F_BITSHUFFLE:
        raise NotImplementedError("bit-shuffle filter not implemented")
    cname = _BITS_CODEC.get(flags >> 5)
    if cname is None:
        raise ValueError(f"unknown blosc codec bits {flags >> 5}")
    doshuffle = bool(flags & _F_SHUFFLE) and typesize > 1

    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}i", chunk, 16)
    out = bytearray()
    for bi in range(nblocks):
        bsize = min(blocksize, nbytes - bi * blocksize)
        nsplits = typesize if (doshuffle and bsize % typesize == 0) else 1
        neblock = bsize // nsplits
        pos = bstarts[bi]
        parts = bytearray()
        for j in range(nsplits):
            (csize,) = struct.unpack_from("<i", chunk, pos)
            pos += 4
            stream = chunk[pos:pos + csize]
            pos += csize
            if csize == neblock:                # stored raw
                parts += stream
            else:
                parts += _inner_decompress(cname, stream, neblock)
        block = bytes(parts)
        if doshuffle:
            block = unshuffle_bytes(typesize, block)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc: decoded {len(out)} != header {nbytes}")
    return bytes(out)
