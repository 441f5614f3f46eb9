"""FLAC lossless audio codec from scratch (RFC 9639 / xiph spec) — the
reference ecosystem wraps libFLAC; this container has no native audio
library, so the engine carries its own spec-conformant implementation,
the same honesty framing as the from-scratch JPEG (jpeg.py) and VP8L
(webp.py) codecs.

Scope (all from the public spec):

* container: "fLaC" magic, STREAMINFO metadata block (incl. the MD5 of
  the unencoded little-endian sample stream, verified on decode)
* frames: sync + CRC-8 header (UTF-8-coded frame number, block size /
  sample-rate codes), CRC-16 footer
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + shift) — all DECODED; the encoder emits
  CONSTANT / VERBATIM / FIXED (order chosen per subframe by minimum
  absolute residual sum)
* stereo decorrelation: independent, left/side, right/side, mid/side —
  all decoded; the encoder picks mid/side vs independent per frame
* residuals: Rice partitions (method 0: 4-bit params, method 1: 5-bit),
  escape partitions (raw n-bit residuals), wasted-bits-per-sample

Decode hot path: the bitstream is unpacked once per frame
(``np.unpackbits``); Rice quotients resolve by ``searchsorted`` into
the precomputed positions of set bits, so the per-sample Python work is
one index step (the jpeg.py packed-chase floor).  Encode packs each
residual partition with one vectorized bit-scatter (no per-bit Python).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["flac_encode", "flac_decode"]

_MAGIC = b"fLaC"

# -- CRCs (spec polynomials) ------------------------------------------

def _crc_table(poly: int, bits: int) -> np.ndarray:
    top = 1 << (bits - 1)
    mask = (1 << bits) - 1
    tbl = np.empty(256, np.uint32)
    for b in range(256):
        r = b << (bits - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    t = _CRC8_TBL
    for b in data:
        r = int(t[(r ^ b) & 0xFF])
    return r


def _crc16(data: bytes) -> int:
    r = 0
    t = _CRC16_TBL
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ int(t[((r >> 8) ^ b) & 0xFF])
    return r


# -- bit IO ------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        # q zeros then a 1
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over an unpacked bit array; Rice quotients
    resolve via searchsorted into the set-bit position index."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.nonzero(self.bits)[0]
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError("flac: bitstream truncated")
        self.pos += n
        v = 0
        for bit in b:                       # n ≤ 32; scalar fold
            v = (v << 1) | int(bit)
        return v

    def read_unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= len(self.ones):
            raise ValueError("flac: bitstream truncated (unary)")
        stop = int(self.ones[i])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v


# -- UTF-8-style coded number (frame header) ---------------------------

def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):   # 2 bytes carry 11 bits, +5/byte
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * (nbytes - 2 - i))) & 0x3F))
    lead = (0xFF << (8 - nbytes)) & 0xFF
    lead |= n >> (6 * (nbytes - 1))
    return bytes([lead]) + bytes(out)


def _utf8_decode(rd) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (rd.read(8) & 0x3F)
    return v


# -- rice residual coding ----------------------------------------------

def _fold(res: np.ndarray) -> np.ndarray:
    """signed → unsigned zigzag (spec: 2n / -2n-1)."""
    r = res.astype(np.int64)
    return np.where(r >= 0, 2 * r, -2 * r - 1).astype(np.uint64)


def _best_k(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    mean = float(u.mean())
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_rice_partition(bw: _BitWriter, u: np.ndarray, k: int):
    """One vectorized bit-scatter per partition: each code is
    q zeros + 1 + k LSBs; total lengths are known up front, so the
    output bit array is filled positionally with numpy."""
    q = (u >> np.uint64(k)).astype(np.int64)
    lens = q + 1 + k
    total = int(lens.sum())
    ends = np.cumsum(lens)             # bit index just past each code
    bits = np.zeros(total, np.uint8)
    bits[ends - 1 - k] = 1             # the unary stop bit
    if k:
        low = (u & np.uint64((1 << k) - 1)).astype(np.uint64)
        for j in range(k):             # k ≤ 14 vector ops, not per-code
            bits[ends - k + j] = (low >> np.uint64(k - 1 - j)) \
                & np.uint64(1)
    # splice the bit block through the writer (byte-align fast path)
    for byte in np.packbits(bits[:total - (total % 8)]):
        bw.write(int(byte), 8)
    for bit in bits[total - (total % 8):]:
        bw.write(int(bit), 1)


def _read_rice_partition(rd: _BitReader, n: int, k: int) -> np.ndarray:
    u = np.empty(n, np.uint64)
    for i in range(n):
        q = rd.read_unary()
        u[i] = (q << k) | rd.read(k) if k else q
    r = u.astype(np.int64)
    return np.where(r & 1, -(r + 1) // 2, r // 2)


# -- predictors ---------------------------------------------------------

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warm: np.ndarray,
                   order: int) -> np.ndarray:
    """Invert ``order`` diff levels: level j's first value is
    diff^j(warm)[0]; each integration is one seeded cumsum."""
    seeds = []
    d = warm.astype(np.int64)
    for _ in range(order):
        seeds.append(int(d[0]))
        d = np.diff(d)
    out = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        out = seeds[j] + np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(out)])
    return out


# -- encoder ------------------------------------------------------------

def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int):
    n = len(x)
    if n and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)                       # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_o, best_res, best_cost = 0, None, None
    for o in range(0, min(4, n - 1) + 1):
        res = _fixed_residual(x, o)
        cost = int(np.abs(res).sum()) if len(res) else 0
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    # verbatim wins when residuals don't help (noise)
    u = _fold(best_res)
    k = _best_k(u)
    rice_bits = int((u >> np.uint64(k)).sum()) + (1 + k) * len(u) \
        + best_o * bps
    if rice_bits >= n * bps:
        bw.write(0, 1)
        bw.write(1, 6)                       # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    bw.write(0, 1)
    bw.write(8 | best_o, 6)                  # FIXED order
    bw.write(0, 1)                           # no wasted bits
    for v in x[:best_o]:
        bw.write(int(v) & ((1 << bps) - 1), bps)
    bw.write(0, 2)                           # residual method 0
    bw.write(0, 4)                           # partition order 0
    bw.write(k, 4)
    _write_rice_partition(bw, u, k)


def _le_sample_bytes(x: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian sample bytes (the spec's MD5 input);
    24-bit = 3 LE bytes per sample (the low 3 of each <i4 word)."""
    nb = (bps + 7) // 8
    if nb != 3:
        return np.ascontiguousarray(x.astype(f"<i{nb}")).tobytes()
    b4 = np.ascontiguousarray(x.astype("<i4")).view(np.uint8)
    return b4.reshape(-1, 4)[:, :3].tobytes()


_BS_CODE = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
            4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
            2048: 0b1011, 4096: 0b1100, 8192: 0b1101, 16384: 0b1110,
            32768: 0b1111}
_SR_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
            22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
            96000: 11}
_BPS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def flac_encode(samples: np.ndarray, sample_rate: int,
                bps: int = 16, block_size: int = 4096) -> bytes:
    """samples: (n,) mono or (n, ch) int array of ``bps``-bit signed
    values.  Spec-conformant stream: STREAMINFO w/ MD5, fixed-size
    frames, per-subframe FIXED/VERBATIM/CONSTANT choice, mid/side
    decorrelation for stereo when it shrinks the fold."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac: 1-8 channels")
    if bps not in _BPS_CODE:
        raise ValueError(f"flac: unsupported bps {bps}")
    x = x.astype(np.int64)
    md = hashlib.md5(_le_sample_bytes(x, bps))
    frames = []
    min_fs = max_fs = None
    for fi, s0 in enumerate(range(0, n, block_size)):
        blk = x[s0:s0 + block_size]
        fb = _encode_frame(blk, fi, sample_rate, bps, block_size)
        frames.append(fb)
        min_fs = len(fb) if min_fs is None else min(min_fs, len(fb))
        max_fs = max(max_fs or 0, len(fb))
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(min_fs or 0, 24)
    si.write(max_fs or 0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    info = si.bytes() + md.digest()
    head = bytes([0x80 | 0]) + len(info).to_bytes(3, "big") + info
    return _MAGIC + head + b"".join(frames)


def _encode_frame(blk: np.ndarray, fi: int, rate: int, bps: int,
                  block_size: int) -> bytes:
    n, ch = blk.shape
    chans = [blk[:, c] for c in range(ch)]
    assign = ch - 1
    sub_bps = [bps] * ch
    if ch == 2:
        mid = (blk[:, 0] + blk[:, 1]) >> 1
        side = blk[:, 0] - blk[:, 1]
        cost_ind = sum(int(np.abs(_fixed_residual(c, 2)).sum())
                       for c in chans)
        cost_ms = int(np.abs(_fixed_residual(mid, 2)).sum()) \
            + int(np.abs(_fixed_residual(side, 2)).sum())
        if cost_ms < cost_ind:
            assign = 10                       # mid/side
            chans = [mid, side]
            sub_bps = [bps, bps + 1]          # side carries 1 extra bit
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)                            # fixed block size strategy
    bs_code = _BS_CODE.get(n, 0b0111)         # 0b0111 = 16-bit field - 1
    bw.write(bs_code, 4)
    bw.write(_SR_CODE.get(rate, 0), 4)
    bw.write(assign, 4)
    bw.write(_BPS_CODE[bps], 3)
    bw.write(0, 1)
    for b in _utf8_encode(fi):
        bw.write(b, 8)
    if bs_code == 0b0111:
        bw.write(n - 1, 16)
    bw.align()
    hdr = bw.bytes()
    hdr += bytes([_crc8(hdr)])
    bw = _BitWriter()
    for c, sb in zip(chans, sub_bps):
        _encode_subframe(bw, c, sb)
    bw.align()
    body = hdr + bw.bytes()
    return body + _crc16(body).to_bytes(2, "big")


# -- decoder ------------------------------------------------------------

def _decode_subframe(rd: _BitReader, n: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("flac: bad subframe sync bit")
    t = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = 1 + rd.read_unary()
    bps -= wasted
    if t == 0:                                # CONSTANT
        v = rd.read_signed(bps)
        out = np.full(n, v, np.int64)
    elif t == 1:                              # VERBATIM
        out = np.array([rd.read_signed(bps) for _ in range(n)],
                       np.int64)
    elif 8 <= t <= 12:                        # FIXED
        order = t - 8
        warm = np.array([rd.read_signed(bps) for _ in range(order)],
                        np.int64)
        res = _decode_residual(rd, n, order)
        out = _fixed_restore(res, warm, order) if order \
            else res.astype(np.int64)
    elif t >= 32:                             # LPC
        order = t - 31
        warm = np.array([rd.read_signed(bps) for _ in range(order)],
                        np.int64)
        prec = rd.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision escape")
        shift = rd.read_signed(5)
        coefs = np.array([rd.read_signed(prec) for _ in range(order)],
                         np.int64)
        res = _decode_residual(rd, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        for i in range(order, n):             # inherently sequential IIR
            pred = int(np.dot(coefs, out[i - 1::-1][:order])) >> shift
            out[i] = pred + res[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    return out << wasted if wasted else out


def _decode_residual(rd: _BitReader, n: int, order: int) -> np.ndarray:
    method = rd.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    po = rd.read(4)
    nparts = 1 << po
    out = []
    for p in range(nparts):
        cnt = (n >> po) - (order if p == 0 else 0)
        k = rd.read(pbits)
        if k == (1 << pbits) - 1:             # escape: raw residuals
            raw_bits = rd.read(5)
            out.append(np.array(
                [rd.read_signed(raw_bits) if raw_bits else 0
                 for _ in range(cnt)], np.int64))
        else:
            out.append(_read_rice_partition(rd, cnt, k))
    return np.concatenate(out) if out else np.empty(0, np.int64)


_BS_DEC = {v: k for k, v in _BS_CODE.items()}
_SR_DEC = {v: k for k, v in _SR_CODE.items()}
_BPS_DEC = {v: k for k, v in _BPS_CODE.items()}


def flac_decode(data: bytes, verify_md5: bool = True):
    """→ (samples (n, ch) int64, sample_rate).  Verifies frame CRC-16s
    and the STREAMINFO MD5 (disable for streams from other encoders
    with unset MD5)."""
    if data[:4] != _MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        hdr = data[pos:pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            info = data[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    rd = _BitReader(info)
    rd.read(16)
    rd.read(16)
    rd.read(24)
    rd.read(24)
    rate = rd.read(20)
    ch = rd.read(3) + 1
    bps = rd.read(5) + 1
    total = rd.read(36)
    md5_want = info[18:34]
    out = np.empty((total, ch), np.int64)
    got = 0
    while got < total:
        frame_start = pos
        rd = _BitReader(data[pos:])
        if rd.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        rd.read(1)
        rd.read(1)
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        assign = rd.read(4)
        bps_code = rd.read(3)
        rd.read(1)
        _utf8_decode(rd)
        if bs_code == 0b0110:
            bsz = rd.read(8) + 1
        elif bs_code == 0b0111:
            bsz = rd.read(16) + 1
        else:
            bsz = _BS_DEC[bs_code]
        if sr_code == 12:
            rd.read(8)
        elif sr_code in (13, 14):
            rd.read(16)
        if rd.pos % 8:
            raise ValueError("flac: misaligned frame header")
        rd.read(8)                            # CRC-8 (recomputed below)
        hdr_len = rd.pos // 8
        if _crc8(data[pos:pos + hdr_len - 1]) \
                != data[pos + hdr_len - 1]:
            raise ValueError("flac: frame header CRC mismatch")
        fbps = _BPS_DEC.get(bps_code, bps)
        if assign <= 7:
            chans = [_decode_subframe(rd, bsz, fbps)
                     for _ in range(assign + 1)]
        elif assign == 8:                     # left/side
            left = _decode_subframe(rd, bsz, fbps)
            side = _decode_subframe(rd, bsz, fbps + 1)
            chans = [left, left - side]
        elif assign == 9:                     # right/side
            side = _decode_subframe(rd, bsz, fbps + 1)
            right = _decode_subframe(rd, bsz, fbps)
            chans = [right + side, right]
        elif assign == 10:                    # mid/side
            # encoder: mid = (l+r)>>1 (LSB lost), side = l-r; l+r and
            # side share parity, so l+r = 2·mid + (side & 1)
            mid = _decode_subframe(rd, bsz, fbps)
            side = _decode_subframe(rd, bsz, fbps + 1)
            left = (((mid << 1) | (side & 1)) + side) >> 1
            chans = [left, left - side]
        else:
            raise ValueError(f"flac: reserved channel assignment "
                             f"{assign}")
        rd.pos = (rd.pos + 7) & ~7
        body_len = rd.pos // 8
        crc_want = int.from_bytes(
            data[pos + body_len:pos + body_len + 2], "big")
        if _crc16(data[frame_start:frame_start + body_len]) != crc_want:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos += body_len + 2
        take = min(bsz, total - got)
        for c, arr in enumerate(chans):
            out[got:got + take, c] = arr[:take]
        got += take
    if verify_md5 and md5_want != b"\0" * 16:
        if hashlib.md5(_le_sample_bytes(out, bps)).digest() != md5_want:
            raise ValueError("flac: MD5 mismatch (decoded audio "
                             "differs from encoded)")
    return out, rate
