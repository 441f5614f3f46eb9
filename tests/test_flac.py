"""From-scratch FLAC codec (georay.flac): spec CRC vectors, UTF-8-coded
numbers, exact lossless roundtrips across bit depths / channel modes /
frame boundaries, LPC subframe decode vs a numpy reference, and the
multimodal wiring."""

import numpy as np
import pytest

from georay.flac import (_BitReader, _BitWriter, _crc8, _crc16,
                         _utf8_decode, _utf8_encode, flac_decode,
                         flac_encode)


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 published checks
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_utf8_coded_numbers():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1):
        rd = _BitReader(_utf8_encode(n))
        assert _utf8_decode(rd) == n


def test_mono_roundtrip_and_compression():
    t = np.arange(10000)
    x = (3000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    enc = flac_encode(x, 16000)
    dec, rate = flac_decode(enc)
    assert rate == 16000
    assert np.array_equal(dec[:, 0], x)
    assert len(enc) < 0.5 * 2 * len(x)       # beats raw PCM 2× on tones


def test_stereo_midside_roundtrip():
    rng = np.random.RandomState(7)
    t = np.arange(9000)
    l = (2000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int64)
    r = l + rng.randint(-20, 20, len(t))
    st = np.stack([l, r], 1)
    enc = flac_encode(st, 16000)
    dec, _ = flac_decode(enc)
    assert np.array_equal(dec, st)
    # correlated stereo engages mid/side: smaller than independent tone
    ind = flac_encode(np.stack([l, rng.randint(-32768, 32767, len(t))],
                               1), 16000)
    assert len(enc) < len(ind)


def test_noise_verbatim_and_constant():
    rng = np.random.RandomState(3)
    noise = rng.randint(-32768, 32767, 5000)
    assert np.array_equal(
        flac_decode(flac_encode(noise, 8000))[0][:, 0], noise)
    const = np.full(5000, -123)
    enc = flac_encode(const, 8000)
    assert np.array_equal(flac_decode(enc)[0][:, 0], const)
    assert len(enc) < 100                      # CONSTANT subframes


def test_bit_depths():
    rng = np.random.RandomState(5)
    for bps, lo, hi in ((8, -128, 127), (16, -32768, 32767),
                        (24, -(1 << 23), (1 << 23) - 1)):
        x = rng.randint(lo, hi, 3000)
        dec, _ = flac_decode(flac_encode(x, 44100, bps=bps))
        assert np.array_equal(dec[:, 0], x), bps


def test_md5_detects_corruption():
    x = (100 * np.sin(np.arange(5000) / 7)).astype(np.int64)
    enc = bytearray(flac_encode(x, 8000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34; flip one bit there
    enc[8 + 20] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(enc))


def test_lpc_subframe_decode():
    """The encoder emits FIXED only, so the LPC decode path is pinned by
    hand-crafting an LPC subframe bitstream (order 2, precision 4,
    shift 1) and comparing against the reference IIR recurrence."""
    from georay.flac import (_decode_subframe, _fold,
                             _write_rice_partition)
    order, prec, shift = 2, 4, 1
    coefs = [3, -2]
    warm = [100, 103]
    res = np.array([1, -2, 0, 3, -1, 2, 0, 0, 1, -3], np.int64)
    n = order + len(res)
    want = np.empty(n, np.int64)
    want[:order] = warm
    for i in range(order, n):
        pred = (coefs[0] * want[i - 1] + coefs[1] * want[i - 2]) >> shift
        want[i] = pred + res[i - order]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(32 | (order - 1), 6)              # LPC, order 2
    bw.write(0, 1)                             # no wasted bits
    for v in warm:
        bw.write(v & 0xFFFF, 16)
    bw.write(prec - 1, 4)
    bw.write(shift & 0x1F, 5)
    for c in coefs:
        bw.write(c & ((1 << prec) - 1), prec)
    bw.write(0, 2)                             # rice method 0
    bw.write(0, 4)                             # partition order 0
    u = _fold(res)
    k = 2
    bw.write(k, 4)
    _write_rice_partition(bw, u, k)
    bw.align()
    rd = _BitReader(bw.bytes())
    got = _decode_subframe(rd, n, 16)
    assert np.array_equal(got, want)


def test_multimodal_flac_wiring():
    from georay.multimodal import (audio_table, decode_audio,
                                   flac_audio_encode)
    t = np.arange(4000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 330 * t)
    data = flac_audio_encode(sig, 16000)
    arr, rate = decode_audio(data, "flac")
    assert rate == 16000
    # 16-bit quantization error only
    assert np.abs(arr - sig).max() < 1.0 / 32000
    tbl = audio_table(10).to_pandas()
    assert (tbl.codec == "flac").sum() == 2    # i%5==3 → rows 3 and 8
    row = tbl[tbl.codec == "flac"].iloc[0]
    arr2, _ = decode_audio(row["bytes"], "flac")
    assert len(arr2) == row.n_samples
