"""VP8L (WebP lossless) codec — from-scratch per the public bitstream
spec (reference scope: frmts/webp).  Every path is LOSSLESS: roundtrips
must be bit-exact."""

import numpy as np
import pytest

from georay.webp import (_BitReader, _BitWriter, _canonical_codes,
                         _code_lengths, _prefix_decode, _prefix_encode,
                         _read_code, _reverse_bits, _Tree, _write_code,
                         webp_decode, webp_encode)


def test_bit_io_roundtrip():
    rng = np.random.default_rng(0)
    fields = [(int(rng.integers(0, 1 << n)), n)
              for n in rng.integers(1, 25, 200)]
    bw = _BitWriter()
    for v, n in fields:
        bw.put(v, n)
    br = _BitReader(bw.finish())
    for v, n in fields:
        assert br.get(n) == v


def test_prefix_value_codes_invert():
    bw = _BitWriter()
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 120, 121, 4096, 65537]
    parts = []
    for v in vals:
        code, extra, ev = _prefix_encode(v)
        assert 0 <= code < 40
        parts.append((code, extra, ev))
        bw.put(ev, extra)
    br = _BitReader(bw.finish())
    for v, (code, extra, ev) in zip(vals, parts):
        assert _prefix_decode(code, br) == v


@pytest.mark.parametrize("alphabet,density", [(280, 0.9), (256, 0.3),
                                              (40, 0.05), (19, 0.5)])
def test_code_serialization_roundtrip(alphabet, density):
    rng = np.random.default_rng(alphabet)
    freqs = np.where(rng.random(alphabet) < density,
                     rng.integers(1, 1000, alphabet), 0)
    if freqs.sum() == 0:
        freqs[0] = 1
    lengths = _code_lengths(freqs)
    bw = _BitWriter()
    _write_code(bw, lengths)
    tree = _read_code(_BitReader(bw.finish()), alphabet)
    # decode every symbol through the rebuilt tree
    codes = _canonical_codes(lengths)
    emit_zero = np.count_nonzero(lengths) <= 1
    for s in np.flatnonzero(lengths):
        bw2 = _BitWriter()
        ln = 0 if emit_zero else int(lengths[s])
        bw2.put(_reverse_bits(int(codes[s]), ln), ln)
        bw2.put(0, 16)             # slack so peek never under-runs
        assert tree.read(_BitReader(bw2.finish())) == int(s)


def test_kraft_repair_depth_limit():
    # fibonacci-ish frequencies force depths beyond 15 without repair
    freqs = np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233,
                      377, 610, 987, 1597, 2584, 4181, 6765], np.int64)
    lengths = _code_lengths(freqs)
    assert lengths.max() <= 15
    kraft = np.sum(1.0 / (1 << lengths[lengths > 0]))
    assert kraft <= 1.0 + 1e-12


def test_rgb_rgba_gray_roundtrips():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    assert np.array_equal(webp_decode(webp_encode(img)), img)
    img4 = rng.integers(0, 256, (33, 57, 4), dtype=np.uint8)
    assert np.array_equal(webp_decode(webp_encode(img4)), img4)
    g = rng.integers(0, 256, (40, 41), dtype=np.uint8)
    assert np.array_equal(webp_decode(webp_encode(g)),
                          np.repeat(g[:, :, None], 3, axis=2))


def test_palette_and_runs():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    idx = np.repeat(rng.integers(0, 40, (16, 16)), 8, axis=0)
    img = pal[np.repeat(idx, 4, axis=1)]
    data = webp_encode(img)
    assert len(data) < img.size // 4       # palette+RLE must compress
    assert np.array_equal(webp_decode(data), img)


def test_constant_image_single_symbol_trees():
    c = np.full((100, 100, 3), 137, np.uint8)
    data = webp_encode(c)
    assert len(data) < 200
    assert np.array_equal(webp_decode(data), c)


def test_subtract_green_toggle():
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (32, 32, 1), dtype=np.uint8)
    img = np.clip(base + rng.integers(-8, 8, (32, 32, 3)), 0,
                  255).astype(np.uint8)
    with_sg = webp_encode(img, palette="off", subtract_green=True)
    without = webp_encode(img, palette="off", subtract_green=False)
    assert np.array_equal(webp_decode(with_sg), img)
    assert np.array_equal(webp_decode(without), img)
    # correlated channels: subtract-green should not be larger
    assert len(with_sg) <= len(without) * 1.02


def test_codecs_dispatch():
    from georay.codecs import decode_image, encode_image
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_image(img, "webp"),
                                       "webp"), img)


def test_decoder_rejects_unimplemented():
    with pytest.raises((ValueError, NotImplementedError)):
        webp_decode(b"RIFF\x00\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")


def test_predictor_transform_roundtrips():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:80, 0:96]
    grad = np.stack([(xx * 2 + yy) % 256, (xx + yy * 3) % 256,
                     (xx * 5) % 256], axis=2).astype(np.uint8)
    d = webp_encode(grad, palette="off", predictor=True)
    assert np.array_equal(webp_decode(d), grad)
    # the predictor must crush a linear gradient
    assert len(d) < grad.size // 20
    img4 = rng.integers(0, 256, (50, 33, 4), dtype=np.uint8)
    d4 = webp_encode(img4, palette="off", predictor=True)
    assert np.array_equal(webp_decode(d4), img4)


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 7, 3), (9, 1, 3),
                                   (17, 16, 3), (16, 17, 4)])
def test_predictor_odd_shapes(shape):
    rng = np.random.default_rng(sum(shape))
    im = rng.integers(0, 256, shape, dtype=np.uint8)
    d = webp_encode(im, palette="off", predictor=True)
    assert np.array_equal(webp_decode(d), im)


def test_predictor_inverse_all_modes_smoke():
    """Hand-built residual streams for every mode the encoder never
    emits (3/5/6/8/9/10/11/13) — inverse must run and be reproducible
    (their formulas come from the spec; encoder-made streams pin the
    {1,2,7,12} subset exactly)."""
    from georay.webp import _predictor_inverse

    rng = np.random.default_rng(5)
    res = rng.integers(0, 2**32, (12, 12), dtype=np.uint32)
    for mode in (0, 3, 4, 5, 6, 8, 9, 10, 11, 13):
        modes = np.full((2, 2), mode, np.int64)
        out1 = _predictor_inverse(res.copy(), 3, modes)
        out2 = _predictor_inverse(res.copy(), 3, modes)
        assert np.array_equal(out1, out2)


def test_cross_color_transform():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, (48, 40), dtype=np.int64)
    img = np.stack([
        np.clip(g // 2 + rng.integers(-5, 6, g.shape), 0, 255), g,
        np.clip(255 - g + rng.integers(-5, 6, g.shape), 0, 255),
    ], axis=2).astype(np.uint8)
    d_cc = webp_encode(img, palette="off", cross_color=True)
    d_sg = webp_encode(img, palette="off", subtract_green=True)
    assert np.array_equal(webp_decode(d_cc), img)
    # channel-correlated input: the fitted factors must win
    assert len(d_cc) < len(d_sg)
    im4 = rng.integers(0, 256, (30, 27, 4), dtype=np.uint8)
    d4 = webp_encode(im4, palette="off", cross_color=True)
    assert np.array_equal(webp_decode(d4), im4)
    for shape in [(1, 1, 3), (3, 1, 3), (1, 5, 4)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        d = webp_encode(im, palette="off", cross_color=True)
        assert np.array_equal(webp_decode(d), im), shape


def test_palette_pixel_bundling_roundtrips():
    """≤16-color palettes bundle 2/4/8 indices per green byte and the
    coded image narrows to ceil(w/ppb) — implied by palette size alone;
    roundtrip across every bundling width, RGBA, and odd dims."""
    import numpy as np

    from georay.webp import webp_decode, webp_encode
    rng = np.random.default_rng(5)
    for ncol in (2, 3, 4, 9, 16):
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (23, 37))]
        data = webp_encode(img)
        assert np.array_equal(webp_decode(data), img)
    pal = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    pal[:, 3] |= 1                      # distinct alphas
    img = pal[rng.integers(0, 4, (9, 13))]
    assert np.array_equal(webp_decode(webp_encode(img)), img)
    # 2-color image roundtrips through the 8-px/byte bundling width
    img2 = ((rng.integers(0, 2, (64, 64, 1)) * 255)
            * np.ones(3, np.uint8)).astype(np.uint8)
    assert np.array_equal(webp_decode(webp_encode(img2)), img2)


def test_meta_prefix_groups_roundtrip():
    """Meta-prefix groups: an entropy image selects per-block prefix
    code groups; the decoder reads it recursively and switches trees per
    pixel, the encoder splits top/bottom halves with distinct stats."""
    import numpy as np

    from georay.webp import webp_decode, webp_encode
    rng = np.random.default_rng(7)
    img = np.concatenate([
        rng.integers(0, 30, (16, 40, 3), dtype=np.uint8),
        rng.integers(200, 256, (16, 40, 3), dtype=np.uint8)])
    data = webp_encode(img, palette="off", meta_bits=3)
    assert np.array_equal(webp_decode(data), img)
    # single-block-row image: one group, still a valid meta stream
    small = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    data2 = webp_encode(small, palette="off", meta_bits=4)
    assert np.array_equal(webp_decode(data2), small)


def test_webp_encode_auto_picks_best_and_roundtrips():
    """Mode search: gradient → predictor stream (much smaller than
    subtract-green); noisy/palette inputs never regress; all roundtrip
    bit-exact."""
    import numpy as np
    from georay.webp import webp_decode, webp_encode, webp_encode_auto
    rng = np.random.default_rng(1)
    y, x = np.mgrid[0:48, 0:48]
    grad = np.stack([(x * 2 + y) % 256, (x + y * 2) % 256,
                     (x + y) % 256], -1).astype(np.uint8)
    noise = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    pal = (rng.integers(0, 4, (48, 48, 3)) * 60).astype(np.uint8)
    for img in (grad, noise, pal):
        auto = webp_encode_auto(img)
        assert (webp_decode(auto)[:, :, :3] == img).all()
        assert len(auto) <= len(webp_encode(img))
    assert len(webp_encode_auto(grad)) < 0.2 * len(webp_encode(grad))
