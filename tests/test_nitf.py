"""NITF 2.1 minimal profile: roundtrips, header arithmetic, IGEOLO."""
import numpy as np
import pytest

from georay.nitf import nitf_decode, nitf_encode


def test_mono_uint8_roundtrip():
    rng = np.random.RandomState(7)
    arr = (rng.rand(33, 47) * 255).astype(np.uint8)
    b = nitf_encode(arr, title="mono test")
    assert b[:9] == b"NITF02.10"
    back, meta = nitf_decode(b)
    assert np.array_equal(back, arr)
    assert meta["title"] == "mono test"
    assert meta["nbands"] == 1
    # FL field equals the actual byte length
    assert int(b[sum(w for _, w in
                     __import__("georay.nitf", fromlist=["x"])
                     ._FILE_HEADER[:-2]):][:12]) == len(b)


def test_multiband_uint8_and_uint16():
    rng = np.random.RandomState(8)
    rgb = (rng.rand(21, 19, 3) * 255).astype(np.uint8)
    back, meta = nitf_decode(nitf_encode(rgb))
    assert np.array_equal(back, rgb) and meta["nbands"] == 3
    u16 = (rng.rand(14, 11) * 60000).astype(np.uint16)
    back16, _ = nitf_decode(nitf_encode(u16))
    assert back16.dtype == np.uint16
    assert np.array_equal(back16, u16)


def test_igeolo_decimal_corners():
    arr = np.zeros((100, 200), np.uint8)
    gt = (-122.5, 0.001, 0.0, 45.25, 0.0, -0.0005)
    b = nitf_encode(arr, geotransform=gt)
    _, meta = nitf_decode(b)
    assert meta["icords"] == "D"
    (ul, ur, lr, ll) = meta["corners"]
    assert ul == pytest.approx((-122.5, 45.25), abs=1e-3)
    assert ur == pytest.approx((-122.5 + 0.2, 45.25), abs=1e-3)
    assert lr == pytest.approx((-122.3, 45.2), abs=1e-3)
    assert ll == pytest.approx((-122.5, 45.2), abs=1e-3)


def test_truncated_rejects():
    arr = np.zeros((5, 5), np.uint8)
    b = nitf_encode(arr)
    with pytest.raises(Exception):
        nitf_decode(b"JUNK" + b[4:])


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40),
       st.sampled_from([1, 3]), st.booleans())
def test_nitf_roundtrip_property(h, w, nb, wide):
    rng = np.random.RandomState(h * 41 + w)
    if wide:
        arr = (rng.rand(h, w, nb) * 60000).astype(np.uint16)
    else:
        arr = (rng.rand(h, w, nb) * 255).astype(np.uint8)
    if nb == 1:
        arr = arr[:, :, 0]
    back, meta = nitf_decode(nitf_encode(arr))
    assert np.array_equal(back, arr)
    assert meta["nbands"] == nb


def test_nitf_multi_block_roundtrip():
    """NBPR×NBPC blocking: non-multiple dims exercise the zero-padded
    partial blocks; single-band and multiband-IMODE-P grids both
    roundtrip pixel-exact, and blocked == unblocked decode."""
    import numpy as np

    from georay.nitf import nitf_decode, nitf_encode
    rng = np.random.default_rng(11)
    mono = rng.integers(0, 255, size=(37, 53)).astype(np.uint8)
    b = nitf_encode(mono, blocksize=16)
    back, meta = nitf_decode(b)
    assert np.array_equal(back, mono)
    # header carries the block grid (NBPR=ceil(53/16)=4, NBPC=3)
    assert b.find(b"0004" + b"0003" + b"0016" + b"0016") > 0

    rgb16 = rng.integers(0, 65535, size=(30, 31, 3)).astype(np.uint16)
    blocked = nitf_encode(rgb16, blocksize=13)
    unblocked = nitf_encode(rgb16)
    a1, _ = nitf_decode(blocked)
    a2, _ = nitf_decode(unblocked)
    assert np.array_equal(a1, rgb16) and np.array_equal(a2, rgb16)

    # exact multiple: no padding path
    sq = rng.integers(0, 255, size=(32, 32)).astype(np.uint8)
    assert np.array_equal(nitf_decode(nitf_encode(sq, blocksize=16))[0],
                          sq)
