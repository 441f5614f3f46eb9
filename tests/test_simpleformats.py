"""ENVI / AAIGrid / XYZ-grid drivers: roundtrips + georeference math."""
import numpy as np
import pytest

from georay.simpleformats import (aaigrid_read, aaigrid_write,
                                  envi_read, envi_write, xyz_read_grid)


def test_envi_roundtrip_interleaves(tmp_path):
    rng = np.random.RandomState(2)
    arr = (rng.rand(13, 17, 3) * 1000).astype(np.uint16)
    gt = (500.25, 2.5, 0.0, 8000.75, 0.0, -2.5)
    for il in ("bsq", "bil", "bip"):
        p = str(tmp_path / f"r_{il}.img")
        envi_write(p, arr, geotransform=gt, interleave=il)
        back, gt2 = envi_read(p)
        assert np.array_equal(back, arr), il
        assert gt2 == pytest.approx(gt)


def test_envi_single_band_and_dtypes(tmp_path):
    for dt in (np.uint8, np.int16, np.int32, np.float32, np.float64):
        arr = np.arange(20, dtype=dt).reshape(4, 5)
        p = str(tmp_path / f"b_{np.dtype(dt).name}.img")
        envi_write(p, arr)
        back, _ = envi_read(p)
        assert back.dtype == np.dtype(dt)
        assert np.array_equal(back, arr)


def test_aaigrid_roundtrip(tmp_path):
    arr = np.array([[1, 2, 3], [4, -9999, 6]], dtype=np.int64)
    gt = (100.0, 5.0, 0.0, 210.0, 0.0, -5.0)
    p = str(tmp_path / "g.asc")
    aaigrid_write(p, arr, geotransform=gt, nodata=-9999)
    back, gt2, nd = aaigrid_read(p)
    assert np.array_equal(back, arr)
    assert gt2 == pytest.approx(gt)
    assert nd == -9999
    # float payload
    arrf = np.array([[0.5, 1.25], [2.0, -3.75]])
    p2 = str(tmp_path / "g2.asc")
    aaigrid_write(p2, arrf, geotransform=(0, 0.25, 0, 1, 0, -0.25))
    backf, _, _ = aaigrid_read(p2)
    assert np.allclose(backf, arrf)


def test_xyz_grid_read(tmp_path):
    # build from a known grid through the engine's own xyz writer path:
    # cell centers, top row = max y
    h, w = 4, 6
    gt = (10.0, 2.0, 0.0, 50.0, 0.0, -2.0)
    arr = np.arange(h * w, dtype=np.float64).reshape(h, w)
    lines = []
    for r in range(h):
        for c in range(w):
            x = gt[0] + (c + 0.5) * gt[1]
            y = gt[3] + (r + 0.5) * gt[5]
            lines.append(f"{x} {y} {arr[r, c]}")
    # scrambled order must not matter
    import random
    random.Random(1).shuffle(lines)
    p = str(tmp_path / "g.xyz")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    grid, gt2 = xyz_read_grid(p)
    assert np.array_equal(grid, arr)
    assert gt2 == pytest.approx(gt)


def test_xyz_irregular_raises(tmp_path):
    p = str(tmp_path / "bad.xyz")
    with open(p, "w") as f:
        f.write("0 0 1\n1 0 2\n3 0 3\n0 1 4\n1 1 5\n3 1 6\n")
    with pytest.raises(ValueError):
        xyz_read_grid(p)


def test_srtmhgt_roundtrip(tmp_path):
    from georay.simpleformats import srtmhgt_read, srtmhgt_write
    rng = np.random.RandomState(4)
    arr = (rng.randn(1201, 1201) * 500).astype(np.int16)
    arr[5, 7] = -32768
    p = str(tmp_path / "N37W123.hgt")
    srtmhgt_write(p, arr)
    back, gt, nd = srtmhgt_read(p)
    assert np.array_equal(back, arr)
    assert nd == -32768
    step = 1.0 / 1200
    assert gt[1] == pytest.approx(step) and gt[5] == pytest.approx(-step)
    # corner samples sit exactly on the integer graticule
    assert gt[0] + 0.5 * gt[1] == pytest.approx(-123.0)
    assert gt[3] + 0.5 * gt[5] == pytest.approx(38.0)
    # southern/eastern hemisphere name parse
    p2 = str(tmp_path / "S02E045.hgt")
    srtmhgt_write(p2, arr[:3, :3].copy() if False else
                  np.zeros((1201, 1201), np.int16))
    _, gt2, _ = srtmhgt_read(p2)
    assert gt2[0] + 0.5 * gt2[1] == pytest.approx(45.0)
    assert gt2[3] + 0.5 * gt2[5] == pytest.approx(-1.0)


def test_open_raster_dispatch(tmp_path):
    from georay.gtiff import tiff_encode
    from georay.simpleformats import open_raster, srtmhgt_write

    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    gt = (0.0, 1.0, 0.0, 5.0, 0.0, -1.0)
    # GTiff (classic + big)
    for big in (False, True):
        p = str(tmp_path / f"t{big}.tif")
        with open(p, "wb") as f:
            f.write(tiff_encode(arr, geotransform=gt, crs="EPSG:4326",
                                bigtiff=big))
        a, g, _ = open_raster(p)
        assert np.array_equal(np.asarray(a), arr)
        assert tuple(g) == pytest.approx(gt)
    # ENVI
    p = str(tmp_path / "e.img")
    envi_write(p, arr, geotransform=gt)
    a, g, _ = open_raster(p)
    assert np.array_equal(a, arr)
    # AAIGrid
    p = str(tmp_path / "g.asc")
    aaigrid_write(p, arr.astype(np.int64), geotransform=gt, nodata=-1)
    a, g, nd = open_raster(p)
    assert np.array_equal(a, arr) and nd == -1
    # HGT
    p = str(tmp_path / "N00E000.hgt")
    srtmhgt_write(p, np.zeros((1201, 1201), np.int16))
    a, g, nd = open_raster(p)
    assert a.shape == (1201, 1201) and nd == -32768
    # NITF
    from georay.nitf import nitf_encode
    p = str(tmp_path / "x.ntf")
    with open(p, "wb") as f:
        f.write(nitf_encode(arr))
    a, _, _ = open_raster(p)
    assert np.array_equal(a, arr)
    with pytest.raises(ValueError):
        bad = str(tmp_path / "junk.bin")
        with open(bad, "wb") as f:
            f.write(b"nonsense")
        open_raster(bad)


class TestDTED:
    """DTED MIL-PRF-89020B driver (georay/dted.py): signed-magnitude
    columns, per-record checksums, UHL georeference."""

    def test_roundtrip_and_georef(self, tmp_path):
        import numpy as np

        from georay.dted import DTED_NODATA, dted_read, dted_write
        rng = np.random.default_rng(7)
        arr = rng.integers(-5000, 9000, size=(121, 121)).astype(np.int16)
        arr[3, 5] = DTED_NODATA
        arr[0, 0] = -1            # sign bit exercised at the north edge
        p = str(tmp_path / "n37w123.dt0")
        dted_write(p, arr, ll_lat=37.0, ll_lon=-123.0)
        got, gt, nodata = dted_read(p)
        assert np.array_equal(got, arr)
        assert nodata == DTED_NODATA
        step = 1.0 / 120
        assert abs(gt[0] - (-123.0 - step / 2)) < 1e-12
        assert abs(gt[3] - (37.0 + 1 + step / 2)) < 1e-12
        assert abs(gt[1] - step) < 1e-12 and abs(gt[5] + step) < 1e-12

    def test_checksum_detects_corruption(self, tmp_path):
        import numpy as np
        import pytest

        from georay.dted import dted_read, dted_write
        arr = np.arange(49, dtype=np.int16).reshape(7, 7) - 10
        p = str(tmp_path / "n00e000.dt2")
        dted_write(p, arr, ll_lat=0.0, ll_lon=0.0)
        raw = bytearray(open(p, "rb").read())
        raw[80 + 648 + 2700 + 9] ^= 0x01   # flip one elevation byte
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="checksum"):
            dted_read(p)
        got, _, _ = dted_read(p, verify_checksums=False)
        assert got.shape == (7, 7)

    def test_open_raster_dispatch(self, tmp_path):
        import numpy as np

        from georay.dted import dted_write
        from georay.simpleformats import open_raster
        arr = (np.ones((5, 5)) * 42).astype(np.int16)
        p = str(tmp_path / "s10e020.dt1")
        dted_write(p, arr, ll_lat=-10.0, ll_lon=20.0)
        got, gt, nodata = open_raster(p)
        assert np.array_equal(got, arr) and nodata == -32767
        assert gt[0] < 20.0 < gt[0] + gt[1]   # west edge near 20°E
