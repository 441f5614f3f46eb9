"""Overlay (clip/erase) + pansharpen/dither kernel tests."""

import numpy as np
import pytest

from georay import overlay as OV
from georay.geom import box_ring, parse_wkb, wkb_polygon


def test_polygon_area_and_convexity():
    sq = box_ring(0, 0, 4, 3)
    assert OV.polygon_area(sq) == pytest.approx(12.0)
    assert OV.is_convex(sq)
    lshape = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]],
                      dtype=np.float64)
    assert not OV.is_convex(lshape)


def test_clip_rect_rect():
    subj = box_ring(0, 0, 10, 10)
    clip = box_ring(5, 5, 15, 15)
    out = OV.clip_ring_convex(subj, clip)
    assert abs(OV.polygon_area(out)) == pytest.approx(25.0)
    # disjoint -> empty
    out2 = OV.clip_ring_convex(box_ring(0, 0, 2, 2), box_ring(5, 5, 6, 6))
    assert len(out2) == 0
    # fully inside -> unchanged area
    out3 = OV.clip_ring_convex(box_ring(6, 6, 8, 8), box_ring(5, 5, 15, 15))
    assert abs(OV.polygon_area(out3)) == pytest.approx(4.0)


def test_clip_concave_subject():
    # L-shape area 7, clipped by a square covering its upper arm
    lshape = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]],
                      dtype=np.float64)
    assert abs(OV.polygon_area(lshape)) == pytest.approx(7.0)
    out = OV.clip_ring_convex(lshape, box_ring(0, 2, 2, 5))
    assert abs(OV.polygon_area(out)) == pytest.approx(2.0)  # 1x2 strip


def test_clip_triangle_window():
    tri = np.array([[0, 0], [8, 0], [0, 8]], dtype=np.float64)  # area 32
    out = OV.clip_ring_convex(box_ring(0, 0, 8, 8), tri)
    assert abs(OV.polygon_area(out)) == pytest.approx(32.0)


def test_clip_layer_convex(ray_session):
    import pyarrow as pa
    import ray
    rows = {
        "pid": pa.array(["a", "b", "c"]),
        "wkb": pa.array([
            wkb_polygon([box_ring(0, 0, 10, 10)]),      # half inside
            wkb_polygon([box_ring(20, 20, 30, 30)]),    # outside
            wkb_polygon([box_ring(6, 6, 8, 8)]),        # fully inside
        ], pa.binary()),
        "minx": pa.array([0.0, 20.0, 6.0]), "miny": pa.array([0.0, 20.0, 6.0]),
        "maxx": pa.array([10.0, 30.0, 8.0]), "maxy": pa.array([10.0, 30.0, 8.0]),
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = OV.clip_layer_convex(ds, box_ring(5, 5, 15, 15)).to_pandas()
    got = dict(zip(out["pid"], out["clip_area"]))
    assert set(got) == {"a", "c"}
    assert got["a"] == pytest.approx(25.0)
    assert got["c"] == pytest.approx(4.0)
    # clipped geometry is valid WKB
    kind, rings = parse_wkb(out["wkb"].iloc[0])
    assert kind == "polygon"


def test_erase_layer_convex(ray_session):
    import pyarrow as pa
    import ray
    ds = ray.data.from_arrow(pa.table({
        "pid": pa.array(["a"]),
        "wkb": pa.array([wkb_polygon([box_ring(0, 0, 10, 10)])], pa.binary()),
    }))
    out = OV.erase_layer_convex(ds, box_ring(5, 5, 15, 15)).to_pandas()
    assert out["erase_area"].iloc[0] == pytest.approx(75.0)


def test_pansharpen_and_dither():
    from georay import fixtures as fx
    from georay.raster import (dither_floyd_steinberg, median_cut_palette,
                               pansharpen_brovey)
    rgb = fx.pattern(5, 24, 24)
    pan = rgb.mean(axis=2).astype(np.uint8)
    ps = pansharpen_brovey(pan, rgb)
    assert ps.shape == rgb.shape and ps.dtype == np.uint8
    # identical pan/pseudo-pan -> output ~= input
    assert np.abs(ps.astype(int) - rgb.astype(int)).mean() < 3
    pal = median_cut_palette(rgb, 16)
    assert pal.shape[1] == 3 and 1 <= pal.shape[0] <= 16
    idx = dither_floyd_steinberg(rgb, pal)
    assert idx.max() < pal.shape[0]
    # dithered reconstruction stays near the source on average
    recon = pal[idx]
    assert np.abs(recon.astype(int) - rgb.astype(int)).mean() < 40
