"""Curve geometry types (georay.curves): CircularString / CompoundCurve /
CurvePolygon parse, exact arc lengths, linearization quality, and the
batch linearize stage feeding downstream measure kernels."""

import numpy as np
import pytest

from georay.curves import (
    arc_center, arc_length, curve_lengths, linearize_arc, linearize_batch,
    linearize_wkb, wkb_circularstring, wkb_compoundcurve, wkb_curvepolygon,
    wkb_linestring,
)

R2 = np.sqrt(0.5)


def _poly_area(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def test_arc_center_and_degenerate():
    ctr, r = arc_center([2, 0], [0, 2], [-2, 0])
    assert ctr == pytest.approx([0.0, 0.0], abs=1e-12)
    assert r == pytest.approx(2.0, abs=1e-12)
    assert arc_center([0, 0], [1, 1], [2, 2]) is None
    # translation far from origin keeps precision
    ctr, r = arc_center([1002, 500], [1000, 502], [998, 500])
    assert ctr == pytest.approx([1000.0, 500.0], abs=1e-9)


def test_arc_sweep_directions():
    # CCW quarter: (1,0) via (r2,r2) to (0,1)
    a = linearize_arc([1, 0], [R2, R2], [0, 1], max_step_deg=4.0)
    assert np.allclose(a[0], [1, 0]) and np.allclose(a[-1], [0, 1])
    assert np.abs(np.hypot(a[:, 0], a[:, 1]) - 1.0).max() < 1e-12
    # sweep ~90° at ≤4° steps → ≥23 points, monotone CCW angles
    ang = np.unwrap(np.arctan2(a[:, 1], a[:, 0]))
    assert (np.diff(ang) > 0).all()
    # CW quarter: (0,1) via (r2,r2) to (1,0) goes the short way clockwise
    b = linearize_arc([0, 1], [R2, R2], [1, 0], max_step_deg=4.0)
    ang = np.unwrap(np.arctan2(b[:, 1], b[:, 0]))
    assert (np.diff(ang) < 0).all()
    # major arc: (1,0) via (0,-1) to (0,1) sweeps 270° clockwise
    c = linearize_arc([1, 0], [0, -1], [0, 1], max_step_deg=4.0)
    assert len(c) > len(a) * 2
    assert arc_length([1, 0], [0, -1], [0, 1]) == pytest.approx(
        1.5 * np.pi, abs=1e-12)


def test_exact_curve_lengths():
    circle = wkb_circularstring([[2, 0], [0, 2], [-2, 0], [0, -2], [2, 0]])
    semi = wkb_circularstring([[2, 0], [0, 2], [-2, 0]])
    diam = wkb_linestring([[-2, 0], [2, 0]])
    compound = wkb_compoundcurve([semi, diam])
    got = curve_lengths([circle, semi, compound, None])
    assert got == pytest.approx([4 * np.pi, 2 * np.pi, 2 * np.pi + 4, 0.0],
                                abs=1e-12)


def test_curvepolygon_linearize_area():
    circle = wkb_circularstring([[2, 0], [0, 2], [-2, 0], [0, -2], [2, 0]])
    kind, polys = linearize_wkb(wkb_curvepolygon([circle]))
    assert kind == "polygons"
    area = _poly_area(polys[0][0])
    # 4°-step stroking under-covers by ≤ the sagitta band
    assert abs(area - np.pi * 4.0) / (np.pi * 4.0) < 1e-3
    # finer stepping converges
    kind, polys = linearize_wkb(wkb_curvepolygon([circle]), max_step_deg=0.5)
    assert abs(_poly_area(polys[0][0]) - np.pi * 4.0) / (np.pi * 4.0) < 2e-5


def test_curvepolygon_with_hole_and_compound_ring():
    semi = wkb_circularstring([[2, 0], [0, 2], [-2, 0]])
    diam = wkb_linestring([[-2, 0], [2, 0]])
    outer = wkb_compoundcurve([semi, diam])
    hole = wkb_circularstring([[0.5, 0.5], [0.0, 1.0], [-0.5, 0.5],
                               [0.0, 0.0], [0.5, 0.5]])
    kind, polys = linearize_wkb(wkb_curvepolygon([outer, hole]))
    assert kind == "polygons" and len(polys[0]) == 2
    a_outer = _poly_area(polys[0][0])
    a_hole = _poly_area(polys[0][1])
    assert a_outer == pytest.approx(2 * np.pi, rel=1e-3)
    assert a_hole == pytest.approx(np.pi * 0.25, rel=1e-3)


def test_linearize_batch_feeds_measures():
    import pyarrow as pa
    from georay.measures import feature_areas, pack_rings
    circle = wkb_circularstring([[3, 0], [0, 3], [-3, 0], [0, -3], [3, 0]])
    t = pa.table({"id": [1], "wkb": pa.array([wkb_curvepolygon([circle])],
                                             pa.binary())})
    out = linearize_batch(t, max_step_deg=1.0)
    areas = feature_areas(pack_rings([out["wkb"][0].as_py()]))
    assert areas[0] == pytest.approx(np.pi * 9.0, rel=1e-4)


def test_multicurve_and_multisurface():
    import struct
    semi = wkb_circularstring([[1, 0], [0, 1], [-1, 0]])
    ln = wkb_linestring([[0, 0], [3, 4]])
    mc = struct.pack("<BII", 1, 11, 2) + semi + ln
    assert curve_lengths([mc])[0] == pytest.approx(np.pi + 5.0, abs=1e-12)
    circ = wkb_circularstring([[1, 0], [0, 1], [-1, 0], [0, -1], [1, 0]])
    ms = struct.pack("<BII", 1, 12, 1) + wkb_curvepolygon([circ])
    kind, polys = linearize_wkb(ms)
    assert kind == "polygons" and len(polys) == 1
    assert _poly_area(polys[0][0]) == pytest.approx(np.pi, rel=1e-3)


def test_tin_and_polyhedralsurface():
    import struct
    from georay.curves import linearize_wkb, curve_lengths
    tri = (struct.pack("<BII", 1, 17, 1)            # Triangle, 1 ring
           + struct.pack("<I", 4)
           + np.array([[0, 0], [1, 0], [0, 1], [0, 0]],
                      float).astype("<f8").tobytes())
    tin = struct.pack("<BII", 1, 16, 2) + tri + tri
    # TIN members parse like polygons? — triangles carry ring counts, so
    # reuse of parse_poly requires the member header type to be accepted
    try:
        kind, polys = linearize_wkb(tin)
        assert kind == "polygons" and len(polys) == 2
    except ValueError:
        import pytest as _pt
        _pt.fail("TIN WKB not parsed")


def test_lengths_any_wkb_mixed_column():
    from georay.geom import box_ring, wkb_polygon
    from georay.measures import lengths_any_wkb
    ln = wkb_linestring([[0, 0], [3, 4]])
    semi = wkb_circularstring([[1, 0], [0, 1], [-1, 0]])
    poly = wkb_polygon([box_ring(0, 0, 2, 3)])
    got = lengths_any_wkb([ln, semi, poly, None])
    assert got == pytest.approx([5.0, np.pi, 10.0, 0.0], abs=1e-12)


def test_st_length_mixed_types_in_expr():
    import pyarrow as pa
    from georay.expr import _Parser, _eval, _tokenize
    from georay.geom import box_ring, wkb_polygon
    t = pa.table({"wkb": pa.array(
        [wkb_linestring([[0, 0], [0, 7]]),
         wkb_polygon([box_ring(0, 0, 1, 1)])], pa.binary())})
    v = _eval(_Parser(_tokenize("st_length(wkb)")).parse(), t)
    assert v.to_pylist() == pytest.approx([7.0, 4.0])


def test_curve_area_exact_ladder():
    # OGR's curve-native area ladder (ogrcircularstring.cpp:846):
    # full circles, CW-convex exact path, CCW linearized quirk
    import numpy as np
    from georay.curves import (curve_areas, wkb_circularstring,
                               wkb_compoundcurve, wkb_curvepolygon,
                               wkb_linestring)
    r = 2.0
    # full circle via 2 arcs (5 points) — exact pi r^2
    ang = np.pi / 2.0 * np.arange(5)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
    pts[4] = pts[0]
    w = wkb_curvepolygon([wkb_circularstring(pts)])
    assert abs(curve_areas([w])[0] - np.pi * r * r) < 1e-12
    # full circle via 1 arc (3 points, p0 == p2)
    w1 = wkb_curvepolygon([wkb_circularstring(
        np.array([[-r, 0.0], [r, 0.0], [-r, 0.0]]))])
    assert abs(curve_areas([w1])[0] - np.pi * r * r) < 1e-12
    # CW semicircle (arc + closing line in a CompoundCurve): pi/2
    arc = wkb_circularstring(np.array([[-1.0, 0.0], [0.0, 1.0],
                                       [1.0, 0.0]]))
    line = wkb_linestring(np.array([[1.0, 0.0], [-1.0, 0.0]]))
    w2 = wkb_curvepolygon([wkb_compoundcurve([arc, line])])
    assert abs(curve_areas([w2])[0] - np.pi / 2.0) < 1e-12
    # CW 3-arc circle (hexagon control points): exact via convex path
    ang7 = -np.pi / 3.0 * np.arange(7)
    p7 = np.stack([r * np.cos(ang7), r * np.sin(ang7)], axis=1)
    p7[6] = p7[0]
    w3 = wkb_curvepolygon([wkb_circularstring(p7)])
    assert abs(curve_areas([w3])[0] - np.pi * r * r) < 1e-12
    # CCW orientation takes the reference's LINEARIZED path (IsConvex
    # quirk): area is the stroked polygon's, strictly below pi r^2
    p7c = p7[::-1].copy()
    w4 = wkb_curvepolygon([wkb_circularstring(p7c)])
    a4 = curve_areas([w4])[0]
    assert a4 < np.pi * r * r and a4 > 0.99 * np.pi * r * r
    # hole subtraction: circle r=2 minus circle r=1
    hole = wkb_circularstring(
        np.array([[-1.0, 0.0], [1.0, 0.0], [-1.0, 0.0]]))
    w5 = wkb_curvepolygon([wkb_circularstring(pts), hole])
    assert abs(curve_areas([w5])[0] - np.pi * (r * r - 1.0)) < 1e-12
