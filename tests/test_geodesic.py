"""Geodesic solver pins (georay/geodesic.py — Karney 2013 series).

Independence of the checks:
* the sphere limit (f=0) compares against exact great-circle closed
  forms derived here, not the solver;
* the WGS84 inverse is checked against an RK4 integration of the
  geodesic ODE  dphi/ds = cos(alpha)/M,  dlam/ds = sin(alpha)/(N cos),
  dalpha/ds = sin(alpha) tan(phi)/N  — no shared code with the series;
* lune/meridian/equator values use closed forms (authalic radius,
  rectifying series) also re-derived inline.
"""

import numpy as np
import pytest

from georay.geodesic import (Geodesic, WGS84, geodesic_areas_wkb,
                             geodesic_lengths_wkb, geodesic_measures_batch)
from georay.geom import wkb_polygon, wkb_multipolygon
from georay.curves import wkb_linestring

G = WGS84


def test_equator_and_meridian_closed_forms():
    s, a1, a2 = G.inverse(0, 0, 0, 90)
    assert s[0] == pytest.approx(G.a * np.pi / 2, abs=1e-8)
    assert a1[0] == pytest.approx(90.0) and a2[0] == pytest.approx(90.0)
    # meridian quadrant vs the rectifying series (independent closed form)
    n = G.n
    A = G.a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    quad = A * np.pi / 2
    s, a1, a2 = G.inverse(0, 17.0, 90, 17.0)
    assert s[0] == pytest.approx(quad, abs=1e-6)
    assert a1[0] == pytest.approx(0.0, abs=1e-12)


def test_sphere_limit_matches_great_circle():
    R = 6371000.0
    gs = Geodesic(R, 0.0)
    rng = np.random.default_rng(11)
    lat1 = rng.uniform(-89, 89, 500)
    lon1 = rng.uniform(-180, 180, 500)
    lat2 = rng.uniform(-89, 89, 500)
    lon2 = rng.uniform(-180, 180, 500)
    s, a1, _ = gs.inverse(lat1, lon1, lat2, lon2)
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2 - lon1)
    y = np.hypot(np.cos(p2) * np.sin(dl),
                 np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl))
    x = np.sin(p1) * np.sin(p2) + np.cos(p1) * np.cos(p2) * np.cos(dl)
    assert np.abs(s - R * np.arctan2(y, x)).max() < 1e-7
    # spherical initial azimuth closed form
    az = np.degrees(np.arctan2(
        np.cos(p2) * np.sin(dl),
        np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)))
    d = np.abs(((a1 - az) + 180) % 360 - 180)
    assert d.max() < 1e-9


def test_direct_inverse_roundtrip_wgs84():
    rng = np.random.default_rng(42)
    n = 1000
    lat1 = rng.uniform(-89.9, 89.9, n)
    lon1 = rng.uniform(-180, 180, n)
    lat2 = rng.uniform(-89.9, 89.9, n)
    lon2 = rng.uniform(-180, 180, n)
    s, a1, a2 = G.inverse(lat1, lon1, lat2, lon2)
    la, lo, az = G.direct(lat1, lon1, a1, s)
    dlon = (lo - lon2 + 180) % 360 - 180
    err_m = np.hypot(la - lat2, dlon * np.cos(np.radians(lat2))) * 111194.9
    assert err_m.max() < 1e-6
    dz = np.abs(((az - a2) + 180) % 360 - 180)
    assert dz.max() < 1e-9


def test_nearly_antipodal_roundtrip():
    rng = np.random.default_rng(3)
    n = 300
    lat1 = rng.uniform(-80, 80, n)
    lon1 = rng.uniform(-180, 180, n)
    lat2 = -lat1 + rng.uniform(-0.05, 0.05, n)
    lon2 = lon1 + 180 - rng.uniform(0, 0.05, n)
    s, a1, _ = G.inverse(lat1, lon1, lat2, lon2)
    la, lo, _ = G.direct(lat1, lon1, a1, s)
    dlon = (lo - lon2 + 180) % 360 - 180
    err_m = np.hypot(la - lat2, dlon * np.cos(np.radians(lat2))) * 111194.9
    assert err_m.max() < 1e-5
    # shortest-path bound: between the polar and equatorial semicircles
    assert (s <= np.pi * G.a * 1.0000001).all()
    assert (s >= np.pi * G.b * 0.999).all()


def _rk4(lat1, lon1, azi1, s12, nsteps=20000):
    """Independent geodesic ODE integration (no series)."""
    e2, a = G.e2, G.a
    st = np.array([np.radians(lat1), np.radians(lon1), np.radians(azi1)])

    def f(state):
        phi, _, alp = state
        w2 = 1 - e2 * np.sin(phi) ** 2
        M = a * (1 - e2) / w2**1.5
        N = a / np.sqrt(w2)
        return np.array([np.cos(alp) / M, np.sin(alp) / (N * np.cos(phi)),
                         np.sin(alp) * np.tan(phi) / N])

    h = s12 / nsteps
    for _ in range(nsteps):
        k1 = f(st)
        k2 = f(st + h / 2 * k1)
        k3 = f(st + h / 2 * k2)
        k4 = f(st + h * k3)
        st = st + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    return np.degrees(st[0]), np.degrees(st[1])


def test_inverse_vs_ode_integration():
    rng = np.random.default_rng(7)
    for _ in range(4):
        lat1, lon1 = rng.uniform(-60, 60), rng.uniform(-180, 180)
        lat2, lon2 = rng.uniform(-60, 60), rng.uniform(-180, 180)
        s, a1, _ = G.inverse(lat1, lon1, lat2, lon2)
        la, lo = _rk4(lat1, lon1, a1[0], s[0])
        dlon = (lo - lon2 + 180) % 360 - 180
        err_m = np.hypot(la - lat2, dlon * np.cos(np.radians(lat2))) * 111194.9
        assert err_m < 1e-5


def test_lune_triangle_area_exact():
    # equator-pole-equator triangle: area == c2 * dlam exactly (meridian
    # and equator edges map to great circles under the authalic mapping)
    for dl in (0.25, 1.0, 17.3):
        area, perim = G.polygon_area_perimeter([0, 0, 90], [10, 10 + dl, 10])
        assert abs(area) == pytest.approx(G.c2 * np.radians(dl), rel=1e-12)
        n = G.n
        A = G.a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
        assert perim == pytest.approx(
            G.a * np.radians(dl) + 2 * (A * np.pi / 2), abs=1e-6)


def test_small_polygon_planar_limit():
    lat0, dlat = 45.0, 0.01
    dlon = dlat / np.cos(np.radians(lat0))
    area, _ = G.polygon_area_perimeter(
        [lat0, lat0, lat0 + dlat, lat0 + dlat], [0, dlon, dlon, 0])
    w2 = 1 - G.e2 * np.sin(np.radians(lat0 + dlat / 2)) ** 2
    M = G.a * (1 - G.e2) / w2**1.5
    N = G.a / np.sqrt(w2)
    planar = (M * np.radians(dlat)) * (
        N * np.cos(np.radians(lat0 + dlat / 2)) * np.radians(dlon))
    assert abs(area) == pytest.approx(planar, rel=1e-5)
    assert area < 0  # this vertex order runs clockwise


def test_wkb_kernels_polygon_hole_and_multi():
    outer = [(0, 0), (2, 0), (2, 2), (0, 2)]
    hole = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)]
    a_o = geodesic_areas_wkb([wkb_polygon([outer])])[0]
    a_h = geodesic_areas_wkb([wkb_polygon([hole])])[0]
    a_b = geodesic_areas_wkb([wkb_polygon([outer, hole])])[0]
    assert a_b == pytest.approx(a_o - a_h, rel=1e-12)
    a_m = geodesic_areas_wkb([wkb_multipolygon([[outer], [hole]])])[0]
    assert a_m == pytest.approx(a_o + a_h, rel=1e-12)
    # perimeter: polygon rings all count (OGR surface get_GeodesicLength)
    l_b = geodesic_lengths_wkb([wkb_polygon([outer, hole])])[0]
    l_o = geodesic_lengths_wkb([wkb_polygon([outer])])[0]
    l_h = geodesic_lengths_wkb([wkb_polygon([hole])])[0]
    assert l_b == pytest.approx(l_o + l_h, rel=1e-12)


def test_sql_st_geodesic_functions(ray_session):
    import ray
    from georay.sql import execute_sql

    line = wkb_linestring(np.array([[0.0, 0.0], [90.0, 0.0]]))
    poly = wkb_polygon([[(10, 0), (11, 0), (10, 90)]])
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2]),
        "wkb": pa.array([line, poly], pa.binary())}))
    out = execute_sql(
        "SELECT id, ROUND(ST_GEODESIC_LENGTH(wkb), 3) AS glen, "
        "ROUND(ST_GEODESIC_AREA(wkb), 1) AS garea FROM t ORDER BY id",
        {"t": ds})
    rows = _collect_table(out).to_pylist()
    assert rows[0]["glen"] == pytest.approx(G.a * np.pi / 2, abs=1e-3)
    assert rows[0]["garea"] == 0.0
    assert rows[1]["garea"] == pytest.approx(G.c2 * np.radians(1.0), abs=1)


def _collect_table(res):
    import pandas as pd
    import ray
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res)
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    raise TypeError(type(res))


import pyarrow as pa  # noqa: E402  (used by the SQL test above)


def test_wkb_kernels_linestring_and_batch():
    import pyarrow as pa
    line = wkb_linestring(np.array([[0.0, 0.0], [90.0, 0.0]]))
    assert geodesic_lengths_wkb([line])[0] == pytest.approx(
        G.a * np.pi / 2, abs=1e-8)
    batch = pa.table({"wkb": pa.array(
        [line, wkb_polygon([[(0, 0), (1, 0), (1, 1), (0, 1)]]), None],
        pa.binary())})
    out = geodesic_measures_batch(batch, round_to=3)
    assert out.num_rows == 3
    got = out["geod_length_m"].to_pylist()
    assert got[0] == pytest.approx(G.a * np.pi / 2, abs=1e-3)
    assert got[2] == 0.0
    assert out["geod_area_m2"].to_pylist()[0] == 0.0
    assert out["geod_area_m2"].to_pylist()[1] > 1e10  # ~111km square


def test_inverse_properties_fuzz():
    """Property fuzz: symmetry s(a,b) == s(b,a), the triangle
    inequality, and bounds 0 <= s <= pi*a, over random pairs."""
    rng = np.random.default_rng(99)
    n = 400
    lat = rng.uniform(-89.99, 89.99, (3, n))
    lon = rng.uniform(-180, 180, (3, n))
    sab, _, _ = G.inverse(lat[0], lon[0], lat[1], lon[1])
    sba, _, _ = G.inverse(lat[1], lon[1], lat[0], lon[0])
    assert np.abs(sab - sba).max() < 1e-6
    sbc, _, _ = G.inverse(lat[1], lon[1], lat[2], lon[2])
    sac, _, _ = G.inverse(lat[0], lon[0], lat[2], lon[2])
    assert (sac <= sab + sbc + 1e-6).all()
    assert (sab >= 0).all() and (sab <= np.pi * G.a * 1.0000001).all()
    # coincident points
    s0, _, _ = G.inverse(lat[0], lon[0], lat[0], lon[0])
    assert np.abs(s0).max() < 1e-9
