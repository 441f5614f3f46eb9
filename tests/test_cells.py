"""S2 + hex-grid cell indexer tests.

The S2 oracle here is an independent *scalar recursive* implementation of
the Hilbert traversal (no lookup tables) — it validates the vectorized
table-driven encoder the way GDAL validates drivers against gdaltest
golden outputs.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from georay import cells as C

_POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
_IJ_TO_POS = [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]]
_POS_TO_ORIENT = [1, 0, 0, 3]


def _scalar_s2_leaf(lat, lon):
    phi, theta = math.radians(lat), math.radians(lon)
    p = (math.cos(phi) * math.cos(theta),
         math.cos(phi) * math.sin(theta),
         math.sin(phi))
    ax = [abs(v) for v in p]
    axis = ax.index(max(ax))
    face = axis if p[axis] > 0 else axis + 3
    x, y, z = p
    if face == 0:
        uv = (y / x, z / x)
    elif face == 1:
        uv = (-x / y, z / y)
    elif face == 2:
        uv = (-x / z, -y / z)
    elif face == 3:
        uv = (z / x, y / x)
    elif face == 4:
        uv = (z / y, -x / y)
    else:
        uv = (-y / z, -x / z)

    def st_(u):
        return 0.5 * math.sqrt(1 + 3 * u) if u >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * u)

    def ij(s):
        return min(max(int(math.floor(s * (1 << 30))), 0), (1 << 30) - 1)

    i, j = ij(st_(uv[0])), ij(st_(uv[1]))
    # bit-by-bit Hilbert traversal, one level at a time
    n = face << 60
    orient = face & 1
    pos = 0
    for k in range(29, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ij2 = bi * 2 + bj
        p4 = _IJ_TO_POS[orient][ij2]
        pos = pos * 4 + p4
        orient ^= _POS_TO_ORIENT[p4]
    return (n | pos) * 2 + 1


@settings(max_examples=150, deadline=None)
@given(st.floats(-89.9, 89.9), st.floats(-180.0, 180.0))
def test_s2_leaf_matches_scalar(lat, lon):
    vec = int(C.s2_cell_id([lat], [lon], 30)[0])
    assert vec == _scalar_s2_leaf(lat, lon)


def test_s2_level_and_parent():
    leaf = C.s2_cell_id([48.8566], [2.3522], 30)
    assert int(C.s2_level(leaf)[0]) == 30
    for lvl in (0, 5, 12, 29):
        p = C.s2_parent(leaf, lvl)
        assert int(C.s2_level(p)[0]) == lvl
        # direct encode at that level must agree
        assert int(C.s2_cell_id([48.8566], [2.3522], lvl)[0]) == int(p[0])


def test_s2_faces_partition():
    # six cardinal directions land on six distinct faces
    pts = [(0, 0), (0, 90), (90, 0), (0, 180), (0, -90), (-90, 0)]
    ids = C.s2_cell_id([p[0] for p in pts], [p[1] for p in pts], 0)
    faces = set(int(i) >> 61 for i in ids)
    assert faces == {0, 1, 2, 3, 4, 5}


def test_s2_nearby_points_share_coarse_cell():
    a = C.s2_cell_id([40.7128], [-74.0060], 10)
    b = C.s2_cell_id([40.7130], [-74.0062], 10)
    assert int(a[0]) == int(b[0])
    a30 = C.s2_cell_id([40.7128], [-74.0060], 30)
    b30 = C.s2_cell_id([40.7130], [-74.0062], 30)
    assert int(a30[0]) != int(b30[0])


def test_hex_roundtrip_and_kring():
    lat = np.array([40.71, 51.5, -33.86])
    lon = np.array([-74.0, -0.12, 151.2])
    for res in (5, 9, 12):
        cell = C.hex_cell(lat, lon, res)
        assert (C.hex_res(cell) == res).all()
        # the cell center must map back to the same cell
        mx, my = C.hex_center_meters(cell)
        assert np.array_equal(C.hex_cell_from_meters(mx, my, res), cell)
        ring = C.hex_k_ring(cell, 2)
        assert ring.shape == (3, 19)
        d = C.hex_distance(np.repeat(cell, 19), ring.ravel())
        assert d.max() == 2
        # ring at exactly k
        rk = C.hex_ring(cell, 2)
        assert rk.shape == (3, 12)
        assert (C.hex_distance(np.repeat(cell, 12), rk.ravel()) == 2).all()


@settings(max_examples=100, deadline=None)
@given(st.floats(-84.0, 84.0), st.floats(-179.9, 179.9))
def test_hex_cell_contains_point(lat, lon):
    """The cell assigned to a point must be the nearest cell center."""
    from georay.mercator import latlon_to_meters
    res = 9
    cell = C.hex_cell([lat], [lon], res)
    mx, my = latlon_to_meters(lat, lon)
    ring = C.hex_k_ring(cell, 1)[0]
    cx, cy = C.hex_center_meters(ring)
    d = np.hypot(cx - float(mx), cy - float(my))
    # the assigned cell's center is the nearest of the neighborhood
    ocx, ocy = C.hex_center_meters(cell)
    assert np.hypot(float(ocx) - float(mx), float(ocy) - float(my)) <= d.min() + 1e-6


def test_hex_parent_coarser():
    cell = C.hex_cell([40.71], [-74.0], 12)
    par = C.hex_parent(cell, 10)
    assert int(C.hex_res(par)[0]) == 10
    # parent center within parent-radius of child center
    cx, cy = C.hex_center_meters(cell)
    px, py = C.hex_center_meters(par)
    assert np.hypot(float(cx - px), float(cy - py)) <= float(C.hex_circumradius(10))


def test_hex_polyfill_and_compact():
    import numpy as np
    from georay.cells import (hex_center_meters, hex_compact, hex_polyfill,
                              hex_res)
    from georay.geom import box_ring
    from georay.mercator import meters_to_latlon
    cells = hex_polyfill([box_ring(-74.5, 38.2, -70.5, 43.2)], 10)
    assert len(cells) > 100
    cx, cy = hex_center_meters(cells)
    lat, lon = meters_to_latlon(cx, cy)
    assert (lon >= -74.5).all() and (lon <= -70.5).all()
    assert (lat >= 38.2).all() and (lat <= 43.2).all()
    comp = hex_compact(cells)
    assert len(comp) < len(cells)
    assert len(np.unique(hex_res(comp))) >= 2


def test_icosa_partition_and_roundtrip():
    """Icosahedral aperture-7 grid: deterministic partition, ≥99% of cell
    centers map back to their cell (face-boundary clips documented), and
    cells pack ids reversibly."""
    import numpy as np
    from georay.icosa import icosa_cell, icosa_cell_center
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89.9, 89.9, 5000)
    lon = rng.uniform(-180, 180, 5000)
    c = icosa_cell(lat, lon, 5)
    assert np.array_equal(c, icosa_cell(lat, lon, 5))
    cells = np.unique(c)
    clat, clon = icosa_cell_center(cells)
    frac = (icosa_cell(clat, clon, 5) == cells).mean()
    assert frac > 0.99
    # high-latitude cells exist and are distinct from equatorial ones
    cp = icosa_cell(np.array([89.0]), np.array([0.0]), 5)
    ce = icosa_cell(np.array([0.0]), np.array([0.0]), 5)
    assert cp[0] != ce[0]


def test_icosa_aperture_and_uniformity():
    """~7 children per parent (polyfill density ratio) and near-uniform
    interior cell areas — the properties the Mercator-plane aperture-4
    stand-in lacks at high latitude."""
    import numpy as np
    from georay.icosa import icosa_cell, icosa_cell_center, icosa_polyfill
    ring = [np.array([[10, 10], [18, 10], [18, 18], [10, 18]], float)]
    n4 = len(icosa_polyfill(ring, 4))
    n5 = len(icosa_polyfill(ring, 5))
    assert 5.0 < n5 / n4 < 9.0
    # polar box cells have similar density to an equatorial box of the
    # same spherical area: compare cells per steradian within ±35%
    polar = [np.array([[-180, 80], [180, 80], [180, 89.9], [-180, 89.9]],
                      float)]
    # spherical areas: band area = 2π(sin top − sin bottom)
    a_polar = 2 * np.pi * (np.sin(np.radians(89.9)) - np.sin(np.radians(80)))
    a_eq = (np.radians(8) * (np.sin(np.radians(18)) - np.sin(np.radians(10))))
    npol = len(icosa_polyfill(polar, 4))
    dens_ratio = (npol / a_polar) / (n4 / a_eq)
    assert 0.5 < dens_ratio < 2.0


def test_icosa_parent_contains_children_mostly():
    import numpy as np
    from georay.icosa import icosa_cell, icosa_parent
    rng = np.random.default_rng(4)
    lat = rng.uniform(-60, 60, 2000)
    lon = rng.uniform(-180, 180, 2000)
    c6 = icosa_cell(lat, lon, 6)
    p5 = icosa_parent(c6, 5)
    direct = icosa_cell(lat, lon, 5)
    # parent-of-cell vs direct coarse assignment agree for most points
    # (aperture-7 hierarchies don't nest exactly — H3's own caveat)
    assert (p5 == direct).mean() > 0.85


def test_icosa_disc_cross_face_and_coverage():
    """The metric disc crosses face boundaries (pole cell discs span
    several faces) and contains every cell whose center is within the
    disc radius (verified by dense random sampling)."""
    import numpy as np
    from georay.icosa import (_unpack, icosa_cell, icosa_cell_center,
                              icosa_disc, icosa_res_radius)
    c = icosa_cell(np.array([89.0]), np.array([10.0]), 5)
    d = icosa_disc(c, 2)
    faces = set(_unpack(d)[1].tolist())
    assert len(faces) >= 2  # crossed a face boundary at the pole
    # coverage: sample points within the disc radius; their cells must
    # all be in the disc
    R = float(icosa_res_radius(5))
    rho = 2.5 * np.sqrt(3.0) * R
    clat, clon = icosa_cell_center(c)
    rng = np.random.default_rng(3)
    ang = rng.uniform(0, 2 * np.pi, 500)
    rr = rho * 0.95 * np.sqrt(rng.uniform(0, 1, 500))
    lat_s = np.degrees(np.radians(clat[0]) + rr * np.cos(ang))
    lon_s = clon[0] + np.degrees(rr * np.sin(ang)
                                 / np.cos(np.radians(clat[0])))
    cells_s = icosa_cell(np.clip(lat_s, -90, 90), lon_s, 5)
    centers = icosa_cell_center(cells_s)
    from georay.geom import haversine_m
    dist = haversine_m(clat[0], clon[0], centers[0], centers[1])
    inside = dist <= rho * 6371008.8 * 0.999
    assert np.isin(cells_s[inside], d).all()


def test_knn_icosa_exact_vs_bruteforce():
    """Icosa-grid kNN equals brute-force haversine on a global point set
    loaded with face-edge / polar / dateline cases."""
    import numpy as np
    from georay.geom import haversine_m
    from georay.knn import build_icosa_index, knn_points_icosa
    rng = np.random.default_rng(0)
    n = 2000
    lat = np.concatenate([rng.uniform(-89.9, 89.9, n // 2),
                          rng.uniform(85, 89.9, n // 6),
                          rng.uniform(26, 27, n // 6),
                          rng.uniform(-40, 40,
                                      n - n // 2 - 2 * (n // 6))])
    lon = rng.uniform(-180, 180, n)
    ids = np.arange(n)
    idx = build_icosa_index(lat, lon, ids, res=4)
    qs = rng.choice(n, 25, replace=False)
    qi, qr, qid, qd = knn_points_icosa(lat[qs], lon[qs], idx, k=5)
    for j, q in enumerate(qs):
        d = haversine_m(lat[q], lon[q], lat, lon)
        want = np.argsort(d, kind="stable")[:5]
        got = qid[qi == j]
        if set(got.tolist()) != set(ids[want].tolist()):
            gd = np.sort(qd[qi == j])
            wd = np.sort(d[want])
            assert np.allclose(gd, wd)  # distance ties only


def test_icosa_multires_census_partitions(ray_session, sf_dir):
    """q_icosa_multires: each res level is a PARTITION of the customers —
    per-res counts sum to the table row count, and coarser res has no
    more cells than finer."""
    import pyarrow.parquet as pq

    from georay.queries import q_icosa_multires

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    df = q_icosa_multires(sf_dir).to_pandas()
    sums = df.groupby("res")["n"].sum()
    cells = df.groupby("res")["icosacell"].nunique()
    assert sorted(sums.index) == [8, 10, 12]
    assert (sums == n_cust).all()
    assert cells[8] <= cells[10] <= cells[12]
