"""SWQ-style attribute-filter expression tests (vs DuckDB WHERE oracle)."""

import duckdb
import pyarrow as pa
import pytest

from georay.expr import FilterSyntaxError, compile_filter

T = pa.table({
    "a": [1, 2, 3, 4, 5, None],
    "b": [1.5, 2.5, 0.0, -4.0, 10.0, 2.0],
    "s": ["apple", "banana", "cherry", None, "apricot", "fig"],
})

CASES = [
    "a > 2",
    "a >= 2 AND b < 3.0",
    "a = 1 OR a = 5",
    "NOT a = 3",
    "s LIKE 'ap%'",
    "s LIKE '%an%'",
    "s NOT LIKE 'ap%'",
    "s LIKE 'a_____'",
    "a IN (1, 3, 5)",
    "a NOT IN (1, 3, 5)",
    "b BETWEEN 0 AND 3",
    "a NOT BETWEEN 2 AND 4",
    "s IS NULL",
    "s IS NOT NULL",
    "a + 1 > 3",
    "a * 2 - 1 >= 7",
    "b / 2 < 1",
    "a % 2 = 1",
    "(a > 1 AND a < 4) OR s = 'fig'",
    "-b > 3",
]


@pytest.mark.parametrize("where", CASES)
def test_filter_matches_duckdb(where):
    f = compile_filter(where)
    got = T.filter(f(T))
    con = duckdb.connect()
    con.register("t", T.to_pandas())
    want = con.sql(f"SELECT * FROM t WHERE {where}").df()
    got_ids = sorted(x for x in got["a"].to_pylist() if x is not None)
    want_ids = sorted(x for x in want["a"].dropna().astype(int).tolist())
    assert got_ids == want_ids, where
    assert got.num_rows == len(want), where


def test_syntax_errors():
    for bad in ["a >", "a LIKE 5", "IN (1,2)", "a BETWEEN 1", "a ** 2"]:
        with pytest.raises(FilterSyntaxError):
            compile_filter(bad)(T)


def test_attribute_filter_on_dataset(ray_session):
    import ray
    from georay.expr import attribute_filter
    ds = ray.data.from_arrow(T)
    out = attribute_filter(ds, "a > 1 AND s IS NOT NULL").to_pandas()
    assert sorted(out["a"].tolist()) == [2, 3, 5]


# --------------------------------------------------- scalar functions

FUNC_CASES = [
    "round(sqrt(a * 1.0), 2) = 1.41",
    "abs(a - 3) <= 1",
    "floor(a / 2.0) = 1",
    "ceil(a / 2.0) = 2",
    "upper(s) = 'FIG'",
    "length(s) = 3",
    "substr(s, 1, 2) = 'fi'",
    "concat(s, '!') = 'fig!'",
    "power(a, 2) > 5",
    "coalesce(s, 'zz') = 'zz'",
]


@pytest.mark.parametrize("where", FUNC_CASES)
def test_function_filter_matches_duckdb(where):
    f = compile_filter(where)
    got = T.filter(f(T))
    con = duckdb.connect()
    con.register("t", T.to_pandas())
    want = con.sql(f"SELECT * FROM t WHERE {where}").df()
    got_ids = sorted(x for x in got["a"].to_pylist() if x is not None)
    want_ids = sorted(int(x) for x in want["a"].dropna().tolist())
    assert got_ids == want_ids, where


def test_round_matches_duckdb_half_mode():
    import pyarrow as pa
    from georay.expr import _Parser, _eval, _tokenize
    t = pa.table({"x": [2.5, -2.5, 1.25, 0.5, 1.005]})
    got = _eval(_Parser(_tokenize("round(x, 0)")).parse(), t).to_pylist()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql("SELECT round(x, 0) AS r FROM t").df()["r"].tolist()
    assert got == want


def test_geometry_functions():
    import numpy as np
    import pyarrow as pa
    from georay.expr import _Parser, _eval, _tokenize
    from georay.geom import box_ring, wkb_polygon
    t = pa.table({"wkb": pa.array(
        [wkb_polygon([box_ring(0, 0, 2, 3)]),
         wkb_polygon([box_ring(0, 0, 10, 10), box_ring(4, 4, 6, 6)])],
        pa.binary())})

    def ev(src):
        return _eval(_Parser(_tokenize(src)).parse(), t).to_pylist()

    assert ev("st_area(wkb)") == pytest.approx([6.0, 96.0])
    assert ev("st_perimeter(wkb)") == pytest.approx([10.0, 48.0])
    assert ev("st_centroid_x(wkb)") == pytest.approx([1.0, 5.0])
    assert ev("st_centroid_y(wkb)") == pytest.approx([1.5, 5.0])
    assert ev("st_convexhull_area(wkb)") == pytest.approx([6.0, 100.0])
    assert ev("st_hull_npoints(wkb)") == [4, 4]
    kgon = 16.0 * 0.25 * np.sin(np.pi / 16.0)
    assert ev("st_buffer_area(wkb, 0.5)") == pytest.approx(
        [6.0 + 5.0 + kgon, 100.0 + 20.0 + kgon])
    # functions compose with comparisons into filters
    f = compile_filter("st_area(wkb) > 50")
    assert t.filter(f(t)).num_rows == 1


def test_function_errors():
    for bad in ["nosuch(a)", "round(a, b)", "substr(s)", "atan2(a)"]:
        with pytest.raises(FilterSyntaxError):
            compile_filter(bad)(T)


def test_st_spatial_predicates():
    """ST_CONTAINS_XY (exact even-odd PIP) and ST_INTERSECTS_BBOX
    (envelope fast path) — the SQLite-dialect spatial predicate
    surface (ogrsqlitesqlfunctions.cpp)."""
    from georay.geom import wkb_polygon

    sq = wkb_polygon([[(0, 0), (2, 0), (2, 2), (0, 2)]])
    tri = wkb_polygon([[(0, 0), (4, 0), (0, 4)]])
    hole = wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 4)],
                        [(1, 1), (3, 1), (3, 3), (1, 3)]])
    t = pa.table({"wkb": pa.array([sq, tri, None, hole, hole],
                                  pa.binary()),
                  "x": [1.0, 3.5, 0.0, 2.0, 0.5],
                  "y": [1.0, 0.2, 0.0, 2.0, 0.5]})
    f = compile_filter("ST_CONTAINS_XY(wkb, x, y)")
    # hole row 3: (2,2) falls in the hole -> even-odd says outside
    assert f(t).to_pylist() == [True, True, False, False, True]
    f2 = compile_filter("ST_INTERSECTS_BBOX(wkb, 3.0, 0.0, 5.0, 1.0)")
    assert f2(t).to_pylist() == [False, True, False, True, True]
    # literal coordinates work too
    f3 = compile_filter("ST_CONTAINS_XY(wkb, 0.1, 0.1)")
    assert f3(t).to_pylist() == [True, True, False, True, True]


def test_st_area_curve_aware():
    # ST_AREA dispatches curve WKB to the arc-exact ladder (OGR_G_Area)
    import numpy as np
    from georay.curves import wkb_circularstring, wkb_curvepolygon
    from georay.geom import box_ring, wkb_polygon
    from georay.expr import _Parser, _eval, _tokenize
    r = 2.0
    circle = wkb_curvepolygon([wkb_circularstring(
        np.array([[-r, 0.0], [r, 0.0], [-r, 0.0]]))])
    square = wkb_polygon([box_ring(0.0, 0.0, 2.0, 3.0)])
    t = pa.table({"wkb": pa.array([circle, square], pa.binary())})
    ast = _Parser(_tokenize("ST_AREA(wkb)")).parse()
    vals = _eval(ast, t).to_pylist()
    assert abs(vals[0] - np.pi * r * r) < 1e-12
    assert abs(vals[1] - 6.0) < 1e-12
