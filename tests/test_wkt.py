"""WKT ⇄ WKB conversion (georay.wkt) — parse/format roundtrips, OGR
formatting conventions, EMPTY variants, and interop with the engine's
geometry kernels."""

import numpy as np
import pytest

from georay.wkt import wkb_to_wkt, wkt_to_wkb

CASES = [
    "POINT (30 10)",
    "POINT (1.5 -2.25)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
    "(20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
    "((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "GEOMETRYCOLLECTION (POINT (40 10), "
    "LINESTRING (10 10, 20 20, 10 40), "
    "POLYGON ((40 40, 20 45, 45 30, 40 40)))",
    "CIRCULARSTRING (0 0, 1 1, 2 0)",
    "LINESTRING EMPTY",
    "POLYGON EMPTY",
    "MULTIPOLYGON EMPTY",
    "POINT EMPTY",
]


@pytest.mark.parametrize("wkt", CASES)
def test_roundtrip(wkt):
    assert wkb_to_wkt(wkt_to_wkb(wkt)) == wkt


def test_parse_flexible_whitespace_and_numbers():
    a = wkt_to_wkb("  point(  30.0   1e1 ) ")
    assert wkb_to_wkt(a) == "POINT (30 10)"
    b = wkt_to_wkb("MULTIPOINT (10 40, 40 30)")   # bare form accepted
    assert wkb_to_wkt(b) == "MULTIPOINT ((10 40), (40 30))"


def test_float_precision_roundtrip():
    w = f"POINT ({repr(0.1 + 0.2)} {repr(1.0 / 3.0)})"
    assert wkb_to_wkt(wkt_to_wkb(w)) == w


def test_interop_with_engine_kernels():
    from georay.measures import feature_areas, pack_rings
    wkb = wkt_to_wkb("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                     "(4 4, 6 4, 6 6, 4 6, 4 4))")
    assert feature_areas(pack_rings([wkb]))[0] == pytest.approx(96.0)
    from georay.geom import wkb_polygon, box_ring
    assert wkb_to_wkt(wkb_polygon([box_ring(0, 0, 2, 3)])) == \
        "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"
    # circular strings flow into the curve module
    from georay.curves import curve_lengths
    semi = wkt_to_wkb("CIRCULARSTRING (1 0, 0 1, -1 0)")
    assert curve_lengths([semi])[0] == pytest.approx(np.pi, abs=1e-12)


def test_errors():
    for bad in ["TRIANGLE (0 0, 1 1)", "POINT (1)", "POLYGON (0 0, 1 1)",
                "POINT (1 2", "POINT Z (1 2 3)"]:
        with pytest.raises(ValueError):
            wkt_to_wkb(bad)


def test_batch_helpers():
    import pyarrow as pa
    from georay.wkt import wkb_column_to_wkt, wkt_column_to_wkb
    t = pa.table({"wkt": pa.array(["POINT (1 2)", None], pa.string())})
    t2 = wkt_column_to_wkb(t, "wkt")
    assert t2["wkb"][1].as_py() is None
    t3 = wkb_column_to_wkt(t2, "wkb", "wkt2")
    assert t3["wkt2"].to_pylist() == ["POINT (1 2)", None]
