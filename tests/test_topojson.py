"""TopoJSON driver (georay/topojson.py) — spec-conformance pins.

Reference surface: ogr/ogrsf_frmts/geojson/ogrtopojsonreader.cpp (the
reference reads TopoJSON through the GeoJSON driver family)."""

import json

import numpy as np
import pyarrow as pa

from georay.geojson import geometry_to_wkb, wkb_to_geometry
from georay.topojson import (decode_arcs, read_topojson,
                             table_to_topology, topology_to_tables,
                             write_topojson)


def _poly(rings):
    return geometry_to_wkb({"type": "Polygon", "coordinates": rings})


def test_shared_arc_and_reversal():
    # Two unit squares sharing the edge x=1 (the canonical TopoJSON
    # example shape): the shared border is ONE arc, traversed forward
    # by the left polygon and ~reversed by the right one.
    topo = {
        "type": "Topology",
        "objects": {"zones": {"type": "GeometryCollection", "geometries": [
            {"type": "Polygon", "arcs": [[0, 1]],
             "properties": {"name": "left"}},
            {"type": "Polygon", "arcs": [[~0, 2]],
             "properties": {"name": "right"}},
        ]}},
        # arc 0: shared edge (1,0)->(1,1); arc 1: left loop back;
        # arc 2: right loop back
        "arcs": [
            [[1.0, 0.0], [1.0, 1.0]],
            [[1.0, 1.0], [0.0, 1.0], [0.0, 0.0], [1.0, 0.0]],
            [[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0]],
        ],
    }
    tabs = topology_to_tables(topo)
    t = tabs["zones"]
    assert t.num_rows == 2
    left = wkb_to_geometry(t["wkb"][0].as_py())
    right = wkb_to_geometry(t["wkb"][1].as_py())
    assert left["coordinates"] == [[[1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                                    [0.0, 0.0], [1.0, 0.0]]]
    # ~0 reverses arc 0: (1,1)->(1,0), then arc 2 continues from (1,0)
    assert right["coordinates"] == [[[1.0, 1.0], [1.0, 0.0], [2.0, 0.0],
                                     [2.0, 1.0], [1.0, 1.0]]]
    assert t["name"].to_pylist() == ["left", "right"]


def test_quantized_delta_decode():
    # spec example: transform + delta-encoded arcs
    topo = {
        "type": "Topology",
        "transform": {"scale": [0.5, 0.25], "translate": [-180.0, -90.0]},
        "objects": {"l": {"type": "LineString", "arcs": [0]}},
        "arcs": [[[100, 200], [10, -20], [0, 0], [-10, 20]]],
    }
    arcs = decode_arcs(topo)
    exp = np.array([[100, 200], [110, 180], [110, 180], [100, 200]],
                   dtype=np.float64)
    exp = exp * [0.5, 0.25] + [-180.0, -90.0]
    assert np.array_equal(arcs[0], exp)
    # quantized Point coordinates are transformed, never delta-coded
    topo["objects"]["p"] = {"type": "Point", "coordinates": [100, 200]}
    t = topology_to_tables(topo)["p"]
    g = wkb_to_geometry(t["wkb"][0].as_py())
    assert g["coordinates"] == [100 * 0.5 - 180.0, 200 * 0.25 - 90.0]


def test_roundtrip_unquantized_exact():
    geoms = [
        {"type": "Point", "coordinates": [1.25, -2.75]},
        {"type": "LineString",
         "coordinates": [[0.1, 0.2], [3.3, 4.4], [5.5, -6.6]]},
        {"type": "Polygon", "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [1.0, 1.0]]]},
        {"type": "MultiPolygon", "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]]]},
        {"type": "MultiPoint", "coordinates": [[7.125, 8.5], [-9.0, 0.25]]},
        {"type": "MultiLineString",
         "coordinates": [[[0.0, 0.0], [1.0, 1.0]],
                         [[2.0, 2.0], [3.0, 3.0]]]},
    ]
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(g) for g in geoms], pa.binary()),
        "id": pa.array([f"f{i}" for i in range(len(geoms))]),
        "kind": pa.array([g["type"] for g in geoms]),
    })
    topo = table_to_topology(t, layer="mix")
    back = topology_to_tables(json.loads(json.dumps(topo)))["mix"]
    assert back["wkb"].to_pylist() == t["wkb"].to_pylist()
    assert back["id"].to_pylist() == t["id"].to_pylist()
    assert back["kind"].to_pylist() == t["kind"].to_pylist()


def test_roundtrip_quantized_on_grid():
    # coords on a 0.5 lattice; quantize grid resolves finer than the
    # lattice, so the roundtrip is exact
    rings = [[[0.0, 0.0], [9.5, 0.0], [9.5, 20.0], [0.0, 20.0],
              [0.0, 0.0]]]
    t = pa.table({"wkb": pa.array([_poly(rings)], pa.binary()),
                  "name": pa.array(["z"])})
    topo = table_to_topology(t, quantize=41)  # (max-min)/40 = lattice
    assert "transform" in topo
    arc = topo["arcs"][0]
    assert all(isinstance(v, int) for pt in arc for v in pt)
    back = topology_to_tables(topo)["layer"]
    assert back["wkb"][0].as_py() == t["wkb"][0].as_py()


def test_ray_file_roundtrip(ray_session, tmp_path):
    path = str(tmp_path / "zones.topojson")
    t = pa.table({
        "wkb": pa.array([_poly([[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0],
                                 [0.0, 0.0]]]),
                         _poly([[[5.0, 5.0], [7.0, 5.0], [7.0, 7.0],
                                 [5.0, 5.0]]])], pa.binary()),
        "name": pa.array(["a", "b"]),
    })
    # coords span [0,7] on an integer lattice; quantize=8 → scale 1.0,
    # so the quantized roundtrip is exact
    write_topojson(t, path, layer="zones", quantize=8)
    ds = read_topojson(path)
    out = pa.concat_tables(list(
        ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    assert out.num_rows == 2
    assert sorted(out["name"].to_pylist()) == ["a", "b"]
    assert out["wkb"].to_pylist() == t["wkb"].to_pylist()
