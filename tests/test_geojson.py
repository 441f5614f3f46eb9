"""GeoJSON driver (georay.geojson): geometry ⇄ WKB conversion, feature
collection tables, file read/write through Ray."""

import json

import numpy as np
import pytest

from georay.geojson import (
    feature_collection_to_table, geometry_to_wkb,
    table_to_feature_collection, wkb_to_geometry,
)

GEOMS = [
    {"type": "Point", "coordinates": [30.0, 10.0]},
    {"type": "LineString", "coordinates": [[30.0, 10.0], [10.0, 30.0]]},
    {"type": "Polygon", "coordinates": [
        [[30.0, 10.0], [40.0, 40.0], [20.0, 40.0], [30.0, 10.0]],
        [[28.0, 20.0], [32.0, 20.0], [30.0, 30.0], [28.0, 20.0]]]},
    {"type": "MultiPoint", "coordinates": [[10.0, 40.0], [40.0, 30.0]]},
    {"type": "MultiLineString", "coordinates": [
        [[10.0, 10.0], [20.0, 20.0]], [[40.0, 40.0], [30.0, 30.0]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[30.0, 20.0], [45.0, 40.0], [10.0, 40.0], [30.0, 20.0]]],
        [[[15.0, 5.0], [40.0, 10.0], [10.0, 20.0], [15.0, 5.0]]]]},
    {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [1.0, 2.0]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]}]},
]


@pytest.mark.parametrize("geom", GEOMS, ids=[g["type"] for g in GEOMS])
def test_geometry_roundtrip(geom):
    assert wkb_to_geometry(geometry_to_wkb(geom)) == geom


def test_z_dropped_and_interop():
    g = {"type": "Point", "coordinates": [1.0, 2.0, 99.0]}
    assert wkb_to_geometry(geometry_to_wkb(g))["coordinates"] == [1.0, 2.0]
    from georay.measures import feature_areas, pack_rings
    poly = {"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]}
    assert feature_areas(pack_rings([geometry_to_wkb(poly)]))[0] == 100.0
    # WKT interop
    from georay.wkt import wkb_to_wkt
    assert wkb_to_wkt(geometry_to_wkb(GEOMS[0])) == "POINT (30 10)"


def test_feature_collection_table_roundtrip():
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": GEOMS[0],
         "properties": {"name": "a", "pop": 10}},
        {"type": "Feature", "geometry": GEOMS[2],
         "properties": {"name": "b"}},
        {"type": "Feature", "geometry": None, "properties": {"pop": 3}},
    ]}
    t = feature_collection_to_table(fc)
    assert t.num_rows == 3
    assert set(t.schema.names) == {"wkb", "name", "pop"}
    assert t["pop"].to_pylist() == [10, None, 3]
    assert t["wkb"][2].as_py() is None
    back = table_to_feature_collection(t)
    assert back["features"][0]["geometry"] == GEOMS[0]
    assert back["features"][1]["properties"]["name"] == "b"
    assert back["features"][2]["geometry"] is None


def test_read_write_files(ray_session, tmp_path):
    from georay.geojson import read_geojson, write_geojson
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": GEOMS[i % len(GEOMS)],
         "properties": {"i": i}} for i in range(10)]}
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(fc))
    ds = read_geojson(str(p))
    assert ds.count() == 10
    out = tmp_path / "out.geojson"
    write_geojson(ds, str(out))
    rt = json.loads(out.read_text())
    assert len(rt["features"]) == 10
    assert rt["features"][3]["properties"]["i"] == 3
