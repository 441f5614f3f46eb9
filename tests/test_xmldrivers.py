"""GPX / KML drivers (reference scope: ogr/ogrsf_frmts/gpx, /kml)."""

import numpy as np
import pyarrow as pa

from georay.geojson import geometry_to_wkb, wkb_to_geometry
from georay.xmldrivers import (read_gpx, read_gpx_files, read_kml,
                               read_kml_files, write_gpx, write_kml)


def _pt(x, y):
    return geometry_to_wkb({"type": "Point",
                            "coordinates": [float(x), float(y)]})


def test_gpx_waypoint_roundtrip_exact(tmp_path):
    """repr-serialized coordinates roundtrip BIT-exact (no quantization
    grid, unlike OSM PBF / MVT)."""
    rng = np.random.default_rng(11)
    xy = rng.uniform(-180, 85, (300, 2))
    wp = pa.table({
        "wkb": pa.array([_pt(x, y) for x, y in xy], pa.binary()),
        "name": pa.array([f"p{i}" for i in range(300)]),
        "ele": pa.array([str(i / 7) for i in range(300)]),
    })
    path = str(tmp_path / "w.gpx")
    assert write_gpx(path, waypoints=wp) == 300
    back = read_gpx(path)["waypoints"]
    assert back["wkb"].to_pylist() == wp["wkb"].to_pylist()
    assert back["name"].to_pylist() == wp["name"].to_pylist()
    assert back["ele"].to_pylist() == wp["ele"].to_pylist()


def test_gpx_track_roundtrip(tmp_path):
    line = {"type": "LineString",
            "coordinates": [[0.125, -3.5], [10.75, 2.25], [-7.0, 8.5]]}
    trk = pa.table({"wkb": pa.array([geometry_to_wkb(line)], pa.binary()),
                    "name": pa.array(["t1"])})
    path = str(tmp_path / "t.gpx")
    write_gpx(path, tracks=trk)
    back = read_gpx(path)["tracks"]
    assert wkb_to_geometry(back["wkb"][0].as_py()) == line
    assert back["name"].to_pylist() == ["t1"]


def test_kml_polygon_with_hole_and_extended_data(tmp_path):
    poly = {"type": "Polygon", "coordinates": [
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[2, 2], [4, 2], [4, 4], [2, 2]]]}
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(poly)], pa.binary()),
        "name": pa.array(["zoneA"]),
        "attr": pa.array(["hello"]),
    })
    path = str(tmp_path / "p.kml")
    write_kml(t, path, name_col="name")
    back = read_kml(path)
    assert wkb_to_geometry(back["wkb"][0].as_py()) == poly
    assert back["name"].to_pylist() == ["zoneA"]
    assert back["attr"].to_pylist() == ["hello"]


def test_kml_multigeometry(tmp_path):
    mp = {"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [5, 0], [5, 5], [0, 0]]],
        [[[20, 20], [30, 20], [25, 30], [20, 20]]]]}
    t = pa.table({"wkb": pa.array([geometry_to_wkb(mp)], pa.binary()),
                  "name": pa.array(["m"])})
    path = str(tmp_path / "m.kml")
    write_kml(t, path, name_col="name")
    g = wkb_to_geometry(read_kml(path)["wkb"][0].as_py())
    # KML MultiGeometry is heterogeneous → comes back as a collection
    # (OGR's KML driver reports the same generic geometry)
    assert g["type"] == "GeometryCollection"
    assert [m["coordinates"] for m in g["geometries"]] \
        == [c for c in mp["coordinates"]]


def test_multi_file_ray_sources(ray_session, tmp_path):
    paths = []
    for j in range(3):
        wp = pa.table({
            "wkb": pa.array([_pt(j, i) for i in range(4)], pa.binary()),
            "name": pa.array([f"f{j}_{i}" for i in range(4)]),
        })
        p = str(tmp_path / f"{j}.gpx")
        write_gpx(p, waypoints=wp)
        paths.append(p)
    ds = read_gpx_files(paths, "waypoints")
    assert ds.count() == 12
    kpaths = []
    for j in range(2):
        t = pa.table({"wkb": pa.array([_pt(j, j)], pa.binary()),
                      "name": pa.array([f"k{j}"])})
        p = str(tmp_path / f"{j}.kml")
        write_kml(t, p, name_col="name")
        kpaths.append(p)
    assert sorted(read_kml_files(kpaths).to_pandas()["name"]) \
        == ["k0", "k1"]


def test_gml_geometry_roundtrips(tmp_path):
    from georay.xmldrivers import read_gml, write_gml
    poly = {"type": "Polygon", "coordinates": [
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[2, 2], [4, 2], [4, 4], [2, 2]]]}
    line = {"type": "LineString",
            "coordinates": [[0.5, 1.5], [2.25, 3.75]]}
    pt = {"type": "Point", "coordinates": [12.125, -7.5]}
    mp = {"type": "MultiPolygon", "coordinates": [
        poly["coordinates"], [[[20, 20], [30, 20], [25, 30], [20, 20]]]]}
    mls = {"type": "MultiLineString",
           "coordinates": [line["coordinates"], [[9, 9], [10, 10]]]}
    geoms = [poly, line, pt, mp, mls]
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(g) for g in geoms],
                        pa.binary()),
        "name": pa.array(list("abcde")),
        "val": pa.array(["1", "2", None, "4", "5"]),
    })
    path = str(tmp_path / "t.gml")
    assert write_gml(t, path) == 5
    back = read_gml(path)
    for i, g in enumerate(geoms):
        assert wkb_to_geometry(back["wkb"][i].as_py()) == g
    assert back["name"].to_pylist() == list("abcde")
    assert back["val"].to_pylist() == ["1", "2", None, "4", "5"]


def test_gml_ray_source(ray_session, tmp_path):
    from georay.xmldrivers import read_gml_files, write_gml
    paths = []
    for j in range(3):
        t = pa.table({"wkb": pa.array([_pt(j, j), _pt(j, j + 1)],
                                      pa.binary()),
                      "name": pa.array([f"g{j}a", f"g{j}b"])})
        p = str(tmp_path / f"{j}.gml")
        write_gml(t, p)
        paths.append(p)
    assert read_gml_files(paths).count() == 6
