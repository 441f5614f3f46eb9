"""DXF driver (georay.dxf): group-code roundtrips, legacy POLYLINE,
circle linearization, layer attribute carry, open_vector dispatch."""
import numpy as np
import pyarrow as pa

from georay.dxf import read_dxf, read_dxf_files, write_dxf
from georay.geojson import geometry_to_wkb, wkb_to_geometry


def _table(feats):
    return pa.table({
        "wkb": pa.array([geometry_to_wkb(g) for g, _ in feats],
                        pa.binary()),
        "layer": pa.array([la for _, la in feats]),
    })


def test_dxf_roundtrip_bit_exact(tmp_path):
    """Point/LineString/Polygon/Multi* through write→read; repr float
    serialization keeps awkward doubles bit-exact; layer carries."""
    feats = [
        ({"type": "Point", "coordinates": [0.1 + 0.2, -3.75]}, "pts"),
        ({"type": "LineString",
          "coordinates": [[0, 0], [1.5, 2.25], [np.pi, 1]]}, "lines"),
        ({"type": "Polygon",
          "coordinates": [[[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]]]},
         "zone7"),
        ({"type": "MultiPoint", "coordinates": [[9, 9], [10, 10]]},
         "pts"),
    ]
    p = str(tmp_path / "t.dxf")
    write_dxf(_table(feats), p, layer_col="layer")
    back = read_dxf(p)
    geoms = [wkb_to_geometry(w) for w in back["wkb"].to_pylist()]
    assert geoms[0]["coordinates"] == [0.1 + 0.2, -3.75]   # bit-exact
    assert geoms[1]["coordinates"][2][0] == np.pi
    assert geoms[2]["type"] == "Polygon"
    assert back["layer"].to_pylist() == ["pts", "lines", "zone7",
                                         "pts", "pts"]
    assert back["entity"].to_pylist()[3] == "POINT"        # Multi exploded


def test_dxf_legacy_polyline_and_circle(tmp_path):
    """Hand-written R12 text: POLYLINE/VERTEX/SEQEND (closed flag) and
    CIRCLE (linearized ring) parse; unknown entities are skipped."""
    txt = "\n".join([
        "0", "SECTION", "2", "HEADER", "0", "ENDSEC",
        "0", "SECTION", "2", "ENTITIES",
        "0", "POLYLINE", "8", "L1", "70", "1",
        "0", "VERTEX", "8", "L1", "10", "0.0", "20", "0.0",
        "0", "VERTEX", "8", "L1", "10", "2.0", "20", "0.0",
        "0", "VERTEX", "8", "L1", "10", "2.0", "20", "2.0",
        "0", "SEQEND",
        "0", "CIRCLE", "8", "C", "10", "1.0", "20", "-1.0", "40", "0.5",
        "0", "MTEXT", "8", "T", "1", "hello",       # skipped
        "0", "POLYLINE", "8", "L2", "70", "0",
        "0", "VERTEX", "10", "5.0", "20", "5.0",
        "0", "VERTEX", "10", "6.0", "20", "7.0",
        "0", "SEQEND",
        "0", "ENDSEC", "0", "EOF", "",
    ])
    p = str(tmp_path / "legacy.dxf")
    open(p, "w").write(txt)
    t = read_dxf(p)
    assert t["entity"].to_pylist() == ["POLYLINE", "CIRCLE", "POLYLINE"]
    g0 = wkb_to_geometry(t["wkb"][0].as_py())
    assert g0["type"] == "Polygon"                        # closed flag
    assert g0["coordinates"][0][0] == g0["coordinates"][0][-1]
    gc = wkb_to_geometry(t["wkb"][1].as_py())
    ring = np.asarray(gc["coordinates"][0])
    r = np.hypot(ring[:, 0] - 1.0, ring[:, 1] + 1.0)
    assert np.allclose(r, 0.5, atol=1e-12)                # on the circle
    g2 = wkb_to_geometry(t["wkb"][2].as_py())
    assert g2["type"] == "LineString"
    assert t["layer"].to_pylist() == ["L1", "C", "L2"]


def test_dxf_ray_source_and_open_vector(tmp_path, ray_session):
    feats = [({"type": "Point", "coordinates": [float(i), float(-i)]},
              f"l{i % 2}") for i in range(10)]
    paths = []
    for k in range(3):
        p = str(tmp_path / f"f{k}.dxf")
        write_dxf(_table(feats), p, layer_col="layer")
        paths.append(p)
    ds = read_dxf_files(paths)
    assert ds.count() == 30
    from georay.vectoropen import open_vector
    dv = open_vector(paths[0])
    assert dv.count() == 10
    assert set(dv.schema().names) == {"wkb", "layer", "entity"}
