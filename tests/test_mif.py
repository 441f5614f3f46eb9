"""MapInfo MIF/MID driver (georay.mif): typed attribute roundtrips,
region ring closure, multi-part plines, style-clause skipping."""
import numpy as np
import pyarrow as pa

from georay.geojson import geometry_to_wkb, wkb_to_geometry
from georay.mif import read_mif, read_mif_files, write_mif


def test_mif_roundtrip_typed_attributes(tmp_path):
    feats = [
        {"type": "Point", "coordinates": [0.1 + 0.2, -3.75]},
        {"type": "LineString", "coordinates": [[0, 0], [2, 1]]},
        {"type": "LineString",
         "coordinates": [[0, 0], [1, 1], [2, 0.5]]},
        {"type": "Polygon",
         "coordinates": [[[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]],
                         [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]},
        {"type": "MultiLineString",
         "coordinates": [[[0, 0], [1, 0]], [[5, 5], [6, 6], [7, 5]]]},
    ]
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(g) for g in feats],
                        pa.binary()),
        "fid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "score": pa.array([0.5, np.pi, -1.25, 2.0, 3.5], pa.float64()),
        "name": pa.array(['pt', 'li"ne', 'pl,ine', 'poly', 'ml']),
    })
    p = write_mif(t, str(tmp_path / "feats.mif"))
    back = read_mif(p)
    geoms = [wkb_to_geometry(w) for w in back["wkb"].to_pylist()]
    assert geoms[0]["coordinates"] == [0.1 + 0.2, -3.75]  # bit-exact
    assert geoms[1]["type"] == "LineString"               # 2-pt Line
    assert geoms[2]["coordinates"][2] == [2.0, 0.5]
    assert geoms[3]["type"] == "Polygon"
    assert len(geoms[3]["coordinates"]) == 2              # hole kept
    assert geoms[3]["coordinates"][0][0] == \
        geoms[3]["coordinates"][0][-1]                    # ring closed
    assert geoms[4]["type"] == "MultiLineString"
    assert back["fid"].to_pylist() == [10, 11, 12, 13, 14]
    assert back["score"].to_pylist()[1] == np.pi          # repr float
    # quote and delimiter survive the MID escaping
    assert back["name"].to_pylist() == ['pt', 'li"ne', 'pl,ine',
                                        'poly', 'ml']


def test_mif_style_clauses_skipped(tmp_path):
    mif = "\n".join([
        "Version 300", 'Delimiter ","', "Columns 1", "  id Integer",
        "Data", "",
        "Point 1.5 2.5", "    Symbol (34,0,12)",
        "Region 1", "4", "0 0", "1 0", "1 1", "0 1",
        "    Pen (1,2,0)", "    Brush (2,16777215)",
        "None",
    ])
    (tmp_path / "s.mif").write_text(mif)
    (tmp_path / "s.mid").write_text("7\n8\n9\n")
    t = read_mif(str(tmp_path / "s.mif"))
    assert t.num_rows == 3
    assert t["id"].to_pylist() == [7, 8, 9]
    assert wkb_to_geometry(t["wkb"][0].as_py())["type"] == "Point"
    g1 = wkb_to_geometry(t["wkb"][1].as_py())
    assert g1["type"] == "Polygon"
    assert g1["coordinates"][0][0] == g1["coordinates"][0][-1]
    assert t["wkb"][2].as_py() is None                    # NONE geometry


def test_mif_ray_source(tmp_path, ray_session):
    t = pa.table({
        "wkb": pa.array([geometry_to_wkb(
            {"type": "Point", "coordinates": [float(i), 0.0]})
            for i in range(6)], pa.binary()),
        "fid": pa.array(list(range(6)), pa.int64()),
    })
    paths = [write_mif(t, str(tmp_path / f"f{k}.mif")) for k in range(2)]
    ds = read_mif_files(paths)
    assert ds.count() == 12
    assert set(ds.schema().names) == {"wkb", "fid"}
