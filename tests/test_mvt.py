"""MVT writer/reader (georay/mvt.py) vs the public Mapbox Vector Tile
2.1 spec: protobuf roundtrips, command-stream pins, ring winding, value
types, tile-coordinate transform."""

import numpy as np

from georay.geojson import geometry_to_wkb
from georay.mvt import (_pack_commands, _ring_area2_screen, decode_mvt,
                        encode_mvt, wkb_to_tile_coords)


def _sq(x0, y0, s):
    return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s],
            [x0, y0]]


def test_roundtrip_all_types():
    feats = [
        {"geom": {"type": "Point", "coordinates": [100, 200]},
         "attrs": {"name": "pt", "v": 1.5, "n": -7, "b": True}, "id": 9},
        {"geom": {"type": "MultiPoint",
                  "coordinates": [[1, 2], [3, 4]]}, "attrs": {}},
        {"geom": {"type": "LineString",
                  "coordinates": [[0, 0], [10, 10], [20, 0]]},
         "attrs": {"name": "ln"}},
        {"geom": {"type": "MultiLineString",
                  "coordinates": [[[0, 0], [5, 5]],
                                  [[9, 9], [9, 0], [0, 9]]]},
         "attrs": {}},
        {"geom": {"type": "Polygon",
                  "coordinates": [_sq(0, 0, 100), _sq(10, 10, 20)[::-1]]},
         "attrs": {"name": "pg"}},
        {"geom": {"type": "MultiPolygon",
                  "coordinates": [[_sq(200, 200, 50)],
                                  [_sq(300, 300, 10)]]}, "attrs": {}},
    ]
    out = decode_mvt(encode_mvt({"roads": feats}))
    r = out["roads"]["features"]
    assert out["roads"]["extent"] == 4096
    assert r[0]["id"] == 9
    assert r[0]["attrs"] == {"name": "pt", "v": 1.5, "n": -7, "b": True}
    assert r[0]["geom"] == feats[0]["geom"]
    assert r[1]["geom"] == feats[1]["geom"]
    assert r[2]["geom"] == feats[2]["geom"]
    assert r[3]["geom"] == feats[3]["geom"]
    g4 = r[4]["geom"]
    assert g4["type"] == "Polygon" and len(g4["coordinates"]) == 2
    g5 = r[5]["geom"]
    assert g5["type"] == "MultiPolygon" and len(g5["coordinates"]) == 2


def test_wkb_input_accepted():
    wkb = geometry_to_wkb({"type": "Point", "coordinates": [7, 8]})
    out = decode_mvt(encode_mvt({"l": [{"geom": wkb, "attrs": {}}]}))
    assert out["l"]["features"][0]["geom"]["coordinates"] == [7, 8]


def test_spec_command_integers():
    """The spec's own worked example: MoveTo(1,1), LineTo(3,3) with
    relative deltas encodes to [9, 2, 2, 10, 4, 4]  (§4.3.5.2 shape)."""
    pairs = [(1, 1), (1, 1), (2, 1), (2, 2)]
    assert _pack_commands(pairs) == [9, 2, 2, 10, 4, 4]


def test_polygon_winding_normalized():
    """Exterior ring must be CW in y-down tile space (positive spec
    area) no matter the input winding; holes the opposite."""
    for ext in (_sq(0, 0, 100), _sq(0, 0, 100)[::-1]):
        enc = encode_mvt({"l": [{"geom": {
            "type": "Polygon",
            "coordinates": [ext, _sq(10, 10, 20)]}, "attrs": {}}]})
        g = decode_mvt(enc)["l"]["features"][0]["geom"]
        rings = [np.asarray(r) for r in g["coordinates"]]
        assert _ring_area2_screen(rings[0]) > 0
        assert _ring_area2_screen(rings[1]) < 0


def test_value_dictionary_dedup():
    """Repeated attribute values share one Value entry (the layer
    dictionaries the spec mandates) — observable as sub-linear growth."""
    feats = [{"geom": {"type": "Point", "coordinates": [i, i]},
              "attrs": {"cls": "road", "lanes": 2}} for i in range(50)]
    b = len(encode_mvt({"l": feats}))
    feats1 = feats[:1]
    b1 = len(encode_mvt({"l": feats1}))
    # 49 more features add only geometry+tags, not new key/value entries
    assert b - b1 < 49 * 20


def test_tile_coordinate_transform():
    wkb = geometry_to_wkb({"type": "Point", "coordinates": [0.0, 0.0]})
    g = wkb_to_tile_coords(wkb, 0, 0, 0)
    assert g["coordinates"] == [2048, 2048]
    # NE quadrant of the z1 (1,1) TMS tile: y-down flips latitude
    from georay.mercator import latlon_to_meters
    mx, my = latlon_to_meters(40.0, 100.0)
    wkb2 = geometry_to_wkb({"type": "Point", "coordinates": [mx, my]})
    g2 = wkb_to_tile_coords(wkb2, 1, 1, 1)
    x, y = g2["coordinates"]
    assert 0 <= x <= 4096 and 0 <= y <= 4096
    assert x > 2048 and y > 1024     # lon 100E is right-of-center
