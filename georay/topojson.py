"""TopoJSON vector driver — the reference reads TopoJSON through the
GeoJSON driver family (ogr/ogrsf_frmts/geojson/ogrtopojsonreader.cpp);
format per the TopoJSON 1.0 specification (topojson/topojson-specification).

Reader (full spec):

* quantized topologies — ``transform.scale``/``translate`` with
  delta-encoded integer arcs (position 0 absolute-quantized, the rest
  cumulative deltas);
* un-quantized topologies — absolute float arcs, no delta coding;
* arc-index geometry: a negative index ``i`` means arc ``~i`` traversed
  in REVERSE; consecutive arcs in a line/ring share their junction
  point, which is emitted once (the stitch rule);
* ``Point``/``MultiPoint`` carry ``coordinates`` directly (transformed
  when quantized, never delta-coded);
* each named object in ``objects`` is a layer; a ``GeometryCollection``
  object's members are its features (``id`` + ``properties`` become
  columns, schema-unified like OGR's field unification).

Writer: one arc PER line/ring.  Shared-border arc extraction (the
junction-cut-dedup topology algorithm of topojson-server) is a size
optimization, not a conformance requirement — emitted files are valid
TopoJSON and round-trip exactly; they just don't share arcs between
neighbouring polygons.  ``quantize=None`` writes absolute float arcs
(bit-exact roundtrip); ``quantize=Q`` writes a Q-point quantized
delta-encoded topology (lossy to the grid, exact when inputs sit on it).

Like the GeoJSON driver, a TopoJSON file is one JSON document — the
small/broadcast-side format (zones, boundaries); Parquet remains the
scale source.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .geojson import geometry_to_wkb, wkb_to_geometry

__all__ = ["decode_arcs", "topology_to_tables", "read_topojson",
           "table_to_topology", "write_topojson"]


# ---------------------------------------------------------------- read

def decode_arcs(topo: dict) -> list:
    """Topology → list of (n,2) float64 arrays, delta/transform decoded."""
    tr = topo.get("transform")
    out = []
    if tr is None:
        for arc in topo["arcs"]:
            a = np.asarray(arc, dtype=np.float64)
            out.append(a[:, :2] if a.size else a.reshape(0, 2))
        return out
    sx, sy = tr["scale"]
    tx, ty = tr["translate"]
    for arc in topo["arcs"]:
        a = np.asarray(arc, dtype=np.float64)
        if not a.size:
            out.append(a.reshape(0, 2))
            continue
        q = np.cumsum(a[:, :2], axis=0)
        q[:, 0] = q[:, 0] * sx + tx
        q[:, 1] = q[:, 1] * sy + ty
        out.append(q)
    return out


def _point_xy(c, tr):
    if tr is None:
        return [float(c[0]), float(c[1])]
    sx, sy = tr["scale"]
    tx, ty = tr["translate"]
    return [float(c[0]) * sx + tx, float(c[1]) * sy + ty]


def _stitch(arc_idx, arcs) -> list:
    """Arc-index list → coordinate list (reverse on ~i, drop the shared
    junction point between consecutive arcs)."""
    pts: list = []
    for i in arc_idx:
        a = arcs[~i][::-1] if i < 0 else arcs[i]
        seg = a.tolist()
        if pts and seg and seg[0] == pts[-1]:
            seg = seg[1:]
        pts.extend(seg)
    return pts


def _geom_to_geojson(g: dict, arcs, tr) -> dict | None:
    t = g.get("type")
    if t is None:
        return None
    if t == "Point":
        return {"type": t, "coordinates": _point_xy(g["coordinates"], tr)}
    if t == "MultiPoint":
        return {"type": t, "coordinates":
                [_point_xy(c, tr) for c in g["coordinates"]]}
    if t == "LineString":
        return {"type": t, "coordinates": _stitch(g["arcs"], arcs)}
    if t == "MultiLineString":
        return {"type": t, "coordinates":
                [_stitch(part, arcs) for part in g["arcs"]]}
    if t == "Polygon":
        return {"type": t, "coordinates":
                [_stitch(ring, arcs) for ring in g["arcs"]]}
    if t == "MultiPolygon":
        return {"type": t, "coordinates":
                [[_stitch(ring, arcs) for ring in poly]
                 for poly in g["arcs"]]}
    if t == "GeometryCollection":
        return {"type": t, "geometries":
                [_geom_to_geojson(m, arcs, tr) for m in g["geometries"]]}
    raise ValueError(f"unsupported TopoJSON geometry type {t!r}")


def topology_to_tables(topo: dict) -> dict:
    """Topology document → {layer name: Arrow table} (wkb + id +
    unified property columns)."""
    if topo.get("type") != "Topology":
        raise ValueError("not a TopoJSON Topology document")
    arcs = decode_arcs(topo)
    tr = topo.get("transform")
    out = {}
    for name, obj in topo.get("objects", {}).items():
        feats = (obj.get("geometries", [])
                 if obj.get("type") == "GeometryCollection" else [obj])
        keys: list = []
        has_id = any("id" in f for f in feats)
        for f in feats:
            for k in (f.get("properties") or {}):
                if k not in keys:
                    keys.append(k)
        wkbs = []
        for f in feats:
            gj = _geom_to_geojson(f, arcs, tr)
            wkbs.append(None if gj is None else geometry_to_wkb(gj))
        cols = {"wkb": pa.array(wkbs, pa.binary())}
        if has_id:
            cols["id"] = pa.array([f.get("id") for f in feats])
        for k in keys:
            cols[k] = pa.array([(f.get("properties") or {}).get(k)
                                for f in feats])
        out[name] = pa.table(cols)
    return out


def read_topojson(path: str, layer: str | None = None):
    """TopoJSON file → ``ray.data.Dataset`` (one JSON document: parsed
    driver-side then ``from_arrow`` — the broadcast-side contract shared
    with :func:`georay.geojson.read_geojson`).  ``layer`` picks one
    object; default = the only object (error if several)."""
    import ray
    with open(path) as f:
        topo = json.load(f)
    tables = topology_to_tables(topo)
    if layer is None:
        if len(tables) != 1:
            raise ValueError(f"file has layers {sorted(tables)}; "
                             "pass layer=")
        layer = next(iter(tables))
    return ray.data.from_arrow(tables[layer])


# --------------------------------------------------------------- write

def _coords_to_arcs(coords, arcs: list, quant) -> list:
    """Append one arc for this coordinate list, return its index list."""
    if quant is None:
        arcs.append([[float(x), float(y)] for x, y in coords])
    else:
        sx, sy, tx, ty = quant
        q = np.asarray(coords, dtype=np.float64)
        qi = np.empty((len(q), 2), dtype=np.int64)
        np.rint((q[:, 0] - tx) / sx, out=qi[:, 0], casting="unsafe")
        np.rint((q[:, 1] - ty) / sy, out=qi[:, 1], casting="unsafe")
        d = np.diff(qi, axis=0, prepend=qi[:1])
        d[0] = qi[0]
        arcs.append(d.tolist())
    return [len(arcs) - 1]


def _geojson_to_topo(gj: dict, arcs: list, quant) -> dict:
    t = gj["type"]
    if t == "Point":
        c = gj["coordinates"]
        if quant is not None:
            sx, sy, tx, ty = quant
            c = [int(round((c[0] - tx) / sx)), int(round((c[1] - ty) / sy))]
        return {"type": t, "coordinates": c}
    if t == "MultiPoint":
        cs = gj["coordinates"]
        if quant is not None:
            sx, sy, tx, ty = quant
            cs = [[int(round((c[0] - tx) / sx)),
                   int(round((c[1] - ty) / sy))] for c in cs]
        return {"type": t, "coordinates": cs}
    if t == "LineString":
        return {"type": t, "arcs": _coords_to_arcs(gj["coordinates"],
                                                   arcs, quant)}
    if t == "MultiLineString":
        return {"type": t, "arcs": [_coords_to_arcs(p, arcs, quant)
                                    for p in gj["coordinates"]]}
    if t == "Polygon":
        return {"type": t, "arcs": [_coords_to_arcs(r, arcs, quant)
                                    for r in gj["coordinates"]]}
    if t == "MultiPolygon":
        return {"type": t, "arcs":
                [[_coords_to_arcs(r, arcs, quant) for r in poly]
                 for poly in gj["coordinates"]]}
    if t == "GeometryCollection":
        return {"type": t, "geometries":
                [_geojson_to_topo(m, arcs, quant)
                 for m in gj["geometries"]]}
    raise ValueError(f"unsupported geometry type {t!r}")


def _walk_coords(gj: dict, acc: list):
    t = gj["type"]
    if t == "GeometryCollection":
        for m in gj["geometries"]:
            _walk_coords(m, acc)
        return
    c = gj["coordinates"]
    if t == "Point":
        acc.append([c])
    elif t in ("MultiPoint", "LineString"):
        acc.append(c)
    elif t in ("MultiLineString", "Polygon"):
        acc.extend(c)
    else:  # MultiPolygon
        for poly in c:
            acc.extend(poly)


def table_to_topology(t: pa.Table, *, layer: str = "layer",
                      wkb_col: str = "wkb",
                      quantize: int | None = None,
                      transform: dict | None = None) -> dict:
    """Arrow table → Topology document (one object named ``layer``, a
    GeometryCollection of its rows; ``id`` column → feature id, other
    columns → properties).  ``transform={"scale":[sx,sy],
    "translate":[tx,ty]}`` quantizes onto an EXPLICIT grid (exact when
    inputs sit on it); ``quantize=Q`` derives the grid from the data
    bbox (topojson-server's default)."""
    props = [c for c in t.schema.names if c not in (wkb_col, "id")]
    gjs = [None if t[wkb_col][i].as_py() is None
           else wkb_to_geometry(t[wkb_col][i].as_py())
           for i in range(t.num_rows)]
    quant = None
    if transform is not None:
        (sx, sy), (tx, ty) = transform["scale"], transform["translate"]
        quant = (sx, sy, tx, ty)
    elif quantize is not None:
        if quantize < 2:
            raise ValueError("quantize must be >= 2")
        pts: list = []
        for g in gjs:
            if g is not None:
                _walk_coords(g, pts)
        allp = (np.concatenate([np.asarray(p, dtype=np.float64)[:, :2]
                                for p in pts if len(p)])
                if pts else np.zeros((1, 2)))
        minx, miny = allp.min(axis=0)
        maxx, maxy = allp.max(axis=0)
        sx = ((maxx - minx) / (quantize - 1)) or 1.0
        sy = ((maxy - miny) / (quantize - 1)) or 1.0
        quant = (sx, sy, minx, miny)
        transform = {"scale": [sx, sy], "translate": [minx, miny]}
    arcs: list = []
    feats = []
    for i, gj in enumerate(gjs):
        f = ({"type": "GeometryCollection", "geometries": []} if gj is None
             else _geojson_to_topo(gj, arcs, quant))
        if "id" in t.schema.names and t["id"][i].is_valid:
            f["id"] = t["id"][i].as_py()
        p = {k: t[k][i].as_py() for k in props}
        if p:
            f["properties"] = p
        feats.append(f)
    topo = {"type": "Topology",
            "objects": {layer: {"type": "GeometryCollection",
                                "geometries": feats}},
            "arcs": arcs}
    if transform is not None:
        topo["transform"] = transform
    return topo


def write_topojson(ds_or_table, path: str, *, layer: str = "layer",
                   wkb_col: str = "wkb",
                   quantize: int | None = None,
                   transform: dict | None = None) -> str:
    """Dataset/table → TopoJSON file (single document — collected; the
    small-output contract shared with write_geojson)."""
    t = ds_or_table
    if not isinstance(t, pa.Table):
        t = pa.concat_tables(list(
            t.iter_batches(batch_size=65536, batch_format="pyarrow")))
    with open(path, "w") as f:
        json.dump(table_to_topology(t, layer=layer, wkb_col=wkb_col,
                                    quantize=quantize,
                                    transform=transform), f,
                  separators=(",", ":"))
    return path
