"""Layer-algebra overlay operators — the OGR Intersection / Clip / Erase
family (ogr/ogrsf_frmts/generic/ogrlayer.cpp:2633, 4785, 5094) for the
subset expressible without GEOS: clipping against CONVEX polygons
(rect tile boundaries, hexagon cells, convex zones) via Sutherland–Hodgman.

Semantics per the reference: envelope pretest first (ogrlayer.cpp:
2714-2733), then the geometric operation; output keeps the input's
attributes (Clip/Erase) or both sides' (Intersection).  General
concave×concave overlay needs a full polygon-clipping kernel (v2).

``polygon_area`` uses the shoelace formula; all ring math is vectorized
numpy; per-feature loops only at the feature level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geom import parse_wkb_multi, wkb_polygon

__all__ = ["clip_ring_convex", "polygon_area", "is_convex",
           "clip_layer_convex", "erase_layer_convex"]


def polygon_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a (closed or open) ring."""
    r = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def is_convex(ring: np.ndarray) -> bool:
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    n = len(r)
    cross = np.cross(np.roll(r, -1, axis=0) - r,
                     np.roll(r, -2, axis=0) - np.roll(r, -1, axis=0))
    return bool((cross >= -1e-12).all() or (cross <= 1e-12).all())


def clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip an arbitrary (possibly concave) subject
    ring against a CONVEX clip ring.  Returns the clipped ring (possibly
    empty).  Both rings may be open or closed; output is open (caller's
    WKB writer closes it)."""
    subj = np.asarray(subject, dtype=np.float64)
    if np.array_equal(subj[0], subj[-1]):
        subj = subj[:-1]
    clip = np.asarray(clip_ring, dtype=np.float64)
    if np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    if polygon_area(clip) < 0:  # ensure CCW so "inside" is left of edges
        clip = clip[::-1]
    out = subj
    for i in range(len(clip)):
        if len(out) == 0:
            return out
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        edge = b - a
        # signed side of each vertex (left of a->b = inside)
        rel = out - a
        side = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]
        inside = side >= -1e-12
        nxt_idx = np.roll(np.arange(len(out)), -1)
        new_pts = []
        for j in range(len(out)):
            k = nxt_idx[j]
            p, q = out[j], out[k]
            pi, qi = inside[j], inside[k]
            if pi:
                new_pts.append(p)
            if pi != qi:
                # intersection of pq with the clip edge line
                d = q - p
                denom = edge[0] * d[1] - edge[1] * d[0]
                if abs(denom) > 1e-300:
                    t = (edge[0] * (a[1] - p[1]) - edge[1] * (a[0] - p[0])) \
                        / denom
                    new_pts.append(p + t * d)
        out = np.array(new_pts, dtype=np.float64) if new_pts else \
            np.empty((0, 2))
    return out


def _clip_wkb(buf: bytes, clip_ring: np.ndarray):
    """Clip every ring of a WKB (Multi)Polygon; returns (wkb, area) or None
    when empty.  Ring grouping is preserved per polygon (parse_wkb_multi)
    so a MultiPolygon's second outer ring is NOT subtracted as a hole;
    holes are clipped with the same convex window (correct: a convex
    window cannot split a hole into parts that merge)."""
    polys = parse_wkb_multi(bytes(buf))
    out_rings = []
    area = 0.0
    for rings in polys:
        clipped = []
        for r in rings:
            c = clip_ring_convex(r, clip_ring)
            if len(c) >= 3:
                clipped.append(c)
        if not clipped:
            continue
        area += (abs(polygon_area(clipped[0]))
                 - sum(abs(polygon_area(r)) for r in clipped[1:]))
        out_rings.extend(clipped)
    if not out_rings:
        return None
    return wkb_polygon(out_rings), max(area, 0.0)


def clip_layer_convex(ds, clip_ring, wkb_col: str = "wkb"):
    """ogr2ogr ``-clipsrc`` / layer Clip against a convex window: each
    row's polygon is intersected with the window; rows whose geometry
    vanishes are dropped; attributes kept (Clip keeps input attrs only,
    ogrlayer.cpp:4785)."""
    clip_arr = np.asarray(clip_ring, dtype=np.float64)
    cminx, cminy = clip_arr[:, 0].min(), clip_arr[:, 1].min()
    cmaxx, cmaxy = clip_arr[:, 0].max(), clip_arr[:, 1].max()

    def clip_batch(batch: pa.Table) -> pa.Table:
        keep, wkbs, areas = [], [], []
        has_env = all(c in batch.schema.names
                      for c in ("minx", "miny", "maxx", "maxy"))
        for i in range(batch.num_rows):
            if has_env:  # envelope pretest (ogrlayer.cpp:2714-2733)
                if (batch["minx"][i].as_py() > cmaxx
                        or batch["maxx"][i].as_py() < cminx
                        or batch["miny"][i].as_py() > cmaxy
                        or batch["maxy"][i].as_py() < cminy):
                    continue
            res = _clip_wkb(batch[wkb_col][i].as_py(), clip_arr)
            if res is None:
                continue
            keep.append(i)
            wkbs.append(res[0])
            areas.append(res[1])
        out = batch.take(pa.array(keep, pa.int64()))
        out = out.drop_columns([wkb_col])
        out = out.append_column(wkb_col, pa.array(wkbs, pa.binary()))
        return out.append_column("clip_area", pa.array(areas, pa.float64()))

    return ds.map_batches(clip_batch, batch_format="pyarrow")


def erase_layer_convex(ds, erase_ring, wkb_col: str = "wkb",
                       grid: int = 64):
    """Layer Erase (ogrlayer.cpp:5094) against a convex window, reported as
    the remaining AREA per feature (geometry difference of concave results
    needs a general clipper — v2; the area is exact via inclusion-
    exclusion: area(f) − area(f ∩ window))."""
    erase_arr = np.asarray(erase_ring, dtype=np.float64)

    def erase_batch(batch: pa.Table) -> pa.Table:
        areas = []
        for i in range(batch.num_rows):
            buf = batch[wkb_col][i].as_py()
            full = sum(abs(polygon_area(rings[0]))
                       - sum(abs(polygon_area(r)) for r in rings[1:])
                       for rings in parse_wkb_multi(buf))
            res = _clip_wkb(buf, erase_arr)
            inter = res[1] if res else 0.0
            areas.append(max(full - inter, 0.0))
        return batch.append_column("erase_area",
                                   pa.array(areas, pa.float64()))

    return ds.map_batches(erase_batch, batch_format="pyarrow")
