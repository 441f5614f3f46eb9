"""Layer-algebra overlay operators — the OGR Intersection / Union /
SymDifference / Identity / Update / Clip / Erase family
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:2633, 3051, 3588, 4018, 4436, 4785,
5094) WITHOUT GEOS:

* Convex fast path: Sutherland–Hodgman clip against convex windows
  (rect tile boundaries, hexagon cells) — :func:`clip_ring_convex`.
* GENERAL concave×concave boolean ops — :func:`polygon_boolean`:
  1. subdivide every edge of A at its intersections with B's edges (one
     vectorized (nA×nB) 2×2 solve) and vice versa;
  2. classify each sub-edge by midpoint even-odd PIP against the other
     polygon (the same parity kernel the spatial join uses);
  3. select edges per op (∩: A-in-B + B-in-A; ∪: A-out-B + B-out-A;
     −: A-out-B + reversed B-in-A; ⊕: both differences);
  4. stitch directed edges into rings, taking the most-counterclockwise
     turn at multi-degree nodes; CCW rings = outers, CW = holes.
  O(nA·nB) edge pairs — fine for feature-sized polygons; degenerate
  shared-boundary inputs are resolved by the half-open parity convention
  and a deterministic midpoint nudge (documented; snap-rounding is out of
  scope, same caveat GEOS solves with its own snapping).

Semantics per the reference: envelope pretest first (ogrlayer.cpp:
2714-2733), then the geometric operation; output keeps the input's
attributes (Clip/Erase) or both sides' (Intersection/Union family).

``polygon_area`` uses the shoelace formula; all ring math is vectorized
numpy; per-feature loops only at the feature level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geom import parse_wkb_multi, wkb_polygon

__all__ = ["clip_ring_convex", "polygon_area", "is_convex",
           "clip_layer_convex", "erase_layer_convex",
           "polygon_boolean", "boolean_area", "overlay_layers",
           "identity_layers", "update_layers"]


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
    the remaining AREA per feature — exact via inclusion-exclusion:
    area(f) − area(f ∩ window).  For erase GEOMETRY (incl. concave erase
    shapes) use :func:`polygon_boolean` with op="difference"."""
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


# ---------------------------------------------------------------------------
# General concave×concave boolean ops (edge-classification overlay)
# ---------------------------------------------------------------------------

def _normalize_rings(polys):
    """List of ring-groups → list of (n,2) open rings with outer CCW and
    holes CW (orientation carries region parity through the stitcher)."""
    rings = []
    for group in polys:
        for j, r in enumerate(group):
            r = np.asarray(r, dtype=np.float64)
            if len(r) >= 2 and np.array_equal(r[0], r[-1]):
                r = r[:-1]
            if len(r) < 3:
                continue
            a = polygon_area(r)
            want_ccw = j == 0
            if (a > 0) != want_ccw:
                r = r[::-1]
            rings.append(r)
    return rings


def _edges_of(rings):
    """Flatten rings to directed edge arrays (p, q)."""
    ps, qs = [], []
    for r in rings:
        ps.append(r)
        qs.append(np.roll(r, -1, axis=0))
    if not ps:
        z = np.empty((0, 2))
        return z, z
    return np.vstack(ps), np.vstack(qs)


def _subdivide(p, q, rp, rq, eps=1e-12):
    """Split every edge (p→q) at its proper intersections with any edge
    (rp→rq).  Vectorized (n×m) parametric solve; returns new (p, q)."""
    n, m = len(p), len(rp)
    if n == 0 or m == 0:
        return p, q
    d1 = (q - p)[:, None, :]          # (n,1,2)
    d2 = (rq - rp)[None, :, :]        # (1,m,2)
    w = rp[None, :, :] - p[:, None, :]
    denom = d1[:, :, 0] * d2[:, :, 1] - d1[:, :, 1] * d2[:, :, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (w[:, :, 0] * d2[:, :, 1] - w[:, :, 1] * d2[:, :, 0]) / denom
        u = (w[:, :, 0] * d1[:, :, 1] - w[:, :, 1] * d1[:, :, 0]) / denom
    hit = (np.abs(denom) > eps) & (t > eps) & (t < 1 - eps) \
        & (u >= -eps) & (u <= 1 + eps)
    out_p, out_q = [], []
    for i in range(n):
        ts = np.sort(t[i][hit[i]])
        if ts.size == 0:
            out_p.append(p[i]); out_q.append(q[i])
            continue
        ts = np.concatenate([[0.0], ts, [1.0]])
        ts = ts[np.concatenate([[True], np.diff(ts) > eps])]
        pts = p[i] + ts[:, None] * (q[i] - p[i])
        for a, b in zip(pts[:-1], pts[1:]):
            out_p.append(a); out_q.append(b)
    return np.asarray(out_p), np.asarray(out_q)


def _inside_mask(mid, rings):
    """Even-odd membership of midpoints vs a ring set (all rings count)."""
    from .geom import PackedPolygons
    if not rings:
        return np.zeros(len(mid), dtype=bool)
    pp = PackedPolygons.from_wkb([wkb_polygon(rings)])
    idx = np.arange(len(mid), dtype=np.int64)
    return pp.contains_pairs(mid[:, 0], mid[:, 1], idx,
                             np.zeros(len(mid), dtype=np.int64))


def _stitch(p, q, eps=1e-9):
    """Connect directed edges into closed rings.  At nodes where several
    edges leave, take the most-counterclockwise turn relative to the
    incoming direction — keeps regions simple under even-odd."""
    if len(p) == 0:
        return []
    key = lambda pt: (round(pt[0] / eps) * eps, round(pt[1] / eps) * eps)
    out_map = {}
    for i in range(len(p)):
        out_map.setdefault(key(p[i]), []).append(i)
    used = np.zeros(len(p), dtype=bool)
    rings = []
    for start in range(len(p)):
        if used[start]:
            continue
        chain = [start]
        used[start] = True
        cur = start
        guard = 0
        while guard < 4 * len(p):
            guard += 1
            nk = key(q[cur])
            cands = [e for e in out_map.get(nk, []) if not used[e]]
            if not cands and key(p[start]) == nk:
                break  # closed
            if not cands:
                chain = None
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # most-CCW turn: maximize angle from reversed incoming
                vin = p[cur] - q[cur]
                ain = np.arctan2(vin[1], vin[0])
                best, best_ang = None, -1.0
                for e in cands:
                    vout = q[e] - p[e]
                    ang = (np.arctan2(vout[1], vout[0]) - ain) % (2 * np.pi)
                    if ang > best_ang:
                        best, best_ang = e, ang
                nxt = best
            chain.append(nxt)
            used[nxt] = True
            cur = nxt
            if key(q[cur]) == key(p[start]):
                break
        if chain and key(q[chain[-1]]) == key(p[chain[0]]):
            ring = np.asarray([p[e] for e in chain])
            if len(ring) >= 3 and abs(polygon_area(ring)) > eps:
                rings.append(ring)
    return rings


def polygon_boolean(a_polys, b_polys, op: str, *, a_rings=None):
    """Boolean op of two (multi)polygons given as ring-group lists
    (``parse_wkb_multi`` output).  ``op`` ∈ {"intersection", "union",
    "difference", "symdifference"}.  Returns a list of result rings
    (CCW = outer, CW = hole, even-odd).  ``a_rings`` feeds an already-
    stitched result back in WITHOUT re-orientation (its CCW/CW parity is
    already region-correct) — the Identity/Update iterated-difference
    path."""
    ra = a_rings if a_rings is not None else _normalize_rings(a_polys)
    rb = _normalize_rings(b_polys)
    pa_, qa = _edges_of(ra)
    pb, qb = _edges_of(rb)
    sa_p, sa_q = _subdivide(pa_, qa, pb, qb)
    sb_p, sb_q = _subdivide(pb, qb, pa_, qa)
    mid_a = (sa_p + sa_q) * 0.5
    mid_b = (sb_p + sb_q) * 0.5
    a_in_b = _inside_mask(mid_a, rb)
    b_in_a = _inside_mask(mid_b, ra)
    if op == "intersection":
        keep_p = np.vstack([sa_p[a_in_b], sb_p[b_in_a]])
        keep_q = np.vstack([sa_q[a_in_b], sb_q[b_in_a]])
    elif op == "union":
        keep_p = np.vstack([sa_p[~a_in_b], sb_p[~b_in_a]])
        keep_q = np.vstack([sa_q[~a_in_b], sb_q[~b_in_a]])
    elif op == "difference":
        keep_p = np.vstack([sa_p[~a_in_b], sb_q[b_in_a]])   # B edges reversed
        keep_q = np.vstack([sa_q[~a_in_b], sb_p[b_in_a]])
    elif op == "symdifference":
        # (A−B) ∪ (B−A) edge sets: kept edges of each difference
        keep_p = np.vstack([sa_p[~a_in_b], sb_q[b_in_a],
                            sb_p[~b_in_a], sa_q[a_in_b]])
        keep_q = np.vstack([sa_q[~a_in_b], sb_p[b_in_a],
                            sb_q[~b_in_a], sa_p[a_in_b]])
    else:
        raise ValueError(f"unknown op {op!r}")
    return _stitch(keep_p, keep_q)


def boolean_area(rings) -> float:
    """Signed-area sum of a stitched result (outers minus holes)."""
    return float(sum(polygon_area(r) for r in rings))


def overlay_layers(ds, other: pa.Table, op: str = "intersection",
                   wkb_col: str = "wkb", other_wkb_col: str = "wkb",
                   other_id_col: str = "polygon_id"):
    """Layer overlay (OGR Intersection/Union/… semantics): every row of
    ``ds`` is combined with every OVERLAPPING row of the broadcast
    ``other`` table (envelope pretest via R-tree), emitting one row per
    pair with the result WKB + area.  Attributes: input row's columns +
    the other side's id (Intersection keeps both sides' attrs,
    ogrlayer.cpp:2633; Clip/Erase callers drop the id)."""
    import ray
    from .geom import wkb_envelope
    from .rtree import PackedRTree

    bboxes = np.array([wkb_envelope(w) for w in
                       other[other_wkb_col].to_pylist()])
    tree = PackedRTree.build(bboxes)
    oref = ray.put((tree, other[other_wkb_col].to_pylist(),
                    other[other_id_col].to_pylist()))

    def per_batch(batch: pa.Table) -> pa.Table:
        tree_l, wkbs, ids = ray.get(oref) if not isinstance(oref, tuple) \
            else oref
        out_rows = {n: [] for n in batch.schema.names}
        out_other, out_wkb, out_area = [], [], []
        for i in range(batch.num_rows):
            buf = batch[wkb_col][i].as_py()
            a_polys = parse_wkb_multi(buf)
            pts = np.vstack([r for g in a_polys for r in g])
            qi, ii = tree_l.query_boxes(
                np.array([pts[:, 0].min()]), np.array([pts[:, 1].min()]),
                np.array([pts[:, 0].max()]), np.array([pts[:, 1].max()]))
            for j in ii:
                b_polys = parse_wkb_multi(wkbs[int(j)])
                rings = polygon_boolean(a_polys, b_polys, op)
                area = boolean_area(rings)
                if op == "intersection" and (not rings or area <= 0):
                    continue
                for n in batch.schema.names:
                    out_rows[n].append(batch[n][i].as_py())
                out_other.append(ids[int(j)])
                out_wkb.append(wkb_polygon(rings) if rings else b"")
                out_area.append(area)
        cols = {n: pa.array(out_rows[n], batch.schema.field(n).type)
                for n in batch.schema.names}
        cols["other_id"] = pa.array(out_other, pa.string())
        cols["result_wkb"] = pa.array(out_wkb, pa.binary())
        cols["result_area"] = pa.array(out_area, pa.float64())
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def _broadcast_other(other: pa.Table, wkb_col: str, id_col: str):
    import ray
    from .geom import wkb_envelope
    from .rtree import PackedRTree

    bboxes = np.array([wkb_envelope(w) for w in other[wkb_col].to_pylist()])
    tree = PackedRTree.build(bboxes)
    return ray.put((tree, other[wkb_col].to_pylist(),
                    other[id_col].to_pylist()))


def _overlapping(tree, a_polys):
    pts = np.vstack([r for g in a_polys for r in g])
    _, ii = tree.query_boxes(
        np.array([pts[:, 0].min()]), np.array([pts[:, 1].min()]),
        np.array([pts[:, 0].max()]), np.array([pts[:, 1].max()]))
    return ii


def identity_layers(ds, other: pa.Table, wkb_col: str = "wkb",
                    other_wkb_col: str = "wkb",
                    other_id_col: str = "polygon_id"):
    """OGR layer Identity (ogrlayer.cpp:4018): each input feature is CUT
    by the method layer — every A∩b piece carries both sides' attributes
    (``other_id`` set), and the residual A − ∪B piece keeps the input
    attributes with a NULL ``other_id``.  Pieces partition the input
    feature, so Σ result_area per input row == the input area.

    Distribution: the method layer broadcasts once (R-tree + WKBs via
    ``ray.put``); the residual is an ITERATED difference — each step
    feeds the stitched ring set back unchanged (``a_rings``), so parity
    survives and overlapping method features are handled exactly."""
    import ray

    oref = _broadcast_other(other, other_wkb_col, other_id_col)

    def per_batch(batch: pa.Table) -> pa.Table:
        tree, wkbs, ids = ray.get(oref) if not isinstance(oref, tuple) \
            else oref
        out_rows = {n: [] for n in batch.schema.names}
        out_other, out_wkb, out_area = [], [], []

        def emit(i, oid, rings, area):
            for n in batch.schema.names:
                out_rows[n].append(batch[n][i].as_py())
            out_other.append(oid)
            out_wkb.append(wkb_polygon(rings) if rings else b"")
            out_area.append(area)

        for i in range(batch.num_rows):
            a_polys = parse_wkb_multi(batch[wkb_col][i].as_py())
            residual = None     # None = start from a_polys
            started = False
            for j in _overlapping(tree, a_polys):
                b_polys = parse_wkb_multi(wkbs[int(j)])
                inter = polygon_boolean(a_polys, b_polys, "intersection")
                area = boolean_area(inter)
                if inter and area > 0:
                    emit(i, ids[int(j)], inter, area)
                residual = polygon_boolean(
                    a_polys if not started else None, b_polys,
                    "difference", a_rings=residual)
                started = True
            if not started:
                residual = _normalize_rings(a_polys)
            r_area = boolean_area(residual) if residual else 0.0
            if residual and r_area > 1e-12:
                emit(i, None, residual, r_area)
        cols = {n: pa.array(out_rows[n], batch.schema.field(n).type)
                for n in batch.schema.names}
        cols["other_id"] = pa.array(out_other, pa.string())
        cols["result_wkb"] = pa.array(out_wkb, pa.binary())
        cols["result_area"] = pa.array(out_area, pa.float64())
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def update_layers(ds, other: pa.Table, wkb_col: str = "wkb",
                  other_wkb_col: str = "wkb",
                  other_id_col: str = "polygon_id"):
    """OGR layer Update (ogrlayer.cpp:4436): the method layer PASTES OVER
    the input — output = (A − ∪B) pieces with input attributes (NULL
    ``other_id``) ∪ the method features unchanged (input attribute
    columns NULL).  Same broadcast + iterated-difference shape as
    :func:`identity_layers`."""
    import ray

    oref = _broadcast_other(other, other_wkb_col, other_id_col)
    in_names = ds.schema().names
    in_types = ds.schema().types

    def per_batch(batch: pa.Table) -> pa.Table:
        tree, wkbs, ids = ray.get(oref) if not isinstance(oref, tuple) \
            else oref
        out_rows = {n: [] for n in batch.schema.names}
        out_other, out_wkb, out_area = [], [], []
        for i in range(batch.num_rows):
            a_polys = parse_wkb_multi(batch[wkb_col][i].as_py())
            residual = None
            started = False
            for j in _overlapping(tree, a_polys):
                b_polys = parse_wkb_multi(wkbs[int(j)])
                residual = polygon_boolean(
                    a_polys if not started else None, b_polys,
                    "difference", a_rings=residual)
                started = True
            if not started:
                residual = _normalize_rings(a_polys)
            r_area = boolean_area(residual) if residual else 0.0
            if residual and r_area > 1e-12:
                for n in batch.schema.names:
                    out_rows[n].append(batch[n][i].as_py())
                out_other.append(None)
                out_wkb.append(wkb_polygon(residual))
                out_area.append(r_area)
        cols = {n: pa.array(out_rows[n], batch.schema.field(n).type)
                for n in batch.schema.names}
        cols["other_id"] = pa.array(out_other, pa.string())
        cols["result_wkb"] = pa.array(out_wkb, pa.binary())
        cols["result_area"] = pa.array(out_area, pa.float64())
        return pa.table(cols)

    residual_ds = ds.map_batches(per_batch, batch_format="pyarrow")
    # method features pass through unchanged (input attrs NULL)
    import ray as _ray
    n_o = other.num_rows
    mcols = {}
    for n, t in zip(in_names, in_types):
        mcols[n] = pa.nulls(n_o, t)
    mcols["other_id"] = pa.compute.cast(other[other_id_col], pa.string())
    mcols["result_wkb"] = pa.compute.cast(other[other_wkb_col],
                                          pa.binary())
    mcols["result_area"] = pa.array(
        [abs(boolean_area(_normalize_rings(parse_wkb_multi(w))))
         for w in other[other_wkb_col].to_pylist()], pa.float64())
    method_ds = _ray.data.from_arrow(pa.table(mcols))
    return residual_ds.union(method_ds)
