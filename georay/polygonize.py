"""Raster → vector: polygonize (connected same-value regions → polygons)
and contour (marching squares) — per-tile kernels (SURVEY.md §2.7;
alg/polygonize.cpp, alg/contour.cpp + alg/marching_squares/ analogs).

Per-tile semantics: each image row is an independent raster; cross-tile
merge of regions that span tiles (groupby on shared-border segment keys,
SURVEY.md §2.7 "cross-tile merge") is deliberately deferred — the per-tile
kernels here are the building block it would dissolve.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geom import wkb_polygon

__all__ = ["label_components", "polygonize", "contour_lines",
           "PolygonizeImages"]


def label_components(band: np.ndarray, connect8: bool = False) -> np.ndarray:
    """Connected-component labels of equal-valued pixels (4- or 8-connected,
    polygonize.cpp:86 connectedness option).  Iterative min-label
    propagation (vectorized per sweep); labels are flat indices."""
    h, w = band.shape
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)
    val = band
    while True:
        old = lab.copy()
        # 4-neighbors
        m = val[1:, :] == val[:-1, :]
        np.minimum(lab[1:, :], np.where(m, lab[:-1, :], lab[1:, :]),
                   out=lab[1:, :])
        np.minimum(lab[:-1, :], np.where(m, lab[1:, :], lab[:-1, :]),
                   out=lab[:-1, :])
        m = val[:, 1:] == val[:, :-1]
        np.minimum(lab[:, 1:], np.where(m, lab[:, :-1], lab[:, 1:]),
                   out=lab[:, 1:])
        np.minimum(lab[:, :-1], np.where(m, lab[:, 1:], lab[:, :-1]),
                   out=lab[:, :-1])
        if connect8:
            m = val[1:, 1:] == val[:-1, :-1]
            np.minimum(lab[1:, 1:], np.where(m, lab[:-1, :-1], lab[1:, 1:]),
                       out=lab[1:, 1:])
            np.minimum(lab[:-1, :-1], np.where(m, lab[1:, 1:], lab[:-1, :-1]),
                       out=lab[:-1, :-1])
            m = val[1:, :-1] == val[:-1, 1:]
            np.minimum(lab[1:, :-1], np.where(m, lab[:-1, 1:], lab[1:, :-1]),
                       out=lab[1:, :-1])
            np.minimum(lab[:-1, 1:], np.where(m, lab[1:, :-1], lab[:-1, 1:]),
                       out=lab[:-1, 1:])
        if np.array_equal(old, lab):
            return lab


def _trace_rings(mask: np.ndarray):
    """Boundary rings of a pixel mask: directed pixel-edge segments
    (interior on the left) chained into closed rings.  Vertices are pixel
    corners (x right, y down)."""
    h, w = mask.shape
    p = np.pad(mask, 1)
    edges = {}  # start vertex -> list of end vertices

    def add(a, b):
        edges.setdefault(a, []).append(b)

    ys, xs = np.nonzero(mask)
    top = p[ys, xs + 1] == 0      # neighbor above (padded coords y, x+1)
    bot = p[ys + 2, xs + 1] == 0
    left = p[ys + 1, xs] == 0
    right = p[ys + 1, xs + 2] == 0
    for y, x, t, b, l, r in zip(ys, xs, top, bot, left, right):
        if t:
            add((x, y), (x + 1, y))
        if r:
            add((x + 1, y), (x + 1, y + 1))
        if b:
            add((x + 1, y + 1), (x, y + 1))
        if l:
            add((x, y + 1), (x, y))
    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges.get(cur)
            if not outs:
                break
            if len(outs) == 1:
                nxt = outs.pop()
                del edges[cur]
            else:
                # ambiguous corner (diagonally touching): turn right-most
                # relative to incoming direction for a consistent choice
                def turn(o):
                    dx, dy = o[0] - cur[0], o[1] - cur[1]
                    pdx, pdy = prev_dir if prev_dir else (1, 0)
                    return pdx * dy - pdy * dx
                outs.sort(key=turn)
                nxt = outs.pop(0)
                if not outs:
                    del edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
            ring.append(cur)
        if len(ring) >= 4:
            # drop collinear midpoints
            out = []
            n = len(ring)
            for i in range(n):
                a, b, c = ring[i - 1], ring[i], ring[(i + 1) % n]
                if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                    out.append(b)
            rings.append(np.array(out + [out[0]], dtype=np.float64))
    return rings


def polygonize(band: np.ndarray, gt=None, connect8: bool = False,
               exclude_value=None):
    """Connected regions of equal pixel value → polygons (GDALPolygonize).

    Returns list of ``(value, wkb, pixel_count)``.  With ``gt`` the ring
    coordinates are georeferenced (pixel corners through the affine);
    otherwise pixel-corner coordinates.
    """
    lab = label_components(band, connect8)
    out = []
    for lv in np.unique(lab):
        mask = lab == lv
        value = band[mask][0]
        if exclude_value is not None and value == exclude_value:
            continue
        rings = _trace_rings(mask)
        if not rings:
            continue
        if gt is not None:
            rings = [np.stack([gt[0] + r[:, 0] * gt[1],
                               gt[3] + r[:, 1] * gt[5]], axis=1)
                     for r in rings]
        # outer ring = largest |signed area| first
        areas = [abs(np.cross(r[:-1], r[1:]).sum()) / 2 for r in rings]
        order = np.argsort(areas)[::-1]
        out.append((value, wkb_polygon([rings[i] for i in order]),
                    int(mask.sum())))
    return out


# marching-squares case table: for each cell code (bit per corner >=level:
# 1=tl, 2=tr, 4=br, 8=bl), the crossed edge pairs.  Edges: 0=top 1=right
# 2=bottom 3=left.
_MS_CASES = {
    1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)], 5: [(3, 0), (1, 2)],
    6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)], 9: [(2, 0)], 10: [(0, 1), (2, 3)],
    11: [(2, 1)], 12: [(1, 3)], 13: [(1, 0)], 14: [(0, 3)],
}


def contour_lines(band: np.ndarray, levels, gt=None):
    """Iso-lines via marching squares on pixel-center lattice
    (GDALContourGenerate / alg/marching_squares).  Returns
    ``{level: [polyline arrays]}``; coordinates georeferenced when ``gt``.
    Segments within a tile are chained into polylines by endpoint match."""
    a = band.astype(np.float64)
    h, w = a.shape
    out = {}
    for level in levels:
        above = a >= level
        segs = []
        tl = above[:-1, :-1]; tr = above[:-1, 1:]
        br = above[1:, 1:]; bl = above[1:, :-1]
        code = (tl * 1 + tr * 2 + br * 4 + bl * 8)
        ys, xs = np.nonzero((code > 0) & (code < 15))
        for y, x in zip(ys, xs):
            c = int(code[y, x])
            v = {0: a[y, x], 1: a[y, x + 1], 2: a[y + 1, x + 1],
                 3: a[y + 1, x]}  # corners tl,tr,br,bl

            def interp(edge):
                # fraction along the edge where the level crosses
                pairs = {0: (0, 1), 1: (1, 2), 2: (3, 2), 3: (0, 3)}
                i0, i1 = pairs[edge]
                d = v[i1] - v[i0]
                t = 0.5 if d == 0 else (level - v[i0]) / d
                t = min(max(t, 0.0), 1.0)
                base = {0: (x + t, y), 1: (x + 1, y + t),
                        2: (x + t, y + 1), 3: (x, y + t)}
                return base[edge]

            for e0, e1 in _MS_CASES[c]:
                segs.append((interp(e0), interp(e1)))
        # chain segments into polylines
        lines = []
        remaining = {}
        for s in segs:
            remaining.setdefault(s[0], []).append(s[1])
        used = set()
        for s0, _ in segs:
            pass
        segset = list(segs)
        adj = {}
        for p0, p1 in segset:
            adj.setdefault(p0, []).append(p1)
            adj.setdefault(p1, []).append(p0)
        visited = set()
        for p0, p1 in segset:
            key = (p0, p1)
            if key in visited or (p1, p0) in visited:
                continue
            line = [p0, p1]
            visited.add(key)
            # extend forward
            while True:
                nxts = [q for q in adj.get(line[-1], [])
                        if (line[-1], q) not in visited
                        and (q, line[-1]) not in visited]
                if not nxts:
                    break
                visited.add((line[-1], nxts[0]))
                line.append(nxts[0])
            arr = np.array(line, dtype=np.float64)
            arr += 0.5  # pixel-center lattice
            if gt is not None:
                arr = np.stack([gt[0] + arr[:, 0] * gt[1],
                                gt[3] + arr[:, 1] * gt[5]], axis=1)
            lines.append(arr)
        out[level] = lines
    return out


class PolygonizeImages:
    """map_batches stage: band 0 of each image row → polygon rows
    ``(image_id, value, wkb, pixel_count)``.  Quantize first (e.g. ``//64``)
    so regions are meaningful for continuous imagery."""

    def __init__(self, quantize: int = 64, connect8: bool = False):
        self.q = quantize
        self.c8 = connect8

    def __call__(self, batch: pa.Table) -> pa.Table:
        h_arr = batch["h"].to_numpy()
        w_arr = batch["w"].to_numpy()
        ids, vals, wkbs, counts = [], [], [], []
        for i in range(batch.num_rows):
            band = np.frombuffer(batch["pixels"][i].as_buffer(),
                                 dtype=np.uint8).reshape(
                int(h_arr[i]), int(w_arr[i]), 3)[:, :, 0]
            q = band // self.q
            for value, wkb, n in polygonize(q, connect8=self.c8):
                ids.append(batch["image_id"][i].as_py())
                vals.append(int(value))
                wkbs.append(wkb)
                counts.append(n)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "value": pa.array(vals, pa.int64()),
            "wkb": pa.array(wkbs, pa.binary()),
            "pixel_count": pa.array(counts, pa.int64()),
        })
