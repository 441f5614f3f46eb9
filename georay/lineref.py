"""Linear referencing — the ogrlineref tool's four operations
(apps/ogrlineref.cpp:43-46: op_create / op_get_pos / op_get_coord /
op_get_subline) re-expressed as vectorized kernels + a Ray stage.

A "line" is a 2-D polyline ``xy[(n, 2)]``; measures are arc lengths from
the first vertex (ogrlineref's -create builds mileposts/parts at a fixed
step from such measures).  All query ops are numpy-vectorized across
query points / measures; the Ray stage applies them per (line, points)
group inside ``map_batches`` with the line table broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["line_measures", "create_mileposts", "locate_points",
           "point_at_measure", "subline", "mileposts_batch"]


def line_measures(xy: np.ndarray) -> np.ndarray:
    """Cumulative arc length at each vertex (measure of vertex i)."""
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    seg = np.hypot(np.diff(xy[:, 0]), np.diff(xy[:, 1]))
    return np.concatenate([[0.0], np.cumsum(seg)])


def point_at_measure(xy: np.ndarray, m) -> np.ndarray:
    """Coordinates at measures ``m`` (op_get_coord) — clamped to the line;
    vectorized over m."""
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    cum = line_measures(xy)
    m = np.clip(np.atleast_1d(np.asarray(m, np.float64)), 0.0, cum[-1])
    i = np.clip(np.searchsorted(cum, m, side="right") - 1, 0, len(cum) - 2)
    seg_len = cum[i + 1] - cum[i]
    t = np.where(seg_len > 0, (m - cum[i]) / np.where(seg_len > 0, seg_len, 1),
                 0.0)
    return xy[i] + (xy[i + 1] - xy[i]) * t[:, None]


def create_mileposts(xy: np.ndarray, step: float,
                     m0: float = 0.0) -> np.ndarray:
    """(x, y, measure) rows every ``step`` along the line starting at
    measure ``m0`` — ogrlineref -create's reference marks."""
    cum = line_measures(np.asarray(xy, np.float64).reshape(-1, 2))
    ms = np.arange(m0, cum[-1] + 1e-12, step)
    pts = point_at_measure(xy, ms)
    return np.column_stack([pts, ms])


def locate_points(xy: np.ndarray, px, py):
    """Measure + offset distance of the closest point on the line for each
    query point (op_get_pos).  Vectorized: all (query, segment) pairs in
    one pass (chunk callers at ~1e7 pairs)."""
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    px = np.atleast_1d(np.asarray(px, np.float64))
    py = np.atleast_1d(np.asarray(py, np.float64))
    a = xy[:-1]                      # (s, 2)
    d = xy[1:] - a                   # segment vectors
    L2 = (d * d).sum(axis=1)
    L2s = np.where(L2 > 0, L2, 1.0)
    # t[q, s] = clamp(dot(P-A, D) / |D|^2)
    qx = px[:, None] - a[None, :, 0]
    qy = py[:, None] - a[None, :, 1]
    t = np.clip((qx * d[None, :, 0] + qy * d[None, :, 1]) / L2s[None, :],
                0.0, 1.0)
    cx = a[None, :, 0] + t * d[None, :, 0]
    cy = a[None, :, 1] + t * d[None, :, 1]
    dist2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
    best = np.argmin(dist2, axis=1)
    rows = np.arange(len(px))
    cum = line_measures(xy)
    seg_len = np.sqrt(L2)
    measure = cum[best] + t[rows, best] * seg_len[best]
    offset = np.sqrt(dist2[rows, best])
    return measure, offset


def subline(xy: np.ndarray, m1: float, m2: float) -> np.ndarray:
    """Polyline between measures m1..m2 (op_get_subline), endpoints
    interpolated exactly."""
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    cum = line_measures(xy)
    m1 = float(np.clip(m1, 0.0, cum[-1]))
    m2 = float(np.clip(m2, 0.0, cum[-1]))
    if m2 < m1:
        m1, m2 = m2, m1
    p1 = point_at_measure(xy, [m1])[0]
    p2 = point_at_measure(xy, [m2])[0]
    inner = (cum > m1) & (cum < m2)
    pts = np.vstack([p1, xy[inner], p2])
    # drop consecutive duplicates (measure exactly at a vertex)
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.abs(np.diff(pts, axis=0)).sum(axis=1) > 1e-12)
    return pts[keep]


def mileposts_batch(batch: pa.Table, step: float, *,
                    line_col: str = "line_xy",
                    id_col: str = "line_id") -> pa.Table:
    """Ray stage kernel: mileposts for every line in the batch — one
    ``(line_id, x, y, measure)`` row per milepost (list<float64> xy
    columns, flat [x0,y0,x1,y1,...])."""
    ids_out, xs, ys, ms = [], [], [], []
    ids = batch[id_col].to_pylist()
    for i, flat in enumerate(batch[line_col].to_pylist()):
        xy = np.asarray(flat, np.float64).reshape(-1, 2)
        mp = create_mileposts(xy, step)
        ids_out.append(np.full(len(mp), ids[i]))
        xs.append(mp[:, 0])
        ys.append(mp[:, 1])
        ms.append(mp[:, 2])
    if not ids_out:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "x": pa.array([], pa.float64()),
                         "y": pa.array([], pa.float64()),
                         "measure": pa.array([], pa.float64())})
    return pa.table({id_col: pa.array(np.concatenate(ids_out)),
                     "x": pa.array(np.concatenate(xs)),
                     "y": pa.array(np.concatenate(ys)),
                     "measure": pa.array(np.concatenate(ms))})
