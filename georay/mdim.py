"""Multidim array surface — a GDALMDArray-lite over the Zarr chunk store
(gcore/gdalmultidim.cpp's model: named dimensions, windowed views,
statistics — SURVEY §1.1 noted the multidim model as design context; this
is the minimal engine-side analog now that a chunked N-D store exists).

An :class:`MDArray` wraps a Zarr v2 array directory.  Reads are windowed
(only touched chunks decode — gdalmultidim's IRead with chunk
granularity); statistics and reductions run DISTRIBUTED over the chunk
grid: one Ray task batch per set of chunks, mergeable partials, no
full-array materialization anywhere (the 100 TB shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .zarrstore import (zarr_chunk_grid, zarr_meta, zarr_read_chunk,
                        zarr_read_window)

__all__ = ["MDArray", "mdim_translate"]


class MDArray:
    """Read surface over one Zarr array: ``shape``, ``dims``, windowed
    ``read``, lazy ``view`` slicing, and distributed ``statistics`` /
    ``reduce`` over chunks."""

    def __init__(self, path: str, dim_names=None, _window=None):
        self.path = path
        self.meta = zarr_meta(path)
        nd = len(self.meta["shape"])
        self.dims = list(dim_names) if dim_names else [
            f"dim{i}" for i in range(nd)]
        if len(self.dims) != nd:
            raise ValueError("dim_names length != array rank")
        self._window = _window or tuple(
            slice(0, s) for s in self.meta["shape"])

    @property
    def shape(self):
        return tuple(s.stop - s.start for s in self._window)

    @property
    def dtype(self):
        return np.dtype(self.meta["dtype"])

    def view(self, *slices) -> "MDArray":
        """GetView analog: compose a sub-window (slices are relative to
        the current view; step must be 1)."""
        if len(slices) != len(self._window):
            raise ValueError("view needs one slice per dimension")
        new = []
        for outer, s in zip(self._window, slices):
            start = outer.start + (s.start or 0)
            stop = outer.start + (s.stop if s.stop is not None
                                  else (outer.stop - outer.start))
            if s.step not in (None, 1):
                raise NotImplementedError("strided views")
            new.append(slice(start, min(stop, outer.stop)))
        return MDArray(self.path, self.dims, tuple(new))

    def read(self) -> np.ndarray:
        """Materialize THIS VIEW (windowed assembly; use only on
        driver-sized windows — whole-array reductions go through
        :meth:`reduce`/:meth:`statistics`)."""
        return zarr_read_window(self.path, self._window)

    # -- distributed reductions -------------------------------------------
    def _chunks_in_window(self):
        cs = self.meta["chunks"]
        out = []
        for idx in zarr_chunk_grid(self.meta):
            hit = all(idx[d] * cs[d] < self._window[d].stop
                      and (idx[d] + 1) * cs[d] > self._window[d].start
                      for d in range(len(cs)))
            if hit:
                out.append(idx)
        return out

    def _chunk_dataset(self):
        import ray
        idxs = self._chunks_in_window()
        nd = len(self.meta["shape"])
        return ray.data.from_arrow(pa.table({
            f"c{d}": pa.array([i[d] for i in idxs], pa.int64())
            for d in range(nd)}))

    def _trimmed(self, idx) -> np.ndarray:
        """One chunk clipped to the view window."""
        cs = self.meta["chunks"]
        shape = self.meta["shape"]
        chunk = zarr_read_chunk(self.path, idx, self.meta)
        sl = []
        for d in range(len(cs)):
            a = idx[d] * cs[d]
            lo = max(self._window[d].start, a)
            hi = min(self._window[d].stop, a + cs[d], shape[d])
            sl.append(slice(lo - a, hi - a))
        return chunk[tuple(sl)]

    def reduce(self, op: str):
        """Whole-view scalar reduction (sum/min/max/count) — one partial
        per chunk inside ``map_batches``, tiny combine driver-side."""
        path, meta, window = self.path, self.meta, self._window
        nd = len(meta["shape"])

        def partial(batch: pa.Table) -> pa.Table:
            arr_self = MDArray(path, _window=window)
            vals = []
            for i in range(batch.num_rows):
                idx = tuple(int(batch[f"c{d}"][i].as_py())
                            for d in range(nd))
                a = arr_self._trimmed(idx)
                if op == "sum":
                    vals.append(a.sum(dtype=np.float64))
                elif op == "min":
                    vals.append(a.min() if a.size else np.inf)
                elif op == "max":
                    vals.append(a.max() if a.size else -np.inf)
                elif op == "count":
                    vals.append(a.size)
                else:
                    raise ValueError(op)
            return pa.table({"v": pa.array(np.asarray(vals, np.float64))})

        parts = self._chunk_dataset().map_batches(
            partial, batch_format="pyarrow").to_pandas()["v"].to_numpy()
        if op == "sum" or op == "count":
            return float(parts.sum())
        return float(parts.min() if op == "min" else parts.max())

    def statistics(self):
        """GDALMDArray::GetStatistics analog: distributed Welford partials
        per chunk → exact (count, mean, std, min, max)."""
        from .stats import BandStats, band_stats_combine, band_stats_partial
        path, meta, window = self.path, self.meta, self._window
        nd = len(meta["shape"])

        def partial(batch: pa.Table) -> pa.Table:
            arr_self = MDArray(path, _window=window)
            st = BandStats()
            for i in range(batch.num_rows):
                idx = tuple(int(batch[f"c{d}"][i].as_py())
                            for d in range(nd))
                st = st.merge(band_stats_partial(arr_self._trimmed(idx)))
            return pa.table({"count": pa.array([st.count], pa.int64()),
                             "mean": pa.array([st.mean]),
                             "m2": pa.array([st.m2]),
                             "min": pa.array([st.min]),
                             "max": pa.array([st.max])})

        rows = self._chunk_dataset().map_batches(
            partial, batch_format="pyarrow").take_all()
        return band_stats_combine(
            BandStats(r["count"], r["mean"], r["m2"], r["min"], r["max"])
            for r in rows)


def mdim_translate(src_path: str, dst_path: str, *, window=None,
                   chunks=None, dtype=None, compressor="zlib"):
    """gdalmdimtranslate analog for 2-D arrays: window-slice +
    RE-CHUNK a Zarr array into a new one, distributed.

    The interesting distributed op is the chunk-grid change: every
    source chunk EXPLODES into its overlaps with destination chunks
    (``map_batches``, one row per (src chunk × dst chunk) overlap
    carrying only the overlap bytes), a ``groupby(dst chunk)``
    co-locates the pieces, and each group assembles + writes one
    destination chunk — the same partial→combine shape as the tile
    compositor, so neither array is ever materialized whole."""
    import ray

    from .zarrstore import (dataset_to_zarr, zarr_meta, zarr_to_dataset)

    smeta = zarr_meta(src_path)
    if window is None:
        window = tuple(slice(0, s) for s in smeta["shape"])
    out_shape = tuple(w.stop - w.start for w in window)
    chunks = tuple(chunks) if chunks else tuple(smeta["chunks"])
    dtype = dtype or smeta["dtype"]
    src_cs = smeta["chunks"]
    w0 = (window[0].start, window[1].start)
    w1 = (window[0].stop, window[1].stop)

    def explode(batch: pa.Table) -> pa.Table:
        out = {"c0": [], "c1": [], "y0": [], "x0": [], "h": [], "w": [],
               "data": []}
        c0s = batch["c0"].to_numpy()
        c1s = batch["c1"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        dt = np.dtype(smeta["dtype"])
        for i in range(batch.num_rows):
            a0 = int(c0s[i]) * src_cs[0]
            a1 = int(c1s[i]) * src_cs[1]
            # source-chunk extent clipped to the window
            y0 = max(a0, w0[0]); y1 = min(a0 + int(hs[i]), w1[0])
            x0 = max(a1, w0[1]); x1 = min(a1 + int(ws[i]), w1[1])
            if y1 <= y0 or x1 <= x0:
                continue
            arr = np.frombuffer(batch["data"][i].as_buffer(),
                                dtype=dt).reshape(int(hs[i]), int(ws[i]))
            # overlapped destination chunks (dst coords are window-rel)
            for dc0 in range((y0 - w0[0]) // chunks[0],
                             (y1 - w0[0] - 1) // chunks[0] + 1):
                for dc1 in range((x0 - w0[1]) // chunks[1],
                                 (x1 - w0[1] - 1) // chunks[1] + 1):
                    dy0 = max(y0, dc0 * chunks[0] + w0[0])
                    dy1 = min(y1, (dc0 + 1) * chunks[0] + w0[0])
                    dx0 = max(x0, dc1 * chunks[1] + w0[1])
                    dx1 = min(x1, (dc1 + 1) * chunks[1] + w0[1])
                    piece = arr[dy0 - a0:dy1 - a0, dx0 - a1:dx1 - a1]
                    out["c0"].append(dc0)
                    out["c1"].append(dc1)
                    out["y0"].append(dy0 - w0[0] - dc0 * chunks[0])
                    out["x0"].append(dx0 - w0[1] - dc1 * chunks[1])
                    out["h"].append(piece.shape[0])
                    out["w"].append(piece.shape[1])
                    out["data"].append(
                        np.ascontiguousarray(piece).tobytes())
        return pa.table({k: pa.array(v, (pa.binary() if k == "data"
                                         else pa.int64()))
                         for k, v in out.items()})

    def assemble(g: pa.Table) -> pa.Table:
        dc0 = int(g["c0"][0].as_py())
        dc1 = int(g["c1"][0].as_py())
        th = min(chunks[0], out_shape[0] - dc0 * chunks[0])
        tw = min(chunks[1], out_shape[1] - dc1 * chunks[1])
        tile = np.zeros((th, tw), dtype=np.dtype(dtype))
        dt = np.dtype(smeta["dtype"])
        for i in range(g.num_rows):
            h = int(g["h"][i].as_py()); w = int(g["w"][i].as_py())
            y0 = int(g["y0"][i].as_py()); x0 = int(g["x0"][i].as_py())
            piece = np.frombuffer(g["data"][i].as_buffer(),
                                  dtype=dt).reshape(h, w)
            tile[y0:y0 + h, x0:x0 + w] = piece
        return pa.table({"c0": pa.array([dc0], pa.int64()),
                         "c1": pa.array([dc1], pa.int64()),
                         "h": pa.array([th], pa.int32()),
                         "w": pa.array([tw], pa.int32()),
                         "data": pa.array([tile.tobytes()], pa.binary())})

    pieces = zarr_to_dataset(src_path).map_batches(
        explode, batch_format="pyarrow")
    dst_chunks = pieces.groupby(["c0", "c1"]).map_groups(
        assemble, batch_format="pyarrow")
    man = dataset_to_zarr(dst_chunks, dst_path, out_shape, chunks, dtype,
                          compressor=compressor, resume=False)
    man.materialize()
    return dst_path
