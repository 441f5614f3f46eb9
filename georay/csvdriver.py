"""OGR CSV driver analog (ogr/ogrsf_frmts/csv/) — CSV vector tables with
geometry as a WKT column (``GEOMETRY=AS_WKT`` convention, header ``WKT``)
or as X/Y point columns (``X_POSSIBLE_NAMES``/``Y_POSSIBLE_NAMES``).

Parsing/typing rides pyarrow.csv (the vectorized path — the reference's
per-line OGRCSVLayer::GetNextFeature is the row-at-a-time equivalent);
this module adds the geometry bridge (WKT⇄WKB via georay.wkt, X/Y⇄WKB
point packing) and the Ray source/sink: CSV files are line-splittable so
``ray.data.read_csv`` parallelizes within one file, and the geometry
conversion is one vectorized ``map_batches`` stage.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv

from .wkt import wkb_to_wkt, wkt_to_wkb

__all__ = ["read_csv_vector", "write_csv_vector", "csv_to_wkb_batch",
           "wkb_to_csv_batch", "read_csv_vector_dataset"]

_XY_NAMES = (("x", "y"), ("lon", "lat"), ("longitude", "latitude"),
             ("easting", "northing"))


def _detect_geometry(names) -> tuple[str, object]:
    lower = {n.lower(): n for n in names}
    if "wkt" in lower:
        return "wkt", lower["wkt"]
    for xn, yn in _XY_NAMES:
        if xn in lower and yn in lower:
            return "xy", (lower[xn], lower[yn])
    return "none", None


def _points_to_wkb(x: np.ndarray, y: np.ndarray) -> list:
    head = struct.pack("<BI", 1, 1)
    return [head + struct.pack("<dd", float(a), float(b))
            for a, b in zip(x, y)]


def csv_to_wkb_batch(batch: pa.Table, *, geom_col: str = "wkb",
                     keep_source: bool = False) -> pa.Table:
    """Vectorized geometry bridge for one parsed CSV batch: a ``WKT``
    column or recognised X/Y pair becomes a ``wkb`` binary column."""
    kind, src = _detect_geometry(batch.schema.names)
    if kind == "wkt":
        wkb = [None if v is None else wkt_to_wkb(v)
               for v in batch[src].to_pylist()]
        if not keep_source:
            batch = batch.drop_columns([src])
        return batch.append_column(geom_col, pa.array(wkb, pa.binary()))
    if kind == "xy":
        xn, yn = src
        wkb = _points_to_wkb(batch[xn].to_numpy(zero_copy_only=False),
                             batch[yn].to_numpy(zero_copy_only=False))
        return batch.append_column(geom_col, pa.array(wkb, pa.binary()))
    return batch


def read_csv_vector(path_or_bytes, *, geom_col: str = "wkb",
                    keep_source: bool = False) -> pa.Table:
    """CSV file/bytes → Arrow table with a WKB geometry column (types
    inferred by pyarrow.csv, as OGR's autodetect option family does)."""
    import io
    src = (io.BytesIO(path_or_bytes)
           if isinstance(path_or_bytes, (bytes, bytearray))
           else path_or_bytes)
    t = pacsv.read_csv(src)
    return csv_to_wkb_batch(t, geom_col=geom_col, keep_source=keep_source)


def wkb_to_csv_batch(batch: pa.Table, *, geom_col: str = "wkb",
                     wkt_col: str = "WKT") -> pa.Table:
    """Inverse bridge: WKB column → leading ``WKT`` text column
    (GEOMETRY=AS_WKT layout)."""
    wkt = [None if v is None else wkb_to_wkt(bytes(v))
           for v in batch[geom_col].to_pylist()]
    rest = batch.drop_columns([geom_col])
    return pa.table({wkt_col: pa.array(wkt, pa.string()),
                     **{n: rest[n] for n in rest.schema.names}})


def write_csv_vector(table: pa.Table, path: str, *,
                     geom_col: str = "wkb") -> None:
    if geom_col in table.schema.names:
        table = wkb_to_csv_batch(table, geom_col=geom_col)
    pacsv.write_csv(table, path)


def read_csv_vector_dataset(paths, *, geom_col: str = "wkb", **read_kw):
    """Ray source: native parallel CSV read (files AND intra-file blocks
    split by the Ray datasource) + one vectorized geometry-bridge stage."""
    import ray

    ds = ray.data.read_csv(paths, **read_kw)
    return ds.map_batches(
        lambda b: csv_to_wkb_batch(b, geom_col=geom_col),
        batch_format="pyarrow")
