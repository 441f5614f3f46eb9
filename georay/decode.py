"""Image decode / georeference stages for ``map_batches``.

``DecodeImages`` is a callable CLASS → Ray actor pool (codec state built
once per actor, mirroring gdal2tiles' per-worker cached dataset handle,
osgeo_utils/gdal2tiles.py:1340-1345).  Batches stay ``pyarrow`` end-to-end;
decoded pixels travel as a raw ``binary`` column (``pixels`` = uint8 RGB
buffer, C-order h×w×3) next to their shape columns — zero-copy in/out of
the object store, no Python object columns.

``add_georef`` / ``add_cells`` are stateless batch fns (pure math).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codecs
from .cells import hex_cell, s2_cell_id
from .fixtures import georef, parse_image_idx

__all__ = ["DecodeImages", "add_georef", "add_cells", "decoded_pixels"]


class DecodeImages:
    """Actor-pool decode: ``bytes`` + ``fmt`` → ``pixels`` (+ optional
    per-band checksum columns).

    Parameters
    ----------
    keep_bytes: drop the encoded payload after decode (halves block size).
    with_checksum: also emit GDAL band checksums (conformance columns).
    """

    def __init__(self, keep_bytes: bool = False, with_checksum: bool = False):
        # per-actor state: codec dispatch table + any expensive setup
        self._decode = codecs.decode_image
        self._keep_bytes = keep_bytes
        self._with_checksum = with_checksum
        if with_checksum:
            from .stats import gdal_checksum
            self._checksum = gdal_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        pixels = []
        checks = [] if self._with_checksum else None
        for data, fmt in zip(bufs, fmts):
            arr = self._decode(data, fmt)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=2)
            pixels.append(arr.tobytes())
            if checks is not None:
                checks.append([int(self._checksum(arr[:, :, b]))
                               for b in range(3)])
        out = batch
        if not self._keep_bytes:
            out = out.drop_columns(["bytes"])
        out = out.append_column("pixels", pa.array(pixels, pa.binary()))
        if checks is not None:
            arr = np.asarray(checks, dtype=np.int64)
            for b, name in enumerate(("checksum_r", "checksum_g", "checksum_b")):
                out = out.append_column(name, pa.array(arr[:, b]))
        return out


def decoded_pixels(batch: pa.Table, row: int) -> np.ndarray:
    """View one row's ``pixels`` buffer as an (h, w, 3) uint8 array."""
    h = batch["h"][row].as_py()
    w = batch["w"][row].as_py()
    buf = batch["pixels"][row].as_buffer()
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def add_georef(batch: pa.Table) -> pa.Table:
    """Stateless: derive center lat/lon + geotransform columns from
    ``image_id`` (the fixture georeferencing rule — the analog of reading a
    dataset's geotransform, gcore/gdaldataset.cpp:1380)."""
    idx = parse_image_idx(batch["image_id"].to_numpy(zero_copy_only=False))
    g = georef(idx, batch["w"].to_numpy(), batch["h"].to_numpy())
    for name in ("lat", "lon", "cx", "cy", "ulx", "uly", "psize"):
        batch = batch.append_column(name, pa.array(np.asarray(g[name], dtype=np.float64)))
    return batch


def add_cells(batch: pa.Table, hex_res: int = 9, s2_level: int = 12,
              lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Stateless: H3-style hex cell + S2 cell id columns (SURVEY.md §7.1
    step 4 — vectorized encoders, `mb` stage)."""
    lat = batch[lat_col].to_numpy()
    lon = batch[lon_col].to_numpy()
    batch = batch.append_column("hexcell",
                                pa.array(hex_cell(lat, lon, hex_res)))
    s2 = s2_cell_id(lat, lon, s2_level).view(np.int64)  # int64 for Arrow
    batch = batch.append_column("s2cell", pa.array(s2))
    return batch
