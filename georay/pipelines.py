"""End-to-end pipeline compositions (the gdalwarp / ogr2ogr / gdal2tiles
replacements, SURVEY.md §3).  All functions take an already-initialised Ray
session (they never call ``ray.init``) and return lazy Datasets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import fixtures
from .decode import DecodeImages, add_cells, add_georef
from .join import spatial_join_points
from .tiles import CutTiles, assign_center_tile, build_pyramid, \
    composite_tile_group

__all__ = ["read_images", "georeferenced_images", "flagship_join",
           "tile_pipeline", "flagship_summary"]


def read_images(images_path: str, *, columns=None):
    import ray
    return ray.data.read_parquet(images_path, columns=columns)


def georeferenced_images(images_path: str, *, decode: bool = True,
                         hex_res: int = 9, s2_level: int = 12,
                         decode_concurrency=None, decode_batch_size: int = 64):
    """images parquet → Dataset with georef + cell columns (+ decoded
    pixels): the shared front of every flagship pipeline."""
    ds = read_images(images_path)
    ds = ds.map_batches(add_georef, batch_format="pyarrow")
    ds = ds.map_batches(add_cells, batch_format="pyarrow",
                        fn_kwargs=dict(hex_res=hex_res, s2_level=s2_level))
    if decode:
        from .util import default_concurrency
        kwargs = dict(batch_format="pyarrow", batch_size=decode_batch_size,
                      concurrency=(decode_concurrency
                                   or default_concurrency()))
        ds = ds.map_batches(DecodeImages, **kwargs)
    return ds


class FlagshipStage:
    """Fused flagship actor: georef → H3/S2 cells → decode (pixels never
    leave the actor) → broadcast R-tree PIP join → center-tile assignment,
    one batch pass.

    Fusing matters at scale: the decoded pixel payload (~250 KB/row) is
    consumed inside the same actor that produced it instead of being
    re-shipped through the object store to a second pool — the same reason
    gdal2tiles does read+warp+encode in one worker (gdal2tiles.py:4593).
    The polygon index arrives as a ``ray.put`` ref, deserialized once per
    actor.
    """

    def __init__(self, index_ref, zoom: int = 12, decode: bool = True,
                 cut: bool = False):
        import ray
        from .join import PolygonIndex
        self.index = (ray.get(index_ref)
                      if not isinstance(index_ref, PolygonIndex) else index_ref)
        self.zoom = zoom
        self.decode = DecodeImages(keep_bytes=False) if decode else None
        self.cut = CutTiles(zoom=zoom) if cut else None
        if cut:
            from .stats import gdal_checksum
            self._checksum = gdal_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = add_georef(batch)
        batch = add_cells(batch)
        if self.decode is not None:
            batch = self.decode(batch)
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        qi, ii = self.index.match_points(lon, lat)
        keep = ["image_id", "caption", "phash", "lat", "lon",
                "hexcell", "s2cell"]
        out = batch.select(keep).take(pa.array(qi))
        for name, arr in self.index.payload.items():
            out = out.append_column(name, pa.array(arr[ii]))
        out = assign_center_tile(out, self.zoom)
        if self.cut is None:
            return out
        # headline tail: cut every image into its covering z tiles and
        # checksum the fragments (the gdal2tiles base-tile work, fused) —
        # fragments are consumed here; only the summary rows leave the task
        frags = self.cut(batch)
        n = frags.num_rows
        sums = np.empty(n, dtype=np.int64)
        for i in range(n):
            fb = np.frombuffer(frags["frag"][i].as_buffer(), dtype=np.uint8)
            sums[i] = self._checksum(fb.reshape(256, 256, 4)[:, :, 0])
        frag_summary = frags.drop_columns(["frag"]).append_column(
            "frag_checksum", pa.array(sums))
        # align schemas: join rows + fragment rows share the output table
        out = out.append_column("frag_checksum",
                                pa.nulls(out.num_rows, pa.int64()))
        for col in out.schema.names:
            if col not in frag_summary.schema.names:
                frag_summary = frag_summary.append_column(
                    col, pa.nulls(frag_summary.num_rows,
                                  out.schema.field(col).type))
        frag_summary = frag_summary.drop_columns(
            [c for c in frag_summary.schema.names
             if c not in out.schema.names]).select(out.schema.names)
        return pa.concat_tables([out, frag_summary])


_STAGE_CACHE: dict = {}


def _flagship_fn(batch: pa.Table, *, index_ref, zoom, decode, cut) -> pa.Table:
    """Task-based wrapper around :class:`FlagshipStage`: the stage (with its
    deserialized broadcast index) is cached per WORKER PROCESS, so stateless
    tasks reuse Ray's warm worker pool with actor-like state amortization —
    no per-execution actor-pool spin-up."""
    key = (index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref),
           zoom, decode, cut)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = FlagshipStage(index_ref, zoom=zoom, decode=decode, cut=cut)
        _STAGE_CACHE.clear()
        _STAGE_CACHE[key] = stage
    return stage(batch)


def flagship_join(images_path: str, polygons: pa.Table | None = None, *,
                  zoom: int = 12, n_polygons: int = 500,
                  decode: bool = False, cut: bool = False,
                  batch_size: int = 64, compute: str = "tasks",
                  concurrency=None):
    """Images georeferenced → H3/S2 cells (→ decode) → broadcast R-tree
    spatial join with polygons → center-tile assignment (→ tile cut +
    fragment checksums when ``cut``).  The BASELINE headline op, executed
    as ONE fused stage.

    ``compute="tasks"`` (default) runs the fused stage as stateless tasks
    with per-worker state caching — elastic, reuses warm workers;
    ``compute="actors"`` uses an explicit actor pool (fixed size
    ``concurrency`` or n_cpus-1)."""
    import ray
    from .join import PolygonIndex
    if polygons is None:
        polygons = fixtures.polygons_table(n_polygons)
    index_ref = ray.put(PolygonIndex.build(polygons))
    ds = read_images(images_path)
    if compute == "actors":
        if concurrency is None:
            n = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(2, n - 1)
        return ds.map_batches(
            FlagshipStage, batch_format="pyarrow", batch_size=batch_size,
            fn_constructor_kwargs=dict(index_ref=index_ref, zoom=zoom,
                                       decode=decode, cut=cut),
            concurrency=concurrency)
    return ds.map_batches(
        _flagship_fn, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs=dict(index_ref=index_ref, zoom=zoom, decode=decode,
                       cut=cut))


def tile_pipeline(images_path: str, *, zoom: int = 12, tminz: int | None = None,
                  resampling: str = "average", decode_batch_size: int = 64,
                  cut_concurrency=None):
    """gdal2tiles replacement: decode → cut base tiles → composite per tile
    → overview pyramid.  Returns ``{z: Dataset}`` of composited tiles."""
    ds = georeferenced_images(images_path, decode=True,
                              decode_batch_size=decode_batch_size)
    from .util import default_concurrency
    kwargs = dict(batch_format="pyarrow", batch_size=decode_batch_size,
                  fn_constructor_kwargs=dict(zoom=zoom, resampling=resampling),
                  concurrency=cut_concurrency or default_concurrency())
    frags = ds.map_batches(CutTiles, **kwargs)
    base = frags.groupby(["z", "tile_x", "tile_y"]).map_groups(
        composite_tile_group, batch_format="pyarrow")
    if tminz is None or tminz >= zoom:
        return {zoom: base}
    return build_pyramid(base, tminz, zoom)


def flagship_summary(images_path: str, *, zoom: int = 12,
                     n_polygons: int = 500) -> "pa.Table":
    """Small driver-side summary of the flagship join (counts per polygon
    category + tile count) — used by ``entry()`` smoke checks."""
    from ray.data.aggregate import Count
    joined = flagship_join(images_path, n_polygons=n_polygons, zoom=zoom)
    return joined.groupby("category").aggregate(Count(alias_name="n_matches"))
