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


def flagship_join(images_path: str, polygons: pa.Table | None = None, *,
                  zoom: int = 12, n_polygons: int = 500,
                  decode: bool = False):
    """Images georeferenced → H3/S2 cells → broadcast R-tree spatial join
    with polygons → center-tile assignment.  The BASELINE headline op."""
    if polygons is None:
        polygons = fixtures.polygons_table(n_polygons)
    ds = georeferenced_images(images_path, decode=decode)
    joined = spatial_join_points(
        ds, polygons,
        keep_cols=["image_id", "caption", "phash", "lat", "lon",
                   "hexcell", "s2cell"])
    return joined.map_batches(assign_center_tile, batch_format="pyarrow",
                              fn_kwargs=dict(zoom=zoom))


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
