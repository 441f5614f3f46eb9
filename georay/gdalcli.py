"""The unified ``gdal`` command (GDAL 3.11 "gdalalg" surface).

Re-expresses apps/gdalalg_main.cpp and friends:

* ``gdal info <src>`` / ``gdal convert <src> <dst>`` — raster/vector
  dispatchers (apps/gdalalg_dispatcher.h, gdalalg_info.cpp,
  gdalalg_convert.cpp): try the raster opener first, fall back to the
  vector opener.
* ``gdal raster info|convert|edit|reproject|pipeline``
  (apps/gdalalg_raster_*.cpp)
* ``gdal vector info|convert|filter|reproject|pipeline``
  (apps/gdalalg_vector_*.cpp)

Pipelines follow the reference grammar
(apps/gdalalg_raster_pipeline.cpp:484):

    read SRC ( ! STEP [OPTIONS] )* ! write DST [--overwrite]

Steps run over in-memory state (the reference materializes a dataset
between steps the same way); raster state is (array, geotransform,
nodata, crs), vector state is a VectorPipeline so filter/reproject
stay streaming Ray Data transforms until the single write.

Options accept both ``--key=value`` and ``--key value`` like the
reference's argparse layer.
"""

from __future__ import annotations

import os
import sys

import numpy as np

__all__ = ["gdal"]


def _take_opt(args: list, name: str, nvals: int = 1, default=None):
    """Pop --name=v or --name v [v2 ...]; returns str, list, or default."""
    for i, a in enumerate(args):
        if a == name:
            vals = args[i + 1:i + 1 + nvals]
            if len(vals) < nvals:
                raise SystemExit(f"gdal: {name} expects {nvals} value(s)")
            del args[i:i + 1 + nvals]
            return vals if nvals > 1 else vals[0]
        if a.startswith(name + "="):
            v = a[len(name) + 1:]
            del args[i]
            if nvals > 1:
                vals = v.split(",")
                if len(vals) != nvals:
                    raise SystemExit(
                        f"gdal: {name} expects {nvals} comma-sep values")
                return vals
            return v
    return default


def _take_flag(args: list, name: str) -> bool:
    if name in args:
        args.remove(name)
        return True
    return False


def _is_raster(path: str) -> bool:
    from .simpleformats import open_raster
    try:
        open_raster(path)
        return True
    except Exception:
        return False


def _split_pipeline(args: list):
    """Token list → list of [step-name, opt...] groups split on '!'.
    The reference also accepts quoted whole-pipeline strings; support
    both (a single arg containing '!' is re-tokenized)."""
    if len(args) == 1 and "!" in args[0]:
        args = args[0].split()
    steps, cur = [], []
    for tok in args:
        if tok == "!":
            if cur:
                steps.append(cur)
            cur = []
        else:
            cur.append(tok)
    if cur:
        steps.append(cur)
    if not steps or steps[0][0] != "read" or steps[-1][0] != "write":
        raise SystemExit("gdal pipeline: expected 'read SRC ! ... ! "
                         "write DST' (apps/gdalalg_raster_pipeline.cpp)")
    return steps


def _check_overwrite(dst: str, overwrite: bool):
    if os.path.exists(dst) and not overwrite:
        raise SystemExit(f"gdal: {dst} already exists. Specify "
                         "--overwrite to overwrite it.")


# ---------------------------------------------------------------- raster

def _raster_pipeline(args: list) -> str:
    from .cli import _warp_core, _write_raster
    from .simpleformats import open_raster

    _take_flag(args, "--progress")
    steps = _split_pipeline(args)
    arr = gt = None
    nodata = None
    crs = "EPSG:4326"
    for step in steps:
        name, opts = step[0], step[1:]
        if name == "read":
            (src,) = opts
            arr, gt, nodata = open_raster(src)
            arr = np.asarray(arr)
        elif name == "edit":                 # gdalalg_raster_edit.cpp
            v = _take_opt(opts, "--crs")
            if v is not None:
                crs = v
            v = _take_opt(opts, "--nodata")
            if v is not None:
                nodata = float(v)
            if opts:
                raise SystemExit(f"gdal raster edit: unknown {opts}")
        elif name == "reproject":            # gdalalg_raster_reproject.cpp
            s_srs = _take_opt(opts, "--src-crs", default=crs)
            t_srs = _take_opt(opts, "--dst-crs")
            kernel = _take_opt(opts, "--resampling", default="bilinear")
            size = _take_opt(opts, "--size", 2)
            bbox = _take_opt(opts, "--bbox", 4)
            if t_srs is None:
                raise SystemExit("gdal raster reproject: --dst-crs "
                                 "required")
            if opts:
                raise SystemExit(f"gdal raster reproject: unknown {opts}")
            arr, gt = _warp_core(arr, gt, s_srs=s_srs, t_srs=t_srs,
                                 kernel=kernel, ts=size, te=bbox,
                                 dstnodata=float(nodata or 0.0))
            crs = t_srs
        elif name == "write":
            overwrite = _take_flag(opts, "--overwrite")
            _take_opt(opts, "--output-format")
            (dst,) = opts
            _check_overwrite(dst, overwrite)
            return _write_raster(arr, gt, dst, nodata=nodata)
        else:
            raise SystemExit(f"gdal raster pipeline: unknown step "
                             f"{name!r} (have: read edit reproject write)")
    raise SystemExit("gdal raster pipeline: missing write step")


def _raster(args: list) -> str | None:
    from . import cli as C
    sub = args.pop(0) if args else "--help"
    if sub == "info":
        return C.gdalinfo(args)
    if sub == "convert":
        overwrite = _take_flag(args, "--overwrite")
        _take_opt(args, "--output-format")
        _check_overwrite(args[-1], overwrite)
        return C.gdal_translate(args)
    if sub == "edit":
        # standalone edit: rewrite in place through the pipeline step
        crs = _take_opt(args, "--crs")
        nodata = _take_opt(args, "--nodata")
        (src,) = args
        pipe = ["read", src, "!", "edit"]
        if crs:
            pipe += [f"--crs={crs}"]
        if nodata:
            pipe += [f"--nodata={nodata}"]
        pipe += ["!", "write", src, "--overwrite"]
        return _raster_pipeline(pipe)
    if sub == "reproject":
        s = _take_opt(args, "--src-crs", default="EPSG:4326")
        t = _take_opt(args, "--dst-crs")
        r = _take_opt(args, "--resampling", default="bilinear")
        size = _take_opt(args, "--size", 2)
        overwrite = _take_flag(args, "--overwrite")
        src, dst = args
        if t is None:
            raise SystemExit("gdal raster reproject: --dst-crs required")
        _check_overwrite(dst, overwrite)
        pipe = ["read", src, "!", "reproject", f"--src-crs={s}",
                f"--dst-crs={t}", f"--resampling={r}"]
        if size:
            pipe += ["--size", size[0], size[1]]
        pipe += ["!", "write", dst, "--overwrite"]
        return _raster_pipeline(pipe)
    if sub == "pipeline":
        return _raster_pipeline(args)
    raise SystemExit("usage: gdal raster "
                     "<info|convert|edit|reproject|pipeline> ...")


# ---------------------------------------------------------------- vector

def _vector_pipeline(args: list) -> str:
    import pyarrow as pa

    from .ogr import VectorPipeline
    from .vectoropen import open_vector, write_vector

    _take_flag(args, "--progress")
    steps = _split_pipeline(args)
    pipe = None
    crs = "EPSG:4326"
    for step in steps:
        name, opts = step[0], step[1:]
        if name == "read":
            (src,) = opts
            pipe = VectorPipeline.from_dataset(open_vector(src))
        elif name == "filter":               # gdalalg_vector_filter.cpp
            where = _take_opt(opts, "--where")
            bbox = _take_opt(opts, "--bbox", 4)
            if opts:
                raise SystemExit(f"gdal vector filter: unknown {opts}")
            if where:
                pipe = pipe.where(where)
            if bbox:
                xmin, ymin, xmax, ymax = (float(v) for v in bbox)

                def bbox_filter(batch: pa.Table) -> pa.Table:
                    # envelope-intersects, like OGR SetSpatialFilterRect's
                    # default fast path (ogr/ogrlayer.cpp FilterGeometry)
                    if "wkb" not in batch.column_names:
                        if {"lon", "lat"} <= set(batch.column_names):
                            lon = batch["lon"].to_numpy()
                            lat = batch["lat"].to_numpy()
                            keep = ((lon >= xmin) & (lon <= xmax)
                                    & (lat >= ymin) & (lat <= ymax))
                            return batch.filter(pa.array(keep))
                        return batch
                    from .geom import wkb_envelope
                    keep = []
                    for w in batch["wkb"]:
                        b = w.as_py()
                        if b is None:
                            keep.append(False)
                            continue
                        ex0, ey0, ex1, ey1 = wkb_envelope(b)
                        keep.append(ex0 <= xmax and ex1 >= xmin
                                    and ey0 <= ymax and ey1 >= ymin)
                    return batch.filter(pa.array(keep))

                pipe = VectorPipeline(pipe.ds.map_batches(
                    bbox_filter, batch_format="pyarrow"))
        elif name == "reproject":            # gdalalg_vector_reproject.cpp
            s_srs = _take_opt(opts, "--src-crs", default=crs)
            t_srs = _take_opt(opts, "--dst-crs")
            if t_srs is None:
                raise SystemExit("gdal vector reproject: --dst-crs "
                                 "required")
            if opts:
                raise SystemExit(f"gdal vector reproject: unknown {opts}")
            from .geom import transform_wkb
            from .raster import _crs_to_latlon, _latlon_to_crs

            def reproject(batch: pa.Table, _s=s_srs, _t=t_srs) -> pa.Table:
                if "wkb" not in batch.column_names:
                    return batch

                def fn(xs, ys):
                    lat, lon = _crs_to_latlon(_s, xs, ys)
                    return _latlon_to_crs(_t, lat, lon)

                wkbs = [w.as_py() for w in batch["wkb"]]
                return batch.set_column(
                    batch.column_names.index("wkb"), "wkb",
                    pa.array(transform_wkb(wkbs, fn), pa.binary()))

            pipe = VectorPipeline(pipe.ds.map_batches(
                reproject, batch_format="pyarrow"))
            crs = t_srs
        elif name == "write":
            overwrite = _take_flag(opts, "--overwrite")
            _take_opt(opts, "--output-format")
            layer = _take_opt(opts, "--layer", default="layer")
            (dst,) = opts
            _check_overwrite(dst, overwrite)
            return write_vector(pipe.to_table(), dst, layer=layer)
        else:
            raise SystemExit(f"gdal vector pipeline: unknown step "
                             f"{name!r} (have: read filter reproject "
                             "write)")
    raise SystemExit("gdal vector pipeline: missing write step")


def _vector(args: list) -> str | None:
    from . import cli as C
    sub = args.pop(0) if args else "--help"
    if sub == "info":
        return C.ogrinfo(args)
    if sub == "convert":
        overwrite = _take_flag(args, "--overwrite")
        _take_opt(args, "--output-format")
        src, dst = args
        _check_overwrite(dst, overwrite)
        return C.ogr2ogr([dst, src])         # classic dst-first order
    if sub == "filter":
        where = _take_opt(args, "--where")
        bbox = _take_opt(args, "--bbox", 4)
        overwrite = _take_flag(args, "--overwrite")
        src, dst = args
        _check_overwrite(dst, overwrite)
        pipe = ["read", src, "!", "filter"]
        if where:
            pipe += ["--where", where]
        if bbox:
            pipe += ["--bbox", *bbox]
        pipe += ["!", "write", dst, "--overwrite"]
        return _vector_pipeline(pipe)
    if sub == "reproject":
        s = _take_opt(args, "--src-crs", default="EPSG:4326")
        t = _take_opt(args, "--dst-crs")
        overwrite = _take_flag(args, "--overwrite")
        src, dst = args
        if t is None:
            raise SystemExit("gdal vector reproject: --dst-crs required")
        _check_overwrite(dst, overwrite)
        return _vector_pipeline(
            ["read", src, "!", "reproject", f"--src-crs={s}",
             f"--dst-crs={t}", "!", "write", dst, "--overwrite"])
    if sub == "pipeline":
        return _vector_pipeline(args)
    raise SystemExit("usage: gdal vector "
                     "<info|convert|filter|reproject|pipeline> ...")


# ------------------------------------------------------------ dispatcher

def gdal(args: list) -> str | None:
    """``python -m georay gdal <raster|vector|info|convert> ...``"""
    from . import cli as C
    if not args or args[0] in ("-h", "--help", "help"):
        print("usage: gdal <raster|vector|info|convert> ...\n"
              "  gdal raster <info|convert|edit|reproject|pipeline>\n"
              "  gdal vector <info|convert|filter|reproject|pipeline>\n"
              "  pipeline: read SRC ( ! STEP [OPTIONS] )* ! write DST",
              file=sys.stderr)
        return None
    sub = args.pop(0)
    if sub == "raster":
        return _raster(args)
    if sub == "vector":
        return _vector(args)
    if sub == "info":                        # gdalalg_info.cpp dispatcher
        return C.gdalinfo(args) if _is_raster(args[0]) else C.ogrinfo(args)
    if sub == "convert":                     # gdalalg_convert.cpp
        return (_raster(["convert", *args]) if _is_raster(args[0])
                else _vector(["convert", *args]))
    raise SystemExit(f"gdal: unknown subcommand {sub!r} "
                     "(have: raster vector info convert)")
