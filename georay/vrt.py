"""Persisted pipeline plans — the engine-side analog of GDAL's VRT
format (frmts/vrt/vrtdataset.cpp: an XML-serialized logical raster plan,
incl. derived-band pixel functions in files).  A :class:`RasterPlan` is
a declarative step list that

* serializes to a VRT-style XML document (``to_xml`` / ``save``),
* parses back losslessly (``from_xml`` / ``load``), and
* builds the executable Ray pipeline (``build`` → RasterPipeline),
  each step dispatching to the already-vetted stages.

The XML shape mirrors VRT's element style: one ``<Source>``, then
``<Step kind=...>`` elements whose ``<Option name=...>`` children carry
JSON-encoded parameter values (exact round-trip for nested
lists/numbers — VRT stores the same kind of structured options, e.g.
``<PixelFunctionArguments>``).  ``calc`` steps carry their expression in
a ``<PixelFunction>`` child — the VRTDerivedRasterBand analog
(frmts/vrt/vrtderivedrasterband.cpp)."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

__all__ = ["RasterPlan"]

# step name -> RasterPipeline method; params must be JSON-encodable
_STEPS = ("where", "decode", "translate", "calc", "dem", "cut_tiles")


class RasterPlan:
    """Declarative raster pipeline: a source + ordered steps."""

    def __init__(self, source: dict, steps: list | None = None):
        self.source = source
        self.steps = list(steps or [])

    # -- construction -------------------------------------------------------
    @classmethod
    def read_parquet(cls, path: str, columns=None) -> "RasterPlan":
        return cls({"type": "parquet", "path": path, "columns": columns})

    def _add(self, kind: str, **params) -> "RasterPlan":
        if kind not in _STEPS:
            raise ValueError(f"unknown step {kind!r}")
        return RasterPlan(self.source, self.steps + [(kind, params)])

    def where(self, clause: str) -> "RasterPlan":
        return self._add("where", clause=clause)

    def decode(self, **kw) -> "RasterPlan":
        return self._add("decode", **kw)

    def translate(self, **kw) -> "RasterPlan":
        return self._add("translate", **kw)

    def calc(self, expr: str, out_col: str = "calc") -> "RasterPlan":
        return self._add("calc", expr=expr, out_col=out_col)

    def dem(self, mode: str = "hillshade", **kw) -> "RasterPlan":
        return self._add("dem", mode=mode, **kw)

    def cut_tiles(self, zoom: int, resampling: str = "average"
                  ) -> "RasterPlan":
        return self._add("cut_tiles", zoom=zoom, resampling=resampling)

    # -- serialization ------------------------------------------------------
    def to_xml(self) -> str:
        root = ET.Element("GeoRayPipeline", version="1")
        src = ET.SubElement(root, "Source", type=self.source["type"])
        p = ET.SubElement(src, "Path")
        p.text = self.source["path"]
        if self.source.get("columns"):
            for c in self.source["columns"]:
                col = ET.SubElement(src, "Column")
                col.text = c
        for kind, params in self.steps:
            el = ET.SubElement(root, "Step", kind=kind)
            for name, val in sorted(params.items()):
                if kind == "calc" and name == "expr":
                    pf = ET.SubElement(el, "PixelFunction")
                    pf.text = val
                    continue
                opt = ET.SubElement(el, "Option", name=name)
                opt.text = json.dumps(val)
        ET.indent(root)
        return ET.tostring(root, encoding="unicode")

    @classmethod
    def from_xml(cls, text: str) -> "RasterPlan":
        root = ET.fromstring(text)
        if root.tag != "GeoRayPipeline":
            raise ValueError("not a GeoRayPipeline document")
        src_el = root.find("Source")
        if src_el is None:
            raise ValueError("missing <Source>")
        cols = [c.text for c in src_el.findall("Column")] or None
        source = {"type": src_el.get("type"),
                  "path": src_el.findtext("Path"),
                  "columns": cols}
        steps = []
        for el in root.findall("Step"):
            kind = el.get("kind")
            if kind not in _STEPS:
                raise ValueError(f"unknown step {kind!r}")
            params = {o.get("name"): json.loads(o.text or "null")
                      for o in el.findall("Option")}
            pf = el.findtext("PixelFunction")
            if pf is not None:
                params["expr"] = pf
            steps.append((kind, params))
        return cls(source, steps)

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_xml())
        return path

    @classmethod
    def load(cls, path: str) -> "RasterPlan":
        with open(path) as f:
            return cls.from_xml(f.read())

    # -- execution ----------------------------------------------------------
    def build(self):
        """Materialize the plan into the lazy Ray pipeline (nothing
        executes until the returned RasterPipeline is consumed)."""
        from .rasterpipe import RasterPipeline

        if self.source["type"] != "parquet":
            raise ValueError(f"unknown source {self.source['type']!r}")
        pipe = RasterPipeline.read_parquet(self.source["path"],
                                           columns=self.source["columns"])
        for kind, params in self.steps:
            # tuples arrive back as lists from JSON — the stages accept
            # sequences, except srcwin/outsize which some numpy paths
            # index as tuples
            kw = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in params.items()}
            pipe = getattr(pipe, kind)(**kw)
        return pipe
