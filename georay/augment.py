"""Deterministic image augmentation — the training-data transform stage
of the charter's image pipeline (crop / flip / photometric jitter over
the decoded ``pixels`` column), expressed as a ``map_batches`` stage.

GDAL has no augmentation (nearest analog: gdal_translate's window/scale,
raster.py::TranslateImages); this is a first-class training extension.
Design rules:

* **Deterministic**: every augmentation parameter derives from a
  splitmix64 of ``(image_id hash, seed)`` — the same row gets the same
  augmentation on every run, on any cluster size, with no RNG state
  shared between workers (the reproducibility contract of
  georay.sample).
* **Auditable**: the applied parameters are emitted as columns
  (``aug_flip, aug_x0, aug_y0, aug_crop, aug_gain, aug_bias``) so a
  sample's provenance is queryable.
* **Vectorized**: parameters for the whole batch come from one hash
  pass; the per-image crop/flip/jitter is numpy slicing + one
  ``clip((a·gain)+bias)`` — no per-pixel Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import hash_strings

__all__ = ["AugmentImages", "augment_params"]

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def augment_params(ids, seed: int = 0, *, crop_frac: float = 0.8,
                   jitter: float = 0.2):
    """Per-row augmentation parameters from the id hash (one vectorized
    pass): flip bit, crop offsets in [0, 1−crop_frac], gain in
    [1−jitter, 1+jitter], bias in [−16·jitter, 16·jitter]."""
    h = _splitmix(hash_strings(ids) ^ np.uint64(seed))
    # bias draws from an INDEPENDENT splitmix round: h >> 49 keeps only
    # 15 bits (max 0x7FFF), which halved the range and made bias always
    # negative (advisor round 3); a second round gives a full 16 bits
    # without overlapping the fx/fy/gain lanes.
    h2 = _splitmix(h)
    u = lambda sh: ((h >> np.uint64(sh)) & np.uint64(0xFFFF)) / 65535.0
    ub = (h2 & np.uint64(0xFFFF)) / 65535.0
    return {
        "flip": ((h & np.uint64(1)) == 1),
        "fx": u(1) * (1.0 - crop_frac),
        "fy": u(17) * (1.0 - crop_frac),
        "gain": 1.0 + (u(33) * 2.0 - 1.0) * jitter,
        "bias": (ub * 2.0 - 1.0) * 16.0 * jitter,
    }


class AugmentImages:
    """Actor stage: decoded rows → augmented rows + parameter columns.

    ``crop_frac``: kept side fraction (0.8 → central-ish 80% window at a
    hash-chosen offset); ``jitter``: photometric gain/bias amplitude;
    ``out_size``: optional (w, h) resize of the crop through the tile
    resampler (bilinear)."""

    def __init__(self, seed: int = 0, crop_frac: float = 0.8,
                 jitter: float = 0.2, out_size=None):
        from .tiles import _scale_to
        self.seed = seed
        self.crop_frac = float(crop_frac)
        self.jitter = float(jitter)
        self.out_size = out_size
        self._scale_to = _scale_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        p = augment_params(batch["image_id"], self.seed,
                           crop_frac=self.crop_frac, jitter=self.jitter)
        h_arr = batch["h"].to_numpy()
        w_arr = batch["w"].to_numpy()
        out_pix, out_w, out_h = [], [], []
        x0s = np.empty(n, np.int64)
        y0s = np.empty(n, np.int64)
        for i in range(n):
            h, w = int(h_arr[i]), int(w_arr[i])
            arr = np.frombuffer(batch["pixels"][i].as_buffer(),
                                dtype=np.uint8).reshape(h, w, -1)
            ch = max(1, int(round(h * self.crop_frac)))
            cw = max(1, int(round(w * self.crop_frac)))
            y0 = min(int(p["fy"][i] * h), h - ch)
            x0 = min(int(p["fx"][i] * w), w - cw)
            a = arr[y0:y0 + ch, x0:x0 + cw]
            if p["flip"][i]:
                a = a[:, ::-1]
            a = np.clip(a.astype(np.float32) * np.float32(p["gain"][i])
                        + np.float32(p["bias"][i]), 0, 255).astype(np.uint8)
            if self.out_size is not None:
                ow, oh = self.out_size
                a = self._scale_to(np.ascontiguousarray(a), oh, ow,
                                   "bilinear")
            out_pix.append(np.ascontiguousarray(a).tobytes())
            out_h.append(a.shape[0])
            out_w.append(a.shape[1])
            x0s[i], y0s[i] = x0, y0
        keep = [c for c in batch.schema.names
                if c not in ("pixels", "w", "h")]
        out = pa.table({c: batch[c] for c in keep})
        out = out.append_column("pixels", pa.array(out_pix, pa.binary()))
        out = out.append_column("w", pa.array(out_w, pa.int32()))
        out = out.append_column("h", pa.array(out_h, pa.int32()))
        out = out.append_column("aug_flip", pa.array(p["flip"]))
        out = out.append_column("aug_x0", pa.array(x0s))
        out = out.append_column("aug_y0", pa.array(y0s))
        out = out.append_column("aug_gain", pa.array(p["gain"]))
        out = out.append_column("aug_bias", pa.array(p["bias"]))
        return out
