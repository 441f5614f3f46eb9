"""Image quality scoring — the image-side sibling of the text quality
signals (georay/text.py): brightness / contrast / Laplacian sharpness /
histogram entropy / clipped-pixel fractions per image, the standard
filter features of a vision training-data pipeline (LAION-style curation
drops dark, blown-out and blurry samples before captioning).

Scale shape: an actor-pool ``map_batches`` stage consuming the decoded
``pixels`` binary column (the DecodeImages layout — uint8 RGB, C-order);
images of equal (h, w) within a batch are STACKED and every metric is
one vectorized reduction over the stack — the per-image Python work is
an append, never pixel arithmetic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ImageQuality", "quality_metrics"]

# ITU-R BT.601 luma weights (integer arithmetic: 77/150/29 of 256)
_LW = np.array([77, 150, 29], np.uint32)


def quality_metrics(stack: np.ndarray) -> dict:
    """(n, h, w, 3) uint8 → per-image metric vectors (n,).  One pass of
    vectorized reductions; the Laplacian uses the 4-neighbour stencil on
    the luma plane (variance of the response = the classic blur score)."""
    n, h, w, _ = stack.shape
    luma = ((stack.astype(np.uint32) * _LW).sum(axis=3) >> 8) \
        .astype(np.int32)                              # (n, h, w)
    flat = luma.reshape(n, -1).astype(np.float64)
    brightness = flat.mean(axis=1)
    contrast = flat.std(axis=1)
    lap = (4 * luma[:, 1:-1, 1:-1]
           - luma[:, :-2, 1:-1] - luma[:, 2:, 1:-1]
           - luma[:, 1:-1, :-2] - luma[:, 1:-1, 2:]).astype(np.float64)
    sharpness = lap.reshape(n, -1).var(axis=1)
    dark = (flat < 16).mean(axis=1)
    bright = (flat > 239).mean(axis=1)
    # 64-bin histogram entropy in bits, vectorized over the stack
    bins = (luma.reshape(n, -1) >> 2).astype(np.int64)
    hist = np.zeros((n, 64), np.int64)
    np.add.at(hist, (np.repeat(np.arange(n), h * w), bins.ravel()), 1)
    p = hist / float(h * w)
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(p > 0, p * np.log2(p), 0.0).sum(axis=1)
    return dict(brightness=brightness, contrast=contrast,
                sharpness=sharpness, dark_frac=dark,
                bright_frac=bright, entropy=ent)


class ImageQuality:
    """Actor-pool stage over decoded rows: appends the quality metric
    columns + a ``low_quality`` flag (too dark / blown out / blurry /
    flat — thresholds are constructor parameters, audit-friendly)."""

    def __init__(self, min_brightness: float = 24.0,
                 max_dark_frac: float = 0.9,
                 max_bright_frac: float = 0.9,
                 min_sharpness: float = 4.0,
                 min_entropy: float = 1.0):
        self.th = (min_brightness, max_dark_frac, max_bright_frac,
                   min_sharpness, min_entropy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h_arr = batch["h"].to_numpy()
        w_arr = batch["w"].to_numpy()
        bufs = batch["pixels"].to_pylist()
        cols = {k: np.empty(n, np.float64) for k in
                ("brightness", "contrast", "sharpness", "dark_frac",
                 "bright_frac", "entropy")}
        # stack equal-shape runs → vectorized metrics per group
        order = np.lexsort((w_arr, h_arr))
        i = 0
        while i < n:
            j = i
            hh, ww = h_arr[order[i]], w_arr[order[i]]
            while j < n and h_arr[order[j]] == hh \
                    and w_arr[order[j]] == ww:
                j += 1
            idx = order[i:j]
            stack = np.stack([
                np.frombuffer(bufs[k], np.uint8).reshape(hh, ww, 3)
                for k in idx])
            m = quality_metrics(stack)
            for k, v in m.items():
                cols[k][idx] = v
            i = j
        mb, mdf, mbf, ms, me = self.th
        low = ((cols["brightness"] < mb)
               | (cols["dark_frac"] > mdf)
               | (cols["bright_frac"] > mbf)
               | (cols["sharpness"] < ms)
               | (cols["entropy"] < me))
        out = batch.drop_columns(["pixels"])
        for k in ("brightness", "contrast", "sharpness", "dark_frac",
                  "bright_frac", "entropy"):
            out = out.append_column(k, pa.array(cols[k]))
        return out.append_column("low_quality", pa.array(low))
