"""Raster statistics / checksums — partial-per-block + driver combine.

* :func:`gdal_checksum` — exact reimplementation of GDAL's band checksum
  (alg/gdalchecksum.cpp:48-175: ``Σ int(px) % primes[(y·W + x) % 11]``
  masked ``& 0xffff``; primes {7,11,13,17,19,23,29,31,37,41,43} at :54).
  The per-line masking in the reference distributes over addition, so one
  final mask is equivalent.  This is the engine's conformance oracle, the
  same role it plays in GDAL's own tests (autotest/utilities/
  test_gdal_translate.py:52 asserts ``Checksum() == 4672``).
* :class:`BandStatsAccumulator` — min/max/mean/std with Welford combine
  (semantics of OGR's swq_summary: Kahan sum ogr_swq.h:367-372, Welford
  variance 386-389; raster path gcore/gdalrasterband.cpp:5085).
* :func:`histogram_partial` — per-tile ``np.bincount`` partials that sum
  exactly (gcore/gdalrasterband.cpp:3938 GetHistogram).

All pure numpy → usable inside ``map_batches``; the combine step runs on
the tiny partials stream (SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["CHECKSUM_PRIMES", "gdal_checksum", "BandStats",
           "band_stats_partial", "band_stats_combine", "histogram_partial"]

CHECKSUM_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43],
                           dtype=np.int64)


_PRIME_LUT_CACHE: dict = {}


def _prime_lut(n: int) -> np.ndarray:
    lut = _PRIME_LUT_CACHE.get(n)
    if lut is None:
        lut = CHECKSUM_PRIMES[np.arange(n, dtype=np.int64) % 11]
        if len(_PRIME_LUT_CACHE) > 8:
            _PRIME_LUT_CACHE.clear()
        _PRIME_LUT_CACHE[n] = lut
    return lut


def gdal_checksum(arr: np.ndarray) -> int:
    """GDAL band checksum of a full 2-D window (alg/gdalchecksum.cpp).

    ``arr``: 2-D integer array (one band).  Multi-band callers checksum each
    band separately, as GDAL does.
    """
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("gdal_checksum expects a single 2-D band")
    flat = a.astype(np.int64).ravel()
    primes = _prime_lut(flat.size)
    # C++ % truncates toward zero; numpy % floors. Match C++ for negatives.
    if (flat < 0).any():
        q = np.abs(flat) % primes
        vals = np.where(flat < 0, -q, q)
    else:
        vals = flat % primes
    return int(vals.sum() & 0xFFFF)


@dataclass
class BandStats:
    """Mergeable (count, mean, M2, min, max) — Welford's online algorithm,
    the same scheme as OGR's swq_summary (ogr_swq.h:386-389)."""

    count: int = 0
    mean: float = 0.0
    m2: float = 0.0
    min: float = np.inf
    max: float = -np.inf

    def merge(self, other: "BandStats") -> "BandStats":
        if other.count == 0:
            return self
        if self.count == 0:
            return other
        n = self.count + other.count
        delta = other.mean - self.mean
        mean = self.mean + delta * other.count / n
        m2 = self.m2 + other.m2 + delta * delta * self.count * other.count / n
        return BandStats(n, mean, m2,
                         min(self.min, other.min), max(self.max, other.max))

    @property
    def std(self) -> float:
        return float(np.sqrt(self.m2 / self.count)) if self.count else float("nan")

    @property
    def var(self) -> float:
        return self.m2 / self.count if self.count else float("nan")


def band_stats_partial(arr: np.ndarray) -> BandStats:
    """One partial per pixel block; exact combine via :meth:`BandStats.merge`."""
    flat = np.asarray(arr, dtype=np.float64).ravel()
    if flat.size == 0:
        return BandStats()
    return BandStats(
        count=int(flat.size),
        mean=float(flat.mean()),
        m2=float(((flat - flat.mean()) ** 2).sum()),
        min=float(flat.min()),
        max=float(flat.max()),
    )


def band_stats_combine(parts) -> BandStats:
    out = BandStats()
    for p in parts:
        out = out.merge(p)
    return out


def histogram_partial(arr: np.ndarray, n_bins: int = 256,
                      lo: float = -0.5, hi: float = 255.5) -> np.ndarray:
    """Bucketed counts for one block; vector-sum partials to combine
    (GetHistogram semantics: bucket = floor((v - lo)/(hi - lo) * n))."""
    flat = np.asarray(arr, dtype=np.float64).ravel()
    idx = np.floor((flat - lo) / (hi - lo) * n_bins).astype(np.int64)
    idx = idx[(idx >= 0) & (idx < n_bins)]
    return np.bincount(idx, minlength=n_bins)
