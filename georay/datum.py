"""Non-WGS84 datums: parameterized ellipsoids, geodetic↔ECEF, the
7-parameter Helmert transformation, and datum-aware projected CRS
(OSGB36 British National Grid EPSG:27700, ED50/UTM EPSG:230xx).

The reference reaches every datum through PROJ (ogr/ogrct.cpp:2266 +
the EPSG database); this module implements the same public machinery
from scratch for the handful of classic non-WGS84 datums, removing the
repo's standing "datum treated as WGS84-equivalent" approximation for
those CRS.  All formulas are public: Krüger–Karney transverse Mercator
series (identical to georay.mercator, re-derived per ellipsoid),
Bowring's ECEF→geodetic start + Newton polish, and the EPSG 9606
position-vector Helmert convention (the convention OSGB and ED50
parameter sets are published in).

Engine convention: every lat/lon column in the engine is WGS84; a
datum CRS round-trips through ECEF + Helmert at the projection
boundary (``datum_crs_forward`` / ``datum_crs_inverse``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "Ellipsoid", "WGS84", "GRS80", "AIRY_1830", "INTL_1924",
    "CLARKE_1866", "geodetic_to_ecef", "ecef_to_geodetic",
    "helmert_apply", "helmert_invert", "datum_shift_to_wgs84",
    "datum_shift_from_wgs84", "tmerc_forward_e", "tmerc_inverse_e",
    "DATUM_CRS", "datum_crs_forward", "datum_crs_inverse",
]


class Ellipsoid:
    """Reference ellipsoid (a, 1/f) with the derived constants and the
    6th-order Krüger alpha/beta series used by the transverse Mercator
    forms (Karney 2011, public)."""

    def __init__(self, name: str, a: float, inv_f: float):
        self.name = name
        self.a = a
        self.f = 1.0 / inv_f
        self.e2 = self.f * (2.0 - self.f)
        self.e = np.sqrt(self.e2)
        n = self.f / (2.0 - self.f)
        self.n = n
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        self.alpha = np.array([
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
            - 127 * n**5 / 288 + 7891 * n**6 / 37800,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440
            + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
            61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
            + 167603 * n**6 / 181440,
            49561 * n**4 / 161280 - 179 * n**5 / 168
            + 6601661 * n**6 / 7257600,
            34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
            212378941 * n**6 / 319334400,
        ])
        self.beta = np.array([
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
            - 81 * n**5 / 512 + 96199 * n**6 / 604800,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
            - 1118711 * n**6 / 3870720,
            17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
            + 5569 * n**6 / 90720,
            4397 * n**4 / 161280 - 11 * n**5 / 504
            - 830251 * n**6 / 7257600,
            4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
            20648693 * n**6 / 638668800,
        ])

    def __repr__(self):
        return f"Ellipsoid({self.name}, a={self.a}, f=1/{1.0 / self.f:.9g})"


# EPSG ellipsoid parameter rows (public constants)
WGS84 = Ellipsoid("WGS 84", 6378137.0, 298.257223563)          # EPSG:7030
GRS80 = Ellipsoid("GRS 1980", 6378137.0, 298.257222101)        # EPSG:7019
AIRY_1830 = Ellipsoid("Airy 1830", 6377563.396, 299.3249646)   # EPSG:7001
INTL_1924 = Ellipsoid("International 1924", 6378388.0, 297.0)  # EPSG:7022
CLARKE_1866 = Ellipsoid("Clarke 1866", 6378206.4,
                        294.978698214)                         # EPSG:7008


# ---------------------------------------------------------------------------
# Geodetic ↔ geocentric (ECEF)
# ---------------------------------------------------------------------------

def geodetic_to_ecef(lat, lon, h=0.0, ell: Ellipsoid = WGS84):
    """(lat, lon degrees, h meters) → geocentric X, Y, Z meters."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    N = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    return ((N + h) * c * np.cos(lam),
            (N + h) * c * np.sin(lam),
            (N * (1.0 - ell.e2) + h) * s)


def ecef_to_geodetic(x, y, z, ell: Ellipsoid = WGS84):
    """Geocentric X, Y, Z → (lat, lon degrees, h meters): Bowring's
    parametric-latitude start + 3 Newton iterations (sub-nm)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p = np.hypot(x, y)
    b = ell.a * (1.0 - ell.f)
    ep2 = (ell.a * ell.a - b * b) / (b * b)
    u = np.arctan2(z * ell.a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(u) ** 3,
                     p - ell.e2 * ell.a * np.cos(u) ** 3)
    for _ in range(3):
        s = np.sin(phi)
        N = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
        h = p / np.cos(phi) - N
        phi = np.arctan2(z, p * (1.0 - ell.e2 * N / (N + h)))
    s = np.sin(phi)
    N = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    h = np.where(np.abs(np.cos(phi)) > 1e-10,
                 p / np.cos(phi) - N,
                 np.abs(z) - b)
    return np.degrees(phi), np.degrees(np.arctan2(y, x)), h


# ---------------------------------------------------------------------------
# 7-parameter Helmert (EPSG 9606 position-vector convention: the sign
# convention OSGB36 and ED50 parameter sets are published in)
# ---------------------------------------------------------------------------

def helmert_apply(x, y, z, params):
    """Apply (tx, ty, tz [m], rx, ry, rz [arc-sec], s [ppm]) —
    position-vector small-angle form: X' = T + (1+s)·R·X."""
    tx, ty, tz, rx, ry, rz, s = params
    rx, ry, rz = (np.radians(v / 3600.0) for v in (rx, ry, rz))
    m = 1.0 + s * 1e-6
    return (tx + m * (x - rz * y + ry * z),
            ty + m * (rz * x + y - rx * z),
            tz + m * (-ry * x + rx * y + z))


def helmert_invert(x, y, z, params):
    """Exact inverse of ``helmert_apply`` (solves the small-angle linear
    system rather than negating parameters — exact at any rotation)."""
    tx, ty, tz, rx, ry, rz, s = params
    rx, ry, rz = (np.radians(v / 3600.0) for v in (rx, ry, rz))
    m = 1.0 + s * 1e-6
    u, v, w = (np.asarray(x) - tx) / m, (np.asarray(y) - ty) / m, \
        (np.asarray(z) - tz) / m
    # R⁻¹ for the small-angle matrix [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]
    det = 1.0 + rx * rx + ry * ry + rz * rz
    return (((1 + rx * rx) * u + (rz + rx * ry) * v
             + (rx * rz - ry) * w) / det,
            ((rx * ry - rz) * u + (1 + ry * ry) * v
             + (rx + ry * rz) * w) / det,
            ((ry + rx * rz) * u + (ry * rz - rx) * v
             + (1 + rz * rz) * w) / det)


def datum_shift_to_wgs84(lat, lon, ell: Ellipsoid, params):
    """Datum geodetic coords → WGS84 geodetic coords (h=0 on the datum
    ellipsoid — the 2-D convention used throughout the engine)."""
    x, y, z = geodetic_to_ecef(lat, lon, 0.0, ell)
    la, lo, _ = ecef_to_geodetic(*helmert_apply(x, y, z, params), WGS84)
    return la, lo


def datum_shift_from_wgs84(lat, lon, ell: Ellipsoid, params):
    x, y, z = geodetic_to_ecef(lat, lon, 0.0, WGS84)
    la, lo, _ = ecef_to_geodetic(*helmert_invert(x, y, z, params), ell)
    return la, lo


# ---------------------------------------------------------------------------
# Ellipsoid-parameterized transverse Mercator (with natural-origin
# latitude — the general EPSG 9807 form; georay.mercator's tmerc is the
# WGS84/lat0=0 fast path this generalizes)
# ---------------------------------------------------------------------------

def _kruger_xi_eta(phi, lam, ell):
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - ell.e * np.arctanh(ell.e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7, dtype=np.float64)
    xi = xi_p + (ell.alpha * np.sin(2 * j * xi_p[..., None])
                 * np.cosh(2 * j * eta_p[..., None])).sum(axis=-1)
    eta = eta_p + (ell.alpha * np.cos(2 * j * xi_p[..., None])
                   * np.sinh(2 * j * eta_p[..., None])).sum(axis=-1)
    return xi, eta


def _xi_of_lat0(lat0, ell):
    """Rectifying latitude of the natural origin (xi at lam=0)."""
    xi, _ = _kruger_xi_eta(np.asarray(np.radians(lat0)), np.asarray(0.0),
                           ell)
    return float(xi)


def tmerc_forward_e(lat, lon, *, ell: Ellipsoid, lat0: float, lon0: float,
                    k0: float, e0: float, n0: float):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    xi, eta = _kruger_xi_eta(phi, lam, ell)
    xi0 = _xi_of_lat0(lat0, ell) if lat0 else 0.0
    return e0 + k0 * ell.A * eta, n0 + k0 * ell.A * (xi - xi0)


def tmerc_inverse_e(easting, northing, *, ell: Ellipsoid, lat0: float,
                    lon0: float, k0: float, e0: float, n0: float):
    E = np.asarray(easting, dtype=np.float64)
    N = np.asarray(northing, dtype=np.float64)
    xi0 = _xi_of_lat0(lat0, ell) if lat0 else 0.0
    xi = (N - n0) / (k0 * ell.A) + xi0
    eta = (E - e0) / (k0 * ell.A)
    j = np.arange(1, 7, dtype=np.float64)
    xi_p = xi - (ell.beta * np.sin(2 * j * xi[..., None])
                 * np.cosh(2 * j * eta[..., None])).sum(axis=-1)
    eta_p = eta - (ell.beta * np.cos(2 * j * xi[..., None])
                   * np.sinh(2 * j * eta[..., None])).sum(axis=-1)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    # conformal → geodetic latitude, Newton on the conformal latitude
    # (exact for any eccentricity, unlike a fixed series in e²)
    phi = chi.copy() if np.ndim(chi) else np.asarray(chi, dtype=np.float64)
    for _ in range(12):
        s = np.sin(phi)
        t_chi = np.sinh(np.arctanh(s) - ell.e * np.arctanh(ell.e * s))
        f = np.arctan(t_chi) - chi
        dchi_dphi = (np.sqrt(1.0 + t_chi * t_chi) ** -2
                     * np.cosh(np.arctanh(s) - ell.e
                               * np.arctanh(ell.e * s))
                     * (1.0 / (1.0 - s * s)
                        - ell.e2 / (1.0 - ell.e2 * s * s)) * np.cos(phi))
        step = f / dchi_dphi
        phi = phi - step
        if np.max(np.abs(step)) < 1e-14:
            break
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(phi), np.degrees(lam) + lon0


# ---------------------------------------------------------------------------
# Named datum CRS.  Helmert parameter rows (public, position-vector,
# datum→WGS84): OSGB36 from the OS "Guide to coordinate systems in
# Great Britain" (±5 m national set); ED50 mean-European set.
# ---------------------------------------------------------------------------

_OSGB36_TO_WGS84 = (446.448, -125.157, 542.060,
                    0.1502, 0.2470, 0.8421, -20.4894)
_ED50_TO_WGS84 = (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)

# crs -> (ellipsoid, helmert-to-wgs84, projection params)
DATUM_CRS = {
    # OSGB36 / British National Grid
    "EPSG:27700": (AIRY_1830, _OSGB36_TO_WGS84,
                   dict(lat0=49.0, lon0=-2.0, k0=0.9996012717,
                        e0=400000.0, n0=-100000.0)),
    # ED50 / UTM zone 31N (Intl 1924); other zones via EPSG:230xx
    "EPSG:23031": (INTL_1924, _ED50_TO_WGS84,
                   dict(lat0=0.0, lon0=3.0, k0=0.9996,
                        e0=500000.0, n0=0.0)),
}


def _resolve_datum_crs(crs: str):
    if crs in DATUM_CRS:
        return DATUM_CRS[crs]
    if crs.startswith("EPSG:230"):           # ED50 / UTM zone NN
        zone = int(crs.split(":")[1]) % 100
        return (INTL_1924, _ED50_TO_WGS84,
                dict(lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                     e0=500000.0, n0=0.0))
    raise KeyError(crs)


def datum_crs_forward(crs: str, lat, lon):
    """WGS84 lat/lon → projected easting/northing of a datum CRS
    (Helmert into the datum, then ellipsoidal tmerc)."""
    ell, h7, p = _resolve_datum_crs(crs)
    la, lo = datum_shift_from_wgs84(lat, lon, ell, h7)
    return tmerc_forward_e(la, lo, ell=ell, **p)


def datum_crs_inverse(crs: str, easting, northing):
    """Projected easting/northing of a datum CRS → WGS84 lat/lon."""
    ell, h7, p = _resolve_datum_crs(crs)
    la, lo = tmerc_inverse_e(easting, northing, ell=ell, **p)
    return datum_shift_to_wgs84(la, lo, ell, h7)
