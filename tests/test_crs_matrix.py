"""CRS registry matrix (VERDICT r3 next-5): every registered EPSG code
is pinned by (a) forward/inverse round-trip to sub-mm, (b) the EPSG
false-origin identity forward(lat0, lon0) == (e0, n0) — a strong check
of every parameter in the row — and (c) unit scale on the standard
parallels for the conformal/equal-area conics.  Proj-string input is
pinned by equivalence with the matching EPSG rows.  Published-coordinate
anchors for representative codes live in test_mercator/test_datum."""

import numpy as np
import pytest

from georay.mercator import (_CONIC_CRS, _TMERC_CRS, _UTM_FAMILIES,
                             crs_forward, crs_inverse, resolve_crs)


def _domain(kind, p):
    """A small lat/lon probe grid inside the CRS's natural domain."""
    if kind == "utm":
        lon0 = p["zone"] * 6.0 - 183.0
        lat_c = 30.0 if p["north"] else -30.0
        lats = np.linspace(lat_c - 20, lat_c + 20, 7)
        lons = np.linspace(lon0 - 2.5, lon0 + 2.5, 7)
    elif kind == "ps":
        pole = -90.0 if p["south"] else 90.0
        lats = np.linspace(pole - np.sign(pole) * 25, pole
                           - np.sign(pole) * 2, 7)
        lons = np.linspace(-150, 150, 7)
    elif kind == "laea" and abs(p["lat0"]) == 90.0:
        s = np.sign(p["lat0"])
        lats = np.linspace(s * 90 - s * 30, s * 90 - s * 2, 7)
        lons = np.linspace(-150, 150, 7)
    else:
        lat0 = p.get("lat0", p.get("lat_ts", 0.0)) or 0.0
        lat0 = float(np.clip(lat0, -60, 60))
        lon0 = p.get("lon0", 0.0)
        lats = np.linspace(lat0 - 8, lat0 + 8, 7)
        lons = np.linspace(lon0 - 8, lon0 + 8, 7)
    glat, glon = np.meshgrid(lats, lons)
    glon = (glon + 180) % 360 - 180
    return glat.ravel(), glon.ravel()


def _all_codes():
    codes = list(_CONIC_CRS) + list(_TMERC_CRS)
    for prefix, (base, north, zr) in _UTM_FAMILIES.items():
        for z in zr:
            codes.append(f"EPSG:{base + z}")
    return codes


def test_registry_has_at_least_50_codes():
    assert len(_all_codes()) >= 50


@pytest.mark.parametrize("crs", _all_codes())
def test_crs_roundtrip_and_origin(crs):
    kind, p = resolve_crs(crs)
    lat, lon = _domain(kind, p)
    x, y = crs_forward(crs, lat, lon)
    lat2, lon2 = crs_inverse(crs, x, y)
    dlon = (np.asarray(lon2) - lon + 180) % 360 - 180
    assert np.max(np.abs(np.asarray(lat2) - lat)) < 1e-8   # ~1 mm
    assert np.max(np.abs(dlon)) < 1e-8
    # EPSG false-origin identity: the natural origin projects exactly to
    # the false easting/northing — pins lat0/lon0/e0/n0 jointly
    if kind in ("lcc", "albers", "laea"):
        ox, oy = crs_forward(crs, p["lat0"], p["lon0"])
        assert abs(float(ox) - p["e0"]) < 1e-6
        assert abs(float(oy) - p["n0"]) < 1e-6
    elif kind == "cea":
        ox, oy = crs_forward(crs, 0.0, p["lon0"])
        assert abs(float(ox) - p["e0"]) < 1e-6
        assert abs(float(oy) - p["n0"]) < 1e-6
    elif kind == "tmerc":
        ox, oy = crs_forward(crs, 0.0, p["lon0"])
        assert abs(float(ox) - p["e0"]) < 1e-6
        assert abs(float(oy) - p["n0"]) < 1e-6
    elif kind == "utm":
        lon0 = p["zone"] * 6.0 - 183.0
        ox, oy = crs_forward(crs, 0.0, lon0)
        assert abs(float(ox) - 500000.0) < 1e-6
        assert abs(float(oy) - (0.0 if p["north"] else 1e7)) < 1e-6


@pytest.mark.parametrize("crs", [c for c, (k, _) in _CONIC_CRS.items()
                                 if k in ("lcc", "albers")])
def test_conic_unit_scale_on_standard_parallels(crs):
    """LCC is conformal with k=1 on both standard parallels; Albers has
    unit scale ALONG the parallels there — a finite-difference check
    that pins lat1/lat2 independently of the origin identity."""
    kind, p = resolve_crs(crs)
    a, f_inv = 6378137.0, 298.257223563
    e2 = (2 - 1 / f_inv) / f_inv
    for lat_sp in (p["lat1"], p["lat2"]):
        phi = np.radians(lat_sp)
        # radius of the parallel on the ellipsoid
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        r_par = nu * np.cos(phi)
        dlon = 1e-4
        x1, y1 = crs_forward(crs, lat_sp, p["lon0"])
        x2, y2 = crs_forward(crs, lat_sp, p["lon0"] + dlon)
        ds = np.hypot(float(x2) - float(x1), float(y2) - float(y1))
        truth = r_par * np.radians(dlon)
        assert abs(ds / truth - 1.0) < 1e-6


def test_proj_string_equivalence():
    """Proj-strings resolve to the same math as the EPSG rows."""
    pairs = [
        ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +ellps=GRS80", "EPSG:2154"),
        ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
         "+datum=WGS84", "EPSG:5070"),
        ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84",
         "EPSG:3413"),
        ("+proj=utm +zone=32 +datum=WGS84", "EPSG:32632"),
        ("+proj=utm +zone=55 +south +datum=WGS84", "EPSG:32755"),
        ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
         "+ellps=GRS80", "EPSG:3035"),
        ("+proj=cea +lat_ts=30 +lon_0=0 +datum=WGS84", "EPSG:6933"),
        ("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
         "+y_0=10000000 +ellps=GRS80", "EPSG:2193"),
        ("+proj=eqearth +datum=WGS84", "EPSG:8857"),
    ]
    rng = np.random.default_rng(7)
    for pstr, code in pairs:
        kind, p = resolve_crs(code)
        lat, lon = _domain(kind, p)
        xa, ya = crs_forward(pstr, lat, lon)
        xb, yb = crs_forward(code, lat, lon)
        assert np.allclose(xa, xb, atol=1e-9) \
            and np.allclose(ya, yb, atol=1e-9)
        la, lo = crs_inverse(pstr, xb, yb)
        lb, lo2 = crs_inverse(code, xb, yb)
        assert np.allclose(la, lb, atol=1e-12) \
            and np.allclose(lo, lo2, atol=1e-12)


def test_proj_string_rejections():
    for bad in (
        "+proj=omerc +lat_0=4 +lonc=115",          # unimplemented family
        "+proj=lcc +lat_1=49 +datum=NAD27",        # non-WGS84 datum
        "+proj=stere +lat_0=45 +lat_ts=45",        # oblique stereographic
        "+proj=tmerc +lat_0=10 +lon_0=0",          # tmerc lat_0 != 0
        "+ellps=WGS84",                            # no +proj
    ):
        with pytest.raises(ValueError):
            resolve_crs(bad)


def test_mga_and_etrs_utm_match_wgs_utm():
    """The zone families (ETRS89/NAD83/GDA94) share the UTM formula with
    only datum differences the repo documents as WGS84-equivalent —
    EPSG:25832 must equal EPSG:32632 exactly, EPSG:28355 must equal
    EPSG:32755 exactly."""
    lat = np.array([48.0, 52.0, 60.0])
    lon = np.array([8.0, 9.5, 10.0])
    for a, b in (("EPSG:25832", "EPSG:32632"),
                 ("EPSG:26917", "EPSG:32617"),
                 ("EPSG:28355", "EPSG:32755")):
        sign = -1.0 if a == "EPSG:28355" else 1.0
        xa, ya = crs_forward(a, sign * lat, lon + (137.0 if sign < 0
                                                   else 0.0))
        xb, yb = crs_forward(b, sign * lat, lon + (137.0 if sign < 0
                                                   else 0.0))
        assert np.allclose(xa, xb) and np.allclose(ya, yb)


# --------------------------------------------------------------- WKT input

_WKT1_32631 = (
    'PROJCS["WGS 84 / UTM zone 31N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],'
    'PARAMETER["central_meridian",3],'
    'PARAMETER["scale_factor",0.9996],'
    'PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],UNIT["metre",1],'
    'AUTHORITY["EPSG","32631"]]')

_WKT1_2154 = (
    'PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",'
    'DATUM["Reseau_Geodesique_Francais_1993",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["standard_parallel_1",49],'
    'PARAMETER["standard_parallel_2",44],'
    'PARAMETER["latitude_of_origin",46.5],'
    'PARAMETER["central_meridian",3],'
    'PARAMETER["false_easting",700000],'
    'PARAMETER["false_northing",6600000],UNIT["metre",1]]')

_WKT1_5070 = (
    'PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",'
    'DATUM["North_American_Datum_1983",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Albers_Conic_Equal_Area"],'
    'PARAMETER["standard_parallel_1",29.5],'
    'PARAMETER["standard_parallel_2",45.5],'
    'PARAMETER["latitude_of_center",23],'
    'PARAMETER["longitude_of_center",-96],'
    'PARAMETER["false_easting",0],'
    'PARAMETER["false_northing",0],UNIT["metre",1]]')

_WKT2_3413 = (
    'PROJCRS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",'
    'BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
    'ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]]],'
    'CONVERSION["US NSIDC Sea Ice polar stereographic north",'
    'METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]],'
    'PARAMETER["Latitude of standard parallel",70,'
    'ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8832]],'
    'PARAMETER["Longitude of origin",-45,'
    'ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8833]],'
    'PARAMETER["False easting",0,LENGTHUNIT["metre",1]],'
    'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
    'CS[Cartesian,2]]')

_WKT2_3035 = (
    'PROJCRS["ETRS89-extended / LAEA Europe",BASEGEOGCRS["ETRS89",'
    'DATUM["European Terrestrial Reference System 1989",'
    'ELLIPSOID["GRS 1980",6378137,298.257222101]]],'
    'CONVERSION["Europe Equal Area 2001",'
    'METHOD["Lambert Azimuthal Equal Area",ID["EPSG",9820]],'
    'PARAMETER["Latitude of natural origin",52],'
    'PARAMETER["Longitude of natural origin",10],'
    'PARAMETER["False easting",4321000],'
    'PARAMETER["False northing",3210000]],CS[Cartesian,2]]')


@pytest.mark.parametrize("wkt,epsg", [
    (_WKT1_32631, "EPSG:32631"),
    (_WKT1_2154, "EPSG:2154"),
    (_WKT1_5070, "EPSG:5070"),
    (_WKT2_3413, "EPSG:3413"),
    (_WKT2_3035, "EPSG:3035"),
])
def test_wkt_crs_matches_epsg_row(wkt, epsg):
    """WKT1 and WKT2 strings resolve to EXACTLY the same projection as
    the corresponding EPSG registry row — forward outputs identical on
    a probe grid (same code path, same parameters)."""
    kind, p = resolve_crs(epsg)
    lats, lons = _domain(kind, p)
    glat, glon = np.meshgrid(lats, lons)
    xw, yw = crs_forward(wkt, glat.ravel(), glon.ravel())
    xe, ye = crs_forward(epsg, glat.ravel(), glon.ravel())
    np.testing.assert_array_equal(xw, xe)
    np.testing.assert_array_equal(yw, ye)
    # and the inverse round-trips through the WKT spec
    ilat, ilon = crs_inverse(wkt, xw, yw)
    assert np.max(np.abs(ilat - glat.ravel())) < 1e-9
    dlon = np.abs(ilon - glon.ravel()) % 360.0
    assert np.max(np.minimum(dlon, 360.0 - dlon)) < 1e-9


def test_wkt_crs_rejections_and_geogcs():
    from georay.mercator import _parse_wkt_crs
    assert resolve_crs(
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]]') == ("longlat", {})
    # non-WGS84-sized ellipsoid (Airy 1830) → explicit rejection: other
    # datums resolve only through their EPSG codes (georay.datum)
    with pytest.raises(ValueError, match="ellipsoid"):
        _parse_wkt_crs(_WKT1_2154.replace("6378137", "6377563.396"))
    with pytest.raises(ValueError, match="projection"):
        _parse_wkt_crs(_WKT1_2154.replace(
            "Lambert_Conformal_Conic_2SP", "Krovak"))
