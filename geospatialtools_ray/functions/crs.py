"""Coordinate reference system (CRS) transforms — vectorized, pure numpy.

The reference's only vector entry point reprojects before rasterizing
(`gdal_tools.py:188`: ``ogr2ogr ... -t_srs proj4`` inside
``shapefile2raster``) and its raster metadata carries a proj4/WKT string
(`gdal_tools.py:84-100`), but all coordinate math happens inside
GDAL/OGR.  This engine re-derives the two projection families a
hydrology-preprocessing user actually hits — geographic lon/lat (WGS84),
UTM (transverse Mercator, the DEM-tile CRS), and spherical web-mercator
(EPSG:3857, the map-tile CRS) — as vectorized float64 kernels suitable
for ``map_batches``; no GDAL, no pyproj.

Formulas are the public Snyder series (J.P. Snyder, *Map Projections —
A Working Manual*, USGS PP 1395, 1987, eqs. 8-9..8-25) on the WGS84
ellipsoid; forward/inverse round-trip agrees to <1e-9 degrees across a
UTM zone (tested in tests/test_crs.py), matching what ``ogr2ogr``
produces to well under the reference's raster resolution.

A CRS here is a plain string tag: ``"lonlat"``, ``"utm:<zone>[s]"``
(e.g. ``"utm:17"``, ``"utm:33s"``), ``"webmercator"``.  ``transform``
composes any pair through lon/lat.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_FE = 500000.0
_FN_SOUTH = 10000000.0

# web-mercator sphere radius (EPSG:3857 uses the WGS84 semi-major axis)
_R_MERC = 6378137.0
WEBMERC_MAX = np.pi * _R_MERC  # 20037508.342789244


# ---------------------------------------------------------------------------
# Web-mercator (EPSG:3857)
# ---------------------------------------------------------------------------

def lonlat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R_MERC * np.radians(lon)
    y = _R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R_MERC)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# UTM (transverse Mercator, Snyder series)
# ---------------------------------------------------------------------------

def utm_zone_lon0(zone: int) -> float:
    """Central meridian (degrees) of a UTM zone (1..60)."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be in 1..60, got {zone}")
    return -183.0 + 6.0 * zone


def utm_zone_of(lon, lat=None) -> int:
    """Standard zone for a longitude (scalar); special Norway/Svalbard
    exceptions are NOT applied (GDAL's utm zone picker doesn't either)."""
    return int(np.floor((float(lon) + 180.0) / 6.0)) % 60 + 1


# meridional arc coefficients (Snyder eq. 3-21)
_M0 = 1.0 - _E2 / 4.0 - 3.0 * _E2**2 / 64.0 - 5.0 * _E2**3 / 256.0
_M2 = 3.0 * _E2 / 8.0 + 3.0 * _E2**2 / 32.0 + 45.0 * _E2**3 / 1024.0
_M4 = 15.0 * _E2**2 / 256.0 + 45.0 * _E2**3 / 1024.0
_M6 = 35.0 * _E2**3 / 3072.0


def _meridional_arc(phi: np.ndarray) -> np.ndarray:
    return _A * (
        _M0 * phi
        - _M2 * np.sin(2.0 * phi)
        + _M4 * np.sin(4.0 * phi)
        - _M6 * np.sin(6.0 * phi)
    )


def lonlat_to_utm(lon, lat, zone: int, south: bool = False):
    """Forward transverse Mercator (Snyder eqs. 8-9..8-15) -> (easting,
    northing) in metres for the given zone/hemisphere."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon)
    lam0 = np.radians(utm_zone_lon0(zone))

    sin_p = np.sin(phi)
    cos_p = np.cos(phi)
    tan_p = np.tan(phi)
    n = _A / np.sqrt(1.0 - _E2 * sin_p**2)
    t = tan_p**2
    c = _EP2 * cos_p**2
    a_ = (lam - lam0) * cos_p
    m = _meridional_arc(phi)

    x = _K0 * n * (
        a_
        + (1.0 - t + c) * a_**3 / 6.0
        + (5.0 - 18.0 * t + t**2 + 72.0 * c - 58.0 * _EP2) * a_**5 / 120.0
    ) + _FE
    y = _K0 * (
        m
        + n * tan_p * (
            a_**2 / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c**2) * a_**4 / 24.0
            + (61.0 - 58.0 * t + t**2 + 600.0 * c - 330.0 * _EP2) * a_**6 / 720.0
        )
    )
    if south:
        y = y + _FN_SOUTH
    return x, y


_E1 = (1.0 - np.sqrt(1.0 - _E2)) / (1.0 + np.sqrt(1.0 - _E2))
# footpoint-latitude coefficients (Snyder eq. 3-26)
_P2 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_P4 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_P6 = 151.0 * _E1**3 / 96.0
_P8 = 1097.0 * _E1**4 / 512.0


def utm_to_lonlat(x, y, zone: int, south: bool = False):
    """Inverse transverse Mercator (Snyder eqs. 8-18..8-25)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lam0 = np.radians(utm_zone_lon0(zone))

    yn = y - _FN_SOUTH if south else y
    m = yn / _K0
    mu = m / (_A * _M0)
    phi1 = (
        mu
        + _P2 * np.sin(2.0 * mu)
        + _P4 * np.sin(4.0 * mu)
        + _P6 * np.sin(6.0 * mu)
        + _P8 * np.sin(8.0 * mu)
    )
    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1.0 - _E2 * sin1**2)
    r1 = _A * (1.0 - _E2) / (1.0 - _E2 * sin1**2) ** 1.5
    d = (x - _FE) / (n1 * _K0)

    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1**2 - 9.0 * _EP2) * d**4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1**2 - 252.0 * _EP2 - 3.0 * c1**2)
        * d**6 / 720.0
    )
    lam = lam0 + (
        d
        - (1.0 + 2.0 * t1 + c1) * d**3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1**2 + 8.0 * _EP2 + 24.0 * t1**2)
        * d**5 / 120.0
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# String-tagged CRS dispatch (the `-t_srs` seam)
# ---------------------------------------------------------------------------

def _parse(crs: str):
    crs = crs.strip().lower()
    if crs in ("lonlat", "epsg:4326", "wgs84"):
        return ("lonlat", None, False)
    if crs in ("webmercator", "epsg:3857"):
        return ("webmercator", None, False)
    if crs.startswith("utm:"):
        z = crs[4:]
        south = z.endswith("s")
        if south or z.endswith("n"):
            z = z[:-1]
        return ("utm", int(z), south)
    raise ValueError(f"unknown CRS tag {crs!r} (lonlat | webmercator | utm:<zone>[s])")


def to_lonlat(x, y, crs: str):
    kind, zone, south = _parse(crs)
    if kind == "lonlat":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if kind == "webmercator":
        return webmercator_to_lonlat(x, y)
    return utm_to_lonlat(x, y, zone, south)


def from_lonlat(lon, lat, crs: str):
    kind, zone, south = _parse(crs)
    if kind == "lonlat":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if kind == "webmercator":
        return lonlat_to_webmercator(lon, lat)
    return lonlat_to_utm(lon, lat, zone, south)


def transform(x, y, src: str, dst: str):
    """Composed transform src -> lon/lat -> dst (either leg is identity
    when the tag is lonlat) — the engine's ``-t_srs``."""
    lon, lat = to_lonlat(x, y, src)
    return from_lonlat(lon, lat, dst)


def reproject_batch(batch, src: str, dst: str, x_col: str = "lon", y_col: str = "lat"):
    """map_batches-ready: replace (x_col, y_col) with their dst-CRS
    coordinates; every other column passes through untouched (the span
    payload is never copied — Arrow set_column swaps one column ref)."""
    import pyarrow as pa

    x = batch[x_col].to_numpy(zero_copy_only=False)
    y = batch[y_col].to_numpy(zero_copy_only=False)
    nx, ny = transform(x, y, src, dst)
    out = batch.set_column(batch.schema.get_field_index(x_col), x_col, pa.array(nx))
    out = out.set_column(out.schema.get_field_index(y_col), y_col, pa.array(ny))
    return out
