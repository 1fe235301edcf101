"""Minimal WKB (well-known binary) codec for Point and Polygon geometries.

The reference never touches polygon coordinates in-process (shapefiles are
handled by shelling out to ogr2ogr / gdal_rasterize,
``libraries/gdal_tools.py:170-192``). Our engine carries geometries as WKB
``binary`` Arrow columns, so we need a tiny standards-based codec (OGC
06-103r4 simple features, little-endian only). shapely is not available in
this environment; this is all the engine needs.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT = 1
_POLYGON = 3


def point_wkb(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, lon, lat)


def polygon_wkb(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n,2) float64 arrays (first = exterior, closed or not —
    we close them on encode)."""
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def parse_point(buf: bytes) -> tuple[float, float]:
    order, gtype, x, y = struct.unpack_from("<BIdd", buf)
    if gtype != _POINT:
        raise ValueError(f"not a WKB point: type={gtype}")
    return x, y


def parse_polygon(buf: bytes) -> list[np.ndarray]:
    order, gtype, nrings = struct.unpack_from("<BII", buf)
    if gtype != _POLYGON:
        raise ValueError(f"not a WKB polygon: type={gtype}")
    off = 9
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
        off += npts * 16
        rings.append(ring.copy())
    return rings


def polygon_bbox(buf: bytes) -> tuple[float, float, float, float]:
    # span ALL rings: shapefile multipart polygons carry disjoint outer
    # rings, so the exterior-ring-only bbox would under-cover the index
    pts = np.vstack(parse_polygon(buf))
    return pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()
