"""Geometric scalar helpers: distances, per-cell areas, normalization,
hillslope shape functions, ArcGIS fdir decoding.

Reference semantics (cited; re-derived, not copied):
- calculate_distance: haversine with R=6,372,800 m and the atan2
  formulation (libraries/terrain_tools.py:14-23).
- calculate_area: dx along the cell diagonal midlat, dy across it
  (libraries/terrain_tools.py:25-40) — pure function of the tile bbox, so
  it is a per-tile map_batches with no halo.
- normalize_variable: (x-min)/(max-min) with global min/max, constant
  field -> 0 (libraries/terrain_tools.py:54-65). The engine computes
  min/max via a Dataset aggregate and broadcasts them.
- frelief/frelief_inv/fwidth/fslope (libraries/terrain_tools.py:42-52).
- transform_arcgis_fdir: power-of-2 D8 codes -> downstream cell pointers
  (libraries/terrain_tools.py:1666-1697); vectorized lookup table, and we
  emit compact D8 codes 0..7 rather than (i,j) pairs (SURVEY.md 1.2).
"""

from __future__ import annotations

import numpy as np

HAVERSINE_RADIUS = 6_372_800.0  # meters, terrain_tools.py:16

# D8 code convention used across the engine: index into these offsets.
# 0=E, 1=SE, 2=S, 3=SW, 4=W, 5=NW, 6=N, 7=NE  (row = i/y, col = j/x)
D8_DI = np.array([0, 1, 1, 1, 0, -1, -1, -1], dtype=np.int8)
D8_DJ = np.array([1, 1, 0, -1, -1, -1, 0, 1], dtype=np.int8)
D8_NODATA = np.int8(-1)

# ArcGIS encoding: 1=E,2=SE,4=S,8=SW,16=W,32=NW,64=N,128=NE
_ARCGIS_TO_D8 = np.full(256, D8_NODATA, dtype=np.int8)
for _code, _d8 in ((1, 0), (2, 1), (4, 2), (8, 3), (16, 4), (32, 5), (64, 6), (128, 7)):
    _ARCGIS_TO_D8[_code] = _d8


def haversine_ref(lat0, lat1, lon0, lon1):
    """Reference-exact haversine (terrain_tools.py:14-23 argument order)."""
    dlat = np.deg2rad(np.asarray(lat1, np.float64) - lat0)
    dlon = np.deg2rad(np.asarray(lon1, np.float64) - lon0)
    rl0 = np.deg2rad(np.asarray(lat0, np.float64))
    rl1 = np.deg2rad(np.asarray(lat1, np.float64))
    a = np.sin(dlat / 2) ** 2 + np.cos(rl0) * np.cos(rl1) * np.sin(dlon / 2) ** 2
    return HAVERSINE_RADIUS * 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))


def cell_geometry(minx, miny, maxx, maxy, nx, ny):
    """(dx, dy, area)[ny, nx] float32 for a lon/lat-gridded tile — the
    calculate_area semantics. Note the reference's meshgrid(lats, lons)
    yields arrays indexed [lon, lat]; we produce [row=lat, col=lon] and
    match values per cell."""
    lats = np.linspace(miny, maxy, ny + 1)
    lons = np.linspace(minx, maxx, nx + 1)
    # midpoint latitudes of each cell (the reference averages the two corner
    # lat rows, which equals the cell's mid latitude on a uniform grid)
    midlat = (lats[:-1] + lats[1:]) / 2.0
    dx = haversine_ref(midlat[:, None], midlat[:, None], lons[None, :-1], lons[None, 1:])
    dy = haversine_ref(lats[:-1, None], lats[1:, None], (lons[None, :-1] + lons[None, 1:]) / 2.0, (lons[None, :-1] + lons[None, 1:]) / 2.0)
    return dx.astype(np.float32), dy.astype(np.float32), (dx * dy).astype(np.float32)


def normalize(values: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Min-max normalize, NaN-preserving; degenerate range -> 0."""
    v = np.asarray(values, dtype=np.float64)
    if vmax == vmin:
        out = np.where(np.isnan(v), np.nan, 0.0)
        return out
    return (v - vmin) / (vmax - vmin)


def normalize_stage(ds, col: str, out_col: str | None = None):
    """Two-phase distributed normalize: global Min/Max aggregate (tiny
    shuffle) -> broadcast -> vectorized map_batches."""
    import pyarrow as pa
    from ray.data.aggregate import Max, Min

    res = ds.aggregate(Min(col), Max(col))
    vmin, vmax = res[f"min({col})"], res[f"max({col})"]
    out = out_col or f"{col}_norm"

    def apply(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        return batch.append_column(out, pa.array(normalize(v, vmin, vmax), type=pa.float64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def frelief(x, a, b):
    return 1 - (1 - x**a) ** b


def frelief_inv(y, a, b):
    return (1 - (1 - y) ** (1 / b)) ** (1 / a)


def fwidth(x, a):
    return 1 + a * x


def fslope(x, a, b):
    return a + b * x


def arcgis_to_d8(codes: np.ndarray) -> np.ndarray:
    """Vectorized ArcGIS power-of-2 fdir -> compact D8 code (0..7, -1 =
    nodata). Replaces the reference's double Python loop
    (terrain_tools.py:1669-1695) with one table lookup."""
    c = np.asarray(codes)
    c = np.where((c >= 0) & (c <= 255), c, 0).astype(np.int64)
    return _ARCGIS_TO_D8[c]


def d8_downstream(i, j, d8):
    """Downstream (i, j) for compact D8 codes; nodata passes through."""
    d8 = np.asarray(d8)
    valid = d8 >= 0
    k = np.where(valid, d8, 0)
    return (
        np.where(valid, i + D8_DI[k], -1),
        np.where(valid, j + D8_DJ[k], -1),
    )
