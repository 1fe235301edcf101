"""Hierarchical lat/lon cell index ("geocell") — the engine's partition key.

Stand-in for H3/S2 (neither library is available in this environment): an
equal-angle quadtree over the WGS84 lon/lat rectangle. At resolution ``r``
the globe is divided into ``2**(r+1)`` columns (360 deg of longitude) and
``2**r`` rows (180 deg of latitude), so cells are square in degrees
(``180 / 2**r`` per side). Cell ids pack ``(resolution, iy, ix)`` into a
single uint64, giving H3-like properties the engine relies on:

- vectorized point -> cell assignment (numpy, no Python loop),
- parent/child hierarchy by bit shifts,
- k-ring neighborhoods (with longitude wrap) for kNN search,
- bbox covers for polygon indexing (the spatial-join partition key).

This replaces the reference's implicit "partitioning" (whole-raster arrays,
``libraries/gdal_tools.py:60-115``) with an explicit, skew-manageable key.

Packing (uint64): bits 58..62 = resolution, bits 29..57 = iy, bits 0..28
= ix. ix needs res+1 bits (2**(res+1) columns) and iy needs res bits, so
the deepest representable resolution is 28 (~1e-6 deg, ~10 cm cells —
far below any partition granularity the engine uses); pack() asserts the
bound rather than silently leaking ix's high bit into iy.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28
_RES_SHIFT = np.uint64(58)
_IY_SHIFT = np.uint64(29)
_IX_MASK = np.uint64((1 << 29) - 1)
_IY_MASK = np.uint64((1 << 29) - 1)


def ncells(res: int) -> tuple[int, int]:
    """(n_cols, n_rows) of the grid at resolution ``res``."""
    return 2 ** (res + 1), 2**res


def cell_size_deg(res: int) -> float:
    """Cell edge length in degrees at resolution ``res``."""
    return 180.0 / (2**res)


def pack(res, iy, ix):
    res = np.asarray(res, dtype=np.uint64)
    if res.size and int(res.max()) > MAX_RES:
        raise ValueError(f"geocell resolution {int(res.max())} exceeds MAX_RES={MAX_RES}")
    iy = np.asarray(iy, dtype=np.uint64)
    ix = np.asarray(ix, dtype=np.uint64)
    return (res << _RES_SHIFT) | (iy << _IY_SHIFT) | ix


def unpack(cell):
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> _RES_SHIFT).astype(np.int64)
    iy = ((cell >> _IY_SHIFT) & _IY_MASK).astype(np.int64)
    ix = (cell & _IX_MASK).astype(np.int64)
    return res, iy, ix


def cell_of(lon, lat, res: int):
    """Vectorized point -> cell id. Points outside [-180,180]x[-90,90] are
    clamped (the reference clamps out-of-bounds station reads to undef at
    ``libraries/gdal_tools.py:29-30``; callers that need strict bounds
    filter first)."""
    nx, ny = ncells(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    # atleast_1d: np.clip(..., out=) needs a writable ndarray — scalar
    # inputs otherwise crash instead of clamping
    ix = np.atleast_1d(np.floor((lon + 180.0) / 360.0 * nx).astype(np.int64))
    iy = np.atleast_1d(np.floor((lat + 90.0) / 180.0 * ny).astype(np.int64))
    np.clip(ix, 0, nx - 1, out=ix)
    np.clip(iy, 0, ny - 1, out=iy)
    out = pack(res, iy, ix)
    return out if np.ndim(lon) or np.ndim(lat) else out[0]


def cell_center(cell):
    res, iy, ix = unpack(cell)
    step = 180.0 / (2.0**res)
    lon = -180.0 + (ix + 0.5) * step
    lat = -90.0 + (iy + 0.5) * step
    return lon, lat


def cell_bounds(cell):
    """(lon0, lat0, lon1, lat1) of each cell."""
    res, iy, ix = unpack(cell)
    step = 180.0 / (2.0**res)
    lon0 = -180.0 + ix * step
    lat0 = -90.0 + iy * step
    return lon0, lat0, lon0 + step, lat0 + step


def parent(cell, parent_res: int):
    res, iy, ix = unpack(cell)
    shift = (res - parent_res).astype(np.uint64)
    return pack(parent_res, np.asarray(iy, np.uint64) >> shift, np.asarray(ix, np.uint64) >> shift)


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` (scalar), with
    longitude wrap-around; latitude rows are clipped at the poles. Used by
    the kNN station search (ring expansion, SURVEY.md section 2.4)."""
    res, iy, ix = unpack(np.uint64(cell))
    res, iy, ix = int(res), int(iy), int(ix)
    nx, ny = ncells(res)
    dys, dxs = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    iys = iy + dys.ravel()
    ixs = (ix + dxs.ravel()) % nx
    ok = (iys >= 0) & (iys < ny)
    # unique: when 2k+1 > nx the longitude wrap revisits columns; duplicate
    # cells would let one station occupy two candidate slots in kNN search
    return np.unique(pack(np.full(ok.sum(), res), iys[ok], ixs[ok]))


def ring_shell(cell: int, k: int) -> np.ndarray:
    """Only the cells at exactly Chebyshev distance k (the ring border)."""
    if k == 0:
        return np.asarray([np.uint64(cell)], dtype=np.uint64)
    full = k_ring(cell, k)
    inner = set(k_ring(cell, k - 1).tolist())
    return np.asarray([c for c in full.tolist() if c not in inner], dtype=np.uint64)


def cover_bbox(lon0: float, lat0: float, lon1: float, lat1: float, res: int) -> np.ndarray:
    """All cells intersecting the bbox — the polygon h3_cover equivalent
    (SURVEY.md section 1.2 `polygons.h3_cover`). No longitude wrap (input
    geometries are synthesized within bounds)."""
    nx, ny = ncells(res)
    ix0 = max(0, int(np.floor((lon0 + 180.0) / 360.0 * nx)))
    ix1 = min(nx - 1, int(np.floor((lon1 + 180.0) / 360.0 * nx)))
    iy0 = max(0, int(np.floor((lat0 + 90.0) / 180.0 * ny)))
    iy1 = min(ny - 1, int(np.floor((lat1 + 90.0) / 180.0 * ny)))
    if ix1 < ix0 or iy1 < iy0:
        return np.empty(0, dtype=np.uint64)
    ixs, iys = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    return pack(np.full(ixs.size, res), iys.ravel(), ixs.ravel())


def cover_rect_adaptive(
    lon0: float, lat0: float, lon1: float, lat1: float, res_min: int, res_max: int
) -> tuple[np.ndarray, np.ndarray]:
    """S2-RegionCoverer-style multi-resolution cover of the HALF-OPEN
    rectangle [lon0, lon1) x [lat0, lat1): interior cells at the coarsest
    resolution where they are fully contained, boundary cells at res_max.

    Declarative membership rule (shared verbatim with the SQL oracle —
    every cell decides independently, no recursion state): cell c at
    resolution r, res_min <= r <= res_max, is in the cover iff
      1. c intersects the rect (max(starts) < min(ends), half-open), and
      2. r == res_min OR parent(c) is NOT fully inside the rect, and
      3. c is fully inside (kind=1 interior)
         OR r == res_max (kind=0 boundary).
    Cells that intersect but are neither fully inside nor at res_max are
    refined by their children instead.

    Properties (tested): the interior cells of one cover form an antichain
    (no cell is an ancestor of another), every rect point lands in exactly
    ONE cover cell path, and points in interior cells need NO exact
    geometry test — the join-acceleration contract.

    Returns (cells uint64, kinds int8: 1=interior, 0=boundary).
    """
    out_cells: list[np.ndarray] = []
    out_kinds: list[np.ndarray] = []
    if lon1 <= lon0 or lat1 <= lat0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int8)
    for r in range(res_min, res_max + 1):
        size = 180.0 / (1 << r)
        nx, ny = ncells(r)
        ix0 = max(0, int(np.floor((lon0 + 180.0) / size)))
        ix1 = min(nx, int(np.ceil((lon1 + 180.0) / size)))
        iy0 = max(0, int(np.floor((lat0 + 90.0) / size)))
        iy1 = min(ny, int(np.ceil((lat1 + 90.0) / size)))
        if ix1 <= ix0 or iy1 <= iy0:
            continue
        IX, IY = np.meshgrid(np.arange(ix0, ix1, dtype=np.int64), np.arange(iy0, iy1, dtype=np.int64))
        ix, iy = IX.ravel(), IY.ravel()
        clon0 = -180.0 + ix * size
        clat0 = -90.0 + iy * size
        full = (clon0 >= lon0) & (clon0 + size <= lon1) & (clat0 >= lat0) & (clat0 + size <= lat1)
        if r > res_min:
            psize = 2.0 * size
            plon0 = -180.0 + (ix >> 1) * psize
            plat0 = -90.0 + (iy >> 1) * psize
            pfull = (
                (plon0 >= lon0) & (plon0 + psize <= lon1) & (plat0 >= lat0) & (plat0 + psize <= lat1)
            )
        else:
            pfull = np.zeros(len(ix), dtype=bool)
        emit = ~pfull & (full | (r == res_max))
        if emit.any():
            out_cells.append(pack(np.full(int(emit.sum()), r), iy[emit], ix[emit]))
            out_kinds.append(full[emit].astype(np.int8))
    if not out_cells:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int8)
    return np.concatenate(out_cells), np.concatenate(out_kinds)


def cell_of_compact(lon, lat, res: int) -> np.ndarray:
    """u32 row-major cell index (iy * nx + ix) at `res` — the narrow-bytes
    shuffle variant of `cell_of` (4 bytes/row instead of the packed u64;
    the resolution travels in the caller's head, not the value). Fits u32
    for every res <= 14 (nx*ny = 2^(2res+1))."""
    nx, ny = ncells(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.atleast_1d(np.floor((lon + 180.0) / 360.0 * nx).astype(np.int64))
    iy = np.atleast_1d(np.floor((lat + 90.0) / 180.0 * ny).astype(np.int64))
    np.clip(ix, 0, nx - 1, out=ix)
    np.clip(iy, 0, ny - 1, out=iy)
    return (iy * nx + ix).astype(np.uint32)


def compact_parent(cells: np.ndarray, res: int, part_res: int):
    """(packed_parent_u64, compact_parent_u32) of compact u32 cells: the
    packed form keys the salt map (estimate_salts emits packed parents),
    the compact form builds the narrow u32 partition key."""
    nx, _ = ncells(res)
    iy = cells.astype(np.int64) // nx
    ix = cells.astype(np.int64) % nx
    shift = res - part_res
    piy, pix = iy >> shift, ix >> shift
    nxp, _ = ncells(part_res)
    return pack(part_res, piy, pix), (piy * nxp + pix).astype(np.uint32)
