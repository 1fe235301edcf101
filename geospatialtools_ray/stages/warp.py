"""Distributed raster reprojection (the `gdalwarp` twin).

The reference reprojects vectors (`gdal_tools.py:188`, ogr2ogr -t_srs)
and samples rasters at points (`gdal_tools.py:9-34`, nearest cell by
inverse geotransform); warping a raster BETWEEN grids composes the two:
for every destination cell, inverse-project its center into the source
CRS and nearest-cell sample the source grid. This stage runs that
composition as a Ray Data pipeline over destination ROW CHUNKS:

    rd.range(dst_ny) -> map_batches(WarpNearest)  # one output row per cell

- the source grid is broadcast ONCE (ray.put) and read zero-copy by every
  task (the polygon-index convention) — right whenever the source fits a
  worker heap (it is one raster LAYER, not the corpus);
- the scale path for planetary sources is the tiled variant: key dst
  chunks by the src tile their footprint covers (forward-project the dst
  chunk bbox), hash-join dst chunks to src tiles, sample inside the join
  task — same kernel, shuffle instead of broadcast (documented, not
  needed at the bench sizes);
- nearest-neighbor only (the reference's sampling rule,
  stages/knn.nearest_cell_sample); bilinear would be one gather+lerp more.

Destination grid spec: (crs, x0, y0, resx, resy, nx, ny) with cell
centers at (x0 + (ix+0.5)*resx, y0 + (iy+0.5)*resy) — resy may be
negative for north-up rasters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import crs as _crs
from .knn import nearest_cell_sample


def bilinear_sample(lon, lat, grid: np.ndarray, gt, undef: float = np.nan) -> np.ndarray:
    """Bilinear interpolation at cell-CENTER anchors (gdalwarp -r bilinear
    semantics): sample coordinates between the four surrounding cell
    centers blend with the fractional distances; points beyond the
    outermost center ring clamp to the edge cell pair (so the valid
    footprint matches nearest's), fully outside -> undef."""
    gt = np.asarray(gt, dtype=np.float64)
    ny, nx = grid.shape
    fx = (lon - (gt[0] + gt[1] / 2.0)) / gt[1]
    fy = (lat - (gt[3] + gt[5] / 2.0)) / gt[5]
    ok = (fx >= -0.5) & (fx <= nx - 0.5) & (fy >= -0.5) & (fy <= ny - 0.5)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, nx - 1)
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, ny - 1)
    x1 = np.minimum(x0 + 1, nx - 1)
    y1 = np.minimum(y0 + 1, ny - 1)
    wx = np.clip(fx - x0, 0.0, 1.0)
    wy = np.clip(fy - y0, 0.0, 1.0)
    v = (
        grid[y0, x0] * (1.0 - wx) * (1.0 - wy)
        + grid[y0, x1] * wx * (1.0 - wy)
        + grid[y1, x0] * (1.0 - wx) * wy
        + grid[y1, x1] * wx * wy
    )
    out = np.full(len(lon), undef, dtype=np.float64)
    out[ok] = v[ok]
    return out


class WarpNearest:
    """Actor/task callable: batches of dst row indices -> (iy, ix, value)
    rows. Construct with a ray.ObjectRef of (src_grid, src_gt) or the
    plain pair for tests. mode: 'nearest' (default, the reference's
    sampling rule) or 'bilinear'."""

    def __init__(self, src_ref, dst_spec: dict, src_crs: str, undef: float = np.nan,
                 mode: str = "nearest"):
        import ray

        src = ray.get(src_ref) if hasattr(src_ref, "hex") else src_ref
        self.grid, self.gt = src
        self.spec = dst_spec
        self.src_crs = src_crs
        self.undef = undef
        if mode not in ("nearest", "bilinear"):
            raise ValueError(f"mode must be 'nearest' or 'bilinear', got {mode!r}")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        iy = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = self.spec
        nx = int(s["nx"])
        # all cells of these rows, vectorized: (len(iy) * nx) points
        ix = np.tile(np.arange(nx, dtype=np.int64), len(iy))
        ry = np.repeat(iy, nx)
        dx = s["x0"] + (ix + 0.5) * s["resx"]
        dy = s["y0"] + (ry + 0.5) * s["resy"]
        lon, lat = _crs.transform(dx, dy, s["crs"], self.src_crs)
        if self.mode == "bilinear":
            v = bilinear_sample(lon, lat, self.grid, self.gt, undef=self.undef)
        else:
            v = nearest_cell_sample(lon, lat, self.grid, self.gt, undef=self.undef)
        return pa.table(
            {
                "iy": pa.array(ry, type=pa.int64()),
                "ix": pa.array(ix, type=pa.int64()),
                "value": pa.array(v, type=pa.float64()),
            }
        )


def warp_nearest(src_grid: np.ndarray, src_gt, src_crs: str, dst_spec: dict,
                 undef: float = np.nan, concurrency=(1, 8), mode: str = "nearest"):
    """Dataset of (iy, ix, value) covering the destination grid."""
    import ray
    import ray.data as rd

    src_ref = ray.put((np.ascontiguousarray(src_grid), tuple(src_gt)))
    ny = int(dst_spec["ny"])
    return rd.range(ny, override_num_blocks=max(min(ny // 16, 64), 1)).map_batches(
        WarpNearest,
        fn_constructor_kwargs={"src_ref": src_ref, "dst_spec": dst_spec, "src_crs": src_crs,
                               "undef": undef, "mode": mode},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
