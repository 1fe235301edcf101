"""Polygon x point spatial join — the engine's rasterization core.

Replaces the reference's `shapefile2raster` (libraries/gdal_tools.py:170-192),
which shells out to `ogr2ogr` (clip/reproject) and `gdal_rasterize -init
-9999 -a field` (burn). Here it is a native Ray Data stage:

- polygons are indexed once per actor (`PolygonIndex` built in `__init__` of
  the `SpatialJoin` callable — the "STRtree/H3 index actor pool" of
  BASELINE.json north_star): geocell cover -> candidate lists + bbox filter
  + vectorized even-odd point-in-polygon,
- points stream through `map_batches(SpatialJoin, concurrency=...)` in
  zero-copy Arrow batches,
- burn semantics (`burn_batch`): last-write-wins by ascending poly_id,
  matching deterministic GDAL layer order; background (no polygon) = null
  (the reference's -init -9999).

The polygon side is the SMALL side (10^3-10^6 polygons vs 10^12 docs) so it
is broadcast via `ray.put` once and shared read-only by every actor — never
a shuffle join, never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import geocell, wkb


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd rule over all rings (handles holes). Returns a
    bool mask over the points. O(npts * nedges) numpy broadcasting."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        py_c = py[:, None]
        crosses = (y0 <= py_c) != (y1 <= py_c)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (py_c - y0) * (x1 - x0) / (y1 - y0)
        hits = (crosses & (px[:, None] < xint)).sum(axis=1)
        inside ^= (hits % 2).astype(bool)
    return inside


class PolygonIndex:
    """Geocell-bucketed polygon index (compiled once per actor).

    cell -> candidate poly ids; bbox prefilter; exact PIP refine. The
    numpy-native equivalent of an STRtree for this workload, with the index
    key shared with the dataset partitioning (the spatial-join equi-join key
    of SURVEY.md section 2.4)."""

    def __init__(self, poly_ids, wkbs, bboxes, field_values, cover_res: int,
                 src_crs: str = "lonlat"):
        self.cover_res = cover_res
        self.poly_ids = np.asarray(poly_ids, dtype=np.int64)
        self.field_values = np.asarray(field_values, dtype=np.float64)
        self.bboxes = np.asarray(bboxes, dtype=np.float64).reshape(len(self.poly_ids), 4)
        self.rings = [wkb.parse_polygon(b) for b in wkbs]
        if src_crs not in ("lonlat", "epsg:4326", "wgs84"):
            # the reference reprojects the vector layer BEFORE rasterizing
            # (gdal_tools.py:188: `ogr2ogr ... -t_srs proj4`); the engine
            # equivalent is a one-time vertex transform at index build —
            # O(total vertices) on the SMALL broadcast side, never per batch
            from ..functions import crs as _crs

            self.rings = [
                [np.column_stack(_crs.to_lonlat(r[:, 0], r[:, 1], src_crs)) for r in rings]
                for rings in self.rings
            ]
            self.bboxes = np.array(
                [
                    [
                        min(r[:, 0].min() for r in rings),
                        min(r[:, 1].min() for r in rings),
                        max(r[:, 0].max() for r in rings),
                        max(r[:, 1].max() for r in rings),
                    ]
                    if rings
                    else [0.0, 0.0, 0.0, 0.0]
                    for rings in self.rings
                ],
                dtype=np.float64,
            ).reshape(len(self.poly_ids), 4)
        # internal bucket resolution matched to polygon size: with buckets
        # at the JOIN resolution (cover_res, ~2.8 deg at 6) and ~0.3 deg
        # polygons, hotspot buckets held 341 polygons and a 45k-point batch
        # generated 6.5M candidate pairs (144/point). Sizing bucket cells
        # to the median polygon bbox cuts candidates to near the true
        # overlap density; query() computes its own cells at this
        # resolution, so nothing outside the index changes.
        if len(self.poly_ids):
            size = float(np.median(np.maximum(self.bboxes[:, 2] - self.bboxes[:, 0],
                                              self.bboxes[:, 3] - self.bboxes[:, 1])))
        else:
            size = 0.0
        fit = int(np.floor(np.log2(180.0 / max(size, 1e-6))))
        self.bucket_res = int(np.clip(fit, cover_res, cover_res + 6))
        buckets: dict[int, list[int]] = {}
        for i, bb in enumerate(self.bboxes):
            for c in geocell.cover_bbox(bb[0], bb[1], bb[2], bb[3], self.bucket_res).tolist():
                buckets.setdefault(c, []).append(i)
        self.buckets = {c: np.asarray(v, dtype=np.int64) for c, v in buckets.items()}
        # flat CSR of CLOSED edges across every ring of every polygon —
        # lets query() run ONE vectorized crossing test over all
        # (pair, edge) rows instead of a numpy call per candidate polygon
        # (profiled: per-call overhead dominated at ~6.6 edges/polygon).
        # Even-odd parity over the concatenated rings equals the per-ring
        # XOR (parity of a sum is the XOR of parities).
        ex0, ey0, ex1, ey1 = [], [], [], []
        eoff = np.zeros(len(self.rings) + 1, dtype=np.int64)
        for i, rings in enumerate(self.rings):
            n = 0
            for ring in rings:
                r = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
                ex0.append(r[:-1, 0])
                ey0.append(r[:-1, 1])
                ex1.append(r[1:, 0])
                ey1.append(r[1:, 1])
                n += len(r) - 1
            eoff[i + 1] = eoff[i] + n
        self.eoff = eoff
        self.ex0 = np.concatenate(ex0) if ex0 else np.empty(0)
        self.ey0 = np.concatenate(ey0) if ey0 else np.empty(0)
        self.ex1 = np.concatenate(ex1) if ex1 else np.empty(0)
        self.ey1 = np.concatenate(ey1) if ey1 else np.empty(0)

    @classmethod
    def from_synth(cls, layer: dict, cover_res: int, src_crs: str = "lonlat") -> "PolygonIndex":
        return cls(layer["poly_id"], layer["geom_wkb"], layer["bbox"], layer["field_value"],
                   cover_res, src_crs=src_crs)

    def query(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_index, polygon_index) containment pairs for a point
        batch. Candidates gathered per DISTINCT bucket cell (size-matched
        buckets keep the volume near the true overlap density); per
        candidate polygon: scalar bbox filter + one broadcast even-odd
        crossing test over its precomputed CLOSED edge slice — streaming
        access only (fancy gathers measured 10x slower than broadcasts on
        this DRAM-bound host). Boundary convention matches
        points_in_polygon; pair order is a set — every consumer lexsorts."""
        if len(lon) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        cells = geocell.cell_of(lon, lat, self.bucket_res)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.r_[starts[1:], len(sc)]
        cand_pts: dict[int, list[np.ndarray]] = {}
        for s, e in zip(starts, ends):
            plist = self.buckets.get(int(sc[s]))
            if plist is None:
                continue
            pts = order[s:e]
            for pi in plist.tolist():
                cand_pts.setdefault(pi, []).append(pts)
        out_pt, out_poly = [], []
        for pi, chunks in cand_pts.items():
            pts = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
            b0, b1, b2, b3 = self.bboxes[pi]
            px = lon[pts]
            py = lat[pts]
            m = (px >= b0) & (px <= b2) & (py >= b1) & (py <= b3)
            pts = pts[m]
            if len(pts) == 0:
                continue
            px, py = px[m], py[m]
            s0, s1 = self.eoff[pi], self.eoff[pi + 1]
            x0, y0 = self.ex0[s0:s1], self.ey0[s0:s1]
            x1, y1 = self.ex1[s0:s1], self.ey1[s0:s1]
            pyc = py[:, None]
            crosses = (y0 <= pyc) != (y1 <= pyc)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x0 + (pyc - y0) * (x1 - x0) / (y1 - y0)
            hits = (crosses & (px[:, None] < xint)).sum(axis=1)
            hit = pts[(hits & 1).astype(bool)]
            if len(hit):
                out_pt.append(hit)
                out_poly.append(np.full(len(hit), pi, dtype=np.int64))
        if not out_pt:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_pt), np.concatenate(out_poly)


class SpatialJoin:
    """Actor-pool stage: inner-join point batches against the broadcast
    polygon layer. Use with
    `ds.map_batches(SpatialJoin, fn_constructor_kwargs=..., concurrency=N,
    batch_format="pyarrow")`.

    `index_ref` is a `ray.ObjectRef` to a prebuilt PolygonIndex (ray.put
    once on the driver) or a plain PolygonIndex for tests."""

    def __init__(self, index_ref, mode: str = "inner"):
        import ray

        self.index = ray.get(index_ref) if hasattr(index_ref, "hex") else index_ref
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_table(self.index, self.mode, batch)


def _join_table(index: PolygonIndex, mode: str, batch: pa.Table,
                narrow: bool = False) -> pa.Table:
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    pt_idx, poly_pos = index.query(lon, lat)
    if mode == "semi":  # docs that fall in ANY polygon
        keep = np.unique(pt_idx)
        return batch.take(pa.array(keep))
    if mode == "anti":  # background docs (the -init -9999 side)
        keep = np.setdiff1d(np.arange(len(lon)), pt_idx)
        return batch.take(pa.array(keep))
    # inner: one output row per containment pair, deterministic order
    order = np.lexsort((index.poly_ids[poly_pos], pt_idx))
    pt_idx, poly_pos = pt_idx[order], poly_pos[order]
    out = batch.take(pa.array(pt_idx))
    if narrow:
        # narrow-bytes fan-out: i32 ids + f32 attribute through the
        # post-join stages (the join multiplies rows, so these columns
        # dominate downstream traffic); loud guard on the id width
        ids = index.poly_ids[poly_pos]
        if len(ids) and ids.max() >= (1 << 31):
            raise ValueError("narrow join output needs poly_id < 2^31")
        out = out.append_column("poly_id", pa.array(ids.astype(np.int32), type=pa.int32()))
        out = out.append_column(
            "field_value",
            pa.array(index.field_values[poly_pos].astype(np.float32), type=pa.float32()),
        )
        return out
    out = out.append_column("poly_id", pa.array(index.poly_ids[poly_pos], type=pa.int64()))
    out = out.append_column(
        "field_value", pa.array(index.field_values[poly_pos], type=pa.float64())
    )
    return out


_INDEX_CACHE: dict = {}


def _cached_index(index_ref):
    """Per-worker-process deserialization cache: the broadcast index is
    fetched from the object store once per process, not once per task —
    this lets the join run as stateless TASKS (no actor-pool startup tax)
    while keeping the amortized state of an actor pool."""
    if hasattr(index_ref, "hex"):
        key = index_ref.hex()
        idx = _INDEX_CACHE.get(key)
        if idx is None:
            import ray

            idx = ray.get(index_ref)
            _INDEX_CACHE.clear()
            _INDEX_CACHE[key] = idx
        return idx
    return index_ref


def join_batch(batch: pa.Table, *, index_ref, mode: str = "inner",
               narrow: bool = False) -> pa.Table:
    """Stateless-task twin of SpatialJoin (same semantics)."""
    return _join_table(_cached_index(index_ref), mode, batch, narrow=narrow)


def burn_batch(index: PolygonIndex, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Rasterize-burn semantics for a batch of cell centers: the
    `field_value` of the LAST polygon (highest poly_id) containing each
    point, NaN where none — gdal_rasterize `-init -9999 -a field` with
    deterministic ascending-id layer order (libraries/gdal_tools.py:189)."""
    pt_idx, poly_pos = index.query(lon, lat)
    out = np.full(len(lon), np.nan)
    if len(pt_idx):
        order = np.lexsort((index.poly_ids[poly_pos], pt_idx))  # ascending id within point
        out[pt_idx[order]] = index.field_values[poly_pos[order]]  # later writes win
    return out
