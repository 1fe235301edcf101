"""Station/point sampling and kNN assignment.

Reference semantics: `extract_point_data` (libraries/gdal_tools.py:9-34) —
nearest-cell lookup by inverse geotransform with round-to-nearest cell
centers (:19-20) and undef for out-of-bounds points (:29-30); its GrADS twin
(libraries/grads_tools.py:6-21). The kNN generalization (BASELINE.json
north_star "kNN station-to-grid assignment") finds the k nearest stations
for each doc/grid point, ties broken by (distance, station_id) for
determinism.

Two execution strategies:
- `KNNBroadcast` (default): stations are the SMALL side — a numpy array
  broadcast once via ray.put, each batch does one vectorized distance
  matrix + argpartition. No shuffle. Right up to ~10^5 stations.
- cell-ring search (`knn_ring_search`): for large station sets, stations
  are bucketed by geocell; each point expands k-rings around its cell until
  k candidates are guaranteed nearer than the next unexplored ring. Shares
  the partition key with every other stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import geocell

EARTH_RADIUS_M = 6371e3


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters — STANDARD haversine (R=6371 km,
    arcsin form), used for the engine's own kNN ranking where any monotone
    great-circle metric gives the same neighbor order. NOT the
    reference-exact `calculate_distance` twin: that is
    `functions.geometry.haversine_ref` (R=6,372,800 m, atan2 form,
    terrain_tools.py:14-23 argument order) — use it when a value must
    match the reference bit-for-bit."""
    rlon1, rlat1, rlon2, rlat2 = map(np.radians, (lon1, lat1, lon2, lat2))
    dlon = rlon2 - rlon1
    dlat = rlat2 - rlat1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return EARTH_RADIUS_M * 2.0 * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


class KNNBroadcast:
    """Actor-pool stage: k nearest stations per point (haversine), ties by
    (distance, station_id). Output: one row per (point, rank)."""

    def __init__(self, stations_ref, k: int = 1, metric: str = "haversine"):
        import ray

        st = ray.get(stations_ref) if hasattr(stations_ref, "hex") else stations_ref
        self.sid = np.asarray(st["station_id"], dtype=np.int64)
        self.slon = np.asarray(st["lon"], dtype=np.float64)
        self.slat = np.asarray(st["lat"], dtype=np.float64)
        self.k = k
        self.metric = metric

    def _dists(self, lon, lat):
        if self.metric == "haversine":
            return haversine_m(lon[:, None], lat[:, None], self.slon[None, :], self.slat[None, :])
        dx = lon[:, None] - self.slon[None, :]
        dy = lat[:, None] - self.slat[None, :]
        return dx * dx + dy * dy

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        n, k = len(lon), min(self.k, len(self.sid))
        if n == 0 or k == 0:
            empty = pa.table(
                {
                    **{c: batch[c].slice(0, 0) for c in batch.column_names},
                    "knn_rank": pa.array([], type=pa.int32()),
                    "station_id": pa.array([], type=pa.int64()),
                    "station_dist": pa.array([], type=pa.float64()),
                }
            )
            return empty
        d = self._dists(lon, lat)
        # deterministic tie-break: lexsort by (station_id) then stable sort by dist
        part = np.argpartition(d, k - 1, axis=1)[:, :k] if k < len(self.sid) else np.tile(np.arange(len(self.sid)), (n, 1))
        dp = np.take_along_axis(d, part, axis=1)
        sidp = self.sid[part]
        order = np.lexsort((sidp, dp), axis=1)[:, :k]
        top_sid = np.take_along_axis(sidp, order, axis=1)
        top_d = np.take_along_axis(dp, order, axis=1)
        rep = pa.array(np.repeat(np.arange(n), k))
        out = batch.take(rep)
        out = out.append_column("knn_rank", pa.array(np.tile(np.arange(k, dtype=np.int32), n)))
        out = out.append_column("station_id", pa.array(top_sid.ravel(), type=pa.int64()))
        out = out.append_column("station_dist", pa.array(top_d.ravel(), type=pa.float64()))
        return out


def nearest_cell_sample(
    lon: np.ndarray,
    lat: np.ndarray,
    grid: np.ndarray,
    gt: tuple[float, float, float, float, float, float],
    undef: float = np.nan,
) -> np.ndarray:
    """Exact reference nearest-cell sampling (libraries/gdal_tools.py:9-34):
    ilon = round((lon - (gt0 + gt1/2)) / gt1), out-of-bounds -> undef.
    Vectorized over all points (the reference loops per point, :26-32)."""
    gt = np.asarray(gt, dtype=np.float64)
    ny, nx = grid.shape
    ilon = np.round((lon - (gt[0] + gt[1] / 2.0)) / gt[1]).astype(np.int64)
    ilat = np.round((lat - (gt[3] + gt[5] / 2.0)) / gt[5]).astype(np.int64)
    ok = (ilon >= 0) & (ilon < nx) & (ilat >= 0) & (ilat < ny)
    out = np.full(len(lon), undef, dtype=np.float64)
    out[ok] = grid[ilat[ok], ilon[ok]]
    return out


def knn_ring_search(lon, lat, stations: dict, k: int, res: int):
    """Scale path for large station sets: geocell-bucketed ring expansion.
    Correctness guarantee: expand rings until the nearest UNSEEN ring's
    minimum possible distance exceeds the current k-th best; ties broken by
    (distance, station_id). Single-node helper used inside map_batches after
    partitioning points by cell (stations bucketed once per actor).

    A vectorized fast path resolves whole point-cells against their 2-ring
    candidate sets in one haversine matrix; only points whose bound is not
    met (sparse or high-latitude cells) fall to the exact per-point
    expansion. Pick `res` so a 2-ring holds >= k stations on average
    (coarser res = bigger fast-path hit rate; measured 2x per res step)."""
    sid = np.asarray(stations["station_id"], dtype=np.int64)
    slon = np.asarray(stations["lon"], dtype=np.float64)
    slat = np.asarray(stations["lat"], dtype=np.float64)
    scell = geocell.cell_of(slon, slat, res)
    buckets: dict[int, np.ndarray] = {}
    order = np.argsort(scell, kind="stable")
    sc = scell[order]
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    for s, e in zip(starts, np.r_[starts[1:], len(sc)]):
        buckets[int(sc[s])] = order[s:e]

    cell_deg = geocell.cell_size_deg(res)
    out_pt, out_rank, out_sid, out_dist = [], [], [], []
    pcell = geocell.cell_of(lon, lat, res)
    _, ny_cells = geocell.ncells(res)

    # FAST PATH (vectorized): for each DISTINCT point cell, gather the
    # 2-ring candidate set once and resolve every point in that cell with
    # one haversine matrix; points whose correctness bound is not satisfied
    # by 2 rings fall through to the exact per-point expansion below.
    pending = np.ones(len(lon), dtype=bool)
    order = np.argsort(pcell, kind="stable")
    sc = pcell[order]
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    for s, e in zip(starts, np.r_[starts[1:], len(sc)]):
        pts = order[s:e]
        cand_idx = [buckets[int(c)] for c in geocell.k_ring(int(sc[s]), 2).tolist() if int(c) in buckets]
        if not cand_idx:
            continue
        idx = np.concatenate(cand_idx)
        if len(idx) < k:
            continue
        d = haversine_m(lon[pts][:, None], lat[pts][:, None], slon[idx][None, :], slat[idx][None, :])
        o = np.lexsort((np.broadcast_to(sid[idx], d.shape), d), axis=1)[:, :k]
        kth = np.take_along_axis(d, o[:, k - 1 : k], axis=1)[:, 0]
        # bound: stations beyond the explored 2-ring are >= 2 cell-widths
        # away (same conservative cos-scaled estimate as the slow path)
        lat_extent = np.minimum(89.99, np.abs(lat[pts]) + 3 * cell_deg)
        bound = 2 * cell_deg * 110_574.0 * np.cos(np.radians(lat_extent)) * 0.99
        ok = kth <= bound
        for row, good in zip(range(len(pts)), ok):
            if not good:
                continue
            i = pts[row]
            pending[i] = False
            bi = idx[o[row]]
            bd = d[row][o[row]]
            out_pt.extend([i] * k)
            out_rank.extend(range(k))
            out_sid.extend(sid[bi].tolist())
            out_dist.extend(bd.tolist())

    for i in np.flatnonzero(pending):
        cand: list[np.ndarray] = []
        ring = 0
        best = None
        while True:
            shell = geocell.ring_shell(int(pcell[i]), ring)
            for c in shell.tolist():
                b = buckets.get(int(c))
                if b is not None:
                    cand.append(b)
            ncand = sum(len(c) for c in cand)
            # Conservative lower bound on the distance of any station in an
            # UNEXPLORED cell (Chebyshev cell-distance >= ring+1): at least
            # `ring` cell-widths away; longitude convergence makes the
            # lon-only displacement the binding case, scaled by cos of the
            # widest latitude the explored band reaches. Near the poles the
            # bound degrades and we fall back to scanning more rings.
            lat_extent = min(89.99, abs(lat[i]) + (ring + 1) * cell_deg)
            next_min_m = ring * cell_deg * 110_574.0 * np.cos(np.radians(lat_extent)) * 0.99
            exhausted = (2 * ring + 1) >= 2 * ny_cells  # whole globe covered
            if ncand >= k and ring > 0:
                idx = np.concatenate(cand)
                d = haversine_m(lon[i], lat[i], slon[idx], slat[idx])
                o = np.lexsort((sid[idx], d))[:k]
                if d[o[-1]] <= next_min_m or exhausted:
                    best = (idx[o], d[o])
                    break
            elif exhausted:
                idx = np.concatenate(cand) if cand else np.empty(0, np.int64)
                d = haversine_m(lon[i], lat[i], slon[idx], slat[idx]) if len(idx) else np.empty(0)
                o = np.lexsort((sid[idx], d))[: min(k, len(idx))]
                best = (idx[o], d[o])
                break
            ring += 1
        bi, bd = best
        out_pt.extend([i] * len(bi))
        out_rank.extend(range(len(bi)))
        out_sid.extend(sid[bi].tolist())
        out_dist.extend(bd.tolist())
    return (
        np.asarray(out_pt, np.int64),
        np.asarray(out_rank, np.int32),
        np.asarray(out_sid, np.int64),
        np.asarray(out_dist, np.float64),
    )
