"""Single-node terrain kernels with literal reference semantics.

These numpy implementations re-derive — iteratively, never recursively —
the algorithms of /root/reference/src/terrain_tools.f90 and
src/planchon_2001.f90. They serve two roles:
1. The conformance ORACLE for the distributed engine (tests compare the
   tiled/halo implementations against these on whole grids).
2. The per-tile kernels reused inside map_batches where the algorithm is
   tile-local.

Array convention: arrays are indexed [d0, d1] matching the reference's
Fortran (i, j) order (f2py preserves index order); "scan order" means d0
outer, d1 inner, and argmax ties resolve like Fortran maxloc (column-major
first occurrence == our [d0-fastest] first occurrence — implemented
explicitly where it matters).

Missing data uses the reference's -9999 sentinel inside these kernels
(quirks like undef values polluting stencils at mask borders are part of
the semantics); the Arrow boundary converts to nulls.

Deliberately reproduced quirks (each cited):
- D8 diagonal slope length NOT scaled by sqrt(2) (terrain_tools.f90:210-215).
- maxloc/minloc first-occurrence tie-breaks in positions order
  (terrain_tools.f90:222-229).
- channels: global max-accumulation-first seeding and confluence id
  allocation order (terrain_tools.f90:793-820, :1172-1241).
- HAND: shared stale `cd` carries across scan order for drainage paths
  that dead-end (terrain_tools.f90:1678-1724).
- cleanup relabel maps the smallest surviving id to 0
  (terrain_tools.f90:1631-1637).
- channel cells with channeldepth exactly 0 are "transparent"
  (terrain_tools.f90:1715 tests .gt. 0).
"""

from __future__ import annotations

import heapq

import numpy as np

UNDEF = -9999.0
IUNDEF = -9999

# positions order of the reference (terrain_tools.f90:190-198): k over d0,
# l over d1, k-major, skipping (0,0)
POS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
POS_ARR = np.asarray(POS, dtype=np.int64)

# clockwise positions used by the hillslope sweep (terrain_tools.f90:1386-1395)
POS_CW = [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)]


# ---------------------------------------------------------------------------
# Pit filling (Planchon & Darboux 2001) — priority-flood formulation.
# The reference's stage1/stage2 iteration (planchon_2001.f90:15-188)
# converges to the unique fixpoint  w = max(z, min_over_neighbors(w_n) + eps)
# with w fixed to z on boundary cells (grid border or 8-adjacent to undef);
# a priority-flood (Barnes et al. 2014) computes the same fixpoint without
# recursion, so values agree exactly (each w is z or parent w + eps along
# the unique draining path).
# ---------------------------------------------------------------------------

def fill_pits(z: np.ndarray, res: float) -> np.ndarray:
    n0, n1 = z.shape
    eps = np.float32(0.0001 * res)
    z = z.astype(np.float32)
    w = np.full_like(z, np.float32(np.inf))
    valid = z != UNDEF
    w[~valid] = UNDEF
    closed = ~valid
    heap: list[tuple[float, int, int]] = []
    # boundary cells: on the array edge, or 8-adjacent to an undef cell
    # (planchon_2001.f90:160-186 stage1)
    pad = np.pad(valid, 1, constant_values=False)
    interior = np.ones_like(valid)
    for di, dj in POS:
        interior &= pad[1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1]
    boundary = valid & ~interior
    for i, j in zip(*np.nonzero(boundary)):
        w[i, j] = z[i, j]
        heapq.heappush(heap, (float(z[i, j]), int(i), int(j)))
        closed[i, j] = True
    while heap:
        wv, i, j = heapq.heappop(heap)
        if wv > w[i, j]:
            continue  # stale entry
        for di, dj in POS:
            ii, jj = i + di, j + dj
            if ii < 0 or jj < 0 or ii >= n0 or jj >= n1 or closed[ii, jj]:
                continue
            cand = np.float32(max(z[ii, jj], np.float32(w[i, j] + eps)))
            if cand < w[ii, jj]:
                w[ii, jj] = cand
                heapq.heappush(heap, (float(cand), int(ii), int(jj)))
        closed[i, j] = True
    return w


def fill_pits_fixpoint(z: np.ndarray, res: float, max_iter: int = 100000) -> np.ndarray:
    """Reference-shaped brute-force fixpoint solver (slow; used only in
    tests to certify that fill_pits computes the P&D fixpoint)."""
    n0, n1 = z.shape
    eps = np.float32(0.0001 * res)
    z = z.astype(np.float32)
    valid = z != UNDEF
    pad = np.pad(valid, 1, constant_values=False)
    interior = np.ones_like(valid)
    for di, dj in POS:
        interior &= pad[1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1]
    w = np.where(valid, np.float32(np.inf), np.float32(UNDEF))
    w[valid & ~interior] = z[valid & ~interior]
    for _ in range(max_iter):
        nmin = np.full_like(w, np.float32(np.inf))
        wp = np.pad(np.where(valid, w, np.float32(np.inf)), 1, constant_values=np.float32(np.inf))
        for di, dj in POS:
            nmin = np.minimum(nmin, wp[1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1])
        new = np.maximum(z, (nmin + eps).astype(np.float32))
        new[valid & ~interior] = z[valid & ~interior]
        new[~valid] = UNDEF
        if np.array_equal(np.nan_to_num(new, posinf=1e30), np.nan_to_num(w, posinf=1e30)):
            break
        w = new
    return w


# ---------------------------------------------------------------------------
# Slope / aspect (terrain_tools.f90:14-54): 3x3 weighted differences with
# edge clamping; undef NEIGHBOR values deliberately enter the stencil
# (reference semantics); only undef centers are masked out.
# ---------------------------------------------------------------------------

def slope_aspect(dem: np.ndarray, dx: np.ndarray, dy: np.ndarray):
    n0, n1 = dem.shape
    dem = dem.astype(np.float32)

    def clamp_shift(a, di, dj):
        i = np.clip(np.arange(n0) + di, 0, n0 - 1)
        j = np.clip(np.arange(n1) + dj, 0, n1 - 1)
        return a[np.ix_(i, j)]

    d = {(di, dj): clamp_shift(dem, di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)}
    gx = {(di, dj): clamp_shift(dx.astype(np.float32), di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)}
    gy = {(di, dj): clamp_shift(dy.astype(np.float32), di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)}
    # reference i == our d0, j == our d1 (terrain_tools.f90:37-45)
    dzdy = (
        (d[(-1, -1)] + 2 * d[(0, -1)] + d[(1, -1)]) - (d[(-1, 1)] + 2 * d[(0, 1)] + d[(1, 1)])
    ) / (
        (gy[(-1, -1)] + 2 * gy[(0, -1)] + gy[(1, -1)]) + (gy[(-1, 1)] + 2 * gy[(0, 1)] + gy[(1, 1)])
    )
    dzdx = (
        (d[(-1, -1)] + 2 * d[(-1, 0)] + d[(-1, 1)]) - (d[(1, -1)] + 2 * d[(1, 0)] + d[(1, 1)])
    ) / (
        (gx[(-1, -1)] + 2 * gx[(-1, 0)] + gx[(-1, 1)]) + (gx[(1, -1)] + 2 * gx[(1, 0)] + gx[(1, 1)])
    )
    slope = np.sqrt(dzdx**2 + dzdy**2).astype(np.float32)
    aspect = np.arctan2(dzdy, -dzdx).astype(np.float32)
    undef = dem == UNDEF
    slope[undef] = UNDEF
    aspect[undef] = UNDEF
    return slope, aspect


# ---------------------------------------------------------------------------
# D8 flow direction + accumulation (terrain_tools.f90:171-251, :416-441)
# fdir encoding: 0..7 = POS index of the downstream neighbor (in-grid);
# 8..15 = POS index 0..7 but the target lies OUTSIDE the grid (border
# drain, reference stores the out-of-grid (i,j) pair); -1 = no direction
# (interior pit/flat — reference stores -9999).
# ---------------------------------------------------------------------------

def d8_fdir(dem: np.ndarray, res: float = 1.0) -> np.ndarray:
    n0, n1 = dem.shape
    z = dem.astype(np.float32)
    slopes = np.full((8, n0, n1), UNDEF, dtype=np.float32)
    for p, (di, dj) in enumerate(POS):
        # shifted neighbor values, only where in-grid
        zi = np.full((n0, n1), np.nan, dtype=np.float32)
        ii = np.arange(n0) + di
        jj = np.arange(n1) + dj
        ok_i = (ii >= 0) & (ii < n0)
        ok_j = (jj >= 0) & (jj < n1)
        zi[np.ix_(ok_i, ok_j)] = z[np.ix_(ii[ok_i], jj[ok_j])]
        # NOTE: diagonal length deliberately NOT sqrt(2)*res in this
        # variant (terrain_tools.f90:210-215)
        s = (z - zi) / np.float32(res)
        slopes[p] = np.where(np.isnan(zi), np.float32(UNDEF), s)
    # steepest positive slope, first-occurrence tie-break (maxloc)
    smax = slopes.max(axis=0)
    amax = slopes.argmax(axis=0)  # numpy argmax = first occurrence, matches maxloc
    fdir = np.full((n0, n1), -1, dtype=np.int8)
    pos_mask = smax > 0
    fdir[pos_mask] = amax[pos_mask].astype(np.int8)
    # border cells with no positive slope: first out-of-grid position
    # (minloc over slopes where -9999 entries remain, terrain_tools.f90:226-229)
    border_no_flow = ~pos_mask & (slopes.min(axis=0) == UNDEF)
    first_undef = np.argmax(slopes == UNDEF, axis=0)
    fdir[border_no_flow] = (first_undef[border_no_flow] + 8).astype(np.int8)
    return fdir


def d8_downstream_index(fdir: np.ndarray):
    """(down0, down1) absolute downstream indices; -1 where none/in-grid
    target absent (codes -1 and 8..15)."""
    n0, n1 = fdir.shape
    i0, i1 = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
    k = np.where(fdir >= 0, fdir % 8, 0)
    di = POS_ARR[k, 0]
    dj = POS_ARR[k, 1]
    has = (fdir >= 0) & (fdir < 8)
    return np.where(has, i0 + di, -1), np.where(has, i1 + dj, -1)


def d8_accumulate(fdir: np.ndarray) -> np.ndarray:
    """Upstream cell count (incl. self) via iterative topological sweep —
    replaces the recursion at terrain_tools.f90:416-441. Exact integers."""
    n0, n1 = fdir.shape
    d0, d1 = d8_downstream_index(fdir)
    flat_down = np.where(d0 >= 0, d0 * n1 + d1, -1).ravel()
    count = np.ones(n0 * n1, dtype=np.int64)
    indeg = np.zeros(n0 * n1, dtype=np.int64)
    valid = flat_down >= 0
    np.add.at(indeg, flat_down[valid], 1)
    queue = list(np.flatnonzero(indeg == 0))
    head = 0
    while head < len(queue):
        c = queue[head]
        head += 1
        d = flat_down[c]
        if d >= 0:
            count[d] += count[c]
            indeg[d] -= 1
            if indeg[d] == 0:
                queue.append(d)
    return count.reshape(n0, n1)


def d8_area(dem: np.ndarray, mask: np.ndarray, res: float):
    """Full calculate_d8_acc semantics: (area, fdir); area undef where
    mask==0 or fdir is nodata (terrain_tools.f90:240-249)."""
    fdir = d8_fdir(dem, res)
    count = d8_accumulate(fdir)
    area = (res * res * count).astype(np.float32)
    area[np.asarray(mask) == 0] = UNDEF
    area[fdir == -1] = UNDEF
    return area, fdir


# ---------------------------------------------------------------------------
# Channel network (terrain_tools.f90:878-992 wocean_wprop variant: channels
# init 0 on land; ocean shoreline pseudo-channels cid>=999999; topology).
# The sequential recursion is converted to an explicit stack machine that
# preserves call order exactly (ids depend on it).
# ---------------------------------------------------------------------------

def _fortran_argmax(a: np.ndarray) -> tuple[int, int]:
    """maxloc semantics: first occurrence scanning d0 fastest (column-major)."""
    flatF = np.argmax(a.T)  # transpose -> row-major scan of (d1, d0) == F-order of a
    j, i = divmod(flatF, a.shape[0])
    return int(i), int(j)


def calculate_channels(
    area_in: np.ndarray,
    threshold: float,
    basin_threshold: float,
    fdir: np.ndarray,
    mask: np.ndarray | None = None,
    with_ocean: bool = True,
):
    """Returns (channels, channels_wob, topology dict cid->downstream cid).
    channels: 0 = land background, >0 = segment id, -9999 outside mask."""
    n0, n1 = area_in.shape
    area = area_in.astype(np.float64).copy()
    d0, d1 = d8_downstream_index(fdir)
    # upstream adjacency in positions order per cell
    channels = np.zeros((n0, n1), dtype=np.int64)
    cmask = (area > threshold).astype(np.int8)
    topology: dict[int, int] = {}

    hcid_cell = [0]
    while True:
        hcid_cell[0] += 1
        cid_cell = [hcid_cell[0]]
        done = cmask.max() == 0
        area[cmask == 0] = 0.0
        i, j = _fortran_argmax(area)
        if cmask[i, j] == 1 and area[i, j] >= basin_threshold:
            channels[i, j] = cid_cell[0]
            topology[cid_cell[0]] = -1
        cmask[i, j] = 0
        _channels_upstream(i, j, cid_cell, fdir, channels, cmask, basin_threshold, area, hcid_cell, topology)
        if done:
            break

    channels_wob = channels.copy()
    if with_ocean and mask is not None:
        mask = np.asarray(mask)
        ocid = 999999
        for i in range(n0):
            for j in range(n1):
                if mask[i, j] == 0:
                    i0, i1_ = max(i - 1, 0), min(i + 1, n0 - 1)
                    j0, j1_ = max(j - 1, 0), min(j + 1, n1 - 1)
                    if mask[i0 : i1_ + 1, j0 : j1_ + 1].max() > 0:
                        channels[i, j] = ocid
                    ocid += 1
        channels[(mask == 0) & (channels == 0)] = IUNDEF
        channels_wob[(mask == 0) & (channels_wob == 0)] = IUNDEF
    return channels, channels_wob, topology


def _upstream_neighbors(i, j, fdir, n0, n1):
    """Cells (in positions order) whose in-grid downstream target is (i,j)."""
    out = []
    for di, dj in POS:
        ii, jj = i + di, j + dj
        if ii < 0 or jj < 0 or ii >= n0 or jj >= n1:
            continue
        f = fdir[ii, jj]
        if 0 <= f < 8 and ii + POS[f][0] == i and jj + POS[f][1] == j:
            out.append((ii, jj))
    return out


def _channels_upstream(i, j, cid_cell, fdir, channels, cmask, basin_threshold, area, hcid_cell, topology):
    """Iterative reproduction of channels_upstream_wprop
    (terrain_tools.f90:994-1067): DFS preserving neighbor order, id
    allocation order, AND the Fortran by-reference `cid` threading — the
    `cid` dummy aliases the caller's variable (count<=1 and high-area
    children share the parent's cell; low-area children alias the parent's
    local `cid_org`, so their subtree mutations leak into later siblings).
    cid_cell / hcid_cell are one-element lists acting as those references."""
    n0, n1 = channels.shape

    def make_frame(fi, fj, fcid_cell):
        ups = _upstream_neighbors(fi, fj, fdir, n0, n1)
        count = sum(1 for (a, b) in ups if cmask[a, b] == 1 and area[a, b] >= basin_threshold)
        org_cell = [fcid_cell[0]]  # cid_org memorized at entry (f90:1004)
        return [fi, fj, fcid_cell, org_cell, ups, 0, count]

    stack = [make_frame(i, j, cid_cell)]
    while stack:
        frame = stack[-1]
        fi, fj, fcid_cell, org_cell, ups, idx, count = frame
        if idx >= len(ups):
            stack.pop()
            continue
        frame[5] += 1
        ii, jj = ups[idx]
        if cmask[ii, jj] != 1:
            continue
        if count <= 1:
            cmask[ii, jj] = 0
            channels[ii, jj] = channels[fi, fj]
            child_cell = fcid_cell  # aliases parent's cid (f90:1032-1035)
        elif area[ii, jj] >= basin_threshold:
            hcid_cell[0] += 1
            fcid_cell[0] = hcid_cell[0]
            cmask[ii, jj] = 0
            channels[ii, jj] = fcid_cell[0]
            topology[fcid_cell[0]] = int(org_cell[0])  # f90:1054
            child_cell = fcid_cell
        else:
            cmask[ii, jj] = 0
            channels[ii, jj] = org_cell[0]
            child_cell = org_cell  # child aliases this frame's cid_org (f90:1060)
        stack.append(make_frame(ii, jj, child_cell))


# ---------------------------------------------------------------------------
# Basin delineation (terrain_tools.f90:1243-1293): each cell inherits the
# label of the first strictly-downstream labeled cell; paths that exit the
# grid / hit nodata fdir / cross mask==0 cells resolve to 0.
# ---------------------------------------------------------------------------

def delineate_basins(channels: np.ndarray, mask: np.ndarray, fdir: np.ndarray) -> np.ndarray:
    n0, n1 = channels.shape
    basins = channels.astype(np.int64).copy()
    d0, d1 = d8_downstream_index(fdir)
    mask = np.asarray(mask)
    for i in range(n0):
        for j in range(n1):
            if basins[i, j] != 0 or mask[i, j] < 1:
                continue
            path = []
            ci, cj = i, j
            label = 0
            while True:
                ni, nj = d0[ci, cj], d1[ci, cj]
                if ni < 0 or mask[ci, cj] == 0:
                    label = 0
                    break
                path.append((ci, cj))
                if basins[ni, nj] > 0:
                    label = basins[ni, nj]
                    break
                if basins[ni, nj] == -1:  # our resolved-to-0 marker
                    label = 0
                    break
                # basins 0 (unresolved) or IUNDEF (outside mask, f90 walks
                # into it and terminates on its mask==0): continue the walk
                ci, cj = ni, nj
            for (pi, pj) in path:
                basins[pi, pj] = label if label > 0 else -1  # -1 = resolved-to-0
    basins[basins == -1] = 0
    return basins


# ---------------------------------------------------------------------------
# HAND / depth2channel (terrain_tools.f90:1652-1725) with the stale-cd
# scan-order semantics reproduced literally.
# ---------------------------------------------------------------------------

def depth2channel(channels: np.ndarray, mask: np.ndarray, fdir: np.ndarray, dem: np.ndarray) -> np.ndarray:
    n0, n1 = dem.shape
    mask = np.asarray(mask)
    channeldepth = dem.astype(np.float32).copy()
    channeldepth[channeldepth < 0] = 0.0
    channeldepth[(mask <= 0) | (channels <= 0)] = UNDEF
    d0, d1 = d8_downstream_index(fdir)
    cd = np.float32(0.0)
    for i in range(n0):
        for j in range(n1):
            if channeldepth[i, j] != UNDEF or mask[i, j] < 1:
                continue
            # iterative walk mimicking determine_channel_depth recursion:
            # descend until value > 0 found / walk terminates, then assign
            # cd to the whole path (stale cd if the walk dead-ends)
            path = []
            ci, cj = i, j
            while True:
                ni, nj = d0[ci, cj], d1[ci, cj]
                if ni < 0 or mask[ci, cj] == 0:
                    break  # dead end: cd keeps its previous (stale) value
                path.append((ci, cj))
                if channeldepth[ni, nj] > 0:
                    cd = channeldepth[ni, nj]
                    break
                # downstream value <= 0 (unresolved UNDEF, a zero-depth
                # channel cell, or a stale-cd-0 path cell): the reference
                # recurses THROUGH it (f90:1715 tests .gt. 0), assigning cd
                # to it as well on the way back
                ci, cj = ni, nj
            for (pi, pj) in path:
                channeldepth[pi, pj] = cd
    out = dem.astype(np.float32) - channeldepth
    out[out < 0] = UNDEF
    out[mask <= 0] = UNDEF
    return out

# ---------------------------------------------------------------------------
# Dense-rank relabel (terrain_tools.f90:1604-1650): ids > 0 are remapped to
# consecutive ranks STARTING AT 0 (reference quirk: the smallest surviving
# id collides with the untouched background 0); empty ids dropped.
# ---------------------------------------------------------------------------

def cleanup_labels(labels: np.ndarray) -> np.ndarray:
    out = labels.copy()
    pos = labels > 0
    if not pos.any():
        return out
    ids = np.unique(labels[pos])
    lut = np.zeros(int(ids.max()) + 1, dtype=labels.dtype)
    lut[ids] = np.arange(len(ids), dtype=labels.dtype)  # rank starts at 0
    out[pos] = lut[labels[pos]]
    return out


# ---------------------------------------------------------------------------
# 3x3 mode gap-fill on channel cells (terrain_tools.f90:825-876): the most
# frequent non-undef value in the clamped 3x3 neighborhood, first-seen
# value wins ties (hru_id fill order: ii outer, jj inner).
# ---------------------------------------------------------------------------

def gap_fill(hrus: np.ndarray, channels: np.ndarray) -> np.ndarray:
    n0, n1 = hrus.shape
    out = hrus.copy()
    targets = np.argwhere((channels > 0) & (channels < 999999))
    for (i, j) in targets:
        i0, i1 = max(i - 1, 0), min(i + 1, n0 - 1)
        j0, j1 = max(j - 1, 0), min(j + 1, n1 - 1)
        vals, counts, order = [], [], {}
        for ii in range(i0, i1 + 1):
            for jj in range(j0, j1 + 1):
                v = hrus[ii, jj]
                if v == IUNDEF:
                    continue
                if v in order:
                    counts[order[v]] += 1
                else:
                    order[v] = len(vals)
                    vals.append(v)
                    counts.append(1)
        if vals:
            best = max(range(len(vals)), key=lambda k: (counts[k], -k))
            out[i, j] = vals[best]
    return out


# ---------------------------------------------------------------------------
# 4-connected component labeling (terrain_tools.f90:1750-1789): pids 0..
# assigned in scan order (d0 outer, d1 inner), flood fill per component.
# ---------------------------------------------------------------------------

def polygonize(din_in: np.ndarray) -> np.ndarray:
    din = din_in.astype(np.float64).copy()
    n0, n1 = din.shape
    dout = np.full((n0, n1), UNDEF)
    pid = -1
    for i in range(n0):
        for j in range(n1):
            if din[i, j] == UNDEF:
                continue
            cid = din[i, j]
            pid += 1
            stack = [(i, j)]
            while stack:
                ci, cj = stack.pop()
                if ci < 0 or cj < 0 or ci >= n0 or cj >= n1:
                    continue
                if din[ci, cj] != cid:
                    continue
                din[ci, cj] = UNDEF
                dout[ci, cj] = pid
                stack.extend([(ci - 1, cj), (ci + 1, cj), (ci, cj - 1), (ci, cj + 1)])
    return dout


# ---------------------------------------------------------------------------
# Cluster id paint-back (terrain_tools.f90:1727-1748): label-map relabel via
# a lookup vector (0-based here; the reference's +1 is Fortran indexing).
# ---------------------------------------------------------------------------

def assign_clusters(labels_org: np.ndarray, clusters: np.ndarray) -> np.ndarray:
    out = np.full_like(labels_org, IUNDEF)
    ok = labels_org != IUNDEF
    out[ok] = np.asarray(clusters)[labels_org[ok]]
    return out


# ---------------------------------------------------------------------------
# Hillslope delineation (terrain_tools.f90:1295-1575): exact sequential
# reproduction as a stack machine. Seeds processed in descending
# accumulation order (Fortran maxloc scan for ties); at each channel cell a
# clockwise sweep starting from the (old-ordering) origin position labels
# banks; define_hillslope_id floods label upstream. Reproduced quirks:
# - ipos_old computed against the k-major ordering but APPLIED to the
#   clockwise ordering (f90:1378-1395 overwrite order);
# - hillslope_id += 1 both before AND after a confluence branch
#   (f90:1482-1493);
# - terminal channel heads allocate two ids (f90:1533-1545).
# Where the reference would index positions(-9999,:) (undefined behavior,
# fdir target not adjacent) we start the sweep at position 1.
# ---------------------------------------------------------------------------

def delineate_hillslopes(channels: np.ndarray, area_in: np.ndarray, fdir: np.ndarray, mask: np.ndarray,
                         cleanup: bool = True, return_counter: bool = False):
    n0, n1 = channels.shape
    area = area_in.astype(np.float64).copy()
    mask = np.asarray(mask)
    hillslopes = np.zeros((n0, n1), dtype=np.int64)
    hillslopes[(mask <= 0) | (channels > 0)] = IUNDEF
    d0, d1 = d8_downstream_index(fdir)
    # absolute fdir target including out-of-grid pointers (codes 8..15)
    k = np.where(fdir >= 0, fdir % 8, 0)
    t0 = np.where(fdir >= 0, np.arange(n0)[:, None] + POS_ARR[k, 0], IUNDEF)
    t1 = np.where(fdir >= 0, np.arange(n1)[None, :] + POS_ARR[k, 1], IUNDEF)

    hid_cell = [1]

    def flood(i, j):
        """define_hillslope_id (f90:1551-1575), iterative."""
        stack = [(i, j)]
        while stack:
            ci, cj = stack.pop()
            if mask[ci, cj] == 0:
                continue
            hillslopes[ci, cj] = hid_cell[0]
            area[ci, cj] = UNDEF
            for (a, b) in _upstream_neighbors(ci, cj, fdir, n0, n1):
                stack.append((a, b))

    def origin_pos(i, j, ordering):
        """Index (1-based) of the position matching the fdir target in the
        given ordering; None when not adjacent/defined."""
        ti, tj = t0[i, j], t1[i, j]
        found = None
        for p, (di, dj) in enumerate(ordering):
            if i + di == ti and j + dj == tj:
                found = p + 1
        return found

    def sweep_order(i, j):
        """Clockwise neighbor sweep starting at the OLD-ordering origin
        index applied to the clockwise array (reference quirk)."""
        ip_old = origin_pos(i, j, POS)
        if ip_old is None:
            ip_old = 1
        idxs = list(range(ip_old, 9)) + list(range(1, ip_old))
        return [(p, POS_CW[p - 1]) for p in idxs]

    def move_upstream(i, j, iold, jold, cid):
        """f90:1436-1549, iterative with explicit frames."""
        frames = [_mu_frame(i, j, iold, jold, cid)]
        while frames:
            fr = frames[-1]
            if fr["stage"] == "init":
                area[fr["iold"], fr["jold"]] = UNDEF
                fr["stage"] = "loop"
                continue
            if fr["stage"] == "loop":
                if fr["idx"] >= len(fr["order"]):
                    fr["stage"] = "terminal"
                    continue
                p, (di, dj) = fr["order"][fr["idx"]]
                fr["idx"] += 1
                ii, jj = fr["i"] + di, fr["j"] + dj
                if ii < 0 or jj < 0 or ii >= n0 or jj >= n1:
                    continue
                f = fdir[ii, jj]
                if not (0 <= f < 8 and ii + POS[f][0] == fr["i"] and jj + POS[f][1] == fr["j"]):
                    continue
                if channels[ii, jj] > 0:
                    if fr["count"] > 1:
                        fr["cid"] = channels[fr["i"], fr["j"]]
                        hid_cell[0] += 1
                    fr["post_inc"] = fr["count"] > 1
                    frames.append(_mu_frame(ii, jj, fr["i"], fr["j"], fr["cid"]))
                    fr["stage"] = "after_child"
                else:
                    flood(ii, jj)
                continue
            if fr["stage"] == "after_child":
                if fr.get("post_inc"):
                    fr["cid"] = channels[fr["i"], fr["j"]]
                    hid_cell[0] += 1
                fr["stage"] = "loop"
                continue
            if fr["stage"] == "terminal":
                if fr["count"] == 0:
                    hid_cell[0] += 1
                    for (a, b) in _upstream_neighbors(fr["i"], fr["j"], fdir, n0, n1):
                        flood(a, b)
                    hid_cell[0] += 1
                area[fr["i"], fr["j"]] = UNDEF
                frames.pop()
                continue

    def _mu_frame(i, j, iold, jold, cid):
        # channel inflow count (f90:1461-1471)
        count = 0
        for (a, b) in _upstream_neighbors(i, j, fdir, n0, n1):
            if channels[a, b] > 0:
                count += 1
        return {
            "i": i, "j": j, "iold": iold, "jold": jold, "cid": cid,
            "order": sweep_order(i, j), "idx": 0, "count": count,
            "stage": "init",
        }

    # outer loop: seeds in descending area order (f90:1316-1330)
    while True:
        maxarea = area.max()
        if maxarea == UNDEF:
            break
        i, j = _fortran_argmax(area)
        # delineate_hillslopes_catchment (f90:1337-1434)
        cid = channels[i, j]
        for p, (di, dj) in sweep_order(i, j):
            ii, jj = i + di, j + dj
            if ii < 0 or jj < 0 or ii >= n0 or jj >= n1:
                continue
            f = fdir[ii, jj]
            if not (0 <= f < 8 and ii + POS[f][0] == i and jj + POS[f][1] == j):
                continue
            if channels[ii, jj] > 0:
                move_upstream(ii, jj, i, j, cid)
            else:
                flood(ii, jj)
        area[i, j] = UNDEF
    out = cleanup_labels(hillslopes) if cleanup else hillslopes
    if return_counter:
        return out, hid_cell[0]
    return out

# ---------------------------------------------------------------------------
# Sparse channel trace: identical semantics to calculate_channels but over
# the collected candidate set (area > threshold) only — the distributed
# engine's sequential core (SURVEY.md 2.8: channel cells are <<1% of the
# grid, so the subgraph is collected and traced exactly).
# ---------------------------------------------------------------------------

def calculate_channels_sparse(
    cand: dict[tuple[int, int], float],
    down: dict[tuple[int, int], tuple[int, int] | None],
    basin_threshold: float,
):
    """cand: candidate cell -> area; down: candidate -> absolute downstream
    cell (may be a non-candidate or None). Returns (labels dict, topology).
    Order semantics match the dense kernel: seeds by (-area, j, i) Fortran
    maxloc order; neighbor iteration in POS order."""
    # upstream adjacency among candidates, in POS order per cell
    ups: dict[tuple[int, int], list[tuple[int, int]]] = {c: [] for c in cand}
    downset = {c: d for c, d in down.items() if c in cand}
    for (i, j) in cand:
        for (di, dj) in POS:
            nb = (i + di, j + dj)
            if nb in cand and downset.get(nb) == (i, j):
                ups[(i, j)].append(nb)

    labels: dict[tuple[int, int], int] = {}
    topology: dict[int, int] = {}
    consumed: set[tuple[int, int]] = set()
    # seed order: (-area, j, i) == Fortran maxloc first-occurrence
    order = sorted(cand.keys(), key=lambda c: (-cand[c], c[1], c[0]))

    def upcount(c):
        return sum(1 for u in ups[c] if u not in consumed and cand[u] >= basin_threshold)

    hcid_cell = [0]
    for seed in order:
        if seed in consumed:
            continue
        hcid_cell[0] += 1
        cid_cell = [hcid_cell[0]]
        if cand[seed] >= basin_threshold:
            labels[seed] = cid_cell[0]
            topology[cid_cell[0]] = -1
        consumed.add(seed)
        # frame machine mirroring _channels_upstream
        def make_frame(c, fcid_cell):
            return [c, fcid_cell, [fcid_cell[0]], ups[c], 0, upcount(c)]

        stack = [make_frame(seed, cid_cell)]
        while stack:
            fr = stack[-1]
            c, fcid_cell, org_cell, nbrs, idx, count = fr
            if idx >= len(nbrs):
                stack.pop()
                continue
            fr[4] += 1
            u = nbrs[idx]
            if u in consumed:
                continue
            if count <= 1:
                consumed.add(u)
                labels[u] = labels.get(c, 0)
                child_cell = fcid_cell
            elif cand[u] >= basin_threshold:
                hcid_cell[0] += 1
                fcid_cell[0] = hcid_cell[0]
                consumed.add(u)
                labels[u] = fcid_cell[0]
                topology[fcid_cell[0]] = int(org_cell[0])
                child_cell = fcid_cell
            else:
                consumed.add(u)
                labels[u] = org_cell[0]
                child_cell = org_cell
            stack.append(make_frame(u, child_cell))
    return labels, topology


def calculate_channels_sparse_arrays(
    gi: np.ndarray,
    gj: np.ndarray,
    area: np.ndarray,
    di: np.ndarray,
    dj: np.ndarray,
    basin_threshold: float,
):
    """Array-native twin of `calculate_channels_sparse` for LARGE candidate
    sets (measured: 26.5M candidates = 39.6% of an 8192^2 filled-flat DEM
    at the 1e6 m^2 threshold made the tuple-dict path run for tens of
    minutes on the driver). Same semantics bit-for-bit: POS-order upstream
    adjacency, (-area, j, i) Fortran seed order, the identical frame
    machine — but membership/adjacency are packed-int64 searchsorted
    (vectorized) and the walk runs over CSR int arrays instead of
    tuple-keyed dicts. Returns (cids int64 array aligned to the input
    candidate order; topology dict). cids 0 = unlabeled (never emitted by
    the dict twin either — every candidate receives its walk label)."""
    C = len(gi)
    cids = np.zeros(C, dtype=np.int64)
    topology: dict[int, int] = {}
    if C == 0:
        return cids, topology
    gi = np.asarray(gi, dtype=np.int64)
    gj = np.asarray(gj, dtype=np.int64)
    area = np.asarray(area, dtype=np.float64)
    span = int(gj.max()) + 2  # key packing width (gj >= 0)
    key = gi * span + gj
    order_k = np.argsort(key, kind="stable")
    keys_sorted = key[order_k]
    # downstream candidate index per candidate (-1 if downstream cell is
    # not a candidate / None)
    has_down = di > -(10 ** 8)
    dkey = np.where(has_down, di * span + np.where(has_down, dj, 0), -1)
    pos_d = np.searchsorted(keys_sorted, dkey)
    pos_d_c = np.clip(pos_d, 0, C - 1)
    down_idx = np.where(
        has_down & (keys_sorted[pos_d_c] == dkey), order_k[pos_d_c], -1
    ).astype(np.int64)
    # upstream adjacency in POS order: for offset p, candidate u at
    # c + POS[p] with down(u) == c contributes edge (c, u, p)
    e_c, e_u, e_p = [], [], []
    self_idx = np.arange(C, dtype=np.int64)
    for p, (oi, oj) in enumerate(POS):
        nkey = (gi + oi) * span + (gj + oj)
        pos_n = np.searchsorted(keys_sorted, nkey)
        pos_n_c = np.clip(pos_n, 0, C - 1)
        found = keys_sorted[pos_n_c] == nkey
        u = order_k[pos_n_c]
        # guard: down(u) must be exactly this cell (compare indices);
        # u is always in-bounds (pos_n clipped), so plain & suffices
        ok = found & (down_idx[u] == self_idx)
        m = np.flatnonzero(ok)
        e_c.append(m)
        e_u.append(u[m])
        e_p.append(np.full(len(m), p, dtype=np.int64))
    e_c = np.concatenate(e_c)
    e_u = np.concatenate(e_u)
    e_p = np.concatenate(e_p)
    eo = np.lexsort((e_p, e_c))  # per-cell neighbors in POS order
    e_c, e_u = e_c[eo], e_u[eo]
    indptr = np.zeros(C + 1, dtype=np.int64)
    np.add.at(indptr, e_c + 1, 1)
    indptr = np.cumsum(indptr)
    nbr = e_u  # CSR neighbor list
    # seed order (-area, j, i) — lexsort primary key is the LAST array
    seed_order = np.lexsort((gi, gj, -area))
    big = area >= basin_threshold
    consumed = np.zeros(C, dtype=bool)
    hcid = 0
    for seed in seed_order:
        if consumed[seed]:
            continue
        hcid += 1
        cid_cell = [hcid]
        if big[seed]:
            cids[seed] = cid_cell[0]
            topology[cid_cell[0]] = -1
        consumed[seed] = True

        def upcount(c):
            n = 0
            for t in range(indptr[c], indptr[c + 1]):
                u = nbr[t]
                if not consumed[u] and big[u]:
                    n += 1
            return n

        # frame: [cell, cid_cell, org_cell, nbr_lo, nbr_hi, idx, count]
        stack = [[seed, cid_cell, [cid_cell[0]], int(indptr[seed]), int(indptr[seed + 1]), 0, upcount(seed)]]
        while stack:
            fr = stack[-1]
            c, fcid_cell, org_cell, lo, hi, idx, count = fr
            if lo + idx >= hi:
                stack.pop()
                continue
            fr[5] += 1
            u = int(nbr[lo + idx])
            if consumed[u]:
                continue
            if count <= 1:
                consumed[u] = True
                cids[u] = cids[c]
                child_cell = fcid_cell
            elif big[u]:
                hcid += 1
                fcid_cell[0] = hcid
                consumed[u] = True
                cids[u] = fcid_cell[0]
                topology[fcid_cell[0]] = int(org_cell[0])
                child_cell = fcid_cell
            else:
                consumed[u] = True
                cids[u] = org_cell[0]
                child_cell = org_cell
            stack.append([u, child_cell, [child_cell[0]], int(indptr[u]), int(indptr[u + 1]), 0, upcount(u)])
    return cids, topology

# ---------------------------------------------------------------------------
# MFD accumulation (terrain_tools.f90:517-626): slope^p-weighted fractions
# to ALL downhill neighbors, diagonals scaled by sqrt(2) (unlike the D8
# variant). Iterative memoized pull (same evaluation order as the
# reference's recursion: donors accumulated in positions order).
# ---------------------------------------------------------------------------

SQRT2 = np.float32(1.41421356237)


def mfd_fractions(dem: np.ndarray, res: float, p: float):
    """fract[k, i, j]: fraction of cell (i,j)'s outflow sent to neighbor k
    (POS order), reproducing fract_flow_mfd (f90:583-626): slopes to lower
    neighbors over length (sqrt2*res for diagonals), fraction =
    slope^p / sum(slopes^p); zero-sum -> 0."""
    n0, n1 = dem.shape
    z = dem.astype(np.float32)
    slopes = np.zeros((8, n0, n1), dtype=np.float32)
    for k, (di, dj) in enumerate(POS):
        zi = np.full((n0, n1), np.nan, dtype=np.float32)
        ii = np.arange(n0) + di
        jj = np.arange(n1) + dj
        oki = (ii >= 0) & (ii < n0)
        okj = (jj >= 0) & (jj < n1)
        zi[np.ix_(oki, okj)] = z[np.ix_(ii[oki], jj[okj])]
        length = SQRT2 * np.float32(res) if (di != 0 and dj != 0) else np.float32(res)
        s = (z - zi) / length
        slopes[k] = np.where(np.isnan(zi) | (s <= 0), np.float32(0.0), s)
    sp = slopes ** np.float32(p)
    sp[slopes <= 0] = 0.0
    tot = sp.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        fract = np.where(tot > 0, sp / tot, 0.0).astype(np.float32)
    return fract


def mfd_accumulate(dem: np.ndarray, res: float, p: float) -> np.ndarray:
    """catchment(c) = 1 + sum over STRICTLY HIGHER neighbors n of
    fract(n->c) * catchment(n) (f90:554-580). Memoized DFS with the
    reference's positions evaluation order (float-order faithful)."""
    n0, n1 = dem.shape
    z = dem.astype(np.float32)
    fract = mfd_fractions(dem, res, p)
    catch = np.zeros((n0, n1), dtype=np.float32)
    done = np.zeros((n0, n1), dtype=bool)
    for si in range(n0):
        for sj in range(n1):
            if done[si, sj]:
                continue
            stack = [(si, sj, 0, np.float32(1.0))]
            # frame: (i, j, next position index, acc)
            while stack:
                i, j, k, acc = stack.pop()
                advanced = False
                while k < 8:
                    di, dj = POS[k]
                    ii, jj = i + di, j + dj
                    k += 1
                    if ii < 0 or jj < 0 or ii >= n0 or jj >= n1:
                        continue
                    if z[ii, jj] > z[i, j]:
                        if not done[ii, jj]:
                            # resume at k-1 so the completed neighbor's
                            # contribution is accumulated on return
                            stack.append((i, j, k - 1, acc))
                            stack.append((ii, jj, 0, np.float32(1.0)))
                            advanced = True
                            break
                        # fraction from neighbor's perspective toward (i,j)
                        back = POS.index((-di, -dj))
                        acc = np.float32(acc + fract[back, ii, jj] * catch[ii, jj])
                if advanced:
                    continue
                catch[i, j] = acc
                done[i, j] = True
    return catch


def d8_inflow_neighbors(variable: np.ndarray, fdir: np.ndarray) -> np.ndarray:
    """calculate_d8_acc_neighbors (f90:443-515): one-hop sum of `variable`
    over upstream neighbors (cells whose fdir targets this cell).
    Non-recursive halo stencil.

    Targets are bounds-checked on BOTH axes: `d8_fdir` never emits an
    in-range code pointing off-grid, but arcgis-decoded fdirs (and the
    halo pad ring in the distributed variant) can — an unguarded
    `d1 == -1` would silently wrap to the last column and `d0 == n0`
    would raise."""
    n0, n1 = fdir.shape
    out = np.zeros((n0, n1), dtype=np.float64)
    d0, d1 = d8_downstream_index(fdir)
    ok = (d0 >= 0) & (d0 < n0) & (d1 >= 0) & (d1 < n1)
    np.add.at(out, (d0[ok], d1[ok]), variable[ok].astype(np.float64))
    return out


def d8_acc_neighbors(dem: np.ndarray, res: float, variable: np.ndarray) -> np.ndarray:
    """LITERAL calculate_d8_acc_neighbors parity (terrain_tools.f90:443-515):
    an internal sqrt2-diagonal fdir over the RAW dem (:469-493 — no pit
    fill), then each cell accumulates ITS OWN variable once per upstream
    neighbor — the reference adds variable(i,j), not variable(inew,jnew)
    (:505) — so out = variable * n_upstream. The dem(inew,jnew) >
    dem(i,j) guard (:504) is implied: a neighbor only targets (i,j) on a
    strictly positive slope. `d8_inflow_neighbors` above is the generic
    upstream-SUM building block (reduces to the count for variable == 1);
    the two coincide only for constant variables."""
    counts = d8_inflow_neighbors(np.ones(dem.shape, dtype=np.float64), d8_fdir_sqrt2(dem, res))
    return variable.astype(np.float64) * counts


# ---------------------------------------------------------------------------
# Polygon info (terrain_tools.f90:1791-1858 + libraries/terrain_tools.py:
# 1590-1632): per-polygon centroids (count/sum of cell centers) and the
# 4-neighbor polygon/cluster adjacency edge list (self-edges included, as
# the reference emits every in-bounds 4-neighbor pair).
# ---------------------------------------------------------------------------

def polygon_info(polygons: np.ndarray, clusters: np.ndarray, res: float):
    n0, n1 = polygons.shape
    # reference cell centers: xs varies along d1, ys along d0
    # (terrain_tools.py:1593-1597 meshgrid(y, x))
    xs = np.tile((np.arange(n1) * res + res / 2.0), (n0, 1))
    ys = np.tile((np.arange(n0) * res + res / 2.0)[:, None], (1, n1))
    ok = polygons != IUNDEF
    npoly = int(polygons[ok].max()) + 1 if ok.any() else 0
    cnt = np.zeros(npoly)
    sx = np.zeros(npoly)
    sy = np.zeros(npoly)
    ids = polygons[ok].astype(np.int64)
    np.add.at(cnt, ids, 1.0)
    np.add.at(sx, ids, xs[ok])
    np.add.at(sy, ids, ys[ok])
    with np.errstate(divide="ignore", invalid="ignore"):
        centroids = np.stack([sx / cnt, sy / cnt], axis=1)
    edges = set()
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        a0 = slice(max(0, di), n0 + min(0, di))
        a1 = slice(max(0, dj), n1 + min(0, dj))
        b0 = slice(max(0, -di), n0 + min(0, -di))
        b1 = slice(max(0, -dj), n1 + min(0, -dj))
        src = polygons[a0, a1]
        dst = polygons[b0, b1]
        m = (src != IUNDEF) & (dst != IUNDEF)
        for s, d in zip(src[m].ravel(), dst[m].ravel()):
            edges.add((int(s), int(d)))
    adj = np.asarray(sorted(edges), dtype=np.int64).reshape(-1, 2)
    # centroid distances per adjacency edge (terrain_tools.py:1614-1616)
    if len(adj):
        dist = np.sqrt(
            (centroids[adj[:, 0], 0] - centroids[adj[:, 1], 0]) ** 2
            + (centroids[adj[:, 0], 1] - centroids[adj[:, 1], 1]) ** 2
        )
    else:
        dist = np.zeros(0)
    return {"centroid": centroids, "edges": adj, "edge_dist": dist}


# ---------------------------------------------------------------------------
# reduce_basin_number (libraries/terrain_tools.py:293-338): iteratively
# merge one of the 10 smallest basins into its downstream neighbor, picking
# the merge that minimizes the area standard deviation, until the goal
# count; then dense-relabel 1..n and undef non-positive.
# ---------------------------------------------------------------------------

def reduce_basins(basins: np.ndarray, ids: np.ndarray, nids: np.ndarray, area: np.ndarray, nbasins_goal: int):
    """ids/nids are 0-based basin ids and downstream ids (-1 = none)."""
    basins = basins.copy()
    ids = np.asarray(ids, dtype=np.int64).copy()
    nids = np.asarray(nids, dtype=np.int64).copy()
    area = np.asarray(area, dtype=np.float64).copy()
    while ids.size > nbasins_goal:
        order = np.argsort(area, kind="stable")[:10]
        astd = []
        for ib in order:
            acp = area.copy()
            acp[ids == nids[ib]] += acp[ib]
            astd.append(acp.std())
        astd = np.asarray(astd)
        valid = nids[order] >= 0
        if not valid.any():
            break
        tmp = np.argmin(astd[valid])
        ib = order[np.flatnonzero(astd == astd[valid][tmp])[0]]
        area[ids == nids[ib]] += area[ib]
        nids[nids == ids[ib]] = nids[ib]
        basins[basins == ids[ib] + 1] = nids[ib] + 1
        keep = np.arange(ids.size) != ib
        ids, nids, area = ids[keep], nids[keep], area[keep]
    ub = np.unique(basins)
    ub = ub[ub > 0]
    out = basins.copy()
    for i, b in enumerate(ub):
        out[basins == b] = i + 1
    out[out <= 0] = IUNDEF
    return out


def reduce_basins_map(ids: np.ndarray, nids: np.ndarray, area: np.ndarray, nbasins_goal: int) -> dict[int, int]:
    """Table-only twin of reduce_basins: the identical merge loop over the
    small per-basin table, returning {original 1-based label -> final dense
    label} so a DISTRIBUTED caller can broadcast the map and paint cells in
    map_batches instead of holding the grid (terrain_tools.py:293-338).
    Asserted equal to the grid version in tests/test_terrain_extra.py."""
    ids = np.asarray(ids, dtype=np.int64).copy()
    nids = np.asarray(nids, dtype=np.int64).copy()
    area = np.asarray(area, dtype=np.float64).copy()
    cur = {int(i) + 1: int(i) + 1 for i in ids}  # original label -> current
    while ids.size > nbasins_goal:
        order = np.argsort(area, kind="stable")[:10]
        astd = []
        for ib in order:
            acp = area.copy()
            acp[ids == nids[ib]] += acp[ib]
            astd.append(acp.std())
        astd = np.asarray(astd)
        valid = nids[order] >= 0
        if not valid.any():
            break
        tmp = np.argmin(astd[valid])
        ib = order[np.flatnonzero(astd == astd[valid][tmp])[0]]
        area[ids == nids[ib]] += area[ib]
        src_lab, dst_lab = int(ids[ib]) + 1, int(nids[ib]) + 1
        for k, v in cur.items():
            if v == src_lab:
                cur[k] = dst_lab
        nids[nids == ids[ib]] = nids[ib]
        keep = np.arange(ids.size) != ib
        ids, nids, area = ids[keep], nids[keep], area[keep]
    # mirror the grid twin's final filter: a merge whose target was an
    # invalid candidate (nids == -1) paints label 0, which ub[ub > 0]
    # excludes and out[out <= 0] sends to IUNDEF — so labels that ended at
    # 0 must NOT rank as survivors, and are omitted from the map (the
    # distributed paint leaves unmapped labels at -1 / undef).
    survivors = sorted({v for v in cur.values() if v > 0})
    rank = {lab: i + 1 for i, lab in enumerate(survivors)}
    return {k: rank[v] for k, v in cur.items() if v > 0}

# ---------------------------------------------------------------------------
# Basin-count bisection (libraries/terrain_tools.py:211-253): log-space
# bisection on basin_threshold (10 iterations) to hit a target basin count.
# The reference caches nothing and recomputes channels+basins per probe; we
# take a `probe(threshold) -> (nbasins, basins)` callable so the same
# driver loop runs over the oracle kernels or the distributed chain
# (fdir/area computed once and reused across probes).
# ---------------------------------------------------------------------------

def basin_count_bisection(probe, area_max: float, res: float, nbasins_goal: int, iters: int = 10):
    max_threshold = area_max - res * res
    min_threshold = max_threshold / 1000.0
    # (the reference also probes both endpoints first, terrain_tools.py:
    # 218-221, but never reads the results — each probe reruns the whole
    # channels+basins chain, so we skip the two priming probes; the loop
    # below is unchanged and returns identical output)
    basins = None
    for _ in range(iters):
        c = (np.log(max_threshold) + np.log(min_threshold)) / 2.0
        n_c, basins = probe(float(np.exp(c)))
        if n_c == nbasins_goal:
            return basins
        if nbasins_goal < n_c:
            min_threshold = float(np.exp(c))
        else:
            max_threshold = float(np.exp(c))
    return basins


def basin_probe_oracle(area: np.ndarray, fdir: np.ndarray, mask: np.ndarray, channel_threshold: float = 1e6):
    """probe() over the oracle kernels, reusing precomputed area/fdir.
    Counts distinct positive basin ids (the functional reading of the
    reference's np.unique(basins)[1::].size at terrain_tools.py:224)."""

    def probe(basin_threshold: float):
        ch, _, _ = calculate_channels(area, channel_threshold, basin_threshold, fdir, mask=mask, with_ocean=False)
        basins = delineate_basins(ch, mask, fdir)
        u = np.unique(basins)
        return int((u > 0).sum()), basins

    return probe

# ---------------------------------------------------------------------------
# D8 variant with sqrt(2) diagonals (terrain_tools.f90:332-347): used by the
# interest-point accumulation and the simple pit-removal.
# ---------------------------------------------------------------------------

def d8_fdir_sqrt2(dem: np.ndarray, res: float) -> np.ndarray:
    n0, n1 = dem.shape
    z = dem.astype(np.float32)
    slopes = np.full((8, n0, n1), np.float32(UNDEF), dtype=np.float32)
    for p, (di, dj) in enumerate(POS):
        zi = np.full((n0, n1), np.nan, dtype=np.float32)
        ii = np.arange(n0) + di
        jj = np.arange(n1) + dj
        oki = (ii >= 0) & (ii < n0)
        okj = (jj >= 0) & (jj < n1)
        zi[np.ix_(oki, okj)] = z[np.ix_(ii[oki], jj[okj])]
        length = SQRT2 * np.float32(res) if (di != 0 and dj != 0) else np.float32(res)
        s = (z - zi) / length
        slopes[p] = np.where(np.isnan(zi), np.float32(UNDEF), s)
    smax = slopes.max(axis=0)
    amax = slopes.argmax(axis=0)
    fdir = np.full((n0, n1), -1, dtype=np.int8)
    pos_mask = smax > 0
    fdir[pos_mask] = amax[pos_mask].astype(np.int8)
    border = ~pos_mask & (slopes.min(axis=0) == UNDEF)
    first_undef = np.argmax(slopes == UNDEF, axis=0)
    fdir[border] = (first_undef[border] + 8).astype(np.int8)
    return fdir


def d8_acc_wipoints(dem: np.ndarray, mask: np.ndarray, ipoints: np.ndarray, res: float):
    """calculate_d8_acc_wipoints (terrain_tools.f90:303-414): fdir with
    sqrt2 diagonals; accumulation seeded ONLY at interest points, each
    walking DOWNSTREAM carrying a running path counter; cells already
    visited stop later walks (first-path-wins — reference recursion
    semantics, reproduced literally in scan order)."""
    n0, n1 = dem.shape
    fdir = d8_fdir_sqrt2(dem, res)
    d0, d1 = d8_downstream_index(fdir)
    z = dem.astype(np.float32)
    catchment = np.zeros((n0, n1), dtype=np.int64)
    ip = np.asarray(ipoints)
    for i in range(n0):
        for j in range(n1):
            if ip[i, j] == IUNDEF:
                continue
            pc = 0
            ci, cj = i, j
            while catchment[ci, cj] <= 0:
                catchment[ci, cj] += pc + 1
                pc = catchment[ci, cj]
                ni, nj = d0[ci, cj], d1[ci, cj]
                if ni < 0 or not (z[ci, cj] > z[ni, nj]):
                    break
                ci, cj = ni, nj
    area = (np.float32(res) ** 2 * catchment).astype(np.float32)
    area[np.asarray(mask) == 0] = UNDEF
    area[fdir == -1] = UNDEF
    return area, fdir


def remove_pits_simple(dem: np.ndarray, res: float, max_outer: int = 10000):
    """The simple pit-removal variant (terrain_tools.f90:56-169): scan the
    (shrinking) bounding box; any interior cell with no downhill neighbor
    (sqrt2-length slopes) is raised to its least-bad neighbor + 0.01*res,
    chaining into that neighbor; repeat until a full clean pass."""
    n0, n1 = dem.shape
    demns = dem.astype(np.float32).copy()
    minslope = np.float32(0.01)

    def fix_cell(i, j, box):
        count = 0
        ci, cj = i, j
        while True:
            if demns[ci, cj] == np.float32(UNDEF):
                return count
            if ci == 0 or ci == n0 - 1 or cj == 0 or cj == n1 - 1:
                return count
            best_s = -np.inf
            best = None
            for (di, dj) in POS:
                ii, jj = ci + di, cj + dj
                if ii < 0 or jj < 0 or ii >= n0 or jj >= n1:
                    continue
                length = SQRT2 * np.float32(res) if (di != 0 and dj != 0) else np.float32(res)
                s = (demns[ci, cj] - demns[ii, jj]) / length
                if s > best_s:
                    best_s = s
                    best = (ii, jj)
            if best_s > 0:
                return count
            box[0] = min(box[0], ci); box[1] = max(box[1], ci)
            box[2] = min(box[2], cj); box[3] = max(box[3], cj)
            demns[ci, cj] = demns[best] + minslope * np.float32(res)
            count += 1
            ci, cj = best

    i0, i1, j0, j1 = 0, n0 - 1, 0, n1 - 1
    for _ in range(max_outer):
        box = [10 ** 9, -1, 10 ** 9, -1]
        count = 0
        for i in range(i0, i1 + 1):
            for j in range(j0, j1 + 1):
                count += fix_cell(i, j, box)
        if count == 0:
            # confirm with a full-grid pass (f90:104-116)
            box = [10 ** 9, -1, 10 ** 9, -1]
            count = 0
            for i in range(n0):
                for j in range(n1):
                    count += fix_cell(i, j, box)
            if count == 0:
                break
        i0, i1 = max(box[0], 0), min(max(box[1], 0), n0 - 1)
        j0, j1 = max(box[2], 0), min(max(box[3], 0), n1 - 1)
        if box[1] < 0:
            i0, i1, j0, j1 = 0, n0 - 1, 0, n1 - 1
    return demns

# ---------------------------------------------------------------------------
# MFD HAND (terrain_tools.f90:628-746): fraction-weighted mix of downstream
# channel depths; literal reproduction including -9999 contributions from
# drainless neighbors and the shared cd threading.
# ---------------------------------------------------------------------------

def depth2channel_mfd(channels: np.ndarray, mask: np.ndarray, p: int, dem: np.ndarray, res: float):
    n0, n1 = dem.shape
    mask = np.asarray(mask)
    z = dem.astype(np.float32)
    channeldepth = z.copy()
    channeldepth[channeldepth < 0] = 0.0
    channeldepth[(mask <= 0) | (channels <= 0)] = UNDEF

    def slopes_of(i, j):
        s = np.zeros(8, dtype=np.float32)
        for k, (di, dj) in enumerate(POS):
            ii, jj = i + di, j + dj
            if ii < 0 or jj < 0 or ii >= n0 or jj >= n1 or mask[ii, jj] == 0:
                continue
            if z[i, j] > z[ii, jj]:
                length = SQRT2 * np.float32(res) if (di != 0 and dj != 0) else np.float32(res)
                s[k] = (z[i, j] - z[ii, jj]) / length
        return s

    def resolve(si, sj):
        # frames: [i, j, slopes, angle_sum, ipos]
        stack = [[si, sj, None, None, 0]]
        cd_cell = [np.float32(0.0)]
        while stack:
            fr = stack[-1]
            i, j, s, ang, ipos = fr
            if mask[i, j] == 0:
                stack.pop()
                continue
            if s is None:
                s = slopes_of(i, j)
                ang = np.float32((s.astype(np.float32) ** p).sum())
                fr[2], fr[3] = s, ang
            advanced = False
            while fr[4] < 8:
                k = fr[4]
                di, dj = POS[k]
                ii, jj = i + di, j + dj
                fr[4] += 1
                if ii < 0 or jj < 0 or ii >= n0 or jj >= n1:
                    continue
                if s[k] == 0.0 or mask[ii, jj] == 0:
                    continue
                fract = np.float32(s[k] ** p) / ang
                if channeldepth[ii, jj] >= 0:
                    cd_cell[0] = channeldepth[ii, jj]
                    if channeldepth[i, j] == np.float32(UNDEF):
                        channeldepth[i, j] = 0.0
                    channeldepth[i, j] = np.float32(channeldepth[i, j] + fract * cd_cell[0])
                else:
                    # recurse first; contribution added on return
                    fr[4] -= 1
                    fr.append("pending")  # marker: on child completion add
                    stack.append([ii, jj, None, None, 0])
                    advanced = True
                    break
            if advanced:
                continue
            cd_cell[0] = channeldepth[i, j]
            stack.pop()
            if stack and len(stack[-1]) == 6 and stack[-1][5] == "pending":
                parent = stack[-1]
                parent.pop()  # clear marker
                pi, pj, ps, pang, pk = parent[0], parent[1], parent[2], parent[3], parent[4]
                fract = np.float32(ps[pk] ** p) / pang
                if channeldepth[pi, pj] == np.float32(UNDEF):
                    channeldepth[pi, pj] = 0.0
                channeldepth[pi, pj] = np.float32(channeldepth[pi, pj] + fract * cd_cell[0])
                parent[4] += 1

    for i in range(n0):
        for j in range(n1):
            if channeldepth[i, j] == np.float32(UNDEF) and mask[i, j] >= 1:
                resolve(i, j)

    out = z - channeldepth
    out[out < 0] = UNDEF
    out[mask <= 0] = UNDEF
    return out
