"""Distributed terrain operators over tiled raster Datasets.

Each reference kernel becomes a per-tile pass + (when needed) an iterative
cross-tile exchange, per SURVEY.md section 2.8:

- slope/aspect, gap-fill: ONE halo exchange + vectorized stencil.
- pit fill: per-tile priority flood + halo rounds until fixpoint (the
  block-Jacobi iteration of w = max(z, min_nbr(w)+eps); bit-identical to
  the single-node oracle because the fixpoint is path-determined).
- D8 fdir: one halo pass (global-border aware).
- accumulation: per-tile topological sweep + frontier exchange of boundary
  outflow counts until stable (exact integers).
- basins / HAND: within-tile pointer compression + tile-hop label
  propagation rounds (`flow_propagate`).
- channels: the tiny channel subgraph (area > threshold, typically <<1% of
  cells) is collected and traced with the exact sequential oracle, then
  labels are painted back via broadcast join — the documented design for
  ID-order-faithful sequential cores.

Every round materializes the tile Dataset (checkpoint) and stops on a
zero-delta aggregate. All per-cell math inside tiles is vectorized numpy;
the only shuffles are keyed by (tx, ty) and move O(perimeter) strips or
O(boundary) frontier rows, never whole tiles of halo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import kernels as K
from . import tiles as T

UNDEF = K.UNDEF
IUNDEF = K.IUNDEF
PENDING = np.int64(-123456789)


# ---------------------------------------------------------------------------
# stencils
# ---------------------------------------------------------------------------

def slope_aspect_dist(ds, N0: int, N1: int):
    """Distributed slope/aspect: halo width 1, global-border edge clamping
    (terrain_tools.f90:29-35 clamps at the GLOBAL border only)."""

    def kernel(tr, padded):
        dem = padded["dem"]
        dx = padded["dxg"]
        dy = padded["dyg"]
        i0, j0, n0, n1 = (int(tr[k]) for k in ("i0", "j0", "n0", "n1"))
        # clamp global borders: copy the edge row/col into the pad ring
        if i0 == 0:
            dem[0, :], dx[0, :], dy[0, :] = dem[1, :], dx[1, :], dy[1, :]
        if i0 + n0 == N0:
            dem[-1, :], dx[-1, :], dy[-1, :] = dem[-2, :], dx[-2, :], dy[-2, :]
        if j0 == 0:
            dem[:, 0], dx[:, 0], dy[:, 0] = dem[:, 1], dx[:, 1], dy[:, 1]
        if j0 + n1 == N1:
            dem[:, -1], dx[:, -1], dy[:, -1] = dem[:, -2], dx[:, -2], dy[:, -2]
        slope, aspect = K.slope_aspect(dem, dx, dy)
        return {"slope": slope[1:-1, 1:-1], "aspect": aspect[1:-1, 1:-1]}

    return T.halo_map(ds, ["dem", "dxg", "dyg"], kernel, width=1)


def gap_fill_dist(ds):
    """3x3 mode gap-fill on channel cells (terrain_tools.f90:825-876) with
    one halo exchange; the mode computation clamps at global borders via
    the sentinel ring (undef halo values are skipped by the kernel)."""

    def kernel(tr, padded):
        hrus = padded["hrus"]
        channels = padded["channels"]
        # reference clamps the window at borders; skipping the -9999 ring
        # is equivalent because out-of-grid cells contribute nothing
        out = K.gap_fill(hrus, channels)[1:-1, 1:-1]
        return {"hrus": out}

    return T.halo_map(ds, ["hrus", "channels"], kernel, width=1)


# ---------------------------------------------------------------------------
# pit fill (iterative halo rounds)
# ---------------------------------------------------------------------------

def _tile_fill(z: np.ndarray, ring_z: np.ndarray, ring_w: np.ndarray, eps: np.float32):
    """Exact local solve of the P&D fixpoint on one tile given current ring
    estimates. ring arrays are the padded (n0+2,n1+2) views; missing sides
    carry -9999 (== global border, which marks edge cells as boundary —
    the same rule as the oracle)."""
    import heapq

    n0, n1 = z.shape
    valid = z != UNDEF
    w = np.full((n0, n1), np.float32(np.inf), dtype=np.float32)
    w[~valid] = UNDEF
    closed = ~valid
    heap: list = []
    # boundary: own cell 8-adjacent (in padded space) to an undef value
    # (covers both real undef neighbors and missing-ring global borders)
    undef_pad = ring_z == UNDEF
    boundary = np.zeros((n0, n1), dtype=bool)
    for di, dj in K.POS:
        boundary |= undef_pad[1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1]
    boundary &= valid
    for i, j in zip(*np.nonzero(boundary)):
        w[i, j] = z[i, j]
        heapq.heappush(heap, (float(z[i, j]), int(i), int(j)))
        closed[i, j] = True
    # ring sources: finite halo w estimates
    ring = ring_w.copy()
    ring[1:-1, 1:-1] = np.inf  # only the ring matters
    for pi, pj in zip(*np.nonzero(np.isfinite(ring) & (ring != UNDEF))):
        heapq.heappush(heap, (float(ring[pi, pj]), int(pi - 1), int(pj - 1)))
    while heap:
        wv, i, j = heapq.heappop(heap)
        if 0 <= i < n0 and 0 <= j < n1:
            if wv > w[i, j]:
                continue
            src_w = w[i, j]
        else:
            src_w = np.float32(wv)
        for di, dj in K.POS:
            ii, jj = i + di, j + dj
            if ii < 0 or jj < 0 or ii >= n0 or jj >= n1 or closed[ii, jj]:
                continue
            cand = np.float32(max(z[ii, jj], np.float32(np.float32(src_w) + eps)))
            if cand < w[ii, jj]:
                w[ii, jj] = cand
                heapq.heappush(heap, (float(cand), int(ii), int(jj)))
        if 0 <= i < n0 and 0 <= j < n1:
            closed[i, j] = True
    return w


def fill_dist(ds, res: float, max_rounds: int = 1000):
    """Iterative distributed Planchon-Darboux fill. Input tiles carry
    `dem`; output carries `demns`. Rounds ~= inter-tile drainage diameter."""
    eps = np.float32(0.0001 * res)

    def init(batch: pa.Table) -> pa.Table:
        w = []
        for r in range(batch.num_rows):
            z = T.tile_payload(batch, "dem", r)
            wi = np.where(z == UNDEF, np.float32(UNDEF), np.float32(np.inf)).astype(np.float32)
            w.append(wi.ravel())
        return batch.append_column("demns", pa.array([x for x in w], type=pa.list_(pa.float32())))

    cur = ds.map_batches(init, batch_format="pyarrow").materialize()
    for _ in range(max_rounds):
        def kernel(tr, padded):
            z = np.asarray(tr["dem"], dtype=np.float32).reshape(int(tr["n0"]), int(tr["n1"]))
            new_w = _tile_fill(z, padded["dem"], padded["demns"], eps)
            old_w = np.asarray(tr["demns"], dtype=np.float32).reshape(new_w.shape)
            changed = int((new_w != old_w).sum())
            return {"demns": new_w, "n_changed": np.asarray([changed], dtype=np.int64)}

        nxt = T.halo_map(cur, ["dem", "demns"], kernel, width=1).materialize()
        total_changed = sum(
            int(np.asarray(x)[0]) for x in nxt.select_columns(["n_changed"]).to_pandas()["n_changed"]
        )
        cur = nxt.drop_columns(["n_changed"]).materialize()
        if total_changed == 0:
            break
    return cur


# ---------------------------------------------------------------------------
# D8 flow direction (one halo pass, global-border aware)
# ---------------------------------------------------------------------------

def fdir_dist(ds, res: float, N0: int, N1: int, dem_col: str = "demns"):
    def kernel(tr, padded):
        wp = padded[dem_col].astype(np.float32)
        i0, j0, n0, n1 = (int(tr[k]) for k in ("i0", "j0", "n0", "n1"))
        z = wp[1:-1, 1:-1]
        slopes = np.full((8, n0, n1), np.float32(UNDEF), dtype=np.float32)
        gi = i0 + np.arange(n0)[:, None]
        gj = j0 + np.arange(n1)[None, :]
        for p, (di, dj) in enumerate(K.POS):
            nb = wp[1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1]
            oob = (gi + di < 0) | (gi + di >= N0) | (gj + dj < 0) | (gj + dj >= N1)
            s = (z - nb) / np.float32(res)
            slopes[p] = np.where(oob, np.float32(UNDEF), s)
        smax = slopes.max(axis=0)
        amax = slopes.argmax(axis=0)
        fdir = np.full((n0, n1), -1, dtype=np.int8)
        pos_mask = smax > 0
        fdir[pos_mask] = amax[pos_mask].astype(np.int8)
        border = ~pos_mask & (slopes.min(axis=0) == UNDEF)
        first_undef = np.argmax(slopes == UNDEF, axis=0)
        fdir[border] = (first_undef[border] + 8).astype(np.int8)
        return {"fdir": fdir}

    return T.halo_map(ds, [dem_col], kernel, width=1, extra_cols=["dem"])


# ---------------------------------------------------------------------------
# D8 accumulation (frontier exchange)
# ---------------------------------------------------------------------------

def _tile_acc(fdir: np.ndarray, ext_in: np.ndarray):
    """Topological accumulation within one tile; returns (count, outflows)
    where outflows maps local boundary cells to (gdi, gdj, count) deltas
    for cells whose downstream target leaves the tile."""
    n0, n1 = fdir.shape
    down0 = np.full((n0, n1), -9, dtype=np.int64)
    down1 = np.full((n0, n1), -9, dtype=np.int64)
    k = np.where(fdir >= 0, fdir % 8, 0)
    has = (fdir >= 0) & (fdir < 8)
    down0 = np.where(has, np.arange(n0)[:, None] + K.POS_ARR[k, 0], -9)
    down1 = np.where(has, np.arange(n1)[None, :] + K.POS_ARR[k, 1], -9)
    inside = has & (down0 >= 0) & (down0 < n0) & (down1 >= 0) & (down1 < n1)
    flat_down = np.where(inside, down0 * n1 + down1, -1).ravel()
    count = (1 + ext_in.astype(np.int64)).ravel()
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
    count = count.reshape(n0, n1)
    # outflows: cells with in-grid-global target outside this tile
    out_cells = has & ~inside
    oc = np.argwhere(out_cells)
    return count, [(int(i), int(j), int(down0[i, j]), int(down1[i, j]), int(count[i, j])) for i, j in oc]


def acc_dist(ds, tile_size: int, N0: int, N1: int, max_rounds: int = 1000):
    """Iterative distributed D8 accumulation. Tiles carry `fdir`; output
    adds `acc` (int64 upstream cell count incl. self)."""

    def init(batch: pa.Table) -> pa.Table:
        e = []
        for r in range(batch.num_rows):
            n0 = batch["n0"][r].as_py()
            n1 = batch["n1"][r].as_py()
            e.append(np.zeros(n0 * n1, dtype=np.int64))
        return batch.append_column("ext_in", pa.array([x for x in e], type=pa.list_(pa.int64())))

    cur = ds.map_batches(init, batch_format="pyarrow").materialize()
    for _ in range(max_rounds):
        def emit(batch: pa.Table) -> pa.Table:
            rows = {"tx": [], "ty": [], "tag": [], "e_idx": [], "e_cnt": []}
            passthrough = {c: [] for c in batch.column_names}
            for r in range(batch.num_rows):
                fdir = T.tile_payload(batch, "fdir", r)
                ext = T.tile_payload(batch, "ext_in", r)
                i0 = int(batch["i0"][r].as_py())
                j0 = int(batch["j0"][r].as_py())
                _, outflows = _tile_acc(fdir, ext)
                agg: dict[tuple[int, int], dict[int, int]] = {}
                for (si, sj, di_loc, dj_loc, cnt) in outflows:
                    gi, gj = i0 + di_loc, j0 + dj_loc
                    if gi < 0 or gj < 0 or gi >= N0 or gj >= N1:
                        continue
                    ttx, tty = gi // tile_size, gj // tile_size
                    li, lj = gi - ttx * tile_size, gj - tty * tile_size
                    # receiver n1 may be clipped at the right edge
                    rn1 = min(tile_size, N1 - tty * tile_size)
                    d = agg.setdefault((ttx, tty), {})
                    idx = li * rn1 + lj
                    d[idx] = d.get(idx, 0) + cnt
                for (ttx, tty), d in agg.items():
                    rows["tx"].append(ttx)
                    rows["ty"].append(tty)
                    rows["tag"].append(1)
                    rows["e_idx"].append(np.asarray(sorted(d.keys()), dtype=np.int64))
                    rows["e_cnt"].append(np.asarray([d[k2] for k2 in sorted(d.keys())], dtype=np.int64))
            return pa.table(
                {
                    "tx": pa.array(rows["tx"], type=pa.int32()),
                    "ty": pa.array(rows["ty"], type=pa.int32()),
                    "tag": pa.array(rows["tag"], type=pa.int8()),
                    "e_idx": pa.array(rows["e_idx"], type=pa.list_(pa.int64())),
                    "e_cnt": pa.array(rows["e_cnt"], type=pa.list_(pa.int64())),
                }
            )

        emissions = cur.map_batches(emit, batch_format="pyarrow")

        def tag_tiles(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            recs = T.table_rows_to_dicts(b)
            for r in recs:
                r["tag"] = np.int8(0)
            return T.rows_to_table(recs)

        merged = cur.map_batches(tag_tiles, batch_format="pyarrow").union(emissions)

        def apply(g: pa.Table) -> pa.Table:
            rows = T.table_rows_to_dicts(g)
            tile_rows = [r for r in rows if r.get("tag", 1) == 0]
            if not tile_rows:
                return T.rows_to_table([])
            tr = tile_rows[0]
            n0, n1 = int(tr["n0"]), int(tr["n1"])
            new_ext = np.zeros(n0 * n1, dtype=np.int64)
            for srow in rows:
                if srow.get("tag", 1) != 1:
                    continue
                idx = np.asarray(srow["e_idx"], dtype=np.int64)
                cnt = np.asarray(srow["e_cnt"], dtype=np.int64)
                new_ext[idx] += cnt
            old_ext = np.asarray(tr["ext_in"], dtype=np.int64)
            changed = int((new_ext != old_ext).sum())
            rec = {k: int(tr[k]) for k in ("tx", "ty", "i0", "j0", "n0", "n1")}
            for c, v in tr.items():
                if c in rec or c in ("tag", "ext_in", "n_changed") or c.startswith("e_"):
                    continue
                rec[c] = v
            rec["ext_in"] = new_ext
            rec["n_changed"] = np.asarray([changed], dtype=np.int64)
            return T.rows_to_table([rec])

        nxt = merged.groupby(["tx", "ty"]).map_groups(apply, batch_format="pyarrow").materialize()
        total_changed = sum(
            int(np.asarray(x)[0]) for x in nxt.select_columns(["n_changed"]).to_pandas()["n_changed"]
        )
        cur = nxt.drop_columns(["n_changed"]).materialize()
        if total_changed == 0:
            break

    def finalize(batch: pa.Table) -> pa.Table:
        acc = []
        for r in range(batch.num_rows):
            fdir = T.tile_payload(batch, "fdir", r)
            ext = T.tile_payload(batch, "ext_in", r)
            count, _ = _tile_acc(fdir, ext)
            acc.append(count.ravel())
        out = batch.append_column("acc", pa.array([x for x in acc], type=pa.list_(pa.int64())))
        return out.drop_columns(["ext_in"])

    return cur.map_batches(finalize, batch_format="pyarrow")


def area_from_acc(ds, res: float, mask_col: str = "landmask"):
    """area = res^2 * count; undef where mask==0 or fdir nodata
    (terrain_tools.f90:240-249)."""

    def apply(batch: pa.Table) -> pa.Table:
        out = []
        for r in range(batch.num_rows):
            acc = T.tile_payload(batch, "acc", r).astype(np.float32)
            fdir = T.tile_payload(batch, "fdir", r)
            m = T.tile_payload(batch, mask_col, r)
            area = (np.float32(res) * np.float32(res) * acc).astype(np.float32)
            area[m == 0] = UNDEF
            area[fdir == -1] = UNDEF
            out.append(area.ravel())
        return batch.append_column("area", pa.array([x for x in out], type=pa.list_(pa.float32())))

    return ds.map_batches(apply, batch_format="pyarrow")
