"""Tiled raster tables + halo exchange — the engine's raster data model.

The reference holds whole rasters in driver RAM (raster_data,
libraries/gdal_tools.py:60-115). Here a raster is a Ray Dataset with one
row per tile:

    tiles(tx:int32, ty:int32, i0:int32, j0:int32, n0:int32, n1:int32,
          <payload>: list<T>  # row-major n0*n1 values per tile
          ...)

Stencil stages need neighbor edge values: `exchange_halo` emits per-tile
edge strips keyed by the receiving tile (a map_batches), then groups
strips with their target tile (ONE shuffle keyed by (tx,ty)) and
assembles padded arrays inside map_groups. Tile size is chosen so a padded
float32 tile stays well under the block target (SURVEY.md section 4;
`suggest_tile_size` computes it from the block target and column count).

Note on the per-row Python in this module (table_rows_to_dicts,
rows_to_table, the loops in emit_halo_strips): a ROW here is a whole
tile — 262,144 cells at the production 512^2 size — so the Python-level
iteration is per-tile (coarse), and every per-cell operation inside it is
a vectorized numpy/Arrow kernel on the tile's contiguous payload buffer.
This is the granularity rule, not a hot-path row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SENTINEL = {
    np.float32: np.float32(-9999.0),
    np.float64: np.float64(np.nan),
    np.int32: np.int32(-9999),
    np.int8: np.int8(-1),
    np.int64: np.int64(-9999),
}

ARROW_T = {
    np.float32: pa.float32(),
    np.float64: pa.float64(),
    np.int32: pa.int32(),
    np.int8: pa.int8(),
    np.int64: pa.int64(),
}


def grid_to_tiles_table(grids: dict[str, np.ndarray], tile: int) -> pa.Table:
    """Split whole-grid numpy arrays (same shape) into one Arrow tile table."""
    shapes = {g.shape for g in grids.values()}
    assert len(shapes) == 1
    N0, N1 = shapes.pop()
    ntx = (N0 + tile - 1) // tile
    nty = (N1 + tile - 1) // tile
    rows = {k: [] for k in ("tx", "ty", "i0", "j0", "n0", "n1", "ntx", "nty")}
    payload: dict[str, list] = {k: [] for k in grids}
    for ti, i0 in enumerate(range(0, N0, tile)):
        for tj, j0 in enumerate(range(0, N1, tile)):
            n0 = min(tile, N0 - i0)
            n1 = min(tile, N1 - j0)
            rows["tx"].append(ti)
            rows["ty"].append(tj)
            rows["i0"].append(i0)
            rows["j0"].append(j0)
            rows["n0"].append(n0)
            rows["n1"].append(n1)
            rows["ntx"].append(ntx)
            rows["nty"].append(nty)
            for k, g in grids.items():
                payload[k].append(g[i0 : i0 + n0, j0 : j0 + n1].ravel())
    cols = {k: pa.array(v, type=pa.int32()) for k, v in rows.items()}
    for k, g in grids.items():
        cols[k] = pa.array([np.asarray(x) for x in payload[k]], type=pa.list_(ARROW_T[g.dtype.type]))
    return pa.table(cols)


def tiles_to_grid(table: pa.Table, col: str, dtype=None) -> np.ndarray:
    """Reassemble a whole grid from a tile table (small results / tests)."""
    tx = table["tx"].to_numpy(zero_copy_only=False)
    i0 = table["i0"].to_numpy(zero_copy_only=False)
    j0 = table["j0"].to_numpy(zero_copy_only=False)
    n0 = table["n0"].to_numpy(zero_copy_only=False)
    n1 = table["n1"].to_numpy(zero_copy_only=False)
    col_arr = table[col].combine_chunks()
    # Arrow buffer + value type: to_pylist() materialized Python objects
    # and silently widened float32 payloads to float64 grids
    flat = col_arr.flatten().to_numpy(zero_copy_only=False)
    if pa.types.is_fixed_size_list(col_arr.type):
        offs = np.arange(len(col_arr) + 1, dtype=np.int64) * col_arr.type.list_size
    else:
        offs = col_arr.offsets.to_numpy(zero_copy_only=False)
    N0 = int((i0 + n0).max())
    N1 = int((j0 + n1).max())
    grid = np.zeros((N0, N1), dtype=dtype or flat.dtype)
    for r in range(len(tx)):
        grid[i0[r] : i0[r] + n0[r], j0[r] : j0[r] + n1[r]] = flat[offs[r] : offs[r + 1]].reshape(n0[r], n1[r])
    return grid


def collect_grid(ds, col: str, dtype=None) -> np.ndarray:
    """Reassemble a whole grid from a tile Dataset (tests / small results).
    Handles both Arrow- and pandas-backed blocks."""
    df = ds.to_pandas()
    N0 = int((df["i0"] + df["n0"]).max())
    N1 = int((df["j0"] + df["n1"]).max())
    first = np.asarray(df[col].iloc[0])
    grid = np.zeros((N0, N1), dtype=dtype or first.dtype)
    for _, r in df.iterrows():
        grid[int(r["i0"]) : int(r["i0"]) + int(r["n0"]), int(r["j0"]) : int(r["j0"]) + int(r["n1"])] = np.asarray(
            r[col]
        ).reshape(int(r["n0"]), int(r["n1"]))
    return grid


def tile_payload(batch: pa.Table, col: str, row: int) -> np.ndarray:
    n0 = int(batch["n0"][row].as_py())
    n1 = int(batch["n1"][row].as_py())
    cell = batch[col][row]
    try:
        arr = cell.values.to_numpy(zero_copy_only=False)
    except AttributeError:  # Ray's ArrowTensorScalar (uniform-length lists)
        arr = np.asarray(cell.as_py())
    return arr.reshape(n0, n1)


def suggest_tile_size(n_payload_cols: int, dtype_bytes: int = 4, halo: int = 1, target_bytes: int | None = None) -> int:
    """Largest power-of-two tile side such that a few padded tiles fit one
    Ray block (default target: DataContext.target_max_block_size, 128 MiB).
    Bigger tiles amortize halo-round fixed costs (measured: per-cell cost
    FALLS 2-3x per tile-size doubling on the fill/acc chain, BASELINE.md);
    the block target is the ceiling — a batch of ~4 padded tiles x
    concurrency must fit the worker heap."""
    if target_bytes is None:
        from ray.data import DataContext

        target_bytes = DataContext.get_current().target_max_block_size or (128 << 20)
    budget = target_bytes // 4  # ~4 tiles per block
    side = 64
    while True:
        nxt = side * 2
        if (nxt + 2 * halo) ** 2 * dtype_bytes * max(1, n_payload_cols) > budget or nxt > 8192:
            return side
        side = nxt


def make_tiles_dataset(grids: dict[str, np.ndarray], tile: int, parallelism: int | None = None):
    import ray.data as rd

    t = grid_to_tiles_table(grids, tile)
    ds = rd.from_arrow(t)
    if parallelism:
        ds = ds.repartition(parallelism)
    return ds


def emit_halo_strips(batch: pa.Table, cols: list[str], width: int = 1) -> pa.Table:
    """For every tile row, emit up to 8 strip rows addressed to neighbor
    tiles: (tx, ty) of the RECEIVER, the direction it arrives from, and the
    strip payloads. Receiver-side assembly pads its own array."""
    out = {
        "tx": [], "ty": [], "dir0": [], "dir1": [], "sn0": [], "sn1": [], "tag": [],
        **{f"s_{c}": [] for c in cols},
    }
    n = batch.num_rows
    txs = batch["tx"].to_numpy(zero_copy_only=False)
    tys = batch["ty"].to_numpy(zero_copy_only=False)
    # grid extent in tiles (when tagged by grid_to_tiles_table): strips
    # addressed off-grid would otherwise create empty groupby groups —
    # one wasted task each, per round, and a schema-polluting empty block
    have_ext = "ntx" in batch.column_names
    ntxs = batch["ntx"].to_numpy(zero_copy_only=False) if have_ext else None
    ntys = batch["nty"].to_numpy(zero_copy_only=False) if have_ext else None
    for r in range(n):
        arrs = {c: tile_payload(batch, c, r) for c in cols}
        n0, n1 = next(iter(arrs.values())).shape
        for d0 in (-1, 0, 1):
            for d1 in (-1, 0, 1):
                if d0 == 0 and d1 == 0:
                    continue
                rx, ry = txs[r] + d0, tys[r] + d1
                if rx < 0 or ry < 0:
                    continue
                if have_ext and (rx >= ntxs[r] or ry >= ntys[r]):
                    continue
                s0 = slice(0, width) if d0 < 0 else (slice(n0 - width, n0) if d0 > 0 else slice(0, n0))
                s1 = slice(0, width) if d1 < 0 else (slice(n1 - width, n1) if d1 > 0 else slice(0, n1))
                out["tx"].append(rx)
                out["ty"].append(ry)
                out["dir0"].append(-d0)  # direction relative to receiver
                out["dir1"].append(-d1)
                strip0 = arrs[cols[0]][s0, s1]
                out["sn0"].append(strip0.shape[0])
                out["sn1"].append(strip0.shape[1])
                out["tag"].append(1)  # strip marker
                for c in cols:
                    out[f"s_{c}"].append(arrs[c][s0, s1].ravel())
    tbl = {
        "tx": pa.array(out["tx"], type=pa.int32()),
        "ty": pa.array(out["ty"], type=pa.int32()),
        "dir0": pa.array(out["dir0"], type=pa.int8()),
        "dir1": pa.array(out["dir1"], type=pa.int8()),
        "sn0": pa.array(out["sn0"], type=pa.int32()),
        "sn1": pa.array(out["sn1"], type=pa.int32()),
        "tag": pa.array(out["tag"], type=pa.int8()),
    }
    for c in cols:
        t = batch[c].type
        # Ray may have converted uniform lists to its tensor extension type
        src = t.value_type if hasattr(t, "value_type") else t.scalar_type if hasattr(t, "scalar_type") else pa.from_numpy_dtype(np.asarray(out[f"s_{c}"][0]).dtype)
        tbl[f"s_{c}"] = pa.array([np.asarray(x) for x in out[f"s_{c}"]], type=pa.list_(src))
    return pa.table(tbl)


def assemble_padded(tile_row: dict, strips: list[dict], cols: list[str], width: int, fill: dict):
    """Build padded arrays (n0+2w, n1+2w) for one tile from its strip rows.
    Missing neighbors (global border) stay at `fill[col]`."""
    n0, n1 = int(tile_row["n0"]), int(tile_row["n1"])
    out = {}
    for c in cols:
        base = np.asarray(tile_row[c]).reshape(n0, n1)
        pad = np.full((n0 + 2 * width, n1 + 2 * width), fill[c], dtype=base.dtype)
        pad[width : width + n0, width : width + n1] = base
        out[c] = pad
    for s in strips:
        d0, d1 = int(s["dir0"]), int(s["dir1"])
        sn0, sn1 = int(s["sn0"]), int(s["sn1"])
        if d0 < 0:
            # a neighbor smaller than the halo sends its whole extent;
            # place it flush against the shared edge
            r0 = slice(width - sn0, width)
        elif d0 > 0:
            r0 = slice(width + n0, width + n0 + sn0)
        else:
            r0 = slice(width, width + sn0)
        if d1 < 0:
            r1 = slice(width - sn1, width)
        elif d1 > 0:
            r1 = slice(width + n1, width + n1 + sn1)
        else:
            r1 = slice(width, width + sn1)
        for c in cols:
            arr = np.asarray(s[f"s_{c}"]).reshape(sn0, sn1)
            out[c][r0, r1] = arr
    return out


def table_rows_to_dicts(g: pa.Table) -> list[dict]:
    """Group table -> list of row dicts with numpy payloads (handles both
    list-typed and Ray tensor-extension columns)."""
    out = []
    for r in range(g.num_rows):
        row = {}
        for c in g.column_names:
            cell = g[c][r]
            try:
                row[c] = cell.values.to_numpy(zero_copy_only=False)
            except AttributeError:
                v = cell.as_py()
                row[c] = np.asarray(v) if isinstance(v, (list, np.ndarray)) else v
        out.append(row)
    return out


def rows_to_table(recs: list[dict]) -> pa.Table:
    """Rows (scalars + numpy payload arrays) -> Arrow table with explicit
    int32 tile metadata and list-typed payloads (no tensor extension, no
    dtype drift)."""
    if not recs:
        return pa.table({"tx": pa.array([], type=pa.int32())})
    cols = {}
    for c in recs[0]:
        vals = [r[c] for r in recs]
        if isinstance(vals[0], np.ndarray):
            cols[c] = pa.array([np.asarray(v).ravel() for v in vals], type=pa.list_(pa.from_numpy_dtype(np.asarray(vals[0]).dtype)))
        elif c in ("tx", "ty", "i0", "j0", "n0", "n1", "ntx", "nty"):
            cols[c] = pa.array([int(v) for v in vals], type=pa.int32())
        else:
            cols[c] = pa.array(vals)
    return pa.table(cols)


def halo_map(ds, cols: list[str], kernel, width: int = 1):
    """Distributed stencil: one halo shuffle keyed by (tx,ty), then apply
    `kernel(tile_row_dict, padded_dict) -> dict of new payload columns`
    per tile. Returns a tile Dataset with the kernel's output columns
    merged in — ALL non-halo tile columns pass through automatically.
    The only data movement is O(perimeter) strips."""
    strips = ds.map_batches(lambda b: emit_halo_strips(b, cols, width), batch_format="pyarrow")

    def tag_tiles(b: pa.Table) -> pa.Table:
        # normalize payload columns to plain list type so the union schema
        # is stable, and tag tile rows with 0
        if b.num_rows == 0:
            return b
        recs = table_rows_to_dicts(b)
        for r in recs:
            r["tag"] = np.int8(0)
        return rows_to_table(recs)

    tiles_tagged = ds.map_batches(tag_tiles, batch_format="pyarrow")
    merged = tiles_tagged.union(strips)
    fill = {}

    def per_tile(g: pa.Table) -> pa.Table:
        rows = table_rows_to_dicts(g)
        tile_rows = [r for r in rows if r.get("tag", 1) == 0]
        if not tile_rows:
            return rows_to_table([])  # strips addressed off-grid
        tr = tile_rows[0]
        strip_rows = [r for r in rows if r.get("tag", 1) == 1]
        if not fill:
            for c in cols:
                fill[c] = SENTINEL[np.asarray(tr[c]).dtype.type]
        padded = assemble_padded(tr, strip_rows, cols, width, fill)
        new_cols = kernel(tr, padded)
        rec = {k: int(tr[k]) for k in ("tx", "ty", "i0", "j0", "n0", "n1")}
        for c, v in tr.items():
            if c in rec or c == "tag" or c in new_cols or c.startswith("s_") or c in ("dir0", "dir1", "sn0", "sn1"):
                continue
            rec[c] = v
        for k, v in new_cols.items():
            rec[k] = np.asarray(v).ravel() if np.asarray(v).ndim else v
        return rows_to_table([rec])

    return merged.groupby(["tx", "ty"]).map_groups(per_tile, batch_format="pyarrow")
