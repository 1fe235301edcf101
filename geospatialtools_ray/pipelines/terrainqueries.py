"""Round-3 driver queries: the previously pytest-only operators get
driver-green coverage (VERDICT r2 item 1). Each query runs the DISTRIBUTED
operator over the deterministic terrain fixtures (or the testdata tables)
and compares against a single-process twin staged by
pipelines/oracle_fixtures.py — or, where SQL can express the op exactly
(FAO texture, min-max normalize), against pure DuckDB SQL.

Reference parity: src/terrain_tools.f90:13-54 (slope/aspect), :303-414
(acc_wipoints), :517-746 (MFD), :825-876 (gap fill), :1750-1789 (CCL);
libraries/terrain_tools.py:340-392 (basin props), :1090-1313 (HRU chain),
:1634-1664 (channel props), :789-859 (nd histogram);
libraries/pedotransfer.py:85-114 (FAO texture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import oracle_fixtures as OF


def _read(sf_dir: str, table: str, columns=None):
    from .. import io

    return io.read_named(sf_dir, table, columns=columns)


N, RES, TILE = 32, 30.0, 16


def _cells_df(tiles_ds, cols):
    from ..terrain import properties as P

    return P.tiles_to_cells(tiles_ds, cols).to_pandas().sort_values(["gi", "gj"]).reset_index(drop=True)


def terrain_mfd_stats(sf_dir: str):
    """Full distributed chain (fill -> fdir -> acc -> channels) feeding MFD
    accumulation + MFD HAND; per-cell quantized table (bit-identical f32
    on both sides -> exact integer compare)."""
    OF.stage_terrain_mfd_cells(sf_dir)
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import tiles as T

    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    ds = T.make_tiles_dataset({"dem": z.astype(np.float32), "landmask": mask.astype(np.int32)}, TILE)
    filled = D.fill_dist(ds, RES)
    fd = D.fdir_dist(filled, RES, N, N)
    ac = D.acc_dist(fd, TILE, N, N)
    ar = D.area_from_acc(ac, RES)
    chds, _ = D.channels_dist(ar, 8 * RES * RES, 16 * RES * RES, N, N)
    # default halo = tile size: rounds equal the dependency chain's
    # tile-crossing count (halo-independent bits, asserted in pytest)
    mfd = D.mfd_acc_dist(chds, RES, 1.1, N, N)
    out = D.hand_mfd_dist(mfd, 1, RES, N, N)
    df = _cells_df(out, ["mfdacc", "handmfd"])
    hv = df["handmfd"].to_numpy(dtype=np.float64)
    valid = df["handmfd"].to_numpy(dtype=np.float32) != np.float32(K.UNDEF)
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "mfd_mm": np.round(df["mfdacc"].to_numpy(dtype=np.float64) * 1000.0).astype(np.int64),
            "handmfd_mm": np.where(valid, np.round(hv * 1000.0), 0).astype(np.int64),
            "hand_valid": valid.astype(np.int64),
        }
    )


def terrain_polygonize(sf_dir: str):
    """Distributed CCL (per-tile scan labels + join/min-label cross-tile
    merge) vs the whole-grid scan-order kernel."""
    OF.stage_terrain_polygonize(sf_dir)
    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import tiles as T

    v = OF.polygonize_values_grid(N)
    ds = T.make_tiles_dataset({"values": v}, TILE)
    out = D.polygonize_dist(ds, "values")
    df = _cells_df(out, ["pids"])
    p = df["pids"].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "pid": np.where(p == K.UNDEF, -1, p).astype(np.int64),
        }
    )


def terrain_acc_wipoints(sf_dir: str):
    """Distributed interest-point accumulation (closure expansion +
    sequential core) vs the literal kernel."""
    OF.stage_terrain_acc_wipoints(sf_dir)
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import tiles as T

    dem, mask = synth.dem_grid("rough", N)
    dem = dem.astype(np.float32)
    maski = mask.astype(np.int32)
    ip = np.full((N, N), K.IUNDEF, dtype=np.int64)
    for k2, (i, j) in enumerate(OF.WIPOINT_SEEDS):
        ip[i, j] = k2
    ds = T.make_tiles_dataset({"dem": dem, "landmask": maski, "ipoints": ip}, TILE)
    out = D.acc_wipoints_dist(ds, RES, N, N)
    df = _cells_df(out, ["area_wip", "fdir"])
    av = df["area_wip"].to_numpy(dtype=np.float64)
    valid = df["area_wip"].to_numpy(dtype=np.float32) != np.float32(K.UNDEF)
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "area_mm": np.where(valid, np.round(av * 1000.0), -1).astype(np.int64),
            "fdir": df["fdir"].astype("int64"),
        }
    )


def terrain_slope_aspect(sf_dir: str):
    """Distributed slope/aspect (1-halo, global-border clamp) vs kernel."""
    OF.stage_terrain_slope_aspect(sf_dir)
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import tiles as T

    z, _ = synth.dem_grid("rough", N)
    z = z.astype(np.float32)
    dx = np.full((N, N), 30.0, dtype=np.float32)
    dy = np.full((N, N), 31.0, dtype=np.float32)
    ds = T.make_tiles_dataset({"dem": z, "dxg": dx, "dyg": dy}, TILE)
    out = D.slope_aspect_dist(ds, N, N)
    df = _cells_df(out, ["slope", "aspect"])
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "slope_um": np.round(df["slope"].to_numpy(dtype=np.float64) * 1e6).astype(np.int64),
            "aspect_um": np.round(df["aspect"].to_numpy(dtype=np.float64) * 1e6).astype(np.int64),
        }
    )


def terrain_acc_neighbors(sf_dir: str):
    """Distributed calculate_d8_acc_neighbors (terrain_tools.f90:443-515)
    vs the literal-parity kernel: sqrt2 fdir_dist over the raw dem + a
    1-halo upstream-count scatter multiplied by the cell's own variable
    (the reference's variable(i,j) quirk)."""
    OF.stage_terrain_acc_neighbors(sf_dir)
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import tiles as T

    z, _ = synth.dem_grid("rough", N)
    var = (np.arange(N * N, dtype=np.float64) + 1.0).reshape(N, N)
    ds = T.make_tiles_dataset({"dem": z.astype(np.float32), "var": var}, TILE)
    out = D.acc_neighbors_dist(ds, RES, N, N)
    df = _cells_df(out, ["accn"])
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "accn": np.round(df["accn"].to_numpy(dtype=np.float64)).astype(np.int64),
        }
    )


def terrain_acc_pfdir(sf_dir: str):
    """Distributed calculate_d8_acc_pfdir (terrain_tools.f90:253-301):
    tiles carry a PRESCRIBED fdir (nodata patch + mask hole) straight into
    acc_dist + area_from_acc — no fdir stage anywhere in the distributed
    path — vs the d8_accumulate kernel twin."""
    OF.stage_terrain_acc_pfdir(sf_dir)
    from ..terrain import dist as D
    from ..terrain import tiles as T

    fdir, mask = OF.acc_pfdir_inputs(N, RES)
    ds = T.make_tiles_dataset({"fdir": fdir, "landmask": mask}, TILE)
    out = D.area_from_acc(D.acc_dist(ds, TILE, N, N), RES)
    df = _cells_df(out, ["area"])
    av = df["area"].to_numpy(dtype=np.float64)
    valid = av != -9999.0
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "area_m2": np.where(valid, np.round(av), -1).astype(np.int64),
        }
    )


def terrain_assign_clusters(sf_dir: str):
    """Distributed assign_clusters paint-back (terrain_tools.f90:1727-1748):
    per-label lookup vector broadcast once via the map closure, tile-local
    apply (no halo, no shuffle) vs the kernel twin."""
    OF.stage_terrain_assign_clusters(sf_dir)
    from ..terrain import dist as D
    from ..terrain import tiles as T

    lab, clusters = OF.assign_clusters_inputs(N)
    ds = T.make_tiles_dataset({"lab": lab}, TILE)
    out = D.assign_clusters_dist(ds, clusters)
    df = _cells_df(out, ["cluster"])
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "cluster": df["cluster"].astype("int64"),
        }
    )


def terrain_gap_fill(sf_dir: str):
    """Distributed 3x3 mode gap-fill (1-halo) vs kernel."""
    OF.stage_terrain_gap_fill(sf_dir)
    from ..terrain import dist as D
    from ..terrain import tiles as T

    hrus, ch = OF.gap_fill_inputs(N)
    ds = T.make_tiles_dataset({"hrus": hrus, "channels": ch}, TILE)
    out = D.gap_fill_dist(ds)
    df = _cells_df(out, ["hrus"])
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "hru": df["hrus"].astype("int64"),
        }
    )


def terrain_basin_props(sf_dir: str):
    """Distributed per-basin raw means (partial sums in map_batches ->
    small groupby) vs single-process means."""
    OF.stage_terrain_basin_props(sf_dir)
    from ..terrain import properties as P
    from ..terrain import tiles as T

    w, slope, _, hillslopes, _ = OF.hru_chain_inputs(N, RES)
    ds = T.make_tiles_dataset({"basins": hillslopes, "demns": w, "slope": slope}, TILE)
    cells = P.tiles_to_cells(ds, ["basins", "demns", "slope"]).filter(lambda r: r["basins"] > 0)
    got = P.basin_properties(cells, "basins", ["demns", "slope"])
    got["demns"] = got["demns"].round(6)
    got["slope"] = got["slope"].round(6)
    return got.sort_values("bid").reset_index(drop=True)


def terrain_channel_props(sf_dir: str):
    """Distributed per-channel aggregation + topology re-index vs the
    reference formula applied single-process."""
    OF.stage_terrain_channel_props(sf_dir)
    from ..terrain import kernels as K
    from ..terrain import properties as P
    from ..terrain import tiles as T

    w, _, _, ch, _, _, maski = OF._terrain_single_node(N, RES)
    area, fdir = K.d8_area(w, maski, RES)
    ch2, _, topo = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=maski)
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    ds = T.make_tiles_dataset({"channels": ch2.astype(np.int64), "slope": slope}, TILE)
    cells = P.tiles_to_cells(ds, ["channels", "slope"])
    got = P.channel_properties(cells, topo, eares=RES * RES)
    got["slope"] = got["slope"].round(6)
    got["down_cid"] = got["down_cid"].astype("int64")
    return got.sort_values("cid").reset_index(drop=True)


def terrain_hru_properties(sf_dir: str):
    """Full HRU chain: per-(hillslope, elevation-tile) KMeans HRUs
    (groupby.map_groups + sequential offsets), per-HRU properties with the
    HAND ecdf (map_groups), then the shared Pelletier assign + curate
    post-steps. Oracle: independent scan-order single-process twin."""
    OF.stage_terrain_hru_properties(sf_dir)
    from ray.data.aggregate import Max, Min

    from ..terrain import properties as P
    from ..terrain import tiles as T

    w, slope, hand, hillslopes, htiles = OF.hru_chain_inputs(N, RES)
    grids = {"hillslopes": hillslopes, "tiles": htiles, "slope": slope, "hand": hand, "demns": w}
    ds = T.make_tiles_dataset(grids, TILE)
    cells = P.tiles_to_cells(ds, list(grids)).filter(
        lambda r: r["hillslopes"] > 0 and r["tiles"] != -9999
    )
    agg = cells.aggregate(Min("demns"), Max("demns"), Max("slope"))
    ranges = {
        "demns": (float(agg["min(demns)"]), float(agg["max(demns)"])),
        "slope": (0.0, float(agg["max(slope)"])),
    }
    hru_ds0 = P.create_hrus_grouped(cells, ["demns", "slope"], ranges, nclusters=2)
    # paint HRU ids back onto the cell covariates with the engine's
    # large-large path: a hash-partitioned Dataset join on the packed cell
    # key (pipelines/joins.py). At 100 TB both sides shuffle on gpos; at
    # fixture scale the same code runs with a handful of partitions. Both
    # sides stay Datasets end-to-end (round-3 ask: no driver round-trip).
    from . import joins as J

    def with_gpos(b: pa.Table) -> pa.Table:
        gi = b["gi"].to_numpy(zero_copy_only=False).astype(np.int64)
        gj = b["gj"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("gpos", pa.array(gi * N + gj, type=pa.int64()))

    hru_ds = hru_ds0.map_batches(with_gpos, batch_format="pyarrow").select_columns(["gpos", "hru"])
    joined = J.hash_join(
        cells.map_batches(with_gpos, batch_format="pyarrow"), hru_ds, on="gpos", num_partitions=4
    ).materialize()  # consumed by both hru_properties and the tile lookup
    cells2 = joined.select_columns(["hru", "hillslopes", "slope", "hand"]).map_batches(
        lambda b: b.rename_columns(["hrus", "hillslopes", "slope", "hand"]), batch_format="pyarrow"
    )
    props = P.hru_properties(cells2, RES)
    # per-HRU tile id via a small groupby aggregate (each HRU lives inside
    # one (hillslope, tile) group, so Min == the tile) — no cell collect.
    tile_of = (
        joined.select_columns(["hru", "tiles"])
        .groupby("hru")
        .aggregate(Min("tiles", alias_name="tile_id"))
        .to_pandas()
        .set_index("hru")["tile_id"]
    )
    props["tile_id"] = props["hru"].map(tile_of).astype("int64")
    return OF.finalize_hru_table(props, hillslopes, hand)


def events_nd_histogram(sf_dir: str, nbins=(8, 6)):
    """Distributed n-d histogram: global min/max aggregate -> broadcast
    equal-width edges -> vectorized bin-assign + partial counts -> tiny
    groupby. Oracle: np.histogramdd twin."""
    OF.stage_events_nd_histogram(sf_dir, nbins)
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.cluster import nd_histogram_assign, nd_histogram_edges_from_bounds

    ds = _read(sf_dir, "events", ["value", "user_id"])
    agg = ds.aggregate(Min("value"), Max("value"), Min("user_id"), Max("user_id"))
    # shared edge formula (one place for the lo==hi nudge) — the oracle
    # fixture builds its edges through the same helper
    edges = nd_histogram_edges_from_bounds(
        [(agg["min(value)"], agg["max(value)"]), (agg["min(user_id)"], agg["max(user_id)"])],
        list(nbins),
    )

    def partial(batch: pa.Table) -> pa.Table:
        a = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = nd_histogram_assign([a, b], edges)
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"bin_id": pa.array(u, type=pa.int64()), "n": pa.array(c, type=pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin_id")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["bin_id"] = out["bin_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bin_id").reset_index(drop=True)


def soil_fao_texture(sf_dir: str):
    """FAO nearest-centroid texture class over derived (sand, clay, silt);
    oracle = the same argmin expressed in pure SQL (cross join + window)."""
    from ..functions.soil import fao_soil_texture

    ds = _read(sf_dir, "part", ["p_partkey"])

    def apply(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sand = (k % 101).astype(np.float64)
        clay = ((k * 7) % 89).astype(np.float64)
        silt = ((k * 13) % 97).astype(np.float64)
        cls = fao_soil_texture(sand, clay, silt)
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "texture_class": pa.array(cls.astype(np.int64)),
            }
        )

    df = ds.map_batches(apply, batch_format="pyarrow").to_pandas()
    return df.sort_values("p_partkey").reset_index(drop=True)


SOIL_FAO_TEXTURE_SQL = """
WITH s AS (
  SELECT p_partkey,
         CAST(p_partkey % 101 AS DOUBLE) AS sand,
         CAST((p_partkey*7) % 89 AS DOUBLE) AS clay,
         CAST((p_partkey*13) % 97 AS DOUBLE) AS silt
  FROM part
), c(id, csand, cclay, csilt) AS (
  VALUES (1, 83.0, 9.0, 8.0), (2, 37.0, 30.0, 33.0), (3, 17.0, 67.0, 17.0),
         (4, 60.0, 20.0, 20.0), (5, 50.0, 38.0, 12.0), (6, 27.0, 48.0, 25.0),
         (7, 46.0, 35.0, 19.0)
), d AS (
  SELECT p_partkey, id,
         (sand-csand)*(sand-csand) + (clay-cclay)*(clay-cclay) + (silt-csilt)*(silt-csilt) AS d2
  FROM s CROSS JOIN c
), r AS (
  SELECT p_partkey, id, ROW_NUMBER() OVER (PARTITION BY p_partkey ORDER BY d2, id) AS rn
  FROM d
)
SELECT p_partkey, CAST(id AS BIGINT) AS texture_class
FROM r WHERE rn = 1 ORDER BY p_partkey
"""


def docs_normalize(sf_dir: str):
    """Global min-max normalize of a column (normalize_variable): two-phase
    Min/Max aggregate -> broadcast -> vectorized map; oracle = the same
    IEEE expression as a SQL window."""
    from ..functions.geometry import normalize_stage

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = normalize_stage(ds, "n_chars")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    return df[["doc_id", "n_chars", "n_chars_norm"]]


DOCS_NORMALIZE_SQL = """
SELECT doc_id, n_chars,
       (CAST(n_chars AS DOUBLE) - CAST(MIN(n_chars) OVER () AS DOUBLE))
       / (CAST(MAX(n_chars) OVER () AS DOUBLE) - CAST(MIN(n_chars) OVER () AS DOUBLE)) AS n_chars_norm
FROM documents ORDER BY doc_id
"""


def events_shape_functions(sf_dir: str):
    """frelief/fwidth/fslope (hillslope shape fits, reference
    libraries/terrain_tools.py width/relief/slope closures) applied over a
    globally min-max-normalized column; oracle = the SAME IEEE expression
    in SQL (POWER composes identically through glibc pow on both
    engines), quantized by the shared sql_round convention."""
    from ..functions import geometry as G
    from ..numerics import sql_round

    A, B = 2.5, 1.5
    ds = _read(sf_dir, "events", ["event_id", "value"])
    ds = G.normalize_stage(ds, "value")

    def apply(batch: pa.Table) -> pa.Table:
        x = batch["value_norm"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "relief_um": pa.array(sql_round(G.frelief(x, A, B) * 1e6).astype(np.int64)),
                "width_um": pa.array(sql_round(G.fwidth(x, A) * 1e6).astype(np.int64)),
                "slope_um": pa.array(sql_round(G.fslope(x, A, B) * 1e6).astype(np.int64)),
            }
        )

    df = ds.map_batches(apply, batch_format="pyarrow").to_pandas()
    df = df.sort_values("event_id").reset_index(drop=True)
    df["event_id"] = df["event_id"].astype("int64")
    return df


EVENTS_SHAPE_FUNCTIONS_SQL = """
WITH n AS (
  SELECT event_id,
         (value - MIN(value) OVER ()) / (MAX(value) OVER () - MIN(value) OVER ()) AS x
  FROM events
)
SELECT event_id,
       CAST(ROUND((1 - POWER(1 - POWER(x, 2.5), 1.5)) * 1e6) AS BIGINT) AS relief_um,
       CAST(ROUND((1 + 2.5 * x) * 1e6) AS BIGINT) AS width_um,
       CAST(ROUND((2.5 + 1.5 * x) * 1e6) AS BIGINT) AS slope_um
FROM n ORDER BY event_id
"""


def terrain_chain_prod(sf_dir: str):
    """Production-shape driver query (VERDICT r3 ask #3): the full
    distributed D8 chain (fill -> fdir -> acc -> channels -> basins ->
    HAND) at a MANY-TILE layout — 256^2 DEM / 64^2 tiles (4x4 = 16 tiles)
    at sf0.01+, 96^2 / 32^2 (3x3) under the sf0.001 smoke gate — so the
    DuckDB-hash channel exercises cross-tile halo exchange, frontier
    rounds, and label propagation at shape, not the 2x2 of the other
    fixtures. Per-cell quantized compare: every column is bit-identical
    f32 between the tiled chain and the single-node kernels
    (src/terrain_tools.f90:171-1725)."""
    OF.stage_terrain_chain_prod(sf_dir)
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import tiles as T

    Np, TILEp = OF.prod_shape(sf_dir)
    dem, mask = synth.dem_grid("twovalley", Np)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    ds = T.make_tiles_dataset({"dem": z.astype(np.float32), "landmask": mask.astype(np.int32)}, TILEp)
    filled = D.fill_dist(ds, RES)
    fd = D.fdir_dist(filled, RES, Np, Np)
    ac = D.acc_dist(fd, TILEp, Np, Np)
    ar = D.area_from_acc(ac, RES)
    chds, _ = D.channels_dist(ar, 8 * RES * RES, 16 * RES * RES, Np, Np)
    bds = D.basins_dist(chds, Np, Np)
    hds = D.hand_dist(bds, Np, Np)

    def cellrows(batch: pa.Table) -> pa.Table:
        from ..terrain import tiles as T2

        cols = {k: [] for k in ("gi", "gj", "basin", "channel", "acc_mm", "hand_mm", "hand_valid")}
        for r in range(batch.num_rows):
            i0 = int(batch["i0"][r].as_py())
            j0 = int(batch["j0"][r].as_py())
            b = T2.tile_payload(batch, "basins", r)
            c = T2.tile_payload(batch, "channels", r)
            a = T2.tile_payload(batch, "area", r)
            h = T2.tile_payload(batch, "hand", r)
            n0, n1 = b.shape
            gi = (i0 + np.arange(n0)[:, None] + np.zeros((1, n1), dtype=np.int64)).ravel()
            gj = (j0 + np.zeros((n0, 1), dtype=np.int64) + np.arange(n1)[None, :]).ravel()
            hv = h.ravel()
            valid = hv != np.float32(K.UNDEF)
            av = a.ravel()
            cols["gi"].append(gi.astype(np.int64))
            cols["gj"].append(gj.astype(np.int64))
            cols["basin"].append(b.ravel().astype(np.int64))
            cols["channel"].append(c.ravel().astype(np.int64))
            cols["acc_mm"].append(
                np.round(np.where(av == np.float32(K.UNDEF), 0, av).astype(np.float64) * 1000.0).astype(np.int64)
            )
            cols["hand_mm"].append(
                np.where(valid, np.round(hv.astype(np.float64) * 1000.0), 0).astype(np.int64)
            )
            cols["hand_valid"].append(valid.astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v) if v else np.asarray([], dtype=np.int64)) for k, v in cols.items()})

    df = hds.map_batches(cellrows, batch_format="pyarrow").to_pandas()
    return df.sort_values(["gi", "gj"]).reset_index(drop=True)


def _chain_to_area(Np: int, TILEp: int, zero_offmask: bool = False):
    """Shared front of the round-4 queries: fill -> fdir -> acc -> area
    tiles on the twovalley DEM. zero_offmask mirrors the bisection oracle's
    area2[mask==0] = 0 pre-step."""
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import tiles as T

    dem, mask = synth.dem_grid("twovalley", Np)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    ds = T.make_tiles_dataset({"dem": z.astype(np.float32), "landmask": mask.astype(np.int32)}, TILEp)
    filled = D.fill_dist(ds, RES)
    fd = D.fdir_dist(filled, RES, Np, Np)
    ac = D.acc_dist(fd, TILEp, Np, Np)
    ar = D.area_from_acc(ac, RES)
    if zero_offmask:
        def zero(batch: pa.Table) -> pa.Table:
            from ..terrain import tiles as T2

            outs = []
            for r in range(batch.num_rows):
                a = T2.tile_payload(batch, "area", r).copy()
                m = T2.tile_payload(batch, "landmask", r)
                a[m == 0] = 0.0
                outs.append(a.astype(np.float32).ravel())
            return batch.drop_columns(["area"]).append_column(
                "area", pa.array([x for x in outs], type=pa.list_(pa.float32()))
            )

        ar = ar.map_batches(zero, batch_format="pyarrow")
    return ar.materialize()


def terrain_polygon_info(sf_dir: str):
    """Distributed polygon_info: centroid partial-sum groupby + in-tile /
    cross-tile-join adjacency over the distributed CCL labels, vs the
    whole-grid kernel (terrain_tools.f90:1791-1858)."""
    OF.stage_terrain_polygon_info(sf_dir)
    from ..terrain import dist as D
    from ..terrain import tiles as T

    v = OF.polygonize_values_grid(N, div=2.0)
    ds = T.make_tiles_dataset({"values": v}, TILE)
    labeled = D.polygonize_dist(ds, "values")
    cents, edges = D.polygon_info_dist(labeled, RES, N, N)
    cx = cents.set_index("pid")["cx"]
    cy = cents.set_index("pid")["cy"]
    s = edges["src"].to_numpy(dtype=np.int64)
    d = edges["dst"].to_numpy(dtype=np.int64)
    sx, sy = cx.loc[s].to_numpy(), cy.loc[s].to_numpy()
    dx, dy = cx.loc[d].to_numpy(), cy.loc[d].to_numpy()
    dist = np.sqrt((sx - dx) ** 2 + (sy - dy) ** 2)  # same IEEE tree as the kernel
    return pd.DataFrame(
        {
            "src": s,
            "dst": d,
            "dist_um": np.round(dist * 1e6).astype(np.int64),
            "src_cx_um": np.round(sx * 1e6).astype(np.int64),
            "src_cy_um": np.round(sy * 1e6).astype(np.int64),
        }
    ).sort_values(["src", "dst"]).reset_index(drop=True)


def terrain_reduce_basins(sf_dir: str):
    """Distributed reduce_basin_number (terrain_tools.py:293-338): basin
    areas from a distributed per-basin count groupby; the merge loop runs
    driver-side on the SMALL id table (kernels.reduce_basins_map — one row
    per basin, never cells); the final relabel is a broadcast searchsorted
    paint in map_batches. Oracle: the grid-walking kernel twin."""
    OF.stage_terrain_reduce_basins(sf_dir)
    import ray
    from ray.data.aggregate import Sum

    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import properties as P

    ar = _chain_to_area(N, TILE)
    chds, topo = D.channels_dist(ar, 8 * RES * RES, 16 * RES * RES, N, N, with_ocean=False)
    bds = D.basins_dist(chds, N, N)
    cells = P.tiles_to_cells(bds, ["basins"]).materialize()

    cids = np.asarray(sorted(topo.keys()), dtype=np.int64)
    ids = cids - 1
    nids = np.asarray([topo[int(c)] - 1 if topo[int(c)] > 0 else -1 for c in cids], dtype=np.int64)
    cids_ref = ray.put(cids)

    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch["basins"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(b, ray.get(cids_ref))
        u, c = np.unique(b[keep], return_counts=True)
        return pa.table({"basin": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts_df = (
        cells.map_batches(count_partial, batch_format="pyarrow")
        .groupby("basin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # small: one row per basin
        .set_index("basin")["n"]
    )
    areas = counts_df.reindex(cids, fill_value=0).to_numpy(dtype=np.float64) * RES * RES
    goal = max(2, len(cids) // 2)
    mapping = K.reduce_basins_map(ids, nids, areas, goal)
    mk = np.asarray(sorted(mapping.keys()), dtype=np.int64)
    mv = np.asarray([mapping[int(k)] for k in mk], dtype=np.int64)
    map_ref = ray.put((mk, mv))

    def paint(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(map_ref)
        b = batch["basins"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, b)
        ok = (pos < len(keys)) & (keys[np.clip(pos, 0, len(keys) - 1)] == b)
        rb = np.where(ok, vals[np.clip(pos, 0, len(vals) - 1)], -1)
        return pa.table(
            {
                "gi": batch["gi"].cast(pa.int64()),
                "gj": batch["gj"].cast(pa.int64()),
                "rbasin": pa.array(rb, type=pa.int64()),
            }
        )

    df = cells.map_batches(paint, batch_format="pyarrow").to_pandas()
    return df.sort_values(["gi", "gj"]).reset_index(drop=True)


def terrain_basin_bisection(sf_dir: str):
    """Distributed basin-count bisection (terrain_tools.py:211-253): the
    log-space threshold walk with every probe = channels_dist +
    basins_dist over the SAME materialized area tiles; the probe's basin
    count is a per-tile-unique partial folded to a distinct count (labels
    per tile are bounded, the cell table never reaches the driver).
    Converges identically to the single-node walk because every probe's
    chain is bit-identical."""
    OF.stage_terrain_basin_bisection(sf_dir)
    from ray.data.aggregate import Max

    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import properties as P
    from ..terrain import tiles as T

    ar = _chain_to_area(N, TILE, zero_offmask=True)

    def tile_max(batch: pa.Table) -> pa.Table:
        vals = [float(T.tile_payload(batch, "area", r).max()) for r in range(batch.num_rows)]
        return pa.table({"mx": pa.array(vals, type=pa.float64())})

    area_max = float(ar.map_batches(tile_max, batch_format="pyarrow").aggregate(Max("mx"))["max(mx)"])

    def probe(basin_threshold: float):
        chds, _ = D.channels_dist(ar, 8 * RES * RES, basin_threshold, N, N, with_ocean=False)
        bds = D.basins_dist(chds, N, N)

        def tile_uniq(batch: pa.Table) -> pa.Table:
            us = []
            for r in range(batch.num_rows):
                b = T.tile_payload(batch, "basins", r).astype(np.int64)
                us.append(np.unique(b[b > 0]))
            u = np.unique(np.concatenate(us)) if us else np.asarray([], dtype=np.int64)
            return pa.table({"basin": pa.array(u)})

        uniq = bds.map_batches(tile_uniq, batch_format="pyarrow").to_pandas()
        return int(uniq["basin"].nunique()), bds

    bds = K.basin_count_bisection(probe, area_max, RES, nbasins_goal=4)
    df = P.tiles_to_cells(bds, ["basins"]).to_pandas()
    b = df["basins"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "gi": df["gi"].astype("int64"),
            "gj": df["gj"].astype("int64"),
            "basin": np.where(b == K.IUNDEF, -1, b),
        }
    ).sort_values(["gi", "gj"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# retrieve_metadata on the driver hash channel (reference gdal_tools.py
# metadata dict; engine terrain/tiles.py::grid_to_tiles_table layout
# columns). A deliberately RAGGED grid (35x29, 16-px tiles) so remainder
# tiles exercise the n0/n1 clamps; a per-tile payload checksum proves the
# windows carry the right cells, not just the right shapes. The oracle is
# PURE SQL — it rebuilds the tiling arithmetic and the deterministic grid
# from ranges, cross-engine, no staged twin.
# ---------------------------------------------------------------------------

def tiles_metadata(sf_dir: str):
    import pyarrow as pa

    from ..terrain import tiles as T

    N0_, N1_, TL = 35, 29, 16
    gi_, gj_ = np.meshgrid(np.arange(N0_), np.arange(N1_), indexing="ij")
    z = ((gi_ * 31 + gj_ * 17) % 101).astype(np.int64)
    ds = T.make_tiles_dataset({"z": z}, TL)

    def meta(batch: pa.Table) -> pa.Table:
        zs = [int(T.tile_payload(batch, "z", r).sum()) for r in range(batch.num_rows)]
        out = batch.select(["tx", "ty", "i0", "j0", "n0", "n1", "ntx", "nty"])
        return out.append_column("zsum", pa.array(zs, type=pa.int64()))

    df = ds.map_batches(meta, batch_format="pyarrow").to_pandas()
    return (
        df.astype({c: "int64" for c in df.columns})
        .sort_values(["tx", "ty"])
        .reset_index(drop=True)
    )


TILES_METADATA_SQL = """
WITH p AS (SELECT 35 AS n0g, 29 AS n1g, 16 AS tl),
cells AS (
  SELECT i.i // tl AS tx, j.j // tl AS ty,
         (i.i * 31 + j.j * 17) % 101 AS v, n0g, n1g, tl
  FROM p, unnest(range(0, n0g)) i(i), unnest(range(0, n1g)) j(j)
)
SELECT tx, ty, tx * tl AS i0, ty * tl AS j0,
       least(tl, n0g - tx * tl) AS n0, least(tl, n1g - ty * tl) AS n1,
       (n0g + tl - 1) // tl AS ntx, (n1g + tl - 1) // tl AS nty,
       CAST(SUM(v) AS BIGINT) AS zsum
FROM cells
GROUP BY tx, ty, n0g, n1g, tl
ORDER BY tx, ty
"""
