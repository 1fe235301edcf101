"""Second batch of driver-contract queries: time_average (SQL-checked),
dedup/text/ANN/terrain/flagship entries (rows-only where SQL cannot express
the op — the driver records a weaker rows-only check for those)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..numerics import sql_round

from .. import io
from .qcommon import KNUTH_MULT, _read




# ---------------------------------------------------------------------------
# dedup / text / ANN / terrain / flagship — each stages a single-process
# oracle fixture (pipelines/oracle_fixtures.py) before running the Ray
# pipeline; the matching oracle_sql reads the fixture via read_parquet, so
# the driver's rows+schema+hash compare proves distributed == oracle
# ---------------------------------------------------------------------------

def docs_minhash_dedup(sf_dir: str):
    from ..stages.dedup import minhash_lsh_clusters
    from . import oracle_fixtures as OF

    OF.stage_docs_minhash_dedup(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_clusters(ds, num_perm=64, bands=16, shingle_k=5, jaccard_threshold=0.7).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_simhash_buckets(sf_dir: str):
    from ..stages.dedup import simhash_buckets
    from . import oracle_fixtures as OF

    OF.stage_docs_simhash_buckets(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = simhash_buckets(ds).to_pandas().sort_values(["doc_id", "band"]).reset_index(drop=True)
    # reinterpret the u64 sketches as i64 (driver/DuckDB-friendly dtype)
    out["band_key"] = out["band_key"].to_numpy().astype(np.uint64).view(np.int64)
    out["simhash"] = out["simhash"].to_numpy().astype(np.uint64).view(np.int64)
    return out


def docs_langid(sf_dir: str):
    from ..stages.text import LangId
    from . import oracle_fixtures as OF

    OF.stage_docs_langid(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    out["lang_match"] = out["lang_pred"] == out["lang"]
    return out[["doc_id", "lang", "lang_pred", "lang_match"]].sort_values("doc_id").reset_index(drop=True)


def docs_quality(sf_dir: str):
    from ..stages.text import QualityScore
    from . import oracle_fixtures as OF

    OF.stage_docs_quality(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(QualityScore, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    return out.drop(columns=["text"]).sort_values("doc_id").reset_index(drop=True)


def docs_fingerprint(sf_dir: str):
    from ..stages.text import fingerprint_stage, token_count_stage
    from . import oracle_fixtures as OF

    OF.stage_docs_fingerprint(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = (
        ds.map_batches(token_count_stage(), batch_format="pyarrow")
        .map_batches(fingerprint_stage(), batch_format="pyarrow")
        .to_pandas()
    )
    out["fingerprint"] = out["fingerprint"].to_numpy().astype(np.uint64).view(np.int64)
    return out.drop(columns=["text"]).sort_values("doc_id").reset_index(drop=True)


def ann_lsh_topk(sf_dir: str):

    from ..stages.ann import lsh_partitioned_topk
    from . import oracle_fixtures as OF

    OF.stage_ann_lsh_topk(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    Q = np.stack([np.asarray(q_tbl["embedding"][i].as_py()) for i in range(3)]).astype(np.float64)
    out = lsh_partitioned_topk(ds, Q, k=5, n_planes=6)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def terrain_basin_stats(sf_dir: str):
    """Distributed terrain chain (fill -> fdir -> acc -> channels -> basins
    -> HAND) on the deterministic twovalley DEM, summarized per basin.
    Oracle: the single-node kernels chain stages a per-cell fixture and the
    SQL mirrors this aggregation over it (round-2 upgrade from rows-only)."""
    from . import oracle_fixtures as OF

    OF.stage_terrain_basin_cells(sf_dir)
    from .. import synth
    from ..terrain import dist as D
    from ..terrain import kernels as K
    from ..terrain import tiles as T

    N, RES, TILE = 32, 30.0, 16
    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    ds = T.make_tiles_dataset({"dem": z.astype(np.float32), "landmask": mask.astype(np.int32)}, TILE)
    filled = D.fill_dist(ds, RES)
    fd = D.fdir_dist(filled, RES, N, N)
    ac = D.acc_dist(fd, TILE, N, N)
    ar = D.area_from_acc(ac, RES)
    chds, topo = D.channels_dist(ar, 8 * RES * RES, 16 * RES * RES, N, N)
    bds = D.basins_dist(chds, N, N)
    hds = D.hand_dist(bds, N, N)

    def stats(batch: pa.Table) -> pa.Table:
        rows = {"basin": [], "n_cells": [], "sum_hand_mm": []}
        for r in range(batch.num_rows):
            b = T.tile_payload(batch, "basins", r)
            h = T.tile_payload(batch, "hand", r)
            for bid in np.unique(b[b > 0]):
                sel = b == bid
                hv = h[sel]
                hv = hv[hv != np.float32(K.UNDEF)]
                rows["basin"].append(int(bid))
                rows["n_cells"].append(int(sel.sum()))
                rows["sum_hand_mm"].append(int(np.round(hv.astype(np.float64) * 1000.0).sum()) if len(hv) else 0)
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in rows.items()})

    from ray.data.aggregate import Sum

    agg = (
        hds.map_batches(stats, batch_format="pyarrow")
        .groupby("basin")
        .aggregate(Sum("n_cells", alias_name="n_cells"), Sum("sum_hand_mm", alias_name="sum_hand_mm"))
    )
    df = agg.to_pandas().sort_values("basin").reset_index(drop=True)
    df["basin"] = df["basin"].astype("int64")
    df["n_cells"] = df["n_cells"].astype("int64")
    df["sum_hand_mm"] = df["sum_hand_mm"].astype("int64")
    df["mean_hand"] = df["sum_hand_mm"].astype("float64") / 1000.0 / df["n_cells"]
    return df


def flagship_spatial_join(sf_dir: str):
    """End-to-end flagship join over the synthetic interleaved corpus
    (input_hint schema); size scaled by sf. Oracle: independent scalar
    point-in-polygon sweep staged as a fixture (oracle_fixtures.py)."""
    from . import oracle_fixtures as OF

    OF.stage_flagship_spatial_join(sf_dir)

    from .. import synth
    from ..pipelines import flagship
    from ..stages.spatial_join import SpatialJoin

    n_li = io.table_num_rows(io.table_path(sf_dir, "lineitem"))
    n_docs = max(2000, n_li // 30)
    docs = synth.docs_dataset(n_docs, override_num_blocks=8)
    idx_ref = flagship.polygon_index_ref(200)
    pts = flagship.geo_points(docs)
    joined = pts.map_batches(
        SpatialJoin,
        fn_constructor_kwargs={"index_ref": idx_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u, type=pa.uint64()), "n_hits": pa.array(c, type=pa.int64())})

    from ray.data.aggregate import Sum

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby("cell").aggregate(Sum("n_hits", alias_name="n_hits"))
    df = agg.to_pandas()
    df["cell"] = df["cell"].astype("uint64").astype("int64")
    return df.sort_values(["cell"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# sessionization (stream-shaped op): per-user sessions split on >30 min
# gaps; Ray Data has no event-time windows, so the engine sorts each user's
# group and windows in pandas (the guide's documented pattern). The SQL
# oracle is the classic lag/gap/cumsum window expression — integer
# microsecond timestamps keep it bit-exact.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_start_index

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # whole users per hash bucket; session boundaries for ALL users in
        # one vectorized pass (user change forces a new session, so gaps
        # never leak across users), rollup via pandas' cython groupby
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        # explicit unit conversion: a datetime64[ns] column would make the
        # bare int64 view nanoseconds and the 30-min gap silently 1.8 s
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        u = g["user_id"].to_numpy()
        new_user = key_run_starts(u)
        new = new_user.copy()
        new[1:] |= (us[1:] - us[:-1]) > SESSION_GAP_US
        sid_global = np.cumsum(new)
        sid = sid_global - sid_global[run_start_index(new_user)] + 1
        v = sql_round(g["value"].to_numpy() * 1000.0).astype(np.int64)
        out = pd.DataFrame({"user_id": u, "session": sid, "v": v, "us": us})
        agg = out.groupby(["user_id", "session"], as_index=False).agg(
            n_events=("v", "size"),
            sum_v=("v", "sum"),
            start_us=("us", "min"),
            end_us=("us", "max"),
        )
        return agg

    df = bucketed_key_apply(ds, "user_id", per_bucket).to_pandas()
    df = df.sort_values(["user_id", "session"]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "user_id": df["user_id"].astype("int64"),
            "session": df["session"].astype("int64"),
            "n_events": df["n_events"].astype("int64"),
            "sum_value": df["sum_v"].astype("float64") / 1000.0,
            "duration_us": (df["end_us"] - df["start_us"]).astype("int64"),
        }
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
), lagged AS (
  SELECT *, CASE WHEN us - lag(us) OVER w > {SESSION_GAP_US} OR lag(us) OVER w IS NULL
                 THEN 1 ELSE 0 END AS is_new
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session
  FROM lagged
)
SELECT user_id, CAST(session AS BIGINT) AS session, COUNT(*) AS n_events,
       CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE)/1000.0 AS sum_value,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, session ORDER BY user_id, session
"""


def docs_knn_haversine(sf_dir: str):
    """The real haversine kNN stage (stages/knn.KNNBroadcast) over derived
    doc points and nation stations. DuckDB's own trig differs in ulps from
    numpy, so the oracle is a staged single-process numpy kNN fixture
    (same IEEE expression tree; distances rounded to mm on both sides)."""
    import pyarrow as pa

    from . import oracle_fixtures as OF

    OF.stage_docs_knn_haversine(sf_dir)
    from ..stages.knn import KNNBroadcast

    from .textqueries import _nation_stations

    nation = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    st_df = _nation_stations(nation)
    st = {
        "station_id": st_df["station_id"].to_numpy(),
        "lon": st_df["slon"].to_numpy(),
        "lat": st_df["slat"].to_numpy(),
    }
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pts(batch: pa.Table) -> pa.Table:
        from .textqueries import doc_lonlat

        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        return pa.table({"doc_id": batch["doc_id"], "lon": lon, "lat": lat})

    import ray

    st_ref = ray.put(st)
    out = (
        ds.map_batches(pts, batch_format="pyarrow")
        .map_batches(
            KNNBroadcast,
            fn_constructor_kwargs={"stations_ref": st_ref, "k": 3},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    out["station_dist"] = out["station_dist"].round(3)
    return out.sort_values(["doc_id", "knn_rank"]).reset_index(drop=True)


def terrain_hillslope_profiles(sf_dir: str):
    """Hillslope property profiles over the twovalley fixture (distributed
    map_groups machinery of terrain/hillslope_props.py). Oracle: the same
    profile math applied per hillslope single-process over the single-node
    kernel chain's cells, staged as a fixture."""
    from . import oracle_fixtures as OF

    OF.stage_terrain_hillslope_profiles(sf_dir)
    from .. import synth
    from ..terrain import hillslope_props as HP
    from ..terrain import kernels as K
    from ..terrain import properties as P
    from ..terrain import tiles as T

    N, RES = 32, 30.0
    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    z = z.astype(np.float32)
    mask = mask.astype(np.int32)
    w = K.fill_pits(z, RES)
    area, fdir = K.d8_area(w, mask, RES)
    ch, _, _ = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=mask)
    hand = K.depth2channel(ch, mask, fdir, w.astype(np.float32))
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    hs = K.delineate_hillslopes(ch, area, fdir, mask)
    hs2 = np.where(hs >= 0, hs + 1, hs).astype(np.int64)
    ds = T.make_tiles_dataset(
        {"hillslopes": hs2, "hand": hand, "slope": slope, "demns": w}, 16
    )
    cells = P.tiles_to_cells(ds, ["hillslopes", "hand", "slope", "demns"]).filter(
        lambda r: r["hillslopes"] > 0
    )
    df = HP.hillslope_properties_dist(cells, ["demns"], RES)
    out = df.drop(columns=["position_array", "d2c_array", "width_array"])
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
    return out


def ann_lsh_adaptive(sf_dir: str):
    """Adaptive-candidate-budget LSH ANN: probe buckets in multi-probe
    margin order until they hold >= half the table (the recall>=0.8 point
    on the sf0.1 curve); scoring stays inside groupby(bucket).map_groups.
    Oracle = single-process twin fixture."""

    from ..stages.ann import lsh_partitioned_topk
    from . import oracle_fixtures as OF

    OF.stage_ann_lsh_adaptive(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    Q = np.stack([np.asarray(q_tbl["embedding"][i].as_py()) for i in range(3)]).astype(np.float64)
    budget = max(50, q_tbl.num_rows // 2)
    out = lsh_partitioned_topk(ds, Q, k=5, n_planes=8, min_candidates=budget)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def ann_ivf_topk(sf_dir: str):
    """IVF-partitioned ANN (deterministic-KMeans coarse lists, nprobe=2)
    over the embeddings table; oracle = single-process twin fixture."""

    from ..stages.ann import ivf_partitioned_topk
    from . import oracle_fixtures as OF

    OF.stage_ann_ivf_topk(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    Q = np.stack([np.asarray(q_tbl["embedding"][i].as_py()) for i in range(3)]).astype(np.float64)
    out = ivf_partitioned_topk(ds, Q, k=5, n_lists=8, nprobe=2)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def docs_media_features(sf_dir: str):
    """Multimodal plumbing, driver-green: derive a media ref per document,
    synthesize the deterministic fake payload (binary column), decode with
    the actor-pool stage (small batches, Arrow throughout), and emit a
    per-doc feature summary. Oracle: per-doc naive-loop twin
    (oracle_fixtures.stage_docs_media_features)."""
    from . import oracle_fixtures as OF

    OF.stage_docs_media_features(sf_dir)
    from ..stages.multimodal import decode_pipeline, synth_media_batch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = synth_media_batch([f"media-{d}" for d in ids])
        return t.append_column("doc_id", pa.array(ids, type=pa.int64()))

    media = ds.map_batches(to_media, batch_format="pyarrow")
    decoded = decode_pipeline(media, concurrency=(1, 4), batch_size=64)

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        feats = batch["image_features"]
        n = batch.num_rows
        f = np.asarray(feats.combine_chunks().flatten(), dtype=np.float32).reshape(n, -1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_kind": batch["media_kind"],
                "n_bytes": pc.binary_length(batch["media_bytes"]).cast(pa.int64()),
                "width": batch["width"].cast(pa.int64()),
                "height": batch["height"].cast(pa.int64()),
                "feat_sum_um": pa.array(np.round(f.sum(axis=1, dtype=np.float64) * 1e6).astype(np.int64)),
            }
        )

    df = decoded.map_batches(summarize, batch_format="pyarrow").to_pandas()
    df["media_kind"] = df["media_kind"].astype(str)
    return df.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# transform_arcgis_fdir (reference terrain_tools.py:1666-1697): power-of-2
# ArcGIS flow-direction codes -> compact D8, distributed as a stateless
# map_batches with per-batch partial counts (pre-aggregate before the tiny
# groupby). Pure-SQL oracle: the CASE table is the published encoding.
# ---------------------------------------------------------------------------

def events_arcgis_fdir(sf_dir: str):
    from ..functions.geometry import arcgis_to_d8

    ds = _read(sf_dir, "events", ["event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic mix of valid power-of-2 codes and arbitrary bytes
        arc = np.where(eid % 3 == 0, np.int64(1) << (eid % 8), eid % 256)
        # the partial ships only (arc_code, n); d8 is a pure function of
        # arc_code and is derived once after the count shuffle
        u, cnt = np.unique(arc, return_counts=True)
        return pa.table({"arc_code": pa.array(u), "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("arc_code")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # d8 is a pure function of arc_code: re-derive after the count shuffle
    agg["d8"] = arcgis_to_d8(agg["arc_code"].to_numpy()).astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    return agg[["arc_code", "d8", "n"]].sort_values("arc_code").reset_index(drop=True)


EVENTS_ARCGIS_FDIR_SQL = """
WITH src AS (
  SELECT CASE WHEN event_id % 3 = 0
              THEN CAST(pow(2, event_id % 8) AS BIGINT)
              ELSE event_id % 256 END AS arc_code
  FROM events
)
SELECT arc_code,
       CASE arc_code WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 4 THEN 2 WHEN 8 THEN 3
                     WHEN 16 THEN 4 WHEN 32 THEN 5 WHEN 64 THEN 6 WHEN 128 THEN 7
                     ELSE -1 END AS d8,
       COUNT(*) AS n
FROM src GROUP BY arc_code ORDER BY arc_code
"""


# ---------------------------------------------------------------------------
# calculate_area (reference terrain_tools.py:25-40): per-cell haversine
# dx/dy/area over a lon/lat grid, distributed one tile per task (pure
# function of the tile bbox — no halo). Fixture oracle: the identical
# IEEE expression tree evaluated tile-by-tile in one process.
# ---------------------------------------------------------------------------

AREA_N, AREA_TILE, AREA_RES = 96, 32, 0.05
AREA_MINX, AREA_MINY = -30.0, 10.0


def _tile_cell_geometry(i0: int, j0: int, n0: int, n1: int):
    from ..functions.geometry import cell_geometry

    minx = AREA_MINX + j0 * AREA_RES
    miny = AREA_MINY + i0 * AREA_RES
    return cell_geometry(minx, miny, minx + n1 * AREA_RES, miny + n0 * AREA_RES, n1, n0)


def grid_cell_areas(sf_dir: str):
    import ray.data as rd

    from .. import oracles as O
    from ..terrain import tiles as T

    # single-process twin fixture (same expression tree, no Ray)
    recs = []
    for i0 in range(0, AREA_N, AREA_TILE):
        for j0 in range(0, AREA_N, AREA_TILE):
            n0 = min(AREA_TILE, AREA_N - i0)
            n1 = min(AREA_TILE, AREA_N - j0)
            dx, dy, area = _tile_cell_geometry(i0, j0, n0, n1)
            rr, cc = np.meshgrid(np.arange(i0, i0 + n0), np.arange(j0, j0 + n1), indexing="ij")
            recs.append(
                pd.DataFrame(
                    {
                        "cell_row": rr.ravel().astype(np.int64),
                        "cell_col": cc.ravel().astype(np.int64),
                        "dx": dx.ravel(),
                        "dy": dy.ravel(),
                        "area": area.ravel(),
                    }
                )
            )
    fix = pd.concat(recs, ignore_index=True).sort_values(["cell_row", "cell_col"]).reset_index(drop=True)
    O.stage_fixture("grid_cell_areas", fix)

    ds = T.make_tiles_dataset({"z": np.zeros((AREA_N, AREA_N), dtype=np.float32)}, AREA_TILE)

    def per_tile(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("cell_row", "cell_col", "dx", "dy", "area")}
        for r in range(batch.num_rows):
            i0 = int(batch["i0"][r].as_py())
            j0 = int(batch["j0"][r].as_py())
            n0 = int(batch["n0"][r].as_py())
            n1 = int(batch["n1"][r].as_py())
            dx, dy, area = _tile_cell_geometry(i0, j0, n0, n1)
            rr, cc = np.meshgrid(np.arange(i0, i0 + n0), np.arange(j0, j0 + n1), indexing="ij")
            out["cell_row"].append(rr.ravel().astype(np.int64))
            out["cell_col"].append(cc.ravel().astype(np.int64))
            out["dx"].append(dx.ravel())
            out["dy"].append(dy.ravel())
            out["area"].append(area.ravel())
        return pa.table(
            {
                "cell_row": pa.array(np.concatenate(out["cell_row"])),
                "cell_col": pa.array(np.concatenate(out["cell_col"])),
                "dx": pa.array(np.concatenate(out["dx"]), type=pa.float32()),
                "dy": pa.array(np.concatenate(out["dy"]), type=pa.float32()),
                "area": pa.array(np.concatenate(out["area"]), type=pa.float32()),
            }
        )

    df = ds.map_batches(per_tile, batch_format="pyarrow").to_pandas()
    return df.sort_values(["cell_row", "cell_col"]).reset_index(drop=True)


from .. import oracles as _O

GRID_CELL_AREAS_SQL = _O.fixture_sql("grid_cell_areas", "cell_row, cell_col")


def terrain_cluster_hillslopes(sf_dir: str):
    """cluster_hillslopes_updated (reference terrain_tools.py:1373-1490):
    distributed hillslope property table -> deterministic kmeans ->
    per-cluster weighted characteristics + shared profile refits. Oracle:
    the same operator over the single-process property twin."""
    from . import oracle_fixtures as OF

    OF.stage_terrain_cluster_hillslopes(sf_dir)
    from .. import synth
    from ..terrain import kernels as K
    from ..terrain import hillslope_props as HP
    from ..terrain import properties as P
    from ..terrain import tiles as T

    N, RES = 32, 30.0
    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    z = z.astype(np.float32)
    mask = mask.astype(np.int32)
    w = K.fill_pits(z, RES)
    area, fdir = K.d8_area(w, mask, RES)
    ch, _, _ = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=mask)
    hand = K.depth2channel(ch, mask, fdir, w.astype(np.float32))
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    hs = K.delineate_hillslopes(ch, area, fdir, mask)
    hs2 = np.where(hs >= 0, hs + 1, hs).astype(np.int64)
    ds = T.make_tiles_dataset({"hillslopes": hs2, "hand": hand, "slope": slope, "demns": w}, 16)
    cells = P.tiles_to_cells(ds, ["hillslopes", "hand", "slope", "demns"]).filter(
        lambda r: r["hillslopes"] > 0
    )
    hp = HP.hillslope_properties_dist(cells, ["demns"], RES)
    return OF.cluster_hillslopes_from_hp(hp)


def docs_span_signature(sf_dir: str):
    """North-rule per-row invariant as a driver query: the per-doc span
    signature (kind,text,media_ref,offset joined with \\x1f / docs joined
    with \\x1e) over the interleaved corpus (input_hint schema), computed
    distributed via zero-copy Arrow map_batches. The oracle is NOT a staged
    twin: DuckDB recomputes the signature itself from the same raw spans
    parquet with a list lambda (oracle_fixtures.DOCS_SPAN_SIGNATURE_SQL) —
    a cross-engine proof of span-sequence equality."""
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans

    raw = OF.stage_docs_spans_raw(sf_dir)
    ds = rd.read_parquet(raw)
    return ds.map_batches(spans.span_signature, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# NetCDF-3 writer/reader round-trip and GrADS date strings on the driver
# hash channel (reference netcdf_tools.py:72-131, grads_tools.py:23-35).
# Both oracles are PURE SQL — cross-engine, no staged twin.
# ---------------------------------------------------------------------------

def netcdf_roundtrip(sf_dir: str):
    """Create_NETCDF_File / append_netcdf3_records / read_netcdf3 parity:
    write 2 timesteps with t UNLIMITED, append the 3rd in place, read the
    grown file back, and emit the full (t, lat, lon) table with
    micro-degree cell-center coordinates (the reference's +res/2 quirk,
    netcdf_tools.py:79-83). The oracle regenerates the deterministic field
    and coordinate arithmetic in DuckDB; values are integers exact in f32."""
    import datetime
    import os
    import tempfile

    import ray.data as rd

    from ..sources import netcdf as nc

    NT, NLAT, NLON = 3, 6, 7
    t = np.arange(NT)[:, None, None]
    i = np.arange(NLAT)[None, :, None]
    j = np.arange(NLON)[None, None, :]
    field = ((t * 37 + i * 13 + j * 7) % 97).astype(np.float32)
    path = os.path.join(tempfile.mkdtemp(prefix="graft_nc_"), "rt.nc")
    md = {
        "nlat": NLAT, "nlon": NLON, "res": 0.25, "minlon": -5.0, "minlat": 2.0,
        "undef": -9999.0, "nt": 2, "tstep": "1hr",
        "tinitial": datetime.datetime(2004, 1, 2, 6),      # 30 h after ...
        "tinitial_all": datetime.datetime(2004, 1, 1, 0),  # ... the epoch
        "vars": ["sm"], "file": path,
    }
    nc.create_netcdf_file(md, {"sm": field[:2]}, unlimited=True)
    nc.append_netcdf3_records(path, {"t": np.array([32.0]), "sm": field[2:]})
    got = nc.read_netcdf3(path)
    v = got["variables"]
    base = pd.DataFrame(
        {
            "ti": np.repeat(np.arange(NT), NLAT * NLON).astype(np.int64),
            "ii": np.tile(np.repeat(np.arange(NLAT), NLON), NT).astype(np.int64),
            "jj": np.tile(np.arange(NLON), NT * NLAT).astype(np.int64),
            "val_f": v["sm"]["data"].ravel().astype(np.float64),
            "th_f": np.repeat(v["t"]["data"], NLAT * NLON).astype(np.float64),
            "lat_f": np.tile(np.repeat(v["lat"]["data"], NLON), NT),
            "lon_f": np.tile(v["lon"]["data"], NT * NLAT),
        }
    )

    def quant(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ti": b["ti"],
                "ii": b["ii"],
                "jj": b["jj"],
                "val": np.round(b["val_f"]).astype(np.int64),
                "t_hours": np.round(b["th_f"]).astype(np.int64),
                "lat_ud": np.round(b["lat_f"] * 1e6).astype(np.int64),
                "lon_ud": np.round(b["lon_f"] * 1e6).astype(np.int64),
            }
        )

    out = rd.from_pandas(base).map_batches(quant, batch_format="pandas").to_pandas()
    return out.sort_values(["ti", "ii", "jj"]).reset_index(drop=True)


NETCDF_ROUNDTRIP_SQL = """
SELECT t.ti, i.ii, j.jj,
       (t.ti * 37 + i.ii * 13 + j.jj * 7) % 97 AS val,
       30 + t.ti AS t_hours,
       CAST(ROUND((2.0 + 0.125 + i.ii * 0.25) * 1000000) AS BIGINT) AS lat_ud,
       CAST(ROUND((-5.0 + 0.125 + j.jj * 0.25) * 1000000) AS BIGINT) AS lon_ud
FROM range(3) t(ti), range(6) i(ii), range(7) j(jj)
ORDER BY t.ti, i.ii, j.jj
"""


def events_grads_dates(sf_dir: str):
    """GrADS date-string conversions (grads_tools.py:23-35; engine
    sources/netcdf.py:37-48) over the events table: format each timestamp
    as the reference's '%HZ%d%b%Y' (hard-coded lowercase C-locale month
    names) and round-trip the string back through gradstime2datetime
    (hour resolution, as epoch seconds). Formatting is vectorized pandas
    string ops; the parse runs once per DISTINCT hour string per batch."""
    from ..sources import netcdf as nc

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    months = np.asarray(nc._MONTHS)

    def to_grads(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"]
        g = (
            ts.dt.hour.astype(str).str.zfill(2)
            + "Z"
            + ts.dt.day.astype(str).str.zfill(2)
            + pd.Series(months[ts.dt.month.to_numpy() - 1], index=b.index)
            + ts.dt.year.astype(str).str.zfill(4)
        )
        lut = {
            s: int(np.datetime64(nc.gradstime2datetime(s), "s").astype(np.int64))
            for s in pd.unique(g)
        }
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype(np.int64),
                "grads_str": g,
                "rt_epoch_s": g.map(lut).astype(np.int64),
            }
        )

    return (
        ds.map_batches(to_grads, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


EVENTS_GRADS_DATES_SQL = """
SELECT event_id,
       strftime(ts, '%H') || 'Z' || strftime(ts, '%d')
         || lower(strftime(ts, '%b')) || strftime(ts, '%Y') AS grads_str,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS rt_epoch_s
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# GrADS control-file writers on the driver hash channel (reference
# netcdf_tools.py:133-160 Update_Control_File[_Binary]; engine
# sources/netcdf.py::write_control_file[_binary]). The metadata (initial
# date + timestep count) is DERIVED FROM THE EVENTS TABLE distributedly,
# so the oracle genuinely recomputes the ctl content (strftime + printf)
# rather than comparing constants.
# ---------------------------------------------------------------------------

_CTL_DIMS = {"undef": -9999.0, "nlon": 7, "nlat": 6, "res": 0.25, "minlon": -5.0, "minlat": 2.0}


def grads_ctl_files(sf_dir: str):
    import os
    import tempfile

    from ..sources import netcdf as nc

    ds = _read(sf_dir, "events", ["ts"])

    def hours(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": b["ts"].dt.floor("h").unique()})

    hdf = ds.map_batches(hours, batch_format="pandas").groupby("h").count().to_pandas()
    nt = len(hdf)
    idate = hdf["h"].min().to_pydatetime()

    tdir = tempfile.mkdtemp(prefix="graft_ctl_")
    p_nc = os.path.join(tdir, "nc.ctl")
    p_bin = os.path.join(tdir, "bin.ctl")
    nc.write_control_file(idate, nt, "1hr", "out_%y4%m2%d2%h2.nc", p_nc)
    nc.write_control_file_binary(idate, _CTL_DIMS, nt, "1hr", "out.bin", p_bin, ["sm", "et"])

    rows = []
    for kind, path in (("nc", p_nc), ("bin", p_bin)):
        with open(path) as fp:
            for i, line in enumerate(fp.read().splitlines(), start=1):
                rows.append((kind, i, line))
    return pd.DataFrame(rows, columns=["kind", "line_no", "line"]).astype({"line_no": "int64"})


GRADS_CTL_FILES_SQL = """
WITH m AS (
  SELECT COUNT(DISTINCT date_trunc('hour', ts)) AS nt,
         MIN(date_trunc('hour', ts)) AS idate
  FROM events
),
g AS (
  SELECT nt,
         strftime(idate, '%H') || 'Z' || strftime(idate, '%d')
           || lower(strftime(idate, '%b')) || strftime(idate, '%Y') AS gs
  FROM m
)
SELECT kind, line_no, line FROM (
  SELECT 'nc' AS kind, 1 AS line_no, 'dset out_%y4%m2%d2%h2.nc' AS line FROM g
  UNION ALL SELECT 'nc', 2, 'options template' FROM g
  UNION ALL SELECT 'nc', 3, 'dtype netcdf' FROM g
  UNION ALL SELECT 'nc', 4, printf('tdef t %d linear %s 1hr', nt, gs) FROM g
  UNION ALL SELECT 'bin', 1, 'dset out.bin' FROM g
  UNION ALL SELECT 'bin', 2, 'title out.bin' FROM g
  UNION ALL SELECT 'bin', 3, 'undef -9999.000000' FROM g
  UNION ALL SELECT 'bin', 4, 'xdef 7 linear -5.000000 0.250000' FROM g
  UNION ALL SELECT 'bin', 5, 'ydef 6 linear 2.000000 0.250000' FROM g
  UNION ALL SELECT 'bin', 6, 'zdef 1 levels 0' FROM g
  UNION ALL SELECT 'bin', 7, printf('tdef %d linear %s 1hr', nt, gs) FROM g
  UNION ALL SELECT 'bin', 8, 'vars 2' FROM g
  UNION ALL SELECT 'bin', 9, 'sm 0 99 sm' FROM g
  UNION ALL SELECT 'bin', 10, 'et 0 99 et' FROM g
  UNION ALL SELECT 'bin', 11, 'endvars' FROM g
)
ORDER BY kind, line_no
"""


# ---------------------------------------------------------------------------
# Geocell pyramid rollup — the map-tile aggregation pattern: geo-span counts
# at resolution 6, with every coarser level (5, 4, 3) derived from the
# PREVIOUS level's integer partials by the parent rule (iy//2, ix//2) —
# never re-scanning the corpus, exactly how tile pyramids build at scale.
# Finest level aggregates at cell cardinality on the sorted combine; the
# oracle recomputes all four levels from the raw span text with the same
# pinned IEEE cell arithmetic ((coord+off)/span*n, floor, clamp).
# ---------------------------------------------------------------------------

PYRAMID_RES = 6


def docs_cell_pyramid(sf_dir: str):
    import ray.data as rd

    from . import oracle_fixtures as OF
    from .. import geocell
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_raw(sf_dir)
    ds = rd.read_parquet(raw)
    nx, ny = geocell.ncells(PYRAMID_RES)

    def finest(batch: pa.Table) -> pa.Table:
        pts = spans.explode_geo_points(batch)
        lon = pts["lon"].to_numpy(zero_copy_only=False)
        lat = pts["lat"].to_numpy(zero_copy_only=False)
        _, iy, ix = geocell.unpack(geocell.cell_of(lon, lat, PYRAMID_RES))
        packed = iy * nx + ix
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "iy": pa.array(u // nx, type=pa.int64()),
                "ix": pa.array(u % nx, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    lvl = sorted_group_agg(ds.map_batches(finest, batch_format="pyarrow"),
                           ["iy", "ix"], {"n": "sum"}).materialize()
    frames = [lvl.to_pandas().assign(res=PYRAMID_RES)]
    for r in range(PYRAMID_RES - 1, PYRAMID_RES - 4, -1):
        parent = lvl.map_batches(
            lambda b: pa.table(
                {
                    "iy": pa.array(b["iy"].to_numpy(zero_copy_only=False) // 2),
                    "ix": pa.array(b["ix"].to_numpy(zero_copy_only=False) // 2),
                    "n": b["n"],
                }
            ),
            batch_format="pyarrow",
        )
        lvl = sorted_group_agg(parent, ["iy", "ix"], {"n": "sum"}).materialize()
        frames.append(lvl.to_pandas().assign(res=r))
    df = pd.concat(frames, ignore_index=True).astype(
        {"res": "int64", "iy": "int64", "ix": "int64", "n": "int64"}
    )
    return df.sort_values(["res", "iy", "ix"]).reset_index(drop=True)[["res", "iy", "ix", "n"]]


def _cell_pyramid_sql() -> str:
    from .. import geocell
    from .. import oracles as O

    nx, ny = geocell.ncells(PYRAMID_RES)
    lvls = []
    for k, r in enumerate(range(PYRAMID_RES, PYRAMID_RES - 4, -1)):
        d = 1 << k
        lvls.append(
            f"SELECT {r} AS res, (iy // {d}) AS iy, (ix // {d}) AS ix, CAST(SUM(n) AS BIGINT) AS n "
            "FROM c6 GROUP BY 1, 2, 3"
        )
    union = "\nUNION ALL\n".join(lvls)
    return f"""
WITH s AS (SELECT unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_raw")}')),
pt AS (SELECT CAST(regexp_extract(sp.text, 'POINT\\(([-0-9.eE+]+) ([-0-9.eE+]+)\\)', 1) AS DOUBLE) AS lon,
              CAST(regexp_extract(sp.text, 'POINT\\(([-0-9.eE+]+) ([-0-9.eE+]+)\\)', 2) AS DOUBLE) AS lat
       FROM s WHERE sp.kind = 'geo'),
c6 AS (SELECT LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * {ny}) AS BIGINT), 0), {ny - 1}) AS iy,
              LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 360.0 * {nx}) AS BIGINT), 0), {nx - 1}) AS ix,
              COUNT(*) AS n
       FROM pt GROUP BY 1, 2)
SELECT * FROM ({union}) ORDER BY res, iy, ix
"""


# ---------------------------------------------------------------------------
# Filtered vector search — top-k cosine restricted by a metadata predicate
# (the "filtered ANN" shape every vector store names): the label predicate
# pushes into the parquet SCAN (row groups that can't match never leave
# storage — the q6 lever applied to vector search), scoring is the same
# broadcast-query int64 kernel with block-local partial top-k. Oracle =
# the exact SQL scoring with the same WHERE.
# ---------------------------------------------------------------------------

ANN_FILTER_LABELS = (1, 2)


def ann_filtered_topk(sf_dir: str, k: int = 10):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray

    flt = pads.field("label").isin(list(ANN_FILTER_LABELS))
    ds = io.read_named(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"], filter=flt)

    q_full = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    q_row = q_full.filter(pc.equal(q_full["vec_id"], 0))
    q = sql_round(np.asarray(q_row["embedding"][0].as_py(), dtype=np.float64) * 1_000_000.0).astype(np.int64)
    q_ref = ray.put(q)

    def score_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        emb = batch["embedding"].combine_chunks()
        E = sql_round(
            np.asarray(emb.flatten(), dtype=np.float64).reshape(batch.num_rows, -1) * 1_000_000.0
        ).astype(np.int64)
        num = E @ qv
        den1 = (E * E).sum(axis=1)
        den0 = int(qv @ qv)
        cos = num.astype(np.float64) / (np.sqrt(den1.astype(np.float64)) * np.sqrt(np.float64(den0)))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        part = np.argpartition(-cos, kk - 1)[:kk] if kk < len(cos) else np.arange(len(cos))
        return pa.table({"vec_id": pa.array(ids[part], type=pa.int64()),
                         "cos_sim": pa.array(cos[part], type=pa.float64())})

    partials = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    top = partials.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
    return top.reset_index(drop=True).astype({"vec_id": "int64", "cos_sim": "float64"})


ANN_FILTERED_TOPK_SQL = f"""
WITH flat AS (
  SELECT vec_id, label, i, CAST(round(CAST(embedding[i] AS DOUBLE)*1000000) AS BIGINT) AS v
  FROM embeddings, range(1, 65) t(i)
), q AS (
  SELECT i, v FROM flat WHERE vec_id = 0
), den0 AS (
  SELECT SUM(v*v) AS d0 FROM q
), dots AS (
  SELECT f.vec_id, SUM(f.v*q.v) AS num, SUM(f.v*f.v) AS den1
  FROM flat f JOIN q USING (i)
  WHERE f.label IN {ANN_FILTER_LABELS}
  GROUP BY f.vec_id
)
SELECT vec_id,
       CAST(num AS DOUBLE)/(sqrt(CAST(den1 AS DOUBLE))*sqrt(CAST(d0 AS DOUBLE))) AS cos_sim
FROM dots, den0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# Raster zonal statistics — THE classic raster x vector operator (per-zone
# stats of a gridded field; the reference's basin/hillslope properties are
# the terrain-specific case). A res-8 synthetic DEM grid (131k cell
# centers, value a pure function of (iy, ix)) joins the broadcast polygon
# layer through the REAL engine path (PolygonIndex buckets -> bbox -> even-
# odd crossing test inside SpatialJoin tasks), then rolls up per zone at
# zone cardinality. The oracle runs the SAME even-odd crossing expression
# in SQL over the staged closed-edge table — point-in-polygon proven
# cross-engine, no twin. DuckDB's float x/0 is NULL, which the crossing
# conjunct masks exactly like numpy's ignored inf.
# ---------------------------------------------------------------------------

# res 10 (0.176-deg cells, 2.1M centers): 155 of the 200 polygons catch at
# least one center — non-trivial zones — while the oracle's bbox range join
# stays ~3 s in DuckDB
ZONAL_RES = 10
ZONAL_NPOLY = 200


def raster_zonal_stats(sf_dir: str):
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from .. import synth
    from ..stages.spatial_join import PolygonIndex, SpatialJoin
    from .relational import sorted_group_agg

    OF.stage_zonal_polys(sf_dir, ZONAL_NPOLY)
    nx, ny = 2 ** (ZONAL_RES + 1), 2 ** ZONAL_RES
    step = 180.0 / (2.0 ** ZONAL_RES)

    def grid(batch) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        iy = i // nx
        ix = i % nx
        return pa.table(
            {
                "lon": pa.array(-180.0 + (ix + 0.5) * step),
                "lat": pa.array(-90.0 + (iy + 0.5) * step),
                "dem": pa.array(((iy * 13 + ix * 7) % 97).astype(np.int64)),
            }
        )

    cells = rd.range(ny * nx, override_num_blocks=32).map_batches(grid, batch_format="pyarrow")
    layer = synth.make_polygons(ZONAL_NPOLY, cover_res=6)
    idx_ref = ray.put(PolygonIndex.from_synth(layer, cover_res=6))
    hits = cells.map_batches(
        SpatialJoin, fn_constructor_kwargs={"index_ref": idx_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    ).map_batches(
        lambda b: pa.table({"poly_id": b["poly_id"], "dem": b["dem"],
                            "dmin": b["dem"], "dmax": b["dem"]}),
        batch_format="pyarrow",
    )
    out = sorted_group_agg(
        hits, "poly_id", {"n_cells": "count", "dem": "sum", "dmin": "min", "dmax": "max"}
    ).to_pandas()
    out = out.rename(columns={"dem": "sum_dem", "dmin": "min_dem", "dmax": "max_dem"}).astype(
        {c: "int64" for c in ["poly_id", "n_cells", "sum_dem", "min_dem", "max_dem"]}
    )
    return out.sort_values("poly_id").reset_index(drop=True)[
        ["poly_id", "n_cells", "sum_dem", "min_dem", "max_dem"]
    ]


def _zonal_stats_sql() -> str:
    from .. import oracles as O

    nx, ny = 2 ** (ZONAL_RES + 1), 2 ** ZONAL_RES
    step = 180.0 / (2.0 ** ZONAL_RES)
    return f"""
WITH g AS (
  SELECT (i // {nx}) AS iy, (i % {nx}) AS ix FROM range({ny * nx}) t(i)
),
cells AS (
  SELECT -180.0 + (ix + 0.5) * {step!r} AS lon,
         -90.0 + (iy + 0.5) * {step!r} AS lat,
         CAST((iy * 13 + ix * 7) % 97 AS BIGINT) AS dem
  FROM g
),
cand AS (
  SELECT c.lon, c.lat, c.dem, b.poly_id
  FROM cells c JOIN read_parquet('{O.fixture_path("zonal_bbox")}') b
    ON c.lon >= b.b0 AND c.lon <= b.b2 AND c.lat >= b.b1 AND c.lat <= b.b3
),
hits AS (
  SELECT c.lon, c.lat, c.dem, c.poly_id,
         COUNT(*) FILTER (
           WHERE ((e.y0 <= c.lat) <> (e.y1 <= c.lat))
             AND c.lon < e.x0 + (c.lat - e.y0) * (e.x1 - e.x0) / (e.y1 - e.y0)
         ) AS k
  FROM cand c JOIN read_parquet('{O.fixture_path("zonal_edges")}') e USING (poly_id)
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(poly_id AS BIGINT) AS poly_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(dem) AS BIGINT) AS sum_dem,
       CAST(MIN(dem) AS BIGINT) AS min_dem,
       CAST(MAX(dem) AS BIGINT) AS max_dem
FROM hits WHERE k % 2 = 1
GROUP BY 1 ORDER BY 1
"""


