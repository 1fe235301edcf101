"""Second batch of driver-contract queries: time_average (SQL-checked),
dedup/text/ANN/terrain/flagship entries (rows-only where SQL cannot express
the op — the driver records a weaker rows-only check for those)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..numerics import sql_round

from .. import io


def _read(sf_dir: str, table: str, columns=None):
    return io.read_named(sf_dir, table, columns=columns)


# ---------------------------------------------------------------------------
# time_average over per-user event series (reference upscaling_tools.f90:
# 1-13 truncating block mean; engine functions/timeavg.py). Integer
# quantization keeps the SQL oracle bit-exact.
# ---------------------------------------------------------------------------

NT_OUT = 4


def events_time_average(sf_dir: str):
    from ..functions.timeavg import time_average_values

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    from ..stages.keyapply import bucketed_key_apply, key_run_starts

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # whole users per hash bucket; per-user chunk means computed for
        # ALL users at once via one cumsum + an (n_users, NT_OUT) gather
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        v = sql_round(g["value"].to_numpy() * 1000.0).astype(np.int64)
        u = g["user_id"].to_numpy()
        starts = np.flatnonzero(key_run_starts(u))
        counts = np.diff(np.append(starts, len(g)))
        keep = counts >= NT_OUT
        rec = {"user_id": pd.Series(u[starts[keep]], dtype="int64"),
               "nt_in": pd.Series(counts[keep], dtype="int64")}
        if keep.any():
            s, dt = starts[keep], counts[keep] // NT_OUT
            cs = np.concatenate([[0], np.cumsum(v)])
            ks = np.arange(NT_OUT)
            sums = cs[s[:, None] + (ks[None, :] + 1) * dt[:, None]] - cs[s[:, None] + ks[None, :] * dt[:, None]]
            avgs = sums.astype(np.float64) / (dt[:, None].astype(np.float64) * 1000.0)
        else:
            avgs = np.empty((0, NT_OUT))
        for k in range(NT_OUT):
            rec[f"avg_{k + 1}"] = pd.Series(avgs[:, k], dtype="float64")
        return pd.DataFrame(rec)

    out = bucketed_key_apply(ds, "user_id", per_bucket).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_TIME_AVERAGE_SQL = f"""
WITH s AS (
  SELECT user_id, list(CAST(round(value*1000) AS BIGINT) ORDER BY ts, event_id) AS l
  FROM events GROUP BY user_id
), d AS (
  SELECT user_id, l, len(l) AS nt_in, CAST(floor(len(l)/{NT_OUT}.0) AS BIGINT) AS dt
  FROM s WHERE len(l) >= {NT_OUT}
)
SELECT user_id, CAST(nt_in AS BIGINT) AS nt_in,
       CAST(list_sum(l[1 : dt]) AS DOUBLE)/(CAST(dt AS DOUBLE)*1000.0) AS avg_1,
       CAST(list_sum(l[dt+1 : 2*dt]) AS DOUBLE)/(CAST(dt AS DOUBLE)*1000.0) AS avg_2,
       CAST(list_sum(l[2*dt+1 : 3*dt]) AS DOUBLE)/(CAST(dt AS DOUBLE)*1000.0) AS avg_3,
       CAST(list_sum(l[3*dt+1 : 4*dt]) AS DOUBLE)/(CAST(dt AS DOUBLE)*1000.0) AS avg_4
FROM d ORDER BY user_id
"""


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
# n-gram Jaccard verify stage on the driver hash channel (reference
# dedup semantics; engine stages/dedup.py::pair_gram_overlap). The oracle
# recomputes the word-5-gram shingle sets FROM RAW TEXT in DuckDB (split,
# slice, distinct, set algebra) — genuinely cross-engine, no staged twin,
# and the compared quantities are exact integer set sizes.
# ---------------------------------------------------------------------------

def docs_jaccard_pairs(sf_dir: str):
    """Pair the 30 lexicographically-smallest doc_ids consecutively and
    compute each pair's exact shingle intersection/union sizes through the
    distributed join path (text never moves — only gram-hash blobs)."""
    import ray.data as rd

    from ..stages import dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ids = sorted(r["doc_id"] for r in ds.select_columns(["doc_id"]).sort("doc_id").limit(30).take_all())
    pairs = rd.from_pandas(pd.DataFrame({"id_a": ids[0::2], "id_b": ids[1::2]}))
    out = dedup.pair_gram_overlap(pairs, ds).to_pandas()
    return out.sort_values("id_a").reset_index(drop=True)


DOCS_JACCARD_PAIRS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
  FROM documents
  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 30)
),
nd AS (
  SELECT doc_id, ws, len(ws) AS nw,
         row_number() OVER (ORDER BY doc_id) AS rn
  FROM d
),
grams AS (
  SELECT rn, doc_id,
         coalesce(array_to_string(ws[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' '), '') AS gram
  FROM nd, unnest(range(1, greatest(nw - 4, 1) + 1)) t(i)
),
sets AS (SELECT DISTINCT rn, gram FROM grams),
ps AS (SELECT CAST((rn - 1) // 2 AS BIGINT) AS p, rn % 2 AS side, gram FROM sets),
agg AS (SELECT p, gram, count(DISTINCT side) AS nsides FROM ps GROUP BY p, gram),
stats AS (
  SELECT p,
         CAST(SUM(CASE WHEN nsides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS inter_sz,
         CAST(COUNT(*) AS BIGINT) AS union_sz
  FROM agg GROUP BY p
),
names AS (
  SELECT CAST((rn - 1) // 2 AS BIGINT) AS p,
         MAX(CASE WHEN rn % 2 = 1 THEN doc_id END) AS id_a,
         MAX(CASE WHEN rn % 2 = 0 THEN doc_id END) AS id_b
  FROM nd GROUP BY 1
)
SELECT n.id_a, n.id_b, s.inter_sz, s.union_sz
FROM stats s JOIN names n USING (p)
ORDER BY n.id_a
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
# As-of join on the driver hash channel (stages/asof.py; oracle = DuckDB's
# native ASOF JOIN — genuinely cross-engine, no staged twin). The corpus
# has unique (user_id, ts) pairs, so the engines' duplicate-time tie rules
# cannot diverge here; the engine's own rule is pinned by
# test_asof_join_duplicate_time_tie_rule.
# ---------------------------------------------------------------------------

def events_asof_purchase(sf_dir: str):
    """For every click event, the same user's most recent purchase at or
    before the click: distributed as-of join (side-tag map_batches +
    per-user sorted merge in groupby().map_groups — builder-brief custom
    operator, pattern (a))."""
    import pyarrow.compute as pc

    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def side(kind):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["event_type"], kind)).drop_columns(["event_type"])

        return f

    clicks = ev.map_batches(side("click"), batch_format="pyarrow").drop_columns(["value"])
    buys = ev.map_batches(side("purchase"), batch_format="pyarrow").map_batches(
        lambda b: b.rename_columns(["purchase_event", "ts", "user_id", "purchase_value"]),
        batch_format="pyarrow",
    )
    out = asof_join(
        clicks, buys, "user_id", "ts", ["event_id"], ["purchase_event", "purchase_value"],
        right_time_col="ts", direction="backward", join="inner",
    )
    # right_cols ride the union as float64 — restore the id's int64 after
    # the inner join (no nulls) so the dtype matches the SQL side
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    return pd.DataFrame(
        {
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"].astype("datetime64[us]"),
            "event_id": df["event_id"].astype("int64"),
            "purchase_event": df["purchase_event"].astype("int64"),
            "purchase_value": df["purchase_value"].astype("float64"),
        }
    )


EVENTS_ASOF_PURCHASE_SQL = """
SELECT l.user_id, l.ts, l.event_id,
       r.event_id AS purchase_event, r.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


# ---------------------------------------------------------------------------
# Range (interval) join on the driver hash channel (stages/rangejoin.py;
# oracle = a plain DuckDB inequality join — cross-engine, no staged twin).
# Every click event is matched to the same user's signup events whose
# 12-hour post-signup window contains the click: lo <= ts < hi with hi
# exclusive, all in exact epoch-microsecond int64 arithmetic on both
# engines.
# ---------------------------------------------------------------------------

_RJ_12H_US = 12 * 3600 * 1_000_000


def events_order_window_join(sf_dir: str):
    """Distributed bucketed interval join (1-D geocell-cover analogue:
    intervals exploded to width-w buckets, points to one bucket, composite
    (key, bucket) hash join + exact filter — each pair meets exactly once,
    no dedup)."""
    import pyarrow.compute as pc

    from ..stages.rangejoin import range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "click")).drop_columns(["event_type"]),
        batch_format="pyarrow",
    )

    def mk_iv(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "signup"))
        lo = b["ts"].cast(pa.int64())
        return pa.table(
            {
                "user_id": b["user_id"],
                "lo": lo,
                "hi": pc.add(lo, _RJ_12H_US),
                "signup_event": b["event_id"],
            }
        )

    iv = ev.map_batches(mk_iv, batch_format="pyarrow")
    out = range_join(
        clicks, iv, "user_id", "ts", "lo", "hi", bucket_width=_RJ_12H_US,
        point_cols=["event_id"], interval_cols=["signup_event"],
    )
    df = out.to_pandas().sort_values(["event_id", "signup_event"]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "signup_event": df["signup_event"].astype("int64"),
            "mins_since_signup": ((df["t_i"] - df["lo_i"]) // 60_000_000).astype("int64"),
        }
    )


EVENTS_ORDER_WINDOW_SQL = """
SELECT c.user_id, c.event_id, s.event_id AS signup_event,
       CAST(FLOOR((epoch_us(c.ts) - epoch_us(s.ts)) / 60000000) AS BIGINT)
         AS mins_since_signup
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON s.user_id = c.user_id
 AND epoch_us(c.ts) >= epoch_us(s.ts)
 AND epoch_us(c.ts) < epoch_us(s.ts) + 43200000000
ORDER BY c.event_id, signup_event
"""


# ---------------------------------------------------------------------------
# Sliding (hopping) window aggregate — the overlapping-window companion of
# events_tumbling_hourly (pipelines/relational.py). Window size 2 h, hop
# 30 min: size/hop = 4, so every event belongs to exactly 4 windows. The
# engine explodes each event to its 4 window keys in map_batches, partial-
# aggregates per (event_type, window_start) inside the batch, and finishes
# with the shuffle-free tree combine. window_start stays epoch-microsecond
# int64 on BOTH engines (no timestamp round-trip to diverge on).
# ---------------------------------------------------------------------------

_SW_HOP_US = 30 * 60 * 1_000_000
_SW_WINDOWS = 4  # size = 4 hops = 2 h


def events_sliding_windows(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = sql_round(b["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64)
        et = b["event_type"].to_pandas().to_numpy()
        base = t // _SW_HOP_US  # newest window containing t starts here
        n = len(t)
        j = np.tile(np.arange(_SW_WINDOWS, dtype=np.int64), n)
        starts = (np.repeat(base, _SW_WINDOWS) - j) * _SW_HOP_US
        df = pd.DataFrame(
            {
                "event_type": np.repeat(et, _SW_WINDOWS),
                "window_start_us": starts,
                "n_events": 1,
                "sum_v": np.repeat(v, _SW_WINDOWS),
            }
        )
        g = df.groupby(["event_type", "window_start_us"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (
        tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["event_type", "window_start_us"])
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "event_type": df["event_type"],
            "window_start_us": df["window_start_us"].astype("int64"),
            "n_events": df["n_events"].astype("int64"),
            "sum_value": df["sum_v"].astype("float64") / 1000.0,
        }
    )


EVENTS_SLIDING_WINDOWS_SQL = """
SELECT event_type,
       (epoch_us(ts) // 1800000000 - j) * 1800000000 AS window_start_us,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS DOUBLE)/1000.0 AS sum_value
FROM events, unnest([0, 1, 2, 3]) t(j)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Exact distributed quantiles on the driver hash channel
# (functions/quantiles.py; oracle = the SAME pinned rank rule as a
# windowed-cumsum in SQL — deliberately NOT quantile_disc, whose
# interpolation rule would be trusted rather than pinned). Both engines
# compute ceil(q*n) in identical IEEE double arithmetic.
# ---------------------------------------------------------------------------

def events_value_quantiles(sf_dir: str):
    from ..functions.quantiles import exact_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])
    df = exact_quantiles(ds, "event_type", "value", [0.25, 0.5, 0.9])
    return df.astype({"n": "int64", "q25": "int64", "q50": "int64", "q90": "int64"})


EVENTS_VALUE_QUANTILES_SQL = """
WITH q AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS qv FROM events),
c AS (SELECT event_type, qv, COUNT(*) AS n FROM q GROUP BY 1, 2),
w AS (SELECT event_type, qv,
             SUM(n) OVER (PARTITION BY event_type ORDER BY qv) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM c)
SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum >= CEIL(0.25 * tot) THEN qv END) AS BIGINT) AS q25,
       CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN qv END) AS BIGINT) AS q50,
       CAST(MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN qv END) AS BIGINT) AS q90
FROM w GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Per-key ordered running total (the distributed window-function shape):
# shuffle once on the partition key, order + prefix-sum INSIDE each group
# (groups are user-sized, never the whole table), emit per-event rows.
# Oracle: SUM() OVER (PARTITION BY ... ORDER BY ...) on the same quantized
# values — exact int math on both engines, any merge order.
# ---------------------------------------------------------------------------

def events_user_running_total(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_start_index

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # segmented cumsum over ALL users in the bucket: one global cumsum,
        # re-based at each user's first row
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        v = sql_round(g["value"].to_numpy() * 1000.0).astype(np.int64)
        u = g["user_id"].to_numpy()
        cs = np.cumsum(v)
        start = run_start_index(key_run_starts(u))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": pd.Series(u, dtype="int64"),
                "cum_v": cs - (cs[start] - v[start]),
            }
        )

    return bucketed_key_apply(ds, "user_id", per_bucket)


EVENTS_USER_RUNNING_TOTAL_SQL = """
WITH t AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_v
FROM t ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# Per-user exact MEDIAN — a holistic per-key statistic (not decomposable
# into mergeable partials like sum/min/max), so it NEEDS whole-key locality:
# bucketed_key_apply gives that with a bounded group count. Quantized int
# values make the even-count midpoint (a+b)/2 exact in float64 on both
# engines (ints < 2^52; .5 halves exactly representable).
# ---------------------------------------------------------------------------

def events_user_median_value(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "value"])
    from ..stages.keyapply import bucketed_key_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = sql_round(g["value"].to_numpy() * 1000.0).astype(np.int64)
        out = (
            pd.DataFrame({"user_id": g["user_id"].to_numpy().astype(np.int64), "v": v})
            .groupby("user_id", as_index=False)["v"]
            .median()
        )
        return pd.DataFrame({"user_id": out["user_id"].astype("int64"), "med_v": out["v"].astype("float64")})

    df = bucketed_key_apply(ds, "user_id", per_bucket).to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


EVENTS_USER_MEDIAN_SQL = """
SELECT user_id,
       CAST(median(CAST(round(value*1000) AS BIGINT)) AS DOUBLE) AS med_v
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Per-user rolling mean over a bounded frame (ROWS BETWEEN 3 PRECEDING AND
# CURRENT ROW) — the sliding-window-frame shape missing from the window
# family (running total = unbounded frame; tumbling/sliding = time-bucket
# windows). Vectorized for ALL users at once: one cumsum, per-row frame
# start clamped to the user's run start. The division is the ONE pinned
# IEEE op on both engines (exact int sum / exact int count).
# ---------------------------------------------------------------------------

ROLL_PRECEDING = 3


def events_user_rolling_mean(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_start_index

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        v = sql_round(g["value"].to_numpy() * 1000.0).astype(np.int64)
        u = g["user_id"].to_numpy()
        n = len(g)
        cs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(v)])
        idx = np.arange(n)
        start = run_start_index(key_run_starts(u))
        lo = np.maximum(idx - ROLL_PRECEDING, start)
        cnt = idx + 1 - lo
        roll = (cs[idx + 1] - cs[lo]).astype(np.float64) / cnt.astype(np.float64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": pd.Series(u, dtype="int64"),
                "roll_mean": roll,
            }
        )

    return bucketed_key_apply(ds, "user_id", per_bucket)


EVENTS_USER_ROLLING_MEAN_SQL = f"""
WITH t AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(v) OVER w AS DOUBLE) / CAST(COUNT(v) OVER w AS DOUBLE) AS roll_mean
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN {ROLL_PRECEDING} PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# Per-group top-k WITHOUT a global sort: each batch keeps its own top-k per
# group (vectorized sort + head), a combine level collapses up to 4096
# partial rows, the driver ranks the tiny survivor set. Shuffle-free — the
# moved volume is O(batches x groups x k), independent of row count.
# ---------------------------------------------------------------------------

def docs_top3_by_lang(sf_dir: str, k: int = 3):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        df = df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        return df.groupby("lang", as_index=False).head(k)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(
        topk, batch_format="pandas", batch_size=4096
    )
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = (df.groupby("lang").cumcount() + 1).astype("int64")
    return df[["lang", "rk", "doc_id", "n_chars"]].sort_values(["lang", "rk"]).reset_index(drop=True)


DOCS_TOP3_BY_LANG_SQL = """
SELECT lang, CAST(rn AS BIGINT) AS rk, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
WHERE rn <= 3 ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# Distributed pivot / crosstab: per-batch crosstab partials (one row per
# hour with one count column per pinned event type), tree-combined — the
# wide table never exceeds 24 x (len(types)+2) anywhere.
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_hour_pivot(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (us.astype("int64") // 3_600_000_000) % 24
        df = pd.DataFrame({"hour": hour.astype(np.int64), "et": b["event_type"].to_pandas()})
        g = df.groupby(["hour", "et"]).size().unstack(fill_value=0)
        out = pd.DataFrame({"hour": g.index.to_numpy(dtype=np.int64)})
        for t in EVENT_TYPES:
            out[f"n_{t}"] = g[t].to_numpy(dtype=np.int64) if t in g else np.int64(0)
        out["n_total"] = g.sum(axis=1).to_numpy(dtype=np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["hour"],
                        value_cols=[f"n_{t}" for t in EVENT_TYPES] + ["n_total"])
    return df.sort_values("hour").reset_index(drop=True).astype("int64")


EVENTS_TYPE_HOUR_PIVOT_SQL = """
SELECT CAST(hour(ts) AS BIGINT) AS hour,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*)                                        AS n_total
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Deterministic hash sampling: Knuth multiplicative hash on the id, keep
# h % 100 < rate. Pure per-batch filter (no shuffle, no RNG state), so the
# sample is reproducible across runs, partitionings, and engines. Domain
# bound: exact SQL mirroring holds for ids < 2^31 (the int64 product stays
# in range); past that the engine side wraps in uint64 and the oracle
# would need DuckDB's hugeint arithmetic.
# ---------------------------------------------------------------------------

KNUTH_MULT = 2654435761  # 2^32 / phi, Knuth TAOCP vol 3 s6.4
HASH_SAMPLE_PCT = 10  # pinned: interpolated into BOTH the engine filter and the SQL


def docs_hash_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        return b.filter(pa.array((h % np.uint64(100)) < np.uint64(HASH_SAMPLE_PCT)))

    return ds.map_batches(pick, batch_format="pyarrow")


DOCS_HASH_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE ((doc_id * {KNUTH_MULT}) % 4294967296) % 100 < {HASH_SAMPLE_PCT}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact distributed count-distinct: per-batch local dedupe (cuts the
# exchange to unique pairs per batch), ONE shuffle on the (day, user)
# pair bounded by |days| x |users| — not row count — then a shuffle-free
# tree combine for the per-day counts.
# ---------------------------------------------------------------------------

def events_daily_distinct_users(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "user_id"])
    from .relational import tree_group_sum

    def pairs(b: pa.Table) -> pa.Table:
        d = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        df = pd.DataFrame(
            {"day": np.datetime_as_string(d, unit="D"), "user_id": b["user_id"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = ds.map_batches(pairs, batch_format="pyarrow").groupby(["day", "user_id"]).count()

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"day": b["day"], "n_users": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    df = tree_group_sum(distinct.map_batches(ones, batch_format="pyarrow"), ["day"], value_cols=["n_users"])
    return df.sort_values("day").reset_index(drop=True).astype({"n_users": "int64"})


EVENTS_DAILY_DISTINCT_USERS_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Semi-structured field extraction: pull an int field out of a JSON props
# column with ONE compiled vectorized regex per batch (no per-row json.loads
# in the hot path), bucket it, and tree-combine the tiny aggregate. The
# oracle extracts with the SAME pinned pattern via DuckDB regexp_extract,
# so both engines parse identically (incl. missing-field rows -> dropped).
# ---------------------------------------------------------------------------

PROPS_K_PATTERN = r'"k":\s*(\d+)'


def events_props_bucket(sf_dir: str):
    import re

    ds = _read(sf_dir, "events", ["props", "value"])
    from .relational import tree_group_sum

    rx = re.compile(PROPS_K_PATTERN)

    def partial(b: pa.Table) -> pa.Table:
        s = b["props"].to_pandas()
        k = s.str.extract(rx, expand=False)
        ok = k.notna().to_numpy()
        kv = k[ok].to_numpy(dtype=np.int64)
        v = sql_round(b["value"].to_numpy(zero_copy_only=False)[ok] * 1000.0).astype(np.int64)
        df = pd.DataFrame({"k_bucket": kv % 10, "n": 1, "sum_v": v})
        return pa.Table.from_pandas(df.groupby("k_bucket", as_index=False).sum(), preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["k_bucket"], value_cols=["n", "sum_v"])
    df = df.sort_values("k_bucket").reset_index(drop=True)
    out = pd.DataFrame({"k_bucket": df["k_bucket"].astype("int64"), "n": df["n"].astype("int64")})
    out["sum_value"] = df["sum_v"].astype("float64") / 1000.0
    return out


EVENTS_PROPS_BUCKET_SQL = r"""
WITH t AS (
  SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10 AS k_bucket,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
  WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''
)
SELECT k_bucket, COUNT(*) AS n, CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE)/1000.0 AS sum_value
FROM t GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Per-label embedding centroid, exactly: components are quantized to 1e-6
# ints per batch (float32 -> float64 -> round, identical on both engines),
# summed per (label, dim) — exact in any order — and divided by the label
# count with one pinned IEEE expression at the end. Long (label, dim)
# format so the driver's sorted value hash covers every component.
# ---------------------------------------------------------------------------

def embeddings_label_centroid(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # np.stack needs >=1 array; empty blocks happen after repartition
            return pa.table({"label": pa.array([], type=pa.int64()), "dim": pa.array([], type=pa.int64()),
                             "s_q": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())})
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(b["embedding"].to_pandas().to_numpy())  # (rows, dim) float32
        q = sql_round(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        dim = q.shape[1]
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, dim)),
                "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), len(ulab))),
                "s_q": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnt, dim)),
            }
        )

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["label", "dim"], value_cols=["s_q", "n"])
    df = df.sort_values(["label", "dim"]).reset_index(drop=True)
    out = pd.DataFrame({"label": df["label"].astype("int64"), "dim": df["dim"].astype("int64")})
    out["n"] = df["n"].astype("int64")
    out["cmean"] = (df["s_q"].astype("float64") / 1_000_000.0) / df["n"].astype("float64")
    return out


EMBEDDINGS_LABEL_CENTROID_SQL = """
WITH comp AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
)
SELECT label, dim, COUNT(*) AS n,
       (CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE) AS cmean
FROM comp GROUP BY label, dim ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# Term document-frequency table (the inverted-index / TF-IDF base): one
# vectorized split+explode per batch; df partials are correct to sum
# because every document lives in exactly one batch (rows are documents).
# The moved volume is one row per distinct term per batch — vocabulary-
# bounded, not token-bounded.
# ---------------------------------------------------------------------------

def docs_term_df(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        toks = df.set_index("doc_id")["text"].str.split(" ").explode()
        toks = toks[toks != ""]
        t = toks.reset_index().rename(columns={"text": "term"})
        tf = t.groupby("term", as_index=False).size().rename(columns={"size": "tf"})
        dfreq = t.drop_duplicates().groupby("term", as_index=False).size().rename(columns={"size": "df"})
        out = tf.merge(dfreq, on="term")
        return pa.Table.from_pandas(out, preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["term"], value_cols=["tf", "df"])
    df = df.sort_values("term").reset_index(drop=True)
    return df.astype({"tf": "int64", "df": "int64"})[["term", "tf", "df"]]


DOCS_TERM_DF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), t AS (SELECT doc_id, term FROM toks WHERE term <> '')
SELECT term, COUNT(*) AS tf, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM t GROUP BY term ORDER BY term
"""


# ---------------------------------------------------------------------------
# Exact distributed Pearson correlation: the five co-moment sums
# (Sx, Sy, Sxy, Sxx, Syy) over integer-quantized values are exact in any
# combine order, tree-combined without a shuffle; the final r is ONE
# pinned IEEE float64 expression evaluated identically in both engines and
# rounded to 6 dp via the shared sql_round convention. Overflow: per-row
# sxx = x^2 reaches ~1.1e11 on this corpus (value <= ~328 -> x <= 327,530),
# which would wrap int64 at only ~8.6e7 rows, so sxy/sxx ship as (hi, lo)
# divmod-1e9 partials (the q1/q5 pattern) and reconstruct through EXACT
# Python ints -> one float conversion — the same value DuckDB gets from
# CAST(HUGEINT_sum AS DOUBLE). Remaining plain-int64 bounds: sx ~2.8e13
# rows, syy ~9.4e14 rows, hi-sums ~8.6e16 rows — all past 10^12.
# ---------------------------------------------------------------------------

def events_corr_value_k(sf_dir: str):
    import re

    ds = _read(sf_dir, "events", ["event_type", "value", "props"])
    from .relational import tree_group_sum

    rx = re.compile(PROPS_K_PATTERN)

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pandas()
        k = b["props"].to_pandas().str.extract(rx, expand=False)
        ok = k.notna().to_numpy()
        x = sql_round(b["value"].to_numpy(zero_copy_only=False)[ok] * 1000.0).astype(np.int64)
        y = k[ok].to_numpy(dtype=np.int64)
        df = pd.DataFrame(
            {
                "event_type": et[ok].to_numpy(),
                "n": 1,
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        g = df.groupby("event_type", as_index=False).sum()
        g["sxy_hi"], g["sxy_lo"] = divmod(g.pop("sxy"), 1_000_000_000)
        g["sxx_hi"], g["sxx_lo"] = divmod(g.pop("sxx"), 1_000_000_000)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["event_type"],
                        value_cols=["n", "sx", "sy", "syy", "sxy_hi", "sxy_lo", "sxx_hi", "sxx_lo"])
    df = df.sort_values("event_type").reset_index(drop=True)
    n = df["n"].astype("float64").to_numpy()
    sx = df["sx"].astype("float64").to_numpy()
    sy = df["sy"].astype("float64").to_numpy()
    # exact big-int reconstruction, then ONE float conversion (== DuckDB's
    # CAST(HUGEINT AS DOUBLE))
    sxy = np.asarray(
        [float(int(h) * 1_000_000_000 + int(l)) for h, l in zip(df["sxy_hi"], df["sxy_lo"])]
    )
    sxx = np.asarray(
        [float(int(h) * 1_000_000_000 + int(l)) for h, l in zip(df["sxx_hi"], df["sxx_lo"])]
    )
    syy = df["syy"].astype("float64").to_numpy()
    r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
    return pd.DataFrame(
        {
            "event_type": df["event_type"],
            "n": df["n"].astype("int64"),
            "corr_vk": sql_round(r * 1_000_000.0) / 1_000_000.0,
        }
    )


EVENTS_CORR_VALUE_K_SQL = r"""
WITH t AS (
  SELECT event_type,
         CAST(round(value*1000) AS BIGINT) AS x,
         CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS y
  FROM events
  WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''
), s AS (
  -- sxy/sxx stay HUGEINT (no BIGINT cast): the engine ships them as
  -- (hi, lo) split partials through the same overflow regime
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(x*y) AS sxy, SUM(x*x) AS sxx,
         CAST(SUM(y*y) AS BIGINT) AS syy
  FROM t GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS corr_vk
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Per-group argmax (mode): vocabulary-bounded (lang, term) counts via the
# shuffle-free tree combine, driver argmax with a pinned tie rule
# (highest count, then lexicographically smallest term).
# ---------------------------------------------------------------------------

def docs_top_term_per_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "text"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        toks = df.set_index("lang")["text"].str.split(" ").explode()
        toks = toks[toks != ""]
        t = toks.reset_index().rename(columns={"text": "term"})
        t["n"] = 1
        return pa.Table.from_pandas(t.groupby(["lang", "term"], as_index=False).sum(), preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["lang", "term"], value_cols=["n"])
    df = df.sort_values(["lang", "n", "term"], ascending=[True, False, True])
    top = df.groupby("lang", as_index=False).head(1).reset_index(drop=True)
    return pd.DataFrame(
        {"lang": top["lang"], "top_term": top["term"], "n": top["n"].astype("int64")}
    ).sort_values("lang").reset_index(drop=True)


DOCS_TOP_TERM_PER_LANG_SQL = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
), t AS (
  SELECT lang, term, COUNT(*) AS n FROM toks WHERE term <> '' GROUP BY 1, 2
), r AS (
  SELECT lang, term, n, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn FROM t
)
SELECT lang, term AS top_term, CAST(n AS BIGINT) AS n FROM r WHERE rn = 1 ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Anti-join / HAVING-zero shape: users with events but no BIG purchase
# (value > 150 -- chosen so the result is non-trivial at every scale
# factor: 8/15 users at sf0.001, 83/150 at sf0.01). One shuffle bounded
# by USER cardinality (per-batch partial max of a qualifying flag), not
# row count; the float threshold compares the SAME raw double on both
# engines.
# ---------------------------------------------------------------------------

def events_users_no_purchase(sf_dir: str, value_thr: float = 150.0):
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        big = (b["event_type"].to_pandas() == "purchase").to_numpy() & (
            b["value"].to_numpy(zero_copy_only=False) > value_thr
        )
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "p": big.astype(np.int64),
            }
        )
        return pa.Table.from_pandas(df.groupby("user_id", as_index=False).max(), preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(Max("p", alias_name="p"))
    df = agg.to_pandas()
    out = df[df["p"] == 0][["user_id"]].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_USERS_NO_PURCHASE_SQL = """
SELECT user_id FROM events
GROUP BY user_id
HAVING COUNT(*) FILTER (WHERE event_type = 'purchase' AND value > 150) = 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Rollup / grouping sets: the FINEST level (event_type, hour) is the only
# distributed aggregate (tree-combined, 24 x types rows); the coarser
# levels are derived from it on the driver — exact because the partials
# are exact ints. Sentinels: hour = -1 / event_type = 'ALL' for subtotals.
# ---------------------------------------------------------------------------

def events_rollup_type_hour(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (us.astype("int64") // 3_600_000_000) % 24
        v = sql_round(b["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": b["event_type"].to_pandas(), "hour": hour.astype(np.int64), "n": 1, "sv": v}
        )
        return pa.Table.from_pandas(df.groupby(["event_type", "hour"], as_index=False).sum(), preserve_index=False)

    fine = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["event_type", "hour"], value_cols=["n", "sv"])
    by_type = fine.groupby("event_type", as_index=False)[["n", "sv"]].sum()
    by_type["hour"] = -1
    total = pd.DataFrame({"event_type": ["ALL"], "hour": [-1], "n": [fine["n"].sum()], "sv": [fine["sv"].sum()]})
    allv = pd.concat([fine, by_type, total], ignore_index=True)
    out = pd.DataFrame(
        {
            "event_type": allv["event_type"],
            "hour": allv["hour"].astype("int64"),
            "n": allv["n"].astype("int64"),
            "sum_value": allv["sv"].astype("float64") / 1000.0,
        }
    )
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


EVENTS_ROLLUP_TYPE_HOUR_SQL = """
WITH t AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(hour, -1) AS hour,
       COUNT(*) AS n,
       CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE)/1000.0 AS sum_value
FROM t
GROUP BY GROUPING SETS ((event_type, hour), (event_type), ())
ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# Conversion funnel: first signup -> purchase within 7 days, aggregated by
# signup day. Per-user logic runs inside user-sized groups (one shuffle on
# the key); the per-day rollup is tree-combined. The rate is ONE pinned
# IEEE division rounded to 6 dp on both engines.
# ---------------------------------------------------------------------------

FUNNEL_WINDOW_US = 7 * 86400 * 1_000_000


def events_signup_funnel(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    from .relational import tree_group_sum

    from ..stages.keyapply import bucketed_key_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # whole users per hash bucket: per-user first signup via a cython
        # groupby-min, conversion via a merge of the bucket's purchases
        # against those signups, then a per-day pre-aggregate
        et = g["event_type"].to_numpy()
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        u = g["user_id"].to_numpy()
        empty = pd.DataFrame({"day": pd.Series([], dtype=str), "n_users": pd.Series([], dtype=np.int64),
                              "n_converted": pd.Series([], dtype=np.int64)})
        sm = et == "signup"
        if not sm.any():
            return empty
        m = pd.DataFrame({"u": u[sm], "s": us[sm]}).groupby("u", as_index=False)["s"].min()
        pm = et == "purchase"
        p = pd.DataFrame({"u": u[pm], "t": us[pm]}).merge(m, on="u")
        conv_u = p.loc[(p["t"] >= p["s"]) & (p["t"] < p["s"] + FUNNEL_WINDOW_US), "u"].unique()
        m["c"] = m["u"].isin(conv_u).astype(np.int64)
        m["day"] = np.datetime_as_string(m["s"].to_numpy().astype("datetime64[us]").astype("datetime64[D]"), unit="D")
        out = m.groupby("day", as_index=False).agg(n_users=("c", "size"), n_converted=("c", "sum"))
        return out[["day", "n_users", "n_converted"]].astype({"n_users": np.int64, "n_converted": np.int64})

    per = bucketed_key_apply(ds, "user_id", per_bucket)
    df = tree_group_sum(per, ["day"], value_cols=["n_users", "n_converted"])
    df = df.sort_values("day").reset_index(drop=True)
    out = pd.DataFrame(
        {
            "day": df["day"],
            "n_users": df["n_users"].astype("int64"),
            "n_converted": df["n_converted"].astype("int64"),
        }
    )
    # pinned 6-dp rounding (sql_round == DuckDB round(x,6), verified incl.
    # exactly-representable ratio ties like 5/128) — np.round's half-even
    # would diverge exactly there
    out["conv_rate"] = (
        sql_round(out["n_converted"].to_numpy(dtype=np.float64) / out["n_users"].to_numpy(dtype=np.float64) * 1_000_000.0)
        / 1_000_000.0
    )
    return out


EVENTS_SIGNUP_FUNNEL_SQL = f"""
WITH fs AS (
  SELECT user_id, MIN(CAST(epoch_us(ts) AS BIGINT)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY 1
), conv AS (
  SELECT f.user_id, f.s_us,
         MAX(CASE WHEN e.event_type = 'purchase'
                   AND CAST(epoch_us(e.ts) AS BIGINT) >= f.s_us
                   AND CAST(epoch_us(e.ts) AS BIGINT) < f.s_us + {FUNNEL_WINDOW_US}
                  THEN 1 ELSE 0 END) AS c
  FROM fs f JOIN events e ON f.user_id = e.user_id
  GROUP BY 1, 2
)
SELECT strftime(make_timestamp(s_us), '%Y-%m-%d') AS day,
       COUNT(*) AS n_users,
       CAST(SUM(c) AS BIGINT) AS n_converted,
       round(CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS conv_rate
FROM conv GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Exact-size uniform sample (k smallest pinned-hash values = a determinis-
# tic sample of EXACTLY k rows, the rate-free counterpart of
# docs_hash_sample): batch-local top-k by (hash, id) + a combine level +
# driver final — the partial-top-k merge argument, no global sort. The
# oracle is ORDER BY the same hash LIMIT k.
# ---------------------------------------------------------------------------

SAMPLE_K = 20


def docs_sample_k(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        did = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        df = df.assign(h=((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64))
        return df.sort_values(["h", "doc_id"]).head(SAMPLE_K)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(topk, batch_format="pandas", batch_size=4096)
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["rk", "doc_id", "lang", "n_chars", "h"]]


DOCS_SAMPLE_K_SQL = f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS rk,
       doc_id, lang, n_chars, h
FROM (
  SELECT doc_id, lang, n_chars,
         ((doc_id * {KNUTH_MULT}) % 4294967296) AS h
  FROM documents
)
ORDER BY h, doc_id LIMIT {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Test-set decontamination (stages/decontam.py): the eval split is a pinned
# Knuth-hash slice of the corpus (stand-in for a benchmark suite), its
# distinct 5-gram set is built with per-batch unique partials and broadcast
# ONCE; the train side streams through one gram-hash + searchsorted probe
# per batch. The oracle recomputes grams from raw text in DuckDB (string
# grams vs the engine's 64-bit gram hashes — cross-engine, not a twin).
# The documented scale path past a broadcastable eval set is the Bloom
# OR-fold build in the same module (no false negatives: over-flag only).
# ---------------------------------------------------------------------------

EVAL_PCT = 5  # pinned eval-slice rate, interpolated into engine + SQL
DECONTAM_K = 5


def docs_decontaminate(sf_dir: str):
    import ray

    from ..stages import decontam as DC

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_eval_mask(b: pa.Table) -> np.ndarray:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        return (h % np.uint64(100)) < np.uint64(EVAL_PCT)

    eval_ds = ds.map_batches(lambda b: b.filter(pa.array(is_eval_mask(b))), batch_format="pyarrow")
    train_ds = ds.map_batches(lambda b: b.filter(pa.array(~is_eval_mask(b))), batch_format="pyarrow")

    grams = DC.gram_set_exact(eval_ds, "text", k=DECONTAM_K)
    counts = DC.contamination_counts(train_ds, ray.put(grams), "text", "doc_id", k=DECONTAM_K)
    hit = counts.filter(expr="n_hits > 0").to_pandas()
    return hit.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_grams": "int64", "n_hits": "int64"}
    )


DOCS_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
         ((doc_id * {KNUTH_MULT}) % 4294967296) % 100 < {EVAL_PCT} AS is_eval
  FROM documents
), g AS (
  SELECT doc_id, is_eval,
         CASE WHEN len(w) >= {DECONTAM_K} THEN array_to_string(w[i:i+{DECONTAM_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {DECONTAM_K} THEN range(1, len(w) - {DECONTAM_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
), eg AS (SELECT DISTINCT gram FROM g WHERE is_eval),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_grams,
         COUNT(*) FILTER (WHERE eg.gram IS NOT NULL) AS n_hits
  FROM g LEFT JOIN eg ON g.gram = eg.gram
  WHERE NOT g.is_eval GROUP BY g.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, CAST(n_hits AS BIGINT) AS n_hits
FROM hits WHERE n_hits > 0 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Training-window chunking: explode each document into fixed-size token
# windows (the packing step before tokenizer sharding). Pinned rule shared
# with the SQL: words = split-and-drop-empties; chunk starts at 0, W, 2W,
# ...; a document with zero words still emits ONE empty chunk. Per-batch
# vectorized (explode + cumcount); the ' '.join is per OUTPUT row (chunk),
# the stage's own cardinality, not a per-word interpreter loop.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32


def docs_chunk_windows(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = CHUNK_TOKENS

    def chunks(b: pa.Table) -> pa.Table:
        from ..stages.text import chunk_windows_df

        g = chunk_windows_df(b.to_pandas(), "doc_id", "text", W)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = ds.map_batches(chunks, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


DOCS_CHUNK_WINDOWS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents)
SELECT doc_id, CAST(s/{CHUNK_TOKENS} AS BIGINT) AS chunk_id,
       CAST(LEAST(s+{CHUNK_TOKENS}, len(w)) - s AS BIGINT) AS n_tokens,
       COALESCE(array_to_string(w[s+1 : LEAST(s+{CHUNK_TOKENS}, len(w))], ' '), '') AS chunk_text
FROM toks, UNNEST(range(0, GREATEST(len(w), 1), {CHUNK_TOKENS})) AS t(s)
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition stats (Rae et al. 2021 quality rules): per-doc
# duplicate-word fraction and top-word fraction. One word-hash pass +
# lexsort run-length per batch — no per-doc loop; fractions rounded via
# the shared sql_round convention so DuckDB's round() agrees exactly.
# ---------------------------------------------------------------------------

def docs_repetition_stats(sf_dir: str):
    from ..stages.sketch import word_hash_flat

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        Wh, off = word_hash_flat(b["text"])
        n_docs = len(off) - 1
        nwords = (off[1:] - off[:-1]).astype(np.int64)
        docidx = np.repeat(np.arange(n_docs), nwords)
        order = np.lexsort((Wh, docidx))
        Ws, Ds = Wh[order], docidx[order]
        if len(Ws):
            new = np.concatenate([[True], (Ws[1:] != Ws[:-1]) | (Ds[1:] != Ds[:-1])])
            run_id = np.cumsum(new) - 1
            run_counts = np.bincount(run_id)
            run_doc = Ds[new]
            distinct = np.bincount(run_doc, minlength=n_docs)
            starts = np.searchsorted(run_doc, np.arange(n_docs))
            has = distinct > 0
            maxc = np.zeros(n_docs, dtype=np.int64)
            if has.any():
                maxc[has] = np.maximum.reduceat(run_counts, starts[has])
        else:
            distinct = np.zeros(n_docs, dtype=np.int64)
            maxc = np.zeros(n_docs, dtype=np.int64)
        nz = np.maximum(nwords, 1).astype(np.float64)
        dup = sql_round((1.0 - distinct / nz) * 1e6) / 1e6
        top = sql_round((maxc / nz) * 1e6) / 1e6
        keep = nwords > 0  # SQL's per-word GROUP BY drops zero-word docs
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(keep)),
                "n_words": pa.array(nwords[keep]),
                "n_distinct": pa.array(distinct[keep].astype(np.int64)),
                "dup_frac": pa.array(dup[keep]),
                "top_frac": pa.array(top[keep]),
            }
        )

    df = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOCS_REPETITION_STATS_SQL = """
WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS wd FROM documents),
c AS (SELECT doc_id, wd, COUNT(*) AS cnt FROM toks GROUP BY doc_id, wd),
a AS (SELECT doc_id, SUM(cnt) AS n_words, COUNT(*) AS n_distinct, MAX(cnt) AS max_cnt FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, CAST(n_distinct AS BIGINT) AS n_distinct,
       round(1 - CAST(n_distinct AS DOUBLE)/n_words, 6) AS dup_frac,
       round(CAST(max_cnt AS DOUBLE)/n_words, 6) AS top_frac
FROM a ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Sensitive-field redaction: mask high values of the props "k" field with
# ONE compiled vectorized regex per batch (count, then constant-replace —
# no backrefs, so Python re and DuckDB's RE2 substitute identically).
# Pure per-batch map; the redacted strings themselves go through the value
# hash, so the oracle checks content, not just counts.
# ---------------------------------------------------------------------------

REDACT_PATTERN = r": [5-9][0-9]\}"
REDACT_REPL = ": -1}"


def events_props_redact(sf_dir: str):
    import re

    ds = _read(sf_dir, "events", ["event_id", "props"])
    rx = re.compile(REDACT_PATTERN)

    def redact(b: pa.Table) -> pa.Table:
        s = b["props"].to_pandas()
        n = s.str.count(rx).astype(np.int64)
        red = s.str.replace(rx, REDACT_REPL, regex=True)
        return pa.table(
            {
                "event_id": b["event_id"],
                "props_redacted": pa.array(red, type=pa.string()),
                "n_redacted": pa.array(n.to_numpy()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


EVENTS_PROPS_REDACT_SQL = rf"""
SELECT event_id,
       regexp_replace(props, '{REDACT_PATTERN}', '{REDACT_REPL}', 'g') AS props_redacted,
       CAST(len(regexp_extract_all(props, '{REDACT_PATTERN}')) AS BIGINT) AS n_redacted
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Stratified (per-group quota) sampling: k docs per language, determined by
# the pinned Knuth hash so the sample is reproducible across engines and
# partitionings. Batch-local per-group top-k -> tree combine -> driver
# finish over <= langs*k rows per level (the docs_top3_by_lang lever) — a
# per-group ORDER BY/LIMIT with NO global sort or shuffle.
# ---------------------------------------------------------------------------

STRATIFIED_K = 20


def docs_stratified_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        did = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        df = df.assign(h=((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64))
        df = df.sort_values(["lang", "h", "doc_id"])
        return df.groupby("lang", as_index=False).head(STRATIFIED_K)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(
        topk, batch_format="pandas", batch_size=4096
    )
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = (df.groupby("lang").cumcount() + 1).astype("int64")
    return df[["lang", "rk", "doc_id"]].sort_values(["lang", "rk"]).reset_index(drop=True)


DOCS_STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, CAST(rn AS BIGINT) AS rk, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY (doc_id * {KNUTH_MULT}) % 4294967296, doc_id) AS rn
  FROM documents
)
WHERE rn <= {STRATIFIED_K} ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-Res, 2006):
# each row draws u = (knuth_hash(id)+1)/2^32 in (0,1] and priority
# key = -ln(u)/w; the k SMALLEST keys are a weight-proportional sample.
# Deterministic (hash-derived u, no RNG state), so the SQL oracle
# recomputes the identical priorities. Distributed shape = the same
# batch-local top-k -> combine level -> driver top-k as docs_sample_k:
# moved volume is O(batches x k) rows, never the corpus. Weight here is
# n_chars (sample long documents proportionally more often).
# ---------------------------------------------------------------------------

def docs_weighted_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        if "key" not in df.columns:
            did = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
            h = ((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
            u = (h + 1.0) / 4294967296.0
            w = np.maximum(df["n_chars"].to_numpy(dtype=np.float64), 1.0)
            df = df.assign(key=-np.log(u) / w)
        return df.sort_values(["key", "doc_id"]).head(SAMPLE_K)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(topk, batch_format="pandas", batch_size=4096)
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["key"] = sql_round(df["key"].to_numpy() * 1e6).astype(np.int64)
    return df[["rk", "doc_id", "lang", "n_chars", "key"]]


DOCS_WEIGHTED_SAMPLE_SQL = f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY key, doc_id) AS BIGINT) AS rk,
       doc_id, lang, n_chars, CAST(round(key * 1000000) AS BIGINT) AS key
FROM (
  SELECT doc_id, lang, n_chars,
         -LN((CAST((doc_id * {KNUTH_MULT}) % 4294967296 AS DOUBLE) + 1.0) / 4294967296.0)
           / GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS key
  FROM documents
)
ORDER BY key, doc_id LIMIT {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Sequence packing (stages/scan.py): GPT-style training-data prep —
# documents concatenated in doc_id order into fixed-length token windows;
# each doc's sequence id/offset is a pure function of the global ordered
# prefix sum, computed with the two-phase distributed scan (per-bucket
# sums -> tiny driver prefix -> one groupby(bucket) local cumsum). Oracle:
# the same pinned rule as a SQL window cumsum over the same tokenizer
# (regexp_split_to_array == the engine's Arrow split, proven by
# docs_token_stats).
# ---------------------------------------------------------------------------

PACK_SEQ_LEN = 512


def docs_pack_sequences(sf_dir: str):
    import pyarrow.compute as pc

    from ..stages.scan import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern_regex(b["text"], r"\s+")).cast(pa.int64())
        return pa.table({"doc_id": b["doc_id"], "n_tokens": n})

    out = pack_sequences(
        ds.map_batches(toks, batch_format="pyarrow"), "doc_id", "n_tokens", PACK_SEQ_LEN, bucket_width=64
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


DOCS_PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER (ORDER BY doc_id) AS cum FROM t)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {PACK_SEQ_LEN} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Chunk-level exact dedup: the window-chunker's windows, deduplicated
# globally by content with keeper = MIN(doc_id) per distinct chunk text.
# Distributed path shuffles only (chunk-hash, doc, copies) triples and
# paints keepers back with a hash-partitioned join (stages/dedup.py::
# chunk_exact_dedup); the oracle regroups the same windows by chunk_text.
# ---------------------------------------------------------------------------

def docs_chunk_dedup(sf_dir: str):
    from ..stages.dedup import chunk_exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = chunk_exact_dedup(ds, window_tokens=CHUNK_TOKENS).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return df.astype({"doc_id": "int64", "n_chunks": "int64", "n_kept": "int64", "n_dropped": "int64"})


DOCS_CHUNK_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents),
chunks AS (
  SELECT doc_id, COALESCE(array_to_string(w[s+1 : LEAST(s+{CHUNK_TOKENS}, len(w))], ' '), '') AS chunk_text
  FROM toks, UNNEST(range(0, GREATEST(len(w), 1), {CHUNK_TOKENS})) AS t(s)
),
owners AS (SELECT chunk_text, MIN(doc_id) AS keeper FROM chunks GROUP BY chunk_text)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (WHERE o.keeper = c.doc_id) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE o.keeper <> c.doc_id) AS BIGINT) AS n_dropped
FROM chunks c JOIN owners o USING (chunk_text)
GROUP BY c.doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic global training shuffle: every document gets its position in
# the seeded shuffled stream (rank over the pinned Knuth hash, doc_id
# tie-break). Distributed as the ordered scan over a packed
# (hash << 31 | doc_id) key — value 1, so cum-1 IS the 0-based rank — with
# doc_id recovered from the key's low bits afterward; the bucket width is
# sized from the corpus row count so sparse hash-space keys still land
# ~4k rows per scan bucket. Shares the documented doc_id < 2^31 SQL-mirror
# bound with docs_hash_sample.
# ---------------------------------------------------------------------------

def docs_shuffle_rank(sf_dir: str):
    from ..stages.scan import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()  # parquet metadata count — no pipeline execution

    def key(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
        k = (h << np.int64(31)) | did.astype(np.int64)
        return pa.table({"k": pa.array(k, type=pa.int64()), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    # keys are uniform over [0, 2^63): size buckets to ~4k rows each so the
    # per-bucket map_groups pass gets real groups, not singletons
    bw = max((1 << 63) // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(ds.map_batches(key, batch_format="pyarrow"), "k", "one", bucket_width=bw)

    def finish(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        cum = b["cum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(k & np.int64((1 << 31) - 1), type=pa.int64()),
                "shuffle_pos": pa.array(cum - 1, type=pa.int64()),
            }
        )

    df = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOCS_SHUFFLE_RANK_SQL = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY (doc_id * {KNUTH_MULT}) % 4294967296, doc_id) - 1 AS BIGINT)
         AS shuffle_pos
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Duplicated-span statistics (ExactSubstr-style signal): every OVERLAPPING
# k-token window, counted as duplicated when its content occurs >= 2 times
# anywhere in the corpus. Distributed path shuffles only (window-hash, doc,
# copies) triples and paints global multiplicities back with a
# hash-partitioned join (stages/dedup.py::dup_span_stats); the oracle
# regroups the same windows by window TEXT (cross-engine: string grams vs
# the engine's 64-bit gram hashes). Short docs (< k words) emit one
# whole-doc window — the decontamination kernel's pinned rule.
# ---------------------------------------------------------------------------

DUP_SPAN_K = 8


def docs_dup_spans(sf_dir: str):
    from ..stages.dedup import dup_span_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = dup_span_stats(ds, k=DUP_SPAN_K).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return df.astype({"doc_id": "int64", "n_windows": "int64", "n_dup_windows": "int64"})


DOCS_DUP_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {DUP_SPAN_K} THEN array_to_string(w[i:i+{DUP_SPAN_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {DUP_SPAN_K} THEN range(1, len(w) - {DUP_SPAN_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
),
tot AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(*) FILTER (WHERE tot.cnt >= 2) AS BIGINT) AS n_dup_windows
FROM g JOIN tot USING (gram)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# Frequent n-gram mining (boilerplate/template detection): every 5-word
# window whose content occurs >= T times corpus-wide, with its exact count.
# Threshold form, not top-k — no tie plateau at the cutoff, so the oracle
# is a plain GROUP BY ... HAVING. Two passes: (1) count by 64-bit gram-fold
# hash (sorted_group_agg — nearly-unique key space), survivors (tiny by
# construction) collected + broadcast; (2) gram TEXT is rebuilt only for
# survivor hits (a per-hit loop bounded by survivor occurrences, not corpus
# size) — full gram strings never shuffle. Short docs emit the pinned
# whole-doc gram (decontam kernel rule).
# ---------------------------------------------------------------------------

FREQ_NGRAM_K = 5
FREQ_NGRAM_MIN = 2


def docs_frequent_ngrams(sf_dir: str):
    import ray

    from ..stages.sketch import gram_hash_flat
    from .relational import sorted_group_agg

    K, T = FREQ_NGRAM_K, FREQ_NGRAM_MIN
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_partial(b: pa.Table) -> pa.Table:
        g, _, _ = gram_hash_flat(b["text"], K)
        part = pd.DataFrame({"h": g.view(np.int64)})
        part = part.groupby("h", as_index=False).size().rename(columns={"size": "m"})
        return pa.table(
            {
                "h": pa.array(part["h"].to_numpy(dtype=np.int64), type=pa.int64()),
                "m": pa.array(part["m"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    totals = sorted_group_agg(ds.map_batches(gram_partial, batch_format="pyarrow"), "h", {"m": "sum"})
    surv_df = totals.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["m"], T)), batch_format="pyarrow"
    ).to_pandas()
    if len(surv_df) == 0:
        return pd.DataFrame({"gram": pd.Series([], dtype="object"), "cnt": pd.Series([], dtype="int64")})
    surv = np.sort(surv_df["h"].to_numpy(dtype=np.int64))
    surv_ref = ray.put(surv)

    def extract(b: pa.Table) -> pa.Table:
        sv = ray.get(surv_ref)
        g, go, docidx = gram_hash_flat(b["text"], K)
        gi = g.view(np.int64)
        pos = np.searchsorted(sv, gi)
        hit = (pos < len(sv)) & (sv[np.clip(pos, 0, len(sv) - 1)] == gi)
        idx = np.flatnonzero(hit)
        if len(idx) == 0:
            return pa.table({"h": pa.array([], type=pa.int64()), "gram": pa.array([], type=pa.string())})
        texts = b["text"].to_pandas()
        words_cache: dict[int, list[str]] = {}
        out_h, out_t = [], []
        # survivor-occurrence loop (bounded by the broadcast survivor set's
        # hits in this batch, not by corpus size)
        for i in idx.tolist():
            d = int(docidx[i])
            if d not in words_cache:
                t = texts.iloc[d]
                words_cache[d] = [w for w in t.split(" ") if w != ""] if isinstance(t, str) else []
            words = words_cache[d]
            p = i - int(go[d])
            gram = " ".join(words[p : p + K]) if len(words) >= K else " ".join(words)
            out_h.append(int(gi[i]))
            out_t.append(gram)
        df = pd.DataFrame({"h": out_h, "gram": out_t}).drop_duplicates("h")
        return pa.Table.from_pandas(df, preserve_index=False)

    texts_df = ds.map_batches(extract, batch_format="pyarrow").to_pandas().drop_duplicates("h")
    out = texts_df.merge(surv_df.rename(columns={"m": "cnt"}), on="h")[["gram", "cnt"]]
    return out.sort_values("gram").reset_index(drop=True).astype({"cnt": "int64"})


DOCS_FREQUENT_NGRAMS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents),
g AS (
  SELECT CASE WHEN len(w) >= {FREQ_NGRAM_K} THEN array_to_string(w[i:i+{FREQ_NGRAM_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {FREQ_NGRAM_K} THEN range(1, len(w) - {FREQ_NGRAM_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY gram HAVING COUNT(*) >= {FREQ_NGRAM_MIN}
ORDER BY gram
"""


# ---------------------------------------------------------------------------
# HyperLogLog register table (Flajolet et al. 2007): the mergeable
# count-distinct sketch a 100 TB pipeline uses when the exact pair shuffle
# (events_daily_distinct_users) is too wide. The sketch is DETERMINISTIC
# here — the pinned 32-bit Knuth hash, bucket = top HLL_B bits, rho =
# leading zeros of the low HLL_W bits + 1 — so the DuckDB oracle rebuilds
# the EXACT register values in pure SQL (length(bin(w)) is the integer
# bit-length; no float log2, no approximation in the check). Registers
# max-combine associatively: per-batch partials collapse each batch to
# <= 2^HLL_B rows, two shuffle-free map_batches max-levels bound the
# driver collect exactly like tree_group_sum. Same documented bound as
# docs_hash_sample: exact SQL mirroring needs user_id < 2^31.
# The cardinality ESTIMATE from these registers is asserted against the
# exact count in tests/test_warehouse_queries.py (rel. err << 1.04/sqrt(m)
# would be luck; < 5% is the bar there).
# ---------------------------------------------------------------------------

HLL_B = 12  # 2^12 = 4096 registers
HLL_W = 20  # rho window: low 20 bits of the 32-bit hash


def events_hll_registers(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (uid * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        bucket = (h >> np.uint64(HLL_W)).astype(np.int64)
        w = (h & np.uint64((1 << HLL_W) - 1)).astype(np.int64)
        # exact integer bit-length via frexp (every w < 2^53 is an exact
        # double, and frexp's exponent IS the bit count — no log2 rounding)
        _, e = np.frexp(w.astype(np.float64))
        rho = np.where(w > 0, HLL_W + 1 - e, HLL_W + 1).astype(np.int64)
        df = pd.DataFrame({"bucket": bucket, "max_rho": rho}).groupby("bucket", as_index=False).max()
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("bucket", as_index=False).max()

    lvl = ds.map_batches(partial, batch_format="pyarrow")
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=4096)
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=4096)
    df = lvl.to_pandas()
    if df.empty:
        return df.reindex(columns=["bucket", "max_rho"])
    out = df.groupby("bucket", as_index=False).max().astype({"bucket": "int64", "max_rho": "int64"})
    return out.sort_values("bucket").reset_index(drop=True)


def hll_estimate(registers: "pd.DataFrame", b: int = HLL_B) -> float:
    """Standard HLL estimator over an events_hll_registers result (missing
    buckets are zero registers). Used by the accuracy test, not the gate."""
    m = 1 << b
    reg = np.zeros(m, dtype=np.int64)
    if len(registers):
        reg[registers["bucket"].to_numpy(dtype=np.int64)] = registers["max_rho"].to_numpy(dtype=np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


EVENTS_HLL_SQL = f"""
WITH h AS (
  SELECT ((user_id * {KNUTH_MULT}) % 4294967296) AS hv FROM events
)
SELECT CAST((hv >> {HLL_W}) AS BIGINT) AS bucket,
       CAST(MAX(CASE WHEN (hv % {1 << HLL_W}) = 0 THEN {HLL_W + 1}
                     ELSE {HLL_W + 1} - length(bin(hv % {1 << HLL_W})) END) AS BIGINT) AS max_rho
FROM h GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Count-Min sketch registers (Cormode & Muthukrishnan 2005): the mergeable
# FREQUENCY sketch beside events_hll_registers' cardinality sketch. d=3
# pinned affine hashes over the pinned 32-bit space, w=1024 buckets per
# row; registers are per-(row,bucket) COUNTS, so partials sum exactly in
# any order and the finish is the same shuffle-free tree combine as every
# tiny-cardinality aggregate here (3072 groups). The DuckDB oracle
# rebuilds the registers with the SAME three hash expressions (UNION ALL),
# so the gate checks every register value, not an estimate. The CMS
# guarantee (point estimate >= true count, overshoot <= eps*N w.h.p.) is
# asserted in tests/test_warehouse_queries.py. Same documented bound as
# docs_hash_sample: exact SQL mirroring needs user_id < 2^31.
# ---------------------------------------------------------------------------

CMS_W = 1024
CMS_ROWS = ((2654435761, 0), (2246822519, 12345), (3266489917, 67890))  # (mult, add)


def events_cms_registers(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rows, buckets, counts = [], [], []
        for i, (a, c) in enumerate(CMS_ROWS):
            h = ((uid * np.uint64(a) + np.uint64(c)) & np.uint64(0xFFFFFFFF)) % np.uint64(CMS_W)
            cnt = np.bincount(h.astype(np.int64), minlength=CMS_W)
            nz = np.nonzero(cnt)[0]
            rows.append(np.full(len(nz), i, dtype=np.int64))
            buckets.append(nz.astype(np.int64))
            counts.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows)),
                "bucket": pa.array(np.concatenate(buckets)),
                "count": pa.array(np.concatenate(counts)),
            }
        )

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["row", "bucket"], value_cols=["count"])
    df = df.astype({"row": "int64", "bucket": "int64", "count": "int64"})
    return df.sort_values(["row", "bucket"]).reset_index(drop=True)


def cms_point_estimate(registers: "pd.DataFrame", key: int) -> int:
    """min over rows of the key's register — the CMS point query (test
    helper, not part of the gate)."""
    est = None
    for i, (a, c) in enumerate(CMS_ROWS):
        b = int(((key * a + c) % (1 << 32)) % CMS_W)
        hit = registers[(registers["row"] == i) & (registers["bucket"] == b)]
        v = int(hit["count"].iloc[0]) if len(hit) else 0
        est = v if est is None else min(est, v)
    return int(est)


EVENTS_CMS_SQL = " UNION ALL ".join(
    f"""
SELECT {i} AS row,
       ((user_id * {a} + {c}) % 4294967296) % {CMS_W} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS count
FROM events GROUP BY 2"""
    for i, (a, c) in enumerate(CMS_ROWS)
)


# ---------------------------------------------------------------------------
# End-to-end LLM training-data prep funnel: the composition query — token
# filter -> exact dedup -> decontamination -> sequence packing, reported
# as per-stage (docs, tokens) totals. Every stage reuses the pinned rule
# its standalone query already proves (regexp \s+ token counts ==
# docs_token_stats; keeper = MIN(doc_id) per content group ==
# docs_exact_dedup; the 5-gram eval-slice rule == docs_decontaminate; the
# PACK_SEQ_LEN window == docs_pack_sequences), and the oracle is ONE pure
# SQL CTE chain over the raw parquet — a full cross-engine check of the
# composed pipeline, not of any staged fixture. Scale shape: stage totals
# are shuffle-free tree combines; the dedup keep-list is painted back with
# a hash-partitioned join on doc_id (keeper cardinality grows with the
# corpus — never broadcast); each stage recomputes its upstream lazily
# here (bounded corpus), where a production run would write each stage
# through the resumable sink (state/lineage.py) and resume per stage.
# NOTE the 2_exact_dedup stage drops 0 docs on the synthetic sf corpora
# (they contain no exact-duplicate texts) — the stage still executes its
# full distributed path and the oracle asserts the no-op.
# ---------------------------------------------------------------------------

TRAINPREP_MIN_TOKENS = 30


def docs_training_prep(sf_dir: str):
    import pyarrow.compute as pc
    import ray

    from ..hashing import text_hash_u64
    from ..stages import decontam as DC
    from .joins import hash_join
    from .relational import sorted_group_agg, tree_group_sum

    def totals(stage_ds, stage: str) -> tuple[str, int, int]:
        def cnt(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": pa.array([0], type=pa.int64()),
                    "n": pa.array([b.num_rows], type=pa.int64()),
                    "tok": pa.array([int(pc.sum(b["n_tokens"]).as_py() or 0)], type=pa.int64()),
                }
            )

        df = tree_group_sum(stage_ds.map_batches(cnt, batch_format="pyarrow"), ["k"], value_cols=["n", "tok"])
        return (stage, int(df["n"].sum()), int(df["tok"].sum()))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern_regex(b["text"], r"\s+")).cast(pa.int64())
        return b.append_column("n_tokens", n)

    base = ds.map_batches(with_tokens, batch_format="pyarrow")
    f1 = base.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_tokens"], pa.scalar(TRAINPREP_MIN_TOKENS, type=pa.int64()))),
        batch_format="pyarrow",
    )

    # exact dedup: content-hash group-min via sorted_group_agg; the keeper
    # ids ARE the kept docs, painted back with a hash join on doc_id
    def add_hash(b: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(text_hash_u64(b["text"]).view(np.int64)), "doc_id": b["doc_id"]}
        )

    keepers = sorted_group_agg(f1.map_batches(add_hash, batch_format="pyarrow"), "h", {"doc_id": "min"})
    kept_ids = keepers.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    # checkpoint the deduped corpus: four consumers read d2 (stage totals,
    # eval grams, train probe, clean paint) and lazy recompute would re-run
    # the sort+join chain for each — materialize() is the in-sandbox
    # stand-in for writing the stage through the resumable sink
    # (state/lineage.py) as a production run would
    d2 = hash_join(f1, kept_ids, on="doc_id").materialize()

    # decontamination over the deduped survivors: pinned eval slice,
    # eval-gram set broadcast once, train docs with any hit dropped —
    # the surviving training set excludes the eval slice itself
    def is_eval(b: pa.Table) -> np.ndarray:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        return (h % np.uint64(100)) < np.uint64(EVAL_PCT)

    eval_ds = d2.map_batches(lambda b: b.filter(pa.array(is_eval(b))), batch_format="pyarrow")
    train_ds = d2.map_batches(lambda b: b.filter(pa.array(~is_eval(b))), batch_format="pyarrow").materialize()
    grams = DC.gram_set_exact(eval_ds, "text", k=DECONTAM_K)
    counts = DC.contamination_counts(train_ds, ray.put(grams), "text", "doc_id", k=DECONTAM_K)
    clean_ids = counts.filter(expr="n_hits == 0").map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    d3 = hash_join(train_ds, clean_ids, on="doc_id")

    rows = [
        totals(base, "0_input"),
        totals(f1, "1_token_filter"),
        totals(d2, "2_exact_dedup"),
        totals(d3, "3_decontam"),
    ]
    tok3 = rows[-1][2]
    rows.append(("4_sequences", (tok3 + PACK_SEQ_LEN - 1) // PACK_SEQ_LEN, tok3))
    out = pd.DataFrame(rows, columns=["stage", "n_docs", "n_tokens"]).astype(
        {"n_docs": "int64", "n_tokens": "int64"}
    )
    return out.sort_values("stage").reset_index(drop=True)


DOCS_TRAINING_PREP_SQL = f"""
WITH base AS (
  SELECT doc_id, text, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
f1 AS (SELECT * FROM base WHERE n_tokens >= {TRAINPREP_MIN_TOKENS}),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM f1 GROUP BY text),
d2 AS (SELECT f1.* FROM f1 JOIN keepers USING (doc_id)),
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
         ((doc_id * {KNUTH_MULT}) % 4294967296) % 100 < {EVAL_PCT} AS is_eval
  FROM d2
),
g AS (
  SELECT doc_id, is_eval,
         CASE WHEN len(w) >= {DECONTAM_K} THEN array_to_string(w[i:i+{DECONTAM_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {DECONTAM_K} THEN range(1, len(w) - {DECONTAM_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
),
eg AS (SELECT DISTINCT gram FROM g WHERE is_eval),
dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN eg ON g.gram = eg.gram WHERE NOT g.is_eval),
d3 AS (
  SELECT d2.* FROM d2 JOIN toks USING (doc_id)
  WHERE NOT toks.is_eval AND doc_id NOT IN (SELECT doc_id FROM dirty)
),
stages AS (
  SELECT '0_input' AS stage, COUNT(*) AS n_docs, COALESCE(SUM(n_tokens), 0) AS n_tokens FROM base
  UNION ALL SELECT '1_token_filter', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM f1
  UNION ALL SELECT '2_exact_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM d2
  UNION ALL SELECT '3_decontam', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM d3
  UNION ALL SELECT '4_sequences',
            (COALESCE(SUM(n_tokens), 0) + {PACK_SEQ_LEN - 1}) // {PACK_SEQ_LEN},
            COALESCE(SUM(n_tokens), 0) FROM d3
)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens
FROM stages ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Inverted index over word bigrams: the posting-list build every retrieval
# / dedup-audit pipeline needs. Per batch, adjacent-word bigrams explode
# vectorized (each doc lives in one batch, so batch-local distinct
# (gram, doc_id) pairs are globally distinct); the posting lists assemble
# inside bucketed_key_apply — whole grams hash-bucket into a BOUNDED group
# count, and the per-gram ','.join is per OUTPUT row (the stage's own
# cardinality, the chunker convention), never a per-token loop. Posting
# lists ship as comma-joined doc_id strings sorted ascending — exactly
# reproducible by string_agg ORDER BY in the oracle.
# ---------------------------------------------------------------------------


def _bigram_pairs(b: pa.Table) -> pd.DataFrame:
    """Distinct (gram, doc_id) bigram pairs of one batch, vectorized:
    split+explode, then adjacent pairs via a shifted concat within docs."""
    df = b.to_pandas()
    toks = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
    toks = toks[toks != ""]
    if len(toks) == 0:
        return pd.DataFrame({"gram": pd.Series([], dtype=object),
                             "doc_id": pd.Series([], dtype="int64")})
    t = toks.reset_index().rename(columns={"text": "w"})
    nxt_w = t["w"].shift(-1)
    same_doc = t["doc_id"].eq(t["doc_id"].shift(-1))
    pairs = pd.DataFrame({
        "gram": t["w"].str.cat(nxt_w, sep=" ")[same_doc],
        "doc_id": t["doc_id"][same_doc],
    })
    return pairs.drop_duplicates()


def docs_inverted_index(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    pairs = ds.map_batches(
        lambda b: pa.Table.from_pandas(_bigram_pairs(b), preserve_index=False),
        batch_format="pyarrow",
    )

    def postings_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype=object)})
        g = g.sort_values(["gram", "doc_id"])
        ids = g["doc_id"].to_numpy().astype("U")  # one vectorized int->str
        out = (
            pd.DataFrame({"gram": g["gram"].to_numpy(), "_id": ids})
            .groupby("gram", as_index=False)
            .agg(df=("_id", "size"), postings=("_id", ",".join))
        )
        out["df"] = out["df"].astype("int64")
        return out

    idx = bucketed_key_apply(pairs, "gram", postings_kernel, num_buckets=64)
    out = idx.to_pandas()  # vocabulary-bounded (grams), not corpus-bounded
    return out.sort_values("gram").reset_index(drop=True)


DOCS_INVERTED_INDEX_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= 2 THEN range(1, len(w))
                         ELSE CAST([] AS BIGINT[]) END) AS t(i)
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM g GROUP BY gram ORDER BY gram
"""


# ---------------------------------------------------------------------------
# BM25 top-k retrieval for a pinned term query (Robertson-Sparck Jones
# k1/b form): the scoring pass every retrieval-quality pipeline runs over
# a corpus. Two passes, both shuffle-free: (1) corpus stats — N, total
# length, per-query-term document frequencies — as integer tree-combine
# partials; (2) per-doc scores vectorized (tf via split/explode equality,
# never substring matching), batch-local top-k, driver final top-k over
# batches x k rows. The score is ONE pinned IEEE expression (term order
# hash, join, scan; ln via libm on both engines) rounded to 6 dp per the
# module convention; ties at the rounded score break by doc_id in both
# engines.
# ---------------------------------------------------------------------------

BM25_TERMS = ("hash", "join", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def docs_bm25_topk(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_frame(b: pa.Table) -> pd.DataFrame:
        """Per-doc (dl, tf_<term>...) — vectorized split/explode."""
        df = b.to_pandas()
        toks = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        toks = toks[toks != ""]
        base = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()}).set_index("doc_id")
        base["dl"] = toks.groupby(level=0).size().reindex(base.index, fill_value=0)
        for t in BM25_TERMS:
            base[f"tf_{t}"] = (
                (toks == t).groupby(level=0).sum().reindex(base.index, fill_value=0)
            )
        return base.reset_index().astype("int64")

    def stats_partial(b: pa.Table) -> pa.Table:
        f = b.to_pandas()  # already the per-doc tf table
        row = {"k": [0], "n_docs": [len(f)], "sum_len": [int(f["dl"].sum())]}
        for t in BM25_TERMS:
            row[f"df_{t}"] = [int((f[f"tf_{t}"] > 0).sum())]
        return pa.table({c: pa.array(v, type=pa.int64()) for c, v in row.items()})

    # tokenize ONCE: the per-doc integer tf table feeds both the stats
    # pass and the scoring pass (split/explode is the dominant cost)
    tfds = ds.map_batches(
        lambda b: pa.Table.from_pandas(tf_frame(b), preserve_index=False),
        batch_format="pyarrow",
    ).materialize()

    st = tree_group_sum(tfds.map_batches(stats_partial, batch_format="pyarrow"), ["k"],
                        value_cols=["n_docs", "sum_len"] + [f"df_{t}" for t in BM25_TERMS])
    n = float(st["n_docs"].sum())
    if n == 0:  # empty corpus: the oracle returns 0 rows, not a div-by-zero
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    # zero-word corpus (every doc empty/whitespace): avgdl would be 0 and
    # dl/avgdl = 0/0 = NaN, which pandas sorts LAST but DuckDB's DESC
    # sorts FIRST (review finding). tf is necessarily 0 everywhere, so any
    # positive avgdl gives the same 0.0 scores — pin 1.0 on both engines.
    avgdl = (float(st["sum_len"].sum()) / n) or 1.0
    idf = {t: float(np.log((n - float(st[f"df_{t}"].sum()) + 0.5)
                           / (float(st[f"df_{t}"].sum()) + 0.5) + 1.0))
           for t in BM25_TERMS}

    def score_topk(b: pa.Table) -> pa.Table:
        f = b.to_pandas()  # already the per-doc tf table
        dl = f["dl"].to_numpy(dtype=np.float64)
        score = np.zeros(len(f))
        for t in BM25_TERMS:  # pinned term order = pinned FP summation order
            tf = f[f"tf_{t}"].to_numpy(dtype=np.float64)
            score = score + idf[t] * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
            )
        f["score"] = sql_round(score * 1e6) / 1e6
        top = f.sort_values(["score", "doc_id"], ascending=[False, True]).head(BM25_TOPK)
        return pa.Table.from_pandas(top[["doc_id", "score"]], preserve_index=False)

    cand = tfds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["score", "doc_id"], ascending=[False, True]).head(BM25_TOPK)
    return out.reset_index(drop=True)


def _bm25_sql() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}" for t in BM25_TERMS
    )
    score_terms = " + ".join(
        f"ln((CAST(s.n AS DOUBLE) - s.df_{t} + 0.5)/(s.df_{t} + 0.5) + 1.0)"
        f" * (CAST(tf.tf_{t} AS DOUBLE) * ({BM25_K1} + 1.0))"
        f" / (CAST(tf.tf_{t} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * "
        f"(CAST(tf.dl AS DOUBLE) / (CASE WHEN s.sum_len = 0 THEN 1.0 "
        f"ELSE CAST(s.sum_len AS DOUBLE)/CAST(s.n AS DOUBLE) END))))"
        for t in BM25_TERMS
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w
  FROM documents
), tf AS (
  SELECT doc_id, len(w) AS dl,
         {tf_cols}
  FROM toks
), s AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sum_len, {df_cols} FROM tf
)
SELECT doc_id, round({score_terms}, 6) AS score
FROM tf, s
ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
"""


DOCS_BM25_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# Int8 scalar quantization of the embedding table (the compression step
# before shipping vectors to an ANN index): pass 1 computes per-dimension
# min/max over 1e-6-quantized components as two shuffle-free min/max
# combine levels (64 dims — the HLL register pattern with min+max instead
# of max); pass 2 emits the LONG (vec_id, dim, code) table, codes from ONE
# pinned IEEE expression — (q - mn)/(mx - mn)*255, rounded half-away —
# evaluated identically in DuckDB, so the value hash covers every code.
# Degenerate dimensions (mx == mn) pin code = 0 on both engines.
# ---------------------------------------------------------------------------


def embeddings_quantize(sf_dir: str):
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def minmax_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        emb = np.stack(b["embedding"].to_pandas().to_numpy())
        q = sql_round(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        d = q.shape[1]
        return pa.table({"dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                         "mn": pa.array(q.min(axis=0)),
                         "mx": pa.array(q.max(axis=0))})

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("dim", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))

    lvl = ds.map_batches(minmax_partial, batch_format="pyarrow")
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=4096)
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=4096)
    mm = combine(lvl.to_pandas()).sort_values("dim")
    mn = mm["mn"].to_numpy(dtype=np.int64)
    mx = mm["mx"].to_numpy(dtype=np.int64)
    mm_ref = ray.put((mn, mx))

    def codes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "code": pa.array([], type=pa.int64())})
        _mn, _mx = ray.get(mm_ref)
        emb = np.stack(b["embedding"].to_pandas().to_numpy())
        q = sql_round(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        rng = (_mx - _mn).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = sql_round((q - _mn).astype(np.float64) / rng * 255.0)
        c = np.where(_mx > _mn, c, 0.0).astype(np.int64)
        n, d = q.shape
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vec_id": pa.array(np.repeat(vid, d)),
                         "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
                         "code": pa.array(c.reshape(-1))})

    out = ds.map_batches(codes, batch_format="pyarrow").to_pandas()
    return out.sort_values(["vec_id", "dim"]).reset_index(drop=True)


EMBEDDINGS_QUANTIZE_SQL = """
WITH comp AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
), mm AS (
  SELECT dim, MIN(q) AS mn, MAX(q) AS mx FROM comp GROUP BY dim
)
SELECT c.vec_id, c.dim,
       CASE WHEN m.mx > m.mn
            THEN CAST(round(CAST(c.q - m.mn AS DOUBLE) / CAST(m.mx - m.mn AS DOUBLE) * 255.0) AS BIGINT)
            ELSE 0 END AS code
FROM comp c JOIN mm m ON m.dim = c.dim
ORDER BY c.vec_id, c.dim
"""


# ---------------------------------------------------------------------------
# Cohort retention: the signup-week x activity-week matrix every growth
# dashboard runs. Weeks are integer epoch-microsecond divisions (pinned
# 604800000000 us/week — no calendar/timezone semantics to diverge on).
# Per-user first week = sorted_group_agg min at user cardinality; distinct
# (user, week) activity pairs = batch-local unique + composite-key
# sorted_group_agg (pair-cardinality-bounded shuffle, the
# events_daily_distinct_users pattern); the cohort x offset rollup is tiny
# and shuffle-free.
# ---------------------------------------------------------------------------

WEEK_US = 604_800_000_000


def events_cohort_retention(sf_dir: str):
    from .joins import hash_join
    from .relational import sorted_group_agg, tree_group_sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def weeks(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            "week": us // WEEK_US,
        })

    def first_partial(b: pa.Table) -> pa.Table:
        g = weeks(b).groupby("user_id", as_index=False)["week"].min()
        return pa.Table.from_pandas(g.rename(columns={"week": "cohort_week"}), preserve_index=False)

    first = sorted_group_agg(ds.map_batches(first_partial, batch_format="pyarrow"),
                             "user_id", {"cohort_week": "min"})

    def pair_partial(b: pa.Table) -> pa.Table:
        g = weeks(b).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = sorted_group_agg(ds.map_batches(pair_partial, batch_format="pyarrow"),
                             ["user_id", "week"], {"n": "count"})
    joined = hash_join(pairs, first, on="user_id")

    def rollup(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["week_offset"] = (df["week"] - df["cohort_week"]).astype(np.int64)
        g = df.groupby(["cohort_week", "week_offset"], as_index=False).agg(n_users=("user_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = tree_group_sum(joined.map_batches(rollup, batch_format="pyarrow"),
                         ["cohort_week", "week_offset"], value_cols=["n_users"])
    out = out.astype({"cohort_week": "int64", "week_offset": "int64", "n_users": "int64"})
    return out.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)


EVENTS_COHORT_SQL = f"""
WITH wk AS (
  -- FLOOR division pinned for any sign: numpy // floors, DuckDB //
  -- truncates toward zero, so a pre-1970 (negative epoch) timestamp
  -- would land one week apart; subtracting the canonical non-negative
  -- remainder first makes the quotient exact integer floor on both
  SELECT user_id,
         (epoch_us(ts) - ((epoch_us(ts) % {WEEK_US} + {WEEK_US}) % {WEEK_US})) // {WEEK_US} AS week
  FROM events
), fw AS (
  SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
), uw AS (SELECT DISTINCT user_id, week FROM wk)
SELECT CAST(f.cohort_week AS BIGINT) AS cohort_week,
       CAST(u.week - f.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw u JOIN fw f ON f.user_id = u.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-user LAG delta (the window-function family's last missing member
# beside running total / rolling mean / median): value - lag(value) over
# (ts, event_id) order within each user. One shuffle on a hash BUCKET of
# the key (bucketed_key_apply); the kernel sorts the bucket once and
# differences whole user runs vectorized (run-first rows drop — they have
# no predecessor). Values integer-quantized at 1e-3 so deltas are exact.
# ---------------------------------------------------------------------------


def events_user_value_delta(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply, key_run_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "delta": pd.Series([], dtype="float64")})
        g = g.sort_values(["user_id", "ts", "event_id"])
        v = sql_round(g["value"].to_numpy(dtype=np.float64) * 1000.0).astype(np.int64)
        new = key_run_starts(g["user_id"].to_numpy())
        d = np.empty(len(v), dtype=np.int64)
        d[1:] = v[1:] - v[:-1]
        keep = ~new
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[keep],
            "user_id": g["user_id"].to_numpy()[keep],
            "delta": d[keep].astype(np.float64) / 1000.0,
        })

    out = bucketed_key_apply(ds, "user_id", kernel, num_buckets=256).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_USER_DELTA_SQL = """
SELECT event_id, user_id,
       CAST(v - lv AS DOUBLE)/1000.0 AS delta
FROM (
  SELECT event_id, user_id,
         CAST(round(value*1000) AS BIGINT) AS v,
         LAG(CAST(round(value*1000) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lv
  FROM events
)
WHERE lv IS NOT NULL ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Interleaved-span analytics family (BASELINE.json input_hint payload).
# All four oracles below are CROSS-ENGINE: DuckDB recomputes the answer from
# the raw list<struct> spans parquet with UNNEST/generate_subscripts — no
# staged twins. The engine side reads the same file with ray.data and never
# rebuilds the spans column (north-rule sequence invariant untouched).
# ---------------------------------------------------------------------------

def docs_media_dedup(sf_dir: str):
    """Asset-level exact dedup over the interleaved corpus's media spans:
    per distinct media_ref, the number of referencing documents, total span
    occurrences, and the keeper document (MIN doc id) — the keep-list a
    decode stage would use to fetch/decode each asset exactly ONCE and
    paint features back by hash join (the dominant multimodal-corpus
    pattern: asset reuse across pages means naive per-span decode does the
    same work many times over). Uses the dense-blob corpus fixture so reuse
    actually occurs at test scale. Distributed: vectorized span explode ->
    batch-local (ref, doc) pre-combine -> sorted_group_agg at ASSET
    cardinality (grows with data; never a broadcast)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def pairs(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        df = pd.DataFrame({"media_ref": t["media_ref"].to_pandas(), "doc": doc.to_pandas()})
        # batch-local combine: only (ref, doc, occ) triples leave the batch
        g = df.groupby(["media_ref", "doc"], as_index=False).size().rename(columns={"size": "occ"})
        return pa.Table.from_pandas(g.astype({"occ": "int64"}), preserve_index=False)

    # (ref, doc) pairs may straddle batches (a doc lives in one batch, but a
    # ref spans many docs): first collapse to one row per (ref, doc), then
    # roll up per ref. Both levels run at data-growing cardinality, so both
    # use the sorted combine, never a driver groupby.
    per_doc = sorted_group_agg(ds.map_batches(pairs, batch_format="pyarrow"),
                               ["media_ref", "doc"], {"occ": "sum"})
    per_ref = sorted_group_agg(per_doc, "media_ref",
                               {"n_docs": "count", "occ": "sum", "doc": "min"})
    df = per_ref.to_pandas().rename(columns={"occ": "n_occ", "doc": "keeper_doc"})
    df = df.astype({"n_docs": "int64", "n_occ": "int64", "keeper_doc": "int64"})
    return df.sort_values("media_ref").reset_index(drop=True)[
        ["media_ref", "n_docs", "n_occ", "keeper_doc"]
    ]


def _media_dedup_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_dense")}')),
m AS (SELECT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS media_ref
      FROM s WHERE sp.kind = 'media'),
d AS (SELECT media_ref, doc, COUNT(*) AS occ FROM m GROUP BY 1, 2)
SELECT media_ref,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(occ) AS BIGINT) AS n_occ,
       CAST(MIN(doc) AS BIGINT) AS keeper_doc
FROM d GROUP BY media_ref ORDER BY media_ref
"""


def docs_span_kind_stats(sf_dir: str):
    """Per-kind corpus rollup over the interleaved spans: span count, total
    text chars, offset sum, and the number of documents containing the
    kind. Every doc is ONE row, so batch-local distinct (kind, doc) pairs
    are globally distinct and the distinct-doc count is a plain summable
    partial — the whole query is per-batch partials + the shuffle-free
    tree combine (3 groups; no groupby stage at all). Text is ASCII by
    construction; both engines count characters (utf8_length / length)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import tree_group_sum

    raw = OF.stage_docs_spans_raw(sf_dir)
    ds = rd.read_parquet(raw)

    def partial(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("kind", "text", "offset"))
        df = pd.DataFrame(
            {
                "kind": t["kind"].to_pandas(),
                "chars": pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64),
                "off": t["offset"].to_numpy(zero_copy_only=False).astype(np.int64),
                "doc": t["doc_id"].to_pandas(),
            }
        )
        g = df.groupby("kind", as_index=False).agg(
            n_spans=("kind", "size"), text_chars=("chars", "sum"),
            sum_offset=("off", "sum"), n_docs=("doc", "nunique"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["kind"],
        value_cols=["n_spans", "text_chars", "sum_offset", "n_docs"],
    )
    out = out.astype({c: "int64" for c in ["n_spans", "text_chars", "sum_offset", "n_docs"]})
    return out.sort_values("kind").reset_index(drop=True)


def _span_kind_stats_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_raw")}'))
SELECT sp.kind AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(length(sp.text)) AS BIGINT) AS text_chars,
       CAST(SUM(sp."offset") AS BIGINT) AS sum_offset,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM s GROUP BY 1 ORDER BY 1
"""


_KINDS = ("geo", "media", "text")  # alphabetical; codes = index


def docs_kind_transitions(sf_dir: str):
    """Corpus-wide counts of CONSECUTIVE span-kind transitions (from_kind ->
    to_kind over adjacent spans within each doc) — an ORDER-SENSITIVE
    statistic over the interleaved sequence, so any pipeline that perturbs
    span order (the north-rule invariant) changes this answer. Distributed:
    adjacency is computed vectorized inside each batch (a doc is one row,
    so every adjacent pair is batch-local), partials are a <=9-group
    bincount, finish is the shuffle-free tree combine."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from .relational import tree_group_sum

    raw = OF.stage_docs_spans_raw(sf_dir)
    ds = rd.read_parquet(raw)
    kinds = pa.array(list(_KINDS))

    def partial(batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].combine_chunks()
        flat = spans_col.flatten()
        code = pc.index_in(flat.field("kind"), value_set=kinds).to_numpy(zero_copy_only=False)
        offsets = spans_col.offsets.to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        if len(code) < 2:
            return pa.table({"from_kind": pa.array([], type=pa.string()),
                             "to_kind": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        ok = parent[:-1] == parent[1:]
        packed = code[:-1][ok] * 3 + code[1:][ok]
        cnt = np.bincount(packed.astype(np.int64), minlength=9)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "from_kind": pa.array([_KINDS[i // 3] for i in nz], type=pa.string()),
                "to_kind": pa.array([_KINDS[i % 3] for i in nz], type=pa.string()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["from_kind", "to_kind"], value_cols=["n"],
    )
    out = out.astype({"n": "int64"})
    return out.sort_values(["from_kind", "to_kind"]).reset_index(drop=True)


def _kind_transitions_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp, generate_subscripts(spans, 1) AS ord
           FROM read_parquet('{O.fixture_path("docs_spans_raw")}'))
SELECT a.sp.kind AS from_kind, b.sp.kind AS to_kind, CAST(COUNT(*) AS BIGINT) AS n
FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Exact distributed Gram matrix (X^T X) over the embedding column — the
# covariance/PCA building block and the one dense-linear-algebra reduction a
# training-data pipeline needs (whitening, low-rank probes). Components are
# 1e-3-quantized so per-batch int64 BLAS partials sum exactly in any merge
# order; output is the upper triangle in long (i, j, s) form so the value
# hash covers every entry. Scale: one d(d+1)/2-row partial per batch,
# combined shuffle-free (combine_batch raised so each tree level still
# reduces ~60x at d=64; bound documented at tree_group_sum).
# ---------------------------------------------------------------------------

def embeddings_gram_matrix(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        n = batch.num_rows
        if n == 0:  # reshape(0, -1) raises; typed empty keeps the contract
            return pa.table({"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        X = np.asarray(emb.flatten(), dtype=np.float64).reshape(n, -1)
        q = sql_round(X * 1000.0).astype(np.int64)
        G = q.T @ q
        iu, ju = np.triu_indices(G.shape[0])
        # 1-based indices: generate_subscripts is 1-based on the SQL side
        return pa.table(
            {
                "i": pa.array((iu + 1).astype(np.int64)),
                "j": pa.array((ju + 1).astype(np.int64)),
                "s": pa.array(G[iu, ju].astype(np.int64)),
            }
        )

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], combine_batch=131072, value_cols=["s"],
    )
    out = out.astype({"i": "int64", "j": "int64", "s": "int64"})
    return out.sort_values(["i", "j"]).reset_index(drop=True)


EMBEDDINGS_GRAM_SQL = """
WITH e AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
           FROM embeddings),
q AS (SELECT vec_id, i, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qx FROM e)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS s
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_media_decode_dedup(sf_dir: str):
    """The decode-once multimodal composition: explode media spans, reduce
    to DISTINCT assets (sorted combine at asset cardinality), synthesize +
    decode each asset exactly ONCE through the actor-pool ImageDecode
    stage (small batches; payload bytes never ship to the span table), and
    hash-join the per-asset features back to every referencing span. At
    ~4-5x asset reuse this does ~4-5x less decode work than per-span
    decode — the dominant cost lever for a multimodal corpus where decode
    dwarfs the join. Oracle: a single-process naive loop that decodes at
    every OCCURRENCE (stage_docs_media_decode_dedup) — equality proves the
    dedup+join-back is lossless at span granularity."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from ..stages.multimodal import decode_pipeline, synth_media_batch
    from .joins import hash_join
    from .relational import sorted_group_agg

    OF.stage_docs_media_decode_dedup(sf_dir)
    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def media_spans(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        return pa.table({"doc": doc, "span_ord": t["span_ord"], "media_ref": t["media_ref"]})

    # reused twice (distinct-asset reduce + join-back probe): materialize
    # once so the explode doesn't run again per consumer
    span_tbl = ds.map_batches(media_spans, batch_format="pyarrow").materialize()

    distinct = sorted_group_agg(
        span_tbl.select_columns(["media_ref"]), "media_ref", {"n_spans": "count"}
    )

    def to_media(batch: pa.Table) -> pa.Table:
        t = synth_media_batch(batch["media_ref"].to_pylist())
        return t.append_column("n_spans", batch["n_spans"])

    media = distinct.map_batches(to_media, batch_format="pyarrow", batch_size=64)
    decoded = decode_pipeline(media, concurrency=(1, 4), batch_size=64)

    def feat(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            # 0-row blocks reach per-batch UDFs after upstream stages;
            # reshape(0, -1) raises, so emit the typed empty table
            return pa.table(
                {
                    "media_ref": pa.array([], type=pa.string()),
                    "media_kind": pa.array([], type=pa.string()),
                    "n_spans": pa.array([], type=pa.int64()),
                    "feat_sum_um": pa.array([], type=pa.int64()),
                }
            )
        f = np.asarray(
            batch["image_features"].combine_chunks().flatten(), dtype=np.float32
        ).reshape(n, -1).astype(np.float64)
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "media_kind": batch["media_kind"],
                "n_spans": batch["n_spans"],
                "feat_sum_um": pa.array(np.round(f.sum(axis=1) * 1e6).astype(np.int64)),
            }
        )

    feats = decoded.map_batches(feat, batch_format="pyarrow")
    out = hash_join(span_tbl, feats, on="media_ref").to_pandas()
    out = out.astype({"doc": "int64", "span_ord": "int32", "n_spans": "int64", "feat_sum_um": "int64"})
    out["media_kind"] = out["media_kind"].astype(str)
    return out.sort_values(["doc", "span_ord"]).reset_index(drop=True)[
        ["doc", "span_ord", "media_ref", "media_kind", "n_spans", "feat_sum_um"]
    ]


def _media_decode_dedup_sql() -> str:
    from .. import oracles as O

    return O.fixture_sql("docs_media_decode_dedup", "doc, span_ord")


def docs_asset_components(sf_dir: str):
    """Asset-linked document clustering: connected components over the
    doc<->media_ref bipartite graph (docs sharing any media asset join one
    component) — the URL/asset-graph dedup shape for a multimodal corpus.
    Distributed: star-reduced edges (per asset, every referencing doc
    links to the asset's MIN doc — O(fanout) edges per asset instead of
    O(fanout^2), same connectivity) feed the iterative min-label CC; docs
    with no shared asset come back as singletons via a left-outer join.
    The oracle rebuilds doc-doc shared-asset edges in SQL and closes them
    with a RECURSIVE CTE — a full-value cross-engine check of a
    graph-clustering result."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from ..stages.dedup import connected_components_minlabel
    from .joins import hash_join
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_linked(sf_dir)
    ds = rd.read_parquet(raw)

    def media_spans(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        return pa.table({"doc": doc, "media_ref": t["media_ref"]})

    pairs = ds.map_batches(media_spans, batch_format="pyarrow").materialize()
    # star reduction: one row per (asset, doc) would also work, but CC input
    # wants doc-doc edges — anchor every doc of an asset to the asset's min
    anchor = sorted_group_agg(pairs, "media_ref", {"doc": "min"}).map_batches(
        lambda b: b.rename_columns(["media_ref", "anchor"]), batch_format="pyarrow"
    )
    edges = hash_join(pairs, anchor, on="media_ref").map_batches(
        lambda b: pa.table(
            {"id_a": b["anchor"].cast(pa.int64()), "id_b": b["doc"].cast(pa.int64())}
        ).filter(pc.not_equal(b["anchor"], b["doc"])),
        batch_format="pyarrow",
    )
    labels = connected_components_minlabel(edges).materialize()

    all_docs = ds.map_batches(
        lambda b: pa.table(
            {"doc": pc.cast(pc.utf8_slice_codeunits(b["doc_id"], start=4, stop=64), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    if labels.count() == 0:
        # no shared assets anywhere: every doc is its own component (an
        # empty right side would crash the hash-shuffle finalize)
        df = all_docs.to_pandas()
        df["component_id"] = df["doc"]
        return df.sort_values("doc").reset_index(drop=True).astype(
            {"doc": "int64", "component_id": "int64"}
        )
    lab = labels.map_batches(lambda b: b.rename_columns(["doc", "_cid"]), batch_format="pyarrow")
    joined = hash_join(all_docs, lab, on="doc", join_type="left_outer")
    df = joined.map_batches(
        lambda b: pa.table(
            {
                "doc": b["doc"],
                "component_id": pc.coalesce(b["_cid"].cast(pa.int64()), b["doc"].cast(pa.int64())),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return df.sort_values("doc").reset_index(drop=True).astype({"doc": "int64", "component_id": "int64"})


def _asset_components_sql() -> str:
    from .. import oracles as O

    return f"""
WITH RECURSIVE s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_linked")}')),
m AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
      FROM s WHERE sp.kind = 'media'),
e0 AS (SELECT a.doc AS s, b.doc AS d FROM m a JOIN m b ON a.ref = b.ref AND a.doc <> b.doc),
reach(s, d) AS (
  SELECT s, d FROM e0
  UNION
  SELECT r.s, e.d FROM reach r JOIN e0 e ON r.d = e.s
),
comp AS (SELECT s AS doc, LEAST(MIN(d), s) AS component_id FROM reach GROUP BY s),
docs AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc FROM s)
SELECT doc, CAST(COALESCE(c.component_id, doc) AS BIGINT) AS component_id
FROM docs LEFT JOIN comp c USING (doc) ORDER BY doc
"""


# ---------------------------------------------------------------------------
# Deterministic integer PageRank over the doc<->asset bipartite graph — the
# iterative graph-ranking shape (link analysis over a multimodal corpus:
# which docs/assets sit at reuse hubs). All arithmetic is pinned int64
# micro-units (pr//deg truncating contribution, (85*sum)//100 damping), so
# the SQL oracle unrolls the SAME three iterations exactly — no float
# accumulation-order hazard anywhere. Every node with an edge receives at
# least one contribution per round (the graph is symmetric), so no node
# drops out of the unrolled CTEs.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 3
_ASSET_BASE = 1_000_000_000


def docs_asset_pagerank(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        asset = spans.hex8_to_int(t["media_ref"]) + _ASSET_BASE
        # distinct (doc, asset) pairs: a doc is ONE row, so batch-local
        # distinct is globally distinct
        pairs = pd.DataFrame({"doc": doc, "asset": asset}).drop_duplicates()
        s = np.concatenate([pairs["doc"].to_numpy(), pairs["asset"].to_numpy()])
        d = np.concatenate([pairs["asset"].to_numpy(), pairs["doc"].to_numpy()])
        return pa.table({"s": pa.array(s, type=pa.int64()), "d": pa.array(d, type=pa.int64())})

    edges = ds.map_batches(edges_batch, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # no media spans at all: the rank table is empty (the oracle's it3
        # is empty too); an empty join side would crash the shuffle
        return pd.DataFrame({"doc": pd.Series([], dtype="int64"),
                             "pr": pd.Series([], dtype="int64")})
    # small joins must collapse to few partitions (empty hash-join
    # partitions finalize schema-less — same guard as the distributed CC)
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    deg = sorted_group_agg(edges, "s", {"deg": "count"}).materialize()
    e_deg = edges.join(deg, join_type="inner", num_partitions=parts, on=("s",)).materialize()

    pr = deg.map_batches(
        lambda b: pa.table(
            {"node": b["s"], "pr": pa.array(np.full(b.num_rows, 1_000_000, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(PAGERANK_ITERS):
        contrib = e_deg.join(pr, join_type="inner", num_partitions=parts, on=("s",), right_on=("node",))
        per_dst = contrib.map_batches(
            lambda b: pa.table(
                {
                    "d": b["d"],
                    "c": pa.array(
                        b["pr"].to_numpy(zero_copy_only=False) // b["deg"].to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        summed = sorted_group_agg(per_dst, "d", {"c": "sum"})
        nxt = summed.map_batches(
            lambda b: pa.table(
                {
                    "node": b["d"],
                    "pr": pa.array(150_000 + (85 * b["c"].to_numpy(zero_copy_only=False)) // 100),
                }
            ),
            batch_format="pyarrow",
        )
        # plan cut: each round's plan embeds the last through the join —
        # rebuild from materialized block refs (terrain.dist._rebound rule)
        pr = rd.from_arrow_refs(nxt.materialize().to_arrow_refs())

    docs_only = pr.map_batches(
        lambda b: b.filter(pc.less(b["node"], _ASSET_BASE)), batch_format="pyarrow"
    )
    df = docs_only.to_pandas()
    df = df.rename(columns={"node": "doc"}).astype({"doc": "int64", "pr": "int64"})
    return df.sort_values("doc").reset_index(drop=True)


def _asset_pagerank_sql() -> str:
    from .. import oracles as O

    hexval = (
        "SUM((CASE WHEN ascii(substr(ref, 14 + i, 1)) >= 97 "
        "THEN ascii(substr(ref, 14 + i, 1)) - 87 "
        "ELSE ascii(substr(ref, 14 + i, 1)) - 48 END) * (CAST(1 AS BIGINT) << (4 * (7 - i))))"
    )
    it = (
        "SELECT e.d AS node, 150000 + (85 * SUM(p.pr // g.deg)) // 100 AS pr "
        "FROM e JOIN {prev} p ON e.s = p.node JOIN deg g ON e.s = g.s GROUP BY e.d"
    )
    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_dense")}')),
m0 AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
       FROM s WHERE sp.kind = 'media'),
m AS (SELECT doc, 1000000000 + CAST({hexval} AS BIGINT) AS asset
      FROM m0, range(8) t(i) GROUP BY doc, ref),
e AS (SELECT doc AS s, asset AS d FROM m UNION ALL SELECT asset, doc FROM m),
deg AS (SELECT s, COUNT(*) AS deg FROM e GROUP BY s),
pr0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
it1 AS ({it.format(prev="pr0")}),
it2 AS ({it.format(prev="it1")}),
it3 AS ({it.format(prev="it2")})
SELECT CAST(node AS BIGINT) AS doc, CAST(pr AS BIGINT) AS pr FROM it3
WHERE node < 1000000000 ORDER BY doc
"""


# ---------------------------------------------------------------------------
# Per-user event-sequence trigrams — the path/funnel-analysis shape: counts
# of consecutive (type, type, type) transitions within each user's ordered
# stream, corpus-wide. Whole-user locality via bucketed_key_apply (ordering
# is per user; a user never splits across buckets), trigram space is
# |types|^3-bounded so the finish is the shuffle-free tree combine.
# ---------------------------------------------------------------------------

def events_type_trigrams(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply
    from .relational import tree_group_sum

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"t1": pd.Series([], dtype=str), "t2": pd.Series([], dtype=str),
             "t3": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")}
        )
        if len(g) < 3:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        same = u[:-1] == u[1:]
        ok = same[:-1] & same[1:]
        if not ok.any():
            return empty
        i = np.flatnonzero(ok)
        df = pd.DataFrame({"t1": t[i], "t2": t[i + 1], "t3": t[i + 2]})
        out = df.groupby(["t1", "t2", "t3"], as_index=False).size().rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    parts = bucketed_key_apply(ds, "user_id", per_bucket)
    out = tree_group_sum(parts, ["t1", "t2", "t3"], value_cols=["n"]).astype({"n": "int64"})
    return out.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)


EVENTS_TYPE_TRIGRAMS_SQL = """
WITH o AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM o WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Distributed triangle counting over the shared-asset doc graph — the classic
# MPC graph primitive. Edges are doc pairs sharing >= 1 asset (fanout-capped:
# assets referenced by more than TRIANGLE_FANOUT_CAP docs are excluded on
# BOTH engines — the standard heavy-hitter exclusion that bounds per-asset
# pair generation at O(CAP^2)); counting uses the degree-ordered orientation
# (every edge points from lower (deg, id) to higher), so each triangle is the
# unique wedge u->v->w whose closing edge u->w exists — one hash join for
# wedges + one for membership, no per-node adjacency broadcast. Doc ids are
# < 2^31 (documented corpus bound shared with docs_hash_sample), so edge
# membership keys pack into one int64.
# ---------------------------------------------------------------------------

TRIANGLE_FANOUT_CAP = 64


def docs_asset_triangles(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_start_index
    from .joins import hash_join
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_linked(sf_dir)
    ds = rd.read_parquet(raw)

    def media_pairs(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        df = pd.DataFrame({"media_ref": t["media_ref"].to_pandas(), "doc": doc.to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    pairs = ds.map_batches(media_pairs, batch_format="pyarrow")

    def ref_edges(g: pd.DataFrame) -> pd.DataFrame:
        """Whole refs per bucket: emit all a<b doc pairs per ref. Runs are
        grouped BY LENGTH so the all-pairs construction is one vectorized
        triu gather per distinct run length (<= CAP iterations), never a
        per-ref Python loop."""
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
        if len(g) == 0:
            return empty
        g = g.sort_values(["media_ref", "doc"], kind="stable").reset_index(drop=True)
        docs = g["doc"].to_numpy()
        starts = run_start_index(key_run_starts(g["media_ref"].to_numpy()))
        lens = np.diff(np.append(starts, len(g)))
        keep = lens <= TRIANGLE_FANOUT_CAP
        outs = []
        for k in np.unique(lens[keep]):
            if k < 2:
                continue
            st = starts[keep][lens[keep] == k]
            mat = docs[st[:, None] + np.arange(k)[None, :]]
            iu, ju = np.triu_indices(int(k), 1)
            outs.append(pd.DataFrame({"a": mat[:, iu].ravel(), "b": mat[:, ju].ravel()}))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).astype({"a": "int64", "b": "int64"})

    raw_edges = bucketed_key_apply(pairs, "media_ref", ref_edges)

    # distinct edges: pack (a, b) into one int64 (a < b < 2^31) and dedupe
    # at edge cardinality via the sorted combine
    def pack(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": (b["a"].to_numpy() << np.int64(31)) | b["b"].to_numpy()})

    edges_packed = sorted_group_agg(
        raw_edges.map_batches(pack, batch_format="pandas"), "k", {"cnt": "count"}
    ).materialize()

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(k >> np.int64(31)), "b": pa.array(k & np.int64((1 << 31) - 1))})

    edges = edges_packed.map_batches(unpack, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # no doc pair shares an asset: zero triangles for every doc (an
        # empty join side would crash the shuffle)
        all_docs_df = ds.map_batches(
            lambda b: pa.table({"doc": pc.cast(
                pc.utf8_slice_codeunits(b["doc_id"], start=4, stop=64), pa.int64())}),
            batch_format="pyarrow",
        ).to_pandas()
        all_docs_df["n_tri"] = np.int64(0)
        return all_docs_df.sort_values("doc").reset_index(drop=True).astype(
            {"doc": "int64", "n_tri": "int64"}
        )
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    both = edges.map_batches(
        lambda b: pa.table({"doc": pa.concat_arrays(
            [b["a"].combine_chunks(), b["b"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    deg = sorted_group_agg(both, "doc", {"dg": "count"}).materialize()

    # orient: s = endpoint with smaller (deg, id); two deg lookups by join
    # (Ray's join drops the right key column, so e1 = (a, b, dga))
    deg_a = deg.map_batches(lambda b: b.rename_columns(["doc", "dga"]), batch_format="pyarrow")
    e1 = hash_join(edges, deg_a, on="a", right_on="doc", num_partitions=parts)
    e2 = hash_join(e1, deg, on="b", right_on="doc", num_partitions=parts)

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        da = b["dga"].to_numpy(zero_copy_only=False)
        db = b["dg"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < bb))
        s = np.where(a_first, a, bb)
        d = np.where(a_first, bb, a)
        return pa.table({"s": pa.array(s), "d": pa.array(d),
                         "sd": pa.array((s << np.int64(31)) | d)})

    eo = e2.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges u->v->w (join on the middle vertex), then close with the
    # membership join on the packed (u, w) key
    left = eo.map_batches(lambda b: b.select(["s", "d"]).rename_columns(["u", "v"]), batch_format="pyarrow")
    right = eo.map_batches(lambda b: b.select(["s", "d"]).rename_columns(["v", "w"]), batch_format="pyarrow")
    wedges = hash_join(left, right, on="v", num_partitions=parts).map_batches(
        lambda b: pa.table({
            "u": b["u"], "v": b["v"], "w": b["w"],
            "uw": pa.array((b["u"].to_numpy(zero_copy_only=False) << np.int64(31))
                           | b["w"].to_numpy(zero_copy_only=False)),
        }),
        batch_format="pyarrow",
    )
    closing = eo.map_batches(lambda b: b.select(["sd"]).rename_columns(["uw"]), batch_format="pyarrow")
    tris = hash_join(wedges, closing, on="uw", num_partitions=parts)

    corners = tris.map_batches(
        lambda b: pa.table({"doc": pa.concat_arrays(
            [b["u"].combine_chunks(), b["v"].combine_chunks(), b["w"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    per_doc = sorted_group_agg(corners, "doc", {"n_tri": "count"}).materialize()

    all_docs = ds.map_batches(
        lambda b: pa.table({"doc": pc.cast(
            pc.utf8_slice_codeunits(b["doc_id"], start=4, stop=64), pa.int64())}),
        batch_format="pyarrow",
    )
    if per_doc.count() == 0:
        # edges but no triangles (sparse graph) — zero-fill without a join
        df = all_docs.to_pandas()
        df["n_tri"] = np.int64(0)
        return df.sort_values("doc").reset_index(drop=True).astype(
            {"doc": "int64", "n_tri": "int64"}
        )
    joined = hash_join(all_docs, per_doc, on="doc", join_type="left_outer", num_partitions=parts)
    df = joined.map_batches(
        lambda b: pa.table({
            "doc": b["doc"],
            "n_tri": pc.coalesce(b["n_tri"].cast(pa.int64()), pa.scalar(0, pa.int64())),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return df.sort_values("doc").reset_index(drop=True).astype({"doc": "int64", "n_tri": "int64"})


def _asset_triangles_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_linked")}')),
m AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
      FROM s WHERE sp.kind = 'media'),
fan AS (SELECT ref, COUNT(*) AS f FROM m GROUP BY ref),
mok AS (SELECT m.doc, m.ref FROM m JOIN fan USING (ref) WHERE fan.f <= {TRIANGLE_FANOUT_CAP}),
e0 AS (SELECT DISTINCT a.doc AS a, b.doc AS b
       FROM mok a JOIN mok b ON a.ref = b.ref AND a.doc < b.doc),
deg AS (SELECT doc, COUNT(*) AS dg
        FROM (SELECT a AS doc FROM e0 UNION ALL SELECT b FROM e0) GROUP BY doc),
eo AS (SELECT CASE WHEN (da.dg, e0.a) < (db.dg, e0.b) THEN e0.a ELSE e0.b END AS s,
              CASE WHEN (da.dg, e0.a) < (db.dg, e0.b) THEN e0.b ELSE e0.a END AS d
       FROM e0 JOIN deg da ON e0.a = da.doc JOIN deg db ON e0.b = db.doc),
tri AS (SELECT e1.s AS u, e1.d AS v, e2.d AS w
        FROM eo e1 JOIN eo e2 ON e1.d = e2.s
        JOIN eo e3 ON e3.s = e1.s AND e3.d = e2.d),
cnt AS (SELECT doc, COUNT(*) AS n_tri
        FROM (SELECT u AS doc FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
        GROUP BY doc),
docs AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc FROM s)
SELECT doc, CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri
FROM docs LEFT JOIN cnt USING (doc) ORDER BY doc
"""


# ---------------------------------------------------------------------------
# FULL OUTER join shape — the one join type not yet on the gate: per-user
# high-value purchase rollup vs per-user high-value error rollup, where each
# side has users the other lacks (threshold chosen so both unmatched sides
# are non-empty at every sf). Both sides aggregate at USER cardinality via
# the sorted combine; the full-outer hash join coalesces the key across
# sides (Ray emits one key column), and missing-side aggregates pin to 0.
# ---------------------------------------------------------------------------

FULL_OUTER_VALUE_MIN = 100.0


def events_user_full_outer(sf_dir: str):
    import pyarrow.compute as pc

    from .joins import hash_join
    from .relational import sorted_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def side(batch: pa.Table, etype: str, ncol: str, vcol: str | None) -> pa.Table:
        mask = pc.and_(pc.equal(batch["event_type"], etype),
                       pc.greater(batch["value"], FULL_OUTER_VALUE_MIN))
        t = batch.filter(mask)
        cols = {"user_id": t["user_id"]}
        if vcol is not None:
            v = sql_round(t["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64)
            cols[vcol] = pa.array(v)
        return pa.table(cols)

    left = sorted_group_agg(
        ds.map_batches(lambda b: side(b, "purchase", "n_purch", "purch_v"), batch_format="pyarrow"),
        "user_id", {"n_purch": "count", "purch_v": "sum"},
    )
    right = sorted_group_agg(
        ds.map_batches(lambda b: side(b, "error", "n_err", None), batch_format="pyarrow"),
        "user_id", {"n_err": "count"},
    )
    # a provably-empty join side crashes Ray's hash-shuffle finalize (see
    # hash_join); a corpus where one threshold filters everything away must
    # degrade to the other side with zero-pinned missing aggregates
    left = left.materialize()
    right = right.materialize()

    def finish(b: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())

        def col(name):
            if name in b.column_names:
                return pc.coalesce(b[name].cast(pa.int64()), z)
            return pa.array(np.zeros(b.num_rows, dtype=np.int64))

        return pa.table(
            {
                "user_id": b["user_id"],
                "n_purch": col("n_purch"),
                "purch_v": col("purch_v"),
                "n_err": col("n_err"),
            }
        )

    empty_out = pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64"), "n_purch": pd.Series([], dtype="int64"),
         "purch_v": pd.Series([], dtype="int64"), "n_err": pd.Series([], dtype="int64")}
    )
    if left.count() == 0 and right.count() == 0:
        df = empty_out
    else:
        if left.count() == 0:
            joined = right
        elif right.count() == 0:
            joined = left
        else:
            joined = hash_join(left, right, on="user_id", join_type="full_outer", num_partitions=4)
        df = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    df["purch_v"] = df["purch_v"].astype("float64") / 1000.0
    df = df.astype({"user_id": "int64", "n_purch": "int64", "n_err": "int64"})
    return df.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "n_purch", "purch_v", "n_err"]
    ]


EVENTS_USER_FULL_OUTER_SQL = f"""
WITH l AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purch,
         CAST(SUM(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS pv
  FROM events WHERE event_type = 'purchase' AND value > {FULL_OUTER_VALUE_MIN}
  GROUP BY user_id
),
r AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_err
  FROM events WHERE event_type = 'error' AND value > {FULL_OUTER_VALUE_MIN}
  GROUP BY user_id
)
SELECT COALESCE(l.user_id, r.user_id) AS user_id,
       COALESCE(l.n_purch, 0) AS n_purch,
       CAST(COALESCE(l.pv, 0) AS DOUBLE) / 1000.0 AS purch_v,
       COALESCE(r.n_err, 0) AS n_err
FROM l FULL OUTER JOIN r ON l.user_id = r.user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Interval-OVERLAP join (interval x interval — the operator range_join's
# point-in-interval shape cannot express): co-present user sessions. Each
# padded session interval [lo, hi) explodes to the width-W buckets it
# covers; a candidate pair meets wherever both cover a bucket, and the
# ANCHOR-BUCKET rule (count the pair only in the bucket containing
# max(lo_a, lo_b) — covered by both sides of every true overlap) makes each
# pair meet exactly ONCE, no dedup shuffle. Partitioning assumption: W is
# chosen so per-bucket session counts stay bounded (hot buckets would route
# through the salted join). Oracle: window-function sessionize + the plain
# quadratic inequality join — cross-engine.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1_800_000_000          # 30 min, the sessionize convention
SESSION_PAD_US = 1_800_000_000          # ±30 min co-presence padding
OVERLAP_BUCKET_US = 21_600_000_000      # 6 h cover buckets


def events_session_overlap(sf_dir: str):
    import pyarrow.compute as pc

    from ..stages.keyapply import bucketed_key_apply, key_run_starts
    from .joins import hash_join

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in ("user_id", "sid", "lo", "hi")})
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts"], kind="stable").reset_index(drop=True)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        u = g["user_id"].to_numpy()
        new_user = key_run_starts(u)
        brk = new_user.copy()
        brk[1:] |= (us[1:] - us[:-1]) > SESSION_GAP_US
        sid_global = np.cumsum(brk) - 1          # global session ordinal
        # per-user 0-based session id (matches the SQL SUM(brk) window - 1)
        first_sid = np.zeros(len(g), dtype=np.int64)
        starts = np.flatnonzero(new_user)
        first_sid = np.repeat(sid_global[starts], np.diff(np.append(starts, len(g))))
        sid = sid_global - first_sid
        df = pd.DataFrame({"user_id": u, "sid": sid, "us": us})
        out = df.groupby(["user_id", "sid"], as_index=False).agg(lo=("us", "min"), hi=("us", "max"))
        out["lo"] = out["lo"] - SESSION_PAD_US
        out["hi"] = out["hi"] + SESSION_PAD_US
        return out.astype({"user_id": "int64", "sid": "int64", "lo": "int64", "hi": "int64"})

    iv = bucketed_key_apply(ds, "user_id", intervals).materialize()
    if iv.count() == 0:
        # empty events table: no sessions, no pairs (an empty self-join
        # side would crash the hash shuffle)
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("user_a", "sid_a", "user_b", "sid_b", "overlap_us")})

    W = OVERLAP_BUCKET_US

    def explode(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        nb = ((hi - 1) // W - lo // W + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(lo)), nb)
        total = int(nb.sum())
        run0 = np.repeat(np.cumsum(nb) - nb, nb)  # start offset of each row's run
        off = np.arange(total, dtype=np.int64) - run0
        bucket = (lo // W)[idx] + off
        t = b.take(pa.array(idx))
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))

    ex = iv.map_batches(explode, batch_format="pyarrow").materialize()
    exb = ex.map_batches(
        lambda b: b.rename_columns(["user_b", "sid_b", "lo_b", "hi_b", "bucket"]),
        batch_format="pyarrow",
    )
    cand = hash_join(ex, exb, on="bucket", num_partitions=8)

    def filt(b: pa.Table) -> pa.Table:
        lo_a = b["lo"].to_numpy(zero_copy_only=False)
        hi_a = b["hi"].to_numpy(zero_copy_only=False)
        lo_b = b["lo_b"].to_numpy(zero_copy_only=False)
        hi_b = b["hi_b"].to_numpy(zero_copy_only=False)
        bucket = b["bucket"].to_numpy(zero_copy_only=False)
        anchor = np.maximum(lo_a, lo_b) // W
        ok = (
            (b["user_id"].to_numpy(zero_copy_only=False) < b["user_b"].to_numpy(zero_copy_only=False))
            & (lo_a < hi_b) & (lo_b < hi_a) & (anchor == bucket)
        )
        t = b.filter(pa.array(ok))
        ov = (np.minimum(t["hi"].to_numpy(zero_copy_only=False), t["hi_b"].to_numpy(zero_copy_only=False))
              - np.maximum(t["lo"].to_numpy(zero_copy_only=False), t["lo_b"].to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "user_a": t["user_id"].cast(pa.int64()),
                "sid_a": t["sid"].cast(pa.int64()),
                "user_b": t["user_b"].cast(pa.int64()),
                "sid_b": t["sid_b"].cast(pa.int64()),
                "overlap_us": pa.array(ov.astype(np.int64)),
            }
        )

    df = cand.map_batches(filt, batch_format="pyarrow").to_pandas()
    return df.sort_values(["user_a", "sid_a", "user_b", "sid_b"]).reset_index(drop=True).astype(
        {c: "int64" for c in df.columns}
    )


EVENTS_SESSION_OVERLAP_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
o AS (SELECT user_id, us, LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev FROM e),
s AS (SELECT user_id, us,
             CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
      FROM o),
sess AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY us) - 1 AS sid, us FROM s),
iv AS (SELECT user_id, sid, MIN(us) - {SESSION_PAD_US} AS lo, MAX(us) + {SESSION_PAD_US} AS hi
       FROM sess GROUP BY 1, 2)
SELECT a.user_id AS user_a, CAST(a.sid AS BIGINT) AS sid_a,
       b.user_id AS user_b, CAST(b.sid AS BIGINT) AS sid_b,
       CAST(LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) AS BIGINT) AS overlap_us
FROM iv a JOIN iv b ON a.lo < b.hi AND b.lo < a.hi AND a.user_id < b.user_id
ORDER BY user_a, sid_a, user_b, sid_b
"""


# ---------------------------------------------------------------------------
# CDC-style compaction: latest event per (user, type) — the upsert/merge
# shape every 100-TB change-log pipeline needs (keep the newest record per
# key, drop superseded versions). Whole-user locality via bucketed_key_apply
# (the composite key's first component is the bucket key, so every
# (user, type) group is bucket-local); the kernel is one vectorized sort +
# keep-last. Oracle: ROW_NUMBER() OVER (... ORDER BY ts DESC, event_id
# DESC) = 1 — the pinned newest-wins tie rule on both engines.
# ---------------------------------------------------------------------------

def events_latest_per_user_type(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply

    ds = _read(sf_dir, "events", ["user_id", "event_type", "event_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype=str),
                "last_event_id": pd.Series([], dtype="int64"),
                "last_ts_us": pd.Series([], dtype="int64"),
                "last_value": pd.Series([], dtype="float64"),
            }
        )
        if len(g) == 0:
            return empty
        g = g.copy()
        g["ts_us"] = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = g.sort_values(["user_id", "event_type", "ts_us", "event_id"], kind="stable")
        last = g.drop_duplicates(["user_id", "event_type"], keep="last")
        return pd.DataFrame(
            {
                "user_id": last["user_id"].astype("int64"),
                "event_type": last["event_type"],
                "last_event_id": last["event_id"].astype("int64"),
                "last_ts_us": last["ts_us"].astype("int64"),
                "last_value": sql_round(last["value"].to_numpy() * 1000.0) / 1000.0,
            }
        )

    df = bucketed_key_apply(ds, "user_id", per_bucket).to_pandas()
    return df.sort_values(["user_id", "event_type"]).reset_index(drop=True)


EVENTS_LATEST_SQL = """
SELECT user_id, event_type,
       CAST(event_id AS BIGINT) AS last_event_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
       CAST(round(value*1000) AS DOUBLE) / 1000.0 AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Distributed NTILE: every event's decile by (value, event_id) order — the
# global-rank window function at table cardinality. Rank comes from the
# two-phase distributed scan over a packed unique key (quantized value in
# the high bits, event_id tiebreak in the low 40 — documented bound shared
# with the other packed keys); the decile then applies SQL's exact NTILE
# fill rule (first n%k buckets get the extra row), so the oracle is the
# native NTILE(10) window itself — cross-engine on the real SQL semantics.
# ---------------------------------------------------------------------------

NTILE_K = 10


def events_value_ntile(sf_dir: str):
    from ..stages.scan import ordered_prefix_sum

    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = ds.count()  # parquet metadata count

    def key(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (eid >= (1 << 40)).any() or (eid < 0).any():
            raise ValueError("events_value_ntile: event_id exceeds the 40-bit pack bound")
        qv = sql_round(b["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64)
        k = (qv << np.int64(40)) | eid
        return pa.table({"k": pa.array(k), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    bw = max((int(ds.max("value") * 1000.0) + 2 << 40) // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(ds.map_batches(key, batch_format="pyarrow"), "k", "one", bucket_width=bw)

    q, rem = divmod(n, NTILE_K)

    def finish(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        r = b["cum"].to_numpy(zero_copy_only=False)  # 1-based rank
        cut = rem * (q + 1)
        tile = np.where(r <= cut, (r - 1) // (q + 1) + 1, rem + (r - 1 - cut) // max(q, 1) + 1)
        return pa.table(
            {
                "event_id": pa.array(k & np.int64((1 << 40) - 1), type=pa.int64()),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    df = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


EVENTS_VALUE_NTILE_SQL = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(NTILE({NTILE_K}) OVER (ORDER BY CAST(round(value*1000) AS BIGINT), event_id) AS BIGINT) AS tile
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# JSONL ingest/egress round-trip — LLM training corpora ship as
# newline-delimited JSON, so the engine must read/write it losslessly. The
# corpus goes parquet -> distributed JSONL shards -> read_json -> per-lang
# rollup with a doc_id checksum column; the oracle computes the SAME rollup
# from the original parquet, so any row lost, duplicated, or text-mangled
# by the JSON codec breaks the hash. Shard count = input blocks (resumable
# one-file-per-shard layout, same rule as the parquet sink).
# ---------------------------------------------------------------------------

def docs_jsonl_roundtrip(sf_dir: str):
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="graft_jsonl_")
    ds.write_json(out_dir)
    back = rd.read_json(out_dir)

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern_regex(batch["text"], r"\s+")).cast(pa.int64())
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "t": toks.to_pandas(),
                "d": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).agg(
                n_docs=("t", "size"), total_tokens=("t", "sum"), sum_doc_id=("d", "sum")
            ),
            preserve_index=False,
        )

    df = tree_group_sum(
        back.map_batches(partial, batch_format="pyarrow"), ["lang"],
        value_cols=["n_docs", "total_tokens", "sum_doc_id"],
    )
    df = df.astype({c: "int64" for c in ["n_docs", "total_tokens", "sum_doc_id"]})
    return df.sort_values("lang").reset_index(drop=True)


DOCS_JSONL_ROUNDTRIP_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents GROUP BY lang ORDER BY lang
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
# Text normalization — the first stage of every LLM prep pipeline:
# lowercase, strip to [a-z0-9 ], collapse whitespace runs, trim. One
# vectorized Arrow regex chain per batch; the SAME pinned regexes run in
# DuckDB (RE2 semantics both sides), and the normalized TEXT itself is a
# result column — string equality is the check, like span_signature. The
# lowercase step is Unicode-fold-sensitive in general; this corpus is pure
# ASCII (verified), and any non-ASCII survivor of lower() is stripped by
# the [^a-z0-9\s] pass on both engines anyway.
# ---------------------------------------------------------------------------

def docs_text_normalize(sf_dir: str):
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"[^a-z0-9\s]", "")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        toks = pc.if_else(
            pc.equal(t, ""), pa.scalar(0, pa.int64()),
            pc.list_value_length(pc.split_pattern(t, " ")).cast(pa.int64()),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "norm_text": t,
                "n_tokens": toks,
                "n_chars": pc.utf8_length(t).cast(pa.int64()),
            }
        )

    df = ds.map_batches(norm, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOCS_TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                             '\\s+', ' ', 'g')) AS t
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, t AS norm_text,
       CAST(CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_tokens,
       CAST(length(t) AS BIGINT) AS n_chars
FROM n ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Dead-letter-queue (quarantine) routing — production ETL never drops
# malformed rows silently: they route to a quarantine partition with a
# reason, and the valid path proceeds. A deterministic ~5% of props payloads
# is corrupted by the pinned Knuth-hash rule on BOTH engines; validity is
# one compiled full-match regex per batch. Output: per-k_bucket rollup of
# the valid path plus the k_bucket = -1 quarantine row — one table, so the
# hash covers routing AND the downstream aggregate together.
# ---------------------------------------------------------------------------

QUARANTINE_PCT = 5
PROPS_VALID_RE = r'\{"k": -?[0-9]+\}'


def events_quarantine_routing(sf_dir: str):
    import re

    from .relational import tree_group_sum

    ds = _read(sf_dir, "events", ["event_id", "props", "value"])
    rx_valid = re.compile(PROPS_VALID_RE + r"\Z")
    rx_k = re.compile(r'"k": (-?[0-9]+)')

    def partial(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        corrupt = ((eid * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)) % np.uint64(100) < QUARANTINE_PCT
        s = b["props"].to_pandas()
        s = s.where(~corrupt, s + "x")  # the deterministic corruption
        ok = s.str.fullmatch(rx_valid.pattern).to_numpy()
        v = sql_round(b["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64)
        k = np.full(len(s), -1, dtype=np.int64)
        kv = s[ok].str.extract(rx_k, expand=False)
        k[ok] = kv.to_numpy(dtype=np.int64) % 10
        df = pd.DataFrame({"k_bucket": k, "n": 1, "sum_v": v})
        return pa.Table.from_pandas(df.groupby("k_bucket", as_index=False).sum(), preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        ["k_bucket"], value_cols=["n", "sum_v"])
    out = pd.DataFrame({"k_bucket": df["k_bucket"].astype("int64"), "n": df["n"].astype("int64")})
    out["sum_value"] = df["sum_v"].astype("float64") / 1000.0
    return out.sort_values("k_bucket").reset_index(drop=True)


EVENTS_QUARANTINE_SQL = f"""
WITH t AS (
  SELECT CASE WHEN ((event_id * {KNUTH_MULT}) % 4294967296) % 100 < {QUARANTINE_PCT}
              THEN props || 'x' ELSE props END AS p,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
),
r AS (
  SELECT CASE WHEN regexp_full_match(p, '{PROPS_VALID_RE}')
              THEN CAST(regexp_extract(p, '"k": (-?[0-9]+)', 1) AS BIGINT) % 10
              ELSE -1 END AS k_bucket,
         v
  FROM t
)
SELECT CAST(k_bucket AS BIGINT) AS k_bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS DOUBLE) / 1000.0 AS sum_value
FROM r GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Incremental aggregation — the snapshot-delta pattern: yesterday's totals
# (docs with doc_id % 10 != 0, the "previous snapshot") plus a delta pass
# that SCANS ONLY THE NEW DOCS, merged per group — never recomputing the
# base. The oracle computes the full totals directly, so base + delta ==
# full is the checked identity. At 100 TB this is the difference between
# re-reading the corpus daily and reading 1% of it.
# ---------------------------------------------------------------------------

def docs_incremental_lang_totals(sf_dir: str):
    import pyarrow.compute as pc

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(where: str):
        def f(batch: pa.Table) -> pa.Table:
            did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (did % 10 == 0) if where == "new" else (did % 10 != 0)
            t = batch.filter(pa.array(mask))
            toks = pc.list_value_length(pc.split_pattern_regex(t["text"], r"\s+")).cast(pa.int64())
            df = pd.DataFrame({"lang": t["lang"].to_pandas(), "t": toks.to_pandas()})
            return pa.Table.from_pandas(
                df.groupby("lang", as_index=False).agg(n_docs=("t", "size"), total_tokens=("t", "sum")),
                preserve_index=False,
            )
        return f

    base = tree_group_sum(ds.map_batches(partial("old"), batch_format="pyarrow"),
                          ["lang"], value_cols=["n_docs", "total_tokens"])
    delta = tree_group_sum(ds.map_batches(partial("new"), batch_format="pyarrow"),
                           ["lang"], value_cols=["n_docs", "total_tokens"])
    # base + delta merge: group count = languages, a driver-sized frame
    out = (
        pd.concat([base, delta], ignore_index=True)
        .groupby("lang", as_index=False).sum()
        .astype({"n_docs": "int64", "total_tokens": "int64"})
    )
    return out.sort_values("lang").reset_index(drop=True)


DOCS_INCREMENTAL_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang ORDER BY lang
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


# ---------------------------------------------------------------------------
# RANGE-frame window — trailing 1-hour sum per user: the time-based frame
# (RANGE BETWEEN x PRECEDING AND CURRENT ROW) is semantically different
# from the ROWS frame the rolling mean covers — the frame holds every row
# whose timestamp falls in the window INCLUDING later-ordered peers at the
# exact same timestamp (SQL peer-group rule, pinned on both engines via a
# searchsorted right bound). Whole-user locality via bucketed_key_apply;
# the trailing sum is one cumsum + two searchsorted gathers per user run.
# ---------------------------------------------------------------------------

TRAIL_WINDOW_US = 3_600_000_000  # 1 h


def events_user_trailing_1h(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply, key_run_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": pd.Series([], dtype="int64"), "user_id": pd.Series([], dtype="int64"),
             "trail_v": pd.Series([], dtype="float64")}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        u = g["user_id"].to_numpy()
        v = sql_round(g["value"].to_numpy() * 1000.0).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(v)])
        starts = np.flatnonzero(key_run_starts(u))
        ends = np.append(starts[1:], len(g))
        out_v = np.empty(len(g), dtype=np.int64)
        for s, e in zip(starts, ends):  # per USER run — vectorized inside
            ts_run = us[s:e]
            lo = s + np.searchsorted(ts_run, ts_run - TRAIL_WINDOW_US, side="left")
            hi = s + np.searchsorted(ts_run, ts_run, side="right")  # peer-inclusive
            out_v[s:e] = cs[hi] - cs[lo]
        return pd.DataFrame(
            {"event_id": g["event_id"].astype("int64"), "user_id": pd.Series(u, dtype="int64"),
             "trail_v": out_v.astype(np.float64) / 1000.0}
        )

    df = bucketed_key_apply(ds, "user_id", per_bucket).to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


EVENTS_TRAILING_1H_SQL = f"""
SELECT event_id, user_id,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN {TRAIL_WINDOW_US} PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 1000.0 AS trail_v
FROM (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
)
ORDER BY event_id
"""

# ---------------------------------------------------------------------------
# Heavy hitters via mergeable Misra-Gries summaries + exact recount (the
# bounded-state alternative to docs_frequent_ngrams' full-cardinality
# shuffle). Pass 1 builds a <=HH_K-counter MG summary per block (exact
# block counts, then subtract the (k+1)-th largest and keep positive —
# the optimal MG summary of the block, error <= n_b/(k+1)); summaries
# tree-combine with the Agarwal et al. "Mergeable Summaries" rule (sum
# per term, re-truncate), which preserves total error <= N/(k+1) under
# ANY merge tree — multi-way included, since (k+1)*d <= surviving mass.
# Every term with true count >= T = N//(HH_K+1)+1 > N/(k+1) therefore
# survives into the final <=HH_K-term summary; pass 2 recounts exactly
# those candidates (broadcast isin filter, tiny tree_group_sum) and the
# >=T filter removes false positives, so the output EQUALS the plain SQL
# groupby-HAVING oracle while only ever shuffling <=HH_K+1 rows per block.
# At 100 TB this is the shape that matters: no term-cardinality shuffle,
# driver sees O(blocks/combine^2 * HH_K) then <=HH_K rows. The "__N "
# sentinel (contains a space, so unreachable by split(' ') tokens)
# carries the token total through the same summary stream.
# ---------------------------------------------------------------------------

HH_K = 63


def _hh_tokens(texts: pd.Series) -> pd.Series:
    toks = texts.fillna("").str.split(" ").explode()
    return toks[(toks != "") & toks.notna()]


def _mg_truncate(real: pd.DataFrame) -> pd.DataFrame:
    """Keep <=HH_K counters: subtract the (k+1)-th largest, drop <=0."""
    if len(real) <= HH_K:
        return real
    top = np.sort(real["c"].to_numpy(dtype=np.int64))[::-1]
    d = int(top[HH_K])
    real = real.assign(c=real["c"].to_numpy(dtype=np.int64) - d)
    return real[real["c"] > 0]


def _mg_combine(b: pd.DataFrame) -> pd.DataFrame:
    g = b.groupby("term", as_index=False)["c"].sum()
    sent = g["term"] == "__N "
    n = int(g.loc[sent, "c"].sum())
    real = _mg_truncate(g[~sent])
    return pd.concat(
        [pd.DataFrame({"term": ["__N "], "c": np.array([n], dtype=np.int64)}), real]
    ).reset_index(drop=True)


def docs_heavy_hitters(sf_dir: str):
    import ray

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["text"])

    def mg_partial(b: pa.Table) -> pa.Table:
        toks = _hh_tokens(b["text"].to_pandas())
        vc = toks.value_counts()
        real = _mg_truncate(pd.DataFrame({"term": vc.index, "c": vc.to_numpy(dtype=np.int64)}))
        terms = np.concatenate([["__N "], real["term"].to_numpy(dtype=object)])
        cnts = np.concatenate([[np.int64(len(toks))], real["c"].to_numpy(dtype=np.int64)])
        return pa.table({"term": pa.array(terms, pa.string()), "c": pa.array(cnts, pa.int64())})

    lvl = ds.map_batches(mg_partial, batch_format="pyarrow")
    lvl = lvl.map_batches(_mg_combine, batch_format="pandas", batch_size=4096)
    lvl = lvl.map_batches(_mg_combine, batch_format="pandas", batch_size=4096)
    summ = _mg_combine(lvl.to_pandas())

    n_total = int(summ.loc[summ["term"] == "__N ", "c"].iloc[0])
    empty = pd.DataFrame({"term": pd.Series([], dtype="object"), "cnt": pd.Series([], dtype="int64")})
    if n_total == 0:
        return empty
    thresh = n_total // (HH_K + 1) + 1
    cands = np.sort(summ.loc[summ["term"] != "__N ", "term"].to_numpy(dtype=object))
    if len(cands) == 0:
        return empty
    cand_ref = ray.put(pd.Index(cands))

    def recount(b: pa.Table) -> pd.DataFrame:
        toks = _hh_tokens(b["text"].to_pandas())
        vc = toks[toks.isin(ray.get(cand_ref))].value_counts()
        return pd.DataFrame({"term": vc.index.astype(object), "cnt": vc.to_numpy(dtype=np.int64)})

    totals = tree_group_sum(
        ds.map_batches(recount, batch_format="pyarrow"), ["term"], value_cols=["cnt"]
    )
    out = totals[totals["cnt"] >= thresh]
    return out.sort_values("term").reset_index(drop=True).astype({"cnt": "int64"})


DOCS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS term FROM documents),
t AS (SELECT term FROM toks WHERE term <> ''),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t)
SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM t GROUP BY term
HAVING COUNT(*) >= (SELECT n // {HH_K + 1} + 1 FROM n)
ORDER BY term
"""


def ann_pq_topk(sf_dir: str):
    """Product-quantization ANN (Jegou et al. 2011): per-subspace
    deterministic-KMeans codebooks -> uint8 codes + stored norm (32x
    compression at dim=64) -> ADC LUT scan -> exact-cosine re-rank of the
    top-RERANK candidates. Oracle = single-process twin replaying the same
    shared pure kernels whole-array."""
    from ..stages.ann import pq_topk
    from . import oracle_fixtures as OF

    OF.stage_ann_pq_topk(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    Q = np.stack([np.asarray(q_tbl["embedding"][i].as_py()) for i in range(3)]).astype(np.float64)
    out = pq_topk(ds, Q, k=5, m=8, ksub=16, rerank=50)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# k-core decomposition (parallel peel): completes the graph family beside
# connected components, PageRank, and triangle counting. Each round drops
# EVERY node whose current degree is < K at once, so the round count is
# the graph's "peeling complexity" (small on real shared-asset graphs —
# 9 on this corpus; O(V) only on adversarial paths, guarded by a loud
# max_rounds raise). Rounds are two bounded hash joins (edge endpoint
# x surviving-node set) + one degree aggregate, with the CC/PageRank plan
# cut between rounds; nothing node- or edge-cardinality ever reaches the
# driver. Oracle = single-process twin running the same peel whole-array.
# ---------------------------------------------------------------------------

KCORE_K = 2


def docs_asset_kcore(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    OF.stage_docs_asset_kcore(sf_dir)
    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        asset = spans.hex8_to_int(t["media_ref"]) + _ASSET_BASE
        pairs = pd.DataFrame({"doc": doc, "asset": asset}).drop_duplicates()
        s = np.concatenate([pairs["doc"].to_numpy(), pairs["asset"].to_numpy()])
        d = np.concatenate([pairs["asset"].to_numpy(), pairs["doc"].to_numpy()])
        return pa.table({"s": pa.array(s, type=pa.int64()), "d": pa.array(d, type=pa.int64())})

    empty = pd.DataFrame({"node": pd.Series([], dtype="int64"), "core_deg": pd.Series([], dtype="int64")})
    cur = ds.map_batches(edges_batch, batch_format="pyarrow").materialize()
    n_edges = cur.count()
    if n_edges == 0:
        return empty
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    max_rounds = 64
    for rnd in range(max_rounds + 1):
        deg = sorted_group_agg(cur, "s", {"deg": "count"})
        act = deg.map_batches(
            lambda b: pa.table({"node": b.filter(pa.compute.greater_equal(b["deg"], KCORE_K))["s"]}),
            batch_format="pyarrow",
        ).materialize()
        if act.count() == 0:
            return empty
        kept = cur.join(act, join_type="inner", num_partitions=parts, on=("s",), right_on=("node",))
        kept = kept.map_batches(lambda b: b.select(["s", "d"]), batch_format="pyarrow")
        kept = kept.join(act, join_type="inner", num_partitions=parts, on=("d",), right_on=("node",))
        kept = kept.map_batches(lambda b: b.select(["s", "d"]), batch_format="pyarrow")
        # plan cut: the joins embed the previous round's plan
        nxt = rd.from_arrow_refs(kept.materialize().to_arrow_refs())
        n_nxt = nxt.count()
        if n_nxt == cur.count():
            break
        cur = nxt
        if rnd == max_rounds:
            raise RuntimeError(
                f"k-core peel did not converge in {max_rounds} rounds — "
                "adversarial peeling depth; raise max_rounds explicitly"
            )

    core_deg = sorted_group_agg(cur, "s", {"core_deg": "count"}).to_pandas()
    out = core_deg.rename(columns={"s": "node"}).astype({"node": "int64", "core_deg": "int64"})
    return out.sort_values("node").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance over the doc<->asset bipartite graph — the
# neighborhood-expansion shape (link-graph crawl frontier, contamination
# blast radius). Per round: one bounded hash join (edges x frontier) and
# one min-combine at node cardinality; the iteration count is PINNED so
# the DuckDB oracle unrolls the identical min-relaxation — fully
# cross-engine, no staged twin. Hop values over the bipartite graph are
# even for doc nodes (doc -> asset -> doc), so the 4-round cap reaches
# doc-to-doc distance 2.
# ---------------------------------------------------------------------------

BFS_HOPS_MOD = 13
BFS_HOPS_ROUNDS = 4


def docs_asset_hops(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(
            pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()
        ).to_numpy(zero_copy_only=False)
        asset = spans.hex8_to_int(t["media_ref"]) + _ASSET_BASE
        pairs = pd.DataFrame({"doc": doc, "asset": asset}).drop_duplicates()
        s = np.concatenate([pairs["doc"].to_numpy(), pairs["asset"].to_numpy()])
        d = np.concatenate([pairs["asset"].to_numpy(), pairs["doc"].to_numpy()])
        return pa.table({"s": pa.array(s, type=pa.int64()), "d": pa.array(d, type=pa.int64())})

    empty = pd.DataFrame(
        {"doc": pd.Series([], dtype="int64"), "hops": pd.Series([], dtype="int64")}
    )
    edges = ds.map_batches(edges_batch, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return empty
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    def seed_batch(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        m = (s < _ASSET_BASE) & (s % BFS_HOPS_MOD == 0)
        u = np.unique(s[m])
        return pa.table(
            {"node": pa.array(u, type=pa.int64()),
             "h": pa.array(np.zeros(len(u), dtype=np.int64))}
        )

    # seed set from the edge endpoints themselves (duplicates across
    # batches collapse in the min-combine; h is 0 everywhere)
    seeds = edges.map_batches(seed_batch, batch_format="pyarrow")
    dist = sorted_group_agg(seeds, "node", {"h": "min"}).materialize()
    if dist.count() == 0:
        return empty
    for _ in range(BFS_HOPS_ROUNDS):
        relax = edges.join(dist, join_type="inner", num_partitions=parts, on=("s",), right_on=("node",))
        step = relax.map_batches(
            lambda b: pa.table(
                {"node": b["d"],
                 "h": pa.array(b["h"].to_numpy(zero_copy_only=False) + 1)}
            ),
            batch_format="pyarrow",
        )
        nxt = sorted_group_agg(dist.union(step), "node", {"h": "min"})
        # plan cut: the join embeds the previous round's plan (the
        # CC/PageRank rebound rule)
        dist = rd.from_arrow_refs(nxt.materialize().to_arrow_refs())
    out = dist.map_batches(
        lambda b: b.filter(pc.less(b["node"], _ASSET_BASE)), batch_format="pyarrow"
    ).to_pandas()
    out = out.rename(columns={"node": "doc", "h": "hops"}).astype({"doc": "int64", "hops": "int64"})
    return out.sort_values("doc").reset_index(drop=True)


def _asset_hops_sql() -> str:
    from .. import oracles as O

    hexval = (
        "SUM((CASE WHEN ascii(substr(ref, 14 + i, 1)) >= 97 "
        "THEN ascii(substr(ref, 14 + i, 1)) - 87 "
        "ELSE ascii(substr(ref, 14 + i, 1)) - 48 END) * (CAST(1 AS BIGINT) << (4 * (7 - i))))"
    )
    rel = (
        "SELECT node, MIN(h) AS h FROM ("
        "SELECT node, h FROM {prev} "
        "UNION ALL "
        "SELECT e.d AS node, p.h + 1 AS h FROM e JOIN {prev} p ON e.s = p.node"
        ") GROUP BY node"
    )
    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_dense")}')),
m0 AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
       FROM s WHERE sp.kind = 'media'),
m AS (SELECT doc, 1000000000 + CAST({hexval} AS BIGINT) AS asset
      FROM m0, range(8) t(i) GROUP BY doc, ref),
e AS (SELECT doc AS s, asset AS d FROM m UNION ALL SELECT asset, doc FROM m),
d0 AS (SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS h FROM e
       WHERE s < 1000000000 AND s % {BFS_HOPS_MOD} = 0),
d1 AS ({rel.format(prev="d0")}),
d2 AS ({rel.format(prev="d1")}),
d3 AS ({rel.format(prev="d2")}),
d4 AS ({rel.format(prev="d3")})
SELECT CAST(node AS BIGINT) AS doc, CAST(h AS BIGINT) AS hops FROM d4
WHERE node < 1000000000 ORDER BY doc
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the keyword-extraction / relevance shape.
# Pass A: document frequency per term (vocabulary-bounded partials, no
# shuffle); idf table broadcast ONCE via ray.put. Pass B: per-doc tf +
# score + top-3, exact per batch because a document is one row. The score
# is ONE pinned IEEE expression (tf * ln(N/df) * 1e6, rounded half away)
# evaluated identically in DuckDB, ties broken by term — fully
# cross-engine.
# ---------------------------------------------------------------------------

def _doc_terms(b: pa.Table, distinct: bool) -> pd.DataFrame:
    """THE pinned tokenization rule shared by every term-statistics query
    (tfidf / surprisal / pmi — and mirrored by their SQL oracles'
    string_split + WHERE term <> ''): split on single spaces, drop empty
    tokens, optionally distinct per doc. One definition so the convention
    can never desynchronize across queries."""
    toks = b.to_pandas().set_index("doc_id")["text"].str.split(" ").explode()
    toks = toks[(toks != "") & toks.notna()]
    t = toks.reset_index().rename(columns={"text": "term"})
    return t.drop_duplicates() if distinct else t


def _df_partial(b: pa.Table) -> pa.Table:
    """Per-batch document-frequency partial (docs are rows, so batch-local
    distinct (doc, term) pairs are globally distinct)."""
    out = (
        _doc_terms(b, distinct=True)
        .groupby("term", as_index=False).size().rename(columns={"size": "df"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def docs_tfidf_top3(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    dftab = tree_group_sum(
        ds.map_batches(_df_partial, batch_format="pyarrow"), ["term"], value_cols=["df"]
    )
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "rk": pd.Series([], dtype="int64"),
         "term": pd.Series([], dtype=str), "score": pd.Series([], dtype="int64")}
    )
    if dftab.empty:
        return empty
    n_docs = io.table_num_rows(io.table_path(sf_dir, "documents"))
    dftab = dftab.sort_values("term").reset_index(drop=True)
    vocab = dftab["term"].to_numpy()
    idf = np.log(float(n_docs) / dftab["df"].to_numpy(dtype=np.float64))
    idf_ref = ray.put((vocab, idf))

    def score_batch(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, iv = _ray.get(idf_ref)
        t = _doc_terms(b, distinct=False)
        if t.empty:
            return pa.Table.from_pandas(empty, preserve_index=False)
        tf = t.groupby(["doc_id", "term"], as_index=False).size().rename(columns={"size": "tf"})
        pos = np.searchsorted(v, tf["term"].to_numpy())
        tf["score"] = sql_round(
            tf["tf"].to_numpy(dtype=np.float64) * iv[pos] * 1e6
        ).astype(np.int64)
        tf = tf.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="stable"
        ).reset_index(drop=True)
        rk = tf.groupby("doc_id").cumcount().to_numpy() + 1
        keep = rk <= 3
        out = tf.loc[keep, ["doc_id", "term", "score"]].copy()
        out.insert(1, "rk", rk[keep].astype(np.int64))
        return pa.Table.from_pandas(out, preserve_index=False)

    out = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    out = out.astype({"doc_id": "int64", "rk": "int64", "score": "int64"})
    return out.sort_values(["doc_id", "rk"]).reset_index(drop=True)


DOCS_TFIDF_TOP3_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.term,
         CAST(round(CAST(tf.tf AS DOUBLE)
                    * LN(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS score
       FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM sc)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, score FROM r
WHERE rk <= 3 ORDER BY doc_id, rk
"""


# ---------------------------------------------------------------------------
# Corpus-LM mean token surprisal per document — the CCNet-style quality
# filter shape (score each doc against a language model fit on the corpus
# itself). Pass A: global unigram counts (vocabulary-bounded, shuffle-free
# tree combine); per-term surprisal quantized ONCE to int64 micro-nats in
# the broadcast table, so the per-doc sum is an ORDER-FREE integer sum —
# no float-accumulation hazard at any parallelism. One float division +
# pinned rounding at the end. Fully cross-engine (DuckDB recomputes the
# LM from raw text).
# ---------------------------------------------------------------------------

def docs_unigram_surprisal(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    def tf_partial(b: pa.Table) -> pa.Table:
        out = (
            _doc_terms(b, distinct=False)
            .groupby("term", as_index=False).size().rename(columns={"size": "tf"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    tftab = tree_group_sum(
        ds.map_batches(tf_partial, batch_format="pyarrow"), ["term"], value_cols=["tf"]
    )
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "n_tokens": pd.Series([], dtype="int64"),
         "surprisal": pd.Series([], dtype="float64")}
    )
    if tftab.empty:
        return empty
    tftab = tftab.sort_values("term").reset_index(drop=True)
    total = float(tftab["tf"].sum())
    vocab = tftab["term"].to_numpy()
    smic = sql_round(
        -np.log(tftab["tf"].to_numpy(dtype=np.float64) / total) * 1e6
    ).astype(np.int64)
    lm_ref = ray.put((vocab, smic))

    def score_batch(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, sm = _ray.get(lm_ref)
        t = _doc_terms(b, distinct=False)
        if t.empty:
            return pa.Table.from_pandas(
                pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "n_tokens": pd.Series([], dtype="int64"),
                     "ssum": pd.Series([], dtype="int64")}
                ),
                preserve_index=False,
            )
        t["s"] = sm[np.searchsorted(v, t["term"].to_numpy())]
        g = t.groupby("doc_id").agg(n_tokens=("s", "size"), ssum=("s", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if g.empty:
        return empty
    surpr = (
        sql_round(g["ssum"].to_numpy(dtype=np.float64) / g["n_tokens"].to_numpy(dtype=np.float64))
        / 1e6
    )
    out = pd.DataFrame(
        {"doc_id": g["doc_id"].astype("int64"), "n_tokens": g["n_tokens"].astype("int64"),
         "surprisal": surpr}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_UNIGRAM_SURPRISAL_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY term),
tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total FROM tf),
lm AS (SELECT term,
         CAST(round(-LN(CAST(tf AS DOUBLE) / tot.total) * 1000000, 0) AS BIGINT) AS s
       FROM tf CROSS JOIN tot)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(lm.s) AS DOUBLE) / COUNT(*), 0) / 1000000.0 AS surprisal
FROM t JOIN lm USING (term)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Exact SimHash Hamming-pair join (pigeonhole band candidates + XOR
# popcount verify, stages/dedup.py::simhash_hamming_pairs). The oracle is
# a fully-SQL quadratic self-join with bit_count(xor(...)) over a staged
# per-doc simhash table (twin kernel) — the pair DEFINITION is engine-
# independent, so the band-bucketing + all-pairs-within-bucket + verify
# path is checked end to end.
# ---------------------------------------------------------------------------

def docs_simhash_hamming_pairs(sf_dir: str):
    from . import oracle_fixtures as OF
    from ..stages.dedup import simhash_hamming_pairs

    OF.stage_docs_simhash_hamming(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = simhash_hamming_pairs(ds, max_hamming=3).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
    pk = pairs["pk"].to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {"doc_a": pk >> np.int64(31), "doc_b": pk & np.int64((1 << 31) - 1),
         "hamming": pairs["hamming"].astype("int64")}
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Data-mix quota sampling — curate a training mix by taking a FIXED
# fraction of each language deterministically (the mixture-reweighting
# shape). Per-lang quota = n_lang // 5; membership = the quota smallest
# (hash, doc_id) per lang, i.e. an exact per-group rank. Rank is the
# two-phase distributed scan (stages/scan.py::ordered_prefix_sum) over a
# packed (lang_idx | hash | doc_id) key — rank-within-lang falls out as
# global_rank - per-lang base offset (tiny lang table, broadcast once).
# No per-group sort, no whole-lang bucket. Fully cross-engine: the oracle
# is ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hash, doc_id).
# ---------------------------------------------------------------------------

QUOTA_MIX_DENOM = 5  # keep 1/5 of each language


def docs_lang_quota_mix(sf_dir: str):
    import ray

    from ..stages.scan import ordered_prefix_sum
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def lang_partial(b: pa.Table) -> pa.Table:
        out = (
            b.to_pandas().groupby("lang", as_index=False).size().rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    lt = tree_group_sum(ds.map_batches(lang_partial, batch_format="pyarrow"), ["lang"], value_cols=["n"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "lang": pd.Series([], dtype=str)})
    if lt.empty:
        return empty
    lt = lt.sort_values("lang").reset_index(drop=True)
    if len(lt) >= 256:
        raise ValueError("docs_lang_quota_mix packs lang_idx into 8 bits — >=256 languages needs a wider key")
    langs = lt["lang"].to_numpy()
    n_l = lt["n"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_l)[:-1]])  # rows in all smaller lang_idx
    quotas = n_l // QUOTA_MIX_DENOM
    mix_ref = ray.put((langs, offsets, quotas))

    def key(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (did >= (1 << 23)).any() or (did < 0).any():
            raise ValueError(
                "docs_lang_quota_mix packs doc_id into 23 bits — widen to a "
                "2-column rank key past 8.4M ids"
            )
        import ray as _ray

        v, _, _ = _ray.get(mix_ref)
        li = np.searchsorted(v, b["lang"].to_numpy(zero_copy_only=False)).astype(np.int64)
        hv = ((did.astype(np.uint64) * np.uint64(KNUTH_MULT)) % np.uint64(1 << 32)).astype(np.int64)
        k = (li << np.int64(55)) | (hv << np.int64(23)) | did
        return pa.table({"k": pa.array(k), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    n = ds.count()
    max_k = ((len(lt) - 1) << 55) | (((1 << 32) - 1) << 23) | ((1 << 23) - 1)
    bw = max(max_k // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(keyed, "k", "one", bucket_width=bw)

    def finish(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, off, q = _ray.get(mix_ref)
        k = b["k"].to_numpy(zero_copy_only=False)
        li = (k >> np.int64(55)).astype(np.int64)
        rank = b["cum"].to_numpy(zero_copy_only=False) - off[li]  # 1-based within lang
        keep = rank <= q[li]
        did = (k & np.int64((1 << 23) - 1))[keep]
        return pa.table(
            {"doc_id": pa.array(did, type=pa.int64()),
             "lang": pa.array(v[li[keep]], type=pa.string())}
        )

    out = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


DOCS_LANG_QUOTA_MIX_SQL = f"""
WITH q AS (SELECT lang, COUNT(*) // {QUOTA_MIX_DENOM} AS quota FROM documents GROUP BY lang),
r AS (SELECT doc_id, lang,
        ROW_NUMBER() OVER (
          PARTITION BY lang
          ORDER BY (doc_id * {KNUTH_MULT}) % 4294967296, doc_id) AS rk
      FROM documents)
SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
WHERE rk <= quota ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations — pointwise mutual information over within-document
# term co-occurrence (the classic phrase/collocation detector). Per-doc
# DISTINCT term pairs generate vectorized (triu gather per distinct
# per-doc term count — a doc is one row, so batch partials are exact);
# the (term_a, term_b) space is vocabulary^2-bounded, finished by the
# shuffle-free tree combine; doc frequencies read the SAME materialized
# tokenize (the corpus is split exactly once). PMI =
# ln(c_ab * N / (df_a * df_b)) as ONE pinned IEEE expression in int64
# micro-nats; support floor keeps the result stable. Fully cross-engine.
# ---------------------------------------------------------------------------

PMI_MIN_SUPPORT = 5


def docs_term_pmi(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from ..stages.keyapply import bucketed_key_apply, run_all_pairs
    from .relational import tree_group_sum

    # tokenize ONCE: the distinct (doc_id, term) explode is materialized and
    # feeds BOTH the pair partials and the doc-frequency partials. Pair
    # generation needs WHOLE docs, and Ray's output buffer may slice a large
    # tokenize output across blocks at target_max_block_size (arbitrary row
    # boundaries), so the pair pass routes through hash-buckets of doc_id —
    # the shuffle guarantees doc-wholeness (same shape as
    # docs_source_overlap's per-gram buckets). The df pass needs no
    # wholeness: dt is already DISTINCT (doc_id, term), so per-term row
    # counts are exact under any block split.
    dt = ds.map_batches(
        lambda b: pa.Table.from_pandas(_doc_terms(b, distinct=True), preserve_index=False),
        batch_format="pyarrow",
    ).materialize()

    def pair_fn(t: pd.DataFrame) -> pd.DataFrame:
        t = t.sort_values(["doc_id", "term"], kind="stable").reset_index(drop=True)
        terms = t["term"].to_numpy()
        doc = t["doc_id"].to_numpy()
        new = np.ones(len(t), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(t)))
        ai, bi = run_all_pairs(starts, lens)
        if len(ai):
            pairs = pd.DataFrame({"term_a": terms[ai], "term_b": terms[bi]})
            return pairs.groupby(["term_a", "term_b"], as_index=False).size().rename(columns={"size": "c_ab"})
        return pd.DataFrame({"term_a": pd.Series([], dtype=str), "term_b": pd.Series([], dtype=str),
                             "c_ab": pd.Series([], dtype="int64")})

    def df_partial(b: pa.Table) -> pa.Table:
        out = (
            b.to_pandas().groupby("term", as_index=False).size().rename(columns={"size": "df"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = tree_group_sum(
        bucketed_key_apply(dt, "doc_id", pair_fn, num_buckets=64),
        ["term_a", "term_b"], value_cols=["c_ab"],
    )
    dftab = tree_group_sum(
        dt.map_batches(df_partial, batch_size=None, batch_format="pyarrow"),
        ["term"], value_cols=["df"],
    )
    empty = pd.DataFrame(
        {"term_a": pd.Series([], dtype=str), "term_b": pd.Series([], dtype=str),
         "c_ab": pd.Series([], dtype="int64"), "pmi_micro": pd.Series([], dtype="int64")}
    )
    if pairs.empty or dftab.empty:
        return empty
    pairs = pairs[pairs["c_ab"] >= PMI_MIN_SUPPORT].reset_index(drop=True)
    if pairs.empty:
        return empty
    n = io.table_num_rows(io.table_path(sf_dir, "documents"))
    dfmap = dftab.set_index("term")["df"]
    dfa = dfmap.loc[pairs["term_a"]].to_numpy(dtype=np.int64)
    dfb = dfmap.loc[pairs["term_b"]].to_numpy(dtype=np.int64)
    c = pairs["c_ab"].to_numpy(dtype=np.float64)
    x = (c * float(n)) / (dfa * dfb).astype(np.float64)
    pairs["pmi_micro"] = sql_round(np.log(x) * 1e6).astype(np.int64)
    pairs["c_ab"] = pairs["c_ab"].astype("int64")
    return pairs.sort_values(["term_a", "term_b"]).reset_index(drop=True)


DOCS_TERM_PMI_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
p AS (SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS c_ab
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term HAVING COUNT(*) >= {PMI_MIN_SUPPORT}),
df AS (SELECT term, COUNT(*) AS df FROM t GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT p.term_a, p.term_b, CAST(p.c_ab AS BIGINT) AS c_ab,
       CAST(round(LN(CAST(p.c_ab AS DOUBLE) * n.n / (da.df * db.df)) * 1000000, 0) AS BIGINT) AS pmi_micro
FROM p
JOIN df da ON da.term = p.term_a
JOIN df db ON db.term = p.term_b
CROSS JOIN n
ORDER BY p.term_a, p.term_b
"""


# ---------------------------------------------------------------------------
# Top-eigenvector power iteration — the PCA/spectral direction of the
# embedding covariance, computed at scale: the ONLY data-cardinality work
# is the exact distributed Gram reduction (int64-quantized per-batch
# X^T X partials + shuffle-free tree combine, the embeddings_gram_matrix
# machinery with BOTH triangles); the pinned-count power iterations then
# run on the d x d integer matrix (d = 64 — driver-sized by definition).
# Every iteration is exact integer matvec + ONE pinned float renormalize
# (divide by max|w|, round to int64 micro-units), so the DuckDB oracle
# unrolls bit-identical iterations. Loud overflow guard with the rescale
# path named.
# ---------------------------------------------------------------------------

POWER_ITERS = 3


def embeddings_top_eigvec(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "embeddings", ["embedding"])
    n_total = io.table_num_rows(io.table_path(sf_dir, "embeddings"))

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        X = np.asarray(emb.flatten(), dtype=np.float64).reshape(n, -1)
        q = sql_round(X * 1000.0).astype(np.int64)
        # PRE-accumulation bound: every |G[i,j]| over the WHOLE corpus is
        # <= n_total * gmax^2 where gmax is the global max |qx|; the batch
        # holding gmax trips this check, so a wrap can never happen inside
        # q.T @ q or the tree combine (the later matvec guard reads the
        # accumulated G and could not catch a wrap that already occurred)
        maxq = int(np.abs(q).max()) if q.size else 0
        if maxq and n_total * maxq * maxq >= (1 << 63):
            raise ValueError(
                "embeddings_top_eigvec Gram accumulation would overflow int64 "
                f"at {n_total} rows with max|qx|={maxq} — rescale the "
                "quantization (divide s by a pinned power of 10 on BOTH "
                "engines) before accumulating"
            )
        G = q.T @ q
        iu, ju = np.indices(G.shape)
        return pa.table(
            {
                "i": pa.array((iu.ravel() + 1).astype(np.int64)),
                "j": pa.array((ju.ravel() + 1).astype(np.int64)),
                "s": pa.array(G.ravel().astype(np.int64)),
            }
        )

    gt = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], combine_batch=131072, value_cols=["s"],
    )
    empty = pd.DataFrame({"i": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")})
    if gt.empty:
        return empty
    d = int(gt["i"].max())
    G = np.zeros((d, d), dtype=np.int64)
    G[gt["i"].to_numpy(dtype=np.int64) - 1, gt["j"].to_numpy(dtype=np.int64) - 1] = gt["s"].to_numpy(dtype=np.int64)
    # matvec bound: |w| <= d * max|G| * max|v| with max|v| = 1e6
    if int(np.abs(G).max()) * d * 1_000_000 >= (1 << 62):
        raise ValueError(
            "embeddings_top_eigvec integer matvec would overflow int64 at this "
            "row count — rescale the Gram quantization (divide s by a pinned "
            "power of 10 on BOTH engines) before iterating"
        )
    v = np.full(d, 1_000_000, dtype=np.int64)
    for _ in range(POWER_ITERS):
        w = G @ v  # exact int64 (guarded above)
        m = float(np.abs(w).max())
        if m == 0.0:
            break
        v = sql_round(w.astype(np.float64) / m * 1e6).astype(np.int64)
    return pd.DataFrame({"i": np.arange(1, d + 1, dtype=np.int64), "v": v})


EMBEDDINGS_TOP_EIGVEC_SQL = """
WITH e AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
           FROM embeddings),
q AS (SELECT vec_id, i, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qx FROM e),
g AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS s
      FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM g),
w1 AS (SELECT g.i, CAST(SUM(g.s * p.v) AS BIGINT) AS w FROM g JOIN v0 p ON g.j = p.i GROUP BY g.i),
v1 AS (SELECT i, CAST(round(CAST(w AS DOUBLE) / (SELECT MAX(ABS(w)) FROM w1) * 1000000, 0) AS BIGINT) AS v FROM w1),
w2 AS (SELECT g.i, CAST(SUM(g.s * p.v) AS BIGINT) AS w FROM g JOIN v1 p ON g.j = p.i GROUP BY g.i),
v2 AS (SELECT i, CAST(round(CAST(w AS DOUBLE) / (SELECT MAX(ABS(w)) FROM w2) * 1000000, 0) AS BIGINT) AS v FROM w2),
w3 AS (SELECT g.i, CAST(SUM(g.s * p.v) AS BIGINT) AS w FROM g JOIN v2 p ON g.j = p.i GROUP BY g.i),
v3 AS (SELECT i, CAST(round(CAST(w AS DOUBLE) / (SELECT MAX(ABS(w)) FROM w3) * 1000000, 0) AS BIGINT) AS v FROM w3)
SELECT CAST(i AS BIGINT) AS i, v FROM v3 ORDER BY i
"""


# ---------------------------------------------------------------------------
# Changelog apply with tombstones — the upsert/delete MERGE shape (Iceberg/
# Delta-style CDC): the event stream is a change log over user keys where a
# pinned ~10% of operations are DELETE tombstones; the final state is each
# user's LAST operation's value, and a user whose last operation is a
# delete is ABSENT from the result. Whole-user buckets (the CDC-compaction
# machinery) + one vectorized keep-last + tombstone filter; op assignment
# is a pinned hash evaluated identically in SQL.
# ---------------------------------------------------------------------------

def events_apply_changelog(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "last_event_id": pd.Series([], dtype="int64"),
             "last_value": pd.Series([], dtype="float64")}
        )
        if len(g) == 0:
            return empty
        g = g.copy()
        g["ts_us"] = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        last = g.drop_duplicates(["user_id"], keep="last")
        eid = last["event_id"].to_numpy(dtype=np.int64)
        if (eid >= (1 << 32)).any() or (eid < 0).any():
            # the uint64 wrap here silently diverges from the oracle's
            # BIGINT event_id * KNUTH_MULT (which overflows loudly in
            # DuckDB past ~2^31.7) — same id-bound rule as the quota-mix/
            # median pack guards; widen to a 128-bit (hi,lo) split hash
            # if ids ever exceed 32 bits
            raise ValueError(
                "events_apply_changelog tombstone hash requires 0 <= event_id < 2^32"
            )
        is_del = ((eid.astype(np.uint64) * np.uint64(KNUTH_MULT)) % np.uint64(4294967296)) % np.uint64(10) == 0
        last = last[~is_del]
        return pd.DataFrame(
            {"user_id": last["user_id"].astype("int64"),
             "last_event_id": last["event_id"].astype("int64"),
             "last_value": sql_round(last["value"].to_numpy() * 1000.0) / 1000.0}
        )

    df = bucketed_key_apply(ds, "user_id", per_bucket).to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


EVENTS_APPLY_CHANGELOG_SQL = f"""
SELECT user_id,
       CAST(event_id AS BIGINT) AS last_event_id,
       CAST(round(value*1000) AS DOUBLE) / 1000.0 AS last_value
FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
  AND ((event_id * {KNUTH_MULT}) % 4294967296) % 10 <> 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Grouped exact median — per-language median document length, the grouped
# order-statistic the global-quantile and per-user-median queries don't
# cover: the exact k-th element PER GROUP without a per-group sort or a
# whole-group bucket. Same machinery as the quota mix: pack
# (lang_idx | value | doc_id) -> ONE two-phase distributed rank scan ->
# keep the row whose within-group rank equals (n_lang + 1) // 2 (lower
# median, pinned). The oracle is the native ROW_NUMBER counterpart.
# ---------------------------------------------------------------------------

def docs_lang_median_chars(sf_dir: str):
    import ray

    from ..stages.scan import ordered_prefix_sum
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def lang_partial(b: pa.Table) -> pa.Table:
        out = b.to_pandas().groupby("lang", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(out, preserve_index=False)

    lt = tree_group_sum(ds.map_batches(lang_partial, batch_format="pyarrow"), ["lang"], value_cols=["n"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype=str), "median_chars": pd.Series([], dtype="int64")})
    if lt.empty:
        return empty
    lt = lt.sort_values("lang").reset_index(drop=True)
    if len(lt) >= 256:
        raise ValueError("docs_lang_median_chars packs lang_idx into 8 bits — widen the key past 255 langs")
    langs = lt["lang"].to_numpy()
    n_l = lt["n"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_l)[:-1]])
    target = (n_l + 1) // 2  # lower median rank, 1-based
    mref = ray.put((langs, offsets, target))

    def key(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (did >= (1 << 23)).any() or (did < 0).any() or (nc >= (1 << 24)).any() or (nc < 0).any():
            raise ValueError(
                "docs_lang_median_chars pack bounds: doc_id < 2^23 and n_chars < 2^24 "
                "— widen to a 2-column rank key past those"
            )
        import ray as _ray

        v, _, _ = _ray.get(mref)
        li = np.searchsorted(v, b["lang"].to_numpy(zero_copy_only=False)).astype(np.int64)
        k = (li << np.int64(47)) | (nc << np.int64(23)) | did
        return pa.table({"k": pa.array(k), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    n = ds.count()
    max_k = ((len(lt) - 1) << 47) | (((1 << 24) - 1) << 23) | ((1 << 23) - 1)
    bw = max(max_k // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(keyed, "k", "one", bucket_width=bw)

    def finish(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, off, tgt = _ray.get(mref)
        k = b["k"].to_numpy(zero_copy_only=False)
        li = (k >> np.int64(47)).astype(np.int64)
        rank = b["cum"].to_numpy(zero_copy_only=False) - off[li]
        keep = rank == tgt[li]
        nc = ((k >> np.int64(23)) & np.int64((1 << 24) - 1))[keep]
        return pa.table(
            {"lang": pa.array(v[li[keep]], type=pa.string()),
             "median_chars": pa.array(nc, type=pa.int64())}
        )

    out = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


DOCS_LANG_MEDIAN_CHARS_SQL = """
WITH q AS (SELECT lang, (COUNT(*) + 1) // 2 AS tgt FROM documents GROUP BY lang),
r AS (SELECT lang, n_chars, doc_id,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk
      FROM documents)
SELECT r.lang, CAST(r.n_chars AS BIGINT) AS median_chars
FROM r JOIN q USING (lang) WHERE rk = tgt ORDER BY r.lang
"""


# ---------------------------------------------------------------------------
# BPE-style adjacent character-pair counts — the first step of byte-pair-
# encoding tokenizer training: corpus-wide counts of every within-word
# adjacent character pair. Per batch the word stream flattens to ONE ascii
# byte buffer with NUL fences (no per-word Python), pair codes are
# first*256+second filtered on the fences, and np.bincount collapses the
# batch to <= 256^2 partial rows — finished by the shuffle-free tree
# combine. ASCII-corpus assumption verified loudly (same contract as
# docs_text_normalize). Oracle rebuilds pairs with substr over a numbers
# table — fully cross-engine.
# ---------------------------------------------------------------------------

def docs_bpe_pair_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    def pair_partial(b: pa.Table) -> pa.Table:
        t = _doc_terms(b, distinct=False)
        empty = pd.DataFrame({"code": pd.Series([], dtype="int64"), "c": pd.Series([], dtype="int64")})
        if t.empty:
            return pa.Table.from_pandas(empty, preserve_index=False)
        joined = "\x00".join(t["term"].tolist())
        try:
            buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        except UnicodeEncodeError as e:
            raise ValueError(
                "docs_bpe_pair_counts assumes an ascii corpus (the documents "
                "table's contract); non-ascii input needs a byte-level variant"
            ) from e
        if len(buf) < 2:
            return pa.Table.from_pandas(empty, preserve_index=False)
        # \x00 is the word fence: a term CONTAINING an embedded NUL (valid
        # ascii, so it survives the encode guard) would silently split into
        # two fenced words here while the SQL oracle's substr counts the
        # pair across it — reject loudly instead of diverging
        if int((buf == 0).sum()) != len(t) - 1:
            raise ValueError(
                "docs_bpe_pair_counts: a term contains an embedded NUL byte — "
                "the \\x00 word fence would miscount; strip NULs upstream or "
                "switch the fence to an out-of-band sentinel"
            )
        first, second = buf[:-1].astype(np.int64), buf[1:].astype(np.int64)
        valid = (first != 0) & (second != 0)
        codes = first[valid] * 256 + second[valid]
        cnt = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_pandas(
            pd.DataFrame({"code": nz.astype(np.int64), "c": cnt[nz].astype(np.int64)}),
            preserve_index=False,
        )

    out = tree_group_sum(
        ds.map_batches(pair_partial, batch_format="pyarrow"), ["code"], value_cols=["c"]
    )
    if out.empty:
        return pd.DataFrame({"pair": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")})
    code = out["code"].to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {"pair": [chr(x >> 8) + chr(x & 255) for x in code], "c": out["c"].astype("int64")}
    )
    return out.sort_values("pair").reset_index(drop=True)


DOCS_BPE_PAIR_COUNTS_SQL = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
w2 AS (SELECT word FROM w WHERE length(word) >= 2),
mx AS (SELECT MAX(length(word)) AS m FROM w2),
nums AS (SELECT unnest(range(1, (SELECT m FROM mx))) AS i),
b AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair
      FROM w2 JOIN nums ON i <= length(word) - 1)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY pair ORDER BY pair
"""


# ---------------------------------------------------------------------------
# Cross-source n-gram overlap matrix — the train/test LEAKAGE AUDIT: for
# every pair of corpus sources, how many distinct word-5-grams they share
# (the decontamination operator's diagnostic sibling). Engine path:
# batch-vectorized gram hashing (the shared sketch kernel convention:
# whole-doc gram when a doc has < 5 words) -> global distinct
# (gram, source) via one sorted combine -> whole-gram hash buckets where
# each gram's <= n_sources rows expand to pairs via the shared run-length
# all-pairs gather -> source^2-bounded tree combine. Sources never exceed
# a few hundred, so only (gram, source) rows ever shuffle. Oracle
# recomputes gram SETS from raw text in SQL (the docs_jaccard_pairs
# convention: distinct-hash cardinality == distinct-string cardinality,
# collision-free at 64 bits on these corpora).
# ---------------------------------------------------------------------------

def docs_source_overlap(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_all_pairs
    from ..stages.sketch import gram_hash_flat
    from .relational import sorted_group_agg, tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def gram_source(b: pa.Table) -> pa.Table:
        g, go, _ = gram_hash_flat(b["text"], 5)
        src = b["source"].to_numpy(zero_copy_only=False)
        n_docs = len(go) - 1
        rep = np.repeat(np.arange(n_docs), go[1:] - go[:-1])
        df = pd.DataFrame({"gram": g.view(np.int64), "source": src[rep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    gs = ds.map_batches(gram_source, batch_format="pyarrow")
    distinct = sorted_group_agg(gs, ["gram", "source"], {"_n": "count"}).drop_columns(["_n"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_a": pd.Series([], dtype=str),
                              "source_b": pd.Series([], dtype=str),
                              "shared_grams": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        g = g.sort_values(["gram", "source"], kind="stable")
        keys = g["gram"].to_numpy()
        src = g["source"].to_numpy()
        new = key_run_starts(keys)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(keys)))
        ai, bi = run_all_pairs(starts, lens)
        if len(ai) == 0:
            return empty
        out = (
            pd.DataFrame({"source_a": src[ai], "source_b": src[bi]})
            .groupby(["source_a", "source_b"], as_index=False).size()
            .rename(columns={"size": "shared_grams"})
        )
        return out

    partials = bucketed_key_apply(distinct, "gram", bucket_pairs, num_buckets=256)
    out = tree_group_sum(partials, ["source_a", "source_b"], value_cols=["shared_grams"])
    if out.empty:
        return pd.DataFrame({"source_a": pd.Series([], dtype=str),
                             "source_b": pd.Series([], dtype=str),
                             "shared_grams": pd.Series([], dtype="int64")})
    out["shared_grams"] = out["shared_grams"].astype("int64")
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


DOCS_SOURCE_OVERLAP_SQL = r"""
WITH d AS (
  SELECT source,
         list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
),
nd AS (SELECT source, ws, len(ws) AS nw FROM d),
grams AS (
  SELECT source,
         coalesce(array_to_string(ws[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' '), '') AS gram
  FROM nd, unnest(range(1, greatest(nw - 4, 1) + 1)) t(i)
),
sets AS (SELECT DISTINCT source, gram FROM grams)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS shared_grams
FROM sets a JOIN sets b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Grouped top-k at KEY scale — each user's 2 most frequent event types
# (ties by type asc). Unlike docs_top3_by_lang (a handful of groups), the
# group axis here grows with the data: (user, type) counts reduce at
# composite-key cardinality on the sorted combine, then whole-user hash
# buckets rank vectorized (one lexsort + cumcount per bucket). Oracle =
# ROW_NUMBER over COUNT(*).
# ---------------------------------------------------------------------------

def events_user_top2_types(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply
    from .relational import sorted_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = sorted_group_agg(ds, ["user_id", "event_type"], {"n": "count"})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"), "rk": pd.Series([], dtype="int64"),
             "event_type": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="stable").reset_index(drop=True)
        rk = g.groupby("user_id").cumcount().to_numpy() + 1
        keep = rk <= 2
        out = g.loc[keep, ["user_id", "event_type", "n"]].copy()
        out.insert(1, "rk", rk[keep].astype(np.int64))
        return out.astype({"user_id": "int64", "n": "int64"})

    df = bucketed_key_apply(counts, "user_id", per_bucket).to_pandas()
    return df.sort_values(["user_id", "rk"]).reset_index(drop=True)


EVENTS_USER_TOP2_TYPES_SQL = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
      FROM c)
SELECT user_id, CAST(rk AS BIGINT) AS rk, event_type, CAST(n AS BIGINT) AS n
FROM r WHERE rk <= 2 ORDER BY user_id, rk
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: each user's LONGEST consecutive-day activity streak —
# the classic calendar-run shape (SQL solves it with the day - row_number
# constant-per-island trick; the engine computes the same islands
# vectorized over whole-user buckets on the distinct (user, day) table).
# Day boundaries in integer epoch days (timestamps are UTC-us; no
# calendar semantics beyond floor division).
# ---------------------------------------------------------------------------

def events_user_longest_streak(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply
    from .relational import sorted_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def day_pairs(b: pa.Table) -> pa.Table:
        days = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(zero_copy_only=False), "day": days}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = sorted_group_agg(
        ds.map_batches(day_pairs, batch_format="pyarrow"), ["user_id", "day"], {"_n": "count"}
    ).drop_columns(["_n"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"), "longest_streak": pd.Series([], dtype="int64")}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "day"], kind="stable").reset_index(drop=True)
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy(dtype=np.int64)
        # island id = day - within-user row index (constant per island)
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        idx = np.arange(len(g)) - np.maximum.accumulate(np.where(new_user, np.arange(len(g)), 0))
        island = d - idx
        runs = (
            pd.DataFrame({"user_id": u, "island": island})
            .groupby(["user_id", "island"], as_index=False).size()
        )
        out = runs.groupby("user_id", as_index=False)["size"].max()
        return out.rename(columns={"size": "longest_streak"}).astype(
            {"user_id": "int64", "longest_streak": "int64"}
        )

    df = bucketed_key_apply(distinct, "user_id", per_bucket).to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


EVENTS_USER_LONGEST_STREAK_SQL = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events),
r AS (SELECT user_id, day,
        day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
      FROM d),
runs AS (SELECT user_id, island, COUNT(*) AS len FROM r GROUP BY 1, 2)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Curation funnel — the standard corpus-cleaning report: how many docs
# survive each successive pinned filter (raw -> min length -> min token
# count -> ascii-only). One pass, vectorized cumulative masks per batch,
# 4-row shuffle-free tree combine; every predicate is a pinned expression
# evaluated identically in SQL.
# ---------------------------------------------------------------------------

FUNNEL_MIN_CHARS = 100
FUNNEL_MIN_TOKENS = 15


def docs_curation_funnel(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        s0 = np.ones(len(nc), dtype=bool)
        s1 = s0 & (nc >= FUNNEL_MIN_CHARS)
        # token count by the shared split convention, vectorized: non-empty
        # tokens per doc via the exploded frame's cython groupby
        t = _doc_terms(b, distinct=False)
        cnt = t.groupby("doc_id").size()
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        ntok = cnt.reindex(did, fill_value=0).to_numpy()
        s2 = s1 & (ntok >= FUNNEL_MIN_TOKENS)
        # ascii iff utf8 byte length == codepoint length (no per-row Python)
        sarr = pc.cast(b["text"], pa.string())
        is_ascii = pc.equal(
            pc.binary_length(sarr.cast(pa.binary())), pc.utf8_length(sarr)
        ).to_numpy(zero_copy_only=False)
        s3 = s2 & is_ascii
        out = pd.DataFrame(
            {
                "stage": ["0_raw", "1_min_chars", "2_min_tokens", "3_ascii"],
                "n_surviving": [int(s0.sum()), int(s1.sum()), int(s2.sum()), int(s3.sum())],
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    out = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["stage"], value_cols=["n_surviving"])
    out["n_surviving"] = out["n_surviving"].astype("int64")
    return out.sort_values("stage").reset_index(drop=True)


DOCS_CURATION_FUNNEL_SQL = f"""
WITH m AS (
  SELECT n_chars >= {FUNNEL_MIN_CHARS} AS p1,
         len(list_filter(string_split(text, ' '), w -> w <> '')) >= {FUNNEL_MIN_TOKENS} AS p2,
         text = regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS p3
  FROM documents
)
SELECT stage, n_surviving FROM (
  SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_surviving FROM m
  UNION ALL
  SELECT '1_min_chars', CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL
  SELECT '2_min_tokens', CAST(SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL
  SELECT '3_ascii', CAST(SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) FROM m
) ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Exact substring dedup (round 5) — the ExactSubstr criterion of Lee et
# al. 2022: per-document maximal spans in which EVERY length-L character
# window occurs >= 2 times in the whole corpus (any such span is a union
# of corpus-repeated substrings of length >= L; removing them is the
# suffix-array dedup's removal set). Engine: stages/dedup.py
# dup_substring_spans — window explode (one sliding_window_view per
# batch) -> whole-gram buckets (exact string grouping, keep count >= 2)
# -> whole-doc buckets (one vectorized gaps-and-islands merge). Fully
# cross-engine oracle: DuckDB re-derives the same windows with substr,
# the same >= 2 filter, and the same island merge as a LAG window.
# ---------------------------------------------------------------------------

DUP_SUBSTR_L = 20


def docs_dup_substring_spans(sf_dir: str):
    from ..stages.dedup import dup_substring_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_substring_spans(ds, min_len=DUP_SUBSTR_L).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "start": pd.Series([], dtype="int64"),
             "span_len": pd.Series([], dtype="int64")}
        )
    out = out.astype({"doc_id": "int64", "start": "int64", "span_len": "int64"})
    return out.sort_values(["doc_id", "start"]).reset_index(drop=True)


DOCS_DUP_SUBSTRING_SPANS_SQL = f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - {DUP_SUBSTR_L} + 2)) AS p
  FROM documents WHERE length(text) >= {DUP_SUBSTR_L}
),
w AS (SELECT doc_id, CAST(p AS BIGINT) AS p, substr(text, CAST(p AS INTEGER), {DUP_SUBSTR_L}) AS gram FROM pos),
dup AS (SELECT gram FROM w GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, p FROM w JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, p,
         CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) <= {DUP_SUBSTR_L}
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
grp AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM isl
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MIN(p) AS BIGINT) AS start,
       CAST(MAX(p) - MIN(p) + {DUP_SUBSTR_L} AS BIGINT) AS span_len
FROM grp GROUP BY doc_id, g ORDER BY doc_id, start
"""
