"""CRS-reprojection driver queries — the `-t_srs` seam the reference's
only vector entry point exercises (`gdal_tools.py:188`:
``ogr2ogr ... -t_srs proj4`` inside ``shapefile2raster``) re-expressed
over the engine's pure-numpy projection kernels (functions/crs.py).

Three queries, three verification strengths:

- ``docs_webmercator_tiles``: the CORPUS side reprojects (distributed
  ``map_batches`` over zero-copy Arrow, lonlat -> EPSG:3857) and bins
  into 100 km web-mercator tiles.  Fully cross-engine: DuckDB recomputes
  the forward spherical-mercator formula.  x = R*radians(lon) is a pure
  product (bit-identical across engines); y's tan/ln can differ by ulps,
  so the tile grid is OFFSET by half a tile — no deterministic input
  lands a y within ~1e-8 m of a tile edge (doc lats sit on a 0.01-degree
  grid whose mercator images are transcendental).
- ``stations_utm_reproject_knn``: the VECTOR side reprojects (UTM zone
  33N station coordinates -> lonlat, exactly where ogr2ogr runs in the
  reference) and the corpus kNN-joins against the reprojected stations.
  DuckDB's trig differs in ulps from numpy (the docs_knn_haversine
  precedent), so the oracle is a staged single-process numpy twin of the
  SAME IEEE expression tree, distances mm-rounded on both sides.
- ``docs_reprojected_polygon_join``: the polygon layer arrives in
  web-mercator METRES and ``PolygonIndex(src_crs="webmercator")``
  reprojects every vertex at index build (the -t_srs placement); the
  spatial join then runs in lonlat.  Fully cross-engine: the oracle
  inverse-projects the staged mercator edge table IN SQL
  (lon = degrees(x/R), lat = degrees(2*atan(exp(y/R)) - pi/2)) and
  replays the same even-odd crossing expression (the raster_zonal_stats
  oracle shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import io, oracles as O, synth, wkb
from ..functions import crs
from ..numerics import sql_round


def _read(sf_dir: str, table: str, columns=None):
    return io.read_named(sf_dir, table, columns=columns)


# ---------------------------------------------------------------------------
# 1. corpus-side distributed reproject -> 100 km mercator tile counts
# ---------------------------------------------------------------------------

MERC_TILE_M = 100_000.0
_R = 6378137.0


def docs_webmercator_tiles(sf_dir: str):
    from .relational import tree_group_sum
    from .textqueries import doc_lonlat

    ds = _read(sf_dir, "documents", ["doc_id"])

    def tiles(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        pts = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
        m = crs.reproject_batch(pts, "lonlat", "webmercator")
        x = m["lon"].to_numpy(zero_copy_only=False)
        y = m["lat"].to_numpy(zero_copy_only=False)
        tx = np.floor((x + MERC_TILE_M / 2.0) / MERC_TILE_M).astype(np.int64)
        ty = np.floor((y + MERC_TILE_M / 2.0) / MERC_TILE_M).astype(np.int64)
        df = pd.DataFrame({"tx": tx, "ty": ty, "n": 1})
        return pa.Table.from_pandas(
            df.groupby(["tx", "ty"], as_index=False).sum(), preserve_index=False
        )

    out = tree_group_sum(
        ds.map_batches(tiles, batch_format="pyarrow"), ["tx", "ty"], value_cols=["n"]
    )
    out = out.astype({"tx": "int64", "ty": "int64", "n": "int64"})
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


DOCS_WEBMERC_TILES_SQL = f"""
WITH p AS (
  SELECT (CAST((doc_id * 9973) % 36000 AS DOUBLE)/100.0 - 180.0) AS lon,
         (CAST((doc_id * 9941) % 17000 AS DOUBLE)/100.0 - 85.0) AS lat
  FROM documents
),
m AS (
  SELECT {_R!r} * radians(lon) AS x,
         {_R!r} * ln(tan(pi()/4.0 + radians(lat)/2.0)) AS y
  FROM p
)
SELECT CAST(floor((x + {MERC_TILE_M / 2.0!r}) / {MERC_TILE_M!r}) AS BIGINT) AS tx,
       CAST(floor((y + {MERC_TILE_M / 2.0!r}) / {MERC_TILE_M!r}) AS BIGINT) AS ty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM m GROUP BY 1, 2 ORDER BY tx, ty
"""


# ---------------------------------------------------------------------------
# 2. vector-side UTM reproject + kNN join (staged numpy twin oracle)
# ---------------------------------------------------------------------------

UTM_ZONE = 33


def _utm_stations(nation_df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic station layer NATIVE to UTM zone 33N: eastings well
    inside the zone's validity, northings ~4.5..67 degrees north."""
    k = nation_df["n_nationkey"].to_numpy().astype(np.int64)
    easting = 150000.0 + ((k * 104729) % 600000).astype(np.float64)
    northing = 500000.0 + ((k * 95989) % 7000000).astype(np.float64)
    return pd.DataFrame({"station_id": k, "easting": easting, "northing": northing})


def _utm_station_lonlat(st: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    return crs.to_lonlat(
        st["easting"].to_numpy(), st["northing"].to_numpy(), f"utm:{UTM_ZONE}"
    )


def stations_utm_reproject_knn(sf_dir: str):
    import ray

    from ..stages.knn import KNNBroadcast
    from .textqueries import doc_lonlat

    stage_stations_utm_knn(sf_dir)
    nation = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    st = _utm_stations(nation)
    slon, slat = _utm_station_lonlat(st)
    st_ref = ray.put(
        {"station_id": st["station_id"].to_numpy(), "lon": slon, "lat": slat}
    )
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pts(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        return pa.table({"doc_id": batch["doc_id"], "lon": lon, "lat": lat})

    out = (
        ds.map_batches(pts, batch_format="pyarrow")
        .map_batches(
            KNNBroadcast,
            fn_constructor_kwargs={"stations_ref": st_ref, "k": 1},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .select_columns(["doc_id", "station_id", "station_dist"])
        .to_pandas()
    )
    out["station_dist"] = out["station_dist"].round(3)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def stage_stations_utm_knn(sf_dir: str) -> str:
    """Single-process numpy twin: same UTM inverse, same haversine, same
    (distance, station_id) tie rule, mm rounding — fully vectorized."""
    from ..stages.knn import haversine_m
    from .textqueries import doc_lonlat

    nat = io.read_table_arrow(
        io.table_path(sf_dir, "nation"), columns=["n_nationkey"]
    ).to_pandas()
    st = _utm_stations(nat)
    skey = st["station_id"].to_numpy()
    slon, slat = _utm_station_lonlat(st)
    df = io.read_table_arrow(io.table_path(sf_dir, "documents"), columns=["doc_id"]).to_pandas()
    did = df["doc_id"].astype("int64").to_numpy()
    lon, lat = doc_lonlat(did)
    d = haversine_m(lon[:, None], lat[:, None], slon[None, :], slat[None, :])
    # stations are in ascending station_id order, so argmin's first-hit
    # convention equals the (distance, station_id) lexsort for k=1
    j = np.argmin(d, axis=1)
    out = pd.DataFrame(
        {
            "doc_id": did,
            "station_id": skey[j].astype(np.int64),
            "station_dist": np.round(d[np.arange(len(did)), j], 3),
        }
    ).sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("stations_utm_knn", out)


STATIONS_UTM_KNN_SQL = O.fixture_sql("stations_utm_knn", "doc_id")


# ---------------------------------------------------------------------------
# 3. mercator polygon layer -> PolygonIndex(src_crs=...) -> spatial join
#    (fully cross-engine: SQL inverse-projects the staged edge table)
# ---------------------------------------------------------------------------

CRSJOIN_NPOLY = 120


def _mercator_layer(n_poly: int) -> tuple[dict, pd.DataFrame, pd.DataFrame]:
    """Forward-project the deterministic synth polygon layer into
    web-mercator metres: the layer handed to the engine (WKB in metres)
    and the edge/attribute tables staged for the SQL oracle. The lonlat
    scaffold layer is discarded — BOTH engines work from the metre WKB."""
    layer = synth.make_polygons(n_poly, cover_res=6)
    wkbs, e_poly, ex0, ey0, ex1, ey1 = [], [], [], [], [], []
    for pid, buf in zip(layer["poly_id"], layer["geom_wkb"]):
        rings_m = []
        for ring in wkb.parse_polygon(buf):
            # inflate 15x around the centroid: the synth layer's regional
            # (~0.03-0.28 deg) polygons are calibrated for corpora >= sf0.01;
            # this query must also produce rows over the 500-doc sf0.001
            # table, and the inflation is part of the deterministic layer
            # definition (both engines read the SAME staged metre edges)
            c = ring.mean(axis=0)
            ring = c + (ring - c) * 15.0
            ring[:, 1] = np.clip(ring[:, 1], -89.0, 89.0)  # keep mercator finite
            mx, my = crs.lonlat_to_webmercator(ring[:, 0], ring[:, 1])
            rings_m.append(np.column_stack([mx, my]))
            r = np.column_stack([mx, my])
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            e_poly.append(np.full(len(r) - 1, pid, dtype=np.int64))
            ex0.append(r[:-1, 0]); ey0.append(r[:-1, 1])
            ex1.append(r[1:, 0]); ey1.append(r[1:, 1])
        wkbs.append(wkb.polygon_wkb(rings_m))
    merc_layer = {
        "poly_id": layer["poly_id"],
        "geom_wkb": wkbs,
        # bboxes in metres are recomputed into lonlat by the index build
        "bbox": [wkb.polygon_bbox(b) for b in wkbs],
        "field_value": layer["field_value"],
    }
    edges = pd.DataFrame(
        {
            "poly_id": np.concatenate(e_poly),
            "x0": np.concatenate(ex0), "y0": np.concatenate(ey0),
            "x1": np.concatenate(ex1), "y1": np.concatenate(ey1),
        }
    )
    attrs = pd.DataFrame(
        {
            "poly_id": np.asarray(layer["poly_id"], dtype=np.int64),
            "field_value": np.asarray(layer["field_value"], dtype=np.float64),
        }
    )
    return merc_layer, edges, attrs


def docs_reprojected_polygon_join(sf_dir: str):
    import ray

    from ..stages.spatial_join import PolygonIndex, SpatialJoin
    from .textqueries import doc_lonlat

    merc_layer, edges, attrs = _mercator_layer(CRSJOIN_NPOLY)
    O.stage_fixture("crs_poly_edges", edges)
    O.stage_fixture("crs_poly_attrs", attrs)
    idx_ref = ray.put(PolygonIndex.from_synth(merc_layer, cover_res=6, src_crs="webmercator"))
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pts(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        return pa.table({"doc_id": batch["doc_id"], "lon": lon, "lat": lat})

    out = (
        ds.map_batches(pts, batch_format="pyarrow")
        .map_batches(
            SpatialJoin,
            fn_constructor_kwargs={"index_ref": idx_ref},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .select_columns(["doc_id", "poly_id", "field_value"])
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "poly_id": pd.Series([], dtype="int64"),
             "field_value": pd.Series([], dtype="float64")}
        )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["field_value"] = sql_round(out["field_value"].to_numpy() * 1000.0) / 1000.0
    return out.sort_values(["doc_id", "poly_id"]).reset_index(drop=True)


def _reprojected_polygon_join_sql() -> str:
    return f"""
WITH p AS (
  SELECT doc_id,
         (CAST((doc_id * 9973) % 36000 AS DOUBLE)/100.0 - 180.0) AS lon,
         (CAST((doc_id * 9941) % 17000 AS DOUBLE)/100.0 - 85.0) AS lat
  FROM documents
),
e AS (
  SELECT poly_id,
         degrees(x0 / {_R!r}) AS ex0,
         degrees(2.0*atan(exp(y0 / {_R!r})) - pi()/2.0) AS ey0,
         degrees(x1 / {_R!r}) AS ex1,
         degrees(2.0*atan(exp(y1 / {_R!r})) - pi()/2.0) AS ey1
  FROM read_parquet('{O.fixture_path("crs_poly_edges")}')
),
bb AS (
  SELECT poly_id,
         MIN(LEAST(ex0, ex1)) AS b0, MIN(LEAST(ey0, ey1)) AS b1,
         MAX(GREATEST(ex0, ex1)) AS b2, MAX(GREATEST(ey0, ey1)) AS b3
  FROM e GROUP BY 1
),
cand AS (
  SELECT p.doc_id, p.lon, p.lat, bb.poly_id
  FROM p JOIN bb
    ON p.lon >= bb.b0 AND p.lon <= bb.b2 AND p.lat >= bb.b1 AND p.lat <= bb.b3
),
hits AS (
  SELECT c.doc_id, c.poly_id,
         COUNT(*) FILTER (
           WHERE ((e.ey0 <= c.lat) <> (e.ey1 <= c.lat))
             AND c.lon < e.ex0 + (c.lat - e.ey0) * (e.ex1 - e.ex0) / (e.ey1 - e.ey0)
         ) AS k
  FROM cand c JOIN e USING (poly_id)
  GROUP BY 1, 2
)
SELECT CAST(h.doc_id AS BIGINT) AS doc_id,
       CAST(h.poly_id AS BIGINT) AS poly_id,
       CAST(round(a.field_value * 1000) AS DOUBLE) / 1000.0 AS field_value
FROM hits h JOIN read_parquet('{O.fixture_path("crs_poly_attrs")}') a USING (poly_id)
WHERE h.k % 2 = 1
ORDER BY doc_id, poly_id
"""


# ---------------------------------------------------------------------------
# 4. per-point UTM zone assignment — the zone picker a multi-zone corpus
#    needs before lonlat_to_utm (gdal's utm auto-zone rule, no Norway
#    exceptions). Pure integer arithmetic mirrored exactly in SQL: fully
#    cross-engine, no float hazard.
# ---------------------------------------------------------------------------

def docs_utm_zones(sf_dir: str):
    from .relational import tree_group_sum
    from .textqueries import doc_lonlat

    ds = _read(sf_dir, "documents", ["doc_id"])

    def zones(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        # vectorized twin of crs.utm_zone_of (same floor/mod rule)
        zone = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
        south = (lat < 0.0).astype(np.int64)
        df = pd.DataFrame({"zone": zone, "south": south, "n": 1})
        return pa.Table.from_pandas(
            df.groupby(["zone", "south"], as_index=False).sum(), preserve_index=False
        )

    out = tree_group_sum(
        ds.map_batches(zones, batch_format="pyarrow"), ["zone", "south"], value_cols=["n"]
    )
    out = out.astype({"zone": "int64", "south": "int64", "n": "int64"})
    return out.sort_values(["zone", "south"]).reset_index(drop=True)


DOCS_UTM_ZONES_SQL = """
WITH p AS (
  SELECT (CAST((doc_id * 9973) % 36000 AS DOUBLE)/100.0 - 180.0) AS lon,
         (CAST((doc_id * 9941) % 17000 AS DOUBLE)/100.0 - 85.0) AS lat
  FROM documents
)
SELECT CAST(CAST(floor((lon + 180.0) / 6.0) AS BIGINT) % 60 + 1 AS BIGINT) AS zone,
       CAST(CASE WHEN lat < 0.0 THEN 1 ELSE 0 END AS BIGINT) AS south,
       CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2 ORDER BY zone, south
"""


# ---------------------------------------------------------------------------
# 5. distributed raster reprojection — the gdalwarp twin (stages/warp.py):
#    a 1-degree lonlat source grid (value a pure function of (iy, ix))
#    warped onto a web-mercator destination grid by nearest-cell sampling
#    (the reference's extract_point_data rule composed with the inverse
#    CRS transform). FULLY cross-engine: DuckDB regenerates the dst grid,
#    inverse-projects with the same expressions, applies the same
#    round()-based nearest-index rule, and recomputes the source value.
#    Boundary safety: dst cell centers are exact binary floats whose
#    inverse-mercator images are transcendental — never an exact integer
#    longitude/latitude, so the round() half-boundary is never hit and
#    numpy-vs-DuckDB ulp differences cannot flip an index.
# ---------------------------------------------------------------------------

WARP_SRC_NX, WARP_SRC_NY = 360, 180
WARP_SRC_GT = (-180.0, 1.0, 0.0, 90.0, 0.0, -1.0)
WARP_DST = {
    "crs": "webmercator",
    "x0": -10_000_000.0, "resx": 78_271.515625,
    "y0": 10_000_000.0, "resy": -104_166.65625,
    "nx": 256, "ny": 192,
}


def _warp_src_grid() -> np.ndarray:
    iy, ix = np.indices((WARP_SRC_NY, WARP_SRC_NX))
    return ((iy * 13 + ix * 7) % 97).astype(np.float64)


def raster_warp_webmercator(sf_dir: str):
    from ..stages.warp import warp_nearest

    out = warp_nearest(_warp_src_grid(), WARP_SRC_GT, "lonlat", WARP_DST).to_pandas()
    out["v"] = out["value"].astype("int64")
    out = out.drop(columns=["value"]).astype({"iy": "int64", "ix": "int64"})
    return out.sort_values(["iy", "ix"]).reset_index(drop=True)


RASTER_WARP_SQL = f"""
WITH g AS (
  SELECT CAST(a.iy AS BIGINT) AS iy, CAST(b.ix AS BIGINT) AS ix
  FROM range({WARP_DST["ny"]}) a(iy) CROSS JOIN range({WARP_DST["nx"]}) b(ix)
),
pts AS (
  SELECT iy, ix,
         {WARP_DST["x0"]!r} + (ix + 0.5) * {WARP_DST["resx"]!r} AS mx,
         {WARP_DST["y0"]!r} + (iy + 0.5) * {WARP_DST["resy"]!r} AS my
  FROM g
),
ll AS (
  SELECT iy, ix,
         degrees(mx / {_R!r}) AS lon,
         degrees(2.0*atan(exp(my / {_R!r})) - pi()/2.0) AS lat
  FROM pts
),
idx AS (
  SELECT iy, ix,
         CAST(round((lon - ({WARP_SRC_GT[0]!r} + {WARP_SRC_GT[1]!r}/2.0)) / {WARP_SRC_GT[1]!r}) AS BIGINT) AS ilon,
         CAST(round((lat - ({WARP_SRC_GT[3]!r} + {WARP_SRC_GT[5]!r}/2.0)) / {WARP_SRC_GT[5]!r}) AS BIGINT) AS ilat
  FROM ll
)
SELECT iy, ix, CAST((ilat * 13 + ilon * 7) % 97 AS BIGINT) AS v
FROM idx ORDER BY iy, ix
"""


# ---------------------------------------------------------------------------
# 6. quadkey encoding — the Bing-maps tile-address string (level 8):
#    interleave the web-mercator tile x/y bits into a base-4 string.
#    Pure integer bit arithmetic after the mercator forward, mirrored
#    digit-by-digit in SQL; counts per quadkey keep the output bounded.
# ---------------------------------------------------------------------------

QUADKEY_LEVEL = 8


def docs_quadkeys(sf_dir: str):
    from .relational import tree_group_sum
    from .textqueries import doc_lonlat

    ds = _read(sf_dir, "documents", ["doc_id"])
    n = 1 << QUADKEY_LEVEL

    def qk(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        # standard slippy/Bing tile math (clip to the web-mercator square)
        latc = np.clip(lat, -85.05112878, 85.05112878)
        tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        s = np.sin(np.radians(latc))
        ty = np.floor((0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)) * n).astype(np.int64)
        np.clip(tx, 0, n - 1, out=tx)
        np.clip(ty, 0, n - 1, out=ty)
        digits = []
        for i in range(QUADKEY_LEVEL - 1, -1, -1):
            d = (((ty >> i) & 1) << 1) | ((tx >> i) & 1)
            digits.append(d.astype(np.uint8) + ord("0"))
        buf = np.stack(digits, axis=1).astype(np.uint8)
        keys = buf.tobytes().decode("ascii")
        keys = [keys[i * QUADKEY_LEVEL:(i + 1) * QUADKEY_LEVEL] for i in range(len(did))]
        df = pd.DataFrame({"quadkey": keys, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("quadkey", as_index=False).sum(), preserve_index=False
        )

    out = tree_group_sum(
        ds.map_batches(qk, batch_format="pyarrow"), ["quadkey"], value_cols=["n"]
    )
    out = out.astype({"quadkey": "str", "n": "int64"})
    return out.sort_values("quadkey").reset_index(drop=True)


def _quadkey_sql() -> str:
    n = 1 << QUADKEY_LEVEL
    digit_exprs = " || ".join(
        f"CAST(((ty // {1 << i}) % 2) * 2 + ((tx // {1 << i}) % 2) AS VARCHAR)"
        for i in range(QUADKEY_LEVEL - 1, -1, -1)
    )
    return f"""
WITH p AS (
  SELECT (CAST((doc_id * 9973) % 36000 AS DOUBLE)/100.0 - 180.0) AS lon,
         (CAST((doc_id * 9941) % 17000 AS DOUBLE)/100.0 - 85.0) AS lat
  FROM documents
),
c AS (
  SELECT lon, LEAST(GREATEST(lat, -85.05112878), 85.05112878) AS latc FROM p
),
t AS (
  SELECT CAST(LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) AS tx,
         CAST(LEAST(GREATEST(floor((0.5 - ln((1.0 + sin(radians(latc))) / (1.0 - sin(radians(latc)))) / (4.0 * pi())) * {n}), 0), {n - 1}) AS BIGINT) AS ty
  FROM c
)
SELECT {digit_exprs} AS quadkey, CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY 1 ORDER BY quadkey
"""


def raster_warp_bilinear(sf_dir: str):
    """Bilinear-resampling variant of the warp (gdalwarp -r bilinear).
    Float weights make a fully-SQL mirror ulp-hazardous, so the oracle is
    the staged single-process twin of the SAME kernel (the knn-haversine
    convention): distributed == single-process is the check."""
    from ..stages.warp import warp_nearest

    stage_raster_warp_bilinear(sf_dir)
    out = warp_nearest(_warp_src_grid(), WARP_SRC_GT, "lonlat", WARP_DST,
                       mode="bilinear").to_pandas()
    out["v_micro"] = sql_round(out["value"].to_numpy() * 1e6).astype(np.int64)
    out = out.drop(columns=["value"]).astype({"iy": "int64", "ix": "int64"})
    return out.sort_values(["iy", "ix"]).reset_index(drop=True)


def stage_raster_warp_bilinear(sf_dir: str) -> str:
    from ..stages.warp import bilinear_sample

    s = WARP_DST
    iy, ix = np.indices((s["ny"], s["nx"]))
    iy, ix = iy.ravel(), ix.ravel()
    dx = s["x0"] + (ix + 0.5) * s["resx"]
    dy = s["y0"] + (iy + 0.5) * s["resy"]
    lon, lat = crs.transform(dx, dy, s["crs"], "lonlat")
    v = bilinear_sample(lon, lat, _warp_src_grid(), WARP_SRC_GT)
    out = pd.DataFrame(
        {"iy": iy.astype(np.int64), "ix": ix.astype(np.int64),
         "v_micro": sql_round(v * 1e6).astype(np.int64)}
    ).sort_values(["iy", "ix"]).reset_index(drop=True)
    return O.stage_fixture("raster_warp_bilinear", out)


RASTER_WARP_BILINEAR_SQL = O.fixture_sql("raster_warp_bilinear", "iy, ix")


# ---------------------------------------------------------------------------
# 7. corpus-scale forward UTM projection — every point projected into ITS
#    OWN auto-picked zone (the multi-zone composition of docs_utm_zones +
#    lonlat_to_utm), distributed per batch by grouping points on zone and
#    running the vectorized Snyder forward once per present zone. Twin
#    oracle (trig), mm-rounded.
# ---------------------------------------------------------------------------

def _utm_project_points(did: np.ndarray) -> pd.DataFrame:
    from .textqueries import doc_lonlat

    lon, lat = doc_lonlat(did)
    zone = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    south = lat < 0.0
    e = np.empty(len(did))
    n = np.empty(len(did))
    for z in np.unique(zone):
        for s in (False, True):
            m = (zone == z) & (south == s)
            if m.any():
                e[m], n[m] = crs.lonlat_to_utm(lon[m], lat[m], int(z), south=s)
    return pd.DataFrame(
        {"doc_id": did.astype(np.int64), "zone": zone,
         "south": south.astype(np.int64),
         "easting_mm": sql_round(e * 1000.0).astype(np.int64),
         "northing_mm": sql_round(n * 1000.0).astype(np.int64)}
    )


def docs_utm_project(sf_dir: str):
    stage_docs_utm_project(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id"])

    def proj(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pandas(_utm_project_points(did), preserve_index=False)

    out = ds.map_batches(proj, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {c: "int64" for c in out.columns}
    )


def stage_docs_utm_project(sf_dir: str) -> str:
    df = io.read_table_arrow(io.table_path(sf_dir, "documents"), columns=["doc_id"]).to_pandas()
    did = df["doc_id"].astype("int64").to_numpy()
    out = _utm_project_points(did).sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("docs_utm_project", out)


DOCS_UTM_PROJECT_SQL = O.fixture_sql("docs_utm_project", "doc_id")


# ---------------------------------------------------------------------------
# 8. polygon areas — planar shoelace over the forward-projected layer
#    (web-mercator metres), the vector-side sibling of grid_cell_areas
#    (the reference computes areas only for raster cells,
#    terrain_tools.py; real vector layers need polygon areas for density
#    normalization). Distributed per polygon batch; the oracle
#    forward-projects the staged LONLAT closed-edge table in SQL and sums
#    the same cross products. Output quantized to hectares: the fp
#    summation-order slack (~0.2 m^2 at these magnitudes) is 4 orders
#    below the quantum, so engine/oracle can never disagree.
# ---------------------------------------------------------------------------

AREA_NPOLY = 150


def polygons_mercator_area(sf_dir: str):
    import ray.data as rd

    layer = synth.make_polygons(AREA_NPOLY, cover_res=6)
    e_poly, ex0, ey0, ex1, ey1 = [], [], [], [], []
    rows = []
    for pid, buf in zip(layer["poly_id"], layer["geom_wkb"]):
        rows.append({"poly_id": int(pid), "geom_wkb": buf})
        for ring in wkb.parse_polygon(buf):
            r = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
            e_poly.append(np.full(len(r) - 1, pid, dtype=np.int64))
            ex0.append(r[:-1, 0]); ey0.append(r[:-1, 1])
            ex1.append(r[1:, 0]); ey1.append(r[1:, 1])
    O.stage_fixture(
        "area_poly_edges",
        pd.DataFrame({"poly_id": np.concatenate(e_poly),
                      "x0": np.concatenate(ex0), "y0": np.concatenate(ey0),
                      "x1": np.concatenate(ex1), "y1": np.concatenate(ey1)}),
    )

    def area_batch(b: pa.Table) -> pa.Table:
        pids, areas = [], []
        for pid, buf in zip(b["poly_id"].to_pylist(), b["geom_wkb"].to_pylist()):
            a = 0.0
            for ring in wkb.parse_polygon(buf):
                r = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
                mx, my = crs.lonlat_to_webmercator(r[:, 0], r[:, 1])
                a += float(np.sum(mx[:-1] * my[1:] - mx[1:] * my[:-1]))
            pids.append(pid)
            areas.append(abs(a) / 2.0)
        return pa.table(
            {"poly_id": pa.array(pids, type=pa.int64()),
             "area_ha": pa.array(sql_round(np.asarray(areas) / 1e4).astype(np.int64))}
        )

    ds = rd.from_pandas(pd.DataFrame(rows), override_num_blocks=8)
    out = ds.map_batches(area_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("poly_id").reset_index(drop=True).astype(
        {"poly_id": "int64", "area_ha": "int64"}
    )


def _polygons_area_sql() -> str:
    return f"""
WITH e AS (
  SELECT poly_id,
         {_R!r} * radians(x0) AS mx0,
         {_R!r} * ln(tan(pi()/4.0 + radians(y0)/2.0)) AS my0,
         {_R!r} * radians(x1) AS mx1,
         {_R!r} * ln(tan(pi()/4.0 + radians(y1)/2.0)) AS my1
  FROM read_parquet('{O.fixture_path("area_poly_edges")}')
)
SELECT CAST(poly_id AS BIGINT) AS poly_id,
       CAST(round(abs(SUM(mx0 * my1 - mx1 * my0)) / 2.0 / 10000.0, 0) AS BIGINT) AS area_ha
FROM e GROUP BY 1 ORDER BY poly_id
"""
