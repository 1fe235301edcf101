"""Driver-contract queries over documents/embeddings: dedup, text analysis,
geo derivation, kNN, ANN — each with an exactly-mirrored DuckDB oracle
where SQL can express it (see relational.py for the determinism rules).

The geo columns for the docs⋈rects / tile-assign / kNN queries are DERIVED
deterministically from doc_id by integer arithmetic, so the SQL oracle can
reproduce them bit-exactly; the real corpus path (WKT geo spans) is
exercised by the flagship pipeline and pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import io
from ..hashing import text_hash_u64
from ..numerics import sql_round


def _read(sf_dir: str, table: str, columns=None):
    return io.read_named(sf_dir, table, columns=columns)


# -- deterministic doc point derivation (mirrored in SQL) --------------------

DOC_LON_SQL = "(CAST((doc_id * 9973) % 36000 AS DOUBLE)/100.0 - 180.0)"
DOC_LAT_SQL = "(CAST((doc_id * 9941) % 17000 AS DOUBLE)/100.0 - 85.0)"


def doc_lonlat(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    doc_id = np.asarray(doc_id, dtype=np.int64)
    lon = ((doc_id * 9973) % 36000).astype(np.float64) / 100.0 - 180.0
    lat = ((doc_id * 9941) % 17000).astype(np.float64) / 100.0 - 85.0
    return lon, lat


# rectangles / stations derived from nation keys (25 rows, broadcast side)
def _nation_rects(nation_df: pd.DataFrame) -> pd.DataFrame:
    k = nation_df["n_nationkey"].to_numpy().astype(np.int64)
    x0 = ((k * 7919) % 300).astype(np.float64) - 170.0
    y0 = ((k * 6271) % 140).astype(np.float64) - 80.0
    w = 20.0 + (k % 7).astype(np.float64) * 5.0
    h = 15.0 + (k % 5).astype(np.float64) * 4.0
    return pd.DataFrame({"rect_id": k, "x0": x0, "y0": y0, "x1": x0 + w, "y1": y0 + h})


RECTS_SQL = """
  SELECT CAST(n_nationkey AS BIGINT) AS rect_id,
         CAST((n_nationkey * 7919) % 300 AS DOUBLE) - 170.0 AS x0,
         CAST((n_nationkey * 6271) % 140 AS DOUBLE) - 80.0 AS y0,
         CAST((n_nationkey * 7919) % 300 AS DOUBLE) - 170.0 + 20.0 + CAST(n_nationkey % 7 AS DOUBLE)*5.0 AS x1,
         CAST((n_nationkey * 6271) % 140 AS DOUBLE) - 80.0 + 15.0 + CAST(n_nationkey % 5 AS DOUBLE)*4.0 AS y1
  FROM nation
"""


def _nation_stations(nation_df: pd.DataFrame) -> pd.DataFrame:
    k = nation_df["n_nationkey"].to_numpy().astype(np.int64)
    lon = ((k * 137) % 360).astype(np.float64) - 180.0 + 0.5
    lat = ((k * 73) % 170).astype(np.float64) - 85.0 + 0.5
    return pd.DataFrame({"station_id": k, "slon": lon, "slat": lat})


STATIONS_SQL = """
  SELECT CAST(n_nationkey AS BIGINT) AS station_id,
         CAST((n_nationkey * 137) % 360 AS DOUBLE) - 180.0 + 0.5 AS slon,
         CAST((n_nationkey * 73) % 170 AS DOUBLE) - 85.0 + 0.5 AS slat
  FROM nation
"""


# ---------------------------------------------------------------------------
# exact dedup: hash-partitioned first-per-content (SURVEY.md 2.7 / guide)
# ---------------------------------------------------------------------------

def docs_exact_dedup(sf_dir: str):
    from .relational import sorted_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        # shuffle a 64-bit content hash, not the document text (scale rule)
        h = text_hash_u64(batch["text"])
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(h, type=pa.uint64())})

    # per-hash reduce via sorted_group_agg: ~n_docs distinct keys, the
    # regime where Ray's per-group-Python aggregate finalize dominates;
    # the metadata row count lets tiny corpora skip the sort's fixed cost
    agg = sorted_group_agg(
        ds.map_batches(add_hash, batch_format="pyarrow"), "h",
        {"doc_id": "min", "dup_count": "count"},
        approx_rows=io.table_num_rows(io.table_path(sf_dir, "documents")),
    )
    df = agg.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pd.DataFrame({"keep_id": df["doc_id"].astype("int64"), "dup_count": df["dup_count"].astype("int64")})


DOCS_EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY text ORDER BY keep_id
"""


# ---------------------------------------------------------------------------
# token counting + quality scoring (vectorized Arrow string kernels)
# ---------------------------------------------------------------------------

def docs_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        toks = pc.split_pattern_regex(text, r"\s+")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        n_chars = pc.utf8_length(text).cast(pa.int64())
        n_alpha = pc.count_substring_regex(text, "[A-Za-z]").cast(pa.int64())
        n_spaces = pc.count_substring_regex(text, " ").cast(pa.int64())
        alpha_ratio = pc.divide(n_alpha.cast(pa.float64()), pc.max_element_wise(n_chars.cast(pa.float64()), 1.0))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_tokens": n_tokens,
                "n_chars": n_chars,
                "n_alpha": n_alpha,
                "n_spaces": n_spaces,
                "alpha_ratio": alpha_ratio,
            }
        )

    df = ds.map_batches(stats, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df


DOCS_TOKEN_STATS_SQL = """
SELECT doc_id, lang,
       CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
FROM documents ORDER BY doc_id
"""


def lang_token_summary(sf_dir: str):
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern_regex(batch["text"], r"\s+")).cast(pa.int64())
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(), "t": toks.to_pandas()})
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).agg(total_tokens=("t", "sum"), n_docs=("t", "size")),
            preserve_index=False,
        )

    # a handful of language groups: tree combine + driver merge
    from .relational import tree_group_sum

    df = (
        tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["lang"])
        .sort_values("lang")
        .reset_index(drop=True)
    )
    df["total_tokens"] = df["total_tokens"].astype("int64")
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


LANG_TOKEN_SUMMARY_SQL = """
SELECT lang, CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# tile assignment over derived points (integer-exact on both sides)
# ---------------------------------------------------------------------------

def docs_tile_assign(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        tx = np.floor((lon + 180.0) / 360.0 * 1024.0).astype(np.int64)
        ty = np.floor((lat + 90.0) / 180.0 * 512.0).astype(np.int64)
        np.clip(tx, 0, 1023, out=tx)
        np.clip(ty, 0, 511, out=ty)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lon": lon,
                "lat": lat,
                "tile_x": tx,
                "tile_y": ty,
                "tile_id": ty * 1024 + tx,
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)


DOCS_TILE_ASSIGN_SQL = f"""
SELECT doc_id, lon, lat, tile_x, tile_y, tile_y*1024 + tile_x AS tile_id
FROM (
  SELECT doc_id, lon, lat,
         least(greatest(CAST(floor((lon + 180.0)/360.0*1024.0) AS BIGINT), 0), 1023) AS tile_x,
         least(greatest(CAST(floor((lat + 90.0)/180.0*512.0) AS BIGINT), 0), 511) AS tile_y
  FROM (SELECT doc_id, {DOC_LON_SQL} AS lon, {DOC_LAT_SQL} AS lat FROM documents)
) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# rect containment join (broadcast small side; SQL mirror = theta join)
# ---------------------------------------------------------------------------

def docs_rect_join(sf_dir: str):
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    rects = _nation_rects(nation)
    rects_ref = ray.put(rects.to_numpy())  # columns: rect_id,x0,y0,x1,y1

    ds = _read(sf_dir, "documents", ["doc_id"])

    def join(batch: pa.Table) -> pa.Table:
        R = ray.get(rects_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        # vectorized containment: (npts, nrects) — half-open [x0, x1)
        inside = (
            (lon[:, None] >= R[None, :, 1])
            & (lon[:, None] < R[None, :, 3])
            & (lat[:, None] >= R[None, :, 2])
            & (lat[:, None] < R[None, :, 4])
        )
        pi, ri = np.nonzero(inside)
        return pa.table(
            {
                "doc_id": pa.array(did[pi], type=pa.int64()),
                "rect_id": pa.array(R[ri, 0].astype(np.int64), type=pa.int64()),
            }
        )

    df = ds.map_batches(join, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "rect_id"]).reset_index(drop=True)


DOCS_RECT_JOIN_SQL = f"""
SELECT d.doc_id, r.rect_id
FROM (SELECT doc_id, {DOC_LON_SQL} AS lon, {DOC_LAT_SQL} AS lat FROM documents) d
JOIN ({RECTS_SQL}) r
  ON d.lon >= r.x0 AND d.lon < r.x1 AND d.lat >= r.y0 AND d.lat < r.y1
ORDER BY d.doc_id, r.rect_id
"""


# ---------------------------------------------------------------------------
# kNN: 3 nearest derived stations per doc, squared-degree metric (the
# SQL-checkable twin of the haversine kNN stage; ties by station_id)
# ---------------------------------------------------------------------------

def docs_knn_stations(sf_dir: str, k: int = 3):
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    st = _nation_stations(nation)
    st_ref = ray.put(st.to_numpy())

    ds = _read(sf_dir, "documents", ["doc_id"])

    def nn(batch: pa.Table) -> pa.Table:
        S = ray.get(st_ref)  # station_id, slon, slat
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        dx = lon[:, None] - S[None, :, 1]
        dy = lat[:, None] - S[None, :, 2]
        d2 = dx * dx + dy * dy
        sid = S[:, 0].astype(np.int64)
        order = np.lexsort((np.broadcast_to(sid, d2.shape), d2), axis=1)[:, :k]
        top_sid = sid[order]
        top_d2 = np.take_along_axis(d2, order, axis=1)
        n = len(did)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(did, k), type=pa.int64()),
                "knn_rank": pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), n)),
                "station_id": pa.array(top_sid.ravel(), type=pa.int64()),
                "dist2": pa.array(top_d2.ravel(), type=pa.float64()),
            }
        )

    df = ds.map_batches(nn, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "knn_rank"]).reset_index(drop=True)


DOCS_KNN_STATIONS_SQL = f"""
SELECT doc_id, CAST(rn AS BIGINT) AS knn_rank, station_id, dist2
FROM (
  SELECT d.doc_id, s.station_id,
         (d.lon - s.slon)*(d.lon - s.slon) + (d.lat - s.slat)*(d.lat - s.slat) AS dist2,
         row_number() OVER (
           PARTITION BY d.doc_id
           ORDER BY (d.lon - s.slon)*(d.lon - s.slon) + (d.lat - s.slat)*(d.lat - s.slat), s.station_id
         ) AS rn
  FROM (SELECT doc_id, {DOC_LON_SQL} AS lon, {DOC_LAT_SQL} AS lat FROM documents) d
  CROSS JOIN ({STATIONS_SQL}) s
) WHERE rn <= 3 ORDER BY doc_id, rn
"""


# ---------------------------------------------------------------------------
# ANN: brute-force cosine top-k against a broadcast query vector, with
# integer-quantized dot products so the SQL oracle is bit-exact
# ---------------------------------------------------------------------------

def _quantized_embeddings(batch: pa.Table) -> np.ndarray:
    emb = batch["embedding"].combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    dim = len(flat) // max(n, 1)
    return sql_round(flat * 1_000_000.0).astype(np.int64).reshape(n, dim)


def ann_topk_cosine(sf_dir: str, k: int = 10):
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # query vector = embedding of vec_id 0: one direct metadata-pruned
    # read (a ds.filter(python-lambda) scanned the table row by row)
    q_full = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    q_row = q_full.filter(pc.equal(q_full["vec_id"], 0))
    q = sql_round(np.asarray(q_row["embedding"][0].as_py(), dtype=np.float64) * 1_000_000.0).astype(np.int64)
    q_ref = ray.put(q)

    def score_topk(batch: pa.Table) -> pa.Table:
        # per-block partial top-k: ship k rows per block to the driver
        # merge instead of all-to-all sorting the whole table for 10 rows
        qv = ray.get(q_ref)
        E = _quantized_embeddings(batch)
        num = E @ qv  # exact int64
        den1 = (E * E).sum(axis=1)
        den0 = int(qv @ qv)
        cos = num.astype(np.float64) / (np.sqrt(den1.astype(np.float64)) * np.sqrt(np.float64(den0)))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        part = np.argpartition(-cos, kk - 1)[:kk] if kk < len(cos) else np.arange(len(cos))
        return pa.table(
            {"vec_id": pa.array(ids[part]), "cos_sim": pa.array(cos[part], type=pa.float64())}
        )

    partials = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    top = partials.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
    return top.reset_index(drop=True)


ANN_TOPK_SQL = """
WITH flat AS (
  SELECT vec_id, i, CAST(round(CAST(embedding[i] AS DOUBLE)*1000000) AS BIGINT) AS v
  FROM embeddings, range(1, 65) t(i)
), q AS (
  SELECT i, v FROM flat WHERE vec_id = 0
), den0 AS (
  SELECT SUM(v*v) AS d0 FROM q
), dots AS (
  SELECT f.vec_id, SUM(f.v*q.v) AS num, SUM(f.v*f.v) AS den1
  FROM flat f JOIN q USING (i) GROUP BY f.vec_id
)
SELECT vec_id,
       CAST(num AS DOUBLE)/(sqrt(CAST(den1 AS DOUBLE))*sqrt(CAST(d0 AS DOUBLE))) AS cos_sim
FROM dots, den0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# embedding near-dup pairs within label buckets (the LSH-bucketed shape:
# label plays the bucket role; real LSH variant lives in stages/dedup.py)
# ---------------------------------------------------------------------------

# threshold chosen from the synthetic embedding geometry: max intra-label
# cosine is ~0.475, p99 ~0.295 — 0.30 keeps the result non-trivial but small
NEARDUP_TAU = 0.30


def embed_neardup_pairs(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def per_label(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        E = sql_round(np.stack(g["embedding"].to_numpy()).astype(np.float64) * 1_000_000.0).astype(np.int64)
        num = E @ E.T
        den = np.sqrt((E * E).sum(axis=1).astype(np.float64))
        cos = num.astype(np.float64) / (den[:, None] * den[None, :])
        ii, jj = np.nonzero(np.triu(cos >= NEARDUP_TAU, k=1))
        vid = g["vec_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "vec_a": vid[ii],
                "vec_b": vid[jj],
                "label": g["label"].to_numpy()[ii].astype(np.int64),
                "cos_sim": cos[ii, jj],
            }
        )

    df = ds.groupby("label").map_groups(per_label, batch_format="pandas").to_pandas()
    if df.empty:
        df = pd.DataFrame({"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
                           "label": pd.Series(dtype="int64"), "cos_sim": pd.Series(dtype="float64")})
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


EMBED_NEARDUP_SQL = f"""
WITH flat AS (
  SELECT vec_id, label, i, CAST(round(CAST(embedding[i] AS DOUBLE)*1000000) AS BIGINT) AS v
  FROM embeddings, range(1, 65) t(i)
), dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         SUM(a.v*b.v) AS num
  FROM flat a JOIN flat b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id, a.label
), dens AS (
  SELECT vec_id, SUM(v*v) AS den FROM flat GROUP BY vec_id
)
SELECT vec_a, vec_b, CAST(label AS BIGINT) AS label,
       CAST(num AS DOUBLE)/(sqrt(CAST(da.den AS DOUBLE))*sqrt(CAST(db.den AS DOUBLE))) AS cos_sim
FROM dots JOIN dens da ON dots.vec_a = da.vec_id JOIN dens db ON dots.vec_b = db.vec_id
WHERE CAST(num AS DOUBLE)/(sqrt(CAST(da.den AS DOUBLE))*sqrt(CAST(db.den AS DOUBLE))) >= {NEARDUP_TAU}
ORDER BY vec_a, vec_b
"""


# ---------------------------------------------------------------------------
# pedotransfer over derived soil columns (engine registry stage; rounded to
# 6 decimals on both sides — pow/log ulp tolerance)
# ---------------------------------------------------------------------------

def soil_pedotransfer(sf_dir: str):
    from ..functions.soil import pedotransfer_stage

    ds = _read(sf_dir, "part", ["p_partkey"])

    def derive(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        clay = 0.05 + (k % 80).astype(np.float64) / 100.0
        sand0 = 0.05 + ((k * 7) % 50).astype(np.float64) / 100.0
        om = 1.0 + (k % 40).astype(np.float64) / 10.0
        return pa.table({"p_partkey": batch["p_partkey"], "clay": clay, "sand": sand0, "om": om})

    stage = pedotransfer_stage(["ksat", "thetas", "theta33", "theta1500"])
    out = ds.map_batches(derive, batch_format="pyarrow").map_batches(stage, batch_format="pyarrow")
    df = out.to_pandas().sort_values("p_partkey").reset_index(drop=True)
    for c in ("ksat", "thetas", "theta33", "theta1500"):
        # sql_round-based 6 dp == DuckDB round(x,6) even at exactly-
        # representable .5 ties; pandas .round(6) is half-even there
        df[c] = sql_round(df[c].to_numpy(dtype=np.float64) * 1_000_000.0) / 1_000_000.0
    return df.drop(columns=["clay", "sand", "om"])


SOIL_PEDOTRANSFER_SQL = """
WITH s AS (
  SELECT p_partkey,
         0.05 + CAST(p_partkey % 80 AS DOUBLE)/100.0 AS S,
         0.05 + CAST((p_partkey*7) % 50 AS DOUBLE)/100.0 AS C,
         1.0 + CAST(p_partkey % 40 AS DOUBLE)/10.0 AS OM
  FROM part
), t AS (
  SELECT p_partkey, S, C, OM,
         (0.031 - 0.024*S + 0.487*C + 0.006*OM + 0.005*S*OM - 0.013*C*OM + 0.068*S*C) AS t1500t,
         (0.299 - 0.251*S + 0.195*C + 0.011*OM + 0.006*S*OM - 0.027*C*OM + 0.452*S*C) AS t33t,
         (0.078 + 0.278*S + 0.034*C + 0.022*OM - 0.018*S*OM - 0.027*C*OM - 0.584*S*C) AS ts33t
  FROM s
), u AS (
  SELECT p_partkey, S,
         1.14*t1500t - 0.02 AS theta1500,
         t33t + 1.283*t33t*t33t - 0.374*t33t - 0.015 AS theta33,
         1.636*ts33t - 0.107 AS theta_s33
  FROM t
), v AS (
  SELECT p_partkey, theta1500, theta33,
         theta33 + theta_s33 - 0.097*S + 0.043 AS thetas,
         (ln(theta33) - ln(theta1500))/(ln(1500.0) - ln(33.0)) AS lam
  FROM u
)
SELECT p_partkey,
       round(1930.0 * pow(thetas - theta33, 3.0 - lam), 6) AS ksat,
       round(thetas, 6) AS thetas,
       round(theta33, 6) AS theta33,
       round(theta1500, 6) AS theta1500
FROM v ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# S2-RegionCoverer-style adaptive polygon cover (geocell.cover_rect_adaptive):
# interior cells at their coarsest fully-contained resolution, boundary
# cells at res_max. The membership rule is declarative (each cell decides
# from its own bounds + its parent's), so the oracle rebuilds the full
# cover in pure SQL — generate the intersecting index ranges per
# resolution and apply the same rule; no staged twin. Covers are the
# POLYGON side of the join — small by construction — computed inside
# map_batches over the polygon table.
# ---------------------------------------------------------------------------

COVER_RES_MIN = 2
COVER_RES_MAX = 7


def geo_adaptive_cover(sf_dir: str):
    from .. import geocell as G

    nation = _read(sf_dir, "nation", ["n_nationkey"])

    def cover(batch: pa.Table) -> pa.Table:
        rects = _nation_rects(batch.to_pandas())
        frames = []
        for row in rects.itertuples(index=False):  # per-POLYGON loop: the small side
            c, k = G.cover_rect_adaptive(row.x0, row.y0, row.x1, row.y1, COVER_RES_MIN, COVER_RES_MAX)
            res, iy, ix = G.unpack(c)
            frames.append(
                pd.DataFrame(
                    {
                        "rect_id": np.int64(row.rect_id),
                        "res": res,
                        "iy": iy,
                        "ix": ix,
                        "cell": c.astype(np.int64),
                        "kind": np.where(k == 1, "interior", "boundary"),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"rect_id": [], "res": [], "iy": [], "ix": [], "cell": [], "kind": []}
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    df = nation.map_batches(cover, batch_format="pyarrow").to_pandas()
    return df.sort_values(["rect_id", "cell"]).reset_index(drop=True).astype(
        {"rect_id": "int64", "res": "int64", "iy": "int64", "ix": "int64", "cell": "int64"}
    )


GEO_ADAPTIVE_COVER_SQL = f"""
WITH rects AS ({RECTS_SQL}),
grid AS (
  SELECT rect_id, x0, y0, x1, y1, r, 180.0/POWER(2, r) AS size
  FROM rects, UNNEST(range({COVER_RES_MIN}, {COVER_RES_MAX + 1})) AS t(r)
),
cells AS (
  SELECT g.rect_id, g.x0, g.y0, g.x1, g.y1, g.r, g.size, a.iy, b.ix
  FROM grid g,
       UNNEST(range(GREATEST(CAST(FLOOR((g.y0+90.0)/g.size) AS BIGINT), 0),
                    LEAST(CAST(CEIL((g.y1+90.0)/g.size) AS BIGINT), CAST(POWER(2, g.r) AS BIGINT)))) AS a(iy),
       UNNEST(range(GREATEST(CAST(FLOOR((g.x0+180.0)/g.size) AS BIGINT), 0),
                    LEAST(CAST(CEIL((g.x1+180.0)/g.size) AS BIGINT), CAST(POWER(2, g.r+1) AS BIGINT)))) AS b(ix)
),
m AS (
  SELECT rect_id, r, iy, ix,
    ((-180.0 + ix*size) >= x0 AND (-180.0 + ix*size) + size <= x1
     AND (-90.0 + iy*size) >= y0 AND (-90.0 + iy*size) + size <= y1) AS isfull,
    CASE WHEN r > {COVER_RES_MIN} THEN
      ((-180.0 + (ix//2)*(2*size)) >= x0 AND (-180.0 + (ix//2)*(2*size)) + 2*size <= x1
       AND (-90.0 + (iy//2)*(2*size)) >= y0 AND (-90.0 + (iy//2)*(2*size)) + 2*size <= y1)
    ELSE FALSE END AS pfull
  FROM cells
)
SELECT rect_id, CAST(r AS BIGINT) AS res, iy, ix,
       CAST(r*288230376151711744 + iy*536870912 + ix AS BIGINT) AS cell,
       CASE WHEN isfull THEN 'interior' ELSE 'boundary' END AS kind
FROM m WHERE NOT pfull AND (isfull OR r = {COVER_RES_MAX})
ORDER BY rect_id, cell
"""


# ---------------------------------------------------------------------------
# Cover-accelerated spatial join: points probe the broadcast multi-res
# cover once per level (searchsorted multi-match expansion); a hit on an
# INTERIOR cell is a confirmed pair with NO exact geometry test, only
# boundary-cell hits fall through to the exact half-open containment
# check. Each (point, polygon) pair meets by exactly one path (the
# interior cells form an antichain and boundary cells are never under an
# interior ancestor), so no dedup stage. The oracle is the plain
# containment join — the check asserts the accelerated path is EXACT.
# ---------------------------------------------------------------------------

def docs_cover_join(sf_dir: str):
    import ray

    from .. import geocell as G

    nation = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    rects = _nation_rects(nation)
    covers: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    parts: dict[int, list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
    for row in rects.itertuples(index=False):
        c, k = G.cover_rect_adaptive(row.x0, row.y0, row.x1, row.y1, COVER_RES_MIN, COVER_RES_MAX)
        res, _, _ = G.unpack(c)
        for r in np.unique(res):
            m = res == r
            parts.setdefault(int(r), []).append(
                (c[m].view(np.int64), np.full(int(m.sum()), row.rect_id, dtype=np.int64), k[m])
            )
    for r, ps in parts.items():
        cs = np.concatenate([p[0] for p in ps])
        rid = np.concatenate([p[1] for p in ps])
        kd = np.concatenate([p[2] for p in ps])
        o = np.argsort(cs, kind="stable")
        covers[r] = (cs[o], rid[o], kd[o])
    nrid = int(rects["rect_id"].max()) + 1
    bounds = np.zeros((nrid, 4))
    bounds[rects["rect_id"].to_numpy(dtype=np.int64)] = rects[["x0", "y0", "x1", "y1"]].to_numpy()
    ref = ray.put((covers, bounds))

    ds = _read(sf_dir, "documents", ["doc_id"])

    def join(batch: pa.Table) -> pa.Table:
        cov, B = ray.get(ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        out_d, out_r = [], []
        for r, (cs, rid, kd) in cov.items():
            cc = G.cell_of(lon, lat, r).view(np.int64)
            lo = np.searchsorted(cs, cc, "left")
            hi = np.searchsorted(cs, cc, "right")
            n = hi - lo
            if not n.any():
                continue
            pi = np.repeat(np.arange(len(lon)), n)
            flat = np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n) + np.repeat(lo, n)
            rids, kds = rid[flat], kd[flat]
            interior = kds == 1
            bx = B[rids]
            exact = (
                (lon[pi] >= bx[:, 0]) & (lon[pi] < bx[:, 2]) & (lat[pi] >= bx[:, 1]) & (lat[pi] < bx[:, 3])
            )
            keep = interior | exact
            out_d.append(did[pi[keep]])
            out_r.append(rids[keep])
        if not out_d:
            return pa.table({"doc_id": pa.array([], type=pa.int64()), "rect_id": pa.array([], type=pa.int64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
                "rect_id": pa.array(np.concatenate(out_r), type=pa.int64()),
            }
        )

    df = ds.map_batches(join, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "rect_id"]).reset_index(drop=True)


# exactness contract: the accelerated join must equal plain containment
DOCS_COVER_JOIN_SQL = DOCS_RECT_JOIN_SQL


# ---------------------------------------------------------------------------
# Distance (radius) join: every (doc, station) pair within planar radius R.
# Scale plan: stations (the small side) are bucketed into R-sized grid
# cells and broadcast ONCE; each point probes only its 3x3 cell ring
# (cell size == R guarantees ring completeness), then the exact pinned
# predicate dx*dx + dy*dy <= R*R filters candidates. Candidates per point
# are bounded by local station density — never the full station table —
# and nothing shuffles. The DuckDB oracle is the plain cross-join filter,
# so the gate asserts the ring acceleration is EXACT.
# ---------------------------------------------------------------------------

RADIUS_DEG = 8.0


def docs_radius_join(sf_dir: str):
    import ray

    st = _nation_stations(_read(sf_dir, "nation", ["n_nationkey"]).to_pandas())
    cx = np.floor((st["slon"].to_numpy() + 180.0) / RADIUS_DEG).astype(np.int64)
    cy = np.floor((st["slat"].to_numpy() + 90.0) / RADIUS_DEG).astype(np.int64)
    key = cx * 1000 + cy
    o = np.argsort(key, kind="stable")
    idx_ref = ray.put(
        (key[o], st["station_id"].to_numpy(dtype=np.int64)[o],
         st["slon"].to_numpy()[o], st["slat"].to_numpy()[o])
    )
    r2 = RADIUS_DEG * RADIUS_DEG

    def join(batch: pa.Table) -> pa.Table:
        ks, sid, slon, slat = ray.get(idx_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon, lat = doc_lonlat(did)
        px = np.floor((lon + 180.0) / RADIUS_DEG).astype(np.int64)
        py = np.floor((lat + 90.0) / RADIUS_DEG).astype(np.int64)
        out_d, out_s = [], []
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                pk = (px + ox) * 1000 + (py + oy)
                lo = np.searchsorted(ks, pk, "left")
                hi = np.searchsorted(ks, pk, "right")
                n = hi - lo
                if not n.any():
                    continue
                pi = np.repeat(np.arange(len(lon)), n)
                flat = np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n) + np.repeat(lo, n)
                dx = lon[pi] - slon[flat]
                dy = lat[pi] - slat[flat]
                keep = dx * dx + dy * dy <= r2
                out_d.append(did[pi[keep]])
                out_s.append(sid[flat[keep]])
        if not out_d:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "station_id": pa.array([], type=pa.int64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
                "station_id": pa.array(np.concatenate(out_s), type=pa.int64()),
            }
        )

    df = _read(sf_dir, "documents", ["doc_id"]).map_batches(join, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "station_id"]).reset_index(drop=True)


DOCS_RADIUS_JOIN_SQL = f"""
WITH s AS ({STATIONS_SQL}),
d AS (SELECT doc_id, {DOC_LON_SQL} AS lon, {DOC_LAT_SQL} AS lat FROM documents)
SELECT d.doc_id, s.station_id
FROM d, s
WHERE (d.lon - s.slon)*(d.lon - s.slon) + (d.lat - s.slat)*(d.lat - s.slat) <= {RADIUS_DEG * RADIUS_DEG}
ORDER BY d.doc_id, s.station_id
"""


# ---------------------------------------------------------------------------
# Semantic dedup keep-list (SemDeDup shape, Abbas et al. 2023): connected
# components of the EXACT same-label cosine >= tau graph; every embedding
# gets cluster_id = min vec_id of its component (singletons keep their own
# id; the keep-list is vec_id == cluster_id). The pair graph is the
# embed_neardup_pairs definition verbatim, so the oracle rebuilds the SAME
# edges in SQL and closes them with a recursive CTE — a full-value oracle
# for a graph-clustering result, not a rows-only check.
# ---------------------------------------------------------------------------

def embed_semantic_dedup(sf_dir: str):
    import ray.data as rd

    from ..stages.dedup import connected_components_minlabel

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def per_label_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        E = sql_round(np.stack(g["embedding"].to_numpy()).astype(np.float64) * 1_000_000.0).astype(np.int64)
        num = E @ E.T
        den = np.sqrt((E * E).sum(axis=1).astype(np.float64))
        cos = num.astype(np.float64) / (den[:, None] * den[None, :])
        ii, jj = np.nonzero(np.triu(cos >= NEARDUP_TAU, k=1))
        vid = g["vec_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"id_a": vid[ii], "id_b": vid[jj]})

    edges = ds.groupby("label").map_groups(per_label_edges, batch_format="pandas")
    labels = connected_components_minlabel(edges)

    from .joins import hash_join

    vecs = ds.map_batches(
        lambda b: pa.table({"vec_id": b["vec_id"].cast(pa.int64())}), batch_format="pyarrow"
    )
    lab = labels.map_batches(lambda b: b.rename_columns(["vec_id", "_cid"]), batch_format="pyarrow")
    joined = hash_join(vecs, lab, on="vec_id", join_type="left_outer")

    def finalize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return pa.table(
            {
                "vec_id": b["vec_id"],
                "cluster_id": pc2.coalesce(b["_cid"].cast(pa.int64()), b["vec_id"].cast(pa.int64())),
            }
        )

    df = joined.map_batches(finalize, batch_format="pyarrow").to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True).astype({"vec_id": "int64", "cluster_id": "int64"})


EMBED_SEMANTIC_DEDUP_SQL = f"""
WITH RECURSIVE flat AS (
  SELECT vec_id, label, i, CAST(round(CAST(embedding[i] AS DOUBLE)*1000000) AS BIGINT) AS v
  FROM embeddings, range(1, 65) t(i)
), dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         SUM(a.v*b.v) AS num
  FROM flat a JOIN flat b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
), dens AS (
  SELECT vec_id, SUM(v*v) AS den FROM flat GROUP BY vec_id
), pairs AS (
  SELECT vec_a, vec_b FROM dots
  JOIN dens da ON dots.vec_a = da.vec_id JOIN dens db ON dots.vec_b = db.vec_id
  WHERE CAST(num AS DOUBLE)/(sqrt(CAST(da.den AS DOUBLE))*sqrt(CAST(db.den AS DOUBLE))) >= {NEARDUP_TAU}
), edges AS (
  SELECT vec_a AS s, vec_b AS d FROM pairs UNION ALL SELECT vec_b, vec_a FROM pairs
), reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
), comp AS (
  SELECT s AS vec_id, LEAST(MIN(d), s) AS cluster_id FROM reach GROUP BY s
)
SELECT v.vec_id, CAST(COALESCE(c.cluster_id, v.vec_id) AS BIGINT) AS cluster_id
FROM embeddings v LEFT JOIN comp c USING (vec_id) ORDER BY v.vec_id
"""
