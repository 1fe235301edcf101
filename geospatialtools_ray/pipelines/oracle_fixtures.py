"""Single-process oracle fixtures for the driver queries that SQL alone
cannot express (sketching, LSH, terrain chains, geometry joins).

Pattern (per the round-1 verdict's prescription): each `stage_*` function
computes the query's expected result with an INDEPENDENT single-process
implementation — per-document Python loops from `geospatialtools_ray.
oracles`, single-node terrain kernels from `terrain.kernels`, scalar
point-in-polygon — reading the parquet inputs directly (no Ray), and writes
it to `/tmp/graft_oracle/<name>.parquet`. The query callable stages the
fixture before running its Ray pipeline; the matching `oracle_sql()` entry
reads the fixture (and, where the query is an aggregation, mirrors the
aggregation itself in SQL). The driver's rows+schema+value-hash compare
then proves distributed == single-process.

Determinism notes: every fixture/engine float is either (a) produced by the
same IEEE expression tree on both sides, (b) integer-quantized, or (c)
rounded to 6 decimals on both sides (transcendental-heavy cosine paths).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from .. import oracles as O
from ..hashing import splitmix64

UNDEF = np.float32(-9999.0)


def _docs(sf_dir: str, columns):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=columns).to_pandas()


def _u64_to_i64(v: int) -> int:
    return int(np.uint64(v).view(np.int64))


# ---------------------------------------------------------------------------
# text stages
# ---------------------------------------------------------------------------

def stage_docs_langid(sf_dir: str) -> str:
    df = _docs(sf_dir, ["doc_id", "text", "lang"])
    pred = [O.langid_one(t) for t in df["text"]]
    out = pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"],
            "lang_pred": pred,
            "lang_match": [p == l for p, l in zip(pred, df["lang"])],
        }
    ).sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("docs_langid", out)


DOCS_LANGID_SQL = O.fixture_sql("docs_langid", "doc_id")


def stage_docs_quality(sf_dir: str) -> str:
    df = _docs(sf_dir, ["doc_id", "text"])
    recs = [{"doc_id": int(d), **O.quality_one(t)} for d, t in zip(df["doc_id"], df["text"])]
    out = pd.DataFrame(recs).sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("docs_quality", out)


DOCS_QUALITY_SQL = O.fixture_sql("docs_quality", "doc_id")


def stage_docs_fingerprint(sf_dir: str) -> str:
    df = _docs(sf_dir, ["doc_id", "text"])
    out = pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": [O.token_count_one(t) for t in df["text"]],
            "fingerprint": [_u64_to_i64(O.fingerprint_one(t)) for t in df["text"]],
        }
    ).sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("docs_fingerprint", out)


DOCS_FINGERPRINT_SQL = O.fixture_sql("docs_fingerprint", "doc_id")


# ---------------------------------------------------------------------------
# MinHash-LSH clustering / SimHash buckets
# ---------------------------------------------------------------------------

def _band_hash_one(sig: list[int], band: int, rows_per_band: int) -> int:
    acc = 0
    for c in range(band * rows_per_band, (band + 1) * rows_per_band):
        acc = int(splitmix64(np.uint64((acc + sig[c]) % (1 << 64))))
    return acc


def stage_docs_minhash_dedup(
    sf_dir: str, num_perm: int = 64, bands: int = 16, shingle_k: int = 5, jaccard_threshold: float = 0.7
) -> str:
    df = _docs(sf_dir, ["doc_id", "text"])
    ids = df["doc_id"].astype("int64").to_numpy()
    text_of = dict(zip(ids, df["text"]))
    rows_per_band = num_perm // bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, t in zip(ids, df["text"]):
        # per-doc signature: python gram fold + per-seed vectorized min
        grams = np.asarray(O.gram_hashes_one(t, shingle_k), dtype=np.uint64)
        with np.errstate(over="ignore"):
            sig = [
                int(splitmix64(grams + np.uint64(((i + 1) * 0x9E3779B97F4A7C15) % (1 << 64))).min())
                for i in range(num_perm)
            ]
        for b in range(bands):
            buckets.setdefault((b, _band_hash_one(sig, b, rows_per_band)), []).append(int(d))
    # star + chain pairing per bucket (the engine's pairing policy)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2:
            continue
        for x in ms[1:]:
            pairs.add((ms[0], x))
        for a, b in zip(ms[:-1], ms[1:]):
            if a != b:
                pairs.add((a, b))
    # verify + union-find connected components
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        if O.jaccard_one(text_of[a], text_of[b], shingle_k) >= jaccard_threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    cluster = [find(int(d)) for d in ids]
    out = pd.DataFrame({"doc_id": ids, "cluster_id": np.asarray(cluster, dtype=np.int64)})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("docs_minhash_dedup", out)


DOCS_MINHASH_DEDUP_SQL = O.fixture_sql("docs_minhash_dedup", "doc_id")


def stage_docs_simhash_buckets(sf_dir: str, band_bits: int = 16) -> str:
    df = _docs(sf_dir, ["doc_id", "text"])
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    rows = []
    for d, t in zip(df["doc_id"].astype("int64"), df["text"]):
        sh = O.simhash_one(t, 3)
        for b in range(nbands):
            rows.append((int(d), b, (sh >> (b * band_bits)) & mask, _u64_to_i64(sh)))
    out = pd.DataFrame(rows, columns=["doc_id", "band", "band_key", "simhash"])
    out["band"] = out["band"].astype("int32")
    out["band_key"] = out["band_key"].astype("int64")
    out = out.sort_values(["doc_id", "band"]).reset_index(drop=True)
    return O.stage_fixture("docs_simhash_buckets", out)


DOCS_SIMHASH_BUCKETS_SQL = O.fixture_sql("docs_simhash_buckets", "doc_id, band")


# ---------------------------------------------------------------------------
# ANN (LSH-partitioned)
# ---------------------------------------------------------------------------

def stage_ann_lsh_topk(sf_dir: str, k: int = 5, n_planes: int = 6) -> str:
    from ..stages.ann import lsh_codes, random_hyperplanes

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    E = np.stack([np.asarray(e) for e in tbl["embedding"]]).astype(np.float64)
    ids = tbl["vec_id"].astype("int64").to_numpy()
    Q = E[:3].copy()
    planes = random_hyperplanes(Q.shape[1], n_planes)
    qcodes = lsh_codes(Q, planes)
    codes = lsh_codes(E, planes)
    rows = []
    for qi, qc in enumerate(qcodes):
        m = codes == qc
        if not m.any():
            continue
        sub = E[m]
        sid = ids[m]
        En = sub / np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-30)
        qn = Q[qi] / max(np.linalg.norm(Q[qi]), 1e-30)
        s = En @ qn
        kk = min(k, len(sid))
        order = np.lexsort((sid, -s))[:kk]
        for j in order:
            rows.append((qi, int(sid[j]), round(float(s[j]), 6)))
    out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim"])
    out["query_id"] = out["query_id"].astype("int64")
    return O.stage_fixture("ann_lsh_topk", out)


ANN_LSH_TOPK_SQL = O.fixture_sql("ann_lsh_topk", "query_id, vec_id")


# ---------------------------------------------------------------------------
# kNN (haversine)
# ---------------------------------------------------------------------------

def stage_docs_knn_haversine(sf_dir: str, k: int = 3) -> str:
    from ..stages.knn import haversine_m
    from .textqueries import doc_lonlat

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"]).to_pandas()
    skey = nat["n_nationkey"].to_numpy().astype(np.int64)
    slon = ((skey * 137) % 360).astype(np.float64) - 180.0 + 0.5
    slat = ((skey * 73) % 170).astype(np.float64) - 85.0 + 0.5
    df = _docs(sf_dir, ["doc_id"])
    did = df["doc_id"].astype("int64").to_numpy()
    lon, lat = doc_lonlat(did)
    rows = []
    for i in range(len(did)):
        d = haversine_m(lon[i], lat[i], slon, slat)
        order = np.lexsort((skey, d))[:k]
        for r, j in enumerate(order):
            rows.append((int(did[i]), float(lon[i]), float(lat[i]), r, int(skey[j]), round(float(d[j]), 3)))
    out = pd.DataFrame(rows, columns=["doc_id", "lon", "lat", "knn_rank", "station_id", "station_dist"])
    out["knn_rank"] = out["knn_rank"].astype("int32")
    return O.stage_fixture("docs_knn_haversine", out)


DOCS_KNN_HAVERSINE_SQL = O.fixture_sql("docs_knn_haversine", "doc_id, knn_rank")


# ---------------------------------------------------------------------------
# terrain chain: per-cell fixture + SQL-mirrored aggregation
# ---------------------------------------------------------------------------

def _hand_clean_single(ch: np.ndarray, m: np.ndarray, fdir: np.ndarray, dem32: np.ndarray) -> np.ndarray:
    """Single-node HAND with the engine's CLEAN dead-end semantics
    (terrain/dist.py hand_dist): a cell inherits the channel depth of the
    first positive-depth channel at-or-downstream; walks that dead-end or
    cross mask-0 yield undef (vs the reference's stale-cd artifact that
    kernels.depth2channel reproduces literally). Memoized iterative walk."""
    from ..terrain import kernels as K

    n0, n1 = dem32.shape
    dem = dem32.astype(np.float64)
    cd_own = np.maximum(dem, 0.0)
    is_src = (ch > 0) & (m >= 1) & (cd_own > 0)
    d0, d1 = K.d8_downstream_index(fdir)
    INF = np.inf
    provide = np.full((n0, n1), np.nan)
    provide[is_src] = cd_own[is_src]
    provide[m == 0] = INF
    for i in range(n0):
        for j in range(n1):
            if not np.isnan(provide[i, j]):
                continue
            path = []
            ci, cj = i, j
            while np.isnan(provide[ci, cj]):
                path.append((ci, cj))
                ni, nj = int(d0[ci, cj]), int(d1[ci, cj])
                if ni < 0 or ni >= n0 or nj < 0 or nj >= n1:
                    ci, cj = -1, -1
                    break
                ci, cj = ni, nj
            val = INF if ci < 0 else provide[ci, cj]
            for pi, pj in path:
                provide[pi, pj] = val
    cd = np.where(is_src, cd_own, provide)
    hand = (dem - cd).astype(np.float32)
    hand[~np.isfinite(cd)] = np.float32(K.UNDEF)
    hand[hand < 0] = np.float32(K.UNDEF)
    hand[m <= 0] = np.float32(K.UNDEF)
    return hand


def _terrain_single_node(N: int = 32, RES: float = 30.0):
    """The single-node oracle chain (terrain/kernels.py) on the twovalley
    fixture — the same chain the distributed query runs tiled. HAND uses
    the clean-variant single-node walker above (the distributed engine's
    documented semantics)."""
    from .. import synth
    from ..terrain import kernels as K

    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    z = z.astype(np.float32)
    maski = mask.astype(np.int32)
    w = K.fill_pits(z, RES)
    area, fdir = K.d8_area(w, maski, RES)
    ch, _, _ = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=maski)
    basins = K.delineate_basins(ch, maski, fdir)
    hand = _hand_clean_single(ch, maski, fdir, w.astype(np.float32))
    return w, area, fdir, ch, basins, hand, maski


def stage_terrain_basin_cells(sf_dir: str) -> str:
    from ..terrain import kernels as K

    _, _, _, _, basins, hand, _ = _terrain_single_node()
    sel = basins > 0
    b = basins[sel].astype(np.int64)
    hv = hand[sel]
    valid = hv != np.float32(K.UNDEF)
    hand_mm = np.where(valid, np.round(hv.astype(np.float64) * 1000.0), 0.0).astype(np.int64)
    out = pd.DataFrame({"basin": b, "hand_mm": hand_mm, "hand_valid": valid.astype(np.int64)})
    return O.stage_fixture("terrain_basin_cells", out)


TERRAIN_BASIN_STATS_SQL = f"""
SELECT basin, n_cells, sum_hand_mm,
       CAST(sum_hand_mm AS DOUBLE)/1000.0/CAST(n_cells AS DOUBLE) AS mean_hand
FROM (
  SELECT basin, COUNT(*) AS n_cells,
         CAST(COALESCE(SUM(CASE WHEN hand_valid = 1 THEN hand_mm END), 0) AS BIGINT) AS sum_hand_mm
  FROM read_parquet('{O.fixture_path("terrain_basin_cells")}')
  GROUP BY basin
) ORDER BY basin
"""


def stage_terrain_hillslope_profiles(sf_dir: str) -> str:
    from ..terrain import hillslope_props as HP
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    w, area, fdir, ch, basins, _, maski = _terrain_single_node(N, RES)
    # the profiles query's own chain uses the literal stale-cd reference
    # variant (kernels.depth2channel), so its oracle must too
    hand = K.depth2channel(ch, maski, fdir, w.astype(np.float32))
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    hs = K.delineate_hillslopes(ch, area, fdir, maski)
    hs2 = np.where(hs >= 0, hs + 1, hs).astype(np.int64)
    sel = hs2 > 0
    rows = []
    for uh in np.unique(hs2[sel]):
        m = hs2 == uh
        hvals = hand[m].astype(np.float64)
        svals = slope[m].astype(np.float64)
        dvals = w[m].astype(np.float64)
        # same canonical (hand, slope) ordering as the distributed map_groups
        order = np.lexsort((svals, hvals))
        hvals, svals, dvals = hvals[order], svals[order], dvals[order]
        prof = HP.hillslope_profile(hvals, svals, RES)
        rec = {"hid": int(uh)}
        for kk, v in prof.items():
            if not kk.endswith("_array"):
                rec[kk] = v
        ok = dvals != np.float64(np.float32(K.UNDEF))
        rec["demns"] = float(dvals[ok].mean()) if ok.any() else float(K.UNDEF)
        rows.append(rec)
    out = pd.DataFrame(rows).sort_values("hid").reset_index(drop=True)
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
    return O.stage_fixture("terrain_hillslope_profiles", out)


TERRAIN_HILLSLOPE_PROFILES_SQL = O.fixture_sql("terrain_hillslope_profiles", "hid")


# ---------------------------------------------------------------------------
# flagship spatial join: independent scalar PIP + cell aggregation
# ---------------------------------------------------------------------------

def _point_in_rings_scalar(px: float, py: float, rings) -> bool:
    """Independent scalar even-odd containment (same boundary convention as
    the engine: (y0<=py)!=(y1<=py), px < x-intersection)."""
    inside = False
    for ring in rings:
        r = ring
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        hits = 0
        for i in range(len(r) - 1):
            x0, y0 = float(r[i, 0]), float(r[i, 1])
            x1, y1 = float(r[i + 1, 0]), float(r[i + 1, 1])
            if (y0 <= py) != (y1 <= py):
                xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
                if px < xint:
                    hits += 1
        if hits % 2 == 1:
            inside = not inside
    return inside


def stage_flagship_spatial_join(sf_dir: str, res: int = 6) -> str:
    import re

    from .. import geocell, synth, wkb

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_docs = max(2000, n_li // 30)
    batch = synth.make_docs_batch(np.arange(n_docs, dtype=np.uint64))
    spans = batch["spans"]
    pt_re = re.compile(r"POINT\(([-0-9.eE+]+) ([-0-9.eE+]+)\)")
    lons, lats = [], []
    for i in range(len(spans)):
        for sp in spans[i].as_py():
            if sp["kind"] == "geo":
                m = pt_re.match(sp["text"])
                if m:
                    lons.append(float(m.group(1)))
                    lats.append(float(m.group(2)))
    lons = np.asarray(lons)
    lats = np.asarray(lats)
    layer = synth.make_polygons(200, cover_res=res)
    rings = [wkb.parse_polygon(b) for b in layer["geom_wkb"]]
    bboxes = layer["bbox"]
    hits_per_point = np.zeros(len(lons), dtype=np.int64)
    for pi in range(len(rings)):
        bb = bboxes[pi]
        cand = np.flatnonzero(
            (lons >= bb[0]) & (lons <= bb[2]) & (lats >= bb[1]) & (lats <= bb[3])
        )
        for ci in cand:
            if _point_in_rings_scalar(float(lons[ci]), float(lats[ci]), rings[pi]):
                hits_per_point[ci] += 1
    cells = geocell.cell_of(lons, lats, res).astype(np.uint64)
    dfc = pd.DataFrame({"cell": cells.view(np.int64), "n": hits_per_point})
    agg = dfc[dfc["n"] > 0].groupby("cell", as_index=False)["n"].sum()
    out = pd.DataFrame({"cell": agg["cell"].astype("int64"), "n_hits": agg["n"].astype("int64")})
    out = out.sort_values("cell").reset_index(drop=True)
    return O.stage_fixture("flagship_spatial_join", out)


FLAGSHIP_SPATIAL_JOIN_SQL = O.fixture_sql("flagship_spatial_join", "cell")


def stage_ann_ivf_topk(
    sf_dir: str, k: int = 5, n_lists: int = 8, nprobe: int = 2, sample_rate: float = 0.25, max_sample_rows: int = 200_000
) -> str:
    """Single-process IVF ANN twin: same deterministic KMeans coarse lists
    (shared, order-stable given row order), independent single-process
    assignment + probing + scoring. Mirrors the engine's absolute-row
    sample cap (same float expression -> same hash mask)."""
    from ..functions.cluster import deterministic_sample_mask, effective_sample_rate, kmeans_fit, kmeans_predict

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    E = np.stack([np.asarray(e) for e in tbl["embedding"]]).astype(np.float64)
    ids = tbl["vec_id"].astype("int64").to_numpy()
    Q = E[:3].copy()
    X = E[deterministic_sample_mask(ids, effective_sample_rate(len(ids), sample_rate, max_sample_rows))]
    C = kmeans_fit(X, min(n_lists, len(X)))
    lists = kmeans_predict(E, C)
    qlists = np.argsort(((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)[:, :nprobe]
    rows = []
    for qi in range(len(Q)):
        m = np.isin(lists, qlists[qi])
        sub, sid = E[m], ids[m]
        En = sub / np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-30)
        qn = Q[qi] / max(np.linalg.norm(Q[qi]), 1e-30)
        s = En @ qn
        kk = min(k, len(sid))
        order = np.lexsort((sid, -s))[:kk]
        for j in order:
            rows.append((qi, int(sid[j]), round(float(s[j]), 6)))
    out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim"])
    out["query_id"] = out["query_id"].astype("int64")
    return O.stage_fixture("ann_ivf_topk", out)


ANN_IVF_TOPK_SQL = O.fixture_sql("ann_ivf_topk", "query_id, vec_id")
