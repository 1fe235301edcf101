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
from .. import io

from .. import oracles as O
from ..hashing import splitmix64

UNDEF = np.float32(-9999.0)


def _docs(sf_dir: str, columns):
    return io.read_table_arrow(io.table_path(sf_dir, "documents"), columns=columns).to_pandas()


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

    tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).to_pandas()
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


def stage_ann_lsh_adaptive(sf_dir: str, k: int = 5, n_planes: int = 8) -> str:
    """Single-process twin of the adaptive-budget LSH path: same
    deterministic planes/probing-order helpers (shared pure functions), but
    an independent whole-array bucket count + probe + exact score — no Ray.
    Budget = half the table, the point on the recall curve where the sf0.1
    measurement crosses 0.8 (BASELINE.md)."""
    from ..stages.ann import adaptive_lsh_probes, lsh_codes, random_hyperplanes

    tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).to_pandas()
    E = np.stack([np.asarray(e) for e in tbl["embedding"]]).astype(np.float64)
    ids = tbl["vec_id"].astype("int64").to_numpy()
    Q = E[:3].copy()
    planes = random_hyperplanes(Q.shape[1], n_planes)
    codes = lsh_codes(E, planes).astype(np.int64)
    u, c = np.unique(codes, return_counts=True)
    counts = {int(a): int(b) for a, b in zip(u, c)}
    budget = max(50, len(ids) // 2)
    rows = []
    for qi, probes in enumerate(adaptive_lsh_probes(Q, planes, counts, budget)):
        m = np.isin(codes, np.asarray(probes, dtype=np.int64))
        if not m.any():
            continue
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
    return O.stage_fixture("ann_lsh_adaptive", out)


ANN_LSH_ADAPTIVE_SQL = O.fixture_sql("ann_lsh_adaptive", "query_id, vec_id")


# ---------------------------------------------------------------------------
# kNN (haversine)
# ---------------------------------------------------------------------------

def stage_docs_knn_haversine(sf_dir: str, k: int = 3) -> str:
    from ..stages.knn import haversine_m
    from .textqueries import doc_lonlat

    nat = io.read_table_arrow(io.table_path(sf_dir, "nation"), columns=["n_nationkey"]).to_pandas()
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
    # ONE copy of the chain (kernels.depth2channel — the literal stale-cd
    # reference variant the query itself uses): _hillslope_props_single
    # keeps the profile arrays; this fixture drops them and rounds
    hp = _hillslope_props_single()
    out = hp[[c for c in hp.columns if not c.endswith("_array")]].copy()
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

    n_li = io.table_num_rows(io.table_path(sf_dir, "lineitem"))
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

    tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).to_pandas()
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


# ---------------------------------------------------------------------------
# round 3: single-process twins for the previously pytest-only operators
# (VERDICT r2 item 1). Shared input constructions; the COMPUTE under test is
# independent (single-node kernels / naive loops) unless noted.
# ---------------------------------------------------------------------------

def _grid_ij(N: int):
    gi, gj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    return gi.ravel().astype(np.int64), gj.ravel().astype(np.int64)


def _q_mm(v: np.ndarray) -> np.ndarray:
    """float32 grid -> integer millis (both sides share bit-identical f32)."""
    return np.round(np.asarray(v, dtype=np.float64) * 1000.0).astype(np.int64)


def stage_terrain_mfd_cells(sf_dir: str) -> str:
    """MFD accumulation + MFD HAND over the twovalley chain, single-node
    kernels (src/terrain_tools.f90:517-746 semantics; the distributed ops
    are bit-identical per tests/test_terrain_dist.py)."""
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    w, _, _, ch, _, _, maski = _terrain_single_node(N, RES)
    w32 = w.astype(np.float32)
    mfd = K.mfd_accumulate(w32, RES, 1.1)
    hmfd = K.depth2channel_mfd(ch, maski, 1, w32, RES)
    gi, gj = _grid_ij(N)
    hv = hmfd.ravel()
    valid = hv != np.float32(K.UNDEF)
    out = pd.DataFrame(
        {
            "gi": gi,
            "gj": gj,
            "mfd_mm": _q_mm(mfd.ravel()),
            "handmfd_mm": np.where(valid, _q_mm(hv), 0),
            "hand_valid": valid.astype(np.int64),
        }
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_mfd_cells", out)


TERRAIN_MFD_STATS_SQL = O.fixture_sql("terrain_mfd_cells", "gi, gj")


def polygonize_values_grid(N: int = 32, div: float = 20.0):
    """Shared input: quantized twovalley elevations (UNDEF off-mask).
    div=20 gives the 2-polygon CCL fixture; div=2 the 24-polygon /
    68-edge grid the polygon_info adjacency twins use."""
    from .. import synth
    from ..terrain import kernels as K

    dem, mask = synth.dem_grid("twovalley", N)
    return np.where(mask, np.round(dem.astype(np.float64) / div), float(K.UNDEF)).astype(np.float32)


def stage_terrain_polygonize(sf_dir: str) -> str:
    """Whole-grid scan-order CCL (terrain_tools.f90:1750-1789)."""
    from ..terrain import kernels as K

    N = 32
    v = polygonize_values_grid(N)
    pids = K.polygonize(v.copy())
    gi, gj = _grid_ij(N)
    p = pids.ravel()
    out = pd.DataFrame(
        {"gi": gi, "gj": gj, "pid": np.where(p == K.UNDEF, -1, p).astype(np.int64)}
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_polygonize", out)


TERRAIN_POLYGONIZE_SQL = O.fixture_sql("terrain_polygonize", "gi, gj")


WIPOINT_SEEDS = [(2, 7), (9, 3), (14, 22), (21, 30), (28, 11), (31, 31), (5, 16)]


def stage_terrain_acc_wipoints(sf_dir: str) -> str:
    """Interest-point accumulation, literal sequential walks
    (terrain_tools.f90:303-414)."""
    from .. import synth
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    dem, mask = synth.dem_grid("rough", N)
    dem = dem.astype(np.float32)
    maski = mask.astype(np.int32)
    ip = np.full((N, N), K.IUNDEF, dtype=np.int64)
    for k2, (i, j) in enumerate(WIPOINT_SEEDS):
        ip[i, j] = k2
    area, fdir = K.d8_acc_wipoints(dem, maski, ip, RES)
    gi, gj = _grid_ij(N)
    av = area.ravel()
    valid = av != np.float32(K.UNDEF)
    out = pd.DataFrame(
        {
            "gi": gi,
            "gj": gj,
            "area_mm": np.where(valid, _q_mm(av), -1),
            "fdir": fdir.ravel().astype(np.int64),
        }
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_acc_wipoints", out)


TERRAIN_ACC_WIPOINTS_SQL = O.fixture_sql("terrain_acc_wipoints", "gi, gj")


def stage_terrain_slope_aspect(sf_dir: str) -> str:
    """Slope/aspect with border clamping (terrain_tools.f90:13-54)."""
    from .. import synth
    from ..terrain import kernels as K

    N = 32
    z, _ = synth.dem_grid("rough", N)
    z = z.astype(np.float32)
    dx = np.full((N, N), 30.0, dtype=np.float32)
    dy = np.full((N, N), 31.0, dtype=np.float32)
    s, a = K.slope_aspect(z, dx, dy)
    gi, gj = _grid_ij(N)
    out = pd.DataFrame(
        {
            "gi": gi,
            "gj": gj,
            "slope_um": np.round(s.ravel().astype(np.float64) * 1e6).astype(np.int64),
            "aspect_um": np.round(a.ravel().astype(np.float64) * 1e6).astype(np.int64),
        }
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_slope_aspect", out)


TERRAIN_SLOPE_ASPECT_SQL = O.fixture_sql("terrain_slope_aspect", "gi, gj")


def stage_terrain_acc_neighbors(sf_dir: str) -> str:
    """calculate_d8_acc_neighbors, LITERAL reference semantics
    (terrain_tools.f90:443-515): internal sqrt2 fdir over the raw dem,
    out = variable * n_upstream (the reference accumulates variable(i,j)
    per upstream neighbor, not the neighbor's own value — :505). The
    variable is exact distinct integers in float64 so products are exact
    and order-independent between the whole-grid kernel and the tiled
    scatter."""
    from .. import synth
    from ..terrain import kernels as K

    N = 32
    z, _ = synth.dem_grid("rough", N)
    var = (np.arange(N * N, dtype=np.float64) + 1.0).reshape(N, N)
    accn = K.d8_acc_neighbors(z.astype(np.float32), 30.0, var)
    gi, gj = _grid_ij(N)
    out = pd.DataFrame(
        {"gi": gi, "gj": gj, "accn": accn.ravel().astype(np.int64)}
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_acc_neighbors", out)


TERRAIN_ACC_NEIGHBORS_SQL = O.fixture_sql("terrain_acc_neighbors", "gi, gj")


def acc_pfdir_inputs(N: int = 32, res: float = 30.0):
    """Shared PRESCRIBED-fdir input (the point of calculate_d8_acc_pfdir is
    that fdir arrives from the caller, not an internal derivation): a
    rough-DEM fdir with a nodata patch punched in and a mask hole that
    does not coincide with it — both undef branches of the reference
    (terrain_tools.f90:293-299) get exercised."""
    from .. import synth
    from ..terrain import kernels as K

    z, _ = synth.dem_grid("rough", N)
    fdir = K.d8_fdir(z.astype(np.float32), res).astype(np.int32)
    fdir[0:3, 0:3] = -1
    mask = np.ones((N, N), dtype=np.int32)
    mask[5:9, 20:26] = 0
    return fdir, mask


def stage_terrain_acc_pfdir(sf_dir: str) -> str:
    """calculate_d8_acc_pfdir (terrain_tools.f90:253-301): accumulation on
    a prescribed fdir — identical count/area/undef semantics to
    calculate_d8_acc minus the fdir stage (area = res^2 * count; undef
    where mask==0 or fdir nodata). Counts are exact integers; the f32
    area expression tree mirrors dist.area_from_acc."""
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    fdir, mask = acc_pfdir_inputs(N, RES)
    count = K.d8_accumulate(fdir)
    area = (np.float32(RES) * np.float32(RES) * count.astype(np.float32)).astype(np.float32)
    valid = (mask != 0) & (fdir != -1)
    gi, gj = _grid_ij(N)
    out = pd.DataFrame(
        {
            "gi": gi,
            "gj": gj,
            "area_m2": np.where(valid.ravel(), np.round(area.ravel().astype(np.float64)), -1).astype(np.int64),
        }
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_acc_pfdir", out)


TERRAIN_ACC_PFDIR_SQL = O.fixture_sql("terrain_acc_pfdir", "gi, gj")


def assign_clusters_inputs(N: int = 32):
    """Shared input for the cluster paint-back: synthetic label grid with
    IUNDEF holes + a lookup vector (one entry per label)."""
    from ..terrain import kernels as K

    gi, gj = _grid_ij(N)
    lab = ((gi * 7 + gj * 3) % 11).astype(np.int32).reshape(N, N)
    lab[((gi + gj) % 13 == 0).reshape(N, N)] = K.IUNDEF
    clusters = np.array([(k * k + 1) % 7 for k in range(11)], dtype=np.int64)
    return lab, clusters


def stage_terrain_assign_clusters(sf_dir: str) -> str:
    """assign_clusters paint-back (terrain_tools.f90:1727-1748 /
    kernels.assign_clusters): label-map relabel through a lookup vector,
    IUNDEF holes preserved."""
    from ..terrain import kernels as K

    N = 32
    lab, clusters = assign_clusters_inputs(N)
    painted = K.assign_clusters(lab, clusters)
    gi, gj = _grid_ij(N)
    out = pd.DataFrame(
        {"gi": gi, "gj": gj, "cluster": painted.ravel().astype(np.int64)}
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_assign_clusters", out)


TERRAIN_ASSIGN_CLUSTERS_SQL = O.fixture_sql("terrain_assign_clusters", "gi, gj")


def gap_fill_inputs(N: int = 32):
    """Shared input: deterministic HRU labels with channel gaps punched."""
    from ..hashing import h64
    from ..terrain import kernels as K

    _, _, _, ch, _, _, _ = _terrain_single_node(N, 30.0)
    hr = (h64(np.arange(N * N, dtype=np.uint64), 77) % np.uint64(4)).astype(np.int64) + 1
    hrus = hr.reshape(N, N)
    hrus[ch > 0] = K.IUNDEF
    return hrus, ch


def stage_terrain_gap_fill(sf_dir: str) -> str:
    """3x3 mode gap-fill (terrain_tools.f90:825-876)."""
    from ..terrain import kernels as K

    N = 32
    hrus, ch = gap_fill_inputs(N)
    want = K.gap_fill(hrus.copy(), ch)
    gi, gj = _grid_ij(N)
    out = pd.DataFrame(
        {"gi": gi, "gj": gj, "hru": want.ravel().astype(np.int64)}
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_gap_fill", out)


TERRAIN_GAP_FILL_SQL = O.fixture_sql("terrain_gap_fill", "gi, gj")


def hru_chain_inputs(N: int = 32, RES: float = 30.0):
    """Shared input construction for the HRU chain (twovalley): filled DEM,
    slope, hillslope stand-ins (basins), HAND-band elevation tiles."""
    from ..terrain import kernels as K

    w, _, _, ch, basins, hand, maski = _terrain_single_node(N, RES)
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    hillslopes = basins.astype(np.int64)
    htiles = np.where(hand != np.float32(K.UNDEF), (hand > 1.0).astype(np.int64), -9999)
    return w, slope, hand, hillslopes, htiles


def hru_hp_tables(hillslopes: np.ndarray, hand: np.ndarray):
    """Deterministic per-hillslope parameter tables for the Pelletier
    paint-down (assign) and curate steps — shared by fixture and query.
    relief = max valid HAND per hillslope (order-independent exact)."""
    from ..terrain import kernels as K

    hids = np.sort(np.unique(hillslopes[hillslopes > 0])).astype(np.int64)
    relief = []
    for h in hids:
        hv = hand[hillslopes == h]
        hv = hv[hv != np.float32(K.UNDEF)]
        relief.append(float(hv.astype(np.float64).max()) if len(hv) else 1.0)
    hp1 = pd.DataFrame(
        {
            "hid": hids,
            "length": 100.0 + 10.0 * hids,
            "relief": np.asarray(relief, dtype=np.float64),
            "relief_p0": 2.0,
            "relief_p1": 3.0,
            "width_p0": 0.5,
            "frac": 1.0 / len(hids),
            "ul_mask": 2.0 * (hids % 2).astype(np.float64),
            "lt_uvt": 4.0,
            "uhst": 1.0,
            "uhrt": 6.0,
        }
    )
    hp2 = pd.DataFrame({"hid": hids, "length": 100.0 + 10.0 * hids, "rwidth": 2.0, "slope": 0.1})
    return hp1, hp2


HRU_FLOAT_COLS = (
    "area", "hillslope_slope", "hillslope_length", "hillslope_hand",
    "hillslope_position", "hillslope_width", "hillslope_frac", "frac",
    "soil_depth", "depth_to_bedrock", "slope", "depth2channel",
    "width_top", "width_bottom", "wspec",
)


def finalize_hru_table(props: pd.DataFrame, hillslopes: np.ndarray, hand: np.ndarray) -> pd.DataFrame:
    """assign (Pelletier) + curate over a per-HRU property table, then the
    rounded flat output table — shared single-process post-steps (the
    distribution claim lives upstream: HRU labels + per-HRU stats)."""
    from ..terrain import properties as P

    hp1, hp2 = hru_hp_tables(hillslopes, hand)
    df = props.sort_values("hru").reset_index(drop=True)
    assigned = P.assign_hillslope_properties_to_hrus(df, hp1)
    assigned["depth2channel"] = assigned["hillslope_hand"]
    curated = P.curate_hru_properties(assigned, hp2)
    out = curated.copy()
    # flatten the ecdf/bedges list columns into e0..e10 / b0..b10
    for i in range(11):
        out[f"e{i}"] = [float(np.asarray(v)[i]) for v in out["hand_ecdf"]]
        out[f"b{i}"] = [float(np.asarray(v)[i]) for v in out["hand_bedges"]]
    out = out.drop(columns=["hand_ecdf", "hand_bedges"])
    for c in list(HRU_FLOAT_COLS) + [f"e{i}" for i in range(11)] + [f"b{i}" for i in range(11)]:
        out[c] = out[c].astype("float64").round(6)
    out["hru"] = out["hru"].astype("int64")
    out["hillslope_id"] = out["hillslope_id"].astype("int64")
    out["tile_id"] = out["tile_id"].astype("int64")
    return out.sort_values("hru").reset_index(drop=True)


def stage_terrain_hru_properties(sf_dir: str, nclusters: int = 2) -> str:
    """Single-process HRU chain twin (terrain_tools.py:1090-1313,1524-1579):
    per-(hillslope, elevation-tile) KMeans HRUs with sequential offsets +
    dense rank, per-HRU property table with the 10-bin HAND ecdf, then the
    shared assign (Pelletier upland/lowland) + curate post-steps. The HRU
    labeling and per-HRU stats here are an independent scan-order loop (no
    Ray, no map_groups)."""
    from ..functions.cluster import kmeans_fit, kmeans_predict
    from ..functions.geometry import normalize
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    w, slope, hand, hillslopes, htiles = hru_chain_inputs(N, RES)
    sel = (hillslopes > 0) & (htiles != -9999)
    gi, gj = np.nonzero(sel)  # scan order == (gi, gj) lexsort
    hs = hillslopes[sel]
    ht = htiles[sel]
    wv = w[sel].astype(np.float64)
    sv = slope[sel].astype(np.float64)
    hv = hand[sel]
    lo_w, hi_w = float(wv.min()), float(wv.max())
    hi_s = float(sv.max())
    hru_raw = np.zeros(len(gi), dtype=np.int64)
    run = 1  # reference maxc starts at 1 (terrain_tools.py:1102)
    for (h, t) in sorted(set(zip(hs.tolist(), ht.tolist()))):
        m = (hs == h) & (ht == t)
        X = np.stack([normalize(wv[m], lo_w, hi_w), normalize(sv[m], 0.0, hi_s)], axis=1)
        C = kmeans_fit(X, min(nclusters, int(m.sum())))
        lab = kmeans_predict(X, C).astype(np.int64)
        hru_raw[m] = run + lab
        run += int(lab.max()) + 1
    ids = np.sort(np.unique(hru_raw))
    rank = {int(v): i for i, v in enumerate(ids)}
    hru = np.asarray([rank[int(v)] for v in hru_raw], dtype=np.int64) + 1

    rows = []
    for u in np.sort(np.unique(hru)):
        m = hru == u
        handv = hv[m].astype(np.float64)
        ok = handv != K.UNDEF
        if ok.sum() == 0:
            handv = np.zeros_like(handv)
        else:
            handv = np.where(ok, handv, handv[ok].mean())
        hist, bedges = np.histogram(handv, bins=10)
        ecdf = np.cumsum(hist).astype(np.float32)
        ecdf = ecdf / ecdf[-1]
        ecdf = np.append(np.zeros(1, dtype=np.float32), ecdf)
        rows.append(
            {
                "hru": int(u),
                "hillslope_id": int(np.mean(hs[m].astype(np.float64))),
                "tile_id": int(ht[m][0]),
                "area": float(RES * RES * int(m.sum())),
                "hillslope_slope": float(np.mean(sv[m])),
                "hand_ecdf": ecdf.tolist(),
                "hand_bedges": bedges.tolist(),
            }
        )
    out = finalize_hru_table(pd.DataFrame(rows), hillslopes, hand)
    return O.stage_fixture("terrain_hru_properties", out)


TERRAIN_HRU_PROPERTIES_SQL = O.fixture_sql("terrain_hru_properties", "hru")


def stage_terrain_basin_props(sf_dir: str) -> str:
    """Per-basin raw means INCLUDING sentinels (terrain_tools.py:340-392,
    whose own filtering is commented out) over the twovalley chain."""
    N, RES = 32, 30.0
    w, slope, _, hillslopes, _ = hru_chain_inputs(N, RES)
    rows = []
    for b in np.sort(np.unique(hillslopes[hillslopes > 0])):
        m = hillslopes == b
        rows.append(
            {
                "bid": int(b),
                "demns": round(float(w[m].astype(np.float64).mean()), 6),
                "slope": round(float(slope[m].astype(np.float64).mean()), 6),
                "n_cells": int(m.sum()),
            }
        )
    return O.stage_fixture("terrain_basin_props", pd.DataFrame(rows))


TERRAIN_BASIN_PROPS_SQL = O.fixture_sql("terrain_basin_props", "bid")


def stage_terrain_channel_props(sf_dir: str) -> str:
    """Per-channel mean slope / length / constants + 0-based topology
    (terrain_tools.py:1634-1664)."""
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    w, _, _, ch, _, _, maski = _terrain_single_node(N, RES)
    area, fdir = K.d8_area(w, maski, RES)
    ch2, _, topo = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=maski)
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    rows = []
    for c in np.sort(np.unique(ch2[(ch2 > 0) & (ch2 < 999999)])):
        m = ch2 == c
        down = topo.get(int(c), -9999)
        rows.append(
            {
                "cid": int(c),
                "slope": round(float(slope[m].astype(np.float64).mean()), 6),
                "length": float(m.sum()) * RES * RES,
                "manning": 0.04,
                "width": 30.0,
                "bankfull": 1.0,
                "down_cid": down - 1 if down > 0 else -1,
            }
        )
    return O.stage_fixture("terrain_channel_props", pd.DataFrame(rows))


TERRAIN_CHANNEL_PROPS_SQL = O.fixture_sql("terrain_channel_props", "cid")


def stage_events_nd_histogram(sf_dir: str, nbins=(8, 6)) -> str:
    """n-d histogram twin: np.histogramdd over (value, user_id) with the
    same equal-width edges (terrain_tools.py:789-859 generalized); the
    engine's bin-assign + groupby-count must agree on every non-empty bin."""
    from ..functions.cluster import nd_histogram_bins

    df = io.read_table_arrow(io.table_path(sf_dir, "events"), columns=["value", "user_id"]).to_pandas()
    a = df["value"].to_numpy(dtype=np.float64)
    b = df["user_id"].to_numpy(dtype=np.float64)
    edges = nd_histogram_bins([a, b], list(nbins))
    H, _ = np.histogramdd(np.stack([a, b], axis=1), bins=edges)
    flat = H.ravel().astype(np.int64)  # C-order == nd_histogram_assign ids
    nz = np.nonzero(flat)[0]
    out = pd.DataFrame({"bin_id": nz.astype(np.int64), "n": flat[nz]})
    return O.stage_fixture("events_nd_histogram", out)


EVENTS_ND_HISTOGRAM_SQL = O.fixture_sql("events_nd_histogram", "bin_id")


def stage_docs_media_features(sf_dir: str, feature_dim: int = 16) -> str:
    """Single-process twin of the multimodal decode pipeline: per-doc
    naive loop over synth_media_batch payload + ImageDecode fake kernel.
    Like the ANN fixtures, the fake codec itself is shared (it IS the
    stub's definition — no independent formulation exists for a stubbed
    kernel); what the oracle proves is the DISTRIBUTION: actor-pool
    batching, binary column handling, fixed-size-list schema, and result
    completeness across blocks."""
    import pyarrow.parquet as pq

    from ..stages.multimodal import ImageDecode, synth_media_batch

    doc_ids = io.read_table_arrow(io.table_path(sf_dir, "documents"), columns=["doc_id"])["doc_id"].to_pylist()
    dec = ImageDecode(feature_dim=feature_dim, use_fake=True)
    rows = []
    for d in sorted(doc_ids):
        t = synth_media_batch([f"media-{d}"])  # one-doc batch = naive loop
        blob = t["media_bytes"][0].as_py()
        feats = dec._decode_fake(blob)
        rows.append(
            {
                "doc_id": int(d),
                "media_kind": t["media_kind"][0].as_py(),
                "n_bytes": len(blob),
                "width": int(t["width"][0].as_py()),
                "height": int(t["height"][0].as_py()),
                # the stage stores features as float32; sum them in float64
                # exactly as the query's summarize kernel does
                "feat_sum_um": int(round(float(np.asarray(feats, dtype=np.float32).astype(np.float64).sum()) * 1e6)),
            }
        )
    return O.stage_fixture("docs_media_features", pd.DataFrame(rows))


DOCS_MEDIA_FEATURES_SQL = O.fixture_sql("docs_media_features", "doc_id")


# ---------------------------------------------------------------------------
# production-shape terrain chain (VERDICT r3 ask #3: a many-tile layout on
# the driver-hash channel, not the 2x2 of the 32^2/16 fixtures)
# ---------------------------------------------------------------------------

def prod_shape(sf_dir: str) -> tuple[int, int]:
    """(grid N, tile size) for the production-shape chain query: 256^2 DEM
    with 64^2 tiles (a 4x4 = 16-tile layout) at sf0.01 and above; a 96^2 /
    32^2 (3x3 = 9-tile) layout under the cheap sf0.001 smoke gate."""
    import os

    base = os.path.basename(os.path.normpath(sf_dir))
    return (96, 32) if base.endswith("0.001") else (256, 64)


def stage_terrain_chain_prod(sf_dir: str) -> str:
    """Single-node twin of the full D8 chain (fill -> fdir -> acc ->
    channels -> basins -> HAND; src/terrain_tools.f90:171-1725 semantics)
    at the production shape, per-cell quantized — the distributed chain is
    bit-identical f32 on every column, so the compare is exact integers."""
    from ..terrain import kernels as K

    N, _ = prod_shape(sf_dir)
    w, area, fdir, ch, basins, hand, maski = _terrain_single_node(N, 30.0)
    gi, gj = _grid_ij(N)
    hv = hand.ravel()
    valid = hv != np.float32(K.UNDEF)
    out = pd.DataFrame(
        {
            "gi": gi,
            "gj": gj,
            "basin": basins.ravel().astype(np.int64),
            "channel": ch.ravel().astype(np.int64),
            "acc_mm": _q_mm(np.where(area.ravel() == np.float32(K.UNDEF), 0, area.ravel())),
            "hand_mm": np.where(valid, _q_mm(hv), 0),
            "hand_valid": valid.astype(np.int64),
        }
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_chain_prod", out)


TERRAIN_CHAIN_PROD_SQL = O.fixture_sql("terrain_chain_prod", "gi, gj")


# ---------------------------------------------------------------------------
# round 4 (VERDICT r3 ask #8): polygon_info, reduce_basins, bisection
# ---------------------------------------------------------------------------

def stage_terrain_polygon_info(sf_dir: str) -> str:
    """Whole-grid polygon_info (terrain_tools.f90:1791-1858): centroids +
    ordered 4-adjacency with per-edge centroid distance, micro-quantized."""
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    v = polygonize_values_grid(N, div=2.0)
    p = K.polygonize(v.copy())
    polys = np.where(p == K.UNDEF, K.IUNDEF, p).astype(np.int64)
    info = K.polygon_info(polys, np.zeros_like(polys), res=RES)
    e = info["edges"]
    c = info["centroid"]
    out = pd.DataFrame(
        {
            "src": e[:, 0],
            "dst": e[:, 1],
            "dist_um": np.round(info["edge_dist"] * 1e6).astype(np.int64),
            "src_cx_um": np.round(c[e[:, 0], 0] * 1e6).astype(np.int64),
            "src_cy_um": np.round(c[e[:, 0], 1] * 1e6).astype(np.int64),
        }
    ).sort_values(["src", "dst"]).reset_index(drop=True)
    return O.stage_fixture("terrain_polygon_info", out)


TERRAIN_POLYGON_INFO_SQL = O.fixture_sql("terrain_polygon_info", "src, dst")


def _reduce_basins_inputs(N: int = 32, RES: float = 30.0):
    """Shared single-node inputs for the reduce-basins twins: the no-ocean
    channel/basin chain plus the per-basin (ids, nids, areas) table in
    ascending channel-id order (libraries/terrain_tools.py:293-338)."""
    from .. import synth
    from ..terrain import kernels as K

    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    maski = mask.astype(np.int32)
    w = K.fill_pits(z.astype(np.float32), RES)
    area, fdir = K.d8_area(w, maski, RES)
    ch, _, topo = K.calculate_channels(
        area, 8 * RES * RES, 16 * RES * RES, fdir, mask=maski, with_ocean=False
    )
    basins = K.delineate_basins(ch, maski, fdir)
    cids = np.asarray(sorted(topo.keys()), dtype=np.int64)
    ids = cids - 1
    nids = np.asarray([topo[int(c)] - 1 if topo[int(c)] > 0 else -1 for c in cids], dtype=np.int64)
    # domain: cells whose basin label is a channel-segment id; areas exact
    dom = np.isin(basins, cids)
    bm = np.where(dom, basins, K.IUNDEF)
    counts = np.asarray([(bm == c).sum() for c in cids], dtype=np.int64)
    areas = counts.astype(np.float64) * RES * RES
    goal = max(2, len(cids) // 2)
    return bm, ids, nids, areas, goal, topo


def stage_terrain_reduce_basins(sf_dir: str) -> str:
    """Grid-version reduce_basins twin (the distributed query merges on the
    table with reduce_basins_map and paints — different implementation)."""
    from ..terrain import kernels as K

    N = 32
    bm, ids, nids, areas, goal, _ = _reduce_basins_inputs(N)
    out_grid = K.reduce_basins(bm, ids, nids, areas, goal)
    gi, gj = _grid_ij(N)
    rb = out_grid.ravel()
    out = pd.DataFrame(
        {"gi": gi, "gj": gj, "rbasin": np.where(rb == K.IUNDEF, -1, rb).astype(np.int64)}
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_reduce_basins", out)


TERRAIN_REDUCE_BASINS_SQL = O.fixture_sql("terrain_reduce_basins", "gi, gj")


def stage_terrain_basin_bisection(sf_dir: str) -> str:
    """Single-node basin-count bisection (terrain_tools.py:211-253): the
    log-space threshold walk over the oracle channel/basin kernels."""
    from .. import synth
    from ..terrain import kernels as K

    N, RES = 32, 30.0
    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    maski = mask.astype(np.int32)
    w = K.fill_pits(z.astype(np.float32), RES)
    area, fdir = K.d8_area(w, maski, RES)
    area2 = area.copy()
    area2[maski == 0] = 0.0
    probe = K.basin_probe_oracle(area2, fdir, maski, channel_threshold=8 * RES * RES)
    basins = K.basin_count_bisection(probe, float(area2.max()), RES, nbasins_goal=4)
    gi, gj = _grid_ij(N)
    b = basins.ravel()
    out = pd.DataFrame(
        {"gi": gi, "gj": gj, "basin": np.where(b == K.IUNDEF, -1, b).astype(np.int64)}
    ).sort_values(["gi", "gj"]).reset_index(drop=True)
    return O.stage_fixture("terrain_basin_bisection", out)


TERRAIN_BASIN_BISECTION_SQL = O.fixture_sql("terrain_basin_bisection", "gi, gj")


# ---------------------------------------------------------------------------
# cluster_hillslopes (terrain_tools.py:1373-1490): per-cluster weighted
# hillslope characteristics + shared profile refits. The distributed side
# feeds it the hillslope_properties_dist table; this twin recomputes that
# table from the single-node kernel chain (the operator itself is a small
# per-cluster aggregation and runs identically on both inputs).
# ---------------------------------------------------------------------------

CLUSTER_HS_K = 3
CLUSTER_HS_FEATURES = ["relief", "length", "demns"]
CLUSTER_HS_DH, CLUSTER_HS_MAXNB, CLUSTER_HS_MINNB = 5.0, 10, 2


def _hillslope_props_single(N: int = 32, RES: float = 30.0) -> pd.DataFrame:
    """Single-process hillslope property table (arrays kept) — the
    stage_terrain_hillslope_profiles chain without the array drop."""
    from ..terrain import hillslope_props as HP
    from ..terrain import kernels as K

    w, area, fdir, ch, basins, _, maski = _terrain_single_node(N, RES)
    hand = K.depth2channel(ch, maski, fdir, w.astype(np.float32))
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    hs = K.delineate_hillslopes(ch, area, fdir, maski)
    hs2 = np.where(hs >= 0, hs + 1, hs).astype(np.int64)
    rows = []
    for uh in np.unique(hs2[hs2 > 0]):
        m = hs2 == uh
        hvals = hand[m].astype(np.float64)
        svals = slope[m].astype(np.float64)
        dvals = w[m].astype(np.float64)
        order = np.lexsort((svals, hvals))
        prof = HP.hillslope_profile(hvals[order], svals[order], RES)
        rec = {"hid": int(uh)}
        for kk, v in prof.items():
            rec[kk] = v.tolist() if isinstance(v, np.ndarray) else v
        ok = dvals != np.float64(np.float32(K.UNDEF))
        rec["demns"] = float(dvals[ok].mean()) if ok.any() else float(K.UNDEF)
        rows.append(rec)
    return pd.DataFrame(rows).sort_values("hid").reset_index(drop=True)


def cluster_hillslopes_from_hp(hp: pd.DataFrame) -> pd.DataFrame:
    """Shared tail of the query and its fixture: deterministic kmeans on
    ROUNDED features (absorbs last-ulp profile differences between the
    distributed and single-process inputs) -> cluster_hillslopes."""
    from ..functions.cluster import kmeans_fit, kmeans_predict
    from ..terrain import hillslope_props as HP

    hp = hp.sort_values("hid").reset_index(drop=True)
    X = hp[CLUSTER_HS_FEATURES].to_numpy(dtype=np.float64).round(6)
    lo, hi = X.min(axis=0), X.max(axis=0)
    Xn = (X - lo) / np.where(hi > lo, hi - lo, 1.0)
    C = kmeans_fit(Xn, CLUSTER_HS_K)
    clusters = kmeans_predict(Xn, C)
    out = HP.cluster_hillslopes(hp, clusters, CLUSTER_HS_DH, CLUSTER_HS_MAXNB, CLUSTER_HS_MINNB)
    out = out.drop(columns=[c for c in out.columns if c.endswith("_array")], errors="ignore")
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
    out["cluster"] = out["cluster"].astype("int64")
    out["nbins"] = out["nbins"].astype("int64")
    return out.sort_values("cluster").reset_index(drop=True)


def stage_terrain_cluster_hillslopes(sf_dir: str) -> str:
    return O.stage_fixture("terrain_cluster_hillslopes", cluster_hillslopes_from_hp(_hillslope_props_single()))


TERRAIN_CLUSTER_HILLSLOPES_SQL = O.fixture_sql("terrain_cluster_hillslopes", "cluster")


# ---------------------------------------------------------------------------
# raw interleaved corpus (north-rule span-sequence invariant)
# ---------------------------------------------------------------------------

def stage_docs_spans_raw(sf_dir: str) -> str:
    """Stage the deterministic interleaved corpus ITSELF (doc_id, spans —
    the BASELINE.json input_hint schema) as a parquet fixture. Unlike the
    twin fixtures above, the matching oracle SQL does not read a
    precomputed answer: DuckDB recomputes the per-doc span signature from
    the raw list<struct> column with its own list lambda, so the driver's
    hash compare is a genuine cross-engine check of the north rule's
    per-row invariant (span-sequence equality on kind,text,media_ref,
    order)."""
    import pyarrow as pa

    from .. import synth

    n_li = io.table_num_rows(io.table_path(sf_dir, "lineitem"))
    n_docs = max(500, min(4000, n_li // 30))
    batch = synth.make_docs_batch(np.arange(n_docs, dtype=np.uint64))
    return O.stage_fixture_table("docs_spans_raw", pa.table(batch))


def _dense_docs_table(sf_dir: str):
    """The raw interleaved corpus with a DENSE media-ref universe
    (blob_space=509, a prime): at a few thousand docs each media asset is
    referenced ~4-5x across documents, so asset-level dedup over the
    exploded media spans is non-trivial. Same input_hint schema and
    generator as stage_docs_spans_raw; only the ref universe differs."""
    import pyarrow as pa

    from .. import synth

    n_li = io.table_num_rows(io.table_path(sf_dir, "lineitem"))
    n_docs = max(500, min(4000, n_li // 30))
    return pa.table(synth.make_docs_batch(np.arange(n_docs, dtype=np.uint64), blob_space=509))


def stage_docs_spans_dense(sf_dir: str) -> str:
    """Stage the dense-blob corpus as a parquet fixture; the matching
    oracles recompute their answers from this raw parquet with UNNEST —
    cross-engine, not staged twins."""
    return O.stage_fixture_table("docs_spans_dense", _dense_docs_table(sf_dir))


def stage_docs_spans_linked(sf_dir: str) -> str:
    """The interleaved corpus with blob_space=4099: sparse enough that the
    shared-asset doc graph is SUBCRITICAL (hundreds of small multi-doc
    components, max ~73 docs at 4000 docs) — sized so the oracle's
    recursive-CTE closure stays tractable while the engine's distributed
    CC still has real multi-round work."""
    import pyarrow as pa

    from .. import synth

    n_li = io.table_num_rows(io.table_path(sf_dir, "lineitem"))
    n_docs = max(500, min(4000, n_li // 30))
    t = pa.table(synth.make_docs_batch(np.arange(n_docs, dtype=np.uint64), blob_space=4099))
    return O.stage_fixture_table("docs_spans_linked", t)


def stage_docs_media_decode_dedup(sf_dir: str) -> str:
    """Single-process twin of the decode-once composition: a naive loop
    that decodes the payload AT EVERY SPAN OCCURRENCE (exactly the
    repeated work the engine's dedup avoids) and must therefore equal the
    engine's decode-each-distinct-asset-once + hash-join-back result.
    Like stage_docs_media_features, the fake codec is shared (it defines
    the stub); what the twin proves is the composition — distinct-asset
    reduction, actor-pool decode, and join-back completeness at span
    granularity."""
    from collections import Counter

    from ..stages.multimodal import ImageDecode, synth_media_batch

    t = _dense_docs_table(sf_dir)
    dec = ImageDecode(use_fake=True)
    doc_ids = t["doc_id"].to_pylist()
    span_rows = t["spans"].to_pylist()
    fanout = Counter(
        s["media_ref"] for row in span_rows for s in row if s["kind"] == "media"
    )
    rows = []
    for did, row in zip(doc_ids, span_rows):
        for i, s in enumerate(row):
            if s["kind"] != "media":
                continue
            m = synth_media_batch([s["media_ref"]])
            feats = dec._decode_fake(m["media_bytes"][0].as_py())
            f32 = np.asarray(feats, dtype=np.float32).astype(np.float64)
            rows.append(
                {
                    "doc": int(did[4:]),
                    "span_ord": i,
                    "media_ref": s["media_ref"],
                    "media_kind": m["media_kind"][0].as_py(),
                    "n_spans": int(fanout[s["media_ref"]]),
                    "feat_sum_um": int(np.round(f32.sum() * 1e6)),
                }
            )
    out = pd.DataFrame(rows).astype(
        {"doc": "int64", "span_ord": "int32", "n_spans": "int64", "feat_sum_um": "int64"}
    )
    return O.stage_fixture("docs_media_decode_dedup", out.sort_values(["doc", "span_ord"]))


# chr(31)/chr(30) mirror the \x1f field / \x1e record separators used by
# stages/spans.py::span_signature (pc.binary_join_element_wise + binary_join)
DOCS_SPAN_SIGNATURE_SQL = f"""
SELECT doc_id,
       array_to_string(
         list_transform(
           spans,
           s -> s.kind || chr(31) || s.text || chr(31) || s.media_ref
                || chr(31) || CAST(s."offset" AS VARCHAR)),
         chr(30)) AS span_sig
FROM read_parquet('{O.fixture_path("docs_spans_raw")}')
ORDER BY doc_id
"""


def stage_zonal_polys(sf_dir: str, n_poly: int = 200) -> None:
    """Stage the deterministic polygon layer as RAW relational fixtures —
    a closed-edge table (poly_id, x0, y0, x1, y1; all rings flattened,
    exactly the PolygonIndex CSR construction) and a bbox table — so the
    zonal-stats oracle can run point-in-polygon ENTIRELY in SQL with the
    engine's own even-odd crossing expression. This is the first PIP
    proof that is fully cross-engine (the flagship oracle is a staged
    scalar-loop twin)."""
    from .. import synth, wkb

    layer = synth.make_polygons(n_poly, cover_res=6)
    eid, ex0, ey0, ex1, ey1 = [], [], [], [], []
    for i, blob in enumerate(layer["geom_wkb"]):
        for ring in wkb.parse_polygon(blob):
            r = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
            n = len(r) - 1
            eid.append(np.full(n, layer["poly_id"][i], dtype=np.int64))
            ex0.append(r[:-1, 0]); ey0.append(r[:-1, 1])
            ex1.append(r[1:, 0]);  ey1.append(r[1:, 1])
    edges = pd.DataFrame(
        {"poly_id": np.concatenate(eid), "x0": np.concatenate(ex0), "y0": np.concatenate(ey0),
         "x1": np.concatenate(ex1), "y1": np.concatenate(ey1)}
    )
    bb = np.asarray(layer["bbox"], dtype=np.float64).reshape(len(layer["poly_id"]), 4)
    bbox = pd.DataFrame(
        {"poly_id": np.asarray(layer["poly_id"], dtype=np.int64),
         "b0": bb[:, 0], "b1": bb[:, 1], "b2": bb[:, 2], "b3": bb[:, 3]}
    )
    O.stage_fixture("zonal_edges", edges)
    O.stage_fixture("zonal_bbox", bbox)


def stage_ann_pq_topk(sf_dir: str, k: int = 5, m: int = 8, ksub: int = 16, rerank: int = 50) -> str:
    """Single-process twin of the PQ ANN path: the SAME shared pure
    functions (capped deterministic fit sample -> pq_fit codebooks ->
    pq_encode codes+norms -> pq_adc_scores LUT scan -> top-RERANK by
    (adc desc, id asc) -> exact-cosine top-k), replayed whole-array with
    no Ray. Bitwise parity holds because every float step is per-row
    independent of the batch split (LUT matvecs have fixed shapes; the
    gather-accumulate runs in fixed subspace order)."""
    from ..functions.cluster import deterministic_sample_mask, effective_sample_rate
    from ..stages.ann import pq_adc_scores, pq_encode, pq_fit

    tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).to_pandas()
    E = np.stack([np.asarray(e) for e in tbl["embedding"]]).astype(np.float64)
    ids = tbl["vec_id"].astype("int64").to_numpy()
    Q = E[:3].copy()

    rate = effective_sample_rate(len(ids), 0.25, 200_000)
    mask = deterministic_sample_mask(ids, rate)
    order = np.argsort(ids[mask], kind="stable")
    books = pq_fit(E[mask][order], m, ksub)

    codes, norms = pq_encode(E, books)
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    rows = []
    for qi in range(len(Q)):
        adc = pq_adc_scores(Q[qi], books, codes, norms)
        r = min(rerank, len(ids))
        top = np.argpartition(-adc, r - 1)[:r] if r < len(adc) else np.arange(len(adc))
        top = top[np.lexsort((ids[top], -adc[top]))][:r]
        qn = Q[qi] / max(float(np.linalg.norm(Q[qi])), 1e-30)
        cos = En[top] @ qn
        kk = min(k, len(top))
        sel = np.lexsort((ids[top], -cos))[:kk]
        for j in sel:
            rows.append((qi, int(ids[top][j]), round(float(cos[j]), 6)))
    out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim"])
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return O.stage_fixture("ann_pq_topk", out)


ANN_PQ_TOPK_SQL = O.fixture_sql("ann_pq_topk", "query_id, vec_id")


def stage_docs_asset_kcore(sf_dir: str, K: int = 2) -> str:
    """Single-process twin of the k-core peel: same edge construction
    (distinct doc-asset pairs, symmetrized), same parallel peel rule
    (drop ALL nodes with degree < K each round), run whole-array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages import spans

    tbl = _dense_docs_table(sf_dir)
    t = spans.explode_spans(tbl, fields=("media_ref",), kind="media")
    doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    asset = spans.hex8_to_int(t["media_ref"]) + 1_000_000_000
    pairs = pd.DataFrame({"s": doc, "d": asset}).drop_duplicates()
    cur = pd.concat([pairs, pairs.rename(columns={"s": "d", "d": "s"})], ignore_index=True)
    while True:
        deg = cur.groupby("s").size()
        act = deg[deg >= K].index
        nxt = cur[cur["s"].isin(act) & cur["d"].isin(act)]
        if len(nxt) == len(cur):
            break
        cur = nxt
    core = cur.groupby("s").size().rename("core_deg").reset_index().rename(columns={"s": "node"})
    core = core.astype({"node": "int64", "core_deg": "int64"}).sort_values("node").reset_index(drop=True)
    return O.stage_fixture("docs_asset_kcore", core)


DOCS_ASSET_KCORE_SQL = O.fixture_sql("docs_asset_kcore", "node")


def stage_docs_simhash_hamming(sf_dir: str) -> str:
    """Per-doc 64-bit simhash (single-process twin kernel, i64 view); the
    Hamming-pair ORACLE is then fully SQL — a quadratic self-join with
    bit_count(xor(...)) <= T in DuckDB — so the pigeonhole band join's
    candidate generation + verify is checked against an engine-independent
    pair definition (only the sketch kernel is shared, as in
    docs_simhash_buckets)."""
    df = _docs(sf_dir, ["doc_id", "text"])
    rows = [
        (int(d), _u64_to_i64(O.simhash_one(t, 3)))
        for d, t in zip(df["doc_id"].astype("int64"), df["text"])
    ]
    out = pd.DataFrame(rows, columns=["doc_id", "simhash"])
    out = out.sort_values("doc_id").reset_index(drop=True)
    return O.stage_fixture("docs_simhash_hamming", out)


DOCS_SIMHASH_HAMMING_SQL = f"""
WITH h AS (SELECT doc_id, simhash
           FROM read_parquet('{O.fixture_path("docs_simhash_hamming")}'))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""
