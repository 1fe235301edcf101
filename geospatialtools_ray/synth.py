"""Deterministic synthetic inputs (FIXTURES.md F1-F4, F6-F8).

Everything here is a pure function of (seed, id) via splitmix64 hashing
(`hashing.py`), so corpus synthesis runs as a stateless `map_batches` over
`ray.data.range(n)` — no driver RNG, no coordination, linearly scalable to
the 10^12-doc regime named in BASELINE.json.

- docs: interleaved text+media+geo span corpus (input_hint schema).
- polygons: convex + L-shaped + overlapping WKB polygons with geocell cover.
- stations: point set with obs series (reference `extract_point_data`,
  libraries/gdal_tools.py:9-34).
- DEM generators: plane / cone / pit / twovalley / masked grids
  (FIXTURES.md F2) for the terrain chain goldens.
"""

from __future__ import annotations

import numpy as np

from . import geocell, wkb
from .hashing import h64, normal01, uniform01

DOC_SEED = 42
POLY_SEED = 11
STATION_SEED = 13
DEM_SEED = 7

# Urban "hotspots" (FIXTURES.md F1): dense Gaussian clusters that create the
# skewed cells the salted groupby must handle (BASELINE.json north_star).
HOTSPOTS = np.array(
    [
        (-74.0, 40.7),  # NYC-ish
        (2.35, 48.85),  # Paris-ish
        (139.7, 35.7),  # Tokyo-ish
    ]
)
HOTSPOT_SIGMA = 0.5  # degrees
HOTSPOT_PROB = 0.5

_WORDS = (
    "the of and to in a is that for on with as by at from river basin slope "
    "terrain water flow channel ridge valley rain soil clay sand model grid "
    "tile index data span media text point polygon station metric depth area"
).split()
_SOURCES = ["web", "wiki", "news", "book"]


def _mix(seed: int, key, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return h64(np.asarray(key, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15), stream)


# ---------------------------------------------------------------------------
# F1: interleaved docs corpus
# ---------------------------------------------------------------------------

def geo_lonlat(keys: np.ndarray, stream: int = 900) -> tuple[np.ndarray, np.ndarray]:
    """Hotspot-mixture point draw, vectorized, deterministic per key."""
    keys = np.asarray(keys, dtype=np.uint64)
    u = uniform01(keys, stream)
    hot = u < HOTSPOT_PROB
    which = (h64(keys, stream + 1) % np.uint64(len(HOTSPOTS))).astype(np.int64)
    lon = np.where(
        hot,
        HOTSPOTS[which, 0] + HOTSPOT_SIGMA * normal01(keys, stream + 2),
        uniform01(keys, stream + 3) * 360.0 - 180.0,
    )
    lat = np.where(
        hot,
        HOTSPOTS[which, 1] + HOTSPOT_SIGMA * normal01(keys, stream + 4),
        uniform01(keys, stream + 5) * 170.0 - 85.0,
    )
    return np.clip(lon, -179.999, 179.999), np.clip(lat, -89.999, 89.999)


def make_docs_batch(doc_ids: np.ndarray, geo_frac: float = 0.2,
                    blob_space: int = 100_000_000) -> dict:
    """Synthesize one batch of interleaved docs (input_hint schema):
    doc_id:string, spans:list<struct<kind,text,media_ref,offset:int32>>.

    geo_frac controls the share of geo spans (default 0.2; the bench's
    scaling corpus uses a geo-heavy variant so the measured work per doc is
    larger without changing synthesis cost).

    blob_space is the size of the media-ref universe (refs are
    ``media://blob/<hash % blob_space:08x>``). The default keeps refs
    effectively unique at test scale; asset-dedup fixtures pass a small
    prime so cross-document media reuse actually occurs. Defaults leave
    every previously-generated corpus bit-identical.

    Returned as a dict of numpy/object arrays ready for `pyarrow.table` /
    Ray Data map_batches output.
    """
    import pyarrow as pa

    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    n = len(doc_ids)
    nspan = 1 + (_mix(DOC_SEED, doc_ids, 1) % np.uint64(8)).astype(np.int64)
    total = int(nspan.sum())

    # flat (doc, span) key space
    doc_rep = np.repeat(doc_ids, nspan)
    span_idx = np.concatenate([np.arange(k) for k in nspan]) if n else np.empty(0, np.int64)
    span_key = doc_rep * np.uint64(64) + span_idx.astype(np.uint64)

    kind_draw = uniform01(span_key, 10)
    # media takes up to 20% but yields to a geo-heavier request (a fixed
    # 0.2 silently capped geo at 0.8 — BENCH_GEO_FRAC=0.9 measured a g80
    # workload labeled g90); for geo_frac <= 0.8 the bands are unchanged,
    # so existing corpora stay bit-identical
    media_cut = min(0.2, max(1.0 - geo_frac, 0.0))
    text_cut = max(1.0 - media_cut - geo_frac, 0.0)
    kind = np.where(kind_draw < text_cut, "text", np.where(kind_draw < text_cut + media_cut, "media", "geo"))

    # payloads are formatted ONLY for the rows of each kind (each is a
    # pure function of span_key, so subsetting first changes nothing);
    # formatting all three for every span tripled the generator's
    # dominant string cost
    text_col = np.full(total, "", dtype=object)
    media_col = np.full(total, "", dtype=object)
    idx_t = np.flatnonzero(kind == "text")
    if idx_t.size:
        # text payload: 3-8 words picked by hash
        kt = span_key[idx_t]
        nw = 3 + (_mix(DOC_SEED, kt, 11) % np.uint64(6)).astype(np.int64)
        wordlist = np.asarray(_WORDS)
        word_cols = [
            wordlist[(_mix(DOC_SEED, kt + np.uint64(j * 131), 12) % np.uint64(len(_WORDS))).astype(np.int64)]
            for j in range(8)
        ]
        word_mat = np.stack(word_cols, axis=1)
        text_col[idx_t] = [" ".join(word_mat[i, : nw[i]]) for i in range(len(idx_t))]
    idx_g = np.flatnonzero(kind == "geo")
    if idx_g.size:
        lon, lat = geo_lonlat(span_key[idx_g])
        text_col[idx_g] = [f"POINT({lo:.6f} {la:.6f})" for lo, la in zip(lon, lat)]
    idx_m = np.flatnonzero(kind == "media")
    if idx_m.size:
        media_col[idx_m] = [
            f"media://blob/{int(k) % blob_space:08x}" for k in _mix(DOC_SEED, span_key[idx_m], 13)
        ]
    offsets = (span_idx * 17 + (_mix(DOC_SEED, span_key, 14) % np.uint64(9)).astype(np.int64)).astype(np.int32)

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(text_col, type=pa.string()),
            pa.array(media_col, type=pa.string()),
            pa.array(offsets, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(nspan, out=list_offsets[1:])
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), span_struct)
    return {
        "doc_id": pa.array([f"doc-{int(d):09d}" for d in doc_ids], type=pa.string()),
        "spans": spans,
    }


def docs_dataset(n_docs: int, *, override_num_blocks: int | None = None, geo_frac: float = 0.2):
    """Interleaved corpus as a Ray Dataset, synthesized inside map_batches."""
    import pyarrow as pa
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(make_docs_batch(ids, geo_frac=geo_frac))

    base = rd.range(n_docs, override_num_blocks=override_num_blocks)
    return base.map_batches(gen, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# F3: polygons
# ---------------------------------------------------------------------------

def make_polygons(n_poly: int, cover_res: int = 6) -> dict:
    """Deterministic polygon layer: ~60% convex (regular-ish k-gons), 20%
    L-shaped (concave), 20% near-duplicates of the previous polygon shifted
    slightly (guaranteed overlapping pairs, pinning last-write-wins burn
    order by ascending poly_id — gdal_rasterize semantics,
    libraries/gdal_tools.py:189)."""
    ids = np.arange(n_poly, dtype=np.uint64)
    # centers from the same hotspot mixture so the join is skewed like docs
    cx, cy = geo_lonlat(ids + np.uint64(7_000_000), stream=700)
    # regional-scale polygons (~3-30 km): keeps the containment multiplicity
    # realistic (~1-2 polygons per point) instead of a synthetic 25x row
    # blow-up that just measures string-copy memory bandwidth
    radius = 0.03 + uniform01(ids, 701) * 0.25
    kind = uniform01(ids, 702)

    polys, bboxes = [], []
    for i in range(n_poly):
        if i > 0 and kind[i] >= 0.8:  # overlap case: shifted copy of previous
            prev = wkb.parse_polygon(polys[-1])[0]
            ring = prev + np.array([0.3, 0.2]) * radius[i]
            polys.append(wkb.polygon_wkb([ring]))
        elif kind[i] >= 0.6:  # L-shape (concave)
            r = radius[i]
            x, y = cx[i], cy[i]
            ring = np.array(
                [
                    [x - r, y - r],
                    [x + r, y - r],
                    [x + r, y],
                    [x, y],
                    [x, y + r],
                    [x - r, y + r],
                ]
            )
            polys.append(wkb.polygon_wkb([ring]))
        else:  # convex k-gon
            k = 3 + int(_mix(POLY_SEED, ids[i], 703) % np.uint64(6))
            ang = 2 * np.pi * (np.arange(k) / k + uniform01(ids[i : i + 1], 704)[0])
            ring = np.stack([cx[i] + radius[i] * np.cos(ang), cy[i] + radius[i] * np.sin(ang)], axis=1)
            polys.append(wkb.polygon_wkb([ring]))
        bboxes.append(wkb.polygon_bbox(polys[-1]))

    field_value = np.round(uniform01(ids, 705) * 1000.0, 3)
    covers = [
        geocell.cover_bbox(b[0], b[1], b[2], b[3], cover_res) for b in bboxes
    ]
    return {
        "poly_id": np.arange(n_poly, dtype=np.int64),
        "field_value": field_value,
        "geom_wkb": polys,
        "bbox": np.asarray(bboxes, dtype=np.float64).reshape(n_poly, 4),
        "cell_cover": covers,
    }


# ---------------------------------------------------------------------------
# F4: stations
# ---------------------------------------------------------------------------

def make_stations(n_stations: int, nt: int = 8, oob_frac: float = 0.05) -> dict:
    """Station points; a small fraction deliberately out of bounds (the
    reference returns undef for those, libraries/gdal_tools.py:29-30)."""
    ids = np.arange(n_stations, dtype=np.uint64)
    lon, lat = geo_lonlat(ids + np.uint64(3_000_000), stream=800)
    oob = uniform01(ids, 801) < oob_frac
    lon = np.where(oob, 200.0 + uniform01(ids, 802) * 10.0, lon)
    obs = np.stack([normal01(ids, 810 + t) * 2.0 + 10.0 for t in range(nt)], axis=1)
    return {
        "station_id": np.arange(n_stations, dtype=np.int64),
        "lon": lon,
        "lat": lat,
        "obs": obs,
    }


# ---------------------------------------------------------------------------
# F2: DEM generators (numpy grids; tiling into the raster table happens in
# terrain/tiles.py)
# ---------------------------------------------------------------------------

def dem_grid(name: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (dem[ny,nx] float32, mask[ny,nx] bool). mask=False marks
    nodata/ocean cells (the reference's -9999 sentinel,
    src/terrain_tools.f90:22)."""
    yy, xx = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64), indexing="ij")
    mask = np.ones((n, n), dtype=bool)
    noise = normal01(np.arange(n * n, dtype=np.uint64) + np.uint64(DEM_SEED) * np.uint64(1013), 600).reshape(n, n)
    if name == "plane":
        dem = 100.0 + 0.5 * xx + 0.25 * yy
    elif name == "cone":
        c = (n - 1) / 2.0
        dem = 10.0 + np.hypot(xx - c, yy - c)
    elif name == "pit":
        dem = 100.0 + 0.5 * xx + 0.25 * yy
        c = n // 2
        r = max(2, n // 8)
        hole = np.hypot(xx - c, yy - c) < r
        dem = np.where(hole, dem - 20.0, dem)
    elif name == "twovalley":
        # two valleys draining to the x=0 edge, joined by a ridge at y=n/2
        ridge = np.abs(yy - (n - 1) / 2.0)
        dem = 50.0 + 0.8 * xx + 0.6 * (np.maximum(0.25 * (n - 1) - ridge, 0) + np.maximum(ridge - 0.25 * (n - 1), 0))
        dem = dem + 0.01 * noise
    elif name == "rough":
        dem = 100.0 + 0.3 * xx + 0.2 * yy + 2.0 * noise
    elif name == "diagonal":
        # adversarial for tiled dataflow: every cell funnels into ONE
        # drainage line along the main diagonal, so the longest dependency
        # chain crosses ~(2 * n/tile) tile boundaries — the worst case for
        # halo-round counts in fill/acc (round-3 scale probe)
        dem = 10.0 + 0.5 * (xx + yy) + 0.05 * np.abs(xx - yy)
    elif name == "masked":
        dem = 100.0 + 0.5 * xx + 0.25 * yy
        mask[:, : max(2, n // 8)] = False  # ocean strip on the west edge
    else:
        raise ValueError(f"unknown DEM fixture {name!r}")
    return dem.astype(np.float32), mask
