"""Property-based tests (hypothesis) for the pure invariants the engine's
correctness rests on: key packing, rounding conventions, codec round-trips,
and the engine/oracle twin definitions. No Ray session needed — these are
all driver-side kernels, so they run in milliseconds and explore corners
the example-based suite can't enumerate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatialtools_ray import geocell, synth, wkb
from geospatialtools_ray.numerics import sql_round

lon_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_st = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
res_st = st.integers(min_value=0, max_value=geocell.MAX_RES)


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=res_st)
def test_geocell_roundtrip_and_bounds(lon, lat, res):
    """pack/unpack round-trips at every legal resolution, and the cell's
    bounds contain the (clamped) point — incl. res 28 near the antimeridian
    (round-4 review: ix's high bit used to leak into iy above res 28)."""
    cell = geocell.cell_of(np.array([lon]), np.array([lat]), res)
    r, iy, ix = geocell.unpack(cell)
    assert int(r[0]) == res
    assert geocell.pack(r, iy, ix)[0] == cell[0]
    lon0, lat0, lon1, lat1 = geocell.cell_bounds(cell)
    cl = min(max(lon, -180.0), np.nextafter(180.0, -np.inf))
    ca = min(max(lat, -90.0), np.nextafter(90.0, -np.inf))
    # tolerance on BOTH ends: (lon+180)/360 loses subnormal-scale bits at
    # the cell boundary (inherent to the float mapping, same on any engine)
    assert lon0[0] - 1e-9 <= cl <= lon1[0] + 1e-9
    assert lat0[0] - 1e-9 <= ca <= lat1[0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=2, max_value=geocell.MAX_RES), up=st.integers(min_value=1, max_value=4))
def test_geocell_parent_contains_child(lon, lat, res, up):
    parent_res = max(res - up, 0)
    child = geocell.cell_of(np.array([lon]), np.array([lat]), res)
    parent = geocell.parent(child, parent_res)
    direct = geocell.cell_of(np.array([lon]), np.array([lat]), parent_res)
    assert parent[0] == direct[0]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.floats(min_value=-1e15, max_value=1e15, allow_nan=False), min_size=1, max_size=8))
def test_sql_round_matches_duckdb(xs):
    """sql_round must equal DuckDB round() on every double COLUMN value —
    the actual oracle contract (a SQL literal like 9.0e14+0.5 parses as
    DECIMAL and rounds differently; the oracle always rounds parquet
    doubles, so the test goes through a registered double column)."""
    import duckdb
    import pandas as pd

    got = sql_round(np.array(xs))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": np.asarray(xs, dtype=np.float64)}))
    want = np.array([r[0] for r in con.execute("SELECT round(x) FROM t").fetchall()])
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.floats(min_value=-180, max_value=180, allow_nan=False, width=32),
                st.floats(min_value=-90, max_value=90, allow_nan=False, width=32),
            ),
            min_size=3,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_wkb_polygon_roundtrip(rings_pts):
    """polygon_wkb -> parse_polygon is the identity on ring coordinates
    (rings are closed by the writer; the parser returns them as written)."""
    rings = [np.asarray([(x, y) for x, y in r], dtype=np.float64) for r in rings_pts]
    out = wkb.parse_polygon(wkb.polygon_wkb(rings))
    assert len(out) == len(rings)
    for got, want in zip(out, rings):
        # writer closes open rings by appending the first vertex
        closed = want if np.array_equal(want[0], want[-1]) else np.vstack([want, want[:1]])
        assert np.array_equal(got, closed)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_token_count_engine_matches_oracle(t):
    """Arrow/RE2 token count == the per-doc oracle twin on arbitrary
    unicode (round-4 review: \\s semantics differed between RE2 and
    Python re)."""
    from geospatialtools_ray.oracles import token_count_one
    from geospatialtools_ray.stages.text import token_count_stage

    batch = pa.table({"text": pa.array([t], type=pa.string())})
    got = token_count_stage()(batch)["n_tokens"][0].as_py()
    assert got == token_count_one(t)


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=4, max_size=64),
    nt_out=st.integers(min_value=1, max_value=4),
)
def test_time_average_block_means(values, nt_out):
    from geospatialtools_ray.functions.timeavg import time_average_values

    v = np.asarray(values)
    out = time_average_values(v, nt_out)
    dt = len(v) // nt_out
    assert len(out) == nt_out
    for k in range(nt_out):
        assert out[k] == pytest.approx(v[k * dt : (k + 1) * dt].mean())


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=40),
    tile=st.sampled_from([4, 8, 16, 64]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_tiles_roundtrip_any_shape(n, tile, seed):
    """grid -> tiles -> grid is the identity for ragged edges and tiles
    larger than the grid, at the payload dtype (round-4 review:
    reassembly silently widened float32 to float64)."""
    from geospatialtools_ray.terrain import tiles as T

    rng = np.random.default_rng(seed)
    g = rng.normal(size=(n, n)).astype(np.float32)
    tbl = T.grid_to_tiles_table({"v": g}, tile)
    back = T.tiles_to_grid(tbl, "v")
    assert back.dtype == np.float32
    assert np.array_equal(back, g)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=50, unique=True))
def test_doc_key_u64_batch_independent(ids):
    """Every doc_id maps to the same u64 key regardless of which other ids
    share its batch (round-4 review: all-or-nothing per-batch fallback)."""
    from geospatialtools_ray.stages.spans import doc_key_u64

    doc_ids = [f"doc-{i:09d}" for i in ids]
    whole = doc_key_u64(pa.array(doc_ids)).to_pylist()
    mixed = doc_key_u64(pa.array(doc_ids + ["not-a-doc-id!"])).to_pylist()[: len(doc_ids)]
    solo = [doc_key_u64(pa.array([d]))[0].as_py() for d in doc_ids]
    assert whole == mixed == solo == [i for i in ids]


@settings(max_examples=25, deadline=None)
@given(
    n_docs=st.integers(min_value=1, max_value=200),
    geo_frac=st.sampled_from([0.0, 0.2, 0.5, 0.9, 1.0]),
)
def test_synth_kind_mix_honest(n_docs, geo_frac):
    """The synthesized span-kind mix tracks the requested geo share within
    sampling noise even above the old 0.8 cap (round-4 review)."""
    b = synth.make_docs_batch(np.arange(n_docs, dtype=np.uint64), geo_frac=geo_frac)
    kinds = pa.table(b)["spans"].combine_chunks().flatten().field("kind").to_pylist()
    if len(kinds) < 50:
        return  # too few spans for a frequency assertion
    share = sum(1 for k in kinds if k == "geo") / len(kinds)
    assert abs(share - geo_frac) < 0.2


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=200),
    probes=st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=100),
    split=st.integers(min_value=0, max_value=200),
)
def test_bloom_no_false_negatives_and_merge(keys, probes, split):
    """BloomFilter invariants the runtime-filter join rests on: (1) every
    inserted key tests positive (no false negatives, any key set); (2) a
    union of two partial filters answers exactly like one bulk-built
    filter (the associative OR-fold's correctness)."""
    from geospatialtools_ray.stages.decontam import BloomFilter

    ka = np.asarray(keys, dtype=np.uint64)
    f = BloomFilter(1 << 12, 5)
    f.add(ka)
    if len(ka):
        assert bool(f.contains(ka).all())
    cut = min(split, len(ka))
    fa, fb = BloomFilter(1 << 12, 5), BloomFilter(1 << 12, 5)
    fa.add(ka[:cut])
    fb.add(ka[cut:])
    merged = fa.union(fb)
    pa_ = np.asarray(probes, dtype=np.uint64)
    assert np.array_equal(merged.contains(pa_), f.contains(pa_))


@given(
    st.floats(min_value=0.2, max_value=5.8),
    st.floats(min_value=-79.0, max_value=79.0),
)
@settings(max_examples=200, deadline=None)
def test_utm_roundtrip_property(lon, lat):
    """Forward->inverse transverse Mercator is the identity to <1e-8 deg
    for any point inside zone 31's validity band (hypothesis-driven)."""
    import numpy as np

    from geospatialtools_ray.functions import crs

    south = lat < 0
    x, y = crs.lonlat_to_utm(np.array([lon]), np.array([lat]), 31, south=south)
    lo, la = crs.utm_to_lonlat(x, y, 31, south=south)
    assert abs(lo[0] - lon) < 1e-8
    assert abs(la[0] - lat) < 1e-8
