"""Group analytics: KMeans determinism, basin/channel/HRU property tables,
HRU creation with sequential-offset reproduction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geospatialtools_ray import synth
from geospatialtools_ray.functions import cluster as C
from geospatialtools_ray.terrain import dist as D
from geospatialtools_ray.terrain import kernels as K
from geospatialtools_ray.terrain import properties as P
from geospatialtools_ray.terrain import tiles as T

N, RES = 32, 30.0


def test_kmeans_deterministic_and_sane():
    rng = np.random.default_rng(2)
    X = np.vstack([rng.normal(0, 0.2, (50, 2)), rng.normal(3, 0.2, (50, 2)), rng.normal((0, 5), 0.2, (50, 2))])
    C1 = C.kmeans_fit(X, 3)
    C2 = C.kmeans_fit(X, 3)
    assert np.array_equal(C1, C2)
    lab = C.kmeans_predict(X, C1)
    # three groups cleanly separated
    assert len(np.unique(lab[:50])) == 1 and len(np.unique(lab[50:100])) == 1 and len(np.unique(lab[100:])) == 1
    assert len(np.unique(lab)) == 3
    # k > n clamps
    assert len(C.kmeans_fit(X[:2], 5)) == 2


def test_cluster_data_stage(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    X = np.vstack([rng.normal(0, 0.3, (500, 2)), rng.normal(5, 0.3, (500, 2))])
    df = pd.DataFrame({"row_id": np.arange(1000), "a": X[:, 0], "b": X[:, 1]})
    ds = rd.from_pandas(df).repartition(4)
    scored, centroids = C.cluster_data_stage(ds, ["a", "b"], nc=2, sample_rate=0.5, id_col="row_id")
    out = scored.to_pandas().sort_values("row_id")
    lab = out["cluster"].to_numpy()
    assert len(np.unique(lab[:500])) == 1 and len(np.unique(lab[500:])) == 1
    assert lab[0] != lab[999]


def terrain_cells(name="twovalley"):
    dem, mask = synth.dem_grid(name, N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    z = z.astype(np.float32)
    mask = mask.astype(np.int32)
    w = K.fill_pits(z, RES)
    area, fdir = K.d8_area(w, mask, RES)
    ch, _, topo = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=mask)
    basins = K.delineate_basins(ch, mask, fdir)
    hand = K.depth2channel(ch, mask, fdir, w.astype(np.float32))
    dx = np.full((N, N), RES, dtype=np.float32)
    slope, _ = K.slope_aspect(w, dx, dx)
    return dict(z=z, mask=mask, w=w, area=area, fdir=fdir, channels=ch, topo=topo, basins=basins, hand=hand, slope=slope)


@pytest.fixture(scope="module")
def tc():
    return terrain_cells()


def cells_ds_from(tc, cols, ray_session=None):
    grids = {
        "basins": tc["basins"].astype(np.int64),
        "channels": tc["channels"].astype(np.int64),
        "hand": tc["hand"],
        "slope": tc["slope"],
        "demns": tc["w"],
    }
    ds = T.make_tiles_dataset({k: grids[k] for k in cols}, 16)
    return P.tiles_to_cells(ds, cols)


def test_basin_properties_match_numpy(ray_session, tc):
    cells = cells_ds_from(tc, ["basins", "demns", "slope"])
    got = P.basin_properties(cells, "basins", ["demns", "slope"])
    for r in got.itertuples():
        m = tc["basins"] == r.bid
        # reference means include sentinels (terrain_tools.py:379-383)
        assert r.demns == pytest.approx(tc["w"][m].astype(np.float64).mean(), rel=1e-12)
        assert r.slope == pytest.approx(tc["slope"][m].astype(np.float64).mean(), rel=1e-12)
        assert r.n_cells == int(m.sum())


def test_channel_properties_match_reference_formula(ray_session, tc):
    cells = cells_ds_from(tc, ["channels", "slope"])
    got = P.channel_properties(cells, tc["topo"], eares=RES * RES)
    assert (got["manning"] == 0.04).all() and (got["width"] == 30.0).all() and (got["bankfull"] == 1.0).all()
    for r in got.itertuples():
        m = tc["channels"] == r.cid
        assert r.slope == pytest.approx(tc["slope"][m].astype(np.float64).mean(), rel=1e-12)
        assert r.length == pytest.approx(m.sum() * RES * RES)
        want_down = tc["topo"].get(int(r.cid), -9999)
        assert r.down_cid == (want_down - 1 if want_down > 0 else -1)


def test_create_hrus_and_properties(ray_session, tc):
    # hillslope stand-in: basins; tiles stand-in: 2 HAND bands
    hillslopes = tc["basins"].copy()
    htiles = np.where(tc["hand"] != np.float32(K.UNDEF), (tc["hand"] > 1.0).astype(np.int64), -9999)
    grids = {
        "hillslopes": hillslopes.astype(np.int64),
        "tiles": htiles,
        "slope": tc["slope"],
        "hand": tc["hand"],
        "demns": tc["w"],
    }
    ds = T.make_tiles_dataset(grids, 16)
    cells = P.tiles_to_cells(ds, list(grids)).filter(
        lambda r: r["hillslopes"] > 0 and r["tiles"] != -9999
    )
    ranges = {"demns": (float(tc["w"].min()), float(tc["w"].max())), "slope": (0.0, float(tc["slope"].max()))}
    hrus = P.create_hrus_grouped(cells, ["demns", "slope"], ranges, nclusters=2).to_pandas()
    assert hrus["hru"].min() == 1
    u = np.sort(hrus["hru"].unique())
    assert np.array_equal(u, np.arange(1, len(u) + 1))  # dense ids from 1
    # determinism
    hrus2 = P.create_hrus_grouped(cells, ["demns", "slope"], ranges, nclusters=2).to_pandas()
    assert hrus.sort_values(["gi", "gj"]).reset_index(drop=True).equals(
        hrus2.sort_values(["gi", "gj"]).reset_index(drop=True)
    )
    # hru properties over the joined cell table
    hru_map = {(int(r.gi), int(r.gj)): int(r.hru) for r in hrus.itertuples()}
    hru_grid = np.full((N, N), -9999, dtype=np.int64)
    for (gi, gj), h in hru_map.items():
        hru_grid[gi, gj] = h
    grids2 = dict(grids)
    grids2["hrus"] = hru_grid
    ds2 = T.make_tiles_dataset(grids2, 16)
    cells2 = P.tiles_to_cells(ds2, ["hrus", "hillslopes", "slope", "hand"], drop_undef_col="hrus")
    props = P.hru_properties(cells2, RES)
    assert len(props) == len(u)
    assert (props["area"] > 0).all()
    for e in props["hand_ecdf"]:
        e = np.asarray(e)
        assert e[0] == 0.0 and e[-1] == pytest.approx(1.0)
        assert (np.diff(e) >= 0).all()


def test_nd_histogram_assign_matches_histogramdd():
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 10, 500)
    b = rng.uniform(-5, 5, 500)
    edges = C.nd_histogram_bins([a, b], [4, 3])
    ids = C.nd_histogram_assign([a, b], edges)
    H, _ = np.histogramdd(np.stack([a, b], axis=1), bins=edges)
    counts = np.bincount(ids, minlength=12).reshape(4, 3)
    assert np.array_equal(counts, H.astype(np.int64))


def test_hillslope_profile_machinery(tc):
    from geospatialtools_ray.terrain import hillslope_props as HP

    hs = K.delineate_hillslopes(tc["channels"], tc["area"], tc["fdir"], tc["mask"])
    # relabel 0 -> skip: use ids > 0 plus the 0 id by shifting (+1 on labeled)
    hs2 = np.where(hs >= 0, hs + 1, hs)
    covs = {"demns": tc["w"], "slope": tc["slope"]}
    df = HP.hillslope_properties_oracle(hs2, tc["hand"], tc["slope"], covs, RES)
    assert len(df) == len(np.unique(hs2[hs2 > 0]))
    assert (df["relief"] > 0).all()
    assert (df["length"] > 0).all()
    assert (df["area"] > 0).all()
    # profile arrays normalized: position/d2c end near 1
    for r in df.itertuples():
        p = np.asarray(r.position_array)
        d = np.asarray(r.d2c_array)
        assert d[0] == 0.0 and d[-1] == pytest.approx(1.0)
        assert (np.diff(np.asarray(r.d2c_array)) >= -1e-9).all()
    # width fit bounds (terrain_tools.py:604-606)
    assert ((df["width_slope"] <= 99) & (df["width_slope"] >= -0.99)).all()
    assert ((df["relief_a"] >= 1) & (df["relief_a"] <= 5)).all()


def test_hillslope_profile_qc_fallback():
    from geospatialtools_ray.terrain import hillslope_props as HP

    # all-zero HAND triggers the reference's QC fallback (:514-519)
    prof = HP.hillslope_profile(np.zeros(5), np.full(5, 0.1), 30.0)
    assert prof["relief"] == 1.5
    assert prof["length"] == 20.0
    assert prof["area"] == 1800.0


def test_fit_relief_recovers_known_params():
    from geospatialtools_ray.terrain import hillslope_props as HP

    x = np.linspace(0.05, 0.95, 40)
    y = 1 - (1 - x**2.0) ** 3.0
    a, b = HP.fit_relief(x, y)
    assert abs(a - 2.0) < 0.05 and abs(b - 3.0) < 0.1


def test_hillslope_properties_dist_matches_profile_oracle(ray_session, tc):
    from geospatialtools_ray.terrain import hillslope_props as HP

    hs = K.delineate_hillslopes(tc["channels"], tc["area"], tc["fdir"], tc["mask"])
    hs2 = np.where(hs >= 0, hs + 1, hs)
    grids = {
        "hillslopes": hs2.astype(np.int64),
        "hand": tc["hand"],
        "slope": tc["slope"],
        "demns": tc["w"],
    }
    ds = T.make_tiles_dataset(grids, 16)
    cells = P.tiles_to_cells(ds, list(grids)).filter(lambda r: r["hillslopes"] > 0)
    got = HP.hillslope_properties_dist(cells, ["demns"], RES)
    want = HP.hillslope_properties_oracle(hs2, tc["hand"], tc["slope"], {"demns": tc["w"]}, RES)
    want = want.sort_values("hid").reset_index(drop=True)
    # profile columns identical (profile math uses only own cells)
    # float32 cell payloads mean-reduce in different precision paths
    # (oracle slices float32 grids; cells arrive upcast) — agree to ~1e-6
    for c in ("relief", "length", "area", "width_slope", "relief_a", "relief_b"):
        assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=1e-5), c
    for a, b in zip(got["d2c_array"], want["d2c_array"]):
        assert np.allclose(a, b, rtol=1e-5)


def test_cluster_hillslopes_weighted_means(tc):
    from geospatialtools_ray.terrain import hillslope_props as HP

    hs = K.delineate_hillslopes(tc["channels"], tc["area"], tc["fdir"], tc["mask"])
    hs2 = np.where(hs >= 0, hs + 1, hs)
    hp = HP.hillslope_properties_oracle(hs2, tc["hand"], tc["slope"], {"demns": tc["w"]}, RES)
    clusters = (hp["hid"].to_numpy() % 2).astype(np.int64)
    out = HP.cluster_hillslopes(hp, clusters, dh=2.0, max_nbands=10, min_nbands=2)
    assert len(out) == len(np.unique(clusters))
    assert out["frac"].sum() == pytest.approx(1.0)
    # weighted mean check for one cluster/column
    m = clusters == 0
    frac = hp["area"][m].to_numpy() / hp["area"][m].sum()
    assert out[out["cluster"] == 0]["relief"].iloc[0] == pytest.approx(float((frac * hp["relief"][m]).sum()))
    assert ((out["nbins"] >= 2) & (out["nbins"] <= 10)).all()
    assert ((out["relief_p0"] >= 1) & (out["relief_p0"] <= 5)).all()
    assert ((out["width_p0"] >= -0.99) & (out["width_p0"] <= 99)).all()


def test_create_hillslope_tiles(tc):
    from geospatialtools_ray.terrain import hillslope_props as HP

    hs = K.delineate_hillslopes(tc["channels"], tc["area"], tc["fdir"], tc["mask"])
    hs2 = np.where(hs >= 0, hs + 1, hs)
    hp = HP.hillslope_properties_oracle(hs2, tc["hand"], tc["slope"], {}, RES)
    clusters01 = (hp["hid"].to_numpy() % 2).astype(np.int64)
    hpc = HP.cluster_hillslopes(hp, clusters01, dh=2.0, max_nbands=4, min_nbands=2)
    # paint cluster ids (1-based) onto the map via the hid->cluster lookup
    lut = dict(zip(hp["hid"].astype(int), clusters01 + 1))
    hc = np.where(hs2 > 0, np.vectorize(lambda v: lut.get(int(v), K.IUNDEF))(hs2), K.IUNDEF)
    tiles, new_hand = HP.create_hillslope_tiles(hc, tc["hand"], hs2, hp, hpc)
    lab = tiles[tiles > 0]
    u = np.sort(np.unique(lab))
    assert u[0] == 1 and len(u) <= int(hpc["nbins"].max())
    assert np.array_equal(u, np.arange(1, len(u) + 1))
    # new_hand rescaled within [0, cluster relief]
    ok = (tiles > 0) & (new_hand != K.UNDEF)
    assert float(new_hand[ok].min()) >= 0.0


def test_curate_hru_properties():
    hru = pd.DataFrame(
        {
            "hillslope_id": [1, 1, 1, 1],
            "tile_id": [1, 1, 2, 2],
            "area": [100.0, 300.0, 200.0, 200.0],
            "depth2channel": [0.5, 0.5, 1.5, 1.5],
            "slope": [0.0] * 4,
        }
    )
    hp = pd.DataFrame({"hid": [1], "length": [100.0], "rwidth": [2.0], "slope": [0.1]})
    out = P.curate_hru_properties(hru, hp)
    # two elevation tiles of base length 50, corrected by sqrt(f1/f0)
    assert out["hillslope_length"].iloc[0] == out["hillslope_length"].iloc[1]
    assert (out["slope"] == 0.1).all()
    assert (np.diff(out["hillslope_position"].unique()) > 0).all()
    assert (out["width_top"] > 0).all() and (out["wspec"] > 0).all()
    # f1 = (0.5, 0.5); f0 from the width profile (1.25, 1.75)/3 ->
    # length corrected by sqrt(f1/f0)
    assert out["hillslope_length"].iloc[0] == pytest.approx(50.0 * np.sqrt(0.5 / (1.25 / 3.0)))


def test_pelletier_paint_down():
    """assign_hillslope_properties_to_hrus: the reference paint-down rule
    (terrain_tools.py:1242-1307) incl. the Pelletier upland/lowland soil
    split — hand-checkable case: relief fit (1,1) makes frelief_inv the
    identity (equal segments), width_p0=0 makes every width 1."""
    hru = pd.DataFrame(
        {
            "hru": np.arange(6),
            "hillslope_id": [1, 1, 1, 2, 2, 2],
            "tile_id": [1, 2, 2, 1, 2, 3],
            "area": [100.0, 60.0, 40.0, 50.0, 50.0, 50.0],
        }
    )
    hp = pd.DataFrame(
        {
            "hid": [1, 2],
            "length": [300.0, 900.0],
            "relief": [30.0, 90.0],
            "relief_p0": [1.0, 1.0],
            "relief_p1": [1.0, 1.0],
            "width_p0": [0.0, 0.0],
            "frac": [0.4, 0.6],
            "ul_mask": [2.0, 1.0],  # hid 1 lowland, hid 2 upland
            "lt_uvt": [5.0, 4.0],
            "uhst": [3.0, 8.0],
            "uhrt": [0.0, 20.0],
        }
    )
    out = P.assign_hillslope_properties_to_hrus(hru, hp)
    h1 = out[out["hillslope_id"] == 1]
    h2 = out[out["hillslope_id"] == 2]
    # lowland: soil 2.0, bedrock = lt_uvt (5.0 > 2.0)
    assert np.allclose(h1["soil_depth"], 2.0)
    assert np.allclose(h1["depth_to_bedrock"], 5.0)
    # upland: linspace(2, 8, 3) / linspace(4, 20, 3) indexed by tile rank
    assert np.allclose(h2["soil_depth"], [2.0, 5.0, 8.0])
    assert np.allclose(h2["depth_to_bedrock"], [4.0, 12.0, 20.0])
    # identity relief fit -> equal segment lengths; unit widths
    assert np.allclose(h1["hillslope_length"], 300.0 / 2)
    assert np.allclose(h2["hillslope_length"], 900.0 / 3)
    assert np.allclose(out["hillslope_width"], 1.0)
    # segment hand = relief * midpoint of the normalized-relief band
    assert np.allclose(h1["hillslope_hand"].iloc[0], 30.0 * 0.25)
    assert np.allclose(h2["hillslope_hand"].to_numpy(), 90.0 * np.array([1, 3, 5]) / 6.0)
    # per-hillslope fractions: hillslope_frac sums to 1, frac to hp.frac
    assert np.isclose(h1["hillslope_frac"].sum(), 1.0)
    assert np.isclose(h2["hillslope_frac"].sum(), 1.0)
    assert np.isclose(h1["frac"].sum(), 0.4)
    assert np.isclose(h2["frac"].sum(), 0.6)
    # within a tile, hillslope_frac splits by HRU area share
    t2 = h1[h1["tile_id"] == 2]
    assert np.isclose(t2["hillslope_frac"].iloc[0] / t2["hillslope_frac"].iloc[1], 60.0 / 40.0)
