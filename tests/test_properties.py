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
    hrus = P.create_hrus_grouped(cells, ["demns", "slope"], ranges, nclusters=2)
    assert hrus["hru"].min() == 1
    u = np.sort(hrus["hru"].unique())
    assert np.array_equal(u, np.arange(1, len(u) + 1))  # dense ids from 1
    # determinism
    hrus2 = P.create_hrus_grouped(cells, ["demns", "slope"], ranges, nclusters=2)
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
