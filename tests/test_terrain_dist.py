"""Tiling invariance: every distributed terrain operator must be
bit-identical to the single-node oracle at tile sizes {whole, 16, 8}
(FIXTURES.md F2 rule)."""

import numpy as np
import pytest

from geospatialtools_ray import synth
from geospatialtools_ray.functions import geometry
from geospatialtools_ray.terrain import dist as D
from geospatialtools_ray.terrain import kernels as K
from geospatialtools_ray.terrain import tiles as T

N = 32
RES = 30.0


def fixture_grids(name):
    dem, mask = synth.dem_grid(name, N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    return z.astype(np.float32), mask.astype(np.int32)


def tiles_ds(grids, tile):
    return T.make_tiles_dataset(grids, tile)


def test_tiles_roundtrip(ray_session):
    z, mask = fixture_grids("twovalley")
    tbl = T.grid_to_tiles_table({"dem": z}, 16)
    assert np.array_equal(T.tiles_to_grid(tbl, "dem"), z)
    tbl8 = T.grid_to_tiles_table({"dem": z}, 8)
    assert np.array_equal(T.tiles_to_grid(tbl8, "dem"), z)


def collect(ds, col, dtype=None):
    return T.collect_grid(ds, col, dtype=dtype)


@pytest.mark.parametrize("tile", [32, 16, 8])
@pytest.mark.parametrize("name", ["pit", "twovalley", "masked"])
def test_fill_dist_matches_oracle(ray_session, name, tile):
    z, _ = fixture_grids(name)
    want = K.fill_pits(z, RES)
    ds = tiles_ds({"dem": z}, tile)
    out = D.fill_dist(ds, RES)
    got = collect(out, "demns")
    assert np.array_equal(got, want), f"{name} tile={tile}"


@pytest.mark.parametrize("tile", [16, 8])
def test_slope_aspect_dist_matches_oracle(ray_session, tile):
    z, _ = fixture_grids("rough")
    dx = np.full((N, N), 30.0, dtype=np.float32)
    dy = np.full((N, N), 31.0, dtype=np.float32)
    want_s, want_a = K.slope_aspect(z, dx, dy)
    ds = tiles_ds({"dem": z, "dxg": dx, "dyg": dy}, tile)
    out = D.slope_aspect_dist(ds, N, N)
    got_s = collect(out, "slope")
    got_a = collect(out, "aspect")
    assert np.array_equal(got_s, want_s)
    assert np.array_equal(got_a, want_a)


@pytest.mark.parametrize("tile", [16, 8])
@pytest.mark.parametrize("name", ["twovalley", "masked"])
def test_fdir_acc_dist_matches_oracle(ray_session, name, tile):
    z, mask = fixture_grids(name)
    w = K.fill_pits(z, RES)
    want_fdir = K.d8_fdir(w, RES)
    want_count = K.d8_accumulate(want_fdir)
    ds = tiles_ds({"dem": z, "demns": w, "landmask": mask}, tile)
    fds = D.fdir_dist(ds, RES, N, N)
    got_fdir = collect(fds, "fdir")
    assert np.array_equal(got_fdir, want_fdir), f"{name} tile={tile} fdir"
    ads = D.acc_dist(fds, tile, N, N)
    got_acc = collect(ads, "acc")
    assert np.array_equal(got_acc, want_count), f"{name} tile={tile} acc"
