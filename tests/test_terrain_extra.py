"""MFD accumulation, one-hop inflow, polygon info, reduce_basins."""

import numpy as np
import pytest

from geospatialtools_ray import synth
from geospatialtools_ray.terrain import kernels as K


def test_mfd_fractions_sum_to_one_or_zero():
    dem, _ = synth.dem_grid("rough", 16)
    f = K.mfd_fractions(dem, 30.0, 1.1)
    tot = f.sum(axis=0)
    has_down = tot > 0
    assert np.allclose(tot[has_down], 1.0, atol=1e-6)
    assert has_down.sum() > 200  # most cells have a downhill neighbor


def test_mfd_accumulate_conservation_and_d8_limit():
    dem, _ = synth.dem_grid("cone", 16)
    # conservation: total accumulated mass at sinks == number of cells
    catch = K.mfd_accumulate(dem, 30.0, 1.1)
    assert catch.min() >= 1.0
    # on a strictly monotone 1-D slope MFD == D8 (single downhill neighbor)
    line = (np.arange(8, dtype=np.float32) * 10).reshape(1, 8)
    c = K.mfd_accumulate(line, 30.0, 1.0)
    assert np.allclose(c[0], np.arange(8, 0, -1, dtype=np.float32))


def test_mfd_matches_bruteforce_recursion_small():
    rng = np.random.default_rng(6)
    dem = rng.uniform(0, 50, (9, 9)).astype(np.float32)

    # literal recursive reference implementation (safe at 9x9)
    import sys

    sys.setrecursionlimit(100000)
    fract = K.mfd_fractions(dem, 30.0, 1.3)
    catch = np.zeros((9, 9), dtype=np.float32)

    def rec(i, j):
        if catch[i, j] > 0:
            return
        catch[i, j] = 1.0
        acc = np.float32(1.0)
        for k, (di, dj) in enumerate(K.POS):
            ii, jj = i + di, j + dj
            if ii < 0 or jj < 0 or ii >= 9 or jj >= 9:
                continue
            if dem[ii, jj] > dem[i, j]:
                rec(ii, jj)
                back = K.POS.index((-di, -dj))
                acc = np.float32(acc + fract[back, ii, jj] * catch[ii, jj])
        catch[i, j] = acc

    for i in range(9):
        for j in range(9):
            rec(i, j)
    got = K.mfd_accumulate(dem, 30.0, 1.3)
    assert np.array_equal(got, catch)


def test_d8_inflow_neighbors():
    dem, _ = synth.dem_grid("plane", 8)
    fdir = K.d8_fdir(dem, 30.0)
    var = np.ones((8, 8))
    inflow = K.d8_inflow_neighbors(var, fdir)
    # conservation: total inflow == number of cells with an in-grid target
    d0, _ = K.d8_downstream_index(fdir)
    assert inflow.sum() == (d0 >= 0).sum()


def test_polygon_info_centroids_and_adjacency():
    polys = np.array(
        [
            [0, 0, 1],
            [0, -9999, 1],
            [2, 2, 1],
        ],
        dtype=np.int64,
    )
    clusters = np.zeros_like(polys)
    info = K.polygon_info(polys, clusters, res=10.0)
    # centroid of polygon 0: cells (0,0),(0,1),(1,0): xs = col*10+5
    assert info["centroid"][0, 0] == pytest.approx((5 + 15 + 5) / 3)
    assert info["centroid"][0, 1] == pytest.approx((5 + 5 + 15) / 3)
    e = {tuple(x) for x in info["edges"]}
    assert (0, 1) in e and (1, 0) in e  # 4-adjacency both directions
    assert (0, 2) in e and (2, 1) in e
    assert (0, 0) in e  # self edges included (reference emits them)
    assert len(info["edge_dist"]) == len(info["edges"])


def test_reduce_basins_reaches_goal():
    # 5 basins in a row, each draining to the next
    basins = np.repeat(np.arange(1, 6), 4).reshape(5, 4)
    ids = np.arange(5)
    nids = np.array([1, 2, 3, 4, -1])
    area = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
    out = K.reduce_basins(basins, ids, nids, area, 3)
    u = np.unique(out)
    assert len(u[u > 0]) == 3
    assert set(u[u > 0]) == {1, 2, 3}  # dense relabel 1..n


def test_reduce_basins_map_matches_grid():
    """The table-only merge twin (used by the distributed paint) must give
    exactly the grid walker's final labels on the real chain inputs."""
    from geospatialtools_ray.pipelines.oracle_fixtures import _reduce_basins_inputs

    bm, ids, nids, areas, goal, _ = _reduce_basins_inputs()
    grid = K.reduce_basins(bm, ids, nids, areas, goal)
    mapping = K.reduce_basins_map(ids, nids, areas, goal)
    want = np.full(bm.shape, -1, dtype=np.int64)
    for old, new in mapping.items():
        want[bm == old] = new
    got = np.where(grid == K.IUNDEF, -1, grid)
    assert np.array_equal(got, want)


def test_basin_count_bisection_converges():
    from geospatialtools_ray.terrain import kernels as K

    dem, mask = synth.dem_grid("twovalley", 32)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    mask = mask.astype(np.int32)
    w = K.fill_pits(z, 30.0)
    area, fdir = K.d8_area(w, mask, 30.0)
    area2 = area.copy()
    area2[mask == 0] = 0.0
    probe = K.basin_probe_oracle(area2, fdir, mask, channel_threshold=8 * 900.0)
    basins = K.basin_count_bisection(probe, float(area2.max()), 30.0, nbasins_goal=4)
    u = np.unique(basins)
    n = int((u > 0).sum())
    assert 2 <= n <= 12  # bisection lands near the goal on a tiny fixture


def test_d8_acc_wipoints_seeded_walks():
    line = (np.arange(8, dtype=np.float32) * 10).reshape(1, 8)[::-1]
    dem = np.tile((np.arange(8, dtype=np.float32)[::-1] * 10), (3, 1))
    dem += np.array([[0.0], [0.5], [1.0]], dtype=np.float32)
    ip = np.full((3, 8), K.IUNDEF, dtype=np.int64)
    ip[0, 0] = 1  # one interest point at the top of row 0
    area, fdir = K.d8_acc_wipoints(dem, np.ones((3, 8), np.int32), ip, 30.0)
    counts = area / (30.0 * 30.0)
    # the walk descends along the row, incrementing 1,2,3,... until the border
    assert counts[0, 0] == 1
    assert counts[0, 1] >= 2
    # unseeded rows carry no accumulation (0 or undef)
    assert np.all((counts[2] <= 0) | (counts[2] == K.UNDEF / 900.0))


def test_remove_pits_simple_drains():
    dem, _ = synth.dem_grid("pit", 24)
    out = K.remove_pits_simple(dem, 30.0)
    # no interior cell is a pit/flat under the sqrt2 slope rule
    n = 24
    for i in range(1, n - 1):
        for j in range(1, n - 1):
            drops = []
            for (di, dj) in K.POS:
                ln = 1.41421356237 * 30.0 if (di and dj) else 30.0
                drops.append((out[i, j] - out[i + di, j + dj]) / ln)
            assert max(drops) > 0, (i, j)


def test_depth2channel_mfd_matches_literal_recursion():
    import sys

    sys.setrecursionlimit(100000)
    o_name = "twovalley"
    dem, mask = synth.dem_grid(o_name, 12)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    mask = mask.astype(np.int32)
    w = K.fill_pits(z, 30.0)
    area, fdir = K.d8_area(w, mask, 30.0)
    ch, _, _ = K.calculate_channels(area, 2 * 900.0, 4 * 900.0, fdir, mask=mask)
    got = K.depth2channel_mfd(ch, mask, 1, w, 30.0)

    # literal recursive reference implementation
    n = 12
    zz = w.astype(np.float32)
    channeldepth = zz.copy()
    channeldepth[channeldepth < 0] = 0.0
    channeldepth[(mask <= 0) | (ch <= 0)] = np.float32(K.UNDEF)
    cd_box = [np.float32(0.0)]

    def slopes_of(i, j):
        s = np.zeros(8, dtype=np.float32)
        for k, (di, dj) in enumerate(K.POS):
            ii, jj = i + di, j + dj
            if 0 <= ii < n and 0 <= jj < n and mask[ii, jj] != 0 and zz[i, j] > zz[ii, jj]:
                ln = np.float32(1.41421356237 * 30.0) if (di and dj) else np.float32(30.0)
                s[k] = (zz[i, j] - zz[ii, jj]) / ln
        return s

    def rec(i, j):
        if mask[i, j] == 0:
            return
        s = slopes_of(i, j)
        ang = np.float32((s ** 1).sum())
        for k, (di, dj) in enumerate(K.POS):
            ii, jj = i + di, j + dj
            if not (0 <= ii < n and 0 <= jj < n):
                continue
            if s[k] == 0.0 or mask[ii, jj] == 0:
                continue
            fract = np.float32(s[k] ** 1) / ang
            if channeldepth[ii, jj] >= 0:
                cd_box[0] = channeldepth[ii, jj]
            else:
                rec(ii, jj)
            if channeldepth[i, j] == np.float32(K.UNDEF):
                channeldepth[i, j] = 0.0
            channeldepth[i, j] = np.float32(channeldepth[i, j] + fract * cd_box[0])
        cd_box[0] = channeldepth[i, j]

    for i in range(n):
        for j in range(n):
            if channeldepth[i, j] == np.float32(K.UNDEF) and mask[i, j] >= 1:
                rec(i, j)
    want = zz - channeldepth
    want[want < 0] = K.UNDEF
    want[mask <= 0] = K.UNDEF
    assert np.array_equal(got, want)


def test_d8_inflow_neighbors_offgrid_targets_guarded():
    # arcgis-decoded fdirs may point off-grid at the border: a west-pointing
    # cell in column 0 must not wrap to the last column, and a south-pointing
    # cell in the last row must not raise (regression for the unguarded
    # d1 >= 0 / d0 < n0 checks)
    fdir = np.full((4, 4), -1, dtype=np.int8)
    west = next(p for p, (di, dj) in enumerate(K.POS) if (di, dj) == (0, -1))
    south = next(p for p, (di, dj) in enumerate(K.POS) if (di, dj) == (1, 0))
    east = next(p for p, (di, dj) in enumerate(K.POS) if (di, dj) == (0, 1))
    fdir[1, 0] = west   # off-grid west
    fdir[3, 2] = south  # off-grid south
    fdir[2, 1] = east   # in-grid: contributes to (2, 2)
    var = np.ones((4, 4), dtype=np.float64)
    out = K.d8_inflow_neighbors(var, fdir)
    assert out.sum() == 1.0
    assert out[2, 2] == 1.0


def test_d8_acc_neighbors_uses_own_variable():
    # the reference accumulates variable(i,j) per upstream neighbor
    # (terrain_tools.f90:505), NOT the neighbor's value: with a
    # non-constant variable the result must equal var * n_upstream
    dem, _ = synth.dem_grid("rough", 8)
    rng = np.random.default_rng(3)
    var = rng.integers(1, 100, size=(8, 8)).astype(np.float64)
    got = K.d8_acc_neighbors(dem.astype(np.float32), 30.0, var)
    counts = K.d8_inflow_neighbors(np.ones((8, 8)), K.d8_fdir_sqrt2(dem.astype(np.float32), 30.0))
    assert np.array_equal(got, var * counts)
    assert not np.array_equal(got, K.d8_inflow_neighbors(var, K.d8_fdir_sqrt2(dem.astype(np.float32), 30.0)))


# ---------------------------------------------------------------------------
# Array-native sparse channel trace: bit-parity with the tuple-dict twin
# (round-4 scale fix: 26.5M candidates at 8192^2 made the dict path run
# tens of minutes on the driver)
# ---------------------------------------------------------------------------


def _cand_from_dense(name, n, thr_cells):
    """Candidates + downstream pointers from a real dense chain."""
    dem, mask = synth.dem_grid(name, n)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    w = K.fill_pits(z.astype(np.float32), 30.0)
    fdir = K.d8_fdir(w, 30.0)
    acc = K.d8_accumulate(fdir)
    area = acc.astype(np.float64) * 900.0
    sel = area > thr_cells * 900.0
    ii, jj = np.nonzero(sel)
    d0, d1 = K.d8_downstream_index(fdir)
    di = np.where(d0[sel] >= 0, d0[sel], -(10 ** 9)).astype(np.int64)
    dj = np.where(d0[sel] >= 0, d1[sel], -(10 ** 9)).astype(np.int64)
    return ii.astype(np.int64), jj.astype(np.int64), area[sel], di, dj


@pytest.mark.parametrize("name,thr_cells,bthr", [("twovalley", 4, 8), ("rough", 2, 6), ("cone", 3, 5)])
def test_sparse_arrays_trace_matches_dict_twin(name, thr_cells, bthr):
    gi, gj, area, di, dj = _cand_from_dense(name, 48, thr_cells)
    assert len(gi) > 20  # fixture actually produces a network
    cand = {(int(a), int(b)): float(c) for a, b, c in zip(gi, gj, area)}
    down = {
        (int(a), int(b)): ((int(x), int(y)) if x > -(10 ** 8) else None)
        for a, b, x, y in zip(gi, gj, di, dj)
    }
    bthr_m2 = bthr * 900.0
    labels, topo = K.calculate_channels_sparse(cand, down, bthr_m2)
    cids, topo2 = K.calculate_channels_sparse_arrays(gi, gj, area, di, dj, bthr_m2)
    assert topo2 == topo
    # representational difference only: the dict twin OMITS never-labeled
    # seeds, the array twin emits explicit 0s — both paint as background
    got = {(int(a), int(b)): int(c) for a, b, c in zip(gi, gj, cids)}
    assert {k: v for k, v in got.items() if v != 0} == {k: v for k, v in labels.items() if v != 0}
    for k, v in labels.items():
        if v == 0:
            assert got[k] == 0


def test_channels_dist_arrays_path_bitexact(ray_session, monkeypatch):
    """Force the arrays path on a small fixture: channels_dist output and
    topology must equal the dict-path run exactly."""
    from geospatialtools_ray.terrain import dist as D
    from geospatialtools_ray.terrain import tiles as T

    n = 32
    dem, mask = synth.dem_grid("twovalley", n)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    w = K.fill_pits(z.astype(np.float32), 30.0)
    fdir = K.d8_fdir(w, 30.0)
    acc = K.d8_accumulate(fdir)
    area = (acc.astype(np.float64) * 900.0).astype(np.float32)
    grids = {"dem": z.astype(np.float32), "demns": w, "landmask": mask.astype(np.int32),
             "fdir": fdir.astype(np.int8), "area": area}
    thr, bthr = 8 * 900.0, 16 * 900.0

    ds1 = T.make_tiles_dataset(grids, 16)
    ch1, topo1 = D.channels_dist(ds1, thr, bthr, n, n)
    g1 = T.collect_grid(ch1, "channels").astype(np.int64)

    monkeypatch.setattr(D, "SPARSE_ARRAYS_MIN", 0)
    ds2 = T.make_tiles_dataset(grids, 16)
    ch2, topo2 = D.channels_dist(ds2, thr, bthr, n, n)
    g2 = T.collect_grid(ch2, "channels").astype(np.int64)

    assert topo2 == topo1
    assert np.array_equal(g2, g1)


def test_channels_dist_no_channels_above_threshold(ray_session):
    """Threshold above every candidate area: zero channel labels. The
    bucket paint must handle the empty label set (round-4 review crash:
    empty bkey_s still entered the bucket loop) and the output must match
    the single-node oracle (all-zero channels, empty topology)."""
    from geospatialtools_ray.terrain import dist as D
    from geospatialtools_ray.terrain import tiles as T

    n = 32
    dem, mask = synth.dem_grid("twovalley", n)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    w = K.fill_pits(z.astype(np.float32), 30.0)
    fdir = K.d8_fdir(w, 30.0)
    acc = K.d8_accumulate(fdir)
    area = (acc.astype(np.float64) * 900.0).astype(np.float32)
    grids = {"dem": z.astype(np.float32), "demns": w, "landmask": mask.astype(np.int32),
             "fdir": fdir.astype(np.int8), "area": area}
    thr = float(area.max()) * 10.0  # nothing qualifies
    want_ch, _, want_topo = K.calculate_channels(area, thr, thr * 2, fdir, mask=mask.astype(np.int32))

    ds = T.make_tiles_dataset(grids, 16)
    chds, topo = D.channels_dist(ds, thr, thr * 2, n, n)
    got = T.collect_grid(chds, "channels").astype(np.int64)
    assert topo == want_topo == {}
    assert np.array_equal(got, want_ch.astype(np.int64))
    assert (got == 0).all()
