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


def full_chain_oracle(name):
    z, mask = fixture_grids(name)
    w = K.fill_pits(z, RES)
    area, fdir = K.d8_area(w, mask, RES)
    thr = 8 * RES * RES
    bthr = 16 * RES * RES
    channels, channels_wob, topo = K.calculate_channels(area, thr, bthr, fdir, mask=mask)
    basins = K.delineate_basins(channels, mask, fdir)
    hand = K.depth2channel(channels, mask, fdir, w.astype(np.float32))
    return dict(z=z, mask=mask, w=w, area=area, fdir=fdir, channels=channels,
                channels_wob=channels_wob, topo=topo, basins=basins, hand=hand)


@pytest.mark.parametrize("tile", [16, 8])
@pytest.mark.parametrize("name", ["twovalley", "masked", "cone"])
def test_channels_basins_hand_dist_match_oracle(ray_session, name, tile):
    o = full_chain_oracle(name)
    ds = T.make_tiles_dataset(
        {"dem": o["z"], "demns": o["w"], "landmask": o["mask"], "fdir": o["fdir"].astype(np.int8),
         "area": o["area"]},
        tile,
    )
    thr = 8 * RES * RES
    bthr = 16 * RES * RES
    chds, topo = D.channels_dist(ds, thr, bthr, N, N)
    got_ch = collect(chds, "channels").astype(np.int64)
    assert np.array_equal(got_ch, o["channels"]), f"{name} tile={tile} channels"
    assert topo == o["topo"], f"{name} tile={tile} topology"
    bds = D.basins_dist(chds, N, N)
    got_b = collect(bds, "basins").astype(np.int64)
    assert np.array_equal(got_b, o["basins"]), f"{name} tile={tile} basins"
    hds = D.hand_dist(bds, N, N)
    got_h = collect(hds, "hand")
    if name == "masked":
        # cells draining into the ocean never reach a channel: the oracle
        # reproduces the reference's stale-cd scan artifact there
        # (terrain_tools.f90:1678-1724), the distributed op returns undef
        # (documented clean semantics). Compare only channel-reaching cells.
        reaches = reaches_channel_mask(o)
        assert np.array_equal(got_h[reaches], o["hand"][reaches]), f"{name} tile={tile} hand"
        assert (got_h[~reaches & (o["mask"] == 1)] == K.UNDEF).all()
    else:
        assert np.array_equal(got_h, o["hand"]), f"{name} tile={tile} hand"


def reaches_channel_mask(o):
    d0, d1 = K.d8_downstream_index(o["fdir"])
    ch = o["channels"]
    out = np.zeros_like(o["mask"], dtype=bool)
    # positive-depth channel cells on the land mask are sources; chase
    for (i, j) in np.argwhere(o["mask"] == 1):
        ci, cj = i, j
        if ch[ci, cj] > 0 and o["mask"][ci, cj] == 1:
            out[i, j] = True
            continue
        for _ in range(10000):
            ni, nj = d0[ci, cj], d1[ci, cj]
            if ni < 0 or o["mask"][ci, cj] == 0:
                break
            if ch[ni, nj] > 0 and o["mask"][ni, nj] == 1 and max(o["w"][ni, nj], 0) > 0:
                out[i, j] = True
                break
            ci, cj = ni, nj
    return out


@pytest.mark.parametrize("tile", [16])
def test_gap_fill_dist_matches_oracle(ray_session, tile):
    o = full_chain_oracle("twovalley")
    rng = np.random.default_rng(1)
    hrus = rng.integers(1, 5, size=(N, N)).astype(np.int64)
    hrus[o["channels"] > 0] = K.IUNDEF
    want = K.gap_fill(hrus, o["channels"])
    ds = T.make_tiles_dataset({"hrus": hrus, "channels": o["channels"]}, tile)
    out = D.gap_fill_dist(ds)
    got = collect(out, "hrus").astype(np.int64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("tile", [16, 8])
def test_polygonize_dist_matches_oracle(ray_session, tile):
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 4, size=(N, N)).astype(np.float64)
    vals[rng.random((N, N)) < 0.1] = K.UNDEF
    want = K.polygonize(vals)
    ds = T.make_tiles_dataset({"values": vals.astype(np.float32)}, tile)
    out = D.polygonize_dist(ds, "values")
    got = collect(out, "pids")
    assert np.array_equal(got, want), f"tile={tile}"


@pytest.mark.parametrize("tile", [16, 8])
@pytest.mark.parametrize("name", ["twovalley", "masked"])
def test_hillslopes_dist_matches_oracle(ray_session, name, tile):
    o = full_chain_oracle(name)
    want = K.delineate_hillslopes(o["channels"], o["area"], o["fdir"], o["mask"])
    ds = T.make_tiles_dataset(
        {"channels": o["channels"].astype(np.int64), "area": o["area"],
         "fdir": o["fdir"].astype(np.int8), "landmask": o["mask"]},
        tile,
    )
    got_cells = D.hillslopes_dist(ds, N, N).to_pandas()
    got = np.full((N, N), K.IUNDEF, dtype=np.int64)
    for r in got_cells.itertuples():
        got[r.gi, r.gj] = r.hillslope
    # cells absent from the network decomposition keep their oracle-side
    # defaults: background 0 / IUNDEF for channels and unmasked cells
    absent = got == K.IUNDEF
    cmp = ~absent
    assert np.array_equal(got[cmp], want[cmp]), f"{name} tile={tile} labeled cells"
    # absent cells must be exactly the oracle's non-labeled set
    assert ((want[absent] == K.IUNDEF) | (want[absent] == 0)).all(), f"{name} tile={tile} absent set"


def test_fill_dist_round_checkpoint_resume(ray_session, tmp_path):
    z, _ = fixture_grids("pit")
    want = K.fill_pits(z, RES)
    ck = str(tmp_path / "fill_ck")
    # partial run: only 1 round allowed, checkpointed
    ds = tiles_ds({"dem": z}, 16)
    partial = D.fill_dist(ds, RES, max_rounds=1, checkpoint_dir=ck)
    import os

    assert any(d.startswith("round-") for d in os.listdir(ck))
    # resume completes from the checkpoint (fresh input dataset)
    ds2 = tiles_ds({"dem": z}, 16)
    out = D.fill_dist(ds2, RES, checkpoint_dir=ck)
    got = collect(out, "demns")
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# MFD accumulation + MFD HAND: distributed == single-node oracle, bit-exact
# at every tiling (round-2 addition; VERDICT item 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,tile", [("twovalley", 32), ("twovalley", 16), ("cone", 8)])
def test_mfd_acc_dist_bitexact(ray_session, name, tile):
    N, RES = 32, 30.0
    dem, _ = synth.dem_grid(name, N)
    dem = dem.astype(np.float32)
    want = K.mfd_accumulate(dem, RES, 1.1)
    ds = T.make_tiles_dataset({"demns": dem}, tile)
    out = D.mfd_acc_dist(ds, RES, 1.1, N, N)
    got = T.collect_grid(out, "mfdacc", dtype=np.float32)
    assert np.array_equal(got, want), f"{name} tile={tile}"


@pytest.mark.parametrize("tile", [32, 16])
def test_hand_mfd_dist_bitexact(ray_session, tile):
    N, RES = 32, 30.0
    dem, mask = synth.dem_grid("twovalley", N)
    z = dem.copy()
    z[~mask] = np.float32(K.UNDEF)
    z = z.astype(np.float32)
    maski = mask.astype(np.int32)
    w = K.fill_pits(z, RES)
    area, fdir = K.d8_area(w, maski, RES)
    ch, _, _ = K.calculate_channels(area, 8 * RES * RES, 16 * RES * RES, fdir, mask=maski)
    want = K.depth2channel_mfd(ch, maski, 1, w, RES)
    ds = T.make_tiles_dataset({"demns": w, "landmask": maski, "channels": ch}, tile)
    out = D.hand_mfd_dist(ds, 1, RES, N, N)
    got = T.collect_grid(out, "handmfd", dtype=np.float32)
    assert np.array_equal(got, want), f"tile={tile}: {(got != want).sum()} cells differ"


@pytest.mark.parametrize("tile", [32, 16])
def test_acc_wipoints_dist_bitexact(ray_session, tile):
    """Interest-point accumulation (sqrt2 fdir + sequential seed walks):
    distributed closure-collect == literal kernel at every tiling."""
    N_, RES_ = 32, 30.0
    dem, mask = synth.dem_grid("rough", N_)
    dem = dem.astype(np.float32)
    maski = mask.astype(np.int32)
    ip = np.full((N_, N_), K.IUNDEF, dtype=np.int64)
    # deterministic sparse seeds
    rng_cells = [(3, 5), (10, 20), (17, 8), (25, 28), (30, 2), (12, 12)]
    for k2, (i, j) in enumerate(rng_cells):
        ip[i, j] = k2
    want_area, want_fdir = K.d8_acc_wipoints(dem, maski, ip, RES_)
    ds = T.make_tiles_dataset({"dem": dem, "landmask": maski, "ipoints": ip}, tile)
    out = D.acc_wipoints_dist(ds, RES_, N_, N_)
    got_area = T.collect_grid(out, "area_wip", dtype=np.float32)
    got_fdir = T.collect_grid(out, "fdir", dtype=np.int8)
    assert np.array_equal(got_fdir, want_fdir), f"tile={tile} fdir"
    assert np.array_equal(got_area, want_area), f"tile={tile}: {(got_area != want_area).sum()} differ"


@pytest.mark.parametrize("name", ["twovalley", "cone"])
def test_hillslopes_presplit_bitexact(ray_session, name):
    """VERDICT r2 item 8: with max_network_cells forcing every network
    through the channel+seed-ring sparse trace, the result must be
    bit-identical to the unsplit path (the hid walk is channel-graph-only
    state; floods are disjoint seed closures)."""
    o = full_chain_oracle(name)
    ds = T.make_tiles_dataset(
        {"channels": o["channels"].astype(np.int64), "area": o["area"],
         "fdir": o["fdir"].astype(np.int8), "landmask": o["mask"]},
        16,
    )
    base = D.hillslopes_dist(ds, N, N).to_pandas()
    # cap far below any network size -> every channel-outlet network splits
    split = D.hillslopes_dist(ds, N, N, max_network_cells=10).to_pandas()
    b = base.sort_values(["gi", "gj"]).reset_index(drop=True)
    s = split.sort_values(["gi", "gj"]).reset_index(drop=True)
    assert len(b) == len(s), f"{name}: row count {len(b)} vs {len(s)}"
    assert (b["gi"].to_numpy() == s["gi"].to_numpy()).all()
    assert (b["gj"].to_numpy() == s["gj"].to_numpy()).all()
    assert (b["hillslope"].to_numpy() == s["hillslope"].to_numpy()).all(), (
        f"{name}: {(b['hillslope'].to_numpy() != s['hillslope'].to_numpy()).sum()} cells differ"
    )


@pytest.mark.parametrize("name", ["twovalley", "cone"])
def test_hillslopes_presplit_join_path_bitexact(ray_session, name):
    """ADVICE r3 / VERDICT r3 ask #2: with seed_broadcast_rows=0 the
    interior paint must take the Dataset hash-join path (composite
    (net, entryseed) key, no broadcast) and stay bit-identical to both the
    broadcast probe and the unsplit trace."""
    o = full_chain_oracle(name)
    ds = T.make_tiles_dataset(
        {"channels": o["channels"].astype(np.int64), "area": o["area"],
         "fdir": o["fdir"].astype(np.int8), "landmask": o["mask"]},
        16,
    )
    base = D.hillslopes_dist(ds, N, N).to_pandas()
    joined = D.hillslopes_dist(ds, N, N, max_network_cells=10, seed_broadcast_rows=0).to_pandas()
    b = base.sort_values(["gi", "gj"]).reset_index(drop=True)
    s = joined.sort_values(["gi", "gj"]).reset_index(drop=True)
    assert len(b) == len(s), f"{name}: row count {len(b)} vs {len(s)}"
    assert (b["gi"].to_numpy() == s["gi"].to_numpy()).all()
    assert (b["gj"].to_numpy() == s["gj"].to_numpy()).all()
    assert (b["hillslope"].to_numpy() == s["hillslope"].to_numpy()).all(), (
        f"{name}: {(b['hillslope'].to_numpy() != s['hillslope'].to_numpy()).sum()} cells differ"
    )


def test_hillslopes_presplit_noop_when_under_cap(ray_session):
    """A cap larger than every network leaves the full path untouched."""
    o = full_chain_oracle("twovalley")
    ds = T.make_tiles_dataset(
        {"channels": o["channels"].astype(np.int64), "area": o["area"],
         "fdir": o["fdir"].astype(np.int8), "landmask": o["mask"]},
        16,
    )
    base = D.hillslopes_dist(ds, N, N).to_pandas().sort_values(["gi", "gj"]).reset_index(drop=True)
    capped = (
        D.hillslopes_dist(ds, N, N, max_network_cells=10_000_000)
        .to_pandas().sort_values(["gi", "gj"]).reset_index(drop=True)
    )
    assert (base["hillslope"].to_numpy() == capped["hillslope"].to_numpy()).all()


@pytest.mark.parametrize("name", ["pit", "twovalley"])
def test_remove_pits_simple_dist_drainage_guarantee(ray_session, name):
    """The documented scale variant of simple pit removal must leave no
    interior local minimum (the guarantee callers depend on), even though
    it is not bit-identical to the scan-order kernel."""
    z, mask = fixture_grids(name)
    ds = tiles_ds({"dem": z}, 16)
    out = D.remove_pits_simple_dist(ds, RES)
    w = collect(out, "demns")
    interior = w[1:-1, 1:-1]
    nb = np.stack([
        w[0:-2, 0:-2], w[0:-2, 1:-1], w[0:-2, 2:], w[1:-1, 0:-2],
        w[1:-1, 2:], w[2:, 0:-2], w[2:, 1:-1], w[2:, 2:],
    ])
    is_min = (interior < nb.min(axis=0)) & (interior != np.float32(K.UNDEF))
    # strict local minima would trap flow; P&D guarantees none remain
    assert not is_min.any() or (interior[is_min] == np.float32(K.UNDEF)).all()
    # every cell drains: D8 fdir on the filled surface has no undrained
    # interior cell (fdir valid wherever dem was valid)
    fdir = K.d8_fdir(w, RES)
    valid = w != np.float32(K.UNDEF)
    assert (fdir[valid] >= 0).all()


def test_mfd_dist_halo_independent(ray_session):
    """The wide-halo ready-cell engine must give the same bits at any halo
    width (band cells are resolved redundantly and identically)."""
    dem, _ = synth.dem_grid("twovalley", N)
    dem = dem.astype(np.float32)
    want = K.mfd_accumulate(dem, RES, 1.1)
    ds = T.make_tiles_dataset({"demns": dem}, 16)
    for halo in (2, 8):
        out = D.mfd_acc_dist(ds, RES, 1.1, N, N, halo=halo)
        got = T.collect_grid(out, "mfdacc", dtype=np.float32)
        assert np.array_equal(got, want), f"halo={halo}"


@pytest.mark.parametrize("op", ["acc", "mfd"])
def test_round_checkpoint_resume_acc_mfd(ray_session, tmp_path, op):
    """The fill_dist round-checkpoint contract now covers the accumulation
    loops too: a partial run leaves a complete round on disk; the rerun
    resumes from it and finishes bit-identical to an uncheckpointed run."""
    import os

    z, mask = fixture_grids("twovalley")
    w = K.fill_pits(z, RES)
    ck = str(tmp_path / f"{op}_ck")
    if op == "acc":
        fdir = K.d8_fdir(w, RES)
        want = K.d8_accumulate(fdir)
        ds = tiles_ds({"fdir": fdir.astype(np.int8), "landmask": mask}, 16)
        D.acc_dist(ds, 16, N, N, max_rounds=1, checkpoint_dir=ck)
        assert any(d.startswith("round-") for d in os.listdir(ck))
        out = D.acc_dist(ds, 16, N, N, checkpoint_dir=ck)
        got = collect(out, "acc")
    else:
        dem, _ = synth.dem_grid("twovalley", N)
        dem = dem.astype(np.float32)
        want = K.mfd_accumulate(dem, RES, 1.1)
        ds = tiles_ds({"demns": dem}, 16)
        D.mfd_acc_dist(ds, RES, 1.1, N, N, max_rounds=1, checkpoint_dir=ck)
        assert any(d.startswith("round-") for d in os.listdir(ck))
        out = D.mfd_acc_dist(ds, RES, 1.1, N, N, checkpoint_dir=ck)
        got = collect(out, "mfdacc", dtype=np.float32)
    assert np.array_equal(got, want), op


def test_suggest_tile_size(ray_session):
    s2 = T.suggest_tile_size(2)
    s16 = T.suggest_tile_size(16)
    assert s2 >= s16 >= 64  # more columns -> smaller (or equal) tiles
    # padded footprint respects the block budget (~4 tiles per 128MiB block)
    assert (s16 + 2) ** 2 * 4 * 16 <= (128 << 20) // 4
    assert T.suggest_tile_size(1, target_bytes=64 << 20) <= T.suggest_tile_size(1, target_bytes=512 << 20)


def test_mfd_dist_ragged_tiles_tile_halo(ray_session):
    """Tile-sized default halo with edge tiles SMALLER than the halo: the
    short-strip placement in assemble_padded must land flush against the
    shared edge (N=40, tile=16 -> 8-wide edge tiles, halo=16)."""
    n = 40
    dem, _ = synth.dem_grid("twovalley", n)
    dem = dem.astype(np.float32)
    want = K.mfd_accumulate(dem, RES, 1.1)
    ds = T.make_tiles_dataset({"demns": dem}, 16)
    out = D.mfd_acc_dist(ds, RES, 1.1, n, n)
    got = T.collect_grid(out, "mfdacc", dtype=np.float32)
    assert np.array_equal(got, want)


def test_polygon_info_dist_single_tile(ray_session):
    """A grid that fits ONE tile produces zero cross-tile probe rows; the
    adjacency join must be skipped, not handed schema-less empty hash-join
    partitions (round-4 review). Compared against the whole-grid kernel."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 3, size=(N, N)).astype(np.float64)
    vals[rng.random((N, N)) < 0.1] = K.UNDEF
    labels = K.polygonize(vals)
    info = K.polygon_info(labels, np.zeros_like(labels), res=RES)
    ds = T.make_tiles_dataset({"values": vals.astype(np.float32)}, N)  # single tile
    labeled = D.polygonize_dist(ds, "values")
    cents, edges = D.polygon_info_dist(labeled, RES, N, N)
    got_edges = {(int(s), int(d)) for s, d in zip(edges["src"], edges["dst"])}
    assert got_edges == {tuple(e) for e in info["edges"]}
    c = cents.sort_values("pid").reset_index(drop=True)
    assert np.allclose(c["cx"].to_numpy(), info["centroid"][:, 0])
    assert np.allclose(c["cy"].to_numpy(), info["centroid"][:, 1])


@pytest.mark.parametrize("tile", [32, 16, 8])
@pytest.mark.parametrize("name", ["rough", "twovalley"])
def test_inflow_neighbors_dist_matches_oracle(ray_session, name, tile):
    z, _ = fixture_grids(name)
    fdir = K.d8_fdir(z, RES)
    rng = np.random.default_rng(7)
    var = rng.integers(1, 1000, size=(N, N)).astype(np.float64)
    want = K.d8_inflow_neighbors(var, fdir)
    ds = tiles_ds({"var": var, "fdir": fdir}, tile)
    out = D.inflow_neighbors_dist(ds, "var")
    got = collect(out, "inflow")
    assert np.array_equal(got, want), f"{name} tile={tile}"


@pytest.mark.parametrize("tile", [32, 16, 8])
def test_acc_neighbors_dist_matches_oracle(ray_session, tile):
    z, _ = fixture_grids("rough")
    rng = np.random.default_rng(11)
    var = rng.integers(1, 1000, size=(N, N)).astype(np.float64)
    want = K.d8_acc_neighbors(z, RES, var)
    ds = tiles_ds({"dem": z, "var": var}, tile)
    got = collect(D.acc_neighbors_dist(ds, RES, N, N), "accn")
    assert np.array_equal(got, want), f"tile={tile}"


@pytest.mark.parametrize("tile", [32, 16, 8])
def test_acc_pfdir_dist_matches_oracle(ray_session, tile):
    # prescribed fdir (nodata patch + mask hole) straight into acc_dist:
    # calculate_d8_acc_pfdir semantics (terrain_tools.f90:253-301)
    from geospatialtools_ray.pipelines import oracle_fixtures as OF

    fdir, mask = OF.acc_pfdir_inputs(N, RES)
    want = (np.float32(RES) * np.float32(RES) * K.d8_accumulate(fdir).astype(np.float32)).astype(np.float32)
    want[(mask == 0) | (fdir == -1)] = np.float32(K.UNDEF)
    ds = tiles_ds({"fdir": fdir, "landmask": mask}, tile)
    got = collect(D.area_from_acc(D.acc_dist(ds, tile, N, N), RES), "area", dtype=np.float32)
    assert np.array_equal(got, want), f"tile={tile}"


@pytest.mark.parametrize("tile", [32, 16, 8])
def test_assign_clusters_dist_matches_oracle(ray_session, tile):
    from geospatialtools_ray.pipelines import oracle_fixtures as OF

    lab, clusters = OF.assign_clusters_inputs(N)
    want = K.assign_clusters(lab, clusters).astype(np.int64)
    ds = tiles_ds({"lab": lab}, tile)
    got = collect(D.assign_clusters_dist(ds, clusters), "cluster", dtype=np.int64)
    assert np.array_equal(got, want), f"tile={tile}"


def test_fill_dist_resume_ignores_crashed_round_orphans(ray_session, tmp_path):
    """ADVICE r3 crash window: a die between write_parquet and _DONE leaves
    orphan fragments in round-<n>; the retry must not read them (no _DONE)
    and the recommit must CLEAR them (rmtree) rather than doubling every
    tile row with a second uniquely-named fragment set."""
    import os

    import pyarrow.parquet as pq

    z, _ = fixture_grids("pit")
    want = K.fill_pits(z, RES)
    ck = str(tmp_path / "fill_ck_crash")
    partial = D.fill_dist(tiles_ds({"dem": z}, 16), RES, max_rounds=1, checkpoint_dir=ck)
    n_tiles = partial.count()

    # simulate the crashed NEXT round: fragments on disk, no _DONE marker
    done = sorted(int(d.split("-")[1]) for d in os.listdir(ck) if d.startswith("round-"))
    crash_dir = os.path.join(ck, f"round-{done[-1] + 1}")
    os.makedirs(crash_dir)
    sample = partial.limit(1).to_pandas()
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(sample, preserve_index=False),
        os.path.join(crash_dir, "orphan-fragment.parquet"),
    )

    out = D.fill_dist(tiles_ds({"dem": z}, 16), RES, checkpoint_dir=ck)
    assert out.count() == n_tiles  # no duplicated tiles from the orphan set
    got = collect(out, "demns")
    assert np.array_equal(got, want)
    # and the committed round dirs are single-generation (orphan cleared)
    for d in os.listdir(ck):
        if d.startswith("round-") and os.path.exists(os.path.join(ck, d, "_DONE")):
            frags = [f for f in os.listdir(os.path.join(ck, d)) if f.endswith(".parquet")]
            assert "orphan-fragment.parquet" not in frags
