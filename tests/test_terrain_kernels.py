"""Terrain kernel conformance: the single-node oracle is certified by
(a) hand-computed micro-goldens, (b) the reference-shaped brute-force
fixpoint solver for pit filling, and (c) the property invariants of
FIXTURES.md (accumulation conservation, HAND >= 0, partitions, bijective
relabels, determinism)."""

import numpy as np
import pytest

from geospatialtools_ray import synth
from geospatialtools_ray.terrain import kernels as K

FIXTURES = ["plane", "cone", "pit", "twovalley", "rough", "masked"]


def dem_with_sentinel(name, n):
    dem, mask = synth.dem_grid(name, n)
    z = dem.copy()
    z[~mask] = K.UNDEF
    return z, mask.astype(np.int8)


# ---------------- pit filling ----------------

@pytest.mark.parametrize("name", ["pit", "rough", "twovalley", "masked"])
def test_fill_matches_reference_fixpoint(name):
    z, _ = dem_with_sentinel(name, 24)
    got = K.fill_pits(z, res=30.0)
    want = K.fill_pits_fixpoint(z, res=30.0)
    assert np.array_equal(got, want), f"{name}: priority flood != P&D fixpoint"


def test_fill_removes_depressions():
    z, _ = dem_with_sentinel("pit", 32)
    w = K.fill_pits(z, res=30.0)
    assert (w >= z).all()
    # every interior cell drains: it has a strictly lower 8-neighbor
    # (w = max(z, nmin + eps) implies w > nmin everywhere in the interior)
    interior = w[1:-1, 1:-1]
    nmin = np.full_like(interior, np.inf)
    for di, dj in K.POS:
        nmin = np.minimum(nmin, w[1 + di : 31 + di, 1 + dj : 31 + dj])
    assert (interior > nmin).all()


def test_fill_plane_untouched():
    z, _ = dem_with_sentinel("plane", 16)
    assert np.array_equal(K.fill_pits(z, 30.0), z)


# ---------------- slope / aspect ----------------

def test_slope_aspect_inclined_plane():
    n = 12
    yy, xx = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    dem = (2.0 * xx).astype(np.float32)  # rises along d1
    dx = np.full((n, n), 1.0, dtype=np.float32)
    dy = np.full((n, n), 1.0, dtype=np.float32)
    slope, aspect = K.slope_aspect(dem, dx, dy)
    # interior: dzdy = (col j-1 sums) - (col j+1 sums) = -8 over denom 8 -> -2
    assert np.allclose(slope[1:-1, 1:-1], 2.0)
    # edge-clamped first column has halved gradient
    assert np.allclose(slope[1:-1, 0], 1.0)


def test_slope_aspect_literal_stencil_one_cell():
    rng = np.random.default_rng(0)
    dem = rng.uniform(0, 10, (5, 5)).astype(np.float32)
    dx = rng.uniform(25, 35, (5, 5)).astype(np.float32)
    dy = rng.uniform(25, 35, (5, 5)).astype(np.float32)
    slope, aspect = K.slope_aspect(dem, dx, dy)
    i = j = 2
    # literal transcription of terrain_tools.f90:37-49 with i->d0, j->d1
    dzdy = (
        (dem[i - 1, j - 1] + 2 * dem[i, j - 1] + dem[i + 1, j - 1])
        - (dem[i - 1, j + 1] + 2 * dem[i, j + 1] + dem[i + 1, j + 1])
    ) / (
        (dy[i - 1, j - 1] + 2 * dy[i, j - 1] + dy[i + 1, j - 1])
        + (dy[i - 1, j + 1] + 2 * dy[i, j + 1] + dy[i + 1, j + 1])
    )
    dzdx = (
        (dem[i - 1, j - 1] + 2 * dem[i - 1, j] + dem[i - 1, j + 1])
        - (dem[i + 1, j - 1] + 2 * dem[i + 1, j] + dem[i + 1, j + 1])
    ) / (
        (dx[i - 1, j - 1] + 2 * dx[i - 1, j] + dx[i - 1, j + 1])
        + (dx[i + 1, j - 1] + 2 * dx[i + 1, j] + dx[i + 1, j + 1])
    )
    assert slope[i, j] == pytest.approx(np.sqrt(dzdx**2 + dzdy**2), rel=1e-6)
    assert aspect[i, j] == pytest.approx(np.arctan2(dzdy, -dzdx), rel=1e-6)


# ---------------- D8 fdir + accumulation ----------------

def test_d8_fdir_steepest_and_ties():
    # 3x3 with distinct drops: steepest wins
    dem = np.array([[5, 5, 5], [5, 9, 5], [5, 5, 1]], dtype=np.float32)
    f = K.d8_fdir(dem, 1.0)
    assert f[1, 1] == 7  # (1,1) -> (2,2) is POS index 7
    # all-equal drops: first in POS order wins (maxloc tie-break)
    dem2 = np.array([[5, 5, 5], [5, 9, 5], [5, 5, 5]], dtype=np.float32)
    f2 = K.d8_fdir(dem2, 1.0)
    assert f2[1, 1] == 0  # POS[0] = (-1,-1)


def test_d8_fdir_border_out_of_grid():
    dem = np.full((3, 3), 7.0, dtype=np.float32)  # flat: no positive slope
    f = K.d8_fdir(dem, 1.0)
    assert f[0, 0] == 8  # first OOB position for the corner is POS index 0
    assert f[1, 1] == -1  # interior flat -> nodata
    assert f[2, 2] >= 8


def test_d8_accumulation_conservation():
    for name in FIXTURES:
        z, mask = dem_with_sentinel(name, 24)
        w = K.fill_pits(z, 30.0)
        fdir = K.d8_fdir(w, 30.0)
        count = K.d8_accumulate(fdir)
        # conservation: each cell contributes exactly once to every cell on
        # its downstream path; total inflow+1 == count (checked directly)
        d0, d1 = K.d8_downstream_index(fdir)
        indeg_sum = np.zeros_like(count)
        for i in range(24):
            for j in range(24):
                if d0[i, j] >= 0:
                    indeg_sum[d0[i, j], d1[i, j]] += count[i, j]
        assert np.array_equal(count, indeg_sum + 1), name


def test_d8_area_mask_semantics():
    z, mask = dem_with_sentinel("masked", 16)
    area, fdir = K.d8_area(K.fill_pits(z, 30.0), mask, 30.0)
    assert (area[mask == 0] == K.UNDEF).all()
    assert (area[(mask == 1) & (fdir != -1)] > 0).all()


# ---------------- channels / basins / HAND ----------------

def terrain_chain(name, n=24, res=30.0, threshold_cells=8, basin_cells=16):
    z, mask = dem_with_sentinel(name, n)
    w = K.fill_pits(z, res)
    area, fdir = K.d8_area(w, mask, res)
    thr = threshold_cells * res * res
    bthr = basin_cells * res * res
    channels, channels_wob, topo = K.calculate_channels(area, thr, bthr, fdir, mask=mask)
    basins = K.delineate_basins(channels, mask, fdir)
    hand = K.depth2channel(channels, mask, fdir, w.astype(np.float32))
    return dict(z=z, mask=mask, w=w, area=area, fdir=fdir, channels=channels,
                channels_wob=channels_wob, topo=topo, basins=basins, hand=hand)


@pytest.mark.parametrize("name", ["cone", "twovalley", "plane"])
def test_channels_structure(name):
    r = terrain_chain(name)
    ch = r["channels"]
    land = (r["mask"] == 1)
    assert ((ch[land] >= 0)).all()  # land cells: 0 or segment id
    assert (ch[land] > 0).any(), "fixture must produce a channel network"
    # topology is consistent: every downstream cid exists or is -1
    for cid, down in r["topo"].items():
        assert down == -1 or down in r["topo"]


def test_channels_deterministic():
    a = terrain_chain("twovalley")
    b = terrain_chain("twovalley")
    assert np.array_equal(a["channels"], b["channels"])
    assert a["topo"] == b["topo"]


def test_basins_partition_and_consistency():
    r = terrain_chain("twovalley")
    basins, channels, mask = r["basins"], r["channels"], r["mask"]
    # channel cells keep their channel id as basin id
    land_ch = (channels > 0) & (mask == 1)
    assert np.array_equal(basins[land_ch], channels[land_ch])
    # every labeled non-channel cell's downstream path hits its own basin
    d0, d1 = K.d8_downstream_index(r["fdir"])
    lab = np.argwhere((basins > 0) & ~land_ch & (mask == 1))
    for (i, j) in lab[:200]:
        ci, cj = i, j
        for _ in range(10000):
            ni, nj = d0[ci, cj], d1[ci, cj]
            if ni < 0:
                break
            if channels[ni, nj] > 0:
                assert basins[i, j] == channels[ni, nj]
                break
            ci, cj = ni, nj


def test_hand_nonnegative_and_zero_on_channels():
    r = terrain_chain("twovalley")
    hand, mask, channels = r["hand"], r["mask"], r["channels"]
    ok = hand != K.UNDEF
    assert (hand[ok] >= 0).all()
    # channel cells with positive elevation: HAND == 0
    chm = (channels > 0) & (mask == 1) & (r["w"] > 0) & ok
    assert np.allclose(hand[chm], 0.0)


def test_every_fixture_cell_drains_to_channel():
    """Certifies the fixtures used for distributed-vs-oracle HAND tests have
    no dead-end drainage (the stale-cd quirk never triggers)."""
    for name in ["cone", "twovalley"]:
        r = terrain_chain(name)
        d0, d1 = K.d8_downstream_index(r["fdir"])
        ch = r["channels"]
        for (i, j) in np.argwhere((r["mask"] == 1) & (ch == 0)):
            ci, cj = i, j
            reached = False
            for _ in range(10000):
                ni, nj = d0[ci, cj], d1[ci, cj]
                if ni < 0:
                    break
                if ch[ni, nj] > 0:
                    reached = True
                    break
                ci, cj = ni, nj
            assert reached, f"{name}: ({i},{j}) never reaches a channel"


# ---------------- hillslopes ----------------

def test_hillslopes_basic_structure():
    r = terrain_chain("twovalley")
    hs = K.delineate_hillslopes(r["channels"], r["area"], r["fdir"], r["mask"])
    land = r["mask"] == 1
    nonchan = land & (r["channels"] == 0)
    # every land non-channel cell got some label (>= 0 after dense-rank)
    assert (hs[nonchan] >= 0).all()
    assert len(np.unique(hs[nonchan])) >= 2, "expect multiple hillslopes"
    # deterministic
    hs2 = K.delineate_hillslopes(r["channels"], r["area"], r["fdir"], r["mask"])
    assert np.array_equal(hs, hs2)


# ---------------- relabel / gap fill / CCL / cluster paint ----------------

def test_cleanup_labels_dense_rank_starting_zero():
    labels = np.array([[0, 5, 5], [9, -9999, 2], [2, 9, 0]], dtype=np.int64)
    out = K.cleanup_labels(labels)
    # surviving ids 2,5,9 -> 0,1,2 (reference maps smallest to 0)
    assert out.tolist() == [[0, 1, 1], [2, -9999, 0], [0, 2, 0]]


def test_gap_fill_mode_first_seen_tiebreak():
    hrus = np.array([[1, 1, 2], [2, -9999, 2], [3, 1, -9999]], dtype=np.int64)
    channels = np.zeros((3, 3), dtype=np.int64)
    channels[1, 1] = 7
    out = K.gap_fill(hrus, channels)
    # neighborhood values: 1,1,2,2,2,3,1 -> counts {1:3, 2:3, 3:1}; the
    # reference keeps first-seen order -> 1 wins
    assert out[1, 1] == 1
    assert np.array_equal(out[channels == 0], hrus[channels == 0])


def test_polygonize_scan_order_pids():
    a = np.array(
        [[1, 1, 2], [2, 2, 2], [1, -9999, 1]], dtype=np.float64
    )
    a[a == -9999] = K.UNDEF
    out = K.polygonize(a)
    # scan order d0-outer: first component (value 1 at (0,0)) -> pid 0,
    # the 2-component -> pid 1, bottom-left 1 -> pid 2, bottom-right -> 3
    assert out[0, 0] == 0 and out[0, 1] == 0
    assert out[0, 2] == 1 and out[1, 0] == 1
    assert out[2, 0] == 2 and out[2, 2] == 3
    assert out[2, 1] == K.UNDEF


def test_assign_clusters_lookup():
    labels = np.array([[0, 1], [-9999, 2]], dtype=np.int64)
    out = K.assign_clusters(labels, np.array([10, 20, 30]))
    assert out.tolist() == [[10, 20], [-9999, 30]]
