"""geocell.cover_rect_adaptive invariants: exact coverage (point-in-rect
iff exactly one cover-cell path accepts it), interior antichain (no cell is
an ancestor of another), and degenerate-rect handling."""

import numpy as np
import pytest

from geospatialtools_ray import geocell as G

RES_MIN, RES_MAX = 2, 7


def _rand_rects(n, seed):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-180, 150, n)
    y0 = rng.uniform(-90, 60, n)
    w = rng.uniform(0.5, 60, n)
    h = rng.uniform(0.5, 45, n)
    return x0, y0, np.minimum(x0 + w, 180.0), np.minimum(y0 + h, 90.0)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cover_join_is_exact(seed):
    rng = np.random.default_rng(seed + 100)
    lon = rng.uniform(-180, 180, 30_000)
    lat = rng.uniform(-90, 90, 30_000)
    x0s, y0s, x1s, y1s = _rand_rects(5, seed)
    for x0, y0, x1, y1 in zip(x0s, y0s, x1s, y1s):
        cells, kinds = G.cover_rect_adaptive(x0, y0, x1, y1, RES_MIN, RES_MAX)
        kindmap = dict(zip(cells.tolist(), kinds.tolist()))
        inside = (lon >= x0) & (lon < x1) & (lat >= y0) & (lat < y1)
        paths = np.zeros(len(lon), dtype=np.int64)
        accepted = np.zeros(len(lon), dtype=bool)
        for r in range(RES_MIN, RES_MAX + 1):
            cc = G.cell_of(lon, lat, r)
            k = np.asarray([kindmap.get(c, -1) for c in cc.tolist()])
            hit = k >= 0
            paths += hit
            accepted |= (k == 1) | ((k == 0) & inside)
        assert (accepted == inside).all(), "cover join must equal exact containment"
        # every point meets the cover by at most one path -> no dedup stage
        assert paths.max() <= 1


def test_interior_cells_form_an_antichain():
    for x0, y0, x1, y1 in zip(*_rand_rects(8, 42)):
        cells, kinds = G.cover_rect_adaptive(x0, y0, x1, y1, RES_MIN, RES_MAX)
        interior = cells[kinds == 1]
        seen = set(interior.tolist())
        res, _, _ = G.unpack(interior)
        for c, r in zip(interior.tolist(), res.tolist()):
            for pr in range(RES_MIN, int(r)):
                assert int(G.parent(np.uint64(c), pr)[()]) not in seen, (
                    "an interior cell's ancestor is also in the cover"
                )


def test_cover_boundary_cells_only_at_res_max():
    cells, kinds = G.cover_rect_adaptive(-170.0, -80.0, -130.0, -50.0, RES_MIN, RES_MAX)
    res, _, _ = G.unpack(cells)
    assert (res[kinds == 0] == RES_MAX).all()
    assert (res[kinds == 1] >= RES_MIN).all() and (res[kinds == 1] <= RES_MAX).all()


def test_degenerate_and_empty_rects():
    for bad in [(-10.0, -10.0, -10.0, 5.0), (0.0, 0.0, -1.0, 1.0)]:
        c, k = G.cover_rect_adaptive(*bad, RES_MIN, RES_MAX)
        assert len(c) == 0 and len(k) == 0


def test_edge_aligned_rect_half_open():
    # rect edges exactly on res-3 cell boundaries: size 22.5 deg
    s = 180.0 / 8
    x0, y0, x1, y1 = -180.0 + 2 * s, -90.0 + s, -180.0 + 4 * s, -90.0 + 3 * s
    cells, kinds = G.cover_rect_adaptive(x0, y0, x1, y1, RES_MIN, RES_MAX)
    # whole rect is exactly 2x2 res-3 cells, each fully inside; their res-2
    # parents are not fully inside -> cover is exactly those 4, all interior
    assert len(cells) == 4 and (kinds == 1).all()
    res, _, _ = G.unpack(cells)
    assert (res == 3).all()
