"""CRS transforms (functions/crs.py): known EPSG vectors, forward/inverse
round-trips across zone validity, differential properties (k0 scale at
the central meridian), the string-tag dispatch, and the
PolygonIndex(src_crs=...) `-t_srs`-at-index-build path
(gdal_tools.py:188 semantics)."""

import numpy as np
import pytest

from geospatialtools_ray.functions import crs


def test_known_vectors():
    # central meridian x equator -> exactly (500000, 0)
    x, y = crs.lonlat_to_utm(np.array([3.0]), np.array([0.0]), 31)
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    # zone 31 west edge on the equator: the published 166021.443 m easting
    x, y = crs.lonlat_to_utm(np.array([0.0]), np.array([0.0]), 31)
    assert x[0] == pytest.approx(166021.443, abs=2e-3)
    # web-mercator antimeridian: pi * R
    xm, _ = crs.lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
    assert xm[0] == pytest.approx(20037508.342789244, abs=1e-6)


def test_utm_roundtrip_north_and_south():
    rng = np.random.default_rng(7)
    lon = rng.uniform(0.5, 5.5, 50_000)  # zone 31 spans 0..6 deg E
    lat = rng.uniform(2.0, 84.0, 50_000)
    x, y = crs.lonlat_to_utm(lon, lat, 31)
    lo2, la2 = crs.utm_to_lonlat(x, y, 31)
    assert np.abs(lo2 - lon).max() < 1e-8
    assert np.abs(la2 - lat).max() < 1e-8
    xs, ys = crs.lonlat_to_utm(lon, -lat, 31, south=True)
    lo3, la3 = crs.utm_to_lonlat(xs, ys, 31, south=True)
    assert np.abs(lo3 - lon).max() < 1e-8
    assert np.abs(la3 + lat).max() < 1e-8
    assert (ys > 0).all()  # false northing applied


def test_webmercator_roundtrip():
    rng = np.random.default_rng(8)
    lon = rng.uniform(-180, 180, 50_000)
    lat = rng.uniform(-85, 85, 50_000)
    x, y = crs.lonlat_to_webmercator(lon, lat)
    lo2, la2 = crs.webmercator_to_lonlat(x, y)
    assert np.abs(lo2 - lon).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9


def test_scale_factor_at_central_meridian():
    # transverse Mercator is conformal with k = k0 on the central meridian
    eps = 1e-6
    for latd in (0.0, 30.0, 60.0):
        x1, _ = crs.lonlat_to_utm(np.array([3.0 + eps]), np.array([latd]), 31)
        nu = crs._A / np.sqrt(1.0 - crs._E2 * np.sin(np.radians(latd)) ** 2)
        ground = np.radians(eps) * nu * np.cos(np.radians(latd))
        assert (x1[0] - 500000.0) / ground == pytest.approx(0.9996, abs=1e-6)


def test_tag_dispatch_and_compose():
    x, y = crs.transform(np.array([500000.0]), np.array([4000000.0]), "utm:31", "webmercator")
    bx, by = crs.transform(x, y, "epsg:3857", "utm:31n")
    assert abs(bx[0] - 500000.0) < 1e-4
    assert abs(by[0] - 4000000.0) < 1e-4
    # lonlat identity legs
    lo, la = crs.transform(np.array([12.5]), np.array([-33.25]), "lonlat", "wgs84")
    assert lo[0] == 12.5 and la[0] == -33.25
    with pytest.raises(ValueError):
        crs._parse("epsg:32633")  # only the tag grammar is accepted
    with pytest.raises(ValueError):
        crs.utm_zone_lon0(0)


def test_utm_zone_of():
    assert crs.utm_zone_of(3.0) == 31
    assert crs.utm_zone_of(-177.0) == 1
    assert crs.utm_zone_of(177.0) == 60


def test_reproject_batch_preserves_other_columns():
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "lon": pa.array([0.0, 10.0]),
            "lat": pa.array([0.0, 45.0]),
            "payload": pa.array(["a", "b"]),
        }
    )
    out = crs.reproject_batch(t, "lonlat", "webmercator")
    assert out.column_names == t.column_names
    assert out["payload"].to_pylist() == ["a", "b"]
    assert out["doc_id"].to_pylist() == [1, 2]
    x = out["lon"].to_numpy()
    assert x[0] == 0.0 and x[1] == pytest.approx(1113194.9079327357, abs=1e-6)


def test_polygon_index_src_crs_matches_lonlat_build():
    """Building the index from a web-mercator layer with src_crs must give
    the same join pairs as building from the original lonlat layer — the
    engine twin of `ogr2ogr -t_srs` before `gdal_rasterize`."""
    from geospatialtools_ray import synth, wkb
    from geospatialtools_ray.stages.spatial_join import PolygonIndex

    layer = synth.make_polygons(60, cover_res=6)
    merc_wkbs = []
    for buf in layer["geom_wkb"]:
        rings_m = []
        for ring in wkb.parse_polygon(buf):
            mx, my = crs.lonlat_to_webmercator(ring[:, 0], ring[:, 1])
            rings_m.append(np.column_stack([mx, my]))
        merc_wkbs.append(wkb.polygon_wkb(rings_m))
    merc_layer = dict(layer)
    merc_layer["geom_wkb"] = merc_wkbs
    merc_layer["bbox"] = [wkb.polygon_bbox(b) for b in merc_wkbs]

    idx_ll = PolygonIndex.from_synth(layer, cover_res=6)
    idx_m = PolygonIndex.from_synth(merc_layer, cover_res=6, src_crs="webmercator")
    assert np.allclose(idx_m.bboxes, idx_ll.bboxes, atol=1e-9)

    rng = np.random.default_rng(11)
    # cluster probes around polygon bboxes so the join is non-trivial
    bb = idx_ll.bboxes
    k = rng.integers(0, len(bb), 20_000)
    lon = bb[k, 0] + rng.uniform(-0.2, 1.2, 20_000) * (bb[k, 2] - bb[k, 0])
    lat = bb[k, 1] + rng.uniform(-0.2, 1.2, 20_000) * (bb[k, 3] - bb[k, 1])
    p_ll = idx_ll.query(lon, lat)
    p_m = idx_m.query(lon, lat)
    a = sorted(zip(p_ll[0].tolist(), idx_ll.poly_ids[p_ll[1]].tolist()))
    b = sorted(zip(p_m[0].tolist(), idx_m.poly_ids[p_m[1]].tolist()))
    assert a == b and len(a) > 100


def test_warp_identity_lonlat(ray_session):
    """Warping a lonlat grid onto ITSELF (same CRS, same cells) is the
    identity — every dst cell samples its own src cell."""
    import pandas as pd

    from geospatialtools_ray.stages.warp import warp_nearest

    ny, nx = 24, 48
    iy, ix = np.indices((ny, nx))
    grid = ((iy * 5 + ix * 3) % 31).astype(np.float64)
    gt = (-180.0, 360.0 / nx, 0.0, 90.0, 0.0, -180.0 / ny)
    spec = {"crs": "lonlat", "x0": -180.0, "resx": 360.0 / nx,
            "y0": 90.0, "resy": -180.0 / ny, "nx": nx, "ny": ny}
    out = warp_nearest(grid, gt, "lonlat", spec).to_pandas()
    out = out.sort_values(["iy", "ix"]).reset_index(drop=True)
    assert len(out) == ny * nx
    assert (out["value"].to_numpy().reshape(ny, nx) == grid).all()


def test_warp_out_of_coverage_is_undef(ray_session):
    """dst cells whose source coords fall outside the grid -> undef (the
    reference's out-of-bounds rule, gdal_tools.py:29-30)."""
    from geospatialtools_ray.stages.warp import warp_nearest

    grid = np.ones((10, 10))
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)  # covers lon 0..10, lat 0..10
    spec = {"crs": "lonlat", "x0": -5.0, "resx": 1.0, "y0": 10.0, "resy": -1.0,
            "nx": 20, "ny": 10}
    out = warp_nearest(grid, gt, "lonlat", spec, undef=np.nan).to_pandas()
    inside = out[(out["ix"] >= 5) & (out["ix"] < 15)]
    outside = out[out["ix"] < 5]
    assert (inside["value"] == 1.0).all()
    assert outside["value"].isna().all()


def test_bilinear_sample_exact_on_linear_field():
    """Bilinear interpolation reproduces a linear field exactly in the
    interior, and equals the cell value exactly at cell centers."""
    from geospatialtools_ray.stages.warp import bilinear_sample

    ny, nx = 20, 30
    iy, ix = np.indices((ny, nx))
    grid = (2.0 * ix + 3.0 * iy + 1.0).astype(np.float64)  # linear in x,y
    gt = (0.0, 1.0, 0.0, float(ny), 0.0, -1.0)
    rng = np.random.default_rng(3)
    lon = rng.uniform(1.0, nx - 1.0, 5000)   # stay inside the center ring
    lat = rng.uniform(1.0, ny - 1.0, 5000)
    v = bilinear_sample(lon, lat, grid, gt)
    fx = lon - 0.5
    fy = (lat - (gt[3] + gt[5] / 2.0)) / gt[5]
    want = 2.0 * fx + 3.0 * fy + 1.0
    assert np.abs(v - want).max() < 1e-9
    # exactly at centers: the cell's own value
    cx = (np.arange(nx) + 0.5)[5:10]
    cy = gt[3] + (np.arange(ny) + 0.5)[4:9] * gt[5]
    vc = bilinear_sample(cx, cy, grid, gt)
    assert np.array_equal(vc, grid[4:9, 5:10].diagonal())
    # fully outside -> undef
    out = bilinear_sample(np.array([-5.0]), np.array([2.0]), grid, gt)
    assert np.isnan(out[0])
