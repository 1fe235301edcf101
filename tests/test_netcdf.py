"""NetCDF-3 classic writer + GrADS utilities (reference parity:
libraries/netcdf_tools.py:72-160, grads_tools.py:23-35)."""

import datetime

import numpy as np
import pytest

from geospatialtools_ray.sources import netcdf as nc


def test_gradstime_roundtrip():
    d = datetime.datetime(2003, 2, 7, 6)
    s = nc.datetime2gradstime(d)
    assert s == "06Z07feb2003"
    assert nc.gradstime2datetime(s) == d
    assert nc.gradstime2datetime("18Z31dec1999") == datetime.datetime(1999, 12, 31, 18)


def test_control_file_nc(tmp_path):
    p = str(tmp_path / "run.ctl")
    nc.write_control_file(datetime.datetime(2004, 5, 1, 0), 24, "1hr", "out_%y4%m2.nc", p)
    lines = open(p).read().splitlines()
    assert lines[0] == "dset out_%y4%m2.nc"
    assert lines[1] == "options template"
    assert lines[2] == "dtype netcdf"
    assert lines[3] == "tdef t 24 linear 00Z01may2004 1hr"


def test_control_file_binary(tmp_path):
    p = str(tmp_path / "run.ctl")
    dims = {"undef": -9999.0, "nlon": 10, "nlat": 8, "minlon": -100.0, "minlat": 30.0, "res": 0.5}
    nc.write_control_file_binary(datetime.datetime(2004, 5, 1, 0), dims, 4, "1dy", "d.bin", p, ["sm", "et"])
    txt = open(p).read()
    assert "xdef 10 linear -100.000000 0.500000" in txt
    assert "vars 2" in txt and "sm 0 99 sm" in txt and txt.rstrip().endswith("endvars")


def test_netcdf3_static_roundtrip(tmp_path):
    md = {
        "nlat": 6, "nlon": 9, "res": 0.25, "minlon": -80.0, "minlat": 35.0,
        "undef": -9999.0, "nt": 0, "vars": ["slope", "hand"],
        "vars_info": ["Slope", "Height above nearest drainage"],
        "file": str(tmp_path / "static.nc"),
    }
    rng = np.random.default_rng(0)
    grids = {"slope": rng.random((6, 9)).astype(np.float32), "hand": rng.random((6, 9)).astype(np.float32)}
    path = nc.create_netcdf_file(md, grids)
    assert open(path, "rb").read(4) == b"CDF\x01"
    got = nc.read_netcdf3(path)
    assert got["dims"] == [("lon", 9), ("lat", 6)]
    v = got["variables"]
    # cell-center offset quirk (netcdf_tools.py:76-77): min + res/2
    assert v["lon"]["data"][0] == pytest.approx(-80.0 + 0.125)
    assert v["lat"]["attrs"]["units"] == "degrees_north"
    assert v["slope"]["attrs"]["long_name"] == "Slope"
    assert np.float32(v["hand"]["attrs"]["_FillValue"]) == np.float32(-9999.0)
    np.testing.assert_array_equal(v["slope"]["data"], grids["slope"])
    np.testing.assert_array_equal(v["hand"]["data"], grids["hand"])


def test_netcdf3_time_series_roundtrip(tmp_path):
    md = {
        "nlat": 4, "nlon": 5, "res": 1.0, "minlon": 0.0, "minlat": 0.0,
        "undef": -9999.0, "nt": 3, "tstep": "1hr",
        "tinitial": datetime.datetime(2004, 1, 1, 6), "tinitial_all": datetime.datetime(2004, 1, 1, 0),
        "vars": ["sm"], "file": str(tmp_path / "ts.nc"),
    }
    data = np.arange(3 * 4 * 5, dtype=np.float32).reshape(3, 4, 5)
    path = nc.create_netcdf_file(md, {"sm": data})
    got = nc.read_netcdf3(path)
    assert got["dims"][0] == ("t", 3)
    t = got["variables"]["t"]
    # initial offset: (tinitial - tinitial_all) in hours = 6
    np.testing.assert_array_equal(t["data"], [6.0, 7.0, 8.0])
    assert t["attrs"]["units"] == "hours since 2004-01-01 00:00:00.0"
    np.testing.assert_array_equal(got["variables"]["sm"]["data"], data)


def test_netcdf3_unlimited_roundtrip_and_append(tmp_path):
    """Record-dimension layout (reference netcdf_tools.py:84 declares t
    UNLIMITED): write 2 timesteps, append 3 more across two appends, and
    check the grown file reads back identically to a fixed-length file of
    the full series."""
    md = {
        "nlat": 4, "nlon": 5, "res": 1.0, "minlon": 0.0, "minlat": 0.0,
        "undef": -9999.0, "nt": 2, "tstep": "1hr",
        "tinitial": datetime.datetime(2004, 1, 1, 6), "tinitial_all": datetime.datetime(2004, 1, 1, 0),
        "vars": ["sm", "et"], "file": str(tmp_path / "rec.nc"),
    }
    rng = np.random.default_rng(7)
    full = {k: rng.random((5, 4, 5)).astype(np.float32) for k in ("sm", "et")}
    path = nc.create_netcdf_file(md, {k: v[:2] for k, v in full.items()}, unlimited=True)

    got = nc.read_netcdf3(path)
    assert got["dims"][0] == ("t", 2)
    np.testing.assert_array_equal(got["variables"]["t"]["data"], [6.0, 7.0])
    for k in ("sm", "et"):
        np.testing.assert_array_equal(got["variables"][k]["data"], full[k][:2])

    # grow: nt 2 -> 4 -> 5 (the reference's per-timestep handle writes)
    n = nc.append_netcdf3_records(path, {"t": np.array([8.0, 9.0]), "sm": full["sm"][2:4], "et": full["et"][2:4]})
    assert n == 4
    n = nc.append_netcdf3_records(path, {"t": np.array([10.0]), "sm": full["sm"][4:], "et": full["et"][4:]})
    assert n == 5

    got = nc.read_netcdf3(path)
    assert got["dims"][0] == ("t", 5)
    np.testing.assert_array_equal(got["variables"]["t"]["data"], [6.0, 7.0, 8.0, 9.0, 10.0])
    for k in ("sm", "et"):
        np.testing.assert_array_equal(got["variables"][k]["data"], full[k])
    # fixed (lon/lat) section untouched by appends
    assert got["variables"]["lon"]["data"][0] == pytest.approx(0.5)

    # byte-equivalent semantics vs writing the full series fixed-length
    md5 = dict(md, nt=5, file=str(tmp_path / "fixed.nc"))
    fixed = nc.read_netcdf3(nc.create_netcdf_file(md5, full))
    for k in ("t", "sm", "et"):
        np.testing.assert_array_equal(got["variables"][k]["data"], fixed["variables"][k]["data"])


def test_netcdf3_append_validation(tmp_path):
    md = {"nlat": 2, "nlon": 2, "res": 1.0, "minlon": 0.0, "minlat": 0.0,
          "undef": -9999.0, "nt": 0, "vars": ["x"], "file": str(tmp_path / "nofill.nc")}
    p = nc.create_netcdf_file(md, {"x": np.zeros((2, 2), dtype=np.float32)})
    with pytest.raises(ValueError, match="UNLIMITED"):
        nc.append_netcdf3_records(p, {"x": np.zeros((1, 2, 2), dtype=np.float32)})

    md2 = {"nlat": 2, "nlon": 2, "res": 1.0, "minlon": 0.0, "minlat": 0.0,
           "undef": -9999.0, "nt": 1, "tstep": "1hr",
           "tinitial": datetime.datetime(2004, 1, 1), "tinitial_all": datetime.datetime(2004, 1, 1),
           "vars": ["x"], "file": str(tmp_path / "rec2.nc")}
    p2 = nc.create_netcdf_file(md2, {"x": np.zeros((1, 2, 2), dtype=np.float32)}, unlimited=True)
    with pytest.raises(ValueError, match="missing"):
        nc.append_netcdf3_records(p2, {"x": np.zeros((1, 2, 2), dtype=np.float32)})  # no t
    with pytest.raises(ValueError, match="record shape"):
        nc.append_netcdf3_records(p2, {"t": np.array([1.0]), "x": np.zeros((1, 3, 2), dtype=np.float32)})


def test_netcdf3_shape_validation(tmp_path):
    md = {"nlat": 4, "nlon": 5, "res": 1.0, "minlon": 0.0, "minlat": 0.0,
          "undef": -9999.0, "nt": 0, "vars": ["x"], "file": str(tmp_path / "bad.nc")}
    with pytest.raises(ValueError, match="shape"):
        nc.create_netcdf_file(md, {"x": np.zeros((5, 4), dtype=np.float32)})


def test_netcdf_sink_from_tiles(ray_session, tmp_path):
    """Interchange path: tile Dataset -> grid -> .nc (driver-side by design;
    NetCDF-3 is one contiguous file — the engine's bulk sink stays
    partitioned parquet via io.py)."""
    from geospatialtools_ray.terrain import tiles as T

    grid = np.arange(32 * 32, dtype=np.float32).reshape(32, 32)
    ds = T.make_tiles_dataset({"slope": grid}, 16)
    assembled = T.collect_grid(ds, "slope")
    md = {"nlat": 32, "nlon": 32, "res": 0.1, "minlon": -10.0, "minlat": 40.0,
          "undef": -9999.0, "nt": 0, "vars": ["slope"], "file": str(tmp_path / "tiles.nc")}
    path = nc.create_netcdf_file(md, {"slope": assembled})
    got = nc.read_netcdf3(path)
    np.testing.assert_array_equal(got["variables"]["slope"]["data"], grid)


def test_reference_workflow_end_to_end(ray_session, tmp_path):
    """The reference's canonical workflow, on this engine: GeoTIFF in ->
    tiled Dataset -> distributed fill/slope -> NetCDF-3 out + GrADS ctl —
    i.e. a user of the reference can run their pipeline here with files in
    the formats they already have."""
    import numpy as np

    from geospatialtools_ray import synth
    from geospatialtools_ray.sources import raster as R
    from geospatialtools_ray.terrain import dist as D
    from geospatialtools_ray.terrain import kernels as K
    from geospatialtools_ray.terrain import tiles as T

    N, RES = 32, 30.0
    dem, _ = synth.dem_grid("pit", N)
    tif = str(tmp_path / "dem.tif")
    R.write_geotiff(tif, dem.astype(np.float32), gt=(-100.0, 0.01, 0, 40.0, 0, -0.01), nodata=-9999.0)

    ds, meta = R.raster_file_to_tiles(tif, tile=16, col="dem")
    assert meta["nodata"] == -9999.0
    filled = D.fill_dist(ds, RES)
    want = K.fill_pits(dem.astype(np.float32), RES)
    got = T.collect_grid(filled, "demns")
    assert np.array_equal(got, want)

    md = {"nlat": N, "nlon": N, "res": 0.01, "minlon": -100.0, "minlat": 40.0 - 0.01 * N,
          "undef": -9999.0, "nt": 0, "vars": ["demns"],
          "vars_info": ["Pit-filled elevation"], "file": str(tmp_path / "out.nc")}
    path = nc.create_netcdf_file(md, {"demns": got})
    back = nc.read_netcdf3(path)
    np.testing.assert_array_equal(back["variables"]["demns"]["data"], got.astype(np.float32))

    ctl = str(tmp_path / "out.ctl")
    nc.write_control_file(datetime.datetime(2004, 1, 1), 1, "1dy", "out.nc", ctl)
    assert "dtype netcdf" in open(ctl).read()
