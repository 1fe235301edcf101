"""Stateless function conformance: pedotransfer goldens (the reference's own
test vectors), metrics vs literal reference formulas, time_average
truncation, geometry helpers."""

import math

import numpy as np
import pyarrow as pa
import pytest

from geospatialtools_ray.functions import geometry, metrics, soil, timeavg

# ---- F5: the reference's own golden vectors (pedotransfer.py:118-124) ----
CLAY = np.array([88.0, 80.0, 65.0, 40.0, 20.0, 10.0, 60.0, 30.0, 10.0, 10.0, 50.0, 25.0]) / 100
SAND = np.array([5.0, 5.0, 10.0, 20.0, 15.0, 5.0, 25.0, 35.0, 35.0, 45.0, 40.0, 50.0]) / 100
OM = 2.5
KSAT = np.array([108.0, 96.7, 50.3, 15.5, 16.1, 22.0, 11.3, 4.3, 5.7, 3.7, 1.4, 1.1])
THETAS = np.array([46.0, 46.0, 45.0, 46.0, 48.0, 48.0, 43.0, 48.0, 51.0, 52.0, 44.0, 50.0]) / 100
THETA33 = np.array([10.0, 12.0, 18.0, 28.0, 31.0, 30.0, 27.0, 36.0, 38.0, 41.0, 36.0, 42.0]) / 100
THETA1500 = np.array([5.0, 5.0, 8.0, 14.0, 11.0, 6.0, 17.0, 22.0, 22.0, 27.0, 25.0, 30.0]) / 100


def test_pedotransfer_reference_goldens():
    assert np.allclose(KSAT, soil.ksat_saxton2006(CLAY, SAND, OM), atol=5e-1)
    assert np.allclose(THETAS, soil.theta_s(CLAY, SAND, OM), atol=1e-2)
    assert np.allclose(THETA33, soil.theta_33(CLAY, SAND, OM), atol=1e-2)
    assert np.allclose(THETA1500, soil.theta_1500(CLAY, SAND, OM), atol=1e-2)


def test_pedotransfer_maidment_runs():
    phi = np.full_like(CLAY, 0.45)
    assert np.isfinite(soil.lambda_maidment92(phi, 100 * CLAY, 100 * SAND)).all()
    assert np.isfinite(soil.residual_water_content_maidment92(phi, 100 * CLAY, 100 * SAND)).all()
    assert np.isfinite(soil.bubbling_pressure_maidment92(phi, 100 * CLAY, 100 * SAND)).all()


def test_fao_texture_nearest_centroid():
    # exact centroids map to their own class
    got = soil.fao_soil_texture(soil.FAO_CLASSES["sand"], soil.FAO_CLASSES["clay"], soil.FAO_CLASSES["silt"])
    assert got.tolist() == list(range(1, 8))
    # NaN -> 0
    assert soil.fao_soil_texture(np.array([np.nan]), np.array([10.0]), np.array([10.0]))[0] == 0


def test_pedotransfer_stage_batch():
    t = pa.table({"clay": CLAY, "sand": SAND, "om": np.full(12, OM)})
    out = soil.pedotransfer_stage(["ksat", "thetas", "theta33", "theta1500"])(t)
    assert np.allclose(out["ksat"].to_numpy(), soil.ksat_saxton2006(CLAY, SAND, OM))


# ---- metrics (F7) ----

def _ref_pearson(x, y):
    x = x - x.mean()
    y = y - y.mean()
    return (x * y).sum() / math.sqrt((x * x).sum() * (y * y).sum())


def test_metrics_match_reference_formulas():
    rng = np.random.default_rng(3)
    obs = rng.normal(10, 2, 500)
    model = obs + rng.normal(0, 1, 500)
    obs[::17] = np.nan
    model[::23] = np.nan
    m = metrics.metrics_pairs(obs, model)
    k = ~(np.isnan(obs) | np.isnan(model))
    o, md = obs[k], model[k]
    rho = _ref_pearson(md, o)
    assert m["r"] == pytest.approx(rho, rel=1e-12)
    assert m["r2"] == pytest.approx(rho**2, rel=1e-12)
    assert m["rmse"] == pytest.approx(np.sqrt(np.mean((md - o) ** 2)), rel=1e-12)
    assert m["nrmse"] == pytest.approx(100 * np.sqrt(np.mean((md - o) ** 2)) / (o.max() - o.min()), rel=1e-12)
    assert m["mae"] == pytest.approx(np.mean(np.abs(md - o)), rel=1e-12)
    assert m["nse"] == pytest.approx(1 - np.sum((o - md) ** 2) / np.sum((o - o.mean()) ** 2), rel=1e-12)
    # KGE (metrics.py:25-32): population std
    kge = 1 - math.sqrt((rho - 1) ** 2 + (md.mean() / o.mean() - 1) ** 2 + (md.std() / o.std() - 1) ** 2)
    assert m["kge"] == pytest.approx(kge, rel=1e-12)
    mean_ratio = md.mean() / o.mean()
    cv = md.std() / o.std() / mean_ratio
    kge12 = 1 - math.sqrt((rho - 1) ** 2 + (mean_ratio - 1) ** 2 + (cv - 1) ** 2)
    assert m["kge2012"] == pytest.approx(kge12, rel=1e-12)


def test_metrics_degenerate_cases():
    # <2 valid pairs -> rmse/mae NaN (metrics.py:85-101)
    m = metrics.metrics_pairs(np.array([1.0, np.nan]), np.array([2.0, 3.0]))
    assert math.isnan(m["rmse"]) and math.isnan(m["mae"])
    # constant model -> rho undefined -> kge NaN but kge2012 uses rho=0
    m2 = metrics.metrics_pairs(np.array([1.0, 2.0, 3.0]), np.array([5.0, 5.0, 5.0]))
    assert math.isnan(m2["r"]) and math.isnan(m2["kge"])
    # empty
    m3 = metrics.metrics_pairs(np.array([np.nan]), np.array([np.nan]))
    assert math.isnan(m3["rmse"])


def test_metrics_streaming_equals_singleshot(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    obs = rng.normal(0, 1, 10_000)
    model = obs * 1.1 + rng.normal(0, 0.3, 10_000)
    obs[::31] = np.nan
    ds = rd.from_arrow(pa.table({"obs": obs, "model": model})).repartition(8)
    got = metrics.metrics_over_dataset(ds, "obs", "model")
    want = metrics.metrics_pairs(obs, model)
    for k, v in want.items():
        if math.isnan(v):
            assert math.isnan(got[k]), k
        else:
            assert got[k] == pytest.approx(v, rel=1e-9), k


# ---- time_average (F6) ----

def test_time_average_truncates_remainder():
    vals = np.arange(25, dtype=float)
    out = timeavg.time_average_values(vals, 4)
    # dt = 25//4 = 6; only first 24 samples used
    expect = vals[:24].reshape(4, 6).mean(axis=1)
    assert np.allclose(out, expect)


def test_time_average_stage_mixed_lengths():
    t = pa.table({"series_id": [0, 1, 2], "values": [list(range(24)), list(range(25)), list(range(240))]})
    out = timeavg.time_average_stage(4)(t)
    got = out["avg_values"].to_pylist()
    assert np.allclose(got[0], np.arange(24.0).reshape(4, 6).mean(axis=1))
    assert np.allclose(got[1], np.arange(24.0).reshape(4, 6).mean(axis=1))  # 25 truncates to 24
    assert np.allclose(got[2], np.arange(240.0).reshape(4, 60).mean(axis=1))


# ---- geometry ----

def test_arcgis_to_d8_matches_reference_loop():
    rng = np.random.default_rng(5)
    codes = rng.choice([1, 2, 4, 8, 16, 32, 64, 128, 0, -9999], size=(20, 20))
    d8 = geometry.arcgis_to_d8(codes)
    # oracle: literal reference mapping (terrain_tools.py:1669-1695)
    ref_map = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1), 16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
    di, dj = geometry.d8_downstream(*np.meshgrid(np.arange(20), np.arange(20), indexing="ij"), d8)
    for i in range(20):
        for j in range(20):
            c = codes[i, j]
            if c in ref_map:
                assert (di[i, j] - i, dj[i, j] - j) == ref_map[c]
            else:
                assert d8[i, j] == -1


def test_cell_geometry_matches_reference_construction():
    # oracle: literal reference calculate_area (terrain_tools.py:25-40)
    minx, miny, maxx, maxy, nx, ny = -10.0, 40.0, -9.0, 41.0, 8, 5
    lats = np.linspace(miny, maxy, ny + 1)
    lons = np.linspace(minx, maxx, nx + 1)
    LA, LO = np.meshgrid(lats, lons)  # [lon, lat] like the reference
    dx_ref = geometry.haversine_ref((LA[:-1, :-1] + LA[1:, 1:]) / 2, (LA[:-1, :-1] + LA[1:, 1:]) / 2, LO[:-1, :-1], LO[1:, 1:])
    dy_ref = geometry.haversine_ref(LA[:-1, :-1], LA[1:, 1:], (LO[:-1, :-1] + LO[1:, 1:]) / 2, (LO[:-1, :-1] + LO[1:, 1:]) / 2)
    dx, dy, area = geometry.cell_geometry(minx, miny, maxx, maxy, nx, ny)
    # reference arrays are [lon, lat]; ours are [lat, lon]
    assert np.allclose(dx, dx_ref.T, rtol=1e-6)
    assert np.allclose(dy, dy_ref.T, rtol=1e-6)
    assert np.allclose(area, (dx_ref * dy_ref).T, rtol=1e-6)


def test_normalize_semantics():
    v = np.array([0.0, 5.0, 10.0, np.nan])
    out = geometry.normalize(v, 0.0, 10.0)
    assert np.allclose(out[:3], [0, 0.5, 1.0]) and np.isnan(out[3])
    const = geometry.normalize(np.array([3.0, 3.0, np.nan]), 3.0, 3.0)
    assert const[0] == 0.0 and const[1] == 0.0 and np.isnan(const[2])


def test_normalize_stage_distributed(ray_session):
    import ray.data as rd

    v = np.linspace(-5, 15, 1000)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(4)
    out = geometry.normalize_stage(ds, "x").to_pandas()
    assert out["x_norm"].min() == 0.0 and out["x_norm"].max() == 1.0


def test_shape_functions_roundtrip():
    x = np.linspace(0.01, 0.99, 50)
    y = geometry.frelief(x, 1.7, 2.3)
    assert np.allclose(geometry.frelief_inv(y, 1.7, 2.3), x)
    assert np.allclose(geometry.fwidth(x, 2.0), 1 + 2 * x)
    assert np.allclose(geometry.fslope(x, 1.0, 3.0), 1 + 3 * x)
