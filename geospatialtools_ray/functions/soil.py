"""Pedotransfer scalar functions (soil hydraulic properties).

Published polynomial pedotransfer models, re-derived from the sources the
reference cites in code: Saxton & Rawls (2006), "Soil water characteristic
estimates by texture and organic matter for hydrologic solutions", SSSAJ
70:1569-1578, and Maidment (1992), Handbook of Hydrology. Semantics must
match /root/reference/libraries/pedotransfer.py:3-114 including its
argument convention: the reference's own conformance vectors
(pedotransfer.py:118-124) pass (clay, sand, om) positionally into
functions declared (S, C, OM), so the first argument is the CLAY fraction
and the second is SAND throughout. We keep that calling convention (and pin
it with the reference's golden vectors in tests) rather than "fixing" it.

All functions are pure numpy ufunc chains -> directly usable inside
`map_batches` on Arrow-backed numpy columns; `pedotransfer_stage` applies a
configurable set of them as one vectorized stage.

Missing data: callers pass NaN (the engine's null), not -9999; a sentinel
shim lives at the fixture boundary only.
"""

from __future__ import annotations

import numpy as np

LOG1500_33 = np.log(1500.0) - np.log(33.0)


def theta_1500t(S, C, OM):
    return 0.031 - 0.024 * S + 0.487 * C + 0.006 * OM + 0.005 * S * OM - 0.013 * C * OM + 0.068 * S * C


def theta_1500(S, C, OM):
    """Wilting point volumetric water content (1500 kPa), with the Saxton
    2006 first-solution correction."""
    t = theta_1500t(S, C, OM)
    return 1.14 * t - 0.02


def theta_33t(S, C, OM):
    return 0.299 - 0.251 * S + 0.195 * C + 0.011 * OM + 0.006 * S * OM - 0.027 * C * OM + 0.452 * S * C


def theta_33(S, C, OM):
    """Field capacity volumetric water content (33 kPa)."""
    t = theta_33t(S, C, OM)
    return t + 1.283 * t * t - 0.374 * t - 0.015


def theta_s33t(S, C, OM):
    return 0.078 + 0.278 * S + 0.034 * C + 0.022 * OM - 0.018 * S * OM - 0.027 * C * OM - 0.584 * S * C


def theta_s33(S, C, OM):
    """Saturation-minus-33kPa volumetric fraction."""
    t = theta_s33t(S, C, OM)
    return 1.636 * t - 0.107


def theta_s(S, C, OM):
    """Saturated volumetric water content."""
    return theta_33(S, C, OM) + theta_s33(S, C, OM) - 0.097 * S + 0.043


def lambda_saxton2006(S, C, OM):
    """Pore size distribution index: slope of log(theta) between field
    capacity and wilting point."""
    return (np.log(theta_33(S, C, OM)) - np.log(theta_1500(S, C, OM))) / LOG1500_33


def ksat_saxton2006(S, C, OM):
    """Saturated hydraulic conductivity, mm/h."""
    lam = lambda_saxton2006(S, C, OM)
    return 1930.0 * (theta_s(S, C, OM) - theta_33(S, C, OM)) ** (3.0 - lam)


def psisat_saxton2006(S, C, OM):
    """Air-entry (saturation) suction, kPa: 33 kPa scaled down the
    Brooks-Corey retention curve from theta_33 to theta_s."""
    b = 1.0 / lambda_saxton2006(S, C, OM)
    return 33.0 * (theta_33(S, C, OM) / theta_s(S, C, OM)) ** b


def lambda_maidment92(phi, clay, sand):
    """Brooks-Corey pore size index from porosity + texture (Maidment 92)."""
    p = (
        -0.7842831
        + 0.0177544 * sand
        - 1.062498 * phi
        - 0.00005304 * sand**2
        - 0.00273493 * clay**2
        + 1.11134946 * phi**2
        - 0.03088295 * sand * phi
        + 0.00026587 * sand**2 * phi**2
        - 0.00610522 * clay**2 * phi**2
        - 0.00000235 * sand**2 * clay
        + 0.00798746 * clay**2 * phi
        - 0.00674491 * phi**2 * clay
    )
    return np.exp(p)


def residual_water_content_maidment92(phi, clay, sand):
    return (
        -0.0182482
        + 0.00087269 * sand
        + 0.00513488 * clay
        + 0.02939286 * phi
        - 0.00015395 * clay**2
        - 0.0010827 * sand * phi
        - 0.00018233 * clay**2 * phi**2
        + 0.00030703 * clay**2 * phi
        - 0.0023584 * phi**2 * clay
    )


def bubbling_pressure_maidment92(phi, clay, sand):
    p = (
        5.3396738
        + 0.1845038 * clay
        - 2.48394546 * phi
        - 0.00213853 * clay**2
        - 0.04356349 * sand * phi
        - 0.61745089 * clay * phi
        + 0.00143598 * sand**2 * phi**2
        - 0.00855375 * clay**2 * phi**2
        - 0.00001282 * sand**2 * clay
        + 0.00895359 * clay**2 * phi
        - 0.00072472 * sand**2 * phi
        + 0.0000054 * clay**2 * sand
        + 0.50028060 * phi**2 * clay
    )
    return np.exp(p)


# FAO texture classes: nearest centroid in (sand, clay, silt) space.
# Reference: /root/reference/libraries/pedotransfer.py:85-114.
FAO_CLASSES = {
    "id": np.arange(1, 8),
    "sand": np.array([83.0, 37.0, 17.0, 60.0, 50.0, 27.0, 46.0]),
    "clay": np.array([9.0, 30.0, 67.0, 20.0, 38.0, 48.0, 35.0]),
    "silt": np.array([8.0, 33.0, 17.0, 20.0, 12.0, 25.0, 19.0]),
}


def fao_soil_texture(sand, clay, silt):
    """Nearest-centroid FAO texture class id (1..7); NaN rows -> 0.
    Fully vectorized argmin over the 7 class centroids."""
    sand = np.asarray(sand, dtype=np.float64)
    clay = np.asarray(clay, dtype=np.float64)
    silt = np.asarray(silt, dtype=np.float64)
    d2 = (
        (sand[:, None] - FAO_CLASSES["sand"][None, :]) ** 2
        + (clay[:, None] - FAO_CLASSES["clay"][None, :]) ** 2
        + (silt[:, None] - FAO_CLASSES["silt"][None, :]) ** 2
    )
    cls = FAO_CLASSES["id"][np.argmin(d2, axis=1)].astype(np.int32)
    bad = np.isnan(sand) | np.isnan(clay) | np.isnan(silt)
    return np.where(bad, 0, cls).astype(np.int32)


REGISTRY = {
    "ksat": ksat_saxton2006,
    "thetas": theta_s,
    "theta33": theta_33,
    "theta1500": theta_1500,
    "lambda": lambda_saxton2006,
    "psisat": psisat_saxton2006,
}


def pedotransfer_stage(props: list[str], clay_col="clay", sand_col="sand", om_col="om"):
    """Build a map_batches fn (pyarrow in/out) attaching the requested soil
    property columns — the engine's pluggable scalar-function registry
    (SURVEY.md section 2.9)."""
    import pyarrow as pa

    fns = {p: REGISTRY[p] for p in props}

    def apply(batch: pa.Table) -> pa.Table:
        S = batch[clay_col].to_numpy(zero_copy_only=False)
        C = batch[sand_col].to_numpy(zero_copy_only=False)
        OM = batch[om_col].to_numpy(zero_copy_only=False)
        for name, fn in fns.items():
            batch = batch.append_column(name, pa.array(fn(S, C, OM), type=pa.float64()))
        return batch

    return apply
