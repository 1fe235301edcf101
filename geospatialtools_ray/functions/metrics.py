"""Skill metrics (KGE/NSE/R/RMSE/...) as batch functions + streaming
aggregates.

Reference semantics: /root/reference/libraries/metrics.py:5-101 — every
metric first drops pairs where either side is NaN, Pearson rho via
scipy.stats.pearsonr (population formula), np.std is population std
(ddof=0), RMSE/nRMSE/MAE return NaN with <2 valid pairs, KGE2012_ALL maps
NaN rho -> 0.

Engine form: each metric is computable from a fixed vector of streaming
moments (n, sx, sy, sxx, syy, sxy, sum|x-y|, sum(x-y)^2, min/max obs), so
over a Dataset we do per-batch partial moments in `map_batches` (one tiny
row per batch) -> sum the partials -> finalize once. No full-data
materialization, no second pass, exactly one shuffle of O(#batches) rows —
the "exact streaming formulation" called for in SURVEY.md section 2.5.
"""

from __future__ import annotations

import math

import numpy as np

MOMENT_FIELDS = ["n", "sx", "sy", "sxx", "syy", "sxy", "sad", "ssd", "omin", "omax"]


def partial_moments(obs: np.ndarray, model: np.ndarray) -> dict[str, float]:
    """NaN-pair-filtered moment vector for one batch. obs==x, model==y."""
    m = ~(np.isnan(obs) | np.isnan(model))
    x = obs[m].astype(np.float64)
    y = model[m].astype(np.float64)
    if len(x) == 0:
        return dict(n=0.0, sx=0.0, sy=0.0, sxx=0.0, syy=0.0, sxy=0.0, sad=0.0, ssd=0.0, omin=math.inf, omax=-math.inf)
    d = y - x
    return dict(
        n=float(len(x)),
        sx=float(x.sum()),
        sy=float(y.sum()),
        sxx=float((x * x).sum()),
        syy=float((y * y).sum()),
        sxy=float((x * y).sum()),
        sad=float(np.abs(d).sum()),
        ssd=float((d * d).sum()),
        omin=float(x.min()),
        omax=float(x.max()),
    )


def merge_moments(parts) -> dict[str, float]:
    out = dict(n=0.0, sx=0.0, sy=0.0, sxx=0.0, syy=0.0, sxy=0.0, sad=0.0, ssd=0.0, omin=math.inf, omax=-math.inf)
    for p in parts:
        for k in ("n", "sx", "sy", "sxx", "syy", "sxy", "sad", "ssd"):
            out[k] += p[k]
        out["omin"] = min(out["omin"], p["omin"])
        out["omax"] = max(out["omax"], p["omax"])
    return out


def finalize(mom: dict[str, float]) -> dict[str, float]:
    """All metric values from one merged moment vector."""
    n = mom["n"]
    nan = float("nan")
    if n == 0:
        return {k: nan for k in (
            "r", "r2", "rmse", "nrmse", "mae", "bias", "nse", "kge", "kge2012",
            "alpha", "beta", "mean_obs", "mean_model", "std_obs", "std_model")}
    mx = mom["sx"] / n
    my = mom["sy"] / n
    var_x = max(mom["sxx"] / n - mx * mx, 0.0)
    var_y = max(mom["syy"] / n - my * my, 0.0)
    cov = mom["sxy"] / n - mx * my
    sx_ = math.sqrt(var_x)
    sy_ = math.sqrt(var_y)
    rho = cov / (sx_ * sy_) if sx_ > 0 and sy_ > 0 else nan
    rmse = math.sqrt(mom["ssd"] / n) if n > 1 else nan
    nrmse = 100.0 * rmse / (mom["omax"] - mom["omin"]) if n > 1 and mom["omax"] > mom["omin"] else nan
    mae = mom["sad"] / n if n > 1 else nan
    # NSE: 1 - sum((o-m)^2)/sum((o-mean_o)^2)  (metrics.py:44-48)
    sso = mom["sxx"] - n * mx * mx
    nse = 1.0 - mom["ssd"] / sso if sso > 0 else nan
    # KGE (Gupta 2009): rho, mean ratio, std ratio   (metrics.py:25-32)
    mean_ratio = my / mx if mx != 0 else nan
    std_ratio = sy_ / sx_ if sx_ > 0 else nan
    kge = (
        1.0 - math.sqrt((rho - 1.0) ** 2 + (mean_ratio - 1.0) ** 2 + (std_ratio - 1.0) ** 2)
        if not (math.isnan(rho) or math.isnan(mean_ratio) or math.isnan(std_ratio))
        else nan
    )
    # KGE2012: cv ratio = std_ratio / mean_ratio; NaN rho -> 0 (metrics.py:5-14)
    rho12 = 0.0 if math.isnan(rho) else rho
    cv_ratio = std_ratio / mean_ratio if mean_ratio not in (0.0,) and not math.isnan(mean_ratio) and not math.isnan(std_ratio) else nan
    kge2012 = (
        1.0 - math.sqrt((rho12 - 1.0) ** 2 + (mean_ratio - 1.0) ** 2 + (cv_ratio - 1.0) ** 2)
        if not (math.isnan(mean_ratio) or math.isnan(cv_ratio))
        else nan
    )
    return {
        "r": rho,
        "r2": rho * rho if not math.isnan(rho) else nan,
        "rmse": rmse,
        "nrmse": nrmse,
        "mae": mae,
        "bias": my - mx,
        "nse": nse,
        "kge": kge,
        "kge2012": kge2012,
        "alpha": std_ratio,
        "beta": mean_ratio,
        "mean_obs": mx,
        "mean_model": my,
        "std_obs": sx_,
        "std_model": sy_,
    }


def metrics_pairs(obs, model) -> dict[str, float]:
    """Single-shot (in-memory) evaluation — the test oracle path."""
    return finalize(partial_moments(np.asarray(obs, dtype=np.float64), np.asarray(model, dtype=np.float64)))


def metrics_over_dataset(ds, obs_col: str, model_col: str) -> dict[str, float]:
    """Distributed evaluation over a Dataset: map_batches partials ->
    driver-side merge of O(#batches) tiny rows -> finalize."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        p = partial_moments(
            batch[obs_col].to_numpy(zero_copy_only=False).astype(np.float64),
            batch[model_col].to_numpy(zero_copy_only=False).astype(np.float64),
        )
        return pa.table({k: [v] for k, v in p.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return finalize(merge_moments(parts))
