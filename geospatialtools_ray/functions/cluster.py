"""Deterministic clustering + group analytics.

Replaces the reference's sklearn KMeans uses (cluster_data,
libraries/terrain_tools.py:67-95; create_tiles_kmeans :727-787;
cluster_hillslopes_updated :1373-1490) with an in-repo deterministic Lloyd
KMeans (sklearn is not available here, and the engine must not depend on
library RNG): init = deterministic hash-spread pick, fixed iteration cap,
ties broken toward the lowest centroid index. The engine pattern is the
reference's own split: FIT on a deterministic driver-side sample, broadcast
centroids, PREDICT in an actor pool (`KMeansScorer`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import h64


def kmeans_fit(X: np.ndarray, k: int, iters: int = 50, seed: int = 35799) -> np.ndarray:
    """Deterministic Lloyd's. Init: rows at deterministic hash-ranked
    positions (spread across the dataset, independent of row order only if
    caller sorts — callers pass deterministically-ordered samples). Empty
    clusters re-seeded with the farthest point (deterministic argmax)."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    k = min(k, n)
    # deterministic farthest-point init: hash-ranked first point, then
    # repeatedly the point with maximum min-distance to chosen centroids
    # (argmax first occurrence) — avoids Lloyd's bad-split local optima
    first = int(np.argmin(h64(np.arange(n, dtype=np.uint64), seed)))
    chosen = [first]
    mind = ((X - X[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((X - X[nxt]) ** 2).sum(axis=1))
    C = X[chosen].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first-min tie-break
        newC = C.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                newC[c] = X[m].mean(axis=0)
            else:
                far = d2.min(axis=1).argmax()
                newC[c] = X[far]
        if np.array_equal(newC, C):
            break
        C = newC
    return C


def kmeans_predict(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    d2 = ((np.asarray(X, dtype=np.float64)[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1).astype(np.int32)


def effective_sample_rate(n_rows: int, rate: float, max_rows: int) -> float:
    """Cap a fractional sample at an absolute row budget: the driver-side
    fit matrix must stay bounded regardless of dataset size (a fraction is
    a linear driver-memory term at 100 TB). Both the engine and its oracle
    fixtures compute this with the SAME float expression so the hash-based
    sample masks agree exactly."""
    return min(float(rate), float(max_rows) / float(max(n_rows, 1)))


def deterministic_sample_mask(n_or_keys, rate: float, stream: int = 55) -> np.ndarray:
    """Hash-based sample (replaces np.random.choice at
    terrain_tools.py:71-73 — same intent, reproducible without RNG-state
    coupling across workers)."""
    keys = np.arange(n_or_keys, dtype=np.uint64) if np.isscalar(n_or_keys) else np.asarray(n_or_keys, dtype=np.uint64)
    return (h64(keys, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53) < rate


class KMeansScorer:
    """Actor-pool predictor: centroids fetched once per actor from the
    object store (`ray.put` on the driver)."""

    def __init__(self, centroids_ref, cols: list[str], out_col: str = "cluster"):
        import ray

        self.C = ray.get(centroids_ref) if hasattr(centroids_ref, "hex") else np.asarray(centroids_ref)
        self.cols = cols
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.stack([batch[c].to_numpy(zero_copy_only=False) for c in self.cols], axis=1)
        return batch.append_column(self.out_col, pa.array(kmeans_predict(X, self.C), type=pa.int32()))


def cluster_data_stage(
    ds, cols: list[str], nc: int, sample_rate: float = 0.1, max_sample_rows: int = 100_000, id_col: str | None = None, concurrency=(1, 8)
):
    """cluster_data semantics (terrain_tools.py:67-95): subsample -> fit ->
    predict everything. The sample is collected driver-side, bounded by an
    ABSOLUTE row budget (matching the reference's own 1e5 cap) so the
    driver matrix stays fixed-size at any input scale; centroids broadcast."""
    import ray

    rate = effective_sample_rate(ds.count(), sample_rate, max_sample_rows)

    def sample(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if id_col is not None:
            keys = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            keys = np.arange(n, dtype=np.uint64)  # per-batch; fine for sampling
        keep = deterministic_sample_mask(keys, rate)
        return batch.filter(pa.array(keep)).select(cols)

    sampled = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    X = sampled[cols].to_numpy(dtype=np.float64)
    # deterministic order independent of block arrival: sort rows
    X = X[np.lexsort(tuple(X[:, c] for c in range(X.shape[1] - 1, -1, -1)))]
    C = kmeans_fit(X, nc)
    c_ref = ray.put(C)
    scored = ds.map_batches(
        KMeansScorer,
        fn_constructor_kwargs={"centroids_ref": c_ref, "cols": cols},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return scored, C


def nd_histogram_edges_from_bounds(bounds, nbins: list[int]):
    """Equal-width edges from per-dimension (lo, hi) bounds — the shared
    edge formula for both the in-memory path and distributed callers that
    aggregate min/max first (keeps the lo==hi nudge in ONE place)."""
    edges = []
    for (lo, hi), nb in zip(bounds, nbins):
        lo, hi = float(lo), float(hi)
        if lo == hi:
            hi = lo + 1.0
        edges.append(np.linspace(lo, hi, nb + 1))
    return edges


def nd_histogram_bins(values: list[np.ndarray], nbins: list[int]):
    """np.histogramdd-style equal-width bin edges per dimension
    (terrain_tools.py:789-859)."""
    return nd_histogram_edges_from_bounds([(np.min(v), np.max(v)) for v in values], nbins)


def nd_histogram_assign(values: list[np.ndarray], edges: list[np.ndarray]) -> np.ndarray:
    """Cell -> flattened bin id, matching np.histogramdd edge semantics
    (right-inclusive last bin)."""
    ids = np.zeros(len(values[0]), dtype=np.int64)
    mult = 1
    for v, e in zip(reversed(values), reversed(edges)):
        nb = len(e) - 1
        b = np.digitize(v, e) - 1
        b = np.clip(b, 0, nb - 1)
        ids += b * mult
        mult *= nb
    return ids
