"""Distributed range (interval) join — the second custom operator of the
builder brief's family (as-of join lives in stages/asof.py; no reference
counterpart).

Semantics: match every point row to every interval row with the same key
where ``lo <= t < hi`` (inclusive low, exclusive high — the convention is
part of the API, not an accident of the data).

Execution shape — fully distributed, NO per-key worker assumption (unlike
the as-of join's map_groups merge): the 1-D analogue of the engine's
geocell cover. Time is quantized into width-``w`` buckets; each interval
is exploded to one row per bucket it overlaps, each point lands in
exactly one bucket, and a hash equi-join on the composite
``(key, bucket)`` meets every qualifying pair exactly once (the point's
own bucket), so no post-join dedup is needed — only the exact
``lo <= t < hi`` filter.

Cost model: interval blow-up is ``ceil(len/w) + 1`` rows per interval —
pick ``w`` near the median interval length so the explode stays O(1) per
interval while hot buckets stay narrow. Everything is int64 arithmetic
(timestamps as epoch micros), exact at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BUCKET = "__rj_bucket"


def _to_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamps -> epoch int64 in the column's own unit; ints pass
    through. Exact (no float hop)."""
    t = arr.type
    if pa.types.is_timestamp(t):
        comb = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return comb.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def range_join(
    points,
    intervals,
    key: str,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    point_cols: list[str] | None = None,
    interval_cols: list[str] | None = None,
    num_partitions: int | None = None,
):
    """points/intervals: Datasets sharing the int64-compatible ``key``.
    ``t_col``/``lo_col``/``hi_col`` are timestamps or ints (all converted
    to int64 in the same unit — the caller guarantees consistent units).
    Returns one row per (point, interval) pair with ``lo <= t < hi``,
    carrying [key, t_col, *point_cols, lo_col, hi_col, *interval_cols].
    """
    from ..pipelines.joins import hash_join

    pcols = point_cols or []
    icols = interval_cols or []
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive int in the time unit")

    def tag_points(batch: pa.Table) -> pa.Table:
        t = _to_i64(batch[t_col])
        out = pa.table(
            {
                key: batch[key].cast(pa.int64()),
                "t_i": pa.array(t, type=pa.int64()),
                **{c: batch[c] for c in pcols},
            }
        )
        return out.append_column(_BUCKET, pa.array(t // w, type=pa.int64()))

    def explode_intervals(batch: pa.Table) -> pa.Table:
        lo = _to_i64(batch[lo_col])
        hi = _to_i64(batch[hi_col])
        # hi exclusive: an interval touching a bucket only at its open end
        # contributes nothing there, hence the -1 on the last bucket
        b0 = lo // w
        b1 = np.maximum(b0, (hi - 1) // w)
        reps = (b1 - b0 + 1).astype(np.int64)
        reps[hi <= lo] = 0  # empty/inverted intervals match nothing
        idx = np.repeat(np.arange(batch.num_rows), reps)
        # bucket sequence per interval: b0..b1 via a grouped arange
        offs = np.concatenate([[0], np.cumsum(reps)])[:-1]
        flat = np.arange(int(reps.sum()), dtype=np.int64)
        buckets = flat - np.repeat(offs, reps) + np.repeat(b0, reps)
        taken = batch.take(pa.array(idx))
        out = pa.table(
            {
                key: taken[key].cast(pa.int64()),
                "lo_i": pa.array(lo[idx], type=pa.int64()),
                "hi_i": pa.array(hi[idx], type=pa.int64()),
                **{c: taken[c] for c in icols},
            }
        )
        return out.append_column(_BUCKET, pa.array(buckets, type=pa.int64()))

    p = points.map_batches(tag_points, batch_format="pyarrow")
    iv = intervals.map_batches(explode_intervals, batch_format="pyarrow")
    joined = hash_join(
        p, iv, on=(key, _BUCKET), num_partitions=num_partitions, join_type="inner"
    )

    def exact(batch: pa.Table) -> pa.Table:
        t = batch["t_i"].to_numpy(zero_copy_only=False)
        lo = batch["lo_i"].to_numpy(zero_copy_only=False)
        hi = batch["hi_i"].to_numpy(zero_copy_only=False)
        keep = (lo <= t) & (t < hi)
        return batch.filter(pa.array(keep)).drop_columns([_BUCKET])

    return joined.map_batches(exact, batch_format="pyarrow")
