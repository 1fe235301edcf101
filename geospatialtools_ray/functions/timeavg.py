"""Tumbling fixed-count window average over list-valued series columns.

Reference: `time_average` (src/upscaling_tools.f90:1-13 via
libraries/upscaling_tools.py:4-6): block mean with truncating integer
stride dt = nt_in // nt_out — trailing remainder samples are silently
DROPPED (nt_in=25, nt_out=4 keeps only the first 24). That truncation is
reference semantics and is reproduced here (pinned in tests).

Engine form: per-row list-column reshape+mean inside map_batches — the
reference's only windowed computation (SURVEY.md section 2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def time_average_values(values: np.ndarray, nt_out: int) -> np.ndarray:
    """One series: nt_in -> nt_out block means, truncating remainder."""
    nt_in = len(values)
    dt = nt_in // nt_out
    if dt < 1:
        raise ValueError(f"nt_out={nt_out} > nt_in={nt_in}")
    return np.asarray(values, dtype=np.float64)[: nt_out * dt].reshape(nt_out, dt).mean(axis=1)


def time_average_stage(nt_out: int, col: str = "values", out_col: str = "avg_values"):
    """map_batches fn averaging a list<float> column. Rows may have varying
    lengths; equal-length runs are vectorized together via a single reshape
    (the common case: one fixed nt per table)."""

    def apply(batch: pa.Table) -> pa.Table:
        arr = batch[col].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        lens = np.diff(offs)
        out = np.empty((len(lens), nt_out), dtype=np.float64)
        for nt in np.unique(lens):
            rows = np.flatnonzero(lens == nt)
            dt = int(nt) // nt_out
            if dt < 1:
                raise ValueError(f"nt_out={nt_out} > nt_in={nt}")
            idx = (offs[rows][:, None] + np.arange(nt_out * dt)[None, :]).ravel()
            out[rows] = flat[idx].reshape(len(rows), nt_out, dt).mean(axis=2)
        la = pa.FixedSizeListArray.from_arrays(pa.array(out.ravel(), type=pa.float64()), nt_out)
        return batch.append_column(out_col, la)

    return apply
