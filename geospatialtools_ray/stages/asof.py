"""Distributed as-of join — a custom operator Ray Data lacks natively
(builder brief: "as-of join, range join, windowed aggregate" as the
canonical custom-operator family; no reference counterpart).

Semantics (mirrors DuckDB's ASOF JOIN, which the driver oracle runs):
for every left row, attach the single right row with the same key whose
time is the latest <= the left time (direction="backward"; "forward" =
earliest >= left time). `tolerance` (a numpy-subtractable delta, e.g.
np.timedelta64) bounds the match distance; `join="left"` keeps unmatched
left rows with nulls.

Execution shape — pattern (a) of the brief: a composition of
`map_batches` (side-tagging/column alignment) + `groupby(key).map_groups`
(per-key sorted merge via one searchsorted). PARTITIONING ASSUMPTION:
one key's rows (both sides) fit in a single map_groups worker — the same
assumption every map_groups stage in this engine documents. Keys are
user/entity-grained in the corpora (100s-1000s of rows per key at any
scale); a key too hot for one worker needs time-bucketing with per-key
carry-in rows, which this module deliberately does not hide behind the
simple API.

Tie rule (made explicit because DuckDB leaves duplicate-time picks
unspecified): the right side is sorted by (time, *right value columns in
emit order*), and backward matches take the LAST row at an equal time —
deterministic regardless of block arrival order (the engine's
streaming-shaped determinism rule, SURVEY.md 2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE = "__asof_side"


def _align(ds, keep: list[str], other: list[str], side: int):
    """Tag one side and pad it with the other side's columns (nulls) so the
    union has one schema."""

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep)
        for c in other:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, type=pa.float64()))
        return batch.append_column(_SIDE, pa.array(np.full(batch.num_rows, side, dtype=np.int8)))

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_join(
    left,
    right,
    key: str,
    time_col: str,
    left_cols: list[str],
    right_cols: list[str],
    *,
    right_time_col: str | None = None,
    direction: str = "backward",
    tolerance=None,
    join: str = "inner",
):
    """left/right: Datasets. Output columns: [key, time_col, *left_cols,
    *right_cols] with right_cols coming from the matched right row (null
    when join="left" and no match). right_time_col defaults to time_col.

    Current column-type contract: right_cols must be float-compatible
    (they ride the union as float64 nulls on left rows); left_cols pass
    through untouched.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if join not in ("inner", "left"):
        raise ValueError(f"join must be inner|left, got {join!r}")
    rtc = right_time_col or time_col

    def norm_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch[key], time_col: batch[rtc]}
        for c in right_cols:
            cols[c] = batch[c].cast(pa.float64())
        return pa.table(cols)

    r_norm = right.map_batches(norm_right, batch_format="pyarrow")
    l_tag = _align(left, [key, time_col, *left_cols], right_cols, 0)
    r_tag = _align(r_norm, [key, time_col, *right_cols], left_cols, 1)
    # r_tag's pad columns are the LEFT columns — rebuild in l_tag's order
    order = [key, time_col, *left_cols, *right_cols, _SIDE]
    r_tag = r_tag.map_batches(lambda b: b.select(order), batch_format="pyarrow")
    l_tag = l_tag.map_batches(lambda b: b.select(order), batch_format="pyarrow")

    back = direction == "backward"

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g[_SIDE] == 0]
        rt = g[g[_SIDE] == 1].sort_values([time_col, *right_cols], kind="stable")
        out = lf.drop(columns=[_SIDE] + right_cols)
        if len(rt) == 0:
            matched = np.full(len(lf), -1, dtype=np.int64)
        else:
            t = lf[time_col].to_numpy()
            rts = rt[time_col].to_numpy()
            if back:
                matched = np.searchsorted(rts, t, side="right") - 1
            else:
                matched = np.searchsorted(rts, t, side="left")
                matched[matched >= len(rts)] = -1
            if tolerance is not None:
                mt = rts[np.clip(matched, 0, len(rts) - 1)]
                gap = (t - mt) if back else (mt - t)
                matched = np.where((matched >= 0) & (gap <= tolerance), matched, -1)
        hit = matched >= 0
        for c in right_cols:
            v = np.full(len(lf), np.nan)
            if len(rt):
                v[hit] = rt[c].to_numpy()[matched[hit]]
            out = out.assign(**{c: v})
        if join == "inner":
            out = out[hit]
        return out

    return l_tag.union(r_tag).groupby(key).map_groups(merge, batch_format="pandas")
