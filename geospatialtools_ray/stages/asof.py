"""Distributed as-of join — a custom operator Ray Data lacks natively
(builder brief: "as-of join, range join, windowed aggregate" as the
canonical custom-operator family; no reference counterpart).

Semantics (mirrors DuckDB's ASOF JOIN, which the driver oracle runs):
for every left row, attach the single right row with the same key whose
time is the latest <= the left time (direction="backward"; "forward" =
earliest >= left time). `tolerance` (a numpy-subtractable delta, e.g.
np.timedelta64) bounds the match distance; `join="left"` keeps unmatched
left rows with nulls.

Execution shape (round-4 rewrite; previously a ``groupby(key).map_groups``
per-key merge, which pays Ray's per-group Python dispatch at key
cardinality and assumes one key's rows fit in a single worker):

1. tag/align both sides to one schema (map_batches),
2. ONE global range sort on ``(key, time, side-order, *right_cols)`` —
   the side-order bit puts equal-time right rows on the matchable side of
   equal-time left rows for the chosen direction, and the right-value
   tiebreak makes the duplicate-time pick deterministic,
3. a per-block VECTORIZED merge: after the sort every left row's match is
   the nearest preceding (backward) / following (forward) right row of
   the same key, found with one ``np.maximum/minimum.accumulate`` — no
   per-key Python, no per-key worker,
4. an O(blocks + boundary rows) driver stitch for the only rows a block
   cannot decide alone: left rows whose key-run enters the block before
   any same-key right row (the match, if any, lives in an earlier/later
   block). Each block also emits its boundary right row (last right of
   its last key for backward; first right of its first key for forward),
   and the driver runs the SAME vectorized kernel over that small table
   — pending lefts + one right per block — to resolve them.

Sorted blocks hold disjoint key ranges, so only a block's FIRST key
(backward) / LAST key (forward) can continue into a neighbouring block;
everything else is final in-block. No assumption that a key fits in one
worker. Driver stitch volume is O(num_blocks) plus the left rows that
precede the first same-key right row inside their block — pathological
only when a single key's left rows vastly outnumber its right rows AND
span many blocks; ``max_stitch_rows`` fails loudly (with a time-bucketing
hint) rather than silently flooding the driver.

Tie rule (made explicit because DuckDB leaves duplicate-time picks
unspecified): backward takes the LAST right row at an equal time in
(time, *right value columns in emit order*) order; forward takes the
FIRST — deterministic regardless of block arrival order (the engine's
streaming-shaped determinism rule, SURVEY.md 2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE = "__asof_side"  # 0 = left row, 1 = right row
_SORD = "__asof_sord"  # sort-order bit: equal-time rights land on the matchable side
_MK = "__asof_mk"  # 0 final output, 1 pending left (boundary), 2 block boundary right


def _align(ds, keep: list[str], pad: dict[str, pa.DataType], side: int, sord: int):
    """Tag one side and pad it with the other side's columns (typed nulls)
    so the union has one schema."""

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep)
        for c, typ in pad.items():
            batch = batch.append_column(c, pa.nulls(batch.num_rows, type=typ))
        batch = batch.append_column(_SIDE, pa.array(np.full(batch.num_rows, side, dtype=np.int8)))
        return batch.append_column(_SORD, pa.array(np.full(batch.num_rows, sord, dtype=np.int8)))

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
    max_stitch_rows: int = 5_000_000,
):
    """left/right: Datasets. Output columns: [key, time_col, *left_cols,
    *right_cols] with right_cols coming from the matched right row (null
    when join="left" and no match). right_time_col defaults to time_col.

    Current column-type contract: right_cols must be float-compatible
    (they ride the union as float64 nulls on left rows); left_cols pass
    through untouched.
    """
    import ray.data as rd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if join not in ("inner", "left"):
        raise ValueError(f"join must be inner|left, got {join!r}")
    rtc = right_time_col or time_col
    back = direction == "backward"

    def norm_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch[key], time_col: batch[rtc]}
        for c in right_cols:
            cols[c] = batch[c].cast(pa.float64())
        return pa.table(cols)

    r_norm = right.map_batches(norm_right, batch_format="pyarrow")
    # pad right rows with the LEFT columns at their true dtypes so the
    # sorted union keeps one consistent schema (lid stays int64, etc.)
    lschema = left.schema()
    ltypes = {c: lschema.types[list(lschema.names).index(c)] for c in left_cols}
    # side-order: the matchable side of an equal-time tie sorts FIRST for
    # backward (right before left) and LAST for forward (right after left)
    l_sord, r_sord = (1, 0) if back else (0, 1)
    l_tag = _align(left, [key, time_col, *left_cols], {c: pa.float64() for c in right_cols}, 0, l_sord)
    r_tag = _align(r_norm, [key, time_col, *right_cols], ltypes, 1, r_sord)
    order = [key, time_col, *left_cols, *right_cols, _SIDE, _SORD]
    r_tag = r_tag.map_batches(lambda b: b.select(order), batch_format="pyarrow")
    l_tag = l_tag.map_batches(lambda b: b.select(order), batch_format="pyarrow")

    def _match_block(df: pd.DataFrame, boundary_aware: bool) -> pd.DataFrame:
        """Vectorized within-run merge over rows sorted by the global sort
        key. Returns the left rows with: right values where matched,
        _MK=1 on boundary-pending rows (only when boundary_aware)."""
        n = len(df)
        side = df[_SIDE].to_numpy()
        kv = df[key].to_numpy()
        t = df[time_col].to_numpy()
        idx = np.arange(n)
        if back:
            src = np.where(side == 1, idx, -1)
            filled = np.maximum.accumulate(src)
            has = filled >= 0
        else:
            src = np.where(side == 1, idx, n)
            filled = np.minimum.accumulate(src[::-1])[::-1]
            has = filled < n
        safe = np.clip(filled, 0, n - 1)
        same_key = has & (kv[safe] == kv)
        ok = same_key.copy()
        if tolerance is not None and n:
            mt = t[safe]
            gap = (t - mt) if back else (mt - t)
            ok &= gap <= tolerance
        is_left = side == 0
        out = df.loc[is_left, [key, time_col, *left_cols]].copy()
        lsafe = safe[is_left]
        lok = ok[is_left]
        for c in right_cols:
            v = df[c].to_numpy()[lsafe].astype(np.float64, copy=True)
            v[~lok] = np.nan
            out[c] = v
        # explicit match flag: a matched-but-NaN source value must survive
        # an inner join (NaN payloads are not "no match")
        out["_hit"] = lok.astype(np.int8)
        if boundary_aware:
            # a left row with no same-key right on its side IN THIS BLOCK
            # is only undecided if its key-run can continue past the block
            # edge — i.e. it is the block's first key (backward) / last
            # key (forward); sorted blocks hold disjoint key ranges, so
            # every other key is fully decided here.
            edge_key = kv[0] if back else kv[-1]
            pend = is_left & ~same_key & (kv == edge_key)
            mk = np.zeros(n, dtype=np.int8)
            mk[pend] = 1
            out[_MK] = mk[is_left]
        return out

    def merge_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # empty sort blocks arrive schema-less
            return b
        df = b.to_pandas()
        out_t = pa.Table.from_pandas(_match_block(df, boundary_aware=True), preserve_index=False)
        # block boundary right row: the last right of the LAST key
        # (backward) / first right of the FIRST key (forward) — the only
        # right row a neighbouring block's pending lefts can match. Taken
        # from the arrow block directly (its left columns are typed nulls)
        # so block schemas stay identical with or without a boundary row.
        kv = df[key].to_numpy()
        side = df[_SIDE].to_numpy()
        edge_key = kv[-1] if back else kv[0]
        hits = np.flatnonzero((side == 1) & (kv == edge_key))
        if len(hits):
            i = int(hits[-1] if back else hits[0])
            brow = (
                b.take([i])
                .drop_columns([_SIDE, _SORD])
                .append_column("_hit", pa.array([0], pa.int8()))
                .append_column(_MK, pa.array([2], pa.int8()))
            )
            brow = brow.select(out_t.column_names).cast(out_t.schema)
            out_t = pa.concat_tables([out_t, brow])
        return out_t

    marked = (
        l_tag.union(r_tag)
        .sort([key, time_col, _SORD, *right_cols])
        .map_batches(merge_block, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    def finals(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        b = b.filter(pa.compute.equal(b[_MK], 0))
        if join == "inner":
            b = b.filter(pa.compute.equal(b["_hit"], 1))
        return b.drop_columns([_MK, "_hit"])

    out_ds = marked.map_batches(finals, batch_size=None, batch_format="pyarrow")

    def pend_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.compute.greater(b[_MK], 0))

    small = marked.map_batches(pend_only, batch_size=None, batch_format="pyarrow").to_pandas()
    if len(small) > max_stitch_rows:
        raise ValueError(
            f"asof_join boundary stitch has {len(small)} rows (> {max_stitch_rows}): "
            "one key's left rows vastly outnumber its right rows across many blocks; "
            "pre-bucket the time axis (join on (key, time_bucket)) to bound the stitch"
        )
    if len(small):
        # resolve pending lefts against the per-block boundary rights with
        # the SAME kernel: sort by the global key and re-run the merge.
        small[_SIDE] = np.where(small[_MK].to_numpy() == 2, np.int8(1), np.int8(0))
        small[_SORD] = np.where(small[_SIDE].to_numpy() == 1, np.int8(r_sord), np.int8(l_sord))
        small = small.sort_values([key, time_col, _SORD, *right_cols], kind="stable").reset_index(drop=True)
        resolved = _match_block(small, boundary_aware=False)
        if join == "inner":
            resolved = resolved[resolved["_hit"] == 1]
        resolved = resolved.drop(columns=["_hit"])
        if len(resolved):
            out_sch = out_ds.schema()
            tbl = pa.Table.from_pandas(resolved, preserve_index=False)
            tbl = pa.table(
                {nm: tbl[nm].cast(out_sch.types[list(out_sch.names).index(nm)]) for nm in out_sch.names}
            )
            out_ds = out_ds.union(rd.from_arrow(tbl))
    return out_ds
