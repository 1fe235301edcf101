"""Distributed EXACT quantiles over integer-quantized values.

Scale shape: quantize values to ints (the engine's money-math convention,
numerics.sql_round), count per (group, value) inside each batch
(vectorized np.unique), tree-combine the tiny count partials
(pipelines.relational.tree_group_sum — no shuffle), and resolve ranks on
the driver with one cumsum per group. Exact at any data size because
counts are exact ints and the domain is the QUANTIZED value set — bounded
by the value range (e.g. <= 10^6 distinct cents for [0, 10^4] money),
independent of row count. This is the histogram-quantile trade: sketches
(t-digest/KLL) approximate on unbounded domains; quantization makes the
domain finite so the histogram is the exact answer.

Rank convention (pinned so a SQL oracle can mirror it bit-for-bit):
``quantile q of n values = the smallest value whose cumulative count >=
ceil(q * n)`` — lower-step discrete quantile, 1-based. The matching SQL
is a windowed cumsum, NOT quantile_disc (whose interpolation rule would
have to be trusted rather than pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def group_value_counts(ds, group_col: str, value_col: str, quantize: float = 1000.0):
    """Dataset -> driver DataFrame of exact counts per (group, qv) where
    qv = sql_round(value * quantize) as int64. Partials are one row per
    distinct (group, qv) per batch; the tree combine keeps the driver
    volume at O(groups x distinct quantized values)."""
    from ..numerics import sql_round
    from ..pipelines.relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        qv = sql_round(b[value_col].to_numpy(zero_copy_only=False) * quantize).astype(np.int64)
        df = pd.DataFrame({group_col: g, "qv": qv, "n": 1})
        out = df.groupby([group_col, "qv"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), [group_col, "qv"], value_cols=["n"])


def exact_quantiles(ds, group_col: str, value_col: str, qs: list[float], quantize: float = 1000.0) -> pd.DataFrame:
    """Per-group exact quantiles at the pinned rank convention. Returns one
    row per group with a ``q<percent>`` int64 column per requested q (the
    QUANTIZED value — divide by `quantize` for the float)."""
    counts = group_value_counts(ds, group_col, value_col, quantize)
    rows = []
    for gname, g in counts.groupby(group_col):
        g = g.sort_values("qv")
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        vals = g["qv"].to_numpy()
        rec = {group_col: gname, "n": n}
        for q in qs:
            target = int(np.ceil(q * n))
            rec[f"q{int(round(q * 100))}"] = int(vals[np.searchsorted(cum, max(target, 1))])
        rows.append(rec)
    return pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)
