"""Distributed ordered prefix sum (the parallel-scan primitive) and the
sequence-packing operator built on it.

Ray Data blocks carry no global order, so an ORDER BY prefix sum cannot be
a single streaming pass. The classic two-phase scan:

1. bucket every row by its order key (``bucket = order_key // bucket_width``
   — contiguous key ranges, so bucket order == key order);
2. per-bucket token sums via per-batch partials + the shuffle-free tree
   combine (driver sees ONE row per bucket);
3. driver prefix-sums the tiny bucket table into per-bucket base offsets
   (broadcast once);
4. one ``groupby(bucket).map_groups`` pass: sort within the bucket (bounded
   by bucket_width keys, never the table), local cumsum + the bucket base.

Total moved volume: one shuffle on the bucket key (the map_groups) plus a
buckets-sized driver table — the same shape at 500 rows and 10^12. The
GPT-style training-data use is sequence packing: concatenate documents in
a pinned order into fixed-length token windows; each document's sequence
id and offset are pure functions of the prefix sum, so a SQL oracle
(SUM() OVER (ORDER BY ...)) can check the distributed scan exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def ordered_prefix_sum(ds, order_col: str, value_col: str, bucket_width: int = 1 << 14):
    """Dataset -> Dataset with an exact ``cum`` column = sum of value_col
    over all rows with order_col <= this row's (order keys must be unique
    non-negative integers). Output rows keep (order_col, value_col, cum).
    """
    import ray
    from ..pipelines.relational import tree_group_sum

    def bucket_partial(b: pa.Table) -> pa.Table:
        k = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"bucket": k // bucket_width, "s": v})
        return pa.Table.from_pandas(df.groupby("bucket", as_index=False)["s"].sum(), preserve_index=False)

    bsums = tree_group_sum(ds.map_batches(bucket_partial, batch_format="pyarrow"), ["bucket"], value_cols=["s"])
    bsums = bsums.sort_values("bucket").reset_index(drop=True)
    bids = bsums["bucket"].to_numpy(dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(bsums["s"].to_numpy(dtype=np.int64))])[:-1]
    base_ref = ray.put((bids, base))

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                order_col: pa.array(k, type=pa.int64()),
                value_col: pa.array(
                    b[value_col].to_numpy(zero_copy_only=False).astype(np.int64), type=pa.int64()
                ),
                "bucket": pa.array(k // bucket_width, type=pa.int64()),
            }
        )

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        bids_l, base_l = ray.get(base_ref)
        g = g.sort_values(order_col).reset_index(drop=True)
        b0 = int(base_l[np.searchsorted(bids_l, int(g["bucket"].iloc[0]))])
        cum = g[value_col].to_numpy(dtype=np.int64).cumsum() + b0
        return pd.DataFrame({order_col: g[order_col], value_col: g[value_col], "cum": cum})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan_group, batch_format="pandas")
    )


def pack_sequences(ds, order_col: str, tokens_col: str, seq_len: int, bucket_width: int = 1 << 14):
    """Assign each document to its fixed-length training sequence: docs are
    concatenated in order_col order into a token stream cut every seq_len
    tokens; a doc belongs to the sequence where it STARTS (stream packing
    — the pinned rule a SQL window mirror can reproduce). Adds ``seq_id``
    and ``seq_offset`` columns."""

    scanned = ordered_prefix_sum(ds, order_col, tokens_col, bucket_width)

    def finish(b: pa.Table) -> pa.Table:
        cum = b["cum"].to_numpy(zero_copy_only=False)
        tok = b[tokens_col].to_numpy(zero_copy_only=False)
        start = cum - tok
        return pa.table(
            {
                order_col: b[order_col],
                tokens_col: b[tokens_col],
                "seq_id": pa.array(start // seq_len, type=pa.int64()),
                "seq_offset": pa.array(start % seq_len, type=pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")
