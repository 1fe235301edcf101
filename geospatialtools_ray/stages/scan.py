"""Distributed ordered prefix sum (the parallel-scan primitive) and the
sequence-packing operator built on it.

Ray Data blocks carry no global order, so an ORDER BY prefix sum cannot be
a single streaming pass. The classic two-phase scan:

1. bucket every row by its order key (``bucket = order_key // bucket_width``
   — contiguous key ranges, so bucket order == key order); the keyed
   projection is materialized ONCE so the upstream lineage (read +
   tokenize) is never re-executed by the later passes;
2. per-bucket sums: per-batch partials + one groupby on the bucket key
   (the partials are pre-combined per batch, so the shuffle moves at most
   one row per (batch, bucket));
3. driver prefix-sums the tiny bucket table into per-bucket base offsets
   (broadcast once);
4. one ``groupby(bucket).map_groups`` pass: sort within the bucket (bounded
   by bucket_width keys, never the table), local cumsum + the bucket base.

When the bucket table itself outgrows the driver (10^12 keys at a small
width), the scan RECURSES: the per-bucket sums stay a Dataset, the same
scan runs over them at a coarser width to produce each bucket's exclusive
base, and the bases join back to the rows on the bucket key (one hash
join — the shuffle the driver collect would otherwise hide). The coarser
width is sized from the MAX bucket id (not the distinct count), so even
sparse bucket ids are guaranteed to reach the driver path after exactly
one recursion level; nothing ever materializes beyond the top level's
<= max_driver_buckets rows.

Total moved volume: one shuffle on the bucket key (the map_groups), plus
either a buckets-sized driver table (small case) or one extra bucket-key
join (large case). The GPT-style training-data use is sequence packing:
concatenate documents in a pinned order into fixed-length token windows;
each document's sequence id and offset are pure functions of the prefix
sum, so a SQL oracle (SUM() OVER (ORDER BY ...)) checks the distributed
scan exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# above this many buckets the base offsets are computed by a recursive
# Dataset-side scan + join instead of a driver collect
MAX_DRIVER_BUCKETS = 1_000_000


def _with_bucket(ds, order_col: str, value_col: str, bucket_width: int):
    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                order_col: pa.array(k, type=pa.int64()),
                value_col: pa.array(
                    b[value_col].to_numpy(zero_copy_only=False).astype(np.int64), type=pa.int64()
                ),
                "_scan_bucket": pa.array(k // bucket_width, type=pa.int64()),
            }
        )

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def ordered_prefix_sum(
    ds,
    order_col: str,
    value_col: str,
    bucket_width: int = 1 << 14,
    max_driver_buckets: int = MAX_DRIVER_BUCKETS,
):
    """Dataset -> Dataset with an exact ``cum`` column = sum of value_col
    over all rows with order_col <= this row's (order keys must be unique
    non-negative integers). Output rows keep (order_col, value_col, cum).
    """
    import ray
    from ray.data.aggregate import Max

    # materialize the keyed (order, value, bucket) projection once: both the
    # bucket-sum pass and the final scan read it, and re-running the upstream
    # lineage (parquet read + tokenize) twice would double the most expensive
    # stage of the query
    keyed = _with_bucket(ds, order_col, value_col, bucket_width).materialize()

    def bucket_partial(b: pa.Table) -> pa.Table:
        k = b["_scan_bucket"].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"_scan_bucket": k, "s": v})
        return pa.Table.from_pandas(df.groupby("_scan_bucket", as_index=False)["s"].sum(), preserve_index=False)

    partials = keyed.map_batches(bucket_partial, batch_format="pyarrow")

    # distinct buckets are bounded by (max key / bucket_width). Dispatch the
    # bucket-sum reduce on that bound: a tiny bucket table (the common case
    # — widths are sized for ~4k rows/bucket) takes the shuffle-free tree
    # combine straight to the driver frame the scan needs anyway; a large
    # one goes through sorted_group_agg and stays a Dataset for the
    # recursion path
    from ..pipelines.relational import sorted_group_agg, tree_group_sum

    mx = keyed.max(order_col) if keyed.count() else None
    est_buckets = (int(mx) // bucket_width + 1) if mx is not None else 0

    # (the second clause guarantees the driver branch below is taken, so the
    # tree path can never fall through to the recursion that needs a Dataset)
    if est_buckets <= 4096 and est_buckets <= max_driver_buckets:
        bsums = tree_group_sum(partials, ["_scan_bucket"], value_cols=["s"])
        bsums_ds = None
        n_buckets = len(bsums)
    else:
        bsums_ds = sorted_group_agg(partials, "_scan_bucket", {"s": "sum"}).materialize()
        n_buckets = bsums_ds.count()

    if n_buckets <= max_driver_buckets:
        if bsums_ds is not None:
            bsums = bsums_ds.to_pandas()
        bsums = bsums.sort_values("_scan_bucket").reset_index(drop=True)
        bids = bsums["_scan_bucket"].to_numpy(dtype=np.int64)
        base = np.concatenate([[0], np.cumsum(bsums["s"].to_numpy(dtype=np.int64))])[:-1]
        base_ref = ray.put((bids, base))

        def scan_group(g: pd.DataFrame) -> pd.DataFrame:
            bids_l, base_l = ray.get(base_ref)
            g = g.sort_values(order_col).reset_index(drop=True)
            b0 = int(base_l[np.searchsorted(bids_l, int(g["_scan_bucket"].iloc[0]))])
            cum = g[value_col].to_numpy(dtype=np.int64).cumsum() + b0
            return pd.DataFrame({order_col: g[order_col], value_col: g[value_col], "cum": cum})

        return keyed.groupby("_scan_bucket").map_groups(scan_group, batch_format="pandas")

    # recursive level: scan the bucket table itself, derive each bucket's
    # EXCLUSIVE base (cum - own sum), and join it back on the bucket key.
    # The coarser width is sized from the MAX bucket id, not the distinct
    # count: child ids are id // coarser <= max_id / coarser, so the child
    # is GUARANTEED <= max_driver_buckets distinct buckets even when this
    # level's ids are sparse (a count-based width could recurse unboundedly)
    from ..pipelines.joins import hash_join

    max_id = int(bsums_ds.aggregate(Max("_scan_bucket", alias_name="mx"))["mx"])
    coarser = max(int(np.ceil((max_id + 1) / max_driver_buckets)), 2)
    # the child level's order key is THIS level's bucket id; rename it so
    # the child's own _scan_bucket column cannot collide with its order key
    renamed = bsums_ds.map_batches(
        lambda b: pa.table({"okey": b["_scan_bucket"], "s": b["s"]}), batch_format="pyarrow"
    )
    scanned_buckets = ordered_prefix_sum(
        renamed, "okey", "s", bucket_width=coarser, max_driver_buckets=max_driver_buckets
    )

    def to_base(b: pa.Table) -> pa.Table:
        cum = b["cum"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_scan_bucket": b["okey"],
                "base": pa.array(cum - s, type=pa.int64()),
            }
        )

    base_ds = scanned_buckets.map_batches(to_base, batch_format="pyarrow")
    joined = hash_join(keyed, base_ds, on="_scan_bucket")

    def scan_group_joined(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).reset_index(drop=True)
        cum = g[value_col].to_numpy(dtype=np.int64).cumsum() + int(g["base"].iloc[0])
        return pd.DataFrame({order_col: g[order_col], value_col: g[value_col], "cum": cum})

    return joined.groupby("_scan_bucket").map_groups(scan_group_joined, batch_format="pandas")


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
