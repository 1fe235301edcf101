"""Join strategy helpers — the explicit decision rule of the guide:

- broadcast map (ray.put + searchsorted/dict) when one side fits a worker
  (dimension tables, vocab, indexes) — used by q3/q5, kNN, spatial join;
- `Dataset.join` (hash-partitioned shuffle) when BOTH sides are large;
- semi/anti: broadcast the key set and filter in map_batches.
"""

from __future__ import annotations


def hash_join(left, right, on: str, right_on: str | None = None, num_partitions: int = 16, join_type: str = "inner"):
    """Large-large equi-join via Ray's native hash-partitioned Dataset.join.
    Both sides shuffle on the key; use only when neither side fits a worker
    (document the partition count and salt hot keys upstream)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def broadcast_semi_join(ds, keys_ref, key_col: str, anti: bool = False):
    """Semi/anti join against a broadcast sorted key array."""
    import numpy as np
    import pyarrow as pa

    def fil(batch: pa.Table) -> pa.Table:
        import ray

        keys = ray.get(keys_ref) if hasattr(keys_ref, "hex") else keys_ref
        v = batch[key_col].to_numpy(zero_copy_only=False)
        hit = np.isin(v, keys)
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(fil, batch_format="pyarrow")
