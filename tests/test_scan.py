"""stages/scan.py: the two-phase distributed ordered prefix sum must equal
a literal sorted cumsum for any block layout, bucket width, and key
sparsity; sequence packing must match the stream rule."""

import numpy as np
import pandas as pd
import pytest

from geospatialtools_ray.stages.scan import ordered_prefix_sum, pack_sequences


def _ds(keys, vals, blocks=7):
    import ray.data as rd

    df = pd.DataFrame({"k": np.asarray(keys, dtype=np.int64), "v": np.asarray(vals, dtype=np.int64)})
    return rd.from_pandas(df, override_num_blocks=blocks)


@pytest.mark.parametrize("bucket_width", [1, 16, 1 << 14])
def test_ordered_prefix_sum_matches_sorted_cumsum(ray_session, bucket_width):
    rng = np.random.default_rng(11)
    # sparse, shuffled, non-contiguous keys (gaps across buckets)
    keys = rng.choice(200_000, size=900, replace=False)
    vals = rng.integers(0, 50, size=900)
    got = (
        ordered_prefix_sum(_ds(keys, vals), "k", "v", bucket_width=bucket_width)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    order = np.argsort(keys)
    want = pd.DataFrame({"k": keys[order], "v": vals[order], "cum": vals[order].cumsum()})
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_pack_sequences_stream_rule(ray_session):
    rng = np.random.default_rng(5)
    keys = np.arange(300)
    toks = rng.integers(1, 900, size=300)
    got = (
        pack_sequences(_ds(keys, toks).map_batches(lambda b: b.rename_columns(["doc_id", "n_tokens"]),
                                                   batch_format="pyarrow"),
                       "doc_id", "n_tokens", seq_len=512, bucket_width=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    start = np.concatenate([[0], toks.cumsum()])[:-1]
    assert (got["seq_id"].to_numpy() == start // 512).all()
    assert (got["seq_offset"].to_numpy() == start % 512).all()
    # a doc longer than seq_len still belongs to the sequence it starts in
    assert (toks > 512).any()


def test_ordered_prefix_sum_recursive_level_bitexact(ray_session):
    """Force the recursive Dataset-side base computation (bucket table
    'too big for the driver') and assert it equals the driver path."""
    rng = np.random.default_rng(3)
    keys = rng.choice(100_000, size=700, replace=False)
    vals = rng.integers(0, 30, size=700)
    direct = (
        ordered_prefix_sum(_ds(keys, vals), "k", "v", bucket_width=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    recursive = (
        ordered_prefix_sum(_ds(keys, vals), "k", "v", bucket_width=8, max_driver_buckets=10)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct.astype("int64"), recursive.astype("int64"))
