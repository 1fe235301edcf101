"""bucketed_key_apply: whole-key-per-bucket invariant, bounded dispatch,
string keys, and schema-stable empty bucket results."""

import numpy as np
import pandas as pd

from geospatialtools_ray.stages.keyapply import (
    bucketed_key_apply,
    key_bucket_of,
    key_run_starts,
    run_start_index,
)


def test_key_bucket_whole_key_and_determinism():
    ints = np.arange(10_000, dtype=np.int64) % 777
    b1 = key_bucket_of(ints, 64)
    b2 = key_bucket_of(ints, 64)
    assert (b1 == b2).all()
    # every key maps to exactly one bucket
    assert pd.DataFrame({"k": ints, "b": b1}).groupby("k")["b"].nunique().max() == 1
    assert b1.min() >= 0 and b1.max() < 64
    strs = np.array([f"user-{i % 55}" for i in range(1000)], dtype=object)
    sb = key_bucket_of(strs, 16)
    assert (sb == key_bucket_of(strs, 16)).all()
    assert pd.DataFrame({"k": strs, "b": sb}).groupby("k")["b"].nunique().max() == 1


def test_run_helpers():
    k = np.array([3, 3, 3, 7, 7, 9])
    new = key_run_starts(k)
    assert new.tolist() == [True, False, False, True, False, True]
    assert run_start_index(new).tolist() == [0, 0, 0, 3, 3, 5]
    assert key_run_starts(np.array([])).tolist() == []


def test_bucketed_key_apply_sees_whole_keys(ray_session):
    """Each kernel invocation receives complete key groups; a per-key sum
    computed inside buckets equals the global per-key sum, and dispatch
    count == populated buckets (bounded), not key count."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5_000, 60_000).astype("int64"),
            "v": rng.integers(0, 100, 60_000).astype("int64"),
        }
    )
    calls = []

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        calls.append(len(g))
        return g.groupby("k", as_index=False)["v"].sum()

    got = (
        bucketed_key_apply(rd.from_pandas(df).repartition(16), "k", kernel, num_buckets=32)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_key_apply_empty_kernel_results(ray_session):
    """Buckets whose kernel returns zero rows keep the column contract."""
    import ray.data as rd

    df = pd.DataFrame({"k": np.arange(100, dtype="int64"), "v": np.ones(100, dtype="int64")})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["k"] < 3]  # most buckets end up empty
        return pd.DataFrame({"k": g["k"].astype("int64"), "v2": (g["v"] * 2).astype("int64")})

    got = bucketed_key_apply(rd.from_pandas(df), "k", kernel, num_buckets=16).to_pandas()
    assert sorted(got.columns) == ["k", "v2"]
    assert sorted(got["k"].tolist()) == [0, 1, 2]
