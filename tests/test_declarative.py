"""Declarative pipeline surface + stage-metrics sidecars."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from geospatialtools_ray import synth
from geospatialtools_ray.pipelines.declarative import PipelineStep, build_pipeline
from geospatialtools_ray.state.metrics import emit_stage_metrics, parse_stats


def test_declarative_geo_chain(ray_session):
    docs = synth.docs_dataset(200, override_num_blocks=2)
    out = build_pipeline(
        docs,
        [
            PipelineStep("explode", "explode_geo"),
            PipelineStep("cells", "attach_cell", {"res": 5}),
        ],
    )
    df = out.to_pandas()
    assert {"doc_id", "lon", "lat", "cell"} <= set(df.columns)
    assert len(df) > 0


def test_declarative_text_chain(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1, 1], "text": ["a b c", "d e", "d e"]}))
    out = build_pipeline(
        ds,
        [
            PipelineStep("tok", "token_count"),
            PipelineStep("dedup", "exact_dedup"),
        ],
    ).to_pandas()
    assert len(out) == 2 and out["dup_count"].sum() == 3


def test_declarative_unknown_op():
    with pytest.raises(ValueError, match="unknown op"):
        build_pipeline(None, [PipelineStep("bad", "nope")])


def test_stage_metrics_sidecar(ray_session, tmp_path):
    docs = synth.docs_dataset(500, override_num_blocks=2)
    out = build_pipeline(docs, [PipelineStep("explode", "explode_geo")]).materialize()
    path = emit_stage_metrics(out, str(tmp_path), "testrun")
    assert path and os.path.exists(path)
    rec = json.load(open(path))
    assert rec["stages"], "stats parsed to at least one stage"
    assert any(s["wall_sec"] >= 0 for s in rec["stages"])
    # second emit increments the sequence
    path2 = emit_stage_metrics(out, str(tmp_path), "testrun")
    assert path2 != path


def test_hash_join_and_semi_join(ray_session):
    import ray
    import ray.data as rd

    from geospatialtools_ray.pipelines.joins import broadcast_semi_join, hash_join

    a = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "x": ["a", "b", "c", "d"]}))
    b = rd.from_pandas(pd.DataFrame({"k2": [2, 3, 5], "y": [20, 30, 50]}))
    out = hash_join(a, b, on="k", right_on="k2", num_partitions=2).to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3] and out["y"].tolist() == [20, 30]
    keys = ray.put(np.asarray([1, 4]))
    semi = broadcast_semi_join(a, keys, "k").to_pandas()
    anti = broadcast_semi_join(a, keys, "k", anti=True).to_pandas()
    assert sorted(semi["k"]) == [1, 4] and sorted(anti["k"]) == [2, 3]


def test_q3_q5_join_strategy_selection(ray_session, monkeypatch):
    """Broadcast vs hash-shuffle selection (measured, not hard-coded):
    forcing the shuffle path via GRAFT_BROADCAST_LIMIT must give identical
    results to the broadcast path."""
    import pandas as pd

    from geospatialtools_ray.pipelines import relational as R

    sf = "/root/testdata/sf0.001"
    b3 = R.q3_top_orders(sf)
    b5 = R.q5_region_revenue(sf)
    b10 = R.q10_returned_items(sf)
    monkeypatch.setenv("GRAFT_BROADCAST_LIMIT", "1")
    s3 = R.q3_top_orders(sf)
    s5 = R.q5_region_revenue(sf)
    s10 = R.q10_returned_items(sf)
    pd.testing.assert_frame_equal(b3.reset_index(drop=True), s3.reset_index(drop=True))
    pd.testing.assert_frame_equal(b5.reset_index(drop=True), s5.reset_index(drop=True))
    pd.testing.assert_frame_equal(b10.reset_index(drop=True), s10.reset_index(drop=True))


def test_tree_group_sum_matches_groupby(ray_session):
    """tree_group_sum == a real groupby-sum on the same partial stream,
    including the empty-dataset and single-batch edges."""
    import ray.data as rd

    from geospatialtools_ray.pipelines.relational import tree_group_sum

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 3, 5000).astype(str),
            "k2": rng.integers(0, 4, 5000),
            "a": rng.integers(-1000, 1000, 5000),
            "b": rng.integers(0, 10, 5000),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    got = (
        tree_group_sum(ds, ["k1", "k2"], combine_batch=7)
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k1", "k2"], as_index=False)
        .sum()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"k2": "int64"}), want.astype({"k2": "int64"}))

    single = tree_group_sum(rd.from_pandas(df.head(10)), ["k1", "k2"])
    assert single["a"].sum() == df.head(10)["a"].sum()

    empty = tree_group_sum(rd.from_pandas(df.head(0)), ["k1", "k2"])
    assert len(empty) == 0


def test_sorted_group_agg_matches_ray_aggregate(ray_session):
    """sorted_group_agg (sort + per-block combine + boundary fix) must equal
    the plain groupby().aggregate at every cardinality shape: few hot keys,
    nearly-unique keys, keys engineered to straddle block boundaries, and
    single-key datasets."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from geospatialtools_ray.pipelines.relational import sorted_group_agg

    rng = np.random.default_rng(11)

    def check(keys, nblocks):
        n = len(keys)
        df = pd.DataFrame(
            {
                "k": keys,
                "a": rng.integers(-50, 50, n),
                "b": rng.integers(0, 1000, n),
            }
        )
        ds = rd.from_pandas(df, override_num_blocks=nblocks)
        got = (
            sorted_group_agg(ds, "k", {"a": "sum", "b": "min", "n": "count"})
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            ds.groupby("k")
            .aggregate(Sum("a", alias_name="a"), Min("b", alias_name="b"))
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want["n"] = df.groupby("k").size().sort_index().to_numpy()
        got = got[["k", "a", "b", "n"]].astype("int64")
        pd.testing.assert_frame_equal(got, want[["k", "a", "b", "n"]].astype("int64"))

    check(rng.integers(0, 5, 2000), 7)          # hot keys, every one cross-block
    check(rng.permutation(2000), 7)             # unique keys
    check(np.sort(rng.integers(0, 40, 2000)), 9)  # pre-sorted, long runs straddle
    check(np.zeros(500, dtype=np.int64), 5)     # ONE key spanning all blocks
    check(np.array([7], dtype=np.int64), 1)     # single row

    # null group keys fail LOUDLY (pandas groupby would silently drop them,
    # and the boundary merge cannot match NaN — silent data loss otherwise)
    nulls = rd.from_pandas(pd.DataFrame({"k": [1.0, None, 2.0], "a": [1, 2, 3]}))
    with pytest.raises(Exception, match="null values in group key"):
        sorted_group_agg(nulls, "k", {"a": "sum"}).materialize()

    # empty input: zero rows with the (key + value) schema preserved on the
    # Dataset (Ray's to_pandas drops columns at zero rows, so assert schema())
    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64"), "a": pd.Series([], dtype="int64")}))
    res = sorted_group_agg(empty, "k", {"a": "sum"})
    assert res.count() == 0 and sorted(res.schema().names) == ["a", "k"]

    # composite key: (k1, k2) pairs, min + count, vs the plain aggregate
    n = 3000
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 9, n),
            "k2": rng.integers(0, 11, n),
            "a": rng.integers(-50, 50, n),
        }
    )
    ds = rd.from_pandas(df, override_num_blocks=8)
    got = (
        sorted_group_agg(ds, ["k1", "k2"], {"a": "min", "n": "count"})
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = df.groupby(["k1", "k2"], as_index=False).agg(a=("a", "min"), n=("a", "size"))
    want = want.sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k1", "k2", "a", "n"]].astype("int64"), want.astype("int64"))
