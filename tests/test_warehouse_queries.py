"""DuckDB parity for the round-4 warehouse/analytics query shapes
(pipelines/windowqueries.py et al., split round 5): window prefix-sum, grouped top-k, pivot,
deterministic hash sample, exact count-distinct, JSON field extraction,
embedding centroids, term document-frequency, exact quantiles.

The driver harness (tools/check_correctness.py) covers the full registry
at sf0.01; this module pins the NEW entries in CI at sf0.001 with the
same sorted-frame compare."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NEW_QUERIES = [
    "events_user_running_total",
    "docs_top3_by_lang",
    "events_type_hour_pivot",
    "docs_hash_sample",
    "events_daily_distinct_users",
    "events_props_bucket",
    "embeddings_label_centroid",
    "docs_term_df",
    "events_value_quantiles",
    "events_corr_value_k",
    "docs_top_term_per_lang",
    "events_users_no_purchase",
    "events_rollup_type_hour",
    "events_signup_funnel",
    "docs_sample_k",
    "docs_decontaminate",
    "docs_chunk_windows",
    "docs_repetition_stats",
    "events_props_redact",
    "docs_stratified_sample",
    "geo_adaptive_cover",
    "docs_cover_join",
    "q10_returned_items",
    "docs_radius_join",
    "docs_weighted_sample",
    "docs_pack_sequences",
    "docs_chunk_dedup",
    "docs_shuffle_rank",
    "docs_dup_spans",
    "docs_frequent_ngrams",
    "embed_semantic_dedup",
    "q18_large_orders",
    "q4_order_priority",
    "events_hll_registers",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "events_cms_registers",
    "docs_training_prep",
    "q13_customer_orders",
    "q17_small_qty_revenue",
    "q22_idle_balance",
    "q7_nation_volume",
    "docs_inverted_index",
    "docs_bm25_topk",
    "embeddings_quantize",
    "events_cohort_retention",
    "events_user_value_delta",
    "q8_market_share",
    "q19_branded_revenue",
]


@pytest.fixture(scope="module")
def entry(ray_session):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ray_entry_under_test", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "nation", "lineitem", "orders", "customer", "part", "supplier", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_duckdb_oracle(entry, oracle_con, name):
    res = entry.queries()[name](SF)
    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    oracle = oracle_con.execute(entry.oracle_sql()[name]).df()
    cols = sorted(res.columns)
    assert cols == sorted(oracle.columns), f"{name}: column sets differ"
    r = res[cols].sort_values(cols).reset_index(drop=True)
    o = oracle[cols].sort_values(cols).reset_index(drop=True)
    assert len(r) == len(o), f"{name}: row counts {len(r)} vs {len(o)}"
    pd.testing.assert_frame_equal(
        r, o, check_dtype=False, check_exact=True, obj=name
    )


def test_empty_result_paths_match_oracle(entry, tmp_path):
    """Code-review finding: all-empty partials used to collapse to a
    key-only frame and KeyError in the callers. Build a corpus with zero
    signups and zero JSON 'k' matches; engine and oracle must both return
    the same EMPTY frames."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    n = 50
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(
                np.asarray(np.arange(n) * 3_600_000_000, dtype="int64").astype("datetime64[us]")
            ),
            "user_id": pa.array(np.arange(n) % 7, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.linspace(1, 99, n), type=pa.float64()),
            "props": pa.array(['{"z": 1}'] * n),
        }
    )
    pq.write_table(t, f"{sf}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    for name in ("events_signup_funnel", "events_props_bucket"):
        res = entry.queries()[name](sf)
        if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        oracle = con.execute(entry.oracle_sql()[name]).df()
        assert len(res) == 0 and len(oracle) == 0, name
        assert sorted(res.columns) == sorted(oracle.columns), name


def test_chunk_rule_null_and_empty_docs_match_oracle(ray_session):
    """The pinned one-empty-chunk rule on degenerate documents (empty,
    whitespace-only, NULL text): engine kernel and both chunk SQL oracles
    must agree — sf corpora contain no such docs, so this is the only
    guard on the COALESCE handling in the oracles."""
    import ray.data as rd

    from geospatialtools_ray.pipelines import hygienequeries as X
    from geospatialtools_ray.stages.dedup import chunk_exact_dedup
    from geospatialtools_ray.stages.text import chunk_windows_df

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["a b c", "", "   ", None]}
    ).astype({"doc_id": "int64"})
    con = duckdb.connect()
    con.register("documents", docs)

    # window-chunker rule: kernel vs oracle (4 docs -> 4 rows, 3 empty chunks)
    eng = chunk_windows_df(docs, "doc_id", "text", X.CHUNK_TOKENS)
    eng = eng.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    ora = con.execute(X.DOCS_CHUNK_WINDOWS_SQL).df()
    cols = sorted(eng.columns)
    assert sorted(ora.columns) == cols
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols).reset_index(drop=True),
        ora[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )
    assert (eng["chunk_text"] == "").sum() == 3

    # chunk dedup: the three degenerate docs share ONE empty chunk owned by
    # doc 2 — engine vs oracle
    out = chunk_exact_dedup(rd.from_pandas(docs)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    ora2 = con.execute(X.DOCS_CHUNK_DEDUP_SQL).df()
    cols2 = sorted(out.columns)
    assert sorted(ora2.columns) == cols2
    pd.testing.assert_frame_equal(
        out[cols2].sort_values(cols2).reset_index(drop=True),
        ora2[cols2].sort_values(cols2).reset_index(drop=True),
        check_dtype=False,
    )
    assert out.loc[out["doc_id"] == 2, "n_kept"].iloc[0] == 1
    assert out.loc[out["doc_id"].isin([3, 4]), "n_dropped"].tolist() == [1, 1]


def test_decontaminate_empty_docs_match_oracle(ray_session, tmp_path):
    """An empty eval doc and an empty train doc share the degenerate
    zero-word gram (engine: fold of zero words = hash 0; oracle: COALESCE''
    short-doc gram) — the train doc must be flagged by BOTH engines, and a
    corpus with empty docs on only one side must flag nothing extra.
    doc_id 8 is in the pinned 5% eval slice; 1-3 are train."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    t = pa.table(
        {
            "doc_id": pa.array([8, 1, 2, 3], type=pa.int64()),
            "text": pa.array(["", "", "w1 w2 w3 w4 w5 w6", "   "]),
        }
    )
    pq.write_table(t, f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

    from geospatialtools_ray.pipelines import hygienequeries as X

    eng = X.docs_decontaminate(sf)
    ora = con.execute(X.DOCS_DECONTAMINATE_SQL).df()
    cols = sorted(eng.columns)
    assert sorted(ora.columns) == cols
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols).reset_index(drop=True),
        ora[cols].sort_values(cols).reset_index(drop=True).astype({c: "int64" for c in cols}),
    )
    # both empty-ish train docs (1: empty, 3: whitespace) hit the empty eval
    # gram; doc 2 shares no 5-gram with the eval side
    assert eng["doc_id"].tolist() == [1, 3]
    assert eng["n_hits"].tolist() == [1, 1]


def test_hll_estimate_accuracy(entry, oracle_con):
    """The register table is hash-checked against the SQL twin above; this
    pins the other half of the contract — the ESTIMATE those registers
    produce tracks the exact distinct count (m=4096 -> sigma ~1.6%)."""
    from geospatialtools_ray.pipelines.windowqueries import hll_estimate

    regs = entry.queries()["events_hll_registers"](SF)
    exact = oracle_con.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_q14_shuffle_path_matches_broadcast(entry, oracle_con, monkeypatch):
    """q14's dimension plan is measured; force the hash-join fallback and
    assert it returns the same row as the broadcast path / the oracle."""
    from geospatialtools_ray.pipelines import relational as R

    broadcast = R.q14_promo_revenue(SF)
    monkeypatch.setenv("GRAFT_BROADCAST_LIMIT", "1")
    shuffled = R.q14_promo_revenue(SF)
    pd.testing.assert_frame_equal(broadcast, shuffled, check_exact=True)
    oracle = oracle_con.execute(entry.oracle_sql()["q14_promo_revenue"]).df()
    cols = sorted(oracle.columns)
    pd.testing.assert_frame_equal(
        shuffled[cols].reset_index(drop=True), oracle[cols].reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )


def test_cms_point_query_guarantee(entry, oracle_con):
    """CMS contract: every point estimate >= the true count (never under),
    and the overshoot on the heaviest keys stays within eps*N (w=1024 ->
    eps ~ 2.7e-3 per the e/w bound)."""
    from geospatialtools_ray.pipelines.windowqueries import cms_point_estimate

    regs = entry.queries()["events_cms_registers"](SF)
    truth = oracle_con.execute(
        "SELECT user_id, COUNT(*) c FROM events GROUP BY 1 ORDER BY c DESC"
    ).df()
    n_total = int(truth["c"].sum())
    for _, r in truth.iterrows():
        est = cms_point_estimate(regs, int(r["user_id"]))
        assert est >= int(r["c"]), (int(r["user_id"]), est, int(r["c"]))
        assert est - int(r["c"]) <= max(1, int(0.01 * n_total)), (est, int(r["c"]), n_total)


def test_q6_q14_empty_window_pinned_zero(entry, tmp_path):
    """Both engines pin the empty-window result: q6 revenue 0.0 (COALESCE'd
    SUM), q14 ratios 0.0 instead of NULL / ZeroDivisionError. Corpus has
    lineitem rows only OUTSIDE the pinned 1996 window."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    n = 10
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n), type=pa.int64()),
                "l_partkey": pa.array(np.arange(n), type=pa.int64()),
                "l_extendedprice": pa.array(np.linspace(10, 99, n)),
                "l_discount": pa.array(np.full(n, 0.06)),
                "l_quantity": pa.array(np.full(n, 5.0)),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("1994-06-01", "us"))
                ),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    pq.write_table(
        pa.table({"p_partkey": pa.array(np.arange(n), type=pa.int64()),
                  "p_type": pa.array(["PROMO"] * n)}),
        f"{sf}/part.parquet",
    )
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    for name in ("q6_forecast_revenue", "q14_promo_revenue"):
        res = entry.queries()[name](sf)
        oracle = con.execute(entry.oracle_sql()[name]).df()
        cols = sorted(oracle.columns)
        pd.testing.assert_frame_equal(
            res[cols].reset_index(drop=True), oracle[cols].reset_index(drop=True),
            check_dtype=False, check_exact=True, obj=name,
        )
        assert float(res.iloc[0, 0]) == 0.0 or name == "q6_forecast_revenue"


def test_q17_shuffle_path_matches_broadcast(entry, monkeypatch):
    """q17's part-dimension plan is measured; force the hash-join fallback
    and assert it returns the same single-row result as broadcast."""
    from geospatialtools_ray.pipelines import relational as R

    broadcast = R.q17_small_qty_revenue(SF)
    monkeypatch.setenv("GRAFT_BROADCAST_LIMIT", "1")
    shuffled = R.q17_small_qty_revenue(SF)
    pd.testing.assert_frame_equal(broadcast, shuffled, check_exact=True)


def test_q13_zero_bucket_counting_identity(entry, tmp_path):
    """The LEFT OUTER zero bucket: a customer whose only orders carry the
    excluded priority must land in c_count=0 (sf0.001 has no such customer,
    so build one). Oracle = the same LEFT JOIN in DuckDB over the fixture."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from geospatialtools_ray.pipelines import relational as R

    pq.write_table(
        pa.table({"c_custkey": np.arange(1, 6, dtype=np.int64)}),
        tmp_path / "customer.parquet",
    )
    # customer 5 has ONLY excluded-priority orders; 4 has none at all;
    # custkey 99 is an ORPHAN (no customer row) whose orders the LEFT
    # JOIN must ignore entirely (review finding: it must neither surface
    # in a positive bucket nor shrink the zero bucket)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([10, 11, 12, 13, 14, 15], type=pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 3, 5, 99], type=pa.int64()),
            "o_orderpriority": ["2-HIGH", "3-MEDIUM", "2-HIGH", "1-URGENT", "1-URGENT", "2-HIGH"],
        }),
        tmp_path / "orders.parquet",
    )
    out = R.q13_customer_orders_dist(str(tmp_path))
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    oracle = con.execute(R.Q13_SQL).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), oracle.reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )
    assert int(out.loc[out["c_count"] == 0, "custdist"].iloc[0]) == 3


def test_inverted_index_degenerate_docs(ray_session, tmp_path):
    """Bigram edge rule: empty, single-word, whitespace-only and NULL
    documents emit no grams; a two-word doc emits exactly one; repeated
    bigrams within one doc post once (DISTINCT pairs). Oracle = the same
    SQL over the fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geospatialtools_ray.pipelines import retrievalqueries as X

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "text": ["a b", "", "solo", "   ", None, "a b a b"],
        }),
        tmp_path / "documents.parquet",
    )
    out = X.docs_inverted_index(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(X.DOCS_INVERTED_INDEX_SQL).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), oracle.reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )
    ab = out[out["gram"] == "a b"]
    assert ab["postings"].iloc[0] == "1,6" and int(ab["df"].iloc[0]) == 2


def test_bloom_runtime_filter_join_parity(ray_session):
    """filtered_hash_join must be bit-identical to hash_join on inner
    joins (no false negatives by construction; false positives fall out of
    the join), and the prefilter must actually drop non-candidate rows."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from geospatialtools_ray.pipelines.joins import (
        bloom_from_keys, bloom_prefilter, filtered_hash_join, hash_join,
    )

    rng = np.random.default_rng(7)
    left = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 100_000, 20_000), type=pa.int64()),
        "v": pa.array(np.arange(20_000, dtype=np.int64)),
    })).repartition(8)
    rkeys = np.unique(rng.integers(0, 100_000, 300)).astype(np.int64)
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rkeys), "w": pa.array(rkeys * 10),
    })).repartition(4)

    plain = hash_join(left, right, on="k", right_on="rk").to_pandas()
    filt = filtered_hash_join(left, right, on="k", right_on="rk",
                              expected_right_keys=len(rkeys)).to_pandas()
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        filt[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True,
    )

    # no false negatives + real selectivity: every true key survives the
    # prefilter, and the kept fraction is near the true match rate
    bloom = bloom_from_keys(right, "rk", expected_keys=len(rkeys))
    kept = bloom_prefilter(left, "k", ray.put(bloom)).to_pandas()
    true_mask = np.isin(left.to_pandas()["k"].to_numpy(), rkeys)
    assert int(true_mask.sum()) == len(plain)
    assert len(kept) >= int(true_mask.sum())
    assert len(kept) <= int(true_mask.sum()) + int(0.05 * 20_000)  # fp budget


def test_salted_hash_join_parity_under_skew(ray_session):
    """salted_hash_join must return exactly the plain join's multiset under
    heavy skew — one key holding ~50% of the fact side, duplicate keys on
    BOTH sides (each left row must meet each matching right row exactly
    once, across all salts), plus the no-hot-keys fallback path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geospatialtools_ray.pipelines.joins import hash_join, salted_hash_join

    rng = np.random.default_rng(3)
    n = 40_000
    k = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 5_000, n))
    left = rd.from_arrow(pa.table({
        "k": pa.array(k, type=pa.int64()),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    })).repartition(8)
    # right: the hot key appears TWICE (duplicate), plus 400 cold keys
    rk = np.concatenate([[7, 7], np.unique(rng.integers(0, 5_000, 400))]).astype(np.int64)
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rk), "w": pa.array(np.arange(len(rk), dtype=np.int64)),
    })).repartition(4)

    plain = hash_join(left, right, on="k", right_on="rk").to_pandas()
    salted = salted_hash_join(left, right, on="k", right_on="rk", n_salts=8).to_pandas()
    cols = sorted(plain.columns)
    assert sorted(salted.columns) == cols
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        salted[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True,
    )
    # the hot key's rows meet BOTH duplicate right rows
    assert (plain["k"] == 7).sum() == 2 * (k == 7).sum()

    # uniform keys -> no hot keys detected -> plain-join fallback, same rows
    ul = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 30_000, 20_000), type=pa.int64()),
        "v": pa.array(np.arange(20_000, dtype=np.int64)),
    })).repartition(4)
    pu = hash_join(ul, right, on="k", right_on="rk").to_pandas()
    su = salted_hash_join(ul, right, on="k", right_on="rk").to_pandas()
    pd.testing.assert_frame_equal(
        pu[cols].sort_values(cols).reset_index(drop=True),
        su[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True,
    )


def test_filtered_hash_join_empty_right(ray_session):
    """Degenerate runtime-filter edge: an empty right side builds an
    all-zeros Bloom (everything filtered), and the inner join must return
    the typed empty result rather than crash."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geospatialtools_ray.pipelines.joins import filtered_hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "v": pa.array(np.arange(100, dtype=np.int64)),
    })).repartition(4)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([], type=pa.int64()), "w": pa.array([], type=pa.int64()),
    }))
    out = filtered_hash_join(left, right, on="k", right_on="rk").to_pandas()
    assert len(out) == 0


def test_salted_join_same_name_keys(ray_session):
    """The right_on=None default (same key name both sides) used to crash
    with a duplicate 'k' field after the packed-key join (review finding,
    probe-confirmed) — parity against the plain join under skew."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geospatialtools_ray.pipelines.joins import hash_join, salted_hash_join

    rng = np.random.default_rng(9)
    k = np.where(rng.random(20_000) < 0.5, 3, rng.integers(0, 2_000, 20_000)).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(k), "v": pa.array(np.arange(20_000, dtype=np.int64))})).repartition(8)
    rk = np.concatenate([[3], np.unique(rng.integers(0, 2_000, 200))]).astype(np.int64)
    right = rd.from_arrow(pa.table({"k": pa.array(rk), "w": pa.array(rk + 1)})).repartition(2)
    plain = hash_join(left, right, on="k").to_pandas()
    salted = salted_hash_join(left, right, on="k", n_salts=8).to_pandas()
    cols = sorted(plain.columns)
    assert sorted(salted.columns) == cols
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        salted[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True,
    )


def test_degenerate_corpora_match_oracle(entry, tmp_path):
    """Review-finding edges, each vs its DuckDB oracle on a purpose-built
    fixture: (a) q22 with NO post-cutoff orders (every rich customer is
    idle — the realistic TPC-H date range); (b) q13 where every order has
    the excluded priority (pure zero bucket); (c) BM25 over an all-empty
    corpus (scores pinned 0.0, no NaN ordering divergence)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geospatialtools_ray.pipelines import retrievalqueries as X
    from geospatialtools_ray.pipelines import relational as R

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, 9, dtype=np.int64)),
        "c_nationkey": pa.array(np.arange(8, dtype=np.int64) % 3),
        "c_acctbal": pa.array(np.linspace(-100, 900, 8)),
    }), f"{sf}/customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_orderdate": pa.array(np.array(["1997-01-01", "1997-06-01", "1998-01-01"], dtype="datetime64[us]")),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "1-URGENT"],
    }), f"{sf}/orders.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["", "   ", None],
    }), f"{sf}/documents.parquet")
    con = duckdb.connect()
    for t in ("customer", "orders", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    for name, fn, sql in (
        ("q22", R.q22_idle_balance, R.Q22_SQL),
        ("q13", R.q13_customer_orders_dist, R.Q13_SQL),
        ("bm25", X.docs_bm25_topk, X.DOCS_BM25_SQL),
    ):
        res = fn(sf)
        oracle = con.execute(sql).df()
        cols = sorted(res.columns)
        assert sorted(oracle.columns) == cols, name
        pd.testing.assert_frame_equal(
            res[cols].sort_values(cols).reset_index(drop=True),
            oracle[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False, check_exact=True, obj=name,
        )
    # q22: rich customers exist and NONE are active -> non-empty result
    assert R.q22_idle_balance(sf)["numcust"].sum() > 0
    # q13: the single row is the zero bucket
    q13 = R.q13_customer_orders_dist(sf)
    assert len(q13) == 1 and int(q13["c_count"].iloc[0]) == 0 and int(q13["custdist"].iloc[0]) == 8


def test_q8_empty_window_both_plans(entry, tmp_path, monkeypatch):
    """q8 with every order OUTSIDE the date window must return the empty
    frame on BOTH plans — the broadcast branch (len-guarded searchsorted)
    and the forced hash-join branch, whose empty-side crash the
    materialize+count guard now prevents (review finding)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geospatialtools_ray.pipelines import relational as R

    sf = str(tmp_path)
    pq.write_table(pa.table({"r_regionkey": pa.array([0], type=pa.int64()),
                             "r_name": ["EUROPE"]}), f"{sf}/region.parquet")
    pq.write_table(pa.table({"n_nationkey": pa.array([0], type=pa.int64()),
                             "n_name": ["NATION_7"],
                             "n_regionkey": pa.array([0], type=pa.int64())}), f"{sf}/nation.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array([1], type=pa.int64()),
                             "c_nationkey": pa.array([0], type=pa.int64())}), f"{sf}/customer.parquet")
    pq.write_table(pa.table({"s_suppkey": pa.array([1], type=pa.int64()),
                             "s_nationkey": pa.array([0], type=pa.int64())}), f"{sf}/supplier.parquet")
    pq.write_table(pa.table({"p_partkey": pa.array([1], type=pa.int64()),
                             "p_type": ["ECONOMY"]}), f"{sf}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderdate": pa.array(np.array(["1994-06-01"], dtype="datetime64[us]")),
    }), f"{sf}/orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_suppkey": pa.array([1], type=pa.int64()),
        "l_partkey": pa.array([1], type=pa.int64()),
        "l_extendedprice": pa.array([100.0]),
        "l_discount": pa.array([0.05]),
    }), f"{sf}/lineitem.parquet")

    broadcast = R.q8_market_share(sf)
    assert len(broadcast) == 0
    monkeypatch.setenv("GRAFT_BROADCAST_LIMIT", "1")
    shuffled = R.q8_market_share(sf)
    assert len(shuffled) == 0
    assert sorted(broadcast.columns) == sorted(shuffled.columns)
