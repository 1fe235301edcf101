"""Distributed as-of join vs a brute-force per-row oracle (both
directions, tolerance, inner/left) and the deterministic duplicate-time
tie rule."""

import numpy as np
import pandas as pd
import pytest

from geospatialtools_ray.stages.asof import asof_join


def _brute(L, R, direction, tol, join):
    rows = []
    for _, lr in L.iterrows():
        cand = R[R.k == lr.k]
        if direction == "backward":
            cand = cand[cand.t <= lr.t]
            if tol is not None:
                cand = cand[(lr.t - cand.t) <= tol]
            pick = cand.sort_values(["t", "rv"]).iloc[-1] if len(cand) else None
        else:
            cand = cand[cand.t >= lr.t]
            if tol is not None:
                cand = cand[(cand.t - lr.t) <= tol]
            pick = cand.sort_values(["t", "rv"]).iloc[0] if len(cand) else None
        if pick is None:
            if join == "left":
                rows.append((lr.k, lr.t, lr.lid, np.nan))
        else:
            rows.append((lr.k, lr.t, lr.lid, pick.rv))
    return pd.DataFrame(rows, columns=["k", "t", "lid", "rv"]).sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("join", ["inner", "left"])
def test_asof_join_matches_bruteforce(ray_session, direction, join):
    import ray.data as rd

    rng = np.random.default_rng(0)
    nl, nr = 400, 250
    L = pd.DataFrame(
        {
            "k": rng.integers(0, 15, nl),
            "t": rng.integers(0, 10_000, nl).astype("datetime64[s]").astype("datetime64[us]"),
            "lid": np.arange(nl),
        }
    )
    R = pd.DataFrame(
        {
            "k": rng.integers(0, 15, nr),
            "t": rng.integers(0, 10_000, nr).astype("datetime64[s]").astype("datetime64[us]"),
            "rv": rng.normal(size=nr),
        }
    )
    for tol in (None, np.timedelta64(600, "s")):
        got = (
            asof_join(
                rd.from_pandas(L).repartition(8),
                rd.from_pandas(R).repartition(8),
                "k", "t", ["lid"], ["rv"],
                direction=direction, tolerance=tol, join=join,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = _brute(L, R, direction, tol, join)
        pd.testing.assert_frame_equal(
            got[["k", "t", "lid", "rv"]].astype({"k": "int64", "lid": "int64"}).reset_index(drop=True),
            want.astype({"k": "int64", "lid": "int64"}),
            check_dtype=False,
        )


def test_asof_join_duplicate_time_tie_rule(ray_session):
    """Two right rows at the identical time: backward picks the LAST in
    (time, value) order — max value — regardless of input row order."""
    import ray.data as rd

    L = pd.DataFrame({"k": [1], "t": np.array([100], dtype="datetime64[s]").astype("datetime64[us]"), "lid": [0]})
    for perm in ([0, 1], [1, 0]):
        R = pd.DataFrame(
            {
                "k": [1, 1],
                "t": np.array([50, 50], dtype="datetime64[s]").astype("datetime64[us]"),
                "rv": [1.0, 2.0],
            }
        ).iloc[perm]
        got = asof_join(
            rd.from_pandas(L), rd.from_pandas(R).repartition(2), "k", "t", ["lid"], ["rv"]
        ).to_pandas()
        assert got["rv"].tolist() == [2.0]


def test_range_join_matches_bruteforce(ray_session):
    """Bucketed interval join == pandas brute force at several bucket
    widths (incl. degenerate 1 and wider-than-data); empty/inverted
    intervals match nothing; each pair appears exactly once."""
    import ray.data as rd

    from geospatialtools_ray.stages.rangejoin import range_join

    rng = np.random.default_rng(1)
    npts, nint = 1000, 150
    P = pd.DataFrame(
        {
            "k": rng.integers(0, 12, npts).astype("int64"),
            "t": rng.integers(0, 50_000, npts).astype("int64"),
            "pid": np.arange(npts, dtype="int64"),
        }
    )
    lo = rng.integers(0, 50_000, nint).astype("int64")
    ln = rng.integers(-500, 4000, nint).astype("int64")  # some inverted/empty
    I = pd.DataFrame(
        {
            "k": rng.integers(0, 12, nint).astype("int64"),
            "lo": lo,
            "hi": lo + ln,
            "iid": np.arange(nint, dtype="int64"),
        }
    )
    m = P.merge(I, on="k")
    want = (
        m[(m.lo <= m.t) & (m.t < m.hi)][["pid", "iid"]]
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    for w in (1, 1700, 100_000):
        got = (
            range_join(
                rd.from_pandas(P).repartition(6), rd.from_pandas(I).repartition(3),
                "k", "t", "lo", "hi", bucket_width=w,
                point_cols=["pid"], interval_cols=["iid"],
            )
            .to_pandas()[["pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype("int64")
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_boundary_straddle_stress(ray_session, direction):
    """Force the sorted-block boundary stitch: 64 partitions over a corpus
    dominated by one hot key (lefts vastly outnumber rights, so its run
    spans many blocks with long right-free prefixes), plus keys with NO
    right rows, plus equal-time pile-ups on both sides."""
    import ray.data as rd

    from geospatialtools_ray.stages.asof import asof_join

    rng = np.random.default_rng(7)
    nl = 3000
    k = np.where(rng.random(nl) < 0.6, 3, rng.integers(0, 20, nl))  # hot key 3
    L = pd.DataFrame(
        {
            "k": k.astype("int64"),
            # coarse grid -> many exact time ties
            "t": (rng.integers(0, 40, nl) * 100).astype("datetime64[s]").astype("datetime64[us]"),
            "lid": np.arange(nl),
        }
    )
    nr = 120
    rk = rng.integers(0, 15, nr)  # keys 15..19 never get rights
    R = pd.DataFrame(
        {
            "k": rk.astype("int64"),
            "t": (rng.integers(0, 40, nr) * 100).astype("datetime64[s]").astype("datetime64[us]"),
            "rv": rng.normal(size=nr).round(6),
        }
    )
    for tol, join in ((None, "inner"), (np.timedelta64(500, "s"), "left")):
        got = (
            asof_join(
                rd.from_pandas(L).repartition(64), rd.from_pandas(R).repartition(16),
                "k", "t", ["lid"], ["rv"],
                direction=direction, tolerance=tol, join=join,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = _brute(L, R, direction, tol, join)
        pd.testing.assert_frame_equal(
            got[["k", "t", "lid", "rv"]].astype({"k": "int64", "lid": "int64"}).reset_index(drop=True),
            want.astype({"k": "int64", "lid": "int64"}),
            check_dtype=False,
        )


def test_asof_join_stitch_cap_fails_loudly(ray_session):
    """A stitch bigger than max_stitch_rows raises with the bucketing hint
    instead of silently flooding the driver."""
    import ray.data as rd

    from geospatialtools_ray.stages.asof import asof_join

    L = pd.DataFrame(
        {
            "k": np.zeros(400, dtype="int64"),
            "t": np.arange(400).astype("datetime64[s]").astype("datetime64[us]"),
            "lid": np.arange(400),
        }
    )
    R = pd.DataFrame(
        {"k": [0], "t": np.array([0], dtype="datetime64[s]").astype("datetime64[us]"), "rv": [1.0]}
    )
    with pytest.raises(ValueError, match="pre-bucket"):
        asof_join(
            rd.from_pandas(L).repartition(32), rd.from_pandas(R),
            "k", "t", ["lid"], ["rv"], direction="forward", max_stitch_rows=5,
        ).to_pandas()
