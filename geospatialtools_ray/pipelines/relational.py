"""Driver-contract queries: Ray Data pipelines with exactly-mirrored DuckDB
oracle SQL (consumed by __ray_entry__.queries()/oracle_sql()).

Float-determinism convention (so order-insensitive value hashing matches):
- Aggregates are computed over INTEGER-quantized values (e.g. cents), so
  sums are exact in any summation order on both engines.
- Derived floats are produced by the SAME IEEE expression tree on both
  sides (identical operands, identical operation order), so results are
  bit-identical.
- Transcendental-heavy outputs (pow/log) are rounded to 6 decimals on both
  sides.

Every Ray implementation follows the scale rules: column-pruned reads,
vectorized batch kernels, partial aggregation before any shuffle, broadcast
small sides (ray.put) instead of shuffle joins, Dataset.join only for the
genuinely large-large case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None, **kw):
    from .. import io

    return io.read_named(sf_dir, table, columns=columns, **kw)


def _q100(arr):
    """Quantize to integer hundredths (exact money math)."""
    return np.round(np.asarray(arr, dtype=np.float64) * 100.0).astype(np.int64)


def tree_group_sum(partials_ds, keys: list[str], combine_batch: int = 4096,
                   value_cols: list[str] | None = None) -> pd.DataFrame:
    """Finish a per-batch partial aggregation whose GROUP CARDINALITY is
    tiny (tens, not thousands) without a shuffle: one map_batches combine
    level collapses up to `combine_batch` partial rows into <= G rows per
    output batch, then the driver merges the survivors. All value columns
    must be summable (integer partials stay exact in any merge order).

    Scale bound: TWO combine levels before the collect, so the driver sees
    O(input_blocks * G / combine_batch^2 * G) rows — with G<=100 groups and
    4096-row combine batches that stays a few thousand rows even at 10^7
    input blocks. (Combining is associative and the partials are exact
    ints, so stacking levels changes nothing semantically.) Replaces a
    full all-to-all groupby stage whose ~1 s startup dominated these
    sub-second aggregates at high parallelism (same lever as the flagship
    salt pre-pass)."""

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, as_index=False).sum()

    lvl = partials_ds.map_batches(combine, batch_format="pandas", batch_size=combine_batch)
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=combine_batch)
    df = lvl.to_pandas()
    if df.empty:
        # an all-empty collect loses column names entirely (Ray emits
        # blocks with an empty schema for all-empty pandas outputs), so
        # rebuild the frame from the caller-declared value columns —
        # callers whose partials can be empty on real corpora (no regex
        # match, no qualifying rows) MUST pass value_cols
        return df.reindex(columns=keys + (value_cols or []))
    return df.groupby(keys, as_index=False).sum()


# ---------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 flavor) — filter + grouped aggregate with
# per-batch partial aggregation (SURVEY.md 2.5 pattern)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "qty": _q100(batch["l_quantity"].to_numpy(zero_copy_only=False)),
                "price": _q100(batch["l_extendedprice"].to_numpy(zero_copy_only=False)),
                "disc": _q100(batch["l_discount"].to_numpy(zero_copy_only=False)),
                "tax": _q100(batch["l_tax"].to_numpy(zero_copy_only=False)),
            }
        )
        # disc_price/charge quantized to 1e-6 via integer products (exact):
        # price_c * (100 - disc_c) and price_c * (100-disc_c) * (100+tax_c)
        df["disc_price"] = df["price"] * (100 - df["disc"])
        df["charge"] = df["disc_price"] * (100 + df["tax"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_c=("qty", "sum"),
            sum_price_c=("price", "sum"),
            sum_disc_price_c=("disc_price", "sum"),
            sum_charge_c=("charge", "sum"),
            sum_disc_c=("disc", "sum"),
            count_order=("qty", "size"),
        )
        # charge is ~1.15e11 per ROW, so a global int64 sum overflows past
        # ~8e7 rows/group (SF>=100). Split the per-batch partial into
        # (hi, lo) = divmod(sum, 1e6): Sum(hi) overflows only past ~8e13
        # rows/group, and the driver reconstructs the exact integer total.
        # A per-batch partial itself stays exact (<=8e7 rows/batch).
        g["sum_charge_hi"], g["sum_charge_lo"] = divmod(g.pop("sum_charge_c"), 1_000_000)
        g["sum_dp_hi"], g["sum_dp_lo"] = divmod(g.pop("sum_disc_price_c"), 10_000)
        return pa.Table.from_pandas(g, preserve_index=False)

    # 15 groups max: tree-combine + driver merge, no shuffle stage
    df = (
        tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["l_returnflag", "l_linestatus"])
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    # exact integer reconstruction (Python ints are arbitrary precision;
    # float conversion then matches the oracle's CAST(total AS DOUBLE))
    df["sum_charge_c"] = [
        float(int(h) * 1_000_000 + int(l)) for h, l in zip(df["sum_charge_hi"], df["sum_charge_lo"])
    ]
    df["sum_disc_price_c"] = [
        float(int(h) * 10_000 + int(l)) for h, l in zip(df["sum_dp_hi"], df["sum_dp_lo"])
    ]
    n = df["count_order"].astype("int64")
    out = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["sum_qty_c"].astype("float64") / 100.0,
            "sum_base_price": df["sum_price_c"].astype("float64") / 100.0,
            "sum_disc_price": df["sum_disc_price_c"].astype("float64") / 10000.0,
            "sum_charge": df["sum_charge_c"].astype("float64") / 1000000.0,
            "avg_qty": (df["sum_qty_c"].astype("float64") / 100.0) / n.astype("float64"),
            "avg_price": (df["sum_price_c"].astype("float64") / 100.0) / n.astype("float64"),
            "avg_disc": (df["sum_disc_c"].astype("float64") / 100.0) / n.astype("float64"),
            "count_order": n,
        }
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum_qty_c AS DOUBLE)/100.0 AS sum_qty,
       CAST(sum_price_c AS DOUBLE)/100.0 AS sum_base_price,
       CAST(sum_disc_price_c AS DOUBLE)/10000.0 AS sum_disc_price,
       CAST(sum_charge_c AS DOUBLE)/1000000.0 AS sum_charge,
       (CAST(sum_qty_c AS DOUBLE)/100.0)/CAST(count_order AS DOUBLE) AS avg_qty,
       (CAST(sum_price_c AS DOUBLE)/100.0)/CAST(count_order AS DOUBLE) AS avg_price,
       (CAST(sum_disc_c AS DOUBLE)/100.0)/CAST(count_order AS DOUBLE) AS avg_disc,
       count_order
FROM (
  -- sums stay HUGEINT (no CAST AS BIGINT): the engine's (hi, lo) split
  -- partials are exact past int64, and the oracle must not error first
  SELECT l_returnflag, l_linestatus,
         SUM(qty) AS sum_qty_c,
         SUM(price) AS sum_price_c,
         SUM(price*(100-disc)) AS sum_disc_price_c,
         SUM(price*(100-disc)*(100+tax)) AS sum_charge_c,
         SUM(disc) AS sum_disc_c,
         COUNT(*) AS count_order
  FROM (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity*100) AS BIGINT) AS qty,
           CAST(round(l_extendedprice*100) AS BIGINT) AS price,
           CAST(round(l_discount*100) AS BIGINT) AS disc,
           CAST(round(l_tax*100) AS BIGINT) AS tax
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  ) GROUP BY l_returnflag, l_linestatus
) ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: top orders by revenue for one market segment — broadcast semi-join of
# the customer key set, broadcast orders dimension, partial revenue agg
# ---------------------------------------------------------------------------

def q3_top_orders(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    from .joins import broadcast_semi_join, hash_join, should_broadcast

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ckeys = cust.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    ).to_pandas()["c_custkey"].to_numpy()
    ckeys_ref = ray.put(np.sort(ckeys))
    cutoff = pd.Timestamp("1995-03-15")

    # filtered order dimension as a DATASET (no full-orders driver
    # materialization); the broadcast-vs-shuffle decision is measured
    odim_ds = broadcast_semi_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            lambda b: b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff))), batch_format="pyarrow"
        ),
        ckeys_ref,
        "o_custkey",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    if should_broadcast(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey", "o_orderdate"]):
        odim = odim_ds.to_pandas()  # the FILTERED dimension only
        okeys_ref = ray.put(np.sort(odim["o_orderkey"].to_numpy()))

        def partial(batch: pa.Table) -> pa.Table:
            okeys = ray.get(okeys_ref)
            b = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(cutoff)))
            ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
            keep = np.isin(ok, okeys)
            ok = ok[keep]
            rev = (
                _q100(b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
                * (100 - _q100(b["l_discount"].to_numpy(zero_copy_only=False)[keep]))
            )
            df = pd.DataFrame({"o_orderkey": ok, "rev": rev}).groupby("o_orderkey", as_index=False)["rev"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = (
            li.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderkey")
            .aggregate(Sum("rev", alias_name="rev"))
        )
        top = agg.sort(["rev", "o_orderkey"], descending=[True, False]).limit(10).to_pandas()
        top = top.merge(odim[["o_orderkey", "o_orderdate"]], on="o_orderkey", how="left")
    else:
        li_f = li.map_batches(
            lambda b: b.filter(pc.greater(b["l_shipdate"], pa.scalar(cutoff))).select(
                ["l_orderkey", "l_extendedprice", "l_discount"]
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(li_f, odim_ds, on="l_orderkey", right_on="o_orderkey")

        def partial_j(batch: pa.Table) -> pa.Table:
            rev = (
                _q100(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
                * (100 - _q100(batch["l_discount"].to_numpy(zero_copy_only=False)))
            )
            df = pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                    "o_orderdate": batch["o_orderdate"].to_pandas(),
                    "rev": rev,
                }
            ).groupby(["o_orderkey", "o_orderdate"], as_index=False)["rev"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = (
            joined.map_batches(partial_j, batch_format="pyarrow")
            .groupby(["o_orderkey", "o_orderdate"])
            .aggregate(Sum("rev", alias_name="rev"))
        )
        top = agg.sort(["rev", "o_orderkey"], descending=[True, False]).limit(10).to_pandas()
    out = pd.DataFrame(
        {
            "o_orderkey": top["o_orderkey"].astype("int64"),
            "revenue": top["rev"].astype("float64") / 10000.0,
            "o_orderdate": top["o_orderdate"].astype("datetime64[us]"),
        }
    )
    return out


Q3_SQL = """
SELECT o_orderkey, CAST(rev AS DOUBLE)/10000.0 AS revenue, o_orderdate
FROM (
  SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
         CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1995-03-15'
    AND l.l_shipdate > TIMESTAMP '1995-03-15'
  GROUP BY l.l_orderkey, o.o_orderdate
) ORDER BY rev DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: revenue by nation where customer and supplier share the nation —
# Dataset.join for the large-large lineitem x orders, broadcast dims
# ---------------------------------------------------------------------------

def q5_region_revenue(sf_dir: str):
    import ray

    from .joins import hash_join, should_broadcast

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    # nation key per customer / supplier as dense lookup arrays (always the
    # small side); orders is the MEASURED decision: broadcast-searchsorted
    # while its projected columns fit a worker, Dataset.join (hash shuffle)
    # beyond — selection by parquet metadata, not hard-coded
    cmax = int(cust["c_custkey"].max())
    c_arr = np.full(cmax + 1, -1, dtype=np.int64)
    c_arr[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    smax = int(supp["s_suppkey"].max())
    s_arr = np.full(smax + 1, -2, dtype=np.int64)
    s_arr[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
    n_name_arr = np.empty(int(nation["n_nationkey"].max()) + 1, dtype=object)
    n_name_arr[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    dims_ref = ray.put((c_arr, s_arr, n_name_arr))

    def rev_partial(batch: pa.Table, ck: np.ndarray) -> pa.Table:
        """Shared scoring: given each row's customer key (-1 = no order
        match), keep rows whose customer and supplier share a nation.
        Out-of-range keys drop like the oracle's inner join would — a
        clip alone would alias them to the LAST dimension slot."""
        _c_arr, _s_arr, _n_name = ray.get(dims_ref)
        cn = np.where((ck >= 0) & (ck < len(_c_arr)), _c_arr[np.clip(ck, 0, len(_c_arr) - 1)], -1)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = np.where((sk >= 0) & (sk < len(_s_arr)), _s_arr[np.clip(sk, 0, len(_s_arr) - 1)], -2)
        keep = (cn == sn) & (cn >= 0)
        rev = (
            _q100(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
            * (100 - _q100(batch["l_discount"].to_numpy(zero_copy_only=False)[keep]))
        )
        names = _n_name[cn[keep]]
        df = pd.DataFrame({"n_name": names, "rev": rev}).groupby("n_name", as_index=False)["rev"].sum()
        # 25 nation groups: a global int64 rev sum (~1.05e9/row) overflows
        # past ~8.8e9 rows/group; ship (hi, lo) split partials like q1
        df["rev_hi"], df["rev_lo"] = divmod(df.pop("rev"), 10_000)
        return pa.Table.from_pandas(df, preserve_index=False)

    if should_broadcast(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey"]):
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas().sort_values("o_orderkey")
        refs = ray.put((orders["o_orderkey"].to_numpy(), orders["o_custkey"].to_numpy()))

        def partial(batch: pa.Table) -> pa.Table:
            okeys_, ocust_ = ray.get(refs)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            # max(..., 0) + len guard: an EMPTY orders table would clip to
            # -1 and index out of bounds (same fix as q7/q8)
            pos = np.clip(np.searchsorted(okeys_, lk), 0, max(len(okeys_) - 1, 0))
            hit = (okeys_[pos] == lk) if len(okeys_) else np.zeros(len(lk), bool)
            ck = np.where(hit, ocust_[pos] if len(okeys_) else -1, -1)
            return rev_partial(batch, ck)

        scored = li.map_batches(partial, batch_format="pyarrow")
    else:
        orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        joined = hash_join(li, orders_ds, on="l_orderkey", right_on="o_orderkey")

        def partial_j(batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            return rev_partial(batch, ck)

        scored = joined.map_batches(partial_j, batch_format="pyarrow")

    # 25 nation groups: tree-combine + driver merge, no shuffle stage
    df = tree_group_sum(scored, ["n_name"]).sort_values("n_name").reset_index(drop=True)
    # exact arbitrary-precision reconstruction, then one float conversion
    # (matches the oracle's CAST(total AS DOUBLE))
    rev = [float(int(h) * 10_000 + int(l)) for h, l in zip(df["rev_hi"], df["rev_lo"])]
    return pd.DataFrame({"n_name": df["n_name"], "revenue": np.asarray(rev) / 10000.0})


Q5_SQL = """
SELECT n_name, CAST(rev AS DOUBLE)/10000.0 AS revenue
FROM (
  -- rev stays HUGEINT (DuckDB SUM of BIGINT): a CAST(... AS BIGINT) here
  -- would error in the very overflow regime the engine's (hi, lo) split
  -- partials exist for; the final CAST AS DOUBLE matches the engine's
  -- exact-int -> float conversion
  SELECT n.n_name,
         SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE c.c_nationkey = s.s_nationkey
  GROUP BY n.n_name
) ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# orders_by_status: plain grouped aggregate
# ---------------------------------------------------------------------------

def orders_by_status(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderstatus": batch["o_orderstatus"].to_pandas(),
                "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                "tp": _q100(batch["o_totalprice"].to_numpy(zero_copy_only=False)),
            }
        )
        g = df.groupby(["o_orderstatus", "o_orderpriority"], as_index=False).agg(
            total_c=("tp", "sum"), n_orders=("tp", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # <= 15 (status, priority) groups: tree-combine + driver merge
    df = (
        tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["o_orderstatus", "o_orderpriority"])
        .sort_values(["o_orderstatus", "o_orderpriority"])
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "o_orderstatus": df["o_orderstatus"],
            "o_orderpriority": df["o_orderpriority"],
            "total_price": df["total_c"].astype("float64") / 100.0,
            "n_orders": df["n_orders"].astype("int64"),
        }
    )


ORDERS_BY_STATUS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# events tumbling window: hour buckets (the engine's windowed aggregate;
# Ray Data has no event-time windows — groupby over a derived window key)
# ---------------------------------------------------------------------------

def events_tumbling_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native tumbling window: floor_temporal + group_by, no
        # pandas conversion in the hot path (VERDICT minor #8)
        ws = pc.floor_temporal(batch["ts"], unit="hour")
        v = pc.cast(pc.round(pc.multiply(batch["value"], 1000.0)), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "window_start": ws, "v": v})
        g = t.group_by(["event_type", "window_start"]).aggregate([("v", "count"), ("v", "sum")])
        return g.rename_columns(["event_type", "window_start", "n_events", "sum_v"])

    # group cardinality = types x distinct hours — thousands even over
    # years of data, so the tree combine + driver merge replaces the
    # shuffle here too (integer partials, exact in any merge order)
    df = (
        tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["event_type", "window_start"])
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "event_type": df["event_type"],
            "window_start": df["window_start"],
            "n_events": df["n_events"].astype("int64"),
            "sum_value": df["sum_v"].astype("float64") / 1000.0,
        }
    )


EVENTS_TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS DOUBLE)/1000.0 AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


# ---------------------------------------------------------------------------
# metrics over events: streaming-moments skill metrics, integer-quantized
# (engine op: functions/metrics.py; reference libraries/metrics.py:5-101)
# ---------------------------------------------------------------------------

def metrics_events(sf_dir: str):
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        o = np.round(v * 1000.0).astype(np.int64)
        m = np.round((0.8 * v + ((eid % 100) - 50) * 0.05) * 1000.0).astype(np.int64)
        return pa.table(
            {
                "n": [np.int64(len(o))],
                "sx": [o.sum()],
                "sy": [m.sum()],
                "sxx": [(o * o).sum()],
                "syy": [(m * m).sum()],
                "sxy": [(o * m).sum()],
                "sad": [np.abs(m - o).sum()],
                "ssd": [((m - o) * (m - o)).sum()],
                "omin": [o.min()],
                "omax": [o.max()],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    tot = parts.aggregate(
        Sum("n"), Sum("sx"), Sum("sy"), Sum("sxx"), Sum("syy"), Sum("sxy"), Sum("sad"), Sum("ssd"), Min("omin"), Max("omax")
    )
    n = float(tot["sum(n)"])
    sx, sy = float(tot["sum(sx)"]), float(tot["sum(sy)"])
    sxx, syy, sxy = float(tot["sum(sxx)"]), float(tot["sum(syy)"]), float(tot["sum(sxy)"])
    sad, ssd = float(tot["sum(sad)"]), float(tot["sum(ssd)"])
    omin, omax = float(tot["min(omin)"]), float(tot["max(omax)"])
    r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
    rmse = np.sqrt(ssd / n) / 1000.0
    mae = (sad / n) / 1000.0
    bias = ((sy - sx) / n) / 1000.0
    nse = 1.0 - ssd / (sxx - sx * sx / n)
    nrmse = 100.0 * np.sqrt(ssd / n) / (omax - omin)
    return pd.DataFrame(
        {"n_pairs": [int(n)], "r": [r], "rmse": [rmse], "mae": [mae], "bias": [bias], "nse": [nse], "nrmse": [nrmse]}
    )


METRICS_EVENTS_SQL = """
SELECT CAST(n AS BIGINT) AS n_pairs,
       (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS r,
       sqrt(CAST(ssd AS DOUBLE)/CAST(n AS DOUBLE))/1000.0 AS rmse,
       (CAST(sad AS DOUBLE)/CAST(n AS DOUBLE))/1000.0 AS mae,
       ((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE))/CAST(n AS DOUBLE))/1000.0 AS bias,
       1.0 - CAST(ssd AS DOUBLE)/(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) AS nse,
       100.0*sqrt(CAST(ssd AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(omax AS DOUBLE) - CAST(omin AS DOUBLE)) AS nrmse
FROM (
  SELECT COUNT(*) AS n, SUM(o) AS sx, SUM(m) AS sy, SUM(o*o) AS sxx, SUM(m*m) AS syy, SUM(o*m) AS sxy,
         SUM(abs(m-o)) AS sad, SUM((m-o)*(m-o)) AS ssd, MIN(o) AS omin, MAX(o) AS omax
  FROM (
    SELECT CAST(round(value*1000) AS BIGINT) AS o,
           CAST(round((0.8*value + ((event_id % 100) - 50)*0.05)*1000) AS BIGINT) AS m
    FROM events
  )
)
"""


# ---------------------------------------------------------------------------
# q10-shape: top customers by revenue of RETURNED items in a date window —
# the classic "find who to call" join (TPC-H q10). Scale plan: lineitem is
# pre-filtered (returnflag) and pre-aggregated per order INSIDE map_batches
# (integer money partials), the filtered 6-month order dimension joins
# either broadcast (measured small) or via the hash-partitioned Dataset
# join, the per-customer rollup is one groupby on the already-tiny
# (custkey, rev) pairs, and ONLY the driver-side top-20 touches the
# customer/nation name columns (20 keys — never a full dimension scan).
# ---------------------------------------------------------------------------

Q10_DATE_LO = pd.Timestamp("1996-01-01")
Q10_DATE_HI = pd.Timestamp("1996-07-01")


def q10_returned_items(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    from .joins import hash_join, should_broadcast

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(Q10_DATE_LO)),
                pc.less(b["o_orderdate"], pa.scalar(Q10_DATE_HI)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])

    def li_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = _q100(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _q100(b["l_discount"].to_numpy(zero_copy_only=False))
        )
        df = pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False), "rev": rev})
        out = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    li_agg = li.map_batches(li_partial, batch_format="pyarrow")

    if should_broadcast(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey"]):
        odim = orders.to_pandas()  # the FILTERED window only
        okeys = odim["o_orderkey"].to_numpy(dtype=np.int64)
        order_sort = np.argsort(okeys)
        ok_ref = ray.put((okeys[order_sort], odim["o_custkey"].to_numpy(dtype=np.int64)[order_sort]))

        def to_cust(b: pa.Table) -> pa.Table:
            ks, cs = ray.get(ok_ref)
            ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(ks, ok)
            hit = (pos < len(ks)) & (ks[np.clip(pos, 0, max(len(ks) - 1, 0))] == ok) if len(ks) else np.zeros(len(ok), bool)
            return pa.table(
                {
                    "c_custkey": pa.array(cs[pos[hit]], type=pa.int64()),
                    "rev": pa.array(b["rev"].to_numpy(zero_copy_only=False)[hit], type=pa.int64()),
                }
            )

        per_cust = li_agg.map_batches(to_cust, batch_format="pyarrow")
    else:
        joined = hash_join(li_agg, orders, on="l_orderkey", right_on="o_orderkey")
        per_cust = joined.map_batches(
            lambda b: pa.table(
                {"c_custkey": pc.cast(b["o_custkey"], pa.int64()), "rev": pc.cast(b["rev"], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    # customer-cardinality rollup: sorted_group_agg (Ray's aggregate
    # finalize is per-group Python — the q10 key space grows with customers)
    agg = sorted_group_agg(per_cust, "c_custkey", {"rev": "sum"})
    top = agg.sort(["rev", "c_custkey"], descending=[True, False]).limit(20).to_pandas()
    # name lookup for the 20 winners only: a vectorized isin filter inside
    # map_batches (only the 20 matching dimension rows leave the workers)
    keys = np.sort(top["c_custkey"].to_numpy(dtype=np.int64))
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
        .map_batches(
            lambda b: b.filter(
                pa.array(np.isin(b["c_custkey"].to_numpy(zero_copy_only=False), keys))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, on="c_custkey").merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out["revenue"] = out["rev"].astype(np.int64).astype(np.float64) / 10000.0
    out = out.sort_values(["rev", "c_custkey"], ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


Q10_SQL = """
SELECT c.c_custkey, c.c_name, CAST(rev AS DOUBLE)/10000.0 AS revenue, c.c_acctbal, n.n_name
FROM (
  SELECT o.o_custkey,
         CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-07-01'
    AND l.l_returnflag = 'R'
  GROUP BY o.o_custkey
  ORDER BY rev DESC, o.o_custkey LIMIT 20
) t
JOIN customer c ON c.c_custkey = t.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev DESC, c.c_custkey
"""


def sorted_group_agg(ds, key, ops: dict[str, str], *, approx_rows: int | None = None,
                     small_cutoff: int = 262_144):
    """Distributed group-aggregate that stays fast at ANY key cardinality
    (measured 5x over Ray's sort-based ``groupby().aggregate`` at 1.8M rows
    -> 100k keys, and the gap grows when keys are nearly unique, because
    Ray's finalize loops per group in Python).

    Shape: ONE global range sort on the key(s) (Ray's sort shuffle has no
    per-group stage, 1.8M rows in ~0.7 s), a per-block vectorized pandas
    combine (keys are contiguous after the sort, so each block collapses to
    one row per key), then an O(num_blocks) driver fix for the only rows
    the blocks cannot merge themselves: a key straddling a block boundary
    has all of its partials sitting at block edges (sorted blocks hold
    disjoint key ranges), so collecting just each block's FIRST and LAST
    combined row finds every cross-block key; the driver re-reduces those
    few partials and a broadcast drop-and-replace pass installs the merged
    totals. No second all-to-all, no driver table beyond 2 rows per block.

    ``key`` is a column name or a list of names (composite keys sort and
    combine lexicographically; the boundary argument is unchanged).
    ``ops`` maps value column -> 'sum' | 'min' | 'max' | 'count' (count
    counts input rows per key; its column need not pre-exist). Output
    columns keep the input names (count -> the given name). Tiny-cardinality
    aggregates should keep using tree_group_sum (no shuffle at all);
    this is the large-cardinality sibling.

    ``approx_rows``: caller-known input size hint (e.g. parquet metadata
    via io.table_num_rows). At or below ``small_cutoff`` rows the sort's
    ~1 s fixed shuffle cost dominates the aggregate (the only bench query
    that regressed when exact_dedup moved here), so the small path runs
    the same per-block combine WITHOUT the sort and finishes on the
    driver — bounded by approx_rows, which the hint guarantees is small.
    The hint changes the plan only, never the result.
    """
    import ray
    import ray.data as rd

    keys = [key] if isinstance(key, str) else list(key)
    cols = list(ops)
    pd_ops = {c: ("sum" if op == "count" else op) for c, op in ops.items()}

    # canonical output schema, fixed BEFORE the sort: Ray's empty sort
    # blocks arrive schema-less, and passing them through breaks any
    # downstream consumer that references columns (hash joins raise
    # "No match for key field", filters KeyError) — every emitted block,
    # including empties, must carry the (keys + value cols) schema
    in_schema = ds.schema()
    in_names = list(in_schema.names) if in_schema is not None else []
    out_fields = [
        pa.field(c, in_schema.types[in_names.index(c)] if c in in_names else pa.int64())
        for c in keys + cols
    ]
    empty_out = pa.Table.from_arrays(
        [pa.array([], type=f.type) for f in out_fields], schema=pa.schema(out_fields)
    )

    def drop_empty_blocks(out_ds):
        """Ray's sort emits schema-LESS empty blocks on sparse partitions
        and map_batches never invokes the UDF on them, so they survive
        every per-block normalization and crash downstream consumers that
        reference columns (pyarrow hash joins raise 'No match for key
        field'). Emptiness comes from BLOCK METADATA (num_rows), so no
        block ever moves to the driver — a ray.get-per-block probe would
        serially pull the whole aggregate through driver memory (review
        finding). Unknown-row-count blocks are kept (only knowable-empty
        blocks are the hazard; materialized blocks always know num_rows);
        every non-empty block passed through comb/drop and is Arrow."""
        refs = []
        for bundle in out_ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                if meta.num_rows is None or meta.num_rows > 0:
                    refs.append(block_ref)
        return rd.from_arrow_refs(refs) if refs else rd.from_arrow(empty_out)

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # defensive: canonical schema for empties
            return empty_out
        df = b.to_pandas()
        # fail loudly on null keys (Ray's groupby does too): pandas groupby
        # would silently DROP null-key rows here, and the boundary-fix merge
        # cannot match NaN keys — silent data loss instead of an error
        for kc in keys:
            if df[kc].isna().any():
                raise ValueError(f"sorted_group_agg: null values in group key {kc!r}")
        for c, op in ops.items():
            if op == "count":
                df[c] = 1
        g = df.groupby(keys, as_index=False).agg(**{c: (c, pd_ops[c]) for c in cols})
        return pa.Table.from_pandas(g, preserve_index=False)

    if approx_rows is not None and approx_rows <= small_cutoff:
        partials = ds.map_batches(comb, batch_size=None, batch_format="pyarrow").to_pandas()
        if len(partials) == 0:
            return rd.from_arrow(empty_out)
        fin = partials.groupby(keys, as_index=False).agg(**{c: (c, pd_ops[c]) for c in cols})
        return rd.from_arrow(pa.Table.from_pandas(fin[keys + cols], preserve_index=False))

    combined = ds.sort(keys).map_batches(comb, batch_size=None, batch_format="pyarrow").materialize()

    def edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = [0] if b.num_rows == 1 else [0, b.num_rows - 1]
        return b.take(idx)

    bdf = combined.map_batches(edges, batch_size=None, batch_format="pyarrow").to_pandas()
    if len(bdf) == 0:
        # empty input: the canonical empty table keeps the column contract
        return rd.from_arrow(empty_out)
    sizes = bdf.groupby(keys).size()
    dup_df = sizes[sizes >= 2].reset_index()[keys]
    if len(dup_df) == 0:
        return drop_empty_blocks(combined)
    fixed = bdf.merge(dup_df, on=keys).groupby(keys, as_index=False).agg(
        **{c: (c, pd_ops[c]) for c in cols}
    )
    dup_ref = ray.put(dup_df)

    def drop(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        dups = ray.get(dup_ref)
        df = b.to_pandas()
        hit = df.merge(dups.assign(_d=np.int8(1)), on=keys, how="left")["_d"].notna().to_numpy()
        return b.filter(pa.array(~hit))

    kept = combined.map_batches(drop, batch_size=None, batch_format="pyarrow")
    return drop_empty_blocks(
        kept.union(rd.from_arrow(pa.Table.from_pandas(fixed, preserve_index=False)))
    )


# ---------------------------------------------------------------------------
# TPC-H q18 shape (large-volume orders): the rollup key is l_orderkey — a
# key space that grows LINEARLY with the data — so the per-order quantity
# sum runs on sorted_group_agg (one range sort + vectorized block combine),
# never Ray's per-group-Python aggregate and never a driver collect of the
# full order table. The HAVING filter runs distributed; only its quantile
# tail (~1.5% of orders at the pinned threshold) flows into the order
# join, which uses the
# always-correct hash join (no broadcast-size assumption), and only the
# matched customer rows leave the dimension scan. Quantities are exact
# integer hundredths on both engines (reference analogue: the per-key
# aggregate+threshold shape of terrain_tools.py basin curation).
# ---------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 250  # pinned in engine + SQL; selects a ~1.5% order tail


def q18_large_orders(sf_dir: str):
    from .joins import filtered_hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "qty": _q100(batch["l_quantity"].to_numpy(zero_copy_only=False)),
            }
        )
        return pa.Table.from_pandas(df.groupby("l_orderkey", as_index=False).sum(), preserve_index=False)

    per_order = sorted_group_agg(li.map_batches(partial, batch_format="pyarrow"), "l_orderkey", {"qty": "sum"})
    thresh = Q18_QTY_THRESHOLD * 100
    survivors = per_order.map_batches(
        lambda b: b.filter(pc.greater(b["qty"], pa.scalar(thresh, type=pa.int64()))),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    # Bloom runtime filter: survivors hold ~1.5% of orderkeys, so the
    # orders side sheds ~98% of its shuffle bytes before the hash join
    # (exact — no false negatives; parity-tested against plain hash_join)
    joined = filtered_hash_join(orders, survivors, on="o_orderkey", right_on="l_orderkey")
    out = joined.to_pandas()  # bounded by the HAVING tail, not the table
    keys = np.sort(out["o_custkey"].to_numpy(dtype=np.int64))
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(
            lambda b: b.filter(pa.array(np.isin(b["c_custkey"].to_numpy(zero_copy_only=False), keys))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = out.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out["qty"].astype(np.int64).astype(np.float64) / 100.0
    out = out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).reset_index(drop=True)
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]]


Q18_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(t.qty AS DOUBLE)/100.0 AS sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(round(l_quantity*100) AS BIGINT)) > {Q18_QTY_THRESHOLD * 100}
) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
"""


# ---------------------------------------------------------------------------
# TPC-H q4 shape (EXISTS semi-join at fact granularity): orders that have
# at least one returned lineitem, counted by priority. The semi-join side
# (distinct returned orderkeys) grows with the data, so it is NEVER
# broadcast: batch-local unique cuts the exchange, sorted_group_agg
# finishes the distinct at orderkey cardinality, and the probe is the
# hash-partitioned Dataset join. The final priority rollup is tiny and
# shuffle-free (tree_group_sum).
# ---------------------------------------------------------------------------


def q4_priority_semijoin(sf_dir: str):
    from .joins import filtered_hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def rkeys(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        k = np.unique(b["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": pa.array(k, type=pa.int64())})

    distinct = sorted_group_agg(li.map_batches(rkeys, batch_format="pyarrow"), "l_orderkey", {"n": "count"})
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    # Bloom runtime filter: only orders whose key MIGHT have a returned
    # lineitem enter the hash shuffle (exact for inner joins)
    joined = filtered_hash_join(orders, distinct, on="o_orderkey", right_on="l_orderkey")

    def pcount(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": b["o_orderpriority"].to_pandas(), "order_count": 1})
        return pa.Table.from_pandas(df.groupby("o_orderpriority", as_index=False).sum(), preserve_index=False)

    df = tree_group_sum(
        joined.map_batches(pcount, batch_format="pyarrow"), ["o_orderpriority"], value_cols=["order_count"]
    )
    df["order_count"] = df["order_count"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H q6 shape (forecasting revenue change): the one-pass predicate
# aggregate. The date window is pushed INTO the parquet scan as a pyarrow
# dataset filter expression (row groups outside 1996 never leave storage;
# `filter=` rides io.read_named's passthrough to ray.data.read_parquet),
# the band predicates run vectorized on integer-quantized values, and the
# single global sum is two shuffle-free combine levels (tree_group_sum on
# a constant key) — no groupby stage at all.
# ---------------------------------------------------------------------------

Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"


def q6_forecast_revenue(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo = _dt.datetime.fromisoformat(Q6_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q6_DATE_HI)
    flt = (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_extendedprice", "l_discount", "l_quantity"],
        filter=flt,
    )

    def partial(b: pa.Table) -> pa.Table:
        d = _q100(b["l_discount"].to_numpy(zero_copy_only=False))
        q = _q100(b["l_quantity"].to_numpy(zero_copy_only=False))
        keep = (d >= 5) & (d <= 7) & (q < 2400)
        rev = int((_q100(b["l_extendedprice"].to_numpy(zero_copy_only=False))[keep] * d[keep]).sum())
        return pa.table({"k": pa.array([0], type=pa.int64()),
                         "rev": pa.array([rev], type=pa.int64()),
                         "n": pa.array([int(keep.sum())], type=pa.int64())})

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["k"], value_cols=["rev", "n"])
    out = pd.DataFrame(
        {
            "revenue": [float(df["rev"].sum()) / 10000.0],
            "n_rows": [int(df["n"].sum())],
        }
    )
    return out


Q6_SQL = f"""
SELECT CAST(CAST(COALESCE(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT) AS DOUBLE)/10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO}' AND l_shipdate < TIMESTAMP '{Q6_DATE_HI}'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity*100) AS BIGINT) < 2400
"""


# ---------------------------------------------------------------------------
# TPC-H q14 shape (promotion effect): fact x dimension join where the
# dimension (part) GROWS with the scale factor, so the plan is measured,
# not assumed — should_broadcast() checks the projected byte size against
# the worker budget and picks broadcast-searchsorted (one ray.put, no
# shuffle) or the hash-partitioned Dataset join (always correct). The
# promo/total ratio is ONE pinned IEEE expression on both engines over
# exact integer partials.
# ---------------------------------------------------------------------------


def q14_promo_revenue(sf_dir: str):
    import datetime as _dt

    import ray
    import pyarrow.dataset as pads

    from .joins import hash_join, should_broadcast

    lo = _dt.datetime.fromisoformat(Q6_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q6_DATE_HI)
    flt = (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"], filter=flt)

    if should_broadcast(f"{sf_dir}/part.{_ext()}", ["p_partkey", "p_type"]):
        from .. import io

        pt = io.read_table_arrow(f"{sf_dir}/part.{_ext()}", columns=["p_partkey", "p_type"])
        pk = pt["p_partkey"].to_numpy()
        order = np.argsort(pk)
        promo_ref = ray.put(
            (pk[order], (pt["p_type"].to_numpy(zero_copy_only=False) == "PROMO")[order])
        )

        def partial(b: pa.Table) -> pa.Table:
            keys, is_promo = ray.get(promo_ref)
            lk = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, lk)
            pos = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (keys[pos] == lk) if len(keys) else np.zeros(len(lk), bool)
            rev = _q100(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
                100 - _q100(b["l_discount"].to_numpy(zero_copy_only=False))
            )
            promo = int(rev[hit & is_promo[pos]].sum())
            return pa.table({"k": pa.array([0], type=pa.int64()),
                             "promo": pa.array([promo], type=pa.int64()),
                             "total": pa.array([int(rev[hit].sum())], type=pa.int64())})

        partials = li.map_batches(partial, batch_format="pyarrow")
    else:  # dimension too big for a worker: hash-partitioned join
        part = _read(sf_dir, "part", ["p_partkey", "p_type"])
        joined = hash_join(li, part, on="l_partkey", right_on="p_partkey")

        def partial(b: pa.Table) -> pa.Table:
            rev = _q100(b["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
                100 - _q100(b["l_discount"].to_numpy(zero_copy_only=False))
            )
            promo_mask = b["p_type"].to_numpy(zero_copy_only=False) == "PROMO"
            return pa.table({"k": pa.array([0], type=pa.int64()),
                             "promo": pa.array([int(rev[promo_mask].sum())], type=pa.int64()),
                             "total": pa.array([int(rev.sum())], type=pa.int64())})

        partials = joined.map_batches(partial, batch_format="pyarrow")

    df = tree_group_sum(partials, ["k"], value_cols=["promo", "total"])
    p, t = float(df["promo"].sum()), float(df["total"].sum())
    # empty window: both engines pin the 0-revenue ratio to 0.0 (the SQL
    # CASE below) instead of NULL/ZeroDivisionError
    return pd.DataFrame(
        {
            "promo_pct": [100.0 * (p / t) if t else 0.0],
            "promo_revenue": [p / 10000.0],
            "total_revenue": [t / 10000.0],
        }
    )


def _ext() -> str:
    from .. import io

    return io.table_ext()


Q14_SQL = f"""
WITH t AS (
  SELECT CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev,
         p.p_type = 'PROMO' AS promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{Q6_DATE_LO}' AND l.l_shipdate < TIMESTAMP '{Q6_DATE_HI}'
)
SELECT CASE WHEN COALESCE(SUM(rev), 0) = 0 THEN 0.0
            ELSE 100.0 * (CAST(SUM(CASE WHEN promo THEN rev ELSE 0 END) AS DOUBLE)
                          / CAST(SUM(rev) AS DOUBLE)) END AS promo_pct,
       CAST(CAST(COALESCE(SUM(CASE WHEN promo THEN rev ELSE 0 END), 0) AS BIGINT) AS DOUBLE)/10000.0 AS promo_revenue,
       CAST(CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS DOUBLE)/10000.0 AS total_revenue
FROM t
"""


# ---------------------------------------------------------------------------
# TPC-H q13 shape (customer order-count distribution): the LEFT OUTER
# aggregate whose zero bucket must survive. The per-customer count runs at
# CUSTOMER cardinality (sorted_group_agg — never per-group Python, never a
# driver collect of the count table); the zero-order customers are NOT
# joined at all: the histogram of positive counts is tiny (max orders per
# customer), so the c_count=0 row is derived exactly as
# total_customers - customers_with_matches, turning the outer join into a
# counting identity. Orders-side predicate pinned in engine + SQL.
# ---------------------------------------------------------------------------

Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q13_customer_orders_dist(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.not_equal(b["o_orderpriority"], Q13_EXCLUDED_PRIORITY))
        k, n = np.unique(keep["o_custkey"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"o_custkey": pa.array(k, type=pa.int64()),
                         "c_count": pa.array(n.astype(np.int64))})

    per_cust = sorted_group_agg(orders.map_batches(partial, batch_format="pyarrow"),
                                "o_custkey", {"c_count": "sum"})
    # LEFT-JOIN-from-customer semantics need orphan o_custkeys (absent
    # from customer) DROPPED, not counted: without this semi-join an
    # orphan would both surface in a positive bucket and shrink the
    # derived zero bucket (review finding). The probe is the hash-
    # partitioned inner join — the customer key set is never broadcast.
    # total_cust comes from the SAME read dataset (Ray serves count() on
    # an untransformed parquet read from metadata — no second scan), and
    # an all-excluded orders table skips the join entirely (Ray's join
    # crashes on an empty side; the answer is the pure zero bucket).
    from .joins import hash_join

    cust_keys = _read(sf_dir, "customer", ["c_custkey"])
    total_cust = cust_keys.count()
    if per_cust.count() == 0:
        return pd.DataFrame({"c_count": [0], "custdist": [total_cust]}).astype("int64")
    per_cust = hash_join(per_cust, cust_keys, on="o_custkey", right_on="c_custkey")

    def hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_count": pa.array([], type=pa.int64()),
                             "custdist": pa.array([], type=pa.int64())})
        c, n = np.unique(b["c_count"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"c_count": pa.array(c.astype(np.int64)),
                         "custdist": pa.array(n.astype(np.int64))})

    h = tree_group_sum(per_cust.map_batches(hist, batch_size=None, batch_format="pyarrow"),
                       ["c_count"], value_cols=["custdist"])
    # LEFT JOIN zero bucket as a counting identity: customers minus matched
    n_matched = int(h["custdist"].sum()) if len(h) else 0
    if total_cust > n_matched:
        h = pd.concat(
            [h, pd.DataFrame({"c_count": [0], "custdist": [total_cust - n_matched]})],
            ignore_index=True,
        )
    h = h.astype({"c_count": "int64", "custdist": "int64"})
    return h.sort_values(["custdist", "c_count"], ascending=[False, False]).reset_index(drop=True)


Q13_SQL = f"""
WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# TPC-H q17 shape (small-quantity-order revenue): the correlated scalar
# subquery — each lineitem compares against ITS part's average quantity.
# The selected-part lineitem subset (brand+size filter, ~2% of parts) is
# materialized ONCE as a Dataset and reused for both passes (stats + the
# qualify scan), so lineitem is read exactly once. The per-part stats run
# at selected-part cardinality via sorted_group_agg; the qualify predicate
# is the integer cross-multiplication 5*qty_c*n < sum_qty_c — exact on
# both engines, no float average anywhere. The part-dimension probe is
# measured (broadcast searchsorted vs hash-partitioned join).
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#4"
Q17_MAX_SIZE = 25


def q17_small_qty_revenue(sf_dir: str):
    import ray

    from .joins import broadcast_semi_join, filtered_hash_join, should_broadcast

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    if should_broadcast(f"{sf_dir}/part.{_ext()}", ["p_partkey", "p_brand", "p_size"]):
        from .. import io

        pt = io.read_table_arrow(f"{sf_dir}/part.{_ext()}", columns=["p_partkey", "p_brand", "p_size"])
        sel = pc.and_(pc.equal(pt["p_brand"], Q17_BRAND),
                      pc.less_equal(pt["p_size"], Q17_MAX_SIZE))
        keys = np.sort(pt.filter(sel)["p_partkey"].to_numpy())
        li_sel = broadcast_semi_join(li, ray.put(keys), "l_partkey").materialize()
    else:
        part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
            lambda b: b.filter(
                pc.and_(pc.equal(b["p_brand"], Q17_BRAND), pc.less_equal(b["p_size"], Q17_MAX_SIZE))
            ).select(["p_partkey"]),
            batch_format="pyarrow",
        )
        # Bloom runtime filter: the brand+size dimension keeps ~2% of
        # parts, so lineitem sheds ~98% of its shuffle bytes up front
        li_sel = filtered_hash_join(li, part, on="l_partkey", right_on="p_partkey").materialize()

    def stats_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
            "s": _q100(b["l_quantity"].to_numpy(zero_copy_only=False)),
            "n": np.int64(1),
        })
        return pa.Table.from_pandas(df.groupby("l_partkey", as_index=False).sum(), preserve_index=False)

    stats = sorted_group_agg(li_sel.map_batches(stats_partial, batch_format="pyarrow"),
                             "l_partkey", {"s": "sum", "n": "sum"})
    # stats cardinality == selected parts (the measured-broadcastable side)
    sdf = stats.to_pandas().sort_values("l_partkey")
    st_ref = ray.put((sdf["l_partkey"].to_numpy(dtype=np.int64),
                      sdf["s"].to_numpy(dtype=np.int64), sdf["n"].to_numpy(dtype=np.int64)))

    def qualify(b: pa.Table) -> pa.Table:
        pk_s, s_s, n_s = ray.get(st_ref)
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_s, lk)  # every row's part IS in stats
        q = _q100(b["l_quantity"].to_numpy(zero_copy_only=False))
        # integer cross-multiplication: qty < 0.2 * (s/n)  <=>  5*q*n < s
        ok = 5 * q * n_s[pos] < s_s[pos]
        rev = int(_q100(b["l_extendedprice"].to_numpy(zero_copy_only=False))[ok].sum())
        return pa.table({"k": pa.array([0], type=pa.int64()),
                         "rev": pa.array([rev], type=pa.int64()),
                         "n_rows": pa.array([int(ok.sum())], type=pa.int64())})

    df = tree_group_sum(li_sel.map_batches(qualify, batch_format="pyarrow"), ["k"],
                        value_cols=["rev", "n_rows"])
    rev = float(df["rev"].sum()) if len(df) else 0.0
    return pd.DataFrame({"avg_yearly": [rev / 100.0 / 7.0],
                         "n_rows": [int(df["n_rows"].sum()) if len(df) else 0]})


Q17_SQL = f"""
WITH t AS (
  SELECT l_partkey, SUM(CAST(round(l_quantity*100) AS BIGINT)) AS s, COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(COALESCE(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)), 0) AS BIGINT) AS DOUBLE)/100.0/7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = '{Q17_BRAND}' AND p.p_size <= {Q17_MAX_SIZE}
  AND 5 * CAST(round(l.l_quantity*100) AS BIGINT) * t.n < t.s
"""


# ---------------------------------------------------------------------------
# TPC-H q22 shape (idle high-balance accounts): a two-phase dependency —
# a GLOBAL scalar (avg positive balance) gates the row filter, then an
# anti-join against the recently-active customer set, then a tiny nation
# rollup. The scalar is two shuffle-free combine levels; the threshold is
# the integer cross-multiplication bal_c * n_pos > s_pos (exact, no float
# average; bal_c<=1e6 and s_pos<=~5e14 keep int64 exact past 1e9
# customers). The active-key set grows with the data so it is NEVER
# broadcast: distinct keys via batch-local unique + sorted_group_agg, the
# anti probe is a hash-partitioned LEFT OUTER join filtered to the
# null (unmatched) side. Only balance-qualified customers enter the join.
# ---------------------------------------------------------------------------

Q22_ACTIVE_CUTOFF = "1999-01-01"


def q22_idle_balance(sf_dir: str):
    from .joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        a = _q100(b["c_acctbal"].to_numpy(zero_copy_only=False))
        pos = a > 0
        return pa.table({"k": pa.array([0], type=pa.int64()),
                         "s": pa.array([int(a[pos].sum())], type=pa.int64()),
                         "n": pa.array([int(pos.sum())], type=pa.int64())})

    tot = tree_group_sum(cust.map_batches(bal_partial, batch_format="pyarrow"), ["k"],
                         value_cols=["s", "n"])
    s_pos, n_pos = int(tot["s"].sum()), int(tot["n"].sum())

    def qualified(b: pa.Table) -> pa.Table:
        a = _q100(b["c_acctbal"].to_numpy(zero_copy_only=False))
        keep = a * n_pos > s_pos  # bal > avg(positive bal), integer-exact
        out = b.filter(pa.array(keep)).select(["c_custkey", "c_nationkey"])
        return out.append_column("bal", pa.array(a[keep], type=pa.int64()))

    rich = cust.map_batches(qualified, batch_format="pyarrow")

    cutoff = pd.Timestamp(Q22_ACTIVE_CUTOFF)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def active_keys(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff)))
        k = np.unique(keep["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(k, type=pa.int64())})

    active = sorted_group_agg(orders.map_batches(active_keys, batch_format="pyarrow"),
                              "o_custkey", {"hit": "count"})
    if active.count() == 0:
        # no recent orders at all: EVERY balance-qualified customer is
        # idle. Skip the join — Ray's Dataset.join crashes on an empty
        # side (see hash_join docstring) and the correct answer here is
        # the full rich rollup, not an empty frame (review finding: the
        # standard TPC-H date range ends before this cutoff).
        joined = rich.map_batches(
            lambda b: b.append_column("hit", pa.nulls(b.num_rows, type=pa.int64())),
            batch_format="pyarrow",
        )
    else:
        joined = hash_join(rich, active, on="c_custkey", right_on="o_custkey",
                           join_type="left_outer")

    def idle_rollup(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        idle = df[df["hit"].isna()]
        g = idle.groupby("c_nationkey", as_index=False).agg(
            numcust=("bal", "size"), totbal=("bal", "sum"))
        g["c_nationkey"] = g["c_nationkey"].astype(np.int64)
        g["totbal"] = g["totbal"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = tree_group_sum(joined.map_batches(idle_rollup, batch_format="pyarrow"),
                        ["c_nationkey"], value_cols=["numcust", "totbal"])
    out = pd.DataFrame({
        "c_nationkey": df["c_nationkey"].astype("int64"),
        "numcust": df["numcust"].astype("int64"),
        "totacctbal": df["totbal"].astype("float64") / 100.0,
    })
    return out.sort_values("c_nationkey").reset_index(drop=True)


Q22_SQL = f"""
WITH pos AS (
  SELECT SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS s, COUNT(*) AS n
  FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0
), rich AS (
  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal
  FROM customer, pos WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(CAST(SUM(bal) AS BIGINT) AS DOUBLE)/100.0 AS totacctbal
FROM rich r
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = r.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_ACTIVE_CUTOFF}')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# TPC-H q7 shape (bi-national volume by year): the q5 skeleton with a
# two-sided nation attribution — each lineitem is scored by (supplier
# nation, customer nation, ship year) with supp != cust. Dimension nation
# maps ride one ray.put; the orders probe is the measured
# broadcast-vs-shuffle decision; group cardinality is nations^2 x years
# (~4k) so the finish is the shuffle-free tree combine with (hi, lo)
# split revenue partials (the q1/q5 overflow convention).
# ---------------------------------------------------------------------------


def q7_nation_volume(sf_dir: str):
    import ray

    from .joins import hash_join, should_broadcast

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    c_arr = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int64)
    c_arr[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    s_arr = np.full(int(supp["s_suppkey"].max()) + 1, -2, dtype=np.int64)
    s_arr[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
    n_name_arr = np.empty(int(nation["n_nationkey"].max()) + 1, dtype=object)
    n_name_arr[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    dims_ref = ray.put((c_arr, s_arr, n_name_arr))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def vol_partial(batch: pa.Table, ck: np.ndarray) -> pa.Table:
        _c, _s, _n = ray.get(dims_ref)
        # out-of-range keys must DROP like the oracle's inner join, not
        # clip-alias to the last dimension slot (review finding)
        cn = np.where((ck >= 0) & (ck < len(_c)), _c[np.clip(ck, 0, len(_c) - 1)], -1)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = np.where((sk >= 0) & (sk < len(_s)), _s[np.clip(sk, 0, len(_s) - 1)], -2)
        keep = (cn >= 0) & (sn >= 0) & (cn != sn)
        rev = (_q100(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
               * (100 - _q100(batch["l_discount"].to_numpy(zero_copy_only=False)[keep])))
        yr = (batch["l_shipdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)[keep]
        df = pd.DataFrame({
            "supp_nation": _n[sn[keep]],
            "cust_nation": _n[cn[keep]],
            "l_year": yr,
            "rev": rev,
        }).groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)["rev"].sum()
        df["rev_hi"], df["rev_lo"] = divmod(df.pop("rev"), 10_000)
        return pa.Table.from_pandas(df, preserve_index=False)

    if should_broadcast(f"{sf_dir}/orders.{_ext()}", ["o_orderkey", "o_custkey"]):
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas().sort_values("o_orderkey")
        refs = ray.put((orders["o_orderkey"].to_numpy(), orders["o_custkey"].to_numpy()))

        def partial(batch: pa.Table) -> pa.Table:
            okeys_, ocust_ = ray.get(refs)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            # max(..., 0): an EMPTY orders table would clip to -1 and
            # index out of bounds (review finding — the q8 guard pattern)
            pos = np.clip(np.searchsorted(okeys_, lk), 0, max(len(okeys_) - 1, 0))
            hit = (okeys_[pos] == lk) if len(okeys_) else np.zeros(len(lk), bool)
            ck = np.where(hit, ocust_[pos] if len(okeys_) else -1, -1)
            return vol_partial(batch, ck)

        scored = li.map_batches(partial, batch_format="pyarrow")
    else:
        orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        joined = hash_join(li, orders_ds, on="l_orderkey", right_on="o_orderkey")
        scored = joined.map_batches(
            lambda b: vol_partial(b, b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)),
            batch_format="pyarrow",
        )

    df = tree_group_sum(scored, ["supp_nation", "cust_nation", "l_year"],
                        value_cols=["rev_hi", "rev_lo"])
    df = df.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    rev = [float(int(h) * 10_000 + int(l)) for h, l in zip(df["rev_hi"], df["rev_lo"])]
    return pd.DataFrame({
        "supp_nation": df["supp_nation"],
        "cust_nation": df["cust_nation"],
        "l_year": df["l_year"].astype("int64"),
        "revenue": np.asarray(rev) / 10000.0,
    })


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, CAST(rev AS DOUBLE)/10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS rev
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2, 3
) ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# TPC-H q8 shape (national market share): a ratio of grouped sums where
# the numerator is a FLAG on one dimension attribute (supplier nation)
# inside a multi-dimension filter (customer region, part type, date
# window). Tiny dims (nation, region) ride one ray.put; the two
# SF-growing dims are measured independently — the windowed orders and
# the part-type flag each pick broadcast-searchsorted or the
# hash-partitioned join by projected byte size. Revenue partials ship
# (hi, lo) split (the q1/q5/q7 overflow convention); the share is ONE
# pinned IEEE ratio, 0.0 on an empty numerator.
# ---------------------------------------------------------------------------

Q8_REGION = "EUROPE"
Q8_PART_TYPE = "ECONOMY"
Q8_SUPP_NATION = "NATION_7"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q8_market_share(sf_dir: str):
    import ray

    from .joins import hash_join, should_broadcast

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    rname = np.empty(int(region["r_regionkey"].max()) + 1, dtype=object)
    rname[region["r_regionkey"].to_numpy()] = region["r_name"].to_numpy()
    n_region = rname[nation["n_regionkey"].to_numpy()]
    in_region = np.zeros(int(nation["n_nationkey"].max()) + 1, dtype=bool)
    in_region[nation["n_nationkey"].to_numpy()] = n_region == Q8_REGION
    is_target = np.zeros(int(nation["n_nationkey"].max()) + 1, dtype=bool)
    is_target[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy() == Q8_SUPP_NATION
    c_arr = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int64)
    c_arr[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    s_arr = np.full(int(supp["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    s_arr[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
    dims_ref = ray.put((c_arr, s_arr, in_region, is_target))

    lo, hi = pd.Timestamp(Q8_DATE_LO), pd.Timestamp(Q8_DATE_HI)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"])

    def score(batch: pa.Table, ck: np.ndarray, yr: np.ndarray, is_econ: np.ndarray) -> pa.Table:
        """ck/yr = matched order attrs (-1 = no window match); is_econ =
        part-type flag per row. Emits per-year (hi, lo) revenue partials
        for the region+type filter and the target-nation numerator."""
        _c, _s, _in_r, _tgt = ray.get(dims_ref)
        cn = np.where((ck >= 0) & (ck < len(_c)), _c[np.clip(ck, 0, len(_c) - 1)], -1)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = np.where((sk >= 0) & (sk < len(_s)), _s[np.clip(sk, 0, len(_s) - 1)], -1)
        keep = (cn >= 0) & (sn >= 0) & _in_r[np.clip(cn, 0, len(_in_r) - 1)] & is_econ
        rev = (_q100(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
               * (100 - _q100(batch["l_discount"].to_numpy(zero_copy_only=False)[keep])))
        df = pd.DataFrame({
            "l_year": yr[keep],
            "rev": rev,
            "nume": np.where(_tgt[np.clip(sn[keep], 0, len(_tgt) - 1)], rev, 0),
        }).groupby("l_year", as_index=False).sum()
        df["rev_hi"], df["rev_lo"] = divmod(df.pop("rev"), 10_000)
        df["nume_hi"], df["nume_lo"] = divmod(df.pop("nume"), 10_000)
        return pa.Table.from_pandas(df, preserve_index=False)

    # dim 1: windowed orders — measured broadcast vs hash join
    odim = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                                   pc.less(b["o_orderdate"], pa.scalar(hi)))),
        batch_format="pyarrow",
    )
    # dim 2: part-type flag — measured broadcast vs hash join
    part_bcast = should_broadcast(f"{sf_dir}/part.{_ext()}", ["p_partkey", "p_type"])
    if part_bcast:
        from .. import io

        pt = io.read_table_arrow(f"{sf_dir}/part.{_ext()}", columns=["p_partkey", "p_type"])
        pk = pt["p_partkey"].to_numpy()
        order = np.argsort(pk)
        part_ref = ray.put((pk[order], (pt["p_type"].to_numpy(zero_copy_only=False) == Q8_PART_TYPE)[order]))

        def econ_of(b: pa.Table) -> np.ndarray:
            keys, flag = ray.get(part_ref)
            lk = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys, lk), 0, max(len(keys) - 1, 0))
            return (keys[pos] == lk) & flag[pos] if len(keys) else np.zeros(len(lk), bool)
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
        li = hash_join(li, part_ds, on="l_partkey", right_on="p_partkey")

        def econ_of(b: pa.Table) -> np.ndarray:
            return b["p_type"].to_numpy(zero_copy_only=False) == Q8_PART_TYPE

    empty_q8 = pd.DataFrame({"l_year": pd.Series([], dtype="int64"),
                             "mkt_share": pd.Series([], dtype="float64"),
                             "target_revenue": pd.Series([], dtype="float64"),
                             "total_revenue": pd.Series([], dtype="float64")})
    if should_broadcast(f"{sf_dir}/orders.{_ext()}", ["o_orderkey", "o_custkey", "o_orderdate"]):
        od = odim.to_pandas()  # the WINDOW only
        if len(od) == 0:  # all-empty to_pandas loses its columns entirely
            return empty_q8
        od = od.sort_values("o_orderkey")
        oyr = od["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        o_ref = ray.put((od["o_orderkey"].to_numpy(), od["o_custkey"].to_numpy(), oyr))

        def partial(b: pa.Table) -> pa.Table:
            ks, cs, ys = ray.get(o_ref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, lk), 0, max(len(ks) - 1, 0))
            hit = (ks[pos] == lk) if len(ks) else np.zeros(len(lk), bool)
            ck = np.where(hit, cs[pos], -1)
            yr = np.where(hit, ys[pos], -1)
            return score(b, ck, yr, econ_of(b))

        scored = li.map_batches(partial, batch_format="pyarrow")
    else:
        # the window join shuffles odim entirely anyway, so materializing
        # it first costs one object-store copy and buys the empty-window
        # guard (Ray's join crashes on an empty side; the broadcast branch
        # and the oracle both return the empty/0.0 result — review finding)
        odim = odim.materialize()
        if odim.count() == 0:
            return empty_q8
        joined = hash_join(li, odim, on="l_orderkey", right_on="o_orderkey")

        def partial(b: pa.Table) -> pa.Table:
            yr = (b["o_orderdate"].to_numpy(zero_copy_only=False)
                  .astype("datetime64[Y]").astype(np.int64) + 1970)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            return score(b, ck, yr, econ_of(b))

        scored = joined.map_batches(partial, batch_format="pyarrow")

    df = tree_group_sum(scored, ["l_year"],
                        value_cols=["rev_hi", "rev_lo", "nume_hi", "nume_lo"])
    df = df.sort_values("l_year").reset_index(drop=True)
    tot = [float(int(h) * 10_000 + int(l)) for h, l in zip(df["rev_hi"], df["rev_lo"])]
    num = [float(int(h) * 10_000 + int(l)) for h, l in zip(df["nume_hi"], df["nume_lo"])]
    tot = np.asarray(tot)
    num = np.asarray(num)
    return pd.DataFrame({
        "l_year": df["l_year"].astype("int64"),
        "mkt_share": np.where(tot > 0, num / np.where(tot > 0, tot, 1.0), 0.0),
        "target_revenue": num / 10000.0,
        "total_revenue": tot / 10000.0,
    })


Q8_SQL = f"""
WITH t AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
         SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS rev,
         SUM(CASE WHEN n1.n_name = '{Q8_SUPP_NATION}'
                  THEN CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                  ELSE 0 END) AS nume
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_PART_TYPE}'
    AND o.o_orderdate >= TIMESTAMP '{Q8_DATE_LO}' AND o.o_orderdate < TIMESTAMP '{Q8_DATE_HI}'
  GROUP BY 1
)
SELECT l_year,
       CASE WHEN rev > 0 THEN CAST(nume AS DOUBLE) / CAST(rev AS DOUBLE) ELSE 0.0 END AS mkt_share,
       CAST(CAST(nume AS BIGINT) AS DOUBLE)/10000.0 AS target_revenue,
       CAST(CAST(rev AS BIGINT) AS DOUBLE)/10000.0 AS total_revenue
FROM t ORDER BY l_year
"""


# ---------------------------------------------------------------------------
# TPC-H q19 shape (discounted revenue, disjunctive predicates): the OR of
# three (brand, size-band, quantity-band) conjunctions — the predicate
# spans BOTH the fact and the dimension, so it cannot push into either
# scan alone. The part attributes ride the measured broadcast (two dense
# arrays) or the hash join; the whole disjunction evaluates as one
# vectorized boolean expression per batch; the global sum is shuffle-free.
# ---------------------------------------------------------------------------

Q19_BRANCHES = (  # (brand, size_lo, size_hi, qty_lo_c, qty_hi_c) — qty in hundredths
    ("Brand#1", 1, 5, 100, 1100),
    ("Brand#2", 1, 10, 1000, 2000),
    ("Brand#3", 1, 15, 2000, 3000),
)


def q19_branded_revenue(sf_dir: str):
    import ray

    from .joins import hash_join, should_broadcast

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def branch_mask(brand_arr: np.ndarray, size_arr: np.ndarray, qty_c: np.ndarray) -> np.ndarray:
        m = np.zeros(len(qty_c), dtype=bool)
        for brand, slo, shi, qlo, qhi in Q19_BRANCHES:
            m |= ((brand_arr == brand) & (size_arr >= slo) & (size_arr <= shi)
                  & (qty_c >= qlo) & (qty_c <= qhi))
        return m

    if should_broadcast(f"{sf_dir}/part.{_ext()}", ["p_partkey", "p_brand", "p_size"]):
        from .. import io

        pt = io.read_table_arrow(f"{sf_dir}/part.{_ext()}", columns=["p_partkey", "p_brand", "p_size"])
        pk = pt["p_partkey"].to_numpy()
        order = np.argsort(pk)
        part_ref = ray.put((pk[order],
                            pt["p_brand"].to_numpy(zero_copy_only=False)[order],
                            pt["p_size"].to_numpy()[order]))

        def partial(b: pa.Table) -> pa.Table:
            keys, brands, sizes = ray.get(part_ref)
            lk = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys, lk), 0, max(len(keys) - 1, 0))
            hit = (keys[pos] == lk) if len(keys) else np.zeros(len(lk), bool)
            qty = _q100(b["l_quantity"].to_numpy(zero_copy_only=False))
            keep = hit & branch_mask(brands[pos], sizes[pos], qty)
            rev = (_q100(b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
                   * (100 - _q100(b["l_discount"].to_numpy(zero_copy_only=False)[keep])))
            return pa.table({"k": pa.array([0], type=pa.int64()),
                             "rev": pa.array([int(rev.sum())], type=pa.int64()),
                             "n_rows": pa.array([int(keep.sum())], type=pa.int64())})

        partials = li.map_batches(partial, batch_format="pyarrow")
    else:
        part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
        joined = hash_join(li, part, on="l_partkey", right_on="p_partkey")

        def partial(b: pa.Table) -> pa.Table:
            qty = _q100(b["l_quantity"].to_numpy(zero_copy_only=False))
            keep = branch_mask(b["p_brand"].to_numpy(zero_copy_only=False),
                               b["p_size"].to_numpy(zero_copy_only=False), qty)
            rev = (_q100(b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
                   * (100 - _q100(b["l_discount"].to_numpy(zero_copy_only=False)[keep])))
            return pa.table({"k": pa.array([0], type=pa.int64()),
                             "rev": pa.array([int(rev.sum())], type=pa.int64()),
                             "n_rows": pa.array([int(keep.sum())], type=pa.int64())})

        partials = joined.map_batches(partial, batch_format="pyarrow")

    df = tree_group_sum(partials, ["k"], value_cols=["rev", "n_rows"])
    return pd.DataFrame({
        "revenue": [float(df["rev"].sum()) / 10000.0 if len(df) else 0.0],
        "n_rows": [int(df["n_rows"].sum()) if len(df) else 0],
    })


def _q19_where() -> str:
    parts = []
    for brand, slo, shi, qlo, qhi in Q19_BRANCHES:
        parts.append(
            f"(p.p_brand = '{brand}' AND p.p_size BETWEEN {slo} AND {shi}"
            f" AND CAST(round(l.l_quantity*100) AS BIGINT) BETWEEN {qlo} AND {qhi})"
        )
    return " OR ".join(parts)


Q19_SQL = f"""
SELECT CAST(CAST(COALESCE(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l.l_discount*100) AS BIGINT))), 0) AS BIGINT) AS DOUBLE)/10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {_q19_where()}
"""
