"""Relational operator coverage over the driver's TPC-H-ish tables —
filters, projections, grouped aggregates (map-side partials), broadcast
joins, sort/limit top-k, distinct, windowed event aggregation.

These exercise the engine's generic operator surface (SURVEY.md §2.2/2.4/
2.5/2.6) with DuckDB oracles. Money aggregates are computed in integer
cents (``CAST(ROUND(x*100) AS BIGINT)`` on both sides) so Ray's and
DuckDB's summation orders cannot produce floating-point drift — the
driver's value-hash comparison needs bit equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources import read_table


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64())


# Q1-style pricing summary ---------------------------------------------------

def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """groupby(returnflag, linestatus): sums/counts with map-side partials.

    The pre-aggregation inside map_batches means the shuffle carries
    ``n_blocks x n_groups`` rows (n_groups ~ 6), not 6M lineitems."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(pc.round(batch["l_quantity"], round_mode="half_towards_infinity"), pa.int64()),
                "price_cents": _cents(batch["l_extendedprice"]),
                "disc_price_cents": _cents(disc_price),
                "n": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ("disc_price_cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "sum_disc_price_cents", "count_order"]
        )

    partials = li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
        Sum("count_order", alias_name="count_order"),
    )


# DuckDB SUM(BIGINT) returns HUGEINT which reaches pandas as float64 while the
# Ray side emits int64; the driver's value-hash is dtype-sensitive, so every
# oracle SUM is wrapped in CAST(... AS BIGINT) (VERDICT r1 fix #1).
PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# broadcast-join top-k -------------------------------------------------------

def top_customers_by_revenue(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """orders x customer via broadcast hash lookup (small side shipped once
    per actor pool, never a shuffle join — SURVEY.md §2.4 J-patterns),
    grouped revenue in cents, global top-k by sort+limit."""
    import ray

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    name_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "revenue_cents": _cents(batch["o_totalprice"]),
                "n": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by("o_custkey").aggregate([("revenue_cents", "sum"), ("n", "sum")])
        return g.rename_columns(["o_custkey", "revenue_cents", "n_orders"])

    per_cust = orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    per_cust = per_cust.groupby("o_custkey").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )

    class AttachName:
        def __init__(self, ref):
            self.names = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["o_custkey"].to_pylist()
            return batch.append_column(
                "c_name", pa.array([self.names.get(int(c)) for c in keys], pa.string())
            )

    named = per_cust.map_batches(
        AttachName, fn_constructor_kwargs={"ref": name_map_ref},
        batch_format="pyarrow", concurrency=(1, 2),
    )
    top = named.sort(["revenue_cents", "o_custkey"], descending=[True, False]).limit(k)
    return top.select_columns(["o_custkey", "c_name", "revenue_cents", "n_orders"])


def top_customers_sql(k: int = 10) -> str:
    return f"""
SELECT o_custkey, c_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue_cents DESC, o_custkey ASC
LIMIT {k}
"""


# nation/region broadcast join ----------------------------------------------

def customers_per_region(sf_dir: str) -> "ray.data.Dataset":
    """Two chained broadcast lookups (nation -> region), grouped count."""
    import ray

    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({int(n): r2name[int(r)] for n, r in n2r.items()})

    cust = read_table(sf_dir, "customer", columns=["c_nationkey"])

    class Resolve:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            nk = batch["c_nationkey"].to_pylist()
            t = pa.table(
                {
                    "r_name": pa.array([self.lookup[int(x)] for x in nk], pa.string()),
                    "n": pa.array(np.ones(len(nk), dtype=np.int64), pa.int64()),
                }
            )
            g = t.group_by("r_name").aggregate([("n", "sum")])
            return g.rename_columns(["r_name", "n"])

    partials = cust.map_batches(Resolve, fn_constructor_kwargs={"ref": lookup_ref},
                                batch_format="pyarrow", concurrency=(1, 2))
    return partials.groupby("r_name").aggregate(Sum("n", alias_name="n_customers"))


CUSTOMERS_PER_REGION_SQL = """
SELECT r_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# filter + sort + limit ------------------------------------------------------

def filtered_parts(sf_dir: str, min_size: int = 30, k: int = 25) -> "ray.data.Dataset":
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_type", "p_size", "p_retailprice"])
    filt = part.map_batches(
        lambda b: b.filter(pc.greater_equal(b["p_size"], pa.scalar(min_size, pa.int32()))),
        batch_format="pyarrow",
    )
    filt = filt.map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b["p_partkey"],
                "p_name": b["p_name"],
                "p_type": b["p_type"],
                "p_size": b["p_size"],
                "price_cents": _cents(b["p_retailprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    return filt.sort(["price_cents", "p_partkey"], descending=[True, False]).limit(k)


def filtered_parts_sql(min_size: int = 30, k: int = 25) -> str:
    return f"""
SELECT p_partkey, p_name, p_type, p_size,
       CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part
WHERE p_size >= {min_size}
ORDER BY price_cents DESC, p_partkey ASC
LIMIT {k}
"""


# events: tumbling-window aggregation ----------------------------------------

def events_tumbling_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Stream-shaped workload on the batch engine: tumbling 1h windows as
    ``groupby(event_type, window_start)`` with map-side partials (the guide's
    'streaming-shaped workloads' pattern; no event-time/watermark semantics
    claimed — the reference has none either, SURVEY.md §2.9)."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64())
        hour = pc.multiply(pc.divide(us, pa.scalar(3_600_000_000)), pa.scalar(3_600_000_000))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": hour.cast(pa.timestamp("us")),
                "value_milli": pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(1000.0)), round_mode="half_towards_infinity"), pa.int64()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by(["event_type", "window_start"]).aggregate([("value_milli", "sum"), ("n", "sum")])
        return g.rename_columns(["event_type", "window_start", "sum_value_milli", "n_events"])

    partials = ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("sum_value_milli", alias_name="sum_value_milli"),
        Sum("n_events", alias_name="n_events"),
    )


EVENTS_TUMBLING_SQL = """
SELECT event_type,
       time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type, window_start
"""


# distinct / unique ----------------------------------------------------------

def distinct_segments(sf_dir: str) -> "ray.data.Dataset":
    cust = read_table(sf_dir, "customer", columns=["c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_mktsegment").aggregate([])
        return g

    return cust.map_batches(partial, batch_format="pyarrow").groupby("c_mktsegment").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


# per-key ordered window (sessionization-ish) --------------------------------

def user_event_spans(sf_dir: str) -> "ray.data.Dataset":
    """Per-user ordered aggregation (first/last event ts + counts) — the
    partition-by-key, order-by-ts pattern for stream-shaped state."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "first_us": batch["ts"].cast(pa.int64()),
                "last_us": batch["ts"].cast(pa.int64()),
                "value_milli": pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(1000.0)), round_mode="half_towards_infinity"), pa.int64()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by("user_id").aggregate(
            [("first_us", "min"), ("last_us", "max"), ("value_milli", "sum"), ("n", "sum")]
        )
        return g.rename_columns(["user_id", "first_us", "last_us", "sum_value_milli", "n_events"])

    partials = ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby("user_id").aggregate(
        Min("first_us", alias_name="first_us"),
        Max("last_us", alias_name="last_us"),
        Sum("sum_value_milli", alias_name="sum_value_milli"),
        Sum("n_events", alias_name="n_events"),
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "first_ts": b["first_us"].cast(pa.timestamp("us")),
                "last_ts": b["last_us"].cast(pa.timestamp("us")),
                "sum_value_milli": b["sum_value_milli"],
                "n_events": b["n_events"],
            }
        ),
        batch_format="pyarrow",
    )


USER_EVENT_SPANS_SQL = """
SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""


# large-large distributed hash join -------------------------------------------

def order_revenue_join(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """lineitem x orders via Ray's hash-partitioned ``Dataset.join`` — the
    large-large join form (broadcast is wrong when both sides scale).
    Lineitem is pre-aggregated per order (partitioned_reduce — order-key
    cardinality scales with the fact table) before the join, so the join's
    left side is one row per order."""
    from ..state.exchange import grouped_sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "rev": _cents(rev),
                "n": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by("o_orderkey").aggregate([("rev", "sum"), ("n", "sum")])
        return g.rename_columns(["o_orderkey", "rev", "n"])

    per_order = grouped_sum(
        li.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "o_orderkey",
        {"rev": "revenue_cents", "n": "n_lines"},
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_custkey"])
    joined = per_order.join(
        orders, join_type="inner", num_partitions=16, on=("o_orderkey",)
    )
    top = joined.sort(["revenue_cents", "o_orderkey"], descending=[True, False]).limit(k)
    return top.select_columns(["o_orderkey", "o_custkey", "o_orderstatus", "revenue_cents", "n_lines"])


def order_revenue_join_sql(k: int = 20) -> str:
    return f"""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_custkey, o_orderstatus
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT {k}
"""


# per-key ordered windows ------------------------------------------------------

def user_running_values(sf_dir: str) -> "ray.data.Dataset":
    """Running per-user aggregates in event-time order: cumulative sum and
    lag — the partition-by-key / order-by-ts window pattern
    (groupby(key).map_groups over the sorted group; key cardinality is
    users, each group fits a worker by assumption, documented)."""
    import pandas as pd

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def window(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="stable").copy()
        milli = (g["value"] * 1000).round().astype("int64")
        g["running_milli"] = milli.cumsum()
        g["prev_milli"] = milli.shift(1)
        return g[["event_id", "user_id", "running_milli", "prev_milli"]]

    out = ev.groupby("user_id").map_groups(window, batch_format="pandas")
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"].cast(pa.int64()),
                "user_id": b["user_id"].cast(pa.int64()),
                "running_milli": b["running_milli"].cast(pa.int64()),
                "prev_milli": b["prev_milli"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


USER_RUNNING_VALUES_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_milli,
       LAG(CAST(ROUND(value * 1000) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_milli
FROM events
"""


# as-of join -------------------------------------------------------------------

def clicks_asof_purchases(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: for each click event, the latest purchase event at or
    strictly before it (pandas merge_asof per sorted batch against the
    broadcast sorted purchase timeline — the guide's range/as-of pattern;
    at scale both sides bucket by time range and merge per bucket)."""
    import pandas as pd

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    purchases = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], pa.scalar("purchase"))),
        batch_format="pyarrow",
    )
    p_pd = purchases.to_pandas().sort_values(["ts", "event_id"], kind="stable")
    p_pd = p_pd.rename(columns={"ts": "p_ts", "event_id": "purchase_id"})[["p_ts", "purchase_id"]]
    import ray as _ray

    p_ref = _ray.put(p_pd)

    class AsOf:
        def __init__(self, ref):
            self.purchases = _ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch[batch["event_type"] == "click"].sort_values("ts", kind="stable")
            if len(b) == 0:
                return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                     "purchase_id": pd.Series([], dtype="int64")})
            merged = pd.merge_asof(
                b, self.purchases, left_on="ts", right_on="p_ts",
                direction="backward", allow_exact_matches=False,
            )
            out = merged[["event_id", "purchase_id"]]
            out = out[out["purchase_id"].notna()]
            return out.astype({"event_id": "int64", "purchase_id": "int64"})

    return ev.map_batches(AsOf, fn_constructor_kwargs={"ref": p_ref},
                          batch_format="pandas", concurrency=(1, 4))


CLICKS_ASOF_PURCHASES_SQL = """
SELECT event_id, purchase_id FROM (
  SELECT c.event_id,
         (SELECT p.event_id FROM events p
          WHERE p.event_type = 'purchase' AND p.ts < c.ts
          ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_id
  FROM events c WHERE c.event_type = 'click'
) WHERE purchase_id IS NOT NULL
"""

