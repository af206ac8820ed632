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

from ..context import join_partitions
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
    """Per-customer revenue (scaling key cardinality -> partitioned_reduce's
    grouped_sum, not native groupby; VERDICT r1 #6), per-partition partial
    top-k so the global sort sees ~256*k rows, then a broadcast name attach
    on just the final k rows via vectorized ``pc.index_in`` dictionary take."""
    import ray

    from ..state.exchange import grouped_sum

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    names_ref = ray.put(
        (pa.array(cust["c_custkey"].to_numpy(), pa.int64()), pa.array(cust["c_name"], pa.string()))
    )

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "rev": _cents(batch["o_totalprice"]),
                "n": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by("o_custkey").aggregate([("rev", "sum"), ("n", "sum")])
        return g.rename_columns(["o_custkey", "rev", "n"])

    per_cust = grouped_sum(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "o_custkey",
        {"rev": "revenue_cents", "n": "n_orders"},
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(
            batch,
            sort_keys=[("revenue_cents", "descending"), ("o_custkey", "ascending")],
        )
        return batch.take(idx.slice(0, k))

    candidates = per_cust.map_batches(partial_topk, batch_format="pyarrow")
    top = candidates.sort(["revenue_cents", "o_custkey"], descending=[True, False]).limit(k)

    class AttachName:
        def __init__(self, ref):
            self.keys, self.names = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch["o_custkey"], value_set=self.keys)
            return batch.append_column("c_name", pc.take(self.names, idx))

    named = top.map_batches(
        AttachName, fn_constructor_kwargs={"ref": names_ref},
        batch_format="pyarrow", concurrency=1,
    )
    return named.select_columns(["o_custkey", "c_name", "revenue_cents", "n_orders"])


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
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    nk = pa.array(nation["n_nationkey"].to_numpy(), pa.int64())
    rname = pa.array([r2name[int(r)] for r in nation["n_regionkey"]], pa.string())
    lookup_ref = ray.put((nk, rname))

    cust = read_table(sf_dir, "customer", columns=["c_nationkey"])

    class Resolve:
        def __init__(self, ref):
            self.nk, self.rname = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch["c_nationkey"].cast(pa.int64()), value_set=self.nk)
            t = pa.table(
                {
                    "r_name": pc.take(self.rname, idx),
                    "n": pa.array(np.ones(batch.num_rows, dtype=np.int64), pa.int64()),
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
    """Filter + project + top-k by (retail price, partkey): per-batch partial top-k caps the sort input at ~k rows per block."""
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


def events_sliding_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Sliding (hopping) 1h windows with a 15min hop: each event lands in
    exactly 4 overlapping windows, expanded VECTORIZED at the map side
    (np.repeat + tiled hop offsets — the fan-out is W/H rows per event,
    a constant, so the exchange stays 4x event volume regardless of
    corpus size) and aggregated with the same map-side-partial topology
    as :func:`events_tumbling_hourly`."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    W_US = 3_600_000_000
    H_US = 900_000_000
    FANOUT = W_US // H_US

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // H_US) * H_US
        offs = np.arange(FANOUT, dtype=np.int64) * H_US
        starts = np.repeat(base, FANOUT) - np.tile(offs, len(base))
        vm = pc.cast(
            pc.round(
                pc.multiply(batch["value"], pa.scalar(1000.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        et = batch["event_type"].combine_chunks() if isinstance(
            batch["event_type"], pa.ChunkedArray
        ) else batch["event_type"]
        idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), FANOUT))
        t = pa.table(
            {
                "event_type": et.take(idx),
                "window_start": pa.array(starts, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value_milli": pa.array(np.repeat(vm, FANOUT), pa.int64()),
                "n": pa.array(np.ones(len(starts), np.int64)),
            }
        )
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("value_milli", "sum"), ("n", "sum")]
        )
        return g.rename_columns(
            ["event_type", "window_start", "sum_value_milli", "n_events"]
        )

    partials = ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("sum_value_milli", alias_name="sum_value_milli"),
        Sum("n_events", alias_name="n_events"),
    )


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-15",
    k: int = 10,
) -> "ray.data.Dataset":
    """Q3-shaped shipping-priority query: top-``k`` orders by
    outstanding revenue — customers in ``segment``, orders placed before
    ``cutoff``, revenue from lineitems shipped after ``cutoff``.

    Join strategy at 100-TB shape: the segment-filtered customer keys
    broadcast once (customer is the 1/10-of-orders dimension, same
    treatment as regional_revenue's supplier lookup); lineitem
    pre-aggregates revenue cents per orderkey behind the shipdate filter
    before the ONE large-large hash join against the filtered orders;
    the final top-k is per-block partial top-k + a k-bounded merge (the
    joined per-order table never sorts globally). Output:
    (o_orderkey, o_orderdate, revenue_cents), revenue desc / orderkey
    asc under ties."""
    import ray

    from ..state.exchange import grouped_sum

    cutoff_ts = np.datetime64(cutoff, "us").astype(np.int64)
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = pa.array(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy(np.int64),
        pa.int64(),
    )
    keys_ref = ray.put(keys)

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_filter(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less(b["o_orderdate"].cast(pa.int64()), pa.scalar(cutoff_ts)),
            pc.is_in(b["o_custkey"].cast(pa.int64()), value_set=ray.get(keys_ref)),
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                "o_orderdate": b["o_orderdate"],
            }
        ).filter(pc.fill_null(keep, False))

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.fill_null(
                pc.greater(b["l_shipdate"].cast(pa.int64()), pa.scalar(cutoff_ts)),
                False,
            )
        )
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table(
            {"o_orderkey": b["l_orderkey"].cast(pa.int64()), "rev": _cents(rev)}
        )
        g = t.group_by("o_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_orderkey", "rev"])

    rev = grouped_sum(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536),
        "o_orderkey",
        {"rev": "revenue_cents"},
    )
    joined = rev.join(
        orders.map_batches(order_filter, batch_format="pyarrow", batch_size=65536),
        join_type="inner",
        num_partitions=join_partitions(),
        on=("o_orderkey",),
    )

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        r = b["revenue_cents"].to_numpy(zero_copy_only=False)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -r))[:k]
        return b.take(pa.array(order))

    partials = joined.map_batches(topk, batch_format="pyarrow", batch_size=65536)
    return partials.repartition(1).map_batches(
        topk, batch_format="pyarrow", batch_size=None
    )


def shipping_priority_sql(
    segment: str = "BUILDING", cutoff: str = "1997-06-15", k: int = 10
) -> str:
    return f"""
WITH rev AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'
  GROUP BY 1
)
SELECT r.o_orderkey, o.o_orderdate, r.revenue_cents
FROM rev r
JOIN orders o ON o.o_orderkey = r.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{segment}' AND o.o_orderdate < TIMESTAMP '{cutoff}'
ORDER BY r.revenue_cents DESC, r.o_orderkey ASC
LIMIT {k}
"""


def large_volume_customers(
    sf_dir: str, min_qty: int = 320
) -> "ray.data.Dataset":
    """Q18-shaped HAVING semijoin: orders whose total lineitem quantity
    exceeds ``min_qty``, with their customer -> (c_custkey, c_name,
    o_orderkey, total_qty). The HAVING side is a grouped_sum over
    (orderkey, qty) partials filtered BEFORE any join (output-bounded:
    only the big orders' keys reach the join); customer names attach via
    a broadcast dimension lookup; the one large-large join is
    orders x big-order-keys. Quantities are integer-valued doubles in
    TPC-H — cast to int64 per row so sums are exact at any summation
    order."""
    import ray

    from ..state.exchange import grouped_sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": b["l_orderkey"].cast(pa.int64()),
                "qty": b["l_quantity"].cast(pa.int64()),
            }
        )
        g = t.group_by("o_orderkey").aggregate([("qty", "sum")])
        return g.rename_columns(["o_orderkey", "qty"])

    per_order = grouped_sum(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536),
        "o_orderkey",
        {"qty": "total_qty"},
    )
    big = per_order.map_batches(
        lambda b: b.filter(
            pc.greater(b["total_qty"], pa.scalar(min_qty, pa.int64()))
        ),
        batch_format="pyarrow",
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = big.join(
        orders.map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                    "o_custkey": b["o_custkey"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=join_partitions(),
        on=("o_orderkey",),
    )

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    lookup_ref = ray.put(
        (
            pa.array(cust["c_custkey"].to_numpy(np.int64), pa.int64()),
            pa.array(cust["c_name"], pa.string()),
        )
    )

    def attach_name(b: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        idx = pc.index_in(b["o_custkey"], value_set=keys)
        return pa.table(
            {
                "c_custkey": b["o_custkey"],
                "c_name": pc.take(names, idx),
                "o_orderkey": b["o_orderkey"],
                "total_qty": b["total_qty"],
            }
        )

    return joined.map_batches(attach_name, batch_format="pyarrow")


def large_volume_customers_sql(min_qty: int = 320) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {min_qty}
)
SELECT c.c_custkey, c.c_name, b.o_orderkey, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


def follow_window(sf_dir: str, window_minutes: int = 10) -> "ray.data.Dataset":
    """RANGE JOIN (self, per user): for every event, the count and
    value-milli sum of the SAME user's events in the following
    ``window_minutes`` — the attribution-window shape (click -> follow-on
    actions). Equality joins, as-of joins and anti-joins exist elsewhere;
    this is the interval-predicate member of the join family.

    Topology: ONE user-keyed exchange; inside each partition events sort
    once by a packed (user, relative-ts) int64 key, both interval
    endpoints resolve by vectorized ``searchsorted`` on that key, and the
    windowed sum is a prefix-sum difference — no per-event Python, no
    pair materialization (the join's output is aggregated in place, so
    nothing quadratic ever exists even for a user with every event in
    one window)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return follow_window_over(ev, window_minutes=window_minutes)


def follow_window_over(
    ev: "ray.data.Dataset", window_minutes: int = 10
) -> "ray.data.Dataset":
    """Dataset-input core of :func:`follow_window` (events need
    event_id/user_id/ts/value columns) — also the endurance entry."""
    from ..state.exchange import partitioned_reduce

    win_us = window_minutes * 60_000_000

    def to_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"].cast(pa.int64()),
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
                "vm": pc.cast(
                    pc.round(
                        pc.multiply(batch["value"], pa.scalar(1000.0)),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    SHIFT = np.int64(1) << np.int64(44)

    def window_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_follow": pa.array([], pa.int64()),
                    "sum_follow_milli": pa.array([], pa.int64()),
                }
            )
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        rel = ts - ts.min()
        if int(rel.max()) + win_us >= int(SHIFT):
            raise ValueError(
                "time span too wide for the packed range-join key; "
                "shard the input by time range first"
            )
        if int(user.max()) >= (1 << 19):
            raise ValueError(
                "user_id too large for the packed range-join key "
                "(needs user * 2^44 in int64); remap ids first"
            )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        vm = t["vm"].to_numpy(zero_copy_only=False)
        packed = user * SHIFT + rel
        order = np.argsort(packed, kind="stable")
        packed, eid_s, vm_s = packed[order], eid[order], vm[order]
        csum = np.concatenate([[0], np.cumsum(vm_s)])
        lo = np.searchsorted(packed, packed, side="right")
        hi = np.searchsorted(packed, packed + win_us, side="right")
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "n_follow": pa.array(hi - lo, pa.int64()),
                "sum_follow_milli": pa.array(csum[hi] - csum[lo], pa.int64()),
            }
        )

    rows = ev.map_batches(to_rows, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(rows, "user_id", window_partition, n_meta=64)


def follow_window_sql(window_minutes: int = 10) -> str:
    return f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 1000) AS BIGINT) AS vm
  FROM events
)
SELECT a.event_id,
       CAST(COUNT(b.event_id) AS BIGINT) AS n_follow,
       CAST(COALESCE(SUM(b.vm), 0) AS BIGINT) AS sum_follow_milli
FROM e a LEFT JOIN e b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {window_minutes} MINUTE
GROUP BY a.event_id
"""


EVENTS_SLIDING_SQL = """
SELECT event_type,
       time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
         AS window_start,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       COUNT(*) AS n_events
FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k)
GROUP BY event_type, window_start
"""


# distinct / unique ----------------------------------------------------------

def distinct_segments(sf_dir: str) -> "ray.data.Dataset":
    """DISTINCT over a low-cardinality column: per-batch C++ dedup partials, then one tiny grouped final — the corpus never shuffles."""
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
        orders, join_type="inner", num_partitions=join_partitions(), on=("o_orderkey",)
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
    lag. Users are hashed into ~256 meta partitions (partitioned_reduce) and
    each partition is windowed in ONE vectorized numpy pass — lexsort by
    (user, ts, event_id), whole-array cumsum with per-segment base
    subtraction, shifted lag nulled at segment starts. No per-user Python
    call (the ~60us/key map_groups pathology, VERDICT r1 #5), and rounding
    is half-away-from-zero to match the DuckDB oracle's ROUND (ADVICE r1)."""
    from ..state.exchange import partitioned_reduce

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_milli(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "milli": pc.cast(
                    pc.round(pc.multiply(batch["value"], pa.scalar(1000.0)), round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )

    def window_partition(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts_us = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        milli = t["milli"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts_us, user))
        u, m = user[order], milli[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "running_milli": pa.array([], pa.int64()),
                    "prev_milli": pa.array([], pa.int64()),
                }
            )
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = u[1:] != u[:-1]
        cs = np.cumsum(m)
        seg_start = np.flatnonzero(new_seg)
        prefix = np.where(seg_start > 0, cs[seg_start - 1], 0)
        seg_len = np.diff(np.append(seg_start, n))
        running = cs - np.repeat(prefix, seg_len)
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = m[:-1]
        prev[0] = 0
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "running_milli": pa.array(running, pa.int64()),
                "prev_milli": pa.array(prev, pa.int64(), mask=new_seg),
            }
        )

    milli = ev.map_batches(to_milli, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(milli, "user_id", window_partition)


USER_RUNNING_VALUES_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_milli,
       LAG(CAST(ROUND(value * 1000) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_milli
FROM events
"""


# gap-based sessionization -----------------------------------------------------

def user_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Gap-based session assignment: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Same meta-partitioned
    vectorized-window topology as ``user_running_values`` (hash users into
    partitions, one lexsort + segmented scan per partition, no per-user
    Python)."""
    from ..state.exchange import partitioned_reduce

    gap_us = gap_minutes * 60_000_000
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def to_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        )

    def sess_partition(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts_us = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts_us, user))
        u, tsu, e = user[order], ts_us[order], eid[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "session_no": pa.array([], pa.int64()),
                }
            )
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = u[1:] != u[:-1]
        dt = np.empty(n, dtype=np.int64)
        dt[0] = 0
        dt[1:] = tsu[1:] - tsu[:-1]
        new_sess = new_seg | (dt > gap_us)
        cs = np.cumsum(new_sess.astype(np.int64))
        seg_start = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(seg_start, n))
        session_no = cs - np.repeat(cs[seg_start], seg_len)
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "session_no": pa.array(session_no, pa.int64()),
            }
        )

    rows = ev.map_batches(to_rows, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(rows, "user_id", sess_partition)


def user_sessions_sql(gap_minutes: int = 30) -> str:
    return f"""
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL {gap_minutes} MINUTE
                     THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_no
FROM (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
"""


# as-of join -------------------------------------------------------------------

_ASOF_BUCKET_US = 3_600_000_000  # 1h time buckets

# Process-local carry cache: the broadcast carry table is ray.get'd ONCE per
# worker process (zero-copy from plasma), not once per meta partition.
_ASOF_CARRY_CACHE: dict[bytes, tuple] = {}


def _asof_carry(ref):
    key = ref.binary()
    val = _ASOF_CARRY_CACHE.get(key)
    if val is None:
        import ray as _ray

        if len(_ASOF_CARRY_CACHE) > 8:  # bound worker memory across jobs
            _ASOF_CARRY_CACHE.clear()
        val = _ASOF_CARRY_CACHE[key] = _ray.get(ref)
    return val


def clicks_asof_purchases(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: for each click event, the latest purchase event strictly
    before it.

    Scale topology (VERDICT r1 #4, r2 #3 — no full-side driver
    materialization, no per-bucket Python dispatch): both sides are bucketed
    by 1h time range and co-shuffled by bucket through the 256-way
    ``partitioned_reduce`` meta exchange; the merge runs ONCE per meta
    partition as a single vectorized ``np.searchsorted`` over all of the
    partition's purchases — buckets are disjoint time ranges, so "latest
    partition-local purchase with ts < click ts" can only come from the
    click's own or an earlier bucket, and the broadcast carry table (latest
    purchase in buckets strictly before b, a metadata-scale prefix-max
    fetched once per worker process) covers everything outside the
    partition. The per-click answer is the (ts, id)-max of the two.
    """
    import ray as _ray

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=pa.array(["click", "purchase"]))
        b = batch.filter(keep)
        ts_us = b["ts"].cast(pa.int64())
        return pa.table(
            {
                "bucket": pc.divide(ts_us, pa.scalar(_ASOF_BUCKET_US)),
                "is_click": pc.equal(b["event_type"], pa.scalar("click")),
                "event_id": b["event_id"],
                "ts_us": ts_us,
            }
        )

    # materialized: the tagged rows feed both the carry aggregate below and
    # the final per-bucket merge — one scan+tag of events, not two
    tagged = ev.map_batches(tag, batch_format="pyarrow", batch_size=65536).materialize()

    # Per-bucket latest purchase: per-batch vectorized argmax partials, then
    # a driver-side reduce over <= n_buckets rows (bounded metadata).
    def latest_partial(batch: pa.Table) -> pa.Table:
        p = batch.filter(pc.invert(batch["is_click"]))
        if p.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "p_ts_us": pa.array([], pa.int64()),
                             "purchase_id": pa.array([], pa.int64())})
        bk = p["bucket"].to_numpy(zero_copy_only=False)
        ts = p["ts_us"].to_numpy(zero_copy_only=False)
        pid = p["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pid, ts, bk))
        bk, ts, pid = bk[order], ts[order], pid[order]
        last = np.empty(len(bk), dtype=bool)
        last[-1] = True
        last[:-1] = bk[1:] != bk[:-1]
        return pa.table({"bucket": pa.array(bk[last], pa.int64()),
                         "p_ts_us": pa.array(ts[last], pa.int64()),
                         "purchase_id": pa.array(pid[last], pa.int64())})

    latest = tagged.map_batches(latest_partial, batch_format="pyarrow").to_pandas()
    latest = latest.sort_values(["bucket", "p_ts_us", "purchase_id"], kind="stable")
    latest = latest.groupby("bucket", sort=True).last().reset_index()
    # Prefix-max over sorted buckets: run_ts/run_id[i] = latest purchase
    # (by ts, then id) in buckets[0..i]. A bucket's carry is the entry at
    # the last purchase-bucket strictly before it (sorted lookup below).
    p_buckets = latest["bucket"].to_numpy()
    run_ts = np.empty(len(latest), np.int64)
    run_id = np.empty(len(latest), np.int64)
    bt = latest["p_ts_us"].to_numpy()
    bi = latest["purchase_id"].to_numpy()
    cur = None  # seeded from the first real purchase (no sentinel: ts may be negative)
    for i in range(len(latest)):
        cand = (int(bt[i]), int(bi[i]))
        cur = cand if cur is None or cand > cur else cur
        run_ts[i], run_id[i] = cur
    carry_ref = _ray.put((p_buckets, run_ts, run_id))

    def merge_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "purchase_id": pa.array([], pa.int64())})
        is_click = t["is_click"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        c_ts, c_id, c_bk = ts[is_click], eid[is_click], bk[is_click]
        if c_ts.size == 0:
            return empty
        # candidate presence is tracked with explicit boolean masks, NOT a
        # -1 ts sentinel: legitimately negative (pre-epoch) purchase
        # timestamps must stay matchable (ADVICE r3).
        # partition-local candidate: latest purchase (ts, id) with ts < c_ts.
        # Buckets are disjoint ts ranges, so this never pulls from a LATER
        # bucket; earlier-bucket locals are dominated by the carry's max.
        p_ts, p_id = ts[~is_click], eid[~is_click]
        if p_ts.size:
            order = np.lexsort((p_id, p_ts))
            p_ts, p_id = p_ts[order], p_id[order]
            idx = np.searchsorted(p_ts, c_ts, side="left") - 1
            loc_has = idx >= 0
            safe = np.clip(idx, 0, None)
            loc_ts = p_ts[safe]
            loc_id = p_id[safe]
        else:
            loc_has = np.zeros(c_ts.size, dtype=bool)
            loc_ts = np.zeros(c_ts.size, dtype=np.int64)
            loc_id = np.zeros(c_ts.size, dtype=np.int64)
        # global carry: latest purchase in buckets strictly before c_bk
        # (fetched from plasma once per worker process, not per partition)
        pb, rts, rid = _asof_carry(carry_ref)
        if pb.size:
            j = np.searchsorted(pb, c_bk, side="left") - 1
            car_has = j >= 0
            safe = np.clip(j, 0, None)
            car_ts = rts[safe]
            car_id = rid[safe]
        else:
            car_has = np.zeros(c_ts.size, dtype=bool)
            car_ts = np.zeros(c_ts.size, dtype=np.int64)
            car_id = np.zeros(c_ts.size, dtype=np.int64)
        use_car = car_has & (
            ~loc_has
            | (car_ts > loc_ts)
            | ((car_ts == loc_ts) & (car_id > loc_id))
        )
        out_id = np.where(use_car, car_id, loc_id)
        ok = loc_has | car_has
        return pa.table({"event_id": pa.array(c_id[ok], pa.int64()),
                         "purchase_id": pa.array(out_id[ok], pa.int64())})

    from ..state.exchange import partitioned_reduce

    return partitioned_reduce(tagged, "bucket", merge_partition)


CLICKS_ASOF_PURCHASES_SQL = """
SELECT event_id, purchase_id FROM (
  SELECT c.event_id,
         (SELECT p.event_id FROM events p
          WHERE p.event_type = 'purchase' AND p.ts < c.ts
          ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_id
  FROM events c WHERE c.event_type = 'click'
) WHERE purchase_id IS NOT NULL
"""



def regional_revenue(sf_dir: str, year: int = 1996) -> "ray.data.Dataset":
    """Q5-shaped multi-table join: revenue per (region, supplier nation)
    for orders placed in ``year``.

    Join-strategy showcase at 100-TB shape: the three dimension tables
    (supplier -> nation -> region) collapse into ONE broadcast
    suppkey -> nation-code lookup (``ray.put`` once, ``pc.index_in`` per
    batch — never shuffled); lineitem pre-aggregates per
    (orderkey, nation) behind a single packed int64 key before the one
    large-large hash join against the year-filtered orders keys; the
    final rollup is a ~|nations| grouped_sum. Only (orderkey, nation)
    partials and filtered order keys cross the wire. Supplier is treated
    as a dimension (TPC-H scales it at 1/10 of orders); if it outgrew
    worker heap the lookup would move to a second hash join keyed on
    l_suppkey."""
    import ray

    from ..state.exchange import grouped_sum

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = read_table(sf_dir, "nation").to_pandas()
    reg = read_table(sf_dir, "region").to_pandas()
    if len(nat) >= 32:
        raise ValueError("packed key assumes < 32 nations")
    r2name = dict(zip(reg["r_regionkey"], reg["r_name"]))
    n_names = pa.array(nat["n_name"], pa.string())
    n_regions = pa.array([r2name[int(r)] for r in nat["n_regionkey"]], pa.string())
    nat_code = {int(k): i for i, k in enumerate(nat["n_nationkey"])}
    sup_lookup = ray.put(
        (
            pa.array(sup["s_suppkey"].to_numpy(), pa.int64()),
            np.array([nat_code[int(n)] for n in sup["s_nationkey"]], np.int64),
        )
    )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        keys, codes = ray.get(sup_lookup)
        ok = batch["l_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if ok.size and ok.max() >= (1 << 58):
            raise ValueError("orderkey too large for packed (orderkey, nation) key")
        idx = pc.index_in(batch["l_suppkey"].cast(pa.int64()), value_set=keys)
        nat_c = codes[idx.to_numpy(zero_copy_only=False)]
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table(
            {
                "k": pa.array(ok * 32 + nat_c, pa.int64()),
                "rev": _cents(rev),
                "n": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            }
        )
        g = t.group_by("k").aggregate([("rev", "sum"), ("n", "sum")])
        return g.rename_columns(["k", "rev", "n"])

    per_order_nation = grouped_sum(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536),
        "k",
        {"rev": "revenue_cents", "n": "n_lines"},
    )

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": pa.array(k >> 5, pa.int64()),
                "nat_c": pa.array(k & 31, pa.int64()),
                "revenue_cents": b["revenue_cents"],
                "n_lines": b["n_lines"],
            }
        )

    left = per_order_nation.map_batches(unpack, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def year_filter(b: pa.Table) -> pa.Table:
        keep = pc.equal(pc.year(b["o_orderdate"]), pa.scalar(year, pa.int32()))
        return pa.table({"o_orderkey": b["o_orderkey"].cast(pa.int64())}).filter(
            pc.fill_null(keep, False)
        )

    keys = orders.map_batches(year_filter, batch_format="pyarrow", batch_size=65536)
    joined = left.join(keys, join_type="inner", num_partitions=join_partitions(), on=("o_orderkey",))

    names_ref = ray.put((n_names, n_regions))

    def rollup_partial(b: pa.Table) -> pa.Table:
        nn, nr = ray.get(names_ref)
        code = pa.array(b["nat_c"].to_numpy(zero_copy_only=False), pa.int64())
        t = pa.table(
            {
                "r_name": pc.take(nr, code),
                "n_name": pc.take(nn, code),
                "rev": b["revenue_cents"],
                "n": b["n_lines"],
            }
        )
        g = t.group_by(["r_name", "n_name"]).aggregate([("rev", "sum"), ("n", "sum")])
        return g.rename_columns(["r_name", "n_name", "rev", "n"])

    return grouped_sum(
        joined.map_batches(rollup_partial, batch_format="pyarrow", batch_size=65536),
        ["r_name", "n_name"],
        {"rev": "revenue_cents", "n": "n_lines"},
        n_meta=16,
    )


def regional_revenue_sql(year: int = 1996) -> str:
    return f"""
SELECT r_name, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN nation ON s_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey
WHERE year(o_orderdate) = {year}
GROUP BY r_name, n_name
"""


def rollup_counts(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    sentinel: str = "ALL",
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(key_cols): per-group aggregates at every rollup
    level, rolled-up key positions holding ``sentinel`` (a literal, not
    NULL — value-hash-stable across engines).

    Topology: ONE corpus scan emits finest-level per-batch partials
    (C++ group_by + ``n`` count + optional sums), one ``grouped_sum``
    exchange per level — but every exchange after the first consumes the
    PREVIOUS level's output, which is already aggregate-sized, so the
    corpus is read once and the rollup chain costs |groups|, not rows.
    """
    from ..state.exchange import grouped_sum

    sums = dict(sum_cols or {})

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k].cast(pa.string()) for k in key_cols}
        # Precondition (ADVICE r4): a NULL key or a real key value equal to
        # the sentinel would collide with rollup subtotal rows — fail loudly
        # instead of silently merging groups.
        for k in key_cols:
            if cols[k].null_count:
                raise ValueError(f"rollup_counts: key column {k!r} contains NULLs")
            if pc.any(pc.equal(cols[k], pa.scalar(sentinel))).as_py():
                raise ValueError(
                    f"rollup_counts: key column {k!r} contains the sentinel "
                    f"value {sentinel!r}; pass a different sentinel"
                )
        cols["n"] = pa.array(np.ones(batch.num_rows, np.int64), pa.int64())
        for src in sums:
            cols[src] = batch[src].cast(pa.int64())
        t = pa.table(cols)
        g = t.group_by(key_cols).aggregate([("n", "sum")] + [(c, "sum") for c in sums])
        out = {k: g[k] for k in key_cols}
        out["n"] = g["n_sum"]
        for src in sums:
            out[src] = g[f"{src}_sum"]
        return pa.table(out)

    value_map = {"n": "n"} | {c: c for c in sums}
    level = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        key_cols,
        value_map,
        n_meta=n_meta,
    )
    levels = [level]
    for i in range(len(key_cols) - 1, -1, -1):
        prev = levels[-1]

        def blank(batch: pa.Table, _i: int = i) -> pa.Table:
            cols = {}
            for j, k in enumerate(key_cols):
                cols[k] = (
                    pa.array([sentinel] * batch.num_rows, pa.string())
                    if j >= _i
                    else batch[k]
                )
            cols["n"] = batch["n"]
            for c in sums:
                cols[c] = batch[c]
            return pa.table(cols)

        levels.append(
            grouped_sum(
                prev.map_batches(blank, batch_format="pyarrow"),
                key_cols,
                value_map,
                n_meta=n_meta,
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def rename(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in key_cols}
        cols["n_rows"] = batch["n"].cast(pa.int64())
        for src, dst in sums.items():
            cols[dst] = batch[src].cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(rename, batch_format="pyarrow")


def customer_order_profile(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer order profile with zero-order customers PRESERVED —
    the left-outer large-large join form (both sides scale with the
    account base; broadcast is wrong). Orders pre-aggregate per customer
    (partitioned_reduce) so the join's right side is one row per active
    customer; Ray's hash-partitioned ``Dataset.join(left_outer)`` then
    attaches them to the full customer spine and the nulls become
    explicit zeros."""
    from ..state.exchange import grouped_sum

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "rev": _cents(batch["o_totalprice"]),
                "n": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            }
        )
        g = t.group_by("o_custkey").aggregate([("rev", "sum"), ("n", "sum")])
        return g.rename_columns(["o_custkey", "rev", "n"])

    per_cust = grouped_sum(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "o_custkey",
        {"rev": "revenue_cents", "n": "n_orders"},
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    joined = cust.join(
        per_cust, join_type="left_outer", num_partitions=join_partitions(),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"].cast(pa.int64()),
                "n_orders": pc.fill_null(b["n_orders"], 0).cast(pa.int64()),
                "revenue_cents": pc.fill_null(b["revenue_cents"], 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


CUSTOMER_ORDER_PROFILE_SQL = """
SELECT c.c_custkey,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


# per-group top-k by value (ROW_NUMBER selection) ------------------------------

def top_orders_per_customer(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Top-``k`` orders per customer by order value — the distributed
    ROW_NUMBER() selection (stages/ranking.py:group_topk): each batch keeps
    ≤k candidates per customer, one hash exchange finalizes. Customer
    cardinality scales with the corpus; nothing touches the driver."""
    from ..stages.ranking import group_topk

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"].cast(pa.int64()),
                "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                "total_cents": _cents(b["o_totalprice"]),
            }
        )

    ds = orders.map_batches(to_cents, batch_format="pyarrow", batch_size=65536)
    return group_topk(ds, "o_custkey", "total_cents", k=k, tie_col="o_orderkey")


def top_orders_per_customer_sql(k: int = 3) -> str:
    return f"""
SELECT o_custkey, o_orderkey, total_cents, rk FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
         ) AS rk
  FROM orders
) WHERE rk <= {k}
"""


# Q14-shaped conditional-aggregate join ---------------------------------------

def promo_revenue(sf_dir: str) -> "pd.DataFrame":
    """Share of revenue from PROMO-type parts (TPC-H Q14 shape): lineitem
    revenue is pre-aggregated per part key (partitioned_reduce — part-key
    cardinality scales with the catalog), the part side attaches inside the
    same hash exchange (kind-tagged union rows; pa.Table.join per partition
    is fine because downstream is a global sum — CLAUDE.md r5 note), and
    each partition emits ONE (promo_cents, total_cents) partial row —
    metadata-sized regardless of corpus. Driver combines ≤n_meta rows.
    Integer cents + milli ratio so the driver value-hash is exact."""
    import pandas as pd

    from ..state.exchange import grouped_sum, partitioned_reduce

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table(
            {
                "partkey": batch["l_partkey"].cast(pa.int64()),
                "cents": _cents(rev),
            }
        )
        g = t.group_by("partkey").aggregate([("cents", "sum")])
        return pa.table({"partkey": g["partkey"], "cents": g["cents_sum"]})

    per_part = grouped_sum(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536),
        "partkey",
        {"cents": "cents"},
    )

    def tag_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "partkey": b["partkey"],
                "cents": b["cents"],
                "promo": pa.nulls(b.num_rows, pa.int64()),
                "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }
        )

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])

    def tag_part(b: pa.Table) -> pa.Table:
        promo = pc.cast(pc.equal(b["p_type"], pa.scalar("PROMO")), pa.int64())
        return pa.table(
            {
                "partkey": b["p_partkey"].cast(pa.int64()),
                "cents": pa.nulls(b.num_rows, pa.int64()),
                "promo": promo,
                "kind": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        )

    both = per_part.map_batches(tag_cents, batch_format="pyarrow").union(
        part.map_batches(tag_part, batch_format="pyarrow")
    )

    def attach_sum(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        cents_side = t.filter(pa.array(kind == 0)).select(["partkey", "cents"])
        part_side = t.filter(pa.array(kind == 1)).select(["partkey", "promo"])
        j = cents_side.join(part_side, keys="partkey", join_type="inner")
        c = j["cents"].to_numpy(zero_copy_only=False)
        p = j["promo"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo_cents": pa.array([int((c * p).sum())], pa.int64()),
                "total_cents": pa.array([int(c.sum())], pa.int64()),
            }
        )

    partials = partitioned_reduce(both, "partkey", attach_sum).take_all()
    promo_c = sum(r["promo_cents"] for r in partials)
    total_c = sum(r["total_cents"] for r in partials)
    return pd.DataFrame(
        {
            "promo_cents": pd.array([promo_c], dtype="int64"),
            "total_cents": pd.array([total_c], dtype="int64"),
            "promo_milli": pd.array([promo_c * 1000 // total_c if total_c else 0], dtype="int64"),
        }
    )


PROMO_REVENUE_SQL = """
SELECT CAST(SUM(promo * cents) AS BIGINT) AS promo_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(promo * cents) * 1000 // SUM(cents) AS BIGINT) AS promo_milli
FROM (
  SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
"""


# Q13-shaped customer order-count distribution -------------------------------

def customer_distribution(sf_dir: str) -> pa.Table:
    """Histogram of per-customer order counts INCLUDING zero-order
    customers (TPC-H Q13 shape, reference has no equivalent — engine
    coverage for left-join count distributions).

    Scale shape: the left join never happens — per-customer counts come
    from one grouped_sum exchange over orders partials (customer-key
    cardinality); the zero bucket comes from a key_reconcile presence
    audit of customer keys vs ordering keys (left_only == zero-order
    customers), which ALSO catches orders referencing custkeys absent
    from customer (right_only -> loud raise; the earlier arithmetic
    |customer| - |ordering| silently mixed phantom keys into the
    histogram — r5 review finding). Both scans prune to one column;
    only customer-cardinality rows and a ~|distinct counts| histogram
    cross the wire."""
    from ..stages.dedup import key_reconcile
    from ..state.exchange import grouped_sum

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"].cast(pa.int64()),
                "n": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            }
        )
        g = t.group_by("o_custkey").aggregate([("n", "sum")])
        return g.rename_columns(["o_custkey", "n"])

    per_cust = grouped_sum(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "o_custkey",
        {"n": "c_count"},
    ).materialize()

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_count": b["c_count"],
                "custdist": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by("c_count").aggregate([("custdist", "sum")])
        return g.rename_columns(["c_count", "custdist"])

    hist = grouped_sum(
        per_cust.map_batches(hist_partial, batch_format="pyarrow", batch_size=65536),
        "c_count",
        {"custdist": "custdist"},
        n_meta=16,
    ).to_pandas()

    cust_keys = read_table(sf_dir, "customer", columns=["c_custkey"])
    recon = {
        r["status"]: r["n_keys"]
        for r in key_reconcile(
            cust_keys, per_cust, left_key="c_custkey", right_key="o_custkey"
        ).take_all()
    }
    if recon.get("right_only", 0):
        raise ValueError(
            f"orders reference {recon['right_only']} custkeys absent from customer"
        )
    n_zero = recon.get("left_only", 0)
    counts = list(hist["c_count"].astype("int64"))
    dists = list(hist["custdist"].astype("int64"))
    if n_zero > 0:
        counts.append(0)
        dists.append(n_zero)
    return pa.table({"c_count": pa.array(counts, pa.int64()), "custdist": pa.array(dists, pa.int64())})


CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# Q11-shaped global-share filter ----------------------------------------------

def part_revenue_share(sf_dir: str, mult: int = 1) -> "ray.data.Dataset":
    """Parts whose discounted revenue is strictly above ``mult`` x the MEAN
    per-part revenue (TPC-H Q11's HAVING-share-of-global-total shape).

    Two-pass share pattern: per-partkey revenue via one grouped_sum
    exchange, materialized ONCE (aggregate-sized — |part| rows, never the
    lineitem corpus); the global total and group count are driver scalars
    over that same materialized table, broadcast back as a closure constant
    for the final filter. The threshold is mean-relative so the survivor
    fraction is scale-invariant (a fixed global fraction went empty as part
    cardinality grew). ``rev > (mult*total)//n_parts`` is exactly
    ``rev*n_parts > mult*total`` for positive ints — no overflow, no float."""
    from ray.data.aggregate import Sum as RaySum

    from ..state.exchange import grouped_sum

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"l_partkey": batch["l_partkey"].cast(pa.int64()), "cents": _cents(rev)})
        g = t.group_by("l_partkey").aggregate([("cents", "sum")])
        return g.rename_columns(["l_partkey", "cents"])

    per_part = grouped_sum(
        li.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "l_partkey",
        {"cents": "revenue_cents"},
    ).materialize()

    total = per_part.aggregate(RaySum("revenue_cents", alias_name="total"))["total"]
    n_parts = per_part.count()
    if n_parts == 0:
        return per_part
    threshold = (mult * int(total)) // n_parts

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["revenue_cents"], pa.scalar(threshold, pa.int64())))

    return per_part.map_batches(keep, batch_format="pyarrow", batch_size=65536)


def part_revenue_share_sql(mult: int = 1) -> str:
    return f"""
SELECT l_partkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
       > ({mult} * (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                    FROM lineitem))
         // (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)
"""


# Q22-shaped large-large anti-join --------------------------------------------

def inactive_customers(sf_dir: str, priority: str = "1-URGENT") -> "ray.data.Dataset":
    """Per-nation count + balance of above-average-balance customers with
    NO order of the given priority (TPC-H Q22 shape) — hash-partitioned
    anti-join, integer average gate; topology in
    :func:`inactive_customers_over`."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    nation = read_table(sf_dir, "nation").to_pandas()
    return inactive_customers_over(cust, orders, nation, priority=priority)


def inactive_customers_over(
    cust: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    nation,
    priority: str = "1-URGENT",
) -> "ray.data.Dataset":
    """Per-nation count + balance total of customers with above-average
    positive account balance and NO order of the given priority (TPC-H
    Q22 shape: scalar-subquery filter + anti-join).

    Scale shape: the average-balance gate is integer cross-multiplication
    (bal*n_pos > sum_pos — no float division) from one driver scalar pass;
    the anti-join is hash-partitioned, NOT broadcast: candidate customer
    rows and deduped order-custkey markers co-locate by custkey in one
    partitioned_reduce, so both sides stream at any cardinality. Output
    rolls up to ~|nation| rows.

    ``cust`` needs (c_custkey, c_nationkey, c_acctbal); ``orders`` needs
    (o_custkey, o_orderpriority); ``nation`` is a small pandas frame with
    (n_nationkey, n_name)."""
    import ray
    from ray.data.aggregate import Sum as RaySum

    from ..state.exchange import grouped_sum, partitioned_reduce

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"])
        pos = pc.greater(cents, pa.scalar(0, pa.int64()))
        kept = cents.filter(pos)
        return pa.table(
            {
                "s": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
                "n": pa.array([len(kept)], pa.int64()),
            }
        )

    stats = cust.map_batches(bal_partial, batch_format="pyarrow", batch_size=65536).aggregate(
        RaySum("s", alias_name="s"), RaySum("n", alias_name="n")
    )
    sum_pos, n_pos = int(stats["s"]), int(stats["n"])

    def candidates(b: pa.Table) -> pa.Table:
        cents = b["c_acctbal"]
        bal = _cents(cents)
        # multiply_checked: the gate is bal*n_pos > sum_pos; a silent int64
        # wrap at large n_pos would flip comparisons, so overflow must raise
        # (the r5 50M endurance leg caught a mis-scoped driver-side guard here)
        keep = pc.greater(
            pc.multiply_checked(bal, pa.scalar(n_pos, pa.int64())), pa.scalar(sum_pos, pa.int64())
        )
        t = b.filter(keep)
        return pa.table(
            {
                "custkey": t["c_custkey"].cast(pa.int64()),
                "c_nationkey": t["c_nationkey"].cast(pa.int64()),
                "bal_cents": _cents(t["c_acctbal"]),
                "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            }
        )

    def markers(b: pa.Table) -> pa.Table:
        keys = b.filter(pc.equal(b["o_orderpriority"], pa.scalar(priority)))["o_custkey"]
        u = keys.cast(pa.int64()).combine_chunks().unique()
        return pa.table(
            {
                "custkey": u,
                "c_nationkey": pa.nulls(len(u), pa.int64()),
                "bal_cents": pa.nulls(len(u), pa.int64()),
                "kind": pa.array(np.ones(len(u), np.int8), pa.int8()),
            }
        )

    both = cust.map_batches(candidates, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(markers, batch_format="pyarrow", batch_size=65536)
    )

    def anti(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        c = t.filter(pa.array(kind == 0))
        m = t.filter(pa.array(kind == 1))
        if m.num_rows:
            hit = pc.is_in(c["custkey"], value_set=m["custkey"].combine_chunks().unique())
            c = c.filter(pc.invert(hit))
        g = pa.table(
            {
                "c_nationkey": c["c_nationkey"],
                "numcust": pa.array(np.ones(c.num_rows, np.int64), pa.int64()),
                "totbal_cents": c["bal_cents"],
            }
        ).group_by("c_nationkey").aggregate([("numcust", "sum"), ("totbal_cents", "sum")])
        return g.rename_columns(["c_nationkey", "numcust", "totbal_cents"])

    per_nation = grouped_sum(
        partitioned_reduce(both, "custkey", anti),
        "c_nationkey",
        {"numcust": "numcust", "totbal_cents": "totbal_cents"},
        n_meta=8,
    )

    nat = nation
    names_ref = ray.put(
        (pa.array(nat["n_nationkey"].astype("int64"), pa.int64()), pa.array(nat["n_name"], pa.string()))
    )

    def attach(b: pa.Table) -> pa.Table:
        keys, names = ray.get(names_ref)
        idx = pc.index_in(b["c_nationkey"], value_set=keys)
        if idx.null_count:
            raise ValueError(
                "inactive_customers: c_nationkey values missing from the nation table"
            )
        return pa.table(
            {
                "n_name": pc.take(names, idx),
                "numcust": b["numcust"],
                "totbal_cents": b["totbal_cents"],
            }
        )

    return per_nation.map_batches(attach, batch_format="pyarrow")


def inactive_customers_sql(priority: str = "1-URGENT") -> str:
    return f"""
WITH pos AS (
  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bc FROM customer
  WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust, CAST(SUM(bc) AS BIGINT) AS totbal_cents
FROM (SELECT c_custkey, c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bc FROM customer) c
JOIN nation ON c_nationkey = n_nationkey
WHERE bc * (SELECT COUNT(*) FROM pos) > (SELECT SUM(bc) FROM pos)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '{priority}'
  )
GROUP BY n_name
"""


# Q4-shaped semi-join ---------------------------------------------------------

def priority_semijoin(sf_dir: str) -> "ray.data.Dataset":
    """Order counts per priority among orders with >=1 heavily-discounted
    bulk lineitem (TPC-H Q4 EXISTS shape) — one-exchange semi-join;
    topology in :func:`priority_semijoin_over`."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_discount", "l_quantity"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    return priority_semijoin_over(orders, li)


def priority_semijoin_over(
    orders: "ray.data.Dataset", li: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Order counts per priority among orders having >=1 heavily-discounted
    bulk lineitem (TPC-H Q4's EXISTS shape).

    Large-large semi-join without a Dataset.join: qualifying lineitem
    orderkeys dedup per batch, then co-locate with order rows by orderkey
    in ONE partitioned_reduce; each partition keeps matching orders and
    emits ~|priorities| count partials. Nothing order-cardinality survives
    past the exchange.

    ``orders`` needs (o_orderkey, o_orderpriority); ``li`` needs
    (l_orderkey, l_discount, l_quantity)."""
    from ..state.exchange import grouped_sum, partitioned_reduce

    def markers(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(b["l_discount"], pa.scalar(0.05)),
            pc.greater(b["l_quantity"], pa.scalar(45.0)),
        )
        u = b.filter(keep)["l_orderkey"].cast(pa.int64()).combine_chunks().unique()
        return pa.table(
            {
                "orderkey": u,
                "priority": pa.nulls(len(u), pa.string()),
                "kind": pa.array(np.ones(len(u), np.int8), pa.int8()),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": b["o_orderkey"].cast(pa.int64()),
                "priority": b["o_orderpriority"],
                "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }
        )

    both = orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536).union(
        li.map_batches(markers, batch_format="pyarrow", batch_size=65536)
    )

    def semi(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(kind == 0))
        m = t.filter(pa.array(kind == 1))
        hit = pc.is_in(o["orderkey"], value_set=m["orderkey"].combine_chunks().unique())
        kept = o.filter(hit)
        g = pa.table(
            {
                "o_orderpriority": kept["priority"],
                "order_count": pa.array(np.ones(kept.num_rows, np.int64), pa.int64()),
            }
        ).group_by("o_orderpriority").aggregate([("order_count", "sum")])
        return g.rename_columns(["o_orderpriority", "order_count"])

    return grouped_sum(
        partitioned_reduce(both, "orderkey", semi),
        "o_orderpriority",
        {"order_count": "order_count"},
        n_meta=8,
    )


PRIORITY_SEMIJOIN_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_discount > 0.05 AND l_quantity > 45
)
GROUP BY o_orderpriority
"""


# conditional-aggregation pivot -----------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> pa.Table:
    """Daily event counts pivoted wide — one row per day, one int64 column
    per event type (conditional-aggregation pivot; reference has no
    equivalent, generic engine coverage).

    One corpus scan emits per-batch (day, type) count partials via C++
    group_by; one tiny grouped_sum exchange (~days*types rows); the wide
    reshape happens driver-side on the aggregate-sized result. Unknown
    event types fail loudly rather than silently dropping counts."""
    from ..state.exchange import grouped_sum

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
                "event_type": b["event_type"],
                "n": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by(["day", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "event_type", "n"])

    long = grouped_sum(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["day", "event_type"],
        {"n": "n"},
        n_meta=16,
    ).to_pandas()

    unknown = set(long["event_type"]) - set(EVENT_TYPES)
    if unknown:
        raise ValueError(f"events_pivot: unexpected event types {sorted(unknown)}")
    wide = long.pivot_table(index="day", columns="event_type", values="n", fill_value=0, aggfunc="sum")
    wide = wide.reindex(columns=list(EVENT_TYPES), fill_value=0).reset_index()
    cols = {"day": pa.array(wide["day"], pa.string())}
    for t in EVENT_TYPES:
        cols[t] = pa.array(wide[t].astype("int64"), pa.int64())
    return pa.table(cols)


EVENTS_PIVOT_SQL = """
SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY day
"""


# Q16-shaped exact COUNT(DISTINCT) per group ------------------------------------

def brand_supplier_counts(sf_dir: str, exclude_brand: str = "Brand#13") -> "ray.data.Dataset":
    """Distinct supplier count per (brand, size band) over lineitem (TPC-H
    Q16 shape: dimension-filtered exact COUNT(DISTINCT) at fact scale).

    Part is the broadcast side (TPC-H scales it ~1/30 of lineitem rows;
    like regional_revenue's supplier lookup, it would move to a hash join
    if it outgrew worker heap). Each lineitem batch packs
    (suppkey, brand, band) into ONE int64 and dedups locally, so the
    exchange carries near-distinct keys only; the partitioned_reduce
    dedups globally and emits ~|brand x band| count partials."""
    import ray

    from ..state.exchange import grouped_sum, partitioned_reduce

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    part = part[part["p_brand"] != exclude_brand]
    brands = sorted(part["p_brand"].unique())
    if len(brands) >= 32:
        raise ValueError("packed key assumes < 32 brands")
    brand_code = {b: i for i, b in enumerate(brands)}
    lookup_ref = ray.put(
        (
            pa.array(part["p_partkey"].astype("int64"), pa.int64()),
            part["p_brand"].map(brand_code).to_numpy(dtype=np.int64),
            (part["p_size"].to_numpy(dtype=np.int64) // 10),
        )
    )

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pack(b: pa.Table) -> pa.Table:
        keys, bcodes, bands = ray.get(lookup_ref)
        idx = pc.index_in(b["l_partkey"].cast(pa.int64()), value_set=keys)
        valid = pc.is_valid(idx)
        iv = idx.filter(valid).to_numpy(zero_copy_only=False)
        supp = b["l_suppkey"].cast(pa.int64()).filter(valid).to_numpy(zero_copy_only=False)
        if supp.size and (supp.min() < 0 or supp.max() >= (1 << 55)):
            raise ValueError("suppkey outside [0, 2^55) breaks the packed (supp, brand, band) key")
        if bands.size and (bands.min() < 0 or bands.max() >= 8):
            raise ValueError("size band outside [0, 8) does not fit the packed key")
        k = (supp << 8) | (bcodes[iv] << 3) | bands[iv]
        u = pa.array(np.unique(k), pa.int64())
        return pa.table({"k": u})

    packed = li.map_batches(pack, batch_format="pyarrow", batch_size=65536)

    def count_partial(t: pa.Table) -> pa.Table:
        k = np.unique(t["k"].to_numpy(zero_copy_only=False))
        g = pa.table(
            {
                "brand_code": pa.array((k >> 3) & 31, pa.int64()),
                "size_band": pa.array(k & 7, pa.int64()),
                "cnt": pa.array(np.ones(k.size, np.int64), pa.int64()),
            }
        ).group_by(["brand_code", "size_band"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["brand_code", "size_band", "cnt"])

    per_group = grouped_sum(
        partitioned_reduce(packed, "k", count_partial),
        ["brand_code", "size_band"],
        {"cnt": "supplier_cnt"},
        n_meta=16,
    )

    names_ref = ray.put(pa.array(brands, pa.string()))

    def attach(b: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        return pa.table(
            {
                "p_brand": pc.take(names, b["brand_code"]),
                "size_band": b["size_band"],
                "supplier_cnt": b["supplier_cnt"],
            }
        )

    return per_group.map_batches(attach, batch_format="pyarrow")


def brand_supplier_counts_sql(exclude_brand: str = "Brand#13") -> str:
    return f"""
SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_band,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{exclude_brand}'
GROUP BY p_brand, size_band
"""


# LAG-window gap distribution ---------------------------------------------------

def event_gaps(sf_dir: str, cap_minutes: int = 60) -> "ray.data.Dataset":
    """Distribution of per-user inter-event gaps in whole minutes, capped
    at ``cap_minutes`` (LAG-window coverage; complements user_sessions'
    gap THRESHOLD with the full gap histogram).

    Same meta-partitioned window topology as user_sessions: users hash
    into partitions, ONE lexsort + vectorized diff per partition computes
    every user's consecutive gaps (a user's first event emits none), and
    each partition returns ~cap_minutes count partials — the exchange
    output is bounded by the bucket range, not the event count."""
    from ..state.exchange import grouped_sum, partitioned_reduce

    # event_id is deliberately NOT shipped: gap diffs depend only on the
    # per-user ts sequence, so the tie order among equal timestamps cannot
    # change any bucket — one less int64 column through the
    # event-cardinality exchange
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def to_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        )

    def gaps_partition(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts_us = t["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts_us, user))
        u, tsu = user[order], ts_us[order]
        same_user = np.zeros(len(u), dtype=bool)
        same_user[1:] = u[1:] == u[:-1]
        gap_us = np.zeros(len(u), dtype=np.int64)
        gap_us[1:] = tsu[1:] - tsu[:-1]
        bucket = np.minimum(gap_us[same_user] // 60_000_000, cap_minutes)
        g = pa.table(
            {
                "gap_bucket_min": pa.array(bucket, pa.int64()),
                "n_gaps": pa.array(np.ones(bucket.size, np.int64), pa.int64()),
            }
        ).group_by("gap_bucket_min").aggregate([("n_gaps", "sum")])
        return g.rename_columns(["gap_bucket_min", "n_gaps"])

    rows = ev.map_batches(to_rows, batch_format="pyarrow", batch_size=65536)
    return grouped_sum(
        partitioned_reduce(rows, "user_id", gaps_partition),
        "gap_bucket_min",
        {"n_gaps": "n_gaps"},
        n_meta=8,
    )


def event_gaps_sql(cap_minutes: int = 60) -> str:
    # NB: the NULL filter must run BEFORE the cap — DuckDB's LEAST ignores
    # NULL arguments, so LEAST(NULL_lag_diff, cap) = cap would count every
    # user's first event as a max-bucket gap.
    return f"""
SELECT CAST(LEAST(gap_us // 60000000, {cap_minutes}) AS BIGINT) AS gap_bucket_min,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM (
  SELECT epoch_us(ts) - epoch_us(LAG(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
WHERE gap_us IS NOT NULL
GROUP BY gap_bucket_min
"""


# per-group mode (argmax count) --------------------------------------------------

def top_event_type_per_user(sf_dir: str) -> "ray.data.Dataset":
    """Each user's most frequent event type with its count — distributed
    per-group MODE with a deterministic tiebreak (higher count, then
    lexicographically smallest type).

    ONE user-keyed exchange: batches pre-aggregate (user, type) counts
    (C++ group_by, bounded by |types| x |users-in-batch|), the partition
    reduce sums them, Arrow-sorts by (user, count desc, type asc), and
    keeps each user's first row via a vectorized boundary mask. Output is
    user-cardinality; nothing event-cardinality crosses the wire."""
    from ..state.exchange import partitioned_reduce

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        ).group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["user_id", "event_type", "n"])

    def mode_partition(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        g = g.rename_columns(["user_id", "event_type", "n"])
        idx = pc.sort_indices(
            g,
            sort_keys=[("user_id", "ascending"), ("n", "descending"), ("event_type", "ascending")],
        )
        s = g.take(idx)
        u = s["user_id"].to_numpy(zero_copy_only=False)
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        out = s.filter(pa.array(first))
        return pa.table(
            {
                "user_id": out["user_id"],
                "top_type": out["event_type"],
                "n_events": out["n"],
            }
        )

    partials = ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(partials, "user_id", mode_partition)


TOP_EVENT_TYPE_SQL = """
SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n_events
FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC) AS rk
  FROM events
  GROUP BY user_id, event_type
)
WHERE rk = 1
"""


# time-window debounce dedup ------------------------------------------------------

def events_debounce(sf_dir: str, min_gap_seconds: int = 3600) -> "ray.data.Dataset":
    """Debounce dedup: drop an event when the PREVIOUS event of the same
    (user, type) stream is within ``min_gap_seconds`` (LAG semantics — the
    gap is measured to the previous raw event, not the previous kept one;
    documented so the greedy-chain variant isn't assumed).

    One user-keyed exchange (the finer (user, type) segmentation happens
    vectorized inside the partition — coarse key keeps the int fast-path
    hash and bounds partition count); each partition lexsorts once and
    emits only surviving rows."""
    from ..state.exchange import partitioned_reduce

    gap_us = min_gap_seconds * 1_000_000
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def to_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"].cast(pa.int64()),
                "user_id": batch["user_id"].cast(pa.int64()),
                "event_type": batch["event_type"],
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        )

    def debounce_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("ts_us", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        s = t.take(idx)
        u = s["user_id"].to_numpy(zero_copy_only=False)
        ty = s["event_type"].to_numpy(zero_copy_only=False)
        tsu = s["ts_us"].to_numpy(zero_copy_only=False)
        n = len(u)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            same = (u[1:] == u[:-1]) & (ty[1:] == ty[:-1])
            keep[1:] = ~same | ((tsu[1:] - tsu[:-1]) > gap_us)
        return s.filter(pa.array(keep)).select(["event_id", "user_id", "event_type"])

    rows = ev.map_batches(to_rows, batch_format="pyarrow", batch_size=65536)
    return partitioned_reduce(rows, "user_id", debounce_partition)


def events_debounce_sql(min_gap_seconds: int = 3600) -> str:
    return f"""
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM events
)
WHERE gap_us IS NULL OR gap_us > {min_gap_seconds * 1_000_000}
"""


# running distinct count ----------------------------------------------------------

def cumulative_users(sf_dir: str) -> pa.Table:
    """New and cumulative distinct users per day of first activity —
    running COUNT(DISTINCT) without ever shipping a distinct set: each
    user collapses to their MIN timestamp in one user-keyed exchange
    (min-reduce partials per batch first), days aggregate to ~|days|
    count rows, and the prefix sum runs driver-side on that
    aggregate-sized result."""
    from ..state.exchange import partitioned_reduce

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def min_partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        ).group_by("user_id").aggregate([("ts_us", "min")])
        return g.rename_columns(["user_id", "ts_us"])

    def day_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("ts_us", "min")])
        day = pc.strftime(g["ts_us_min"].cast(pa.timestamp("us")), format="%Y-%m-%d")
        out = pa.table(
            {
                "day": day,
                "new_users": pa.array(np.ones(g.num_rows, np.int64), pa.int64()),
            }
        ).group_by("day").aggregate([("new_users", "sum")])
        return out.rename_columns(["day", "new_users"])

    partials = ev.map_batches(min_partial, batch_format="pyarrow", batch_size=65536)
    per_day = (
        partitioned_reduce(partials, "user_id", day_counts)
        .to_pandas()
        .groupby("day", as_index=False)["new_users"]
        .sum()
        .sort_values("day")
    )
    new = per_day["new_users"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "day": pa.array(per_day["day"], pa.string()),
            "new_users": pa.array(new, pa.int64()),
            "cum_users": pa.array(np.cumsum(new), pa.int64()),
        }
    )


CUMULATIVE_USERS_SQL = """
WITH firsts AS (SELECT user_id, MIN(ts) AS fts FROM events GROUP BY user_id),
     per_day AS (SELECT STRFTIME(fts, '%Y-%m-%d') AS day, COUNT(*) AS new_users
                 FROM firsts GROUP BY day)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM per_day
"""


# cohort retention ------------------------------------------------------------------

def cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Retention matrix: users cohorted by first-activity day; for each
    (cohort day, day offset) the number of cohort users active that day.

    ONE user-keyed exchange does everything: batches pre-dedup
    (user, activity-day) pairs (C++ group_by — bounded by users x days in
    the batch, not events), the partition reduce finds each user's min day
    (their cohort), dedups their activity days globally, and emits
    (cohort, offset) count partials. A tiny grouped_sum finishes. Nothing
    event-cardinality crosses the wire; no distinct set is ever shipped."""
    from ..state.exchange import grouped_sum, partitioned_reduce

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    DAY_US = 86_400_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        # numpy floor_divide, not Arrow divide: truncation-toward-zero puts a
        # pre-1970 timestamp on the WRONG calendar day (off by one), which
        # the STRFTIME oracle would catch
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "day": pa.array(np.floor_divide(us, DAY_US), pa.int64()),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([])
        return g

    def retention_partition(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "day"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        # cohort day of each row = its user's min day (first in sorted run)
        run_id = np.cumsum(first) - 1
        cohort = d[first][run_id]
        out = pa.table(
            {
                "cohort_day": pa.array(cohort, pa.int64()),
                "offset_days": pa.array(d - cohort, pa.int64()),
                "active_users": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        ).group_by(["cohort_day", "offset_days"]).aggregate([("active_users", "sum")])
        return out.rename_columns(["cohort_day", "offset_days", "active_users"])

    rows = ev.map_batches(pairs, batch_format="pyarrow", batch_size=65536)
    agg = grouped_sum(
        partitioned_reduce(rows, "user_id", retention_partition),
        ["cohort_day", "offset_days"],
        {"active_users": "active_users"},
        n_meta=16,
    )

    def to_date_str(b: pa.Table) -> pa.Table:
        us = pc.multiply(b["cohort_day"], pa.scalar(DAY_US, pa.int64()))
        return pa.table(
            {
                "cohort": pc.strftime(us.cast(pa.timestamp("us")), format="%Y-%m-%d"),
                "offset_days": b["offset_days"],
                "active_users": b["active_users"],
            }
        )

    return agg.map_batches(to_date_str, batch_format="pyarrow")


COHORT_RETENTION_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(STRFTIME(ts, '%Y-%m-%d')) AS cohort FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, STRFTIME(ts, '%Y-%m-%d') AS day FROM events
)
SELECT cohort,
       CAST(DATEDIFF('day', CAST(cohort AS DATE), CAST(day AS DATE)) AS BIGINT) AS offset_days,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity JOIN firsts USING (user_id)
GROUP BY cohort, offset_days
"""


# JSON property extraction ----------------------------------------------------------

def props_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Counts and value sums per (event type, k-decile) where ``k`` is
    extracted from the JSON ``props`` column — the semi-structured ELT
    path: vectorized regex field extraction (RE2 via pc.extract_regex, no
    per-row json.loads), loud failure on unparseable rows, then the usual
    map-side-partial + tiny grouped_sum topology."""
    from ..state.exchange import grouped_sum

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], pattern=r'"k"\s*:\s*(?P<k>-?\d+)')
        if m.null_count:
            raise ValueError(
                f"props_rollup: {m.null_count} props rows lack an integer 'k' field"
            )
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        # pc.divide truncates toward zero — and so does DuckDB's integer //
        # (verified: (-5)//10 = 0, (-15)//10 = -1 on DuckDB 1.0) — so the
        # engine and oracle agree on negative k. np.floor_divide would NOT.
        t = pa.table(
            {
                "event_type": b["event_type"],
                "k_decile": pc.divide(k, pa.scalar(10, pa.int64())),
                "n": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                "sum_k": k,
            }
        )
        g = t.group_by(["event_type", "k_decile"]).aggregate([("n", "sum"), ("sum_k", "sum")])
        return g.rename_columns(["event_type", "k_decile", "n", "sum_k"])

    return grouped_sum(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "k_decile"],
        {"n": "n", "sum_k": "sum_k"},
        n_meta=16,
    )


PROPS_ROLLUP_SQL = """
SELECT event_type, CAST(k // 10 AS BIGINT) AS k_decile,
       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
)
GROUP BY event_type, k_decile
"""


# partition-total window joined back to rows -----------------------------------------

def order_share_of_customer(sf_dir: str) -> "ray.data.Dataset":
    """Every order's share (ppm) of its customer's lifetime spend —
    SUM() OVER (PARTITION BY) at row cardinality; topology in
    :func:`order_share_over`."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return order_share_over(orders)


def order_share_over(orders: "ray.data.Dataset") -> "ray.data.Dataset":
    """Every order's share (ppm) of its customer's lifetime spend —
    SUM() OVER (PARTITION BY) semantics at row cardinality.

    The window total never ships separately: order rows hash to their
    customer's partition in ONE partitioned_reduce, the per-customer
    totals are a C++ group_by INSIDE the partition, and the share
    attaches back by vectorized index_in. Integer ppm with floor
    division keeps the value-hash exact. Output is orders-cardinality
    (a window function's output always is — the exchange is the cost
    floor for any engine). ``orders`` needs (o_orderkey, o_custkey,
    o_totalprice)."""
    from ..state.exchange import partitioned_reduce

    def rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                "o_custkey": b["o_custkey"].cast(pa.int64()),
                "cents": _cents(b["o_totalprice"]),
            }
        )

    def share_partition(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("cents", "sum")])
        if pc.any(pc.less_equal(g["cents_sum"], pa.scalar(0, pa.int64()))).as_py():
            raise ValueError(
                "order_share_of_customer: a customer's total is <= 0; "
                "ppm shares are undefined"
            )
        idx = pc.index_in(t["o_custkey"], value_set=g["o_custkey"])
        total = pc.take(g["cents_sum"], idx)
        share = pc.divide(
            pc.multiply_checked(t["cents"], pa.scalar(1_000_000, pa.int64())), total
        )
        return t.append_column("share_ppm", share)

    return partitioned_reduce(
        orders.map_batches(rows, batch_format="pyarrow", batch_size=65536),
        "o_custkey",
        share_partition,
    )


ORDER_SHARE_SQL = """
SELECT o_orderkey, o_custkey, cents,
       CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY o_custkey) AS BIGINT) AS share_ppm
FROM (
  SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
"""


# ordered-event funnel ---------------------------------------------------------------

def funnel_over(ev: "ray.data.Dataset", stages: tuple[str, ...]) -> list[int]:
    """k-stage funnel core: for each prefix of ``stages``, how many users
    complete it in order (strictly increasing timestamps, greedy
    earliest-match — the standard first-touch funnel; greedy is optimal
    for subsequence existence).

    ONE user-keyed exchange; inside each partition the per-user stage
    times resolve iteratively with np.minimum.reduceat over the
    user-sorted stream (t_s = min ts of stage-s events strictly after the
    user's t_{s-1}); each partition emits a single k-count partial row.
    Driver combines <= n_meta rows. ``ev`` needs (user_id, event_type,
    ts); returns [n_stage1, n_stage1&2, ..., n_full]."""
    from ..state.exchange import partitioned_reduce

    if len(stages) < 1:
        raise ValueError("funnel_over needs at least one stage")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel_over stages must be distinct (index_in keys on first match)")
    k = len(stages)
    stage_arr = pa.array(list(stages), pa.string())

    def to_rows(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["event_type"], value_set=stage_arr)
        t = pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
                "stage": pc.cast(pc.add(idx, pa.scalar(1, pa.int32())), pa.int8()),
            }
        )
        return t.filter(pc.is_valid(t["stage"]))

    cols = [f"n_prefix_{i + 1}" for i in range(k)]

    def funnel_partition(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        stage = t["stage"].to_numpy(zero_copy_only=False)
        if len(user) == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in cols})
        order = np.lexsort((ts, user))
        u, tsu, st = user[order], ts[order], stage[order]
        new_seg = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        BIG = np.iinfo(np.int64).max
        counts = []
        prev = np.full(starts.size, np.iinfo(np.int64).min, np.int64)
        for si in range(1, k + 1):
            mask = (st == si) & (tsu > prev[seg_id])
            v = np.where(mask, tsu, BIG)
            cur = np.minimum.reduceat(v, starts)
            counts.append(int((cur < BIG).sum()))
            prev = cur
        return pa.table({c: pa.array([n], pa.int64()) for c, n in zip(cols, counts)})

    partials = partitioned_reduce(
        ev.map_batches(to_rows, batch_format="pyarrow", batch_size=65536),
        "user_id",
        funnel_partition,
    ).to_pandas()
    return [int(partials[c].sum()) for c in cols]


def funnel_counts(
    sf_dir: str, stages: tuple[str, str, str] = ("view", "click", "purchase")
) -> pa.Table:
    """Three-stage funnel over the events table (gate shape of
    :func:`funnel_over`): users reaching stage 1, stages 1->2, and the
    full 1->2->3 sequence."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    n1, n2, n3 = funnel_over(ev, tuple(stages))
    return pa.table(
        {
            "n_stage1": pa.array([n1], pa.int64()),
            "n_stage12": pa.array([n2], pa.int64()),
            "n_stage123": pa.array([n3], pa.int64()),
        }
    )


def funnel_counts_sql(stages: tuple[str, str, str] = ("view", "click", "purchase")) -> str:
    s1, s2, s3 = stages
    return f"""
WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = '{s1}' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = '{s2}' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = '{s3}' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_stage1,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_stage12,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_stage123
"""


# GROUP BY CUBE ---------------------------------------------------------------------

def cube_counts(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    sentinel: str = "ALL",
    n_meta: int = 64,
) -> "ray.data.Dataset":
    """GROUP BY CUBE(key_cols): aggregates at EVERY key subset, blanked
    positions holding ``sentinel`` (rollup_counts' hierarchical-levels
    sibling — CUBE needs all 2^k subsets, not just prefixes).

    Topology: the corpus is scanned ONCE for the finest-level partials
    (rollup_counts' partial, same NULL/sentinel loud guards); every other
    subset derives from the FINEST level's aggregate-sized output via one
    tiny grouped_sum each — 2^k - 1 extra exchanges over ~|groups| rows,
    never over rows. k is capped at 4 (16 subsets) to keep the plan
    bounded."""
    from itertools import combinations

    from ..state.exchange import grouped_sum

    if len(key_cols) > 4:
        raise ValueError("cube_counts caps key_cols at 4 (2^k subsets)")
    sums = dict(sum_cols or {})

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k].cast(pa.string()) for k in key_cols}
        for k in key_cols:
            if cols[k].null_count:
                raise ValueError(f"cube_counts: key column {k!r} contains NULLs")
            if pc.any(pc.equal(cols[k], pa.scalar(sentinel))).as_py():
                raise ValueError(
                    f"cube_counts: key column {k!r} contains the sentinel {sentinel!r}"
                )
        cols["n"] = pa.array(np.ones(batch.num_rows, np.int64), pa.int64())
        for src in sums:
            cols[src] = batch[src].cast(pa.int64())
        t = pa.table(cols)
        g = t.group_by(key_cols).aggregate([("n", "sum")] + [(c, "sum") for c in sums])
        out = {k: g[k] for k in key_cols}
        out["n"] = g["n_sum"]
        for src in sums:
            out[src] = g[f"{src}_sum"]
        return pa.table(out)

    value_map = {"n": "n"} | {c: c for c in sums}
    finest = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        key_cols,
        value_map,
        n_meta=n_meta,
    ).materialize()

    levels = [finest]
    k = len(key_cols)
    for r in range(k):
        for keep_idx in combinations(range(k), r):
            if len(keep_idx) == k:
                continue
            keep = set(keep_idx)

            def blank(batch: pa.Table, _keep=frozenset(keep)) -> pa.Table:
                cols = {}
                for j, kc in enumerate(key_cols):
                    cols[kc] = (
                        batch[kc]
                        if j in _keep
                        else pa.array([sentinel] * batch.num_rows, pa.string())
                    )
                cols["n"] = batch["n"]
                for c in sums:
                    cols[c] = batch[c]
                return pa.table(cols)

            levels.append(
                grouped_sum(
                    finest.map_batches(blank, batch_format="pyarrow"),
                    key_cols,
                    value_map,
                    n_meta=n_meta,
                )
            )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def rename(batch: pa.Table) -> pa.Table:
        cols = {kc: batch[kc] for kc in key_cols}
        cols["n_rows"] = batch["n"].cast(pa.int64())
        for src, dst in sums.items():
            cols[dst] = batch[src].cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(rename, batch_format="pyarrow")


# Q17-shaped correlated mean threshold ------------------------------------------------

def small_quantity_revenue(sf_dir: str) -> pa.Table:
    """Revenue locked in small-quantity orders: total price of lineitems
    whose quantity is strictly below 20% of their part's average quantity
    (TPC-H Q17's correlated-scalar-subquery shape).

    The correlation never runs as a subquery: lineitem rows hash to their
    part's partition in ONE partitioned_reduce; the per-part (sum_qty, n)
    resolve with a C++ group_by inside, the threshold comparison is exact
    integer cross-multiplication (5*qty*n < sum_qty — no division), and
    each partition emits one (revenue, count) partial. Driver combines
    <= n_meta rows."""
    from ..state.exchange import partitioned_reduce

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"].cast(pa.int64()),
                "qty": b["l_quantity"].cast(pa.int64()),
                "cents": _cents(b["l_extendedprice"]),
            }
        )

    def q17_partition(t: pa.Table) -> pa.Table:
        g = t.group_by("l_partkey").aggregate([("qty", "sum"), ("qty", "count")])
        idx = pc.index_in(t["l_partkey"], value_set=g["l_partkey"])
        sum_q = pc.take(g["qty_sum"], idx)
        n = pc.take(g["qty_count"], idx).cast(pa.int64())
        lhs = pc.multiply_checked(
            pc.multiply_checked(t["qty"], pa.scalar(5, pa.int64())), n
        )
        keep = pc.less(lhs, sum_q)
        kept = t.filter(keep)
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [pc.sum(kept["cents"]).as_py() or 0], pa.int64()
                ),
                "n_items": pa.array([kept.num_rows], pa.int64()),
            }
        )

    partials = partitioned_reduce(
        li.map_batches(rows, batch_format="pyarrow", batch_size=65536),
        "l_partkey",
        q17_partition,
    ).to_pandas()
    return pa.table(
        {
            "revenue_cents": pa.array([int(partials["revenue_cents"].sum())], pa.int64()),
            "n_items": pa.array([int(partials["n_items"].sum())], pa.int64()),
        }
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
) l
WHERE 5 * qty * (SELECT COUNT(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey)
      < (SELECT CAST(SUM(CAST(i.l_quantity AS BIGINT)) AS BIGINT)
         FROM lineitem i WHERE i.l_partkey = l.l_partkey)
"""


# Q2-shaped argmin-per-group join -----------------------------------------------------

def cheapest_supplier_per_part(sf_dir: str) -> "ray.data.Dataset":
    """Each part's cheapest observed (price, supplier) from lineitem with
    the supplier name attached (TPC-H Q2's min-cost-supplier shape).

    Argmin-per-group rides the generic group_topk selection (per-batch
    partial top-1 prunes the exchange to near-|parts| rows, one part-keyed
    partitioned_reduce finalizes); ties break by (price asc, suppkey asc);
    the supplier name attaches to the part-cardinality RESULT via one
    broadcast lookup — never shuffled."""
    import ray

    from ..stages.ranking import group_topk

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"].cast(pa.int64()),
                "s_suppkey": b["l_suppkey"].cast(pa.int64()),
                "price_cents": _cents(b["l_extendedprice"]),
            }
        )

    best = group_topk(
        li.map_batches(rows, batch_format="pyarrow", batch_size=65536),
        key_col="l_partkey",
        value_col="price_cents",
        k=1,
        tie_col="s_suppkey",
        descending=False,
    )

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    names_ref = ray.put(
        (pa.array(sup["s_suppkey"].astype("int64"), pa.int64()), pa.array(sup["s_name"], pa.string()))
    )

    def attach(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["rk"], pa.scalar(1, pa.int64())))
        keys, names = ray.get(names_ref)
        idx = pc.index_in(b["s_suppkey"], value_set=keys)
        if idx.null_count:
            raise ValueError("lineitem references a suppkey absent from supplier")
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "s_suppkey": b["s_suppkey"],
                "s_name": pc.take(names, idx),
                "price_cents": b["price_cents"],
            }
        )

    return best.map_batches(attach, batch_format="pyarrow")


CHEAPEST_SUPPLIER_SQL = """
SELECT l_partkey, s_suppkey, s_name, price_cents FROM (
  SELECT l_partkey, l_suppkey AS s_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT) ASC, l_suppkey ASC
         ) AS rk
  FROM lineitem
) JOIN supplier USING (s_suppkey)
WHERE rk = 1
"""


# Q6-shaped scan-filter-aggregate ------------------------------------------------------

def forecast_revenue(sf_dir: str, year: int = 1996) -> pa.Table:
    """Potential revenue from discount changes: SUM(price * discount) over
    shipments in ``year`` with discount in [5%, 7%] and quantity < 24
    (TPC-H Q6 — the pure scan->filter->aggregate shape).

    The read prunes to four columns; the discount band compares on
    ROUND(discount*1000) integers (floats are 0.01 multiples — the milli
    grid is exact, no boundary drift); each batch emits one partial sum
    and the driver adds <= n_blocks rows. Nothing shuffles."""
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        disc_milli = pc.cast(
            pc.round(pc.multiply(b["l_discount"], pa.scalar(1000.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        keep = pc.and_(
            pc.and_(
                pc.equal(pc.year(b["l_shipdate"]), pa.scalar(year, pa.int32())),
                pc.and_(
                    pc.greater_equal(disc_milli, pa.scalar(50, pa.int64())),
                    pc.less_equal(disc_milli, pa.scalar(70, pa.int64())),
                ),
            ),
            pc.less(b["l_quantity"], pa.scalar(24.0)),
        )
        t = b.filter(pc.fill_null(keep, False))
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table(
            {
                "revenue_cents": pa.array([pc.sum(_cents(rev)).as_py() or 0], pa.int64()),
                "n_items": pa.array([t.num_rows], pa.int64()),
            }
        )

    p = li.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    return pa.table(
        {
            "revenue_cents": pa.array([int(p["revenue_cents"].sum())], pa.int64()),
            "n_items": pa.array([int(p["n_items"].sum())], pa.int64()),
        }
    )


def forecast_revenue_sql(year: int = 1996) -> str:
    return f"""
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE year(l_shipdate) = {year}
  AND CAST(ROUND(l_discount * 1000) AS BIGINT) BETWEEN 50 AND 70
  AND l_quantity < 24
"""


# Q10-shaped returned-item report ------------------------------------------------------

def returned_item_report(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k customers by revenue lost to returned items, with name and
    nation attached (TPC-H Q10 shape: fact filter -> large-key aggregate
    -> top-k -> dimension attach).

    The returns filter runs inside the fact scan; per-customer revenue
    is one custkey-keyed grouped_sum off a large-large orderkey exchange
    (lineitem returns co-locate with order custkeys — no Dataset.join);
    per-partition partial top-k caps the global sort at ~n_meta*k rows;
    customer name + nation attach to just the k winners via broadcast."""
    import ray

    from ..state.exchange import grouped_sum, partitioned_reduce

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def li_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table(
            {
                "orderkey": t["l_orderkey"].cast(pa.int64()),
                "cents": _cents(rev),
            }
        ).group_by("orderkey").aggregate([("cents", "sum")])
        return pa.table(
            {
                "orderkey": g["orderkey"],
                "cents": g["cents_sum"],
                "custkey": pa.nulls(g.num_rows, pa.int64()),
                "kind": pa.array(np.ones(g.num_rows, np.int8), pa.int8()),
            }
        )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def o_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": b["o_orderkey"].cast(pa.int64()),
                "cents": pa.nulls(b.num_rows, pa.int64()),
                "custkey": b["o_custkey"].cast(pa.int64()),
                "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }
        )

    both = orders.map_batches(o_rows, batch_format="pyarrow", batch_size=65536).union(
        li.map_batches(li_rows, batch_format="pyarrow", batch_size=65536)
    )

    def attach_cust(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(kind == 0))
        r = t.filter(pa.array(kind == 1))
        idx = pc.index_in(r["orderkey"], value_set=o["orderkey"])
        if idx.null_count:
            raise ValueError("returned lineitem references an orderkey absent from orders")
        g = pa.table(
            {
                "custkey": pc.take(o["custkey"], idx),
                "cents": r["cents"],
            }
        ).group_by("custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["custkey", "cents"])

    per_cust = grouped_sum(
        partitioned_reduce(both, "orderkey", attach_cust),
        "custkey",
        {"cents": "revenue_cents"},
    )

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        idx = pc.sort_indices(
            b, sort_keys=[("revenue_cents", "descending"), ("custkey", "ascending")]
        )
        return b.take(idx.slice(0, k))

    top = (
        per_cust.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["revenue_cents", "custkey"], descending=[True, False])
        .limit(k)
    )

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = read_table(sf_dir, "nation").to_pandas()
    n2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    lookup_ref = ray.put(
        (
            pa.array(cust["c_custkey"].astype("int64"), pa.int64()),
            pa.array(cust["c_name"], pa.string()),
            pa.array([n2name[int(x)] for x in cust["c_nationkey"]], pa.string()),
        )
    )

    def attach_dims(b: pa.Table) -> pa.Table:
        keys, names, nations = ray.get(lookup_ref)
        idx = pc.index_in(b["custkey"], value_set=keys)
        if idx.null_count:
            raise ValueError("order references a custkey absent from customer")
        return pa.table(
            {
                "c_custkey": b["custkey"],
                "c_name": pc.take(names, idx),
                "n_name": pc.take(nations, idx),
                "revenue_cents": b["revenue_cents"],
            }
        )

    return top.map_batches(attach_dims, batch_format="pyarrow", concurrency=1)


def returned_item_report_sql(k: int = 20) -> str:
    return f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
     JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT {k}
"""
