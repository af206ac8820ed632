"""Edge semantics of the round-5 relational wave: Q13-shaped zero bucket,
Q11 mean-threshold strictness, Q22 anti-join + integer average gate, Q4
semi-join multiplicity, pivot unknown-type guard, Q16 distinct-count dedup
and packed-key guards. All on crafted tables that exercise the boundary
paths the sf corpora don't."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duke_ray.pipelines.relational import (
    order_share_of_customer,
    props_rollup,
    cohort_retention,
    cumulative_users,
    events_debounce,
    event_gaps,
    top_event_type_per_user,
    brand_supplier_counts,
    customer_distribution,
    events_pivot,
    inactive_customers,
    part_revenue_share,
    priority_semijoin,
)

BASE = 1_700_000_000_000_000


def _write(tmp_path, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))


def _sf(tmp_path) -> str:
    return str(tmp_path)


def test_customer_distribution_zero_bucket(ray_session, tmp_path):
    """Customers with no orders must appear as an explicit c_count=0 row
    (the arithmetic zero bucket), not vanish."""
    _write(tmp_path, "customer", {"c_custkey": pa.array([1, 2, 3, 4], pa.int64())})
    _write(tmp_path, "orders", {"o_custkey": pa.array([1, 1, 2], pa.int64())})
    got = {
        (r["c_count"], r["custdist"])
        for r in customer_distribution(_sf(tmp_path)).to_pylist()
    }
    assert got == {(2, 1), (1, 1), (0, 2)}


def test_customer_distribution_foreign_custkey_raises(ray_session, tmp_path):
    """Orders referencing custkeys absent from customer fail loudly — even
    in the MIXED case where zero-order customers would have masked the
    phantom keys under the old arithmetic zero bucket (r5 review)."""
    _write(tmp_path, "customer", {"c_custkey": pa.array([1], pa.int64())})
    _write(tmp_path, "orders", {"o_custkey": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="absent from customer"):
        customer_distribution(_sf(tmp_path))

    # mixed: customers {1,2}, a zero-order customer 2 AND a phantom key 3
    tmp2 = tmp_path / "mixed"
    tmp2.mkdir()
    _write(tmp2, "customer", {"c_custkey": pa.array([1, 2], pa.int64())})
    _write(tmp2, "orders", {"o_custkey": pa.array([1, 3], pa.int64())})
    with pytest.raises(ValueError, match="absent from customer"):
        customer_distribution(str(tmp2))


def test_part_revenue_share_strictly_above_mean(ray_session, tmp_path):
    """rev > (total)//n_parts with strict comparison: a part exactly AT the
    mean must not survive; all-equal revenues yield an empty result."""
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([1.0, 1.0, 4.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        },
    )
    rows = part_revenue_share(_sf(tmp_path)).take_all()
    assert [(r["l_partkey"], r["revenue_cents"]) for r in rows] == [(3, 400)]

    tmp2 = tmp_path / "equal"
    tmp2.mkdir()
    _write(
        tmp2,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_extendedprice": pa.array([2.0, 2.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0], pa.float64()),
        },
    )
    assert part_revenue_share(str(tmp2)).count() == 0


def test_inactive_customers_gate_and_antijoin(ray_session, tmp_path):
    """Positive-balance average gate is strict (exactly-average excluded,
    negative balances excluded from the average), and a customer with ANY
    matching-priority order is anti-joined away while other priorities
    don't shield it."""
    # positive cents: 300, 300, 100 -> sum_pos 700, n_pos 3; strict gate
    # bal*3 > 700: 300 passes (900), 100 fails (300), -50 excluded from both
    # cust 1: passes gate, has a 1-URGENT order -> anti-joined away
    # cust 2: passes gate, only 5-LOW orders -> kept
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_nationkey": pa.array([0, 0, 0, 1], pa.int32()),
            "c_acctbal": pa.array([3.0, 3.0, 1.0, -0.5], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([1, 2, 2], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "5-LOW"], pa.string()),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
            "n_regionkey": pa.array([0, 0], pa.int32()),
        },
    )
    rows = inactive_customers(_sf(tmp_path)).take_all()
    assert [(r["n_name"], r["numcust"], r["totbal_cents"]) for r in rows] == [("ALPHA", 1, 300)]


def test_priority_semijoin_counts_order_once(ray_session, tmp_path):
    """An order with three qualifying lineitems counts ONCE (EXISTS, not
    join multiplicity); boundary values (discount == 0.05, qty == 45) do
    not qualify."""
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([10, 11, 12], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"], pa.string()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([10, 10, 10, 11, 12], pa.int64()),
            "l_discount": pa.array([0.06, 0.07, 0.08, 0.05, 0.06], pa.float64()),
            "l_quantity": pa.array([46.0, 47.0, 50.0, 50.0, 45.0], pa.float64()),
        },
    )
    rows = priority_semijoin(_sf(tmp_path)).take_all()
    assert [(r["o_orderpriority"], r["order_count"]) for r in rows] == [("1-URGENT", 1)]


def test_events_pivot_fill_and_unknown_guard(ray_session, tmp_path):
    """Missing (day, type) cells fill with 0; an event type outside the
    fixed pivot schema raises instead of dropping counts silently."""
    _write(
        tmp_path,
        "events",
        {
            "ts": pa.array([BASE, BASE, BASE + 86_400_000_000], pa.timestamp("us")),
            "event_type": pa.array(["click", "view", "click"], pa.string()),
        },
    )
    t = events_pivot(_sf(tmp_path))
    assert t.num_rows == 2
    d = {r["day"]: r for r in t.to_pylist()}
    days = sorted(d)
    assert d[days[0]]["click"] == 1 and d[days[0]]["view"] == 1 and d[days[0]]["purchase"] == 0
    assert d[days[1]]["click"] == 1 and d[days[1]]["view"] == 0

    tmp2 = tmp_path / "bad"
    tmp2.mkdir()
    _write(
        tmp2,
        "events",
        {
            "ts": pa.array([BASE], pa.timestamp("us")),
            "event_type": pa.array(["hover"], pa.string()),
        },
    )
    with pytest.raises(ValueError, match="unexpected event types"):
        events_pivot(str(tmp2))


def test_brand_supplier_counts_dedup_exclude_and_guard(ray_session, tmp_path):
    """The same (brand, band, supplier) triple repeated across lineitems
    counts once; the excluded brand's lineitems drop entirely; a suppkey
    beyond the packed-key range raises."""
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#13"], pa.string()),
            "p_size": pa.array([9, 10, 5], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            # part 1 (band 0) supp 7 twice -> 1; part 2 (band 1) supps 7,8 -> 2;
            # part 3 excluded brand
            "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "l_suppkey": pa.array([7, 7, 7, 8, 9], pa.int64()),
        },
    )
    rows = brand_supplier_counts(_sf(tmp_path)).take_all()
    got = {(r["p_brand"], r["size_band"]): r["supplier_cnt"] for r in rows}
    assert got == {("Brand#1", 0): 1, ("Brand#1", 1): 2}

    tmp2 = tmp_path / "big"
    tmp2.mkdir()
    _write(
        tmp2,
        "part",
        {
            "p_partkey": pa.array([1], pa.int64()),
            "p_brand": pa.array(["Brand#1"], pa.string()),
            "p_size": pa.array([1], pa.int32()),
        },
    )
    _write(
        tmp2,
        "lineitem",
        {
            "l_partkey": pa.array([1], pa.int64()),
            "l_suppkey": pa.array([1 << 56], pa.int64()),
        },
    )
    with pytest.raises(Exception, match="suppkey outside"):
        brand_supplier_counts(str(tmp2)).take_all()


def test_event_gaps_cap_zero_and_single(ray_session, tmp_path):
    """Gap of exactly cap minutes lands IN the cap bucket, same-timestamp
    events produce a zero bucket, and a single-event user emits no gap."""
    m = 60_000_000  # one minute in us
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            # user 1: gap 0 (tie), then exactly 60 min; user 2: 61 min
            # (capped); user 3: single event -> nothing
            "ts": pa.array([BASE, BASE, BASE + 60 * m, BASE, BASE + 61 * m, BASE], pa.timestamp("us")),
        },
    )
    got = {r["gap_bucket_min"]: r["n_gaps"] for r in event_gaps(_sf(tmp_path)).take_all()}
    assert got == {0: 1, 60: 2}


def test_top_event_type_tiebreak(ray_session, tmp_path):
    """Equal counts resolve to the lexicographically smallest type; the
    winner is by count first (a 2-count 'view' beats a 1-count 'click')."""
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "event_type": pa.array(["view", "click", "view", "view", "click"], pa.string()),
        },
    )
    rows = top_event_type_per_user(_sf(tmp_path)).take_all()
    got = {(r["user_id"]): (r["top_type"], r["n_events"]) for r in rows}
    assert got == {1: ("click", 1), 2: ("view", 2)}


def test_events_debounce_lag_not_chain(ray_session, tmp_path):
    """Debounce measures the gap to the previous RAW event of the same
    (user, type) — a dropped event still anchors the next gap — and an
    event of a DIFFERENT type in between does not reset the stream."""
    g = 3600 * 1_000_000  # default min gap in us
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["click", "click", "view", "click", "click"], pa.string()),
            # click stream for user 1: t, t+0.5g (drops), t+1.6g (gap 1.1g
            # to previous raw click -> kept, even though a 'view' sits in
            # between); user 2 single event kept
            "ts": pa.array(
                [BASE, BASE + g // 2, BASE + g, BASE + g // 2 + g * 11 // 10, BASE],
                pa.timestamp("us"),
            ),
        },
    )
    kept = {r["event_id"] for r in events_debounce(_sf(tmp_path)).take_all()}
    assert kept == {1, 3, 4, 5}


def test_cumulative_users_prefix_sum(ray_session, tmp_path):
    """A user's first-ever event day claims them once; later days count
    only genuinely new users, and the running total is a strict prefix
    sum over day order."""
    day_us = 86_400_000_000
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([1, 1, 2, 3, 1, 2], pa.int64()),
            "ts": pa.array(
                [BASE, BASE + day_us, BASE + day_us, BASE + day_us, BASE + 2 * day_us, BASE + 2 * day_us],
                pa.timestamp("us"),
            ),
        },
    )
    t = cumulative_users(_sf(tmp_path)).to_pylist()
    assert [(r["new_users"], r["cum_users"]) for r in t] == [(1, 1), (2, 3)]
    assert t[0]["day"] < t[1]["day"]


def test_cohort_retention_dedup_and_offsets(ray_session, tmp_path):
    """Multiple events by the same user on one day count once; offsets are
    measured from each user's OWN cohort day, and a later-joining user
    starts a new cohort at offset 0."""
    day_us = 86_400_000_000
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            # user 1: day0 x2, day2 x2 -> cohort d0, offsets {0, 2}
            # user 2: day2, day3 -> cohort d2, offsets {0, 1}
            "ts": pa.array(
                [BASE, BASE + 1, BASE + 2 * day_us, BASE + 2 * day_us + 5,
                 BASE + 2 * day_us, BASE + 3 * day_us],
                pa.timestamp("us"),
            ),
        },
    )
    rows = cohort_retention(_sf(tmp_path)).take_all()
    got = {(r["cohort"], r["offset_days"]): r["active_users"] for r in rows}
    days = sorted({r["cohort"] for r in rows})
    d0, d2 = days[0], days[1]
    assert got == {(d0, 0): 1, (d0, 2): 1, (d2, 0): 1, (d2, 1): 1}


def test_props_rollup_truncating_division_and_guard(ray_session, tmp_path):
    """Negative k values truncate toward zero — matching DuckDB's integer
    // exactly ((-5)//10 = 0 there, NOT -1); a props row without an
    integer k raises loudly. Verified against the oracle SQL inline."""
    _write(
        tmp_path,
        "events",
        {
            "event_type": pa.array(["click", "click", "view"], pa.string()),
            "props": pa.array(['{"k": -5}', '{"k": 19}', '{"k": 0}'], pa.string()),
        },
    )
    rows = props_rollup(_sf(tmp_path)).take_all()
    got = {(r["event_type"], r["k_decile"]): (r["n"], r["sum_k"]) for r in rows}
    assert got == {("click", 0): (1, -5), ("click", 1): (1, 19), ("view", 0): (1, 0)}

    import duckdb

    from duke_ray.pipelines.relational import PROPS_ROLLUP_SQL

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    oracle = {
        (t, d): (n, sk) for t, d, n, sk in con.sql(PROPS_ROLLUP_SQL).fetchall()
    }
    assert oracle == got

    tmp2 = tmp_path / "bad"
    tmp2.mkdir()
    _write(
        tmp2,
        "events",
        {
            "event_type": pa.array(["click"], pa.string()),
            "props": pa.array(['{"other": 1}'], pa.string()),
        },
    )
    with pytest.raises(Exception, match="lack an integer 'k'"):
        props_rollup(str(tmp2)).take_all()


def test_order_share_sums_to_million_and_zero_guard(ray_session, tmp_path):
    """Shares are floor-ppm of the customer total (a single-order customer
    gets exactly 1,000,000); a non-positive customer total raises."""
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 7, 8], pa.int64()),
            "o_totalprice": pa.array([1.0, 2.0, 5.0], pa.float64()),
        },
    )
    rows = order_share_of_customer(_sf(tmp_path)).take_all()
    got = {r["o_orderkey"]: r["share_ppm"] for r in rows}
    assert got == {1: 333333, 2: 666666, 3: 1000000}

    tmp2 = tmp_path / "zero"
    tmp2.mkdir()
    _write(
        tmp2,
        "orders",
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_totalprice": pa.array([0.0], pa.float64()),
        },
    )
    with pytest.raises(Exception, match="total is <= 0"):
        order_share_of_customer(str(tmp2)).take_all()


def test_events_debounce_matches_reference(ray_session, tmp_path):
    """Seeded random streams vs a brute-force LAG reference (ties in ts
    broken by event_id, exactly like the oracle's ORDER BY ts, event_id)."""
    rng = np.random.default_rng(7)
    n = 4000
    ts = BASE + rng.integers(0, 3_600_000_000, n)  # 1h span -> dense collisions
    tbl = {
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "event_type": pa.array(np.array(["a", "b", "c"])[rng.integers(0, 3, n)], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }
    _write(tmp_path, "events", tbl)
    gap_s = 120
    got = sorted(r["event_id"] for r in events_debounce(_sf(tmp_path), min_gap_seconds=gap_s).take_all())

    import pandas as pd

    df = pd.DataFrame({"event_id": np.arange(n), "user_id": tbl["user_id"].to_numpy(),
                       "event_type": tbl["event_type"].to_pylist(), "ts_us": ts})
    df = df.sort_values(["user_id", "event_type", "ts_us", "event_id"])
    lag = df.groupby(["user_id", "event_type"])["ts_us"].shift()
    expect = sorted(df["event_id"][(lag.isna()) | (df["ts_us"] - lag > gap_s * 1_000_000)])
    assert got == expect


def test_top_event_type_matches_reference(ray_session, tmp_path):
    """Seeded random streams vs a pandas mode-with-tiebreak reference."""
    rng = np.random.default_rng(11)
    n = 5000
    tbl = {
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(np.array(["x", "y", "z", "w"])[rng.integers(0, 4, n)], pa.string()),
    }
    _write(tmp_path, "events", tbl)
    got = {r["user_id"]: (r["top_type"], r["n_events"])
           for r in top_event_type_per_user(_sf(tmp_path)).take_all()}

    import pandas as pd

    df = pd.DataFrame({"user_id": tbl["user_id"].to_numpy(), "event_type": tbl["event_type"].to_pylist()})
    counts = df.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    counts = counts.sort_values(["user_id", "n", "event_type"], ascending=[True, False, True])
    expect = {int(r.user_id): (r.event_type, int(r.n))
              for r in counts.groupby("user_id").head(1).itertuples()}
    assert got == expect


def test_cohort_retention_pre_epoch_days(ray_session, tmp_path):
    """Pre-1970 timestamps floor to the correct calendar day (truncating
    division would shift them forward a day): an event 1us before the
    epoch belongs to 1969-12-31, and an offset to an epoch-day event is 1."""
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([-1, 3600_000_000], pa.timestamp("us")),
        },
    )
    rows = cohort_retention(_sf(tmp_path)).take_all()
    got = {(r["cohort"], r["offset_days"]): r["active_users"] for r in rows}
    assert got == {("1969-12-31", 0): 1, ("1969-12-31", 1): 1}


def test_key_reconcile_all_statuses_and_dups(ray_session):
    """Duplicate keys within a side collapse to one presence; all three
    statuses emit; disjoint and overlapping keys count correctly."""
    import ray

    from duke_ray.stages.dedup import key_reconcile

    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 1, 2, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"vec_id": pa.array([2, 2, 4], pa.int64())})
    )
    rows = key_reconcile(left, right, left_key="doc_id", right_key="vec_id").take_all()
    got = {r["status"]: r["n_keys"] for r in rows}
    assert got == {"both": 1, "left_only": 2, "right_only": 1}


def test_cli_query_subcommand(tmp_path):
    """The driver-contract registry doubles as the job catalog: `query
    --list` names every pipeline, and `query --name ... --out` lands
    parquet. Subprocess because cli.main owns (and shuts down) a Ray
    session."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "duke_ray.cli", "--num-cpus", "4", "query", "--list"],
        capture_output=True, text=True, env=env, check=True, timeout=300,
    )
    names = json.loads(r.stdout.strip().splitlines()[-1])["queries"]
    assert "pricing_summary" in names and "cohort_retention" in names

    out = tmp_path / "q"
    r = subprocess.run(
        [sys.executable, "-m", "duke_ray.cli", "--num-cpus", "4", "query",
         "--name", "customers_per_region", "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(out)],
        capture_output=True, text=True, env=env, check=True, timeout=300,
    )
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0
    import duckdb

    n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n == res["rows"]


def test_funnel_strict_ordering(ray_session, tmp_path):
    """A click at or before the first view does not advance the funnel
    (strict >); a purchase before the qualifying click doesn't count; and
    greedy earliest-match finds later valid completions."""
    from duke_ray.pipelines.relational import funnel_counts

    m = 60_000_000
    rows = [
        # user 1: view t0, click t0 (tie -> no), click t1 (yes), purchase t2 -> full funnel
        (1, "view", 0), (1, "click", 0), (1, "click", 1), (1, "purchase", 2),
        # user 2: click before any view -> stage1 only (view at t1)
        (2, "click", 0), (2, "view", 1),
        # user 3: view, purchase, click -> purchase precedes click: stage12 only
        (3, "view", 0), (3, "purchase", 1), (3, "click", 2),
        # user 4: never views -> no stage
        (4, "click", 0), (4, "purchase", 1),
    ]
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([BASE + r[2] * m for r in rows], pa.timestamp("us")),
        },
    )
    t = funnel_counts(_sf(tmp_path)).to_pylist()[0]
    assert (t["n_stage1"], t["n_stage12"], t["n_stage123"]) == (3, 2, 1)


def test_funnel_over_four_stages_matches_reference(ray_session, tmp_path):
    """k-stage funnel vs a brute-force per-user greedy scan on seeded
    random streams (4 stages, dense ts collisions)."""
    import ray

    from duke_ray.pipelines.relational import funnel_over

    rng = np.random.default_rng(23)
    n = 6000
    stages = ("a", "b", "c", "d")
    types = np.array(["a", "b", "c", "d", "x"])[rng.integers(0, 5, n)]
    users = rng.integers(0, 50, n)
    ts = BASE + rng.integers(0, 1000, n)  # heavy ties
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
    )
    got = funnel_over(ev, stages)

    expect = [0, 0, 0, 0]
    for u in np.unique(users):
        m = users == u
        ut, uty = ts[m], types[m]
        order = np.argsort(ut, kind="stable")
        ut, uty = ut[order], uty[order]
        prev = -np.inf
        for i, st in enumerate(stages):
            cand = ut[(uty == st) & (ut > prev)]
            if cand.size == 0:
                break
            prev = cand.min()
            expect[i] += 1
    assert got == expect


def test_funnel_over_duplicate_stage_raises(ray_session):
    import ray

    from duke_ray.pipelines.relational import funnel_over

    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["a"], pa.string()),
                "ts": pa.array([BASE], pa.timestamp("us")),
            }
        )
    )
    with pytest.raises(ValueError, match="distinct"):
        funnel_over(ev, ("a", "a"))


def test_cube_counts_all_subsets(ray_session):
    """CUBE emits all 2^k subsets with sentinel-blanked positions; the
    source-only marginal (absent from ROLLUP) sums correctly; sentinel
    collision raises."""
    import ray

    from duke_ray.pipelines.relational import cube_counts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(["x", "x", "y"], pa.string()),
                "b": pa.array(["p", "q", "q"], pa.string()),
            }
        )
    )
    rows = {(r["a"], r["b"]): r["n_rows"] for r in cube_counts(ds, ["a", "b"]).take_all()}
    assert rows[("ALL", "ALL")] == 3
    assert rows[("x", "ALL")] == 2 and rows[("y", "ALL")] == 1
    assert rows[("ALL", "p")] == 1 and rows[("ALL", "q")] == 2  # the CUBE-only marginal
    assert rows[("x", "p")] == 1 and rows[("x", "q")] == 1 and rows[("y", "q")] == 1
    assert len(rows) == 8

    bad = ray.data.from_arrow(
        pa.table({"a": pa.array(["ALL"], pa.string()), "b": pa.array(["p"], pa.string())})
    )
    with pytest.raises(Exception, match="sentinel"):
        cube_counts(bad, ["a", "b"]).take_all()


def test_small_quantity_threshold_strict(ray_session, tmp_path):
    """qty strictly below 20% of the part's mean qualifies; exactly-at
    does not (5*qty*n == sum); single-lineitem parts never qualify
    (qty*5 < qty is false for positive qty)."""
    from duke_ray.pipelines.relational import small_quantity_revenue

    # part 1: qtys 1, 99 -> mean 50, 20% = 10 -> qty 1 qualifies (5*1*2=10 < 100? 10 < 100 yes)
    #   qty 99: 5*99*2 = 990 !< 100 -> no
    # part 2: qtys 2, 8 -> sum 10; qty 2: 5*2*2 = 20 !< 10 -> no (2 == 20% of 5? mean 5, 20% = 1 -> 2 not < 1)
    # part 3: single qty 7 -> 5*7*1 = 35 !< 7 -> no
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "l_quantity": pa.array([1.0, 99.0, 2.0, 8.0, 7.0], pa.float64()),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0], pa.float64()),
        },
    )
    t = small_quantity_revenue(_sf(tmp_path)).to_pylist()[0]
    assert (t["revenue_cents"], t["n_items"]) == (1000, 1)


def test_forecast_revenue_band_boundaries(ray_session, tmp_path):
    """Discount band is inclusive [5%, 7%] on the milli grid; qty 24 and
    off-year shipments drop; rounding is per row."""
    from duke_ray.pipelines.relational import forecast_revenue

    import datetime

    def us(y):
        return int(datetime.datetime(y, 6, 1).timestamp() * 1_000_000)

    _write(
        tmp_path,
        "lineitem",
        {
            "l_shipdate": pa.array([us(1996)] * 5 + [us(1995)], pa.timestamp("us")),
            "l_discount": pa.array([0.05, 0.07, 0.04, 0.08, 0.06, 0.06], pa.float64()),
            "l_quantity": pa.array([10.0, 23.0, 10.0, 10.0, 24.0, 10.0], pa.float64()),
            "l_extendedprice": pa.array([100.0] * 6, pa.float64()),
        },
    )
    t = forecast_revenue(_sf(tmp_path), year=1996).to_pylist()[0]
    # qualifying: rows 0 (5%) and 1 (7%) -> 100*0.05 + 100*0.07 = 12.00
    assert (t["revenue_cents"], t["n_items"]) == (1200, 2)


def test_returned_item_report_filter_and_tiebreak(ray_session, tmp_path):
    """Only 'R' lineitems count; equal revenues order by custkey asc; names
    and nations attach to the winners only."""
    from duke_ray.pipelines.relational import returned_item_report

    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_returnflag": pa.array(["R", "N", "R", "R"], pa.string()),
            "l_extendedprice": pa.array([10.0, 99.0, 10.0, 5.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 5, 9], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([5, 7, 9], pa.int64()),
            "c_name": pa.array(["c5", "c7", "c9"], pa.string()),
            "c_nationkey": pa.array([0, 1, 0], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
            "n_regionkey": pa.array([0, 0], pa.int32()),
        },
    )
    rows = returned_item_report(_sf(tmp_path), k=2).take_all()
    # custs 5 and 7 tie at 1000 cents -> custkey asc; cust 9 (500) cut by k=2
    assert [(r["c_custkey"], r["c_name"], r["n_name"], r["revenue_cents"]) for r in rows] == [
        (5, "c5", "ALPHA", 1000),
        (7, "c7", "BETA", 1000),
    ]
