"""Edge-case semantics of the rewritten relational operators (VERDICT r1
#4/#5): time-bucketed as-of join with cross-bucket carry, meta-partitioned
running window. Verified against pandas references on crafted events that
exercise the carry/boundary paths the sf tables don't."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duke_ray.pipelines.relational import clicks_asof_purchases, user_running_values

HOUR_US = 3_600_000_000
BASE = 1_700_000_000_000_000  # some epoch-us anchor


def _write_events(tmp_path, rows: list[tuple[int, int, int, str, float]]) -> str:
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "events_sf"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_asof_carry_across_empty_buckets(ray_session, tmp_path):
    """Clicks many hours after the only purchase must still match it (the
    carry must jump over buckets with no purchases), clicks before any
    purchase must drop, and an exact-timestamp collision must NOT match
    (strictly-before semantics)."""
    rows = [
        (1, BASE + 10, 1, "click", 1.0),                    # before any purchase -> dropped
        (2, BASE + 20, 1, "purchase", 1.0),                 # the only purchase
        (3, BASE + 30, 1, "click", 1.0),                    # same bucket -> 2
        (4, BASE + 5 * HOUR_US, 1, "click", 1.0),           # 5 empty buckets later -> 2
        (5, BASE + 9 * HOUR_US + 7, 2, "click", 1.0),       # 9 buckets later -> 2
        (6, BASE + 20, 2, "click", 1.0),                    # ts == purchase ts -> dropped
        (7, BASE + 2 * HOUR_US, 2, "view", 1.0),            # non-click ignored
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["event_id"]: r["purchase_id"]
        for r in clicks_asof_purchases(sf).take_all()
    }
    assert got == {3: 2, 4: 2, 5: 2}


def test_asof_latest_purchase_tiebreak(ray_session, tmp_path):
    """Among purchases at the same latest ts, the highest event_id wins
    (ORDER BY ts DESC, event_id DESC LIMIT 1 semantics), both within a
    bucket and through the cross-bucket carry."""
    rows = [
        (1, BASE + 10, 1, "purchase", 1.0),
        (2, BASE + 10, 1, "purchase", 1.0),    # same ts, higher id
        (3, BASE + 50, 1, "click", 1.0),       # same bucket -> 2
        (4, BASE + 3 * HOUR_US, 1, "click", 1.0),  # via carry -> 2
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["event_id"]: r["purchase_id"] for r in clicks_asof_purchases(sf).take_all()}
    assert got == {3: 2, 4: 2}


def test_asof_pre_epoch_timestamps(ray_session, tmp_path):
    """Negative (pre-epoch) purchase timestamps must stay matchable — the
    merge tracks candidate presence with masks, not a -1 ts sentinel
    (ADVICE r3)."""
    rows = [
        (1, -5 * HOUR_US, 1, "purchase", 1.0),   # pre-epoch purchase
        (2, -5 * HOUR_US + 10, 1, "click", 1.0),  # same (negative) bucket -> 1
        (3, -2 * HOUR_US, 1, "click", 1.0),       # later negative bucket, via carry -> 1
        (4, BASE, 1, "click", 1.0),               # far later, via carry -> 1
        (5, -6 * HOUR_US, 2, "click", 1.0),       # before the purchase -> dropped
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["event_id"]: r["purchase_id"] for r in clicks_asof_purchases(sf).take_all()}
    assert got == {2: 1, 3: 1, 4: 1}


def test_asof_matches_pandas_merge_asof(ray_session, tmp_path):
    """Randomized cross-check vs pandas merge_asof over many buckets."""
    gen = np.random.Generator(np.random.Philox(key=42))
    n = 3000
    ts = BASE + np.sort(gen.integers(0, 40 * HOUR_US, size=n))
    kinds = np.where(gen.random(n) < 0.2, "purchase", "click")
    rows = [
        (i, int(ts[i]), int(gen.integers(0, 20)), str(kinds[i]), 1.0)
        for i in range(n)
    ]
    sf = _write_events(tmp_path, rows)

    df = pd.DataFrame(
        {"event_id": range(n), "ts": ts, "event_type": kinds}
    )
    p = df[df.event_type == "purchase"].sort_values(["ts", "event_id"])
    # keep the max event_id per ts so backward-asof picks it on ties
    p = p.groupby("ts", as_index=False).last()
    c = df[df.event_type == "click"].sort_values("ts")
    merged = pd.merge_asof(
        c, p[["ts", "event_id"]].rename(columns={"event_id": "purchase_id"}),
        on="ts", direction="backward", allow_exact_matches=False,
    ).dropna(subset=["purchase_id"])
    want = dict(zip(merged["event_id"], merged["purchase_id"].astype(int)))

    got = {r["event_id"]: r["purchase_id"] for r in clicks_asof_purchases(sf).take_all()}
    assert got == want


def test_user_sessions_gap_semantics(ray_session, tmp_path):
    from duke_ray.pipelines.relational import user_sessions

    GAP = 30 * 60_000_000
    rows = [
        (1, BASE, 1, "click", 1.0),
        (2, BASE + GAP, 1, "click", 1.0),            # exactly gap -> SAME session
        (3, BASE + 2 * GAP + 1, 1, "click", 1.0),    # gap exceeded -> new session
        (4, BASE + 2 * GAP + 2, 1, "click", 1.0),    # tiny gap -> same
        (5, BASE, 2, "click", 1.0),                  # other user independent
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["event_id"]: r["session_no"] for r in user_sessions(sf).take_all()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_user_sessions_matches_pandas(ray_session, tmp_path):
    from duke_ray.pipelines.relational import user_sessions

    gen = np.random.Generator(np.random.Philox(key=11))
    n = 2000
    rows = [
        (i, BASE + int(gen.integers(0, 6 * HOUR_US)), int(gen.integers(0, 9)), "click", 1.0)
        for i in range(n)
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["event_id"]: r["session_no"] for r in user_sessions(sf).take_all()}

    df = pd.DataFrame(
        {"event_id": [r[0] for r in rows], "ts": [r[1] for r in rows], "user_id": [r[2] for r in rows]}
    ).sort_values(["user_id", "ts", "event_id"], kind="stable")
    gap = 30 * 60_000_000
    new_sess = (df.groupby("user_id")["ts"].diff().fillna(gap + 1) > gap)
    df["session_no"] = new_sess.groupby(df["user_id"]).cumsum().astype(int) - 1
    want = dict(zip(df["event_id"], df["session_no"]))
    assert got == want


def test_user_running_values_matches_pandas(ray_session, tmp_path):
    gen = np.random.Generator(np.random.Philox(key=7))
    n = 2000
    rows = [
        (
            i,
            BASE + int(gen.integers(0, 10 * HOUR_US)),
            int(gen.integers(0, 7)),
            "click",
            float(np.round(gen.random() * 10, 4)),
        )
        for i in range(n)
    ]
    sf = _write_events(tmp_path, rows)
    got = (
        user_running_values(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "value": [r[4] for r in rows],
        }
    )
    m = df["value"] * 1000
    # half away from zero, matching DuckDB ROUND
    df["milli"] = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    df["running_milli"] = df.groupby("user_id")["milli"].cumsum()
    df["prev_milli"] = df.groupby("user_id")["milli"].shift(1)
    want = df.sort_values("event_id").reset_index(drop=True)

    assert got["running_milli"].equals(want["running_milli"].astype("int64"))
    pd.testing.assert_series_equal(
        got["prev_milli"].astype("float64"),
        want["prev_milli"].astype("float64"),
        check_names=False,
    )


def test_events_sliding_fanout_invariants(ray_session):
    import pyarrow.parquet as pq

    from duke_ray.pipelines.relational import events_sliding_hourly

    sf = "/root/testdata/sf0.001"
    out = events_sliding_hourly(sf).to_pandas()
    n_events = pq.read_metadata(sf + "/events.parquet").num_rows
    # every event lands in exactly W/H = 4 windows
    assert out["n_events"].sum() == 4 * n_events
    # window starts are hop-aligned (pandas int64 view is NANOSECONDS)
    ns = out["window_start"].values.astype("datetime64[ns]").astype("int64")
    assert (ns % 900_000_000_000 == 0).all()
    # overlapping windows: distinct starts outnumber tumbling hours
    hours = ns // 3_600_000_000_000
    import numpy as _np
    assert len(_np.unique(ns)) > len(_np.unique(hours))


def test_follow_window_range_join(ray_session, tmp_path, monkeypatch):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duke_ray.pipelines.relational import follow_window

    # user 1: events at t=0, 5min, 10min, 10min+1us; user 2: one event at 5min
    base = 1_700_000_000_000_000
    m = 60_000_000
    rows = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [base, base + 5 * m, base + 10 * m, base + 10 * m + 1, base + 5 * m],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 100.0], pa.float64()),
        }
    )
    pq.write_table(rows, str(tmp_path / "events.parquet"))
    out = (
        follow_window(str(tmp_path), window_minutes=10)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # event 1 window (0, 10min]: events 2 and 3 (boundary INCLUSIVE), not 4
    assert out.loc[1, "n_follow"] == 2 and out.loc[1, "sum_follow_milli"] == 6000
    # event 2 window (5, 15min]: events 3 and 4
    assert out.loc[2, "n_follow"] == 2 and out.loc[2, "sum_follow_milli"] == 12000
    # event 3 window: only event 4 (1us later)
    assert out.loc[3, "n_follow"] == 1 and out.loc[3, "sum_follow_milli"] == 8000
    assert out.loc[4, "n_follow"] == 0 and out.loc[4, "sum_follow_milli"] == 0
    # user isolation: user 2 sees nothing from user 1
    assert out.loc[5, "n_follow"] == 0
