"""Sweep-line session concurrency, Pareto skyline, last-touch attribution.

Each operator's cross-engine equality is proven by its DuckDB oracle
(test_oracle_parity); here the SEMANTICS are proven against independent
driver-side recomputations — the brute sweep, the quadratic dominance
scan, and a per-user replay.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from cdc_local_data_pipeline_docker_spark.operators import (
    events_analytics as EV,
)
from cdc_local_data_pipeline_docker_spark.operators import intervals as IT
from cdc_local_data_pipeline_docker_spark.operators import skyline as SKY

SF = "/root/testdata/sf0.001"


def test_concurrency_matches_brute_global_sweep(spark):
    """The two-phase (hour-local + carry spine) decomposition equals a
    single global Python sweep over session boundaries."""
    sessions = EV.events_sessionize(spark, SF).collect()
    deltas = []
    for s in sessions:
        deltas.append((s.session_start, s.user_id, s.session_seq, 1))
        deltas.append((s.session_end, s.user_id, s.session_seq, -1))
    # sweep order: ts asc, starts (+1) before ends (-1), then user/seq
    deltas.sort(key=lambda d: (d[0], -d[3], d[1], d[2]))
    run = 0
    per_hour = {}
    for ts, _u, _seq, delta in deltas:
        run += delta
        hour = ts.replace(minute=0, second=0, microsecond=0)
        st = per_hour.setdefault(hour, [0, 0, run, run])
        st[0] += delta == 1
        st[1] += delta == -1
        st[2] = max(st[2], run)
        st[3] = run
    got = {
        r.hour_start: (r.n_starts, r.n_ends, r.peak_concurrency,
                       r.end_concurrency)
        for r in IT.events_session_concurrency(spark, SF).collect()
    }
    want = {h: tuple(v) for h, v in per_hour.items()}
    assert got == want
    # conservation: everything that starts, ends; the final carry is zero
    assert sum(v[0] for v in want.values()) == len(sessions)
    assert sum(v[1] for v in want.values()) == len(sessions)
    last_hour = max(want)
    assert want[last_hour][3] == 0


def test_pareto_frontier_equals_quadratic_dominance_scan(spark):
    """The date-spine reduction equals the textbook NOT EXISTS skyline."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS "
        f"SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    brute = {
        tuple(r)
        for r in con.sql(SKY.ORDERS_PARETO_BRUTE_SQL).fetchall()
    }
    got = {
        (r.o_orderkey, r.o_custkey, r.o_orderdate, r.o_totalprice)
        for r in SKY.orders_pareto_frontier(spark, SF).collect()
    }
    assert got == brute
    assert got, "empty frontier"
    # frontier is a strict staircase at the date level: later date ->
    # strictly smaller price among frontier points
    by_date = sorted({(d, p) for _k, _c, d, p in got})
    for (d1, p1), (d2, p2) in zip(by_date, by_date[1:]):
        assert d1 < d2 and p1 > p2


def test_attribution_matches_per_user_replay(spark):
    """Last-touch attribution equals a per-user chronological replay."""
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    want = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e.ts, e.event_id))
        touch = None
        for e in evs:
            if e.event_type in EV.ATTRIB_TOUCH_TYPES:
                touch = e
            elif e.event_type == EV.ATTRIB_CONVERSION_TYPE:
                in_w = touch is not None and (
                    (e.ts - touch.ts).total_seconds()
                    <= EV.ATTRIB_WINDOW_HOURS * 3600
                )
                want[e.event_id] = (
                    touch.event_id if in_w else None,
                    touch.event_type if in_w else "direct",
                )
    got = {
        r.purchase_event_id: (r.touch_event_id, r.channel)
        for r in EV.events_attribution_last_touch(spark, SF).collect()
    }
    assert got == want
    channels = {c for _t, c in got.values()}
    assert channels <= {"click", "view", "direct"}
    assert "direct" in channels or len(got) > 0


def test_linear_attribution_matches_per_user_range_replay(spark):
    """Linear credits equal a driver-side count of touches in each
    purchase's 24 h lookback, and the fixed-point split telescopes."""
    import math

    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    got = {
        r.purchase_event_id: r
        for r in EV.events_attribution_linear(spark, SF).collect()
    }
    n_checked = 0
    for user, evs in by_user.items():
        for e in evs:
            if e.event_type != EV.ATTRIB_CONVERSION_TYPE:
                continue
            lo = e.ts - datetime.timedelta(hours=EV.ATTRIB_WINDOW_HOURS)
            clicks = sum(
                1 for t in evs
                if t.event_type == "click" and lo <= t.ts <= e.ts
            )
            views = sum(
                1 for t in evs
                if t.event_type == "view" and lo <= t.ts <= e.ts
            )
            r = got[e.event_id]
            assert (r.n_clicks, r.n_views) == (clicks, views)
            n = clicks + views
            assert r.is_direct == (n == 0)
            if n:
                assert r.click_credit_fp == math.floor(1_000_000 * clicks / n)
                assert r.view_credit_fp == math.floor(1_000_000 * views / n)
                # the equal-split telescopes up to flooring loss < 2 units
                assert 0 <= 1_000_000 - (r.click_credit_fp + r.view_credit_fp) < 2
            n_checked += 1
    assert n_checked == len(got) > 0


@pytest.mark.slow
def test_overlap_pairs_brute_and_emit_once(spark):
    """The binned emit-once join equals a brute interval scan, every
    pair appears exactly once, and the bucket trick is non-vacuous
    (multi-hour sessions exist)."""
    sessions = EV.events_sessionize(spark, SF).collect()
    brute = {}
    for i, s1 in enumerate(sessions):
        for s2 in sessions[i + 1:]:
            if s1.user_id == s2.user_id:
                continue
            a, b = sorted((s1, s2), key=lambda s: s.user_id)
            lo = max(a.session_start, b.session_start)
            hi = min(a.session_end, b.session_end)
            if lo <= hi:
                brute[(a.user_id, a.session_seq, b.user_id, b.session_seq)] = (
                    lo, hi
                )
    out = IT.sessions_overlap_pairs(spark, SF).collect()
    got = {
        (r.u1, r.seq1, r.u2, r.seq2): (r.overlap_start, r.overlap_end)
        for r in out
    }
    assert len(out) == len(got), "a pair was emitted by more than one bucket"
    assert got == brute
    for r in out:
        us = (r.overlap_end - r.overlap_start) / datetime.timedelta(
            microseconds=1
        )
        assert r.overlap_us == us >= 0
    multi_hour = [
        s for s in sessions
        if s.session_start.replace(minute=0, second=0, microsecond=0)
        != s.session_end.replace(minute=0, second=0, microsecond=0)
    ]
    assert multi_hour, "fixture degenerate: no session spans an hour boundary"


def test_rolling_hll_bound_holds_everywhere(spark):
    from cdc_local_data_pipeline_docker_spark.operators import growth as GR

    out = GR.events_rolling_active_users_hll(spark, SF).collect()
    exact = {
        r.window_start: r.n_active_users
        for r in GR.events_rolling_active_users(spark, SF).collect()
    }
    assert {r.window_start for r in out} == set(exact)
    for r in out:
        assert r.exact_active_users == exact[r.window_start]
        assert r.estimate_within_bound
