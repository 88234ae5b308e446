"""Growth-accounting operators: semantics vs driver-side replays."""

from __future__ import annotations

import datetime
import math

import pytest

from cdc_local_data_pipeline_docker_spark.operators import growth as GR

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").collect()


def test_cumulative_uniques_telescope_to_total(spark, events):
    out = GR.events_cumulative_unique_users(spark, SF).collect()
    total_users = len({e.user_id for e in events})
    assert sum(r.n_new_users for r in out) == total_users
    assert out[-1].n_cumulative_users == total_users
    running = 0
    for r in out:
        running += r.n_new_users
        assert r.n_cumulative_users == running
    # first-seen days really are min event dates
    first = {}
    for e in events:
        d = e.ts.date()
        first[e.user_id] = min(first.get(e.user_id, d), d)
    from collections import Counter

    want = Counter(first.values())
    assert {r.day: r.n_new_users for r in out} == dict(want)


def test_rolling_active_users_matches_interval_replay(spark, events):
    """Every (window_start, n_active_users) equals the distinct-user count
    of events with ts in [window_start, window_start + 7 days)."""
    out = GR.events_rolling_active_users(spark, SF).collect()
    assert out
    by_user_ts = [(e.user_id, e.ts) for e in events]
    for r in out:
        lo = r.window_start
        hi = lo + datetime.timedelta(days=GR.ROLLING_DAYS)
        users = {u for u, ts in by_user_ts if lo <= ts < hi}
        n = sum(1 for _u, ts in by_user_ts if lo <= ts < hi)
        assert (r.n_active_users, r.n_events) == (len(users), n), r.window_start
    # window spine is daily and covers every event
    starts = sorted(r.window_start for r in out)
    deltas = {
        (b - a).total_seconds() for a, b in zip(starts, starts[1:])
    }
    assert deltas <= {86400.0}


def test_lag_correlation_matches_python_series_replay(spark, events):
    """Each lag's exact sums and the final double equal a driver-side
    replay of the two hourly series over the full spine."""
    out = GR.events_lag_correlation(spark, SF).collect()
    assert [r.lag_hours for r in out] == sorted(GR.CORR_LAGS)

    def hour_of(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    xs, ys = {}, {}
    for e in events:
        if e.event_type == GR.CORR_X_TYPE:
            xs[hour_of(e.ts)] = xs.get(hour_of(e.ts), 0) + 1
        elif e.event_type == GR.CORR_Y_TYPE:
            ys[hour_of(e.ts)] = ys.get(hour_of(e.ts), 0) + 1
    lo = hour_of(min(e.ts for e in events))
    hi = hour_of(max(e.ts for e in events))
    spine = []
    h = lo
    while h <= hi:
        spine.append(h)
        h += datetime.timedelta(hours=1)
    for r in out:
        lag = datetime.timedelta(hours=r.lag_hours)
        pairs = [
            (xs.get(h, 0), ys.get(h + lag, 0)) for h in spine if h + lag <= hi
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        assert (r.n_hours, r.sum_x, r.sum_y) == (n, sx, sy)
        num = n * sxy - sx * sy
        assert r.corr_num == num
        want = float(num) / (
            math.sqrt(float(n * sxx - sx * sx))
            * math.sqrt(float(n * syy - sy * sy))
        )
        assert r.corr == want
        assert -1.0 <= r.corr <= 1.0
    # larger lags see a shorter spine
    ns = [r.n_hours for r in out]
    assert ns[0] - ns[-1] == max(GR.CORR_LAGS) - min(GR.CORR_LAGS)
