"""Property tests for operators/timeseries.py (oracle parity runs via
test_oracle_parity on the registry entries; these pin the semantic
invariants the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.catalog import load_table
from cdc_local_data_pipeline_docker_spark.operators import timeseries as TS


def test_resample_grid_is_hourly_and_bounded(spark, sf_dir):
    """Every user's grid is exactly hourly, spans [trunc(min_ts),
    trunc(max_ts)], and is dense (no missing hours)."""
    out = TS.events_resample_interpolate(spark, sf_dir)
    g = out.groupBy("user_id").agg(
        F.min("grid_ts").alias("gmin"),
        F.max("grid_ts").alias("gmax"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("grid_ts").alias("nd"),
    )
    src = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % TS.RESAMPLE_USER_MOD == 0)
        .groupBy("user_id")
        .agg(
            F.expr("date_trunc('hour', min(ts))").alias("emin"),
            F.expr("date_trunc('hour', max(ts))").alias("emax"),
        )
    )
    for r in g.join(src, "user_id").collect():
        assert r.gmin == r.emin and r.gmax == r.emax
        span_hours = int((r.gmax - r.gmin).total_seconds()) // 3600 + 1
        assert r.n == r.nd == span_hours, (r.user_id, r.n, span_hours)


def test_resample_interpolation_is_between_neighbors(spark, sf_dir):
    """Interpolated values are convex combinations: each grid value lies
    within [min, max] of that user's observed values, and a grid point
    landing exactly on an observation reproduces it bit-for-bit."""
    out = TS.events_resample_interpolate(spark, sf_dir)
    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % TS.RESAMPLE_USER_MOD == 0)
        .groupBy("user_id", "ts")
        .agg(F.min_by("value", "event_id").alias("value"))
    )
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in obs.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    rows = out.collect()
    assert rows
    for r in rows:
        lo, hi = bounds[r.user_id]
        assert lo <= r.value <= hi, (r.user_id, r.grid_ts, r.value)


def test_resample_hand_computed(spark, tmp_path):
    """Known fixture: on-the-hour observations reproduce exactly (frac=0
    branch), a midpoint interpolates to the arithmetic middle, and a
    grid point before the first observation clamps to the next value."""
    from datetime import datetime

    rows = [
        # user 0: obs at 00:00 (10.0) and 02:00 (30.0) → grid 00/01/02
        (1, datetime(2024, 1, 1, 0, 0, 0), 0, "a", 10.0, "{}"),
        (2, datetime(2024, 1, 1, 2, 0, 0), 0, "a", 30.0, "{}"),
        # user 10: first obs at 00:30 → grid point 00:00 clamps to 5.0
        (3, datetime(2024, 1, 1, 0, 30, 0), 10, "a", 5.0, "{}"),
        (4, datetime(2024, 1, 1, 1, 30, 0), 10, "a", 9.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.user_id, r.grid_ts): r.value
        for r in TS.events_resample_interpolate(spark, str(tmp_path)).collect()
    }
    assert got == {
        (0, datetime(2024, 1, 1, 0, 0, 0)): 10.0,
        (0, datetime(2024, 1, 1, 1, 0, 0)): 20.0,  # exact midpoint
        (0, datetime(2024, 1, 1, 2, 0, 0)): 30.0,
        (10, datetime(2024, 1, 1, 0, 0, 0)): 5.0,  # leading-edge clamp
        (10, datetime(2024, 1, 1, 1, 0, 0)): 5.0 + (9.0 - 5.0) * 0.5,
    }


def test_mad_outliers_satisfy_definition(spark, sf_dir):
    """Every emitted row violates the 3-MAD band; med/mad are constant
    per event type; and the lower-median matches a local recomputation."""
    out = TS.events_mad_outliers(spark, sf_dir).collect()
    assert out
    per_type: dict[str, tuple[float, float]] = {}
    for r in out:
        assert abs(r.value - r.med) > TS.MAD_K * r.mad
        prev = per_type.setdefault(r.event_type, (r.med, r.mad))
        assert prev == (r.med, r.mad)
    vals: dict[str, list] = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .collect()
    ):
        vals.setdefault(r.event_type, []).append((r.value, r.event_id))
    for et, (med, mad) in per_type.items():
        vs = sorted(vals[et])
        lower_med = vs[(len(vs) + 1) // 2 - 1][0]
        assert med == lower_med
        devs = sorted(
            (abs(v - lower_med), eid) for v, eid in vals[et]
        )
        assert mad == devs[(len(devs) + 1) // 2 - 1][0]


def test_winsorize_definition(spark, sf_dir):
    """p05/p95 match local order-statistic selection at ceil(n/20) /
    ceil(19n/20); clipped counts and the winsorized sum follow."""
    out = {r.event_type: r for r in TS.events_value_winsorize(spark, sf_dir).collect()}
    vals: dict[str, list] = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .collect()
    ):
        vals.setdefault(r.event_type, []).append((r.value, r.event_id))
    assert out and set(out) == set(vals)
    for et, vs in vals.items():
        vs = sorted(vs)
        n = len(vs)
        p05 = vs[(n + 19) // 20 - 1][0]
        p95 = vs[(19 * n + 19) // 20 - 1][0]
        r = out[et]
        assert (r.n, r.p05, r.p95) == (n, p05, p95)
        assert r.n_clipped_low == sum(1 for v, _ in vs if v < p05)
        assert r.n_clipped_high == sum(1 for v, _ in vs if v > p95)
        assert r.p05 <= r.p95


def test_ewma_hand_computed(spark, tmp_path):
    """Three events for one user: the truncated-normalizer EWMA must match
    the hand calculation exactly (alpha=1/2 weights are exact in IEEE)."""
    import pandas as pd

    from cdc_local_data_pipeline_docker_spark.operators.timeseries import (
        events_ewma_smooth,
    )

    rows = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
            "user_id": [7, 7, 7],
            "event_type": ["a", "a", "a"],
            "value": [4.0, 2.0, 1.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in events_ewma_smooth(spark, str(tmp_path)).collect()
    }
    assert got[0] == 4.0  # only itself
    assert got[1] == (2.0 + 0.5 * 4.0) / 1.5
    assert got[2] == (1.0 + 0.5 * 2.0 + 0.25 * 4.0) / 1.75


def test_ewma_single_window_exchange(spark, sf_dir):
    """All 8 lag frames share one window spec -> exactly one hash-partition
    exchange (plus the final presentation sort's range exchange)."""
    from cdc_local_data_pipeline_docker_spark.operators.timeseries import (
        events_ewma_smooth,
    )

    plan = (
        events_ewma_smooth(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 1, plan


def test_cusum_closed_form_matches_textbook_recursion(spark):
    """S_t = P_t - min_{j<=t} P_j  ==  S_t = max(0, S_{t-1} + d_t):
    pin the distributable closed form against the sequential textbook
    recursion on a constructed series with a deliberate drift segment."""
    from decimal import Decimal

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    vals = [Decimal(x) for x in
            ("1.00 2.00 -3.00 4.00 4.00 4.00 -20.00 1.00 5.00 5.00").split()]
    # textbook recursion (drift-corrected series d_t used directly)
    s, expect = Decimal(0), []
    for d in vals:
        s = max(Decimal(0), s + d)
        expect.append(s)
    df = spark.createDataFrame(
        [(i, str(v)) for i, v in enumerate(vals)], "i LONG, d_str STRING"
    ).select("i", F.col("d_str").cast("decimal(18,2)").alias("d"))
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    p = df.withColumn("p", F.sum("d").over(w))
    # closed form: the running min is clamped at 0 (the virtual empty
    # prefix P_0 = 0), exactly the recursion's reset-at-zero floor
    c = p.withColumn(
        "cusum",
        F.col("p") - F.least(F.lit(0).cast("decimal(18,2)"),
                             F.min("p").over(w)),
    )
    got = [r["cusum"] for r in c.orderBy("i").collect()]
    assert [Decimal(x) for x in got] == expect
