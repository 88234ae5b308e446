"""Growth accounting over the events stream: daily new/cumulative unique
users, rolling 7-day active users, and lagged cross-correlation between
event-type activity series.

Scale design: distinct-user work reduces FIRST (per-user min-date or
per-window distinct aggregation — data-sized, one shuffle), and every
subsequent pass runs on DOMAIN-bounded frames (one row per day / hour /
(window, lag) — calendar-sized regardless of SF), where a single-
partition window or a literal lag spine is metadata work, the same
phase-2 shape as the concurrency sweep. Correlations use only
+,-,*,/,sqrt over exact BIGINT sums — the correctly-rounded subset, so
the doubles are bit-identical cross-engine (README correctness model;
no transcendentals)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: Rolling-activity window: 7 calendar days, sliding daily.
ROLLING_DAYS = 7

#: Cross-correlation lags, in hours.
CORR_LAGS = (0, 1, 2, 3)

#: The two activity series: does x lead y?
CORR_X_TYPE = "click"
CORR_Y_TYPE = "purchase"


def events_cumulative_unique_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(day, n_new_users, n_cumulative_users): growth accounting by first
    appearance. Per-user min(date) is the only data-sized pass; the
    cumulative sum runs over the day spine."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_day.withColumn("n_cumulative_users", F.sum("n_new_users").over(w))
        .select("day", "n_new_users", "n_cumulative_users")
        .orderBy("day")
    )


EVENTS_CUMULATIVE_UNIQUE_USERS_SQL = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT first_day AS day, COUNT(*) AS n_new_users
  FROM first_seen GROUP BY first_day
)
SELECT day, n_new_users,
       CAST(SUM(n_new_users) OVER (ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
         AS n_cumulative_users
FROM per_day
ORDER BY day
"""


def events_rolling_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(window_start, n_active_users, n_events): 7-day windows sliding
    daily (WAU). `F.window(ts, 7 days, 1 day)` assigns each event to its
    {ROLLING_DAYS} covering windows; the distinct-user count aggregates
    once per (window, user) — the replication factor is the window/slide
    ratio, the standard sliding-distinct trade documented here (at 100 TB
    prefer a sketch column — sketches.py — when exactness is negotiable)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", f"{ROLLING_DAYS} days", "1 day")
            .getField("start")
            .alias("window_start")
        )
        .agg(
            F.countDistinct("user_id").alias("n_active_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("window_start")
    )


EVENTS_ROLLING_ACTIVE_USERS_SQL = f"""
WITH assigned AS (
  SELECT date_trunc('day', ts) - INTERVAL (k) DAY AS window_start,
         user_id
  FROM events, (SELECT unnest(generate_series(0, {ROLLING_DAYS - 1})) AS k)
)
SELECT window_start,
       COUNT(DISTINCT user_id) AS n_active_users,
       COUNT(*) AS n_events
FROM assigned
GROUP BY window_start
ORDER BY window_start
"""


def events_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag_hours, n_hours, sum_x, sum_y, corr_num, corr): Pearson
    correlation between hourly {CORR_X_TYPE} counts and {CORR_Y_TYPE}
    counts {CORR_LAGS} hours later — "does clicking lead buying".

    Zero-activity hours COUNT: both series left-join a complete hour
    spine (missing hour = 0), else the correlation silently conditions
    on activity. All sums are exact BIGINT over the spine; the final
    r = (nΣxy−ΣxΣy) / (sqrt(nΣx²−Σx²)·sqrt(nΣy²−Σy²)) is a fixed tree
    of correctly-rounded ops. The spine and the 4-lag fan-out are
    calendar-sized; the only data-sized work is the hourly rollup."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("event_type").isin(CORR_X_TYPE, CORR_Y_TYPE))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    x = hourly.filter(F.col("event_type") == CORR_X_TYPE).select(
        "hour", F.col("n").alias("x")
    )
    y = hourly.filter(F.col("event_type") == CORR_Y_TYPE).select(
        F.col("hour").alias("y_hour"), F.col("n").alias("y")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    lags = spark.createDataFrame(
        [(lag,) for lag in CORR_LAGS], "lag_hours INT"
    )
    pairs = (
        spine.crossJoin(F.broadcast(lags))
        .join(F.broadcast(bounds), how="cross")
        .withColumn(
            "target_hour",
            F.col("hour") + F.make_dt_interval(hours=F.col("lag_hours")),
        )
        .filter(F.col("target_hour") <= F.col("hi"))
        .join(x, "hour", "left")
        .join(y, F.col("target_hour") == F.col("y_hour"), "left")
        .select(
            "lag_hours",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    agg = pairs.groupBy("lag_hours").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
        F.sum(F.col("y") * F.col("y")).alias("sum_yy"),
    )
    num = (
        F.col("n_hours") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    ).cast("bigint")
    varx = F.col("n_hours") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    vary = F.col("n_hours") * F.col("sum_yy") - F.col("sum_y") * F.col("sum_y")
    corr = num.cast("double") / (
        F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))
    )
    return (
        agg.select(
            "lag_hours",
            "n_hours",
            "sum_x",
            "sum_y",
            num.alias("corr_num"),
            corr.alias("corr"),
        )
        .orderBy("lag_hours")
    )


EVENTS_LAG_CORRELATION_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
  FROM events
  WHERE event_type IN ('{CORR_X_TYPE}', '{CORR_Y_TYPE}')
  GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
),
pairs AS (
  SELECT l.lag_hours,
         COALESCE(x.n, 0) AS x,
         COALESCE(y.n, 0) AS y
  FROM spine s
  CROSS JOIN (SELECT unnest([{", ".join(str(lag) for lag in CORR_LAGS)}])
                AS lag_hours) l
  CROSS JOIN bounds b
  LEFT JOIN hourly x
    ON x.hour = s.hour AND x.event_type = '{CORR_X_TYPE}'
  LEFT JOIN hourly y
    ON y.hour = s.hour + to_hours(l.lag_hours)
   AND y.event_type = '{CORR_Y_TYPE}'
  WHERE s.hour + to_hours(l.lag_hours) <= b.hi
),
agg AS (
  SELECT lag_hours,
         COUNT(*) AS n_hours,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(y) AS BIGINT) AS sum_y,
         CAST(SUM(x * y) AS BIGINT) AS sum_xy,
         CAST(SUM(x * x) AS BIGINT) AS sum_xx,
         CAST(SUM(y * y) AS BIGINT) AS sum_yy
  FROM pairs GROUP BY lag_hours
)
SELECT lag_hours, n_hours, sum_x, sum_y,
       CAST(n_hours * sum_xy - sum_x * sum_y AS BIGINT) AS corr_num,
       CAST(n_hours * sum_xy - sum_x * sum_y AS DOUBLE)
         / (sqrt(CAST(n_hours * sum_xx - sum_x * sum_x AS DOUBLE))
            * sqrt(CAST(n_hours * sum_yy - sum_y * sum_y AS DOUBLE)))
         AS corr
FROM agg
ORDER BY lag_hours
"""


#: Relative-error bound for the HLL rolling form (lgK=12 ≈ 1.6% rsd).
HLL_REL_BOUND = 0.05


def events_rolling_active_users_hll(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sketch form of `events_rolling_active_users` — the shape that
    survives 100 TB. The exact sliding-distinct replicates every event
    window/slide (=7) times; this form sketches each DAY once (one
    corpus-sized pass, no replication) and then UNIONS 7 day-sketches
    per window — the fan-out runs on the day spine (calendar-sized), so
    sliding-window cost is independent of event volume. This is how a
    production pipeline maintains WAU/MAU from daily shard sketches.

    Contract oracle (sketch_hll_distinct pattern): each row carries the
    EXACT window distinct (identical in both engines) plus a boolean
    asserting this engine's OWN merged-sketch estimate lands within
    {HLL_REL_BOUND:.0%} of its OWN exact value."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    days = spark.createDataFrame(
        [(k,) for k in range(ROLLING_DAYS)], "k INT"
    )
    merged = (
        daily.crossJoin(F.broadcast(days))
        .select(
            (
                F.col("day") - F.make_dt_interval(days=F.col("k"))
            ).alias("window_start"),
            "sk",
        )
        .groupBy("window_start")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )
    exact = events_rolling_active_users(spark, sf_dir).select(
        "window_start", F.col("n_active_users").alias("exact_active_users")
    )
    return (
        merged.join(exact, "window_start")
        .select(
            "window_start",
            "exact_active_users",
            (
                F.abs(
                    F.hll_sketch_estimate("sk").cast("double")
                    - F.col("exact_active_users")
                )
                / F.col("exact_active_users")
                <= F.lit(HLL_REL_BOUND)
            ).alias("estimate_within_bound"),
        )
        .orderBy("window_start")
    )


EVENTS_ROLLING_ACTIVE_USERS_HLL_SQL = f"""
WITH assigned AS (
  SELECT date_trunc('day', ts) - INTERVAL (k) DAY AS window_start,
         user_id
  FROM events, (SELECT unnest(generate_series(0, {ROLLING_DAYS - 1})) AS k)
)
SELECT window_start,
       COUNT(DISTINCT user_id) AS exact_active_users,
       ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
           - COUNT(DISTINCT user_id))
         / COUNT(DISTINCT user_id) <= {HLL_REL_BOUND}
         AS estimate_within_bound
FROM assigned
GROUP BY window_start
ORDER BY window_start
"""
