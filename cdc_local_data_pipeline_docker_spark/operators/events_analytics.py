"""Batch analytics over the `events` stream table: time-bucketed rollups,
sliding windows, sessionization, funnel counts — the hypertable-style query
surface, expressed with Catalyst built-ins so each has an exact SQL oracle.
The streaming twins (live watermarked versions of the same rollups) live in
`streaming/`; these batch forms are what a backfill over 100 TB of history
runs, and they shuffle exactly once per aggregation level.

Money-typed doubles (`value`) aggregate through DECIMAL(18,2) — exact and
associative, so results are independent of partitioning (module docstring of
operators/relational.py has the full exactness contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table

DEC = DecimalType(18, 2)

#: Sessionization gap: a new session starts after 30 minutes of inactivity.
SESSION_GAP_MINUTES = 30


def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour tumbling-window counts and exact value sums per event type.

    `F.window` is Spark's native tumbling bucketizer; for the oracle the
    window start is identical to date_trunc('hour'). One partial+final
    hash agg; at 100 TB this is the canonical pre-aggregation rollup."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour_start", "event_type")
    )


EVENTS_TUMBLING_AGG_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY hour_start, event_type
"""


def events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: every event lands in
    exactly two windows. The oracle reproduces the window-assignment rule
    (start = 30-min floor, and that minus 30 min) with a UNION ALL."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").getField("start").alias(
                "window_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("window_start")
    )


EVENTS_SLIDING_AGG_SQL = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
  FROM events
)
SELECT window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM assigned
GROUP BY 1
ORDER BY window_start
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity), batch form.

    Classic lag→flag→cumsum: one shuffle on user_id (both window passes
    share the same partitioning, so Catalyst plans a single exchange);
    session stats aggregate per (user, session)."""
    e = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap test in exact epoch-µs integers (ntz → tz cast is UTC-pinned).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            ts_us - F.lag(ts_us, 1).over(w_user)
            > SESSION_GAP_MINUTES * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w)
                   > {SESSION_GAP_MINUTES * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel per user (order-respecting: first
    view before first click before first purchase). Conditional min-aggs +
    one small join-free comparison — a single shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    reached_click = F.col("first_view").isNotNull() & (
        F.col("first_click") > F.col("first_view")
    )
    reached_purchase = reached_click & (
        F.col("first_purchase") > F.col("first_click")
    )
    return firsts.select(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("first_view").isNotNull().cast("long")).alias("reached_view"),
        F.sum(reached_click.cast("long")).alias("reached_click"),
        F.sum(reached_purchase.cast("long")).alias("reached_purchase"),
    )


EVENTS_FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_view,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                          AND first_purchase > first_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
FROM firsts
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0 cohort × activity-day retention counts: the standard cohort
    matrix. Two aggregations (first-seen day per user, then cohort×day
    distinct users); both shuffle on user_id/cohort keys."""
    e = load_table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    activity = e.select("user_id", F.to_date("ts").alias("activity_day")).distinct()
    return (
        activity.join(first_day, "user_id")
        .withColumn(
            "day_offset", F.datediff(F.col("activity_day"), F.col("cohort_day"))
        )
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


EVENTS_RETENTION_COHORTS_SQL = """
WITH first_day AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day FROM events
)
SELECT cohort_day, datediff('day', cohort_day, activity_day) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN first_day f ON a.user_id = f.user_id
WHERE datediff('day', cohort_day, activity_day) BETWEEN 0 AND 7
GROUP BY 1, 2
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# Banded self-join stressor (large-N fact-fact join; ROADMAP item).
# ---------------------------------------------------------------------------

#: Band width for the transition-pair self-join (seconds).
TRANSITION_BAND_S = 600


def events_transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts: pairs of events by the SAME user
    where the second lands within 10 minutes after the first.

    The bench stressor for the fact-fact self-join class. The naive plan
    joins on user_id alone and filters the band AFTER materializing
    Σ n_u² pairs per user — quadratic in per-user activity. This plan is
    the scale-correct banded form: bucket ts into band-width bins and
    equi-join on (user_id, bin) with the probe side exploded to its two
    candidate bins, so the join intermediate is bounded by ADJACENT-bin
    co-occupancy instead of all per-user history; the exact band
    predicate then filters bin-local candidates. Same technique as
    join_range's broadcast banding, but for a self-join too big to
    broadcast. The DuckDB oracle runs the naive theta join — identical
    exact counts."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts"),
        "event_type",
        # Floor division, not `div`: `div` truncates toward zero, so for
        # pre-1970 timestamps (negative unix_micros) the bin at zero would
        # span two widths and adjacent-bin coverage of the band would drop
        # pairs. pmod-based flooring stays integer-exact for any domain.
        F.expr(
            "(unix_micros(cast(ts as timestamp))"
            f" - pmod(unix_micros(cast(ts as timestamp)), {TRANSITION_BAND_S * 1_000_000}))"
            f" div {TRANSITION_BAND_S * 1_000_000}"
        ).alias("bin"),
    )
    probe = e.select(
        "user_id",
        F.col("ts").alias("ts_a"),
        F.col("event_type").alias("type_a"),
        F.explode(F.array(F.col("bin"), F.col("bin") + 1)).alias("jbin"),
    )
    build = e.select(
        "user_id",
        F.col("bin").alias("jbin"),
        F.col("ts").alias("ts_b"),
        F.col("event_type").alias("type_b"),
    )
    pairs = probe.join(build, ["user_id", "jbin"]).filter(
        (F.col("ts_b") > F.col("ts_a"))
        & (
            F.col("ts_b")
            <= F.col("ts_a") + F.expr(f"INTERVAL {TRANSITION_BAND_S} SECONDS")
        )
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


EVENTS_TRANSITION_PAIRS_SQL = f"""
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {TRANSITION_BAND_S} SECOND
GROUP BY 1, 2
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Z-score anomaly detection.
# ---------------------------------------------------------------------------

#: Standard-deviation multiple at which an event's value is "anomalous".
ZSCORE_THRESHOLD = 3.0


def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is ≥ 3σ from their event type's mean:
    (event_id, event_type, value, z), sorted by event_id.

    Exactness engineering (README correctness model): the moments come
    from DECIMAL(18,2) sums — Σv and Σv² are EXACT and associative, so
    partition order can't perturb them — cast to double once; mean,
    variance ((Σv² − (Σv)²/n)/(n−1)) and z then use only correctly-
    rounded IEEE ops (+,-,*,/,sqrt) on identical inputs, so Spark and
    DuckDB produce bit-identical doubles and the |z| ≥ 3 cut keeps
    identical rows. (Built-in stddev_samp is NOT used: engines disagree
    in the last ulp via different streaming-update formulas.)

    Plan: one grouped partial+final agg (3 groups), broadcast the tiny
    stats row back over the fact scan, map-side filter — the fact table
    is scanned once and never shuffled. The textbook two-pass z-score at
    any scale."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast(DEC)
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - F.lit(1)
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= ZSCORE_THRESHOLD)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    )


EVENTS_ZSCORE_OUTLIERS_SQL = f"""
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s.s1 / s.n)
         / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS z
FROM events e JOIN stats s USING (event_type)
WHERE abs((e.value - s.s1 / s.n)
          / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)))
      >= {ZSCORE_THRESHOLD}
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# Recursive-CTE date spine + gap fill (Spark 4 WITH RECURSIVE surface).
# ---------------------------------------------------------------------------

def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily high-value purchase series with GAP FILL: a recursive CTE
    generates the contiguous day spine between the corpus's min and max
    event dates (Spark 4 ``WITH RECURSIVE``), then a left join fills
    missing days with zeros — the canonical time-series densification
    every dashboard needs (the filtered series has real gaps at
    sf0.001/0.01).

    Scale notes: the spine is O(days) rows — recursion depth equals the
    date span, nothing data-sized recurses; the daily aggregate is one
    scan with pushed filters; the fill join broadcasts the tiny spine.
    Revenue goes through DECIMAL(18,2) for bit-exact oracle parity."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__spark_graft_ev_gapfill")
    return spark.sql("""
WITH RECURSIVE spine(day) AS (
  SELECT CAST(MIN(ts) AS DATE) FROM __spark_graft_ev_gapfill
  UNION ALL
  SELECT date_add(day, 1) FROM spine
  WHERE day < (SELECT CAST(MAX(ts) AS DATE) FROM __spark_graft_ev_gapfill)
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM __spark_graft_ev_gapfill
  WHERE event_type = 'purchase' AND value > 200
  GROUP BY CAST(ts AS DATE)
)
SELECT s.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n_purchases,
       COALESCE(d.rev, CAST(0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY s.day
""")


EVENTS_DAILY_GAPFILL_SQL = """
WITH RECURSIVE spine(day) AS (
  SELECT CAST(MIN(ts) AS DATE) FROM events
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM spine
  WHERE day < (SELECT CAST(MAX(ts) AS DATE) FROM events)
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM events
  WHERE event_type = 'purchase' AND value > 200
  GROUP BY CAST(ts AS DATE)
)
SELECT CAST(s.day AS DATE) AS day,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_purchases,
       COALESCE(d.rev, CAST(0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Time-constrained funnel: each stage must land within a bounded window
# of the previous stage's completion (the conversion-window semantics of
# product-analytics funnels), anchored on first touch.
# ---------------------------------------------------------------------------

#: conversion window between consecutive funnel stages
FUNNEL_WINDOW_HOURS = 24


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase with a 24 h conversion window per step,
    anchored on the user's FIRST view (the anchored-first-touch model
    every product-analytics tool defaults to — deliberately NOT maximal
    sequence matching, which would scan all anchors).

    Plan: one conditional-min aggregate for the anchor, then one
    equi-join + filtered min per subsequent stage — every shuffle is on
    user_id, so at scale the three aggregations co-partition and AQE
    collapses the join exchanges (the events table is read once per
    stage but only (user_id, ts) columns survive pruning)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")

    anchor = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    click = (
        e.filter(F.col("event_type") == "click")
        .join(anchor, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + w))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + w))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        anchor.join(click, "user_id", "left")
        .join(purchase, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("reached_view"),
            F.sum(F.col("t_click").isNotNull().cast("long")).alias("reached_click"),
            F.sum(F.col("t_purchase").isNotNull().cast("long")).alias(
                "reached_purchase"
            ),
        )
    )


EVENTS_FUNNEL_WINDOWED_SQL = f"""
WITH anchor AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
click AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN anchor a ON e.user_id = a.user_id
  WHERE e.event_type = 'click'
    AND e.ts > a.t_view
    AND e.ts <= a.t_view + INTERVAL {FUNNEL_WINDOW_HOURS} HOURS
  GROUP BY e.user_id
),
purchase AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN click c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL {FUNNEL_WINDOW_HOURS} HOURS
  GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS reached_view,
       CAST(SUM(CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_click,
       CAST(SUM(CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_purchase
FROM anchor a
LEFT JOIN click c ON a.user_id = c.user_id
LEFT JOIN purchase p ON a.user_id = p.user_id
"""


# ---------------------------------------------------------------------------
# A/B experiment readout on a deterministic hash assignment.
# ---------------------------------------------------------------------------

def events_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm conversion readout with ENGINE-PORTABLE assignment: users
    land in arm A/B by the parity of their first md5 hex char (the
    content-keyed idiom every deterministic sampler here uses — an
    experiment assignment must survive re-ingestion and engine swaps or
    the readout silently mixes arms). Exact integer counts; the only
    doubles are final single divisions."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    c = F.ascii(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1))
    hexval = F.when(c <= 57, c - 48).otherwise(c - 87)
    arm = F.when(hexval % 2 == 0, F.lit("A")).otherwise(F.lit("B"))
    per_user = (
        e.withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "n_purchases"
            )
        )
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum((F.col("n_purchases") > 0).cast("long")).alias("n_converted"),
            F.sum("n_purchases").alias("n_purchases"),
            (
                F.sum((F.col("n_purchases") > 0).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("conversion_rate"),
        )
        .orderBy("arm")
    )


EVENTS_AB_CONVERSION_SQL = """
WITH assigned AS (
  SELECT user_id, event_type,
         CASE WHEN (CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) <= 57
                         THEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 48
                         ELSE ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 87
                    END) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm
  FROM events
),
per_user AS (
  SELECT arm, user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchases
  FROM assigned GROUP BY arm, user_id
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(SUM(n_purchases) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS conversion_rate
FROM per_user
GROUP BY arm
ORDER BY arm
"""


def events_watermark_lateness_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-delay tuning audit: for each candidate delay, how many
    events would Structured Streaming drop as late? An event is late
    when its event time is older than the watermark at its arrival —
    modeled exactly as running max(ts) over arrival order (event_id,
    the ingest sequence of this topic) minus the delay, strictly-prior
    rows only (an event cannot be late against itself). This is THE
    report to run before choosing `withWatermark`: the knob trades
    state size against silent data loss, and guessing it is the
    classic streaming-pipeline failure.

    Scale note: the running max uses a global arrival order — exact for
    a single-partition (keyed) topic, which is what the CDC fixtures
    model. On a multi-partition topic run the same window PARTITIONED BY
    the source partition (Spark's watermark is min-of-per-partition
    maxes, so per-partition lateness bounds the real drop count from
    above); the global form here is the strictest audit."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = e.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).withColumn("prior_max_us", F.max("us").over(w))

    def n_late(delay_s: int):
        return F.sum(
            F.when(
                F.col("prior_max_us") - F.col("us") > delay_s * 1_000_000,
                F.lit(1),
            ).otherwise(F.lit(0))
        )

    agg = run.agg(
        F.count(F.lit(1)).alias("n_events"),
        n_late(60).alias("n60"),
        n_late(600).alias("n600"),
        n_late(3600).alias("n3600"),
    )
    return agg.select(
        F.expr(
            "stack(3, '1 minute', 60L, n60, '10 minutes', 600L, n600,"
            " '1 hour', 3600L, n3600) AS (delay_label, delay_seconds, n_late)"
        ),
        "n_events",
    ).select(
        "delay_label",
        "delay_seconds",
        "n_late",
        "n_events",
        (F.col("n_late").cast("double") / F.col("n_events")).alias(
            "late_fraction"
        ),
    ).orderBy("delay_seconds")


EVENTS_WATERMARK_LATENESS_AUDIT_SQL = """
WITH run AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max_us
  FROM events
),
agg AS (
  SELECT COUNT(*) AS n_events,
         SUM(CASE WHEN prior_max_us - us > 60000000 THEN 1 ELSE 0 END) AS n60,
         SUM(CASE WHEN prior_max_us - us > 600000000 THEN 1 ELSE 0 END) AS n600,
         SUM(CASE WHEN prior_max_us - us > 3600000000 THEN 1 ELSE 0 END) AS n3600
  FROM run
)
SELECT delay_label, delay_seconds,
       CAST(n_late AS BIGINT) AS n_late,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_late AS DOUBLE) / n_events AS late_fraction
FROM (
  SELECT '1 minute' AS delay_label, CAST(60 AS BIGINT) AS delay_seconds,
         n60 AS n_late, n_events FROM agg
  UNION ALL
  SELECT '10 minutes', 600, n600, n_events FROM agg
  UNION ALL
  SELECT '1 hour', 3600, n3600, n_events FROM agg
)
ORDER BY delay_seconds
"""


# ---------------------------------------------------------------------------
# Marketing-style conversion attribution.
# ---------------------------------------------------------------------------

#: Event types that count as attributable touches, and the conversion.
ATTRIB_TOUCH_TYPES = ("click", "view")
ATTRIB_CONVERSION_TYPE = "purchase"

#: A touch only gets credit within this lookback before the conversion.
ATTRIB_WINDOW_HOURS = 24


def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent
    click/view by the same user within the 24 h lookback — else the
    purchase is 'direct'. One user-keyed window pass (last-ignore-nulls
    over touch-projected columns), no self-join: the classic carry-
    forward formulation, so at 100 TB the cost is one user shuffle
    shared with every other per-user window query.

    Columns: purchase_event_id, user_id, purchase_ts, touch_event_id,
    touch_type, touch_ts, channel ('click'/'view'/'direct'). Out-of-
    window touches null out — the carry must not leak credit past the
    lookback."""
    e = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_event_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    in_window = (
        F.col("touch_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("touch_ts").cast("timestamp"))
            <= ATTRIB_WINDOW_HOURS * 3600 * 1_000_000
        )
    )
    return (
        carried.filter(F.col("event_type") == ATTRIB_CONVERSION_TYPE)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(in_window, F.col("touch_event_id")).alias("touch_event_id"),
            F.when(in_window, F.col("touch_ts")).alias("touch_ts"),
            F.coalesce(F.when(in_window, F.col("touch_type")), F.lit("direct"))
            .alias("channel"),
        )
        .orderBy("purchase_event_id")
    )


EVENTS_ATTRIBUTION_LAST_TOUCH_SQL = f"""
WITH carried AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_id END IGNORE NULLS) OVER w
           AS touch_event_id,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS) OVER w
           AS touch_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN ts END IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
flagged AS (
  SELECT *,
         touch_ts IS NOT NULL
           AND epoch_us(ts) - epoch_us(touch_ts)
               <= {ATTRIB_WINDOW_HOURS * 3600 * 1_000_000} AS in_window
  FROM carried
)
SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts,
       CASE WHEN in_window THEN touch_event_id END AS touch_event_id,
       CASE WHEN in_window THEN touch_ts END AS touch_ts,
       COALESCE(CASE WHEN in_window THEN touch_type END, 'direct') AS channel
FROM flagged
WHERE event_type = 'purchase'
ORDER BY purchase_event_id
"""


def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (multi-touch) attribution: every purchase splits one unit
    of credit equally across ALL touches in its 24 h lookback; channel
    credits are reported in exact 1e-6 fixed-point units.

    The lookback is a RANGE frame over epoch microseconds — count-in-
    window needs no self-join, and RANGE frames are insensitive to the
    ordering of equal timestamps, so the result is deterministic without
    a tie-break column. Credits are integer-ratio floors
    (floor(1e6·n_channel/n_touches)): numerator and denominator are
    exact integers, so the double division is correctly rounded and
    identical cross-engine. One user-keyed Exchange, shared shape with
    the last-touch pass."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    lookback_us = ATTRIB_WINDOW_HOURS * 3600 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(ts_us.alias("us")).rangeBetween(
        -lookback_us, 0
    )
    counted = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum((F.col("event_type") == "click").cast("long"))
        .over(w)
        .alias("n_clicks"),
        F.sum((F.col("event_type") == "view").cast("long"))
        .over(w)
        .alias("n_views"),
    )
    n_touches = F.col("n_clicks") + F.col("n_views")
    credit = lambda n: F.when(  # noqa: E731
        n_touches > 0,
        F.floor(F.lit(1_000_000) * n / n_touches).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        counted.filter(F.col("event_type") == ATTRIB_CONVERSION_TYPE)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "n_clicks",
            "n_views",
            n_touches.alias("n_touches"),
            credit(F.col("n_clicks")).alias("click_credit_fp"),
            credit(F.col("n_views")).alias("view_credit_fp"),
            (n_touches == 0).alias("is_direct"),
        )
        .orderBy("purchase_event_id")
    )


EVENTS_ATTRIBUTION_LINEAR_SQL = f"""
WITH counted AS (
  SELECT event_id, user_id, ts, event_type,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
           AS n_clicks,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
           AS n_views
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {ATTRIB_WINDOW_HOURS * 3600 * 1_000_000} PRECEDING
               AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts,
       CAST(n_clicks AS BIGINT) AS n_clicks,
       CAST(n_views AS BIGINT) AS n_views,
       CAST(n_clicks + n_views AS BIGINT) AS n_touches,
       CAST(CASE WHEN n_clicks + n_views > 0
                 THEN FLOOR(1000000 * n_clicks / (n_clicks + n_views))
                 ELSE 0 END AS BIGINT) AS click_credit_fp,
       CAST(CASE WHEN n_clicks + n_views > 0
                 THEN FLOOR(1000000 * n_views / (n_clicks + n_views))
                 ELSE 0 END AS BIGINT) AS view_credit_fp,
       n_clicks + n_views = 0 AS is_direct
FROM counted
WHERE event_type = 'purchase'
ORDER BY purchase_event_id
"""
