"""Interval analytics over sessionized events: sweep-line concurrency.

`events_session_concurrency` answers "how many sessions were active at
once, per hour" — the capacity-planning query every event pipeline grows.
The classic formulation is a GLOBAL running sum over +1/-1 boundary
events, which naively is a single-partition window. This implementation
is the two-phase distributed prefix sum (the packing.py pattern):

  phase 1 (scales with data): boundary deltas shuffle ONCE on their hour
    bucket; the within-hour running sum and its peak are per-hour window
    work, perfectly parallel across hours.
  phase 2 (scales with TIME RANGE, not data): per-hour net deltas — one
    row per hour, metadata-sized (a year is 8,760 rows at 100 TB of
    events) — take a cumulative sum in a single-partition window, giving
    each hour its carry-in concurrency.
  peak(hour) = carry_in + max(within-hour running sum).

Tie convention: intervals are CLOSED — at an identical timestamp a start
is swept before an end (delta DESC), so a single-event session (start ==
end) still registers concurrency 1, and back-to-back sessions touching at
a boundary instant briefly overlap. The within-hour peak is order-
invariant under this rule: permuting equal-(ts, delta) rows moves
intermediate sums but not the group-boundary maximum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .events_analytics import events_sessionize


def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_start, n_starts, n_ends, peak_concurrency, end_concurrency)
    for every hour that contains at least one session boundary."""
    sessions = events_sessionize(spark, sf_dir)
    starts = sessions.select(
        F.col("session_start").alias("ts"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_seq",
    )
    ends = sessions.select(
        F.col("session_end").alias("ts"),
        F.lit(-1).alias("delta"),
        "user_id",
        "session_seq",
    )
    deltas = starts.unionAll(ends).withColumn(
        "hour_start", F.date_trunc("hour", F.col("ts"))
    )

    # Phase 1: per-hour running sum (one shuffle, keyed by hour).
    w_run = Window.partitionBy("hour_start").orderBy(
        F.col("ts").asc(),
        F.col("delta").desc(),
        F.col("user_id").asc(),
        F.col("session_seq").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = deltas.withColumn("run", F.sum("delta").over(w_run))
    per_hour = local.groupBy("hour_start").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_starts"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias("n_ends"),
        F.max("run").alias("local_peak"),
        F.sum("delta").alias("net"),
    )

    # Phase 2: carry-in offsets over the metadata-sized hour spine.
    w_carry = Window.orderBy("hour_start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        per_hour.withColumn(
            "carry_in", F.coalesce(F.sum("net").over(w_carry), F.lit(0))
        )
        .select(
            "hour_start",
            "n_starts",
            "n_ends",
            (F.col("carry_in") + F.col("local_peak")).alias("peak_concurrency"),
            (F.col("carry_in") + F.col("net")).alias("end_concurrency"),
        )
        .orderBy("hour_start")
    )


# The oracle is the naive single-sweep form: one global running sum over
# boundary events, then a per-hour max — algebraically what the two-phase
# split computes.
EVENTS_SESSION_CONCURRENCY_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS session_seq
    FROM flagged
  )
  GROUP BY user_id, session_seq
),
deltas AS (
  SELECT session_start AS ts, 1 AS delta, user_id, session_seq FROM sessions
  UNION ALL
  SELECT session_end, -1, user_id, session_seq FROM sessions
),
swept AS (
  SELECT date_trunc('hour', ts) AS hour_start, delta,
         SUM(delta) OVER sweep AS run,
         row_number() OVER sweep AS sweep_rn
  FROM deltas
  WINDOW sweep AS (ORDER BY ts ASC, delta DESC, user_id ASC, session_seq ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT hour_start,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
       CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
       CAST(MAX(run) AS BIGINT) AS peak_concurrency,
       CAST(MAX_BY(run, sweep_rn) AS BIGINT) AS end_concurrency
FROM swept
GROUP BY hour_start
ORDER BY hour_start
"""


def sessions_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of DIFFERENT users whose
    sessions overlapped in time (co-presence), with the exact overlap
    window. The missing classic join shape between equi (relational.py)
    and as-of (asof.py): both sides are intervals.

    Scale design: the naive form is an inequality self-join — O(N²) and
    planner-hostile. This is the BINNED interval join: every session
    explodes to the hour buckets it covers (fan-out = session duration,
    bounded by the 30-min-gap construction), pairs equi-join INSIDE a
    bucket (pair space Σ_b active_b² — concurrency-bounded, not
    corpus-bounded), and each surviving pair is emitted by exactly ONE
    bucket — the one containing its overlap start — so no dedup shuffle
    is needed. Hot buckets (flash-crowd hours) are the skew case; the
    salting playbook applies to the bucket key.

    Intervals are CLOSED (touching sessions co-present for an instant,
    the concurrency sweep's convention); overlap_us is then >= 0."""
    sessions = events_sessionize(spark, sf_dir).select(
        "user_id",
        "session_seq",
        F.col("session_start").alias("s_start"),
        F.col("session_end").alias("s_end"),
    )
    binned = sessions.select(
        "*",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s_start")),
                F.date_trunc("hour", F.col("s_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    # both sides alias EVERY column (fresh attribute ids) so the
    # self-join is unambiguous to the analyzer
    a = binned.select(
        F.col("user_id").alias("u1"),
        F.col("session_seq").alias("seq1"),
        F.col("s_start").alias("start1"),
        F.col("s_end").alias("end1"),
        F.col("bucket").alias("bucket_a"),
    )
    b = binned.select(
        F.col("user_id").alias("u2"),
        F.col("session_seq").alias("seq2"),
        F.col("s_start").alias("start2"),
        F.col("s_end").alias("end2"),
        F.col("bucket").alias("bucket_b"),
    )
    o_start = F.greatest("start1", "start2")
    o_end = F.least("end1", "end2")
    return (
        a.join(b, F.col("bucket_a") == F.col("bucket_b"))
        .filter(
            (F.col("u1") < F.col("u2"))
            & (o_start <= o_end)
            # emit-once rule: only the bucket where the overlap starts
            & (F.date_trunc("hour", o_start) == F.col("bucket_a"))
        )
        .select(
            "u1",
            "seq1",
            "u2",
            "seq2",
            o_start.alias("overlap_start"),
            o_end.alias("overlap_end"),
            (
                F.unix_micros(o_end.cast("timestamp"))
                - F.unix_micros(o_start.cast("timestamp"))
            ).alias("overlap_us"),
        )
        .orderBy("u1", "seq1", "u2", "seq2")
    )


# Oracle: the naive inequality self-join over the same sessionization —
# algebraically what the binned emit-once join computes.
SESSIONS_OVERLAP_PAIRS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, session_seq, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS session_seq
    FROM flagged
  )
  GROUP BY user_id, session_seq
)
SELECT a.user_id AS u1, CAST(a.session_seq AS BIGINT) AS seq1,
       b.user_id AS u2, CAST(b.session_seq AS BIGINT) AS seq2,
       GREATEST(a.s_start, b.s_start) AS overlap_start,
       LEAST(a.s_end, b.s_end) AS overlap_end,
       epoch_us(LEAST(a.s_end, b.s_end))
         - epoch_us(GREATEST(a.s_start, b.s_start)) AS overlap_us
FROM sessions a
JOIN sessions b
  ON a.user_id < b.user_id
 AND a.s_start <= b.s_end
 AND b.s_start <= a.s_end
ORDER BY u1, seq1, u2, seq2
"""
