"""Time-series repair/robust-stats operators over the events table:
linear-interpolation resampling onto a fixed grid, and median/MAD robust
outlier detection — the two shapes a metrics/feature pipeline needs that
the existing gap-fill (events_daily_gapfill: presence) and z-score
(events_zscore_outliers: moment-based) entries don't cover.

Both are exact-oracle graded. Exactness engineering follows the README
correctness model: time arithmetic stays in integer epoch-MICROSECONDS
(exactly representable in doubles: ~1.7e15 < 2^53), interpolation uses
only correctly-rounded IEEE ops (+,-,*,/) in the identical expression
shape in both engines, and medians are the LOWER median selected by
row_number — pure element selection, zero arithmetic — so even-count
groups can't diverge in the last ulp the way (a+b)/2 vs 0.5a+0.5b can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: Resample grid step and the deterministic user subset (bounds output
#: size: ~720 hourly points per user over the 30-day fixture span).
RESAMPLE_USER_MOD = 10

#: MAD outlier cut: |value - median| > MAD_K * MAD.
MAD_K = 3.0


def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample of ``value`` with linear interpolation:
    (user_id, grid_ts, value) for every hour grid point between the
    user's first and last observation (users with user_id % 10 == 0).

    Plan — the one-pass union-and-window gap-fill, NOT a range join:
      1. observations dedup to one row per (user, ts) via min_by(event_id)
         (deterministic survivor, no arithmetic);
      2. the per-user hourly grid comes from one tiny group agg
         (min/max ts) + sequence() explode — map-only after a 1-row-per-
         user aggregate;
      3. grid ∪ observations sort once per user (ONE shuffle on user_id);
         two window passes pick the surrounding observations — prev =
         last non-null obs looking back, next = first non-null obs
         looking forward, with obs ordered before a grid point at the
         same instant so an exact hit interpolates to itself (frac = 0);
      4. value = pv + (nv - pv) * (g - tp) / (tn - tp) on integer-micro
         timestamps — identical expression in the oracle, bit-exact.
    Leading grid points before the first observation clamp to the next
    value (the trailing edge cannot occur: the grid ends at
    trunc(max_ts) ≤ max_ts).

    100 TB: everything partitions by user_id — one Exchange carrying
    (user, ts, value), windows reuse it; grid density is bounded by the
    observed span so no user explodes; no join, no N² anything. The
    window state is O(1) per row (running last/first)."""
    from ..plans.cache_scope import scoped_persist

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % RESAMPLE_USER_MOD == 0
    )
    # obs feeds BOTH union branches (rows + per-user grid bounds):
    # persist the deduped observations so the raw scan and its (user, ts)
    # aggregation run once — the grid bounds over obs equal the bounds
    # over the raw events by construction (dedup only collapses ties)
    obs_ts = scoped_persist(
        e.groupBy("user_id", "ts").agg(
            F.min_by("value", "event_id").alias("value")
        )
    )
    obs = obs_ts.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        F.lit(0).alias("is_grid"),
        "value",
    )
    grid = (
        obs_ts.groupBy("user_id")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.expr(
                    "sequence(date_trunc('hour', mn), date_trunc('hour', mx),"
                    " interval 1 hour)"
                )
            ).alias("g"),
        )
        .select(
            "user_id",
            F.expr("unix_micros(cast(g as timestamp))").alias("t_us"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    u = obs.unionByName(grid)
    # total order per user: (t_us, is_grid) — obs sorts before a grid
    # point at the same instant, and (user, ts) is unique post-dedup
    back = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_grid")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ot = F.when(F.col("is_grid") == 0, F.col("t_us"))
    ov = F.when(F.col("is_grid") == 0, F.col("value"))
    ann = (
        u.withColumn("pt", F.last(ot, ignorenulls=True).over(back))
        .withColumn("pv", F.last(ov, ignorenulls=True).over(back))
        .withColumn("nt", F.first(ot, ignorenulls=True).over(fwd))
        .withColumn("nv", F.first(ov, ignorenulls=True).over(fwd))
    )
    frac = (F.col("t_us") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = (
        F.when(F.col("pt").isNull(), F.col("nv"))  # leading-edge clamp
        .when(F.col("nt").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))  # exact hit
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return (
        ann.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.expr("cast(timestamp_micros(t_us) as timestamp_ntz)").alias(
                "grid_ts"
            ),
            interp.alias("value"),
        )
        .orderBy("user_id", "grid_ts")
    )


EVENTS_RESAMPLE_INTERPOLATE_SQL = f"""
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS t_us, 0 AS is_grid,
         arg_min(value, event_id) AS value
  FROM events WHERE user_id % {RESAMPLE_USER_MOD} = 0
  GROUP BY user_id, epoch_us(ts)
),
grid AS (
  SELECT user_id, epoch_us(unnest(generate_series(
           date_trunc('hour', mn), date_trunc('hour', mx),
           INTERVAL 1 HOUR))) AS t_us,
         1 AS is_grid, CAST(NULL AS DOUBLE) AS value
  FROM (SELECT user_id, min(ts) AS mn, max(ts) AS mx
        FROM events WHERE user_id % {RESAMPLE_USER_MOD} = 0
        GROUP BY user_id)
),
u AS (SELECT * FROM obs UNION ALL SELECT * FROM grid),
ann AS (
  SELECT user_id, t_us, is_grid,
    last_value(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY t_us, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY t_us, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    first_value(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY t_us, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
    first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY t_us, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM u
)
SELECT user_id, make_timestamp(t_us) AS grid_ts,
       CASE WHEN pt IS NULL THEN nv
            WHEN nt IS NULL THEN pv
            WHEN nt = pt THEN pv
            ELSE pv + (nv - pv) * (CAST(t_us - pt AS DOUBLE)
                                   / CAST(nt - pt AS DOUBLE))
       END AS value
FROM ann
WHERE is_grid = 1
ORDER BY user_id, grid_ts
"""


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event type: |value − median| > 3·MAD, where
    both the median and the MAD (median absolute deviation) are LOWER
    medians — pure row selection via row_number at position (n+1) div 2
    with (value, event_id) tie-break, so there is NO averaging arithmetic
    and both engines pick the identical element. Emits (event_id,
    event_type, value, med, mad), sorted by event_id.

    The z-score twin (events_zscore_outliers) is moment-based and blows
    up under heavy tails; median/MAD is the robust version every metrics
    pipeline keeps next to it.

    100 TB: exact per-group medians sort WITHIN each group (two window
    passes over one group-keyed Exchange each) — the right call when
    groups ≫ cores; for few huge groups the shipped t-digest sketch is
    the approximate scale path and THIS operator is its exact-oracle
    twin (the same split as agg_approx vs exact distinct). The fact scan
    joins the 3-row stats frame by broadcast — it never shuffles for the
    final filter."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
    med = (
        e.withColumn("rn", F.row_number().over(w1))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    w2 = Window.partitionBy("event_type").orderBy("adev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w2))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("adev").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > F.lit(MAD_K) * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
        .orderBy("event_id")
    )


def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit per event type: clamp ``value`` to the
    [p05, p95] order statistics and report (event_type, n, p05, p95,
    n_clipped_low, n_clipped_high, winsorized_sum) — the standard
    heavy-tail taming step before a moment-based model sees the data.

    Exactness: the percentile positions are PURE INTEGERS —
    pos_q = ceil(q·n) computed as (q_num·n + q_den − 1) div q_den — and
    the statistics are row SELECTIONS at those positions under the total
    order (value, event_id), so both engines pick identical elements
    with zero float arithmetic. The winsorized sum runs through
    DECIMAL(18,2) (exact, associative) and casts to double once.

    100 TB: same split as events_mad_outliers — per-group sorts are the
    exact form (right when groups ≫ cores); the t-digest sketch is the
    approximate scale path for few huge groups. The 3-row stats frame
    broadcasts back over one never-shuffled fact scan."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    pos05 = F.expr("(n + 19) div 20")         # ceil(n/20)
    pos95 = F.expr("(19 * n + 19) div 20")    # ceil(19n/20)
    stats = (
        ranked.filter((F.col("rn") == pos05) | (F.col("rn") == pos95))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.min(
                F.when(F.col("rn") == pos05, F.col("value"))
            ).alias("p05"),
            F.max(
                F.when(F.col("rn") == pos95, F.col("value"))
            ).alias("p95"),
        )
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("p05").alias("p05"),
            F.max("p95").alias("p95"),
            F.sum((F.col("value") < F.col("p05")).cast("long")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("value") > F.col("p95")).cast("long")).alias(
                "n_clipped_high"
            ),
            F.sum(clamped.cast("decimal(18,2)"))
            .cast("double")
            .alias("winsorized_sum"),
        )
        .orderBy("event_type")
    )


EVENTS_VALUE_WINSORIZE_SQL = """
WITH e AS (SELECT event_id, event_type, value FROM events),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e
),
stats AS (
  SELECT event_type, MAX(n) AS n,
         MIN(CASE WHEN rn = (n + 19) // 20 THEN value END) AS p05,
         MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS p95
  FROM ranked
  WHERE rn = (n + 19) // 20 OR rn = (19 * n + 19) // 20
  GROUP BY event_type
)
SELECT e.event_type, MAX(s.n) AS n, MAX(s.p05) AS p05, MAX(s.p95) AS p95,
       CAST(SUM(CASE WHEN e.value < s.p05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(SUM(CASE WHEN e.value > s.p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       CAST(SUM(CAST(least(greatest(e.value, s.p05), s.p95)
                     AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_sum
FROM e JOIN stats s USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


EVENTS_MAD_OUTLIERS_SQL = f"""
WITH e AS (SELECT event_id, event_type, value FROM events),
med AS (
  SELECT event_type, value AS med
  FROM (SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM e)
  WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, adev AS mad
  FROM (SELECT event_type, adev, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY adev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev)
  WHERE rn = (n + 1) // 2
)
SELECT d.event_id, d.event_type, d.value, d.med, ma.mad
FROM dev d JOIN mad ma USING (event_type)
WHERE d.adev > {MAD_K} * ma.mad
ORDER BY d.event_id
"""


# ---------------------------------------------------------------------------
# Bounded-window EWMA smoothing
# ---------------------------------------------------------------------------

#: EWMA decay. 1/2 is deliberate: every weight 0.5^j is a pure power of
#: two, so weight*value is an exponent shift — EXACT in IEEE — and the
#: only rounding anywhere is the 8-term additions, which both engines
#: execute in the identical pinned association order.
EWMA_ALPHA = 0.5
#: Window depth. 0.5^8 < 0.4% residual mass — the unbounded EWMA's
#: recursive form (state_t = a·x + (1-a)·state_{t-1}) is sequential and
#: engine-divergent; the bounded form is a pure window expression.
EWMA_LAGS = 8

_EWMA_OVER = "OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"


def _ewma_sql() -> str:
    num = "CAST(0 AS DOUBLE)"
    den = "CAST(0 AS DOUBLE)"
    for j in range(EWMA_LAGS):
        w = repr(EWMA_ALPHA**j)
        lv = "value" if j == 0 else f"lag(value, {j}) {_EWMA_OVER}"
        num += f" + COALESCE(({lv}) * CAST({w} AS DOUBLE), CAST(0 AS DOUBLE))"
        den += (
            f" + CASE WHEN ({lv}) IS NOT NULL"
            f" THEN CAST({w} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
        )
    return (
        "SELECT event_id, user_id, ts, value,\n"
        f"       ({num}) / ({den}) AS ewma\n"
        "FROM events\nORDER BY event_id"
    )


def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bounded-window EWMA of ``value`` (α=1/2 over the last
    EWMA_LAGS observations, ordered by ts then event_id): the smoothing
    pass a metrics/feature pipeline runs before thresholding. The
    normalizer sums only the weights of PRESENT lags, so the head of
    each user's series (fewer than 8 priors) is an exact truncated EWMA
    rather than a zero-padded one.

    Exactness: weights are powers of two (exact scaling); numerator and
    denominator are built by the same left-to-right 8-term chain in both
    engines; the one division per row is correctly rounded — bit-exact
    without any rounding fudge.

    100 TB: one Exchange on user_id that all eight lag frames share
    (Spark collapses same-spec window functions into ONE Window node,
    O(1) running state per row); no join, no self-union — linear scan
    cost, the plan you'd want for a billion-user metrics table."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    num = F.lit(0).cast("double")
    den = F.lit(0).cast("double")
    for j in range(EWMA_LAGS):
        wgt = F.lit(EWMA_ALPHA**j)
        lv = F.col("value") if j == 0 else F.lag("value", j).over(w)
        num = num + F.coalesce(lv * wgt, F.lit(0).cast("double"))
        den = den + F.when(lv.isNotNull(), wgt).otherwise(F.lit(0).cast("double"))
    return e.select(
        "event_id", "user_id", "ts", "value", (num / den).alias("ewma")
    ).orderBy("event_id")


EVENTS_EWMA_SMOOTH_SQL = _ewma_sql()


#: CUSUM alarm threshold in value units (the comparison is scale-free:
#: cusum is in count·value units, so the test is cusum > n · λ).
CUSUM_LAMBDA = "2000.00"


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided-free (upward) CUSUM drift detection per event_type:
    when does the value stream run persistently ABOVE its long-run mean,
    and by how much?

    The textbook CUSUM recursion S_t = max(0, S_{t-1} + (x_t − μ)) is
    not a window function — but it has the closed form

        S_t = P_t − min_{0 ≤ j ≤ t} P_j,   P_t = Σ_{i ≤ t} (x_i − μ),
        (P_0 = 0, the empty prefix — hence the 0-clamped running min)

    (the running sum minus its running minimum: resetting at zero is
    exactly "restart from the lowest prefix"), which IS two stacked
    window aggregates over one partition ordering. That closed form is
    what makes CUSUM distributable at all.

    Exactness: μ never materializes (dividing by n would round).
    Multiply through by n instead — d_i = n·x_i − Σx over DECIMAL(18,2)
    values — so every prefix sum is an exact DECIMAL; the single
    division-free alarm test is cusum > n·λ. The only float is the
    final presentation cast.

    100 TB: one Exchange on event_type feeds both window passes (same
    partitioning + ordering → one Sort, two Window operators) and the
    final partial+final aggregate. A per-KEY sequential scan is inherent
    to CUSUM's definition; the production lever for monster keys is
    pre-aggregating to per-hour partial sums (3600× fewer window rows,
    identical drift signal at hour resolution) — the same one-Exchange
    shape on a bounded spine."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(v).alias("s")
    )
    d = (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "ts",
            "event_id",
            "n",
            (F.col("n") * v - F.col("s")).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = d.withColumn("p", F.sum("d").over(w))
    # the running min clamps at 0 — the virtual EMPTY prefix P_0 = 0 is
    # a legal reset point in the recursion (without it, drift beginning
    # at the very first observation is silently under-counted)
    c = p.withColumn(
        "cusum",
        F.col("p")
        - F.least(F.lit(0).cast("decimal(18,2)"), F.min("p").over(w)),
    )
    alarm = F.col("cusum") > F.col("n") * F.lit(CUSUM_LAMBDA).cast(
        "decimal(18,2)"
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.max("n").alias("n_points"),
            F.sum(alarm.cast("long")).alias("n_alarms"),
            F.min(F.when(alarm, F.col("ts"))).alias("first_alarm_ts"),
            # integer cents, not a double cast: DECIMAL→DOUBLE is the
            # one conversion the engines round differently (DuckDB's
            # int128/scale path vs BigDecimal.doubleValue, 1 ulp apart)
            (F.max("cusum") * 100).cast("long").alias("max_cusum_cents"),
        )
        .orderBy("event_type")
    )


EVENTS_CUSUM_DRIFT_SQL = f"""
WITH stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, e.ts, e.event_id, st.n,
         st.n * CAST(e.value AS DECIMAL(18,2)) - st.s AS d
  FROM events e JOIN stats st USING (event_type)
),
p AS (
  SELECT event_type, ts, event_id, n,
         SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM d
),
c AS (
  SELECT event_type, ts, n,
         p - LEAST(CAST(0 AS DECIMAL(18,2)),
                   MIN(p) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)) AS cusum
  FROM p
)
SELECT event_type,
       MAX(n) AS n_points,
       SUM(CASE WHEN cusum > n * CAST({CUSUM_LAMBDA} AS DECIMAL(18,2))
                THEN 1 ELSE 0 END)::BIGINT AS n_alarms,
       MIN(CASE WHEN cusum > n * CAST({CUSUM_LAMBDA} AS DECIMAL(18,2))
                THEN ts END) AS first_alarm_ts,
       CAST(MAX(cusum) * 100 AS BIGINT) AS max_cusum_cents
FROM c GROUP BY event_type ORDER BY event_type
"""


#: Equal-width histogram bucket width for the drift monitor (values in
#: the events fixture span [0, ~500)) and the bucket cap.
DRIFT_BUCKET_WIDTH = 50
DRIFT_BUCKET_CAP = 9


def events_drift_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two halves of the stream —
    the PSI/chi-square check a training pipeline runs before trusting a
    new data batch, kept transcendental-free: PSI's log is replaced by
    the per-bucket chi-square contribution (n1−n2)²/(n1+n2), which
    ranks drift identically for monitoring purposes and is exact in
    integer fixed point.

    Split: event_id parity — content-keyed (any partitioning, any
    arrival order), balanced, and deterministic in both engines; a
    production monitor splits by time window instead (same plan).
    Emits one row per (event_type, bucket): both counts and
    chi2_fp = ⌊1e6·(n1−n2)²/(n1+n2)⌋. Consumers sum chi2_fp per type
    against a threshold.

    100 TB: ONE scan → map-side bucket assignment (two integer ops) →
    one partial+final agg on (type, bucket) — a few hundred output
    rows regardless of input size; no joins, no windows."""
    e = load_table(spark, sf_dir, "events")
    # explicit FLOOR: Spark's double→long cast truncates but DuckDB's
    # rounds — floor is the one spelling both engines share
    b = F.least(
        F.floor(F.col("value") / DRIFT_BUCKET_WIDTH).cast("long"),
        F.lit(DRIFT_BUCKET_CAP).cast("long"),
    )
    h = (
        e.select(
            "event_type",
            b.alias("bucket"),
            (F.col("event_id") % 2 == 0).alias("first_half"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.col("first_half").cast("long")).alias("n1"),
            F.sum((~F.col("first_half")).cast("long")).alias("n2"),
        )
    )
    return h.select(
        "event_type",
        "bucket",
        "n1",
        "n2",
        F.expr("(1000000 * (n1 - n2) * (n1 - n2)) div (n1 + n2)").alias(
            "chi2_fp"
        ),
    ).orderBy("event_type", "bucket")


EVENTS_DRIFT_HISTOGRAM_SQL = f"""
WITH h AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value / {DRIFT_BUCKET_WIDTH}) AS BIGINT),
               {DRIFT_BUCKET_CAP}) AS bucket,
         SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS n2
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST((1000000 * (n1 - n2) * (n1 - n2)) // (n1 + n2) AS BIGINT)
         AS chi2_fp
FROM h ORDER BY event_type, bucket
"""
