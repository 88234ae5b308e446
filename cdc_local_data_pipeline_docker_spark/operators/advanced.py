"""Advanced operator pack: skew-safe aggregation, rollup reuse, range
frames, argmin/argmax, pivot, token explode — each a named scale pattern
with an exact oracle.

These exist to demonstrate the 100 TB playbook as first-class, verified
operators rather than prose: salting for hot keys, pre-aggregated rollup
tables answering coarser queries (the hypertable/continuous-aggregate
pattern), RANGE window frames, and wide→long/long→wide reshapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table

DEC = DecimalType(18, 2)
SALT_BUCKETS = 16


def agg_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 5-key (maximally skewed) domain.

    event_type has only 5 values → a naive groupBy sends 1/5 of 100 TB to
    each of 5 reducers. Stage 1 aggregates on (key, salt) spreading each
    hot key over 16 buckets; stage 2 combines the 80 partials. Decimal
    sums re-aggregate exactly, so the result equals the plain GROUP BY the
    oracle runs."""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn(
        "salt", (F.col("event_id") % SALT_BUCKETS).cast("int")
    )
    stage1 = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("value").cast(DEC)).alias("pv"),
    )
    return (
        stage1.groupBy("event_type")
        .agg(
            F.sum("pc").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


AGG_SALTED_TWO_STAGE_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals computed FROM the hourly rollup (continuous-aggregate /
    hypertable pattern): the coarser aggregate re-aggregates the finer one
    instead of rescanning raw events. Counts and decimal sums are exactly
    re-aggregable, so the oracle (daily directly from raw) must agree —
    which is precisely the invariant that makes rollup tables safe."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
    )
    return (
        hourly.groupBy(
            F.to_date("hour_start").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_ROLLUP_REUSE_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per customer, order count and revenue within
    the trailing 30 days of each order (inclusive). The frame is over an
    integer day key so both engines bound it identically."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_30d"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "revenue_30d"
        ),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER w AS orders_30d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS revenue_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregates: per status, which order carries the
    max/min price (ties impossible: prices keyed by unique orderkey are
    disambiguated through the struct comparator)."""
    o = load_table(spark, sf_dir, "orders")
    # Deterministic under price ties: compare (price, orderkey) pairs.
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr(
                "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
            ).alias("priciest_order"),
            F.expr(
                "min_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
            ).alias("cheapest_order"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


AGG_MINBY_MAXBY_SQL = """
SELECT o_orderstatus,
       first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC)
         AS priciest_order,
       first(o_orderkey ORDER BY o_totalprice ASC, o_orderkey DESC)
         AS cheapest_order,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: order counts per priority × status. Pivot compiles
    to conditional aggregation (one shuffle), which is exactly what the
    oracle spells out with CASE sums."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .na.fill(0, ["n_f", "n_o", "n_p"])
        .orderBy("o_orderpriority")
    )


AGG_PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def explode_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long explode: global token frequencies over the corpus —
    explode is the lateral unnest; the count is a plain partial+final agg
    over the exploded stream (no materialized intermediate)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
    )


EXPLODE_TOKEN_FREQUENCIES_SQL = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
"""


def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quartiles of quantity per return flag — the exact
    counterpart of the approx-percentile sketch (agg_approx).

    Oracle-safe by construction: percentile fractions 0.25/0.5/0.75 put
    the interpolation weight at a dyadic rational, so the linear
    interpolation between two integral order statistics is computed
    exactly by BOTH engines regardless of operand order — no libm, no
    ULP drift. (Arbitrary fractions like 0.9 would interpolate with a
    non-representable weight and risk 1-ULP divergence between
    `a + f*(b-a)` and `(1-f)*a + f*b` evaluation orders.)

    At 100 TB: exact percentile sorts within groups — fine for bounded
    group cardinality; for percentiles over billions of distinct values
    per group, use the approx_percentile sketch (agg_approx) instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("qty_p25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("qty_p50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("qty_p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


AGG_EXACT_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS qty_p25,
       quantile_cont(l_quantity, 0.5)  AS qty_p50,
       quantile_cont(l_quantity, 0.75) AS qty_p75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def window_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe top-k per HOT group — the window sibling of
    agg_salted_two_stage: event_type has 5 values, so the plain
    rank-then-filter window sends 1/5 of the corpus to each of 5
    reducers and sorts it there. Stage 1 takes a per-(key, salt) local
    top-5 (array_sort over (neg value, id) structs — deterministic
    tie-break identical to the window's ORDER BY), spreading each hot
    key over SALT_BUCKETS reducers with bounded per-reducer sort state;
    stage 2 ranks the surviving <= SALT_BUCKETS x 5 candidates per key.
    Every global top-5 row is its salt bucket's top-5, so the composition
    is exact — the oracle runs the plain window form."""
    k = 5
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn(
        "salt", (F.col("event_id") % SALT_BUCKETS).cast("int")
    )
    stage1 = (
        salted.groupBy("event_type", "salt")
        .agg(
            F.expr(
                f"""
                slice(array_sort(collect_list(
                  struct(-value AS nv, event_id AS id, value AS v))), 1, {k})
                """
            ).alias("cand")
        )
        .select(
            "event_type",
            F.explode("cand").alias("c"),
        )
        .select("event_type", F.col("c.id").alias("event_id"),
                F.col("c.v").alias("value"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        stage1.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "event_id", "value", "rn")
        .orderBy("event_type", "rn")
    )


WINDOW_TOPK_SALTED_SQL = """
SELECT event_type, event_id, value, rn
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events)
WHERE rn <= 5
ORDER BY event_type, rn
"""


def reshape_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via the DataFrame unpivot/melt API (Spark 3.4+)
    — the inverse of agg_pivot_status, as the API form rather than the
    `stack` SQL expression the column profiler uses. Four lineitem
    measures become (key, measure, value) rows.

    Scale: unpivot is a map-only Expand (each input row emits one row
    per measure, no shuffle); the Exchange here is only the
    presentation sort."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey", "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            F.col("l_discount").cast("double").alias("discount"),
            F.col("l_tax").cast("double").alias("tax"),
        )
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure",
        "value",
    ).orderBy("l_orderkey", "l_linenumber", "measure")


RESHAPE_UNPIVOT_MEASURES_SQL = """
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
         CAST(l_quantity AS DOUBLE) AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice',
         CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount',
         CAST(l_discount AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax',
         CAST(l_tax AS DOUBLE) FROM lineitem
)
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber, measure
"""
