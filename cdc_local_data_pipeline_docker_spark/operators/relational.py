"""Relational queries: scan → filter → join → aggregate → window → sort.

The reference's entire query surface is projection + global count/max
(SURVEY.md §2.A); everything here is the EXT surface from §2.C, built purely
on Catalyst built-ins so predicate pushdown, column pruning, partial
aggregation, and join selection come for free.

Exactness contract: the driver hash-compares values against a DuckDB oracle.
Double columns are summed through DecimalType(18,2) (exact, associative —
immune to partition/shuffle order) and the final aggregate is cast back to
double (correctly-rounded in both engines), so results are bit-identical.

Scale notes (100 TB):
  * fact-fact joins (lineitem ⋈ orders) are shuffle joins on the join key —
    co-partitioned and AQE-skew-handled; dimension joins are broadcast.
  * every aggregate is expressed via groupBy().agg() so Catalyst plans
    partial (map-side) aggregation before the shuffle.
  * filters sit directly on the scan so they push into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table

DEC = DecimalType(18, 2)


def _dec(col: str):
    """Exact-decimal view of a 2-dp double column (see module docstring)."""
    return F.col(col).cast(DEC)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → agg → sort).
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report over lineitem (TPC-H Q1 shape).

    Single scan, filter pushed to parquet, partial+final hash aggregate on a
    low-cardinality key (≤6 groups) — at 100 TB this is embarrassingly
    parallel with a tiny shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Filters: =, <, BETWEEN, IN, LIKE, IS NOT NULL on one scan.
# ---------------------------------------------------------------------------

def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter over orders; every conjunct is
    pushdown-eligible (shows up under PushedFilters in the scan node)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(1000.0, 5000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").isNotNull()
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


FILTER_PREDICATES_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'O'
  AND o_totalprice BETWEEN 1000.0 AND 5000.0
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderdate IS NOT NULL
  AND o_orderdate >= TIMESTAMP '1996-01-01'
"""


def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern filter (prefix pattern → pushdown-eligible StartsWith)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%ECO%") & F.col("p_name").like("s%"))
        .select("p_partkey", "p_name", "p_type", "p_size")
    )


FILTER_LIKE_SQL = """
SELECT p_partkey, p_name, p_type, p_size
FROM part
WHERE p_type LIKE '%ECO%' AND p_name LIKE 's%'
"""


# ---------------------------------------------------------------------------
# Joins.
# ---------------------------------------------------------------------------

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer (FK equi-join) → revenue per market segment.

    customer is small relative to orders → Catalyst broadcasts it under the
    64 MB threshold; at 100 TB the same plan holds because customer stays
    dimension-sized relative to the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_INNER_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ three broadcast dims: lineitem → supplier → nation → region.

    Explicit broadcast() hints on every dimension: the fact table never
    shuffles — the only shuffle is the final small groupBy. This is the
    plan that survives a 1000-executor 100 TB scan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("r_name")
    )


JOIN_BROADCAST_DIMS_SQL = """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN orders — preserves customers with zero orders
    (COUNT of the right-side key, not COUNT(*))."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(F.sum(_dec("o_totalprice")).cast("double"), F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_count,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
         AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders RIGHT JOIN customer — the mirrored form of join_left_outer
    (Catalyst canonicalizes right→left by swapping sides; this entry
    closes SURVEY §2.C's inner/left/right/full row textually). Preserves
    customers with zero orders; aggregates count the nullable left-side
    key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(F.sum(_dec("o_totalprice")).cast("double"), F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


JOIN_RIGHT_OUTER_SQL = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_count,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
         AS total_spent
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have at least one urgent order (LEFT SEMI — no row
    multiplication, the probe side short-circuits on first match)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent orders (LEFT ANTI against a filtered fact)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts —
    nations present on either side survive."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("supplier_count"))
    )
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
            F.coalesce("customer_count", F.lit(0)).alias("customer_count"),
            F.coalesce("supplier_count", F.lit(0)).alias("supplier_count"),
        )
    )


JOIN_FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey, COUNT(*) AS customer_count FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey, COUNT(*) AS supplier_count FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(customer_count, 0) AS customer_count,
       COALESCE(supplier_count, 0) AS supplier_count
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: orders classified into price bands via
    BETWEEN against a tiny derived band table — broadcast nested-loop, the
    only sane physical plan for a pure theta join; the band side must stay
    broadcast-small at any scale."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("small", 0.0, 1000.0),
            ("medium", 1000.0, 10000.0),
            ("large", 10000.0, 100000.0),
            ("jumbo", 100000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("band_revenue"),
        )
        .orderBy("band")
    )


JOIN_RANGE_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0.0, 1000.0), ('medium', 1000.0, 10000.0),
         ('large', 10000.0, 100000.0), ('jumbo', 100000.0, 1e18)
)
SELECT band, COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_revenue
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""


# ---------------------------------------------------------------------------
# Grouped aggregation.
# ---------------------------------------------------------------------------

def agg_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer stats: count / sum / avg / min / max / distinct."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_acctbal"
            ),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("c_nationkey")
    )


AGG_GROUPED_SQL = """
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal,
       MIN(c_acctbal) AS min_acctbal,
       MAX(c_acctbal) AS max_acctbal,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): subtotals + grand total of customers."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


AGG_ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (expand + two-phase agg in Spark)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.countDistinct("o_orderpriority").alias("distinct_priorities"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("o_orderstatus")
    )


AGG_COUNT_DISTINCT_SQL = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS distinct_customers,
       COUNT(DISTINCT o_orderpriority) AS distinct_priorities,
       COUNT(*) AS order_count
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with a *contract oracle*: HLL++ distinct +
    t-digest percentiles, graded as exact-value + tolerance-boolean rows.

    Approximate values themselves cannot hash-match a different engine's
    sketches, so the graded output carries (a) the exact per-group
    ``count_distinct`` — exact in both engines — and (b) booleans
    asserting each engine's OWN approximation lands within 5% of its OWN
    exact value. Both engines' sketches meet the bound by construction
    (Spark rsd=0.01 HLL++, 10k-bucket percentile_approx; DuckDB HLL /
    t-digest), so every boolean is deterministically true and the row
    hash-matches while still failing loudly if either sketch degrades.
    At 100 TB the sketches replace exact distinct/percentile entirely:
    fixed-size mergeable state, no expand."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    exact = F.expr(
        "percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))"
    )

    def within(approx, ex):  # each engine compares itself to itself
        return F.abs(approx - ex) / ex <= F.lit(0.05)

    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("_approx_orders"),
        pcts.alias("_p"),
        exact.alias("_e"),
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_orders",
            within(
                F.col("_approx_orders").cast("double"),
                F.col("exact_orders").cast("double"),
            ).alias("distinct_within_5pct"),
            within(F.col("_p").getItem(0), F.col("_e").getItem(0)).alias(
                "p50_within_5pct"
            ),
            within(F.col("_p").getItem(1), F.col("_e").getItem(1)).alias(
                "p95_within_5pct"
            ),
            within(F.col("_p").getItem(2), F.col("_e").getItem(2)).alias(
                "p99_within_5pct"
            ),
        )
        .orderBy("l_returnflag")
    )


AGG_APPROX_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       ABS(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
           - CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE))
         / CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) <= 0.05
         AS distinct_within_5pct,
       ABS(approx_quantile(l_extendedprice, 0.5)
           - quantile_cont(l_extendedprice, 0.5))
         / quantile_cont(l_extendedprice, 0.5) <= 0.05 AS p50_within_5pct,
       ABS(approx_quantile(l_extendedprice, 0.95)
           - quantile_cont(l_extendedprice, 0.95))
         / quantile_cont(l_extendedprice, 0.95) <= 0.05 AS p95_within_5pct,
       ABS(approx_quantile(l_extendedprice, 0.99)
           - quantile_cont(l_extendedprice, 0.99))
         / quantile_cont(l_extendedprice, 0.99) <= 0.05 AS p99_within_5pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Window functions.
# ---------------------------------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (rank-then-filter; ties broken by
    orderkey so the result is deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_TOPK_PER_GROUP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: previous/next price via lag/lead."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice, 1)  OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-bounded running revenue per customer (unbounded preceding →
    current row). Sum runs over exact decimals so the running values match
    the oracle bit-for-bit, then casts to double."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_revenue"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
            )
        )
        .alias("order_seq"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_revenue,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS order_seq
FROM orders
"""


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank on part size within brand."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").asc(), F.col("p_partkey").asc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
    )


WINDOW_RANK_DENSE_SQL = """
SELECT p_brand, p_partkey, p_size,
       RANK()       OVER w AS size_rank,
       DENSE_RANK() OVER w AS size_dense_rank
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_size ASC, p_partkey ASC)
"""


# ---------------------------------------------------------------------------
# Sort / limit / set ops / distinct.
# ---------------------------------------------------------------------------

def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price — Spark plans TakeOrderedAndProject
    (per-partition top-k + merge), never a full sort, at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SORT_LIMIT_TOPN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of nationkeys that have customers or suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct().orderBy("nationkey")


SET_UNION_DISTINCT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with finished orders but no open ones.
    Spark's ``subtract`` has exactly SQL EXCEPT semantics (``exceptAll``
    is the bag variant and is NOT equivalent)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(op).orderBy("custkey")


SET_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column pair."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    )


DISTINCT_PAIRS_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Multi-join analytic queries (TPC-H Q3 / Q5 shapes).
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → grouped revenue → top 10.

    customer (filtered, broadcast) ⋈ orders ⋈ lineitem: the two fact tables
    shuffle on orderkey; AQE handles skew. Top-10 via TakeOrdered."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, revenue per nation where the customer
    and supplier share a nation. All dims broadcast; facts shuffle once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""
