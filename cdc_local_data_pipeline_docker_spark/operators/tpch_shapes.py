"""Additional TPC-H-shaped multi-join analytics (Q7 / Q8 / Q17 forms, plus
Q2/Q20 shapes re-targeted at lineitem since no partsupp table exists),
adapted to the synthetic data domains (nations are NATION_0..24).

Same plan discipline as relational.py: dims broadcast, facts shuffle once
on their join key, money math through DECIMAL(18,2), deterministic
ordering. Correlated aggregates (Q17/Q2) are semi-reduced by their
selective dimension filter BEFORE aggregating, then decorrelated — window
pass for Q17, grouped MIN joined back for Q2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table

DEC = DecimalType(18, 2)

# Pair chosen to have bilateral trade at EVERY test sf (verified: the
# original NATION_1/NATION_2 pair is EMPTY at sf0.001, which hash-matched
# the oracle trivially — parity tests now assert non-empty results).
Q7_NATION_A = "NATION_18"
Q7_NATION_B = "NATION_19"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations per ship-year —
    supplier in one nation, ordering customer in the other, both
    directions. Facts join on their keys; the four dim joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("supp_nkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cust_nkey"))
        .filter(
            (
                (F.col("supp_nation") == Q7_NATION_A)
                & (F.col("cust_nation") == Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q7_NATION_B)
                & (F.col("cust_nation") == Q7_NATION_A)
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q7_VOLUME_SHIPPING_SQL = f"""
SELECT supp_nation, cust_nation, ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS ship_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
     OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
)
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: a supplier-region's share of yearly revenue within one
    customer-region's market. Share = regional volume / total volume per
    year — both sums run as exact decimals and divide once at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_regionkey").alias("s_rkey")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(n_s), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)  # ASIA customers
        .select(
            F.year("o_orderdate").alias("order_year"),
            vol.alias("volume"),
            (F.col("s_rkey") == F.col("c_rkey")).alias("local_supplier"),
        )
    )
    return (
        joined.groupBy("order_year")
        .agg(
            F.sum(F.when(F.col("local_supplier"), F.col("volume")).otherwise(
                F.lit(0).cast(DEC)
            )).alias("local_vol"),
            F.sum("volume").alias("total_vol"),
        )
        .select(
            "order_year",
            (F.col("local_vol").cast("double") / F.col("total_vol").cast("double")).alias(
                "local_share"
            ),
            F.col("total_vol").cast("double").alias("total_volume"),
        )
        .orderBy("order_year")
    )


Q8_MARKET_SHARE_SQL = """
WITH joined AS (
  SELECT year(o_orderdate) AS order_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           AS volume,
         ns.n_regionkey = nc.n_regionkey AS local_supplier
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN region  ON nc.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT order_year,
       CAST(SUM(CASE WHEN local_supplier THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS local_share,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM joined
GROUP BY order_year
ORDER BY order_year
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue locked in small-quantity orders of a brand —
    lineitems with quantity below 70% of their part's average quantity.
    Scale discipline: the brand filter (broadcast semi-reduce on part)
    lands BEFORE any aggregation, so the per-part average is computed only
    over the brand's lineitems — at 100 TB the aggregate input shrinks by
    the brand selectivity instead of grouping the whole fact table. The
    per-part average of a retained part is unchanged by the part-level
    filter, so semantics are identical to the correlated form. A single
    window pass (one shuffle on partkey) replaces groupBy + join-back
    (two scans of lineitem); the average is an exact decimal ratio so the
    0.7x threshold compares identically in both engines."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li_brand = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    with_avg = li_brand.withColumn(
        "avg_qty",
        F.sum(F.col("l_quantity").cast(DEC)).over(w) / F.count(F.lit(1)).over(w),
    )
    return (
        with_avg.filter(
            F.col("l_quantity").cast(DEC) < F.lit(0.7).cast(DEC) * F.col("avg_qty")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias(
                "small_qty_revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q17_SMALL_QUANTITY_REVENUE_SQL = """
WITH li_brand AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
),
with_avg AS (
  SELECT l_quantity, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM li_brand
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS small_qty_revenue,
       COUNT(*) AS n_lineitems
FROM with_avg
WHERE CAST(l_quantity AS DECIMAL(18,2)) < CAST(0.7 AS DECIMAL(18,2)) * avg_qty
"""


Q2_PART_TYPE = "ECONOMY"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape adapted to the available tables (no partsupp exists): for
    each part of a type class, the supplier(s) achieving the minimum unit
    price over that part's lineitems — the correlated-scalar-subquery
    pattern, decorrelated into a grouped MIN joined back on partkey.

    Scale shape: the type filter broadcasts into lineitem BEFORE any
    aggregation (same semi-reduce discipline as Q17), the per-part MIN is
    a partial+final agg on the already-reduced rows, and the join-back is
    co-partitioned on l_partkey (one shuffle feeds both the agg and the
    final join under AQE). Unit price is a single IEEE division — bitwise
    identical in both engines, so the equality probe is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").contains(Q2_PART_TYPE)
    )
    li_typed = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    min_cost = li_typed.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("min_unit_cost")
    )
    return (
        li_typed.join(min_cost, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_unit_cost"))
        .select("l_partkey", "l_suppkey", "unit_cost")
        .dropDuplicates(["l_partkey", "l_suppkey"])
        .orderBy("l_partkey", "l_suppkey")
    )


Q2_MIN_COST_SUPPLIER_SQL = f"""
WITH li_typed AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type LIKE '%{Q2_PART_TYPE}%'
)
SELECT DISTINCT l_partkey, l_suppkey, unit_cost
FROM li_typed o
WHERE unit_cost = (SELECT MIN(i.unit_cost) FROM li_typed i
                   WHERE i.l_partkey = o.l_partkey)
ORDER BY l_partkey, l_suppkey
"""


Q20_QTY_THRESHOLD = 50


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape adapted (no partsupp): suppliers that shipped more than a
    threshold quantity of a brand's parts — the NESTED-semi-join pattern:
    supplier ⋉ (lineitem ⋉ brand-parts, aggregated with HAVING).

    Plan: brand parts broadcast into lineitem (innermost semi-reduce), the
    per-supplier quantity agg runs on the reduced rows, and the outer
    filter is a LEFT SEMI join against the tiny qualifying-supplier set —
    supplier rows never multiply, lineitem shuffles once on suppkey."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    s = load_table(spark, sf_dir, "supplier")
    qualifying = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > F.lit(Q20_QTY_THRESHOLD).cast(DEC))
        .select("l_suppkey")
    )
    return (
        s.join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


Q20_EXCESS_SHIPPERS_SQL = f"""
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
         > CAST({Q20_QTY_THRESHOLD} AS DECIMAL(18,2))
)
ORDER BY s_suppkey
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count, INCLUDING
    zero-order customers (the left join is the point) — two aggregation
    levels: per-customer count, then histogram over counts. Both shuffles
    are small (keyed by custkey then by the tiny count domain)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per-segment count/balance of customers whose balance
    beats the positive-balance average AND who placed no URGENT order
    (every customer orders in the synthetic data, so the classic
    no-orders-at-all predicate is empty; the filtered NOT EXISTS keeps the
    anti-join shape non-trivial) — a scalar aggregate subquery
    (decorrelated to a broadcast 1-row threshold) plus a NOT EXISTS anti
    join. The threshold is an exact decimal ratio (SUM(DECIMAL)/COUNT),
    so the boundary compares identically in both engines — a float AVG
    would be summation-order-dependent and could flip edge rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)) / F.count(F.lit(1))).alias("thr")
        )
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal").cast(DEC) > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_DORMANT_HIGH_BALANCE_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
      (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(*)
       FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""
