"""The remaining TPC-H query shapes (Q4 Q6 Q9 Q10 Q11 Q12 Q14 Q15 Q16
Q18 Q19 Q21), adapted to the synthetic star schema — with Q1/Q2/Q3/Q5/
Q7/Q8/Q13/Q17/Q20/Q22 in relational.py / tpch_shapes.py this completes
the full 22-query sweep, so a user of a general OLAP surface can run
every canonical analytic shape on this engine.

Adaptations forced by the testdata schema (no partsupp table, no
l_commitdate / l_receiptdate / l_shipmode columns):
  Q4   "late" = l_shipdate > o_orderdate + 30 days (EXISTS semantics).
  Q9   supply cost proxy = 0.8 * p_retailprice.
  Q11  part inventory value from lineitem; threshold = 1.2 x the mean
       part value (the 0.0001-of-total form is empty on uniform data).
  Q12  groups by l_linestatus instead of l_shipmode; "late" as in Q4.
  Q16  the supplier-complaint NOT IN is stood in by s_acctbal < 0.
  Q21  "kept the order waiting" = only supplier in a multi-supplier
       order whose ship date slipped 30+ days past the order date.

Plan discipline (100 TB): dims broadcast; facts shuffle at most once on
their join key before aggregation; selective dimension filters are
applied BEFORE the fact join so the shuffle carries only qualifying
rows; money math runs in DECIMAL (exact, associative, partition-order-
proof) and is cast to double only at the output boundary. Threshold
comparisons are either exact decimal/integer terms or byte-identical
float expression trees on both sides (only correctly-rounded IEEE ops,
same literal, same operation order) so the qualifying set is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table

DEC = DecimalType(18, 2)
# Small-precision decimals for 3-factor products: keeps every
# intermediate under precision 38 so neither engine rounds.
DEC12 = DecimalType(12, 2)


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


def _rev() -> F.Column:
    """extendedprice * (1 - discount) in exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi join)
# ---------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in one quarter with at least one line shipped 30+ days
    late, counted per priority. The EXISTS decorrelates to a left-semi
    join; the quarter filter prunes orders BEFORE the shuffle, so the
    semi join carries one quarter of orders, not the full table."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan-aggregate, zero joins)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass scan → filter → global sum. No shuffle beyond the
    1-row final aggregate; every predicate pushes to the parquet scan.
    The canonical 'is the scan path fast' probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier-nation per ship-year for one part family.
    Supply cost proxy: 0.8 * p_retailprice (no partsupp table). The
    part-name filter broadcasts a reduced part dim, which prunes
    lineitem BEFORE the orders... er, before aggregation — only
    matching part lines survive the broadcast hash join.

    Decimal shapes are kept narrow (DECIMAL(12,2) factors) so the
    3-factor product stays under precision 38 — neither engine rounds,
    so the sums agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cost = (
        F.col("l_quantity").cast(DEC12)
        * F.col("p_retailprice").cast(DEC12)
        * F.lit("0.8").cast(DecimalType(2, 1))
    )
    rev = F.col("l_extendedprice").cast(DEC12) * (
        F.lit(1).cast(DEC12) - F.col("l_discount").cast(DecimalType(3, 2))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(3,2)))
         - CAST(l_quantity AS DECIMAL(12,2))
           * CAST(p_retailprice AS DECIMAL(12,2))
           * CAST(0.8 AS DECIMAL(2,1))
       ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer over one quarter, top 20.
    The quarter filter reduces orders before the fact join; customer
    and nation broadcast. Tie-stable: ordered by (revenue DESC,
    c_custkey) so the limit boundary is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — important part values (HAVING against a global scalar)
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose lineitem revenue exceeds 1.2x the mean part value.
    The global (total, count) scalar is one extra 1-row aggregate,
    broadcast back over the per-part aggregate — two jobs over one
    shuffle-partitioned intermediate, no second scan of lineitem.

    The threshold compare (v * n > total * 1.2) would overflow decimal
    precision 38 as a scaled-integer form, so it runs as a float
    expression instead — with the SAME literal and operation order on
    both engines, every op correctly rounded, so the qualifying set is
    still bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("v_dec"))
    # no persist: the per-part aggregate's Exchange appears in both the
    # broadcast (total) subtree and the probe side of one plan, so AQE's
    # exchange reuse computes the shuffle once (asserted in
    # test_plan_quality.test_scalar_against_aggregate_reuses_exchange)
    tot = pv.agg(
        F.sum("v_dec").alias("total_dec"), F.count(F.lit(1)).alias("n_parts")
    )
    out = (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v_dec").cast("double") * F.col("n_parts").cast("double")
            > F.col("total_dec").cast("double") * F.lit(1.2)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )
    return out


Q11_IMPORTANT_PARTS_SQL = f"""
WITH pv AS (
  SELECT l_partkey AS partkey, SUM({_REV_SQL}) AS v_dec
  FROM lineitem GROUP BY l_partkey
)
SELECT partkey, CAST(v_dec AS DOUBLE) AS part_value
FROM pv
WHERE CAST(v_dec AS DOUBLE) * CAST((SELECT COUNT(*) FROM pv) AS DOUBLE)
      > CAST((SELECT SUM(v_dec) FROM pv) AS DOUBLE) * 1.2
ORDER BY part_value DESC, partkey
"""


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority mix (CASE-sum pivot by line status)
# ---------------------------------------------------------------------------

def q12_late_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For lines shipped 60+ days after the order date: per line
    status, how many came from high- vs low-priority orders. One fact
    shuffle on orderkey; the CASE sums are exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_LATE_PRIORITY_MIX_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (conditional aggregate ratio)
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from PROMO parts. Both sums are
    exact decimals; the single final division is the only float op and
    runs in the same order on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast(DEC)
    )
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(_rev()).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_PROMO_REVENUE_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (equality against a grouped MAX scalar)
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue over one quarter. The MAX
    is taken over the per-supplier aggregate (1-row broadcast back);
    equality runs on exact decimals so 'the max' is unambiguous."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("rev_dec"))
    # no persist — AQE exchange reuse (see q11_important_parts)
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (anti join + COUNT DISTINCT)
# ---------------------------------------------------------------------------

Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) for selected
    sizes, excluding one brand and any supplier with a negative account
    balance (the complaint NOT IN stand-in, via broadcast anti join).
    The supplier-pair distinct runs BEFORE the count so the shuffle
    carries unique (part, supplier) pairs only."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_PARTS_SUPPLIER_SQL = f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING on a grouped fact, then enrich)
# ---------------------------------------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 250, with their customers.
    lineitem aggregates FIRST (one shuffle on orderkey, map-side
    partials); only qualifying keys join orders/customer, so the
    enrichment joins see a tiny filtered set."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit(250).cast(DEC))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_LARGE_ORDERS_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_dec AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(250 AS DECIMAL(18,2))
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs over part and lineitem attributes — the classic
    'can the optimizer keep a disjunction inside one join' probe. The
    common l_partkey = p_partkey stays an equi broadcast join; the
    disjunction evaluates post-join inside codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 40)
        )
    )
    return j.filter(cond).agg(F.sum(_rev()).cast("double").alias("revenue"))


Q19_DISJUNCTIVE_REVENUE_SQL = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper in a multi-supplier
    order, ranked by how often. The EXISTS / NOT EXISTS pair
    decorrelates to per-order counts over one grouped intermediate:
    one shuffle on orderkey, then window-free aggregation — no
    self-joins of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
                ).cast("int")
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    sole_late = (
        per_supp.join(per_order, "l_orderkey")
        .filter(
            (F.col("n_supp") > 1) & (F.col("n_late") == 1) & (F.col("late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )


Q21_WAITING_SUPPLIERS_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_supp
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late = 1 AND late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 50
"""
