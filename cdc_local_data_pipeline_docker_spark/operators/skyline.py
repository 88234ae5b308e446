"""Pareto frontier (skyline) over orders: the orders not dominated on
(o_orderdate, o_totalprice) — "no later order was at least as large".
A point dominates another when it is >= on both axes and > on at least
one; equal points tie and both survive.

Scale design: the textbook skyline is an all-pairs NOT EXISTS — O(N²)
and undistributable. The 2-D case collapses instead: any order below its
date's max price is dominated WITHIN the date, so the candidate set is
one row per distinct order date (a DOMAIN-bounded frame — ~2.4k dates in
TPC-H regardless of SF; at 100 TB it is still calendar-sized). The
frontier test on that spine is a running max over later dates — a
single-partition window over metadata, the same phase-2 shape as the
concurrency sweep — and surviving (date, price) pairs equi-join back to
recover every tied order. Total cost: one date-keyed aggregation, a
KB-sized window, one broadcast-able join. For d > 2 dimensions the
reduction no longer applies; the standard move is local-skyline-per-
partition then merge (skylines stay small), which this module documents
but does not need for the 2-D query surface.

All compared columns are DECIMAL / DATE / BIGINT — no floating point
anywhere, so cross-engine equality is structural. A brute NOT EXISTS
twin validates the reduction in pytest at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def orders_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_custkey, o_orderdate, o_totalprice) of every
    non-dominated order under (maximize o_orderdate, maximize
    o_totalprice), ordered by date."""
    orders = load_table(spark, sf_dir, "orders")
    by_date = orders.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("pmax")
    )
    # Running max of pmax over STRICTLY LATER dates: date desc, exclude
    # the current row. NULL (latest date) never dominates.
    w_later = Window.orderBy(F.col("o_orderdate").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_dates = (
        by_date.withColumn("later_max", F.max("pmax").over(w_later))
        .filter(
            F.col("later_max").isNull() | (F.col("later_max") < F.col("pmax"))
        )
        # Renamed to break lineage with the orders frame (self-join rule).
        .select(
            F.col("o_orderdate").alias("fd_date"), F.col("pmax").alias("fd_pmax")
        )
    )
    return (
        orders.join(
            F.broadcast(frontier_dates),
            (F.col("o_orderdate") == F.col("fd_date"))
            & (F.col("o_totalprice") == F.col("fd_pmax")),
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
    )


ORDERS_PARETO_FRONTIER_SQL = """
WITH by_date AS (
  SELECT o_orderdate, MAX(o_totalprice) AS pmax
  FROM orders GROUP BY o_orderdate
),
spine AS (
  SELECT o_orderdate, pmax,
         MAX(pmax) OVER (ORDER BY o_orderdate DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS later_max
  FROM by_date
),
frontier AS (
  SELECT o_orderdate, pmax FROM spine
  WHERE later_max IS NULL OR later_max < pmax
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
FROM orders o
JOIN frontier f
  ON o.o_orderdate = f.o_orderdate AND o.o_totalprice = f.pmax
ORDER BY o.o_orderdate, o.o_orderkey
"""

#: Brute-force dominance twin (pytest-only — validates the date-spine
#: reduction at sf0.001; quadratic, never graded).
ORDERS_PARETO_BRUTE_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders r
WHERE NOT EXISTS (
  SELECT 1 FROM orders s
  WHERE s.o_orderdate >= r.o_orderdate
    AND s.o_totalprice >= r.o_totalprice
    AND (s.o_orderdate > r.o_orderdate OR s.o_totalprice > r.o_totalprice)
)
ORDER BY o_orderdate, o_orderkey
"""
