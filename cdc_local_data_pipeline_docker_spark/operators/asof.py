"""As-of join: for each left row, the most recent right row at-or-before
its timestamp (per key) — the temporal join Spark has no built-in for
(SURVEY.md §2.C "as-of / latest-state CDC join").

Implementation is the scalable union+window composition, NOT a range join:
tag both sides, union them, and carry the right side's last value forward
with `F.last(ignorenulls=True)` over (key, time) ordering. One shuffle on
the key, linear state — where a naive range join explodes to
|L|·|R per key| pairs and a broadcast-nested-loop, this stays a single
window pass at any scale. Ties (right row exactly at the left timestamp)
sort right-before-left, giving standard `<=` as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
) -> DataFrame:
    """Generic as-of: append `right_value` of the latest right row with
    right_ts <= left_ts for the same key. Left rows keep all columns."""
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_rv", F.lit(None).cast(
        right.schema[right_value].dataType
    )).withColumn("_ts", F.col(left_ts))
    r_tag = (
        right.select(
            key,
            F.col(right_ts).alias("_ts"),
            F.col(right_value).alias("_rv"),
        )
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tag.select(
        key, "_ts", "_side", "_rv", *[c for c in left.columns if c not in (key,)]
    ).unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_side", "_rv", "_ts")
    )


def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: the timestamp of that user's most recent view
    at-or-before the purchase (NULL if none yet) — the classic attribution
    as-of. Oracle: correlated MAX subquery with identical <= semantics."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof_join(
        purchases, views, key="user_id", left_ts="ts",
        right_ts="view_ts", right_value="view_ts",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("_asof").alias("last_view_ts"),
    ).orderBy("event_id")


EVENTS_ASOF_LAST_VIEW_SQL = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       (SELECT MAX(v.ts) FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id
          AND v.ts <= p.ts) AS last_view_ts
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status),(priority),()) — grouping combinations that
    neither rollup nor cube expresses; declared via spark.sql to exercise
    the SQL entry path alongside the DataFrame API."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


GROUPING_SETS_STATUS_PRIORITY_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery + EXISTS, declared in SQL: orders beating
    their customer's average price, where the customer has an urgent order.
    Catalyst decorrelates both into joins/aggregates — the optimizer
    feature, not hand-written join plumbing, is what's exercised; the
    oracle runs the very same SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_CORRELATED_SQL.format(t="orders_v"))


_CORRELATED_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM {t} o
WHERE o_totalprice > (SELECT AVG(i.o_totalprice) FROM {t} i
                      WHERE i.o_custkey = o.o_custkey)
  AND EXISTS (SELECT 1 FROM {t} u
              WHERE u.o_custkey = o.o_custkey
                AND u.o_orderpriority = '1-URGENT')
ORDER BY o_orderkey
"""

SQL_CORRELATED_SUBQUERY_SQL = _CORRELATED_SQL.format(t="orders")


def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (ALL) set semantics: UNION ALL / INTERSECT ALL / EXCEPT ALL
    cardinalities over the per-order status stream — duplicates preserved
    per multiset algebra, summarized as counts per status."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    union_all = f.unionAll(p).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_union_all")
    )
    intersect_all = (
        f.intersectAll(p).groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_intersect_all")
        )
    )
    except_all = (
        f.exceptAll(p).groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_except_all")
        )
    )
    return (
        union_all.join(intersect_all, "o_custkey", "left")
        .join(except_all, "o_custkey", "left")
        .select(
            "o_custkey",
            "n_union_all",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
        .orderBy("o_custkey")
    )


SET_OPS_BAG_SEMANTICS_SQL = """
WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
p AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'),
ua AS (SELECT o_custkey, COUNT(*) AS n_union_all
       FROM (SELECT * FROM f UNION ALL SELECT * FROM p) GROUP BY 1),
ia AS (SELECT o_custkey, COUNT(*) AS n_intersect_all
       FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM p) GROUP BY 1),
ea AS (SELECT o_custkey, COUNT(*) AS n_except_all
       FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM p) GROUP BY 1)
SELECT ua.o_custkey, n_union_all,
       COALESCE(n_intersect_all, 0) AS n_intersect_all,
       COALESCE(n_except_all, 0) AS n_except_all
FROM ua LEFT JOIN ia ON ua.o_custkey = ia.o_custkey
        LEFT JOIN ea ON ua.o_custkey = ea.o_custkey
ORDER BY ua.o_custkey
"""


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, SPARK-49555): the same logical plan a
    chained DataFrame expression builds, declared as `|>` stages — scan
    |> filter |> join |> aggregate |> having-filter |> order. Exercises
    the parser surface only: Catalyst sees the identical resolved plan
    (pushdown/pruning/broadcast all apply), so the DuckDB oracle is the
    classic GROUP BY form of the same query."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_pv")
    return spark.sql(
        """
        FROM orders_pv
        |> WHERE o_orderstatus = 'O'
        |> JOIN customer_pv ON o_custkey = c_custkey
        |> AGGREGATE COUNT(*) AS order_count,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
           GROUP BY c_mktsegment
        |> WHERE order_count > 10
        |> ORDER BY c_mktsegment
        """
    )


SQL_PIPE_SYNTAX_SQL = """
SELECT c_mktsegment, COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
GROUP BY c_mktsegment
HAVING COUNT(*) > 10
ORDER BY c_mktsegment
"""


def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.4+/SQL:2016): per urgent-
    priority customer, their 2 most expensive orders — the "top-N per
    entity" idiom as the planner-decorrelated LATERAL join rather than a
    hand-written window. Catalyst rewrites the per-row subquery into a
    ranked join; the plan shape is the window_topk family's, but the
    DECLARATION surface is what this entry covers (both engines run the
    same standard SQL)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_2v")
    return spark.sql(
        _LATERAL_SQL.format(c="customer_v", o="orders_2v")
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {c} c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM {o} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""

SQL_LATERAL_TOPN_SQL = _LATERAL_SQL.format(c="customer", o="orders")
