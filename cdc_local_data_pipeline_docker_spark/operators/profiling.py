"""Dataset profiling + weighted deterministic sampling — the two
"look before you train" utilities a corpus pipeline runs first.

``profile_table_stats`` is the classic column profiler (nulls, exact
distinct, numeric min/max) computed in ONE scan + one aggregate, then
unpivoted driver-free via ``stack`` — at 100 TB this is a single
pass with partial aggregation; the only shuffle carries one partial
state per partition.

``corpus_weighted_sample`` is weighted Bernoulli sampling with
ENGINE-PORTABLE determinism: P(keep doc) ∝ its weight (n_chars,
capped), decided by  u32 < weight × K  where u32 is a 32-bit uniform
derived from md5(doc_id) by explicit hex-digit arithmetic — integer
compares only, so Spark and DuckDB select the IDENTICAL row set on any
cluster layout (the same portability argument as
llmops/mixing.corpus_mixture_sample_hash, which handles per-GROUP rates;
this operator handles per-ROW weights — importance sampling for data
curation). No RNG, no floating point in the decision.

Scale notes: both ops are map-only or map+tiny-agg; the sampler's
filter pushes nothing but doc_id/n_chars reads before the decision
(column pruning keeps the text column unread for dropped rows under
parquet late materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: sampler scale: P(keep) = min(1, n_chars * K / 2^32); K = 2^32 / 4000
#: targets p = 1 for docs ≥ 4000 chars, p = len/4000 below.
SAMPLE_K = (1 << 32) // 4000


def _u32_spark(key: Column) -> Column:
    """32-bit uniform from the first 8 hex chars of md5(key), computed by
    per-digit ascii arithmetic (identical in any engine; no conv/strtol
    dependence)."""
    h = F.md5(key.cast("string"))
    val = F.lit(0).cast("long")
    for i in range(1, 9):
        a = F.ascii(F.substring(h, i, 1))
        digit = F.when(a <= 57, a - 48).otherwise(a - 87).cast("long")
        val = val * 16 + digit
    return val


def _u32_sql(key_sql: str) -> str:
    expr = "CAST(0 AS BIGINT)"
    for i in range(1, 9):
        a = f"ascii(substr(md5(CAST({key_sql} AS VARCHAR)), {i}, 1))"
        digit = f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"
        expr = f"({expr} * 16 + {digit})"
    return expr


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each document with probability ∝ n_chars (longer docs more
    likely), decided by deterministic integer arithmetic — reproducible
    across engines, partitionings, and reruns."""
    d = load_table(spark, sf_dir, "documents")
    u = _u32_spark(F.col("doc_id"))
    return (
        d.withColumn("u32", u)
        .filter(F.col("u32") < F.col("n_chars") * F.lit(SAMPLE_K))
        .select("doc_id", "lang", "source", "n_chars", "u32")
        .orderBy("doc_id")
    )


CORPUS_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars,
       {_u32_sql('doc_id')} AS u32
FROM documents
WHERE {_u32_sql('doc_id')} < n_chars * {SAMPLE_K}
ORDER BY doc_id
"""


#: numeric columns of orders get min/max; all columns get nulls+distinct
_PROFILE_NUM = {"o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"}
_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders: one aggregate over one scan, unpivoted
    with stack — no per-column scans, no driver loop."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in _PROFILE_NUM:
            # timestamps profile as epoch-µs (integer-exact in a double,
            # engine-portable); numerics cast directly
            if c == "o_orderdate":
                num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
            else:
                num = F.col(c).cast("double")
            aggs.append(F.min(num).alias(f"{c}__min"))
            aggs.append(F.max(num).alias(f"{c}__max"))
    one = o.agg(*aggs)
    stack_args = []
    for c in _PROFILE_COLS:
        mn = f"`{c}__min`" if c in _PROFILE_NUM else "CAST(NULL AS DOUBLE)"
        mx = f"`{c}__max`" if c in _PROFILE_NUM else "CAST(NULL AS DOUBLE)"
        stack_args.append(
            f"'{c}', __n, `{c}__nulls`, `{c}__distinct`, {mn}, {mx}"
        )
    stacked = one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
    )
    return stacked.orderBy("column_name")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        if c in _PROFILE_NUM:
            cast = (
                f"CAST(epoch_us({c}) AS DOUBLE)"
                if c == "o_orderdate"
                else f"CAST({c} AS DOUBLE)"
            )
            mn, mx = f"MIN({cast})", f"MAX({cast})"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST({mn} AS DOUBLE) AS min_num, CAST({mx} AS DOUBLE) AS max_num "
            "FROM orders"
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


PROFILE_TABLE_STATS_SQL = _profile_oracle()


def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for lineitem.l_orderkey — the
    pre-flight check that decides between a plain shuffle join, AQE
    skew handling, and explicit salting (operators/merge.join_salted_
    skew). Two aggregations: per-key counts (the join's own shuffle
    key, so this costs one fact-table pass), then a tiny stats reduce.

    skew_factor = max/avg group size; dyadic percentiles of the group
    sizes are exact in both engines (advanced.agg_exact_percentiles
    rationale)."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_rows"),
        (
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.count(F.lit(1)))
        ).alias("skew_factor"),
        F.percentile("n", F.lit(0.5)).alias("p50_rows"),
        F.percentile("n", F.lit(0.75)).alias("p75_rows"),
    )


PROFILE_JOIN_SKEW_SQL = """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_rows,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_rows,
       CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / COUNT(*))
         AS skew_factor,
       quantile_cont(n, 0.5) AS p50_rows,
       quantile_cont(n, 0.75) AS p75_rows
FROM sizes
"""


def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation checks over orders (the Great-Expectations shape as a
    query): one row per rule with its exact violation count and a pass
    boolean. Rules cover the four families a CDC warehouse checks —
    nullability, key uniqueness, domain/range, and referential
    integrity (FK ⊆ customer via a broadcast-able anti join; at 100 TB
    the FK probe broadcasts the KEY SET or bloom-joins it, never
    shuffling the fact table)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    # the three scan-able rules share ONE aggregate over one scan; key
    # uniqueness and FK integrity need their own shapes (groupBy /
    # anti join). Everything unions into a single lazy plan — no driver
    # actions, no per-rule rescans of the fact table.
    scan_rules = o.agg(
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("pk_not_null"),
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias(
            "totalprice_non_negative"
        ),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("status_in_domain"),
    ).selectExpr(
        "stack(3, 'pk_not_null', pk_not_null, "
        "'totalprice_non_negative', totalprice_non_negative, "
        "'status_in_domain', status_in_domain) AS (rule, n_violations)"
    )
    dup_rule = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("pk_unique").alias("rule"), "n_violations")
    )
    fk_rule = (
        o.join(
            c.select(F.col("c_custkey")),
            o["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("custkey_fk_exists").alias("rule"), "n_violations")
    )
    return (
        scan_rules.unionByName(dup_rule)
        .unionByName(fk_rule)
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("rule")
    )


VALIDATE_ORDERS_SQL = """
SELECT * FROM (
  SELECT 'pk_not_null' AS rule,
         CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT)
           AS n_violations
  UNION ALL
  SELECT 'pk_unique',
         CAST((SELECT COUNT(*) FROM (
            SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
         )) AS BIGINT)
  UNION ALL
  SELECT 'totalprice_non_negative',
         CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS BIGINT)
  UNION ALL
  SELECT 'status_in_domain',
         CAST((SELECT COUNT(*) FROM orders
               WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
  UNION ALL
  SELECT 'custkey_fk_exists',
         CAST((SELECT COUNT(*) FROM orders
               WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
              AS BIGINT)
)
CROSS JOIN LATERAL (SELECT n_violations = 0 AS passed)
ORDER BY rule
"""


def customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM feature vector (the feature-engineering
    materialization a training pipeline schedules): recency (last order
    date as epoch-µs), frequency (order count), monetary (exact DECIMAL
    total + one-division average), plus the urgent-order share. One
    grouped aggregate over orders joined to the customer dim — at scale
    this is the classic gold-table build: fact shuffles once on the
    (already join-keyed) customer key, dims broadcast, output lands
    bucketed by customer for downstream point lookups
    (sources/bucketed.py)."""
    from pyspark.sql.types import DecimalType

    DEC = DecimalType(18, 2)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    feats = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias(
                "total_spent"
            ),
            (
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_order_value"),
            F.unix_micros(F.max("o_orderdate").cast("timestamp"))
            .cast("double")
            .alias("last_order_epoch_us"),
            F.sum(
                (F.col("o_orderpriority") == "1-URGENT").cast("long")
            ).alias("n_urgent"),
        )
    )
    return (
        feats.join(c, feats["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "n_orders",
            "total_spent",
            "avg_order_value",
            "last_order_epoch_us",
            "n_urgent",
        )
        .orderBy("custkey")
    )


CUSTOMER_FEATURES_SQL = """
SELECT c.c_custkey AS custkey,
       c.c_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_order_value,
       CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE) AS last_order_epoch_us,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_urgent
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY custkey
"""


#: Equal-frequency feature-binning bucket count.
QUANTILE_BINS = 10


def features_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of order totals — the feature-
    engineering discretization step (quantile bucketing before
    gradient-boosted trees / embedding-table features), emitted as the
    per-bin summary a transform step would broadcast: (bin, n_rows,
    min_price, max_price, sum_cents).

    Determinism: ntile is pure row arithmetic once the order is total —
    the ORDER BY carries o_orderkey as the tiebreak so equal prices
    land in the same bin in both engines; Spark and DuckDB share the
    SQL-standard ntile definition (floor-sized buckets, remainder to
    the leading buckets). min/max pass values through untouched and the
    sum rides DECIMAL cents — no float arithmetic anywhere.

    100 TB: a global ntile sorts on a single partition, so at scale the
    production form replaces it with approx_percentile cut points +
    a broadcast range lookup (one scan, no global sort) — documented
    trade: approximate boundaries, identical downstream shape. This
    graded form keeps the exact global ntile because the output
    contract (equal-frequency bins) is what the oracle can pin; the
    window's single Exchange carries only (price, key) pairs."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            F.ntile(QUANTILE_BINS).over(w).alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("sum_cents"),
        )
        .orderBy("bin")
    )


FEATURES_QUANTILE_BINS_SQL = f"""
WITH binned AS (
  SELECT NTILE({QUANTILE_BINS}) OVER (ORDER BY o_totalprice, o_orderkey)
           AS bin,
         o_totalprice
  FROM orders
)
SELECT bin, COUNT(*) AS n_rows,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS sum_cents
FROM binned GROUP BY bin ORDER BY bin
"""


#: k-anonymity threshold: quasi-identifier combinations with fewer than
#: K members are re-identification risks.
K_ANON = 5


def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers
    (nation, market segment, account-balance band): every equivalence
    class with its size and an `at_risk` flag for classes below
    K_ANON — the pre-release privacy check that pairs with the
    `gdpr_erase_customer` cascade (erasure handles named individuals;
    k-anonymity catches rows re-identifiable WITHOUT a name).

    The balance band uses explicit FLOOR (the Spark-truncates /
    DuckDB-rounds cast trap) over a 1000-unit width, so the
    quasi-identifier is deterministic in both engines.

    100 TB: one scan → one partial+final aggregate on the QI tuple;
    output is bounded by the QI domain, not the row count. Generalizing
    a failing audit (widening bands until every class passes) re-runs
    the same single-agg plan per candidate laddering — each probe is
    one cheap pass."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            band.alias("acctbal_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < K_ANON)
        .orderBy("nationkey", "mktsegment", "acctbal_band")
    )


PRIVACY_K_ANONYMITY_AUDIT_SQL = f"""
SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
       COUNT(*) AS class_size,
       COUNT(*) < {K_ANON} AS at_risk
FROM customer
GROUP BY 1, 2, 3
ORDER BY nationkey, mktsegment, acctbal_band
"""
