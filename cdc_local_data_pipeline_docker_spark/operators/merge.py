"""MERGE INTO semantics on plain DataFrames, and the salted-join skew
pattern — the two write/join maintenance shapes SURVEY §2.C's CDC-apply
row implies but that deserve standalone, oracle-graded forms.

``merge_into_orders`` is ANSI MERGE (matched-update, matched-delete,
not-matched-insert) expressed as ONE full-outer join over (target ∪
changes) — exactly what Delta/Iceberg execute under their ACID layer;
here the result set itself is the graded artifact. The CDC upsert
(streaming/upsert.py) is the latest-wins specialization; this operator
is the general three-clause form with per-clause conditions.

``join_salted_skew`` (registered from here, lives with the joins
conceptually) replicates the dimension side S ways and salts the fact
side — the classic hot-key spreading recipe for when AQE's runtime skew
split is unavailable (e.g. a deliberately-partitioned stateful op).
Output is pinned identical to the unsalted join.

Scale notes (100 TB): the merge join shuffles on the primary key both
sides — with the target bucketed by key (sources/bucketed.py) the
target side's Exchange disappears and the merge is a per-bucket
map-side zip, the same physical shape Delta's MERGE optimizes to. The
change set is usually micro-batch-sized → broadcastable, making MERGE a
map-only operation over the target scan. Salting multiplies the small
side by S (bounded blow-up, broadcast stays cheap) and splits each hot
key into S independent reduce tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table

DEC = DecimalType(18, 2)

#: salt fan-out for join_salted_skew
SALT_N = 8


def _orders_changes(o: DataFrame) -> DataFrame:
    """Deterministic synthetic change set over the orders snapshot:

      * orderkey % 10 == 3  → UPDATE (status := 'X', price += 10.00)
      * orderkey % 10 == 7  → DELETE
      * orderkey % 10 == 0  → INSERT twin row (key := max(o_orderkey)
        + 1 + key, status 'N')

    Derived from the table itself so every scale factor has a
    non-trivial change set and the oracle can derive the identical one.
    The insert-key offset is DERIVED from max(o_orderkey) (ADVICE r5: a
    fixed +1e9 collides with real orderkeys once SF ≳ 167, at which
    point the DataFrame merge treats the insert as a matched no-op while
    the SQL oracle unconditionally unions it) — max + 1 + key is unique
    (key is unique) and strictly above every real key at ANY scale. The
    1-row max aggregate broadcasts; no collect."""
    upd = o.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice").cast(DEC) + F.lit(10).cast(DEC))
        .cast("double")
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
        F.lit("update").alias("op"),
    )
    dele = o.filter(F.col("o_orderkey") % 10 == 7).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        F.lit("delete").alias("op"),
    )
    mx = o.agg(F.max("o_orderkey").alias("__maxkey"))
    ins = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("__maxkey") + 1 + F.col("o_orderkey")).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            F.lit("insert").alias("op"),
        )
    )
    return upd.unionByName(dele).unionByName(ins)


def merge_into(target: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Generic three-clause MERGE: ``changes.op`` ∈ {update, delete,
    insert}. One full-outer join on the key; each output row resolves via
    per-clause CASE — no per-row Python, whole-stage-codegen throughout.

    PRECONDITION: ``changes`` must be key-unique — ANSI MERGE raises on
    multiple source rows matching one target row; this plan-only form
    cannot raise mid-plan, so duplicate change keys would instead fan the
    matched target row out once per duplicate (pinned by
    test_merge_duplicate_change_keys_fan_out). Producers with multi-event
    batches collapse them first with a latest-wins pre-step, exactly like
    the CDC upsert (streaming/upsert._merge_latest) and the incremental
    view's _batch_final."""
    data_cols = [c for c in target.columns]
    ch = changes.select(
        F.col(key).alias("__ck"),
        F.col("op").alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in data_cols],
    )
    j = target.join(ch, target[key] == ch["__ck"], "full")
    matched = target[key].isNotNull() & F.col("__ck").isNotNull()
    out_cols = [
        F.when(matched & (F.col("__op") == "update"), F.col(f"__c_{c}"))
        .when(F.col(key).isNull(), F.col(f"__c_{c}"))  # insert clause
        .otherwise(target[c])
        .alias(c)
        for c in data_cols
    ]
    keep = (
        # unmatched target rows pass through
        F.col("__ck").isNull()
        # matched: delete drops; update keeps (rewritten); any other op —
        # e.g. an insert clause that happened to match — fires NO matched
        # clause, so the target row passes through untouched (the
        # hypothesis sweep caught this case being dropped)
        | (matched & (F.col("__op") != "delete"))
        # unmatched change rows: only the insert clause materializes
        | (target[key].isNull() & (F.col("__op") == "insert"))
    )
    return j.filter(keep).select(out_cols)


def merge_into_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the synthetic change set into the orders snapshot and return
    the post-merge table (the graded artifact)."""
    o = load_table(spark, sf_dir, "orders")
    merged = merge_into(o, _orders_changes(o), "o_orderkey")
    return merged.orderBy("o_orderkey")


def merge_into_lowshuffle(
    target: DataFrame, changes: DataFrame, key: str
) -> DataFrame:
    """The LOW-SHUFFLE MERGE: identical semantics to ``merge_into`` for a
    micro-batch-sized change set, with the target NEVER entering an
    Exchange — the shape Delta's low-shuffle merge optimizes to, and the
    right plan whenever |changes| fits a broadcast (CDC micro-batches,
    GDPR deletes, backfill patches).

    Spark's BroadcastHashJoin does not support FULL OUTER, so the single
    full-outer join of ``merge_into`` splits into two broadcast passes:

      1. matched pass — target LEFT-broadcast-joins the changes;
         per-clause CASE rewrites updates, drops deletes, passes
         everything else through. The target streams map-side.
      2. insert pass — the insert-clause changes minus the MATCHED keys.
         The matched-key set comes from a left-semi scan of the target
         against the broadcast changes — its size is bounded by
         |changes|, so it broadcasts into the anti-join (the target is
         scanned twice, shuffled never; scans are the cheap currency at
         100 TB, Exchanges the expensive one).

    Same key-uniqueness precondition as ``merge_into``; results are
    pinned identical by test_merge_lowshuffle_equivalence, and the
    no-Exchange claim by test_merge_lowshuffle_plan_has_no_shuffle."""
    data_cols = [c for c in target.columns]
    ch = changes.select(
        F.col(key).alias("__ck"),
        F.col("op").alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in data_cols],
    )
    bc = F.broadcast(ch)

    j = target.join(bc, target[key] == F.col("__ck"), "left")
    matched = F.col("__ck").isNotNull()
    kept = j.filter(~matched | (F.col("__op") != "delete")).select(
        *[
            F.when(matched & (F.col("__op") == "update"), F.col(f"__c_{c}"))
            .otherwise(target[c])
            .alias(c)
            for c in data_cols
        ]
    )

    matched_keys = (
        target.join(bc, target[key] == F.col("__ck"), "left_semi")
        .select(F.col(key).alias("__mk"))
    )
    inserts = (
        ch.filter(F.col("__op") == "insert")
        .join(
            F.broadcast(matched_keys),
            F.col("__ck") == F.col("__mk"),
            "left_anti",
        )
        .select(*[F.col(f"__c_{c}").alias(c) for c in data_cols])
    )
    return kept.unionByName(inserts)


def merge_into_orders_lowshuffle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The low-shuffle MERGE applied to the same orders change set —
    result identical to merge_into_orders (same oracle), target
    shuffle-free (plan-audited)."""
    o = load_table(spark, sf_dir, "orders")
    merged = merge_into_lowshuffle(o, _orders_changes(o), "o_orderkey")
    return merged.orderBy("o_orderkey")


MERGE_INTO_ORDERS_SQL = """
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2))
              AS DOUBLE) AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 3
),
ins AS (
  SELECT (SELECT MAX(o_orderkey) FROM orders) + 1 + o_orderkey AS o_orderkey,
         o_custkey, 'N' AS o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
       o.o_orderdate, o.o_orderpriority
FROM orders o
WHERE o.o_orderkey % 10 NOT IN (3, 7)
UNION ALL
SELECT * FROM upd
UNION ALL
SELECT * FROM ins
ORDER BY o_orderkey
"""


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact↔dim join: fact rows get salt = hash(row) mod S, the dim
    side is replicated S ways, and the join key becomes (key, salt) — a
    hot orderkey's lineitems now land in S different reduce tasks instead
    of one straggler. Result is provably identical to the plain join
    (same oracle as an unsalted formulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    salted_fact = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_N))
    )
    salted_dim = o.withColumn(
        "d_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_N)]))
    )
    return (
        salted_fact.join(
            salted_dim,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("salt") == F.col("d_salt")),
            "inner",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


JOIN_SALTED_SKEW_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Right-to-erasure (GDPR Art. 17) cascade: delete a key set and its
# foreign-key descendants, then PROVE zero residual — the compliance
# maintenance op every PII-bearing warehouse needs.
# ---------------------------------------------------------------------------

def gdpr_erase_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase a deterministic customer set (custkey % 97 == 0) from
    orders and, transitively, their lineitems; emit the post-erasure
    audit row: surviving counts plus residual counts pinned 0.

    Scale notes: the erase key set is tiny relative to the fact tables,
    so both cascades are BROADCAST anti joins — the facts are scanned
    once each and never shuffled; the transitive order-key set is
    bounded by the erased customers' order count (collected nowhere,
    broadcast as a frame)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    erased_c = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    erased_o = o.join(
        F.broadcast(erased_c), o["o_custkey"] == erased_c["c_custkey"]
    ).select("o_orderkey")
    o_clean = o.join(
        F.broadcast(erased_c), o["o_custkey"] == erased_c["c_custkey"], "left_anti"
    )
    li_clean = li.join(
        F.broadcast(erased_o), li["l_orderkey"] == erased_o["o_orderkey"], "left_anti"
    )
    # residuals recomputed FROM the cleaned frames (the proof, not a tautology)
    res_o = o_clean.join(
        F.broadcast(erased_c), o_clean["o_custkey"] == erased_c["c_custkey"]
    ).agg(F.count(F.lit(1)).alias("residual_orders"))
    res_li = li_clean.join(
        F.broadcast(erased_o), li_clean["l_orderkey"] == erased_o["o_orderkey"]
    ).agg(F.count(F.lit(1)).alias("residual_lineitems"))
    counts = o_clean.agg(
        F.count(F.lit(1)).alias("orders_remaining")
    ).crossJoin(li_clean.agg(F.count(F.lit(1)).alias("lineitems_remaining")))
    return counts.crossJoin(res_o).crossJoin(res_li)


GDPR_ERASE_CUSTOMER_SQL = """
WITH erased_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
erased_o AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM erased_c)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM erased_c)) AS orders_remaining,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM erased_o)) AS lineitems_remaining,
  CAST(0 AS BIGINT) AS residual_orders,
  CAST(0 AS BIGINT) AS residual_lineitems
"""
