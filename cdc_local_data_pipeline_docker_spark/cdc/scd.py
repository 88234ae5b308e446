"""Slowly-Changing-Dimension Type 2 history from the CDC changelog.

``latest_state`` answers "what is the row NOW"; a warehouse dimension
also needs "what was the row WHEN" — every version of every key with
its validity interval. The changelog already contains every version in
offset order, so SCD2 is pure window math over one shuffle on the key:

  * each non-tombstone event opens a version at its offset;
  * the next event for the same key (update OR delete) closes it at
    offset-1; the last open version of a live key is current;
  * a tombstone closes the prior version and contributes no version
    itself — deleted keys simply have no current row.

One ``lead()`` over (pk, offset) does all of it — no self-join, no
iteration; at 100 TB this is a single keyed shuffle, the same cost as
latest-state itself (reference semantics: SURVEY §2.B U2/U3; this is
the temporal generalization of enhanced.py's latest-wins sink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import parse as P
from .queries import FIXTURE_DIR, ensure_fixtures


def scd2_history(parsed: DataFrame) -> DataFrame:
    """(pk, row-fields..., valid_from_offset, valid_to_offset,
    is_current) for every version in a parsed changelog."""
    w = Window.partitionBy("pk").orderBy("kafka_offset")
    nxt = F.lead("kafka_offset").over(w)
    return (
        parsed.filter(~F.col("is_malformed"))
        .withColumn("valid_to_offset", nxt - F.lit(1))
        .withColumn("is_current", nxt.isNull())
        .filter(~F.col("is_tombstone"))
        .select(
            "pk",
            "row",
            F.col("kafka_offset").alias("valid_from_offset"),
            "valid_to_offset",
            "is_current",
        )
    )


def cdc_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version history of the orders topic (driver adapter).

    sf_dir unused — CDC input is the fixture change stream."""
    d = ensure_fixtures()
    env = P.read_event_file(spark, os.path.join(d, "orders.jsonl"))
    hist = scd2_history(P.parse_events(env, "orders"))
    return hist.select(
        "pk",
        F.col("row.status").alias("status"),
        F.col("row.total_amount").cast("double").alias("total_amount"),
        "valid_from_offset",
        "valid_to_offset",
        "is_current",
    ).orderBy("pk", "valid_from_offset")


CDC_SCD2_ORDERS_SQL = f"""
WITH env AS (
  SELECT *,
         CASE WHEN value IS NOT NULL AND json_valid(value) THEN value END AS v
  FROM read_json_auto('{FIXTURE_DIR}/orders.jsonl',
                      format='newline_delimited')
),
parsed AS (
  SELECT CAST(json_extract_string(key, '$.order_id') AS INT) AS pk,
         value IS NULL AS is_tombstone,
         value IS NOT NULL
           AND json_extract_string(v, '$.order_id') IS NULL AS is_malformed,
         json_extract_string(v, '$.status') AS status,
         CAST(CAST(json_extract_string(v, '$.total_amount') AS DECIMAL(10,2))
              AS DOUBLE) AS total_amount,
         "offset" AS kafka_offset
  FROM env
),
versioned AS (
  SELECT *,
         LEAD(kafka_offset) OVER (PARTITION BY pk ORDER BY kafka_offset) - 1
           AS valid_to_offset,
         LEAD(kafka_offset) OVER (PARTITION BY pk ORDER BY kafka_offset)
           IS NULL AS is_current
  FROM parsed WHERE NOT is_malformed
)
SELECT pk, status, total_amount, valid_from_offset, valid_to_offset,
       is_current
FROM (SELECT *, kafka_offset AS valid_from_offset FROM versioned)
WHERE NOT is_tombstone
ORDER BY pk, valid_from_offset
"""


def cdc_temporal_join_items_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join across topics: each order_items
    change event enriched with the ORDER VERSION valid at that event's
    broker timestamp — "what did the parent row look like WHEN this
    change happened", the query SCD2 history exists to answer. The
    validity axis is the shared broker-append time (epoch ms), so the
    join is meaningful across topics where per-topic offsets are not.

    Versions partition each key's timeline into disjoint [from, next-1]
    intervals, so the range join matches AT MOST ONE version per item
    event (left join keeps items that precede their order's first
    version or reference a deleted order — the temporal orphans the FK
    report counts). Physical shape: equi-join on order_id with the
    range residual — one keyed SMJ shuffle, the same cost class as the
    latest-state join; at 100 TB the dimension side is the (small)
    version history, broadcastable per AQE."""
    d = ensure_fixtures()
    items_env = P.read_event_file(spark, os.path.join(d, "order_items.jsonl"))
    orders_env = P.read_event_file(spark, os.path.join(d, "orders.jsonl"))
    items = (
        P.parse_events(items_env, "order_items")
        .filter(~F.col("is_malformed") & ~F.col("is_tombstone"))
        .select(
            F.col("kafka_offset").alias("item_offset"),
            F.col("row.order_item_id").alias("order_item_id"),
            F.col("row.order_id").alias("order_id"),
            F.unix_millis("kafka_timestamp").alias("item_ts_ms"),
        )
    )
    orders_parsed = P.parse_events(orders_env, "orders")
    return point_in_time_enrich(items, orders_parsed).orderBy("item_offset")


def point_in_time_enrich(items: DataFrame, orders_parsed: DataFrame) -> DataFrame:
    """Core of the temporal join (hypothesis-swept on random sequences):
    items (item_offset, order_item_id, order_id, item_ts_ms) left-joined
    to the order version whose [ts, next_event_ts - 1] broker-time
    interval contains item_ts_ms. Assumes per-topic broker time is
    strictly increasing with offset (Kafka per-partition append order),
    so intervals are disjoint and each event matches at most once."""
    o = orders_parsed.filter(~F.col("is_malformed"))
    w = Window.partitionBy("pk").orderBy("kafka_offset")
    vers = (
        o.withColumn("ts_ms", F.unix_millis("kafka_timestamp"))
        .withColumn("valid_to_ms", F.lead("ts_ms").over(w) - F.lit(1))
        .filter(~F.col("is_tombstone"))
        .select(
            F.col("pk").alias("v_order_id"),
            F.col("row.status").alias("order_status"),
            F.col("ts_ms").alias("order_valid_from_ms"),
            "valid_to_ms",
        )
    )
    return (
        items.join(
            vers,
            (items.order_id == vers.v_order_id)
            & (items.item_ts_ms >= vers.order_valid_from_ms)
            & (
                vers.valid_to_ms.isNull()
                | (items.item_ts_ms <= vers.valid_to_ms)
            ),
            "left",
        )
        .select(
            "item_offset", "order_item_id", "order_id", "item_ts_ms",
            "order_status", "order_valid_from_ms",
        )
    )


CDC_TEMPORAL_JOIN_ITEMS_ORDERS_SQL = f"""
WITH ienv AS (
  SELECT *,
         CASE WHEN value IS NOT NULL AND json_valid(value) THEN value END AS v
  FROM read_json_auto('{FIXTURE_DIR}/order_items.jsonl',
                      format='newline_delimited')
),
items AS (
  SELECT "offset" AS item_offset,
         CAST(json_extract_string(v, '$.order_item_id') AS INT)
           AS order_item_id,
         CAST(json_extract_string(v, '$.order_id') AS INT) AS order_id,
         "timestamp" AS item_ts_ms
  FROM ienv
  WHERE value IS NOT NULL
    AND json_extract_string(v, '$.order_item_id') IS NOT NULL
),
oenv AS (
  SELECT *,
         CASE WHEN value IS NOT NULL AND json_valid(value) THEN value END AS v
  FROM read_json_auto('{FIXTURE_DIR}/orders.jsonl',
                      format='newline_delimited')
),
overs AS (
  SELECT pk, is_tombstone, status, ts_ms,
         LEAD(ts_ms) OVER (PARTITION BY pk ORDER BY "offset") - 1
           AS valid_to_ms
  FROM (
    SELECT CAST(json_extract_string(key, '$.order_id') AS INT) AS pk,
           value IS NULL AS is_tombstone,
           json_extract_string(v, '$.status') AS status,
           "timestamp" AS ts_ms, "offset"
    FROM oenv
    WHERE NOT (value IS NOT NULL
               AND json_extract_string(v, '$.order_id') IS NULL))
)
SELECT i.item_offset, i.order_item_id, i.order_id, i.item_ts_ms,
       o.status AS order_status, o.ts_ms AS order_valid_from_ms
FROM items i
LEFT JOIN (SELECT * FROM overs WHERE NOT is_tombstone) o
  ON i.order_id = o.pk
 AND i.item_ts_ms >= o.ts_ms
 AND (o.valid_to_ms IS NULL OR i.item_ts_ms <= o.valid_to_ms)
ORDER BY item_offset
"""
