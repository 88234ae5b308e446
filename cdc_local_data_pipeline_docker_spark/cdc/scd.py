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
