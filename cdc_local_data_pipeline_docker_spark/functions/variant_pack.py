"""Spark 4 VARIANT surface over the events.props JSON column: parse once
to the binary VARIANT encoding, extract typed paths, aggregate. VARIANT
is Spark 4's semi-structured fast path — unlike from_json it needs no
up-front schema and unlike get_json_object it parses each document ONCE
into a binary form whose path reads are O(path), not a re-parse per
extraction; at 100 TB this is the difference between one JSON parse per
row and one per (row × extracted field). The oracle reproduces the same
typed extraction with DuckDB's JSON operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def fn_variant_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, k-decade) stats of the VARIANT-extracted ``k``
    field: (event_type, k_bucket, n_events, sum_k, min_k, max_k),
    sorted. ``k`` is non-negative in the fixture, so integer division
    buckets identically in both engines (Spark's ``div`` truncates
    toward zero, DuckDB's ``//`` floors — equal on non-negatives; the
    fixture range 0-99 is pinned by the oracle matching at all sfs)."""
    e = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.select("event_type", k.alias("k"))
        .select("event_type", "k", F.expr("k div 10").alias("k_bucket"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type", "k_bucket")
    )


FN_VARIANT_PACK_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, k // 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM x
GROUP BY event_type, k_bucket
ORDER BY event_type, k_bucket
"""
